"""Excel (.xlsx) table scans with no external dependency.

Reference semantics: Excel files are first-class tables ("query ... Excel
and many more", /root/reference/docs/docs/intro.md:14; the reference
delegates to DuckDB's excel extension). No spark-excel jar or openpyxl is
available in this environment, so this module reads the format directly:
an .xlsx file is a zip of SpreadsheetML XML parts, parsed here with
stdlib ``zipfile`` + ``xml.etree`` only.

Scale shape: one worksheet caps at ~1M rows, so a single file is always
executor-sized — the scale axis is MANY files. The scan rides Spark's
``binaryFile`` source (glob/dir support, pushed-down path listing): each
file's bytes land on an executor, which parses and emits Arrow batches
via mapInPandas. The driver touches only the FIRST file for schema
inference, mirroring spark.read.csv's sampling contract.

Feature parity notes (vs DuckDB read_xlsx):
- header option (default true), sheet option (name; default first sheet)
- shared strings, inline strings, booleans, numerics
- date/datetime cells detected via styles.xml number formats (builtin
  ids 14-22 / 45-47 plus custom formats containing date letters) and
  converted from Excel serial time — TIMESTAMP_NTZ like DuckDB
- legacy .xls (BIFF8 in an OLE2 container) parses natively too — see
  xls.py; the scan dispatches per-file on the container magic bytes
  (zip "PK" vs OLE2 D0CF11E0), so mixed-format globs work
"""

from __future__ import annotations

import io
import re
import zipfile
from datetime import datetime, timedelta
from typing import Iterator

from ..errors import UQueryError

_EPOCH = datetime(1899, 12, 30)  # Excel serial day 0 (1900 system)
_BUILTIN_DATE_FMTS = set(range(14, 23)) | {45, 46, 47}


def _strip(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _col_index(ref: str) -> int:
    """'BC12' -> 0-based column 54."""
    n = 0
    for ch in ref:
        if ch.isdigit():
            break
        n = n * 26 + (ord(ch.upper()) - 64)
    return n - 1


def _parse_shared_strings(z: zipfile.ZipFile) -> list[str]:
    import xml.etree.ElementTree as ET

    try:
        data = z.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out: list[str] = []
    for si in ET.fromstring(data):
        if _strip(si.tag) != "si":
            continue
        out.append("".join(t.text or "" for t in si.iter() if _strip(t.tag) == "t"))
    return out


def _parse_date_styles(z: zipfile.ZipFile) -> set[int]:
    """Style indexes (cell ``s=`` attribute values) that mean date/time."""
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(z.read("xl/styles.xml"))
    except KeyError:
        return set()
    custom_date_ids: set[int] = set()
    for nf in root.iter():
        if _strip(nf.tag) == "numFmt":
            code = re.sub(r'"[^"]*"|\[[^\]]*\]', "", nf.get("formatCode", ""))
            if re.search(r"[ymdhs]", code, re.IGNORECASE):
                custom_date_ids.add(int(nf.get("numFmtId", "-1")))
    styles: set[int] = set()
    for xfs in root.iter():
        if _strip(xfs.tag) == "cellXfs":
            for i, xf in enumerate(x for x in xfs if _strip(x.tag) == "xf"):
                fmt = int(xf.get("numFmtId", "0"))
                if fmt in _BUILTIN_DATE_FMTS or fmt in custom_date_ids:
                    styles.add(i)
    return styles


def _sheet_member(z: zipfile.ZipFile, sheet: str | None) -> str:
    """Zip member path for the requested (or first) worksheet."""
    import xml.etree.ElementTree as ET

    wb = ET.fromstring(z.read("xl/workbook.xml"))
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    target_by_rid = {
        r.get("Id"): r.get("Target") for r in rels if _strip(r.tag) == "Relationship"
    }
    rid_attr = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
    names = []
    for s in wb.iter():
        if _strip(s.tag) != "sheet":
            continue
        names.append(s.get("name"))
        if sheet is None or s.get("name") == sheet:
            target = target_by_rid[s.get(rid_attr)]
            return "xl/" + target.lstrip("/").removeprefix("xl/")
    raise UQueryError.sql_error(f"xlsx sheet '{sheet}' not found (sheets: {names})")


def _parse_workbook(data: bytes, sheet: str | None) -> list[list]:
    """Parse one Excel file of either format, sniffing the container
    magic: zip ("PK") → SpreadsheetML .xlsx, OLE2 (D0CF11E0) → BIFF8
    .xls. Extension is irrelevant — mixed globs dispatch per file."""
    from . import xls

    if xls.is_cfb(data):
        return xls.parse_xls(data, sheet)
    return _parse_xlsx(data, sheet)


def _parse_xlsx(data: bytes, sheet: str | None) -> list[list]:
    """All rows of one worksheet as python lists (None-padded ragged)."""
    import xml.etree.ElementTree as ET

    try:
        z = zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile as e:
        raise UQueryError.sql_error(f"not a valid .xlsx (zip) file: {e}") from e
    shared = _parse_shared_strings(z)
    date_styles = _parse_date_styles(z)
    rows: list[list] = []
    width = 0
    for _, row_el in ET.iterparse(io.BytesIO(z.read(_sheet_member(z, sheet)))):
        if _strip(row_el.tag) != "row":
            continue
        row: list = []
        for c in row_el:
            if _strip(c.tag) != "c":
                continue
            ci = _col_index(c.get("r", ""))
            if ci < 0:
                ci = len(row)
            while len(row) <= ci:
                row.append(None)
            ctype = c.get("t", "n")
            v_text = None
            for child in c:
                tag = _strip(child.tag)
                if tag == "v":
                    v_text = child.text
                elif tag == "is":  # inline string
                    v_text = "".join(
                        t.text or "" for t in child.iter() if _strip(t.tag) == "t"
                    )
            if v_text is None:
                continue
            if ctype == "s":
                row[ci] = shared[int(v_text)]
            elif ctype == "b":
                row[ci] = v_text == "1"
            elif ctype in ("str", "inlineStr"):
                row[ci] = v_text
            else:  # numeric
                num = float(v_text)
                if int(c.get("s", "-1")) in date_styles:
                    row[ci] = _EPOCH + timedelta(days=num)
                else:
                    row[ci] = num
        row_el.clear()
        rows.append(row)
        width = max(width, len(row))
    for row in rows:
        row.extend([None] * (width - len(row)))
    return rows


def _infer_schema(rows: list[list], header: bool):
    """(col names, spark DDL types, pyarrow-compatible python casts)."""
    from datetime import datetime as _dt

    width = len(rows[0]) if rows else 0
    if header and rows:
        names = [
            (str(v).strip() if v is not None else f"_c{i}") or f"_c{i}"
            for i, v in enumerate(rows[0])
        ]
        body = rows[1:]
    else:
        names = [f"_c{i}" for i in range(width)]
        body = rows
    types: list[str] = []
    for i in range(width):
        vals = [r[i] for r in body if r[i] is not None]
        if vals and all(isinstance(v, bool) for v in vals):
            t = "boolean"
        elif vals and all(isinstance(v, _dt) for v in vals):
            t = "timestamp_ntz"
        elif vals and all(isinstance(v, float) for v in vals):
            t = "bigint" if all(v.is_integer() for v in vals) else "double"
        else:
            t = "string"
        types.append(t)
    return names, types, body


def _coerce(v, t: str):
    if v is None:
        return None
    if t == "bigint":
        return int(v)
    if t == "double":
        return float(v)
    if t == "boolean":
        return bool(v)
    if t == "timestamp_ntz":
        return v
    return v if isinstance(v, str) else (f"{v:g}" if isinstance(v, float) else str(v))


def scan_excel(spark, path: str, options: dict[str, str]):
    """Distributed Excel scan (.xlsx and legacy .xls): driver infers
    schema from ONE file; every file is then parsed on an executor via
    binaryFile + mapInPandas."""
    import pandas as pd

    sheet = options.get("sheet") or None
    header = options.get("header", "true").lower() == "true"

    files = spark.read.format("binaryFile").load(path)
    sample_row = files.select("path", "content").limit(1).collect()
    if not sample_row:
        raise UQueryError.sql_error(f"no files matched: {path}")
    names, types, _ = _infer_schema(
        _parse_workbook(bytes(sample_row[0].content), sheet), header
    )
    ddl = ", ".join(f"`{n}` {t}" for n, t in zip(names, types))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["content"]:
                rows = _parse_workbook(bytes(blob), sheet)
                body = rows[1:] if header and rows else rows
                data = {
                    n: [_coerce(r[i] if i < len(r) else None, t) for r in body]
                    for i, (n, t) in enumerate(zip(names, types))
                }
                out = pd.DataFrame(data)
                for n, t in zip(names, types):
                    if t == "timestamp_ntz":
                        out[n] = pd.to_datetime(out[n])
                yield out

    return files.select("content").mapInPandas(parse, ddl)
