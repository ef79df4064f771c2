"""Native .xlsx scans (sources/excel.py).

Reference semantics: Excel files are queryable tables
(/root/reference/docs/docs/intro.md:14, via DuckDB's excel extension).
The fixture workbook is generated with stdlib zipfile+XML (the same
SpreadsheetML structure Excel writes) so the test has no dependency the
reader itself doesn't have.
"""

from __future__ import annotations

import zipfile

import pytest

from uquery_rs_spark.errors import UQueryError
from uquery_rs_spark.sources.files import resolve_path

_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{overrides}
</Types>"""

_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""


def write_xlsx(path, sheets, shared=(), with_date_style=False):
    """Minimal SpreadsheetML writer: sheets = {name: rows}, a row is a
    list of cells — str (inline), int/float, bool, ("s", idx) shared
    string, ("d", serial) date-styled number."""
    sheet_xml = {}
    for si, (name, rows) in enumerate(sheets.items(), 1):
        body = []
        for ri, row in enumerate(rows, 1):
            cells = []
            for ci, v in enumerate(row):
                ref = f"{chr(65 + ci)}{ri}"
                if v is None:
                    continue
                if isinstance(v, tuple) and v[0] == "s":
                    cells.append(f'<c r="{ref}" t="s"><v>{v[1]}</v></c>')
                elif isinstance(v, tuple) and v[0] == "d":
                    cells.append(f'<c r="{ref}" s="1"><v>{v[1]}</v></c>')
                elif isinstance(v, bool):
                    cells.append(f'<c r="{ref}" t="b"><v>{int(v)}</v></c>')
                elif isinstance(v, (int, float)):
                    cells.append(f'<c r="{ref}"><v>{v}</v></c>')
                else:
                    cells.append(
                        f'<c r="{ref}" t="inlineStr"><is><t>{v}</t></is></c>'
                    )
            body.append(f'<row r="{ri}">{"".join(cells)}</row>')
        sheet_xml[f"sheet{si}.xml"] = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            f'<sheetData>{"".join(body)}</sheetData></worksheet>'
        )

    wb_sheets = "".join(
        f'<sheet name="{name}" sheetId="{i}" r:id="rId{i}"/>'
        for i, name in enumerate(sheets, 1)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{wb_sheets}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i}.xml"/>'
            for i in range(1, len(sheets) + 1)
        )
        + "</Relationships>"
    )
    styles = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        '<cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="14"/></cellXfs>'
        "</styleSheet>"
        if with_date_style
        else '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"/>'
    )
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/{n}" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        for n in sheet_xml
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", _CT.format(overrides=overrides))
        z.writestr("_rels/.rels", _RELS)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/styles.xml", styles)
        if shared:
            z.writestr(
                "xl/sharedStrings.xml",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
                + "".join(f"<si><t>{s}</t></si>" for s in shared)
                + "</sst>",
            )
        for n, xml in sheet_xml.items():
            z.writestr(f"xl/worksheets/{n}", xml)


@pytest.fixture(scope="module")
def book(tmp_path_factory):
    p = tmp_path_factory.mktemp("xlsx") / "book.xlsx"
    write_xlsx(
        p,
        {
            "data": [
                ["id", "name", "price", "active", "born"],
                [1, ("s", 0), 1.5, True, ("d", 45292)],  # 2024-01-01
                [2, ("s", 1), 2.0, False, ("d", 45658)],  # 2025-01-01
                [3, "inline-row", 3.25, True, ("d", 45293.5)],
            ],
            "other": [["k"], [99]],
        },
        shared=("alpha", "beta"),
        with_date_style=True,
    )
    return str(p)


class TestExcelScan:
    def test_types_and_values(self, spark, book):
        df = resolve_path(spark, book)
        assert [f.simpleString() for f in df.schema.fields] == [
            "id:bigint", "name:string", "price:double", "active:boolean",
            "born:timestamp_ntz",
        ]
        rows = {r.id: r for r in df.collect()}
        assert rows[1].name == "alpha" and rows[3].name == "inline-row"
        assert rows[2].price == 2.0 and rows[2].active is False
        assert str(rows[1].born) == "2024-01-01 00:00:00"
        assert str(rows[3].born) == "2024-01-02 12:00:00"

    def test_sheet_and_header_options(self, spark, book):
        other = resolve_path(spark, book, options={"sheet": "other"})
        assert other.columns == ["k"] and other.collect()[0].k == 99
        raw = resolve_path(spark, book, options={"header": "false"})
        assert raw.columns[:2] == ["_c0", "_c1"] and raw.count() == 4

    def test_missing_sheet_is_clear_error(self, spark, book):
        with pytest.raises(UQueryError, match="sheet 'nope' not found"):
            resolve_path(spark, book, options={"sheet": "nope"}).collect()

    def test_multi_file_glob(self, spark, tmp_path):
        for i in range(3):
            write_xlsx(tmp_path / f"part{i}.xlsx", {"s": [["v"], [i], [i + 10]]})
        df = resolve_path(spark, str(tmp_path) + "/*.xlsx")
        assert sorted(r.v for r in df.collect()) == [0, 1, 2, 10, 11, 12]
        assert df.rdd.getNumPartitions() >= 1

    def test_path_as_table_sql(self, spark, book):
        from uquery_rs_spark.rewrite import SqlRewriter
        import os

        rw = SqlRewriter(spark, allowed_dirs=[os.path.dirname(book)])
        out = spark.sql(
            rw.rewrite(f"SELECT name, price FROM '{book}' WHERE id >= 2 ORDER BY id")
        ).collect()
        assert [(r.name, r.price) for r in out] == [("beta", 2.0), ("inline-row", 3.25)]

    def test_read_xlsx_tvf(self, spark, book):
        from uquery_rs_spark.rewrite import SqlRewriter
        import os

        rw = SqlRewriter(spark, allowed_dirs=[os.path.dirname(book)])
        out = spark.sql(
            rw.rewrite(f"SELECT k FROM read_xlsx('{book}', sheet='other')")
        ).collect()
        assert [r.k for r in out] == [99]

class TestLegacyXlsScan:
    """Legacy BIFF8 .xls (sources/xls.py): fixture files are built by
    tests/xls_fixture.py — an independent minimal OLE2+BIFF8 writer —
    so reader and fixture share no code paths."""

    @pytest.fixture()
    def xls_book(self, tmp_path):
        from datetime import datetime

        from .xls_fixture import Formula, build_xls

        rows = [
            ["id", "name", "price", "active", "born", "note"],
            [1, "alpha", 1.25, True, datetime(2024, 1, 1), Formula("calc")],
            [2, "gädgét", 2.0, False, datetime(2025, 1, 1), "plain"],
            [3, "ünïcode→★", 3.25, True, datetime(2024, 1, 2, 12), Formula("f2")],
        ]
        p = tmp_path / "legacy.xls"
        p.write_bytes(
            build_xls({"data": rows, "other": [["k"], [99]]}, date_cols={4})
        )
        return str(p)

    def test_types_and_values(self, spark, xls_book):
        df = resolve_path(spark, xls_book)
        assert [f.simpleString() for f in df.schema.fields] == [
            "id:bigint", "name:string", "price:double", "active:boolean",
            "born:timestamp_ntz", "note:string",
        ]
        rows = {r.id: r for r in df.collect()}
        assert rows[1].name == "alpha" and rows[3].name == "ünïcode→★"
        assert rows[1].price == 1.25 and rows[2].active is False
        assert str(rows[2].born) == "2025-01-01 00:00:00"
        assert str(rows[3].born) == "2024-01-02 12:00:00"
        assert rows[1].note == "calc"  # FORMULA cached string

    def test_sheet_option_and_missing_sheet(self, spark, xls_book):
        other = resolve_path(spark, xls_book, options={"sheet": "other"})
        assert other.columns == ["k"] and other.collect()[0].k == 99
        with pytest.raises(UQueryError, match="sheet 'nope' not found"):
            resolve_path(spark, xls_book, options={"sheet": "nope"}).collect()

    def test_mixed_format_glob(self, spark, tmp_path):
        """One glob over .xls AND .xlsx — per-file magic dispatch."""
        from .xls_fixture import build_xls

        write_xlsx(tmp_path / "new.xlsx", {"s": [["v"], [1], [2]]})
        (tmp_path / "old.xls").write_bytes(build_xls({"s": [["v"], [3], [4]]}))
        df = resolve_path(spark, str(tmp_path) + "/*.xls*")
        assert sorted(r.v for r in df.collect()) == [1, 2, 3, 4]

    def test_sst_continue_spanning(self, spark, tmp_path):
        """Shared strings split mid-string across CONTINUE records, with
        a UTF-16 string crossing the boundary."""
        from .xls_fixture import build_xls

        big = ["s" + str(i) + "x" * 60 for i in range(150)]
        big.insert(100, "Ünicode★" * 400)  # 3200 UTF-16 chars spans records
        p = tmp_path / "sst.xls"
        p.write_bytes(build_xls({"S": [["v"]] + [[s] for s in big]}))
        got = [r.v for r in resolve_path(spark, str(p)).collect()]
        assert got == big

    def test_path_as_table_sql(self, spark, xls_book):
        import os

        from uquery_rs_spark.rewrite import SqlRewriter

        rw = SqlRewriter(spark, allowed_dirs=[os.path.dirname(xls_book)])
        out = spark.sql(
            rw.rewrite(f"SELECT name FROM '{xls_book}' WHERE id = 2")
        ).collect()
        assert [r.name for r in out] == ["gädgét"]

    def test_biff5_clear_error(self, tmp_path):
        """Pre-97 BIFF5 gets a clear unsupported-version error."""
        import struct

        from .xls_fixture import _ole2, _rec

        biff5 = _rec(0x0809, struct.pack("<HHHH", 0x0500, 0x0005, 0, 0))
        blob = _ole2(biff5 + b"\x00" * 4096)
        from uquery_rs_spark.sources.xls import parse_xls

        with pytest.raises(UQueryError, match="BIFF8"):
            parse_xls(blob, None)

    def test_not_ole2_clear_error(self):
        from uquery_rs_spark.sources.xls import parse_xls

        with pytest.raises(UQueryError, match="OLE2"):
            parse_xls(b"garbage bytes here", None)
