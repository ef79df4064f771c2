"""Minimal BIFF8 .xls writer — TEST FIXTURE ONLY.

Builds real OLE2 + BIFF8 bytes so the reader in
uquery_rs_spark/sources/xls.py is exercised against independently
constructed files (same closed-form-fixture technique as the JPEG/PNG
codecs). Supports LABELSST/NUMBER/RK/MULRK/BOOLERR/FORMULA+STRING
cells, date XFs, custom FORMAT records, multiple sheets, and SST
CONTINUE splitting mid-string (with the flags-byte re-emission the
format requires)."""

from __future__ import annotations

import struct
from datetime import datetime

_EPOCH = datetime(1899, 12, 30)
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_FATSECT = 0xFFFFFFFD
_REC_CAP = 8224  # max BIFF record data bytes


def _rec(op: int, data: bytes) -> bytes:
    return struct.pack("<HH", op, len(data)) + data


def _sst_record(strings: list[str]) -> bytes:
    """SST (+ CONTINUE records) with proper mid-string splitting: the
    continuation re-emits a flags byte before the remaining chars."""
    out_records: list[tuple[int, bytearray]] = [(0x00FC, bytearray())]
    cur = out_records[-1][1]
    cur += struct.pack("<II", len(strings), len(strings))

    def room() -> int:
        return _REC_CAP - len(out_records[-1][1])

    def new_continue() -> bytearray:
        out_records.append((0x003C, bytearray()))
        return out_records[-1][1]

    for s in strings:
        high = 1 if any(ord(c) > 255 for c in s) else 0
        width = 2 if high else 1
        cur = out_records[-1][1]
        # header (cch + grbit) must not split; need header + >=1 char
        if room() < 3 + width:
            cur = new_continue()
        cur += struct.pack("<HB", len(s), high)
        remaining = s
        while remaining:
            cur = out_records[-1][1]
            fit = (_REC_CAP - len(cur)) // width
            if fit == 0:
                cur = new_continue()
                cur.append(high)  # re-emitted flags byte
                fit = (_REC_CAP - len(cur)) // width
            chunk, remaining = remaining[:fit], remaining[fit:]
            cur += chunk.encode("utf-16-le" if high else "latin-1")
    return b"".join(_rec(op, bytes(d)) for op, d in out_records)


class Formula:
    """Marks a value to be written as a FORMULA record with a cached
    result (strings get the follow-up STRING record)."""

    def __init__(self, value):
        self.value = value


def _rk_for(v) -> int | None:
    """RK encoding if the value fits (30-bit int, or 2-decimal /100)."""
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        return None
    if isinstance(v, int) and -(1 << 29) <= v < (1 << 29):
        return ((v << 2) & 0xFFFFFFFF) | 0x02
    if isinstance(v, float):
        cents = round(v * 100)
        if cents == v * 100 and -(1 << 29) <= cents < (1 << 29):
            return ((cents << 2) & 0xFFFFFFFF) | 0x03  # int, /100
    return None


def _cells(rows: list[list], sst_index: dict[str, int], date_cols: set[int],
           custom_date_cols: set[int]) -> bytes:
    """Cell records for one sheet. xf 16=general, 17=builtin date,
    18=custom date. Runs of >=2 adjacent RK-encodable values collapse
    into MULRK; FORMULA values carry cached results (+STRING)."""
    out = bytearray()
    for r, row in enumerate(rows):
        c = 0
        while c < len(row):
            v = row[c]
            if v is None:
                c += 1
                continue
            xf = 18 if c in custom_date_cols else (17 if c in date_cols else 16)
            rk = _rk_for(v)
            if rk is not None:
                # collect an adjacent RK run for MULRK
                run = [(xf, rk)]
                c2 = c + 1
                while c2 < len(row):
                    xf2 = 18 if c2 in custom_date_cols else (17 if c2 in date_cols else 16)
                    rk2 = _rk_for(row[c2])
                    if rk2 is None:
                        break
                    run.append((xf2, rk2))
                    c2 += 1
                if len(run) >= 2:
                    body = struct.pack("<HH", r, c)
                    for xf_i, rk_i in run:
                        body += struct.pack("<HI", xf_i, rk_i)
                    body += struct.pack("<H", c + len(run) - 1)
                    out += _rec(0x00BD, body)
                else:
                    out += _rec(0x027E, struct.pack("<HHHI", r, c, xf, rk))
                c = c + len(run)
                continue
            if isinstance(v, Formula):
                inner = v.value
                if isinstance(inner, str):
                    result = b"\x00\x00\x00\x00\x00\x00\xff\xff"
                    out += _rec(0x0006, struct.pack("<HHH", r, c, xf) + result + b"\x00" * 8)
                    out += _rec(0x0207, struct.pack("<HB", len(inner), 0) + inner.encode("latin-1"))
                elif isinstance(inner, bool):
                    result = bytes([1, 0, int(inner), 0, 0, 0, 0xFF, 0xFF])
                    out += _rec(0x0006, struct.pack("<HHH", r, c, xf) + result + b"\x00" * 8)
                else:
                    out += _rec(0x0006, struct.pack("<HHHd", r, c, xf, float(inner)) + b"\x00" * 8)
            elif isinstance(v, str):
                out += _rec(0x00FD, struct.pack("<HHHI", r, c, xf, sst_index[v]))
            elif isinstance(v, bool):
                out += _rec(0x0205, struct.pack("<HHHBB", r, c, xf, int(v), 0))
            elif isinstance(v, datetime):
                serial = (v - _EPOCH).total_seconds() / 86400.0
                out += _rec(0x0203, struct.pack("<HHHd", r, c, xf, serial))
            else:
                out += _rec(0x0203, struct.pack("<HHHd", r, c, xf, float(v)))
            c += 1
    return bytes(out)


def build_xls(sheets: dict[str, list[list]], date_cols: set[int] = frozenset(),
              custom_date_cols: set[int] = frozenset()) -> bytes:
    """Workbook bytes: multiple sheets, shared strings, date formats."""
    strings: list[str] = []
    seen: dict[str, int] = {}
    for rows in sheets.values():
        for row in rows:
            for v in row:
                if isinstance(v, str) and v not in seen:
                    seen[v] = len(strings)
                    strings.append(v)

    globals_recs = bytearray()
    globals_recs += _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0005, 0x0DBB, 0x07CC, 0, 0))
    globals_recs += _rec(0x0042, struct.pack("<H", 1200))  # CODEPAGE utf-16
    # custom date format id 164
    fmt = "yyyy-mm-dd hh:mm"
    globals_recs += _rec(0x041E, struct.pack("<HHB", 164, len(fmt), 0) + fmt.encode("latin-1"))
    # 16 style XFs + 3 cell XFs (general / builtin date 14 / custom 164)
    for ifmt in [0] * 16 + [0, 14, 164]:
        globals_recs += _rec(0x00E0, struct.pack("<HHH", 0, ifmt, 0) + b"\x00" * 14)
    globals_recs += _sst_record(strings)

    sheet_payloads = []
    for name, rows in sheets.items():
        body = bytearray()
        body += _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0010, 0x0DBB, 0x07CC, 0, 0))
        body += _cells(rows, seen, date_cols, custom_date_cols)
        body += _rec(0x000A, b"")
        sheet_payloads.append((name, bytes(body)))

    # BOUNDSHEET offsets need the final globals length: iterate to fixpoint
    def boundsheets(base: int) -> bytes:
        out = bytearray()
        off = base
        for name, payload in sheet_payloads:
            nm = name.encode("latin-1")
            out += _rec(0x0085, struct.pack("<IBBB", off, 0, 0, len(nm)) + b"\x00" + nm)
            off += len(payload)
        return bytes(out)

    bs_len = len(boundsheets(0))
    base = len(globals_recs) + bs_len + 4  # + EOF record
    stream = bytes(globals_recs) + boundsheets(base) + _rec(0x000A, b"")
    for _, payload in sheet_payloads:
        stream += payload
    # pad past the 4096-byte mini-stream cutoff so the stream lives in
    # regular FAT sectors (readers pick the location from size alone)
    if len(stream) < 4096:
        stream += b"\x00" * (4096 - len(stream))
    return _ole2(stream)


def _ole2(stream: bytes) -> bytes:
    """Wrap one stream named 'Workbook' in a v3 OLE2 compound file."""
    ssz = 512
    padded = stream + b"\x00" * (-len(stream) % ssz)
    n_stream = len(padded) // ssz
    dir_sector_i = 1 + n_stream  # layout: [FAT][stream...][dir]

    fat = [_FREESECT] * (ssz // 4)
    fat[0] = _FATSECT
    for i in range(n_stream):
        fat[1 + i] = 1 + i + 1 if i + 1 < n_stream else _ENDOFCHAIN
    fat[dir_sector_i] = _ENDOFCHAIN

    def dirent(name: str, etype: int, start: int, size: int, child: int = _FREESECT) -> bytes:
        nm = name.encode("utf-16-le") + b"\x00\x00"
        e = bytearray(128)
        e[: len(nm)] = nm
        struct.pack_into("<H", e, 64, len(nm))
        e[66] = etype
        e[67] = 1  # black
        struct.pack_into("<III", e, 68, _FREESECT, _FREESECT, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<I", e, 120, size)
        return bytes(e)

    directory = (
        dirent("Root Entry", 5, _ENDOFCHAIN, 0, child=1)
        + dirent("Workbook", 2, 1, len(stream))
        + bytes(128) * 2
    )

    header = bytearray(512)
    header[:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 24, 0x003E)  # minor version
    struct.pack_into("<H", header, 26, 0x0003)  # major version (v3)
    struct.pack_into("<H", header, 28, 0xFFFE)  # byte-order mark
    struct.pack_into("<H", header, 30, 9)  # sector shift
    struct.pack_into("<H", header, 32, 6)  # mini shift
    struct.pack_into("<I", header, 44, 1)  # num FAT sectors
    struct.pack_into("<I", header, 48, dir_sector_i)
    struct.pack_into("<I", header, 56, 4096)  # mini cutoff
    struct.pack_into("<I", header, 60, _ENDOFCHAIN)  # first minifat
    struct.pack_into("<I", header, 64, 0)
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # first difat
    struct.pack_into("<I", header, 72, 0)
    difat = [0] + [_FREESECT] * 108
    struct.pack_into("<109I", header, 76, *difat)

    return (
        bytes(header)
        + struct.pack(f"<{ssz // 4}I", *fat)
        + padded
        + directory
        + b"\x00" * (ssz - len(directory))
    )
