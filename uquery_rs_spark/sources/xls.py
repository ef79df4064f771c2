"""Legacy Excel .xls (BIFF8 inside an OLE2 compound file) reader.

Pure-stdlib counterpart to the .xlsx path in excel.py (reference: Excel
files are first-class tables, /root/reference/docs/docs/intro.md:14 —
DuckDB's excel extension reads both formats). No xlrd/olefile in this
environment, so both layers are parsed directly from the public specs:

- OLE2/CFB container ([MS-CFB]): 512-byte header, DIFAT→FAT chains,
  directory entries, and the mini-FAT/mini-stream for streams under the
  4096-byte cutoff. We only need to locate and read the ``Workbook``
  (or ``Book``) stream.
- BIFF8 record stream ([MS-XLS]): globals substream (SST shared strings
  with CONTINUE spanning, XF/FORMAT for date-format detection,
  BOUNDSHEET offsets) followed by one substream per worksheet (NUMBER /
  RK / MULRK / LABELSST / LABEL / BOOLERR / FORMULA+STRING cells).

The notorious part is SST continuation: a shared string may be split
mid-characters across a CONTINUE record, and the continuation re-emits
a fresh option-flags byte — the string can switch between compressed
(latin-1) and UTF-16LE encodings at the boundary. ``_SSTReader`` models
the record-chunk boundaries explicitly.

Output rows use the same python value shapes as excel._parse_xlsx
(float / bool / str / datetime / None), so schema inference and the
distributed binaryFile+mapInPandas scan are shared with .xlsx.
"""

from __future__ import annotations

import re
import struct
from datetime import timedelta

from ..errors import UQueryError
from .excel import _BUILTIN_DATE_FMTS, _EPOCH

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF

# BIFF8 record opcodes
_BOF = 0x0809
_EOF_R = 0x000A
_SST = 0x00FC
_CONTINUE = 0x003C
_BOUNDSHEET = 0x0085
_XF = 0x00E0
_FORMAT = 0x041E
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_LABELSST = 0x00FD
_LABEL = 0x0204
_BOOLERR = 0x0205
_FORMULA = 0x0006
_STRING = 0x0207


def is_cfb(data: bytes) -> bool:
    return data[:8] == _CFB_MAGIC


# ---------------------------------------------------------------------------
# OLE2 compound file
# ---------------------------------------------------------------------------


def _cfb_stream(data: bytes, names: tuple[str, ...]) -> bytes:
    """Read the first directory stream whose name matches ``names``."""
    if not is_cfb(data):
        raise UQueryError.sql_error("not an OLE2 compound file (.xls)")
    sector_shift = struct.unpack_from("<H", data, 30)[0]
    mini_shift = struct.unpack_from("<H", data, 32)[0]
    ssz, msz = 1 << sector_shift, 1 << mini_shift
    n_fat = struct.unpack_from("<I", data, 44)[0]
    dir_start = struct.unpack_from("<I", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    minifat_start = struct.unpack_from("<I", data, 60)[0]
    difat_start = struct.unpack_from("<I", data, 68)[0]

    def sector(i: int) -> bytes:
        off = 512 + i * ssz
        return data[off : off + ssz]

    # DIFAT: 109 header entries + chained DIFAT sectors
    difat = list(struct.unpack_from("<109I", data, 76))
    nxt = difat_start
    while nxt not in (_ENDOFCHAIN, _FREESECT) and nxt < 0xFFFFFFFA:
        s = sector(nxt)
        difat += struct.unpack_from(f"<{ssz // 4 - 1}I", s, 0)
        nxt = struct.unpack_from("<I", s, ssz - 4)[0]
    fat_sectors = [x for x in difat if x not in (_ENDOFCHAIN, _FREESECT)][:n_fat]
    fat: list[int] = []
    for fs in fat_sectors:
        fat += struct.unpack_from(f"<{ssz // 4}I", sector(fs), 0)

    def chain(start: int) -> bytes:
        out, cur, seen = bytearray(), start, 0
        while cur not in (_ENDOFCHAIN, _FREESECT) and cur < 0xFFFFFFFA:
            out += sector(cur)
            cur = fat[cur] if cur < len(fat) else _ENDOFCHAIN
            seen += 1
            if seen > len(data) // ssz + 2:
                raise UQueryError.sql_error("cyclic FAT chain in .xls container")
        return bytes(out)

    # Directory entries (128 bytes each)
    dirdata = chain(dir_start)
    entries = []
    for off in range(0, len(dirdata) - 127, 128):
        name_len = struct.unpack_from("<H", dirdata, off + 64)[0]
        if name_len < 2:
            continue
        name = dirdata[off : off + name_len - 2].decode("utf-16-le", "replace")
        etype = dirdata[off + 66]
        start = struct.unpack_from("<I", dirdata, off + 116)[0]
        size = struct.unpack_from("<I", dirdata, off + 120)[0]
        entries.append((name, etype, start, size))
    root = next((e for e in entries if e[1] == 5), None)

    # MiniFAT + mini stream (carved from the root entry's chain)
    minifat: list[int] = []
    nxt = minifat_start
    while nxt not in (_ENDOFCHAIN, _FREESECT) and nxt < 0xFFFFFFFA:
        minifat += struct.unpack_from(f"<{ssz // 4}I", sector(nxt), 0)
        nxt = fat[nxt] if nxt < len(fat) else _ENDOFCHAIN
    ministream = chain(root[2]) if root else b""

    def mini_chain(start: int) -> bytes:
        out, cur, seen = bytearray(), start, 0
        while cur not in (_ENDOFCHAIN, _FREESECT) and cur < 0xFFFFFFFA:
            out += ministream[cur * msz : cur * msz + msz]
            cur = minifat[cur] if cur < len(minifat) else _ENDOFCHAIN
            seen += 1
            if seen > len(ministream) // msz + 2:
                raise UQueryError.sql_error("cyclic mini-FAT chain in .xls container")
        return bytes(out)

    for want in names:
        for name, etype, start, size in entries:
            if etype == 2 and name == want:
                raw = mini_chain(start) if size < mini_cutoff else chain(start)
                return raw[:size]
    raise UQueryError.sql_error(
        f"no workbook stream in .xls (streams: {[e[0] for e in entries if e[1] == 2]})"
    )


# ---------------------------------------------------------------------------
# BIFF8 records
# ---------------------------------------------------------------------------


def _records(stream: bytes, pos: int = 0):
    """Yield (opcode, data, next_pos) from a BIFF record stream."""
    n = len(stream)
    while pos + 4 <= n:
        op, ln = struct.unpack_from("<HH", stream, pos)
        yield op, stream[pos + 4 : pos + 4 + ln], pos + 4 + ln
        pos += 4 + ln


class _SSTReader:
    """Byte reader over SST + CONTINUE record payloads that knows where
    the record boundaries fall — required because a string split across
    a CONTINUE re-emits its option-flags byte at the boundary."""

    def __init__(self, chunks: list[bytes]):
        self.chunks = chunks
        self.ci = 0
        self.pos = 0

    def _avail(self) -> int:
        return len(self.chunks[self.ci]) - self.pos

    def _advance_chunk(self) -> None:
        self.ci += 1
        self.pos = 0

    def exhausted(self) -> bool:
        while self.ci < len(self.chunks) and self._avail() == 0:
            self._advance_chunk()
        return self.ci >= len(self.chunks)

    def take(self, n: int) -> bytes:
        """Read n bytes spanning chunk boundaries (for fixed fields —
        counts, run data — which continue WITHOUT a new flags byte)."""
        out = bytearray()
        while n > 0:
            if self.exhausted():
                raise UQueryError.sql_error("truncated SST in .xls")
            got = self.chunks[self.ci][self.pos : self.pos + n]
            out += got
            self.pos += len(got)
            n -= len(got)
        return bytes(out)

    def read_string(self) -> str:
        cch = struct.unpack("<H", self.take(2))[0]
        grbit = self.take(1)[0]
        high = grbit & 0x01
        ext = grbit & 0x04
        rich = grbit & 0x08
        crun = struct.unpack("<H", self.take(2))[0] if rich else 0
        cbext = struct.unpack("<I", self.take(4))[0] if ext else 0
        parts: list[str] = []
        remaining = cch
        while remaining > 0:
            if self._avail() == 0:
                # character data continues in the next record chunk,
                # prefixed by a fresh flags byte (encoding may switch)
                self._advance_chunk()
                high = self.take(1)[0] & 0x01
            width = 2 if high else 1
            can = min(remaining, self._avail() // width)
            if can == 0:
                raise UQueryError.sql_error("torn SST character in .xls")
            raw = self.chunks[self.ci][self.pos : self.pos + can * width]
            self.pos += can * width
            parts.append(raw.decode("utf-16-le" if high else "latin-1"))
            remaining -= can
        if crun:
            self.take(4 * crun)
        if cbext:
            self.take(cbext)
        return "".join(parts)


def _short_string(data: bytes, off: int) -> str:
    """ShortXLUnicodeString (1-byte length) — sheet names."""
    cch = data[off]
    high = data[off + 1] & 0x01
    if high:
        return data[off + 2 : off + 2 + 2 * cch].decode("utf-16-le")
    return data[off + 2 : off + 2 + cch].decode("latin-1")


def _unicode_string(data: bytes, off: int) -> str:
    """XLUnicodeString (2-byte length) within a single record."""
    cch = struct.unpack_from("<H", data, off)[0]
    grbit = data[off + 2]
    p = off + 3
    if grbit & 0x08:
        p += 2
    if grbit & 0x04:
        p += 4
    if grbit & 0x01:
        return data[p : p + 2 * cch].decode("utf-16-le")
    return data[p : p + cch].decode("latin-1")


def _rk_value(v: int) -> float:
    """30-bit RK number: int or truncated double, optionally /100."""
    if v & 0x02:
        x = float(struct.unpack("<i", struct.pack("<I", v & 0xFFFFFFFC))[0] >> 2)
    else:
        x = struct.unpack("<d", struct.pack("<Q", (v & 0xFFFFFFFC) << 32))[0]
    return x / 100.0 if v & 0x01 else x


def parse_xls(data: bytes, sheet: str | None) -> list[list]:
    """All rows of one worksheet as python lists (None-padded ragged) —
    same contract as excel._parse_xlsx."""
    stream = _cfb_stream(data, ("Workbook", "Book"))
    if len(stream) < 8:
        raise UQueryError.sql_error("empty workbook stream in .xls")
    op, ln = struct.unpack_from("<HH", stream, 0)
    if op != _BOF:
        raise UQueryError.sql_error("workbook stream does not start with BOF")
    version = struct.unpack_from("<H", stream, 4)[0]
    if version != 0x0600:
        raise UQueryError.sql_error(
            f"only BIFF8 (.xls written by Excel 97+) is supported, got BOF version {version:#x}"
        )

    # -- globals substream --------------------------------------------------
    sst: list[str] = []
    sheets: list[tuple[str, int]] = []  # (name, stream offset)
    xf_ifmt: list[int] = []
    custom_date_ids: set[int] = set()
    sst_chunks: list[bytes] | None = None
    sst_unique = 0
    sst_open = False  # CONTINUEs only count while directly following SST
    for rec_op, rec, nxt in _records(stream):
        if rec_op == _EOF_R:
            break
        if rec_op == _SST:
            sst_chunks = [rec[8:]]  # skip cstTotal/cstUnique
            sst_unique = struct.unpack_from("<I", rec, 4)[0]
            sst_open = True
            continue
        if rec_op == _CONTINUE and sst_open:
            sst_chunks.append(rec)
            continue
        sst_open = False
        if rec_op == _BOUNDSHEET:
            offset = struct.unpack_from("<I", rec, 0)[0]
            sheets.append((_short_string(rec, 6), offset))
        elif rec_op == _XF:
            xf_ifmt.append(struct.unpack_from("<H", rec, 2)[0])
        elif rec_op == _FORMAT:
            fmt_id = struct.unpack_from("<H", rec, 0)[0]
            code = re.sub(r'"[^"]*"|\[[^\]]*\]', "", _unicode_string(rec, 2))
            if re.search(r"[ymdhs]", code, re.IGNORECASE):
                custom_date_ids.add(fmt_id)
    if sst_chunks is not None:
        reader = _SSTReader(sst_chunks)
        for _ in range(sst_unique):
            sst.append(reader.read_string())

    date_xfs = {
        i
        for i, ifmt in enumerate(xf_ifmt)
        if ifmt in _BUILTIN_DATE_FMTS or ifmt in custom_date_ids
    }

    if not sheets:
        raise UQueryError.sql_error("no worksheets in .xls workbook")
    if sheet is None:
        target = sheets[0][1]
    else:
        match = [off for name, off in sheets if name == sheet]
        if not match:
            raise UQueryError.sql_error(
                f"xls sheet '{sheet}' not found (sheets: {[n for n, _ in sheets]})"
            )
        target = match[0]

    # -- worksheet substream ------------------------------------------------
    def conv(num: float, xf: int):
        if xf in date_xfs:
            return _EPOCH + timedelta(days=num)
        return float(num)

    cells: dict[tuple[int, int], object] = {}
    pending_formula: tuple[int, int] | None = None
    for rec_op, rec, nxt in _records(stream, target):
        if rec_op == _EOF_R:
            break
        if rec_op == _NUMBER:
            row, col, xf = struct.unpack_from("<HHH", rec, 0)
            cells[(row, col)] = conv(struct.unpack_from("<d", rec, 6)[0], xf)
        elif rec_op == _RK:
            row, col, xf = struct.unpack_from("<HHH", rec, 0)
            cells[(row, col)] = conv(_rk_value(struct.unpack_from("<I", rec, 6)[0]), xf)
        elif rec_op == _MULRK:
            row, col0 = struct.unpack_from("<HH", rec, 0)
            n_cells = (len(rec) - 6) // 6
            for i in range(n_cells):
                xf, rk = struct.unpack_from("<HI", rec, 4 + 6 * i)
                cells[(row, col0 + i)] = conv(_rk_value(rk), xf)
        elif rec_op == _LABELSST:
            row, col, _xf = struct.unpack_from("<HHH", rec, 0)
            isst = struct.unpack_from("<I", rec, 6)[0]
            cells[(row, col)] = sst[isst] if isst < len(sst) else None
        elif rec_op == _LABEL:
            row, col, _xf = struct.unpack_from("<HHH", rec, 0)
            cells[(row, col)] = _unicode_string(rec, 6)
        elif rec_op == _BOOLERR:
            row, col, _xf = struct.unpack_from("<HHH", rec, 0)
            val, is_err = rec[6], rec[7]
            cells[(row, col)] = None if is_err else bool(val)
        elif rec_op == _FORMULA:
            row, col, xf = struct.unpack_from("<HHH", rec, 0)
            result = rec[6:14]
            if result[6:8] == b"\xff\xff":
                kind = result[0]
                if kind == 0:  # cached string follows in a STRING record
                    pending_formula = (row, col)
                elif kind == 1:  # cached boolean
                    cells[(row, col)] = bool(result[2])
                # kind 2 (error) / 3 (blank) → None (leave absent)
            else:
                cells[(row, col)] = conv(struct.unpack("<d", result)[0], xf)
        elif rec_op == _STRING and pending_formula is not None:
            cells[pending_formula] = _unicode_string(rec, 0)
            pending_formula = None

    if not cells:
        return []
    max_row = max(r for r, _ in cells)
    max_col = max(c for _, c in cells)
    return [
        [cells.get((r, c)) for c in range(max_col + 1)] for r in range(max_row + 1)
    ]
