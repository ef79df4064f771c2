"""Baseline JFIF (JPEG, ITU T.81) codec in pure numpy — no libjpeg.

Decoder: marker walk (SOI/APP*/COM/DQT/SOF0/DHT/DRI/SOS/EOI), canonical
Huffman decode from the file's own DHT segments, DC prediction + AC
run-length, dequantize, inverse zigzag, matrix IDCT, chroma upsampling
by replication for any sampling factors, YCbCr→RGB. Handles restart
markers and byte stuffing. Progressive (SOF2) and arithmetic coding
raise NotImplementedError.

Encoder: 4:4:4 baseline. Quantization uses the public Annex K luminance/
chrominance base tables scaled by libjpeg's quality formula; the Huffman
tables are simple fixed-length canonical codes (5-bit DC, 9-bit AC)
emitted in DHT — JPEG files carry their own code tables, so any valid
prefix code is standard-conformant, and this sidesteps transcribing the
long Annex K code tables. At quality=100 every quantizer step is 1, so
constant-color images round-trip EXACTLY — the property the oracle-
checked decode query relies on; general content round-trips within
normal lossy error (PSNR-bounded in tests).
"""

from __future__ import annotations

import numpy as np

# Annex K.1/K.2 base quantization tables (public spec constants)
_QUANT_LUM = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
_QUANT_CHROM = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

# zigzag scan order: _ZIGZAG[i] = flat index into the 8x8 block.
# Even anti-diagonals run bottom-left→top-right (sort by column), odd
# ones top-right→bottom-left (sort by row).
_ZIGZAG = np.array(
    sorted(
        range(64),
        key=lambda i: (
            (i // 8 + i % 8),
            (i // 8 if (i // 8 + i % 8) % 2 else i % 8),
        ),
    ),
    dtype=np.int64,
)

_DCT = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _DCT[_k, _n] = (0.5 / np.sqrt(2) if _k == 0 else 0.5) * np.cos(
            (2 * _n + 1) * _k * np.pi / 16
        )


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 50 → base, 100 → all ones."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# -- fixed-length canonical Huffman tables for the encoder --------------
# DC symbols 0..11 as 5-bit codes; AC symbols (run<<4 | size) plus EOB
# 0x00 and ZRL 0xF0 as 9-bit codes. Emitted in DHT, so decoders (ours or
# libjpeg) read them like any custom table.
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_DC_LEN, _AC_LEN = 5, 9


def _canonical_codes(symbols: list[int], length: int) -> dict[int, tuple[int, int]]:
    return {s: (i, length) for i, s in enumerate(symbols)}


_DC_CODES = _canonical_codes(_DC_SYMBOLS, _DC_LEN)
_AC_CODES = _canonical_codes(_AC_SYMBOLS, _AC_LEN)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1s per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(bw: _BitWriter, coeffs: np.ndarray, pred: int) -> int:
    """Huffman-encode one quantized zigzag block; returns its DC value."""
    dc = int(coeffs[0])
    size, bits = _magnitude(dc - pred)
    code, ln = _DC_CODES[size]
    bw.put(code, ln)
    if size:
        bw.put(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(coeffs)[0])) if np.any(coeffs[1:]) else 0
    for i in range(1, last_nz + 1):
        v = int(coeffs[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = _AC_CODES[0xF0]
            bw.put(code, ln)
            run -= 16
        size, bits = _magnitude(v)
        code, ln = _AC_CODES[(run << 4) | size]
        bw.put(code, ln)
        bw.put(bits, size)
        run = 0
    if last_nz < 63:
        code, ln = _AC_CODES[0x00]  # EOB
        bw.put(code, ln)
    return dc


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _dht_body(table_class: int, table_id: int, symbols: list[int], length: int) -> bytes:
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    return bytes([(table_class << 4) | table_id]) + bytes(counts) + bytes(symbols)


def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """(H, W, 3) uint8 RGB → baseline JFIF bytes (4:4:4, two quant
    tables, fixed-length Huffman tables carried in DHT)."""
    h, w = img.shape[:2]
    px = img.astype(np.float64)
    y = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    cb = -0.168736 * px[:, :, 0] - 0.331264 * px[:, :, 1] + 0.5 * px[:, :, 2] + 128.0
    cr = 0.5 * px[:, :, 0] - 0.418688 * px[:, :, 1] - 0.081312 * px[:, :, 2] + 128.0
    planes = [y, cb, cr]
    qt = [_scaled_quant(_QUANT_LUM, quality), _scaled_quant(_QUANT_CHROM, quality)]

    bh, bw_ = (h + 7) // 8, (w + 7) // 8
    bitw = _BitWriter()
    preds = [0, 0, 0]
    for by in range(bh):
        for bx in range(bw_):
            for ci, plane in enumerate(planes):
                block = np.full((8, 8), plane[min(by * 8, h - 1), min(bx * 8, w - 1)])
                tile = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                block[: tile.shape[0], : tile.shape[1]] = tile
                # edge padding replicates the last row/col (standard)
                if tile.shape[0] < 8:
                    block[tile.shape[0] :, :] = block[tile.shape[0] - 1, :]
                if tile.shape[1] < 8:
                    block[:, tile.shape[1] :] = block[:, tile.shape[1] - 1 : tile.shape[1]]
                coeffs = _DCT @ (block - 128.0) @ _DCT.T
                q = qt[0 if ci == 0 else 1]
                quant = np.round(coeffs / q).astype(np.int64)
                zz = quant.ravel()[_ZIGZAG]
                preds[ci] = _encode_block(bitw, zz, preds[ci])
    bitw.flush()

    def qt_body(tid: int, table: np.ndarray) -> bytes:
        return bytes([tid]) + bytes(int(v) for v in table.ravel()[_ZIGZAG])

    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes(
        [3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    return (
        b"\xff\xd8"  # SOI
        + _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + _seg(0xDB, qt_body(0, qt[0]))
        + _seg(0xDB, qt_body(1, qt[1]))
        + _seg(0xC0, sof)
        + _seg(0xC4, _dht_body(0, 0, _DC_SYMBOLS, _DC_LEN))
        + _seg(0xC4, _dht_body(1, 0, _AC_SYMBOLS, _AC_LEN))
        + _seg(0xC4, _dht_body(0, 1, _DC_SYMBOLS, _DC_LEN))
        + _seg(0xC4, _dht_body(1, 1, _AC_SYMBOLS, _AC_LEN))
        + _seg(0xDA, sos)
        + bytes(bitw.out)
        + b"\xff\xd9"  # EOI
    )


# -- decoder ------------------------------------------------------------


class _BitReader:
    """Entropy-coded segment reader: unstuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise EOFError("marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v

    def restart(self) -> None:
        self.acc = 0
        self.nbits = 0
        self.pos += 2  # skip the RSTn marker

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code, ln = 0, 0
        while ln <= 16:
            code = (code << 1) | self.bits(1)
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (H, W, 3) uint8 RGB."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[tuple[int, int, int, int]] = []  # (id, h, v, qid)
    h = w = 0
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        ln = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        body = payload[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                n = 64 * (2 if prec else 1)
                raw = body[i + 1 : i + 1 + n]
                vals = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int64)
                    if prec
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                )
                table = np.zeros(64, dtype=np.int64)
                table[_ZIGZAG] = vals
                qtabs[tid] = table.reshape(8, 8)
                i += 1 + n
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, qid = body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, qid))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline (SOF0/SOF1) JPEG is supported")
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            i = 0
            while i < len(body):
                tclass, tid = body[i] >> 4, body[i] & 0xF
                counts = body[i + 1 : i + 17]
                syms = body[i + 17 : i + 17 + sum(counts)]
                table: dict[tuple[int, int], int] = {}
                code, k = 0, 0
                for length in range(1, 17):
                    for _ in range(counts[length - 1]):
                        table[(length, code)] = syms[k]
                        code += 1
                        k += 1
                    code <<= 1
                htabs[(tclass, tid)] = table
                i += 17 + len(syms)
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan: list[tuple[int, int, int]] = []  # (comp_index, dc_id, ac_id)
            for c in range(ns):
                cid, tids = body[1 + 2 * c], body[2 + 2 * c]
                idx = next(i for i, cm in enumerate(comps) if cm[0] == cid)
                scan.append((idx, tids >> 4, tids & 0xF))
            data_start = pos + 2 + ln
            return _decode_scan(
                payload, data_start, h, w, comps, scan, qtabs, htabs, restart_interval
            )
        pos += 2 + ln
    raise ValueError("no SOS scan found in JPEG")


def _decode_scan(payload, pos, h, w, comps, scan, qtabs, htabs, restart_interval):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * c[2] * 8, mcux * c[1] * 8), dtype=np.float64) for c in comps
    ]
    reader = _BitReader(payload, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # byte-align and consume the RSTn marker
                reader.nbits = 0
                while payload[reader.pos] != 0xFF or not (
                    0xD0 <= payload[reader.pos + 1] <= 0xD7
                ):
                    reader.pos += 1
                reader.restart()
                preds = [0] * len(comps)
            for ci, dc_id, ac_id in scan:
                _, ch, cv, qid = comps[ci]
                q = qtabs[qid]
                dct = htabs[(0, dc_id)]
                act = htabs[(1, ac_id)]
                for by in range(cv):
                    for bx in range(ch):
                        try:
                            zz = np.zeros(64, dtype=np.int64)
                            s = reader.huff(dct)
                            diff = _extend(reader.bits(s), s) if s else 0
                            preds[ci] += diff
                            zz[0] = preds[ci]
                            k = 1
                            while k < 64:
                                sym = reader.huff(act)
                                if sym == 0x00:  # EOB
                                    break
                                run, size = sym >> 4, sym & 0xF
                                if sym == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                k += run
                                if k > 63:
                                    raise ValueError("AC index out of range")
                                zz[k] = _extend(reader.bits(size), size)
                                k += 1
                        except _RestartMarker:
                            raise ValueError("unexpected restart marker") from None
                        block = np.zeros(64, dtype=np.int64)
                        block[_ZIGZAG] = zz
                        deq = block.reshape(8, 8) * q
                        pix = _DCT.T @ deq.astype(np.float64) @ _DCT + 128.0
                        oy = (my * cv + by) * 8
                        ox = (mx * ch + bx) * 8
                        planes[ci][oy : oy + 8, ox : ox + 8] = pix
            mcu_count += 1
    # upsample to full resolution by replication, crop to (h, w)
    out = []
    for (cid, ch, cv, _), plane in zip(comps, planes):
        up = np.repeat(np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1)
        out.append(up[:h, :w])
    if len(out) == 1:
        g = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
