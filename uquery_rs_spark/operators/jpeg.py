"""JFIF (JPEG, ITU T.81) codec in pure numpy — no libjpeg.

Decoder: marker walk (SOI/APP*/COM/DQT/SOF0/SOF2/DHT/DRI/SOS/EOI),
canonical Huffman decode from the file's own DHT segments, DC
prediction + AC run-length, dequantize, inverse zigzag, matrix IDCT,
chroma upsampling by replication for any sampling factors, YCbCr→RGB.
Handles restart markers and byte stuffing. Both BASELINE (SOF0/1,
single scan) and PROGRESSIVE (SOF2, spectral selection + successive
approximation: DC first/refine, AC first/refine with EOB-run coding
per ITU T.81 §G.1.2 / Annex G) streams decode; progressive scans
accumulate into per-component coefficient planes that are finished
with one vectorized dequantize+IDCT pass at EOI. Arithmetic coding
and lossless/hierarchical modes raise NotImplementedError.

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
    tables, fixed-length Huffman tables carried in DHT).

    Coefficients come from the SAME producer the progressive encoder
    uses (_quantized_planes) — the progressive==baseline bit-equality
    invariant the tests assert holds because there is exactly one
    color-convert/pad/DCT/quantize implementation to drift."""
    h, w = img.shape[:2]
    cfs, qt = _quantized_planes(img, quality)
    bh, bw_ = cfs[0].shape[:2]
    bitw = _BitWriter()
    preds = [0, 0, 0]
    for by in range(bh):
        for bx in range(bw_):
            for ci, cf in enumerate(cfs):
                preds[ci] = _encode_block(bitw, cf[by, bx], preds[ci])
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
    """JFIF bytes (baseline SOF0/1 or progressive SOF2) → (H, W, 3)
    uint8 RGB."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[tuple[int, int, int, int]] = []  # (id, h, v, qid)
    h = w = 0
    restart_interval = 0
    progressive = False
    coeffs: list[np.ndarray] | None = None  # progressive accumulation
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, qid = body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, qid))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0/SOF1) and progressive (SOF2) JPEG are supported"
            )
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
            if not progressive:
                return _decode_scan(
                    payload, data_start, h, w, comps, scan, qtabs, htabs, restart_interval
                )
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0xF
            if coeffs is None:
                coeffs = _alloc_coeffs(h, w, comps)
            pos = _decode_progressive_scan(
                payload, data_start, h, w, comps, scan, htabs,
                coeffs, ss, se, ah, al, restart_interval,
            )
            continue
        pos += 2 + ln
    if progressive and coeffs is not None:
        return _finish_coeffs(coeffs, h, w, comps, qtabs)
    raise ValueError("no SOS scan found in JPEG")


def _alloc_coeffs(h: int, w: int, comps) -> list[np.ndarray]:
    """Per-component zigzag-domain coefficient planes, padded to whole
    MCUs (shape: blocks_y, blocks_x, 64)."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    return [
        np.zeros((mcuy * cv, mcux * ch, 64), dtype=np.int64)
        for _, ch, cv, _ in comps
    ]


def _comp_block_dims(h: int, w: int, comps, ci: int) -> tuple[int, int]:
    """Non-interleaved block grid of one component: its downsampled pixel
    dims, each rounded up to whole 8-pixel blocks (T.81 A.2.4)."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    _, ch, cv, _ = comps[ci]
    cw = (w * ch + hmax - 1) // hmax
    chh = (h * cv + vmax - 1) // vmax
    return (chh + 7) // 8, (cw + 7) // 8


def _resync_to_marker(payload: bytes, pos: int) -> int:
    """Advance past entropy data to the next non-RST marker.

    Skips 0xFF FILL bytes (T.81 B.1.1.2 allows any run of FF padding
    before a marker): the returned position always points at the LAST
    FF of a run, so callers read a real marker code — naively stopping
    at the first FF of an FF FF pair would parse marker 0xFF and a
    garbage segment length."""
    while pos < len(payload) - 1:
        if payload[pos] == 0xFF and payload[pos + 1] not in (0x00,) and not (
            0xD0 <= payload[pos + 1] <= 0xD7
        ):
            if payload[pos + 1] == 0xFF:  # fill byte, not yet the marker
                pos += 1
                continue
            return pos
        pos += 1
    return len(payload)


def _decode_progressive_scan(
    payload, pos, h, w, comps, scan, htabs, coeffs, ss, se, ah, al, restart_interval
):
    """One progressive scan (T.81 §G.1.2): decodes into ``coeffs`` and
    returns the stream position of the next marker.

    DC scans (ss == 0) may be interleaved over several components; AC
    scans carry exactly one component and walk its own block raster
    (non-interleaved). First scans (ah == 0) Huffman-decode magnitudes
    shifted left by ``al``; refinement scans (ah > 0) append one
    magnitude bit at position ``al`` per coefficient.
    """
    reader = _BitReader(payload, pos)
    state = {"eobrun": 0}
    preds = [0] * len(comps)

    def correction(block: np.ndarray, idx: int) -> None:
        # G.1.2.3: one buffered bit refines an already-nonzero coefficient
        if reader.bits(1):
            p1 = 1 << al
            if (block[idx] & p1) == 0:
                block[idx] += p1 if block[idx] >= 0 else -p1

    def decode_dc_first(ci: int, block: np.ndarray, dct) -> None:
        s = reader.huff(dct)
        diff = _extend(reader.bits(s), s) if s else 0
        preds[ci] += diff
        block[0] = preds[ci] << al

    def decode_dc_refine(block: np.ndarray) -> None:
        if reader.bits(1):
            block[0] |= 1 << al

    def decode_ac_first(block: np.ndarray, act) -> None:
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            sym = reader.huff(act)
            run, size = sym >> 4, sym & 0xF
            if size == 0:
                if run != 15:  # EOBn: run of end-of-bands
                    state["eobrun"] = (1 << run) - 1
                    if run:
                        state["eobrun"] += reader.bits(run)
                    return
                k += 16  # ZRL
                continue
            k += run
            if k > se:
                raise ValueError("AC index out of band in progressive scan")
            block[k] = _extend(reader.bits(size), size) << al
            k += 1

    def decode_ac_refine(block: np.ndarray, act) -> None:
        p1, m1 = 1 << al, -(1 << al)
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                sym = reader.huff(act)
                run, size = sym >> 4, sym & 0xF
                if size == 0:
                    if run != 15:
                        state["eobrun"] = 1 << run
                        if run:
                            state["eobrun"] += reader.bits(run)
                        break
                    newval = 0  # ZRL: skip 16 zero-history positions
                elif size == 1:
                    newval = p1 if reader.bits(1) else m1
                else:
                    raise ValueError("AC refinement symbol with size > 1")
                # advance over `run` zero-history coefficients, emitting
                # correction bits for nonzero ones passed on the way
                while k <= se:
                    if block[k] != 0:
                        correction(block, k)
                    else:
                        if run == 0:
                            break
                        run -= 1
                    k += 1
                if size and k <= se:
                    block[k] = newval
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if block[k] != 0:
                    correction(block, k)
                k += 1
            state["eobrun"] -= 1

    def handle_restart(unit_count: int) -> None:
        if restart_interval and unit_count and unit_count % restart_interval == 0:
            reader.nbits = 0
            while payload[reader.pos] != 0xFF or not (
                0xD0 <= payload[reader.pos + 1] <= 0xD7
            ):
                reader.pos += 1
            reader.restart()
            preds[:] = [0] * len(comps)
            state["eobrun"] = 0

    if ss == 0:  # DC scan — interleaved MCU walk over the scan's comps
        if se != 0:
            raise ValueError("progressive DC scan must have Se == 0")
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcux = (w + 8 * hmax - 1) // (8 * hmax)
        mcuy = (h + 8 * vmax - 1) // (8 * vmax)
        if len(scan) == 1:  # single-component DC scan is non-interleaved
            ci = scan[0][0]
            bh, bw_ = _comp_block_dims(h, w, comps, ci)
            dct = htabs.get((0, scan[0][1]))
            for n, (by, bx) in enumerate((b, x) for b in range(bh) for x in range(bw_)):
                handle_restart(n)
                block = coeffs[ci][by, bx]
                if ah == 0:
                    decode_dc_first(ci, block, dct)
                else:
                    decode_dc_refine(block)
        else:
            n = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    handle_restart(n)
                    n += 1
                    for ci, dc_id, _ in scan:
                        _, ch, cv, _ = comps[ci]
                        dct = htabs.get((0, dc_id))
                        for by in range(cv):
                            for bx in range(ch):
                                block = coeffs[ci][my * cv + by, mx * ch + bx]
                                if ah == 0:
                                    decode_dc_first(ci, block, dct)
                                else:
                                    decode_dc_refine(block)
    else:  # AC scan — exactly one component, non-interleaved
        if len(scan) != 1:
            raise ValueError("progressive AC scan must carry exactly one component")
        ci, _, ac_id = scan[0]
        act = htabs.get((1, ac_id))
        bh, bw_ = _comp_block_dims(h, w, comps, ci)
        for n, (by, bx) in enumerate((b, x) for b in range(bh) for x in range(bw_)):
            handle_restart(n)
            block = coeffs[ci][by, bx]
            if ah == 0:
                decode_ac_first(block, act)
            else:
                decode_ac_refine(block, act)

    return _resync_to_marker(payload, reader.pos)


def _finish_coeffs(coeffs, h, w, comps, qtabs) -> np.ndarray:
    """Dequantize + de-zigzag + IDCT every accumulated block (vectorized
    over blocks), then upsample/crop/color-convert like the baseline path."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = []
    for (cid, ch, cv, qid), cf in zip(comps, coeffs):
        by, bx, _ = cf.shape
        deq = np.zeros((by * bx, 64), dtype=np.float64)
        deq[:, _ZIGZAG] = cf.reshape(-1, 64) * qtabs[qid].ravel()[_ZIGZAG]
        blocks = deq.reshape(-1, 8, 8)
        pix = np.einsum("ij,njk,kl->nil", _DCT.T, blocks, _DCT) + 128.0
        plane = (
            pix.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        )
        up = np.repeat(np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1)
        planes.append(up[:h, :w])
    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


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


# -- progressive encoder ------------------------------------------------
# Emits a spectral-selection + successive-approximation scan script that
# exercises every progressive decode path (DC first/refine, AC
# first/refine, EOB runs, ZRL-in-refinement). Because the scan script
# transmits every coefficient bit (the Al chain ends at 0 for DC and
# both AC bands), the decoded image is bit-identical to decoding the
# BASELINE encoding of the same pixels — progressive mode is a
# reordering of the same quantized coefficients, which the tests assert
# exactly.

# AC table for progressive scans adds the EOBn symbols (r<<4 | 0 for
# r = 1..14) that baseline never uses.
_AC_PROG_SYMBOLS = (
    [0x00, 0xF0]
    + [r << 4 for r in range(1, 15)]
    + [(run << 4) | size for run in range(16) for size in range(1, 11)]
)
_AC_PROG_CODES = _canonical_codes(_AC_PROG_SYMBOLS, _AC_LEN)


class _ProgACWriter:
    """Per-scan AC entropy state: EOB-run counter plus TWO distinct
    correction-bit buffers (T.81 §G.1.3.2). ``eob_bits`` are the
    refinement bits of blocks already folded into the pending EOB run —
    the decoder reads them right after the EOBn symbol. ``cur_bits``
    are the current block's refinement bits since the last emission —
    the decoder reads those after the NEXT in-block symbol (its
    skip-run walks over them). Merging the two buffers desynchronizes
    the stream whenever an EOB run ends mid-block."""

    def __init__(self, bw: _BitWriter):
        self.bw = bw
        self.eobrun = 0
        self.eob_bits: list[int] = []  # attached to the pending EOB run
        self.cur_bits: list[int] = []  # current block, since last symbol

    def sym(self, s: int) -> None:
        code, ln = _AC_PROG_CODES[s]
        self.bw.put(code, ln)

    def emit_cur(self) -> None:
        for b in self.cur_bits:
            self.bw.put(b, 1)
        self.cur_bits = []

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.sym(nbits << 4)
            if nbits:
                self.bw.put(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
            for b in self.eob_bits:
                self.bw.put(b, 1)
            self.eob_bits = []

    def count_eob(self) -> None:
        """Fold the current block (and its buffered bits) into the run."""
        self.eobrun += 1
        self.eob_bits += self.cur_bits
        self.cur_bits = []
        if self.eobrun == 0x7FFF:
            self.flush_eobrun()


def _quantized_planes(img: np.ndarray, quality: int):
    """(H, W, 3) RGB → per-component (bh, bw, 64) zigzag coefficient
    arrays (4:4:4), plus the two scaled quant tables. The SINGLE
    coefficient producer for both the baseline and progressive encoders
    — their bit-equality invariant depends on sharing this path."""
    h, w = img.shape[:2]
    px = img.astype(np.float64)
    y = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    cb = -0.168736 * px[:, :, 0] - 0.331264 * px[:, :, 1] + 0.5 * px[:, :, 2] + 128.0
    cr = 0.5 * px[:, :, 0] - 0.418688 * px[:, :, 1] - 0.081312 * px[:, :, 2] + 128.0
    qt = [_scaled_quant(_QUANT_LUM, quality), _scaled_quant(_QUANT_CHROM, quality)]
    bh, bw_ = (h + 7) // 8, (w + 7) // 8
    comps = []
    for ci, plane in enumerate([y, cb, cr]):
        out = np.zeros((bh, bw_, 64), dtype=np.int64)
        q = qt[0 if ci == 0 else 1]
        for by in range(bh):
            for bx in range(bw_):
                block = np.full((8, 8), plane[min(by * 8, h - 1), min(bx * 8, w - 1)])
                tile = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                block[: tile.shape[0], : tile.shape[1]] = tile
                if tile.shape[0] < 8:
                    block[tile.shape[0] :, :] = block[tile.shape[0] - 1, :]
                if tile.shape[1] < 8:
                    block[:, tile.shape[1] :] = block[:, tile.shape[1] - 1 : tile.shape[1]]
                coeffs = _DCT @ (block - 128.0) @ _DCT.T
                out[by, bx] = np.round(coeffs / q).astype(np.int64).ravel()[_ZIGZAG]
        comps.append(out)
    return comps, qt


def _encode_dc_first_scan(comps_coeffs, al: int) -> bytes:
    bw = _BitWriter()
    bh, bw_, _ = comps_coeffs[0].shape
    preds = [0] * len(comps_coeffs)
    for by in range(bh):
        for bx in range(bw_):
            for ci, cf in enumerate(comps_coeffs):
                # arithmetic >> == the spec's floor point transform
                v = int(cf[by, bx, 0]) >> al
                size, bits = _magnitude(v - preds[ci])
                code, ln = _DC_CODES[size]
                bw.put(code, ln)
                if size:
                    bw.put(bits, size)
                preds[ci] = v
    bw.flush()
    return bytes(bw.out)


def _encode_dc_refine_scan(comps_coeffs, al: int) -> bytes:
    bw = _BitWriter()
    bh, bw_, _ = comps_coeffs[0].shape
    for by in range(bh):
        for bx in range(bw_):
            for cf in comps_coeffs:
                bw.put((int(cf[by, bx, 0]) >> al) & 1, 1)
    bw.flush()
    return bytes(bw.out)


def _encode_ac_first_scan(cf: np.ndarray, ss: int, se: int, al: int) -> bytes:
    bw = _BitWriter()
    st = _ProgACWriter(bw)
    bh, bw_, _ = cf.shape
    for by in range(bh):
        for bx in range(bw_):
            block = cf[by, bx]
            run = 0
            for k in range(ss, se + 1):
                v = int(block[k])
                t = (abs(v) >> al) * (1 if v >= 0 else -1)
                if t == 0:
                    run += 1
                    continue
                st.flush_eobrun()
                while run > 15:
                    st.sym(0xF0)
                    run -= 16
                size, bits = _magnitude(t)
                st.sym((run << 4) | size)
                bw.put(bits, size)
                run = 0
            if run > 0:
                st.count_eob()
    st.flush_eobrun()
    bw.flush()
    return bytes(bw.out)


def _encode_ac_refine_scan(cf: np.ndarray, ss: int, se: int, al: int) -> bytes:
    bw = _BitWriter()
    st = _ProgACWriter(bw)
    bh, bw_, _ = cf.shape
    for by in range(bh):
        for bx in range(bw_):
            block = cf[by, bx]
            t = [abs(int(block[k])) >> al for k in range(64)]
            # last newly-visible coefficient; ZRLs are pointless past it
            eobpos = ss - 1
            for k in range(ss, se + 1):
                if t[k] == 1:
                    eobpos = k
            run = 0
            for k in range(ss, se + 1):
                if t[k] == 0:
                    run += 1
                    continue
                while run > 15 and k <= eobpos:
                    st.flush_eobrun()
                    st.sym(0xF0)
                    run -= 16
                    st.emit_cur()
                if t[k] > 1:
                    st.cur_bits.append(t[k] & 1)
                    continue
                st.flush_eobrun()
                st.sym((run << 4) | 1)
                bw.put(1 if int(block[k]) > 0 else 0, 1)
                st.emit_cur()
                run = 0
            if run > 0 or st.cur_bits:
                st.count_eob()
    st.flush_eobrun()
    bw.flush()
    return bytes(bw.out)


def encode_jpeg_progressive(img: np.ndarray, quality: int = 90) -> bytes:
    """(H, W, 3) uint8 RGB → progressive (SOF2) JFIF bytes.

    Scan script (per T.81 §G.1: first DC scans, then per-component AC
    bands, each refined down to Al = 0):
      1. DC first, interleaved, Al=1        4-9.  AC first 1-5 / 6-63, Al=1
      2. DC refine, Al=0                   10-15. AC refine, Al=0
    Decodes to EXACTLY the pixels of ``decode_jpeg(encode_jpeg(img,
    quality))`` — same coefficients, different transmission order.
    """
    h, w = img.shape[:2]
    cfs, qt = _quantized_planes(img, quality)

    def qt_body(tid: int, table: np.ndarray) -> bytes:
        return bytes([tid]) + bytes(int(v) for v in table.ravel()[_ZIGZAG])

    def sos(comp_specs: list[tuple[int, int, int]], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comp_specs)])
        for cid, dc_id, ac_id in comp_specs:
            body += bytes([cid, (dc_id << 4) | ac_id])
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes(
        [3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    out = bytearray()
    out += b"\xff\xd8"
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, qt_body(0, qt[0]))
    out += _seg(0xDB, qt_body(1, qt[1]))
    out += _seg(0xC2, sof)
    out += _seg(0xC4, _dht_body(0, 0, _DC_SYMBOLS, _DC_LEN))
    out += _seg(0xC4, _dht_body(1, 0, _AC_PROG_SYMBOLS, _AC_LEN))

    all_comps = [(1, 0, 0), (2, 0, 0), (3, 0, 0)]
    out += sos(all_comps, 0, 0, 0, 1)
    out += _encode_dc_first_scan(cfs, 1)
    out += sos(all_comps, 0, 0, 1, 0)
    out += _encode_dc_refine_scan(cfs, 0)
    for ci in range(3):
        spec = [all_comps[ci]]
        out += sos(spec, 1, 5, 0, 1)
        out += _encode_ac_first_scan(cfs[ci], 1, 5, 1)
        out += sos(spec, 6, 63, 0, 1)
        out += _encode_ac_first_scan(cfs[ci], 6, 63, 1)
    for ci in range(3):
        spec = [all_comps[ci]]
        out += sos(spec, 1, 5, 1, 0)
        out += _encode_ac_refine_scan(cfs[ci], 1, 5, 0)
        out += sos(spec, 6, 63, 1, 0)
        out += _encode_ac_refine_scan(cfs[ci], 6, 63, 0)
    out += b"\xff\xd9"
    return bytes(out)
