"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference surface (driver north star). Real pipelines carry
image/audio/video as `binary` columns with a metadata struct; decode /
feature-extraction runs as Arrow-batched pandas iterators (mapInPandas).

Decode support (round 3): every raster format parses natively — netpbm
P5/P6 and BMP (BI_RGB 8/24/32-bit) with numpy, 8-bit PNG with stdlib
zlib plus a full unfilter (None/Sub/Up/Average/Paeth; gray/RGB/palette/
alpha color types), and JFIF JPEG — baseline SOF0 and progressive SOF2
— via the pure-numpy codec in jpeg.py (Huffman + DCT both directions,
round 4 adds spectral-selection/successive-approximation progressive
scans both directions) — so featurize/resize are
genuinely pixel-dependent, with re-encode to PPM. Only video remains
codec-gated (NotImplementedError); unknown payloads fall back to the
deterministic byte-histogram fake so metadata-only pipelines stay
runnable.

Scale design: mapInPandas streams Arrow batches through Python once, with
no row-wise serde; metadata-only operations (sizes, magic-byte sniffing)
stay JVM-side so Catalyst can prune the heavy binary column when it isn't
needed.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

# all raster decode natively (stdlib zlib + numpy, incl. the baseline
# JPEG codec in jpeg.py); only video remains codec-gated
REAL_DECODERS_AVAILABLE = ("ppm", "pgm", "bmp", "png", "jpeg")


def synthesize_binary_docs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Treat each document's UTF-8 bytes as an opaque media payload with a
    typed metadata struct — the schema a real image/audio table carries.

    Synthetic width/height derive from md5 prefixes of the payload (not
    crc32): md5 is bit-identical in every engine, so SQL oracles can
    recompute the dims — DuckDB: ``('0x' || substr(md5(text), 1, 8))::BIGINT``.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    w_hash = F.conv(F.substring(F.md5(payload), 1, 8), 16, 10).cast("long")
    h_hash = F.conv(F.substring(F.md5(payload), 9, 8), 16, 10).cast("long")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
            (w_hash % 1920).cast("int").alias("width"),
            (h_hash % 1080).cast("int").alias("height"),
        ).alias("meta"),
    )


def _decode_netpbm(payload: bytes) -> np.ndarray:
    """P5 (gray) / P6 (RGB) binary netpbm → (H, W, 3) uint8."""
    toks: list[bytes] = []
    i = 2  # past magic
    while len(toks) < 3 and i < len(payload):
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to EOL
            i = payload.index(b"\n", i) + 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        toks.append(payload[i:j])
        i = j
    w, h, maxval = (int(t) for t in toks)
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    i += 1  # single whitespace after maxval
    ch = 3 if payload[:2] == b"P6" else 1
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=i)
    img = px.reshape(h, w, ch)
    return np.repeat(img, 3, axis=2) if ch == 1 else img


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed (BI_RGB) 8/24/32-bit BMP → (H, W, 3) uint8."""
    if int.from_bytes(payload[30:34], "little") != 0:
        raise NotImplementedError("compressed BMP not supported")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"{bpp}-bit BMP not supported")
    bottom_up, h = h > 0, abs(h)
    nbytes = bpp // 8
    stride = (w * nbytes + 3) & ~3  # rows pad to 4 bytes
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=off)
    rows = rows.reshape(h, stride)[:, : w * nbytes].reshape(h, w, nbytes)
    if bottom_up:
        rows = rows[::-1]
    if nbytes == 1:
        return np.repeat(rows, 3, axis=2)
    return rows[:, :, 2::-1]  # BGR(A) → RGB


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _decode_png(payload: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG → (H, W, 3) uint8, stdlib zlib + numpy.

    Full filter support (None/Sub/Up/Average/Paeth, per-row); color types
    0 gray, 2 RGB, 3 palette, 4 gray+alpha, 6 RGBA (alpha dropped —
    featurize/resize work on opaque RGB). 16-bit and interlaced images
    raise NotImplementedError."""
    import zlib

    pos, idat, plte = 8, [], None
    w = h = depth = ctype = interlace = 0
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            depth, ctype, interlace = body[8], body[9], body[12]
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln  # length + tag + crc
    if depth != 8 or interlace:
        raise NotImplementedError(f"PNG bit depth {depth}/interlace {interlace} not supported")
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    lines = np.frombuffer(raw, dtype=np.uint8, count=h * (stride + 1)).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f, cur = lines[y, 0], lines[y, 1:].astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y else np.zeros(stride, dtype=np.int64)
        if f == 0:
            rec = cur
        elif f == 2:  # Up
            rec = (cur + prev) & 0xFF
        else:  # Sub/Average/Paeth recur on the left pixel: per-pixel scan
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = prev[x]
                if f == 1:
                    rec[x] = (cur[x] + a) & 0xFF
                elif f == 3:
                    rec[x] = (cur[x] + (a + b) // 2) & 0xFF
                else:  # Paeth
                    c = prev[x - ch] if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[x] = (cur[x] + pred) & 0xFF
        out[y] = rec.astype(np.uint8)
    px = out.reshape(h, w, ch)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        return plte[px[:, :, 0]]
    if ch == 1:
        return np.repeat(px, 3, axis=2)
    if ch == 2:  # gray + alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]


def encode_png(img: np.ndarray, cycle_filters: bool = False) -> bytes:
    """(H, W, 3) uint8 → PNG. `cycle_filters` rotates row filters through
    None/Sub/Up/Average/Paeth so roundtrip tests exercise every unfilter
    path (a real encoder picks per-row filters the same way)."""
    import zlib

    img = img.astype(np.uint8)
    h, w = img.shape[:2]
    raw = bytearray()
    prev = np.zeros((w, 3), dtype=np.int64)
    for y in range(h):
        row = img[y].astype(np.int64)
        f = (y % 5) if cycle_filters else 0
        left = np.vstack([np.zeros((1, 3), dtype=np.int64), row[:-1]])
        upleft = np.vstack([np.zeros((1, 3), dtype=np.int64), prev[:-1]])
        if f == 0:
            enc = row
        elif f == 1:
            enc = row - left
        elif f == 2:
            enc = row - prev
        elif f == 3:
            enc = row - (left + prev) // 2
        else:
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft))
            enc = row - pred
        raw.append(f)
        raw += (enc & 0xFF).astype(np.uint8).tobytes()
        prev = row

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            len(body).to_bytes(4, "big")
            + tag
            + body
            + (zlib.crc32(tag + body) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _lzw_decode_gif(min_code_size: int, data: bytes) -> list[int]:
    """GIF-variant LZW: little-endian bit packing, CLEAR resets the
    table, code width grows when the next entry would overflow it
    (capped at 12 bits). Returns the index stream."""
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh():
        return {i: (i,) for i in range(clear)}

    table = fresh()
    width = min_code_size + 1
    next_code = eoi + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    acc = bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                table = fresh()
                width = min_code_size + 1
                next_code = eoi + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
                table[next_code] = prev + (entry[0],)
                next_code += 1
            elif code == next_code:
                entry = prev + (prev[0],)
                table[next_code] = entry
                next_code += 1
            else:
                raise ValueError("corrupt GIF LZW stream")
            out.extend(entry)
            prev = entry
            if next_code == (1 << width) and width < 12:
                width += 1
    return out


def _lzw_encode_gif(min_code_size: int, indices: "np.ndarray") -> bytes:
    """Real LZW compression (dictionary growth + width bumps + 12-bit
    cap with CLEAR reset) — the encoder the decoder above round-trips."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    width = min_code_size + 1
    next_code = eoi + 1
    acc = bits = 0
    out = bytearray()

    def emit(code: int):
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    emit(clear)
    run: tuple[int, ...] = ()
    for v in indices.tolist():
        cand = run + (v,)
        if cand in table:
            run = cand
            continue
        emit(table[run])
        table[cand] = next_code
        next_code += 1
        # the DECODER bumps width when next_code reaches the limit;
        # mirror exactly, resetting at the 12-bit cap
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        elif next_code == (1 << 12) + 1:
            emit(clear)
            table = {(i,): i for i in range(clear)}
            width = min_code_size + 1
            next_code = eoi + 1
        run = (v,)
    if run:
        emit(table[run])
    emit(eoi)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _decode_gif(payload: bytes) -> np.ndarray:
    """GIF87a/89a first frame: global/local color tables, extension
    skipping, interlace reorder, LZW decompression — stdlib + numpy
    only, same contract as the other native decoders."""
    if payload[:4] != b"GIF8":
        raise ValueError("not a GIF payload")
    pos = 6
    sw, sh, flags = struct.unpack_from("<HHB", payload, pos)
    pos += 7
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos]:
                pos += payload[pos] + 1
            pos += 1
        elif b == 0x2C:  # image descriptor
            _x, _y, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                ct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF image without a color table")
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos]:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += ln + 1
            pos += 1
            idx = np.array(
                _lzw_decode_gif(min_code, bytes(data))[: w * h], np.int64
            ).reshape(h, w)
            if iflags & 0x40:  # interlaced: 4-pass row order
                order = np.concatenate(
                    [np.arange(0, h, 8), np.arange(4, h, 8),
                     np.arange(2, h, 4), np.arange(1, h, 2)]
                )
                deinter = np.empty_like(idx)
                deinter[order] = idx
                idx = deinter
            return ct[idx].astype(np.uint8)
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image data")


def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """(H, W, 3) uint8 → GIF89a with a 256-entry grayscale global color
    table; pixels map through luminance-free channel 0 (callers pass
    channel-equal images, the closed-form convention). Real LZW."""
    h, w = img.shape[:2]
    idx = img[:, :, 0].astype(np.uint8)
    if interlace:
        order = np.concatenate(
            [np.arange(0, h, 8), np.arange(4, h, 8),
             np.arange(2, h, 4), np.arange(1, h, 2)]
        )
        idx = idx[order]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # 256-color GCT
    pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
    out += pal.tobytes()
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE (no transparency)
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
    )
    out += bytes([8])  # LZW min code size
    comp = _lzw_encode_gif(8, idx.reshape(-1))
    for i in range(0, len(comp), 255):
        chunk = comp[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an (H, W, 3) uint8 array.

    Native paths (stdlib + numpy only): netpbm P5/P6, uncompressed BMP,
    8-bit non-interlaced PNG (zlib inflate + full unfilter). JPEG/video
    codecs raise NotImplementedError naming the missing dependency —
    callers with metadata-only needs use the fallback featurizer instead.
    """
    if payload[:2] in (b"P5", b"P6"):
        return _decode_netpbm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == _PNG_MAGIC:
        return _decode_png(payload)
    if payload[:4] == b"GIF8":
        return _decode_gif(payload)
    if payload[:2] == b"\xff\xd8":
        from . import jpeg

        return jpeg.decode_jpeg(payload)
    raise ValueError(
        "unrecognized image payload (supported natively: P5/P6 netpbm, "
        "BMP, PNG, GIF, baseline JPEG)"
    )


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary P6 netpbm (the dependency-free re-encode
    target for resize)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → uncompressed 24-bit BI_RGB BMP (bottom-up rows,
    BGR order, 4-byte row stride) — the third container format for the
    cross-codec dedup check; round-trips through _decode_bmp exactly."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = rows.tobytes()
    off = 14 + 40
    header = (
        b"BM"
        + (off + len(data)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)  # positive = bottom-up
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + len(data).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + data


def resize_nearest(img: np.ndarray, max_dim: int) -> np.ndarray:
    """Deterministic nearest-neighbor downscale so max(h, w) <= max_dim."""
    h, w = img.shape[:2]
    scale = min(1.0, max_dim / max(h, w, 1))
    nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
    yi = (np.arange(nh) * h // nh).astype(np.int64)
    xi = (np.arange(nw) * w // nw).astype(np.int64)
    return img[yi][:, xi]


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for non-decodable payloads: a 16-bin
    histogram of byte values — stable across engines/platforms and cheap."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    return np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM).astype(np.int64)


def _features(payload: bytes) -> np.ndarray:
    """Pixel features when the payload decodes (16-bin integer luminance
    histogram — deterministic: (299R+587G+114B)//1000), else the byte
    histogram fallback."""
    try:
        img = decode_image(bytes(payload))
    except (NotImplementedError, ValueError):
        return _fake_features(payload)
    px = img.astype(np.int64)
    lum = (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
    return np.bincount((lum * FEATURE_DIM // 256).ravel(), minlength=FEATURE_DIM).astype(
        np.int64
    )


def extract_features(binary_docs: DataFrame) -> DataFrame:
    """payload → FEATURE_DIM histogram features via mapInPandas.

    Decodable payloads (P5/P6/BMP) get real luminance histograms; opaque
    ones fall back to the byte histogram. Output: doc_id, n_bytes,
    features array<bigint>, feature_sum.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "features": [f.tolist() for f in feats],
                    "feature_sum": [int(f.sum()) for f in feats],
                }
            )

    return binary_docs.mapInPandas(
        batches, schema="doc_id long, n_bytes long, features array<long>, feature_sum long"
    )


def resize_images(binary_docs: DataFrame, max_dim: int = 256) -> DataFrame:
    """Image resize via mapInPandas: decode → nearest-neighbor resample →
    re-encode as P6 netpbm, all inside the Arrow-batched iterator.

    Payloads that don't decode natively (no codec in this container) pass
    through with metadata-only scaling — the production schema, batch
    shape, and column flow are identical either way. Output schema
    matches the input (doc_id, payload, meta).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, metas = [], []
            for p, m in zip(pdf["payload"], pdf["meta"]):
                try:
                    img = resize_nearest(decode_image(bytes(p)), max_dim)
                    out = encode_ppm(img)
                    payloads.append(out)
                    metas.append(
                        {
                            "n_bytes": len(out),
                            "mime": "image/x-portable-pixmap",
                            "width": img.shape[1],
                            "height": img.shape[0],
                        }
                    )
                except (NotImplementedError, ValueError):
                    w, h = int(m["width"]), int(m["height"])
                    scale = min(1.0, max_dim / max(w, h, 1))
                    payloads.append(p)
                    metas.append(
                        {
                            "n_bytes": int(m["n_bytes"]),
                            "mime": m["mime"],
                            "width": int(w * scale),
                            "height": int(h * scale),
                        }
                    )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads, "meta": metas}
            )

    return binary_docs.mapInPandas(
        batches,
        schema="doc_id long, payload binary, "
        "meta struct<n_bytes: long, mime: string, width: int, height: int>",
    )


def synthesize_image_docs(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic images derived from the id: w = id%13+4, h = id%7+4,
    pixel (y, x) = (id + 7y + 3x) % 256 in every channel. Even ids encode
    as P6 netpbm, odd ids as PNG with cycling row filters — the same
    closed form through both native decoders.

    Closed-form by construction, so decode-path outputs (dims, luminance
    stats) have an exact SQL oracle — the decode step is hash-checkable
    without any image library on the oracle side."""
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def gen(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            w, h = i % 13 + 4, i % 7 + 4
            y = np.arange(h)[:, None]
            x = np.arange(w)[None, :]
            v = ((i + 7 * y + 3 * x) % 256).astype(np.uint8)
            img = np.repeat(v[:, :, None], 3, axis=2)
            out.append(encode_png(img, cycle_filters=True) if i % 2 else encode_ppm(img))
        return pd.Series(out)

    return docs.select(id_col, gen(F.col(id_col)).alias("payload"))


def synthesize_gif_docs(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic GIFs from the id — the same closed form as
    synthesize_image_docs (w = id%13+4, h = id%7+4, pixel (y,x) =
    (id+7y+3x) % 256, channel-equal) through the GIF89a/LZW encoder;
    odd ids are INTERLACED (4-pass row order) so the deinterlace path
    is exercised under the same oracle."""
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def gen(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            w, h = i % 13 + 4, i % 7 + 4
            y = np.arange(h)[:, None]
            x = np.arange(w)[None, :]
            v = ((i + 7 * y + 3 * x) % 256).astype(np.uint8)
            img = np.repeat(v[:, :, None], 3, axis=2)
            out.append(encode_gif(img, interlace=bool(i % 2)))
        return pd.Series(out)

    return docs.select(id_col, gen(F.col(id_col)).alias("payload"))


def synthesize_image_class_docs(
    docs: DataFrame, id_col: str = "doc_id", n_classes: int = 29
) -> DataFrame:
    """Images whose PIXELS depend only on id % n_classes while the
    CONTAINER format cycles with the raw id (P6 / PNG / BMP): every
    class member holds identical pixel content behind a different byte
    encoding. The fixture for decode-normalized dedup — payload-level
    hashing sees all-distinct bytes; only a correct decode through all
    three codecs recovers the planted classes.

    Class geometry/pixels reuse the synthesize_image_docs closed form
    with class in place of id, so class membership is SQL-predictable
    (id % n_classes) for the oracle."""
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def gen(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            c = i % n_classes
            w, h = c % 13 + 4, c % 7 + 4
            y = np.arange(h)[:, None]
            x = np.arange(w)[None, :]
            v = ((c + 7 * y + 3 * x) % 256).astype(np.uint8)
            img = np.repeat(v[:, :, None], 3, axis=2)
            enc = (encode_ppm, lambda a: encode_png(a, cycle_filters=True), encode_bmp)[
                i % 3
            ]
            out.append(enc(img))
        return pd.Series(out)

    return docs.select(id_col, gen(F.col(id_col)).alias("payload"))


def pixel_dedup(binary_docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode-normalized exact image dedup: decode each payload to its
    canonical (H, W, 3) RGB array, hash dims + pixel bytes, group by the
    hash. Finds the same image saved under different containers/encodings
    (PNG vs BMP vs PPM, different PNG filter choices) that payload-level
    sha256 can never match. Columns: canonical_id (lowest id), n_copies,
    width, height.

    Scale shape: decode + hash is a narrow mapInPandas pass (payload in,
    36-char hash out); the groupBy shuffles only (id, hash, dims) rows.
    """
    import hashlib

    def hash_pixels(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids, hs, ws, hts = [], [], [], []
            for i, payload in zip(pdf[id_col], pdf["payload"]):
                img = decode_image(bytes(payload))
                d = hashlib.sha256()
                d.update(np.array(img.shape, dtype="int64").tobytes())
                d.update(np.ascontiguousarray(img).tobytes())
                ids.append(i)
                hs.append(d.hexdigest())
                hts.append(img.shape[0])
                ws.append(img.shape[1])
            yield pd.DataFrame(
                {"id": ids, "h": hs, "width": ws, "height": hts}
            )

    hashed = binary_docs.select(id_col, "payload").mapInPandas(
        hash_pixels, "id long, h string, width int, height int"
    )
    return hashed.groupBy("h").agg(
        F.min("id").alias("canonical_id"),
        F.count("*").alias("n_copies"),
        F.first("width").alias("width"),
        F.first("height").alias("height"),
    ).drop("h")


def synthesize_jpeg_docs(
    docs: DataFrame, id_col: str = "doc_id", progressive: bool | str = False
) -> DataFrame:
    """Constant-color JPEGs from the id: w = id%13+4, h = id%7+4,
    every pixel = id % 256, quality 100.

    At quality 100 all quantizer steps are 1 and a constant block has
    only an exactly-representable DC coefficient, so the lossy codec
    round-trips these images EXACTLY (asserted in tests) — giving the
    JPEG decode path a closed-form SQL oracle just like the PPM/PNG one.

    ``progressive`` selects the encoding mode: False → baseline SOF0,
    True → progressive SOF2 (multi-scan spectral selection + successive
    approximation), "mixed" → odd ids progressive, even ids baseline —
    a realistic corpus carries both."""
    from pyspark.sql.types import BinaryType

    from .jpeg import encode_jpeg, encode_jpeg_progressive

    @F.pandas_udf(BinaryType())
    def gen(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            img = np.full((i % 7 + 4, i % 13 + 4, 3), i % 256, dtype=np.uint8)
            prog = progressive if progressive != "mixed" else bool(i % 2)
            enc = encode_jpeg_progressive if prog else encode_jpeg
            out.append(enc(img, quality=100))
        return pd.Series(out)

    return docs.select(id_col, gen(F.col(id_col)).alias("payload"))


def decode_stats(binary_docs: DataFrame) -> DataFrame:
    """Decode each payload and emit pixel-derived scalars: real dims from
    the decoded array and integer-luminance mean ((299R+587G+114B)//1000).
    Raw double mean — callers round with F.round (HALF_UP, matching SQL
    engines; numpy/python round is banker's and diverges at half-cents)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {"doc_id": [], "width": [], "height": [], "mean_lum": []}
            for i, p in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_image(bytes(p)).astype(np.int64)
                lum = (299 * img[:, :, 0] + 587 * img[:, :, 1] + 114 * img[:, :, 2]) // 1000
                rows["doc_id"].append(int(i))
                rows["width"].append(img.shape[1])
                rows["height"].append(img.shape[0])
                rows["mean_lum"].append(float(lum.mean()))
            yield pd.DataFrame(rows)

    return binary_docs.mapInPandas(
        batches, "doc_id long, width long, height long, mean_lum double"
    )


def frame_sample_plan(binary_docs: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' plumbing: take every Nth byte offset as a frame
    index — the partition/batch shape of real video frame extraction,
    JVM-side (sequence + explode), binary column pruned unless needed."""
    n_frames = F.floor(F.col("meta.n_bytes") / every_n_bytes).cast("int")
    return binary_docs.select(
        "doc_id",
        F.posexplode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))).alias(
            "frame_idx", "frame_offset_unit"
        ),
    ).select("doc_id", "frame_idx", (F.col("frame_idx") * every_n_bytes).alias("byte_offset"))


def _frame_header(payload: bytes, pos: int) -> tuple[int, int, int, int]:
    """Parse ONE P6 frame header at ``pos`` of a concatenated stream;
    returns (w, h, data_start, next_pos) WITHOUT touching pixel bytes —
    skipped frames cost a header read plus an offset jump."""
    if payload[pos : pos + 2] != b"P6":
        raise ValueError(f"not a P6 frame at offset {pos}")
    toks: list[int] = []
    i = pos + 2
    end = len(payload)
    while len(toks) < 3:
        while i < end and payload[i : i + 1].isspace():
            i += 1
        j = i
        while j < end and not payload[j : j + 1].isspace():
            j += 1
        if j >= end:
            # EOF inside the header (a valid header is followed by pixel
            # bytes): error out rather than scanning past the buffer.
            raise ValueError(f"truncated P6 frame header at offset {pos}")
        toks.append(int(payload[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    w, h, _maxval = toks
    return w, h, i, i + w * h * 3


def synthesize_video_docs(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic 'videos': doc_id -> id%5+2 concatenated P6 frames,
    frame f pixel (y, x) = (id + 11f + 7y + 3x) % 256 in every channel,
    dims w = id%13+4, h = id%7+4. A real (if minimal) container format —
    frame boundaries exist only in the bytes and must be parsed — with a
    closed form that gives frame sampling an exact SQL oracle."""
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def gen(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            w, h = i % 13 + 4, i % 7 + 4
            y = np.arange(h)[:, None]
            x = np.arange(w)[None, :]
            frames = []
            for f in range(i % 5 + 2):
                v = ((i + 11 * f + 7 * y + 3 * x) % 256).astype(np.uint8)
                frames.append(encode_ppm(np.repeat(v[:, :, None], 3, axis=2)))
            out.append(b"".join(frames))
        return pd.Series(out)

    return docs.select(id_col, gen(F.col(id_col)).alias("payload"))


def sample_video_frames(binary_docs: DataFrame, every: int = 2) -> DataFrame:
    """REAL frame sampling over the concatenated-P6 container: walk the
    byte stream frame by frame, decode every ``every``-th frame, emit
    per-frame pixel stats. Columns: doc_id, frame_idx, width, height,
    mean_lum.

    Real codecs (H.264 etc.) stay out of scope — no codec libs in this
    container — but the pipeline shape is the production one: Arrow
    batches of opaque bytes in, a seekable-container parse per payload,
    frame-level rows out. Skipped frames are SKIPPED at parse time
    (header read + offset jump, no pixel decode) — the I/O pattern that
    makes sparse sampling cheap on real containers."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "width": [], "height": [], "mean_lum": []
            }
            for i, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload, pos, f = bytes(payload), 0, 0
                while pos < len(payload):
                    w, h, start, pos = _frame_header(payload, pos)
                    if f % every == 0:
                        frame = np.frombuffer(
                            payload[start:pos], dtype=np.uint8
                        ).reshape(h, w, 3)
                        img = frame.astype(np.int64)
                        lum = (299 * img[:, :, 0] + 587 * img[:, :, 1] + 114 * img[:, :, 2]) // 1000
                        rows["doc_id"].append(int(i))
                        rows["frame_idx"].append(f)
                        rows["width"].append(frame.shape[1])
                        rows["height"].append(frame.shape[0])
                        rows["mean_lum"].append(float(lum.mean()))
                    f += 1
            yield pd.DataFrame(rows)

    return binary_docs.mapInPandas(
        batches, "doc_id long, frame_idx int, width long, height long, mean_lum double"
    )


def _encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono PCM → RIFF/WAVE bytes (stdlib struct, no audio libs)."""
    import struct

    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)  # PCM, mono
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def _decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM-16 mono → (int16 samples, sample_rate). Walks RIFF
    chunks (fmt may be followed by LIST/fact etc. before data)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            audio_fmt, channels, rate = struct.unpack("<HHI", body[:8])
            if audio_fmt != 1 or channels != 1:
                raise NotImplementedError("only PCM mono WAV decodes natively")
        elif tag == b"data":
            data = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    return data, rate


def synthesize_audio_docs(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic WAVs from the id: n = id%50+10 samples at 8 kHz,
    sample[t] = ((id * 37 + t * 13) % 2001) - 1000 — closed-form int16
    PCM, so decoded duration/amplitude stats have an exact SQL oracle."""
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def gen(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            t = np.arange(i % 50 + 10, dtype=np.int64)
            samples = (i * 37 + t * 13) % 2001 - 1000
            out.append(_encode_wav(samples))
        return pd.Series(out)

    return docs.select(id_col, gen(F.col(id_col)).alias("payload"))


def audio_rms_windows(binary_docs: DataFrame, window: int = 8) -> DataFrame:
    """Native WAV decode → windowed RMS loudness envelope: per clip,
    RMS over fixed sample windows plus a silence flag — the segmentation
    primitive speech pipelines use for silence trimming and VAD
    pre-filtering. One reduceat per clip inside the Arrow batch; output
    rows are windows (samples/window-fold smaller than the audio).
    Columns: doc_id, win, n, rms, is_silent."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {
                "doc_id": [], "win": [], "n": [], "rms": [], "is_silent": []
            }
            for i, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples, _ = _decode_wav(bytes(payload))
                x = samples.astype(np.float64)
                starts = np.arange(0, len(x), window)
                sq = np.add.reduceat(x * x, starts)
                counts = np.diff(np.append(starts, len(x)))
                rms = np.sqrt(sq / counts)
                rows["doc_id"].extend([int(i)] * len(starts))
                rows["win"].extend(range(len(starts)))
                rows["n"].extend(counts.tolist())
                rows["rms"].extend(rms.tolist())
                rows["is_silent"].extend((rms < 450.0).tolist())
            yield pd.DataFrame(rows)

    return binary_docs.mapInPandas(
        batches, "doc_id long, win long, n long, rms double, is_silent boolean"
    )


def audio_stats(binary_docs: DataFrame) -> DataFrame:
    """Native WAV decode → per-clip stats: n_samples, sample_rate,
    mean_abs amplitude. Arrow-batched like every other media kernel."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {
                "doc_id": [], "n_samples": [], "sample_rate": [], "mean_abs": []
            }
            for i, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples, rate = _decode_wav(bytes(payload))
                rows["doc_id"].append(int(i))
                rows["n_samples"].append(len(samples))
                rows["sample_rate"].append(rate)
                rows["mean_abs"].append(float(np.abs(samples.astype(np.int64)).mean()))
            yield pd.DataFrame(rows)

    return binary_docs.mapInPandas(
        batches, "doc_id long, n_samples long, sample_rate long, mean_abs double"
    )
