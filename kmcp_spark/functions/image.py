"""Pure-numpy/stdlib image codecs + perceptual hashing.

REAL decode for four container formats — PPM (P6), BMP (24-bit
BI_RGB), PNG (8-bit gray/RGB/RGBA, all five scanline filters, stdlib
``zlib``), and baseline-sequential JPEG (``functions/jpeg.py``: Huffman
entropy decode + vectorized IDCT, 4:4:4/4:2:2/4:2:0, restart markers)
— so the multimodal image path exercises actual bytes end-to-end in
this codec-library-free container.  Progressive/arithmetic/12-bit JPEG
raise ValueError and land as ``decode_ok=false`` flow-through.

Perceptual hash: dHash (difference hash — area-downscale the luma to
9x8, compare horizontally adjacent cells, pack 64 bits).  PNG/BMP/PPM
round-trips are lossless, so the SAME pixels re-encoded there produce
the SAME dHash; JPEG q>=90 re-encodes measure <=5 bits of drift on the
synthetic corpus, and mild photometric edits stay within a few bits —
exactly the SimHash-style hamming<=8 banding regime ``operators/dedup``
already implements (Manku et al., WWW 2007 pigeonhole banding).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ------------------------------------------------------------------- PPM


def encode_ppm(img: np.ndarray) -> bytes:
    """Binary P6 PPM from an (h, w, 3) uint8 array."""
    img = _as_rgb(img)
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header = 4 whitespace-separated tokens (magic, w, h, maxval),
    # '#' comments allowed between tokens; pixel data follows the single
    # whitespace byte after maxval
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    px = np.frombuffer(data, dtype=np.uint8, count=h * w * 3, offset=pos)
    return px.reshape(h, w, 3).copy()


# ------------------------------------------------------------------- BMP


def encode_bmp(img: np.ndarray) -> bytes:
    """24-bit uncompressed (BI_RGB) bottom-up BMP."""
    img = _as_rgb(img)
    h, w = img.shape[:2]
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # BGR order, bottom-up, rows padded to 4 bytes
    rows = img[::-1, :, ::-1]
    if pad:
        padded = np.zeros((h, row_bytes + pad), dtype=np.uint8)
        padded[:, :row_bytes] = rows.reshape(h, row_bytes)
        body = padded.tobytes()
    else:
        body = rows.tobytes()
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(body), 0, 0, offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + body


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    h = abs(h_raw)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    raw = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = raw.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    if h_raw > 0:  # bottom-up (the common case)
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


# ------------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """8-bit RGB PNG.  ``filter_type`` (0-4) selects the scanline filter
    applied to EVERY row — mainly so tests can exercise the decoder's
    un-filtering of all five types; 0 (None) is the production default
    for the synthetic corpus."""
    img = _as_rgb(img)
    h, w = img.shape[:2]
    bpp = 3
    px = img.astype(np.int16)
    lines = []
    prev = np.zeros((w, bpp), dtype=np.int16)
    for y in range(h):
        cur = px[y]
        left = np.zeros_like(cur)
        left[1:] = cur[:-1]
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            filt = cur - left
        elif filter_type == 2:
            filt = cur - prev
        elif filter_type == 3:
            filt = cur - (left + prev) // 2
        elif filter_type == 4:
            up_left = np.zeros_like(prev)
            up_left[1:] = prev[:-1]
            filt = cur - _paeth_predict(left, prev, up_left)
        else:
            raise ValueError(f"bad filter type {filter_type}")
        lines.append(bytes([filter_type]) + (filt % 256).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth_predict(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a scanline (a=left, b=up, c=up-left)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(data: bytes) -> np.ndarray:
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos, ihdr, idat = len(_PNG_SIG), None, []
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(f"unsupported PNG (depth={depth}, interlace={interlace})")
    channels = {0: 1, 2: 3, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = raw[:, 0]
    rows = raw[:, 1:].astype(np.int16).reshape(h, w, channels)
    out = np.zeros_like(rows)
    prev = np.zeros((w, channels), dtype=np.int16)
    for y in range(h):
        cur = rows[y]
        ft = int(ftypes[y])
        if ft == 0:
            rec = cur.copy()
        elif ft == 2:
            rec = (cur + prev) % 256
        elif ft in (1, 3, 4):
            # horizontal recurrence: per-pixel walk, vector ops per lane
            rec = np.zeros_like(cur)
            for x in range(w):
                left = rec[x - 1] if x else np.zeros(channels, dtype=np.int16)
                if ft == 1:
                    rec[x] = (cur[x] + left) % 256
                elif ft == 3:
                    rec[x] = (cur[x] + (left + prev[x]) // 2) % 256
                else:
                    ul = prev[x - 1] if x else np.zeros(channels, dtype=np.int16)
                    rec[x] = (cur[x] + _paeth_predict(left, prev[x], ul)) % 256
        else:
            raise ValueError(f"bad PNG filter {ft}")
        out[y] = rec
        prev = rec
    img = out.astype(np.uint8)
    if channels == 1:
        img = np.repeat(img, 3, axis=2)
    elif channels == 4:
        img = img[:, :, :3]
    return img.copy()


# --------------------------------------------------------------- dispatch


def decode_image(data: bytes) -> np.ndarray:
    """Sniff the container magic and decode to an (h, w, 3) uint8 array.

    Raises ValueError for unknown containers and for recognized-but-
    unsupported modes (progressive/arithmetic/12-bit JPEG)."""
    if data.startswith(_PNG_SIG):
        return decode_png(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] == b"P6":
        return decode_ppm(data)
    if data[:2] == b"\xff\xd8":
        from kmcp_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(data)
    raise ValueError("unknown image container")


def _as_rgb(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) array, got {img.shape}")
    return np.ascontiguousarray(img)


# ---------------------------------------------------------------- hashing


def luma(img: np.ndarray) -> np.ndarray:
    """Rec.601 luma as float64 (h, w)."""
    f = img.astype(np.float64)
    return 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]


def resize_area(g: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic area (box-mean) resize of a 2-D array via integral
    image — no interpolation libraries.  Falls back to nearest-neighbor
    along any axis being UPsampled (bins would collapse)."""
    h, w = g.shape
    if h < out_h or w < out_w:
        yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
        xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
        g = g[yi][:, xi]
        h, w = g.shape
        if h == out_h and w == out_w:
            return g.astype(np.float64)
    ii = np.zeros((h + 1, w + 1), dtype=np.float64)
    ii[1:, 1:] = np.cumsum(np.cumsum(g, axis=0), axis=1)
    ys = np.round(np.arange(out_h + 1) * h / out_h).astype(np.int64)
    xs = np.round(np.arange(out_w + 1) * w / out_w).astype(np.int64)
    s = (
        ii[ys[1:], :][:, xs[1:]]
        - ii[ys[:-1], :][:, xs[1:]]
        - ii[ys[1:], :][:, xs[:-1]]
        + ii[ys[:-1], :][:, xs[:-1]]
    )
    area = np.outer(np.diff(ys), np.diff(xs)).astype(np.float64)
    return s / area


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash: area-resize luma to 9x8, compare each cell
    with its right neighbor, pack row-major.  Returned as a SIGNED int64
    (two's complement) so it round-trips through Spark/parquet BIGINT."""
    g = resize_area(luma(img), 8, 9)
    bits = (g[:, 1:] > g[:, :-1]).ravel()
    v = np.uint64(0)
    for i, b in enumerate(bits):
        if b:
            v |= np.uint64(1) << np.uint64(63 - i)
    return int(v.astype(np.int64))


def dhash64_batch(bufs: list[bytes]) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decode + dHash a batch: (dhash int64, width, height, decode_ok)."""
    n = len(bufs)
    hashes = np.zeros(n, dtype=np.int64)
    ws = np.full(n, -1, dtype=np.int32)
    hs = np.full(n, -1, dtype=np.int32)
    ok = np.zeros(n, dtype=bool)
    for i, buf in enumerate(bufs):
        try:
            img = decode_image(bytes(buf))
        except (ValueError, NotImplementedError):
            continue
        hashes[i] = dhash64(img)
        hs[i], ws[i] = img.shape[:2]
        ok[i] = True
    return hashes, ws, hs, ok
