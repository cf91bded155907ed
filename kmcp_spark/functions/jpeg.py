"""Pure-numpy baseline JPEG (ITU-T T.81) codec.

Closes the one remaining multimodal decode stub: real JPEG bytes now
flow through decode -> dHash -> pigeonhole banding like PNG/BMP/PPM
(``functions/image.py``).  Scope is baseline sequential DCT, 8-bit,
Huffman entropy coding — the profile virtually all real-corpus JPEGs
use — with:

  * encoder: 4:4:4 or 4:2:0 chroma subsampling, quality-scaled Annex K
    quantization tables, the spec's Annex K "typical" Huffman tables,
    optional restart markers (DRI/RSTn) so the decoder's resync path is
    exercised by round-trip tests;
  * decoder: any sampling-factor grid up to 2x2 (4:4:4 / 4:2:2 / 4:2:0
    and transposed variants), 1- or 3-component scans, 8- or 16-bit DQT
    precision, byte-stuffing, DRI/RSTn restarts.  Progressive (SOF2),
    arithmetic coding, and 12-bit are rejected with ValueError — the
    caller's ``decode_ok=false`` flow-through handles them, same as any
    truncated payload.

All table constants (zigzag order, Annex K.1/K.2 quant matrices, Annex
K.3 Huffman BITS/HUFFVAL) are published in the freely-available T.81
spec.  The DCT/IDCT are exact float matrix forms evaluated per-image as
one ``einsum`` over all blocks; only the entropy coder is per-symbol
Python, which at fixture scale (<=128x128) is microseconds per image —
the honest "exact baseline" posture, same as ``cosine_dup_pairs``.

Reference parity: kmcp has no image path; this serves the repo's
multimodal-columns brief (decode as Pandas-UDF over binary columns,
``operators/media.py``).
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------------- tables

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 "typical" Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
])

# orthonormal 8-point DCT-II basis: C[u, x] = c(u)/2 * cos((2x+1)u*pi/16)
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _cu = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
        _C[_u, _x] = 0.5 * _cu * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
del _u, _x, _cu


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K tables (public formula)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_QUANT_LUMA, _QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


def _build_huff_encode(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) via canonical code assignment (spec C.2)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _build_huff_decode(bits: list[int], vals: list[int]):
    """(mincode, maxcode, valptr, huffval) per spec F.2.2.3; maxcode=-1
    marks lengths with no codes."""
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr = [0] * 17
    code, k = 0, 0
    for length in range(1, 17):
        n = bits[length - 1]
        if n:
            valptr[length] = k
            mincode[length] = code
            code += n
            maxcode[length] = code - 1
            k += n
        code <<= 1
    return mincode, maxcode, valptr, list(vals)


# ------------------------------------------------------------- bit writer


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def pad_align(self) -> None:
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)  # 1-fill per spec F.1.2.3


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# ---------------------------------------------------------------- encoder


def encode_jpeg(img: np.ndarray, quality: int = 90, subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """Baseline JFIF JPEG from an (h, w, 3) uint8 RGB array."""
    from kmcp_spark.functions.image import _as_rgb

    img = _as_rgb(img)
    h, w = img.shape[:2]
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    sub = 2 if subsampling == "420" else 1
    qy, qc = _quality_tables(quality)

    f = img.astype(np.float64)
    r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    if sub == 2:
        cb = _box2(cb)
        cr = _box2(cr)

    # pad planes to the MCU grid (luma 8*sub, chroma 8), edge-replicated
    mcu_y = -(-h // (8 * sub))
    mcu_x = -(-w // (8 * sub))
    y = _pad_to(y, mcu_y * 8 * sub, mcu_x * 8 * sub)
    cb = _pad_to(cb, mcu_y * 8, mcu_x * 8)
    cr = _pad_to(cr, mcu_y * 8, mcu_x * 8)

    # vectorized FDCT + quantize + zigzag over every block of each plane
    def blocks_zz(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
        ph, pw = plane.shape
        blk = plane.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
        blk = blk.reshape(-1, 8, 8) - 128.0
        coef = np.einsum("ux,nxy,vy->nuv", _C, blk, _C)
        qz = np.round(coef / q.reshape(8, 8)).astype(np.int64)
        return qz.reshape(-1, 64)[:, ZIGZAG]

    zz = {"y": blocks_zz(y, qy), "cb": blocks_zz(cb, qc), "cr": blocks_zz(cr, qc)}

    enc_dc = {"y": _build_huff_encode(*_DC_LUMA), "c": _build_huff_encode(*_DC_CHROMA)}
    enc_ac = {"y": _build_huff_encode(*_AC_LUMA), "c": _build_huff_encode(*_AC_CHROMA)}

    wr = _BitWriter()
    pred = {"y": 0, "cb": 0, "cr": 0}
    ybw = mcu_x * sub  # luma blocks per row

    def put_block(comp: str, idx: int) -> None:
        kind = "y" if comp == "y" else "c"
        row = zz[comp][idx]
        diff = int(row[0]) - pred[comp]
        pred[comp] = int(row[0])
        s = _category(diff)
        code, ln = enc_dc[kind][s]
        wr.put(code, ln)
        if s:
            wr.put(diff if diff > 0 else diff + (1 << s) - 1, s)
        run = 0
        nz = np.nonzero(row[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(row[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = enc_ac[kind][0xF0]  # ZRL
                wr.put(code, ln)
                run -= 16
            s = _category(v)
            code, ln = enc_ac[kind][(run << 4) | s]
            wr.put(code, ln)
            wr.put(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if last < 63:
            code, ln = enc_ac[kind][0x00]  # EOB
            wr.put(code, ln)

    n_mcus = mcu_y * mcu_x
    rst = 0
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            wr.pad_align()
            wr.out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            pred.update(y=0, cb=0, cr=0)
        my, mx = divmod(m, mcu_x)
        if sub == 1:
            put_block("y", m)
        else:
            for dy in range(2):
                for dx in range(2):
                    put_block("y", (my * 2 + dy) * ybw + mx * 2 + dx)
        put_block("cb", m)
        put_block("cr", m)
    wr.pad_align()

    return _assemble(w, h, sub, qy, qc, bytes(wr.out), restart_interval)


def _box2(p: np.ndarray) -> np.ndarray:
    """2x2 box-mean downsample (pad odd dims by edge replication first)."""
    h, w = p.shape
    p = _pad_to(p, h + h % 2, w + w % 2)
    return 0.25 * (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2])


def _pad_to(p: np.ndarray, H: int, W: int) -> np.ndarray:
    h, w = p.shape
    return np.pad(p, ((0, H - h), (0, W - w)), mode="edge") if (H > h or W > w) else p


def _assemble(w: int, h: int, sub: int, qy: np.ndarray, qc: np.ndarray,
              scan: bytes, restart_interval: int) -> bytes:
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in ((0, qy), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(int(v) for v in q[ZIGZAG])
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOF0: comp id 1 = Y (sub x sub sampling), 2 = Cb, 3 = Cr
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, (sub << 4) | sub, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for cls, tid, (bits, vals) in ((0, 0, _DC_LUMA), (1, 0, _AC_LUMA),
                                   (0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)):
        payload = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder


class _BitReader:
    """MSB-first reader over an unstuffed entropy segment."""

    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > len(self.bits):
            raise ValueError("JPEG entropy stream truncated")
        v = 0
        for b in self.bits[self.pos:end]:
            v = (v << 1) | int(b)
        self.pos = end
        return v

    def huff(self, table) -> int:
        mincode, maxcode, valptr, huffval = table
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.receive(1)
            if maxcode[length] >= code >= mincode[length]:
                return huffval[valptr[length] + code - mincode[length]]
        raise ValueError("bad JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline-sequential JPEG to an (h, w, 3) uint8 RGB array.

    Every malformed-payload failure mode surfaces as ValueError so the
    operators' ``decode_ok=false`` flow-through contract holds; parser
    index/struct/key slips on truncated or bit-flipped bytes are folded
    into ValueError by the wrapper rather than crashing the Spark task."""
    try:
        return _decode_jpeg_inner(data)
    except (IndexError, KeyError, OverflowError, struct.error) as ex:
        raise ValueError(f"malformed JPEG: {type(ex).__name__}: {ex}") from ex


def _decode_jpeg_inner(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple] = {}
    frame = None
    dri = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG marker sync lost at {pos}")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1  # legal fill bytes before a marker (T.81 B.1.1.2)
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        payload = data[pos + 2: pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(payload):
                pq, tid = payload[off] >> 4, payload[off] & 0x0F
                off += 1
                if pq:
                    vals = np.frombuffer(payload, dtype=">u2", count=64, offset=off)
                    off += 128
                else:
                    vals = np.frombuffer(payload, dtype=np.uint8, count=64, offset=off)
                    off += 64
                qt[tid] = vals.astype(np.int64)[UNZIGZAG]
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(payload):
                cls, tid = payload[off] >> 4, payload[off] & 0x0F
                bits = list(payload[off + 1: off + 17])
                n = sum(bits)
                vals = list(payload[off + 17: off + 17 + n])
                huff[(cls, tid)] = _build_huff_decode(bits, vals)
                off += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/1 (baseline/extended sequential)
            prec, fh, fw, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            if nc not in (1, 3):
                # 4-comp Adobe CMYK/YCCK would silently decode as garbage
                # RGB; 2-comp is not a real colorspace here — flow through
                raise ValueError(f"unsupported JPEG component count {nc}")
            comps = []
            for i in range(nc):
                cid, hv, tq = payload[6 + 3 * i: 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG frame type SOF{marker - 0xC0}")
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xDA:  # SOS — scan data follows the header
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = payload[0]
            sel = {}
            for i in range(ns):
                cid, tables = payload[1 + 2 * i], payload[2 + 2 * i]
                sel[cid] = (tables >> 4, tables & 0x0F)
            planes = _decode_scan(data, pos, frame, sel, qt, huff, dri)
            return _planes_to_rgb(planes, frame)
    raise ValueError("JPEG has no scan")


def _find_scan_end(data: bytes, pos: int) -> int:
    """Index of the first non-RST, non-stuffed marker after ``pos``."""
    i = pos
    n = len(data)
    while i < n - 1:
        i = data.find(b"\xff", i)
        if i < 0 or i >= n - 1:
            return n
        nxt = data[i + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            i += 2
            continue
        return i
    return n


def _decode_scan(data: bytes, pos: int, frame, sel, qt, huff, dri):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2 or any(c["h"] not in (1, 2) or c["v"] not in (1, 2)
                                   for c in comps):
        raise ValueError("unsupported JPEG sampling factors")
    mcu_x = -(-w // (8 * hmax))
    mcu_y = -(-h // (8 * vmax))
    n_mcus = mcu_x * mcu_y

    end = _find_scan_end(data, pos)
    # unstuff + split on restart markers into contiguous entropy intervals
    body = data[pos:end]
    segments = []
    cur = bytearray()
    i = 0
    while i < len(body):
        b = body[i]
        if b == 0xFF and i + 1 < len(body):
            nxt = body[i + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    # per-component zigzag coefficient store, MCU-interleaved order
    store = {c["id"]: np.zeros((mcu_y * c["v"], mcu_x * c["h"], 64), dtype=np.int64)
             for c in comps}
    pred = {c["id"]: 0 for c in comps}
    seg_idx = 0
    reader = _BitReader(segments[0])
    for m in range(n_mcus):
        if dri and m and m % dri == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("JPEG missing restart segment")
            reader = _BitReader(segments[seg_idx])
            pred = {c["id"]: 0 for c in comps}
        my, mx = divmod(m, mcu_x)
        for c in comps:
            dc_t = huff.get((0, sel[c["id"]][0]))
            ac_t = huff.get((1, sel[c["id"]][1]))
            if dc_t is None or ac_t is None:
                raise ValueError("JPEG scan references missing Huffman table")
            for dy in range(c["v"]):
                for dx in range(c["h"]):
                    zz = np.zeros(64, dtype=np.int64)
                    s = reader.huff(dc_t)
                    diff = _extend(reader.receive(s), s)
                    pred[c["id"]] += diff
                    zz[0] = pred[c["id"]]
                    k = 1
                    while k < 64:
                        rs = reader.huff(ac_t)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC run past block end")
                        zz[k] = _extend(reader.receive(s), s)
                        k += 1
                    store[c["id"]][my * c["v"] + dy, mx * c["h"] + dx] = zz
    # vectorized dequant + IDCT per component
    planes = {}
    for c in comps:
        blocks = store[c["id"]]
        by, bx = blocks.shape[:2]
        coef = (blocks * qt[c["tq"]][ZIGZAG]).reshape(-1, 64)[:, UNZIGZAG]
        coef = coef.reshape(-1, 8, 8).astype(np.float64)
        pix = np.einsum("xu,nuv,yv->nxy", _C.T, coef, _C.T) + 128.0
        plane = pix.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        planes[c["id"]] = (plane, c["h"], c["v"])
    return planes


def _planes_to_rgb(planes, frame) -> np.ndarray:
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = []
    for c in comps:
        plane, ch, cv = planes[c["id"]]
        if ch != hmax:
            plane = np.repeat(plane, hmax // ch, axis=1)
        if cv != vmax:
            plane = np.repeat(plane, vmax // cv, axis=0)
        full.append(plane[:h, :w])
    if len(full) == 1:
        yv = np.clip(full[0], 0, 255)
        return np.repeat(yv[:, :, None], 3, axis=2).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
