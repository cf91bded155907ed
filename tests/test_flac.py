"""FLAC subset codec (functions/flac.py): lossless round-trips, exact
quantization parity with encode_wav (the fixture's T1-re-encode
contract), CRC corruption detection, decoder generality (LPC subframes,
partitioned residuals, escapes), and corpus integration."""

import numpy as np
import pytest

from kmcp_spark.corpus import make_rows
from kmcp_spark.functions.audio import decode_pcm, encode_wav
from kmcp_spark.functions.flac import (
    _BitReader,
    _BitWriter,
    _crc8,
    _crc16,
    _undifference,
    decode_flac,
    encode_flac,
)


def _pcm(n, seed=5):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(n)
    return np.clip(x, -0.99, 0.99).astype(np.float32)


@pytest.mark.parametrize("n", [30, 4096, 5000, 20000])
def test_lossless_round_trip(n):
    pcm = _pcm(n)
    dec, rate = decode_flac(encode_flac(pcm, 16000))
    assert rate == 16000 and len(dec) == n
    want = (np.clip(pcm.astype(np.float64), -1, 1) * 32767.0).astype(np.int16)
    got = np.round(dec.astype(np.float64) * 32768.0).astype(np.int64)
    assert np.array_equal(got, want.astype(np.int64))


def test_pcm_parity_with_wav():
    # the T1 "flac re-encode" fixture transform relies on this: the SAME
    # float PCM through encode_wav and encode_flac decodes bit-identical
    pcm = _pcm(12000, seed=11)
    assert np.array_equal(
        decode_pcm(encode_wav(pcm, 16000), "wav"),
        decode_pcm(encode_flac(pcm, 16000), "flac"),
    )


def test_constant_and_silence():
    dec, _ = decode_flac(encode_flac(np.zeros(5000, dtype=np.float32), 16000))
    assert np.array_equal(dec, np.zeros(5000, dtype=np.float32))


def test_corruption_fails_loudly():
    buf = bytearray(encode_flac(_pcm(4096), 16000))
    buf[len(buf) // 2] ^= 0x55
    with pytest.raises(ValueError):
        decode_flac(bytes(buf))
    with pytest.raises(ValueError):
        decode_flac(b"fLaX" + bytes(buf[4:]))


def test_bitreader_word_reads_match_reference():
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, 100, dtype=np.uint8).tobytes()
    rd = _BitReader(data)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    pos = 0
    for width in (1, 3, 8, 13, 17, 24, 33, 57, 64):
        want = 0
        for b in bits[pos:pos + width]:
            want = (want << 1) | int(b)
        assert rd.read(width) == want
        pos += width
    # unary: position-based ones scan agrees with a naive bit walk
    q = 0
    while not bits[pos + q]:
        q += 1
    assert rd.read_unary() == q


def test_undifference_inverts_numpy_diff():
    rng = np.random.default_rng(3)
    sig = rng.integers(-30000, 30000, 500).astype(np.int64)
    for order in (1, 2, 3, 4):
        res = sig.copy()
        for _ in range(order):
            res = np.diff(res)
        out = _undifference(sig[:order], res, order, len(sig))
        assert np.array_equal(out, sig)


def test_decoder_handles_lpc_and_partitioned_residuals():
    """Hand-build a frame with an LPC subframe and partition order 1 —
    paths the subset encoder never emits — and check exact decode."""
    rng = np.random.default_rng(9)
    bs, order, shift = 64, 2, 5
    coefs = [40, -12]  # prediction: (40*s[i-1] - 12*s[i-2]) >> 5
    sig = np.zeros(bs, dtype=np.int64)
    sig[0], sig[1] = 1000, 1010
    res_true = rng.integers(-40, 40, bs - order)
    for i in range(order, bs):
        pred = (coefs[0] * sig[i - 1] + coefs[1] * sig[i - 2]) >> shift
        sig[i] = res_true[i - order] + pred

    wr = _BitWriter()
    # subframe header: pad 0, type 100001 (LPC order 2), wasted 0
    wr.put((0x20 | (order - 1)) << 1, 8)
    for w in sig[:order]:
        wr.put(int(w) & 0xFFFF, 16)
    wr.put(15 - 1, 4)  # precision 15 bits
    wr.put(shift, 5)
    for c in coefs:
        wr.put(c & 0x7FFF, 15)
    # residual: method 0, partition order 1 (two partitions)
    wr.put(0, 2)
    wr.put(1, 4)
    half = bs // 2
    parts = [res_true[: half - order], res_true[half - order:]]
    for part in parts:
        k = 4
        wr.put(k, 4)
        for v in part:
            zz = int(v * 2 if v >= 0 else -v * 2 - 1)
            wr.put_unary(zz >> k)
            wr.put(zz & ((1 << k) - 1), k)
    wr.align()

    # wrap in a minimal frame (mono 16-bit, explicit sizes) + stream
    hdr = bytearray(b"\xff\xf8")
    hdr.append((0x07 << 4) | 0x0D)
    hdr.append(0x04 << 1)
    hdr += b"\x00"  # frame number 0
    hdr += int(bs - 1).to_bytes(2, "big")
    hdr += int(16000).to_bytes(2, "big")
    hdr.append(_crc8(bytes(hdr)))
    framed = bytes(hdr) + bytes(wr.out)
    framed += _crc16(framed).to_bytes(2, "big")

    si = (16000 << 44) | (15 << 36) | bs
    meta = (
        int(bs).to_bytes(2, "big") * 2 + b"\x00\x00\x00" * 2
        + si.to_bytes(8, "big") + b"\x00" * 16
    )
    stream = b"fLaC" + bytes([0x80]) + len(meta).to_bytes(3, "big") + meta + framed
    dec, rate = decode_flac(stream)
    got = np.round(dec.astype(np.float64) * 32768.0).astype(np.int64)
    assert rate == 16000
    assert np.array_equal(got, sig)


def test_unsupported_modes_raise_value_error():
    pcm = _pcm(2000)
    buf = bytearray(encode_flac(pcm, 16000))
    # flip the frame's channel assignment to mid-side (code 10)
    # frame starts right after the 4+4+34 byte header
    fstart = 4 + 4 + 34
    assert buf[fstart] == 0xFF
    buf[fstart + 3] = (0x0A << 4) | (buf[fstart + 3] & 0x0F)
    # header CRC now mismatches -> ValueError either way; recompute it
    # so the error is specifically the unsupported-mode path
    hdr_end = fstart + 4
    b = bytes(buf)
    # locate crc byte: header is sync(2) + codes(2) + utf8(1) + bs(2) + rate(2)
    crc_idx = fstart + 9
    buf[crc_idx] = _crc8(bytes(buf[fstart:crc_idx]))
    with pytest.raises(ValueError, match="decorrelation|channel"):
        decode_flac(bytes(buf))


def test_corpus_t1_flac_rows_decode_and_match_cluster_base():
    ids = np.arange(120)
    pdf = make_rows(ids, min_dur_s=0.4, max_dur_s=0.9,
                    t1_codecs=("wav", "pcm_s16le", "flac"))
    flac_rows = pdf[pdf["codec"] == "flac"]
    assert len(flac_rows) >= 1, "rotation should land some T1 rows on flac"
    for r in flac_rows.itertuples():
        pcm = decode_pcm(bytes(r.bytes), "flac")
        base = pdf[(pdf["cluster_id"] == r.cluster_id) & (pdf["transform"] == "base")]
        if len(base):
            b = base.iloc[0]
            base_pcm = decode_pcm(bytes(b["bytes"]), b["codec"])
            assert np.array_equal(pcm, base_pcm), "T1 flac must be PCM-lossless"
    # default rotation unchanged: byte-identical bench corpus
    d1 = make_rows(ids, min_dur_s=0.4, max_dur_s=0.9)
    assert "flac" not in set(d1["codec"])


def test_fuzz_raises_value_error_only():
    """decode_ok=false flow-through: truncations and bit flips must only
    ever raise ValueError (CRC or parse), never IndexError/OverflowError
    — a malformed clip must not crash the Spark task."""
    base = encode_flac(_pcm(9000), 16000)
    for cut in range(1, len(base), 97):
        with pytest.raises(ValueError):
            decode_flac(base[:cut] if cut < len(base) else base[:cut] + b"x")
    for i in range(0, len(base), 53):
        buf = bytearray(base)
        buf[i] ^= 0xA5
        try:
            decode_flac(bytes(buf))
        except ValueError:
            pass
