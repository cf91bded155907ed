"""Baseline JPEG codec (functions/jpeg.py): round-trip fidelity across
subsampling modes and restart intervals, marker-level rejection of
non-baseline modes, dispatch integration, and the dHash-drift bound the
image fixture's planted jpg dups rely on."""

import numpy as np
import pytest

from kmcp_spark.corpus import _base_image, make_image_rows
from kmcp_spark.functions.image import decode_image, dhash64
from kmcp_spark.functions.jpeg import decode_jpeg, encode_jpeg


def _test_img(h=70, w=85, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w, 3))
    for c in range(3):
        img[:, :, c] = 128 + 90 * np.sin(2 * np.pi * 1.7 * yy / h + c) * np.cos(
            2 * np.pi * 2.3 * xx / w
        )
    img[10:30, 20:50] = rng.integers(0, 256, 3)
    return np.clip(img, 0, 255).astype(np.uint8)


def _psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 10 * np.log10(255**2 / max(mse, 1e-12))


@pytest.mark.parametrize("sub,min_db", [("444", 38.0), ("420", 31.0)])
def test_round_trip_psnr(sub, min_db):
    img = _test_img()
    dec = decode_jpeg(encode_jpeg(img, quality=90, subsampling=sub))
    assert dec.shape == img.shape
    assert _psnr(img, dec) > min_db


def test_restart_markers_round_trip_identically():
    # same quantized coefficients either way: RSTn resync must be lossless
    img = _test_img(64, 48, seed=9)
    plain = decode_jpeg(encode_jpeg(img, quality=85))
    rst = decode_jpeg(encode_jpeg(img, quality=85, restart_interval=3))
    assert np.array_equal(plain, rst)


def test_odd_dimensions_and_420_padding():
    img = _test_img(41, 53, seed=11)  # odd dims force edge-pad + crop
    for sub in ("444", "420"):
        dec = decode_jpeg(encode_jpeg(img, quality=90, subsampling=sub))
        assert dec.shape == (41, 53, 3)


def test_dispatch_recognizes_jpeg():
    img = _test_img(32, 32)
    buf = encode_jpeg(img)
    assert buf[:2] == b"\xff\xd8"
    assert _psnr(img, decode_image(buf)) > 35.0


def test_progressive_rejected_truncated_rejected():
    buf = bytearray(encode_jpeg(_test_img(16, 16)))
    i = bytes(buf).find(b"\xff\xc0")
    buf[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg(bytes(buf))
    with pytest.raises(ValueError):
        decode_jpeg(encode_jpeg(_test_img(16, 16))[:-40])


def test_dhash_drift_bound_at_fixture_quality():
    # the image fixture plants jpg dups at q95/4:4:4; pairing relies on
    # total drift staying inside the hamming<=8 pigeonhole regime
    worst = 0
    for idx in range(30):
        img, _ = _base_image(42, idx)
        dec = decode_jpeg(encode_jpeg(img, quality=95, subsampling="444"))
        d = bin((int(dhash64(img)) ^ int(dhash64(dec))) & (2**64 - 1)).count("1")
        worst = max(worst, d)
    assert worst <= 5, f"jpg re-encode drifted {worst} dHash bits"


def test_fixture_contains_decodable_jpg_rows():
    pdf = make_image_rows(np.arange(120))
    jpg = pdf[pdf["fmt"] == "jpg"]
    assert len(jpg) >= 10, "fixture should draw jpg for ~1/4 of images"
    for buf in jpg["bytes"].head(5):
        img = decode_image(bytes(buf))
        assert img.ndim == 3 and img.shape[2] == 3
    # at least one planted jpg-involved dup cluster exists
    dup = pdf[pdf["cluster_id"].isin(pdf[pdf["fmt"] == "jpg"]["cluster_id"])]
    assert (dup.groupby("cluster_id").size() > 1).any()


def test_malformed_payloads_raise_value_error_only():
    """The decode_ok=false flow-through contract: ANY malformed payload
    must raise ValueError (never IndexError/struct.error/KeyError/
    OverflowError, which would crash the Spark task)."""
    base = encode_jpeg(_test_img(24, 24), quality=80)
    # truncations at every interesting boundary
    for cut in (3, 10, 21, len(base) // 2, len(base) - 3):
        with pytest.raises(ValueError):
            decode_jpeg(base[:cut])
    # deterministic bit flips across the whole stream
    for i in range(2, len(base), 7):
        buf = bytearray(base)
        buf[i] ^= 0x81
        try:
            decode_jpeg(bytes(buf))
        except ValueError:
            pass  # the only acceptable failure mode


def test_fill_bytes_before_marker_accepted():
    # T.81 B.1.1.2: markers may be preceded by any number of 0xFF fill
    # bytes; a spec-valid file must not be rejected
    base = encode_jpeg(_test_img(16, 16))
    i = base.find(b"\xff\xdb")
    padded = base[:i] + b"\xff\xff\xff" + base[i:]
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(base))


def test_four_component_cmyk_rejected():
    # rewrite SOF0's component count to 4 (Adobe CMYK shape): must raise
    # ValueError, not silently decode garbage RGB with decode_ok=True
    buf = bytearray(encode_jpeg(_test_img(16, 16)))
    i = bytes(buf).find(b"\xff\xc0")
    # SOF payload: len(2) prec(1) h(2) w(2) nc(1)
    buf[i + 9] = 4
    with pytest.raises(ValueError, match="component count"):
        decode_jpeg(bytes(buf))
