"""Audio decode invariant (input_hint: decoded-PCM SNR >= 30 dB) and
spectral-shingle robustness (FIXTURES.md §2 detection paths)."""

import numpy as np
import pytest

from kmcp_spark.functions.audio import (
    decode_pcm,
    encode_wav,
    snr_db,
    spectral_shingle_hashes,
)


def _tone(sr=16000, dur=1.0):
    t = np.arange(int(sr * dur)) / sr
    x = 0.3 * np.sin(2 * np.pi * 440 * (1 + 0.03 * t) * t) + 0.2 * np.sin(
        2 * np.pi * 977 * t
    )
    return x


def test_wav_roundtrip_snr_over_30db():
    x = _tone()
    dec = decode_pcm(encode_wav(x, 16000), "wav")
    assert dec.shape == x.shape
    assert snr_db(x, dec) >= 30.0  # int16 quantization: actually ~80 dB


def test_raw_pcm_roundtrip():
    x = _tone()
    raw = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
    dec = decode_pcm(raw, "pcm_s16le")
    assert snr_db(x, dec) >= 30.0


def test_wav_and_raw_decode_identical():
    # T1 re-encode path: container change must be PCM-lossless
    x = _tone()
    a = decode_pcm(encode_wav(x, 16000), "wav")
    b = decode_pcm((np.clip(x, -1, 1) * 32767).astype("<i2").tobytes(), "pcm_s16le")
    assert np.array_equal(a, b)


def test_unsupported_codec_is_stubbed():
    # flac is REAL as of r5 (functions/flac.py): invalid payloads raise
    # ValueError; genuinely-stubbed lossy codecs raise NotImplementedError
    with pytest.raises(ValueError):
        decode_pcm(b"\x00\x01", "flac")
    with pytest.raises(NotImplementedError):
        decode_pcm(b"\x00\x01", "mp3")


def _jacc(a, b):
    if len(a) == 0 and len(b) == 0:
        return 1.0
    return len(np.intersect1d(a, b)) / max(len(np.union1d(a, b)), 1)


def test_gain_invariance():
    x = _tone(dur=2.0)
    h1 = spectral_shingle_hashes(x, 16000)
    h2 = spectral_shingle_hashes(0.8 * x, 16000)
    assert _jacc(h1, h2) >= 0.95


def test_truncation_containment():
    x = _tone(dur=2.0)
    h1 = spectral_shingle_hashes(x, 16000)
    h2 = spectral_shingle_hashes(x[: int(len(x) * 0.9)], 16000)
    containment = len(np.intersect1d(h1, h2)) / max(len(h2), 1)
    assert containment >= 0.95


def test_different_audio_low_similarity():
    x = _tone(dur=2.0)
    rng = np.random.default_rng(4)
    t = np.arange(32000) / 16000
    y = 0.3 * np.sin(2 * np.pi * 1333 * (1 + 0.05 * t) * t) + 0.05 * rng.normal(size=32000)
    assert _jacc(
        spectral_shingle_hashes(x, 16000), spectral_shingle_hashes(y, 16000)
    ) < 0.3


def test_malformed_wav_raises():
    with pytest.raises(ValueError):
        decode_pcm(b"RIFFxxxxNOPE", "wav")
