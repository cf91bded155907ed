"""Audio decode + spectral-frame tokenization, numpy-vectorized.

The input table carries opaque ``bytes`` plus typed metadata
(sr_hz, dur_ms, codec).  Supported codecs here:

  - ``pcm_s16le``: raw signed-16-bit little-endian mono PCM.
  - ``wav``: RIFF/WAVE container around PCM16 (parsed with the stdlib
    ``wave`` module semantics, implemented directly on bytes so it is
    zero-copy per Arrow batch).
  - ``flac``: REAL subset decode (``functions/flac.py`` — pure-numpy
    fixed/LPC prediction + Rice residuals, CRC-verified); lossless, so
    a flac re-encode yields bit-identical PCM and identical sketches.
  - anything else (mp3/ogg/aac): STUBBED — lossy audio codecs genuinely
    need native libraries absent from this container; ``decode_pcm``
    raises NotImplementedError and the operators flow the row through
    as ``decode_ok=false``.  The Spark-side plumbing (schema, UDF
    signature, batch shape) is identical to the real paths.

Spectral tokens: frames of ``frame_len`` samples with hop ``hop_len``;
per frame, log-energies of ``n_bands`` rFFT bands are normalized by the
frame's total energy (making tokens invariant to amplitude scaling —
detection path T2 in FIXTURES.md §2) and quantized to ``quant_levels``;
the per-band levels pack into one uint64 token per frame.  Token
sequences then shingle like text (rolling n-gram hash).
"""

from __future__ import annotations

import numpy as np

from kmcp_spark.functions.hashing import hash_bytes_rolling

_U64 = np.uint64


def decode_pcm(data: bytes, codec: str) -> np.ndarray:
    """bytes -> float32 PCM in [-1, 1].  Raises on unsupported codecs.

    float32 is exact here: int16/32768 needs 15 mantissa bits and float32
    has 24, so values are bit-identical to the float64 decode — at half
    the memory traffic (this kernel feeds a bandwidth-bound FFT stage).
    """
    if codec == "pcm_s16le":
        return np.frombuffer(data, dtype="<i2").astype(np.float32) / np.float32(32768.0)
    if codec == "wav":
        return _decode_wav(data)
    if codec == "flac":
        from kmcp_spark.functions.flac import decode_flac

        return decode_flac(data)[0]
    raise NotImplementedError(
        f"codec {codec!r}: no decoder in this environment (audio codec "
        "libraries are not installed); pcm_s16le, wav, and flac "
        "(functions/flac.py, subset) are supported"
    )


def _decode_wav(data: bytes) -> np.ndarray:
    """Minimal RIFF/WAVE PCM16 parser (mono, fmt chunk -> data chunk)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        if cid == b"data":
            raw = data[pos + 8 : pos + 8 + size]
            return np.frombuffer(raw, dtype="<i2").astype(np.float32) / np.float32(32768.0)
        pos += 8 + size + (size & 1)
    raise ValueError("WAVE data chunk not found")


def encode_wav(pcm: np.ndarray, sr_hz: int) -> bytes:
    """float PCM in [-1,1] -> mono PCM16 WAV bytes (for the corpus generator)."""
    x = np.clip(np.asarray(pcm, dtype=np.float64), -1.0, 1.0)
    i16 = (x * 32767.0).astype("<i2").tobytes()
    size = len(i16)
    hdr = (
        b"RIFF" + (36 + size).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")            # PCM
        + (1).to_bytes(2, "little")            # mono
        + int(sr_hz).to_bytes(4, "little")
        + int(sr_hz * 2).to_bytes(4, "little")  # byte rate
        + (2).to_bytes(2, "little")            # block align
        + (16).to_bytes(2, "little")           # bits
        + b"data" + size.to_bytes(4, "little")
    )
    return hdr + i16


def spectral_tokens(
    pcm: np.ndarray,
    sr_hz: int,
    frame_ms: int = 25,
    hop_ms: int = 10,
    n_bands: int = 8,
    quant_levels: int = 8,
) -> np.ndarray:
    """PCM -> uint64 token per frame (amplitude-invariant quantized bands)."""
    frame_len = max(int(sr_hz * frame_ms / 1000), 8)
    hop_len = max(int(sr_hz * hop_ms / 1000), 4)
    # float32 to match the batched kernel exactly (see
    # spectral_shingle_hashes_batch — bandwidth-bound at scale)
    x = np.asarray(pcm, dtype=np.float32)
    if x.shape[0] < frame_len:
        return np.empty(0, dtype=_U64)
    n_frames = 1 + (x.shape[0] - frame_len) // hop_len
    idx = np.arange(frame_len)[None, :] + hop_len * np.arange(n_frames)[:, None]
    frames = x[idx] * np.hanning(frame_len).astype(np.float32)[None, :]
    spec_c = np.fft.rfft(frames, axis=1)
    spec = spec_c.real**2 + spec_c.imag**2  # (n_frames, nbins)
    nbins = spec.shape[1]
    edges = np.linspace(0, nbins, n_bands + 1).astype(int)
    band_e = np.stack(
        [spec[:, edges[b] : max(edges[b + 1], edges[b] + 1)].sum(axis=1) for b in range(n_bands)],
        axis=1,
    )
    total = band_e.sum(axis=1, keepdims=True)
    rel = band_e / np.maximum(total, 1e-30)  # amplitude cancels here
    q = np.minimum((rel * quant_levels).astype(np.int64), quant_levels - 1)
    # pack band levels into one token (levels <= 8 -> 3 bits/band)
    bits = max(int(np.ceil(np.log2(quant_levels))), 1)
    tok = np.zeros(q.shape[0], dtype=_U64)
    for b in range(n_bands):
        tok = (tok << _U64(bits)) | q[:, b].astype(_U64)
    return tok


def spectral_shingle_hashes(
    pcm: np.ndarray,
    sr_hz: int,
    ngram: int = 4,
    select: str = "full",
    minimizer_w: int = 8,
    syncmer_s: int = 5,
    **tok_kwargs,
) -> np.ndarray:
    """PCM -> sorted distinct hashes of token n-grams (the audio shingle set).

    ``select`` picks the down-sampling scheme over the positional n-gram
    hash stream, mirroring kmcp's sketch families
    (`kmcp/cmd/compute.go:746-803`): "full" keeps every n-gram,
    "minimizer" keeps window minima (Roberts 2004), "syncmer" keeps
    closed syncmers (Edgar 2021).
    """
    tok = spectral_tokens(pcm, sr_hz, **tok_kwargs)
    if tok.shape[0] < ngram:
        return np.empty(0, dtype=_U64)
    h = hash_bytes_rolling(tok, ngram)  # positional stream
    if select == "minimizer":
        from kmcp_spark.functions.minhash import minimizer_sketch

        return minimizer_sketch(h, minimizer_w)
    if select == "syncmer":
        from kmcp_spark.functions.minhash import syncmer_sketch

        return syncmer_sketch(h, syncmer_s)
    return np.unique(h)


def spectral_shingle_hashes_batch(
    pcms: list[np.ndarray],
    srs: list[int],
    ngram: int = 4,
    select: str = "full",
    minimizer_w: int = 8,
    syncmer_s: int = 5,
    frame_ms: int = 25,
    hop_ms: int = 10,
    n_bands: int = 8,
    quant_levels: int = 8,
) -> list[np.ndarray]:
    """Batched variant of :func:`spectral_shingle_hashes`.

    Rows are grouped by sample rate (same frame geometry); each group's
    frames are stacked into ONE matrix and transformed with ONE rfft +
    one quantization pass, then split back per row.  Identical output to
    the per-row function (same windowing/quantization math), but ~one
    large allocation + FFT per group instead of per row — per-row
    allocation churn is what throttles scaling at high core counts on
    page-fault-slow hosts.
    """
    n = len(pcms)
    out: list[np.ndarray] = [np.empty(0, dtype=_U64)] * n
    by_sr: dict[int, list[int]] = {}
    for i, sr in enumerate(srs):
        by_sr.setdefault(int(sr), []).append(i)
    # bound the stacked frame matrix to ~1M float32 (4 MB): small enough
    # that frames + rFFT output + band sums stay L2/L3-resident per task
    # (the earlier 8M-element bound made every pass stream ~100 MB of
    # working set through the shared memory bus, which capped 1→4-core
    # scaling at ~0.5 on this host), large enough that each chunk still
    # amortizes the FFT call over hundreds of frames
    max_elems = 1_000_000
    chunked: list[tuple[int, list[int]]] = []
    for sr, rows in by_sr.items():
        frame_len = max(int(sr * frame_ms / 1000), 8)
        hop_len = max(int(sr * hop_ms / 1000), 4)
        cur: list[int] = []
        cur_elems = 0
        for i in rows:
            nf = max(1 + (len(pcms[i]) - frame_len) // hop_len, 0)
            if cur and cur_elems + nf * frame_len > max_elems:
                chunked.append((sr, cur))
                cur, cur_elems = [], 0
            cur.append(i)
            cur_elems += nf * frame_len
        if cur:
            chunked.append((sr, cur))
    for sr, rows in chunked:
        frame_len = max(int(sr * frame_ms / 1000), 8)
        hop_len = max(int(sr * hop_ms / 1000), 4)
        # float32 throughout: this kernel is memory-bandwidth-bound at
        # high parallelism; halving element width nearly doubles
        # aggregate throughput.  (Quantized band ratios are insensitive
        # to the reduced precision.)
        window = np.hanning(frame_len).astype(np.float32)
        counts = []
        total = 0
        for i in rows:
            nf = (
                1 + (len(pcms[i]) - frame_len) // hop_len
                if len(pcms[i]) >= frame_len
                else 0
            )
            counts.append(nf)
            total += nf
        if total == 0:
            continue
        frames = np.empty((total, frame_len), dtype=np.float32)
        pos0 = 0
        for ci, i in enumerate(rows):
            nf = counts[ci]
            if nf == 0:
                continue
            x = np.asarray(pcms[i], dtype=np.float32)
            # strided view of the hopped frames — no int64 index matrix
            # (the index gather cost 8 bytes of extra traffic per sample)
            view = np.lib.stride_tricks.sliding_window_view(x, frame_len)[::hop_len]
            frames[pos0 : pos0 + nf] = view[:nf]
            pos0 += nf
        frames *= window[None, :]
        spec_c = np.fft.rfft(frames, axis=1)
        spec = (spec_c.real**2 + spec_c.imag**2)
        nbins = spec.shape[1]
        edges = np.linspace(0, nbins, n_bands + 1).astype(int)
        band_e = np.stack(
            [
                spec[:, edges[b] : max(edges[b + 1], edges[b] + 1)].sum(axis=1)
                for b in range(n_bands)
            ],
            axis=1,
        )
        rel = band_e / np.maximum(band_e.sum(axis=1, keepdims=True), 1e-30)
        q = np.minimum((rel * quant_levels).astype(np.int64), quant_levels - 1)
        bits = max(int(np.ceil(np.log2(quant_levels))), 1)
        tok = np.zeros(q.shape[0], dtype=_U64)
        for b in range(n_bands):
            tok = (tok << _U64(bits)) | q[:, b].astype(_U64)
        # split token stream back per row and shingle
        pos = 0
        ci = 0
        for i in rows:
            c = counts[ci]
            ci += 1
            t = tok[pos : pos + c]
            pos += c
            if t.shape[0] < ngram:
                continue
            h = hash_bytes_rolling(t, ngram)
            if select == "minimizer":
                from kmcp_spark.functions.minhash import minimizer_sketch

                out[i] = minimizer_sketch(h, minimizer_w)
            elif select == "syncmer":
                from kmcp_spark.functions.minhash import syncmer_sketch

                out[i] = syncmer_sketch(h, syncmer_s)
            else:
                out[i] = np.unique(h)
    return out


def snr_db(reference: np.ndarray, test: np.ndarray) -> float:
    """SNR of ``test`` vs ``reference`` in dB (input_hint invariant >= 30)."""
    n = min(reference.shape[0], test.shape[0])
    if n == 0:
        return -np.inf
    r, t = reference[:n], test[:n]
    noise = float(np.sum((r - t) ** 2))
    sig = float(np.sum(r**2))
    if noise == 0.0:
        return np.inf
    if sig == 0.0:
        return -np.inf
    return 10.0 * np.log10(sig / noise)
