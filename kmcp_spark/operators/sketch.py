"""Sketch stage: clips -> sketches (the `kmcp compute` analog).

One ``mapInPandas`` pass (`kmcp compute`'s whole per-file pipeline,
`kmcp/cmd/compute.go:500-883`, collapses to a single narrow Spark stage:
decode → shingle → sketch → emit).  Per Arrow batch, all heavy work is
numpy-vectorized; per-row Python touches only O(1) bookkeeping and the
audio decode of that row's buffer (a zero-copy ``np.frombuffer``).

Output schema (the `.unik` + Meta analog, SURVEY.md §1.4):

    sketches(clip_id string,
             size bigint,            -- |combined shingle set| after scaling
             n_text bigint, n_audio bigint,
             codes_text array<bigint>,   -- sorted distinct scaled text hashes
             codes_audio array<bigint>,  -- sorted distinct scaled audio hashes
                                         -- (FracMinHash; exact-verify input;
                                         -- domains are hash-disjoint, so the
                                         -- combined set is their concatenation)
             minhash array<bigint>,  -- num_perm MinHash signature (LSH input)
             simhash bigint,         -- 64-bit SimHash fingerprint
             decode_ok boolean)      -- codec supported & decoded

uint64 hashes are reinterpreted as int64 (two's complement) for Spark's
LongType; comparisons downstream are equality-only, so sign is irrelevant.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from kmcp_spark.config import PipelineConfig
from kmcp_spark.functions.audio import decode_pcm, spectral_shingle_hashes_batch
from kmcp_spark.functions.hashing import splitmix64
from kmcp_spark.functions.minhash import minhash_signatures, scaled_sketch
from kmcp_spark.functions.shingle import char_kgram_hashes_batch, word_ngram_hashes_batch
from kmcp_spark.functions.simhash import simhash64

_U64 = np.uint64
_AUDIO_SALT = 0xA5D10  # domain separation between text and audio hash spaces
_WORD_SALT = 0x39D0

SKETCH_SCHEMA = (
    "clip_id string, size bigint, n_text bigint, n_audio bigint, "
    "codes_text array<bigint>, codes_audio array<bigint>, "
    "minhash array<bigint>, simhash bigint, decode_ok boolean"
)


def _domain_shingles(
    pdf: pd.DataFrame, cfg: PipelineConfig
) -> tuple[list[np.ndarray], list[np.ndarray], list[bool]]:
    """Per row: (text hash set, audio hash set, decode_ok).  The two
    domains live in salted (disjoint) hash spaces so the combined set is
    a plain concatenation."""
    sk = cfg.sketch
    char_sets = char_kgram_hashes_batch(pdf["transcript"], sk.char_k)
    word_sets = word_ngram_hashes_batch(pdf["transcript"], sk.word_n)
    codecs = pdf["codec"].tolist()
    srs = pdf["sr_hz"].tolist()
    bufs = pdf["bytes"].tolist()
    # decode per row (zero-copy frombuffer), then ONE batched FFT pass
    pcms: list[np.ndarray] = []
    oks: list[bool] = []
    for i in range(len(pdf)):
        try:
            pcms.append(decode_pcm(bufs[i], codecs[i]))
            oks.append(True)
        except NotImplementedError:
            pcms.append(np.empty(0, dtype=np.float64))
            oks.append(False)
    audio_sets = spectral_shingle_hashes_batch(
        pcms,
        srs,
        ngram=sk.audio_ngram,
        select=sk.audio_select,
        minimizer_w=sk.minimizer_w,
        syncmer_s=sk.syncmer_s,
        frame_ms=sk.frame_ms,
        hop_ms=sk.hop_ms,
        n_bands=sk.n_bands,
        quant_levels=sk.quant_levels,
    )
    texts: list[np.ndarray] = []
    audios: list[np.ndarray] = []
    for i in range(len(pdf)):
        text = np.union1d(char_sets[i], splitmix64(word_sets[i], seed=_WORD_SALT))
        texts.append(scaled_sketch(text, sk.scale))
        audios.append(scaled_sketch(splitmix64(audio_sets[i], seed=_AUDIO_SALT), sk.scale))
    return texts, audios, oks


def sketch_batch(pdf: pd.DataFrame, cfg: PipelineConfig) -> pd.DataFrame:
    """One Arrow batch of clips -> one batch of sketches (pure pandas)."""
    texts, audios, oks = _domain_shingles(pdf, cfg)
    sets = [np.concatenate([t, a]) for t, a in zip(texts, audios)]
    sig = minhash_signatures(sets, cfg.sketch.num_perm, cfg.sketch.master_seed)
    sh = simhash64(sets)
    return pd.DataFrame(
        {
            "clip_id": pdf["clip_id"].to_numpy(),
            "size": np.fromiter((len(s) for s in sets), dtype=np.int64, count=len(sets)),
            "n_text": np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts)),
            "n_audio": np.fromiter((len(a) for a in audios), dtype=np.int64, count=len(audios)),
            "codes_text": [t.view(np.int64) for t in texts],
            "codes_audio": [a.view(np.int64) for a in audios],
            "minhash": list(sig.view(np.int64)),
            "simhash": sh.view(np.int64),
            "decode_ok": np.array(oks, dtype=bool),
        }
    )


def sketch_clips(clips: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """clips DataFrame -> sketches DataFrame (single narrow stage)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield sketch_batch(pdf, cfg)

    cols = ["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"]
    return clips.select(*cols).mapInPandas(run, schema=SKETCH_SCHEMA)
