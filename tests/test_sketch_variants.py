"""Sketch-family variants (minimizer / syncmer / scaled) preserve the
similarity signal while shrinking the shingle set — the kmcp sketch
compatibility property (same params on both sides ⇒ comparable)."""

import numpy as np
import pytest

from kmcp_spark.functions.audio import spectral_shingle_hashes


def _tone(seed, dur=2.0, sr=16000):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * dur)) / sr
    x = np.zeros_like(t)
    for s0 in range(0, len(t), sr // 5):
        f = rng.uniform(100, 3000)
        x[s0 : s0 + sr // 5] += 0.3 * np.sin(2 * np.pi * f * t[s0 : s0 + sr // 5])
    return x + rng.normal(0, 0.01, len(t))


def _jacc(a, b):
    u = len(np.union1d(a, b))
    return len(np.intersect1d(a, b)) / u if u else 1.0


@pytest.mark.parametrize("select,kw", [
    ("minimizer", {"minimizer_w": 8}),
    ("syncmer", {"syncmer_s": 5}),
])
def test_variant_smaller_but_similarity_preserving(select, kw):
    x = _tone(1)
    full_a = spectral_shingle_hashes(x, 16000, select="full")
    var_a = spectral_shingle_hashes(x, 16000, select=select, **kw)
    assert 0 < len(var_a) < len(full_a)
    # identical audio -> identical variant sketch
    var_a2 = spectral_shingle_hashes(x.copy(), 16000, select=select, **kw)
    assert np.array_equal(var_a, var_a2)
    # gain invariance survives down-sampling
    var_gain = spectral_shingle_hashes(0.8 * x, 16000, select=select, **kw)
    assert _jacc(var_a, var_gain) >= 0.9
    # unrelated audio stays dissimilar
    var_b = spectral_shingle_hashes(_tone(2), 16000, select=select, **kw)
    assert _jacc(var_a, var_b) < 0.5  # tiny sketch sets of pure tones collide a bit


def test_pipeline_config_variant_roundtrip(spark):
    from kmcp_spark.config import PipelineConfig, SketchConfig
    from kmcp_spark.corpus import make_rows
    from kmcp_spark.operators.sketch import sketch_clips

    pdf = make_rows(np.arange(10), min_dur_s=0.5, max_dur_s=1.0)
    clips = spark.createDataFrame(pdf.drop(columns=["cluster_id", "transform"]))
    full = sketch_clips(clips, PipelineConfig()).toPandas()
    mini = sketch_clips(
        clips, PipelineConfig(sketch=SketchConfig(audio_select="minimizer"))
    ).toPandas()
    assert (mini.set_index("clip_id")["n_audio"] <= full.set_index("clip_id")["n_audio"]).all()
