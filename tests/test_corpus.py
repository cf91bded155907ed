import numpy as np

from kmcp_spark.corpus import VOCAB, make_rows


def test_vocab_fixed_and_distinct():
    assert len(VOCAB) == 512
    assert len(set(VOCAB)) == 512


def test_determinism():
    a = make_rows(np.arange(60), min_dur_s=0.5, max_dur_s=1.0)
    b = make_rows(np.arange(60), min_dur_s=0.5, max_dur_s=1.0)
    assert a["transcript"].tolist() == b["transcript"].tolist()
    assert all(x == y for x, y in zip(a["bytes"], b["bytes"]))


def test_generation_is_id_local():
    # generating a subset yields the same rows as generating everything —
    # required for distributed mapInPandas generation to be well-defined
    full = make_rows(np.arange(40), min_dur_s=0.5, max_dur_s=1.0)
    sub = make_rows(np.array([7, 21, 33]), min_dur_s=0.5, max_dur_s=1.0)
    for _, r in sub.iterrows():
        m = full[full.clip_id == r.clip_id].iloc[0]
        assert m.transcript == r.transcript and m.bytes == r.bytes


def test_planted_cluster_structure():
    df = make_rows(np.arange(200), min_dur_s=0.5, max_dur_s=1.0)
    members = df[df["transform"].isin(["base", "T0", "T1", "T2", "T3", "T4"])]
    # every cluster has its base present and >= 2 members
    for cid, grp in members.groupby("cluster_id"):
        assert (grp["transform"] == "base").sum() == 1
        assert len(grp) >= 2
    # T5 controls are their own cluster
    t5 = df[df["transform"] == "T5"]
    assert (t5["cluster_id"] == t5["clip_id"]).all()
    # ~10-15% of rows are cluster members
    frac = len(members) / len(df)
    assert 0.05 < frac < 0.3


def test_t0_exact_bytes():
    df = make_rows(np.arange(400), min_dur_s=0.5, max_dur_s=1.0)
    t0 = df[df["transform"] == "T0"]
    assert len(t0) > 0
    base = df[df["transform"] == "base"].set_index("cluster_id")
    for _, r in t0.iterrows():
        assert r.bytes == base.loc[r.cluster_id].bytes
        assert r.transcript == base.loc[r.cluster_id].transcript


def test_t3_truncation_updates_dur():
    df = make_rows(np.arange(400), min_dur_s=0.5, max_dur_s=1.0)
    base = df[df["transform"] == "base"].set_index("cluster_id")
    for _, r in df[df["transform"] == "T3"].iterrows():
        assert r.dur_ms < base.loc[r.cluster_id].dur_ms


def test_schema_types():
    df = make_rows(np.arange(10), min_dur_s=0.5, max_dur_s=1.0)
    assert list(df.columns) == [
        "clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript",
        "cluster_id", "transform",
    ]
    assert df.sr_hz.isin([8000, 16000, 44100]).all()
    assert df.codec.isin(["wav", "pcm_s16le"]).all()
