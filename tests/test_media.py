import numpy as np
from pyspark.sql import functions as F

from kmcp_spark.corpus import make_rows
from kmcp_spark.operators.media import audio_features, frame_sample, image_features


def _clips(spark, n=20):
    pdf = make_rows(np.arange(n), min_dur_s=0.5, max_dur_s=1.0)
    return spark.createDataFrame(pdf.drop(columns=["cluster_id", "transform"]))


def test_audio_features(spark):
    feats = audio_features(_clips(spark)).toPandas()
    assert len(feats) == 20
    assert feats["decode_ok"].all()
    assert (feats["rms"] > 0).all()
    assert (feats["n_frames"] > 0).all()
    assert (feats["n_samples"] > 0).all()


def test_frame_sample_udtf_shape(spark):
    frames = frame_sample(_clips(spark), every_ms=250, max_frames=4).toPandas()
    # one row in -> several rows out; indices bounded; bytes decodable
    assert frames.groupby("clip_id")["frame_idx"].max().le(3).all()
    assert len(frames) > 20
    one = frames.iloc[0]
    pcm = np.frombuffer(one["frame_bytes"], dtype="<i2")
    assert len(pcm) > 0


def test_image_features_real_decode(spark):
    import pandas as pd

    from kmcp_spark.functions.image import encode_bmp, encode_png, encode_ppm

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "item_id": ["png", "bmp", "ppm", "jpeg", "junk"],
                "bytes": [
                    encode_png(img), encode_bmp(img), encode_ppm(img),
                    b"\xff\xd8\xff\xe0 fake jpeg", b"not an image",
                ],
            }
        )
    )
    out = image_features(df).toPandas().set_index("item_id")
    assert list(out.columns) == ["width", "height", "mean_luma", "decode_ok"]
    for fmt in ("png", "bmp", "ppm"):
        assert out.loc[fmt, "decode_ok"]
        assert out.loc[fmt, "width"] == 48 and out.loc[fmt, "height"] == 32
    # lossless containers -> identical pixels -> identical mean luma
    assert out.loc["png", "mean_luma"] == out.loc["bmp", "mean_luma"] == out.loc["ppm", "mean_luma"]
    # JPEG (recognized, needs libjpeg) and junk both flow through gated off
    assert not out.loc["jpeg", "decode_ok"] and not out.loc["junk", "decode_ok"]


def test_image_dup_pairs_recovers_planted_clusters(spark):
    """End-to-end image near-dup: decode -> dHash -> pigeonhole banding
    -> hamming filter recovers exactly the planted clusters (re-encode,
    brightness, noise, rescale members), with the I5 near-miss controls
    and independent images pairing with nothing."""
    import collections

    from kmcp_spark.corpus import make_image_rows
    from kmcp_spark.operators.media import image_dup_pairs

    pdf = make_image_rows(np.arange(120))
    items = spark.createDataFrame(pdf.drop(columns=["cluster_id", "transform"]))
    got = {(r.a, r.b) for r in image_dup_pairs(items, max_hamming=8).collect()}

    by_cluster = collections.defaultdict(list)
    for r in pdf.itertuples():
        by_cluster[r.cluster_id].append(r.item_id)
    expected = {
        (a, b)
        for ids in by_cluster.values()
        for i, a in enumerate(sorted(ids))
        for b in sorted(ids)[i + 1 :]
    }
    assert got == expected and len(expected) > 0


def test_audio_features_bad_codec_rows_flow_through(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "clip_id": ["x"], "bytes": [b"123"], "sr_hz": [16000],
                "dur_ms": [10], "codec": ["flac"], "transcript": ["t"],
            }
        )
    )
    out = audio_features(df).toPandas()
    assert len(out) == 1 and not out["decode_ok"].iloc[0]
