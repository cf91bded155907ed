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


def test_image_features_stub_plumbing(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"item_id": ["a", "b"], "bytes": [b"\xff\xd8", b"\x89PNG"]})
    )
    out = image_features(df).toPandas()
    # stub path: schema + batching real, decode gated off
    assert list(out.columns) == ["item_id", "width", "height", "mean_luma", "decode_ok"]
    assert (~out["decode_ok"]).all()


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
