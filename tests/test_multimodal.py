"""Audio/video multimodal plumbing tests (codecs are deterministic
stand-ins; Spark-side contract is real)."""

import numpy as np
import pytest

from pythongis_spark.images import multimodal as MM


def test_audio_roundtrip_deterministic():
    a = MM.make_audio_clip(7)
    b = MM.make_audio_clip(7)
    assert a["bytes"] == b["bytes"]
    pcm = MM.decode_audio(a["bytes"])
    assert len(pcm) == a["n_samples"]
    assert np.abs(pcm).max() > 10000  # sine at 0.6 amplitude


def test_audio_features_spark(spark):
    df = MM.audio_df(spark, 12, partitions=3)
    f = MM.audio_features(df).toPandas()
    assert len(f) == 12
    assert ((0.3 < f["rms"]) & (f["rms"] < 0.6)).all()
    assert (f["duration_s"] == 0.5).all()


def test_video_roundtrip_and_sampling(spark):
    v = MM.make_video(3)
    vid = MM.decode_video(v["bytes"])
    assert vid.shape == (8, 24, 32)
    df = MM.video_df(spark, 5)
    frames = MM.sample_frames(df, every=2).toPandas()
    assert len(frames) == 5 * 4  # 8 frames, every 2nd
    assert frames["frame"].max() == 6


def test_external_decode_stub():
    with pytest.raises(NotImplementedError, match="audio library"):
        MM.decode_audio_external("mp3")
    with pytest.raises(ValueError):
        MM.decode_audio(b"XXXX1234")
