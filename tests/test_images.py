"""Image payload path tests: codec invariants + Spark plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pythongis_spark import fixtures as FX
from pythongis_spark.images import codec
from pythongis_spark.images.ops import (
    extract_features,
    phash_hamming_expr,
    resize_images,
    verify_images,
)


def test_codec_lossless_roundtrip():
    px = codec.make_pixels(7, 64, 48)
    for fmt in ("png", "bmp"):
        rt = codec.decode_image(codec.encode_image(px, fmt))
        assert np.array_equal(rt, px)


def test_codec_lossy_psnr_gate():
    px = codec.make_pixels(11, 128, 96)
    rt = codec.decode_image(codec.encode_image(px, "jpeg"))
    p = codec.psnr_db(px, rt)
    assert 40.0 <= p < 60.0  # lossy but above the 40 dB gate


def test_phash_stability_and_sensitivity():
    px = codec.make_pixels(3, 64, 48)
    h1 = codec.average_phash(px)
    assert h1 == codec.average_phash(px.copy())
    # structurally different content (flipped gradient) → different hash;
    # note same-structure images (nearby seeds) legitimately collide under
    # average-hash — that's what makes it a near-dup detector
    assert h1 != codec.average_phash(px[::-1].copy())
    # jpeg round trip keeps the phash close (few bits)
    rt = codec.decode_image(codec.encode_image(px, "jpeg"))
    ham = bin((h1 ^ codec.average_phash(rt)) & ((1 << 64) - 1)).count("1")
    # average-hash flips blocks sitting near the mean threshold under
    # lossy quantization; identity & determinism are the hard invariants
    assert ham <= 16


def test_images_df_deterministic(spark):
    a = FX.images_df(spark, 30).toPandas().sort_values("image_id").reset_index(drop=True)
    b = (
        FX.images_df(spark, 30, partitions=7)
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)  # partitioning-independent generation


def test_verify_images_all_pass(spark):
    imgs = FX.images_df(spark, 60)
    v = verify_images(imgs).toPandas()
    assert len(v) == 60
    for col in ("ok_shape", "psnr_ok", "phash_ok", "caption_ok"):
        assert v[col].all(), col
    assert np.isinf(v[v.fmt == "png"]["psnr"]).all()
    # stored jpeg pixels are already quantized; re-encode is idempotent →
    # PSNR inf (original→decoded 40dB gate is covered in the codec test)
    assert (v[v.fmt == "jpeg"]["psnr"] >= 40).all()


def test_extract_features_and_resize(spark):
    imgs = FX.images_df(spark, 12)
    f = extract_features(imgs).toPandas()
    assert len(f) == 12
    assert ((0 <= f["brightness"]) & (f["brightness"] <= 255)).all()
    r = resize_images(imgs, 16, 16).toPandas()
    assert len(r) == 12
    px = codec.decode_image(r.iloc[0]["bytes"])
    assert px.shape == (16, 16, 3)


def test_phash_hamming_expr(spark):
    imgs = FX.images_df(spark, 10).select("image_id", "phash")
    a = imgs.alias("a")
    b = imgs.alias("b")
    joined = a.crossJoin(b).select(
        F.col("a.image_id").alias("ia"),
        F.col("b.image_id").alias("ib"),
        phash_hamming_expr(F.col("a.phash"), F.col("b.phash")).alias("ham"),
    )
    pdf = joined.toPandas()
    self_rows = pdf[pdf.ia == pdf.ib]
    assert (self_rows["ham"] == 0).all()
    assert pdf["ham"].max() <= 64
