"""Image perceptual-hash near-duplicate dedup: the banded pigeonhole
join (dedup.hamming_neardup_pairs) vs a brute-force O(n²) Hamming
oracle, decode→rehash parity with the stored phash column, planted
byte-exact and perturbed near-duplicates through the real codecs, and
the bucket-cap hub-star bound.

Reference parity target: PythonGis has no image-dedup analog (its
raster layer is PIL band plumbing, raster/loader.py); this is the
beyond-reference training-data-pipeline surface over the BASELINE.json
image+caption table."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pythongis_spark import fixtures as FX
from pythongis_spark.images import codec
from pythongis_spark.images.ops import phash_neardup_pairs, phash_signatures
from pythongis_spark.operators.dedup import hamming_neardup_pairs


def _brute_pairs(ids, hashes, max_hamming):
    h = np.array([x & ((1 << 64) - 1) for x in hashes], dtype=np.uint64)
    x = h[:, None] ^ h[None, :]
    n = len(ids)
    bits = np.unpackbits(x.view(np.uint8).reshape(n, n, 8), axis=2).sum(axis=2)
    out = set()
    for i in range(n):
        for j in range(i + 1, n):
            if bits[i, j] <= max_hamming:
                a, b = sorted((ids[i], ids[j]))
                out.add((a, b, int(bits[i, j])))
    return out


def test_banded_join_equals_bruteforce_on_colliding_corpus(spark):
    # the patterned fixture is a COLLISION-HEAVY stress input: smooth
    # gradients make many distinct images share average-hash bits, so
    # the banded join must reproduce thousands of true pairs exactly
    imgs = FX.images_df(spark, 120)
    stored = [(r.image_id, r.phash) for r in imgs.select("image_id", "phash").collect()]
    expect = _brute_pairs([t[0] for t in stored], [t[1] for t in stored], 3)
    got = {
        (r.a_id, r.b_id, r.hamming)
        for r in phash_neardup_pairs(
            imgs, max_hamming=3, from_bytes=False, bucket_cap=None
        ).collect()
    }
    assert len(expect) > 100  # the stress input is genuinely degenerate
    assert got == expect


def test_decode_rehash_matches_stored_phash(spark):
    # end-to-end codec parity: decoding the real PNG/BMP/FJPG blobs and
    # rehashing reproduces the generator's stored phash bit-exactly
    imgs = FX.images_df(spark, 60)
    joined = (
        phash_signatures(imgs)
        .withColumnRenamed("phash", "rehash")
        .join(imgs.select("image_id", "phash"), "image_id")
    )
    assert joined.filter(F.col("rehash") != F.col("phash")).count() == 0
    assert joined.count() == 60


def test_planted_duplicates_only_pairs(spark):
    imgs = FX.noise_images_df(spark, 60, dup_every=10)
    assert imgs.count() == 66
    rows = phash_neardup_pairs(imgs, max_hamming=3).collect()
    got = {(r.a_id, r.b_id, r.hamming) for r in rows}
    expect = {
        (f"dz{i:012d}", f"nz{i:012d}", 0) for i in range(0, 60, 10)
    }
    assert got == expect


def test_perturbed_near_dup_found_with_exact_distance(spark):
    # perturb one image enough to flip a few phash bits but stay
    # within radius 3 — the pigeonhole join must still find the pair
    # and report the exact distance the hash arithmetic predicts.
    # average-hash thresholds against the GLOBAL mean, so the bump must
    # be small (a saturated block shifts every borderline bit); search
    # deterministically for a (image, delta) that lands in 1..3
    # (img_i=0, delta=6 → hamming 2 with the current hash definition)
    px = px2 = None
    expected_ham = 0
    for img_i in range(12):
        cand = codec.make_noise_pixels(img_i, 64, 48)
        h1 = codec.average_phash(cand)
        for delta in (6, 8, 10, 12, 16):
            cand2 = cand.copy()
            cand2[0:6, 0:8] = np.clip(
                cand2[0:6, 0:8].astype(int) + delta, 0, 255
            ).astype(np.uint8)
            d = bin(
                (h1 ^ codec.average_phash(cand2)) & ((1 << 64) - 1)
            ).count("1")
            if 1 <= d <= 3:
                px, px2, expected_ham = cand, cand2, d
                break
        if px is not None:
            break
    assert px is not None  # fixture sanity
    pdf = pd.DataFrame(
        {
            "image_id": ["orig", "pert"],
            "bytes": [codec.encode_image(px, "png"), codec.encode_image(px2, "png")],
        }
    )
    df = spark.createDataFrame(pdf, "image_id string, bytes binary")
    rows = phash_neardup_pairs(df, max_hamming=3).collect()
    assert len(rows) == 1
    assert (rows[0].a_id, rows[0].b_id, rows[0].hamming) == (
        "orig", "pert", expected_ham,
    )


def test_bucket_cap_hub_star_bound(spark):
    # 40 identical hashes in one bucket: uncapped = 780 pairs, capped
    # at 8 = hub star = 39 pairs, all still at distance 0 (the cluster
    # stays connected through the hub)
    df = spark.createDataFrame(
        [(f"id{i:03d}", 123456789) for i in range(40)], "image_id string, phash long"
    )
    capped = hamming_neardup_pairs(
        df, "image_id", "phash", max_hamming=0, bucket_cap=8
    ).collect()
    assert len(capped) == 39
    assert all(r.a_id == "id000" and r.hamming == 0 for r in capped)
    full = hamming_neardup_pairs(
        df, "image_id", "phash", max_hamming=0, bucket_cap=None
    ).count()
    assert full == 780


def test_n_bands_validation(spark):
    df = spark.createDataFrame([("a", 1)], "image_id string, phash long")
    with pytest.raises(ValueError):
        hamming_neardup_pairs(df, "image_id", "phash", n_bands=5)
