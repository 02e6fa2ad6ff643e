"""Deterministic sampling operators: reproducibility, partition
invariance, brute-force parity, and the physical-plan properties that
make them safe at corpus scale (no shuffle for hash filters;
WindowGroupLimit partial truncation for the per-group cap)."""

import numpy as np
import pandas as pd
import pytest

from pythongis_spark.operators import sampling as S

_A = 2654435761
_M = 1 << 32


def _docs(spark, n=1000):
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": [["en", "es", "de", "fr", "zh"][i % 5] for i in range(n)],
            "score": (np.arange(n, dtype=np.int64) * 37 % 101).astype(float),
        }
    )
    return spark.createDataFrame(pdf)


def _mult31(ids, seed):
    return (ids.astype(np.uint64) * _A + seed) % _M


def test_hash_sample_matches_brute_force_and_is_stable(spark):
    df = _docs(spark)
    got = (
        S.hash_sample(df, "doc_id", 0.2, seed=9, method="mult31")
        .toPandas()
        .sort_values("doc_id")
    )
    ids = np.arange(1000, dtype=np.int64)
    want = ids[_mult31(ids, 9) / _M < 0.2]
    assert (got["doc_id"].to_numpy() == want).all()
    # stable under arbitrary repartitioning (hash is a function of the
    # key alone, not of placement)
    got2 = (
        S.hash_sample(df.repartition(13), "doc_id", 0.2, seed=9, method="mult31")
        .toPandas()
        .sort_values("doc_id")
    )
    assert (got2["doc_id"].to_numpy() == want).all()
    # xxhash64 default: deterministic across calls, roughly the right rate
    a = sorted(r[0] for r in S.hash_sample(df, "doc_id", 0.3, seed=1).collect())
    b = sorted(r[0] for r in S.hash_sample(df, "doc_id", 0.3, seed=1).collect())
    assert a == b and 200 < len(a) < 400
    with pytest.raises(ValueError):
        S.hash_sample(df, "doc_id", 1.5)


def test_hash_sample_plan_has_no_exchange(spark):
    df = _docs(spark)
    plan = (
        S.hash_sample(df, "doc_id", 0.2, seed=9)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure codegen filter


def test_train_test_split_is_a_partition(spark):
    df = _docs(spark)
    out = S.train_test_split(df, "doc_id", 0.25, seed=4, method="mult31").toPandas()
    assert len(out) == 1000
    ids = out["doc_id"].to_numpy()
    is_test = _mult31(ids, 4) / _M < 0.25
    assert (out["split"].to_numpy() == np.where(is_test, "test", "train")).all()
    # the labeled split agrees with hash_sample at the same (key, seed)
    sampled = set(
        r[0]
        for r in S.hash_sample(df, "doc_id", 0.25, seed=4, method="mult31").collect()
    )
    assert set(out.loc[out["split"] == "test", "doc_id"]) == sampled


def test_stratified_sample_per_stratum_rates(spark):
    df = _docs(spark)
    out = S.stratified_sample(
        df, "lang", {"en": 0.0, "de": 1.0}, "doc_id", seed=2, method="mult31",
        default_fraction=0.5,
    ).toPandas()
    by = out.groupby("lang")["doc_id"].count()
    assert "en" not in by.index  # fraction 0 drops the stratum
    assert by["de"] == 200  # fraction 1 keeps everything
    # default applies to the unlisted strata, via the same hash
    ids = np.arange(1000, dtype=np.int64)
    frk = ids[(ids % 5 == 3) & (_mult31(ids, 2) / _M < 0.5)]
    assert (np.sort(out.loc[out["lang"] == "fr", "doc_id"].to_numpy()) == frk).all()


def test_sample_n_exact_size_and_brute_force(spark):
    df = _docs(spark)
    out = S.sample_n(df, "doc_id", 50, seed=6, method="mult31").toPandas()
    assert len(out) == 50 and "_h" not in out.columns
    ids = np.arange(1000, dtype=np.int64)
    want = set(ids[np.argsort(_mult31(ids, 6), kind="stable")[:50]])
    assert set(out["doc_id"]) == want
    # physical plan: partial per-partition top-N, not a global sort
    plan = (
        S.sample_n(df, "doc_id", 50, seed=6)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_cap_per_group_matches_pandas_and_plan_truncates(spark):
    from pyspark.sql import functions as F

    df = _docs(spark)
    out = S.cap_per_group(
        df, ["lang"], [F.col("score").desc(), F.col("doc_id")], 7
    ).toPandas()
    pdf = df.toPandas()
    want = (
        pdf.sort_values(["score", "doc_id"], ascending=[False, True])
        .groupby("lang")
        .head(7)
    )
    assert len(out) == len(want) == 5 * 7
    assert set(map(tuple, out[["lang", "doc_id"]].to_numpy())) == set(
        map(tuple, want[["lang", "doc_id"]].to_numpy())
    )
    # rank column retained on request
    ranked = S.cap_per_group(
        df, ["lang"], [F.col("score").desc(), F.col("doc_id")], 7, out_rank="rk"
    )
    assert "rk" in ranked.columns and ranked.agg(F.max("rk")).collect()[0][0] == 7
    # the skew guard: Spark inserts WindowGroupLimit so each partition
    # truncates its groups to n rows BEFORE the exchange
    plan = (
        S.cap_per_group(df, ["lang"], [F.col("score").desc(), F.col("doc_id")], 7)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan


def test_mixture_sample_fractional_epochs(spark):
    df = _docs(spark)
    out = S.mixture_sample(
        df, "lang", {"en": 2.0, "de": 0.5, "fr": 0.0, "zh": 2.25},
        "doc_id", seed=8, method="mult31",
    ).toPandas()
    ids = np.arange(1000, dtype=np.int64)
    langs = np.array([["en", "es", "de", "fr", "zh"][i % 5] for i in ids])
    # integer weight → exactly w copies of every row, epochs 0..w-1
    en = out[out["lang"] == "en"]
    assert len(en) == 2 * 200 and set(en["epoch"]) == {0, 1}
    assert en.groupby("doc_id")["epoch"].count().eq(2).all()
    # weight 0 → stratum dropped entirely
    assert (out["lang"] != "fr").all()
    # default weight 1.0 → exactly one copy, epoch 0
    es = out[out["lang"] == "es"]
    assert len(es) == 200 and (es["epoch"] == 0).all()
    # fractional tail decided by the salted hash, reproducibly
    de_ids = ids[langs == "de"]
    frac_keep = de_ids[((de_ids * 2654435761 + 8 + 0 * 40503) % (1 << 32))
                       / float(1 << 32) < 0.5]
    de = out[out["lang"] == "de"]
    assert set(de["doc_id"]) == set(frac_keep) and (de["epoch"] == 0).all()
    zh = out[out["lang"] == "zh"]
    zh_ids = ids[langs == "zh"]
    extra = zh_ids[((zh_ids * 2654435761 + 8 + 2 * 40503) % (1 << 32))
                   / float(1 << 32) < 0.25]
    assert len(zh) == 2 * len(zh_ids) + len(extra)
    assert set(zh.loc[zh["epoch"] == 2, "doc_id"]) == set(extra)
    # stable under repartitioning (same rows, same epochs)
    out2 = S.mixture_sample(
        df.repartition(17), "lang", {"en": 2.0, "de": 0.5, "fr": 0.0, "zh": 2.25},
        "doc_id", seed=8, method="mult31",
    ).toPandas()
    k1 = sorted(map(tuple, out[["doc_id", "epoch"]].to_numpy()))
    k2 = sorted(map(tuple, out2[["doc_id", "epoch"]].to_numpy()))
    assert k1 == k2
    with pytest.raises(ValueError):
        S.mixture_sample(df, "lang", {"en": -1.0}, "doc_id")
