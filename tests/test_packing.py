"""Sequence packing + decontamination: brute-force parity, partition
invariance, straddle/edge semantics, and the scale-shape properties
(parallel global cumsum — no single-partition window; broadcast eval
side for the contamination anti-join)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pythongis_spark.operators.packing import pack_bins, pack_chunks
from pythongis_spark.operators.dedup import decontaminate, word_ngrams


def _frame(spark, n=500, seed=7):
    rng = np.random.RandomState(seed)
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "grp": [["a", "b", "c"][i % 3] for i in range(n)],
            "tok": rng.randint(0, 900, size=n).astype(np.int64),
        }
    )
    # sprinkle zero-token docs and one doc larger than any budget used
    pdf.loc[pdf.index % 97 == 0, "tok"] = 0
    pdf.loc[3, "tok"] = 5000
    return pdf, spark.createDataFrame(pdf)


def _chunks_oracle(pdf, budget):
    p = pdf.sort_values("doc_id").reset_index(drop=True)
    cum = p["tok"].cumsum()
    before = cum - p["tok"]
    first = before // budget
    last = np.where(p["tok"] > 0, (cum - 1) // budget, first)
    return pd.DataFrame(
        {
            "doc_id": p["doc_id"],
            "chunk_id": first.astype(np.int64),
            "chunk_offset": (before - first * budget).astype(np.int64),
            "n_chunks": (last - first + 1).astype(np.int64),
        }
    )


def test_pack_chunks_matches_bruteforce_and_is_partition_stable(spark):
    pdf, df = _frame(spark)
    exp = _chunks_oracle(pdf, 512)
    for d in (df, df.repartition(13)):
        got = (
            pack_chunks(d, "tok", 512, "doc_id")
            .select("doc_id", "chunk_id", "chunk_offset", "n_chunks")
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp)
    # the 5000-token doc straddles ceil-ish many 512-cuts
    big = exp[exp["doc_id"] == 3].iloc[0]
    assert big["n_chunks"] >= 10
    # every zero-token doc occupies exactly one (boundary) chunk
    z = exp[pdf.sort_values("doc_id").reset_index(drop=True)["tok"] == 0]
    assert (z["n_chunks"] == 1).all()
    # chunk_offset always within budget
    assert ((exp["chunk_offset"] >= 0) & (exp["chunk_offset"] < 512)).all()


def test_pack_chunks_validations(spark):
    pdf, df = _frame(spark, n=50)
    with pytest.raises(ValueError):
        pack_chunks(df, "tok", 0, "doc_id")
    bad = df.withColumn("tok", F.when(F.col("doc_id") == 7, -1).otherwise(F.col("tok")))
    with pytest.raises(Exception, match="bad token count"):
        pack_chunks(bad, "tok", 512, "doc_id").collect()


def test_pack_chunks_no_single_partition_window(spark):
    _, df = _frame(spark)
    plan = (
        pack_chunks(df, "tok", 512, "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the cumsum window is partitioned by _pid — a global
    # Window.orderBy would show an Exchange SinglePartition
    assert "SinglePartition" not in plan


def _bins_oracle(pdf, budget):
    out = {}
    for _, g in pdf.groupby("grp"):
        g = g.sort_values("doc_id")
        bid, acc = 0, 0
        for did, t in zip(g["doc_id"], g["tok"]):
            if acc > 0 and acc + t > budget:
                bid += 1
                acc = 0
            out[did] = bid
            acc += t
    return out


def test_pack_bins_matches_greedy_and_is_partition_stable(spark):
    pdf, df = _frame(spark)
    exp = _bins_oracle(pdf, 1024)
    for d in (df, df.repartition(13)):
        got = pack_bins(d, "tok", 1024, "grp", "doc_id").toPandas()
        assert dict(zip(got["doc_id"], got["bin_id"])) == exp
    # the oversized doc gets a bin of its own — no other TOKENS share it
    # (zero-token docs may sit in any bin; they occupy no budget)
    got = pack_bins(df, "tok", 1024, "grp", "doc_id").toPandas()
    g3 = got[got["doc_id"] == 3]["bin_id"].iloc[0]
    sharing = got[
        (got["grp"] == pdf.loc[3, "grp"]) & (got["bin_id"] == g3) & (got["tok"] > 0)
    ]
    assert len(sharing) == 1
    # every bin holds ≤ budget tokens unless it IS an oversized single doc
    per_bin = got.groupby(["grp", "bin_id"])["tok"]
    assert ((per_bin.sum() <= 1024) | (per_bin.max() > 1024)).all()
    with pytest.raises(ValueError):
        pack_bins(df, "tok", -5, "grp", "doc_id")


def _texts(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (1, "one two three four five six seven eight nine ten eleven"),
        (2, "Alpha, beta; GAMMA delta epsilon zeta eta theta different tail"),
        (3, "short doc"),
        (4, "unrelated words entirely disjoint from any evaluation corpus"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_word_ngrams_normalizes_and_handles_short_docs(spark):
    df = _texts(spark)
    got = {
        r["doc_id"]: r["g"]
        for r in df.select("doc_id", word_ngrams(F.col("text"), 8).alias("g")).collect()
    }
    assert got[3] == []  # shorter than n → no grams
    assert "alpha beta gamma delta epsilon zeta eta theta" in got[0]
    # punctuation/case-insensitive: doc 2 shares its first 8-gram prefix
    assert got[2][0] == got[0][0]
    with pytest.raises(ValueError):
        word_ngrams(F.col("text"), 0)


def test_decontaminate_flags_quoting_docs_only(spark):
    df = _texts(spark)
    ev = spark.createDataFrame(
        [("beta gamma delta epsilon zeta eta theta iota",)], ["text"]
    )
    for hash_grams in (False, True):
        surv = decontaminate(df, ev, "doc_id", n=8, hash_grams=hash_grams)
        kept = sorted(r["doc_id"] for r in surv.collect())
        assert kept == [1, 2, 3, 4]  # doc 0 contains the eval 8-gram
        bad = decontaminate(
            df, ev, "doc_id", n=8, hash_grams=hash_grams, keep=False
        )
        assert [r["doc_id"] for r in bad.collect()] == [0]
    # broadcast shape: eval side enters as a broadcast exchange
    plan = (
        decontaminate(df, ev, "doc_id", n=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Broadcast" in plan
