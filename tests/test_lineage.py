"""Checkpoint/resume + partition metrics tests."""

import os

import pytest
from pyspark.sql import functions as F

from pythongis_spark import lineage as L


def test_partition_metrics(spark):
    df = spark.range(10_000).repartition(4)
    m = L.partition_metrics(df).toPandas()
    assert m["rows"].sum() == 10_000
    assert len(m) == 4
    assert (m["approx_bytes"] > 0).all()


def test_checkpoint_resume(spark, tmp_path):
    base = str(tmp_path / "job")
    df = spark.range(1000).withColumn("k", F.pmod(F.col("id"), 10).cast("string"))

    # first run: only 4 keys (simulated partial run / crash after commit)
    r1 = L.run_checkpointed(df, base, "k", batch_keys=4)
    assert len(r1["written_keys"]) == 4 and not r1["skipped"]
    assert len(L.job_metrics(base)) == 1

    # resume: processes exactly the remaining 6 keys
    r2 = L.run_checkpointed(df, base, "k")
    assert len(r2["written_keys"]) == 6
    assert set(r1["written_keys"]) & set(r2["written_keys"]) == set()

    # third run: nothing pending
    r3 = L.run_checkpointed(df, base, "k")
    assert r3["skipped"]

    # data complete and correct
    out = L.read_checkpointed(spark, base)
    assert out.count() == 1000
    assert out.select("k").distinct().count() == 10

    # lineage metrics recorded per commit with throughput
    commits = L.job_metrics(base)
    assert len(commits) == 2
    assert all(c["metrics"]["throughput_rows_per_sec"] > 0 for c in commits)


def test_checkpoint_idempotent_rerun_overwrites(spark, tmp_path):
    base = str(tmp_path / "job2")
    df = spark.range(100).withColumn("k", F.pmod(F.col("id"), 2).cast("string"))
    L.run_checkpointed(df, base, "k", batch_keys=1)
    # simulate a re-run of the same batch after a crash *before* commit:
    # dynamic overwrite of the same partition must not duplicate rows
    L.run_checkpointed(df, base, "k")
    assert L.read_checkpointed(spark, base).count() == 100
