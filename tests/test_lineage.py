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


def test_text_pipeline_job_end_to_end(spark, tmp_path, capsys):
    """Flagship text-pipeline job: funnel monotone non-increasing, every
    stage present, output partitioned by lang, second run resumes (skips
    all completed partitions). Runs at sf0.001 on the fixture session
    (SparkSession.getOrCreate reuses it)."""
    import json
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
    import text_pipeline_job

    base = str(tmp_path / "tpj")
    text_pipeline_job.main(["--sf-dir", "/root/testdata/sf0.001", "--out", base])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    f = rep["funnel"]
    order = ["input", "after_domain_cap", "after_quality_gate",
             "after_exact_dedup", "after_near_dedup", "after_decontamination"]
    assert list(f) == order
    vals = [f[k] for k in order]
    assert vals == sorted(vals, reverse=True) and vals[-1] > 0
    assert not rep["skipped"] and rep["written_keys"] >= 1

    out = L.read_checkpointed(spark, base)
    assert out.count() == f["after_decontamination"]
    assert {"chunk_id", "chunk_offset", "n_chunks", "lang"} <= set(out.columns)

    # resume: identical deterministic funnel, nothing rewritten
    text_pipeline_job.main(["--sf-dir", "/root/testdata/sf0.001", "--out", base])
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["skipped"] and rep2["funnel"] == f
