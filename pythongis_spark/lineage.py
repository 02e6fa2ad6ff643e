"""Per-partition lineage/metrics and checkpoint-resumable writes.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics". The reference has no parallelism, so this is
new-design territory (SURVEY.md §1.4: its streaming module is an empty
stub; resume is a *batch* snapshot concern, not a watermark one).

Design (Iceberg-style snapshot semantics on plain parquet, since the
Iceberg jars are not in this image — connector stubbed behind the same
API):

* a *job* writes data partitioned by a logical key column;
* each successful batch appends a **commit file** to ``_manifest/`` with
  the completed key values + per-key metrics (rows, bytes, wall time) —
  the commit file is written atomically (tmp + rename);
* **resume** = anti-join pending keys against the union of commit files
  and process only the remainder — identical to Iceberg snapshot
  expire/append semantics at the granularity we control from PySpark.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DIR = "_manifest"


def partition_metrics(df: DataFrame) -> DataFrame:
    """One row per physical partition: (partition_id, rows, approx_bytes,
    wall_ms) — collected inside the executors via mapInPandas (the
    per-partition lineage feed)."""

    def run(batches):
        from pyspark import TaskContext

        t0 = time.perf_counter()
        rows = 0
        nbytes = 0
        for pdf in batches:
            rows += len(pdf)
            nbytes += int(pdf.memory_usage(deep=True).sum())
        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        yield pd.DataFrame(
            [
                dict(
                    partition_id=pid,
                    rows=rows,
                    approx_bytes=nbytes,
                    wall_ms=(time.perf_counter() - t0) * 1000.0,
                )
            ]
        )

    return df.mapInPandas(
        run, schema="partition_id int, rows long, approx_bytes long, wall_ms double"
    )


def _manifest_path(base: str) -> str:
    return os.path.join(base, MANIFEST_DIR)


def completed_keys(spark: SparkSession, base: str) -> DataFrame | None:
    """Union of all commit files → DataFrame(key string). None if no
    commits yet."""
    mdir = _manifest_path(base)
    if not os.path.isdir(mdir):
        return None
    files = [os.path.join(mdir, f) for f in sorted(os.listdir(mdir)) if f.endswith(".json")]
    if not files:
        return None
    keys = []
    for f in files:
        with open(f) as fh:
            commit = json.load(fh)
        keys.extend(commit["keys"])
    if not keys:
        return None
    return spark.createDataFrame([(k,) for k in keys], "key string")


def _commit(base: str, keys: list[str], metrics: dict) -> str:
    """Atomic commit: write tmp json then rename (single-FS rename is
    atomic; on an object store this maps to an Iceberg snapshot commit)."""
    mdir = _manifest_path(base)
    os.makedirs(mdir, exist_ok=True)
    commit_id = f"commit-{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}"
    tmp = os.path.join(mdir, f".{commit_id}.tmp")
    final = os.path.join(mdir, f"{commit_id}.json")
    with open(tmp, "w") as fh:
        json.dump({"commit_id": commit_id, "keys": keys, "metrics": metrics}, fh)
    os.rename(tmp, final)
    return final


def run_checkpointed(
    df: DataFrame,
    base: str,
    key_col: str,
    batch_keys: int | None = None,
) -> dict:
    """Write ``df`` partitioned by ``key_col`` with resume support.

    Skips key values already recorded in the manifest (resume =
    anti-join), writes the remainder with dynamic partition overwrite
    (idempotent re-run of a failed batch), then commits the new keys +
    metrics. Returns a summary dict.
    """
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df = df.withColumn(key_col, F.col(key_col).cast("string"))
    done = completed_keys(spark, base)
    pending = df
    if done is not None:
        pending = df.join(
            done.withColumnRenamed("key", key_col), key_col, "left_anti"
        )
    # ONE pre-write job: the per-key counts also carry the key list
    # (a separate distinct().collect() re-ran the whole funnel, and
    # pairing values from independent jobs on the same lazy frame is
    # the drift pattern CLAUDE.md warns about)
    counts = {
        r[0]: r[1]
        for r in pending.groupBy(key_col).agg(F.count("*").alias("n")).collect()
    }
    keys = sorted(counts)
    if not keys:
        return {"written_keys": [], "skipped": True}
    if batch_keys:
        keys = keys[:batch_keys]
        pending = pending.filter(F.col(key_col).isin(keys))
        counts = {k: counts[k] for k in keys}
    t0 = time.perf_counter()
    (
        pending.repartition(F.col(key_col))
        .write.mode("overwrite")
        .partitionBy(key_col)
        .parquet(os.path.join(base, "data"))
    )
    wall = time.perf_counter() - t0
    metrics = {
        "rows_per_key": counts,
        "total_rows": int(sum(counts.values())),
        "wall_sec": wall,
        "throughput_rows_per_sec": (sum(counts.values()) / wall) if wall > 0 else None,
    }
    _commit(base, keys, metrics)
    return {"written_keys": keys, "skipped": False, "metrics": metrics}


def read_checkpointed(spark: SparkSession, base: str) -> DataFrame:
    return spark.read.parquet(os.path.join(base, "data"))


def job_metrics(base: str) -> list[dict]:
    """All commit metrics (the lineage/throughput record the north rule
    asks to accompany each run)."""
    mdir = _manifest_path(base)
    if not os.path.isdir(mdir):
        return []
    out = []
    for f in sorted(os.listdir(mdir)):
        if f.endswith(".json"):
            with open(os.path.join(mdir, f)) as fh:
                out.append(json.load(fh))
    return out
