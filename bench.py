"""Benchmark harness — prints ONE JSON line for the driver.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32), plus the
north-rule image pipeline (generate → decode/verify → pip-tag → quadkey
tile → aggregate) and reports its throughput in images/sec.

Self-defending against co-tenant load (this VM shares hardware; CPU
steal inflates walls 1.5-25x, invisible in `ps`): a parallel-matmul
canary measures window load before and after every measurement pass.
Single-threaded probes stay fast even in squeezed windows — only the
PARALLEL probe reveals the steal — so the canary runs 16 procs of
numpy matmuls and reports mean sec/proc (quiet <= ~0.6, loaded >= ~2).
If a pass ran in a loaded window the whole pass is retried (up to
$SPARK_GRAFT_BENCH_PASSES, default 3), keeping the per-query MINIMUM
across passes; the JSON line carries window_load_before/after, the
per-pass load trace, and a quiet_window flag so the artifact is
interpretable even when no quiet window occurred.

Scaling-efficiency evidence (local[8] vs local[32]) is produced by
``tools/scaling_bench.py`` → ``BENCH/BASELINE.md``; this script is the
single-config per-round benchmark.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
IMG_N = int(os.environ.get("SPARK_GRAFT_IMG_N", "50000"))

# canary thresholds (sec/proc across a 16-proc parallel matmul pool):
# quiet windows on this host measure 0.3-0.6; loaded windows 2-34.
QUIET_LOAD = float(os.environ.get("SPARK_GRAFT_QUIET_LOAD", "1.0"))

BENCH_QUERIES = [
    "pip_join_rows",
    "pip_zone_stats",
    "tile_assign_quadkey",
    "knn_zone_centers",
    "zonal_stats_raster",
    "rasterize_zones",
    "tpch_q1",
    "moving_window_events",
    "join_orders_collapse",
]


def _canary_work(_):
    import numpy as np

    a = np.random.rand(1500, 1500)
    t = time.time()
    for _ in range(6):
        a = a @ a
        a /= np.max(a)
    return time.time() - t


def window_load(nproc: int = 16) -> float:
    """Mean sec/proc of a parallel matmul pool — the co-tenant canary."""
    import multiprocessing as mp

    ctx = mp.get_context("fork")
    with ctx.Pool(nproc) as p:
        times = p.map(_canary_work, range(nproc))
    return round(sum(times) / len(times), 3)


def image_pipeline(spark, n: int) -> int:
    """Back-compat wrapper: full synthesize+verify+join+tile pass."""
    t = image_pipeline_phases(spark, n)
    return t["n"]


def image_pipeline_phases(spark, n: int) -> dict:
    """The north-rule flagship at bench scale, phase-timed:

    * ingest: synthesize the image table distributed + cache (stand-in
      for the Iceberg table scan at 10^12 scale);
    * query: verify payload → pip spatial join → quadkey tile →
      per-(zone, tile) aggregate — the metric BASELINE.json names
      ("spatial-join + tile-assignment throughput, images/sec").
    """
    from pyspark.sql import functions as F

    from pythongis_spark import fixtures as FX
    from pythongis_spark.images.ops import verify_images
    from pythongis_spark.index import udfs as IU
    from pythongis_spark.operators.spatial_join import point_in_polygon_join

    t0 = time.perf_counter()
    imgs = FX.images_df(spark, n, partitions=CPUS * 2).cache()
    assert imgs.count() == n
    t_ingest = time.perf_counter() - t0

    t0 = time.perf_counter()
    ok = verify_images(imgs).filter("psnr_ok AND phash_ok AND caption_ok")
    n_ok = ok.count()
    assert n_ok == n, f"payload verification failed: {n_ok}/{n}"
    zones = FX.oracle_zones(spark)
    tagged = point_in_polygon_join(
        imgs.select("image_id", "lon", "lat"), zones,
        point_id="image_id", z=6, build_rows=0,
    )
    tiled = tagged.withColumn(
        "tile", IU.point_cell_expr(F.col("lon"), F.col("lat"), 8)
    )
    tiled.groupBy("zone_id", "tile").count().count()
    t_query = time.perf_counter() - t0
    imgs.unpersist()
    return {"n": n, "ingest_sec": t_ingest, "query_sec": t_query}


def run_pass(spark, qs, trials: int) -> dict:
    """One full measurement pass: best-of-`trials` per query, plus the
    image pipeline phase-timed (best-of per PHASE independently: ingest
    and query noise are uncorrelated co-tenant steal)."""
    timings = {}
    for name in BENCH_QUERIES:
        best = None
        for _ in range(trials):
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).count()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)

    phases = None
    best_ingest = None
    for _ in range(trials):
        ph = image_pipeline_phases(spark, IMG_N)
        if phases is None or ph["query_sec"] < phases["query_sec"]:
            phases = ph
        if best_ingest is None or ph["ingest_sec"] < best_ingest:
            best_ingest = ph["ingest_sec"]
    timings["image_ingest"] = round(best_ingest, 3)
    timings["image_pipeline"] = round(phases["query_sec"], 3)
    return {"timings": timings, "n_images": phases["n"]}


def main():
    t_start = time.perf_counter()
    from pythongis_spark.session import get_spark

    spark = get_spark(app="bench", cores=CPUS, shuffle_partitions=CPUS)
    # warm the JVM + the python UDF workers (first pandas-UDF execution
    # pays ~10s of worker spawn + imports) so per-query numbers reflect
    # steady state
    spark.range(1000).count()
    from pyspark.sql import functions as F

    from pythongis_spark.geometry.udfs import st_point

    spark.range(CPUS * 4).select(
        st_point(F.col("id").cast("double"), F.col("id").cast("double"))
    ).count()

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "2"))
    max_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))

    load_before = window_load()
    timings = None
    n_images = IMG_N
    loads = [load_before]
    passes = 0
    for _ in range(max_passes):
        res = run_pass(spark, qs, trials)
        passes += 1
        n_images = res["n_images"]
        if timings is None:
            timings = dict(res["timings"])
        else:  # min-merge: keep the quietest measurement of each query
            for k, v in res["timings"].items():
                timings[k] = min(timings[k], v)
        load_after = window_load()
        loads.append(load_after)
        # the pass is trustworthy when the window was quiet at BOTH ends
        if loads[-2] <= QUIET_LOAD and load_after <= QUIET_LOAD:
            break

    quiet = any(
        loads[i] <= QUIET_LOAD and loads[i + 1] <= QUIET_LOAD
        for i in range(len(loads) - 1)
    )
    total = round(sum(timings.values()), 3)
    # image query phase wall backing the images/sec headline
    q_sec = timings["image_pipeline"]
    print(
        json.dumps(
            {
                "metric": "spatial-join + tile-assignment throughput (images/sec) and headline query wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR.rstrip("/").split("sf")[-1],
                "cpus": CPUS,
                "images": n_images,
                # the north-rule metric: verify + pip join + tile + agg
                "images_per_sec": round(n_images / q_sec, 1),
                "ingest_images_per_sec": round(
                    n_images / timings["image_ingest"], 1
                ),
                # co-tenant canary evidence (sec/proc, 16-proc matmul
                # pool; quiet <= 1.0 on this host). quiet_window=false
                # means NO quiet window occurred across all passes and
                # the numbers above are upper bounds, not engine cost.
                "window_load_before": loads[0],
                "window_load_after": loads[-1],
                "window_loads": loads,
                "quiet_window": quiet,
                "passes": passes,
                "total_wall_sec": round(time.perf_counter() - t_start, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
