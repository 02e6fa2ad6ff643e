"""Extra measurement harness (guide §1.4) — NOT the driver metric.

Isolates individual queries with the noop sink so the computation is
timed without sink/count effects, prints per-query best-of-N, and can
run ad-hoc variants. ``bench.py`` stays frozen; numbers from here are
cited in OPTIMIZATION_r06.md.

Usage:
    python bench_extra.py [sf_dir] [query ...]       # noop-isolate
    SPARK_GRAFT_CPUS=32 python bench_extra.py ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = (
    sys.argv[1] if len(sys.argv) > 1 else
    os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
)
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TRIALS = int(os.environ.get("SPARK_GRAFT_EXTRA_TRIALS", "3"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def time_df(spark, label, make, trials=TRIALS):
    best = None
    for _ in range(trials):
        spark.sparkContext.setJobDescription(label)
        df = make()
        t0 = time.perf_counter()
        noop(df)
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    spark.sparkContext.setJobDescription(None)
    print(f"{label}: {best:.3f}s  (best of {trials}, noop sink)")
    return best


def main():
    from pythongis_spark.session import get_spark

    spark = get_spark(app="bench_extra", cores=CPUS, shuffle_partitions=CPUS)
    spark.range(1000).count()
    from pyspark.sql import functions as F

    from pythongis_spark.geometry.udfs import st_point

    spark.range(CPUS * 4).select(
        st_point(F.col("id").cast("double"), F.col("id").cast("double"))
    ).count()

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = sys.argv[2:] or [
        "pip_join_rows", "pip_zone_stats", "tile_assign_quadkey",
        "knn_zone_centers", "zonal_stats_raster", "rasterize_zones",
        "tpch_q1", "moving_window_events", "join_orders_collapse",
    ]
    total = 0.0
    for name in names:
        total += time_df(spark, name, lambda: qs[name](spark, SF_DIR))
    print(f"TOTAL: {total:.3f}s  sf={SF_DIR}")


if __name__ == "__main__":
    main()
