"""Break down point_in_polygon_join wall time at sf0.1 (debug aid)."""

import sys
import time

sys.path.insert(0, ".")


def main():
    from pyspark.sql import functions as F

    from pythongis_spark import fixtures as FX
    from pythongis_spark.index import udfs as IU
    from pythongis_spark.operators.spatial_join import _refine_pip, point_in_polygon_join
    from pythongis_spark.session import get_spark

    spark = get_spark(app="profpip", cores=32)
    spark.range(1000).count()
    sf = "/root/testdata/sf0.1"
    pts = FX.events_points(spark, sf)
    zones = FX.oracle_zones(spark)

    t0 = time.time(); pts.count(); print(f"pts count: {time.time()-t0:.2f}s")
    t0 = time.time(); z = IU.pick_level(zones); print(f"pick_level: {time.time()-t0:.2f}s z={z}")
    t0 = time.time(); build = IU.explode_bbox_cells(zones, z); n = build.count(); print(f"build explode ({n} rows): {time.time()-t0:.2f}s")
    t0 = time.time()
    probe = pts.withColumn("cell", IU.point_cell_expr(F.col("lon"), F.col("lat"), z))
    cand = probe.join(F.broadcast(build), "cell", "inner")
    nc = cand.count(); print(f"candidates ({nc}): {time.time()-t0:.2f}s")
    t0 = time.time()
    m = cand.filter(_refine_pip(F.col("lon"), F.col("lat"), F.col("geom")))
    nm = m.count(); print(f"refine ({nm}): {time.time()-t0:.2f}s")
    t0 = time.time()
    full = point_in_polygon_join(pts, zones, point_id="event_id")
    full.count(); print(f"full operator: {time.time()-t0:.2f}s")
    t0 = time.time()
    full2 = point_in_polygon_join(pts, zones, point_id="event_id", z=6, build_rows=0)
    full2.count(); print(f"full op (z=6 hint, no count): {time.time()-t0:.2f}s")


if __name__ == "__main__":
    main()
