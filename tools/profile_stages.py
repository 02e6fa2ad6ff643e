"""Per-stage scaling profile of the image pipeline (debugging aid).

Usage: python tools/profile_stages.py <cores>
Prints one line: stage timings at that parallelism over /tmp/scale_images.
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from pyspark.sql import functions as F

    from pythongis_spark import fixtures as FX
    from pythongis_spark.images.ops import verify_images
    from pythongis_spark.index import udfs as IU
    from pythongis_spark.operators.spatial_join import point_in_polygon_join
    from pythongis_spark.session import get_spark

    spark = get_spark(app=f"prof{cores}", cores=cores, shuffle_partitions=max(cores, 8))
    spark.range(1000).count()
    imgs = spark.read.parquet("/tmp/scale_images")
    t0 = time.time(); imgs.count(); t_read = time.time() - t0
    t0 = time.time(); imgs.select(F.sum(F.length("bytes"))).collect(); t_bytes = time.time() - t0
    t0 = time.time(); verify_images(imgs).filter("psnr_ok").count(); t_verify = time.time() - t0
    zones = FX.oracle_zones(spark)
    t0 = time.time()
    tagged = point_in_polygon_join(
        imgs.select("image_id", "lon", "lat"), zones,
        point_id="image_id", z=6, build_rows=0,
    )
    tagged.withColumn("tile", IU.point_cell_expr(F.col("lon"), F.col("lat"), 8)).groupBy(
        "zone_id", "tile"
    ).count().count()
    t_join = time.time() - t0
    print(
        f"RESULT cores={cores} count={t_read:.1f}s bytes_scan={t_bytes:.1f}s "
        f"verify={t_verify:.1f}s join={t_join:.1f}s"
    )


if __name__ == "__main__":
    main()
