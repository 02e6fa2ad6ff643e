"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (point-in-polygon spatial join +
quadkey tile assignment + per-zone aggregate) on sf0.001.

``queries()`` / ``oracle_sql()`` pairs: each Spark query runs through the
real engine operators (cell-index spatial join, tiling, …) while the
oracle is plain ANSI SQL over the same parquet tables — possible because
test coordinates derive from integer keys on an exact /256 lattice
(``pythongis_spark/fixtures.py``), so Spark and DuckDB produce
bit-identical doubles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pythongis_spark import fixtures as FX
from pythongis_spark.index import udfs as IU
from pythongis_spark.operators.spatial_join import point_in_polygon_join

TILE_Z = 6


def _tagged_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → deterministic points → pip join onto the 60 oracle zones."""
    pts = FX.events_points(spark, sf_dir)
    zones = FX.oracle_zones(spark)
    return point_in_polygon_join(
        pts, zones, lon="lon", lat="lat", point_id="event_id"
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: load sf0.001, pip-tag event points with zones, assign
    quadkey tiles, aggregate per (zone, tile)."""
    tagged = _tagged_points(spark, "/root/testdata/sf0.001")
    tiled = tagged.withColumn(
        "tile", IU.point_cell_expr(F.col("lon"), F.col("lat"), TILE_Z)
    )
    return tiled.groupBy("zone_id", "tile").agg(
        F.count("*").alias("n_points"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
    )


# ------------------------------------------------------------------
# oracle-checked queries
# ------------------------------------------------------------------

def _q_pip_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _tagged_points(spark, sf_dir).select(
        "event_id", "zone_id", "name", "category"
    )


def _q_pip_zone_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _tagged_points(spark, sf_dir)
        .groupBy("zone_id", "category")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("event_id").alias("sum_event_id"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.sum(F.col("value").cast("decimal(38,9)")).cast("double").alias("sum_value"),
        )
    )


def _q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = FX.events_points(spark, sf_dir)
    return pts.select(
        "event_id",
        IU.point_cell_expr(F.col("lon"), F.col("lat"), TILE_Z).alias("tile"),
    )


def _q_pip_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join: events whose point falls in a category-'A' zone."""
    from pythongis_spark.operators.spatial_join import spatial_semi_join

    pts = FX.events_points(spark, sf_dir)
    zones = FX.oracle_zones(spark).filter(F.col("category") == "A")
    return spatial_semi_join(pts, zones, point_id="event_id").select(
        "event_id", "event_type"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pip_join_rows": _q_pip_rows,
        "pip_zone_stats": _q_pip_zone_stats,
        "tile_assign_quadkey": _q_tile_assign,
        "pip_semi_join": _q_pip_semi,
    }


# ------------------------------------------------------------------
# DuckDB oracles
# ------------------------------------------------------------------

_LON, _LAT = FX.derived_lonlat_sql("event_id")

_PTS_CTE = f"""
pts AS (
  SELECT event_id, event_type, value, {_LON} AS lon, {_LAT} AS lat
  FROM events
)
"""


def _tile_sql(lon: str, lat: str, z: int) -> str:
    n = 1 << z
    tx = f"CAST(FLOOR(({lon} + 180.0) / 360.0 * {n}) AS BIGINT)"
    ty = f"CAST(FLOOR((90.0 - {lat}) / 180.0 * {n}) AS BIGINT)"
    terms = []
    for lvl in range(z):
        terms.append(
            f"(((CAST(FLOOR({ty} / {1 << lvl}) AS BIGINT) % 2) * 2"
            f" + (CAST(FLOOR({tx} / {1 << lvl}) AS BIGINT) % 2)) * {4 ** lvl})"
        )
    return "(" + " + ".join(terms) + ")"


def oracle_sql() -> dict[str, str]:
    zid = FX.zone_id_sql("p.lon", "p.lat")
    return {
        "pip_join_rows": f"""
            WITH {_PTS_CTE}, {FX.ZONES_CTE_SQL}
            SELECT p.event_id, z.zone_id, z.name, z.category
            FROM pts p JOIN zones z ON z.zone_id = {zid}
        """,
        "pip_zone_stats": f"""
            WITH {_PTS_CTE}, {FX.ZONES_CTE_SQL}
            SELECT z.zone_id, z.category,
                   COUNT(*) AS n_events,
                   CAST(SUM(p.event_id) AS BIGINT) AS sum_event_id,
                   MIN(p.value) AS min_value,
                   MAX(p.value) AS max_value,
                   CAST(SUM(CAST(p.value AS DECIMAL(38,9))) AS DOUBLE) AS sum_value
            FROM pts p JOIN zones z ON z.zone_id = {zid}
            GROUP BY z.zone_id, z.category
        """,
        "tile_assign_quadkey": f"""
            WITH {_PTS_CTE}
            SELECT event_id, {_tile_sql('lon', 'lat', TILE_Z)} AS tile
            FROM pts
        """,
        "pip_semi_join": f"""
            WITH {_PTS_CTE}, {FX.ZONES_CTE_SQL}
            SELECT p.event_id, p.event_type
            FROM pts p
            WHERE EXISTS (
              SELECT 1 FROM zones z
              WHERE z.zone_id = {zid} AND z.category = 'A'
            )
        """,
    }
