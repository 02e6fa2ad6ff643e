"""Vector tiling tests vs pure-python oracle of the reference semantics
(pythongis/vector/manager.py:47-79)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pythongis_spark.geometry import core as G
from pythongis_spark.geometry import wkb as W
from pythongis_spark.operators.tiling import point_tile_expr, tiled_vector

BBOX = (-180.0, -90.0, 180.0, 90.0)


def test_point_tiles_match_udf_path(spark):
    pdf = pd.DataFrame(
        {
            "pid": np.arange(200),
            "lon": -180.0 + (np.arange(200) * 7919 % 46080 * 2 + 1) / 256.0,
            "lat": -90.0 + (np.arange(200) * 104729 % 23040 * 2 + 1) / 256.0,
        }
    )
    pdf["geom"] = W.wkb_points_vectorized(pdf["lon"].to_numpy(), pdf["lat"].to_numpy())
    df = spark.createDataFrame(pdf)
    via_udf = tiled_vector(df, BBOX, (5, 5)).select("pid", "tile_id").toPandas()
    via_expr = df.select(
        "pid", point_tile_expr(F.col("lon"), F.col("lat"), BBOX, (5, 5))
    ).toPandas()
    m = via_udf.merge(via_expr, on="pid", suffixes=("_u", "_e"))
    assert (m["tile_id_u"] == m["tile_id_e"]).all()
    # every point appears exactly once (points never span tiles)
    assert len(via_udf) == 200


def test_polygon_spans_tiles_and_clips(spark):
    # polygon covering x in [-100, 100], y in [-10, 10] spans multiple 72°x36° tiles
    ring = np.array(
        [[-100, -10], [100, -10], [100, 10], [-100, 10], [-100, -10]], float
    )
    df = spark.createDataFrame(
        pd.DataFrame({"zid": [1], "geom": [W.wkb_polygon(ring)]})
    )
    out = tiled_vector(df, BBOX, (5, 5)).toPandas()
    assert len(out) > 1  # exploded over several tiles
    total_area = 0.0
    for _, r in out.iterrows():
        g = W.decode_wkb(bytes(r["geom"]))
        a = G.polygon_area(g)
        assert a > 0
        total_area += a
        # clipped geometry fits inside its tile rect
        tx, ty = r["tile_tx"], r["tile_ty"]
        coords = W.all_coords(g)
        assert coords[:, 0].min() >= -180 + tx * 72 - 1e-9
        assert coords[:, 0].max() <= -180 + (tx + 1) * 72 + 1e-9
    assert abs(total_area - 200 * 20) < 1e-6  # pieces sum to the whole


def test_empty_tiles_skipped(spark):
    ring = np.array([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], float)
    df = spark.createDataFrame(pd.DataFrame({"zid": [1], "geom": [W.wkb_polygon(ring)]}))
    out = tiled_vector(df, BBOX, (5, 5)).toPandas()
    assert len(out) == 1  # small polygon sits in one tile only


def test_line_clip_across_tiles(spark):
    line = W.wkb_linestring(np.array([[-100.0, 0.0], [100.0, 0.0]]))
    df = spark.createDataFrame(pd.DataFrame({"lid": [1], "geom": [line]}))
    out = tiled_vector(df, BBOX, (5, 5)).toPandas()
    total = 0.0
    for _, r in out.iterrows():
        total += G.geom_length(W.decode_wkb(bytes(r["geom"])))
    assert abs(total - 200.0) < 1e-6
