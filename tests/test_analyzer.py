"""spatial_stats / closest_point / connect operator tests."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pythongis_spark import fixtures as FX
from pythongis_spark.geometry import core as G
from pythongis_spark.geometry import wkb as W
from pythongis_spark.operators.analyzer import closest_point, connect, spatial_stats


def test_spatial_stats(spark):
    pts = FX.events_points(spark, "/root/testdata/sf0.001")
    zones = FX.oracle_zones(spark)
    out = spatial_stats(
        pts, zones,
        [("n", "event_id", "count"), ("sv", "value", "sum")],
        point_id="event_id",
    ).toPandas()
    assert len(out) == 60  # keepall: every zone present
    assert out["n"].fillna(0).sum() == 1000  # every event in exactly one zone


def test_closest_point_on_polygon(spark):
    ring = np.array([[10.0, 10], [20, 10], [20, 20], [10, 20], [10, 10]])
    targets = spark.createDataFrame(
        pd.DataFrame({"t_id": [1], "geom": [W.wkb_polygon(ring)]})
    )
    pts = spark.createDataFrame(
        pd.DataFrame({"p_id": [1, 2], "lon": [25.0, 15.0], "lat": [15.0, 15.0]})
    )
    out = closest_point(pts, targets, "p_id", "t_id").toPandas().set_index("p_id")
    # point east of the square -> nearest boundary point (20, 15), dist 5
    np.testing.assert_allclose(
        out.loc[1, ["closest_x", "closest_y", "dist"]].astype(float), [20.0, 15.0, 5.0]
    )
    # interior point -> nearest point on the *boundary* ring
    assert abs(out.loc[2, "dist"] - 5.0) < 1e-9


def test_connect_great_circle(spark):
    a = spark.createDataFrame(
        pd.DataFrame({"k": [1], "lon": [0.0], "lat": [0.0]})
    )
    b = spark.createDataFrame(
        pd.DataFrame({"k": [1], "lon": [90.0], "lat": [0.0]})
    )
    out = connect(a, b, "k", segments=10).toPandas()
    assert len(out) == 1
    t, coords = W.decode_wkb(bytes(out.iloc[0]["geom"]))
    assert t == "LineString" and len(coords) == 11
    np.testing.assert_allclose(coords[0], [0, 0], atol=1e-9)
    np.testing.assert_allclose(coords[-1], [90, 0], atol=1e-9)


def test_connect_cross_no_key(spark):
    a = spark.createDataFrame(pd.DataFrame({"lon": [0.0, 1.0], "lat": [0.0, 1.0]}))
    b = spark.createDataFrame(pd.DataFrame({"lon": [5.0], "lat": [5.0]}))
    out = connect(a, b, None, greatcircle=False)
    assert out.count() == 2
    t, coords = W.decode_wkb(bytes(out.toPandas().iloc[0]["geom"]))
    assert len(coords) == 2


def test_snap_points(spark):
    from pythongis_spark.operators.analyzer import snap_points

    ring = np.array([[10.0, 10], [20, 10], [20, 20], [10, 20], [10, 10]])
    targets = spark.createDataFrame(
        pd.DataFrame({"t_id": [1], "geom": [W.wkb_polygon(ring)]})
    )
    pts = spark.createDataFrame(
        pd.DataFrame(
            {"p_id": [1, 2], "lon": [10.3, 50.0], "lat": [10.2, 50.0]}
        )
    )
    out = snap_points(pts, targets, 1.0, point_id="p_id").toPandas().set_index("p_id")
    assert out.loc[1, "snapped"] and out.loc[1, "lon"] == 10.0 and out.loc[1, "lat"] == 10.0
    assert not out.loc[2, "snapped"] and out.loc[2, "lon"] == 50.0
