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


def test_snap_geoms_all_vertices(spark):
    """General vertex snap (reference manager.py:622-648): every vertex
    of lines/polygons within tolerance moves to the nearest target
    vertex; out-of-tolerance vertices stay."""
    import pandas as pd
    from pythongis_spark.operators.analyzer import snap_geoms

    tgt_ring = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    targets = spark.createDataFrame(
        pd.DataFrame({"tid": [1], "geom": [W.wkb_polygon(tgt_ring)]})
    )
    # line: first vertex near (0,0), middle far from any target vertex,
    # last near (10,10)
    line = np.array([[0.05, -0.08], [5.0, 5.0], [9.94, 10.03]], float)
    ring = np.array([[0.1, 0.1], [9.92, 0.06], [9.95, 9.9], [0.08, 9.93],
                     [0.1, 0.1]], float)
    data = spark.createDataFrame(
        pd.DataFrame({
            "fid": [1, 2],
            "geom": [
                W.encode_wkb(("LineString", line)),
                W.wkb_polygon(ring),
            ],
        })
    )
    out = {r["fid"]: r for r in
           snap_geoms(data, targets, 0.2, feature_id="fid").collect()}
    lg = W.decode_wkb(bytes(out[1]["geom"]))
    assert lg[0] == "LineString"
    assert lg[1].tolist() == [[0, 0], [5, 5], [10, 10]]
    assert out[1]["n_snapped"] == 2
    pg = W.decode_wkb(bytes(out[2]["geom"]))
    assert pg[0] == "Polygon"
    assert pg[1][0].tolist() == [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]
    assert out[2]["n_snapped"] == 4
