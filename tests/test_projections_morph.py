"""Web-mercator reprojection + raster morphology tests."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pythongis_spark.geometry import projections as P
from pythongis_spark.geometry import wkb as W
from pythongis_spark.raster import algebra as A


def test_webmercator_roundtrip_points(spark):
    pdf = pd.DataFrame({"lon": [0.0, 10.0, -122.4], "lat": [0.0, 51.5, 37.8]})
    df = spark.createDataFrame(pdf)
    out = P.reproject_points(df, to="EPSG:3857").toPandas()
    # known value: lon=0 -> x=0; lat=0 -> y=0
    assert out.iloc[0]["x_m"] == 0.0 and abs(out.iloc[0]["y_m"]) < 1e-9
    back = df.sparkSession.createDataFrame(out[["x_m", "y_m"]])
    inv = back.select(
        P.inv_webmercator_lon(F.col("x_m")).alias("lon"),
        P.inv_webmercator_lat(F.col("y_m")).alias("lat"),
    ).toPandas()
    np.testing.assert_allclose(inv["lon"], pdf["lon"], atol=1e-9)
    np.testing.assert_allclose(inv["lat"], pdf["lat"], atol=1e-9)


def test_reproject_geom_polygon(spark):
    ring = np.array([[0.0, 0], [10, 0], [10, 10], [0, 10], [0, 0]])
    df = spark.createDataFrame(pd.DataFrame({"geom": [W.wkb_polygon(ring)]}))
    out = P.reproject_geom(df, "EPSG:3857").toPandas()
    t, rings = W.decode_wkb(bytes(out.iloc[0]["geom"]))
    assert t == "Polygon"
    # x of lon=10 = radians(10)*R
    assert abs(rings[0][1][0] - math.radians(10) * P.R_MAJOR) < 1e-6


def test_morphology_dilate_erode_edge(spark):
    # single lit cell at (5,5)
    pdf = pd.DataFrame({"x": [5], "y": [5], "band": [0], "val": [1.0]})
    df = spark.createDataFrame(pdf)
    d = A.morphology(df, "dilate", 1).toPandas()
    assert len(d) == 9 and (d["val"] == 1.0).all()
    e = A.morphology(df, "erode", 1).toPandas()
    # no full 3x3 window anywhere -> erosion kills everything
    assert (e["val"] == 0.0).all()
    # 3x3 block: erosion survives only at the center
    block = pd.DataFrame(
        [(x, y, 0, 1.0) for x in range(3) for y in range(3)],
        columns=["x", "y", "band", "val"],
    )
    e2 = A.morphology(spark.createDataFrame(block), "erode", 1).toPandas()
    alive = e2[e2["val"] > 0]
    assert len(alive) == 1 and alive.iloc[0]["x"] == 1 and alive.iloc[0]["y"] == 1
    edge = A.morphology(spark.createDataFrame(block), "edge", 1).toPandas()
    # edge mask: dilated ring minus interior
    assert edge[(edge.x == 1) & (edge.y == 1)]["val"].iloc[0] == 0.0
    assert edge[(edge.x == 0) & (edge.y == 0)]["val"].iloc[0] == 1.0
