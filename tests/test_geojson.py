"""GeoJSON load/save round trip (reference: vector/loader.py:42-199,
saver.py:24)."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pythongis_spark import fixtures as FX
from pythongis_spark.geometry import core as G
from pythongis_spark.geometry import wkb as W
from pythongis_spark.sources.geojson import (
    expand_properties,
    geojson_geom_to_tuple,
    geom_tuple_to_geojson,
    read_geojson,
    write_geojson,
)


def _write_collection(tmp_path, features):
    p = os.path.join(str(tmp_path), "data.geojson")
    with open(p, "w") as fh:
        json.dump({"type": "FeatureCollection", "features": features}, fh)
    return p


FEATURES = [
    {
        "type": "Feature",
        "properties": {"fid": 1, "name": "pt"},
        "geometry": {"type": "Point", "coordinates": [10.5, -20.25]},
    },
    {
        "type": "Feature",
        "properties": {"fid": 2, "name": "line"},
        "geometry": {"type": "LineString", "coordinates": [[0, 0], [1, 1], [2, 0]]},
    },
    {
        "type": "Feature",
        "properties": {"fid": 3, "name": "poly"},
        "geometry": {
            "type": "Polygon",
            "coordinates": [
                [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
                [[2, 2], [4, 2], [4, 4], [2, 4], [2, 2]],
            ],
        },
    },
    {
        "type": "Feature",
        "properties": {"fid": 4, "name": "multi"},
        "geometry": {
            "type": "MultiPolygon",
            "coordinates": [
                [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]],
                [[[5, 5], [6, 5], [6, 6], [5, 6], [5, 5]]],
            ],
        },
    },
    {
        "type": "Feature",
        "properties": {"fid": 5, "name": "nullgeom"},
        "geometry": None,
    },
]


def test_read_geojson_collection(spark, tmp_path):
    path = _write_collection(tmp_path, FEATURES)
    df = read_geojson(spark, path)
    df = expand_properties(df, "fid INT, name STRING")
    rows = {r["fid"]: r for r in df.collect()}
    assert len(rows) == 5
    pt = W.decode_wkb(bytes(rows[1]["geom"]))
    assert pt[0] == "Point" and np.allclose(pt[1], [[10.5, -20.25]])
    poly = W.decode_wkb(bytes(rows[3]["geom"]))
    assert poly[0] == "Polygon" and len(poly[1]) == 2  # hole preserved
    assert abs(G.polygon_area(poly)) == pytest.approx(100 - 4)
    mp = W.decode_wkb(bytes(rows[4]["geom"]))
    assert mp[0] == "MultiPolygon" and G.polygon_area(mp) == pytest.approx(2.0)
    assert rows[5]["geom"] is None  # null geometry preserved


def test_geojson_roundtrip_all_types():
    for f in FEATURES:
        if f["geometry"] is None:
            continue
        g = geojson_geom_to_tuple(f["geometry"])
        back = geom_tuple_to_geojson(W.decode_wkb(W.encode_wkb(g)))
        assert back["type"] == f["geometry"]["type"]
        assert np.allclose(
            W.all_coords(geojson_geom_to_tuple(back)), W.all_coords(g)
        )


def test_write_then_read_ndjson(spark, tmp_path):
    zones = FX.oracle_zones(spark).select("zone_id", "name", "geom").limit(10)
    out = os.path.join(str(tmp_path), "zones_gj")
    write_geojson(zones, out)
    back = read_geojson(spark, out + "/*.txt", ndjson=True)
    back = expand_properties(back, "zone_id BIGINT, name STRING")
    src = {r["zone_id"]: bytes(r["geom"]) for r in zones.collect()}
    got = {r["zone_id"]: bytes(r["geom"]) for r in back.collect()}
    assert set(got) == set(src)
    for zid, blob in got.items():
        a, b = W.decode_wkb(blob), W.decode_wkb(src[zid])
        assert a[0] == b[0]
        assert np.allclose(W.all_coords(a), W.all_coords(b))


def test_read_table_geojson_dispatch(spark, tmp_path):
    from pythongis_spark.sources.tables import read_table

    path = _write_collection(tmp_path, FEATURES[:2])
    df = read_table(spark, path)
    assert set(df.columns) == {"properties", "geom"}
    assert df.count() == 2


def test_z_coordinates_sliced_not_corrupted():
    """RFC 7946 positions may carry elevation; WKB here is 2-D, so the
    third ordinate must be dropped — not serialized as extra doubles."""
    t, payload = geojson_geom_to_tuple(
        {"type": "LineString", "coordinates": [[0, 0, 5.0], [1, 1, 6.0], [2, 0, 7.0]]}
    )
    assert payload.shape == (3, 2)
    assert payload.tolist() == [[0, 0], [1, 1], [2, 0]]
    t, payload = geojson_geom_to_tuple(
        {
            "type": "Polygon",
            "coordinates": [[[0, 0, 1], [4, 0, 1], [4, 4, 1], [0, 0, 1]]],
        }
    )
    assert payload[0].shape == (4, 2)
    t, payload = geojson_geom_to_tuple({"type": "Point", "coordinates": [1, 2, 3]})
    assert payload.shape == (1, 2)
    # WKB round-trips cleanly
    wkb = W.encode_wkb(("LineString", np.array([[0, 0], [1, 1]], float)))
    assert W.decode_wkb(wkb)[1].shape == (2, 2)
