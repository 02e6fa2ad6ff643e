"""Goldens: Spark operators vs the reference-mirroring pure-Python oracle
(pythongis_spark/oracle.py; algorithms cited from /root/reference)."""

import numpy as np
import pandas as pd
import pytest

from pythongis_spark import fixtures as FX
from pythongis_spark import oracle as O
from pythongis_spark.geometry import wkb as W
from pythongis_spark.operators import relational as R
from pythongis_spark.operators.spatial_join import spatial_join
from pythongis_spark.operators.tiling import tiled_vector
from pythongis_spark.raster.model import tile_windows


def test_raster_tile_windows_match_reference_loop():
    for w, h, tw, th in [(360, 180, 64, 64), (100, 50, 30, 30), (10, 10, 10, 10)]:
        assert tile_windows(w, h, tw, th) == O.ref_raster_tiles(w, h, tw, th)


def test_vector_tiling_matches_reference(spark):
    zones = FX.golden_zones_pdf(40)
    feats = [(int(r["zone_id"]), r["geom"]) for _, r in zones.iterrows()]
    golden = O.ref_vector_tiles(feats, (-180.0, -90.0, 180.0, 90.0), (4, 4))
    df = spark.createDataFrame(zones[["zone_id", "geom"]])
    got = tiled_vector(df, (-180.0, -90.0, 180.0, 90.0), (4, 4)).toPandas()
    got_map = {}
    for _, r in got.iterrows():
        got_map.setdefault((r["tile_tx"], r["tile_ty"]), []).append(int(r["zone_id"]))
    assert {k: sorted(v) for k, v in got_map.items()} == {
        k: sorted(v) for k, v in golden.items()
    }


def test_spatial_join_matches_reference_loop(spark):
    zones = FX.golden_zones_pdf(30)
    a = [(int(r["zone_id"]), r["geom"]) for _, r in zones.iloc[:15].iterrows()]
    b = [(int(r["zone_id"]), r["geom"]) for _, r in zones.iloc[10:].iterrows()]
    golden = set(O.ref_spatial_join_pairs(a, b, "intersects"))
    adf = spark.createDataFrame(
        pd.DataFrame({"a_id": [i for i, _ in a], "geom": [g for _, g in a]})
    )
    bdf = spark.createDataFrame(
        pd.DataFrame({"b_id": [i for i, _ in b], "geom": [g for _, g in b]})
    )
    got = spatial_join(adf, bdf, "intersects", left_id="a_id")
    pairs = {(r["a_id"], r["b_id"]) for r in got.select("a_id", "b_id").collect()}
    assert pairs == golden


def test_hash_join_semantics_match_reference(spark):
    left = [dict(k=1, a="x"), dict(k=2, a="y"), dict(k=3, a="z")]
    right = [dict(k=1, b=10, a="OVERRIDDEN"), dict(k=1, b=11), dict(k=2, b=20)]
    golden = O.ref_hash_join(left, right, "k", keepall=True)
    ldf = spark.createDataFrame(pd.DataFrame(left))
    rdf = spark.createDataFrame(
        pd.DataFrame([{**{"b": None}, **r} for r in right])
    )
    got = R.attribute_join(ldf, rdf, "k", keepall=True).toPandas()
    # same row multiset on (k, a, b); reference drops right's duplicate 'a'
    gold_set = sorted((r["k"], r["a"], r.get("b")) for r in golden)
    got_set = sorted(
        (int(r.k), r.a, None if pd.isna(r.b) else int(r.b)) for r in got.itertuples()
    )
    assert got_set == gold_set


def test_aggreg_quirks_vs_reference():
    """Document exactly where we diverge from vector/sql.py:103-137 and
    verify the parts that must match."""
    rows = [
        dict(v=1, s="a"),
        dict(v=None, s="b"),
        dict(v="not_a_number", s="b"),
        dict(v=3.5, s=None),
    ]
    g = O.ref_aggreg(
        rows,
        [
            ("n", "v", "count"),
            ("sv", "v", "sum"),
            ("maj", "s", "majority"),
            ("cat", "s", "|concat"),
        ],
    )
    # numeric coercion drops 'not_a_number'; count keeps it (non-null)
    assert g["sv"] == 4.5
    assert g["n"] == 3
    assert g["maj"] == "b"
    assert g["cat"] == "a|b|b"
    # empty numeric group -> "" in the reference; our Spark engine gives
    # NULL (typed column) — divergence asserted here so it stays documented
    g2 = O.ref_aggreg([dict(v=None)], [("sv", "v", "sum")])
    assert g2["sv"] == ""
