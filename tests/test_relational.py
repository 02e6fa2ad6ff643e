"""Relational operator semantics tests (reference quirks)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pythongis_spark.operators import relational as R


@pytest.fixture(scope="module")
def table(spark):
    pdf = pd.DataFrame(
        {
            "g": ["a", "a", "a", "b", "b", "c"],
            "v": [1.0, 2.0, 2.0, None, 5.0, None],
            "s": ["x", "y", "y", "z", None, None],
            "seq": [0, 1, 2, 3, 4, 5],
        }
    )
    return spark.createDataFrame(pdf).cache()


def test_aggregate_stats(spark, table):
    out = R.aggregate(
        table,
        ["g"],
        [
            ("n", "v", "count"),
            ("sv", "v", "sum"),
            ("mx", "v", "max"),
            ("first_s", "s", "first"),
            ("last_s", "s", "last"),
            ("cat", "s", "|concat"),
            ("maj", "s", "majority"),
            ("mino", "s", "minority"),
        ],
        order_col="seq",
    ).toPandas().set_index("g").sort_index()
    a = out.loc["a"]
    assert a["n"] == 3 and a["sv"] == 5.0 and a["mx"] == 2.0
    assert a["first_s"] == "x" and a["last_s"] == "y"
    assert a["cat"] == "x|y|y"
    assert a["maj"] == "y" and a["mino"] == "x"
    b = out.loc["b"]
    # missing values excluded (sql.py:109-118): count skips null v
    assert b["n"] == 1 and b["sv"] == 5.0
    assert b["cat"] == "z"
    c = out.loc["c"]
    # empty group -> NULL (reference gives ""; documented divergence)
    assert c["n"] == 0 and pd.isna(c["sv"]) and pd.isna(c["maj"])


def test_majority_tie_break_deterministic(spark):
    pdf = pd.DataFrame({"g": ["a"] * 4, "s": ["q", "p", "q", "p"]})
    df = spark.createDataFrame(pdf)
    out = R.aggregate(df, ["g"], [("maj", "s", "majority"), ("mino", "s", "minority")])
    row = out.first()
    # tie on counts -> lowest value wins both (documented divergence)
    assert row["maj"] == "p" and row["mino"] == "p"


def test_attribute_join_semantics(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3], "name": ["a", "b", "c"], "x": [10, 20, 30]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 2], "x": [99, 98, 97], "y": [7, 8, 9]})
    )
    # duplicate right column 'x' dropped; keepall -> left outer
    out = R.attribute_join(left, right, "k").toPandas().sort_values(["k", "y"])
    assert list(out.columns) == ["k", "name", "x", "y"]
    assert len(out) == 4  # k=1 matches twice, k=3 null-padded
    assert out[out.k == 3]["y"].isna().all()
    assert (out[out.k == 1]["x"] == 10).all()
    # inner
    assert R.attribute_join(left, right, "k", keepall=False).count() == 3
    # collapse: right aggregated per key first -> 1:1
    out2 = R.attribute_join(
        left, right, "k", fieldmapping=[("sum_y", "y", "sum")], collapse=True
    )
    p = out2.toPandas().set_index("k")
    assert p.loc[1, "sum_y"] == 15 and p.loc[2, "sum_y"] == 9


def test_moving_window(spark, table):
    out = (
        R.moving_window(table, 2, [("mv", "v", "sum")], order_col="seq", group_col="g")
        .orderBy("seq")
        .toPandas()
    )
    assert out["mv"].tolist()[:3] == [1.0, 3.0, 4.0]  # trailing 2-row sums in group a


def test_compute_grouped(spark, table):
    out = R.compute_grouped(table, "gsum", "v", "sum", "g").orderBy("seq").toPandas()
    assert out["gsum"].tolist()[:5] == [5.0, 5.0, 5.0, 5.0, 5.0]
    assert pd.isna(out["gsum"].iloc[5])


def test_classify_and_rescale(spark):
    pdf = pd.DataFrame({"id": range(8), "v": [1.0, 2, 3, 4, 5, 6, 7, 8]})
    df = spark.createDataFrame(pdf)
    q = R.classify(df, "v", "quantile", 4, order_tiebreak="id").toPandas()
    assert q.groupby("class").size().tolist() == [2, 2, 2, 2]
    e = R.classify(df, "v", "equal", 2).toPandas().set_index("id")
    assert e.loc[0, "class"] == 1 and e.loc[7, "class"] == 2
    r = R.rescale(df, "v", 0.0, 1.0, out="rv").toPandas()
    assert r["rv"].min() == 0.0 and r["rv"].max() == 1.0


def test_merge_tables_missing_cols(spark):
    a = spark.createDataFrame(pd.DataFrame({"k": [1], "x": ["a"]}))
    b = spark.createDataFrame(pd.DataFrame({"k": [2], "y": [5.0]}))
    out = R.merge_tables(a, b).toPandas().sort_values("k")
    assert set(out.columns) == {"k", "x", "y"}
    assert len(out) == 2


def test_duplicates_by_geom(spark):
    from pythongis_spark.geometry.wkb import wkb_point

    pdf = pd.DataFrame(
        {
            "geom": [wkb_point(1, 1), wkb_point(1, 1), wkb_point(2, 2)],
            "v": [1.0, 2.0, 3.0],
            "seq": [0, 1, 2],
        }
    )
    df = spark.createDataFrame(pdf)
    out = R.duplicates(df, "geom", fieldmapping=[("n", "v", "count"), ("sv", "v", "sum")])
    p = out.toPandas().sort_values("n", ascending=False)
    assert len(p) == 2
    assert p.iloc[0]["n"] == 2 and p.iloc[0]["sv"] == 3.0


def test_histogram(spark):
    pdf = pd.DataFrame({"v": [0.0, 1, 2, 3, 4, 5, 6, 7, 8, 10]})
    out = R.histogram(spark.createDataFrame(pdf), "v", bins=5).toPandas()
    assert out["n"].sum() == 10
    assert len(out) <= 5


def test_dissolve_union_geoms(spark):
    from pythongis_spark.geometry.wkb import decode_wkb, wkb_point

    pdf = pd.DataFrame(
        {
            "g": ["a", "a", "b"],
            "geom": [wkb_point(1, 1), wkb_point(2, 2), wkb_point(3, 3)],
            "v": [1.0, 2.0, 3.0],
        }
    )
    df = spark.createDataFrame(pdf)
    out = R.dissolve(df, ["g"], [("sv", "v", "sum")]).toPandas().set_index("g")
    t, parts = decode_wkb(bytes(out.loc["a", "geom"]))
    assert t == "MultiPoint" and len(parts) == 2
    assert out.loc["a", "sv"] == 3.0


def test_dissolve_linestring_groups(spark):
    """Line layers dissolve to a MultiLineString of the parts instead of
    silently emitting NULL geometry for every group (a road layer lost
    its whole geometry column before)."""
    import numpy as np

    from pythongis_spark.geometry.wkb import decode_wkb, encode_wkb

    l1 = encode_wkb(("LineString", np.array([[0.0, 0.0], [1.0, 1.0]])))
    l2 = encode_wkb(("LineString", np.array([[1.0, 1.0], [2.0, 0.0]])))
    ml = encode_wkb(("MultiLineString",
                     [np.array([[5.0, 5.0], [6.0, 5.0]])]))
    pdf = pd.DataFrame({"g": ["a", "a", "b"], "geom": [l1, l2, ml],
                        "v": [1.0, 2.0, 3.0]})
    out = (R.dissolve(spark.createDataFrame(pdf), ["g"],
                      [("sv", "v", "sum")])
           .toPandas().set_index("g"))
    t, parts = decode_wkb(bytes(out.loc["a", "geom"]))
    assert t == "MultiLineString" and len(parts) == 2
    t, parts = decode_wkb(bytes(out.loc["b", "geom"]))
    assert t == "MultiLineString" and len(parts) == 1


def test_split_by(spark):
    pdf = pd.DataFrame({"k": ["a", "b", "a", "c"], "v": [1, 2, 3, 4]})
    parts = __import__("pythongis_spark.operators.relational", fromlist=["split_by"]).split_by(
        spark.createDataFrame(pdf), "k"
    )
    assert set(parts) == {"a", "b", "c"}
    assert parts["a"].count() == 2
