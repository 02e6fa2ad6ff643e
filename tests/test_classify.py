"""Classification: distributed ntile/unique (no global window) and the
classypie break algorithms, parity-tested against the reference's own
pure-python ``classypie/breaks.py`` imported as a behavioural oracle."""

from __future__ import annotations

import importlib.util
import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pythongis_spark.operators import classify as C

REF_BREAKS = "/root/reference/pythongis/classypie/breaks.py"


@pytest.fixture(scope="module")
def refbreaks():
    spec = importlib.util.spec_from_file_location("_ref_breaks", REF_BREAKS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def values():
    rng = np.random.Generator(np.random.PCG64(7))
    # mixed-scale positive values (log needs >= 0), /256 lattice for
    # cross-engine float determinism
    v = np.round(rng.gamma(2.0, 150.0, size=200) * 256) / 256
    return np.sort(v)


@pytest.fixture(scope="module")
def vdf(spark, values):
    pdf = pd.DataFrame({"id": np.arange(len(values)), "v": values})
    return spark.createDataFrame(pdf)


def test_ntile_distributed_matches_window(spark, vdf):
    for k in (3, 4, 7):
        got = (
            C.ntile_distributed(vdf, "v", k, out="class", tiebreak="id")
            .select("id", "class")
            .toPandas()
            .set_index("id")["class"]
            .sort_index()
        )
        want = (
            vdf.withColumn("class", F.ntile(k).over(Window.orderBy("v", "id")))
            .select("id", "class")
            .toPandas()
            .set_index("id")["class"]
            .sort_index()
        )
        assert (got == want).all(), k


def test_ntile_distributed_fewer_rows_than_buckets(spark):
    df = spark.createDataFrame(pd.DataFrame({"id": [1, 2, 3], "v": [5.0, 1.0, 3.0]}))
    got = C.ntile_distributed(df, "v", 10, out="c", tiebreak="id").toPandas()
    assert sorted(got["c"]) == [1, 2, 3]


def test_unique_rank_matches_dense_rank(spark, vdf):
    small = vdf.withColumn("v", F.floor(F.col("v") / 100))
    got = (
        C.unique_rank(small, "v", out="class")
        .select("id", "class")
        .toPandas()
        .set_index("id")["class"]
        .sort_index()
    )
    want = (
        small.withColumn("class", F.dense_rank().over(Window.orderBy("v")))
        .select("id", "class")
        .toPandas()
        .set_index("id")["class"]
        .sort_index()
    )
    assert (got == want).all()


@pytest.mark.parametrize("algo,refname", [
    ("equal", "equal"),
    ("histogram", "histogram"),
    ("log", "log"),
    ("quantile", "quantile"),
    ("pretty", "pretty"),
    ("stdev", "stdev"),
    ("headtail", "headtail"),
])
def test_breaks_match_reference(spark, vdf, values, refbreaks, algo, refname):
    got = C.class_breaks(vdf, "v", algo, 5)
    want = getattr(refbreaks, refname)(list(values), classes=5)
    assert len(got) == len(want), (algo, got, want)
    for g, w in zip(got, want):
        assert g == pytest.approx(w, rel=1e-12, abs=1e-9), (algo, got, want)


def test_natural_breaks_match_reference_exact(spark, vdf, values, refbreaks):
    # n=200 <= maxsize -> both sides run the exact DP, no sampling
    got = C.class_breaks(vdf, "v", "natural", 5)
    want = refbreaks.natural(list(values), classes=5)
    assert got == pytest.approx(want, rel=1e-12), (got, want)


def test_natural_breaks_sampled_deterministic(spark):
    rng = np.random.Generator(np.random.PCG64(3))
    v = np.sort(rng.normal(0, 10, size=5000))
    df = spark.createDataFrame(pd.DataFrame({"v": v}))
    b1 = C.natural_breaks(df, "v", 4, maxsize=500)
    b2 = C.natural_breaks(df, "v", 4, maxsize=500)
    assert b1 == b2
    assert b1[0] == pytest.approx(v[0]) and b1[-1] == pytest.approx(v[-1])
    assert all(x <= y for x, y in zip(b1, b1[1:]))


def test_apply_breaks_find_class_semantics(spark, refbreaks):
    df = spark.createDataFrame(
        pd.DataFrame({"v": [0.0, 5.0, 10.0, 15.0, 20.0, 25.0]})
    )
    breaks = [0.0, 10.0, 20.0]
    got = C.apply_breaks(df, "v", breaks, out="c").toPandas().set_index("v")["c"]
    # boundary value belongs to the FIRST matching (lower) interval
    assert got[0.0] == 1 and got[5.0] == 1 and got[10.0] == 1
    assert got[15.0] == 2 and got[20.0] == 2
    # outside the range -> miss (null), like reference find_class
    assert pd.isna(got[25.0])
    # cross-check against the reference's find_class (main.py does a
    # relative import, so load it under a synthetic package)
    import sys

    pkg_spec = importlib.util.spec_from_file_location(
        "_refclasspie",
        "/root/reference/pythongis/classypie/__init__.py",
        submodule_search_locations=["/root/reference/pythongis/classypie"],
    )
    pkg = importlib.util.module_from_spec(pkg_spec)
    sys.modules["_refclasspie"] = pkg
    pkg_spec.loader.exec_module(pkg)
    refmain = importlib.import_module("_refclasspie.main")
    for v in [0.0, 5.0, 10.0, 15.0, 20.0]:
        cls, _ = refmain.find_class(v, breaks)
        assert got[v] == cls
    assert refmain.find_class(25.0, breaks) is None


def test_classify_dispatch(spark, vdf):
    from pythongis_spark.operators.relational import classify

    out = classify(vdf, "v", "jenks", 4).toPandas()
    assert set(out["class"].dropna().unique()) <= {1, 2, 3, 4}
    out2 = classify(vdf, "v", "stdev", 5).toPandas()
    assert out2["class"].notna().all()
