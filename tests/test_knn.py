"""kNN / distance join correctness vs brute-force pandas oracle."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pythongis_spark.geometry import geodesy
from pythongis_spark.operators.knn import distance_join, knn_join


def _mkpoints(n, seed, prefix):
    rng = np.random.Generator(np.random.PCG64(seed))
    return pd.DataFrame(
        {
            f"{prefix}_id": np.arange(n, dtype=np.int64),
            "lon": rng.uniform(-170, 170, n),
            "lat": rng.uniform(-70, 70, n),
        }
    )


def brute_knn(pts: pd.DataFrame, tgt: pd.DataFrame, k: int, metric="planar") -> set:
    out = set()
    for _, p in pts.iterrows():
        if metric == "planar":
            d = np.sqrt((tgt["lon"] - p["lon"]) ** 2 + (tgt["lat"] - p["lat"]) ** 2)
        else:
            d = geodesy.haversine_m(
                np.full(len(tgt), p["lon"]), np.full(len(tgt), p["lat"]),
                tgt["lon"].to_numpy(), tgt["lat"].to_numpy(),
            )
        order = sorted(zip(d, tgt["t_id"]))[:k]
        for rk, (dist, tid) in enumerate(order, 1):
            out.add((int(p["p_id"]), int(tid), rk))
    return out


@pytest.fixture(scope="module")
def small(spark):
    pts = _mkpoints(300, 1, "p")
    tgt = _mkpoints(40, 2, "t")
    return spark.createDataFrame(pts).cache(), spark.createDataFrame(tgt).cache(), pts, tgt


@pytest.fixture(scope="module")
def big_targets(spark):
    pts = _mkpoints(400, 3, "p")
    tgt = _mkpoints(20_000, 4, "t")
    return spark.createDataFrame(pts).cache(), spark.createDataFrame(tgt).cache(), pts, tgt


def _collect_knn(df):
    return {
        (r["p_id"], r["t_id"], r["knn_rank"])
        for r in df.select("p_id", "t_id", "knn_rank").collect()
    }


def test_knn_bruteforce_path(spark, small):
    spts, stgt, pts, tgt = small
    got = knn_join(spts, stgt, 3, point_id="p_id", target_id="t_id")
    assert _collect_knn(got) == brute_knn(pts, tgt, 3)


def test_knn_grid_path_exact(spark, big_targets):
    spts, stgt, pts, tgt = big_targets
    got = knn_join(spts, stgt, 5, point_id="p_id", target_id="t_id")
    assert _collect_knn(got) == brute_knn(pts, tgt, 5)


def test_knn_haversine_metric(spark, small):
    spts, stgt, pts, tgt = small
    got = knn_join(spts, stgt, 2, point_id="p_id", target_id="t_id", metric="haversine")
    assert _collect_knn(got) == brute_knn(pts, tgt, 2, metric="haversine")


def test_knn_k_larger_than_targets(spark, small):
    spts, stgt, pts, tgt = small
    got = knn_join(spts, stgt, 100, point_id="p_id", target_id="t_id")
    # every point gets all 40 targets
    counts = got.groupBy("p_id").count().select("count").distinct().collect()
    assert [r["count"] for r in counts] == [40]


def test_distance_join_planar(spark, big_targets):
    spts, stgt, pts, tgt = big_targets
    radius = 3.0
    got = distance_join(spts, stgt, radius, point_id="p_id", target_id="t_id")
    pairs = {(r["p_id"], r["t_id"]) for r in got.select("p_id", "t_id").collect()}
    expected = set()
    for _, p in pts.iterrows():
        d = np.sqrt((tgt["lon"] - p["lon"]) ** 2 + (tgt["lat"] - p["lat"]) ** 2)
        for tid in tgt["t_id"][d <= radius]:
            expected.add((int(p["p_id"]), int(tid)))
    assert pairs == expected
    assert len(pairs) > 0


def test_distance_join_haversine(spark, small):
    spts, stgt, pts, tgt = small
    radius = 500_000.0  # 500 km
    got = distance_join(
        spts, stgt, radius, point_id="p_id", target_id="t_id", metric="haversine"
    )
    pairs = {(r["p_id"], r["t_id"]) for r in got.select("p_id", "t_id").collect()}
    expected = set()
    for _, p in pts.iterrows():
        d = geodesy.haversine_m(
            np.full(len(tgt), p["lon"]), np.full(len(tgt), p["lat"]),
            tgt["lon"].to_numpy(), tgt["lat"].to_numpy(),
        )
        for tid in tgt["t_id"][d <= radius]:
            expected.add((int(p["p_id"]), int(tid)))
    assert pairs == expected
    assert len(pairs) > 0


def _mk_extreme(n, seed, prefix):
    """Points concentrated at high latitude and around the antimeridian —
    the configurations the fixed-ring/grid-edge code used to miss."""
    rng = np.random.Generator(np.random.PCG64(seed))
    lon = np.where(
        rng.uniform(size=n) < 0.5,
        rng.uniform(170, 180, n) * rng.choice([-1, 1], n),
        rng.uniform(-180, 180, n),
    )
    lat = np.where(
        rng.uniform(size=n) < 0.5,
        rng.uniform(76, 89.5, n) * rng.choice([-1, 1], n),
        rng.uniform(-89, 89, n),
    )
    return pd.DataFrame({f"{prefix}_id": np.arange(n, dtype=np.int64), "lon": lon, "lat": lat})


def brute_distance(pts, tgt, radius, metric):
    out = set()
    for _, p in pts.iterrows():
        if metric == "planar":
            d = np.sqrt((tgt["lon"] - p["lon"]) ** 2 + (tgt["lat"] - p["lat"]) ** 2)
        else:
            d = geodesy.haversine_m(
                np.full(len(tgt), p["lon"]), np.full(len(tgt), p["lat"]),
                tgt["lon"].to_numpy(), tgt["lat"].to_numpy(),
            )
        for tid in tgt["t_id"][np.asarray(d) <= radius]:
            out.add((int(p["p_id"]), int(tid)))
    return out


def test_distance_join_haversine_high_lat_antimeridian(spark):
    """Geodetic distance join at |lat| up to 89.5 and across ±180: the
    dynamic lon-ring + wrap + polar brute leg must match brute force
    (the fixed ring=2 / grid-edge-as-wall version missed matches here)."""
    pts = _mk_extreme(250, 11, "p")
    tgt = _mk_extreme(3000, 12, "t")
    spts, stgt = spark.createDataFrame(pts), spark.createDataFrame(tgt)
    radius = 300_000.0  # 300 km
    got = distance_join(
        spts, stgt, radius, point_id="p_id", target_id="t_id",
        metric="haversine", broadcast_targets_rows=10,
    )
    pairs = {(r["p_id"], r["t_id"]) for r in got.select("p_id", "t_id").collect()}
    assert pairs == brute_distance(pts, tgt, radius, "haversine")


def test_knn_haversine_antimeridian_wrap(spark):
    """A probe at lon -179.9 must find its true nearest target at +179.9
    (pre-fix: the grid edge was treated as 'nothing beyond')."""
    pts = pd.DataFrame({"p_id": [0], "lon": [-179.9], "lat": [10.0]})
    # nearest target is across the antimeridian; decoys closer in lon
    tgt = pd.DataFrame(
        {"t_id": [0, 1, 2], "lon": [179.9, -170.0, -160.0], "lat": [10.0, 10.0, 10.0]}
    )
    # pad targets so the grid path is taken rather than broadcast brute force
    pad = _mkpoints(20_000, 13, "t")
    pad["t_id"] = pad["t_id"] + 10
    pad["lat"] = pad["lat"].clip(-60, 60) - 80  # push pad far south
    tgt_all = pd.concat([tgt, pad], ignore_index=True)
    got = knn_join(
        spark.createDataFrame(pts), spark.createDataFrame(tgt_all), 1,
        point_id="p_id", target_id="t_id", metric="haversine",
    )
    rows = got.collect()
    assert len(rows) == 1 and rows[0]["t_id"] == 0


def test_knn_tiny_path_repartitions_single_partition_probe(spark, small):
    """r6 parallelism guard: a probe scanned into fewer partitions than
    defaultParallelism is hash-repartitioned before the tiny-target
    Arrow stage (single-row-group parquet would otherwise run the whole
    Python stage on one core), and the result set is unchanged."""
    spts, stgt, pts, tgt = small
    one = spts.coalesce(1)
    got = knn_join(one, stgt, 3, point_id="p_id", target_id="t_id")
    plan = got._jdf.queryExecution().executedPlan().toString()
    if spark.sparkContext.defaultParallelism > 1:
        assert "Exchange" in plan
    assert _collect_knn(got) == brute_knn(pts, tgt, 3)


def test_knn_point_cols_restriction_identical(spark, small):
    """r6: point_cols restricts the point-side columns serialized out of
    the opaque Arrow stage; rows must equal selecting afterwards."""
    spts, stgt, pts, tgt = small
    full = knn_join(spts, stgt, 3, point_id="p_id", target_id="t_id")
    narrow = knn_join(
        spts, stgt, 3, point_id="p_id", target_id="t_id",
        point_cols=["p_id"],
    )
    assert narrow.columns == ["p_id", "t_id", "dist", "knn_rank"]
    a = sorted(map(tuple, full.select("p_id", "t_id", "dist", "knn_rank").collect()))
    b = sorted(map(tuple, narrow.collect()))
    assert a == b
