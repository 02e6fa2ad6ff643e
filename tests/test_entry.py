"""Smoke + oracle tests of the driver contract (__spark_entry__.py) at
sf0.001 (the driver itself runs sf0.01)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tools.check_oracle import TABLES, normalize

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"zone_id", "tile", "n_points", "min_event_id", "max_event_id"}


def test_every_query_has_callable_and_runs(spark):
    qs = entrymod.queries()
    assert qs, "queries() must not be empty"
    for name, fn in qs.items():
        df = fn(spark, SF)
        assert df.count() >= 0, name


@pytest.mark.parametrize("name", list(entrymod.queries().keys()))
def test_oracle_match(spark, duck, name):
    osql = entrymod.oracle_sql()
    if name not in osql:
        pytest.skip("rows-only query")
    s = normalize(entrymod.queries()[name](spark, SF).toPandas())
    d = normalize(duck.execute(osql[name]).fetchdf())
    assert list(s.columns) == list(d.columns), name
    assert len(s) == len(d), name
    assert s.equals(d), name
