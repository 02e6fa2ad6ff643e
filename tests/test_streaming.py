"""Structured Streaming surface (reference vector/streaming.py is an
empty stub — this is the Spark-native realization; SURVEY.md §2.11)."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(autouse=True)
def _few_state_partitions(spark):
    """Stateful streaming cost scales with state-store partition count
    (per-partition store init each micro-batch); tiny fixtures don't
    need 32."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", old)


def _write_events(spark, path, rows):
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(path)


def test_windowed_counts_available_now(spark, tmp_path):
    from pythongis_spark.streaming import read_event_stream, windowed_counts
    from pythongis_spark.streaming.pipeline import run_available_now

    src = str(tmp_path / "events")
    _write_events(spark, src, [
        dict(event_id=1, user_id=1, event_type="a", value=1.0, ts="2026-01-01 00:01:00"),
        dict(event_id=2, user_id=1, event_type="a", value=2.0, ts="2026-01-01 00:04:00"),
        dict(event_id=3, user_id=2, event_type="b", value=5.0, ts="2026-01-01 00:12:00"),
        dict(event_id=4, user_id=2, event_type="a", value=7.0, ts="2026-01-01 00:13:00"),
    ])
    stream = read_event_stream(spark, src)
    assert stream.isStreaming
    agg = windowed_counts(stream, window="10 minutes", watermark="20 minutes")
    # complete mode: append would emit a window only after a LATER
    # micro-batch advances the watermark past its end — with a single
    # availableNow batch nothing would surface (state is correct either
    # way; the sink mode just picks when results become visible)
    run_available_now(agg, "win_counts", str(tmp_path / "ckpt"),
                      output_mode="complete")
    out = spark.sql("select * from win_counts").toPandas()
    got = {
        (str(r.win_start), r.event_type): (r.n, r.sum_value)
        for r in out.itertuples()
    }
    assert got[("2026-01-01 00:00:00", "a")] == (2, 3.0)
    assert got[("2026-01-01 00:10:00", "b")] == (1, 5.0)
    assert got[("2026-01-01 00:10:00", "a")] == (1, 7.0)


def test_stream_pip_tag_stream_static_join(spark, tmp_path):
    from pythongis_spark import fixtures as FX
    from pythongis_spark.streaming import read_event_stream, stream_pip_tag
    from pythongis_spark.streaming.pipeline import run_available_now

    src = str(tmp_path / "pts")
    # zone 0 spans [-180,-144]x[-90,-60]; zone 59 spans [144,180]x[60,90]
    _write_events(spark, src, [
        dict(event_id=1, user_id=1, event_type="a", value=1.0,
             ts="2026-01-01 00:00:00", lon=-150.0, lat=-75.0),
        dict(event_id=2, user_id=1, event_type="a", value=1.0,
             ts="2026-01-01 00:00:10", lon=150.0, lat=75.0),
    ])
    schema = ("event_id bigint, user_id bigint, event_type string, "
              "value double, ts timestamp, lon double, lat double")
    stream = read_event_stream(spark, src, schema=schema)
    zones = FX.oracle_zones(spark)
    tagged = stream_pip_tag(stream, zones)
    run_available_now(tagged.select("event_id", "zone_id"), "pip_tags",
                      str(tmp_path / "ckpt2"))
    out = {r["event_id"]: r["zone_id"]
           for r in spark.sql("select * from pip_tags").collect()}
    assert out == {1: 0, 2: 59}


def test_sessionize_stream_closes_on_gap(spark, tmp_path):
    from pythongis_spark.streaming import read_event_stream, sessionize_stream
    from pythongis_spark.streaming.pipeline import run_available_now

    src = str(tmp_path / "sess")
    # user 1: two bursts 2h apart -> first session closes inside the batch
    _write_events(spark, src, [
        dict(event_id=1, user_id=1, event_type="a", value=1.0, ts="2026-01-01 00:00:00"),
        dict(event_id=2, user_id=1, event_type="a", value=1.0, ts="2026-01-01 00:10:00"),
        dict(event_id=3, user_id=1, event_type="a", value=1.0, ts="2026-01-01 02:30:00"),
    ])
    stream = read_event_stream(spark, src)
    sess = sessionize_stream(stream, gap_seconds=3600)
    run_available_now(sess, "sessions", str(tmp_path / "ckpt3"),
                      output_mode="append")
    out = spark.sql("select * from sessions").toPandas()
    # the 2-event session closed when the 3rd event arrived past the gap
    assert len(out) == 1
    r = out.iloc[0]
    # session_id = epoch second of the session's first event (unique
    # across timeout closures, unlike a counter reset by state.remove)
    import pandas as pd

    assert r["user_id"] == 1 and r["n_events"] == 2
    assert r["session_id"] == int(pd.Timestamp(r["start_ts"]).timestamp())
    assert str(r["start_ts"]).startswith("2026-01-01 00:00:00")
    assert str(r["end_ts"]).startswith("2026-01-01 00:10:00")
