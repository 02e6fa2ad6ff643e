"""Streaming operators over the event/image tables.

Design (per the Spark Structured Streaming model):

* sources are ``readStream`` file sources (parquet drops — the
  batch-incremental analog in ``sources/tables.incremental_files``
  upgraded to the engine-managed form); at production scale the same
  code binds to Kafka/Iceberg streaming reads.
* event time = an explicit timestamp column; late data is bounded by a
  WATERMARK so windowed state is evicted deterministically.
* spatial tagging is a stream-STATIC join: the zone table is a bounded
  dimension, so the batch engine's broadcast cell-join plan applies
  unchanged (Structured Streaming supports stream-static equi-joins;
  the Arrow refine UDF is stateless and streams through).
* sessionization uses ``applyInPandasWithState`` (GroupState timeouts),
  the custom-stateful-operator escape hatch.

All operators return unstarted streaming DataFrames/queries so callers
pick sink + trigger; tests drive them with ``trigger(availableNow)`` +
memory sink.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_DDL = (
    "event_id bigint, user_id bigint, event_type string, value double, "
    "ts timestamp"
)


def read_event_stream(spark: SparkSession, path: str,
                      schema: str = EVENTS_DDL) -> DataFrame:
    """File-source event stream: every parquet file dropped into
    ``path`` becomes a micro-batch (exactly-once per file, tracked in
    the checkpoint — the streaming upgrade of
    ``sources/tables.incremental_files``)."""
    return spark.readStream.schema(schema).parquet(path)


def windowed_counts(events: DataFrame, window: str = "10 minutes",
                    slide: str | None = None, watermark: str = "30 minutes",
                    ts_col: str = "ts") -> DataFrame:
    """Watermarked tumbling/sliding window aggregate per event type —
    the canonical late-data-bounded streaming agg. State for a window is
    dropped once the watermark passes its end."""
    w = F.window(F.col(ts_col), window, slide) if slide else F.window(
        F.col(ts_col), window
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(w.alias("win"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type", "n", "sum_value",
        )
    )


def stream_pip_tag(events: DataFrame, zones: DataFrame, z: int = 6,
                   lon: str = "lon", lat: str = "lat",
                   point_id: str = "event_id") -> DataFrame:
    """Streaming point-in-polygon tagging: stream-static join of the
    event stream against the bounded zone dimension, reusing the batch
    engine's broadcast cell join + Arrow refine verbatim (the operators
    are stateless, so Structured Streaming plans them per micro-batch)."""
    from pythongis_spark.operators.spatial_join import point_in_polygon_join

    return point_in_polygon_join(
        events, zones, point_id=point_id, lon=lon, lat=lat, z=z, build_rows=0
    )


_SESSION_STATE = T.StructType([
    T.StructField("session_id", T.LongType()),
    T.StructField("start_ts", T.DoubleType()),
    T.StructField("last_ts", T.DoubleType()),
    T.StructField("n_events", T.LongType()),
])

_SESSION_OUT = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("start_ts", T.TimestampType()),
    T.StructField("end_ts", T.TimestampType()),
])


def sessionize_stream(events: DataFrame, gap_seconds: int = 3600,
                      watermark: str = "1 hour", ts_col: str = "ts",
                      user_col: str = "user_id") -> DataFrame:
    """Stateful streaming sessionization via applyInPandasWithState:
    per user, a session closes when no event arrives within
    ``gap_seconds`` — the streaming analog of ``relational.sessionize``
    (batch lag+sum form). Emits one row per CLOSED session; state is
    bounded per active user. ``session_id`` is the epoch second of the
    session's first event — unique per (user, session) even across
    timeout closures, where a plain counter would restart at 0 after
    ``state.remove()``.

    Timeouts are EVENT-TIME (fire when the watermark passes
    last_event + gap): deterministic under replay, and a one-shot
    ``availableNow`` drain terminates cleanly — a processing-time timer
    would make the engine spin micro-batches waiting for wall-clock
    expiry (measured: 1400+ empty batches)."""

    def fn(key, pdfs, state: GroupState):
        (uid,) = key
        if state.hasTimedOut:
            sid, first_ts, last_ts, n = state.get
            state.remove()
            yield pd.DataFrame([
                {"user_id": uid, "session_id": sid, "n_events": n,
                 "start_ts": pd.Timestamp(first_ts, unit="s"),
                 "end_ts": pd.Timestamp(last_ts, unit="s")}
            ])
            return
        rows = []
        if state.exists:
            sid, first_ts, last_ts, n = state.get
        else:
            # derive the starting session id from event time so ids stay
            # unique after a timeout closure removed the state (a plain
            # 0 reset re-issues (user, 0) for every timeout-closed
            # session); deterministic under replay.
            sid, first_ts, last_ts, n = None, None, None, 0
        # ONE global sort across all pandas chunks: a group split over
        # several Arrow chunks (or chunks arriving newest-first) would
        # otherwise be processed out of time order, silently merging
        # sessions and rewinding last_ts
        for ts in sorted(t for pdf in pdfs for t in pdf[ts_col]):
            t = ts.timestamp()
            if sid is None:
                sid = int(t)
            if last_ts is not None and t - last_ts > gap_seconds:
                rows.append(
                    {"user_id": uid, "session_id": sid, "n_events": n,
                     "start_ts": pd.Timestamp(first_ts, unit="s"),
                     "end_ts": pd.Timestamp(last_ts, unit="s")}
                )
                sid = max(int(t), sid + 1)  # new session: its own epoch
                n = 0
                first_ts = t
            if first_ts is None:
                first_ts = t
            last_ts = t
            n += 1
        if sid is None:  # no events in this batch for the key
            return
        state.update((sid, float(first_ts), float(last_ts), int(n)))
        # event-time timer: must be strictly beyond the current watermark
        to_ms = max(
            state.getCurrentWatermarkMs() + 1,
            int((last_ts + gap_seconds) * 1000),
        )
        state.setTimeoutTimestamp(to_ms)
        if rows:
            yield pd.DataFrame(rows)

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn, _SESSION_OUT, _SESSION_STATE, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_available_now(stream_df: DataFrame, name: str,
                      checkpoint: str, output_mode: str = "append"):
    """Drive a streaming DataFrame over all currently-available input
    (trigger=availableNow) into a memory sink; returns the query after
    completion. Test/inspection helper — production sinks swap in
    ``writeStream.format("parquet"/"iceberg")`` with the same
    checkpoint contract."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
