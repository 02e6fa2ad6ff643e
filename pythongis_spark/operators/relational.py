"""Relational operators with the reference's semantics.

Covers SURVEY.md §2.2 (row ops), §2.3 attribute join, §2.4 aggregation,
§2.5 windows, §2.6 set ops. Everything is built-in Catalyst expressions —
partial/final hash aggregation, pushdown and codegen come for free (the
reference is single-threaded sort-based grouping, ``pythongis/vector/
sql.py:158-180``).

Reference quirks reproduced or consciously diverged (documented):

* fieldmapping stats ``count sum max min first last mean majority
  minority <delim>concat`` (``pythongis/vector/sql.py:69-91``);
* missing values excluded from aggregates (``sql.py:109-118``) — matches
  Spark's null-skipping aggregates;
* empty group → ``""`` in the reference (``sql.py:124-127``); we return
  NULL (typed columns; divergence documented);
* ``first/last/concat`` depend on insertion order — Spark has no row
  order, so these take an explicit ``order_col`` (the ``seq`` column of
  SURVEY.md §1.1) and use ``min_by/max_by``/sorted ``collect_list``;
* ``majority/minority`` ties: reference inherits dict order
  (``sql.py:81-82``); we break ties deterministically by value ASC.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

NUMERIC_STATS = {"sum", "mean", "avg", "average", "max", "min"}


# ------------------------------------------------------------------
# fieldmapping aggregation (reference `aggreg`, vector/sql.py:20-137)
# ------------------------------------------------------------------

def _simple_stat_expr(stat: str, col: str, order_col: str | None) -> Column | None:
    c = F.col(col)
    if stat == "count":
        return F.count(c)
    if stat == "sum":
        return F.sum(c)
    if stat in ("mean", "avg", "average"):
        return F.avg(c)
    if stat == "max":
        return F.max(c)
    if stat == "min":
        return F.min(c)
    if stat == "first":
        if order_col is None:
            return F.first(c, ignorenulls=True)
        return F.min_by(c, F.when(c.isNotNull(), F.col(order_col)))
    if stat == "last":
        if order_col is None:
            return F.last(c, ignorenulls=True)
        return F.max_by(c, F.when(c.isNotNull(), F.col(order_col)))
    if stat.endswith("concat"):
        delim = stat[: -len("concat")]
        if order_col is None:
            return F.concat_ws(delim, F.collect_list(c.cast("string")))
        # deterministic insertion-order concat: sort (order, value) structs
        arr = F.sort_array(
            F.collect_list(
                F.when(c.isNotNull(), F.struct(F.col(order_col).alias("o"), c.cast("string").alias("v")))
            )
        )
        return F.concat_ws(delim, F.transform(arr, lambda s: s["v"]))
    return None


def aggregate(
    df: DataFrame,
    by: list[str],
    fieldmapping: list[tuple[str, str, str]],
    order_col: str | None = None,
) -> DataFrame:
    """GroupBy + reference-style fieldmapping aggregation.

    ``fieldmapping``: list of (out_name, value_column, stat). Mirrors
    ``pythongis/vector/data.py:952`` / ``vector/sql.py:20`` with the
    divergences listed in the module docstring. majority/minority are
    computed in a separate count+row_number pass and joined back (two
    shuffles on the same key; co-partitioned, no extra exchange in AQE).
    """
    simple = []
    modeish = []
    for out, col, stat in fieldmapping:
        e = _simple_stat_expr(stat, col, order_col)
        if e is not None:
            simple.append(e.alias(out))
        elif stat in ("majority", "minority"):
            modeish.append((out, col, stat))
        else:
            raise ValueError(f"unknown stat {stat!r}")
    base = df.groupBy(*by).agg(*simple) if simple else df.select(*by).distinct()
    for out, col, stat in modeish:
        counts = (
            df.filter(F.col(col).isNotNull())
            .groupBy(*by, col)
            .agg(F.count("*").alias("_n"))
        )
        order = (
            [F.col("_n").desc(), F.col(col).asc()]
            if stat == "majority"
            else [F.col("_n").asc(), F.col(col).asc()]
        )
        w = Window.partitionBy(*by).orderBy(*order)
        top = (
            counts.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select(*by, F.col(col).alias(out))
        )
        base = base.join(top, list(by), "left")
    return base


def dissolve(
    df: DataFrame,
    by: list[str],
    fieldmapping: list[tuple[str, str, str]],
    geom_col: str = "geom",
    geom_op: str = "union",
    order_col: str | None = None,
    meld: bool = True,
) -> DataFrame:
    """Reference ``VectorData.aggregate`` (dissolve) — groupBy keys +
    fieldmapping + per-group geometry union (``pythongis/vector/data.py:952``,
    geometry aggregation ``vector/sql.py:24-67``).

    ``meld=True`` (default): polygon groups dissolve with exact boundary
    melding where inputs only touch (``geometry.dissolve``); overlapping
    interiors fall back to keep-parts (GEOS-grade union out of scope).
    ``meld=False`` or point groups: parts collected into a Multi
    container, the engine's original behaviour.
    """
    import pandas as pd

    from pythongis_spark.geometry import wkb as W

    attrs = aggregate(df, by, fieldmapping, order_col)

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        blobs = [b for b in pdf[geom_col] if b is not None]
        parts = []
        kinds = set()
        decoded = []
        for b in blobs:
            t, payload = W.decode_wkb(bytes(b))
            decoded.append((t, payload))
            kinds.add(t.replace("Multi", ""))
            if t == "Polygon":
                parts.append((payload[0], payload[1:]))
            elif t == "MultiPolygon":
                parts.extend((rings[0], rings[1:]) for rings in payload)
            elif t == "Point":
                parts.append(payload)
            elif t == "MultiPoint":
                parts.extend(payload)
            elif t == "LineString":
                parts.append(payload)
            elif t == "MultiLineString":
                parts.extend(payload)
        if not parts:
            merged = None
        elif kinds == {"Polygon"} and meld:
            from pythongis_spark.geometry.dissolve import dissolve_touching, union_parts

            try:
                res = dissolve_touching(decoded)
            except NotImplementedError:
                from pythongis_spark.geometry import boolean as BO

                res = BO.union_all(decoded)
            merged = None if res is None else W.encode_wkb(res)
        elif kinds == {"Polygon"}:
            merged = W.wkb_multipolygon(parts)
        elif kinds == {"Point"}:
            import numpy as np

            coords = np.vstack(parts)
            merged = W.wkb_multipoint(coords)
        elif kinds == {"LineString"}:
            # parts collected into a MultiLineString (the reference's
            # shapely union would additionally node crossing lines —
            # documented divergence; previously line groups silently
            # dissolved to NULL geometry)
            merged = W.wkb_multilinestring(parts)
        else:
            import warnings

            warnings.warn(
                f"dissolve: mixed geometry kinds {sorted(kinds)} in one "
                f"group have no union here — emitting NULL geometry")
            merged = None
        out = pdf.iloc[:1][list(by)].copy()
        out[geom_col] = [merged]
        return out

    geom_schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in by]
        + [f"`{geom_col}` binary"]
    )
    geoms = df.select(*by, geom_col).groupBy(*by).applyInPandas(
        merge_group, schema=geom_schema
    )
    return attrs.join(geoms, list(by), "left")


# ------------------------------------------------------------------
# attribute join (reference hash join, vector/data.py:1017-1114)
# ------------------------------------------------------------------

def attribute_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    fieldmapping: list[tuple[str, str, str]] | None = None,
    collapse: bool = False,
    keepall: bool = True,
    order_col: str | None = None,
) -> DataFrame:
    """Equi-join matching the reference's semantics: ``keepall=True`` →
    left outer, else inner (``pythongis/vector/data.py:1093-1106``);
    duplicate right columns dropped (``:1040-1043``); ``collapse=True``
    aggregates the right side per key first (``:1056-1087``).

    Catalyst picks broadcast vs sort-merge/shuffled-hash; we don't
    second-guess equi-join strategy (AQE handles skew)."""
    keys = [key] if isinstance(key, str) else list(key)
    if collapse:
        right = aggregate(right, keys, fieldmapping or [], order_col)
    dup = [c for c in right.columns if c in left.columns and c not in keys]
    right = right.drop(*dup)
    how = "left" if keepall else "inner"
    return left.join(right, keys, how)


# ------------------------------------------------------------------
# windows / sequences
# ------------------------------------------------------------------

def moving_window(
    df: DataFrame,
    n: int,
    fieldmapping: list[tuple[str, str, str]],
    order_col: str,
    group_col: str | list[str] | None = None,
) -> DataFrame:
    """Trailing row-window of size n over explicit order, per optional
    group — direct frame-spec translation of
    ``pythongis/vector/data.py:653-695``."""
    groups = (
        []
        if group_col is None
        else ([group_col] if isinstance(group_col, str) else list(group_col))
    )
    if not groups:
        return _moving_window_global(df, n, fieldmapping, order_col)
    w = Window.partitionBy(*groups).orderBy(order_col).rowsBetween(-(n - 1), 0)
    out = df
    for outname, col, stat in fieldmapping:
        e = _simple_stat_expr(stat, col, None)
        if e is None:
            raise ValueError(f"stat {stat!r} not supported over a moving window")
        out = out.withColumn(outname, e.over(w))
    return out


def _moving_window_global(
    df: DataFrame, n: int, fieldmapping: list[tuple[str, str, str]], order_col: str
) -> DataFrame:
    """Ungrouped trailing window WITHOUT a single-task global sort:

    1. exact global row number via range repartition
       (``classify._with_global_row_number`` — every stage parallel);
    2. rows bucketed into blocks of B ≥ n; the last n−1 rows of each
       block are duplicated into the next block as carry-in context;
    3. the trailing frame runs per block (parallel window), carried
       copies evaluate garbage frames and are dropped.

    Exact for any stat because a width-n trailing frame spans at most
    two consecutive blocks when B ≥ n. Ties in ``order_col`` are broken
    by the range repartition deterministically for a given partitioning
    (callers wanting full determinism pass a unique order column, as the
    reference's field-ordered windows also require)."""
    import math

    from pythongis_spark.operators.classify import _with_global_row_number

    ranked, total = _with_global_row_number(df, [order_col], out="_rn")
    if total == 0:
        # schema must match the non-empty path (stat-typed columns, not
        # NullType) or a later union/write against a non-empty result
        # fails; a single-partition window on zero rows is free
        w0 = Window.orderBy(order_col).rowsBetween(-(n - 1), 0)
        out = df
        for outname, col, stat in fieldmapping:
            e = _simple_stat_expr(stat, col, None)
            if e is None:
                raise ValueError(f"stat {stat!r} not supported over a moving window")
            out = out.withColumn(outname, e.over(w0))
        return out
    sess = df.sparkSession
    nparts = int(sess.conf.get("spark.sql.shuffle.partitions", "32"))
    B = max(n, int(math.ceil(total / max(1, nparts))))
    blk = F.floor((F.col("_rn") - 1) / B)
    tgt = ranked.withColumn("_blk", blk).withColumn("_is_t", F.lit(True))
    carry = (
        ranked.filter(F.pmod(F.col("_rn") - 1, F.lit(B)) >= B - (n - 1))
        .withColumn("_blk", blk + 1)
        .withColumn("_is_t", F.lit(False))
    )
    allrows = tgt.unionByName(carry)
    w = Window.partitionBy("_blk").orderBy("_rn").rowsBetween(-(n - 1), 0)
    out = allrows
    for outname, col, stat in fieldmapping:
        e = _simple_stat_expr(stat, col, None)
        if e is None:
            raise ValueError(f"stat {stat!r} not supported over a moving window")
        out = out.withColumn(outname, e.over(w))
    return out.filter(F.col("_is_t")).drop("_rn", "_blk", "_is_t")


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int = 3600,
    order_tiebreak: str | None = None,
    out: str = "session_id",
) -> DataFrame:
    """Sessionization: per user, a new session starts when the gap to the
    previous event exceeds ``gap_seconds`` (lag + running sum — the batch
    form; streaming would use ``session_window``). Beyond the reference's
    scope; standard training-data/event-pipeline operator."""
    order = [F.col(ts_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    new_session = F.when(
        prev.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev) > gap_seconds),
        1,
    ).otherwise(0)
    return df.withColumn(
        out,
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def compute_grouped(df: DataFrame, out: str, col: str, stat: str, by: str | list[str]) -> DataFrame:
    """``compute(field, value, by=, stat=)`` — group aggregate broadcast to
    every member row (``pythongis/vector/data.py:627-636``) as an
    unbounded window aggregate (no join needed)."""
    groups = [by] if isinstance(by, str) else list(by)
    w = Window.partitionBy(*groups)
    e = _simple_stat_expr(stat, col, None)
    if e is None:
        raise ValueError(f"stat {stat!r} not supported for compute(by=)")
    return df.withColumn(out, e.over(w))


# ------------------------------------------------------------------
# classification (classypie, SURVEY.md §1.3)
# ------------------------------------------------------------------

def classify(
    df: DataFrame,
    col: str,
    algo: str = "quantile",
    k: int = 5,
    out: str = "class",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Classify values into k buckets — ``classypie`` break algorithms
    (``pythongis/classypie/breaks.py:17-375``).

    quantile → exact distributed ntile (range repartition + partition
    offsets — no single-task global window); equal → equal-width
    intervals from global min/max; unique → broadcast value→rank map;
    natural/jenks, pretty, stdev, headtail, log, histogram → break list
    (see :mod:`.classify`) + find_class when-ladder. Buckets 1-based.
    """
    from pythongis_spark.operators import classify as C

    if algo == "quantile":
        return C.ntile_distributed(df, col, k, out=out, tiebreak=order_tiebreak)
    if algo in ("equal", "equal_interval"):
        mm = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
        lo, hi = mm["lo"], mm["hi"]
        width = (hi - lo) / k if hi > lo else 1.0
        bucket = F.least(
            F.lit(k), (F.floor((F.col(col) - F.lit(lo)) / F.lit(width)) + 1).cast("int")
        )
        return df.withColumn(out, bucket)
    if algo == "unique":
        return C.unique_rank(df, col, out=out)
    if algo in C._ALGOS:
        return C.classify_breaks(df, col, algo, k, out=out)
    raise ValueError(f"unknown classification {algo!r}")


def rescale(df: DataFrame, col: str, to_min: float, to_max: float, out: str | None = None) -> DataFrame:
    """classypie ``rescale`` (``pythongis/classypie/main.py:554``)."""
    mm = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
    lo, hi = mm["lo"], mm["hi"]
    span = hi - lo if hi > lo else 1.0
    return df.withColumn(
        out or col,
        (F.col(col) - F.lit(lo)) / F.lit(span) * (to_max - to_min) + to_min,
    )


# ------------------------------------------------------------------
# set / table ops
# ------------------------------------------------------------------

def merge_tables(*dfs: DataFrame) -> DataFrame:
    """Union N tables aligned by field name, missing → null (reference
    fills ``""``, ``pythongis/vector/manager.py:536-566``; typed columns →
    null)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def duplicates(
    df: DataFrame,
    geom_col: str = "geom",
    subkey: list[str] | None = None,
    fieldmapping: list[tuple[str, str, str]] | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Dedup by geometry bytes (+ optional subkey), aggregating attributes
    (``pythongis/vector/data.py:990-1015``). WKB equality == coordinate
    equality for identically-constructed geometries."""
    keys = [geom_col] + (subkey or [])
    return aggregate(df, keys, fieldmapping or [], order_col)


def split_by(df: DataFrame, key: str, max_groups: int = 1000) -> dict:
    """Split a table into one DataFrame per distinct key value —
    reference ``split`` (``pythongis/vector/manager.py:501-534``).

    Returns {value: DataFrame}. Driver-side distinct is bounded by
    ``max_groups``; at scale prefer ``df.write.partitionBy(key)`` which
    is the same split materialized by the writer without a collect."""
    values = [r[0] for r in df.select(key).distinct().limit(max_groups + 1).collect()]
    if len(values) > max_groups:
        raise ValueError(
            f"more than {max_groups} groups; use df.write.partitionBy({key!r})"
        )
    return {v: df.filter(F.col(key) == v) for v in values}


def field_values(df: DataFrame, col: str) -> DataFrame:
    """Sorted distinct (``pythongis/vector/data.py:826``)."""
    return df.select(col).distinct().orderBy(col)


def tab(df: DataFrame, col: str) -> DataFrame:
    """Frequency table with percent (``pythongis/vector/data.py:853``)."""
    total = df.count()
    return (
        df.groupBy(col)
        .agg(F.count("*").alias("n"))
        .withColumn("pct", F.col("n") / F.lit(total) * 100.0)
    )


def histogram(df: DataFrame, col: str, bins: int = 10) -> DataFrame:
    """Equal-width binning + counts (``pythongis/vector/data.py:897-918``),
    exact via floor arithmetic (two passes: min/max then bin counts)."""
    mm = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
    lo, hi = float(mm["lo"]), float(mm["hi"])
    width = (hi - lo) / bins if hi > lo else 1.0
    b = F.least(F.lit(bins - 1), F.floor((F.col(col) - F.lit(lo)) / F.lit(width))).cast(
        "int"
    )
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(b.alias("bin"))
        .agg(F.count("*").alias("n"))
        .withColumn("bin_lo", F.lit(lo) + F.col("bin") * F.lit(width))
        .withColumn("bin_hi", F.lit(lo) + (F.col("bin") + 1) * F.lit(width))
    )


def describe(df: DataFrame) -> DataFrame:
    """Per-column type + valid/missing counts, plus min/max/mean for
    numeric fields (null for text) — the reference's ``describe`` and
    ``summarystats`` combined (``pythongis/vector/data.py:731-823``).
    One job: every statistic is a column of a single agg. The mean is
    computed as an exact decimal sum divided by the count, so its value
    is independent of partition/summation order (oracle determinism)."""
    from pyspark.sql import types as T

    numeric = [
        c for c in df.columns if isinstance(df.schema[c].dataType, T.NumericType)
    ]
    aggs = []
    for c in df.columns:
        aggs.append(F.count(F.col(c)).alias(f"{c}__valid"))
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__missing"))
        if c in numeric:
            aggs.append(F.min(c).cast("double").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("double").alias(f"{c}__max"))
            aggs.append(
                (
                    F.sum(F.col(c).cast("decimal(30,8)")).cast("double")
                    / F.count(F.col(c))
                ).alias(f"{c}__mean")
            )
    stats = df.agg(*aggs).first().asDict()
    rows = []
    for c in df.columns:
        rows.append((
            c, df.schema[c].dataType.simpleString(),
            stats[f"{c}__valid"], stats[f"{c}__missing"],
            stats.get(f"{c}__min"), stats.get(f"{c}__max"),
            stats.get(f"{c}__mean"),
        ))
    return df.sparkSession.createDataFrame(
        rows,
        "field string, type string, valid long, missing long, "
        "min double, max double, mean double",
    )
