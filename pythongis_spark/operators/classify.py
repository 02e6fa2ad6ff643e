"""Classification (classypie) — break algorithms and scalable bucket
assignment.

Reference: ``pythongis/classypie/breaks.py:17-375`` (equal, log,
quantile, pretty, stdev, natural/jenks, headtail, histogram) and
``pythongis/classypie/main.py:194-223`` (find_class interval
semantics: first interval with prev <= v <= next, 1-based; outside the
break range -> miss/null).

Scale design: break LISTS are tiny (k+1 numbers), so every algorithm
reduces to either (a) a handful of distributed aggregates (equal, log,
stdev, pretty, headtail), (b) an exact distributed rank-select
(quantile), or (c) a bounded deterministic sample + driver-side DP
(natural/jenks, like the reference's own maxsize subsampling). Bucket
assignment is a codegen when-ladder — never a global window.

The previous quantile implementation used ``ntile`` over an
unpartitioned window, which Spark collapses to a single task; the
distributed rank here (range repartition + per-partition row_number +
partition offsets) is plan-equivalent at any scale and bit-identical
in output.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# ------------------------------------------------------------------
# distributed global rank (the scalable ntile/dense_rank substrate)
# ------------------------------------------------------------------

def _with_global_row_number(
    df: DataFrame, order_cols: list[str], out: str = "_rn"
) -> tuple[DataFrame, int]:
    """(df + 1-based global row number ordered by order_cols, total rows).

    repartitionByRange gives ordered, non-overlapping key ranges per
    partition; a per-partition row_number plus the cumulative count of
    earlier partitions is then the exact global rank. Two passes over
    the data (counts job + main job) but every stage is fully parallel —
    unlike ``row_number().over(Window.orderBy(...))`` which is one task.
    """
    sess = df.sparkSession
    nparts = int(sess.conf.get("spark.sql.shuffle.partitions", "32"))
    rp = df.repartitionByRange(nparts, *[F.col(c) for c in order_cols]).withColumn(
        "_pid", F.spark_partition_id()
    )
    # freeze the physical partitioning: the counts job and the main job
    # must see IDENTICAL partitions — without this, AQE may coalesce the
    # range shuffle differently per job and spark_partition_id() no
    # longer matches the offsets map (silently wrong global ranks)
    rp = rp.localCheckpoint(eager=True)
    counts = {r["_pid"]: r["n"] for r in rp.groupBy("_pid").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr = F.lit(0)
    if offsets:
        pairs = []
        for pid, off in offsets.items():
            pairs.extend([F.lit(pid), F.lit(off)])
        off_expr = F.coalesce(F.create_map(*pairs)[F.col("_pid")], F.lit(0))
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    return (
        rp.withColumn(out, (F.row_number().over(w) + off_expr).cast("long")).drop("_pid"),
        total,
    )


def ntile_distributed(
    df: DataFrame, col: str, k: int, out: str = "class", tiebreak: str | None = None
) -> DataFrame:
    """Exact ntile(k) over (order by col[, tiebreak]) without a global
    window: first (n mod k) buckets get ceil(n/k) rows, the rest
    floor(n/k) — the ANSI ntile rule, applied to the distributed rank."""
    order_cols = [col] + ([tiebreak] if tiebreak else [])
    ranked, n = _with_global_row_number(df, order_cols)
    if n == 0:
        return ranked.withColumn(out, F.lit(None).cast("int")).drop("_rn")
    q, r = divmod(n, k)
    big = q + 1
    head = r * big
    if q == 0:
        bucket = F.col("_rn")
    else:
        bucket = F.when(
            F.col("_rn") <= F.lit(head), F.floor((F.col("_rn") - 1) / F.lit(big)) + 1
        ).otherwise(F.lit(r) + F.floor((F.col("_rn") - 1 - F.lit(head)) / F.lit(q)) + 1)
    return ranked.withColumn(out, bucket.cast("int")).drop("_rn")


def unique_rank(df: DataFrame, col: str, out: str = "class", max_unique: int = 100_000) -> DataFrame:
    """dense_rank of distinct values via a broadcast value->rank map
    (replaces the single-task global dense_rank window). Bounded by
    ``max_unique`` distinct values — 'unique' classification only makes
    sense for modest cardinality."""
    sess = df.sparkSession
    vals = [r[0] for r in df.select(col).distinct().orderBy(col).limit(max_unique + 1).collect()]
    if len(vals) > max_unique:
        raise ValueError(f"more than {max_unique} distinct values for unique classification")
    mapping = sess.createDataFrame(
        [(v, i + 1) for i, v in enumerate(vals)], [col, out]
    )
    return df.join(F.broadcast(mapping), col, "left")


# ------------------------------------------------------------------
# break algorithms (each returns a python list of k+1-ish breakpoints)
# ------------------------------------------------------------------

def _minmax(df: DataFrame, col: str) -> tuple[float, float]:
    row = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
    return float(row["lo"]), float(row["hi"])


def equal_breaks(df: DataFrame, col: str, k: int = 5) -> list[float]:
    """Equal interval (``breaks.py:23``): k+1 evenly spaced points."""
    lo, hi = _minmax(df, col)
    unit = (hi - lo) / k
    return [lo + i * unit for i in range(k)] + [hi]


def log_breaks(df: DataFrame, col: str, k: int = 5) -> list[float]:
    """Equal intervals of log10(v+1), transformed back
    (``breaks.py:97``). Negative values raise, like the reference."""
    lo, hi = _minmax(df, col)
    if lo < 0:
        raise ValueError("log breaks require non-negative values")
    llo, lhi = math.log10(lo + 1), math.log10(hi + 1)
    interval = (lhi - llo) / k
    out, cur = [], llo
    # reference walks cur upward while cur <= maxval, so float drift can
    # produce k or k+1 interior steps; mirror that exactly
    while cur <= lhi:
        out.append(10 ** cur - 1)
        cur += interval
    return out


def quantile_breaks(df: DataFrame, col: str, k: int = 5) -> list[float]:
    """CDF-spaced breaks with the reference's interpolation
    (``breaks.py:106``): for q = i/k, a = q*n, Xq = (1-r)*x[floor(a)] +
    r*x[floor(a)+1]. The two neighbouring order statistics are fetched
    by exact distributed rank-select — no global sort collect."""
    ranked, n = _with_global_row_number(df.select(F.col(col).alias("_v")), ["_v"])
    if n <= k:
        vals = [r["_v"] for r in ranked.orderBy("_rn").collect()]
        return [float(v) for v in vals] + [float(vals[-1])]
    want: set[int] = set()
    specs = []
    for i in range(k):
        a = i / k * n
        aa = int(a)
        specs.append((a, aa))
        want.add(aa + 1)       # 1-based rank of x[aa]
        want.add(aa + 2)       # and x[aa+1]
    want.add(n)
    got = {
        r["_rn"]: float(r["_v"])
        for r in ranked.filter(F.col("_rn").isin([int(x) for x in want])).collect()
    }
    breaks = []
    for a, aa in specs:
        r = a - aa
        breaks.append((1 - r) * got[aa + 1] + r * got[aa + 2])
    breaks.append(got[n])
    return breaks


def pretty_breaks(df: DataFrame, col: str, k: int = 5) -> list[float]:
    lo, hi = _minmax(df, col)
    return rpretty(lo, hi, k)


def rpretty(dmin: float, dmax: float, k: int = 5) -> list[float]:
    """R's ``pretty`` (grDevices / 'labeling' package; reference mirror
    at ``breaks.py:132-241``): ~k+1 equally spaced round values (1, 2
    or 5 times a power of 10) covering [dmin, dmax], endpoints clipped
    back to the data range. Driver-side — inputs are two aggregates."""
    n = k
    min_n = int(n / 3)
    shrink_sml = 0.75
    h = 1.5            # high.u.bias
    h5 = 0.5 + 1.5 * h  # u5.bias
    ndiv = n

    dx = dmax - dmin
    if dx == 0 and dmax == 0:
        cell, i_small = 1.0, True
    else:
        cell = max(abs(dmin), abs(dmax))
        u = 1 + (1.0 / (1 + h)) if h5 >= 1.5 * h + 0.5 else 1 + (1.5 / (1 + h5))
        i_small = dx < cell * u * max(1.0, ndiv) * 1e-07 * 3.0

    if i_small:
        if cell > 10:
            cell = (9 + cell / 10) * shrink_sml
        if min_n > 1:
            cell = cell / min_n
    else:
        cell = dx
        if ndiv > 1:
            cell = cell / ndiv
    if cell < 20 * 1e-07:
        cell = 20 * 1e-07

    base = 10.0 ** math.floor(math.log10(cell))
    unit = base
    if (2 * base) - cell < h * (cell - unit):
        unit = 2.0 * base
        if (5 * base) - cell < h5 * (cell - unit):
            unit = 5.0 * base
            if (10 * base) - cell < h * (cell - unit):
                unit = 10.0 * base

    ns = math.floor(dmin / unit + 1e-07)
    nu = math.ceil(dmax / unit - 1e-07)
    while ns * unit > dmin + (1e-07 * unit):
        ns -= 1
    while nu * unit < dmax - (1e-07 * unit):
        nu += 1
    kk = math.floor(0.5 + nu - ns)
    if kk < min_n:
        kk = min_n - kk
        if ns >= 0:
            nu = nu + kk / 2
            ns = ns - kk / 2 + kk % 2
        else:
            ns = ns - kk / 2
            nu = nu + kk / 2 + kk % 2
    graphmin = ns * unit
    graphmax = nu * unit
    count = int(math.ceil(graphmax - graphmin) / unit)
    res = [graphmin + i * unit for i in range(count + 1)]
    if res and res[0] < dmin:
        res[0] = dmin
    if res and res[-1] > dmax:
        res[-1] = dmax
    return res


def stdev_breaks(df: DataFrame, col: str, k: int = 5) -> list[float]:
    """classInt-style stdev breaks (``breaks.py:243``): pretty() of the
    centred/scaled range, mapped back — mean/stddev_pop/min/max are one
    distributed aggregate."""
    row = df.agg(
        F.mean(col).alias("m"),
        F.stddev_pop(col).alias("s"),
        F.min(col).alias("lo"),
        F.max(col).alias("hi"),
    ).first()
    m, s = float(row["m"]), float(row["s"])
    lo, hi = float(row["lo"]), float(row["hi"])
    res = rpretty((lo - m) / s, (hi - m) / s, 5)
    return [v * s + m for v in res]


def headtail_breaks(df: DataFrame, col: str, k: int = 5) -> list[float]:
    """Head/tail breaks (Jiang 2013; ``breaks.py:375``): split at the
    mean while the tail outnumbers the head. Each split is ONE
    aggregate on a shrinking filter (heavy-tailed data converges in
    O(log n) rounds); no collect of values."""
    lo, hi = _minmax(df, col)
    cur = df.select(F.col(col).alias("_v"))
    breaks: list[float] = []
    while True:
        row = cur.agg(
            F.mean("_v").alias("m"), F.count("*").alias("n")
        ).first()
        if row["n"] == 0:
            break
        m = float(row["m"])
        head_n = cur.filter(F.col("_v") >= m).count()
        tail_n = int(row["n"]) - head_n
        if tail_n <= head_n:
            break
        breaks.append(m)
        if head_n <= 1:
            break
        cur = cur.filter(F.col("_v") >= m)
    return [lo] + breaks + [hi]


def natural_breaks(
    df: DataFrame, col: str, k: int = 5, maxsize: int = 1000
) -> list[float]:
    """Jenks natural breaks (``breaks.py:268``). Exact Fisher-Jenks DP
    when n <= maxsize; above that, a deterministic smallest-hash sample
    of maxsize values (endpoints pinned to the true min/max) — same
    bounded-subsample strategy as the reference, but reproducible
    across runs (the reference uses random.sample)."""
    n = df.count()
    if n <= maxsize:
        vals = np.array(
            sorted(r[0] for r in df.select(col).collect()), dtype=np.float64
        )
    else:
        lo, hi = _minmax(df, col)
        sampled = (
            df.select(F.col(col).alias("_v"))
            .withColumn("_h", F.xxhash64("_v"))
            .orderBy("_h")
            .limit(maxsize)
            .collect()
        )
        vals = np.sort(np.array([r["_v"] for r in sampled], dtype=np.float64))
        vals[0], vals[-1] = lo, hi
    if len(vals) <= k:
        return [float(v) for v in vals] + [float(vals[-1])]
    return jenks_breaks_np(vals, k)


def jenks_breaks_np(values: np.ndarray, k: int) -> list[float]:
    """Fisher-Jenks DP (O(n²k), numpy-vectorized inner loop) on sorted
    values; tie-break matches the reference's sequential >= update
    (last minimizing split wins)."""
    n = len(values)
    lower = np.zeros((n + 1, k + 1), dtype=np.int64)
    best = np.full((n + 1, k + 1), np.inf)
    lower[1, 1:] = 1
    best[1, 1:] = 0.0
    for l in range(2, n + 1):
        seg = values[l - 1 :: -1]  # x[l-1], x[l-2], ..., x[0]
        s1 = np.cumsum(seg)
        s2 = np.cumsum(seg * seg)
        w = np.arange(1, l + 1, dtype=np.float64)
        var = s2 - s1 * s1 / w  # variance*n of x[i3-1 .. l-1], i3 = l-m+1
        i4 = l - np.arange(1, l + 1)  # i3 - 1 per m
        valid = i4 >= 1
        vv = var[valid]
        i4v = i4[valid]
        for j in range(2, k + 1):
            cand = vv + best[i4v, j - 1]
            mn = cand.min()
            # last m achieving the minimum (the reference overwrites on >=)
            idx = np.nonzero(cand == mn)[0][-1]
            best[l, j] = mn
            lower[l, j] = l - (idx + 1) + 1  # i3 for that m
        lower[l, 1] = 1
        best[l, 1] = var[-1]
    breaks = [0.0] * (k + 1)
    breaks[k] = float(values[n - 1])
    breaks[0] = float(values[0])
    pos = n
    for j in range(k, 1, -1):
        idx = int(lower[pos, j]) - 2
        breaks[j - 1] = float(values[idx])
        pos = int(lower[pos, j]) - 1
    return breaks


_ALGOS = {
    "equal": equal_breaks,
    "equal_interval": equal_breaks,
    "histogram": equal_breaks,
    "log": log_breaks,
    "quantile": quantile_breaks,
    "pretty": pretty_breaks,
    "stdev": stdev_breaks,
    "headtail": headtail_breaks,
    "natural": natural_breaks,
    "jenks": natural_breaks,
}


def class_breaks(df: DataFrame, col: str, algo: str, k: int = 5, **kw) -> list[float]:
    try:
        fn = _ALGOS[algo]
    except KeyError:
        raise ValueError(f"unknown break algorithm {algo!r}") from None
    return fn(df, col, k, **kw)


def apply_breaks(
    df: DataFrame, col: str, breaks: list[float], out: str = "class"
) -> DataFrame:
    """find_class (``classypie/main.py:194-223``): 1-based index of the
    first interval with breaks[i-1] <= v <= breaks[i]; values outside
    the full range -> null. A when-ladder over k tiny literals — pure
    whole-stage codegen, no shuffle at all."""
    v = F.col(col)
    expr: Column | None = None
    for i in range(1, len(breaks)):
        cond = (v >= F.lit(breaks[i - 1])) & (v <= F.lit(breaks[i]))
        expr = F.when(cond, F.lit(i)) if expr is None else expr.when(cond, F.lit(i))
    if expr is None:
        return df.withColumn(out, F.lit(None).cast("int"))
    return df.withColumn(out, expr.cast("int"))


def classify_breaks(
    df: DataFrame, col: str, algo: str, k: int = 5, out: str = "class", **kw
) -> DataFrame:
    return apply_breaks(df, col, class_breaks(df, col, algo, k, **kw), out)
