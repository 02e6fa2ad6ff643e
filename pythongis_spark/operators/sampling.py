"""Deterministic dataset sampling — the reproducible-subset ops a
training-data pipeline needs (LLM-pipeline surface, alongside dedup/
similarity/text).

Production pipelines never use ``rand()`` for corpus sampling: a sample
must be REPRODUCIBLE across reruns, stable under repartitioning, and
consistent between the pipeline and its audits. The standard technique
is hash-threshold (Bernoulli-by-key) sampling: keep a row iff
``hash(key, seed) < fraction * 2^bits``. Every op here is pure Catalyst
— a codegen filter with no shuffle (except the explicitly-shuffling
per-group cap), so predicates push down to the scan and the plan
scales linearly at any corpus size.

Two hash variants:

- default ``xxhash64(key, seed)`` — Spark's built-in 64-bit hash,
  arbitrary column types, no magnitude limits; the 100 TB path.
- ``mult31`` — Knuth multiplicative hashing ``(key*2654435761 + seed)
  mod 2^32`` (The Art of Computer Programming vol. 3 §6.4) on a
  numeric key. Weaker mixing, but expressible bit-identically in ANSI
  SQL, which is what the DuckDB oracle gate runs; requires
  ``0 <= key < 2^31`` so the int64 product cannot overflow (ANSI mode
  would throw, not wrap).

Reference parity: the reference has no sampling operators (its
workflows select via attribute/spatial filters only) — this module is
part of the beyond-reference LLM-pipeline surface the build brief asks
for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_KNUTH_A = 2654435761  # 2^32 * golden-ratio conjugate, TAOCP §6.4
_SALT_B = 40503        # 16-bit multiplicative constant, same family
_M32 = 1 << 32


def _hash01(key: Column, seed: int, method: str, salt: Column | None = None) -> Column:
    """Deterministic hash of ``key`` (plus an optional integer ``salt``
    column, e.g. an epoch index) scaled into [0, 1), as a Column."""
    if method == "xxhash64":
        # shift the signed 64-bit hash into unsigned order, then scale;
        # double has 53 bits of mantissa — plenty for a threshold test
        args = [key] + ([salt] if salt is not None else []) + [F.lit(seed)]
        h = F.xxhash64(*args)
        return (h.cast("double") / F.lit(float(1 << 64))) + F.lit(0.5)
    if method == "mult31":
        acc = key.cast("long") * F.lit(_KNUTH_A) + F.lit(seed)
        if salt is not None:
            acc = acc + salt.cast("long") * F.lit(_SALT_B)
        h = F.pmod(acc, F.lit(_M32))
        return h.cast("double") / F.lit(float(_M32))
    raise ValueError(f"unknown hash method {method!r}")


def hash_sample(
    df: DataFrame,
    key: str | Column,
    fraction: float,
    seed: int = 0,
    method: str = "xxhash64",
) -> DataFrame:
    """Reproducible Bernoulli-by-key sample: keeps a row iff
    ``hash(key, seed)`` falls below ``fraction``. Stable under
    repartitioning and across reruns; rows with equal keys are kept or
    dropped together (the property that makes the sample consistent
    with a dedup pass keyed the same way). Pure codegen filter — no
    shuffle, pushes down past column pruning."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    key = F.col(key) if isinstance(key, str) else key
    return df.filter(_hash01(key, seed, method) < F.lit(float(fraction)))


def train_test_split(
    df: DataFrame,
    key: str | Column,
    test_fraction: float,
    seed: int = 0,
    method: str = "xxhash64",
    out: str = "split",
) -> DataFrame:
    """Adds a ``split`` column ('test' below the hash threshold, else
    'train') — the same hash-threshold trick as `hash_sample`, kept as
    a label so one scan feeds both sides. Membership is a pure function
    of (key, seed): re-running the pipeline, or computing the split in
    a different engine, assigns every row identically."""
    if not 0.0 <= test_fraction <= 1.0:
        raise ValueError("test_fraction must be in [0, 1]")
    key = F.col(key) if isinstance(key, str) else key
    return df.withColumn(
        out,
        F.when(
            _hash01(key, seed, method) < F.lit(float(test_fraction)), F.lit("test")
        ).otherwise(F.lit("train")),
    )


def stratified_sample(
    df: DataFrame,
    strata: str | Column,
    fractions: dict,
    key: str | Column,
    seed: int = 0,
    method: str = "xxhash64",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum hash-threshold sampling (e.g. downsample English to
    10% while keeping 100% of low-resource languages — the classic
    corpus-rebalancing move). ``fractions`` maps stratum value →
    fraction; strata not listed get ``default_fraction``. Still a pure
    codegen filter: the per-stratum threshold folds into one CASE
    expression, no shuffle, no per-stratum pass."""
    strata = F.col(strata) if isinstance(strata, str) else strata
    key = F.col(key) if isinstance(key, str) else key
    thr = F.lit(float(default_fraction))
    for value, frac in sorted(fractions.items()):
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {value!r} must be in [0, 1]")
        thr = F.when(strata == F.lit(value), F.lit(float(frac))).otherwise(thr)
    return df.filter(_hash01(key, seed, method) < thr)


def mixture_sample(
    df: DataFrame,
    strata: str | Column,
    weights: dict,
    key: str | Column,
    seed: int = 0,
    method: str = "xxhash64",
    default_weight: float = 1.0,
    out_epoch: str = "epoch",
) -> DataFrame:
    """Deterministic mixture weighting with fractional epochs — the
    standard corpus-mixing move (e.g. Wikipedia ×2.5, CommonCrawl ×0.7):
    a stratum with weight ``w`` contributes ``floor(w)`` full copies of
    every row plus one more copy kept with probability ``frac(w)``,
    decided by ``hash(key, epoch, seed)`` so the result is reproducible
    and repartition-stable. Output carries an ``epoch`` column (0-based
    copy index) so downstream shuffling/sharding can separate copies.

    Pure Catalyst: one CASE for the weight, one bounded ``sequence``
    explode (max ``ceil(w)`` copies — row amplification is exactly the
    mixture factor, there is no other shuffle), one hash filter."""
    strata = F.col(strata) if isinstance(strata, str) else strata
    key = F.col(key) if isinstance(key, str) else key
    wt = F.lit(float(default_weight))
    for value, w in sorted(weights.items()):
        if w < 0:
            raise ValueError(f"weight for {value!r} must be >= 0")
        wt = F.when(strata == F.lit(value), F.lit(float(w))).otherwise(wt)
    # sequence(0, -1) would generate a DESCENDING range — guard w == 0
    # by filtering first (explode of the empty case never happens)
    out = (
        df.withColumn("_wt", wt)
        .filter(F.col("_wt") > 0)
        .withColumn(
            out_epoch,
            F.explode(F.sequence(F.lit(0), F.ceil(F.col("_wt")).cast("int") - 1)),
        )
    )
    full = F.col(out_epoch) < F.floor(F.col("_wt"))
    frac = F.col("_wt") - F.floor(F.col("_wt"))
    extra = _hash01(key, seed, method, salt=F.col(out_epoch)) < frac
    return out.filter(full | extra).drop("_wt")


def sample_n(
    df: DataFrame,
    key: str | Column,
    n: int,
    seed: int = 0,
    method: str = "xxhash64",
) -> DataFrame:
    """Exactly-N deterministic sample: the N rows with the smallest
    hash values — a fixed-size 'reservoir' that is reproducible and
    order-independent (unlike actual reservoir sampling, whose result
    depends on encounter order). Physical plan is TakeOrderedAndProject:
    each partition keeps its local top-N, the driver merges — no full
    sort, no full shuffle, O(partitions × N) merge traffic."""
    key = F.col(key) if isinstance(key, str) else key
    return (
        df.withColumn("_h", _hash01(key, seed, method))
        .orderBy("_h")
        .limit(int(n))
        .drop("_h")
    )


def cap_per_group(
    df: DataFrame,
    group_cols: list,
    order_cols: list,
    n: int,
    out_rank: str | None = None,
) -> DataFrame:
    """Keep at most ``n`` rows per group, chosen by ``order_cols`` (e.g.
    'best 1000 documents per (lang, source) by quality score'). The
    rank filter compiles to Spark's WindowGroupLimit: every partition
    pre-truncates its groups to n rows BEFORE the exchange, so a hot
    group (one domain with 10^9 pages) ships at most
    n × input-partitions rows through the shuffle instead of its full
    size — the skew guard is in the physical plan, not a comment.
    Order must be made total (include a unique id last) for a
    deterministic result."""
    w_rank = F.row_number().over(
        Window.partitionBy(*group_cols).orderBy(*order_cols)
    )
    rank_col = out_rank or "_rk"
    res = df.withColumn(rank_col, w_rank).filter(F.col(rank_col) <= int(n))
    return res if out_rank else res.drop(rank_col)
