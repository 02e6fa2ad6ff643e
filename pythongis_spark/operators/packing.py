"""Sequence packing — assigning documents to fixed-token-budget
training chunks/shards (LLM-pipeline surface, alongside sampling/
dedup/similarity/text).

Two standard packing disciplines, both deterministic and
repartition-stable:

- ``pack_chunks`` — GPT-style *concat-and-chunk*: lay every document's
  tokens end-to-end in a fixed global order and cut every ``budget``
  tokens. Documents may straddle a cut; the op reports the first chunk,
  the offset within it, and how many chunks the document spans. Exact
  closed form over a global cumulative token sum, so it is pure
  arithmetic once the cumsum exists.
- ``pack_bins`` — greedy *no-split* bin packing within explicit groups:
  walk each group in order, open a new bin whenever adding the next
  document would exceed the budget (documents larger than the budget
  get a bin of their own). This is the T5/seqio "pack examples"
  discipline; the greedy scan is inherently sequential *per group*, so
  groups are the unit of parallelism (one Arrow batch each).

Scale notes (100 TB): ``pack_chunks`` needs a global cumulative sum —
computed with the same two-job trick as ``classify._with_global_row_
number`` (range repartition by the order key, freeze with an eager
``localCheckpoint`` so AQE cannot re-coalesce between the stats job and
the main job, per-partition partial sums collected to the driver —
O(shuffle.partitions) rows, never data — then a map-side offset add).
Every stage is fully parallel; there is no single-partition window.
``pack_bins``'s groups must individually fit in memory — callers choose
the group key (e.g. a date or a hash bucket) to bound group size, and
the greedy state is one running integer per group.

Reference parity: the reference has no packing operators — this module
is part of the beyond-reference LLM-pipeline surface the build brief
asks for.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def _with_global_cumsum(
    df: DataFrame, value_col: str, order_cols: list[str], out: str
) -> DataFrame:
    """df + exact global cumulative sum of ``value_col`` (inclusive of
    the current row) in (order_cols) order, every stage parallel.

    Same shape as ``classify._with_global_row_number`` but accumulating
    a SUM instead of a COUNT: range-repartition on the order key, eager
    localCheckpoint (AQE-coalesce freeze — see that helper's warning),
    one tiny per-partition-totals job, then a per-partition window
    cumsum plus the broadcast partition offset.
    """
    sess = df.sparkSession
    nparts = int(sess.conf.get("spark.sql.shuffle.partitions", "32"))
    rp = df.repartitionByRange(nparts, *[F.col(c) for c in order_cols]).withColumn(
        "_pid", F.spark_partition_id()
    )
    rp = rp.localCheckpoint(eager=True)
    totals = {
        r["_pid"]: r["s"]
        for r in rp.groupBy("_pid")
        .agg(F.sum(F.col(value_col).cast("long")).alias("s"))
        .collect()
    }
    off_expr = F.lit(0).cast("long")
    if totals:
        acc = 0
        pairs = []
        for pid in sorted(totals):
            pairs.extend([F.lit(pid), F.lit(acc)])
            acc += int(totals[pid] or 0)
        off_expr = F.coalesce(F.create_map(*pairs)[F.col("_pid")], F.lit(0)).cast(
            "long"
        )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(value_col).cast("long")).over(w) + off_expr
    return rp.withColumn(out, cum).drop("_pid")


def pack_chunks(
    df: DataFrame,
    tokens_col: str,
    budget: int,
    order_cols: list[str] | str,
    out_chunk: str = "chunk_id",
    out_offset: str = "chunk_offset",
    out_span: str = "n_chunks",
) -> DataFrame:
    """Concat-and-chunk packing: documents laid end-to-end in
    (order_cols) order, a cut every ``budget`` tokens.

    Adds three columns: ``chunk_id`` — 0-based chunk holding the
    document's FIRST token; ``chunk_offset`` — token offset of the
    document within that chunk; ``n_chunks`` — how many chunks the
    document touches (1 = fits entirely, ≥2 = straddles cuts; 1 also
    for zero-token documents, pinned to the boundary they sit on).

    ``order_cols`` must be a total order (include a unique id) —
    otherwise the cumsum, and therefore every chunk assignment, is
    nondeterministic. Rows with NULL or negative token counts raise at
    plan level via an ANSI-safe assertion column.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if isinstance(order_cols, str):
        order_cols = [order_cols]
    toks = F.col(tokens_col).cast("long")
    # ANSI-mode guard: raise_error inside when() only fires on bad rows
    checked = F.when(
        toks.isNull() | (toks < 0),
        F.raise_error(
            F.concat(F.lit(f"pack_chunks: bad token count in {tokens_col}: "), toks)
        ).cast("long"),
    ).otherwise(toks)
    tagged = df.withColumn("_tok", checked)
    cum = _with_global_cumsum(tagged, "_tok", order_cols, "_cum")
    before = F.col("_cum") - F.col("_tok")
    first_chunk = F.floor(before / F.lit(budget)).cast("long")
    last_chunk = F.when(
        F.col("_tok") > 0, F.floor((F.col("_cum") - 1) / F.lit(budget))
    ).otherwise(first_chunk)
    return (
        cum.withColumn(out_chunk, first_chunk)
        .withColumn(out_offset, (before - first_chunk * F.lit(budget)).cast("long"))
        .withColumn(out_span, (last_chunk - first_chunk + 1).cast("long"))
        .drop("_tok", "_cum")
    )


def pack_bins(
    df: DataFrame,
    tokens_col: str,
    budget: int,
    by: str | list[str],
    order_cols: list[str] | str,
    out: str = "bin_id",
) -> DataFrame:
    """Greedy no-split bin packing within each ``by`` group: walking the
    group in (order_cols) order, a document joins the current bin iff
    the bin stays within ``budget``; otherwise it opens the next bin.
    A document alone larger than the budget still gets its own bin
    (bins never split documents). ``bin_id`` is 0-based per group.

    One ``applyInPandas`` per group — the greedy scan is sequential by
    definition, so the group key is the parallelism unit; pick one that
    bounds group size (shard hash, date, source).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    by = [by] if isinstance(by, str) else list(by)
    if isinstance(order_cols, str):
        order_cols = [order_cols]
    schema = T.StructType(
        df.schema.fields + [T.StructField(out, T.LongType(), False)]
    )
    toks_name, order_names = tokens_col, list(order_cols)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_names, kind="mergesort").reset_index(drop=True)
        bins = []
        bin_id, acc = 0, 0
        for t in pdf[toks_name].astype("int64"):
            if t < 0:
                raise ValueError(f"pack_bins: negative token count {t}")
            if acc > 0 and acc + t > budget:
                bin_id += 1
                acc = 0
            bins.append(bin_id)
            acc += t
        pdf[out] = pd.Series(bins, dtype="int64")
        return pdf

    return df.groupBy(*[F.col(c) for c in by]).applyInPandas(pack, schema=schema)
