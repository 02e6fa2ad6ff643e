"""Cell-index assignment as DataFrame transforms.

The quadkey/Morton grid is pure integer arithmetic, so the *point* path is
expressed entirely in built-in Catalyst expressions (whole-stage codegen,
no Python at all); only bbox→cell-set explosion (polygon side) uses a
pandas UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pythongis_spark.index import quadkey as Q


def point_cell_expr(lon: Column, lat: Column, z: int) -> Column:
    """Morton cell id of a point at level z as a pure Catalyst expression.

    Equivalent to :func:`quadkey.cell_of_points` but JVM-side: tile coords
    by floor arithmetic, then bit-interleave via the shift-mask ladder.
    Keeping this in codegen means the *probe* side of every spatial join
    never leaves the JVM until the refine step.
    """
    n = 1 << z
    tx = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n))
    ty = F.floor((F.lit(90.0) - lat) / F.lit(180.0) * F.lit(n))
    tx = F.greatest(F.lit(0), F.least(F.lit(n - 1), tx)).cast("long")
    ty = F.greatest(F.lit(0), F.least(F.lit(n - 1), ty)).cast("long")
    return interleave_expr(tx, ty)


def _spread_expr(v: Column) -> Column:
    """Spread low 32 bits into even positions (Catalyst translation of
    quadkey._part1by1)."""
    masks = [
        (16, 0x0000FFFF0000FFFF),
        (8, 0x00FF00FF00FF00FF),
        (4, 0x0F0F0F0F0F0F0F0F),
        (2, 0x3333333333333333),
        (1, 0x5555555555555555),
    ]
    v = v.bitwiseAND(F.lit(0xFFFFFFFF))
    for shift, mask in masks:
        v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(F.lit(mask))
    return v


def interleave_expr(tx: Column, ty: Column) -> Column:
    return _spread_expr(tx).bitwiseOR(F.shiftleft(_spread_expr(ty), 1))


# Hard ceiling on per-feature cell materialization. The spatial joins
# split oversized features to a nested-loop path BEFORE exploding, so
# rows reaching this UDF are bounded by their cell_cap; this cap is
# defense-in-depth for direct callers — fail loudly instead of
# materializing up to 4^z cells in one row (executor OOM / skew).
MAX_CELLS_PER_FEATURE = 65_536


@F.pandas_udf(T.ArrayType(T.LongType()))
def _bbox_cells_udf(xmin: pd.Series, ymin: pd.Series, xmax: pd.Series, ymax: pd.Series, z: pd.Series) -> pd.Series:
    out = []
    zv = int(z.iloc[0]) if len(z) else 0
    for x0, y0, x1, y1 in zip(xmin, ymin, xmax, ymax):
        if x0 is None or not np.isfinite(x0):
            out.append(None)
        else:
            out.append(
                Q.cells_of_bbox(x0, y0, x1, y1, zv, cap=MAX_CELLS_PER_FEATURE).tolist()
            )
    return pd.Series(out, index=xmin.index)


def with_point_cell(df: DataFrame, lon: str, lat: str, z: int, out: str = "cell") -> DataFrame:
    return df.withColumn(out, point_cell_expr(F.col(lon), F.col(lat), z))


def explode_bbox_cells(df: DataFrame, z: int, out: str = "cell") -> DataFrame:
    """One row per (feature, covering cell) — requires bbox_* columns
    (see ``geometry.udfs.with_bbox``). This is the build-side explosion of
    the candidate cell join (reference analog: r-tree insertion,
    ``pythongis/vector/data.py:1189-1229``)."""
    return df.withColumn(
        out,
        F.explode(
            _bbox_cells_udf(
                F.col("bbox_xmin"),
                F.col("bbox_ymin"),
                F.col("bbox_xmax"),
                F.col("bbox_ymax"),
                F.lit(z),
            )
        ),
    )


def pick_level(df: DataFrame, sample_rows: int = 10_000, target_cells: float = 16.0) -> int:
    """Pick an index level from the build side's median bbox size.

    One cheap aggregate on (at most) a sampled prefix — the planning
    statistic our engine needs because a fixed grid replaces the
    reference's adaptive r-tree.
    """
    stats = (
        df.select(
            (F.col("bbox_xmax") - F.col("bbox_xmin")).alias("w"),
            (F.col("bbox_ymax") - F.col("bbox_ymin")).alias("h"),
        )
        .limit(sample_rows)
        .agg(
            F.percentile_approx("w", 0.5).alias("mw"),
            F.percentile_approx("h", 0.5).alias("mh"),
        )
        .first()
    )
    mw = stats["mw"] if stats["mw"] is not None else 1.0
    mh = stats["mh"] if stats["mh"] is not None else 1.0
    return Q.pick_level_for_bbox(
        np.array([mw]), np.array([mh]), target_cells=target_cells
    )
