"""Reference-compatible query pipeline (``pythongis/vector/sql.py:182-257``).

The reference's ``sql.query`` has NON-standard clause ordering that a
user migrating from it may rely on (SURVEY.md §3 entry point 3):

1. multiple ``_from`` tables form a full cross product (theta join);
2. with ``_groupby``: ``_limit`` caps the number of *groups* (not rows),
   and ``_where`` filters rows *within* each group **after** grouping;
3. without ``_groupby``: where → limit → select.

Our engine's native surface is standard Spark SQL; this adapter
reproduces the reference ordering for compatibility. ``_select`` entries
are (out_name, sql_expr); ``_where`` is a SQL boolean over the combined
columns; aggregation uses the fieldmapping stats of
``relational.aggregate``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pythongis_spark.operators.relational import aggregate


def query(
    _from: list[DataFrame],
    _select: list[tuple[str, str]] | None = None,
    _where: str | None = None,
    _groupby: list[str] | None = None,
    _fieldmapping: list[tuple[str, str, str]] | None = None,
    _limit: int | None = None,
    order_col: str | None = None,
) -> DataFrame:
    df = _from[0]
    for other in _from[1:]:
        df = df.crossJoin(other)  # reference itertools.product (sql.py:210-213)

    if _groupby:
        # reference order: group -> limit #groups -> where within group -> aggreg
        if _limit is not None:
            keys = (
                df.select(*_groupby)
                .distinct()
                .orderBy(*_groupby)
                .limit(_limit)
            )
            df = df.join(F.broadcast(keys), _groupby, "left_semi")
        if _where is not None:
            df = df.filter(F.expr(_where))
        out = aggregate(df, _groupby, _fieldmapping or [], order_col)
    else:
        if _where is not None:
            df = df.filter(F.expr(_where))
        if _limit is not None:
            df = df.limit(_limit)
        out = df
    if _select:
        out = out.select(*[F.expr(expr).alias(name) for name, expr in _select])
    return out
