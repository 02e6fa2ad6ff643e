"""Local mimic of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at the same sf, compare row count,
schema (sorted column names), and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    # floats compare BIT-EXACT, matching the driver's value hash — a
    # tolerance here would let sub-tolerance Spark-vs-DuckDB drift pass
    # locally and fail the real gate (it masked a 1.2e-7 oracle
    # series-sign divergence until r5)
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif np.issubdtype(pdf[c].dtype, np.integer):
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from pythongis_spark.session import get_spark

    spark = get_spark(app="oracle_check", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name must not exit 0 having checked nothing
        print(f"unknown query name(s): {sorted(unknown)}")
        sys.exit(2)
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in osql:
            sdf = fn(spark, sf_dir).toPandas()
            print(f"{name}: rows-only check, {len(sdf)} rows")
            continue
        sdf = fn(spark, sf_dir).toPandas()
        ddf = con.execute(osql[name]).fetchdf()
        s, d = normalize(sdf), normalize(ddf)
        ok_rows = len(s) == len(d)
        ok_schema = list(s.columns) == list(d.columns)
        ok_vals = ok_rows and ok_schema and s.equals(d)
        status = "OK" if (ok_rows and ok_schema and ok_vals) else "FAIL"
        print(f"{name}: {status} rows={len(s)}/{len(d)} schema={ok_schema} values={ok_vals}")
        if status == "FAIL":
            failures += 1
            if ok_schema and ok_rows:
                neq = ~(s == d).all(axis=1)
                print("  first diffs (spark vs duckdb):")
                print(pd.concat([s[neq].head(3), d[neq].head(3)]).to_string())
            else:
                print("  spark cols:", list(s.columns))
                print("  duck  cols:", list(d.columns))
                print(s.head(3).to_string())
                print(d.head(3).to_string())
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
