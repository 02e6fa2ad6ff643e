"""Sources & sinks.

Reference loaders/savers (``pythongis/vector/loader.py:42``,
``saver.py:24``) handle shapefile/GeoJSON/CSV/XLS — formats whose
libraries aren't in this image. The engine's table formats are
parquet (default), csv, json; Iceberg is the north-rule catalog format
and is stubbed behind an import-try (its jars are not on this image's
classpath — the API and the fallback layout are real).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

IMAGE_SCHEMA_DDL = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")  # noqa: SLF001
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, path_or_table: str, fmt: str | None = None,
               schema: str | None = None) -> DataFrame:
    """Unified reader: iceberg catalog table when available, else
    parquet/csv/json by extension. ``select``-style row filters are just
    ``.filter`` afterwards — Catalyst pushes them into the scan (the
    reference's load-time ``select`` pushdown, ``loader.py:206-208``,
    for free)."""
    # a slash-less name with a known file extension is a relative file
    # path, not an iceberg catalog identifier
    _ext = os.path.splitext(path_or_table)[1].lstrip(".").lower()
    _is_file = _ext in ("parquet", "csv", "json", "geojson", "shp",
                        "xlsx", "xls", "dta")
    if fmt == "iceberg" or (
            fmt is None and "/" not in path_or_table and not _is_file):
        if _iceberg_available(spark):
            return spark.read.format("iceberg").load(path_or_table)
        if "/" not in path_or_table:
            raise NotImplementedError(
                "Iceberg jars not on this classpath; pass a parquet path "
                "(the checkpoint layout in pythongis_spark.lineage provides "
                "snapshot/manifest semantics on plain parquet)"
            )
    ext = fmt or os.path.splitext(path_or_table)[1].lstrip(".").lower() or "parquet"
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    if ext == "parquet":
        return reader.parquet(path_or_table)
    if ext == "csv":
        return reader.option("header", True).csv(path_or_table)
    if ext == "json":
        return reader.json(path_or_table)
    if ext == "geojson":
        # real geometry parsing → WKB column (reference loader semantics,
        # pythongis/vector/loader.py:42-199), not a raw json scan
        from pythongis_spark.sources.geojson import read_geojson

        return read_geojson(spark, path_or_table)
    if ext == "shp":
        # pure-struct ESRI shapefile parser (reference loads via PyShp,
        # absent here; see sources/shapefile.py)
        from pythongis_spark.sources.shapefile import read_shapefile, read_shapefiles

        if any(ch in path_or_table for ch in "*?["):
            return read_shapefiles(spark, path_or_table)
        return read_shapefile(spark, path_or_table)
    if ext == "xlsx":
        from pythongis_spark.sources.xlsx import read_xlsx

        return read_xlsx(spark, path_or_table)
    if ext == "xls":
        from pythongis_spark.sources.xls import read_xls

        return read_xls(spark, path_or_table)
    if ext == "dta":
        # Stata (reference vector/fileformats/stata.py wraps a vendored
        # PyDTA; pandas' read_stata covers the same formats). Field
        # names uppercased like the reference's loader.
        import pandas as _pd

        pdf = _pd.read_stata(path_or_table)
        pdf.columns = [c.upper() for c in pdf.columns]
        return spark.createDataFrame(pdf)
    raise ValueError(f"unsupported format {ext!r}")


def read_image_table(spark: SparkSession, path: str) -> DataFrame:
    """The north-rule image+caption table (BASELINE.json input_hint
    schema), with schema enforced rather than inferred."""
    df = spark.read.parquet(path)
    missing = set(c.strip().split(" ")[0] for c in IMAGE_SCHEMA_DDL.split(",")) - set(
        df.columns
    )
    if missing:
        raise ValueError(f"image table missing columns: {sorted(missing)}")
    return df


def write_table(df: DataFrame, path: str, fmt: str = "parquet",
                partition_by: list[str] | None = None, mode: str = "overwrite") -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    getattr(w, fmt)(path)


def incremental_files(spark: SparkSession, path: str, processed_log: str) -> tuple[DataFrame | None, list[str]]:
    """Batch-incremental ingest: read only parquet part-files not yet in
    the processed log. The reference has no streaming
    (``pythongis/vector/streaming.py`` is an empty stub); this is the
    batch analog that pairs with ``lineage.run_checkpointed`` for
    resumable pipelines."""
    seen = set()
    if os.path.exists(processed_log):
        with open(processed_log) as fh:
            seen = {l.strip() for l in fh if l.strip()}
    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and os.path.join(path, f) not in seen
    )
    if not files:
        return None, []
    return spark.read.parquet(*files), files


def mark_processed(processed_log: str, files: list[str]) -> None:
    with open(processed_log, "a") as fh:
        for f in files:
            fh.write(f + "\n")
