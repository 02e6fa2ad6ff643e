"""GeoJSON ingestion/egress with real geometry parsing.

Reference: ``pythongis/vector/loader.py:42-199`` builds features with
GeoJSON-dict geometries; our engine's geometry currency is WKB binary
columns, so the loader parses geometry JSON → WKB in an Arrow-batched
pandas UDF (the only Python step; file splitting/projection stays in
the Spark JSON reader).

Design notes for scale:

* A standard FeatureCollection is ONE json object → ``multiLine`` read
  of the collection, features exploded. For 100 TB-class inputs use
  newline-delimited GeoJSON (one feature per line, ``ndjson=True``) —
  splittable, parallel scan; the collection form necessarily reads one
  file per task.
* ``geometry`` and ``properties`` are read AS RAW STRINGS (Spark's JSON
  schema would otherwise unify heterogeneous coordinate nesting across
  geometry types into a mess). Properties expand to typed columns via
  ``expand_properties`` (from_json with a caller schema) — the
  reference's field-list inference (loader.py:117-143) done lazily.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pythongis_spark.geometry import wkb as W

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("geometry", T.StringType()),
        T.StructField("properties", T.StringType()),
    ]
)

_COLLECTION_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("features", T.ArrayType(_FEATURE_SCHEMA)),
    ]
)


def _coords2d(seq) -> np.ndarray:
    """Coordinate sequence → (N,2) float64 array.

    GeoJSON positions may carry a third (elevation) element (RFC 7946 §3.1.1);
    WKB encoding here is strictly 2-D, so extra ordinates are dropped
    explicitly rather than silently misaligning the serialized doubles.
    """
    arr = np.array(seq, dtype=np.float64)
    if arr.ndim == 1:  # a single position
        return arr[:2].reshape(1, 2)
    if arr.ndim != 2 or arr.shape[1] < 2:
        raise ValueError(f"malformed GeoJSON coordinate array of shape {arr.shape}")
    return np.ascontiguousarray(arr[:, :2])


def geojson_geom_to_tuple(obj: dict):
    """GeoJSON geometry dict → internal (type, payload) tuple."""
    t = obj["type"]
    c = obj["coordinates"]
    if t == "Point":
        return ("Point", _coords2d(c))
    if t == "MultiPoint":
        return ("MultiPoint", _coords2d(c))
    if t == "LineString":
        return ("LineString", _coords2d(c))
    if t == "MultiLineString":
        return ("MultiLineString", [_coords2d(l) for l in c])
    if t == "Polygon":
        return ("Polygon", [_coords2d(r) for r in c])
    if t == "MultiPolygon":
        return (
            "MultiPolygon",
            [[_coords2d(r) for r in rings] for rings in c],
        )
    raise ValueError(f"unsupported GeoJSON geometry type {t!r}")


def geom_tuple_to_geojson(geom) -> dict:
    t, payload = geom
    if t == "Point":
        return {"type": t, "coordinates": [float(payload[0, 0]), float(payload[0, 1])]}
    if t == "MultiPoint":
        pts = np.vstack(payload) if isinstance(payload, list) else payload
        return {"type": t, "coordinates": pts.tolist()}
    if t == "LineString":
        return {"type": t, "coordinates": payload.tolist()}
    if t == "MultiLineString":
        return {"type": t, "coordinates": [l.tolist() for l in payload]}
    if t == "Polygon":
        return {"type": t, "coordinates": [r.tolist() for r in payload]}
    if t == "MultiPolygon":
        return {
            "type": t,
            "coordinates": [[r.tolist() for r in rings] for rings in payload],
        }
    raise ValueError(t)


@F.pandas_udf(T.BinaryType())
def geojson_to_wkb(gj: pd.Series) -> pd.Series:
    out = []
    for s in gj.to_numpy(object):
        if s is None:
            out.append(None)
            continue
        obj = json.loads(s)
        if obj is None:
            out.append(None)
            continue
        out.append(W.encode_wkb(geojson_geom_to_tuple(obj)))
    return pd.Series(out, index=gj.index)


@F.pandas_udf(T.StringType())
def wkb_to_geojson(blobs: pd.Series) -> pd.Series:
    out = []
    for b in blobs.to_numpy(object):
        if b is None:
            out.append(None)
            continue
        out.append(
            json.dumps(geom_tuple_to_geojson(W.decode_wkb(bytes(b))), separators=(",", ":"))
        )
    return pd.Series(out, index=blobs.index)


def read_geojson(
    spark: SparkSession, path: str, ndjson: bool = False, geom_col: str = "geom"
) -> DataFrame:
    """Load GeoJSON → (properties string, <geom_col> WKB binary).

    ``ndjson=False``: a FeatureCollection document (reference loader
    semantics). ``ndjson=True``: one feature object per line
    (splittable at scale). Null geometries stay null like the
    reference's null-geometry features."""
    if ndjson:
        feats = spark.read.schema(_FEATURE_SCHEMA).json(path)
        base = feats.select("geometry", "properties")
    else:
        coll = spark.read.schema(_COLLECTION_SCHEMA).option("multiLine", True).json(path)
        base = coll.select(F.explode("features").alias("f")).select(
            F.col("f.geometry").alias("geometry"), F.col("f.properties").alias("properties")
        )
    return base.select(
        F.col("properties"), geojson_to_wkb(F.col("geometry")).alias(geom_col)
    )


def expand_properties(df: DataFrame, schema_ddl: str, props_col: str = "properties") -> DataFrame:
    """Expand the raw properties JSON into typed columns (from_json) —
    the reference's per-file field inference, with an explicit schema."""
    parsed = F.from_json(F.col(props_col), schema_ddl)
    # one projection, not a withColumn per field (Catalyst re-analyzes
    # the whole plan for each chained projection on wide schemas)
    out = df.withColumn("_p", parsed)
    keep = [c for c in df.columns if c != props_col]
    return out.select(*keep, "_p.*")


def write_geojson(
    df: DataFrame, path: str, geom_col: str = "geom", ndjson: bool = True
) -> None:
    """Write features as newline-delimited GeoJSON (the scale-safe form;
    reference saver writes a single FeatureCollection,
    ``pythongis/vector/saver.py:24`` — wrap the lines in a collection
    for interop with single-document readers)."""
    props = [c for c in df.columns if c != geom_col]
    feature = F.to_json(
        F.struct(
            F.lit("Feature").alias("type"),
            F.struct(*[F.col(c) for c in props]).alias("properties"),
        )
    )
    # splice the geometry json in (to_json would re-escape a string col)
    line = F.concat(
        F.regexp_replace(feature, r"\}$", ""),
        F.lit(',"geometry":'),
        F.coalesce(wkb_to_geojson(F.col(geom_col)), F.lit("null")),
        F.lit("}"),
    )
    df.select(line.alias("value")).write.mode("overwrite").text(path)
