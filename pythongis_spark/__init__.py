"""pythongis_spark — a from-scratch, PySpark-native spatial-join + tiling
analytics engine with the query/data-processing capabilities of
karimbahgat/PythonGis (reference, read-only, at /root/reference).

Design stance (SURVEY.md §7):

* Every operator is a function ``DataFrame -> DataFrame`` composed from
  built-in ``pyspark.sql.functions`` plus vectorized Arrow/pandas UDFs.
  No per-row Python UDFs, no RDDs, no Catalyst extensions.
* Geometry travels as WKB ``binary`` columns; the spatial access path is a
  deterministic quadkey/Morton cell-id column (H3-style, dependency-free)
  rather than the reference's per-row r-tree probe
  (``pythongis/vector/data.py:1189-1243``).
* Spatial joins are candidate cell equi-joins (broadcast under threshold,
  else shuffle with explicit hot-cell salting) refined by exact pure-numpy
  predicates inside pandas UDFs.
* Raster data is a cell table ``(x,y,band,val)`` or a tile-chunk table —
  the Spark-native analog of the reference's ``tiled()`` fallback
  (``pythongis/raster/manager.py:1347``).
"""

__version__ = "0.1.0"

from pythongis_spark.session import get_spark  # noqa: F401
