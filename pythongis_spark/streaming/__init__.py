"""Structured Streaming surface.

The reference's ``pythongis/vector/streaming.py:1-10`` is an empty stub
(``class Streaming(object): pass``) — it has NO streaming capability.
This package is the Spark-native realization of that intent: streaming
ingest of event/image tables with watermarked windowed aggregates,
streaming spatial tagging (the same broadcast cell join the batch path
uses — stream-static joins are supported by Structured Streaming), and
stateful sessionization via ``applyInPandasWithState``.
"""

from pythongis_spark.streaming.pipeline import (  # noqa: F401
    read_event_stream,
    sessionize_stream,
    stream_pip_tag,
    windowed_counts,
)
