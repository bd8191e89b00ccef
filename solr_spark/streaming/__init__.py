"""Structured Streaming equivalents of Solr's continuous operators."""

from solr_spark.streaming.topics import (  # noqa: F401
    daemon_query,
    incremental_index_sink,
    topic_stream,
    windowed_event_counts,
)
from solr_spark.streaming.sessions import (  # noqa: F401
    sessionize,
    sessionize_stream,
)
