"""Solr operator equivalents, expressed as DataFrame combinators.

Each function mirrors a reference operator documented in SURVEY.md §2 and
carries its citation. All are thin, declarative compositions of built-in
DataFrame ops — Catalyst picks the physical strategy (hash vs sort-merge vs
broadcast, partial+final aggregation), which is the point: the reference
hand-implements per-strategy processors (FacetFieldProcessorBy*), Spark
derives them.
"""

from solr_spark.operators.collapse import collapse, expand, group_top_n  # noqa: F401
from solr_spark.operators.cursor import cursor_page  # noqa: F401
from solr_spark.operators.facets import (  # noqa: F401
    field_stats,
    pivot_facet,
    query_facet,
    range_facet,
    terms_facet,
)
from solr_spark.operators.streams import (  # noqa: F401
    cartesian_product,
    complement_stream,
    fetch_stream,
    hash_rollup,
    inner_join_stream,
    intersect_stream,
    merge_stream,
    rollup_stream,
    select_stream,
    top_stream,
    unique_stream,
)
