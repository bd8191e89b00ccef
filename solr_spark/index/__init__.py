"""Distributed inverted-index construction (build, segments, merge)."""

from solr_spark.index.build import build_index, IndexTables  # noqa: F401
from solr_spark.index.docid import with_docid  # noqa: F401
from solr_spark.index.norms import byte4_to_int, int_to_byte4, quantize_doclen  # noqa: F401
from solr_spark.index.segments import (  # noqa: F401
    build_index_dir,
    build_segments,
    finalize_index,
    merge_index,
)
