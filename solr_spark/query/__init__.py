"""Query engine: BM25 scoring, top-k, query parsing."""

from solr_spark.query.bm25 import bm25_score_df, bm25_topk  # noqa: F401
