"""solr_spark — a PySpark-native full-text indexing + BM25 query engine.

A from-scratch rebuild of the query and data-processing capabilities of
Apache Solr 9 (reference studied at /root/reference), expressed Spark-first:

- ``solr_spark.analysis``  — the Lucene-style analysis chain (UAX#29-ish
  standard tokenizer, lowercase, English stop, possessive, Porter stem) as
  vectorized Arrow/pandas UDFs.
- ``solr_spark.index``     — distributed inverted-index construction:
  per-partition segments (sorted posting lists, delta + varbyte compression,
  skip/block metadata), manifests for checkpoint/resume, segment merge.
- ``solr_spark.query``     — BM25 top-k scoring (DataFrame-native and
  block-max-WAND over compressed segments), a Lucene-ish query parser.
- ``solr_spark.operators`` — Solr operator equivalents (collapse, expand,
  grouping, rollup, facets, stats, stream set-ops, joins, MLT, rerank,
  significant terms, cursor pagination).
- ``solr_spark.functions`` — large-scale training-data ops: dedup (exact,
  MinHash-LSH, SimHash, n-gram Jaccard), ANN similarity search, text
  quality/language-id/fingerprinting, multimodal column plumbing.
- ``solr_spark.streaming`` — Structured Streaming equivalents of Solr's
  topic/daemon/update streams.

Everything here derives from public knowledge only (the Apache Solr/Lucene
sources under /root/reference, the public Lucene file-format docs, and the
PySpark API).
"""

__version__ = "0.1.0"

from solr_spark.session import get_spark  # noqa: F401
