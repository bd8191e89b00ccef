"""Large-scale training-data pipeline operators.

Built for the 100 TB data-curation use-case on top of the same analysis
chain as the search engine:

- ``dedup``      — exact, n-gram Jaccard, MinHash+LSH, SimHash
- ``ann``        — brute-force / LSH-bucketed / IVF cosine similarity search
- ``textstats``  — language-ID, quality features, token counts, fingerprints
- ``curation``   — Gopher repetition/quality filters, C4 line cleaning,
                   PII scrubbing (all published heuristics, JVM plans)
- ``multimodal`` — binary-column plumbing for image/audio payloads (decode
                   stubbed; Spark-side schema/batching real)

Cross-engine determinism: every hash is derived from md5 hex (identical in
Spark and DuckDB), and modular arithmetic runs in decimal/hugeint, so the
MinHash/SimHash/LSH pipelines are bit-identical between the Spark
implementation and the SQL oracles.
"""

from solr_spark.functions.ann import (  # noqa: F401
    cosine_topk,
    ivf_topk,
    lsh_topk,
    train_centroids,
    with_ivf_cell,
    with_lsh_bucket,
)
from solr_spark.functions.dedup import (  # noqa: F401
    cut_duplicate_spans,
    duplicate_span_stats,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingle_hashes,
    simhash,
    simhash_pairs,
)
from solr_spark.functions.curation import (  # noqa: F401
    c4_line_filter,
    gopher_quality,
    gopher_repetition,
    gopher_repetition_keep,
    pii_scrub,
)
from solr_spark.functions.textstats import (  # noqa: F401
    fingerprint,
    identify_language,
    quality_features,
    token_counts,
)
