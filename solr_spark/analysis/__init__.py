"""Lucene-style analysis chain, vectorized for Spark.

Mirrors the reference's ``TokenizerChain`` (charFilters* -> tokenizer ->
tokenFilters*; /root/reference/solr/core/src/java/org/apache/solr/analysis/
TokenizerChain.java:37-89) and the shipped ``_default`` configset text types
(server/solr/configsets/_default/conf/managed-schema.xml):

- ``text_general`` (managed-schema.xml:295-305): standard tokenizer -> stop
  (shipped stopwords.txt is empty) -> lowercase.
- ``text_en`` (managed-schema.xml:342-372): standard -> stop(en) -> lowercase
  -> englishPossessive -> keywordMarker -> porterStem.

All implemented from the public UAX#29 word-break spec, the public Lucene
analyzer semantics, and the original published Porter algorithm — no code is
taken from the reference.
"""

from solr_spark.analysis.chain import (  # noqa: F401
    ANALYZERS,
    analyze,
    analyze_terms_udf,
    analyze_udf,
    simple_tokenize,
)
from solr_spark.analysis.porter import porter_stem  # noqa: F401
from solr_spark.analysis.stopwords import ENGLISH_STOP_WORDS  # noqa: F401
from solr_spark.analysis.tokenizer import standard_tokenize  # noqa: F401
