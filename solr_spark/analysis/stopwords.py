"""English stopword set.

The reference's ``text_en`` stop filter loads ``lang/stopwords_en.txt``
(/root/reference/solr/server/solr/configsets/_default/conf/managed-schema.xml:346),
whose contents are the classic 33-word Lucene English stop set (public).
``text_general`` loads ``stopwords.txt``, which ships empty.
"""

from __future__ import annotations

ENGLISH_STOP_WORDS: frozenset[str] = frozenset(
    {
        "a", "an", "and", "are", "as", "at", "be", "but", "by",
        "for", "if", "in", "into", "is", "it",
        "no", "not", "of", "on", "or", "such",
        "that", "the", "their", "then", "there", "these",
        "they", "this", "to", "was", "will", "with",
    }
)
