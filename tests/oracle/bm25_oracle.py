"""Independent single-process BM25 oracle (FIXTURES.md Table 3 generator).

A deliberately naive, dict-based implementation of the exact Lucene BM25
semantics (formula + SmallFloat norm quantization + (score desc, docid asc)
tie-break) used to cross-check the Spark engine. Shares only the analysis
chain with the engine (token parity is a *precondition* being tested
elsewhere); indexing and scoring logic here is written independently of the
Spark code paths.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from solr_spark.analysis.chain import ANALYZERS
from solr_spark.index.norms import quantize_length


class OracleIndex:
    def __init__(self, analyzer: str = "text_en"):
        self.analyze = ANALYZERS[analyzer]
        self.postings: dict[str, dict[str, int]] = defaultdict(dict)
        self.doclen: dict[str, int] = {}

    def add(self, docid: str, content: str) -> None:
        toks = self.analyze(content)
        self.doclen[docid] = len(toks)
        for term, tf in Counter(toks).items():
            self.postings[term][docid] = tf

    def topk(
        self,
        query: str,
        k: int = 10,
        k1: float = 1.2,
        b: float = 0.75,
        quantize_norms: bool = True,
    ) -> list[tuple[str, float]]:
        n = len(self.doclen)
        if n == 0:
            return []
        avgdl = sum(self.doclen.values()) / n
        scores: dict[str, float] = defaultdict(float)
        for term in self.analyze(query):
            plist = self.postings.get(term)
            if not plist:
                continue
            w = math.log(1.0 + (n - len(plist) + 0.5) / (len(plist) + 0.5))
            for docid, tf in plist.items():
                dl = self.doclen[docid]
                if quantize_norms:
                    dl = quantize_length(dl)
                scores[docid] += w * tf / (tf + k1 * (1 - b + b * dl / avgdl))
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
