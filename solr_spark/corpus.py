"""Deterministic synthetic source-code corpus (FIXTURES.md Table 1).

Shape is exactly the BASELINE.json input_hint:
    (repo:string, path:string, commit:string, lang:string, content:string)

Seeded (default 42) and fully deterministic — same rows regardless of
parallelism (generation is keyed by row index, mirroring the reference's
SplittableRandom-seeded benchmark generators:
solr/benchmark/src/java/org/apache/solr/bench/Docs.java).

Includes a deliberate hot-term head (``def``, ``return``, ``self`` in nearly
every doc) so skew handling is exercised, plus a Zipf(~1.1) body vocabulary.
"""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LANGS = ["python", "java", "go", "js", "rust"]
_LANG_WEIGHTS = [0.4, 0.2, 0.15, 0.15, 0.1]
_EXT = {"python": "py", "java": "java", "go": "go", "js": "js", "rust": "rs"}

_DIRS = ["core", "util", "io", "net", "index", "query", "store", "codec"]
_NAMES = [
    "reader", "writer", "merger", "scorer", "parser", "codec", "buffer",
    "segment", "posting", "filter", "analyzer", "handler", "router", "cache",
]

_HOT = ["def", "return", "self", "import", "class"]

_TEMPLATES = [
    "def {a}_{b}({c}):",
    "    return {a}.{b}({c}, {d})",
    "class {A}{B}:",
    "    self.{a} = {b}({c})",
    "import {a}.{b}",
    "if {a} == {b}:",
    "    {c} = {d} + {a}",
    "for {a} in {b}:",
    "    yield {a}.{b}({c})",
    "while {a} < {b}: {c} += {d}",
]


def _vocab(n: int = 5000) -> list[str]:
    """Deterministic 5k-token vocabulary of code-ish identifiers."""
    rng = random.Random(4242)
    syll = ["ba", "co", "de", "fi", "ga", "hu", "ix", "ja", "ko", "lu",
            "ma", "no", "pa", "qu", "ra", "so", "ta", "ur", "va", "wo",
            "xe", "ya", "zo", "ser", "idx", "buf", "doc", "ter", "seg", "pos"]
    out = []
    seen = set()
    while len(out) < n:
        w = "".join(rng.choice(syll) for _ in range(rng.randint(2, 4)))
        if w not in seen:
            seen.add(w)
            out.append(w)
    return out


_VOCAB = _vocab()
# Zipf(1.1)-ish sampling weights over the vocabulary.
_ZIPF_W = 1.0 / np.arange(1, len(_VOCAB) + 1) ** 1.1
_ZIPF_CUM = np.cumsum(_ZIPF_W / _ZIPF_W.sum())


def _gen_row(i: int, seed: int) -> tuple[str, str, str, str, str]:
    rng = random.Random((seed << 32) ^ i)
    repo = f"org{i % 7}/project{i % 101}"
    lang = rng.choices(LANGS, weights=_LANG_WEIGHTS, k=1)[0]
    path = (
        f"src/{rng.choice(_DIRS)}/{rng.choice(_NAMES)}_{i}.{_EXT[lang]}"
    )
    commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()

    n_lines = rng.randint(20, 400)
    u = np.array([rng.random() for _ in range(n_lines * 4)])
    words = [_VOCAB[j] for j in np.searchsorted(_ZIPF_CUM, u)]
    wi = iter(words)

    lines = []
    for ln in range(n_lines):
        t = _TEMPLATES[rng.randrange(len(_TEMPLATES))]
        a, b, c, d = (next(wi), next(wi), next(wi), next(wi))
        lines.append(
            t.format(a=a, b=b, c=c, d=d, A=a.capitalize(), B=b.capitalize())
        )
        if rng.random() < 0.6:
            lines.append(f"    {rng.choice(_HOT)} {a}")
    return repo, path, commit, lang, "\n".join(lines)


def corpus_pandas(n_rows: int, seed: int = 42, start: int = 0) -> pd.DataFrame:
    rows = [_gen_row(i, seed) for i in range(start, start + n_rows)]
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def corpus_df(
    spark: SparkSession, n_rows: int, seed: int = 42, n_partitions: int | None = None
) -> DataFrame:
    """Distributed generation: each partition generates its own index range
    (no driver-side materialization — scales to bench sizes)."""
    if n_partitions is None:
        n_partitions = max(1, spark.sparkContext.defaultParallelism)
    schema = "repo string, path string, commit string, lang string, content string"

    def gen(part):
        for pdf in part:
            for lo in pdf["lo"]:
                hi = min(lo + _CHUNK, n_rows)
                yield corpus_pandas(hi - lo, seed=seed, start=lo)

    _CHUNK = max(1, (n_rows + n_partitions - 1) // n_partitions)
    bounds = spark.createDataFrame(
        [(i,) for i in range(0, n_rows, _CHUNK)], "lo long"
    ).repartition(n_partitions, "lo")
    return bounds.mapInPandas(gen, schema)


REFERENCE_QUERIES: list[tuple[int, str]] = [
    (1, "def"),                      # 1-term hot
    (2, "serdoc"),                   # 1-term mid
    (3, "scorer merger"),            # 2-term
    (4, "def return self"),          # all-hot
    (5, "posting codec buffer segment"),  # 4-term
    (6, "the and of"),               # stopword-only -> empty under text_en
    (7, "zzzznotaterm"),             # absent term -> empty
    (8, "import quray"),             # hot + rare mix
    (9, "class analyzer"),
    (10, "index merge policy"),
]
