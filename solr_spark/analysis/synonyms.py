"""Query-time synonym expansion — SynonymGraphFilter semantics.

Reference: the shipped ``text_en`` field type enables synonymGraphFilter on
the QUERY analyzer only (solr/server/solr/configsets/_default/conf/
managed-schema.xml:300,308; plugin wiring core/src/java/org/apache/solr/
schema/FieldTypePluginLoader.java:82-131). Lucene's query-side pipeline is
public behavior: SynonymGraphFilter rewrites the token stream into a graph
(multi-word synonyms become alternative paths), and QueryBuilder collapses
the graph into queries —

- a position whose alternatives are all SINGLE tokens becomes a
  SynonymQuery: the terms score as ONE pseudo-term with doc freq = MAX of
  the member dfs and per-doc tf = SUM of the member tfs (Lucene
  SynonymQuery's blended scoring);
- a position with any MULTI-token alternative degrades to a disjunction
  (BooleanQuery SHOULD) of the paths: TermQuery for 1-token paths,
  PhraseQuery for multi-token paths, contributions summed per doc.

Rule syntax is the Solr synonyms.txt subset that matters:
``a, b, c`` (equivalence class, expand=true: every member maps to the whole
class, itself included) and ``x y, z => p q, r`` (explicit mapping: each
left side is REPLACED by the right-side alternatives). Rule text runs
through the same analyzer as the query, like the reference applies the
field's analyzer to the synonym file.

The expansion itself is a driver-side rewrite of the (tiny) analyzed query
— corpus-scale work stays in the postings scans the rewritten query plans.
"""

from __future__ import annotations

from solr_spark.analysis.chain import analyze

# LHS token-tuple -> alternative analyzed token sequences
SynonymRules = dict[tuple[str, ...], list[list[str]]]


def parse_rules(lines: list[str], analyzer: str = "simple") -> SynonymRules:
    """Parse synonyms.txt-style rules, analyzing every entry with the
    query's chain (multi-word entries may analyze to several tokens)."""
    rules: SynonymRules = {}

    def _add(lhs: tuple[str, ...], alts: list[list[str]]) -> None:
        if not lhs:
            return
        bucket = rules.setdefault(lhs, [])
        for a in alts:
            if a and a not in bucket:
                bucket.append(a)

    for raw in lines:
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if "=>" in line:
            lhs_txt, rhs_txt = line.split("=>", 1)
            rhs = [analyze(p.strip(), analyzer) for p in rhs_txt.split(",")]
            rhs = [r for r in rhs if r]
            for part in lhs_txt.split(","):
                _add(tuple(analyze(part.strip(), analyzer)), rhs)
        else:
            members = [analyze(p.strip(), analyzer) for p in line.split(",")]
            members = [m for m in members if m]
            for m in members:
                # expand=true: each member maps to the full class
                _add(tuple(m), [list(x) for x in members])
    return rules


def expand_spans(
    tokens: list[str], rules: SynonymRules
) -> list[tuple[int, int, list[list[str]]]]:
    """Greedy longest-match scan of the analyzed query tokens (the FST in
    SynonymGraphFilter matches longest-first). Returns covering spans
    ``(start, n_tokens, alternatives)``; tokens outside any rule become
    single-path spans of themselves. ``=>`` rules replace the matched
    text; equivalence classes already contain the identity path."""
    max_len = max((len(k) for k in rules), default=1)
    out: list[tuple[int, int, list[list[str]]]] = []
    i = 0
    n = len(tokens)
    while i < n:
        hit: tuple[int, int, list[list[str]]] | None = None
        for ln in range(min(max_len, n - i), 0, -1):
            key = tuple(tokens[i : i + ln])
            if key in rules:
                hit = (i, ln, [list(a) for a in rules[key]])
                break
        if hit is None:
            hit = (i, 1, [[tokens[i]]])
        out.append(hit)
        i += hit[1]
    return out
