"""JSON Request API — the `json.query` / JSON Query DSL front-end.

Reference: Solr's JSON Request API (solr-ref-guide json-request-api.adoc,
json-query-dsl.adoc; request parsing in
core/src/java/org/apache/solr/request/json/RequestUtil.java and
json/JsonQueryConverter.java). A request body like

    {"query": {"bool": {"must": ["text:data"],
                        "should": [{"lucene": {"query": "spark"}}],
                        "must_not": ["merge"]}},
     "filter": ["lang:en"],
     "limit": 10}

is the JSON spelling of the classic `q={!bool ...}&fq=...&rows=...` request.
The reference converts each JSON query node into the matching QParser
invocation (JsonQueryConverter writes `{!name param=...}` strings); this
module does the same LOWERING onto the shared engine — leaf nodes become
lucene-grammar strings, the single-level `bool` node becomes a
`bool_query` composition, and top-level `dismax`/`edismax` nodes dispatch
to the dedicated dismax/edismax engines — so JSON-API scoring can never
drift from the string grammar's.

Supported nodes: a bare string, {"lucene": {"query": q [, "df": f]}},
{"field": {"f": name, "query": text}}, {"prefix": {"f": name, "query": p}},
a top-level {"bool": {...}}, and top-level {"dismax": {...}} /
{"edismax": {...}} (query/qf/tie/mm, plus pf/pf2/pf3/ps/ps2/ps3 for
edismax; qf/pf accept the reference's "field^boost field2" string form).
Nested bool-in-bool is rejected with a clear error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from solr_spark.index.build import IndexTables
from solr_spark.query.bm25 import B_DEFAULT, K1_DEFAULT
from solr_spark.query.boolq import bool_query

_BOOL_KEYS = ("must", "must_not", "filter", "should")


def _as_list(v) -> list:
    """Normalize a JSON clause value: the reference accepts a single node
    where a list of nodes is allowed (RequestUtil flattens both shapes)."""
    if v is None:
        return []
    return [v] if isinstance(v, (str, dict)) else list(v)


def _check_literal(value: str, what: str) -> str:
    """A field/prefix node's query value is a LITERAL in the reference
    (the node bypasses query-text parsing). Our lowering embeds it in a
    lucene-grammar string, so grammar metacharacters would silently change
    the query — reject them loudly instead of mis-parsing."""
    bad = set('":*~^()') & set(value)
    if bad:
        raise ValueError(
            f"{what} value {value!r} contains grammar metacharacter(s) "
            f"{sorted(bad)}; escape is not supported — use the lucene node "
            "for grammar queries"
        )
    return value


def _boost_map(v) -> dict[str, float]:
    """qf/pf in the reference's string form ("text^2 title") or an
    already-split dict → {field: boost}."""
    if isinstance(v, dict):
        return {f: float(b) for f, b in v.items()}
    out: dict[str, float] = {}
    for part in str(v).split():
        if "^" in part:
            f, b = part.split("^", 1)
            out[f] = float(b)
        else:
            out[part] = 1.0
    return out


def _lower_leaf(node, default_field: str) -> str:
    """One JSON query node -> a lucene-grammar query string."""
    if isinstance(node, str):
        return node
    if not (isinstance(node, dict) and len(node) == 1):
        raise ValueError(f"unsupported JSON query node: {node!r}")
    (name, body), = node.items()
    if name == "lucene":
        if isinstance(body, str):
            return body
        q = body["query"]
        df = body.get("df", default_field)
        if df != default_field:
            raise NotImplementedError(
                "per-node df override: qualify terms as field:term instead"
            )
        return q
    if name == "field":
        # {!field f=name}text -> exact analyzed phrase on that field
        return f'{body["f"]}:"{_check_literal(str(body["query"]), "field")}"'
    if name == "prefix":
        return f'{body["f"]}:{_check_literal(str(body["query"]), "prefix")}*'
    if name == "bool":
        raise NotImplementedError(
            "nested bool queries: flatten into the top-level bool's clause "
            "lists (the reference's JSON DSL allows nesting; this engine "
            "supports one bool level, matching {!bool})"
        )
    raise ValueError(f"unsupported JSON query node type: {name!r}")


def json_query_search(
    index: IndexTables,
    request: dict,
    default_field: str = "text",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    indexes: dict[str, IndexTables] | None = None,
) -> DataFrame:
    """Execute a JSON Request API body against the index: (docid, score)
    top-``limit`` stream, BM25-scored, identical to the equivalent
    `q`/`fq` string request by construction.

    ``indexes`` supplies the per-field index map for dismax/edismax query
    nodes (JsonQueryConverter routes any registered parser); when absent
    those nodes search ``{default_field: index}``.
    """
    query = request.get("query", "*:*")
    # Top-level "filter" accepts a single node OR a list of nodes, exactly
    # like bool clauses (a bare string must not be iterated char-by-char).
    filters = [
        _lower_leaf(f, default_field) for f in _as_list(request.get("filter"))
    ]
    limit = int(request.get("limit", 10))

    if isinstance(query, dict) and len(query) == 1 and (
        "dismax" in query or "edismax" in query
    ):
        (name, body), = query.items()
        from solr_spark.query.parser import search

        idxs = indexes or {default_field: index}
        filter_sets = [
            search(index, f, default_field=default_field, k1=k1, b=b,
                   _scores_only=True).select("docid")
            for f in filters
        ]
        common = dict(
            qf=_boost_map(body.get("qf", {f: 1.0 for f in idxs})),
            tie=float(body.get("tie", 0.0)),
            mm=int(body.get("mm", 1)),
            k=limit, k1=k1, b=b, filter_sets=filter_sets,
        )
        if name == "dismax":
            from solr_spark.query.dismax import dismax_search

            return dismax_search(idxs, body["query"], **common)
        from solr_spark.query.edismax import edismax_search

        return edismax_search(
            idxs, body["query"],
            pf=_boost_map(body["pf"]) if "pf" in body else None,
            pf2=_boost_map(body["pf2"]) if "pf2" in body else None,
            pf3=_boost_map(body["pf3"]) if "pf3" in body else None,
            ps=int(body.get("ps", 0)),
            ps2=int(body.get("ps2", 0)),
            ps3=int(body.get("ps3", 0)),
            **common,
        )

    if isinstance(query, dict) and len(query) == 1 and "bool" in query:
        body = query["bool"]
        unknown = set(body) - set(_BOOL_KEYS)
        if unknown:
            raise ValueError(f"unknown bool clause(s): {sorted(unknown)}")
        clauses = {
            key: [
                _lower_leaf(n, default_field) for n in _as_list(body.get(key))
            ]
            for key in _BOOL_KEYS
        }
        clauses["filter"] = clauses["filter"] + filters
    else:
        clauses = {
            "must": [_lower_leaf(query, default_field)],
            "must_not": [], "should": [], "filter": filters,
        }
    return bool_query(
        index,
        must=clauses["must"],
        must_not=clauses["must_not"],
        filter=clauses["filter"],
        should=clauses["should"],
        k=limit,
        default_field=default_field,
        k1=k1,
        b=b,
    )
