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
`bool_query` composition — so JSON-API scoring can never drift from the
string grammar's.

Supported nodes: a bare string, {"lucene": {"query": q [, "df": f]}},
{"field": {"f": name, "query": text}}, {"prefix": {"f": name, "query": p}},
and a top-level {"bool": {...}}. Nested bool-in-bool and the dismax/edismax
JSON nodes are rejected with a clear error (use the dedicated
dismax/edismax entry points — their parameter surface is its own API).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from solr_spark.index.build import IndexTables
from solr_spark.query.bm25 import B_DEFAULT, K1_DEFAULT
from solr_spark.query.boolq import bool_query

_BOOL_KEYS = ("must", "must_not", "filter", "should")


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
        return f'{body["f"]}:"{body["query"]}"'
    if name == "prefix":
        return f'{body["f"]}:{body["query"]}*'
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
) -> DataFrame:
    """Execute a JSON Request API body against the index: (docid, score)
    top-``limit`` stream, BM25-scored, identical to the equivalent
    `q`/`fq` string request by construction."""
    query = request.get("query", "*:*")
    filters = [
        _lower_leaf(f, default_field) for f in request.get("filter", ())
    ]
    limit = int(request.get("limit", 10))

    def _as_list(v):
        return [v] if isinstance(v, (str, dict)) else list(v)

    if isinstance(query, dict) and len(query) == 1 and "bool" in query:
        body = query["bool"]
        unknown = set(body) - set(_BOOL_KEYS)
        if unknown:
            raise ValueError(f"unknown bool clause(s): {sorted(unknown)}")
        clauses = {
            key: [
                _lower_leaf(n, default_field) for n in _as_list(body.get(key, ()))
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
