"""Deterministic, partition-independent document identity.

Solr requires a ``uniqueKey`` and routes by murmur3 hash of it
(/root/reference/solr/solrj/src/java/org/apache/solr/common/cloud/
CompositeIdRouter.java:98). Our docid must additionally be STABLE across
parallelism levels (rank-identity at N vs 4N executors — SURVEY.md §7 hard
part (c)), so it is content-derived, never ``monotonically_increasing_id``:

    docid = first 16 hex chars of sha256(repo \\x00 path \\x00 commit)

Computed JVM-side with built-in functions (no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def docid_col(*key_cols: str | Column) -> Column:
    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    return F.substring(F.sha2(F.concat_ws("\x00", *cols), 256), 1, 16)


def with_docid(df: DataFrame, key_cols: tuple[str, ...] = ("repo", "path", "commit"),
               out: str = "docid") -> DataFrame:
    return df.withColumn(out, docid_col(*key_cols))


def docid_long_col(*key_cols: str | Column) -> Column:
    """Content-derived int64 docid: first 15 hex chars of the sha256 (60
    bits, always positive). The physical segment layer keys docs by int64;
    like the hex form, it is stable across partitioning/parallelism."""
    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    return F.conv(
        F.substring(F.sha2(F.concat_ws("\x00", *cols), 256), 1, 15), 16, 10
    ).cast("long")


def with_docid_long(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("repo", "path", "commit"),
    out: str = "docid",
) -> DataFrame:
    return df.withColumn(out, docid_long_col(*key_cols))
