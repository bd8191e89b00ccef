"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``solr_spark.entry_queries`` — one catalog entry per
operator family from SURVEY.md §2, each backed by the operator modules under
``solr_spark/operators`` and the index/query engine under
``solr_spark/index`` + ``solr_spark/query``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from solr_spark import entry_queries as _eq


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: BM25 top-10 over /root/testdata/sf0.001 documents."""
    return _eq.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _eq.queries()


def oracle_sql() -> dict[str, str]:
    return _eq.oracle_sql()
