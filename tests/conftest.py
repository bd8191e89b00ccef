from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from solr_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="solr_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_corpus(spark):
    """1k-row deterministic corpus with docid (FIXTURES.md 'tiny')."""
    from solr_spark.corpus import corpus_df
    from solr_spark.index.docid import with_docid

    df = with_docid(corpus_df(spark, 1000, seed=42, n_partitions=4)).cache()
    df.count()
    return df


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
