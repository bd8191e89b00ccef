"""Result clustering (operators/clustering.py)."""

from __future__ import annotations

from solr_spark.operators.clustering import (
    OTHER_LABEL,
    cluster_results,
    cluster_summary,
)


def _assign(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["id"]: (r["label"], r["label_rank"])
            for r in cluster_results(df, "text", "doc_id", **kw).collect()}


def test_cluster_labels_and_other_bucket(spark):
    rows = [
        (0, "apache spark compute engine"),
        (1, "spark fast compute engine"),
        (2, "solr search index lucene"),
        (3, "search index query lucene solr"),
        (4, "banana fruit salad"),
    ]
    got = _assign(spark, rows, k_labels=4)
    # docs 0/1 and 2/3 land in labeled clusters; the singleton is Other
    assert got[0] == got[1] and got[0][1] >= 1
    assert got[2] == got[3] and got[2][1] >= 1
    assert got[0][0] != got[2][0]
    assert got[4] == (OTHER_LABEL, 0)


def test_cluster_every_doc_assigned_exactly_once(spark):
    rows = [(i, f"common t{i % 3} filler") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = cluster_results(df, "text", "doc_id", k_labels=2).collect()
    assert len(out) == 12 and len({r["id"] for r in out}) == 12
    sizes = {r["label"]: r["n_docs"]
             for r in cluster_summary(
                 cluster_results(df, "text", "doc_id", k_labels=2)).collect()}
    assert sum(sizes.values()) == 12


def test_cluster_stop_terms_excluded_from_labels(spark):
    rows = [(i, "query query match doc") for i in range(4)]
    got = _assign(spark, rows, k_labels=3, stop_terms=("query",))
    labels = {v[0] for v in got.values()}
    assert "query" not in labels


def test_cluster_label_significance_prefers_splitting_terms(spark):
    # a term in EVERY doc has significance df*ln(N/df) = 0 -> never a label
    rows = ([(i, "ubiq alpha alpha-side") for i in range(3)]
            + [(i + 3, "ubiq beta beta-side") for i in range(3)])
    got = _assign(spark, rows, k_labels=2)
    labels = {v[0] for v in got.values()}
    assert "ubiq" not in labels
    assert got[0][0] != got[3][0]  # the two halves split


def test_stc_hand_case(spark):
    """Zamir-Etzioni STC: base clusters 'new york'(df3·2=6), 'new york
    times'(df2·3=6), 'york times'(4), singles(0.5·df) merge into one
    component (overlap > 0.5 both ways); label = best score, longer phrase
    on ties; clusters OVERLAP-capable; uncovered docs -> Other rank 0."""
    from solr_spark.operators.clustering import stc_clusters

    rows = [
        (1, "new york times story about stuff"),
        (2, "new york times report"),
        (3, "new york city housing"),
        (4, "quantum computing breakthrough lab"),
        (5, "quantum computing hardware lab"),
        (6, "totally unrelated lonely document"),
        (7, "xy"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = stc_clusters(df, "t", "id", max_phrase=3, min_df=2).collect()
    by_rank = {}
    for r in got:
        by_rank.setdefault(r.cluster_rank, (r.label, r.cluster_score, set()))
        by_rank[r.cluster_rank][2].add(r.id)
    assert by_rank[1][0] == "new york times"
    # sum of member base scores: 6+6+4+1.5+1.5+1 ('new york', 'new york
    # times', 'york times', 'new', 'york', 'times')
    assert by_rank[1][1] == 20.0
    assert by_rank[1][2] == {1, 2, 3}
    assert by_rank[2][0] == "quantum computing"
    # 'quantum computing'(4) + quantum(1) + computing(1) + lab(1)
    assert by_rank[2][1] == 7.0 and by_rank[2][2] == {4, 5}
    assert by_rank[0][2] == {6, 7}          # Other bucket

    # merge threshold 1.0: nothing merges; top cluster is a lone base
    lone = stc_clusters(df, "t", "id", max_phrase=3, min_df=2,
                        merge_threshold=1.0).collect()
    top = [r for r in lone if r.cluster_rank == 1]
    assert {r.id for r in top} == {1, 2, 3} or len(top) <= 3


def test_lingo_two_topic_window(spark):
    """Lingo (Osinski & Weiss 2005) description-comes-first: on a planted
    two-topic window the top concepts induce multi-word phrase labels and
    split the docs; the off-topic doc lands in Other. Clusters may overlap."""
    from solr_spark.operators.clustering import lingo_clusters

    rows = [
        (1, "apache spark shuffle join spark executor memory"),
        (2, "spark shuffle partitions join executor"),
        (3, "apache spark executor shuffle config"),
        (4, "python pandas dataframe groupby merge pandas"),
        (5, "pandas dataframe merge python numpy"),
        (6, "python numpy pandas dataframe index"),
        (7, "totally unrelated banana smoothie recipe"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = lingo_clusters(df, "t", "id", k_clusters=3).collect()
    by_label = {}
    for r in got:
        by_label.setdefault(r.label, set()).add(r.id)
    assert by_label["spark shuffle"] == {1, 2, 3}
    assert by_label["pandas dataframe"] == {4, 5, 6}
    assert 7 in by_label["Other topics"]
    # phrase labels beat single terms for the top concepts
    top = sorted((r.cluster_rank, r.label) for r in got if r.cluster_rank > 0)
    assert " " in top[0][1]
    # determinism
    again = lingo_clusters(df, "t", "id", k_clusters=3).collect()
    assert sorted((r.id, r.label, r.cluster_rank) for r in got) == \
           sorted((r.id, r.label, r.cluster_rank) for r in again)


def test_bisecting_kmeans_two_topic_window(spark):
    """Bisecting k-means (Steinbach et al. 2000): deterministic seeding
    splits the planted two-topic window cleanly with HARD assignments;
    df-filtered singleton-vocabulary docs land in Other."""
    from solr_spark.operators.clustering import bisecting_kmeans_clusters

    rows = [
        (1, "apache spark shuffle join spark executor memory"),
        (2, "spark shuffle partitions join executor"),
        (3, "apache spark executor shuffle config"),
        (4, "python pandas dataframe groupby merge pandas"),
        (5, "pandas dataframe merge python numpy"),
        (6, "python numpy pandas dataframe index"),
        (7, "totally unrelated banana smoothie recipe"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = bisecting_kmeans_clusters(df, "t", "id", k_clusters=2).collect()
    members = {}
    for r in got:
        members.setdefault(r.cluster_rank, set()).add(r.id)
    assert members[0] == {7}
    assert {frozenset(members[1]), frozenset(members[2])} == {
        frozenset({1, 2, 3}), frozenset({4, 5, 6})}
    # hard assignment: each doc appears exactly once
    assert len(got) == 7
    # determinism across runs
    again = bisecting_kmeans_clusters(df, "t", "id", k_clusters=2).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
