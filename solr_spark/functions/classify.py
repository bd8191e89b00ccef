"""Text classification helpers: igain term selection + logistic regression.

Reference:
- `{!igain}` (search/IGainTermsQParserPlugin.java:155-185): per-term
  information gain against a binary outcome over the training set —
  score(t) = H(p_c) − (df/N)·H(x_c/df) − (1 − df/N)·H((P − x_c)/(N − df + 1))
  with H the binary entropy (natural log), N = training docs, P = positive
  docs, df = docs containing t, x_c = positive docs containing t. Exactly
  that formula, including the reference's (N − df + 1) denominator.
- `{!textLogit}` (search/TextLogisticRegressionQParserPlugin.java): batch
  logistic regression over a fixed term-feature list, one gradient step per
  iteration computed across the corpus. Features here are binary term
  presence (the reference scales tf by idf-like weights through its
  ClassificationEvaluation; divergence documented — presence features keep
  the whole iteration expressible as two JVM aggregations per step).

Spark shape: igain is two aggregations (per-term counts conditioned on the
outcome + global scalars) — no per-term jobs; textLogit runs its gradient
as ONE aggregation per iteration with the weight vector broadcast, so each
step is a single pass regardless of corpus size.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _binary_entropy(p: Column) -> Column:
    """H(p) = −p·ln p − (1−p)·ln(1−p), 0 at the endpoints (reference
    IGainTermsQParserPlugin.binaryEntropy)."""
    safe = (p > 0) & (p < 1)
    return F.when(
        safe, -p * F.log(p) - (1 - p) * F.log(1 - p)
    ).otherwise(F.lit(0.0))


def igain_terms(
    postings: DataFrame,
    labels: DataFrame,
    n_terms: int = 10,
    min_df: int = 1,
) -> DataFrame:
    """(term, df, score) top information-gain terms for a binary outcome.

    ``postings``: (term, docid[, ...]) distinct term/doc pairs;
    ``labels``: (docid, label int 0/1) — one row per training doc.
    """
    sizes = labels.agg(
        F.count("*").alias("n"), F.sum("label").cast("long").alias("pos")
    ).collect()[0]
    n, pos = int(sizes["n"]), int(sizes["pos"])
    if n == 0:
        return postings.sparkSession.createDataFrame(
            [], "term string, df long, score double"
        )
    entropy_c = float(
        -(pos / n) * math.log(pos / n) - (1 - pos / n) * math.log(1 - pos / n)
        if 0 < pos < n else 0.0
    )
    per_term = (
        postings.select("term", "docid").distinct()
        .join(labels, "docid")
        .groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.sum("label").cast("long").alias("xc"),
        )
        .where(F.col("df") >= min_df)
    )
    df_, xc = F.col("df").cast("double"), F.col("xc").cast("double")
    h_in = _binary_entropy(xc / df_)
    h_out = _binary_entropy((F.lit(float(pos)) - xc) / (F.lit(float(n)) - df_ + 1))
    score = (
        F.lit(entropy_c)
        - (df_ / F.lit(float(n))) * h_in
        - (1 - df_ / F.lit(float(n))) * h_out
    )
    return (
        per_term.select("term", "df", score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("term").asc())
        .limit(n_terms)
    )


def text_logit_train(
    postings: DataFrame,
    labels: DataFrame,
    feature_terms: list[str],
    iterations: int = 10,
    learning_rate: float = 1.0,
) -> dict[str, float]:
    """Batch logistic regression on binary term-presence features.

    Returns {"_intercept": b, term: weight, ...}. Each iteration is ONE
    aggregation job: per-doc margin via a pivoted presence vector, gradient
    = Σ (σ(margin) − y)·x computed as conditional sums.
    """
    terms = list(feature_terms)
    # (docid, label, f0..fk presence) — materialized once, reused each step.
    pres = (
        postings.select("term", "docid")
        .where(F.col("term").isin(terms))
        .distinct()
        .groupBy("docid")
        .pivot("term", terms)
        .agg(F.lit(1))
        .na.fill(0)
    )
    feats = labels.join(pres, "docid", "left").na.fill(0).persist()
    feats.count()
    try:
        w = {t: 0.0 for t in terms}
        b = 0.0
        n = feats.count()
        for _ in range(iterations):
            margin = F.lit(b)
            for t in terms:
                margin = margin + F.lit(w[t]) * F.col(t)
            err = (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))) - F.col("label")
            grads = feats.agg(
                F.sum(err).alias("_b"),
                *[F.sum(err * F.col(t)).alias(t) for t in terms],
            ).collect()[0]
            b -= learning_rate * float(grads["_b"]) / n
            for t in terms:
                w[t] -= learning_rate * float(grads[t]) / n
        return {"_intercept": b, **w}
    finally:
        feats.unpersist()


def text_logit_predict(
    postings: DataFrame, weights: dict[str, float], docs: DataFrame | None = None
) -> DataFrame:
    """(docid, prob) — σ(w·x + b) under the trained presence-feature model.

    ``docs`` (a (docid, ...) universe table) extends predictions to docs
    containing NONE of the feature terms — they score σ(b), exactly what
    training drove them toward; without it only feature-matching docs get a
    row (the postings table cannot name absent docs).
    """
    import math

    b = float(weights["_intercept"])
    terms = [t for t in weights if t != "_intercept"]
    spark = postings.sparkSession
    if not terms:
        if docs is None:
            return spark.createDataFrame([], "docid long, prob double")
        return docs.select(
            "docid", F.lit(1.0 / (1.0 + math.exp(-b))).alias("prob")
        )
    margin_per_doc = (
        postings.select("term", "docid")
        .where(F.col("term").isin(terms))
        .distinct()
        .withColumn(
            "w",
            F.coalesce(
                *[
                    F.when(F.col("term") == t, F.lit(weights[t]))
                    for t in terms
                ]
            ),
        )
        .groupBy("docid")
        .agg(F.sum("w").alias("m"))
    )
    if docs is not None:
        margin_per_doc = (
            docs.select("docid")
            .join(margin_per_doc, "docid", "left")
            .na.fill({"m": 0.0})
        )
    margin = F.col("m") + F.lit(b)
    return margin_per_doc.select(
        "docid", (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))).alias("prob")
    )
