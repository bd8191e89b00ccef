"""Statistical stream evaluators as DataFrame helpers.

Reference (SURVEY.md §2.8): Solr registers ~300 stream evaluators in
solrj io/Lang.java backed by commons-math — corr, cov, regression,
percentiles, movingAvg, zscores, describe... The Spark mapping is mostly
built-in aggregate/window functions; these helpers pin the exact shapes the
catalog exposes (and that the SQL oracles reproduce).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def describe(df: DataFrame, col: str) -> DataFrame:
    """`describe(col)`: count/mean/stddev/min/p25/p50/p75/max."""
    c = F.col(col)
    return df.agg(
        F.count(c).alias("count"),
        F.avg(c).alias("mean"),
        F.stddev_samp(c).alias("stddev"),
        F.min(c).alias("min"),
        F.percentile(c, F.lit(0.25)).alias("p25"),
        F.percentile(c, F.lit(0.5)).alias("p50"),
        F.percentile(c, F.lit(0.75)).alias("p75"),
        F.max(c).alias("max"),
    )


def corr_matrix(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Pairwise Pearson correlations: (col_a, col_b, corr)."""
    spark = df.sparkSession
    aggs = []
    names = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            aggs.append(F.corr(F.col(a), F.col(b)).alias(f"{a}|{b}"))
            names.append((a, b))
    row = df.agg(*aggs).collect()[0]
    return spark.createDataFrame(
        [(a, b, float(row[f"{a}|{b}"])) for a, b in names],
        "col_a string, col_b string, corr double",
    )


def covariance(df: DataFrame, a: str, b: str) -> DataFrame:
    return df.agg(
        F.covar_samp(F.col(a), F.col(b)).alias("cov"),
        F.corr(F.col(a), F.col(b)).alias("corr"),
    )


def moving_avg(
    df: DataFrame, value: str, order_by: str, window: int,
    partition_by: str | None = None,
) -> DataFrame:
    """`movingAvg(values, n)`: trailing-window mean over a sorted stream.

    Row-frame window function — one shuffle on the partition key (or a
    global sort when partition_by is None, matching Solr's sorted-stream
    contract)."""
    w = Window.orderBy(order_by).rowsBetween(-(window - 1), 0)
    if partition_by:
        w = Window.partitionBy(partition_by).orderBy(order_by).rowsBetween(
            -(window - 1), 0
        )
    return df.withColumn("moving_avg", F.avg(F.col(value)).over(w))


def zscores(df: DataFrame, value: str, partition_by: str | None = None) -> DataFrame:
    """`zscores(values)`: (x - mean) / stddev, computed with an analytic
    window (no second scan; partial aggregates broadcast by the window)."""
    w = Window.partitionBy(partition_by) if partition_by else Window.partitionBy()
    mean = F.avg(F.col(value)).over(w)
    sd = F.stddev_samp(F.col(value)).over(w)
    return df.withColumn("zscore", (F.col(value) - mean) / sd)


def hist(
    df: DataFrame, col: str, bins: int,
    lo: float | None = None, hi: float | None = None,
) -> DataFrame:
    """`hist(values, bins)` (io/eval/HistogramEvaluator.java, commons-math
    EmpiricalDistribution): equal-width binning with per-bin count/mean.
    Explicit ``lo``/``hi`` keep it one pass; omitted bounds cost one extra
    min/max aggregate (the reference's in-memory evaluator scans twice the
    same way). Values at ``hi`` land in the last bin."""
    c = F.col(col).cast("double")
    if lo is None or hi is None:
        b = df.agg(F.min(c).alias("lo"), F.max(c).alias("hi")).collect()[0]
        if (lo is None and b["lo"] is None) or (hi is None and b["hi"] is None):
            # empty / all-null column: no observable range -> empty histogram
            # (the reference's EmpiricalDistribution likewise has no bins to
            # report without data)
            return df.sparkSession.createDataFrame(
                [], "bin int, count long, mean double"
            )
        lo = float(b["lo"]) if lo is None else lo
        hi = float(b["hi"]) if hi is None else hi
    width = (hi - lo) / bins
    if width == 0:
        # degenerate range (all values equal): everything is bin 0, matching
        # the reference's single-bin histogram
        bin_ = F.lit(0)
    else:
        bin_ = F.least(
            F.floor((c - F.lit(lo)) / F.lit(width)), F.lit(bins - 1)
        ).cast("int")
    return (
        df.where((c >= lo) & (c <= hi))
        .groupBy(bin_.alias("bin"))
        .agg(F.count("*").alias("count"), F.avg(c).alias("mean"))
        .orderBy("bin")
    )


def linear_regression(df: DataFrame, x: str, y: str) -> DataFrame:
    """`regress(x, y)` / olsRegress (io/eval/RegressionEvaluator.java,
    backed by commons-math SimpleRegression): slope, intercept, R², n — as
    ONE distributed aggregate (Spark's regr_* family), not a driver-side
    array like the reference's stream evaluator."""
    xc, yc = F.col(x), F.col(y)
    return df.agg(
        F.regr_slope(yc, xc).alias("slope"),
        F.regr_intercept(yc, xc).alias("intercept"),
        F.regr_r2(yc, xc).alias("r2"),
        F.regr_count(yc, xc).alias("n"),
    )


def fft_magnitudes(
    df: DataFrame, value: str, order_by: str, limit: int = 1024
) -> DataFrame:
    """`fft(values)` (io/eval/FFTEvaluator.java): magnitude spectrum of a
    sorted series. Solr's math evaluators operate on IN-MEMORY arrays inside
    the /stream handler — the reference semantics are driver-side — so a
    bounded collect here is the faithful shape (``limit`` caps the series;
    raise it only as far as driver memory allows)."""
    import numpy as np

    spark = df.sparkSession
    vals = [
        float(r[0])
        for r in df.orderBy(order_by).select(value).limit(limit).collect()
    ]
    if not vals:
        return spark.createDataFrame([], "idx int, magnitude double")
    mag = np.abs(np.fft.fft(np.asarray(vals, dtype=np.float64)))
    return spark.createDataFrame(
        [(i, float(m)) for i, m in enumerate(mag)], "idx int, magnitude double"
    )


def percentiles(df: DataFrame, col: str, ps: Sequence[float]) -> DataFrame:
    """Exact interpolated percentiles (Solr uses a t-digest sketch —
    AVLTreeDigest(100) — so its values are approximate; exact is the
    stronger contract and matches DuckDB's quantile_cont)."""
    c = F.col(col)
    return df.agg(
        *[F.percentile(c, F.lit(p)).alias(f"p{int(p * 100)}") for p in ps]
    )
