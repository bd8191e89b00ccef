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
    base = Window.partitionBy(partition_by) if partition_by else Window
    w = base.orderBy(order_by).rowsBetween(-(window - 1), 0)
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


def polyfit(df: DataFrame, x: str, y: str, degree: int = 2) -> DataFrame:
    """`polyfit(x, y, degree)` (io/eval/PolyFitEvaluator.java, commons-math
    PolynomialCurveFitter): least-squares polynomial coefficients.

    Distributed shape: ONE aggregation pass computes the normal-equation
    moments Σx^k (k ≤ 2d) and Σx^k·y (k ≤ d) — (3d+2) partial-aggregated
    doubles regardless of row count — then the (d+1)×(d+1) solve runs on
    the driver (numpy). The reference evaluator instead materializes both
    arrays in the /stream JVM; this never moves the data.

    Conditioning note: raw-power normal equations square the Vandermonde
    condition number — fine for the small degrees the reference supports
    (callers with wide-range x should center/scale it first).

    Returns one row: coef_0 … coef_{degree} (ascending powers)."""
    import numpy as np

    xc = F.col(x).cast("double")
    yc = F.col(y).cast("double")
    # the fit is over COMPLETE (x, y) pairs — a row with x but null y must
    # not leak into the Σx^k moments or A and b describe different
    # populations and the solve is silently wrong
    df = df.where(xc.isNotNull() & yc.isNotNull())
    aggs = [F.sum(F.pow(xc, k)).alias(f"sx{k}") for k in range(2 * degree + 1)]
    aggs += [F.sum(F.pow(xc, k) * yc).alias(f"sxy{k}") for k in range(degree + 1)]
    m = df.agg(*aggs).collect()[0]
    if m["sx0"] is None or m["sx0"] < degree + 1:
        raise ValueError(
            f"polyfit(degree={degree}) needs at least {degree + 1} non-null rows"
        )
    a = np.array(
        [[m[f"sx{i + j}"] for j in range(degree + 1)] for i in range(degree + 1)],
        dtype=np.float64,
    )
    b = np.array([m[f"sxy{i}"] for i in range(degree + 1)], dtype=np.float64)
    coef = np.linalg.solve(a, b)
    return df.sparkSession.createDataFrame(
        [tuple(float(c) for c in coef)],
        ", ".join(f"coef_{k} double" for k in range(degree + 1)),
    )


def loess(
    df: DataFrame, x: str, y: str,
    bandwidth: float = 0.3, robust_iters: int = 2, limit: int = 4096,
) -> DataFrame:
    """`loess(x, y, bandwidth)` (io/eval/LoessEvaluator.java, commons-math
    LoessInterpolator defaults bandwidth=0.3, robustnessIters=2): tricube-
    weighted local LINEAR regression smoother with bisquare robustness
    reweighting.

    Like the reference's /stream evaluator this is series/array math —
    driver-side on a bounded, sorted collect (``limit`` caps it, same
    contract as fft_magnitudes); the sweep itself is vectorized numpy.
    Returns (x, y, smoothed) sorted by x."""
    import numpy as np

    spark = df.sparkSession
    rows = (
        df.select(F.col(x).cast("double"), F.col(y).cast("double"))
        .where(F.col(x).isNotNull() & F.col(y).isNotNull())
        .orderBy(x)
        .limit(limit)
        .collect()
    )
    if not rows:
        return spark.createDataFrame([], "x double, y double, smoothed double")
    xs = np.array([r[0] for r in rows])
    ys = np.array([r[1] for r in rows])
    n = len(xs)
    span = max(2, int(np.ceil(bandwidth * n)))
    robust = np.ones(n)
    fit = ys.copy()
    for it in range(robust_iters + 1):
        for i in range(n):
            lo = min(max(0, i - span // 2), n - span)
            seg = slice(lo, lo + span)
            d = np.abs(xs[seg] - xs[i])
            dmax = d.max()
            w = (1 - (d / dmax) ** 3) ** 3 if dmax > 0 else np.ones_like(d)
            w = np.clip(w, 0, None) * robust[seg]
            sw = w.sum()
            if sw <= 0:
                # no weighted support (every neighbor robust-zeroed): keep
                # the previous iteration's estimate — falling back to ys[i]
                # would hand an outlier residual 0 and full weight back
                continue
            xm = (w * xs[seg]).sum() / sw
            ym = (w * ys[seg]).sum() / sw
            sxx = (w * (xs[seg] - xm) ** 2).sum()
            if sxx > 1e-12 * (np.abs(xs[seg]).max() ** 2 or 1.0):
                beta = (w * (xs[seg] - xm) * (ys[seg] - ym)).sum() / sxx
            else:
                beta = 0.0
            fit[i] = ym + beta * (xs[i] - xm)
        if it < robust_iters:
            resid = np.abs(ys - fit)
            # bisquare with the median |residual| as scale; floored so a
            # perfectly-fit series (median = fp noise) doesn't zero out
            # every weight
            s = max(np.median(resid), 1e-12 * max(1.0, float(np.abs(ys).max())))
            robust = np.clip(1 - (resid / (6 * s)) ** 2, 0, None) ** 2
    return spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(xs, ys, fit)],
        "x double, y double, smoothed double",
    )


def _betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a,b) — Lentz continued fraction
    (standard published algorithm; needed for the Student-t CDF because
    neither numpy nor the stdlib expose it)."""
    import math

    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        + a * math.log(x) + b * math.log1p(-x)
    )
    if x > (a + 1) / (a + b + 2):
        return 1.0 - _betainc(b, a, 1.0 - x)
    f, c, d = 1.0, 1.0, 0.0
    for i in range(200):
        m = i // 2
        if i == 0:
            num = 1.0
        elif i % 2 == 0:
            num = m * (b - m) * x / ((a + 2 * m - 1) * (a + 2 * m))
        else:
            num = -(a + m) * (a + b + m) * x / ((a + 2 * m) * (a + 2 * m + 1))
        d = 1.0 + num * d
        d = 1.0 / (d if abs(d) > 1e-30 else 1e-30)
        c = 1.0 + num / (c if abs(c) > 1e-30 else 1e-30)
        f *= c * d
        if abs(1.0 - c * d) < 1e-12:
            break
    return math.exp(ln_front) * (f - 1.0) / a


def student_t_sf(t: float, dof: float) -> float:
    """P(T > t) for Student-t with ``dof`` degrees of freedom."""
    x = dof / (dof + t * t)
    p = 0.5 * _betainc(dof / 2.0, 0.5, x)
    return p if t >= 0 else 1.0 - p


def welch_ttest(
    df: DataFrame, value: str, group_col: str, group_a, group_b
) -> DataFrame:
    """`ttest(a, b)` (io/eval/TTestEvaluator.java, commons-math TTest —
    Welch's unequal-variance two-sample test): t statistic, Welch–
    Satterthwaite degrees of freedom, two-sided p-value.

    ONE distributed aggregation (filtered count/avg/var per side); the
    scalar t/df/p math runs on the driver. The t-CDF uses the regularized
    incomplete beta (continued fraction) since no library in-sandbox
    provides it."""
    c = F.col(value).cast("double")
    ga = F.col(group_col) == group_a
    gb = F.col(group_col) == group_b
    m = df.agg(
        F.count(F.when(ga, c)).alias("na"),
        F.avg(F.when(ga, c)).alias("ma"),
        F.var_samp(F.when(ga, c)).alias("va"),
        F.count(F.when(gb, c)).alias("nb"),
        F.avg(F.when(gb, c)).alias("mb"),
        F.var_samp(F.when(gb, c)).alias("vb"),
    ).collect()[0]
    na, nb = m["na"], m["nb"]
    if na < 2 or nb < 2:
        raise ValueError(
            f"ttest needs >= 2 observations per group "
            f"(got {group_a!r}: {na}, {group_b!r}: {nb})"
        )
    sa, sb = m["va"] / na, m["vb"] / nb
    t = (m["ma"] - m["mb"]) / (sa + sb) ** 0.5
    dof = (sa + sb) ** 2 / (sa**2 / (na - 1) + sb**2 / (nb - 1))
    p = 2.0 * student_t_sf(abs(t), dof)
    return df.sparkSession.createDataFrame(
        [(float(t), float(dof), float(p), int(na), int(nb))],
        "t_stat double, df double, p_value double, n_a long, n_b long",
    )


def ecdf(df: DataFrame, col: str, probes: Sequence[float]) -> DataFrame:
    """`empiricalDistribution(values)` + `cumulativeProbability(d, x)`
    (io/eval/EmpiricalDistributionEvaluator.java + CumulativeProbability-
    Evaluator.java): P(X <= x) at each probe point, as ONE aggregation pass
    — a filtered count per probe, partial-aggregated map-side (the
    reference builds the whole ECDF in /stream memory)."""
    c = F.col(col).cast("double")
    spark = df.sparkSession
    m = df.agg(
        F.count(c).alias("n"),
        *[
            F.count(F.when(c <= float(p), True)).alias(f"le{i}")
            for i, p in enumerate(probes)
        ],
    ).collect()[0]
    n = m["n"] or 1
    return spark.createDataFrame(
        [(float(p), m[f"le{i}"] / n) for i, p in enumerate(probes)],
        "probe double, cum_prob double",
    )


def normal_cdf(col, mean: float = 0.0, sd: float = 1.0):
    """`normalDistribution(m, s)` + `cumulativeProbability` as a pure JVM
    Column expression — Abramowitz & Stegun 7.1.26 erf polynomial (max
    abs error 1.5e-7; the reference's commons-math is exact-to-double,
    so treat this as approximate — tests assert 1e-6 tolerance)."""
    z = (col - F.lit(float(mean))) / F.lit(float(sd) * 2.0**0.5)
    az = F.abs(z)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * az)
    poly = t * (
        F.lit(0.254829592)
        + t * (
            F.lit(-0.284496736)
            + t * (
                F.lit(1.421413741)
                + t * (F.lit(-1.453152027) + t * F.lit(1.061405429))
            )
        )
    )
    erf_abs = F.lit(1.0) - poly * F.exp(-az * az)
    erf = F.when(z < 0, -erf_abs).otherwise(erf_abs)
    return F.lit(0.5) * (F.lit(1.0) + erf)


def diff_series(
    df: DataFrame, value: str, order_by: str, lag: int = 1,
    partition_by: str | None = None,
) -> DataFrame:
    """`diff(values, lag)` (io/eval/TimeDifferencingEvaluator.java): serial
    time-differencing x_t - x_{t-lag} over a sorted stream. Lag window
    function — same shuffle shape as movingAvg; first `lag` rows are null
    (the reference drops them; callers filter)."""
    w = (
        Window.partitionBy(partition_by).orderBy(order_by)
        if partition_by
        else Window.orderBy(order_by)
    )
    return df.withColumn(
        "diff", F.col(value) - F.lag(F.col(value), lag).over(w)
    )


def moving_median(
    df: DataFrame, value: str, order_by: str, window: int,
    partition_by: str | None = None,
) -> DataFrame:
    """`movingMedian(values, n)` (io/eval/MovingMedianEvaluator.java):
    trailing-window median. The window frame collects at most ``window``
    values per row; median is an exact sort of that tiny array (JVM
    expressions, no UDF)."""
    base = Window.partitionBy(partition_by) if partition_by else Window
    w = base.orderBy(order_by).rowsBetween(-(window - 1), 0)
    vals = F.array_sort(F.collect_list(F.col(value)).over(w))
    n = F.size(vals)
    mid = (n / 2).cast("int")
    med = F.when(
        n % 2 == 1, F.element_at(vals, mid + 1).cast("double")
    ).otherwise(
        (F.element_at(vals, mid) + F.element_at(vals, mid + 1)) / 2.0
    )
    return df.withColumn("moving_median", med)
