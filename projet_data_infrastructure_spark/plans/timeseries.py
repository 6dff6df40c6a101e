"""Time-series analytics over the calendar-bounded daily/hourly grids:
decomposition, autocorrelation diagnostics, trend and changepoint screens,
forecasting fits, and the motif/discord matrix profile.

Consolidated from the round-6..round-10 build modules (round 11, VERDICT
r10 item 6) — specs, oracles, and hashes unchanged; each spec keeps its
original design docstring. The shared scale shape of this module: ONE
map-side-combinable corpus aggregate down to a calendar-bounded day (or
hour) grid, then every window/pair/lag operation runs on that ≤ 366-row
(per year) frame — the unpartitioned windows here are all members of the
documented bounded-window class (SCALE.md).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_data_infrastructure_spark.functions.stats import two_sided_p_sql
from projet_data_infrastructure_spark.plans._portable import (
    fdiv as _fdiv,
    pround,
    pround_sql,
)
from projet_data_infrastructure_spark.plans.registry import QuerySpec
from projet_data_infrastructure_spark.sources.readers import read_table

SPECS: list[QuerySpec] = []

# --------------------------------------------------------------------------
# STL-lite weekly decomposition of the daily event-value series
# --------------------------------------------------------------------------

_STL_CENTS = "CAST(round(value * 100) AS BIGINT)"


def q_stl_weekly_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))).alias("d"),
            F.expr(_STL_CENTS).alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").alias("value_cents"))
    )
    # Calendar-bounded frame (≤ 31 days in the test data, ≤ ~3.7k/decade in
    # general): the unpartitioned RANGE window is safe at any raw-data scale.
    w7 = Window.orderBy("d").rangeBetween(-3, 3)
    trended = (
        daily.withColumn("sum7", F.sum("value_cents").over(w7))
        .withColumn("cnt7", F.count(F.lit(1)).over(w7))
        .filter(F.col("cnt7") == 7)
        # non-negative sum → DIV is already floor; ×10⁶ ≤ 7·10¹⁴ at test
        # scale (recast DECIMAL for >10¹² cents/week corpora)
        .withColumn("trend_micro", F.expr("(sum7 * 1000000) DIV 7"))
        .withColumn("detr_micro", F.col("value_cents") * F.lit(1000000) - F.col("trend_micro"))
        .withColumn("dow", F.pmod(F.col("d"), F.lit(7)))
    )
    seasonal = trended.groupBy("dow").agg(
        F.sum("detr_micro").alias("sdetr"), F.count(F.lit(1)).alias("ndetr")
    )
    seasonal = seasonal.select(
        "dow", F.expr(_fdiv("sdetr", "ndetr", "DIV")).alias("seasonal_micro")
    )
    return (
        trended.join(F.broadcast(seasonal), "dow")
        .select(
            "d",
            "value_cents",
            "trend_micro",
            "seasonal_micro",
            (F.col("detr_micro") - F.col("seasonal_micro")).alias("resid_micro"),
        )
        .orderBy("d")
    )


_STL_SQL = f"""
WITH daily AS (
    SELECT CAST(ts AS DATE) - DATE '1970-01-01' AS d,
           CAST(sum({_STL_CENTS}) AS BIGINT) AS value_cents
    FROM events GROUP BY 1
), trended AS (
    SELECT d, value_cents,
           sum(value_cents) OVER w7 AS sum7,
           count(*) OVER w7 AS cnt7
    FROM daily
    WINDOW w7 AS (ORDER BY d RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), full7 AS (
    SELECT d, value_cents,
           CAST((sum7 * 1000000) // 7 AS BIGINT) AS trend_micro,
           value_cents * 1000000 - CAST((sum7 * 1000000) // 7 AS BIGINT) AS detr_micro,
           d % 7 AS dow
    FROM trended WHERE cnt7 = 7
), seasonal AS (
    SELECT dow,
           CAST({_fdiv('CAST(sum(detr_micro) AS BIGINT)', 'count(*)', '//')} AS BIGINT)
               AS seasonal_micro
    FROM full7 GROUP BY dow
)
SELECT d, value_cents, trend_micro, seasonal_micro,
       detr_micro - seasonal_micro AS resid_micro
FROM full7 JOIN seasonal USING (dow)
ORDER BY d
"""




SPECS.append(
    QuerySpec(
        "stl_weekly_decompose",
        q_stl_weekly_decompose,
        _STL_SQL,
        ("timeseries", "window"),
        doc="STL-lite decomposition of the daily value series: centered 7-day "
        "RANGE-frame trend, day-of-week seasonal index, residual — all exact "
        "integer micro-cents over the calendar-bounded daily aggregate",
    )
)


# --------------------------------------------------------------------------
# Mann-Kendall z + p (the normalization the roundseven kernel left open)
# --------------------------------------------------------------------------


def q_mann_kendall_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Mann-Kendall trend TEST on the daily-revenue series —
    the variance/z/p normalization ``mann_kendall_theilsen``
    (plans/roundseven.py) explicitly left to the caller: Var(S) =
    (n(n-1)(2n+5) - SUM_t t(t-1)(2t+5)) / 18 with t the tie-group sizes of
    the daily VALUES, continuity-corrected z = (S -/+ 1)/sqrt(Var) and the
    Zelen-Severo two-sided p (``functions/stats.py``). Everything before
    the final double tree is exact BIGINT: S is the sign sum over the
    calendar-bounded day-grid pair set (<= ~67k pairs at any corpus size),
    the tie polynomial comes from one bounded re-aggregate of the daily
    values. One corpus aggregate; no corpus-sized window or join."""
    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))).alias("d"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").alias("y"))
        .localCheckpoint(eager=True)  # tiny calendar frame, consumed 3x
    )
    b = daily.select(F.col("d").alias("d2"), F.col("y").alias("y2"))
    s_agg = (
        daily.join(b, F.col("d2") > F.col("d"))
        .agg(F.sum(F.signum(F.col("y2") - F.col("y")).cast("long")).alias("mk_s"))
    )
    ties = (
        daily.groupBy("y")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy()
        .agg(
            F.sum("t").alias("n"),
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_poly"),
        )
    )
    scal = s_agg.crossJoin(F.broadcast(ties))
    var = (
        "((CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) * CAST(2 * n + 5 AS DOUBLE)"
        "  - CAST(tie_poly AS DOUBLE)) / 18.0)"
    )
    z = (
        f"(CASE WHEN mk_s > 0 THEN (CAST(mk_s AS DOUBLE) - 1.0) / sqrt({var})"
        f"      WHEN mk_s < 0 THEN (CAST(mk_s AS DOUBLE) + 1.0) / sqrt({var})"
        f"      ELSE 0.0 END)"
    )
    return scal.select(
        F.col("n").alias("n_days"),
        "mk_s",
        pround(F.expr(z), 6).alias("z_r"),
        pround(F.expr(two_sided_p_sql(z)), 8).alias("p_r"),
    )


def _mann_kendall_z_sql() -> str:
    var = (
        "((CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) * CAST(2 * n + 5 AS DOUBLE)"
        "  - CAST(tie_poly AS DOUBLE)) / 18.0)"
    )
    z = (
        f"(CASE WHEN mk_s > 0 THEN (CAST(mk_s AS DOUBLE) - 1.0) / sqrt({var})"
        f"      WHEN mk_s < 0 THEN (CAST(mk_s AS DOUBLE) + 1.0) / sqrt({var})"
        f"      ELSE 0.0 END)"
    )
    return f"""
WITH daily AS (
    SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1
), s_agg AS (
    SELECT CAST(sum(CAST(sign(b.y - a.y) AS BIGINT)) AS BIGINT) AS mk_s
    FROM daily a JOIN daily b ON b.d > a.d
), ties AS (
    SELECT CAST(sum(t) AS BIGINT) AS n,
           CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_poly
    FROM (SELECT count(*) AS t FROM daily GROUP BY y)
)
SELECT n AS n_days, mk_s,
       {pround_sql(z, 6)} AS z_r,
       {pround_sql(two_sided_p_sql(z), 8)} AS p_r
FROM s_agg, ties
"""


# --------------------------------------------------------------------------
# CUSUM mean-shift changepoint (exact integer deviation)
# --------------------------------------------------------------------------


def q_changepoint_cusum_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on the daily-revenue series: the
    mean-shift location is argmax_t |S_t| with S_t = Σ_{i≤t}(x_i − x̄)
    (Page 1954 / the standard offline CUSUM screen). Scaling by n removes
    ALL floating arithmetic from the argmax: D_t = n·cum_t − t·total is an
    exact BIGINT per day, so the changepoint day is an integer-exact
    decision in both engines (ties break to the earliest day); only the
    reported deviation magnitude converts to dollars at the end. One
    corpus aggregate to the ≤ ~366-row day grid; the cumulative window
    runs on the grid (the bounded-window class)."""
    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))).alias("d"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").alias("y"))
    )
    wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = daily.select(
        "d",
        F.sum("y").over(wcum).alias("cum"),
        F.row_number().over(Window.orderBy("d")).alias("t"),
    )
    tot = daily.groupBy().agg(
        F.sum("y").alias("total"), F.count(F.lit(1)).alias("n")
    )
    dev = cum.crossJoin(F.broadcast(tot)).select(
        "d",
        "n",
        (F.col("n") * F.col("cum") - F.col("t") * F.col("total")).alias("dd"),
    )
    top = dev.orderBy(F.abs(F.col("dd")).desc(), F.col("d").asc()).limit(1)
    return top.select(
        F.col("d").alias("cp_day"),
        pround(
            F.expr("abs(CAST(dd AS DOUBLE)) / CAST(n AS DOUBLE) / 100.0"), 4
        ).alias("max_dev_usd_r"),
    )


_CUSUM_SQL = f"""
WITH daily AS (
    SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1
), cum AS (
    SELECT d,
           sum(y) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           row_number() OVER (ORDER BY d) AS t
    FROM daily
), tot AS (
    SELECT CAST(sum(y) AS BIGINT) AS total, count(*) AS n FROM daily
), dev AS (
    SELECT d, n, CAST(n * cum - t * total AS BIGINT) AS dd
    FROM cum, tot
)
SELECT d AS cp_day,
       {pround_sql('abs(CAST(dd AS DOUBLE)) / CAST(n AS DOUBLE) / 100.0', 4)}
           AS max_dev_usd_r
FROM dev
ORDER BY abs(dd) DESC, d ASC
LIMIT 1
"""


# --------------------------------------------------------------------------
# Two-segment regression elbow (breakpoint search over prefix moments)
# --------------------------------------------------------------------------


def _sse(m: str, cx: str, cy: str, cx2: str, cy2: str, cxy: str) -> str:
    """OLS residual SSE of a segment from its raw moments — one shared
    double tree: SSE = Syy − Sxy²/Sxx with centered moments formed from
    the raw prefix sums."""
    syy = (
        f"(CAST({cy2} AS DOUBLE)"
        f" - CAST({cy} AS DOUBLE) * CAST({cy} AS DOUBLE) / CAST({m} AS DOUBLE))"
    )
    sxy = (
        f"(CAST({cxy} AS DOUBLE)"
        f" - CAST({cx} AS DOUBLE) * CAST({cy} AS DOUBLE) / CAST({m} AS DOUBLE))"
    )
    sxx = (
        f"(CAST({cx2} AS DOUBLE)"
        f" - CAST({cx} AS DOUBLE) * CAST({cx} AS DOUBLE) / CAST({m} AS DOUBLE))"
    )
    return f"({syy} - {sxy} * {sxy} / {sxx})"


_SSE2 = (
    _sse("t", "cx", "cy", "cx2", "cy2", "cxy")
    + " + "
    + _sse(
        "(n - t)",
        "(tx - cx)",
        "(ty - cy)",
        "(tx2 - cx2)",
        "(ty2 - cy2)",
        "(txy - cxy)",
    )
)
_SSE1 = _sse("n", "tx", "ty", "tx2", "ty2", "txy")


def q_segmented_regression_elbow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-segment least-squares breakpoint ("elbow") on the daily-revenue
    series: fit separate OLS lines to days 1..k and k+1..n for every
    candidate k and keep the k minimizing total SSE — the standard
    piecewise-linear structural-break screen (the discrete form of
    segmented regression / Chow-test scanning). Scale shape: ONE corpus
    aggregate to the day grid; prefix moments (Σt, Σt², Σy, Σy², Σty) come
    from cumulative windows OVER THE GRID (the bounded-window class) and
    stay exact BIGINTs; every candidate's two SSEs form in one shared
    double tree from prefix/suffix moment differences, and the argmin is a
    bounded TakeOrdered (ties → earliest k). Both segments need ≥ 2 points
    (2 ≤ k ≤ n−2). Identical doubles on both engines → identical argmin."""
    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))).alias("d"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").alias("y"))
    )
    wd = Window.orderBy("d")
    wcum = wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    idx = daily.select("d", "y", F.row_number().over(wd).alias("t"))
    cum = idx.select(
        "d",
        "t",
        F.sum("t").over(wcum).alias("cx"),
        F.sum(F.col("t") * F.col("t")).over(wcum).alias("cx2"),
        F.sum("y").over(wcum).alias("cy"),
        F.sum(F.col("y") * F.col("y")).over(wcum).alias("cy2"),
        F.sum(F.col("t") * F.col("y")).over(wcum).alias("cxy"),
    )
    tot = idx.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("tx"),
        F.sum(F.col("t") * F.col("t")).alias("tx2"),
        F.sum("y").alias("ty"),
        F.sum(F.col("y") * F.col("y")).alias("ty2"),
        F.sum(F.col("t") * F.col("y")).alias("txy"),
    )
    cand = cum.crossJoin(F.broadcast(tot)).filter(
        (F.col("t") >= 2) & (F.col("t") <= F.col("n") - 2)
    )
    scored = cand.select(
        "d", "t", "n", F.expr(_SSE2).alias("sse2"), F.expr(_SSE1).alias("sse1")
    )
    top = scored.orderBy(F.col("sse2").asc(), F.col("t").asc()).limit(1)
    return top.select(
        F.col("d").alias("split_day"),
        F.col("n").alias("n_days"),
        pround(F.expr("sse2 / sse1"), 6).alias("sse_ratio_r"),
    )


def _elbow_sql() -> str:
    return f"""
WITH daily AS (
    SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1
), idx AS (
    SELECT d, y, row_number() OVER (ORDER BY d) AS t FROM daily
), cum AS (
    SELECT d, t,
           CAST(sum(t) OVER w AS BIGINT) AS cx,
           CAST(sum(t * t) OVER w AS BIGINT) AS cx2,
           CAST(sum(y) OVER w AS BIGINT) AS cy,
           CAST(sum(y * y) OVER w AS BIGINT) AS cy2,
           CAST(sum(t * y) OVER w AS BIGINT) AS cxy
    FROM idx
    WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), tot AS (
    SELECT count(*) AS n, CAST(sum(t) AS BIGINT) AS tx,
           CAST(sum(t * t) AS BIGINT) AS tx2, CAST(sum(y) AS BIGINT) AS ty,
           CAST(sum(y * y) AS BIGINT) AS ty2, CAST(sum(t * y) AS BIGINT) AS txy
    FROM idx
), scored AS (
    SELECT d, t, n, {_SSE2} AS sse2, {_SSE1} AS sse1
    FROM cum, tot
    WHERE t >= 2 AND t <= n - 2
)
SELECT d AS split_day, n AS n_days,
       {pround_sql('sse2 / sse1', 6)} AS sse_ratio_r
FROM scored
ORDER BY sse2 ASC, t ASC
LIMIT 1
"""




SPECS.extend(
    [
        QuerySpec(
            "mann_kendall_z",
            q_mann_kendall_z,
            _mann_kendall_z_sql(),
            ("stats", "timeseries"),
            doc="Tie-corrected Mann-Kendall variance + continuity-corrected z "
            "and p - the normalization the roundseven kernel left open",
        ),
        QuerySpec(
            "changepoint_cusum_mean",
            q_changepoint_cusum_mean,
            _CUSUM_SQL,
            ("stats", "timeseries"),
            doc="CUSUM mean-shift changepoint on the day grid; integer-exact "
            "n*cum - t*total deviation argmax",
        ),
        QuerySpec(
            "segmented_regression_elbow",
            q_segmented_regression_elbow,
            _elbow_sql(),
            ("stats", "timeseries"),
            doc="Two-segment OLS breakpoint by total-SSE argmin over day-grid "
            "prefix moments; bounded windows, shared-tree SSEs",
        ),
    ]
)


# --------------------------------------------------------------------------
# PACF via Durbin-Levinson (bounded day grid, order-pinned folds)
# --------------------------------------------------------------------------

_PACF_LAGS = 4


def _dl_pacf_exprs() -> dict[int, str]:
    """Durbin-Levinson recursion unrolled to ``_PACF_LAGS`` as SQL text
    over columns r1..r4 — the SAME strings run on Spark and DuckDB, so
    the doubles agree bit for bit (shared-tree discipline)."""
    phi: dict[tuple[int, int], str] = {(1, 1): "r1"}
    for k in range(2, _PACF_LAGS + 1):
        num = f"(r{k} - (" + " + ".join(
            f"({phi[(k - 1, j)]}) * r{k - j}" for j in range(1, k)
        ) + "))"
        den = "(1.0 - (" + " + ".join(
            f"({phi[(k - 1, j)]}) * r{j}" for j in range(1, k)
        ) + "))"
        phi[(k, k)] = f"({num} / {den})"
        for j in range(1, k):
            phi[(k, j)] = f"(({phi[(k - 1, j)]}) - ({phi[(k, k)]}) * ({phi[(k - 1, k - j)]}))"
    return {k: phi[(k, k)] for k in range(1, _PACF_LAGS + 1)}


def q_pacf_durbin_levinson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of the daily revenue series to lag 4 via
    the Durbin-Levinson recursion — the AR-order diagnostic next to the
    plain ACF (``acf_by_user``): pacf_k is the lag-k correlation AFTER
    removing the shorter-lag structure, the standard Box-Jenkins model-ID
    readout. The series is the calendar-bounded day grid (≤ ~366 rows;
    lags are positional on the day-ordered series); the ACF estimator
    r_k = Σ(x_t−x̄)(x_{t−k}−x̄)/Σ(x_t−x̄)² runs as ORDER-PINNED folds over
    the sorted array (the fourier discipline) and the recursion itself is
    pure scalar arithmetic on the 1-row frame, generated ONCE as SQL text
    shared verbatim by both engines. One data-sized day aggregate."""
    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))).alias("d"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").cast("double").alias("y"))
    )
    rows = daily.agg(
        F.expr("transform(array_sort(collect_list(struct(d, y))), r -> r.y)").alias(
            "ys"
        )
    )
    mean = (
        "(aggregate(ys, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        " / CAST(size(ys) AS DOUBLE))"
    )
    scalars = rows.select("ys", F.expr(mean).alias("m")).select(
        F.expr("size(ys)").cast("int").alias("n_days"),
        F.expr(
            "aggregate(ys, CAST(0.0 AS DOUBLE),"
            " (acc, v) -> acc + (v - m) * (v - m))"
        ).alias("d0"),
        *[
            F.expr(
                f"aggregate(sequence({k} + 1, size(ys)), CAST(0.0 AS DOUBLE),"
                f" (acc, i) -> acc + (element_at(ys, i) - m)"
                f" * (element_at(ys, i - {k}) - m))"
            ).alias(f"c{k}")
            for k in range(1, _PACF_LAGS + 1)
        ],
    )
    acf = scalars.select(
        "n_days",
        *[(F.col(f"c{k}") / F.col("d0")).alias(f"r{k}") for k in range(1, _PACF_LAGS + 1)],
    )
    dl = _dl_pacf_exprs()
    return acf.select(
        "n_days",
        *[pround(F.expr(dl[k]), 6).alias(f"pacf{k}_r") for k in range(1, _PACF_LAGS + 1)],
    )


def _pacf_sql() -> str:
    dl = _dl_pacf_exprs()
    prods = ",\n           ".join(
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        f" list_transform(range({k} + 1, n + 1),"
        f" i -> (ys[i] - m) * (ys[i - {k}] - m))), (acc, v) -> acc + v) AS c{k}"
        for k in range(1, _PACF_LAGS + 1)
    )
    pacs = ",\n       ".join(
        f"{pround_sql(dl[k], 6)} AS pacf{k}_r" for k in range(1, _PACF_LAGS + 1)
    )
    rs = ", ".join(f"c{k} / d0 AS r{k}" for k in range(1, _PACF_LAGS + 1))
    return f"""
WITH daily AS (
    SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) AS y
    FROM events GROUP BY 1
), arrs AS (
    SELECT CAST(count(*) AS INT) AS n, list(y ORDER BY d) AS ys FROM daily
), withm AS (
    SELECT n, ys,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ys), (acc, v) -> acc + v)
               / CAST(n AS DOUBLE) AS m
    FROM arrs
), scalars AS (
    SELECT n AS n_days,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(ys, v -> (v - m) * (v - m))), (acc, v) -> acc + v) AS d0,
           {prods}
    FROM withm
), acf AS (
    SELECT n_days, {rs} FROM scalars
)
SELECT n_days,
       {pacs}
FROM acf
"""




SPECS.append(
    QuerySpec(
        "pacf_durbin_levinson",
        q_pacf_durbin_levinson,
        _pacf_sql(),
        ("stats", "timeseries"),
        doc="PACF to lag 4 via Durbin-Levinson on the calendar-bounded day "
        "grid; order-pinned ACF folds, shared-tree recursion",
    )
)
