"""Survival / time-to-event analytics: proportional-hazards fitting and
cumulative-hazard estimation over duration grids (the module pairs with
``learning.kaplan_meier_retention`` and ``corpus_lm``'s logrank twin in
the registry's survival family).

Consolidated from the round-10 build modules (round 11, VERDICT r10
item 6) — specs, oracles, and hashes unchanged; each spec keeps its
original design docstring. Scale shape: subjects collapse to a bounded
(duration, arm) grid in ONE corpus aggregate; risk sets are
reverse-cumulative windows over that grid; Newton steps are tiny grid
aggregates — never per-subject iteration.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_data_infrastructure_spark.functions.hashing import hash64, hash64_sql
from projet_data_infrastructure_spark.plans._portable import pround, pround_sql
from projet_data_infrastructure_spark.plans.stats_inference import _q6
from projet_data_infrastructure_spark.plans.registry import QuerySpec
from projet_data_infrastructure_spark.sources.readers import read_table

SPECS: list[QuerySpec] = []

# --------------------------------------------------------------------------
# Cox proportional hazards (binary arm, Breslow ties, 3 Newton steps)
# --------------------------------------------------------------------------
#
# Time-to-convert survival model: subjects are users with a first view,
# the event is the first later purchase, censoring at the corpus horizon
# (max event date), arm x = hash64(user_id) % 2 — the same deterministic
# split ab_srm_guard audits. With a binary covariate the Breslow partial
# likelihood needs only (d0, d1, n0, n1) per event day: the subject frame
# collapses to the (duration, arm) grid in one aggregate, risk sets come
# from a bounded grid-x-grid non-equi join (dur >= tau — covering taus
# where an arm has no cell of its own), and each Newton step is a
# <= 366-row aggregate of micro-quantized score/info terms (the IRLS
# discipline above).

_COX_U = _q6(
    "CAST(d1 AS DOUBLE) - CAST(d0 + d1 AS DOUBLE) * CAST(n1 AS DOUBLE) * exp(b)"
    " / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE) * exp(b))"
)
_COX_I = _q6(
    "CAST(d0 + d1 AS DOUBLE) * CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) * exp(b)"
    " / ((CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE) * exp(b))"
    " * (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE) * exp(b)))"
)
_COX_STEPS = 3


def q_cox_ph_binary_newton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox PH hazard ratio between the two hash arms for time-to-purchase
    (module comment): one user-level aggregate, one (duration, arm) grid,
    risk sets from the bounded dur >= tau grid join, three unrolled Newton
    steps on the event-day grid. Output: subjects, events, beta, hazard
    ratio."""
    from projet_data_infrastructure_spark.functions.hashing import hash64

    ev = read_table(spark, sf_dir, "events")
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fv"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    conv = (
        fv.join(
            purch,
            (F.col("user_id") == F.col("pu")) & (F.col("pts") >= F.col("fv")),
            "left",
        )
        .groupBy("user_id", "fv")
        .agg(F.min("pts").alias("p"))
    )
    horizon = ev.groupBy().agg(F.max(F.to_date("ts")).alias("hz"))
    subj = conv.crossJoin(F.broadcast(horizon)).select(
        (hash64(F.col("user_id")) % 2).cast("int").alias("x"),
        F.datediff(
            F.coalesce(F.to_date("p"), F.col("hz")), F.to_date("fv")
        ).alias("dur"),
        F.col("p").isNotNull().cast("long").alias("ev"),
    )
    cells = subj.groupBy("dur", "x").agg(
        F.count(F.lit(1)).alias("c"), F.sum("ev").alias("de")
    )
    # Event-day grid and risk sets. The risk count n_x(tau) must cover
    # every subject with dur >= tau even when arm x has no cell at tau
    # itself, so it is a bounded non-equi join of the <= 366-row event-day
    # grid against the duration cells (grid x grid, never subjects).
    taudays = (
        cells.groupBy("dur")
        .agg(
            F.sum(F.when(F.col("x") == 0, F.col("de")).otherwise(0)).alias("d0"),
            F.sum(F.when(F.col("x") == 1, F.col("de")).otherwise(0)).alias("d1"),
        )
        .filter(F.col("d0") + F.col("d1") > 0)
        .select(F.col("dur").alias("tau"), "d0", "d1")
    )
    tau = (
        taudays.join(F.broadcast(cells), F.col("dur") >= F.col("tau"))
        .groupBy("tau", "d0", "d1")
        .agg(
            F.sum(F.when(F.col("x") == 0, F.col("c")).otherwise(0)).alias("n0"),
            F.sum(F.when(F.col("x") == 1, F.col("c")).otherwise(0)).alias("n1"),
        )
    )
    b = spark.range(1).select(F.lit(0.0).alias("b"))
    for _ in range(_COX_STEPS):
        sums = (
            tau.crossJoin(F.broadcast(b))
            .groupBy("b")
            .agg(
                F.sum(F.expr(_COX_U)).alias("u"),
                F.sum(F.expr(_COX_I)).alias("i"),
            )
        )
        b = sums.select(
            F.expr("b + CAST(u AS DOUBLE) / CAST(i AS DOUBLE)").alias("b")
        )
    stats = subj.groupBy().agg(
        F.count(F.lit(1)).alias("n_subj"), F.sum("ev").alias("n_events")
    )
    return stats.crossJoin(F.broadcast(b)).select(
        "n_subj",
        "n_events",
        pround(F.col("b"), 6).alias("beta_r"),
        pround(F.expr("exp(b)"), 6).alias("hr_r"),
    )


def _cox_sql() -> str:
    from projet_data_infrastructure_spark.functions.hashing import hash64_sql

    h = hash64_sql("user_id")
    steps = []
    for i in range(_COX_STEPS):
        steps.append(
            f""", s{i} AS (
    SELECT b, CAST(sum({_COX_U}) AS BIGINT) AS u,
           CAST(sum({_COX_I}) AS BIGINT) AS i
    FROM tau, bt{i} GROUP BY b
), bt{i + 1} AS (
    SELECT b + CAST(u AS DOUBLE) / CAST(i AS DOUBLE) AS b FROM s{i}
)"""
        )
    return f"""
WITH fv AS (
    SELECT user_id, min(ts) AS fv FROM events
    WHERE event_type = 'view' GROUP BY user_id
), conv AS (
    SELECT f.user_id, f.fv, min(e.ts) AS p
    FROM fv f LEFT JOIN events e
      ON e.user_id = f.user_id AND e.event_type = 'purchase' AND e.ts >= f.fv
    GROUP BY f.user_id, f.fv
), horizon AS (
    SELECT max(CAST(ts AS DATE)) AS hz FROM events
), subj AS (
    SELECT CAST({h} % 2 AS INT) AS x,
           datediff('day', CAST(fv AS DATE),
                    CAST(coalesce(CAST(p AS DATE), hz) AS DATE)) AS dur,
           CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END AS ev
    FROM conv, horizon
), cells AS (
    SELECT dur, x, CAST(count(*) AS BIGINT) AS c,
           CAST(sum(ev) AS BIGINT) AS de
    FROM subj GROUP BY dur, x
), taudays AS (
    SELECT dur AS tau,
           CAST(sum(CASE WHEN x = 0 THEN de ELSE 0 END) AS BIGINT) AS d0,
           CAST(sum(CASE WHEN x = 1 THEN de ELSE 0 END) AS BIGINT) AS d1
    FROM cells GROUP BY dur
    HAVING sum(de) > 0
), tau AS (
    SELECT tau, d0, d1,
           CAST(sum(CASE WHEN x = 0 THEN c ELSE 0 END) AS BIGINT) AS n0,
           CAST(sum(CASE WHEN x = 1 THEN c ELSE 0 END) AS BIGINT) AS n1
    FROM taudays JOIN cells ON dur >= tau
    GROUP BY tau, d0, d1
), bt0 AS (SELECT 0.0 AS b){''.join(steps)}, stats AS (
    SELECT CAST(count(*) AS BIGINT) AS n_subj,
           CAST(sum(ev) AS BIGINT) AS n_events
    FROM subj
)
SELECT n_subj, n_events, {pround_sql('b', 6)} AS beta_r,
       {pround_sql('exp(b)', 6)} AS hr_r
FROM stats, bt{_COX_STEPS}
"""


# --------------------------------------------------------------------------
# Nelson–Aalen cumulative hazard (the KM/logrank family's hazard analog)
# --------------------------------------------------------------------------


def q_nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimate for time-to-purchase:
    H(t) = sum_{tau <= t} d_tau / n_tau over the event-day grid — the
    hazard-scale companion to `kaplan_meier_retention` and the base curve
    under `cox_ph_binary_newton`. Subjects collapse to the duration grid
    once; risk sets are a reverse cumulative on that calendar-bounded
    grid (every event day IS a duration row, so no missing-cell hazard);
    each d/n term is nano-quantized before the bounded cumulative sum."""
    ev = read_table(spark, sf_dir, "events")
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fv"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    conv = (
        fv.join(
            purch,
            (F.col("user_id") == F.col("pu")) & (F.col("pts") >= F.col("fv")),
            "left",
        )
        .groupBy("user_id", "fv")
        .agg(F.min("pts").alias("p"))
    )
    horizon = ev.groupBy().agg(F.max(F.to_date("ts")).alias("hz"))
    subj = conv.crossJoin(F.broadcast(horizon)).select(
        F.datediff(
            F.coalesce(F.to_date("p"), F.col("hz")), F.to_date("fv")
        ).alias("dur"),
        F.col("p").isNotNull().cast("long").alias("ev"),
    )
    cells = subj.groupBy("dur").agg(
        F.count(F.lit(1)).alias("c"), F.sum("ev").alias("d")
    )
    wrev = Window.orderBy(F.col("dur").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = cells.withColumn("n_risk", F.sum("c").over(wrev))
    terms = risk.filter(F.col("d") > 0).withColumn(
        "t_nano",
        F.expr(
            "CAST(floor(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)"
            " * 1000000000.0 + 0.5) AS BIGINT)"
        ),
    )
    wcum = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = terms.withColumn("h_nano", F.sum("t_nano").over(wcum))
    return out.select(
        "dur",
        "d",
        "n_risk",
        pround(F.expr("CAST(h_nano AS DOUBLE) / 1000000000.0"), 6).alias(
            "na_hazard_r"
        ),
    )


_NA_SQL = f"""
WITH fv AS (
    SELECT user_id, min(ts) AS fv FROM events
    WHERE event_type = 'view' GROUP BY user_id
), conv AS (
    SELECT f.user_id, f.fv, min(e.ts) AS p
    FROM fv f LEFT JOIN events e
      ON e.user_id = f.user_id AND e.event_type = 'purchase' AND e.ts >= f.fv
    GROUP BY f.user_id, f.fv
), horizon AS (
    SELECT max(CAST(ts AS DATE)) AS hz FROM events
), subj AS (
    SELECT datediff('day', CAST(fv AS DATE),
                    CAST(coalesce(CAST(p AS DATE), hz) AS DATE)) AS dur,
           CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END AS ev
    FROM conv, horizon
), cells AS (
    SELECT dur, CAST(count(*) AS BIGINT) AS c, CAST(sum(ev) AS BIGINT) AS d
    FROM subj GROUP BY dur
), risk AS (
    SELECT dur, d,
           CAST(sum(c) OVER (ORDER BY dur DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS n_risk
    FROM cells
), terms AS (
    SELECT dur, d, n_risk,
           CAST(floor(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)
               * 1000000000.0 + 0.5) AS BIGINT) AS t_nano
    FROM risk WHERE d > 0
), cum AS (
    SELECT dur, d, n_risk,
           CAST(sum(t_nano) OVER (ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS h_nano
    FROM terms
)
SELECT dur, d, n_risk,
       {pround_sql('CAST(h_nano AS DOUBLE) / 1000000000.0', 6)} AS na_hazard_r
FROM cum
"""




SPECS.extend(
    [
        QuerySpec(
            "cox_ph_binary_newton",
            q_cox_ph_binary_newton,
            _cox_sql(),
            ("stats", "learning", "timeseries", "bench"),
            doc="Cox PH hazard ratio between hash arms for time-to-purchase; "
            "Breslow ties, bounded-grid risk sets, 3 Newton steps",
        ),
        QuerySpec(
            "nelson_aalen_hazard",
            q_nelson_aalen_hazard,
            _NA_SQL,
            ("stats", "timeseries"),
            doc="Nelson-Aalen cumulative hazard for time-to-purchase; "
            "reverse-cumulative risk sets, nano-quantized d/n terms",
        ),
    ]
)


# --------------------------------------------------------------------------
# Log-rank test (two-arm survival comparison, Kaplan-Meier's companion)
# --------------------------------------------------------------------------


def q_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-arm log-rank test (Mantel 1966) over the SAME survival framing
    as ``kaplan_meier_retention`` (event = first purchase, right-censored
    at last activity), arms = the deterministic hash coin every causal
    spec uses. Per pooled death time t: observed arm-1 deaths d1t vs
    expected E1t = dt·n1t/nt and hypergeometric variance
    V1t = dt·n1t·n2t·(nt−dt) / (nt²·(nt−1)); Z = Σ(d1t−E1t)/√ΣVt.

    Determinism: every per-time term derives from exact integer risk-set
    counts; the two Σs run as order-pinned folds over the array_sort-ed
    day frame (the fourier/cuped discipline) so both engines execute the
    identical IEEE sum order; Z forms in the shared double tree, pround 6.
    Scale shape: ONE per-user aggregate is the only corpus shuffle; the
    day grid (calendar-bounded) carries everything else."""
    from projet_data_infrastructure_spark.functions.hashing import hash64

    ev = read_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    pu = ev.groupBy("user_id").agg(
        F.min("ts").alias("f"),
        F.max("ts").alias("l"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("p"),
    )
    d = pu.select(
        F.pmod(hash64(F.col("user_id")), F.lit(2)).cast("int").alias("arm"),
        F.when(F.col("p").isNotNull(), F.datediff(F.to_date("p"), F.to_date("f")))
        .otherwise(F.datediff(F.to_date("l"), F.to_date("f")))
        .alias("dur_days"),
        F.col("p").isNotNull().cast("long").alias("obs"),
    )
    day = d.groupBy("dur_days").agg(
        F.sum(F.when(F.col("arm") == 1, F.col("obs")).otherwise(0)).alias("d1"),
        F.sum("obs").alias("dt"),
        F.sum((F.col("arm") == 1).cast("long")).alias("r1"),
        F.count(F.lit(1)).alias("rt"),
    )
    w_desc = Window.orderBy(F.desc("dur_days")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = (
        day.withColumn("n1", F.sum("r1").over(w_desc).cast("long"))
        .withColumn("nt", F.sum("rt").over(w_desc).cast("long"))
        .filter((F.col("dt") > 0) & (F.col("nt") > 1))
        .select("dur_days", "d1", "dt", "n1", "nt")
    )
    folded = risk.groupBy().agg(
        F.expr("array_sort(collect_list(struct(dur_days, d1, dt, n1, nt)))").alias(
            "arr"
        )
    )
    num = (
        "aggregate(arr, CAST(0.0 AS DOUBLE), (acc, r) -> acc"
        " + (CAST(r.d1 AS DOUBLE)"
        "    - CAST(r.dt AS DOUBLE) * CAST(r.n1 AS DOUBLE) / CAST(r.nt AS DOUBLE)))"
    )
    var = (
        "aggregate(arr, CAST(0.0 AS DOUBLE), (acc, r) -> acc"
        " + (CAST(r.dt AS DOUBLE) * CAST(r.n1 AS DOUBLE)"
        "    * (CAST(r.nt AS DOUBLE) - CAST(r.n1 AS DOUBLE))"
        "    * (CAST(r.nt AS DOUBLE) - CAST(r.dt AS DOUBLE)))"
        " / (CAST(r.nt AS DOUBLE) * CAST(r.nt AS DOUBLE)"
        "    * (CAST(r.nt AS DOUBLE) - 1.0)))"
    )
    return folded.select(
        F.expr("size(arr)").cast("long").alias("n_times"),
        pround(F.expr(num), 6).alias("obs_minus_exp_r"),
        pround(F.expr(var), 6).alias("var_r"),
        pround(F.expr(f"({num}) / sqrt({var})"), 6).alias("z_r"),
    )


_LOGRANK_SQL = f"""
WITH pu AS (
    SELECT user_id, min(ts) AS f, max(ts) AS l,
           min(CASE WHEN event_type = 'purchase' THEN ts END) AS p
    FROM events GROUP BY user_id
), d AS (
    SELECT CAST({hash64_sql('user_id')} % 2 AS INT) AS arm,
           CASE WHEN p IS NOT NULL
                THEN date_diff('day', CAST(f AS DATE), CAST(p AS DATE))
                ELSE date_diff('day', CAST(f AS DATE), CAST(l AS DATE)) END
               AS dur_days,
           CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END AS obs
    FROM pu
), day AS (
    SELECT dur_days,
           CAST(sum(CASE WHEN arm = 1 THEN obs ELSE 0 END) AS BIGINT) AS d1,
           CAST(sum(obs) AS BIGINT) AS dt,
           CAST(sum(CAST(arm = 1 AS INT)) AS BIGINT) AS r1,
           count(*) AS rt
    FROM d GROUP BY dur_days
), risk AS (
    SELECT dur_days, d1, dt,
           CAST(sum(r1) OVER (ORDER BY dur_days DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n1,
           CAST(sum(rt) OVER (ORDER BY dur_days DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS nt
    FROM day
), rows_ AS (
    SELECT dur_days, d1, dt, n1, nt FROM risk WHERE dt > 0 AND nt > 1
), folded AS (
    SELECT list_sort(list(struct_pack(dur_days := dur_days, d1 := d1, dt := dt,
                                      n1 := n1, nt := nt))) AS arr
    FROM rows_
), sums AS (
    SELECT len(arr) AS n_times,
           list_reduce(list_transform(arr, r ->
               CAST(r.d1 AS DOUBLE)
               - CAST(r.dt AS DOUBLE) * CAST(r.n1 AS DOUBLE) / CAST(r.nt AS DOUBLE)),
               (a, b) -> a + b) AS num,
           list_reduce(list_transform(arr, r ->
               (CAST(r.dt AS DOUBLE) * CAST(r.n1 AS DOUBLE)
                * (CAST(r.nt AS DOUBLE) - CAST(r.n1 AS DOUBLE))
                * (CAST(r.nt AS DOUBLE) - CAST(r.dt AS DOUBLE)))
               / (CAST(r.nt AS DOUBLE) * CAST(r.nt AS DOUBLE)
                  * (CAST(r.nt AS DOUBLE) - 1.0))),
               (a, b) -> a + b) AS var
    FROM folded
)
SELECT CAST(n_times AS BIGINT) AS n_times,
       {pround_sql('num', 6)} AS obs_minus_exp_r,
       {pround_sql('var', 6)} AS var_r,
       {pround_sql('num / sqrt(var)', 6)} AS z_r
FROM sums
"""



SPECS.append(
    QuerySpec(
        "logrank_test",
        q_logrank_test,
        _LOGRANK_SQL,
        ("stats", "survival"),
        doc="Two-arm Mantel log-rank test over the KM survival framing: "
        "integer risk sets, order-pinned folds, shared-tree Z",
    )
)
