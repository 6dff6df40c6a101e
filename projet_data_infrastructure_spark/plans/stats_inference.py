"""Classical and rank-based statistical inference over the warehouse
tables: independence and location/scale/trend tests, experiment guards,
effect and inequality measures, robust estimators, and model fits whose
moments reduce to bounded-grid aggregates.

Consolidated from the round-7..round-10 build modules (round 11, VERDICT
r10 item 6) — specs, oracles, and hashes unchanged; each spec keeps its
original design docstring. House disciplines shared across this module:
exact BIGINT/DECIMAL(38,0) moment sums from one corpus aggregate;
fractional per-cell terms quantized to integer micro/nano units through
the wide cast-quantizer BEFORE any multi-term sum (order-insensitive in
both engines; ties shifted off the .5 boundary); test statistics and
Zelen-Severo p-values evaluated from expression text shared verbatim with
the DuckDB oracle so the IEEE double trees match bit-for-bit; every rank
computed on a value-bounded grid via ``operators/ranks.py`` — never a
corpus-sized sort.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_data_infrastructure_spark.functions.hashing import hash64, hash64_sql
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
# Pearson chi-square independence (bounded mode x flag grid)
# --------------------------------------------------------------------------


def q_chisq_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between o_orderpriority and
    o_orderstatus — the categorical-association TEST next to the Cramér's V
    effect size (``cramers_v``): one corpus aggregate to the ≤ 5×3 observed
    grid, marginals by two bounded re-aggregations, expected counts
    e = row·col/n, X² = Σ (o−e)²/e.

    Portability: the per-cell double terms are quantized to integer
    MICRO-UNITS (floor(term·1e6 + 0.5), the integer micro-unit discipline)
    before summing, so the 15-term sum is an exact BIGINT — order-
    insensitive in both engines, no float-accumulation-order hazard. df is
    derived from the OBSERVED grid dimensions, not hardcoded."""
    li = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("mode"), F.col("o_orderstatus").alias("flag")
    )
    cells = li.groupBy("mode", "flag").agg(F.count(F.lit(1)).alias("o"))
    rows = cells.groupBy("mode").agg(F.sum("o").alias("rt"))
    cols = cells.groupBy("flag").agg(F.sum("o").alias("ct"))
    tot = cells.groupBy().agg(
        F.sum("o").alias("n"),
        F.countDistinct("mode").alias("nr"),
        F.countDistinct("flag").alias("nc"),
    )
    term = (
        "(CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)"
        " / CAST(n AS DOUBLE))"
    )
    e = "(CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))"
    micro = f"CAST(floor(({term}) * ({term}) / ({e}) * 1000000.0 + 0.5) AS BIGINT)"
    joined = (
        cells.join(F.broadcast(rows), "mode")
        .join(F.broadcast(cols), "flag")
        .crossJoin(F.broadcast(tot))
    )
    agg = joined.groupBy("n", "nr", "nc").agg(
        F.sum(F.expr(micro)).alias("chi2_micro")
    )
    return agg.select(
        "n",
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("int").alias("df"),
        pround(
            F.expr("CAST(chi2_micro AS DOUBLE) / 1000000.0"), 4
        ).alias("chi2_r"),
    )


def _chisq_sql() -> str:
    term = (
        "(CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)"
        " / CAST(n AS DOUBLE))"
    )
    e = "(CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))"
    micro = f"CAST(floor(({term}) * ({term}) / ({e}) * 1000000.0 + 0.5) AS BIGINT)"
    return f"""
WITH cells AS (
    SELECT o_orderpriority AS mode, o_orderstatus AS flag, count(*) AS o
    FROM orders GROUP BY 1, 2
), rows_m AS (
    SELECT mode, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY mode
), cols_m AS (
    SELECT flag, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY flag
), tot AS (
    SELECT CAST(sum(o) AS BIGINT) AS n,
           CAST(count(DISTINCT mode) AS BIGINT) AS nr,
           CAST(count(DISTINCT flag) AS BIGINT) AS nc
    FROM cells
), agg AS (
    SELECT n, nr, nc, CAST(sum({micro}) AS BIGINT) AS chi2_micro
    FROM cells JOIN rows_m USING (mode) JOIN cols_m USING (flag), tot
    GROUP BY n, nr, nc
)
SELECT n, CAST((nr - 1) * (nc - 1) AS INT) AS df,
       {pround_sql('CAST(chi2_micro AS DOUBLE) / 1000000.0', 4)} AS chi2_r
FROM agg
"""


# --------------------------------------------------------------------------
# Sample-ratio-mismatch guard (binomial z against the declared split)
# --------------------------------------------------------------------------


def q_ab_srm_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio mismatch guard — the sanity check every experimentation
    platform runs BEFORE reading an A/B readout (Fabijan et al. 2019): are
    the arm sizes consistent with the declared 50/50 split? Binomial
    z = (n1 − n0)/√n with the Zelen-Severo two-sided p
    (``functions/stats.py``) and the conventional p < 0.001 alarm. The
    hash split itself is the house deterministic assignment, so at the
    tested SFs the guard PASSES — the spec pins the passing readout. One
    corpus aggregate; all math on the 1-row frame."""
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    arms = ev.select(
        F.pmod(hash64(F.col("event_id")), F.lit(2)).cast("int").alias("arm")
    )
    agg = arms.groupBy().agg(
        F.sum((F.col("arm") == 0).cast("long")).alias("n0"),
        F.sum((F.col("arm") == 1).cast("long")).alias("n1"),
    )
    z = (
        "(CAST(n1 AS DOUBLE) - CAST(n0 AS DOUBLE))"
        " / sqrt(CAST(n0 + n1 AS DOUBLE))"
    )
    p = two_sided_p_sql(z)
    return agg.select(
        "n0",
        "n1",
        pround(F.expr(z), 6).alias("z_r"),
        pround(F.expr(p), 8).alias("p_r"),
        F.expr(f"CAST({p} < 0.001 AS INT)").alias("srm_flag"),
    )


def _srm_sql() -> str:
    z = (
        "(CAST(n1 AS DOUBLE) - CAST(n0 AS DOUBLE))"
        " / sqrt(CAST(n0 + n1 AS DOUBLE))"
    )
    p = two_sided_p_sql(z)
    return f"""
WITH arms AS (
    SELECT CAST({hash64_sql('event_id')} % 2 AS INT) AS arm
    FROM events WHERE event_type = 'purchase'
), agg AS (
    SELECT CAST(sum(CAST(arm = 0 AS INT)) AS BIGINT) AS n0,
           CAST(sum(CAST(arm = 1 AS INT)) AS BIGINT) AS n1
    FROM arms
)
SELECT n0, n1,
       {pround_sql(z, 6)} AS z_r,
       {pround_sql(p, 8)} AS p_r,
       CAST({p} < 0.001 AS INT) AS srm_flag
FROM agg
"""


# --------------------------------------------------------------------------
# Per-nation Gini coefficient (Lorenz order statistic, exact integers)
# --------------------------------------------------------------------------


def q_gini_lorenz_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Gini coefficient of customer account balances — the
    inequality readout a data-curation pipeline runs on contributor/spend
    distributions. Order-statistic form on the Lorenz ranking:
    G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) with x sorted ascending. Ranks
    come from a NATION-KEYED window (25 parallel groups — never a global
    sort); negative balances are excluded (Gini is defined on non-negative
    support); the numerator Σ i·x_cents is an exact BIGINT; tie order
    among equal balances breaks by c_custkey, which leaves G's VALUE
    unchanged (equal x commute in Σ i·xᵢ over a tie run... their rank sum
    is fixed) but pins determinism anyway. One corpus aggregate; one keyed
    window."""
    cust = read_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_custkey",
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    ).filter(F.col("cents") >= 0)
    w = Window.partitionBy("c_nationkey").orderBy("cents", "c_custkey")
    ranked = cust.withColumn("i", F.row_number().over(w))
    agg = ranked.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum("cents").alias("sx"),
        F.sum(F.col("i") * F.col("cents")).alias("six"),
    )
    g = (
        "(2.0 * CAST(six AS DOUBLE) - CAST(n_cust + 1 AS DOUBLE)"
        " * CAST(sx AS DOUBLE)) / (CAST(n_cust AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    return agg.select(
        F.col("c_nationkey").cast("int").alias("nationkey"),
        "n_cust",
        pround(F.expr(g), 6).alias("gini_r"),
    ).orderBy("nationkey")


_GINI_SQL = f"""
WITH cust AS (
    SELECT c_nationkey, c_custkey,
           CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
    FROM customer
    WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) >= 0
), ranked AS (
    SELECT c_nationkey, cents,
           row_number() OVER (PARTITION BY c_nationkey
                              ORDER BY cents, c_custkey) AS i
    FROM cust
), agg AS (
    SELECT c_nationkey, count(*) AS n_cust,
           CAST(sum(cents) AS BIGINT) AS sx,
           CAST(sum(i * cents) AS BIGINT) AS six
    FROM ranked GROUP BY c_nationkey
)
SELECT CAST(c_nationkey AS INT) AS nationkey, CAST(n_cust AS BIGINT) AS n_cust,
       {pround_sql('(2.0 * CAST(six AS DOUBLE) - CAST(n_cust + 1 AS DOUBLE) * CAST(sx AS DOUBLE)) / (CAST(n_cust AS DOUBLE) * CAST(sx AS DOUBLE))', 6)} AS gini_r
FROM agg
ORDER BY nationkey
"""


# --------------------------------------------------------------------------
# Grubbs outlier test (max studentized deviation, integer-exact argmax)
# --------------------------------------------------------------------------


def q_grubbs_outlier_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' test statistic on the daily-revenue series: the flagged day
    is argmax |y − ȳ| and G = max|y − ȳ|/s (Grubbs 1950) — the formal
    single-outlier screen next to the CUSUM changepoint. The ARGMAX is
    integer-exact (|n·y − total| per day, the ``changepoint_cusum_mean``
    scaling trick), so day selection never touches a float; only the
    reported G forms in one shared double tree (the Σy² moment stays
    BIGINT at tested SFs; total² would overflow int64 so the variance
    forms directly in doubles on both engines). One corpus aggregate; the
    argmax is a bounded TakeOrdered over the day grid."""
    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))).alias("d"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").alias("y"))
        .localCheckpoint(eager=True)  # calendar frame, consumed twice
    )
    tot = daily.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("total"),
        F.sum(F.col("y") * F.col("y")).alias("sy2"),
    )
    dev = daily.crossJoin(F.broadcast(tot)).select(
        "d",
        "n",
        "total",
        "sy2",
        (F.col("n") * F.col("y") - F.col("total")).alias("dd"),
    )
    top = dev.orderBy(F.abs(F.col("dd")).desc(), F.col("d").asc()).limit(1)
    s2 = (
        "((CAST(sy2 AS DOUBLE)"
        " - CAST(total AS DOUBLE) * CAST(total AS DOUBLE) / CAST(n AS DOUBLE))"
        " / CAST(n - 1 AS DOUBLE))"
    )
    g = f"(abs(CAST(dd AS DOUBLE)) / CAST(n AS DOUBLE)) / sqrt({s2})"
    return top.select(
        F.col("d").alias("outlier_day"),
        F.col("n").alias("n_days"),
        pround(F.expr(g), 6).alias("g_r"),
    )


def _grubbs_sql() -> str:
    s2 = (
        "((CAST(sy2 AS DOUBLE)"
        " - CAST(total AS DOUBLE) * CAST(total AS DOUBLE) / CAST(n AS DOUBLE))"
        " / CAST(n - 1 AS DOUBLE))"
    )
    g = f"(abs(CAST(dd AS DOUBLE)) / CAST(n AS DOUBLE)) / sqrt({s2})"
    return f"""
WITH daily AS (
    SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1
), tot AS (
    SELECT count(*) AS n, CAST(sum(y) AS BIGINT) AS total,
           CAST(sum(y * y) AS BIGINT) AS sy2
    FROM daily
), dev AS (
    SELECT d, n, total, sy2, CAST(n * y - total AS BIGINT) AS dd
    FROM daily, tot
)
SELECT d AS outlier_day, n AS n_days, {pround_sql(g, 6)} AS g_r
FROM dev
ORDER BY abs(dd) DESC, d ASC
LIMIT 1
"""




SPECS.extend(
    [
        QuerySpec(
            "chisq_priority_status",
            q_chisq_priority_status,
            _chisq_sql(),
            ("stats",),
            doc="Pearson chi-square independence on the bounded orderpriority x "
            "orderstatus grid; integer micro-unit term sums",
        ),
        QuerySpec(
            "ab_srm_guard",
            q_ab_srm_guard,
            _srm_sql(),
            ("stats",),
            doc="Sample-ratio-mismatch guard: binomial z vs the 50/50 split, "
            "Zelen-Severo p, p<0.001 alarm flag",
        ),
        QuerySpec(
            "gini_lorenz_by_nation",
            q_gini_lorenz_by_nation,
            _GINI_SQL,
            ("stats",),
            doc="Per-nation Gini of customer balances via the Lorenz order "
            "statistic; nation-keyed ranks, exact BIGINT numerators",
        ),
        QuerySpec(
            "grubbs_outlier_day",
            q_grubbs_outlier_day,
            _grubbs_sql(),
            ("stats", "timeseries"),
            doc="Grubbs max-studentized-deviation outlier day; integer-exact "
            "argmax via |n*y - total|, shared-tree G",
        ),
    ]
)
