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
from projet_data_infrastructure_spark.operators.ranks import (
    average_rank_table,
    two_rbar,
    value_grid_ranks,
)
from projet_data_infrastructure_spark.plans._portable import (
    fdiv as _fdiv,
    pround,
    pround_sql,
)
from projet_data_infrastructure_spark.plans.registry import QuerySpec
from projet_data_infrastructure_spark.session import default_parallelism
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


# --------------------------------------------------------------------------
# Mann-Whitney U rank-sum test (tie-corrected, value-bounded grid)
# --------------------------------------------------------------------------


def q_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Mann-Whitney U test (Mann & Whitney 1947) on purchase
    value between the deterministic hash arms — the rank-based robust
    complement to ``ab_test_z_score`` (immune to the heavy right tail a
    mean-based z-test is sensitive to).

    Determinism and scale come from the same trick: observations quantize
    to the WHOLE-DOLLAR grid (value domain ≤ ~500 distinct dollars — the
    equidepth/KS value-bounded-window discipline,
    ``operators/ranks.value_grid_ranks``), so ranks never need a
    corpus-sized sort. For dollar value v with cumulative count cum(v)
    and tie count t(v), every tied observation's average rank satisfies
    2·r̄(v) = 2·cum(v) − t(v) + 1 (exact integer), so the rank sum
    2·R₁ = Σ_v n₁(v)·(2·cum−t+1) is exact BIGINT. U₁ = R₁ − n₁(n₁+1)/2;
    the tie-corrected variance uses Σ(t³−t) (exact BIGINT at tested SFs;
    at 100 TB row counts promote the moment sums to DECIMAL(38,0) — the
    ``ols_two_feature_nation`` discipline). z forms in one shared double
    tree, pround 6 — both engines execute identical IEEE ops."""
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    obs = ev.select(
        F.floor("value").cast("long").alias("usd"),
        F.pmod(hash64(F.col("event_id")), F.lit(2)).cast("int").alias("arm"),
    )
    # Shared grid→cumulative-window→2·r̄ core (operators/ranks.py): every
    # term is an exact BIGINT, so the final sums are order-insensitive.
    ranked_grid = value_grid_ranks(
        obs, "usd", F.sum((F.col("arm") == 1).cast("long")).alias("n1v")
    )
    scalars = ranked_grid.groupBy().agg(
        F.sum("n1v").alias("n1"),
        F.sum("t").alias("n"),
        F.sum(F.col("n1v") * two_rbar()).alias("two_r1"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie3"),
    ).select(
        "n1",
        (F.col("n") - F.col("n1")).alias("n2"),
        "n",
        "two_r1",
        "tie3",
    )
    # Shared double tree (identical expression text on the oracle side).
    u1 = "(CAST(two_r1 AS DOUBLE) - CAST(n1 * (n1 + 1) AS DOUBLE)) / 2.0"
    mu = "CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0"
    var = (
        "CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0"
        " * (CAST(n + 1 AS DOUBLE)"
        "    - CAST(tie3 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))"
    )
    return scalars.select(
        "n1",
        "n2",
        pround(F.expr(u1), 4).alias("u1_r"),
        pround(F.expr(f"(({u1}) - ({mu})) / sqrt({var})"), 6).alias("z_r"),
    )


_MANN_WHITNEY_SQL = f"""
WITH obs AS (
    SELECT CAST(floor(value) AS BIGINT) AS usd,
           CAST({hash64_sql('event_id')} % 2 AS INT) AS arm
    FROM events WHERE event_type = 'purchase'
), grid AS (
    SELECT usd, count(*) AS t,
           CAST(sum(CAST(arm = 1 AS INT)) AS BIGINT) AS n1v
    FROM obs GROUP BY usd
), ranked_grid AS (
    SELECT usd, t, n1v,
           sum(t) OVER (ORDER BY usd
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM grid
), scalars0 AS (
    SELECT sum(n1v) AS n1, sum(t) AS n,
           sum(n1v * (2 * cum - t + 1)) AS two_r1,
           sum(t * t * t - t) AS tie3
    FROM ranked_grid
), scalars AS (
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n - n1 AS BIGINT) AS n2,
           CAST(n AS BIGINT) AS n, CAST(two_r1 AS BIGINT) AS two_r1,
           CAST(tie3 AS BIGINT) AS tie3
    FROM scalars0
)
SELECT n1, n2,
       {pround_sql('(CAST(two_r1 AS DOUBLE) - CAST(n1 * (n1 + 1) AS DOUBLE)) / 2.0', 4)} AS u1_r,
       {pround_sql('((CAST(two_r1 AS DOUBLE) - CAST(n1 * (n1 + 1) AS DOUBLE)) / 2.0 - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0) / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 * (CAST(n + 1 AS DOUBLE) - CAST(tie3 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))))', 6)} AS z_r
FROM scalars
"""

# --------------------------------------------------------------------------
# Spearman rank correlation (average ranks for ties, bounded rank tables)
# --------------------------------------------------------------------------


def q_spearman_corr_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between l_quantity and l_extendedprice
    (whole-dollar grid) — Pearson on average ranks, the standard robust
    monotone-association measure. The rank assignment never sorts the
    corpus: each variable's average ranks live in a VALUE-BOUNDED rank
    table (50 quantities; dollar prices bounded by the price domain) as
    2·r̄(v) = 2·cum(v) − t(v) + 1 exact integers, joined back by value
    (dimension-table-sized broadcast joins) — the shared
    ``operators/ranks.value_grid_ranks`` core.

    Overflow discipline (ADVICE r9): 2·r̄ ≤ 2n would wrap int64 product
    sums silently around n ≈ 10⁶ in Spark while DuckDB promotes to
    HUGEINT — divergent failure modes. The wide sums accumulate as
    DECIMAL operands on BOTH engines — but only the CROSS moment ΣRxRy
    must run over the corpus; the marginal moments collapse onto the
    bounded grids (Σ_rows f(rank) = Σ_grid t·f(rank)), so the decimal
    aggregation cost is one corpus column plus two grid-sized frames
    (the r10 shape — the first form paid 5 corpus decimal sums and
    measured +0.6 s at sf0.1). n and Σ2r̄ stay BIGINT (Σ2r̄ = n(n+1)
    exactly, < 2⁶³ for any n < 3·10⁹; document DECIMAL there too past
    that). rho forms in one shared double tree, pround 6."""
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("qty"),
        F.floor("l_extendedprice").cast("long").alias("usd"),
    )

    def grid_moments(col: str, rk: str, sv: str, svv: str) -> DataFrame:
        # per-variable marginal moments ON THE GRID: n, Σt·2r̄ (BIGINT),
        # Σt·(2r̄)² (DECIMAL — the t·4n² terms pass int64 around n≈1.3e6)
        g = value_grid_ranks(li, col).select(
            col, "t", two_rbar().alias(rk)
        )
        return g.groupBy().agg(
            F.sum("t").alias(f"n_{sv}"),
            F.sum(F.col("t") * F.col(rk)).alias(sv),
            F.sum(
                F.col("t").cast("decimal(19,0)")
                * F.col(rk).cast("decimal(19,0)")
                * F.col(rk).cast("decimal(19,0)")
            ).alias(svv),
        )

    mx = grid_moments("qty", "rq2", "sx", "sxx")
    my = grid_moments("usd", "rp2", "sy", "syy")
    rq = average_rank_table(li, "qty", "rq2")  # 2× average rank, exact int
    rp = average_rank_table(li, "usd", "rp2")
    ranked = li.join(F.broadcast(rq), "qty").join(F.broadcast(rp), "usd")
    cross = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.col("rq2").cast("decimal(19,0)") * F.col("rp2").cast("decimal(19,0)")
        ).alias("sxy"),
    )
    sums = cross.crossJoin(F.broadcast(mx)).crossJoin(F.broadcast(my))
    num = (
        "CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"
    )
    dx = (
        "CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"
    )
    dy = (
        "CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"
    )
    return sums.select(
        "n", pround(F.expr(f"({num}) / sqrt(({dx}) * ({dy}))"), 6).alias("rho_r")
    )


_SPEARMAN_SQL = f"""
WITH li AS (
    SELECT CAST(l_quantity AS BIGINT) AS qty,
           CAST(floor(l_extendedprice) AS BIGINT) AS usd
    FROM lineitem
), gq AS (
    SELECT qty, count(*) AS t FROM li GROUP BY qty
), rq AS (
    SELECT qty,
           2 * (sum(t) OVER (ORDER BY qty
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) - t + 1 AS rq2
    FROM gq
), gp AS (
    SELECT usd, count(*) AS t FROM li GROUP BY usd
), rp AS (
    SELECT usd,
           2 * (sum(t) OVER (ORDER BY usd
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) - t + 1 AS rp2
    FROM gp
), ranked AS (
    SELECT li.qty, li.usd, rq.rq2, rp.rp2
    FROM li JOIN rq USING (qty) JOIN rp USING (usd)
), mx AS (
    SELECT CAST(sum(t * rq2) AS BIGINT) AS sx,
           sum(CAST(t AS DECIMAL(19,0)) * CAST(rq2 AS DECIMAL(19,0))
               * CAST(rq2 AS DECIMAL(19,0))) AS sxx
    FROM rq JOIN gq USING (qty)
), my AS (
    SELECT CAST(sum(t * rp2) AS BIGINT) AS sy,
           sum(CAST(t AS DECIMAL(19,0)) * CAST(rp2 AS DECIMAL(19,0))
               * CAST(rp2 AS DECIMAL(19,0))) AS syy
    FROM rp JOIN gp USING (usd)
), sums AS (
    SELECT count(*) AS n,
           sum(CAST(rq2 AS DECIMAL(19,0)) * CAST(rp2 AS DECIMAL(19,0))) AS sxy,
           sx, sxx, sy, syy
    FROM ranked, mx, my
    GROUP BY sx, sxx, sy, syy
)
SELECT n,
       {pround_sql('(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))', 6)} AS rho_r
FROM sums
"""

# --------------------------------------------------------------------------
# Kruskal-Wallis H (k-sample rank test, tie-corrected, dollar grid)
# --------------------------------------------------------------------------


def q_kruskal_wallis_h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test (the k-sample extension of Mann-Whitney) on
    purchase value across THREE deterministic hash arms — the omnibus
    nonparametric ANOVA a multi-variant experiment reports before any
    pairwise drill-down. Shares the value-bounded dollar-grid rank
    machinery with ``mann_whitney_u`` via
    ``operators/ranks.value_grid_ranks``: per dollar value, tie count t and
    per-arm counts; 2·r̄ = 2·cum − t + 1 exact BIGINT; per-arm doubled
    rank sums stay integers until the final shared double tree.
    H = 12/(n(n+1)) · Σ_g R_g²/n_g − 3(n+1), tie-corrected by
    C = 1 − Σ(t³−t)/(n³−n). One corpus aggregate; the cumulative window
    runs only on the grid (the logrank/equidepth bounded-window class)."""
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    obs = ev.select(
        F.floor("value").cast("long").alias("usd"),
        F.pmod(hash64(F.col("event_id")), F.lit(3)).cast("int").alias("arm"),
    )
    # Shared grid→cumulative-window→2·r̄ core (operators/ranks.py).
    ranked = value_grid_ranks(
        obs,
        "usd",
        *[
            F.sum((F.col("arm") == g).cast("long")).alias(f"n{g}v")
            for g in range(3)
        ],
    )
    scalars = ranked.groupBy().agg(
        F.sum("t").alias("n"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie3"),
        *[F.sum(f"n{g}v").alias(f"n{g}") for g in range(3)],
        *[F.sum(F.col(f"n{g}v") * two_rbar()).alias(f"tr{g}") for g in range(3)],
    )
    # shared double tree: R_g = tr_g/2; Σ R_g²/n_g with each term formed
    # identically in both engines.
    rsum = " + ".join(
        f"(CAST(tr{g} AS DOUBLE) / 2.0) * (CAST(tr{g} AS DOUBLE) / 2.0)"
        f" / CAST(n{g} AS DOUBLE)"
        for g in range(3)
    )
    h = (
        f"12.0 / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)) * ({rsum})"
        " - 3.0 * CAST(n + 1 AS DOUBLE)"
    )
    corr = (
        "1.0 - CAST(tie3 AS DOUBLE)"
        " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
        "    - CAST(n AS DOUBLE))"
    )
    return scalars.select(
        "n",
        F.lit(2).cast("int").alias("df"),
        pround(F.expr(f"({h}) / ({corr})"), 6).alias("h_r"),
    )


def _kruskal_sql() -> str:
    rsum = " + ".join(
        f"(CAST(tr{g} AS DOUBLE) / 2.0) * (CAST(tr{g} AS DOUBLE) / 2.0)"
        f" / CAST(n{g} AS DOUBLE)"
        for g in range(3)
    )
    h = (
        f"12.0 / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)) * ({rsum})"
        " - 3.0 * CAST(n + 1 AS DOUBLE)"
    )
    corr = (
        "1.0 - CAST(tie3 AS DOUBLE)"
        " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
        "    - CAST(n AS DOUBLE))"
    )
    arms = ",\n           ".join(
        f"CAST(sum(CAST(arm = {g} AS INT)) AS BIGINT) AS n{g}v" for g in range(3)
    )
    nsums = ", ".join(f"CAST(sum(n{g}v) AS BIGINT) AS n{g}" for g in range(3))
    trs = ", ".join(
        f"CAST(sum(n{g}v * (2 * cum - t + 1)) AS BIGINT) AS tr{g}" for g in range(3)
    )
    return f"""
WITH obs AS (
    SELECT CAST(floor(value) AS BIGINT) AS usd,
           CAST({hash64_sql('event_id')} % 3 AS INT) AS arm
    FROM events WHERE event_type = 'purchase'
), grid AS (
    SELECT usd, count(*) AS t,
           {arms}
    FROM obs GROUP BY usd
), ranked AS (
    SELECT *, sum(t) OVER (ORDER BY usd
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM grid
), scalars AS (
    SELECT CAST(sum(t) AS BIGINT) AS n,
           CAST(sum(t * t * t - t) AS BIGINT) AS tie3,
           {nsums}, {trs}
    FROM ranked
)
SELECT n, CAST(2 AS INT) AS df,
       {pround_sql(f'(({h})) / (({corr}))', 6)} AS h_r
FROM scalars
"""


# --------------------------------------------------------------------------
# Welch's unequal-variance t-test (exact integer moments, shared tree)
# --------------------------------------------------------------------------


def q_welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test on purchase CENTS between the hash arms —
    the mean-difference complement to the rank tests (``mann_whitney_u``)
    and the proportion test (``ab_test_z_score``). One corpus aggregate
    collects exact BIGINT moments (n, Σcents, Σcents²) per arm; mean,
    variance, t, and the Welch-Satterthwaite df all form in ONE shared
    double tree (S² is squared in DOUBLE to dodge int64 overflow at scale
    — same both engines, so still hash-exact). pround 6."""
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    obs = ev.select(
        cents.alias("c"),
        F.pmod(hash64(F.col("event_id")), F.lit(2)).cast("int").alias("arm"),
    )
    scalars = obs.groupBy().agg(
        *[
            f
            for g in range(2)
            for f in (
                F.sum((F.col("arm") == g).cast("long")).alias(f"n{g}"),
                F.sum(F.when(F.col("arm") == g, F.col("c")).otherwise(0)).alias(f"s{g}"),
                F.sum(
                    F.when(F.col("arm") == g, F.col("c") * F.col("c")).otherwise(0)
                ).alias(f"q{g}"),
            )
        ]
    )
    v = {
        g: (
            f"(CAST(q{g} AS DOUBLE) - CAST(s{g} AS DOUBLE) * CAST(s{g} AS DOUBLE)"
            f" / CAST(n{g} AS DOUBLE)) / CAST(n{g} - 1 AS DOUBLE)"
        )
        for g in range(2)
    }
    se2 = f"(({v[0]}) / CAST(n0 AS DOUBLE) + ({v[1]}) / CAST(n1 AS DOUBLE))"
    t = (
        f"(CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)"
        f" - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / sqrt({se2})"
    )
    df = (
        f"({se2}) * ({se2}) / ("
        f"(({v[0]}) / CAST(n0 AS DOUBLE)) * (({v[0]}) / CAST(n0 AS DOUBLE))"
        f" / CAST(n0 - 1 AS DOUBLE)"
        f" + (({v[1]}) / CAST(n1 AS DOUBLE)) * (({v[1]}) / CAST(n1 AS DOUBLE))"
        f" / CAST(n1 - 1 AS DOUBLE))"
    )
    return scalars.select(
        "n0",
        "n1",
        pround(F.expr(t), 6).alias("t_r"),
        pround(F.expr(df), 4).alias("df_r"),
    )


def _welch_sql() -> str:
    v = {
        g: (
            f"(CAST(q{g} AS DOUBLE) - CAST(s{g} AS DOUBLE) * CAST(s{g} AS DOUBLE)"
            f" / CAST(n{g} AS DOUBLE)) / CAST(n{g} - 1 AS DOUBLE)"
        )
        for g in range(2)
    }
    se2 = f"(({v[0]}) / CAST(n0 AS DOUBLE) + ({v[1]}) / CAST(n1 AS DOUBLE))"
    t = (
        f"(CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)"
        f" - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / sqrt({se2})"
    )
    df = (
        f"({se2}) * ({se2}) / ("
        f"(({v[0]}) / CAST(n0 AS DOUBLE)) * (({v[0]}) / CAST(n0 AS DOUBLE))"
        f" / CAST(n0 - 1 AS DOUBLE)"
        f" + (({v[1]}) / CAST(n1 AS DOUBLE)) * (({v[1]}) / CAST(n1 AS DOUBLE))"
        f" / CAST(n1 - 1 AS DOUBLE))"
    )
    moments = ",\n           ".join(
        f"CAST(sum(CAST(arm = {g} AS INT)) AS BIGINT) AS n{g},"
        f" CAST(sum(CASE WHEN arm = {g} THEN c ELSE 0 END) AS BIGINT) AS s{g},"
        f" CAST(sum(CASE WHEN arm = {g} THEN c * c ELSE 0 END) AS BIGINT) AS q{g}"
        for g in range(2)
    )
    return f"""
WITH obs AS (
    SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
           CAST({hash64_sql('event_id')} % 2 AS INT) AS arm
    FROM events WHERE event_type = 'purchase'
), scalars AS (
    SELECT {moments}
    FROM obs
)
SELECT n0, n1,
       {pround_sql(t, 6)} AS t_r,
       {pround_sql(df, 4)} AS df_r
FROM scalars
"""


# --------------------------------------------------------------------------
# Cramer's V (categorical association from the chi2 identity)
# --------------------------------------------------------------------------


def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramer's V association between event type and ISO weekday — the
    normalized effect size a dashboard reports next to a chi-squared
    p-value. Uses the observed-cells-only identity
    χ² = n·(Σ o²/(rowΣ·colΣ) − 1), so zero cells need no densification;
    V = sqrt(χ² / (n·(min(r,c)−1))). ONE (type, dow) count aggregate
    (≤ 5×7 cells); marginals join back on the bounded grid. Portable dow:
    Spark ``weekday()+1`` == DuckDB ``isodow()``."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_type", (F.weekday("ts") + 1).alias("dow")
    )
    cells = ev.groupBy("event_type", "dow").agg(F.count(F.lit(1)).alias("o"))
    rowm = cells.groupBy("event_type").agg(F.sum("o").alias("rm"))
    colm = cells.groupBy("dow").agg(F.sum("o").alias("cm"))
    joined = cells.join(F.broadcast(rowm), "event_type").join(
        F.broadcast(colm), "dow"
    )
    scalars = joined.groupBy().agg(
        F.sum("o").alias("n"),
        F.count(F.lit(1)).alias("n_cells"),
        F.countDistinct("event_type").alias("r"),
        F.countDistinct("dow").alias("c"),
        F.sum(
            F.col("o").cast("double")
            * F.col("o").cast("double")
            / (F.col("rm").cast("double") * F.col("cm").cast("double"))
        ).alias("frac"),
    )
    chi2 = "CAST(n AS DOUBLE) * (frac - 1.0)"
    vexpr = (
        f"sqrt(({chi2}) / (CAST(n AS DOUBLE)"
        " * CAST(least(r, c) - 1 AS DOUBLE)))"
    )
    return scalars.select(
        "n",
        "n_cells",
        pround(F.expr(chi2), 6).alias("chi2_r"),
        pround(F.expr(vexpr), 6).alias("v_r"),
    )


_CRAMERS_SQL = f"""
WITH ev AS (
    SELECT event_type, isodow(ts) AS dow FROM events
), cells AS (
    SELECT event_type, dow, count(*) AS o FROM ev GROUP BY 1, 2
), rowm AS (
    SELECT event_type, sum(o) AS rm FROM cells GROUP BY 1
), colm AS (
    SELECT dow, sum(o) AS cm FROM cells GROUP BY 1
), joined AS (
    SELECT cells.o, rowm.rm, colm.cm, cells.event_type, cells.dow
    FROM cells JOIN rowm USING (event_type) JOIN colm USING (dow)
), scalars AS (
    SELECT CAST(sum(o) AS BIGINT) AS n, count(*) AS n_cells,
           CAST(count(DISTINCT event_type) AS BIGINT) AS r,
           CAST(count(DISTINCT dow) AS BIGINT) AS c,
           sum(CAST(o AS DOUBLE) * CAST(o AS DOUBLE)
               / (CAST(rm AS DOUBLE) * CAST(cm AS DOUBLE))) AS frac
    FROM joined
)
SELECT n, n_cells,
       {pround_sql('CAST(n AS DOUBLE) * (frac - 1.0)', 6)} AS chi2_r,
       {pround_sql('sqrt((CAST(n AS DOUBLE) * (frac - 1.0)) / (CAST(n AS DOUBLE) * CAST(least(r, c) - 1 AS DOUBLE)))', 6)} AS v_r
FROM scalars
"""


# --------------------------------------------------------------------------
# Cohen's kappa (chance-corrected agreement of the lang-ID heuristic)
# --------------------------------------------------------------------------


def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the house language-ID heuristic
    (``operators/text.predict_lang``) and the labeled language — the
    chance-corrected agreement score an annotation-quality audit reports
    (raw accuracy overstates agreement when the label distribution is
    skewed). Confusion counts live on the ≤(|langs|+1)² grid after ONE
    corpus aggregate; p_o and p_e form in a shared double tree. Reuses
    the oracled lang-ID spec on both sides (Spark frame / SQL CTE)."""
    from projet_data_infrastructure_spark.plans.llm_queries import q_lang_id

    pred = q_lang_id(spark, sf_dir)
    conf = pred.groupBy("lang_labeled", "lang_pred").agg(
        F.count(F.lit(1)).alias("o")
    )
    rowm = conf.groupBy("lang_labeled").agg(F.sum("o").alias("rm"))
    colm = conf.groupBy("lang_pred").agg(F.sum("o").alias("cm"))
    scalars = (
        conf.groupBy()
        .agg(
            F.sum("o").alias("n"),
            F.sum(
                F.when(F.col("lang_labeled") == F.col("lang_pred"), F.col("o")).otherwise(0)
            ).alias("agree"),
        )
        .crossJoin(
            F.broadcast(
                rowm.join(colm, rowm.lang_labeled == colm.lang_pred, "full")
                .select(
                    (
                        F.coalesce(F.col("rm"), F.lit(0))
                        * F.coalesce(F.col("cm"), F.lit(0))
                    ).alias("rc")
                )
                .groupBy()
                .agg(F.sum("rc").alias("pe_num"))
            )
        )
    )
    po = "CAST(agree AS DOUBLE) / CAST(n AS DOUBLE)"
    pe = "CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))"
    return scalars.select(
        "n",
        "agree",
        pround(F.expr(f"(({po}) - ({pe})) / (1.0 - ({pe}))"), 6).alias("kappa_r"),
    )


def _kappa_sql() -> str:
    from projet_data_infrastructure_spark.plans.llm_queries import _lang_id_sql

    po = "CAST(agree AS DOUBLE) / CAST(n AS DOUBLE)"
    pe = "CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))"
    return f"""
WITH pred AS ({_lang_id_sql()}),
conf AS (
    SELECT lang_labeled, lang_pred, count(*) AS o FROM pred GROUP BY 1, 2
), rowm AS (
    SELECT lang_labeled AS k, sum(o) AS rm FROM conf GROUP BY 1
), colm AS (
    SELECT lang_pred AS k, sum(o) AS cm FROM conf GROUP BY 1
), pe AS (
    SELECT CAST(sum(coalesce(rm, 0) * coalesce(cm, 0)) AS BIGINT) AS pe_num
    FROM rowm FULL JOIN colm USING (k)
), tot AS (
    SELECT CAST(sum(o) AS BIGINT) AS n,
           CAST(sum(CASE WHEN lang_labeled = lang_pred THEN o ELSE 0 END)
                AS BIGINT) AS agree
    FROM conf
)
SELECT n, agree,
       {pround_sql(f'(({po}) - ({pe})) / (1.0 - ({pe}))', 6)} AS kappa_r
FROM tot, pe
"""


# --------------------------------------------------------------------------
# Kendall tau-b (2-D dominance sums on the bounded qty x dollar grid)
# --------------------------------------------------------------------------


def _kendall_fold(batches):
    """Arrow fold for :func:`q_kendall_tau_b`: all dominance/tie sums from
    the DOMAIN-BOUNDED (usd, qty) cell table in one vectorized numpy pass.

    Exact int64 arithmetic throughout (cumsums, products, floor-div) — the
    same integer semantics as the SQL form, so the output is hash-identical.
    Mirrors the round-13 dense-grid semantics exactly: conc/rowdp count only
    the in-domain qty 1..50 grid; n1/totpairs/n_oob see the full qty
    marginal; n2 sees the full per-usd marginal.
    """
    import numpy as np
    import pyarrow as pa

    us, qs, ns = [], [], []
    for b in batches:
        us.append(b.column("usd").to_numpy(zero_copy_only=False))
        qs.append(b.column("qty").to_numpy(zero_copy_only=False))
        ns.append(b.column("n").to_numpy(zero_copy_only=False))
    if us:
        usd = np.concatenate(us).astype(np.int64)
        qty = np.concatenate(qs).astype(np.int64)
        n = np.concatenate(ns).astype(np.int64)
    else:  # empty partition: all-zero sums (matches empty-input aggregates)
        usd = qty = n = np.zeros(0, dtype=np.int64)
    # usd marginal (ALL qty, incl. out-of-domain): n2 tie term.
    uu, uinv = np.unique(usd, return_inverse=True)
    tu = np.zeros(len(uu), dtype=np.int64)
    np.add.at(tu, uinv, n)
    n2 = int((tu * (tu - 1) // 2).sum())
    # qty marginal (ALL qty, ordered ASC): totpairs / n1 / n_oob.
    qu, qinv = np.unique(qty, return_inverse=True)
    tq = np.zeros(len(qu), dtype=np.int64)
    np.add.at(tq, qinv, n)
    pre = np.concatenate(([0], np.cumsum(tq)[:-1]))
    totpairs = int((tq * pre).sum())
    n1 = int((tq * (tq - 1) // 2).sum())
    n_oob = int(tq[(qu < 1) | (qu > 50)].sum())
    # In-domain dense grid (|usd| × 50) and its 2-D strict prefix sums.
    inb = (qty >= 1) & (qty <= 50)
    m = np.zeros((len(uu), 50), dtype=np.int64)
    # add.at, not assignment: the upstream groupBy guarantees unique
    # (usd, qty) cells today, but an accumulating fold stays correct if the
    # helper is ever fed a non-aggregated stream (ADVICE r14) — matching how
    # tu/tq already accumulate.
    np.add.at(m, (uinv[inb], qty[inb] - 1), n[inb])
    cu = np.cumsum(m, axis=0) - m  # strict-usd prefix per qty column
    sc = np.cumsum(cu, axis=1) - cu  # + strict-qty prefix → dominated count
    sx = np.cumsum(m, axis=1) - m  # within-row strict-qty prefix
    n_tot = int(m.sum())
    conc = int((m * sc).sum())
    rowdp = conc + int((m * sx).sum())
    yield pa.RecordBatch.from_pydict(
        {
            "n": [n_tot],
            "conc": [conc],
            "rowdp": [rowdp],
            "n1": [n1],
            "n2": [n2],
            "totpairs": [totpairs],
            "n_oob": [n_oob],
        },
        schema=pa.schema([(c, pa.int64()) for c in (
            "n", "conc", "rowdp", "n1", "n2", "totpairs", "n_oob")]),
    )


def q_kendall_tau_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between l_quantity and
    l_extendedprice (whole-dollar grid) — completing the correlation
    family (Pearson via the OLS moments, Spearman via average ranks,
    Kendall via concordant/discordant pairs). The naive definition is an
    O(n²) pair scan; the house form exploits that the (usd, qty) grid is
    DOMAIN-bounded — qty has the fixed 1..50 TPC-H domain and usd = floor
    of a price with a fixed catalog range (~105k dollar values), so the
    cell table is ≤ ~5M rows at ANY data scale:

    1. ONE data-sized aggregate: groupBy(usd, qty) cell counts, map-side
       combined down to the bounded cell table — the only operation that
       touches corpus-sized data.
    2. One vectorized Arrow fold (guide §4.2) over the single-partition
       cell table computes every dominance/tie sum exactly in int64
       numpy: 2-D strict prefix sums for concordant pairs, the
       inclusive-prefix identity rowdp = C + Σ n·s (no backward pass),
       and both tie marginals — including n_oob, the out-of-domain
       sentinel (ADVICE r9) that hash-fails the oracle gate if the qty
       domain ever drifts. The fold replaces the round-13 densified
       |usd|×50 grid, its left join, and two grid-sized window sorts
       (measured 5.0 s → ~2-3 s warm at sf0.1); the single partition is
       scale-safe for the same reason the ≤50-row tie window always was
       — its input is domain-bounded, not data-bounded.
    3. tau_b = (C − D)/√((n0−n1)(n0−n2)) stays a Spark SQL double tree
       (pround 6), so cross-engine FP semantics are unchanged.
    """
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("int").alias("qty"),
        F.floor("l_extendedprice").cast("long").alias("usd"),
    )
    cells = li.groupBy("usd", "qty").agg(F.count(F.lit(1)).alias("n"))
    folded = cells.repartition(1).mapInArrow(
        _kendall_fold,
        "n long, conc long, rowdp long, n1 long, n2 long, totpairs long, n_oob long",
    )
    scalars = (
        folded
        .select(
            "n",
            "conc",
            (F.col("totpairs") - F.col("rowdp")).alias("disc"),
            "n1",
            "n2",
            "n_oob",
        )
    )
    tau = (
        "(CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE))"
        " / sqrt((CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) / 2.0"
        "         - CAST(n1 AS DOUBLE))"
        "        * (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) / 2.0"
        "           - CAST(n2 AS DOUBLE)))"
    )
    return scalars.select(
        "n", "conc", "disc", "n_oob", pround(F.expr(tau), 6).alias("tau_b_r")
    )


def _kendall_sql() -> str:
    gcols = ",\n           ".join(
        f"CAST(sum(CASE WHEN qty = {q} THEN n ELSE 0 END) AS BIGINT) AS g{q}"
        for q in range(1, 51)
    )
    carr = ", ".join(
        f"CAST(coalesce(sum(g{q}) OVER ws, 0) AS BIGINT)" for q in range(1, 51)
    )
    darr = ", ".join(
        f"CAST(sum(g{q}) OVER () - sum(g{q}) OVER wi AS BIGINT)"
        for q in range(1, 51)
    )
    fold = "coalesce(list_sum(list_slice({arr}, 1, qty - 1)), 0)"
    tau = (
        "(CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE))"
        " / sqrt((CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) / 2.0"
        "         - CAST(n1 AS DOUBLE))"
        "        * (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) / 2.0"
        "           - CAST(n2 AS DOUBLE)))"
    )
    return f"""
WITH li AS (
    SELECT CAST(l_quantity AS INT) AS qty,
           CAST(floor(l_extendedprice) AS BIGINT) AS usd
    FROM lineitem
), cells AS (
    SELECT qty, usd, count(*) AS n FROM li GROUP BY 1, 2
), grid AS (
    SELECT usd,
           {gcols}
    FROM cells GROUP BY usd
), grid2 AS (
    SELECT usd, [{carr}] AS carr, [{darr}] AS darr
    FROM grid
    WINDOW ws AS (ORDER BY usd ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           wi AS (ORDER BY usd ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), joined AS (
    SELECT c.qty, c.n, g.carr, g.darr
    FROM cells c JOIN grid2 g USING (usd)
), sums AS (
    SELECT CAST(sum(n) AS BIGINT) AS n,
           CAST(sum(n * {fold.format(arr='carr')}) AS BIGINT) AS conc,
           CAST(sum(n * {fold.format(arr='darr')}) AS BIGINT) AS disc
    FROM joined
), tx AS (
    SELECT CAST(sum(t * (t - 1) // 2) AS BIGINT) AS n1,
           CAST(sum(CASE WHEN qty < 1 OR qty > 50 THEN t ELSE 0 END)
                AS BIGINT) AS n_oob
    FROM (SELECT qty, sum(n) AS t FROM cells GROUP BY qty)
), ty AS (
    SELECT CAST(sum(t * (t - 1) // 2) AS BIGINT) AS n2
    FROM (SELECT usd, sum(n) AS t FROM cells GROUP BY usd)
)
SELECT n, conc, disc, n_oob,
       {pround_sql(tau, 6)} AS tau_b_r
FROM sums, tx, ty
"""


# --------------------------------------------------------------------------
# Benjamini-Hochberg FDR over per-nation urgency-share tests
# --------------------------------------------------------------------------

_BH_ALPHA_MICRO = 100000  # alpha = 0.10 in micro-units


def q_bh_fdr_nation_urgency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple-testing control — the experimentation-platform layer above
    the single-test specs: per nation, a two-proportion z-test of the
    1-URGENT order share against the pooled rest, normal p-values via the
    engine-shared Zelen-Severo polynomial (``functions/stats.py`` — no
    erf in either engine), then the Benjamini-Hochberg step-up at
    α = 0.10: reject all hypotheses ranked ≤ the LARGEST k with
    p_(k) ≤ k·α/m. All test statistics come from ONE orders aggregate
    (25-nation bounded grid via the customer broadcast join); the BH sort
    and step-up windows run on the 25-row frame. Rejection thresholds
    compare p·m·10⁶ (double) against k·α·10⁶ exactly as written on both
    engines."""
    from projet_data_infrastructure_spark.functions.stats import two_sided_p_sql

    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    per_nation = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("o_orderpriority") == "1-URGENT").cast("long")).alias("k"),
        )
    )
    wtot = Window.partitionBy()
    enriched = per_nation.select(
        "c_nationkey",
        "n",
        "k",
        (F.sum("n").over(wtot) - F.col("n")).alias("n_rest"),
        (F.sum("k").over(wtot) - F.col("k")).alias("k_rest"),
    )
    p1 = "CAST(k AS DOUBLE) / CAST(n AS DOUBLE)"
    p2 = "CAST(k_rest AS DOUBLE) / CAST(n_rest AS DOUBLE)"
    pp = "(CAST(k AS DOUBLE) + CAST(k_rest AS DOUBLE)) / (CAST(n AS DOUBLE) + CAST(n_rest AS DOUBLE))"
    z = (
        f"(({p1}) - ({p2}))"
        f" / sqrt(({pp}) * (1.0 - ({pp}))"
        f" * (1.0 / CAST(n AS DOUBLE) + 1.0 / CAST(n_rest AS DOUBLE)))"
    )
    tested = enriched.withColumn("z", F.expr(z)).withColumn(
        "p", F.expr(two_sided_p_sql("z"))
    )
    wrank = Window.orderBy("p", "c_nationkey")
    m = Window.partitionBy()
    ranked = tested.withColumn("rnk", F.row_number().over(wrank)).withColumn(
        "m", F.count(F.lit(1)).over(m)
    )
    # step-up: reject ranks <= max rank with p <= rnk*alpha/m
    passed = F.when(
        F.col("p") * F.col("m") * 1000000.0
        <= F.col("rnk") * F.lit(float(_BH_ALPHA_MICRO)),
        F.col("rnk"),
    )
    wcut = Window.partitionBy()
    cut = ranked.withColumn("cut", F.max(passed).over(wcut))
    return cut.select(
        F.col("c_nationkey").cast("long").alias("nationkey"),
        "n",
        "k",
        pround(F.col("p"), 8).alias("p_r"),
        F.col("rnk").cast("int").alias("p_rank"),
        (F.col("rnk") <= F.coalesce(F.col("cut"), F.lit(0))).alias("bh_reject"),
    ).orderBy("nationkey")


def _bh_sql() -> str:
    from projet_data_infrastructure_spark.functions.stats import two_sided_p_sql

    p1 = "CAST(k AS DOUBLE) / CAST(n AS DOUBLE)"
    p2 = "CAST(k_rest AS DOUBLE) / CAST(n_rest AS DOUBLE)"
    pp = "(CAST(k AS DOUBLE) + CAST(k_rest AS DOUBLE)) / (CAST(n AS DOUBLE) + CAST(n_rest AS DOUBLE))"
    z = (
        f"(({p1}) - ({p2}))"
        f" / sqrt(({pp}) * (1.0 - ({pp}))"
        f" * (1.0 / CAST(n AS DOUBLE) + 1.0 / CAST(n_rest AS DOUBLE)))"
    )
    return f"""
WITH per_nation AS (
    SELECT c.c_nationkey, count(*) AS n,
           CAST(sum(CAST(o.o_orderpriority = '1-URGENT' AS INT)) AS BIGINT) AS k
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
), enriched AS (
    SELECT c_nationkey, n, k,
           CAST(sum(n) OVER () - n AS BIGINT) AS n_rest,
           CAST(sum(k) OVER () - k AS BIGINT) AS k_rest
    FROM per_nation
), tested AS (
    SELECT *, {z} AS z FROM enriched
), withp AS (
    SELECT *, {two_sided_p_sql('z')} AS p FROM tested
), ranked AS (
    SELECT *, row_number() OVER (ORDER BY p, c_nationkey) AS rnk,
           count(*) OVER () AS m
    FROM withp
), cut AS (
    SELECT *, max(CASE WHEN p * m * 1000000.0 <= rnk * {float(_BH_ALPHA_MICRO)}
                       THEN rnk END) OVER () AS cutr
    FROM ranked
)
SELECT CAST(c_nationkey AS BIGINT) AS nationkey, n, k,
       {pround_sql('p', 8)} AS p_r,
       CAST(rnk AS INT) AS p_rank,
       rnk <= coalesce(cutr, 0) AS bh_reject
FROM cut
ORDER BY nationkey
"""


# --------------------------------------------------------------------------
# McNemar's paired test: heuristic lang-ID vs the NB classifier
# --------------------------------------------------------------------------


def q_mcnemar_lang_classifiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test (1947) on PAIRED predictions: the stopword-heuristic
    lang-ID (``llm_queries.q_lang_id``) vs the multinomial NB classifier
    (``learning.nb_predictions``) over the SAME documents — the correct
    way to compare two classifiers evaluated on one dataset (accuracies
    alone ignore the pairing; only the DISCORDANT docs carry signal).
    b = docs the heuristic gets right and NB wrong, c = the reverse;
    χ² = (b−c)²/(b+c), two-sided p via the engine-shared Zelen-Severo
    polynomial on z = (b−c)/√(b+c). Both prediction frames are reused
    registry cores (one corpus tokenize each); the pairing join keys on
    doc_id and the test statistics live on a 1-row frame."""
    from projet_data_infrastructure_spark.functions.stats import two_sided_p_sql
    from projet_data_infrastructure_spark.plans.learning import nb_predictions
    from projet_data_infrastructure_spark.plans.llm_queries import q_lang_id

    heur = q_lang_id(spark, sf_dir).select(
        "doc_id",
        (F.col("lang_pred") == F.col("lang_labeled")).alias("a_right"),
    )
    nb = nb_predictions(spark, sf_dir).select(
        "doc_id", (F.col("pred") == F.col("true_lang")).alias("b_right")
    )
    paired = heur.join(nb, "doc_id")
    scalars = paired.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("a_right") & ~F.col("b_right")).cast("long")).alias("b"),
        F.sum((~F.col("a_right") & F.col("b_right")).cast("long")).alias("c"),
    )
    chi2 = (
        "(CAST(b AS DOUBLE) - CAST(c AS DOUBLE))"
        " * (CAST(b AS DOUBLE) - CAST(c AS DOUBLE))"
        " / (CAST(b AS DOUBLE) + CAST(c AS DOUBLE))"
    )
    z = (
        "(CAST(b AS DOUBLE) - CAST(c AS DOUBLE))"
        " / sqrt(CAST(b AS DOUBLE) + CAST(c AS DOUBLE))"
    )
    return scalars.select(
        "n",
        F.col("b").alias("heur_only_right"),
        F.col("c").alias("nb_only_right"),
        pround(F.expr(chi2), 6).alias("chi2_r"),
        pround(F.expr(two_sided_p_sql(z)), 8).alias("p_r"),
    )


def _mcnemar_sql() -> str:
    from projet_data_infrastructure_spark.functions.stats import two_sided_p_sql
    from projet_data_infrastructure_spark.plans.learning import _NB_PRED_CTES
    from projet_data_infrastructure_spark.plans.llm_queries import _lang_id_sql

    chi2 = (
        "(CAST(b AS DOUBLE) - CAST(c AS DOUBLE))"
        " * (CAST(b AS DOUBLE) - CAST(c AS DOUBLE))"
        " / (CAST(b AS DOUBLE) + CAST(c AS DOUBLE))"
    )
    z = (
        "(CAST(b AS DOUBLE) - CAST(c AS DOUBLE))"
        " / sqrt(CAST(b AS DOUBLE) + CAST(c AS DOUBLE))"
    )
    return f"""
WITH {_NB_PRED_CTES},
nbp AS (
    SELECT doc_id, true_lang = cand AS b_right FROM pred WHERE rn = 1
), heur AS (
    SELECT doc_id, lang_pred = lang_labeled AS a_right
    FROM ({_lang_id_sql()})
), paired AS (
    SELECT h.doc_id, h.a_right, n.b_right FROM heur h JOIN nbp n USING (doc_id)
), scalars AS (
    SELECT count(*) AS n,
           CAST(sum(CAST(a_right AND NOT b_right AS INT)) AS BIGINT) AS b,
           CAST(sum(CAST(b_right AND NOT a_right AS INT)) AS BIGINT) AS c
    FROM paired
)
SELECT n, b AS heur_only_right, c AS nb_only_right,
       {pround_sql(chi2, 6)} AS chi2_r,
       {pround_sql(two_sided_p_sql(z), 8)} AS p_r
FROM scalars
"""




SPECS.extend(
    [
        QuerySpec(
            "mann_whitney_u",
            q_mann_whitney_u,
            _MANN_WHITNEY_SQL,
            ("stats", "bench"),
            doc="Tie-corrected Mann-Whitney U rank-sum test between hash arms "
            "over the value-bounded dollar grid; shared-double-tree z",
        ),
        QuerySpec(
            "spearman_corr_qty_price",
            q_spearman_corr_qty_price,
            _SPEARMAN_SQL,
            ("stats", "bench"),
            doc="Spearman rank correlation (average ranks for ties) from "
            "value-bounded rank tables; exact integer moment sums",
        ),
        QuerySpec(
            "kruskal_wallis_h",
            q_kruskal_wallis_h,
            _kruskal_sql(),
            ("stats",),
            doc="Tie-corrected Kruskal-Wallis H across three hash arms over "
            "the value-bounded dollar grid; shared-double-tree H",
        ),
        QuerySpec(
            "welch_t_test",
            q_welch_t_test,
            _welch_sql(),
            ("stats",),
            doc="Welch unequal-variance t-test on purchase cents between hash "
            "arms; exact integer moments, shared-tree t and df",
        ),
        QuerySpec(
            "cramers_v",
            q_cramers_v,
            _CRAMERS_SQL,
            ("stats",),
            doc="Cramer's V association (event type x ISO weekday) via the "
            "observed-cells chi2 identity on the bounded grid",
        ),
        QuerySpec(
            "cohens_kappa",
            q_cohens_kappa,
            _kappa_sql(),
            ("stats", "ml"),
            doc="Cohen's kappa between the lang-ID heuristic and labels; "
            "confusion grid bounded by |langs|^2",
        ),
        QuerySpec(
            "kendall_tau_b",
            q_kendall_tau_b,
            _kendall_sql(),
            ("stats", "bench"),
            doc="Kendall tau-b via 2-D dominance sums on the bounded qty x "
            "dollar grid (no O(n^2) pair scan); shared-tree tau",
        ),
        QuerySpec(
            "bh_fdr_nation_urgency",
            q_bh_fdr_nation_urgency,
            _bh_sql(),
            ("stats",),
            doc="Benjamini-Hochberg FDR step-up over per-nation urgency-share "
            "z-tests; engine-shared Zelen-Severo normal p-values",
        ),
        QuerySpec(
            "mcnemar_lang_classifiers",
            q_mcnemar_lang_classifiers,
            _mcnemar_sql(),
            ("stats", "ml"),
            doc="McNemar's paired test: heuristic lang-ID vs the NB classifier "
            "on the same docs; discordant-pair chi2 + shared-tree p",
        ),
    ]
)


# --------------------------------------------------------------------------
# Shared one-way-F tail (anova_oneway_f + levene_brown_forsythe)
# --------------------------------------------------------------------------
#
# Both specs reduce to per-group exact BIGINT moments (ng, sg=Σy, qg=Σy²)
# and the identical F algebra. The between-group term S_g²/n_g is fractional,
# so it is quantized to integer micro-units per group BEFORE the k-term sum
# (the chisq_priority_status discipline) — order-insensitive in both
# engines; S_g² goes through DECIMAL(19,0)² → DECIMAL(38,0) so it cannot
# wrap int64 at large SFs. The expression TEXT is shared verbatim between
# the Spark (F.expr) and DuckDB sides, so the double trees are identical.

# Wide cast-quantizer, no floor(): Spark's floor(DOUBLE) returns LONG and
# saturates at 2^63 while this term reaches ~1.9e20 micro-units at sf100k
# (ADVICE r10). CAST-to-DECIMAL(38,0) rounds to nearest in both engines;
# the +1e-5 shifts exact .5 ties off the boundary (Spark HALF_UP vs
# DuckDB half-even only disagree there), so the quantizer is by
# construction identical cross-engine and never overflows until 10^38.
_BG_TERM_MICRO = (
    "CAST(CAST(CAST(sg AS DECIMAL(19,0)) * CAST(sg AS DECIMAL(19,0))"
    " AS DOUBLE) / CAST(ng AS DOUBLE) * 1000000.0 + 0.00001"
    " AS DECIMAL(38,0))"
)
_SSB = (
    "(CAST(bmicro AS DOUBLE) / 1000000.0"
    " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
)
_SSW = "(CAST(q AS DOUBLE) - CAST(bmicro AS DOUBLE) / 1000000.0)"
_F_STAT = (
    f"(({_SSB} / (CAST(k AS DOUBLE) - 1.0))"
    f" / ({_SSW} / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))))"
)


def _f_from_group_moments(per: DataFrame) -> DataFrame:
    """One-row (k, n, ssb_r, ssw_r, f_r) from per-group (ng, sg, qg)."""
    tot = per.groupBy().agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ng").alias("n"),
        F.sum("sg").alias("s"),
        F.sum("qg").alias("q"),
        F.sum(F.expr(_BG_TERM_MICRO)).alias("bmicro"),
    )
    return tot.select(
        "k",
        "n",
        pround(F.expr(_SSB), 4).alias("ssb_r"),
        pround(F.expr(_SSW), 4).alias("ssw_r"),
        pround(F.expr(_F_STAT), 6).alias("f_r"),
    )


def _f_tail_sql() -> str:
    """The DuckDB rendering of :func:`_f_from_group_moments`, reading a CTE
    named ``per(g, ng, sg, qg)``."""
    return f"""
tot AS (
    SELECT CAST(count(*) AS BIGINT) AS k,
           CAST(sum(ng) AS BIGINT) AS n,
           CAST(sum(sg) AS BIGINT) AS s,
           CAST(sum(qg) AS BIGINT) AS q,
           CAST(sum({_BG_TERM_MICRO}) AS DECIMAL(38,0)) AS bmicro
    FROM per
)
SELECT k, n,
       {pround_sql(_SSB, 4)} AS ssb_r,
       {pround_sql(_SSW, 4)} AS ssw_r,
       {pround_sql(_F_STAT, 6)} AS f_r
FROM tot
"""


def q_anova_oneway_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F of l_quantity across l_returnflag — the parametric
    companion to ``kruskal_wallis_h``. One corpus aggregate to the 3-row
    group-moment frame; SSB/SSW/F from exact BIGINT (n, Σy, Σy²) with the
    between-group term micro-quantized (module doc)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").cast("long").alias("y"),
    )
    per = li.groupBy("g").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("y").alias("sg"),
        F.sum(F.col("y") * F.col("y")).alias("qg"),
    )
    return _f_from_group_moments(per)


def _anova_sql() -> str:
    return f"""
WITH li AS (
    SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS y FROM lineitem
), per AS (
    SELECT g, CAST(count(*) AS BIGINT) AS ng,
           CAST(sum(y) AS BIGINT) AS sg,
           CAST(sum(y * y) AS BIGINT) AS qg
    FROM li GROUP BY g
), {_f_tail_sql()}
"""


def q_levene_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe variance-homogeneity test: ANOVA F on |y − median_g|.

    The per-group median comes from the value-bounded quantity grid
    (≤ 50 rows per group, keyed cumulative window) as the exact DOUBLED
    median m2 = v_lo + v_hi — lo/hi the two middle order statistics — so
    the deviation |2y − m2| is an exact integer and every group moment
    stays BIGINT. F is scale-invariant, so F(|2y − m2|) == F(|y − m|)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").cast("long").alias("v"),
    )
    grid = li.groupBy("g", "v").agg(F.count(F.lit(1)).alias("t"))
    wc = Window.partitionBy("g").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cumg = grid.withColumn("cum", F.sum("t").over(wc))
    ngs = grid.groupBy("g").agg(F.sum("t").alias("ng0"))
    med = (
        cumg.join(F.broadcast(ngs), "g")
        .groupBy("g")
        .agg(
            (
                F.min(F.when(F.col("cum") >= F.expr("(ng0 + 1) DIV 2"), F.col("v")))
                + F.min(F.when(F.col("cum") >= F.expr("ng0 DIV 2 + 1"), F.col("v")))
            ).alias("m2")
        )
    )
    z = grid.join(F.broadcast(med), "g").withColumn(
        "z", F.abs(2 * F.col("v") - F.col("m2"))
    )
    per = z.groupBy("g").agg(
        F.sum("t").alias("ng"),
        F.sum(F.col("t") * F.col("z")).alias("sg"),
        F.sum(F.col("t") * F.col("z") * F.col("z")).alias("qg"),
    )
    return _f_from_group_moments(per)


def _levene_sql() -> str:
    return f"""
WITH li AS (
    SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v FROM lineitem
), grid AS (
    SELECT g, v, CAST(count(*) AS BIGINT) AS t FROM li GROUP BY g, v
), cumg AS (
    SELECT g, v, t,
           CAST(sum(t) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
    FROM grid
), ngs AS (
    SELECT g, CAST(sum(t) AS BIGINT) AS ng0 FROM grid GROUP BY g
), med AS (
    SELECT c.g,
           min(CASE WHEN cum >= (ng0 + 1) // 2 THEN v END)
           + min(CASE WHEN cum >= ng0 // 2 + 1 THEN v END) AS m2
    FROM cumg c JOIN ngs USING (g) GROUP BY c.g
), devs AS (
    SELECT grid.g AS g, t, abs(2 * v - m2) AS z
    FROM grid JOIN med ON grid.g = med.g
), per AS (
    SELECT g, CAST(sum(t) AS BIGINT) AS ng,
           CAST(sum(t * z) AS BIGINT) AS sg,
           CAST(sum(t * z * z) AS BIGINT) AS qg
    FROM devs GROUP BY g
), {_f_tail_sql()}
"""


# --------------------------------------------------------------------------
# Jonckheere–Terpstra ordered-trend test (grid-pair Mann-Whitney counts)
# --------------------------------------------------------------------------

# Doubled pair-count identity on the per-group value grid: with c_i(v) the
# group-i tie count at value v and C_i(v) its keyed cumulative,
#   2·U_ij = Σ_v c_j(v) · (2·C_i(v) − c_i(v))
# (each j-row at v counts 2 per strictly-smaller i-row and 1 per tied one),
# so 2·JT = Σ_{i<j} 2·U_ij is one bounded grid join. C_i(v) must be defined
# at EVERY pooled value v with c_j(v) > 0 — including values absent from
# group i's own support, where c_i(v)=0 but C_i(v) (the count of group-i
# values < v) is generally nonzero — so each group's cumulative is
# DENSIFIED onto the pooled distinct-value frame (groups × pooled-values
# left join, still the same bounded grid) before the pair join. A sparse
# equi-join on group-i support alone silently drops those terms (it only
# "worked" on l_quantity because every group covers the dense 1..50
# domain); ``test_jonckheere_sparse_support`` pins the fix. DECIMAL(38,0)
# accumulation: the tie-variance products are n³-scale and pass int64
# around sf1 (the Spearman/ols discipline, plans/stats_inference.py).

_JT_E2 = (
    "((CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(sum_g2 AS DOUBLE)) / 2.0)"
)
_JT_VAR = (
    "((CAST(an AS DOUBLE) - CAST(agx AS DOUBLE) - CAST(atx AS DOUBLE)) / 72.0"
    " + CAST(bgx AS DOUBLE) * CAST(btx AS DOUBLE)"
    " / (36.0 * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)"
    " * (CAST(n AS DOUBLE) - 2.0))"
    " + CAST(cgx AS DOUBLE) * CAST(ctx AS DOUBLE)"
    " / (8.0 * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))"
)
_JT_Z = f"((CAST(jt2 AS DOUBLE) - {_JT_E2}) / (2.0 * sqrt({_JT_VAR})))"


def _tie_poly(col: str, duck: bool) -> dict[str, str]:
    """The three Hollander–Wolfe tie polynomials of a BIGINT count column,
    accumulated 128-bit-exact. The WIDE type differs per engine — Spark
    caps chained DECIMAL(19,0) products at DECIMAL(38,0) (values ≤ ~n³
    fit), while DuckDB's decimal binder rejects >38-digit product widths,
    so the DuckDB side uses HUGEINT — but both are exact integers, so the
    final CAST(… AS DOUBLE) is the identical value on both engines."""
    wide = "HUGEINT" if duck else "DECIMAL(19,0)"
    d = f"CAST({col} AS {wide})"
    d1 = f"CAST({col} - 1 AS {wide})"
    out = "HUGEINT" if duck else "DECIMAL(38,0)"
    return {
        "a": f"CAST(sum({d} * {d1} * CAST(2 * {col} + 5 AS {wide})) AS {out})",
        "b": f"CAST(sum({d} * {d1} * CAST({col} - 2 AS {wide})) AS {out})",
        "c": f"CAST(sum({d} * {d1}) AS {out})",
    }


def jt_stats_from_gv(gv: DataFrame) -> DataFrame:
    """Jonckheere–Terpstra core over a ``(g, v)`` long-typed observation
    frame: returns the 1-row frame with n, jt2, and the z statistic. The
    group cumulatives are densified onto the pooled distinct-value grid
    (module comment) so sparse per-group supports are handled exactly."""
    grid = gv.groupBy("g", "v").agg(F.count(F.lit(1)).alias("c"))
    dense = (
        grid.select("g")
        .distinct()
        .crossJoin(grid.select("v").distinct())
        .join(grid, ["g", "v"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0).cast("long")))
    )
    wc = Window.partitionBy("g").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cumg = dense.withColumn("cc", F.sum("c").over(wc))
    gi = cumg.select(
        F.col("g").alias("g_i"),
        F.col("v").alias("v_i"),
        F.col("c").alias("c_i"),
        F.col("cc").alias("cc_i"),
    )
    gj = grid.select(F.col("g").alias("g_j"), "v", F.col("c").alias("c_j"))
    jt = (
        gj.join(
            F.broadcast(gi),
            (F.col("v") == F.col("v_i")) & (F.col("g_i") < F.col("g_j")),
        )
        .groupBy()
        .agg(
            F.coalesce(
                F.sum(
                    F.expr(
                        "CAST(c_j AS DECIMAL(19,0))"
                        " * CAST(2 * cc_i - c_i AS DECIMAL(19,0))"
                    )
                ),
                F.lit(0),
            ).cast("decimal(38,0)").alias("jt2")
        )
    )
    ngs = grid.groupBy("g").agg(F.sum("c").alias("ng"))
    gp = _tie_poly("ng", duck=False)
    gstats = ngs.groupBy().agg(
        F.expr(
            "CAST(sum(CAST(ng AS DECIMAL(19,0)) * CAST(ng AS DECIMAL(19,0)))"
            " AS DECIMAL(38,0))"
        ).alias("sum_g2"),
        F.expr(gp["a"]).alias("agx"),
        F.expr(gp["b"]).alias("bgx"),
        F.expr(gp["c"]).alias("cgx"),
    )
    tvs = grid.groupBy("v").agg(F.sum("c").alias("tv"))
    tp = _tie_poly("tv", duck=False)
    tstats = tvs.groupBy().agg(
        F.expr(tp["a"]).alias("atx"),
        F.expr(tp["b"]).alias("btx"),
        F.expr(tp["c"]).alias("ctx"),
    )
    nn = grid.groupBy().agg(F.sum("c").alias("n"))
    fin = (
        jt.crossJoin(F.broadcast(gstats))
        .crossJoin(F.broadcast(tstats))
        .crossJoin(F.broadcast(nn))
        .withColumn(
            "an",
            F.expr(
                "CAST(n AS DECIMAL(19,0)) * CAST(n - 1 AS DECIMAL(19,0))"
                " * CAST(2 * n + 5 AS DECIMAL(19,0))"
            ).cast("decimal(38,0)"),
        )
        .withColumn("z", F.expr(_JT_Z))
    )
    return fin


def q_jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere–Terpstra test for an ordered quantity trend across the
    five order-priority groups (1-URGENT < … < 5-LOW): the directional
    refinement of ``kruskal_wallis_h``. 2·JT from the doubled pair-count
    identity on the ≤ 250-cell (group × quantity) grid with per-group
    cumulatives densified onto the pooled value frame (module comment);
    mean and the FULL tie-corrected variance from DECIMAL(38,0)-exact group
    and tie polynomials; z → Zelen-Severo two-sided p."""
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("g"),
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_quantity").cast("long").alias("v"),
    )
    fin = jt_stats_from_gv(li.join(o, "ok").select("g", "v"))
    return fin.select(
        "n",
        pround(F.col("z"), 6).alias("z_r"),
        pround(F.expr(two_sided_p_sql("z")), 8).alias("p_r"),
    )


def _jt_sql() -> str:
    gp = _tie_poly("ng", duck=True)
    tp = _tie_poly("tv", duck=True)
    return f"""
WITH j AS (
    SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS g,
           CAST(l_quantity AS BIGINT) AS v
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), grid AS (
    SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM j GROUP BY g, v
), dense AS (
    -- densify each group's cumulative onto the POOLED value frame so
    -- C_i(v) exists at j-values outside group i's own support
    SELECT gs.g, vals.v, CAST(COALESCE(grid.c, 0) AS BIGINT) AS c
    FROM (SELECT DISTINCT g FROM grid) gs
    CROSS JOIN (SELECT DISTINCT v FROM grid) vals
    LEFT JOIN grid ON grid.g = gs.g AND grid.v = vals.v
), cumg AS (
    SELECT g, v, c,
           CAST(sum(c) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cc
    FROM dense
), jt AS (
    SELECT CAST(COALESCE(sum(CAST(gj.c AS DECIMAL(19,0))
               * CAST(2 * gi.cc - gi.c AS DECIMAL(19,0))), 0)
           AS DECIMAL(38,0)) AS jt2
    FROM grid gj JOIN cumg gi ON gi.v = gj.v AND gi.g < gj.g
), ngs AS (
    SELECT g, CAST(sum(c) AS BIGINT) AS ng FROM grid GROUP BY g
), gstats AS (
    SELECT CAST(sum(CAST(ng AS DECIMAL(19,0)) * CAST(ng AS DECIMAL(19,0)))
               AS DECIMAL(38,0)) AS sum_g2,
           {gp['a']} AS agx, {gp['b']} AS bgx, {gp['c']} AS cgx
    FROM ngs
), tvs AS (
    SELECT v, CAST(sum(c) AS BIGINT) AS tv FROM grid GROUP BY v
), tstats AS (
    SELECT {tp['a']} AS atx, {tp['b']} AS btx, {tp['c']} AS ctx FROM tvs
), nn AS (
    SELECT CAST(sum(c) AS BIGINT) AS n FROM grid
), fin AS (
    SELECT n, jt2, sum_g2, agx, bgx, cgx, atx, btx, ctx,
           CAST(CAST(n AS HUGEINT) * CAST(n - 1 AS HUGEINT)
                * CAST(2 * n + 5 AS HUGEINT) AS HUGEINT) AS an
    FROM jt, gstats, tstats, nn
), zrow AS (
    SELECT n, {_JT_Z} AS z FROM fin
)
SELECT n, {pround_sql('z', 6)} AS z_r,
       {pround_sql(two_sided_p_sql('z'), 8)} AS p_r
FROM zrow
"""


# --------------------------------------------------------------------------
# Mutual information / normalized MI (nano-unit term sums on the cell grid)
# --------------------------------------------------------------------------

_MI_TERM_NANO = (
    "CAST(floor((CAST(o AS DOUBLE) / CAST(n AS DOUBLE))"
    " * ln(CAST(o AS DOUBLE) * CAST(n AS DOUBLE)"
    " / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))) * 1000000000.0 + 0.5)"
    " AS BIGINT)"
)
_H_TERM_NANO = (
    "CAST(floor(-(CAST({m} AS DOUBLE) / CAST(n AS DOUBLE))"
    " * ln(CAST({m} AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000000.0 + 0.5)"
    " AS BIGINT)"
)
_NMI = (
    "(CAST(mi_nano AS DOUBLE)"
    " / sqrt(CAST(hr_nano AS DOUBLE) * CAST(hc_nano AS DOUBLE)))"
)


def q_mutual_information_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information and normalized MI between l_returnflag and
    l_linestatus — the information-theoretic association measure next to
    the chi-square test and Cramér's V. One corpus aggregate to the ≤ 3×2
    cell grid; each p·ln(p/(p·p)) term is quantized to integer NANO-units
    before the ≤ 6-term sum (order-insensitive; ln noise ~1e-16 ≪ the 1e-9
    grid), marginal entropies the same way; NMI = MI/√(H_row·H_col)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("rf"), F.col("l_linestatus").alias("ls")
    )
    cells = li.groupBy("rf", "ls").agg(F.count(F.lit(1)).alias("o"))
    rows = cells.groupBy("rf").agg(F.sum("o").alias("rt"))
    cols = cells.groupBy("ls").agg(F.sum("o").alias("ct"))
    tot = cells.groupBy().agg(F.sum("o").alias("n"))
    mi = (
        cells.join(F.broadcast(rows), "rf")
        .join(F.broadcast(cols), "ls")
        .crossJoin(F.broadcast(tot))
        .groupBy("n")
        .agg(F.sum(F.expr(_MI_TERM_NANO)).alias("mi_nano"))
    )
    hr = rows.crossJoin(F.broadcast(tot)).groupBy().agg(
        F.sum(F.expr(_H_TERM_NANO.format(m="rt"))).alias("hr_nano")
    )
    hc = cols.crossJoin(F.broadcast(tot)).groupBy().agg(
        F.sum(F.expr(_H_TERM_NANO.format(m="ct"))).alias("hc_nano")
    )
    fin = mi.crossJoin(F.broadcast(hr)).crossJoin(F.broadcast(hc))
    return fin.select(
        "n",
        pround(F.expr("CAST(mi_nano AS DOUBLE) / 1000000000.0"), 6).alias("mi_r"),
        pround(F.expr("CAST(hr_nano AS DOUBLE) / 1000000000.0"), 6).alias("h_row_r"),
        pround(F.expr("CAST(hc_nano AS DOUBLE) / 1000000000.0"), 6).alias("h_col_r"),
        pround(F.expr(_NMI), 6).alias("nmi_r"),
    )


def _mi_sql() -> str:
    return f"""
WITH li AS (
    SELECT l_returnflag AS rf, l_linestatus AS ls FROM lineitem
), cells AS (
    SELECT rf, ls, CAST(count(*) AS BIGINT) AS o FROM li GROUP BY rf, ls
), rows_m AS (
    SELECT rf, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY rf
), cols_m AS (
    SELECT ls, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY ls
), tot AS (
    SELECT CAST(sum(o) AS BIGINT) AS n FROM cells
), mi AS (
    SELECT n, CAST(sum({_MI_TERM_NANO}) AS BIGINT) AS mi_nano
    FROM cells JOIN rows_m USING (rf) JOIN cols_m USING (ls), tot
    GROUP BY n
), hr AS (
    SELECT CAST(sum({_H_TERM_NANO.format(m='rt')}) AS BIGINT) AS hr_nano
    FROM rows_m, tot
), hc AS (
    SELECT CAST(sum({_H_TERM_NANO.format(m='ct')}) AS BIGINT) AS hc_nano
    FROM cols_m, tot
)
SELECT n,
       {pround_sql('CAST(mi_nano AS DOUBLE) / 1000000000.0', 6)} AS mi_r,
       {pround_sql('CAST(hr_nano AS DOUBLE) / 1000000000.0', 6)} AS h_row_r,
       {pround_sql('CAST(hc_nano AS DOUBLE) / 1000000000.0', 6)} AS h_col_r,
       {pround_sql(_NMI, 6)} AS nmi_r
FROM mi, hr, hc
"""


# --------------------------------------------------------------------------
# Wald SPRT on the daily purchase-rate stream (shared-literal llr tree)
# --------------------------------------------------------------------------

_SPRT_P0, _SPRT_P1 = 0.15, 0.20
_SPRT_ALPHA = _SPRT_BETA = 0.05
#: ln factors folded to Python double literals: both engines parse the same
#: repr, every llr is BIGINT·literal + BIGINT·literal — bit-identical IEEE.
_L_CONV = repr(math.log(_SPRT_P1 / _SPRT_P0))
_L_MISS = repr(math.log((1.0 - _SPRT_P1) / (1.0 - _SPRT_P0)))
_A_UPPER = repr(math.log((1.0 - _SPRT_BETA) / _SPRT_ALPHA))
_B_LOWER = repr(math.log(_SPRT_BETA / (1.0 - _SPRT_ALPHA)))
_LLR = (
    f"(CAST(cc AS DOUBLE) * {_L_CONV}"
    f" + (CAST(nc AS DOUBLE) - CAST(cc AS DOUBLE)) * {_L_MISS})"
)


def _sprt_from_daily(daily: DataFrame) -> DataFrame:
    """SPRT decision readout from a (d, ne, nconv) day grid — shared by the
    batch spec and its LIVE streaming-parity twin."""
    wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    llr = daily.select(
        "d",
        F.sum("ne").over(wcum).alias("nc"),
        F.sum("nconv").over(wcum).alias("cc"),
    ).withColumn("llr", F.expr(_LLR))
    agg = llr.groupBy().agg(
        F.min(F.when(F.col("llr") >= F.lit(float(_A_UPPER)), F.col("d"))).alias("d_h1"),
        F.min(F.when(F.col("llr") <= F.lit(float(_B_LOWER)), F.col("d"))).alias("d_h0"),
        F.max_by("llr", "d").alias("llr_last"),
        F.max("nc").alias("n"),
        F.max("cc").alias("conv"),
    )
    return agg.select(
        F.expr(
            "CASE WHEN d_h1 IS NOT NULL AND (d_h0 IS NULL OR d_h1 <= d_h0)"
            " THEN 'accept_h1'"
            " WHEN d_h0 IS NOT NULL THEN 'accept_h0' ELSE 'continue' END"
        ).alias("decision"),
        F.expr(
            "CASE WHEN d_h1 IS NOT NULL AND (d_h0 IS NULL OR d_h1 <= d_h0)"
            " THEN d_h1 ELSE d_h0 END"
        ).alias("decision_day"),
        pround(F.col("llr_last"), 6).alias("llr_last_r"),
        "n",
        "conv",
    )


def q_sprt_ab_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's SPRT monitoring the purchase rate day by day: H₀ p=0.15 vs
    H₁ p=0.20, α=β=0.05 — the sequential companion to ``ab_srm_guard`` /
    ``ab_test_z_score`` (peeking-safe early stopping). One corpus aggregate
    to the day grid; cumulative (events, purchases) are exact BIGINTs, the
    llr is a shared-literal double tree (module constant), and the decision
    is the earliest day the llr leaves (B, A)."""
    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))).alias("d"),
            (F.col("event_type") == "purchase").cast("long").alias("conv"),
        )
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("ne"), F.sum("conv").alias("nconv"))
    )
    return _sprt_from_daily(daily)


def _sprt_sql() -> str:
    return f"""
WITH daily AS (
    SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
           CAST(count(*) AS BIGINT) AS ne,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS nconv
    FROM events GROUP BY 1
), cum AS (
    SELECT d,
           CAST(sum(ne) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS nc,
           CAST(sum(nconv) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cc
    FROM daily
), llr AS (
    SELECT d, nc, cc, {_LLR} AS llr FROM cum
), agg AS (
    SELECT min(CASE WHEN llr >= {_A_UPPER} THEN d END) AS d_h1,
           min(CASE WHEN llr <= {_B_LOWER} THEN d END) AS d_h0,
           arg_max(llr, d) AS llr_last,
           max(nc) AS n,
           max(cc) AS conv
    FROM llr
)
SELECT CASE WHEN d_h1 IS NOT NULL AND (d_h0 IS NULL OR d_h1 <= d_h0)
            THEN 'accept_h1'
            WHEN d_h0 IS NOT NULL THEN 'accept_h0' ELSE 'continue' END
           AS decision,
       CASE WHEN d_h1 IS NOT NULL AND (d_h0 IS NULL OR d_h1 <= d_h0)
            THEN d_h1 ELSE d_h0 END AS decision_day,
       {pround_sql('llr_last', 6)} AS llr_last_r,
       n, conv
FROM agg
"""


# --------------------------------------------------------------------------
# Hodges–Lehmann shift estimator (grid x grid pairwise-difference median)
# --------------------------------------------------------------------------


def q_hodges_lehmann_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges–Lehmann estimator of the R-vs-A quantity shift: the median of
    all n_R*n_A pairwise differences — the robust location companion to
    ``mann_whitney_u``. The pair multiset is never materialized: the two
    value grids (<= 50 rows each) cross-join to the <= 99-row difference
    grid with BIGINT pair weights, and the weighted median comes off one
    bounded cumulative window; the DOUBLED median (d_lo + d_hi) keeps the
    answer integer-exact through the even-N average."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("v")
    )
    ga = (
        li.filter(F.col("l_returnflag") == "A")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("ca"))
        .select(F.col("v").alias("va"), "ca")
    )
    gr = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cr"))
        .select(F.col("v").alias("vr"), "cr")
    )
    dgrid = (
        gr.crossJoin(F.broadcast(ga))
        .select(
            (F.col("vr") - F.col("va")).alias("d"),
            (F.col("cr") * F.col("ca")).alias("w"),
        )
        .groupBy("d")
        .agg(F.sum("w").alias("w"))
    )
    wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = dgrid.withColumn("cum", F.sum("w").over(wcum))
    tot = dgrid.groupBy().agg(F.sum("w").alias("np"))
    fin = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("np")
        .agg(
            F.min(F.when(F.col("cum") >= F.expr("(np + 1) DIV 2"), F.col("d"))).alias("d_lo"),
            F.min(F.when(F.col("cum") >= F.expr("np DIV 2 + 1"), F.col("d"))).alias("d_hi"),
        )
    )
    return fin.select(
        F.col("np").alias("n_pairs"),
        "d_lo",
        "d_hi",
        (F.expr("CAST(d_lo + d_hi AS DOUBLE)") / F.lit(2.0)).alias("hl_shift"),
    )


_HL_SQL = """
WITH li AS (
    SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v FROM lineitem
), ga AS (
    SELECT v AS va, CAST(count(*) AS BIGINT) AS ca FROM li WHERE g = 'A' GROUP BY v
), gr AS (
    SELECT v AS vr, CAST(count(*) AS BIGINT) AS cr FROM li WHERE g = 'R' GROUP BY v
), dgrid AS (
    SELECT vr - va AS d, CAST(sum(cr * ca) AS BIGINT) AS w
    FROM gr, ga GROUP BY vr - va
), cum AS (
    SELECT d, CAST(sum(w) OVER (ORDER BY d
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
    FROM dgrid
), tot AS (
    SELECT CAST(sum(w) AS BIGINT) AS np FROM dgrid
), fin AS (
    SELECT np,
           min(CASE WHEN cum >= (np + 1) // 2 THEN d END) AS d_lo,
           min(CASE WHEN cum >= np // 2 + 1 THEN d END) AS d_hi
    FROM cum, tot GROUP BY np
)
SELECT np AS n_pairs, d_lo, d_hi, CAST(d_lo + d_hi AS DOUBLE) / 2.0 AS hl_shift
FROM fin
"""


# --------------------------------------------------------------------------
# Deterministic RANSAC line fit (hash-seeded candidates, exact inlier test)
# --------------------------------------------------------------------------

_RANSAC_K = 32  # sample rows -> 16 candidate lines
_RANSAC_TOL_CENTS = 50_000  # +-$500 inlier band


def q_ransac_line_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANSAC robust line fit of extendedprice ~ quantity with every source
    of randomness replaced by the portable hash (``functions/hashing``):
    the 32 sample rows are the corpus-wide minima of hash64(orderkey-line)
    — a top-k, never a sort — paired in hash order into 16 candidate
    lines; the inlier test clears denominators so it is exact BIGINT
    arithmetic (|y*dx - y1*dx - dy*(x-x1)| <= tol*|dx|), evaluated as one
    broadcast nested-loop pass over the corpus (map-only, no shuffle);
    best candidate by (inliers DESC, id ASC). Cited next to the reference's
    random draws (`/root/reference` generator): same determinism policy."""
    from projet_data_infrastructure_spark.functions.hashing import hash64

    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        F.col("l_quantity").cast("long").alias("x"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long").alias("y"),
    )
    keyed = li.withColumn(
        "h", hash64(F.concat_ws("-", F.col("ok"), F.col("ln")))
    )
    sample = keyed.orderBy("h", "ok", "ln").limit(_RANSAC_K)
    numbered = sample.withColumn(
        "rn", F.row_number().over(Window.orderBy("h", "ok", "ln"))
    )
    cands = (
        numbered.groupBy(F.expr("(rn + 1) DIV 2").alias("cand"))
        .agg(
            F.max(F.when(F.col("rn") % 2 == 1, F.col("x"))).alias("x1"),
            F.max(F.when(F.col("rn") % 2 == 1, F.col("y"))).alias("y1"),
            F.max(F.when(F.col("rn") % 2 == 0, F.col("x"))).alias("x2"),
            F.max(F.when(F.col("rn") % 2 == 0, F.col("y"))).alias("y2"),
        )
        .filter(F.col("x1") != F.col("x2"))
        .select(
            "cand",
            "x1",
            "y1",
            (F.col("x2") - F.col("x1")).alias("dx"),
            (F.col("y2") - F.col("y1")).alias("dy"),
        )
    )
    scored = (
        li.crossJoin(F.broadcast(cands))
        .select(
            "cand",
            "x1",
            "y1",
            "dx",
            "dy",
            (
                F.abs(
                    F.col("y") * F.col("dx")
                    - F.col("y1") * F.col("dx")
                    - F.col("dy") * (F.col("x") - F.col("x1"))
                )
                <= F.lit(_RANSAC_TOL_CENTS) * F.abs(F.col("dx"))
            ).cast("long").alias("inl"),
        )
        .groupBy("cand", "x1", "y1", "dx", "dy")
        .agg(F.sum("inl").alias("inliers"), F.count(F.lit(1)).alias("n"))
    )
    best = scored.orderBy(F.col("inliers").desc(), F.col("cand").asc()).limit(1)
    return best.select(
        "cand",
        "inliers",
        "n",
        pround(
            F.expr("CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE) / 100.0"), 4
        ).alias("slope_usd_r"),
        pround(
            F.expr(
                "(CAST(y1 AS DOUBLE) - CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE)"
                " * CAST(x1 AS DOUBLE)) / 100.0"
            ),
            4,
        ).alias("intercept_usd_r"),
    )


def _ransac_sql() -> str:
    from projet_data_infrastructure_spark.functions.hashing import hash64_sql

    h = hash64_sql("CAST(ok AS VARCHAR) || '-' || CAST(ln AS VARCHAR)")
    return f"""
WITH li AS (
    SELECT l_orderkey AS ok, l_linenumber AS ln,
           CAST(l_quantity AS BIGINT) AS x,
           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
    FROM lineitem
), keyed AS (
    SELECT ok, ln, x, y, {h} AS h FROM li
), sample_rows AS (
    SELECT * FROM keyed ORDER BY h, ok, ln LIMIT {_RANSAC_K}
), numbered AS (
    SELECT x, y, row_number() OVER (ORDER BY h, ok, ln) AS rn FROM sample_rows
), cands AS (
    SELECT (rn + 1) // 2 AS cand,
           max(CASE WHEN rn % 2 = 1 THEN x END) AS x1,
           max(CASE WHEN rn % 2 = 1 THEN y END) AS y1,
           max(CASE WHEN rn % 2 = 0 THEN x END) AS x2,
           max(CASE WHEN rn % 2 = 0 THEN y END) AS y2
    FROM numbered GROUP BY 1
), lines AS (
    SELECT cand, x1, y1, x2 - x1 AS dx, y2 - y1 AS dy
    FROM cands WHERE x1 != x2
), scored AS (
    SELECT cand, x1, y1, dx, dy,
           CAST(sum(CASE WHEN abs(y * dx - y1 * dx - dy * (x - x1))
                              <= {_RANSAC_TOL_CENTS} * abs(dx)
                         THEN 1 ELSE 0 END) AS BIGINT) AS inliers,
           CAST(count(*) AS BIGINT) AS n
    FROM li, lines
    GROUP BY cand, x1, y1, dx, dy
), best AS (
    SELECT * FROM scored ORDER BY inliers DESC, cand ASC LIMIT 1
)
SELECT cand, inliers, n,
       {pround_sql('CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE) / 100.0', 4)}
           AS slope_usd_r,
       {pround_sql(
           '(CAST(y1 AS DOUBLE) - CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE)'
           ' * CAST(x1 AS DOUBLE)) / 100.0', 4)}
           AS intercept_usd_r
FROM best
"""


# --------------------------------------------------------------------------
# Logistic regression via IRLS on the value grid (3 unrolled Newton steps)
# --------------------------------------------------------------------------
#
# P(return | quantity) = sigmoid(w0 + w1*qty). The corpus collapses to the
# <= 100-cell (quantity, label) grid in ONE aggregate; each IRLS step is
# then a grid-sized aggregate of micro-quantized weighted moments (the
# chisq discipline: quantize each cell's double term to an integer BEFORE
# the sum, so accumulation order cannot matter), and the Newton solve of
# the 2x2 system runs on one row. Three steps unrolled identically on both
# engines; the shared 1e6 factor in all five moments cancels in the ratios.

_LOGIT_P = "(1.0 / (1.0 + exp(-(w0 + w1 * CAST(x AS DOUBLE)))))"


def _q6(e: str) -> str:
    # Wide cast-quantizer (the _BG_TERM_MICRO discipline): the swxx cell
    # terms approach int64 near sf100k and a BIGINT sum accumulator wraps
    # around sf7000 (ADVICE r10); DECIMAL(38,0) terms + accumulators are
    # exact to 10^38, and the +1e-5 keeps exact .5 ties off the
    # HALF_UP-vs-half-even boundary.
    return f"CAST(({e}) * 1000000.0 + 0.00001 AS DECIMAL(38,0))"


_IRLS_TERMS = {
    "sw": _q6(f"CAST(c AS DOUBLE) * {_LOGIT_P} * (1.0 - {_LOGIT_P})"),
    "swx": _q6(
        f"CAST(c AS DOUBLE) * {_LOGIT_P} * (1.0 - {_LOGIT_P}) * CAST(x AS DOUBLE)"
    ),
    "swxx": _q6(
        f"CAST(c AS DOUBLE) * {_LOGIT_P} * (1.0 - {_LOGIT_P})"
        " * CAST(x AS DOUBLE) * CAST(x AS DOUBLE)"
    ),
    "g0": _q6(f"CAST(c AS DOUBLE) * (CAST(y AS DOUBLE) - {_LOGIT_P})"),
    "g1": _q6(
        f"CAST(c AS DOUBLE) * (CAST(y AS DOUBLE) - {_LOGIT_P}) * CAST(x AS DOUBLE)"
    ),
}
_IRLS_DET = (
    "(CAST(sw AS DOUBLE) * CAST(swxx AS DOUBLE)"
    " - CAST(swx AS DOUBLE) * CAST(swx AS DOUBLE))"
)
_IRLS_NW0 = (
    f"(w0 + (CAST(swxx AS DOUBLE) * CAST(g0 AS DOUBLE)"
    f" - CAST(swx AS DOUBLE) * CAST(g1 AS DOUBLE)) / {_IRLS_DET})"
)
_IRLS_NW1 = (
    f"(w1 + (CAST(sw AS DOUBLE) * CAST(g1 AS DOUBLE)"
    f" - CAST(swx AS DOUBLE) * CAST(g0 AS DOUBLE)) / {_IRLS_DET})"
)
_IRLS_LL = _q6(
    f"CAST(c AS DOUBLE) * (CAST(y AS DOUBLE) * ln({_LOGIT_P})"
    f" + (1.0 - CAST(y AS DOUBLE)) * ln(1.0 - {_LOGIT_P}))"
)
_IRLS_STEPS = 3


def q_logistic_irls_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression of (l_returnflag = 'R') on l_quantity, fit with
    three unrolled IRLS/Newton steps on the ≤ 100-cell value grid (module
    comment). Output: n, the fitted weights, and the final log-likelihood —
    every moment micro-quantized so both engines sum identical integers."""
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("x"),
        (F.col("l_returnflag") == "R").cast("long").alias("y"),
    )
    grid = li.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c"))
    w = spark.range(1).select(F.lit(0.0).alias("w0"), F.lit(0.0).alias("w1"))
    for _ in range(_IRLS_STEPS):
        sums = (
            grid.crossJoin(F.broadcast(w))
            .groupBy("w0", "w1")
            .agg(*[F.sum(F.expr(t)).alias(k) for k, t in _IRLS_TERMS.items()])
        )
        w = sums.select(
            F.expr(_IRLS_NW0).alias("w0"), F.expr(_IRLS_NW1).alias("w1")
        )
    fin = (
        grid.crossJoin(F.broadcast(w))
        .groupBy("w0", "w1")
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.expr(_IRLS_LL)).alias("ll_micro"),
        )
    )
    return fin.select(
        "n",
        pround(F.col("w0"), 6).alias("w0_r"),
        pround(F.col("w1"), 6).alias("w1_r"),
        pround(F.expr("CAST(ll_micro AS DOUBLE) / 1000000.0"), 4).alias("ll_r"),
    )


def _logistic_sql() -> str:
    terms = ",\n           ".join(
        f"CAST(sum({t}) AS DECIMAL(38,0)) AS {k}" for k, t in _IRLS_TERMS.items()
    )
    ctes = [
        """
WITH li AS (
    SELECT CAST(l_quantity AS BIGINT) AS x,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
    FROM lineitem
), grid AS (
    SELECT x, y, CAST(count(*) AS BIGINT) AS c FROM li GROUP BY x, y
), it0 AS (SELECT 0.0 AS w0, 0.0 AS w1)"""
    ]
    for i in range(_IRLS_STEPS):
        ctes.append(
            f""", s{i} AS (
    SELECT w0, w1, {terms}
    FROM grid, it{i} GROUP BY w0, w1
), it{i + 1} AS (
    SELECT {_IRLS_NW0} AS w0, {_IRLS_NW1} AS w1 FROM s{i}
)"""
        )
    ctes.append(
        f""", fin AS (
    SELECT w0, w1, CAST(sum(c) AS BIGINT) AS n,
           CAST(sum({_IRLS_LL}) AS DECIMAL(38,0)) AS ll_micro
    FROM grid, it{_IRLS_STEPS} GROUP BY w0, w1
)
SELECT n, {pround_sql('w0', 6)} AS w0_r, {pround_sql('w1', 6)} AS w1_r,
       {pround_sql('CAST(ll_micro AS DOUBLE) / 1000000.0', 4)} AS ll_r
FROM fin"""
    )
    return "".join(ctes)


# --------------------------------------------------------------------------
# Friedman test (blocked ranks, exact cross-multiplied comparisons)
# --------------------------------------------------------------------------
#
# Blocks = nations, treatments = the five order priorities, response = the
# block-cell mean quantity. Cell means are kept as EXACT integer fractions
# (sq, cnt) and ranked within each block by cross-multiplication
# (sq_a*cnt_b vs sq_b*cnt_a) — no floating comparison anywhere — via a
# <= (25*5*5)-row within-block pair join. DOUBLED average ranks
# r2 = 2*less + eq_others + 2 stay integer through ties; only the final
# chi-square converts to double.

_FRIEDMAN_CHI2 = (
    "(12.0 / (CAST(nb AS DOUBLE) * CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0))"
    " * (CAST(sum_r2sq AS DOUBLE) / 4.0)"
    " - 3.0 * CAST(nb AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0))"
)


def q_friedman_nation_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test: do the five order priorities rank consistently by
    mean line quantity across nation blocks? The repeated-measures
    companion to ``kruskal_wallis_h`` (which ignores blocking). Exact
    integer ranking by cross-multiplication on the ≤ 125-cell
    (nation × priority) grid; blocks missing a treatment are dropped
    (complete-block design), k is derived from the data."""
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_custkey").alias("ck"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("p"),
    )
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"), F.col("c_nationkey").alias("nk")
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_quantity").cast("long").alias("v"),
    )
    cells = (
        li.join(o, "ok")
        .join(F.broadcast(c), "ck")
        .groupBy("nk", "p")
        .agg(F.sum("v").alias("sq"), F.count(F.lit(1)).alias("cnt"))
    )
    kk = cells.groupBy().agg(F.countDistinct("p").alias("k"))
    complete = (
        cells.groupBy("nk")
        .agg(F.count(F.lit(1)).alias("np"))
        .crossJoin(F.broadcast(kk))
        .filter(F.col("np") == F.col("k"))
        .select("nk")
    )
    cc = cells.join(F.broadcast(complete), "nk")
    a = cc.select(
        "nk", F.col("p").alias("pa"), F.col("sq").alias("sqa"), F.col("cnt").alias("ca")
    )
    b = cc.select(
        "nk", F.col("p").alias("pb"), F.col("sq").alias("sqb"), F.col("cnt").alias("cb")
    )
    pairs = a.join(F.broadcast(b), "nk").filter(F.col("pa") != F.col("pb"))
    r2 = pairs.groupBy("nk", "pa").agg(
        (
            2
            + 2 * F.sum((F.col("sqb") * F.col("ca") < F.col("sqa") * F.col("cb")).cast("long"))
            + F.sum((F.col("sqb") * F.col("ca") == F.col("sqa") * F.col("cb")).cast("long"))
        ).alias("r2")
    )
    rj = r2.groupBy("pa").agg(F.sum("r2").alias("r2j"), F.count(F.lit(1)).alias("nb"))
    fin = rj.groupBy("nb").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("r2j") * F.col("r2j")).alias("sum_r2sq"),
    )
    return fin.select(
        F.col("nb").cast("long").alias("n_blocks"),
        F.col("k").cast("long").alias("k"),
        pround(F.expr(_FRIEDMAN_CHI2), 6).alias("chi2_r"),
        (F.col("k") - 1).cast("long").alias("df"),
    )


def _friedman_sql() -> str:
    return f"""
WITH o AS (
    SELECT o_orderkey AS ok, o_custkey AS ck,
           CAST(substr(o_orderpriority, 1, 1) AS INT) AS p
    FROM orders
), cells AS (
    SELECT c_nationkey AS nk, p,
           CAST(sum(l_quantity) AS BIGINT) AS sq,
           CAST(count(*) AS BIGINT) AS cnt
    FROM lineitem JOIN o ON l_orderkey = ok JOIN customer ON ck = c_custkey
    GROUP BY 1, 2
), kk AS (
    SELECT CAST(count(DISTINCT p) AS BIGINT) AS k FROM cells
), complete AS (
    SELECT nk FROM cells, kk GROUP BY nk, k HAVING count(*) = k
), cc AS (
    SELECT cells.* FROM cells JOIN complete USING (nk)
), pairs AS (
    SELECT a.nk, a.p AS pa,
           CAST(sum(CASE WHEN b.sq * a.cnt < a.sq * b.cnt THEN 1 ELSE 0 END)
                AS BIGINT) AS less,
           CAST(sum(CASE WHEN b.sq * a.cnt = a.sq * b.cnt THEN 1 ELSE 0 END)
                AS BIGINT) AS eq
    FROM cc a JOIN cc b ON a.nk = b.nk AND a.p != b.p
    GROUP BY a.nk, a.p
), r2 AS (
    SELECT nk, pa, 2 + 2 * less + eq AS r2 FROM pairs
), rj AS (
    SELECT pa, CAST(sum(r2) AS BIGINT) AS r2j,
           CAST(count(*) AS BIGINT) AS nb
    FROM r2 GROUP BY pa
), fin AS (
    SELECT nb, CAST(count(*) AS BIGINT) AS k,
           CAST(sum(r2j * r2j) AS BIGINT) AS sum_r2sq
    FROM rj GROUP BY nb
)
SELECT nb AS n_blocks, k, {pround_sql(_FRIEDMAN_CHI2, 6)} AS chi2_r,
       k - 1 AS df
FROM fin
"""


# --------------------------------------------------------------------------
# Mantel–Haenszel stratified odds ratio + CMH test (nation strata)
# --------------------------------------------------------------------------
#
# Exposure = urgent order (priority 1-2), outcome = any lineitem returned,
# strata = customer nation: the confounding-adjusted association readout
# every experimentation/epidemiology pipeline runs where a pooled 2x2
# would Simpson-flip. One order-level aggregate, then a 25-stratum 2x2
# grid; the per-stratum a*d/n, b*c/n, E and V terms are micro-quantized
# before the stratum sums (the chisq discipline); the (a+b)(c+d)(a+c)(b+d)
# variance product goes through DOUBLE (it passes int64 near 1e6-row
# strata) — deterministically, as both engines convert the same BIGINTs.

_MH_NUM = _q6("CAST(a AS DOUBLE) * CAST(d AS DOUBLE) / CAST(n AS DOUBLE)")
_MH_DEN = _q6("CAST(b AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE)")
_MH_E = _q6(
    "CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE) / CAST(n AS DOUBLE)"
)
_MH_V = _q6(
    "CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE) * CAST(a + c AS DOUBLE)"
    " * CAST(b + d AS DOUBLE)"
    " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))"
)
_CMH_CHI2 = (
    "((abs(CAST(sa AS DOUBLE) - CAST(se AS DOUBLE) / 1000000.0) - 0.5)"
    " * (abs(CAST(sa AS DOUBLE) - CAST(se AS DOUBLE) / 1000000.0) - 0.5)"
    " / (CAST(sv AS DOUBLE) / 1000000.0))"
)


def q_mantel_haenszel_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel–Haenszel common odds ratio and the continuity-corrected CMH
    chi-square across nation strata (module comment). Output: strata count,
    MH odds ratio, CMH chi2 and its df=1 p-value (P(chi2>x) = 2*P(Z>sqrt x),
    the shared Zelen-Severo tree)."""
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_custkey").alias("ck"),
        (F.substring("o_orderpriority", 1, 1).cast("int") <= 2)
        .cast("int")
        .alias("e"),
    )
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"), F.col("c_nationkey").alias("nk")
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"),
        (F.col("l_returnflag") == "R").cast("int").alias("ret"),
    )
    per_order = li.groupBy("ok").agg(F.max("ret").alias("y"))
    t22 = (
        per_order.join(o, "ok")
        .join(F.broadcast(c), "ck")
        .groupBy("nk")
        .agg(
            F.sum(((F.col("e") == 1) & (F.col("y") == 1)).cast("long")).alias("a"),
            F.sum(((F.col("e") == 1) & (F.col("y") == 0)).cast("long")).alias("b"),
            F.sum(((F.col("e") == 0) & (F.col("y") == 1)).cast("long")).alias("c"),
            F.sum(((F.col("e") == 0) & (F.col("y") == 0)).cast("long")).alias("d"),
        )
        .withColumn("n", F.expr("a + b + c + d"))
        .filter(F.col("n") > 1)
    )
    agg = t22.groupBy().agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum("a").alias("sa"),
        F.sum(F.expr(_MH_NUM)).alias("snum"),
        F.sum(F.expr(_MH_DEN)).alias("sden"),
        F.sum(F.expr(_MH_E)).alias("se"),
        F.sum(F.expr(_MH_V)).alias("sv"),
    )
    fin = agg.withColumn("chi2", F.expr(_CMH_CHI2))
    return fin.select(
        "n_strata",
        pround(F.expr("CAST(snum AS DOUBLE) / CAST(sden AS DOUBLE)"), 6).alias(
            "or_mh_r"
        ),
        pround(F.col("chi2"), 6).alias("chi2_cmh_r"),
        pround(F.expr(two_sided_p_sql("sqrt(chi2)")), 8).alias("p_r"),
    )


def _mh_sql() -> str:
    return f"""
WITH per_order AS (
    SELECT l_orderkey AS ok, max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
           AS y
    FROM lineitem GROUP BY 1
), t22 AS (
    SELECT c_nationkey AS nk,
        CAST(sum(CASE WHEN CAST(substr(o_orderpriority,1,1) AS INT) <= 2
                       AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        CAST(sum(CASE WHEN CAST(substr(o_orderpriority,1,1) AS INT) <= 2
                       AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        CAST(sum(CASE WHEN CAST(substr(o_orderpriority,1,1) AS INT) > 2
                       AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        CAST(sum(CASE WHEN CAST(substr(o_orderpriority,1,1) AS INT) > 2
                       AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
    FROM per_order
    JOIN orders ON ok = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
), t22n AS (
    SELECT *, a + b + c + d AS n FROM t22 WHERE a + b + c + d > 1
), agg AS (
    SELECT CAST(count(*) AS BIGINT) AS n_strata,
           CAST(sum(a) AS BIGINT) AS sa,
           CAST(sum({_MH_NUM}) AS BIGINT) AS snum,
           CAST(sum({_MH_DEN}) AS BIGINT) AS sden,
           CAST(sum({_MH_E}) AS BIGINT) AS se,
           CAST(sum({_MH_V}) AS BIGINT) AS sv
    FROM t22n
), fin AS (
    SELECT n_strata, snum, sden, {_CMH_CHI2} AS chi2 FROM agg
)
SELECT n_strata,
       {pround_sql('CAST(snum AS DOUBLE) / CAST(sden AS DOUBLE)', 6)} AS or_mh_r,
       {pround_sql('chi2', 6)} AS chi2_cmh_r,
       {pround_sql(two_sided_p_sql('sqrt(chi2)'), 8)} AS p_r
FROM fin
"""


# --------------------------------------------------------------------------
# Two-sample Cramér–von Mises (integer ECDF-difference accumulation)
# --------------------------------------------------------------------------
#
# T = nA*nB/N^2 * sum over pooled observations of (F_A - F_B)^2. The
# integer form t_v * (nB*cumA - nA*cumB)^2 is exact but its inner products
# wrap int64 near sf2000 and the squared term exceeds even DECIMAL(38,0)
# beyond that (ADVICE r10), so the accumulation works in the NORMALIZED
# domain instead: each grid row's t_v * (cumA/nA - cumB/nB)^2 <= t_v is
# nano-quantized through the wide cast-quantizer (the _BG_TERM_MICRO
# discipline — identical expression text on both engines, so the double
# trees match bit-for-bit) and summed DECIMAL(38,0); the sum is <= N*1e9
# ~ 6e20 at sf100k, far inside the 10^38 envelope. The 1e-9 grid noise is
# ~1e3x below the pround(6) output resolution.

_CVM_NANO_TERM = (
    "CAST(CAST(ta + tb AS DOUBLE)"
    " * (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)"
    " - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))"
    " * (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)"
    " - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))"
    " * 1000000000.0 + 0.00001 AS DECIMAL(38,0))"
)
_CVM_T = (
    "(CAST(num AS DOUBLE) / 1000000000.0"
    " * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)"
    " / ((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))"
    " * (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))))"
)
_CVM_EXPECT = (
    "((1.0 + 1.0 / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))) / 6.0)"
)


def q_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér–von Mises statistic between the A and R quantity
    distributions — the omnibus ECDF-difference companion to the KS drift
    statistic (`ks_drift_statistic` weighs the max gap; CvM integrates all
    of it). Nano-quantized normalized ECDF-difference numerator on the
    ≤ 50-row pooled value grid (module comment — wide-safe to 10^38); the
    null expectation (1+1/N)/6 ships alongside so the readout is
    self-calibrating."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("v")
    )
    grid = (
        li.filter(F.col("l_returnflag").isin("A", "R"))
        .groupBy("v")
        .agg(
            F.sum((F.col("l_returnflag") == "A").cast("long")).alias("ta"),
            F.sum((F.col("l_returnflag") == "R").cast("long")).alias("tb"),
        )
    )
    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = grid.select(
        "v",
        "ta",
        "tb",
        F.sum("ta").over(wcum).alias("ca"),
        F.sum("tb").over(wcum).alias("cb"),
    )
    tot = grid.groupBy().agg(F.sum("ta").alias("na"), F.sum("tb").alias("nb"))
    num = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("na", "nb")
        .agg(
            F.sum(F.expr(_CVM_NANO_TERM)).cast("decimal(38,0)").alias("num")
        )
    )
    return num.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        pround(F.expr(_CVM_T), 6).alias("t_r"),
        pround(F.expr(_CVM_EXPECT), 6).alias("t_null_mean_r"),
    )


_CVM_SQL = f"""
WITH li AS (
    SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v
    FROM lineitem WHERE l_returnflag IN ('A', 'R')
), grid AS (
    SELECT v,
           CAST(sum(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ta,
           CAST(sum(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS tb
    FROM li GROUP BY v
), cum AS (
    SELECT v, ta, tb,
           CAST(sum(ta) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
           CAST(sum(tb) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cb
    FROM grid
), tot AS (
    SELECT CAST(sum(ta) AS BIGINT) AS na, CAST(sum(tb) AS BIGINT) AS nb
    FROM grid
), numer AS (
    SELECT na, nb,
           CAST(sum({_CVM_NANO_TERM}) AS DECIMAL(38,0)) AS num
    FROM cum, tot GROUP BY na, nb
)
SELECT na AS n_a, nb AS n_b,
       {pround_sql(_CVM_T, 6)} AS t_r,
       {pround_sql(_CVM_EXPECT, 6)} AS t_null_mean_r
FROM numer
"""


# --------------------------------------------------------------------------
# Poisson rate-ratio test (two-arm daily event rates)
# --------------------------------------------------------------------------

_RR_Z = (
    "((ln(CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE))"
    " - ln(CAST(e1 AS DOUBLE) / CAST(e0 AS DOUBLE)))"
    " / sqrt(1.0 / CAST(c1 AS DOUBLE) + 1.0 / CAST(c0 AS DOUBLE)))"
)
_RR = (
    "((CAST(c1 AS DOUBLE) / CAST(e1 AS DOUBLE))"
    " / (CAST(c0 AS DOUBLE) / CAST(e0 AS DOUBLE)))"
)


def q_poisson_rate_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-arm Poisson rate-ratio test on purchase events: arm = the hash
    split `ab_srm_guard` audits, exposure = user-days at risk (users in
    the arm × observed days), ln-rate-ratio z with the standard 1/c1+1/c0
    variance — the count-data companion to `mantel_haenszel_or` (binary
    outcomes) and `sprt_ab_decision` (sequential). One corpus aggregate;
    every input to the shared double tree is an exact BIGINT."""
    from projet_data_infrastructure_spark.functions.hashing import hash64

    ev = read_table(spark, sf_dir, "events")
    armed = ev.select(
        (hash64(F.col("user_id")) % 2).cast("int").alias("arm"),
        "user_id",
        (F.col("event_type") == "purchase").cast("long").alias("conv"),
        F.to_date("ts").alias("day"),
    )
    per_arm = armed.groupBy("arm").agg(
        F.sum("conv").alias("c"),
        (F.countDistinct("user_id") * F.countDistinct("day")).alias("e"),
    )
    wide = per_arm.groupBy().agg(
        F.max(F.when(F.col("arm") == 0, F.col("c"))).alias("c0"),
        F.max(F.when(F.col("arm") == 1, F.col("c"))).alias("c1"),
        F.max(F.when(F.col("arm") == 0, F.col("e"))).alias("e0"),
        F.max(F.when(F.col("arm") == 1, F.col("e"))).alias("e1"),
    )
    return wide.select(
        "c0",
        "c1",
        "e0",
        "e1",
        pround(F.expr(_RR), 6).alias("rate_ratio_r"),
        pround(F.expr(_RR_Z), 6).alias("z_r"),
        pround(F.expr(two_sided_p_sql(_RR_Z)), 8).alias("p_r"),
    )


def _rr_sql() -> str:
    from projet_data_infrastructure_spark.functions.hashing import hash64_sql

    h = hash64_sql("user_id")
    return f"""
WITH armed AS (
    SELECT CAST({h} % 2 AS INT) AS arm, user_id,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv,
           CAST(ts AS DATE) AS day
    FROM events
), per_arm AS (
    SELECT arm, CAST(sum(conv) AS BIGINT) AS c,
           CAST(count(DISTINCT user_id) * count(DISTINCT day) AS BIGINT) AS e
    FROM armed GROUP BY arm
), wide AS (
    SELECT max(CASE WHEN arm = 0 THEN c END) AS c0,
           max(CASE WHEN arm = 1 THEN c END) AS c1,
           max(CASE WHEN arm = 0 THEN e END) AS e0,
           max(CASE WHEN arm = 1 THEN e END) AS e1
    FROM per_arm
)
SELECT c0, c1, e0, e1,
       {pround_sql(_RR, 6)} AS rate_ratio_r,
       {pround_sql(_RR_Z, 6)} AS z_r,
       {pround_sql(two_sided_p_sql(_RR_Z), 8)} AS p_r
FROM wide
"""


# --------------------------------------------------------------------------
# Ansari–Bradley scale test (exact integer block-score range sums)
# --------------------------------------------------------------------------
#
# Rank-based dispersion test between the A and R quantity samples — the
# scale companion to Mann-Whitney (location) and the nonparametric
# alternative to Brown–Forsythe. Pooled AB scores a(i) = min(i, N+1-i)
# collapse per tie block [l, r] to an EXACT integer range sum S(l, r)
# (triangular-number algebra split at h = (N+1) DIV 2); the statistic
# sums the tie-averaged score tA*S/t per block and the tie-corrected
# moments come from sum S and sum S^2/t — all on the <= 50-row pooled
# grid, accumulated DECIMAL(38,0) in integer MICRO-units (the wide accumulator
# absorbs the 1e6 scale even at 100 TB row counts; error <= 5e-7 per
# grid row, deterministic in both engines).
# E[AB] = nA*mean(score); Var = nA*nB*(sum a^2 - N*mean^2)/(N*(N-1))
# (sampling nA scores without replacement from the score multiset).

def _tri(k: str) -> str:
    """k·(k+1)/2 exactly in DECIMAL(38,0) without a decimal DIV: halve
    whichever factor is even BEFORE widening (k and k+1 fit BIGINT near
    sf100k; only their PRODUCT doesn't — r·(r+1) reaches ~9e22, ADVICE
    r10 — so the halved-factor product is computed wide)."""
    return (
        f"(CASE WHEN ({k}) % 2 = 0"
        f" THEN CAST(({k}) DIV 2 AS DECIMAL(19,0))"
        f" * CAST(({k}) + 1 AS DECIMAL(19,0))"
        f" ELSE CAST(({k}) AS DECIMAL(19,0))"
        f" * CAST((({k}) + 1) DIV 2 AS DECIMAL(19,0)) END)"
    )


_AB_S = (
    f"(CASE WHEN l <= least(r, h)"
    f" THEN {_tri('least(r, h)')} - {_tri('l - 1')} ELSE 0 END"
    f" + CASE WHEN greatest(l, h + 1) <= r"
    f" THEN CAST(r - greatest(l, h + 1) + 1 AS DECIMAL(19,0))"
    f" * CAST(nn + 1 AS DECIMAL(19,0))"
    f" - ({_tri('r')} - {_tri('greatest(l, h + 1) - 1')}) ELSE 0 END)"
)
#: Quantization WITHOUT floor(): Spark's floor(DOUBLE) returns LONG and
#: SATURATES at 2^63 (observed: the sf0.1 sumsq terms ~8e19 silently
#: clamped, flipping the variance negative while DuckDB stayed exact).
#: The direct double->wide cast rounds to NEAREST in both engines but the
#: tie-break differs — Spark DECIMAL(38,0) is HALF_UP while DuckDB HUGEINT
#: is half-to-even (CAST(2.5::DOUBLE AS HUGEINT) = 2, observed; ADVICE
#: r10) — so the +1e-5 shifts any exact .5 tie off the boundary, making
#: the quantizer identical cross-engine by construction; it never
#: overflows until 10^38.
_AB_TERM = (
    "CAST(CAST(ta AS DOUBLE) * CAST(s AS DOUBLE) / CAST(t AS DOUBLE)"
    " * 1000000.0 + 0.00001 AS DECIMAL(38,0))"
)
_AB_SQ = (
    "CAST(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(t AS DOUBLE)"
    " * 1000000.0 + 0.00001 AS DECIMAL(38,0))"
)
_AB_MEAN = "(CAST(suma AS DOUBLE) / CAST(nn AS DOUBLE))"
_AB_STAT = "(CAST(ab AS DOUBLE) / 1000000.0)"
_AB_E = f"(CAST(na AS DOUBLE) * {_AB_MEAN})"
_AB_VAR = (
    f"(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)"
    f" * (CAST(sumsq AS DOUBLE) / 1000000.0"
    f" - CAST(nn AS DOUBLE) * {_AB_MEAN} * {_AB_MEAN})"
    f" / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)))"
)
_AB_Z = f"(({_AB_STAT} - {_AB_E}) / sqrt({_AB_VAR}))"


def q_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ansari–Bradley two-sample scale test on the A/R quantity grids
    (module comment): exact integer tie-block score sums, DECIMAL(38,0)
    statistic/moment accumulation, shared-tree z and Zelen-Severo p."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("v")
    )
    grid = (
        li.filter(F.col("l_returnflag").isin("A", "R"))
        .groupBy("v")
        .agg(
            F.sum((F.col("l_returnflag") == "A").cast("long")).alias("ta"),
            F.sum((F.col("l_returnflag") == "R").cast("long")).alias("tb"),
        )
        .withColumn("t", F.col("ta") + F.col("tb"))
    )
    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = grid.groupBy().agg(
        F.sum("ta").alias("na"),
        F.sum("tb").alias("nb"),
        (F.sum("ta") + F.sum("tb")).alias("nn"),
    )
    blocks = (
        grid.withColumn("r", F.sum("t").over(wcum))
        .withColumn("l", F.col("r") - F.col("t") + 1)
        .crossJoin(F.broadcast(tot))
        .withColumn("h", F.expr("(nn + 1) DIV 2"))
        .withColumn("s", F.expr(_AB_S))
    )
    agg = blocks.groupBy("na", "nb", "nn").agg(
        F.sum(F.expr(_AB_TERM)).alias("ab"),
        F.sum("s").alias("suma"),
        F.sum(F.expr(_AB_SQ)).alias("sumsq"),
    )
    return agg.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        pround(F.expr(_AB_STAT), 1).alias("ab_r"),
        pround(F.expr(_AB_Z), 6).alias("z_r"),
        pround(F.expr(two_sided_p_sql(_AB_Z)), 8).alias("p_r"),
    )


def _ab_sql() -> str:
    term = _AB_TERM.replace("DECIMAL(38,0)", "HUGEINT")
    sq = _AB_SQ.replace("DECIMAL(38,0)", "HUGEINT")
    s_expr = _AB_S.replace(" DIV ", " // ")
    return f"""
WITH li AS (
    SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v
    FROM lineitem WHERE l_returnflag IN ('A', 'R')
), grid AS (
    SELECT v,
           CAST(sum(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ta,
           CAST(sum(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS tb,
           CAST(count(*) AS BIGINT) AS t
    FROM li GROUP BY v
), tot AS (
    SELECT CAST(sum(ta) AS BIGINT) AS na, CAST(sum(tb) AS BIGINT) AS nb,
           CAST(sum(t) AS BIGINT) AS nn
    FROM grid
), blocks AS (
    SELECT ta, tb, t, na, nb, nn, (nn + 1) // 2 AS h,
           CAST(sum(t) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS r,
           CAST(sum(t) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               - t + 1 AS l
    FROM grid, tot
), scored AS (
    SELECT ta, t, na, nb, nn, {s_expr} AS s FROM blocks
), agg AS (
    SELECT na, nb, nn,
           CAST(sum({term}) AS HUGEINT) AS ab,
           CAST(sum(s) AS HUGEINT) AS suma,
           CAST(sum({sq}) AS HUGEINT) AS sumsq
    FROM scored GROUP BY na, nb, nn
)
SELECT na AS n_a, nb AS n_b,
       {pround_sql(_AB_STAT, 1)} AS ab_r,
       {pround_sql(_AB_Z, 6)} AS z_r,
       {pround_sql(two_sided_p_sql(_AB_Z), 8)} AS p_r
FROM agg
"""


# --------------------------------------------------------------------------
# Tukey HSD post-hoc pairs (ANOVA follow-up on the priority groups)
# --------------------------------------------------------------------------

_TUKEY_MSW = (
    "((CAST(q AS DOUBLE) - CAST(bmicro AS DOUBLE) / 1000000.0)"
    " / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))"
)
_TUKEY_Q = (
    "(abs(CAST(si AS DOUBLE) / CAST(ni AS DOUBLE)"
    " - CAST(sj AS DOUBLE) / CAST(nj AS DOUBLE))"
    f" / sqrt({_TUKEY_MSW} / 2.0"
    " * (1.0 / CAST(ni AS DOUBLE) + 1.0 / CAST(nj AS DOUBLE))))"
)


def q_tukey_hsd_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey HSD studentized-range statistics for every priority-group
    pair — the post-hoc step after a significant `anova_oneway_f`
    (quantity across the five order priorities here): q_ij =
    |mean_i - mean_j| / sqrt(MSW/2 * (1/n_i + 1/n_j)) with MSW from the
    same exact BIGINT group moments (micro-quantized between-group term).
    One corpus aggregate, a 10-row pair join of the 5-row moment frame."""
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("g"),
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_quantity").cast("long").alias("y"),
    )
    per = (
        li.join(o, "ok")
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("ng"),
            F.sum("y").alias("sg"),
            F.sum(F.col("y") * F.col("y")).alias("qg"),
        )
    )
    tot = per.groupBy().agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ng").alias("n"),
        F.sum("qg").alias("q"),
        F.sum(F.expr(_BG_TERM_MICRO)).alias("bmicro"),
    )
    a = per.select(
        F.col("g").alias("gi"), F.col("ng").alias("ni"), F.col("sg").alias("si")
    )
    b = per.select(
        F.col("g").alias("gj"), F.col("ng").alias("nj"), F.col("sg").alias("sj")
    )
    pairs = a.join(F.broadcast(b), F.col("gi") < F.col("gj")).crossJoin(
        F.broadcast(tot)
    )
    return pairs.select(
        "gi",
        "gj",
        pround(
            F.expr(
                "CAST(si AS DOUBLE) / CAST(ni AS DOUBLE)"
                " - CAST(sj AS DOUBLE) / CAST(nj AS DOUBLE)"
            ),
            6,
        ).alias("mean_diff_r"),
        pround(F.expr(_TUKEY_Q), 6).alias("q_stat_r"),
    )


def _tukey_sql() -> str:
    return f"""
WITH j AS (
    SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS g,
           CAST(l_quantity AS BIGINT) AS y
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), per AS (
    SELECT g, CAST(count(*) AS BIGINT) AS ng,
           CAST(sum(y) AS BIGINT) AS sg,
           CAST(sum(y * y) AS BIGINT) AS qg
    FROM j GROUP BY g
), tot AS (
    SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
           CAST(sum(qg) AS BIGINT) AS q,
           CAST(sum({_BG_TERM_MICRO}) AS DECIMAL(38,0)) AS bmicro
    FROM per
), pairs AS (
    SELECT a.g AS gi, b.g AS gj, a.ng AS ni, a.sg AS si,
           b.ng AS nj, b.sg AS sj, k, n, q, bmicro
    FROM per a JOIN per b ON a.g < b.g, tot
)
SELECT gi, gj,
       {pround_sql(
           'CAST(si AS DOUBLE) / CAST(ni AS DOUBLE)'
           ' - CAST(sj AS DOUBLE) / CAST(nj AS DOUBLE)', 6)} AS mean_diff_r,
       {pround_sql(_TUKEY_Q, 6)} AS q_stat_r
FROM pairs
"""




SPECS.extend(
    [
        QuerySpec(
            "anova_oneway_f",
            q_anova_oneway_f,
            _anova_sql(),
            ("stats",),
            doc="One-way ANOVA F of quantity across return flags; exact BIGINT "
            "group moments, micro-quantized between-group term",
        ),
        QuerySpec(
            "levene_brown_forsythe",
            q_levene_brown_forsythe,
            _levene_sql(),
            ("stats",),
            doc="Brown-Forsythe variance-homogeneity test: ANOVA F on "
            "|2y - doubled group median| from the bounded quantity grid",
        ),
        QuerySpec(
            "jonckheere_terpstra",
            q_jonckheere_terpstra,
            _jt_sql(),
            ("stats", "bench"),
            doc="Ordered-trend test across priority groups: grid-pair doubled "
            "Mann-Whitney counts + full tie-corrected variance in DECIMAL(38,0)",
        ),
        QuerySpec(
            "mutual_information_flags",
            q_mutual_information_flags,
            _mi_sql(),
            ("stats",),
            doc="Mutual information + NMI between return flag and line status; "
            "nano-unit quantized term sums on the cell grid",
        ),
        QuerySpec(
            "sprt_ab_decision",
            q_sprt_ab_decision,
            _sprt_sql(),
            ("stats", "timeseries"),
            doc="Wald SPRT on the daily purchase-rate stream; shared-literal "
            "llr tree, earliest boundary-crossing day",
        ),
        QuerySpec(
            "hodges_lehmann_shift",
            q_hodges_lehmann_shift,
            _HL_SQL,
            ("stats",),
            doc="Hodges-Lehmann R-vs-A shift: weighted median of pairwise "
            "differences from the 99-row grid-product, never the pair set",
        ),
        QuerySpec(
            "ransac_line_fit",
            q_ransac_line_fit,
            _ransac_sql(),
            ("learning",),
            doc="Deterministic RANSAC price~quantity line: hash-seeded "
            "candidate pairs, exact BIGINT inlier test, map-only scoring",
        ),
        QuerySpec(
            "logistic_irls_qty",
            q_logistic_irls_qty,
            _logistic_sql(),
            ("learning",),
            doc="Logistic P(return|qty) by 3 unrolled IRLS steps on the "
            "100-cell value grid; micro-quantized moments each step",
        ),
        QuerySpec(
            "friedman_nation_priority",
            q_friedman_nation_priority,
            _friedman_sql(),
            ("stats",),
            doc="Friedman blocked-rank test of priority effects across "
            "nation blocks; exact cross-multiplied fraction ranking",
        ),
        QuerySpec(
            "mantel_haenszel_or",
            q_mantel_haenszel_or,
            _mh_sql(),
            ("stats",),
            doc="Mantel-Haenszel common OR + continuity-corrected CMH chi2 "
            "across nation strata; micro-quantized stratum terms",
        ),
        QuerySpec(
            "cramer_von_mises",
            q_cramer_von_mises,
            _CVM_SQL,
            ("stats",),
            doc="Two-sample Cramer-von Mises on the A/R quantity grids; "
            "exact 128-bit ECDF-difference numerator, self-calibrating",
        ),
        QuerySpec(
            "poisson_rate_ratio",
            q_poisson_rate_ratio,
            _rr_sql(),
            ("stats",),
            doc="Two-arm Poisson rate-ratio z-test on purchase events; exact "
            "BIGINT counts and user-day exposures into one shared tree",
        ),
        QuerySpec(
            "ansari_bradley",
            q_ansari_bradley,
            _ab_sql(),
            ("stats",),
            doc="Ansari-Bradley rank scale test on the A/R quantity grids; "
            "exact integer tie-block score sums, 128-bit moments",
        ),
        QuerySpec(
            "tukey_hsd_pairs",
            q_tukey_hsd_pairs,
            _tukey_sql(),
            ("stats",),
            doc="Tukey HSD studentized-range pairs across the priority "
            "groups; MSW from the shared exact ANOVA moments",
        ),
    ]
)


# --------------------------------------------------------------------------
# Exact skewness / excess kurtosis per event type
# --------------------------------------------------------------------------

_MOM_CENTS = "CAST(floor(value * 100 + 0.5) AS BIGINT)"
# Identical double expression text on both engines (exact integer inputs →
# bit-identical IEEE results; sqrt is correctly rounded in both engines).
_SKEW_EXPR = (
    "(n*n*s3 - 3.0*n*s1*s2 + 2.0*s1*s1*s1)"
    " / ((n*s2 - s1*s1) * sqrt(n*s2 - s1*s1))"
)
_KURT_EXPR = (
    "(n*n*n*s4 - 4.0*n*n*s1*s3 + 6.0*n*s1*s1*s2 - 3.0*s1*s1*s1*s1)"
    " / ((n*s2 - s1*s1) * (n*s2 - s1*s1)) - 3.0"
)


def q_higher_moments_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    c = F.expr(_MOM_CENTS)
    dec = F.expr(f"CAST({_MOM_CENTS} AS DECIMAL(38,0))")
    sums = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(dec).alias("s1d"),
        F.sum(dec * c).alias("s2d"),
        F.sum(dec * c * c).alias("s3d"),
        F.sum(dec * c * c * c).alias("s4d"),
    )
    dbl = sums.select(
        "event_type",
        "n_rows",
        F.col("n_rows").cast("double").alias("n"),
        F.col("s1d").cast("double").alias("s1"),
        F.col("s2d").cast("double").alias("s2"),
        F.col("s3d").cast("double").alias("s3"),
        F.col("s4d").cast("double").alias("s4"),
    )
    return dbl.select(
        "event_type",
        "n_rows",
        pround(F.expr(_SKEW_EXPR), 6).alias("skew_pop"),
        pround(F.expr(_KURT_EXPR), 6).alias("kurt_excess"),
    )


_HIGHER_MOMENTS_SQL = f"""
WITH sums AS (
    SELECT event_type,
           count(*) AS n_rows,
           sum(CAST({_MOM_CENTS} AS HUGEINT)) AS s1d,
           sum(CAST({_MOM_CENTS} AS HUGEINT) * {_MOM_CENTS}) AS s2d,
           sum(CAST({_MOM_CENTS} AS HUGEINT) * {_MOM_CENTS} * {_MOM_CENTS}) AS s3d,
           sum(CAST({_MOM_CENTS} AS HUGEINT) * {_MOM_CENTS} * {_MOM_CENTS} * {_MOM_CENTS}) AS s4d
    FROM events GROUP BY 1
), dbl AS (
    SELECT event_type, n_rows,
           CAST(n_rows AS DOUBLE) AS n,
           CAST(s1d AS DOUBLE) AS s1, CAST(s2d AS DOUBLE) AS s2,
           CAST(s3d AS DOUBLE) AS s3, CAST(s4d AS DOUBLE) AS s4
    FROM sums
)
SELECT event_type, n_rows,
       {pround_sql(_SKEW_EXPR, 6)} AS skew_pop,
       {pround_sql(_KURT_EXPR, 6)} AS kurt_excess
FROM dbl
"""

# --------------------------------------------------------------------------
# Deterministic mode + discrete percentile (SQL surface)
# --------------------------------------------------------------------------


def q_mode_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: the MODE of the cent value (most frequent; ties to
    the SMALLEST value so both engines agree — Spark's ``mode()`` and
    DuckDB's ``mode()`` are both tie-arbitrary, so the spec pins the
    deterministic rank form) and the discrete median (percentile_disc 0.5:
    the smallest value with cumulative count ≥ ⌈n/2⌉ — always an observed
    value, no interpolation). One value-count aggregate + windows over the
    bounded (type, value) frame."""
    ev = read_table(spark, sf_dir, "events")
    counts = (
        ev.select(
            "event_type",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .groupBy("event_type", "cents")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wmode = Window.partitionBy("event_type").orderBy(F.desc("c"), F.asc("cents"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("event_type")
    enriched = (
        counts.withColumn("mode_rnk", F.row_number().over(wmode))
        .withColumn("cum", F.sum("c").over(wcum))
        .withColumn("n", F.sum("c").over(wtot))
    )
    mode = enriched.filter(F.col("mode_rnk") == 1).select(
        "event_type", F.col("cents").alias("mode_cents"), F.col("c").alias("mode_n")
    )
    med = (
        enriched.filter(F.col("cum") * 2 >= F.col("n"))
        .groupBy("event_type")
        .agg(F.min("cents").alias("median_disc_cents"))
    )
    return mode.join(med, "event_type")


_MODE_SQL = """
WITH counts AS (
    SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
           count(*) AS c
    FROM events GROUP BY 1, 2
), enriched AS (
    SELECT *,
           row_number() OVER (PARTITION BY event_type ORDER BY c DESC, cents ASC)
               AS mode_rnk,
           sum(c) OVER (PARTITION BY event_type ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           sum(c) OVER (PARTITION BY event_type) AS n
    FROM counts
)
SELECT m.event_type, m.cents AS mode_cents, m.c AS mode_n, d.median_disc_cents
FROM (SELECT event_type, cents, c FROM enriched WHERE mode_rnk = 1) m
JOIN (SELECT event_type, min(cents) AS median_disc_cents
      FROM enriched WHERE cum * 2 >= n GROUP BY 1) d
  USING (event_type)
"""

# --------------------------------------------------------------------------
# Truncated-Poisson multiplier bootstrap CI for the per-type mean
# --------------------------------------------------------------------------

_BOOT_R = 32  # replicas
# Poisson(1) inverse-CDF thresholds in micro units (truncated at 3):
# P(0)=.367879, P(<=1)=.735759, P(<=2)=.919699
_BOOT_T0, _BOOT_T1, _BOOT_T2 = 367879, 735759, 919699


def q_bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplier bootstrap of the per-event-type mean: 32 replicas, each
    row weighted by a DETERMINISTIC truncated-Poisson(1) draw (inverse CDF
    on the portable hash uniform of (replica, event_id) — weights 0..3),
    replica mean in exact micro-cents, CI = the 2nd / 31st order statistic
    (≈ 5%/95%) via rank over the 32-row replica frame. The bootstrap's
    randomness is the hash, so the whole resampling procedure is
    hash-checkable cross-engine. ONE scan with a 32× literal explode into a
    combinable (type, replica) aggregate; everything after is
    32-rows-per-type arithmetic."""
    from projet_data_infrastructure_spark.functions.hashing import hash64

    # Explicit fan-out parallelism: events.parquet is a single small file
    # (1-2 scan partitions), and the 32x replica explode + md5 draw below
    # multiply it to 3.2 M rows on those same tasks (stage-metrics sweep:
    # 3.0 s of a 3.1 s query on one task). One tiny round-robin shuffle of
    # the 3-column projection buys 32-way execution of the expensive stage.
    ev = read_table(spark, sf_dir, "events")
    tall = (
        ev.select("event_type", "value", "event_id")
        .repartition(default_parallelism())
        .select(
            "event_type",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
            "event_id",
            F.explode(F.expr(f"sequence(0, {_BOOT_R - 1})")).alias("r"),
        )
    )
    u = F.pmod(
        hash64(F.concat(F.col("r").cast("string"), F.lit(":"), F.col("event_id"))),
        F.lit(1000000),
    )
    w = (
        F.when(u < _BOOT_T0, 0)
        .when(u < _BOOT_T1, 1)
        .when(u < _BOOT_T2, 2)
        .otherwise(3)
    )
    reps = (
        tall.withColumn("w", w)
        .groupBy("event_type", "r")
        .agg(
            F.sum("w").alias("nw"),
            F.sum(F.col("w") * F.col("cents")).alias("sw"),
        )
        .withColumn("mean_micro", F.expr("(sw * 1000000) DIV nw"))
    )
    wrep = Window.partitionBy("event_type").orderBy("mean_micro", "r")
    ranked = reps.withColumn("rnk", F.row_number().over(wrep))
    return (
        ranked.groupBy("event_type")
        .agg(
            F.min(F.when(F.col("rnk") == 2, F.col("mean_micro"))).alias(
                "ci_lo_micro"
            ),
            F.min(F.when(F.col("rnk") == _BOOT_R - 1, F.col("mean_micro"))).alias(
                "ci_hi_micro"
            ),
            F.count(F.lit(1)).alias("n_replicas"),
        )
    )


_BOOT_SQL = f"""
WITH tall AS (
    SELECT event_type,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
           event_id, r
    FROM events, unnest(range(0, {_BOOT_R})) AS t(r)
), weighted AS (
    SELECT event_type, cents, r,
           CASE WHEN u < {_BOOT_T0} THEN 0
                WHEN u < {_BOOT_T1} THEN 1
                WHEN u < {_BOOT_T2} THEN 2
                ELSE 3 END AS w
    FROM (SELECT *,
                 {hash64_sql("CAST(r AS VARCHAR) || ':' || CAST(event_id AS VARCHAR)")}
                     % 1000000 AS u
          FROM tall)
), reps AS (
    SELECT event_type, r, sum(w) AS nw, sum(w * cents) AS sw,
           (sum(w * cents) * 1000000) // sum(w) AS mean_micro
    FROM weighted GROUP BY 1, 2
), ranked AS (
    SELECT *, row_number() OVER (PARTITION BY event_type
                                 ORDER BY mean_micro, r) AS rnk
    FROM reps
)
SELECT event_type,
       CAST(min(CASE WHEN rnk = 2 THEN mean_micro END) AS BIGINT) AS ci_lo_micro,
       CAST(min(CASE WHEN rnk = {_BOOT_R - 1} THEN mean_micro END) AS BIGINT)
           AS ci_hi_micro,
       count(*) AS n_replicas
FROM ranked GROUP BY 1
"""



# --------------------------------------------------------------------------
# Winsorized + trimmed mean (robust location estimates)
# --------------------------------------------------------------------------

_ROBUST_P = 5  # percent clipped/trimmed per tail


def q_winsorized_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5% winsorized and 5% trimmed means of the event value per type —
    the robust location estimates a metrics platform reports next to the
    raw mean. Exact nearest-rank cutoffs (k = ⌈n·0.05⌉-th smallest /
    largest) from ONE rank window over the per-type sort; winsorizing
    clamps to the cutoff values, trimming drops beyond them; both means in
    exact integer micro-cents. One sort per type (the rank window), one
    aggregate — at warehouse scale the exact rank swaps for the
    grouped_rank operator or approx_percentile cutoffs."""
    ev = read_table(spark, sf_dir, "events")
    vals = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    wrnk = Window.partitionBy("event_type").orderBy("cents")
    wtot = Window.partitionBy("event_type")
    ranked = (
        vals.withColumn("rnk", F.row_number().over(wrnk))
        .withColumn("n", F.count(F.lit(1)).over(wtot))
        .withColumn("k", F.expr(f"CAST(ceil(n * {_ROBUST_P} / 100.0) AS BIGINT)"))
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(F.expr("CASE WHEN rnk = k + 1 THEN cents END")).alias("lo_c"),
            F.min(F.expr("CASE WHEN rnk = n - k THEN cents END")).alias("hi_c"),
            F.sum(
                F.expr("CASE WHEN rnk > k AND rnk <= n - k THEN cents ELSE 0 END")
            ).alias("mid_sum"),
            F.sum(F.expr("CAST(rnk > k AND rnk <= n - k AS INT)")).alias("mid_n"),
            F.min("k").alias("kk"),
        )
        .select(
            "event_type",
            "n_rows",
            F.expr(
                "((mid_sum + kk * lo_c + kk * hi_c) * 1000000)"
                " DIV (mid_n + 2 * kk)"
            ).alias("winsor_mean_micro"),
            F.expr("(mid_sum * 1000000) DIV mid_n").alias("trimmed_mean_micro"),
        )
    )


_ROBUST_SQL = f"""
WITH ranked AS (
    SELECT event_type,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
           row_number() OVER (PARTITION BY event_type ORDER BY
               CAST(floor(value * 100 + 0.5) AS BIGINT)) AS rnk,
           count(*) OVER (PARTITION BY event_type) AS n,
           CAST(ceil(count(*) OVER (PARTITION BY event_type)
                * {_ROBUST_P} / 100.0) AS BIGINT) AS k
    FROM events
), agg AS (
    SELECT event_type,
           count(*) AS n_rows,
           min(CASE WHEN rnk = k + 1 THEN cents END) AS lo_c,
           min(CASE WHEN rnk = n - k THEN cents END) AS hi_c,
           sum(CASE WHEN rnk > k AND rnk <= n - k THEN cents ELSE 0 END) AS mid_sum,
           sum(CAST(rnk > k AND rnk <= n - k AS INT)) AS mid_n,
           min(k) AS kk
    FROM ranked GROUP BY event_type
)
SELECT event_type, n_rows,
       CAST(((mid_sum + kk * lo_c + kk * hi_c) * 1000000) // (mid_n + 2 * kk)
           AS BIGINT) AS winsor_mean_micro,
       CAST((mid_sum * 1000000) // mid_n AS BIGINT) AS trimmed_mean_micro
FROM agg
"""





SPECS.extend(
    [
    QuerySpec(
            "higher_moments_by_type",
            q_higher_moments_by_type,
            _HIGHER_MOMENTS_SQL,
            ("stats", "agg"),
            doc="Exact skewness / excess kurtosis per event_type: DECIMAL(38,0)/"
            "HUGEINT power sums, shared-text IEEE double solve (sqrt form, no pow)",
        ),
    QuerySpec(
            "mode_percentile_disc",
            q_mode_percentile_disc,
            _MODE_SQL,
            ("agg", "sql"),
            doc="Deterministic mode (ties to smallest) + discrete median per "
            "event_type from one value-count aggregate (engine mode() is "
            "tie-arbitrary, so the rank form pins it)",
        ),
    QuerySpec(
            "bootstrap_mean_ci",
            q_bootstrap_mean_ci,
            _BOOT_SQL,
            ("stats", "ml"),
            doc="Truncated-Poisson multiplier bootstrap (32 replicas) of the "
            "per-type mean with hash-deterministic weights; exact order-"
            "statistic CI — the resampling itself is hash-checked cross-engine",
        ),
    QuerySpec(
            "winsorized_trimmed_mean",
            q_winsorized_trimmed_mean,
            _ROBUST_SQL,
            ("stats", "agg"),
            doc="5% winsorized + trimmed means per type from exact nearest-rank "
            "cutoffs; one rank window + one aggregate",
        ),
    ]
)
