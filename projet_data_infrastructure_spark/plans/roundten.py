"""Round-10 additions: LIVE row-pattern parity plus trend/changepoint/
inequality/independence statistics and an MoE routing-load operator.

* ``stream_event_pattern_match`` — the MATCH_RECOGNIZE analog LIVE: per-user
  journey-string state in ``streaming/stateful.journey_state`` (the
  ``funnel3_state`` shape with a string accumulator), the regex evaluated at
  emission — hash-checked against the SAME oracle as the batch
  ``event_pattern_match`` (stream == batch, the round-9 parity discipline
  extended to arbitrary row patterns; VERDICT r9 item 4).
* ``chisq_priority_status`` — Pearson chi-square independence test on the
  bounded o_orderpriority × o_orderstatus grid with integer-micro-unit term
  sums (order-insensitive exactness for a sum of double terms).
* ``mann_kendall_z`` — the tie-corrected Mann-Kendall variance, z and p
  completing the ``mann_kendall_theilsen`` kernel (roundseven), whose
  docstring leaves the normalization to the caller; pair sums stay on the
  calendar-bounded day grid.
* ``changepoint_cusum_mean`` — CUSUM mean-shift changepoint on the daily
  grid, scaled to the EXACT integer deviation n·cum_t − t·total so the
  argmax needs no floating accumulation at all.
* ``ab_srm_guard`` — the sample-ratio-mismatch guard every experimentation
  pipeline runs before reading an A/B result: binomial z against the
  declared 50/50 split, Zelen-Severo p, loud flag.
* ``gini_lorenz_by_nation`` — per-nation Gini coefficient of customer
  account balances from the Lorenz order statistic, exact BIGINT
  numerators, nation-keyed window ranks (parallel at any scale).
* ``routing_topk_experts`` — Mixture-of-Experts top-2 routing simulation
  over documents (deterministic per-expert hash gates): per-expert primary/
  secondary load and share — the load-balance readout an MoE training
  pipeline monitors.
* ``grubbs_outlier_day`` — Grubbs' max-studentized-deviation outlier test
  on the daily series, integer-exact day selection.
* ``segmented_regression_elbow`` — two-segment OLS breakpoint by total-SSE
  argmin over exact day-grid prefix moments (the piecewise structural-break
  screen).

Scale shapes: one corpus aggregate per spec; all post-aggregate math on
value/calendar/dimension-bounded frames (15-cell priority×status grid, ≤366-row
day grid and its bounded pair set, 25-nation Gini ranks as KEYED windows,
8-expert load grid); streaming state bounded by the active-user set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_data_infrastructure_spark.functions.hashing import hash64, hash64_sql
from projet_data_infrastructure_spark.functions.stats import two_sided_p_sql
from projet_data_infrastructure_spark.plans._portable import pround, pround_sql
from projet_data_infrastructure_spark.plans.registry import QuerySpec
from projet_data_infrastructure_spark.sources.readers import read_table

# --------------------------------------------------------------------------
# LIVE MATCH_RECOGNIZE analog (stream == batch hash parity)
# --------------------------------------------------------------------------


def q_stream_event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The row-pattern spec running LIVE: ``streaming/stateful.journey_state``
    accumulates each user's time-ordered event-initial string as ONE string
    of per-user state (the ``funnel3_state`` shape with a string
    accumulator — the always-on ingest form the reference's streaming lake
    models, ``/root/reference/spark/SaveDelta.scala:157-163``); the clean-
    conversion regex is evaluated STATELESSLY at emission, so any
    regex-expressible pattern reuses the same state. availableNow delivers
    events.parquet as one micro-batch, making the update-mode emission the
    complete per-user journey table; the final rollup mirrors the batch
    aggregate exactly, so the spec hash-checks against the SAME oracle as
    ``event_pattern_match`` (stream == batch, cross-engine AND
    cross-execution-mode)."""
    from projet_data_infrastructure_spark.plans.events_queries import (
        _events_stream,
        _run_stream,
    )
    from projet_data_infrastructure_spark.plans.roundnine import _JOURNEY_PATTERN
    from projet_data_infrastructure_spark.streaming.stateful import journey_state

    stream = _events_stream(spark, sf_dir).select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
        "event_type",
    )
    out = journey_state(stream)
    table = _run_stream(
        out.writeStream.outputMode("update"), spark, "stream_journey_sink"
    )
    return table.groupBy().agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(
            F.col("journey").rlike(_JOURNEY_PATTERN).cast("long")
        ).alias("n_matched"),
    )


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
# MoE top-2 expert routing load (deterministic hash gates)
# --------------------------------------------------------------------------

_N_EXPERTS = 8


def _expert_scores_spark(col):
    return [hash64(col, seed=1000 + e) % 1_000_000 for e in range(_N_EXPERTS)]


def _argmax_sql(exclude: str | None = None) -> str:
    """First-match argmax over s0..s7 as one CASE chain (identical text on
    both engines); ``exclude`` masks one dynamic index for the second-max."""
    if exclude is None:
        terms = [f"s{e}" for e in range(_N_EXPERTS)]
    else:
        terms = [
            f"(CASE WHEN {e} = {exclude} THEN -1 ELSE s{e} END)"
            for e in range(_N_EXPERTS)
        ]
    m = f"greatest({', '.join(terms)})"
    chain = " ".join(
        f"WHEN {terms[e]} = {m} THEN {e}" for e in range(_N_EXPERTS)
    )
    return f"(CASE {chain} END)"


def q_routing_topk_experts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-of-Experts top-2 routing over the document corpus: each doc
    scores 8 experts with independent deterministic hash gates (the seeded
    ``hash64`` family — in production, the learned router's logits) and
    routes to its top 2 (first-match tie-break, identical CASE chain both
    engines). Output is the per-expert load table an MoE training pipeline
    watches for routing collapse: primary/secondary assignment counts and
    the combined load share (ideal = 1/8 = 0.125 per expert). One map-only
    scoring pass + one 8-row aggregate — no shuffle beyond the bounded
    grid."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    scored = docs.select(
        "doc_id",
        *[
            s.alias(f"s{e}")
            for e, s in enumerate(_expert_scores_spark(F.col("doc_id")))
        ],
    )
    # The secondary argmax masks the primary's index by inlining the primary
    # CASE chain as the exclude expression — verbatim the oracle's text.
    routed = scored.select(
        F.expr(_argmax_sql()).cast("int").alias("primary_e"),
        F.expr(_argmax_sql(exclude=_argmax_sql())).cast("int").alias("secondary_e"),
    )
    prim = routed.groupBy("primary_e").agg(F.count(F.lit(1)).alias("n_primary"))
    sec = routed.groupBy("secondary_e").agg(F.count(F.lit(1)).alias("n_secondary"))
    tot = routed.groupBy().agg(F.count(F.lit(1)).alias("nd"))
    out = (
        prim.join(
            sec, prim["primary_e"] == sec["secondary_e"], "full"
        )
        .select(
            F.coalesce("primary_e", "secondary_e").alias("expert"),
            F.coalesce("n_primary", F.lit(0)).alias("n_primary"),
            F.coalesce("n_secondary", F.lit(0)).alias("n_secondary"),
        )
        .crossJoin(F.broadcast(tot))
    )
    share = (
        "CAST(n_primary + n_secondary AS DOUBLE) / (2.0 * CAST(nd AS DOUBLE))"
    )
    return out.select(
        "expert",
        "n_primary",
        "n_secondary",
        pround(F.expr(share), 6).alias("load_share_r"),
    ).orderBy("expert")


def _routing_sql() -> str:
    scores = ",\n           ".join(
        f"{hash64_sql('doc_id', seed=1000 + e)} % 1000000 AS s{e}"
        for e in range(_N_EXPERTS)
    )
    share = "CAST(n_primary + n_secondary AS DOUBLE) / (2.0 * CAST(nd AS DOUBLE))"
    return f"""
WITH scored AS (
    SELECT doc_id,
           {scores}
    FROM documents
), routed AS (
    SELECT {_argmax_sql()} AS primary_e,
           {_argmax_sql(exclude=_argmax_sql())} AS secondary_e
    FROM scored
), prim AS (
    SELECT primary_e AS expert, count(*) AS n_primary FROM routed GROUP BY 1
), sec AS (
    SELECT secondary_e AS expert, count(*) AS n_secondary FROM routed GROUP BY 1
), tot AS (
    SELECT count(*) AS nd FROM routed
)
SELECT CAST(coalesce(prim.expert, sec.expert) AS INT) AS expert,
       CAST(coalesce(n_primary, 0) AS BIGINT) AS n_primary,
       CAST(coalesce(n_secondary, 0) AS BIGINT) AS n_secondary,
       {pround_sql(share, 6)} AS load_share_r
FROM prim FULL JOIN sec USING (expert), tot
ORDER BY expert
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


def _pattern_oracle() -> str:
    from projet_data_infrastructure_spark.plans.roundnine import _PATTERN_SQL

    return _PATTERN_SQL


SPECS: list[QuerySpec] = [
    QuerySpec(
        "stream_event_pattern_match",
        q_stream_event_pattern_match,
        _pattern_oracle(),
        ("streaming", "timeseries", "funnel"),
        doc="LIVE MATCH_RECOGNIZE analog: per-user journey-string state "
        "(journey_state), regex at emission; same oracle as the batch spec",
    ),
    QuerySpec(
        "chisq_priority_status",
        q_chisq_priority_status,
        _chisq_sql(),
        ("stats",),
        doc="Pearson chi-square independence on the bounded orderpriority x "
        "orderstatus grid; integer micro-unit term sums",
    ),
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
        "routing_topk_experts",
        q_routing_topk_experts,
        _routing_sql(),
        ("llm",),
        doc="MoE top-2 routing load table over documents: deterministic "
        "hash gates, per-expert primary/secondary counts + load share",
    ),
    QuerySpec(
        "grubbs_outlier_day",
        q_grubbs_outlier_day,
        _grubbs_sql(),
        ("stats", "timeseries"),
        doc="Grubbs max-studentized-deviation outlier day; integer-exact "
        "argmax via |n*y - total|, shared-tree G",
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
