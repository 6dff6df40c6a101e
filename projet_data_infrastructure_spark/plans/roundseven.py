"""Round-7 engine-charter additions: point-in-time dimensional attribution,
t-closeness governance, exact higher statistical moments, stupid-backoff
language-model scoring, and classifier threshold sweeps.

These extend the analytics families the reference's grouped rollups imply
(`/root/reference/airflow/config/read_delta.py:114-127`) with the next set
of questions a training-data platform asks of the same tables. Design notes:

* ``pit_regime_attribution`` — point-in-time (as-of-into-intervals) join:
  purchases are attributed to the user's attribute REGIME in force at the
  purchase timestamp, where the regime is the user's most recent
  non-purchase event type (the SCD2 interval the purchase lands in).
  Implemented with the union+window trick (the ``asof_join`` house
  pattern): state events and purchases interleave in ONE per-user sort,
  ``last(attr, ignorenulls)`` carries the regime forward, so there is no
  interval range-join blowup — one Exchange on user_id, one Sort,
  regardless of interval count (SCD2 change-detection is provably
  redundant under last() and is omitted, saving a second Exchange+Sort —
  see the inline note). A state change at the exact purchase
  timestamp applies (kind 0 sorts before kind 1 at equal ts) — pinned in
  both engines. Purchases before any state row fall into the 'none' regime.
* ``t_closeness_audit`` — completes the governance triad (k-anonymity,
  l-diversity, now t-closeness, Li et al. 2007): for each quasi-identifier
  cell (nation × market segment), the Earth-Mover's Distance between the
  cell's distribution over the ORDERED sensitive attribute (account-balance
  band 0-9) and the global distribution. For ordered categories EMD is the
  mean |cumulative difference|; the cumulative differences are computed in
  EXACT integers (c_i·N − g_i·n_cell over the dense cell×band grid), so
  t_micro = 10⁶·Σ|cum|/(n_cell·N·(m−1)) is one exact DECIMAL floor
  division. The only data-sized operation is the (cell, band) count
  aggregate (map-side combinable); the grid the windows run over is bounded
  by |nations|·|segments|·10 = 1 250 rows at any corpus size.
* ``higher_moments_by_type`` — exact skewness / excess kurtosis per
  event_type from ONE pass of raw power sums Σx..Σx⁴ in cents, accumulated
  in DECIMAL(38,0) (DuckDB HUGEINT) so the per-row c⁴ (≈9.8·10¹⁸ at this
  value range — past int64) and the sums stay exact at any row count. The
  moment identities n²·Σ(x−μ)³ = n²Σ₃ − 3nΣ₁Σ₂ + 2Σ₁³ and
  n³·Σ(x−μ)⁴ = n³Σ₄ − 4n²Σ₁Σ₃ + 6nΣ₁²Σ₂ − 3Σ₁⁴ are then evaluated in
  DOUBLES from identical expression text on both engines (the
  OLS/assortativity house pattern: exact integer inputs + identical IEEE
  expression tree ⇒ bit-identical floats; `sqrt` is correctly-rounded IEEE
  in both engines, so skew uses A·sqrt(A), never libm `pow`).
* ``trigram_backoff_score`` — Stupid Backoff (Brants et al. 2007, the
  web-scale LM scoring used for corpus quality filtering): train counts
  from even doc_ids, heldout scoring of odd doc_ids. Per heldout trigram:
  10⁶·c₃/c₂(w₁w₂) if the trigram was seen, else 0.4-damped bigram score
  10⁶·0.4·c₂(w₂w₃)/c₁(w₂), else 0.4²·c₁(w₃)/N — all as exact positive
  integer floor divisions (0.4 = 2/5 stays in the numerator/denominator).
  Per-doc mean score in micro units. Scale shape: the corpus is tokenized
  ONCE per side; all joins are heldout-trigrams ⋈ vocabulary-bounded count
  tables (never corpus × corpus); the scalar N attaches via a broadcast
  1-row aggregate, not a driver action.
* ``precision_recall_sweep`` — classifier operating-curve audit: predict
  "purchase" from the event value at 5 thresholds; per threshold TP/FP/FN
  and precision / recall / F1 in exact micro units (guarded integer floor
  divisions; F1 = 2pr/(p+r) computed from the micro values, ≤2·10¹² —
  int64-safe). ONE scan with a 5× map-side literal explode feeding one
  map-side-combinable aggregate — no per-threshold rescan.

Later round-7 batches (each spec carries its own full design docstring):
``stream_pit_attribution`` (the PIT join LIVE as a one-string-per-user
stateful operator), ``token_ngram_novelty`` (first-occurrence 3-gram
novelty), ``stratified_kfold_assign`` (grouped_rank-based exact-balance
CV folds), ``gdpr_erasure_cascade`` (right-to-be-forgotten blast radius),
``holt_linear_forecast`` (IEEE-replay double exponential smoothing),
``content_defined_chunking`` (FastCDC-lite chunk dedup),
``mode_percentile_disc`` (tie-pinned mode + discrete median),
``bootstrap_mean_ci`` (hash-deterministic truncated-Poisson multiplier
bootstrap), ``target_encode_loo`` (leakage-safe LOO target encoding),
``cuped_adjusted_lift`` / ``qte_by_decile`` (variance-reduced and
distributional A/B readouts), ``winsorized_trimmed_mean`` (robust
location), ``shapley_channel_attribution`` (EXACT coalition-grid Shapley
MTA), ``skipgram_window_cooc`` (word2vec pair counts),
``fourier_weekly_fit`` (order-pinned harmonic projection),
``als_rank1_step`` (closed-form ALS alternation as keyed aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_data_infrastructure_spark.functions.hashing import hash64_sql
from projet_data_infrastructure_spark.operators.asof import carry_forward
from projet_data_infrastructure_spark.operators.text import tokens
from projet_data_infrastructure_spark.plans._portable import pround, pround_sql
from projet_data_infrastructure_spark.plans.registry import QuerySpec
from projet_data_infrastructure_spark.sources.readers import read_table

# --------------------------------------------------------------------------
# Point-in-time regime attribution (SCD2 as-of-into-intervals join)
# --------------------------------------------------------------------------


def q_pit_regime_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    # Regime source: every non-purchase event. SCD2 change-detection (drop
    # rows equal to their predecessor) is deliberately OMITTED: last(attr)
    # over the merged stream returns the latest state's value either way
    # (collapsing consecutive duplicates never changes the carried-forward
    # value), and skipping it removes a whole Exchange+Sort from the plan.
    states = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        "event_id",
        F.col("event_type").alias("attr"),
        F.lit(None).cast("long").alias("cents"),
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        "event_id",
        F.lit(None).cast("string").alias("attr"),
        cents.alias("cents"),
    )
    # Union + one per-user sort: the regime carries forward without a range
    # join (the registered PIT core, operators/asof.carry_forward). Equal-ts
    # tie: the state row (kind 0) wins — a change effective AT the purchase
    # instant applies to it.
    merged = carry_forward(
        states.unionByName(facts),
        key="user_id",
        order=("ts", "kind", "event_id"),
        carry={"regime": "attr"},
    )
    return (
        merged.filter(F.col("kind") == 1)
        .groupBy(F.coalesce(F.col("regime"), F.lit("none")).alias("regime"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("cents").alias("sum_cents"),
        )
    )


_PIT_SQL = """
WITH states AS (
    SELECT user_id, ts, 0 AS kind, event_id, event_type AS attr,
           CAST(NULL AS BIGINT) AS cents
    FROM events WHERE event_type <> 'purchase'
), facts AS (
    SELECT user_id, ts, 1 AS kind, event_id, CAST(NULL AS VARCHAR) AS attr,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
    FROM events WHERE event_type = 'purchase'
), merged AS (
    SELECT *, last_value(attr IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, kind, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS regime
    FROM (SELECT * FROM states UNION ALL SELECT * FROM facts)
)
SELECT coalesce(regime, 'none') AS regime,
       count(*) AS n_purchases,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM merged WHERE kind = 1
GROUP BY 1
"""

# --------------------------------------------------------------------------
# t-closeness audit over (nation, segment) quasi-identifier cells
# --------------------------------------------------------------------------

#: Ordered sensitive attribute: acctbal band 0-9 (cents grid, integer-exact).
_BAND = "least(9, greatest(0, (CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) + 100000) DIV 110000))"
_BAND_DUCK = "least(9, greatest(0, (CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) + 100000) // 110000))"
_T_MICRO_THRESHOLD = 200000  # flag cells with t > 0.20


def q_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    counts = (
        cust.select(
            "c_nationkey", "c_mktsegment", F.expr(_BAND).cast("long").alias("band")
        )
        .groupBy("c_nationkey", "c_mktsegment", "band")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # Dense (cell × band) grid — bounded by |nations|·|segments|·10 rows, so
    # every window below runs over a constant-size frame at any corpus size.
    cells = counts.select("c_nationkey", "c_mktsegment").distinct()
    grid = (
        cells.select(
            "c_nationkey",
            "c_mktsegment",
            F.explode(F.sequence(F.lit(0), F.lit(9))).alias("band0"),
        )
        .select(
            "c_nationkey", "c_mktsegment", F.col("band0").cast("long").alias("band")
        )
        .join(counts, ["c_nationkey", "c_mktsegment", "band"], "left")
        .fillna({"c": 0})
    )
    w_cell = Window.partitionBy("c_nationkey", "c_mktsegment")
    w_band = Window.partitionBy("band")
    w_all = Window.partitionBy()
    w_cum = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    g = (
        grid.withColumn("n_cell", F.sum("c").over(w_cell))
        .withColumn("g", F.sum("c").over(w_band))
        .withColumn("n_total", F.sum("c").over(w_all))
        .withColumn(
            "cum",
            F.sum(F.col("c") * F.col("n_total") - F.col("g") * F.col("n_cell")).over(
                w_cum
            ),
        )
    )
    return (
        g.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.first("n_cell").alias("n_cell"),
            F.first("n_total").alias("n_total"),
            F.sum(F.abs(F.col("cum"))).alias("t_num"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "n_cell",
            F.expr(
                "CAST((CAST(t_num AS DECIMAL(38,0)) * 1000000)"
                " DIV (CAST(n_cell AS DECIMAL(38,0)) * n_total * 9) AS BIGINT)"
            ).alias("t_micro"),
        )
        .withColumn(
            "breach", (F.col("t_micro") > F.lit(_T_MICRO_THRESHOLD)).cast("int")
        )
    )


_T_CLOSENESS_SQL = f"""
WITH counts AS (
    SELECT c_nationkey, c_mktsegment, {_BAND_DUCK} AS band, count(*) AS c
    FROM customer GROUP BY 1, 2, 3
), grid AS (
    SELECT cl.c_nationkey, cl.c_mktsegment, b.band, coalesce(co.c, 0) AS c
    FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM counts) cl
    CROSS JOIN (SELECT unnest(range(0, 10)) AS band) b
    LEFT JOIN counts co USING (c_nationkey, c_mktsegment, band)
), g AS (
    SELECT *,
           sum(c) OVER (PARTITION BY c_nationkey, c_mktsegment) AS n_cell,
           sum(c) OVER (PARTITION BY band) AS g,
           sum(c) OVER () AS n_total
    FROM grid
), cums AS (
    SELECT *,
           sum(c * n_total - g * n_cell) OVER (
               PARTITION BY c_nationkey, c_mktsegment ORDER BY band
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM g
)
SELECT c_nationkey, c_mktsegment,
       CAST(any_value(n_cell) AS BIGINT) AS n_cell,
       CAST((CAST(sum(abs(cum)) AS HUGEINT) * 1000000)
            // (CAST(any_value(n_cell) AS HUGEINT) * any_value(n_total) * 9)
           AS BIGINT) AS t_micro,
       CAST(CAST((CAST(sum(abs(cum)) AS HUGEINT) * 1000000)
            // (CAST(any_value(n_cell) AS HUGEINT) * any_value(n_total) * 9)
           AS BIGINT) > {_T_MICRO_THRESHOLD} AS INTEGER) AS breach
FROM cums
GROUP BY 1, 2
"""

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
# Stupid Backoff trigram scoring (train = even doc_ids, score = odd)
# --------------------------------------------------------------------------


def q_trigram_backoff_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    heldout = docs.filter(F.col("doc_id") % 2 == 1)

    def ngrams(df: DataFrame, n: int, cols: list[str]) -> DataFrame:
        fields = ", ".join(
            f"element_at(t, i + {j}) AS {c}" for j, c in enumerate(cols)
        )
        return df.select(
            "doc_id",
            F.explode(
                # Guard before sequence(): sequence(1, 0) counts DOWN and
                # element_at(t, 0) throws on docs shorter than n tokens.
                F.expr(
                    f"CASE WHEN size(t) >= {n} THEN"
                    f" transform(sequence(1, size(t) - {n - 1}),"
                    f" i -> struct({fields}))"
                    f" ELSE array() END"
                )
            ).alias("g"),
        ).select("doc_id", "g.*").where(F.col(cols[0]).isNotNull())

    train_t = train.withColumn("t", tokens(F.lower(F.col("text"))))
    tri = (
        ngrams(train_t, 3, ["w1", "w2", "w3"])
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("c3"))
    )
    bi = (
        ngrams(train_t, 2, ["w1", "w2"])
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    uni = (
        ngrams(train_t, 1, ["w1"]).groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    )
    n_total = uni.agg(F.sum("c1").alias("n_train"))  # 1-row, broadcast below

    held_t = heldout.withColumn("t", tokens(F.lower(F.col("text"))))
    htri = ngrams(held_t, 3, ["w1", "w2", "w3"])
    scored = (
        htri.join(tri, ["w1", "w2", "w3"], "left")
        .join(
            bi.withColumnRenamed("c2", "c2p"), ["w1", "w2"], "left"
        )
        .join(
            bi.selectExpr("w1 AS w2", "w2 AS w3", "c2 AS c2s"),
            ["w2", "w3"],
            "left",
        )
        .join(uni.selectExpr("w1 AS w2", "c1 AS c1w2"), ["w2"], "left")
        .join(uni.selectExpr("w1 AS w3", "c1 AS c1w3"), ["w3"], "left")
        .crossJoin(F.broadcast(n_total))
        .select(
            "doc_id",
            F.expr(
                "CASE WHEN coalesce(c3, 0) > 0 THEN (1000000 * c3) DIV c2p"
                " WHEN coalesce(c2s, 0) > 0 THEN (2 * 1000000 * c2s) DIV (5 * c1w2)"
                " ELSE (4 * 1000000 * coalesce(c1w3, 0)) DIV (25 * n_train) END"
            ).alias("s_micro"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.expr("sum(s_micro) DIV count(1)").alias("avg_score_micro"),
    )


_BACKOFF_TOKS = "list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x != '')"

_BACKOFF_SQL = f"""
WITH train AS (
    SELECT doc_id, {_BACKOFF_TOKS} AS t FROM documents WHERE doc_id % 2 = 0
), held AS (
    SELECT doc_id, {_BACKOFF_TOKS} AS t FROM documents WHERE doc_id % 2 = 1
), tri AS (
    SELECT t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3, count(*) AS c3
    FROM train, unnest(range(1, greatest(len(t) - 1, 1))) AS u(i)
    GROUP BY 1, 2, 3
), bi AS (
    SELECT t[i] AS w1, t[i+1] AS w2, count(*) AS c2
    FROM train, unnest(range(1, greatest(len(t), 1))) AS u(i)
    GROUP BY 1, 2
), uni AS (
    SELECT t[i] AS w1, count(*) AS c1
    FROM train, unnest(range(1, len(t) + 1)) AS u(i)
    GROUP BY 1
), ntr AS (
    SELECT sum(c1) AS n_train FROM uni
), htri AS (
    SELECT doc_id, t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3
    FROM held, unnest(range(1, greatest(len(t) - 1, 1))) AS u(i)
), scored AS (
    SELECT h.doc_id,
           CASE WHEN coalesce(tri.c3, 0) > 0 THEN (1000000 * tri.c3) // bp.c2
                WHEN coalesce(bs.c2, 0) > 0 THEN (2 * 1000000 * bs.c2) // (5 * u2.c1)
                ELSE (4 * 1000000 * coalesce(u3.c1, 0)) // (25 * ntr.n_train) END
               AS s_micro
    FROM htri h
    LEFT JOIN tri ON tri.w1 = h.w1 AND tri.w2 = h.w2 AND tri.w3 = h.w3
    LEFT JOIN bi bp ON bp.w1 = h.w1 AND bp.w2 = h.w2
    LEFT JOIN bi bs ON bs.w1 = h.w2 AND bs.w2 = h.w3
    LEFT JOIN uni u2 ON u2.w1 = h.w2
    LEFT JOIN uni u3 ON u3.w1 = h.w3
    CROSS JOIN ntr
)
SELECT doc_id, count(*) AS n_trigrams,
       CAST(sum(s_micro) // count(*) AS BIGINT) AS avg_score_micro
FROM scored GROUP BY doc_id
"""

# --------------------------------------------------------------------------
# Precision / recall / F1 threshold sweep
# --------------------------------------------------------------------------

_SWEEP_THRESHOLDS = (2000, 5000, 10000, 20000, 40000)  # cents


def q_precision_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    thr_list = ", ".join(str(t) for t in _SWEEP_THRESHOLDS)
    # 5× literal map-side explode → one combinable aggregate; no rescans.
    tall = ev.select(
        (F.col("event_type") == "purchase").cast("int").alias("y"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        F.explode(F.expr(f"array({thr_list})")).alias("thr"),
    ).withColumn("pred", (F.col("cents") >= F.col("thr")).cast("int"))
    conf = tall.groupBy("thr").agg(
        F.sum(F.expr("CAST(y = 1 AND pred = 1 AS INT)")).alias("tp"),
        F.sum(F.expr("CAST(y = 0 AND pred = 1 AS INT)")).alias("fp"),
        F.sum(F.expr("CAST(y = 1 AND pred = 0 AS INT)")).alias("fn"),
    )
    return conf.select(
        "thr",
        "tp",
        "fp",
        "fn",
        F.expr(
            "CASE WHEN tp + fp > 0 THEN (1000000 * tp) DIV (tp + fp) ELSE 0 END"
        ).alias("precision_micro"),
        F.expr(
            "CASE WHEN tp + fn > 0 THEN (1000000 * tp) DIV (tp + fn) ELSE 0 END"
        ).alias("recall_micro"),
    ).withColumn(
        "f1_micro",
        F.expr(
            "CASE WHEN precision_micro + recall_micro > 0 THEN"
            " (2 * precision_micro * recall_micro) DIV (precision_micro + recall_micro)"
            " ELSE 0 END"
        ),
    )


_SWEEP_SQL = f"""
WITH tall AS (
    SELECT CAST(event_type = 'purchase' AS INT) AS y,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
           thr
    FROM events, unnest([{", ".join(str(t) for t in _SWEEP_THRESHOLDS)}]) AS t(thr)
), conf AS (
    SELECT thr,
           sum(CAST(y = 1 AND cents >= thr AS INT)) AS tp,
           sum(CAST(y = 0 AND cents >= thr AS INT)) AS fp,
           sum(CAST(y = 1 AND cents < thr AS INT)) AS fn
    FROM tall GROUP BY thr
), pr AS (
    SELECT thr, tp, fp, fn,
           CASE WHEN tp + fp > 0 THEN (1000000 * tp) // (tp + fp) ELSE 0 END
               AS precision_micro,
           CASE WHEN tp + fn > 0 THEN (1000000 * tp) // (tp + fn) ELSE 0 END
               AS recall_micro
    FROM conf
)
SELECT thr, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn,
       CAST(precision_micro AS BIGINT) AS precision_micro,
       CAST(recall_micro AS BIGINT) AS recall_micro,
       CAST(CASE WHEN precision_micro + recall_micro > 0 THEN
            (2 * precision_micro * recall_micro) // (precision_micro + recall_micro)
            ELSE 0 END AS BIGINT) AS f1_micro
FROM pr
"""


# --------------------------------------------------------------------------
# LIVE streaming point-in-time attribution (custom stateful operator)
# --------------------------------------------------------------------------


def q_stream_pit_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The point-in-time regime attribution running LIVE under Structured
    Streaming as a custom stateful operator (``applyInPandasWithState``):
    per-user state is ONE string (the regime in force), so streaming state
    is bounded by the active-user set, not by history — the form a real
    pipeline deploys instead of re-sorting the lake per batch. availableNow
    delivers events.parquet as one micro-batch, so the update-mode emission
    is the complete purchase attribution and hash-checks against the SAME
    batch oracle as ``pit_regime_attribution`` (stream == batch, pinned
    cross-engine AND cross-execution-mode)."""
    from projet_data_infrastructure_spark.plans.events_queries import (
        _events_stream,
        _run_stream,
    )
    from projet_data_infrastructure_spark.streaming.stateful import pit_regimes

    stream = _events_stream(spark, sf_dir)
    per_user = pit_regimes(stream)
    res = _run_stream(
        per_user.writeStream.outputMode("update"), spark, "stream_pit_sink"
    )
    return res.groupBy("regime").agg(
        F.sum("n_purchases").alias("n_purchases"),
        F.sum("sum_cents").alias("sum_cents"),
    )


# --------------------------------------------------------------------------
# Cross-corpus n-gram novelty per document
# --------------------------------------------------------------------------


def q_token_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a doc's DISTINCT word 3-grams
    whose corpus-wide first occurrence (min doc_id) is the doc itself — the
    dedup-adjacent signal curation pipelines use to rank "how much new text
    does this document add" (ExactSubstr's counting cousin). Two keyed
    shuffles (per-doc distinct, per-gram min) + one join back; no corpus ×
    corpus pair generation anywhere."""
    docs = read_table(spark, sf_dir, "documents")
    grams = (
        docs.withColumn("t", tokens(F.lower(F.col("text"))))
        .select(
            "doc_id",
            F.explode(
                # Guard before sequence(): Spark's sequence(1, 0) counts DOWN
                # to [1, 0] and element_at(t, 0) throws, so docs shorter than
                # the gram width must short-circuit to an empty array (house
                # rule, cf. llm_queries.py tokenizer helpers).
                F.expr(
                    "CASE WHEN size(t) >= 3 THEN"
                    " transform(sequence(1, size(t) - 2),"
                    " i -> concat_ws(' ', element_at(t, i), element_at(t, i+1),"
                    " element_at(t, i+2)))"
                    " ELSE array() END"
                )
            ).alias("gram"),
        )
        .distinct()
    )
    first = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    return (
        grams.join(first, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("long")).alias(
                "n_novel"
            ),
        )
        .withColumn("novelty_micro", F.expr("(1000000 * n_novel) DIV n_grams"))
    )


_NOVELTY_SQL = f"""
WITH grams AS (
    SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
    FROM (SELECT doc_id, {_BACKOFF_TOKS} AS t FROM documents),
         unnest(range(1, greatest(len(t) - 1, 1))) AS u(i)
), first AS (
    SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY gram
)
SELECT g.doc_id, count(*) AS n_grams,
       CAST(sum(CAST(f.first_doc = g.doc_id AS BIGINT)) AS BIGINT) AS n_novel,
       CAST((1000000 * sum(CAST(f.first_doc = g.doc_id AS BIGINT))) // count(*)
           AS BIGINT) AS novelty_micro
FROM grams g JOIN first f USING (gram)
GROUP BY g.doc_id
"""

# --------------------------------------------------------------------------
# Stratified k-fold assignment (leakage-free CV splits)
# --------------------------------------------------------------------------

_KFOLDS = 5


def q_stratified_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified k-fold: within each language stratum, docs
    are ranked by (hash64(doc_id), doc_id) and fold = (rank−1) mod k, so
    fold sizes differ by ≤1 inside every stratum (exact balance, unlike
    hash-mod assignment). The per-language rank uses the scale-safe
    :func:`grouped_rank` operator (range-bucketed parallel sorts + broadcast
    prefix offsets), NOT a per-language window — a single language at 100 TB
    would otherwise funnel through one task. Output: per (lang, fold) count."""
    from projet_data_infrastructure_spark.functions.hashing import hash64
    from projet_data_infrastructure_spark.operators.ranks import grouped_rank

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", hash64(F.col("doc_id")).alias("h")
    )
    ranked = grouped_rank(docs, "lang", "h", ties=("doc_id",))
    return (
        ranked.withColumn("fold", (F.col("rank") - 1) % _KFOLDS)
        .groupBy("lang", "fold")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_KFOLD_SQL = f"""
WITH ranked AS (
    SELECT lang,
           row_number() OVER (
               PARTITION BY lang
               ORDER BY {hash64_sql('doc_id')}, doc_id) AS rank
    FROM documents
)
SELECT lang, (rank - 1) % {_KFOLDS} AS fold, count(*) AS n_docs
FROM ranked GROUP BY 1, 2
"""

# --------------------------------------------------------------------------
# GDPR erasure-cascade audit (right-to-be-forgotten blast radius)
# --------------------------------------------------------------------------


def q_gdpr_erasure_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation blast radius of a right-to-be-forgotten batch: the
    deterministic erasure set (hash64(c_custkey) % 50 == 0, ~2%) cascades
    customer → orders → lineitem. Three keyed joins/aggregates — the
    lineitem leg joins on l_orderkey against the already-restricted orders
    frame, so the widest table is touched once with a pushed-down key set;
    no full-table rescan per leg. This is the audit a deletion job runs
    BEFORE mutating the lake (the versioned-snapshot engine applies it)."""
    from projet_data_infrastructure_spark.functions.hashing import hash64

    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    erased = cust.filter(hash64(F.col("c_custkey")) % 50 == 0).select(
        "c_custkey", "c_nationkey"
    )
    n_cust = erased.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n_customers"))
    orders_e = orders.join(
        erased, orders["o_custkey"] == erased["c_custkey"]
    ).select("o_orderkey", "c_nationkey")
    n_ord = orders_e.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n_orders"))
    li_e = li.join(orders_e, li["l_orderkey"] == orders_e["o_orderkey"]).select(
        "c_nationkey"
    )
    n_li = li_e.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n_lineitems"))
    return (
        n_cust.join(n_ord, "c_nationkey", "left")
        .join(n_li, "c_nationkey", "left")
        .fillna({"n_orders": 0, "n_lineitems": 0})
    )


_GDPR_SQL = f"""
WITH erased AS (
    SELECT c_custkey, c_nationkey FROM customer
    WHERE {hash64_sql('c_custkey')} % 50 = 0
), orders_e AS (
    SELECT o.o_orderkey, e.c_nationkey
    FROM orders o JOIN erased e ON o.o_custkey = e.c_custkey
)
SELECT c.c_nationkey,
       c.n_customers,
       coalesce(o.n_orders, 0) AS n_orders,
       coalesce(l.n_lineitems, 0) AS n_lineitems
FROM (SELECT c_nationkey, count(*) AS n_customers FROM erased GROUP BY 1) c
LEFT JOIN (SELECT c_nationkey, count(*) AS n_orders FROM orders_e GROUP BY 1) o
    USING (c_nationkey)
LEFT JOIN (SELECT c_nationkey, count(*) AS n_lineitems
           FROM lineitem li JOIN orders_e oe ON li.l_orderkey = oe.o_orderkey
           GROUP BY 1) l
    USING (c_nationkey)
"""

# --------------------------------------------------------------------------
# Holt linear-trend forecast per event type (IEEE-replay oracle)
# --------------------------------------------------------------------------

_HOLT_ALPHA = 0.5  # exactly representable in binary — both engines agree
_HOLT_BETA = 0.25


def q_holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend double exponential smoothing over each event
    type's DAILY value series, forecast horizon 7 days. Inherently a
    sequential recurrence, so it runs as ``applyInPandas`` per type — but
    over the calendar-bounded daily aggregate (≤ ~3.7 k rows/decade per
    type), so the grouped-map stage is constant-size at any corpus scale;
    the one data-sized operation is the map-side-combinable daily sum. The
    DuckDB oracle replays the IDENTICAL IEEE op sequence (α = 0.5 and
    β = 0.25 are exact binary fractions) in a recursive CTE carrying
    (level, trend) state — bit-exact match, no rounding fudge (the
    ``ewma_by_user`` house discipline)."""
    import pandas as pd

    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))).alias("d"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .groupBy("event_type", "d")
        .agg(F.sum("cents").cast("double").alias("y"))
    )

    schema = (
        "event_type string, n_days long, level_cents double,"
        " trend_cents double, forecast7_cents double"
    )

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d").reset_index(drop=True)
        y = pdf["y"].to_numpy()
        if len(y) < 2:  # mirror the oracle: <2 observations → no model row
            return pd.DataFrame(
                columns=[
                    "event_type",
                    "n_days",
                    "level_cents",
                    "trend_cents",
                    "forecast7_cents",
                ]
            )
        lvl = float(y[0])
        trd = float(y[1]) - float(y[0])
        for t in range(1, len(y)):
            prev = lvl
            lvl = _HOLT_ALPHA * float(y[t]) + (1.0 - _HOLT_ALPHA) * (lvl + trd)
            trd = _HOLT_BETA * (lvl - prev) + (1.0 - _HOLT_BETA) * trd
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_days": [len(y)],
                "level_cents": [lvl],
                "trend_cents": [trd],
                "forecast7_cents": [lvl + 7.0 * trd],
            }
        )

    return daily.groupBy("event_type").applyInPandas(holt, schema)


_HOLT_SQL = f"""
WITH RECURSIVE daily AS (
    SELECT event_type,
           datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) AS y
    FROM events GROUP BY 1, 2
), ord AS (
    SELECT event_type, y,
           row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n_days
    FROM daily
), rec AS (
    SELECT o1.event_type, o1.rn, o1.n_days,
           o1.y AS lvl,
           o2.y - o1.y AS trd
    FROM ord o1 JOIN ord o2 ON o2.event_type = o1.event_type AND o2.rn = 2
    WHERE o1.rn = 1
    UNION ALL
    SELECT o.event_type, o.rn, o.n_days,
           CAST({_HOLT_ALPHA} AS DOUBLE) * o.y
               + (CAST(1.0 AS DOUBLE) - CAST({_HOLT_ALPHA} AS DOUBLE))
                 * (r.lvl + r.trd) AS lvl,
           CAST({_HOLT_BETA} AS DOUBLE)
               * ((CAST({_HOLT_ALPHA} AS DOUBLE) * o.y
                   + (CAST(1.0 AS DOUBLE) - CAST({_HOLT_ALPHA} AS DOUBLE))
                     * (r.lvl + r.trd)) - r.lvl)
               + (CAST(1.0 AS DOUBLE) - CAST({_HOLT_BETA} AS DOUBLE)) * r.trd
               AS trd
    FROM rec r JOIN ord o ON o.event_type = r.event_type AND o.rn = r.rn + 1
)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
       lvl AS level_cents, trd AS trend_cents,
       lvl + CAST(7.0 AS DOUBLE) * trd AS forecast7_cents
FROM rec WHERE rn = n_days
"""



# --------------------------------------------------------------------------
# Content-defined chunking + chunk-level dedup (FastCDC-lite)
# --------------------------------------------------------------------------

_CDC_W = 8  # rolling-gram width (chars)
_CDC_B = 31  # polynomial base
_CDC_M = 1000003  # hash modulus (prime)
_CDC_D = 64  # boundary divisor -> expected chunk ~64 chars


def q_content_defined_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (the rsync/LBFS/FastCDC dedup primitive):
    a chunk boundary falls AFTER position i when the polynomial hash of the
    trailing 8-char gram ≡ 0 (mod 64), so boundaries move with content, not
    offsets — an insertion reshifts at most one chunk instead of every
    fixed-width block. Chunks are digested and deduplicated corpus-wide by
    first occurrence (min (doc_id, chunk_start)); per doc we report chunk
    count and the fraction of chunk BYTES already seen elsewhere — the
    storage-dedup ratio a chunked lake would achieve.

    Implementation: one char explode (posexplode of the codepoint array),
    ONE per-doc window pass computing the gram hash from 7 lags + self
    (fixed width ⇒ no rolling-state recurrence needed) and the running
    boundary count (same partition+order ⇒ one Exchange + one Sort), then
    a (doc, chunk) group rebuilding chunk text order-free via the sorted
    (pos, char) structs, and a digest-keyed min-attribution join (the
    ``token_ngram_novelty`` shape). Per-doc windows are bounded by document
    length; the corpus-sized operations are all keyed aggregates.
    """
    docs = read_table(spark, sf_dir, "documents")
    chars = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), "(?!^)")).alias("pos", "ch"),
        )
        # Spark split keeps the trailing zero-width match as an empty string
        # (limit = -1); the oracle's range() generator has no such phantom.
        .where(F.col("ch") != "")
        .select("doc_id", "pos", F.ascii("ch").alias("v"))
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    # gram hash over the trailing 8 chars: sum of lag_j * B^j (mod M)
    terms = []
    for j in range(_CDC_W):
        coef = pow(_CDC_B, j, _CDC_M)
        src = F.col("v") if j == 0 else F.lag("v", j).over(wdoc)
        terms.append((F.coalesce(src, F.lit(0)) % _CDC_M) * F.lit(coef))
    gram_hash = sum(terms[1:], terms[0]) % F.lit(_CDC_M)
    hashed = chars.withColumn(
        "is_boundary",
        ((F.col("pos") >= _CDC_W - 1) & (gram_hash % _CDC_D == 0)).cast("int"),
    )
    # chunk ordinal = boundaries strictly BEFORE this char (boundary char
    # closes its chunk), via the lagged running sum on the same window
    wrun = wdoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunked = hashed.withColumn(
        "chunk", F.sum("is_boundary").over(wrun) - F.col("is_boundary")
    )
    chunks = (
        chunked.groupBy("doc_id", "chunk")
        .agg(
            F.min("pos").alias("chunk_start"),
            F.count(F.lit(1)).alias("chunk_len"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "v"))
                        ),
                        lambda s: s["v"].cast("string"),
                    ),
                    ",",
                )
            ).alias("digest"),
        )
    )
    first = chunks.groupBy("digest").agg(
        F.min(F.struct("doc_id", "chunk_start")).alias("first_at")
    )
    return (
        chunks.join(first, "digest")
        .withColumn(
            "is_dup",
            (
                (F.col("first_at.doc_id") != F.col("doc_id"))
                | (F.col("first_at.chunk_start") != F.col("chunk_start"))
            ).cast("long"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("chunk_len").alias("n_chars"),
            F.sum(F.col("is_dup") * F.col("chunk_len")).alias("dup_chars"),
        )
        .withColumn("dup_micro", F.expr("(1000000 * dup_chars) DIV n_chars"))
    )


_CDC_TERMS_SQL = " + ".join(
    f"(coalesce(lag(v, {j}) OVER wdoc, 0) % {_CDC_M}) * {pow(_CDC_B, j, _CDC_M)}"
    if j
    else f"(v % {_CDC_M})"
    for j in range(_CDC_W)
)

_CDC_SQL = f"""
WITH chars AS (
    SELECT doc_id, i - 1 AS pos, ascii(substr(text, i, 1)) AS v
    FROM documents, unnest(range(1, length(text) + 1)) AS u(i)
), hashed AS (
    SELECT doc_id, pos,
           CAST(pos >= {_CDC_W - 1}
                AND ({_CDC_TERMS_SQL}) % {_CDC_M} % {_CDC_D} = 0 AS INT)
               AS is_boundary,
           v
    FROM chars
    WINDOW wdoc AS (PARTITION BY doc_id ORDER BY pos)
), chunked AS (
    SELECT doc_id, pos, v,
           sum(is_boundary) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - is_boundary AS chunk
    FROM hashed
), chunks AS (
    SELECT doc_id, chunk, min(pos) AS chunk_start, count(*) AS chunk_len,
           md5(string_agg(CAST(v AS VARCHAR), ',' ORDER BY pos)) AS digest
    FROM chunked GROUP BY doc_id, chunk
), first AS (
    SELECT digest, min(struct_pack(doc_id := doc_id, chunk_start := chunk_start)) AS first_at
    FROM chunks GROUP BY digest
)
SELECT c.doc_id, count(*) AS n_chunks,
       CAST(sum(chunk_len) AS BIGINT) AS n_chars,
       CAST(sum(CAST((f.first_at).doc_id <> c.doc_id
                OR (f.first_at).chunk_start <> c.chunk_start AS BIGINT)
           * chunk_len) AS BIGINT) AS dup_chars,
       CAST((1000000 * sum(CAST((f.first_at).doc_id <> c.doc_id
                OR (f.first_at).chunk_start <> c.chunk_start AS BIGINT)
           * chunk_len)) // sum(chunk_len) AS BIGINT) AS dup_micro
FROM chunks c JOIN first f USING (digest)
GROUP BY c.doc_id
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

    ev = read_table(spark, sf_dir, "events")
    tall = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        "event_id",
        F.explode(F.expr(f"sequence(0, {_BOOT_R - 1})")).alias("r"),
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
# Leave-one-out target encoding (ML feature prep)
# --------------------------------------------------------------------------

_TE_SMOOTH = 20  # prior weight (pseudo-observations of the global mean)


def q_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of the customer market segment against
    the order total — the categorical-feature prep step of every GBDT/linear
    pipeline, in its leakage-safe LOO form: each row's encoding excludes its
    OWN target, enc_i = (S_c − y_i + m·ȳ)·10⁶ / ((n_c − 1 + m)·unit), with
    m = 20 pseudo-observations of the global mean (micro-cent exact integer
    arithmetic; the global-mean prior is itself an exact integer micro-cent
    value attached via a broadcast 1-row aggregate). ONE category aggregate
    joined back map-side — no window, no per-row shuffle beyond the keyed
    join. Output: per-category stats + the 20 lowest-orderkey encoded rows
    (bounded sample; TakeOrdered shape)."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    rows = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
    ).select(
        "o_orderkey",
        "c_mktsegment",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("y"),
    )
    per_cat = rows.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_c"), F.sum("y").alias("s_c")
    )
    glob = rows.agg(
        F.expr("(sum(y) * 1000000) DIV count(1)").alias("gmean_micro")
    )
    enc = (
        rows.join(F.broadcast(per_cat), "c_mktsegment")
        .crossJoin(F.broadcast(glob))
        .select(
            "o_orderkey",
            "c_mktsegment",
            F.expr(
                f"((s_c - y) * 1000000 + {_TE_SMOOTH} * gmean_micro)"
                f" DIV (n_c - 1 + {_TE_SMOOTH})"
            ).alias("enc_micro"),
        )
    )
    return enc.orderBy("o_orderkey").limit(20)


_TE_SQL = f"""
WITH rows_ AS (
    SELECT o_orderkey, c_mktsegment,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y
    FROM orders JOIN customer ON o_custkey = c_custkey
), per_cat AS (
    SELECT c_mktsegment, count(*) AS n_c, sum(y) AS s_c
    FROM rows_ GROUP BY 1
), gm AS (
    SELECT (sum(y) * 1000000) // count(*) AS gmean_micro FROM rows_
)
SELECT o_orderkey, c_mktsegment,
       CAST(((s_c - y) * 1000000 + {_TE_SMOOTH} * gmean_micro)
           // (n_c - 1 + {_TE_SMOOTH}) AS BIGINT) AS enc_micro
FROM rows_ JOIN per_cat USING (c_mktsegment) CROSS JOIN gm
ORDER BY o_orderkey LIMIT 20
"""

# --------------------------------------------------------------------------
# CUPED-adjusted A/B lift (variance-reduced experiment readout)
# --------------------------------------------------------------------------


def q_cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Deng et al. 2013, the industry-standard A/B variance
    reduction): treatment = deterministic hash coin on user_id; outcome Y =
    the user's total event value in the SECOND half of the observation
    window; pre-period covariate X = the same total in the FIRST half
    (unaffected by treatment by construction). θ = cov(X,Y)/var(X) from
    exact DECIMAL moment sums over ALL users (the pooled estimator), then
    the adjusted outcome Ycv = Y − θ·(X − X̄) is averaged per arm — all in
    the shared-text IEEE double tree, so both engines agree bit-for-bit.
    Shape: two map-side-combinable aggregates (per-user, then global
    moments) + one bounded per-arm aggregate. Output: per-arm n, raw mean,
    CUPED mean (micro-cents)."""
    from projet_data_infrastructure_spark.functions.hashing import hash64

    ev = read_table(spark, sf_dir, "events")
    mid = F.expr("DATE '2024-01-16'")
    per_user = (
        ev.select(
            "user_id",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
            (F.to_date("ts") < mid).cast("int").alias("pre"),
        )
        .groupBy("user_id")
        .agg(
            F.sum(F.col("cents") * F.col("pre")).alias("x"),
            F.sum(F.col("cents") * (1 - F.col("pre"))).alias("y"),
        )
        .withColumn("arm", F.pmod(hash64(F.col("user_id")), F.lit(2)).cast("int"))
    )
    mom = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0))")).alias("sx"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0))")).alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("sxx"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).alias("sxy"),
    )
    # theta and xbar in the shared double tree (exact integer inputs)
    theta = "CAST((n * sxy - sx * sy) AS DOUBLE) / CAST((n * sxx - sx * sx) AS DOUBLE)"
    xbar = "CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)"
    adj = (
        per_user.crossJoin(F.broadcast(mom))
        .withColumn(
            "ycv",
            F.expr(
                f"CAST(y AS DOUBLE) - ({theta}) * (CAST(x AS DOUBLE) - ({xbar}))"
            ),
        )
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.expr("(sum(y) * 1000000) DIV count(1)").alias("raw_mean_micro"),
            pround(
                F.expr(
                    "aggregate(array_sort(collect_list(ycv)), CAST(0.0 AS DOUBLE),"
                    " (acc, v) -> acc + v) / count(1)"
                ),
                2,
            ).alias("cuped_mean_r"),
        )
    )
    return adj


_CUPED_SQL = f"""
WITH per_user AS (
    SELECT user_id,
           sum(CAST(floor(value * 100 + 0.5) AS BIGINT)
               * CAST(CAST(ts AS DATE) < DATE '2024-01-16' AS INT)) AS x,
           sum(CAST(floor(value * 100 + 0.5) AS BIGINT)
               * CAST(CAST(ts AS DATE) >= DATE '2024-01-16' AS INT)) AS y,
           CAST({hash64_sql('user_id')} % 2 AS INT) AS arm
    FROM events GROUP BY user_id
), mom AS (
    SELECT count(*) AS n,
           sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
           sum(CAST(x AS HUGEINT) * x) AS sxx, sum(CAST(x AS HUGEINT) * y) AS sxy
    FROM per_user
), adj AS (
    SELECT arm, y,
           CAST(y AS DOUBLE)
             - (CAST((n * sxy - sx * sy) AS DOUBLE) / CAST((n * sxx - sx * sx) AS DOUBLE))
               * (CAST(x AS DOUBLE) - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) AS ycv
    FROM per_user CROSS JOIN mom
)
SELECT arm, count(*) AS n_users,
       CAST((sum(y) * 1000000) // count(*) AS BIGINT) AS raw_mean_micro,
       {pround_sql("list_reduce(list_sort(list(ycv)), (acc, v) -> acc + v) / count(*)", 2)}
           AS cuped_mean_r
FROM adj GROUP BY arm
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



# --------------------------------------------------------------------------
# Exact Shapley channel attribution (game-theoretic MTA)
# --------------------------------------------------------------------------

_SHAP_CHANNELS = ("click", "error", "signup", "view")  # bit order (sorted)


def q_shapley_channel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value multi-touch attribution (the game-theoretic MTA
    marketers approximate by sampling — with 4 channels the coalition space
    is 2⁴ = 16, so the exact solve is a bounded-frame computation): the
    coalition value v(S) = total purchases by users whose EXPOSURE SET is
    exactly S, and channel i's Shapley value is Σ_{S∌i} |S|!·(3−|S|)!·
    [v(S∪{i}) − v(S)] / 4!. Reported ×24 (= 4!) so every weight
    |S|!(3−|S|)! is an exact integer — no rational rounding anywhere.
    Shape: ONE per-user aggregate (exposure bitmask + purchase count via
    bitwise-OR of per-type bits), one 16-row mask aggregate densified by a
    literal grid, then the Shapley sum over a 4×16 literal cross join —
    everything after the two keyed aggregates is constant-size. Efficiency
    property of Shapley (Σ_i φ_i = v(full) − v(∅)) is fixture-tested."""
    ev = read_table(spark, sf_dir, "events")
    bit = F.lit(0)
    for i, ch in enumerate(_SHAP_CHANNELS):
        bit = bit + F.when(F.col("event_type") == ch, F.lit(1 << i)).otherwise(0)
    pre = ev.select(
        "user_id",
        bit.alias("chbit"),
        (F.col("event_type") == "purchase").cast("long").alias("is_conv"),
    )
    per_user = pre.groupBy("user_id").agg(
        F.expr("aggregate(collect_list(chbit), 0, (acc, b) -> CAST(acc | b AS INT))").alias(
            "mask"
        ),
        F.sum("is_conv").alias("conv"),
    )
    vmask = per_user.groupBy("mask").agg(F.sum("conv").alias("v"))
    grid = spark.range(16).select(F.col("id").cast("int").alias("mask"))
    dense = grid.join(vmask, "mask", "left").fillna({"v": 0})
    # Shapley over the dense 16-row frame: for each channel bit i and each
    # coalition S without i, weight = |S|!·(3-|S|)! ; φ_i·24 = Σ w·(v(S∪i)-v(S))
    fact = {0: 6, 1: 2, 2: 2, 3: 6}  # |S|!·(3-|S|)! for |S| = 0..3
    w_expr = (
        "CASE bit_count(mask & ~(1 << i))"
        + "".join(f" WHEN {k} THEN {v}" for k, v in fact.items())
        + " END"
    )
    chan = spark.range(4).select(F.col("id").cast("int").alias("i"))
    pairs = (
        chan.crossJoin(dense)
        .filter(F.expr("(mask & (1 << i)) = 0"))
        .select("i", "mask", "v", F.expr(w_expr).alias("w"))
    )
    vplus = dense.select(
        F.col("mask").alias("mask_plus"), F.col("v").alias("v_plus")
    )
    shap = (
        pairs.join(vplus, F.expr("mask_plus = (mask | (1 << i))"))
        .groupBy("i")
        .agg(F.sum(F.col("w") * (F.col("v_plus") - F.col("v"))).alias("shap_x24"))
    )
    names = ", ".join(f"'{c}'" for c in _SHAP_CHANNELS)
    return shap.select(
        F.expr(f"element_at(array({names}), i + 1)").alias("channel"),
        "shap_x24",
    )


_SHAP_CHAN_CASE = " ".join(
    f"WHEN {i} THEN '{c}'" for i, c in enumerate(_SHAP_CHANNELS)
)

_SHAP_SQL = f"""
WITH pre AS (
    SELECT user_id,
           CASE event_type
                WHEN 'click' THEN 1 WHEN 'error' THEN 2
                WHEN 'signup' THEN 4 WHEN 'view' THEN 8 ELSE 0 END AS chbit,
           CAST(event_type = 'purchase' AS BIGINT) AS is_conv
    FROM events
), per_user AS (
    SELECT user_id, bit_or(chbit) AS mask, sum(is_conv) AS conv
    FROM pre GROUP BY user_id
), vmask AS (
    SELECT g.mask, coalesce(sum(p.conv), 0) AS v
    FROM (SELECT unnest(range(0, 16)) AS mask) g
    LEFT JOIN per_user p USING (mask)
    GROUP BY g.mask
), pairs AS (
    SELECT c.i, d.mask, d.v,
           CASE bit_count(d.mask)
                WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 WHEN 3 THEN 6 END AS w
    FROM (SELECT unnest(range(0, 4)) AS i) c
    CROSS JOIN vmask d
    WHERE (d.mask & (1 << c.i)) = 0
)
SELECT CASE p.i {_SHAP_CHAN_CASE} END AS channel,
       CAST(sum(p.w * (vp.v - p.v)) AS BIGINT) AS shap_x24
FROM pairs p JOIN vmask vp ON vp.mask = (p.mask | (1 << p.i))
GROUP BY 1
"""

# --------------------------------------------------------------------------
# Skip-gram window co-occurrence (word2vec training input)
# --------------------------------------------------------------------------

_SG_WINDOW = 2
_SG_TOPK = 30


def q_skipgram_window_cooc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram (center, context) co-occurrence counts with window ±2 —
    the training-pair input of word2vec/GloVe. Pairs are canonicalized
    (lexicographic order) so (a,b) and (b,a) accumulate together, emitted
    map-side from per-position lag/lead offsets in ONE per-doc window pass
    (fixed window ⇒ 4 offset columns, no self-join of the token table),
    then ONE pair-count shuffle; top-30 by count with lexicographic
    tie-break as TakeOrderedAndProject. Distinct from ``bigram_topk``
    (adjacent only) and ``pmi_collocations`` (scores, not window pairs)."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(tokens(F.lower(F.col("text")))).alias("pos", "w"),
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    offs = toks
    pair_cols = []
    for d in range(1, _SG_WINDOW + 1):
        offs = offs.withColumn(f"n{d}", F.lead("w", d).over(wdoc))
        pair_cols.append(f"n{d}")
    pairs = offs.select(
        "w",
        F.explode(F.array(*[F.col(c) for c in pair_cols])).alias("c"),
    ).filter(F.col("c").isNotNull())
    canon = pairs.select(
        F.least("w", "c").alias("a"), F.greatest("w", "c").alias("b")
    )
    return (
        canon.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_cooc"))
        .orderBy(F.desc("n_cooc"), F.asc("a"), F.asc("b"))
        .limit(_SG_TOPK)
    )


_SG_SQL = f"""
WITH toks AS (
    SELECT doc_id, i AS pos, t[i] AS w
    FROM (SELECT doc_id, {_BACKOFF_TOKS} AS t FROM documents),
         unnest(range(1, len(t) + 1)) AS u(i)
), offs AS (
    SELECT w,
           lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS n1,
           lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS n2
    FROM toks
), pairs AS (
    SELECT least(w, c) AS a, greatest(w, c) AS b
    FROM (SELECT w, unnest([n1, n2]) AS c FROM offs)
    WHERE c IS NOT NULL
)
SELECT a, b, count(*) AS n_cooc
FROM pairs GROUP BY a, b
ORDER BY n_cooc DESC, a, b LIMIT {_SG_TOPK}
"""



# --------------------------------------------------------------------------
# Quantile treatment effects by decile (distributional A/B readout)
# --------------------------------------------------------------------------


def q_qte_by_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effect: the per-decile difference between the
    treatment and control distributions of per-user event-value totals
    (same hash-coin arms as ``cuped_adjusted_lift``) — the distributional
    readout that catches effects a mean hides (winners-only lift, tail
    harm). Exact nearest-rank deciles per arm (rank window over the
    per-user aggregate; at warehouse scale the exact rank swaps for
    grouped_rank / approx_percentile), then a 9-row arm pivot. Integer
    cents end to end."""
    from projet_data_infrastructure_spark.functions.hashing import hash64

    ev = read_table(spark, sf_dir, "events")
    per_user = (
        ev.select(
            "user_id",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .groupBy("user_id")
        .agg(F.sum("cents").alias("total"))
        .withColumn("arm", F.pmod(hash64(F.col("user_id")), F.lit(2)).cast("int"))
    )
    wrnk = Window.partitionBy("arm").orderBy("total", "user_id")
    wtot = Window.partitionBy("arm")
    ranked = per_user.withColumn("rnk", F.row_number().over(wrnk)).withColumn(
        "n", F.count(F.lit(1)).over(wtot)
    )
    # decile d (1..9): smallest total with rnk*10 >= d*n  (nearest-rank)
    decs = (
        ranked.select(
            "arm",
            "total",
            F.explode(F.sequence(F.lit(1), F.lit(9))).alias("d"),
            "rnk",
            "n",
        )
        .filter(F.col("rnk") * 10 >= F.col("d") * F.col("n"))
        .groupBy("arm", "d")
        .agg(F.min("total").alias("q"))
    )
    t = decs.filter(F.col("arm") == 1).select("d", F.col("q").alias("q_treat"))
    c = decs.filter(F.col("arm") == 0).select("d", F.col("q").alias("q_ctrl"))
    return t.join(c, "d").select(
        "d", "q_treat", "q_ctrl", (F.col("q_treat") - F.col("q_ctrl")).alias("qte_cents")
    )


_QTE_SQL = f"""
WITH per_user AS (
    SELECT user_id, sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS total,
           CAST({hash64_sql('user_id')} % 2 AS INT) AS arm
    FROM events GROUP BY user_id
), ranked AS (
    SELECT arm, total, user_id,
           row_number() OVER (PARTITION BY arm ORDER BY total, user_id) AS rnk,
           count(*) OVER (PARTITION BY arm) AS n
    FROM per_user
), decs AS (
    SELECT arm, d, min(total) AS q
    FROM ranked, unnest(range(1, 10)) AS u(d)
    WHERE rnk * 10 >= d * n
    GROUP BY arm, d
)
SELECT t.d, CAST(t.q AS BIGINT) AS q_treat, CAST(c.q AS BIGINT) AS q_ctrl,
       CAST(t.q - c.q AS BIGINT) AS qte_cents
FROM (SELECT d, q FROM decs WHERE arm = 1) t
JOIN (SELECT d, q FROM decs WHERE arm = 0) c USING (d)
"""

# --------------------------------------------------------------------------
# Harmonic (Fourier) weekly-seasonality fit
# --------------------------------------------------------------------------


def q_fourier_weekly_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality as a 1-harmonic Fourier fit of the daily value
    series: y(t) ≈ a₀ + a₁·cos(2πt/7) + b₁·sin(2πt/7). Because the day
    grid is (near-)complete, the regressors are orthogonal on whole weeks
    and the coefficients are plain projections: a₁ = 2·Σy·cos/n etc. —
    computed over the calendar-bounded daily aggregate with an ORDER-PINNED
    float fold (array_sort by day, then an explicit sequential aggregate)
    so both engines run the identical IEEE sum order, left to right. The
    amplitude √(a₁²+b₁²) and acrophase are derived in the shared double
    expression tree. One data-sized day aggregate; everything else is the
    ≤|days| frame."""
    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))).alias("d"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").cast("double").alias("y"))
    )
    # Order-pinned folds: sort the (d, y) pairs, then fold left to right.
    rows = daily.agg(
        F.expr("array_sort(collect_list(struct(d, y)))").alias("arr")
    )
    two_pi_over_7 = "6.283185307179586 / 7.0"
    def fold(expr: str) -> str:
        return (
            f"aggregate(arr, CAST(0.0 AS DOUBLE), (acc, r) -> acc + ({expr}))"
        )
    yc = fold(f"r.y * cos(CAST(r.d AS DOUBLE) * ({two_pi_over_7}))")
    ys = fold(f"r.y * sin(CAST(r.d AS DOUBLE) * ({two_pi_over_7}))")
    ysum = fold("r.y")
    out = rows.select(
        F.expr("size(arr)").alias("n_days"),
        pround(F.expr(f"({ysum}) / size(arr)"), 2).alias("a0_r"),
        pround(F.expr(f"2.0 * ({yc}) / size(arr)"), 2).alias("a1_r"),
        pround(F.expr(f"2.0 * ({ys}) / size(arr)"), 2).alias("b1_r"),
        pround(
            F.expr(
                f"sqrt((2.0 * ({yc}) / size(arr)) * (2.0 * ({yc}) / size(arr))"
                f" + (2.0 * ({ys}) / size(arr)) * (2.0 * ({ys}) / size(arr)))"
            ),
            2,
        ).alias("amplitude_r"),
    )
    return out


_FOURIER_FOLD = "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {COL}), (acc, v) -> acc + v)"

_FOURIER_SQL = f"""
WITH daily AS (
    SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) AS y
    FROM events GROUP BY 1
), arrs AS (
    SELECT count(*) AS n,
           list(y * cos(CAST(d AS DOUBLE) * (6.283185307179586 / 7.0)) ORDER BY d) AS lc,
           list(y * sin(CAST(d AS DOUBLE) * (6.283185307179586 / 7.0)) ORDER BY d) AS ls,
           list(y ORDER BY d) AS ly
    FROM daily
), folds AS (
    SELECT n,
           {_FOURIER_FOLD.replace('{COL}', 'lc')} AS yc,
           {_FOURIER_FOLD.replace('{COL}', 'ls')} AS ys,
           {_FOURIER_FOLD.replace('{COL}', 'ly')} AS ysum
    FROM arrs
)
SELECT CAST(n AS INT) AS n_days,
       {pround_sql('ysum / n', 2)} AS a0_r,
       {pround_sql('2.0 * yc / n', 2)} AS a1_r,
       {pround_sql('2.0 * ys / n', 2)} AS b1_r,
       {pround_sql('sqrt((2.0 * yc / n) * (2.0 * yc / n) + (2.0 * ys / n) * (2.0 * ys / n))', 2)}
           AS amplitude_r
FROM folds
"""

# --------------------------------------------------------------------------
# Rank-1 ALS step (matrix-factorization family)
# --------------------------------------------------------------------------


def q_als_rank1_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact alternating-least-squares step at rank 1 on the user ×
    event_type value matrix: item factors initialize from the portable hash
    (v⁰ ∈ [1,100], integer), the user step solves u_i = Σ_j r_ij·v_j /
    Σ_j v_j² in closed form per user, the item step re-solves v_j =
    Σ_i r_ij·u_i / Σ_i u_i² — each step is ONE keyed aggregate (the
    classic scalable ALS shape: no gradient loop, factors exchanged via
    joins). Factors are kept in exact micro units (integer floor division),
    so the whole two-step update is hash-checkable. Output: the item
    factors after one full alternation."""
    from projet_data_infrastructure_spark.functions.hashing import hash64

    ev = read_table(spark, sf_dir, "events")
    r = (
        ev.groupBy("user_id", "event_type")
        .agg(
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
                "r"
            )
        )
    )
    v0 = r.select("event_type").distinct().select(
        "event_type",
        (F.pmod(hash64(F.col("event_type")), F.lit(100)) + 1).alias("v0"),
    )
    withv = r.join(F.broadcast(v0), "event_type")
    u = withv.groupBy("user_id").agg(
        F.expr("(sum(r * v0) * 1000000) DIV sum(v0 * v0)").alias("u_micro")
    )
    withu = r.join(u, "user_id")
    v1 = withu.groupBy("event_type").agg(
        F.expr(
            "CAST((CAST(sum(CAST(r AS DECIMAL(38,0)) * u_micro) AS DECIMAL(38,0))"
            " * 1000000000)"
            " DIV sum(CAST(u_micro AS DECIMAL(38,0)) * u_micro) AS BIGINT)"
        ).alias("v1_nano"),
        F.count(F.lit(1)).alias("n_users"),
    )
    return v1.join(F.broadcast(v0), "event_type").select(
        "event_type", "v0", "v1_nano", "n_users"
    )


_ALS_SQL = f"""
WITH r AS (
    SELECT user_id, event_type,
           sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS r
    FROM events GROUP BY 1, 2
), v0 AS (
    SELECT event_type,
           ({hash64_sql('event_type')} % 100) + 1 AS v0
    FROM (SELECT DISTINCT event_type FROM r)
), u AS (
    SELECT user_id, (sum(r.r * v0.v0) * 1000000) // sum(v0.v0 * v0.v0) AS u_micro
    FROM r JOIN v0 USING (event_type)
    GROUP BY user_id
), v1 AS (
    SELECT event_type,
           CAST((sum(CAST(r.r AS HUGEINT) * u.u_micro) * 1000000000)
                // sum(CAST(u.u_micro AS HUGEINT) * u.u_micro) AS BIGINT)
               AS v1_nano,
           count(*) AS n_users
    FROM r JOIN u USING (user_id)
    GROUP BY event_type
)
SELECT event_type, v0.v0, v1.v1_nano, v1.n_users
FROM v1 JOIN v0 USING (event_type)
"""



# --------------------------------------------------------------------------
# Mann-Kendall trend test + Theil-Sen slope (robust trend on the daily frame)
# --------------------------------------------------------------------------


def q_mann_kendall_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall S statistic and the Theil-Sen slope of the daily
    total-value series — the standard nonparametric trend pair (monotone
    trend without normality assumptions; TS slope is the median of all
    pairwise slopes, 29% breakdown point). Both are pairwise over the
    DAILY aggregate, so the self-join is calendar-bounded (≤ ~3.7 k rows a
    decade → ≤ 7 M pairs at any corpus size — constant, not data-scaled;
    the one data-sized operation is the day aggregate). Integer-exact: S
    is a sign sum; the slope median is an exact rational pinned as
    slope_micro = (Δcents·10⁶) DIV Δday per pair, median by exact rank
    with (numerator) tie-break. The variance/Z normalization is left to
    the caller (ties correction documented) — S and the slope are the
    portable kernel."""
    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))).alias("d"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").alias("y"))
        .localCheckpoint()  # tiny calendar frame, self-joined twice below
    )
    b = daily.select(F.col("d").alias("d2"), F.col("y").alias("y2"))
    pairs = daily.join(b, F.col("d2") > F.col("d")).select(
        F.signum(F.col("y2") - F.col("y")).cast("long").alias("sgn"),
        F.expr("((y2 - y) * 1000000) DIV (d2 - d)").alias("slope_micro"),
    )
    stats = pairs.agg(
        F.sum("sgn").alias("mk_s"), F.count(F.lit(1)).alias("n_pairs")
    )
    wr = Window.orderBy("slope_micro")
    ranked = pairs.select("slope_micro").withColumn(
        "rnk", F.row_number().over(wr)
    )
    med = ranked.crossJoin(F.broadcast(stats.select("n_pairs"))).filter(
        F.col("rnk") * 2 >= F.col("n_pairs")
    ).agg(F.min("slope_micro").alias("theil_sen_micro"))
    return stats.crossJoin(F.broadcast(med))


_MK_SQL = """
WITH daily AS (
    SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
           sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS y
    FROM events GROUP BY 1
), pairs AS (
    SELECT CAST(sign(b.y - a.y) AS BIGINT) AS sgn,
           ((b.y - a.y) * 1000000) // (b.d - a.d) AS slope_micro
    FROM daily a JOIN daily b ON b.d > a.d
), stats AS (
    SELECT sum(sgn) AS mk_s, count(*) AS n_pairs FROM pairs
), ranked AS (
    SELECT slope_micro, row_number() OVER (ORDER BY slope_micro) AS rnk
    FROM pairs
)
SELECT CAST(s.mk_s AS BIGINT) AS mk_s, s.n_pairs,
       CAST((SELECT min(slope_micro) FROM ranked, stats
        WHERE rnk * 2 >= n_pairs) AS BIGINT) AS theil_sen_micro
FROM stats s
"""

# --------------------------------------------------------------------------
# Difference-in-differences (two-arm pre/post causal readout)
# --------------------------------------------------------------------------


def q_diff_in_differences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical 2×2 difference-in-differences: hash-coin arms (the same
    assignment as ``cuped_adjusted_lift``), pre/post windows split at the
    month midpoint, cell means in exact micro-cents, and DiD = (T_post −
    T_pre) − (C_post − C_pre). ONE conditional aggregate over the events
    scan — four cells, no joins; the parallel-trends diagnostic (pre-period
    arm gap) is reported alongside."""
    from projet_data_infrastructure_spark.functions.hashing import hash64

    ev = read_table(spark, sf_dir, "events")
    mid = F.expr("DATE '2024-01-16'")
    cells = (
        ev.select(
            F.pmod(hash64(F.col("user_id")), F.lit(2)).cast("int").alias("arm"),
            (F.to_date("ts") >= mid).cast("int").alias("post"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .groupBy("arm", "post")
        .agg(
            F.expr("(sum(cents) * 1000000) DIV count(1)").alias("mean_micro"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    pivot = cells.groupBy().agg(
        F.min(F.expr("CASE WHEN arm = 1 AND post = 1 THEN mean_micro END")).alias("t_post"),
        F.min(F.expr("CASE WHEN arm = 1 AND post = 0 THEN mean_micro END")).alias("t_pre"),
        F.min(F.expr("CASE WHEN arm = 0 AND post = 1 THEN mean_micro END")).alias("c_post"),
        F.min(F.expr("CASE WHEN arm = 0 AND post = 0 THEN mean_micro END")).alias("c_pre"),
        F.sum("n").alias("n_events"),
    )
    return pivot.select(
        "t_pre",
        "t_post",
        "c_pre",
        "c_post",
        ((F.col("t_post") - F.col("t_pre")) - (F.col("c_post") - F.col("c_pre"))).alias(
            "did_micro"
        ),
        (F.col("t_pre") - F.col("c_pre")).alias("pre_gap_micro"),
        "n_events",
    )


_DID_SQL = f"""
WITH cells AS (
    SELECT CAST({hash64_sql('user_id')} % 2 AS INT) AS arm,
           CAST(CAST(ts AS DATE) >= DATE '2024-01-16' AS INT) AS post,
           (sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) * 1000000) // count(*)
               AS mean_micro,
           count(*) AS n
    FROM events GROUP BY 1, 2
), pv AS (
    SELECT min(CASE WHEN arm = 1 AND post = 1 THEN mean_micro END) AS t_post,
           min(CASE WHEN arm = 1 AND post = 0 THEN mean_micro END) AS t_pre,
           min(CASE WHEN arm = 0 AND post = 1 THEN mean_micro END) AS c_post,
           min(CASE WHEN arm = 0 AND post = 0 THEN mean_micro END) AS c_pre,
           sum(n) AS n_events
    FROM cells
)
SELECT CAST(t_pre AS BIGINT) AS t_pre, CAST(t_post AS BIGINT) AS t_post,
       CAST(c_pre AS BIGINT) AS c_pre, CAST(c_post AS BIGINT) AS c_post,
       CAST((t_post - t_pre) - (c_post - c_pre) AS BIGINT) AS did_micro,
       CAST(t_pre - c_pre AS BIGINT) AS pre_gap_micro,
       CAST(n_events AS BIGINT) AS n_events
FROM pv
"""

# --------------------------------------------------------------------------
# Caliper nearest-neighbor matching (observational ATT)
# --------------------------------------------------------------------------

_CALIPER_CENTS = 50000  # max |balance gap| for a valid match (500.00)


def q_caliper_matched_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D nearest-neighbor caliper matching on the customer balance:
    treated = hash-coin customers, each matched (with replacement) to the
    CONTROL customer with the closest account balance within a ±500.00
    caliper; the matched outcome difference (order spend) estimates the
    ATT. The nearest 1-D neighbor is found WITHOUT a pair join: union both
    arms into one balance-ordered stream and take the nearest preceding /
    following control via last()/first() over the per-arm-interleaved sort
    (two window passes on one Exchange+Sort — the asof/PIT house shape;
    ties broken toward the lower custkey via the sort key). Outcomes join
    back by custkey. Output: matched-pair count, mean treated / matched-
    control spend, ATT (micro-cents).

    Scale note: the interleaved sort is GLOBAL (nearest neighbor is a
    global property), which Spark executes as one window task — acceptable
    because matching runs on the customer DIMENSION, not a fact table (the
    compaction_bin_packing defense); at warehouse dim sizes swap to
    range-bucketed matching with one-row boundary overlap per bucket (same
    algebra per bucket, documented here rather than speculatively built)."""
    from projet_data_infrastructure_spark.functions.hashing import hash64

    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long").alias("bal"),
        F.pmod(hash64(F.col("c_custkey")), F.lit(2)).cast("int").alias("arm"),
    )
    orders = read_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.floor(F.sum("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("spend")
    )
    base = cust.join(
        spend, cust["c_custkey"] == spend["o_custkey"], "left"
    ).select("c_custkey", "bal", "arm", F.coalesce("spend", F.lit(0)).alias("spend"))
    # nearest control by balance via one interleaved sort (no pair join)
    ctrl_key = F.when(F.col("arm") == 0, F.struct("bal", "c_custkey", "spend"))
    w = Window.orderBy("bal", "arm", "c_custkey")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    wnext = w.rowsBetween(1, Window.unboundedFollowing)
    enriched = (
        base.withColumn("prev_c", F.last(ctrl_key, ignorenulls=True).over(wprev))
        .withColumn("next_c", F.first(ctrl_key, ignorenulls=True).over(wnext))
    )
    treated = enriched.filter(F.col("arm") == 1).select(
        "c_custkey",
        "bal",
        "spend",
        F.expr(
            "CASE"
            " WHEN prev_c IS NULL AND next_c IS NULL THEN NULL"
            " WHEN prev_c IS NULL THEN next_c"
            " WHEN next_c IS NULL THEN prev_c"
            " WHEN (bal - prev_c.bal) <= (next_c.bal - bal) THEN prev_c"
            " ELSE next_c END"
        ).alias("m"),
    )
    matched = treated.filter(
        F.col("m").isNotNull()
        & (F.abs(F.col("bal") - F.col("m.bal")) <= _CALIPER_CENTS)
    )
    return matched.agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.expr("(sum(spend) * 1000000) DIV count(1)").alias("treated_mean_micro"),
        F.expr("(sum(m.spend) * 1000000) DIV count(1)").alias("control_mean_micro"),
        F.expr(
            "(sum(spend) * 1000000) DIV count(1)"
            " - (sum(m.spend) * 1000000) DIV count(1)"
        ).alias("att_micro"),
    )


_CALIPER_SQL = f"""
WITH base AS (
    SELECT c.c_custkey,
           CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS bal,
           CAST({hash64_sql('c.c_custkey')} % 2 AS INT) AS arm,
           coalesce(s.spend, 0) AS spend
    FROM customer c
    LEFT JOIN (SELECT o_custkey,
                      CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS spend
               FROM orders GROUP BY 1) s
      ON c.c_custkey = s.o_custkey
), enriched AS (
    SELECT *,
           last_value(CASE WHEN arm = 0
                           THEN struct_pack(bal := bal, c_custkey := c_custkey,
                                            spend := spend) END IGNORE NULLS)
               OVER (ORDER BY bal, arm, c_custkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_c,
           first_value(CASE WHEN arm = 0
                            THEN struct_pack(bal := bal, c_custkey := c_custkey,
                                             spend := spend) END IGNORE NULLS)
               OVER (ORDER BY bal, arm, c_custkey
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_c
    FROM base
), matched AS (
    SELECT bal, spend,
           CASE WHEN prev_c IS NULL AND next_c IS NULL THEN NULL
                WHEN prev_c IS NULL THEN next_c
                WHEN next_c IS NULL THEN prev_c
                WHEN (bal - prev_c.bal) <= (next_c.bal - bal) THEN prev_c
                ELSE next_c END AS m
    FROM enriched WHERE arm = 1
)
SELECT count(*) AS n_matched,
       CAST((sum(spend) * 1000000) // count(*) AS BIGINT) AS treated_mean_micro,
       CAST((sum(m.spend) * 1000000) // count(*) AS BIGINT) AS control_mean_micro,
       CAST((sum(spend) * 1000000) // count(*)
           - (sum(m.spend) * 1000000) // count(*) AS BIGINT) AS att_micro
FROM matched
WHERE m IS NOT NULL AND abs(bal - m.bal) <= {_CALIPER_CENTS}
"""



# --------------------------------------------------------------------------
# k-fold cross-validated Naive Bayes (partial-aggregate subtraction CV)
# --------------------------------------------------------------------------

_NBCV_FOLDS = 5
_NBCV_QBIAS = 0.50001  # the dsir/naive_bayes micro-nat half-up bias


def q_nb_crossval_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validated accuracy of the multinomial NB language
    classifier — with the trick that makes CV scale: each fold's TRAINING
    counts are never recomputed from the corpus; they are the corpus-wide
    partial aggregates MINUS the fold's partial aggregates (counts, class
    totals, priors, and the train vocabulary size all derive from one
    (fold, lang, word) aggregate by subtraction). So 5-fold CV costs ONE
    corpus tokenize + vocabulary-bounded arithmetic — not 5 corpus passes
    (the standard k-fold formulation retrains k times over k-1/k of the
    data; at 100 TB that is k corpus scans, here it is exactly one).

    Determinism: the ``naive_bayes_lang`` house discipline — Laplace
    log-probs quantized once to integer micro-nats (floor(x·10⁶ + 0.50001)
    so a 1-ulp ln() difference cannot flip a bucket), scoring is an exact
    integer dot product, argmax ties to the smaller lang. Output: per-fold
    n_docs / n_correct / accuracy_micro."""
    from projet_data_infrastructure_spark.functions.hashing import hash64

    docs = read_table(spark, sf_dir, "documents").withColumn(
        "fold", F.pmod(hash64(F.col("doc_id")), F.lit(_NBCV_FOLDS)).cast("int")
    )
    dwc = (
        docs.select(
            "doc_id", "fold", "lang", F.explode(tokens(F.lower(F.col("text")))).alias("w")
        )
        .groupBy("doc_id", "fold", "lang", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()  # feeds the stats AND the scoring pass
    )
    # corpus-wide and per-fold partial aggregates (the subtraction inputs)
    wc_all = dwc.groupBy("lang", "w").agg(F.sum("c").alias("cw"))
    wc_fold = dwc.groupBy("fold", "lang", "w").agg(F.sum("c").alias("cwf"))
    folds = spark.range(_NBCV_FOLDS).select(F.col("id").cast("int").alias("fold"))
    # train counts per fold = all - fold (grid = folds x corpus vocab pairs)
    wc_t = (
        folds.crossJoin(wc_all)
        .join(wc_fold, ["fold", "lang", "w"], "left")
        .select(
            "fold",
            "lang",
            "w",
            (F.col("cw") - F.coalesce(F.col("cwf"), F.lit(0))).alias("cwt"),
        )
    )
    tot_t = wc_t.groupBy("fold", "lang").agg(F.sum("cwt").alias("tott"))
    # train vocabulary per fold: words whose cross-class train count > 0
    word_all = wc_all.groupBy("w").agg(F.sum("cw").alias("wa"))
    word_fold = dwc.groupBy("fold", "w").agg(F.sum("c").alias("wf"))
    v_t = (
        folds.crossJoin(word_all)
        .join(word_fold, ["fold", "w"], "left")
        .filter(F.col("wa") - F.coalesce(F.col("wf"), F.lit(0)) > 0)
        .groupBy("fold")
        .agg(F.count(F.lit(1)).alias("vt"))
    )
    # train priors per fold
    nd_all = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("nd"))
    nd_fold = docs.groupBy("fold", "lang").agg(F.count(F.lit(1)).alias("ndf"))
    nd_t = (
        folds.crossJoin(nd_all)
        .join(nd_fold, ["fold", "lang"], "left")
        .select(
            "fold",
            "lang",
            (F.col("nd") - F.coalesce(F.col("ndf"), F.lit(0))).alias("ndt"),
        )
    )
    n_t = nd_t.groupBy("fold").agg(F.sum("ndt").alias("nt"))

    def _q(col):
        return F.floor(col * F.lit(1_000_000.0) + F.lit(_NBCV_QBIAS)).cast("long")

    weights = (
        wc_t.join(tot_t, ["fold", "lang"])
        .join(F.broadcast(v_t), "fold")
        .select(
            "fold",
            "lang",
            "w",
            _q(
                F.log(
                    (F.col("cwt") + 1).cast("double")
                    / (F.col("tott") + F.col("vt")).cast("double")
                )
            ).alias("lw_unats"),
        )
    )
    cls = (
        nd_t.join(tot_t, ["fold", "lang"])
        .join(F.broadcast(v_t), "fold")
        .join(F.broadcast(n_t), "fold")
        .select(
            "fold",
            F.col("lang").alias("cand"),
            _q(F.log(F.col("ndt").cast("double") / F.col("nt").cast("double"))).alias(
                "prior_unats"
            ),
            _q(
                F.log(F.lit(1.0) / (F.col("tott") + F.col("vt")).cast("double"))
            ).alias("default_unats"),
        )
    )
    wt = weights.select(
        F.col("fold").alias("wfold"),
        F.col("lang").alias("wcand"),
        F.col("w").alias("ww"),
        "lw_unats",
    )
    scored = (
        dwc.withColumnRenamed("lang", "true_lang")
        .join(F.broadcast(cls), "fold")
        .join(
            wt,
            (F.col("fold") == F.col("wfold"))
            & (F.col("cand") == F.col("wcand"))
            & (F.col("w") == F.col("ww")),
            "left",
        )
        .groupBy("doc_id", "fold", "true_lang", "cand", "prior_unats")
        .agg(
            F.sum(
                F.col("c") * F.coalesce(F.col("lw_unats"), F.col("default_unats"))
            ).alias("ll")
        )
        .select(
            "doc_id",
            "fold",
            "true_lang",
            "cand",
            (F.col("prior_unats") + F.col("ll")).alias("score_unats"),
        )
    )
    wdoc = Window.partitionBy("doc_id").orderBy(F.desc("score_unats"), F.asc("cand"))
    pred = scored.withColumn("rn", F.row_number().over(wdoc)).filter(F.col("rn") == 1)
    return (
        pred.groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("cand") == F.col("true_lang")).cast("long")).alias(
                "n_correct"
            ),
        )
        .withColumn("accuracy_micro", F.expr("(1000000 * n_correct) DIV n_docs"))
    )


_NBCV_TOKS = "list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t != '')"

_NBCV_SQL = f"""
WITH d AS (
    SELECT doc_id, CAST({hash64_sql('doc_id')} % {_NBCV_FOLDS} AS INT) AS fold,
           lang, text
    FROM documents
), dwc AS (
    SELECT doc_id, fold, lang, w, count(*) AS c
    FROM (SELECT doc_id, fold, lang, unnest({_NBCV_TOKS}) AS w FROM d)
    GROUP BY 1, 2, 3, 4
), wc_all AS (
    SELECT lang, w, sum(c) AS cw FROM dwc GROUP BY 1, 2
), wc_fold AS (
    SELECT fold, lang, w, sum(c) AS cwf FROM dwc GROUP BY 1, 2, 3
), folds AS (
    SELECT unnest(range(0, {_NBCV_FOLDS})) AS fold
), wc_t AS (
    SELECT f.fold, a.lang, a.w, a.cw - coalesce(wf.cwf, 0) AS cwt
    FROM folds f CROSS JOIN wc_all a
    LEFT JOIN wc_fold wf ON wf.fold = f.fold AND wf.lang = a.lang AND wf.w = a.w
), tot_t AS (
    SELECT fold, lang, sum(cwt) AS tott FROM wc_t GROUP BY 1, 2
), word_all AS (
    SELECT w, sum(cw) AS wa FROM wc_all GROUP BY w
), word_fold AS (
    SELECT fold, w, sum(c) AS wf FROM dwc GROUP BY 1, 2
), v_t AS (
    SELECT f.fold, count(*) AS vt
    FROM folds f CROSS JOIN word_all a
    LEFT JOIN word_fold wf ON wf.fold = f.fold AND wf.w = a.w
    WHERE a.wa - coalesce(wf.wf, 0) > 0
    GROUP BY f.fold
), nd_all AS (
    SELECT lang, count(*) AS nd FROM d GROUP BY lang
), nd_fold AS (
    SELECT fold, lang, count(*) AS ndf FROM d GROUP BY 1, 2
), nd_t AS (
    SELECT f.fold, a.lang, a.nd - coalesce(nf.ndf, 0) AS ndt
    FROM folds f CROSS JOIN nd_all a
    LEFT JOIN nd_fold nf ON nf.fold = f.fold AND nf.lang = a.lang
), n_t AS (
    SELECT fold, sum(ndt) AS nt FROM nd_t GROUP BY fold
), weights AS (
    SELECT t.fold, t.lang, t.w,
           CAST(floor(ln(CAST(t.cwt + 1 AS DOUBLE) / CAST(tt.tott + v.vt AS DOUBLE))
                      * 1000000.0 + {_NBCV_QBIAS}) AS BIGINT) AS lw_unats
    FROM wc_t t
    JOIN tot_t tt ON tt.fold = t.fold AND tt.lang = t.lang
    JOIN v_t v ON v.fold = t.fold
), cls AS (
    SELECT nd.fold, nd.lang AS cand,
           CAST(floor(ln(CAST(nd.ndt AS DOUBLE) / CAST(n.nt AS DOUBLE))
                      * 1000000.0 + {_NBCV_QBIAS}) AS BIGINT) AS prior_unats,
           CAST(floor(ln(1.0 / CAST(tt.tott + v.vt AS DOUBLE))
                      * 1000000.0 + {_NBCV_QBIAS}) AS BIGINT) AS default_unats
    FROM nd_t nd
    JOIN tot_t tt ON tt.fold = nd.fold AND tt.lang = nd.lang
    JOIN v_t v ON v.fold = nd.fold
    JOIN n_t n ON n.fold = nd.fold
), scored AS (
    SELECT dwc.doc_id, dwc.fold, dwc.lang AS true_lang, cls.cand,
           cls.prior_unats
               + sum(dwc.c * coalesce(w.lw_unats, cls.default_unats))
               AS score_unats
    FROM dwc
    JOIN cls ON cls.fold = dwc.fold
    LEFT JOIN weights w
      ON w.fold = dwc.fold AND w.lang = cls.cand AND w.w = dwc.w
    GROUP BY 1, 2, 3, 4, cls.prior_unats
), pred AS (
    SELECT fold, true_lang, cand,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY score_unats DESC, cand ASC) AS rn
    FROM scored
)
SELECT fold, count(*) AS n_docs,
       CAST(sum(CAST(cand = true_lang AS BIGINT)) AS BIGINT) AS n_correct,
       CAST((1000000 * sum(CAST(cand = true_lang AS BIGINT))) // count(*)
           AS BIGINT) AS accuracy_micro
FROM pred WHERE rn = 1
GROUP BY fold
"""


SPECS: list[QuerySpec] = [
    QuerySpec(
        "pit_regime_attribution",
        q_pit_regime_attribution,
        _PIT_SQL,
        ("join", "scd2", "window", "bench"),
        doc="Point-in-time join: purchases attributed to the SCD2 regime in "
        "force at their timestamp via the union+window carry-forward (one "
        "Exchange + one Sort per user stream, no interval range join)",
    ),
    QuerySpec(
        "t_closeness_audit",
        q_t_closeness_audit,
        _T_CLOSENESS_SQL,
        ("governance",),
        doc="t-closeness per (nation, segment) QI cell: exact-integer EMD of "
        "the ordered balance-band distribution vs global over a bounded "
        "dense grid; one data-sized aggregate",
    ),
    QuerySpec(
        "higher_moments_by_type",
        q_higher_moments_by_type,
        _HIGHER_MOMENTS_SQL,
        ("stats", "agg"),
        doc="Exact skewness / excess kurtosis per event_type: DECIMAL(38,0)/"
        "HUGEINT power sums, shared-text IEEE double solve (sqrt form, no pow)",
    ),
    QuerySpec(
        "trigram_backoff_score",
        q_trigram_backoff_score,
        _BACKOFF_SQL,
        ("text", "lm", "bench"),
        doc="Stupid Backoff trigram LM scoring of heldout docs from train-"
        "split counts: integer micro scores, vocabulary-bounded joins only",
    ),
    QuerySpec(
        "precision_recall_sweep",
        q_precision_recall_sweep,
        _SWEEP_SQL,
        ("ml", "agg"),
        doc="Classifier threshold sweep: 5-threshold literal explode, one "
        "combinable aggregate, exact micro precision/recall/F1",
    ),
    QuerySpec(
        "stream_pit_attribution",
        q_stream_pit_attribution,
        _PIT_SQL,
        ("streaming", "stateful"),
        doc="LIVE point-in-time attribution as a custom stateful operator: "
        "one-string-per-user state, update-mode emission hash-checked "
        "against the batch PIT oracle (stream == batch == DuckDB)",
    ),
    QuerySpec(
        "token_ngram_novelty",
        q_token_ngram_novelty,
        _NOVELTY_SQL,
        ("text", "dedup", "bench"),
        doc="Per-doc fraction of distinct 3-grams first seen in that doc: "
        "two keyed shuffles + one join back, no pair generation",
    ),
    QuerySpec(
        "stratified_kfold_assign",
        q_stratified_kfold_assign,
        _KFOLD_SQL,
        ("ml", "split"),
        doc="Deterministic stratified 5-fold CV assignment via the scale-"
        "safe grouped_rank operator (no per-language corpus window); "
        "exact ≤1-row fold balance per stratum",
    ),
    QuerySpec(
        "gdpr_erasure_cascade",
        q_gdpr_erasure_cascade,
        _GDPR_SQL,
        ("governance", "join"),
        doc="Right-to-be-forgotten blast-radius audit: hash-selected erasure "
        "set cascaded customer→orders→lineitem with keyed joins only",
    ),
    QuerySpec(
        "content_defined_chunking",
        q_content_defined_chunking,
        _CDC_SQL,
        ("dedup", "text"),
        doc="FastCDC-lite content-defined chunking: lag-polynomial gram hash "
        "boundaries in ONE per-doc window pass, chunk digests deduped "
        "corpus-wide by first occurrence; per-doc storage-dedup ratio",
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
        "target_encode_loo",
        q_target_encode_loo,
        _TE_SQL,
        ("ml", "feature"),
        doc="Leakage-safe leave-one-out target encoding with prior "
        "smoothing: one category aggregate joined back map-side, exact "
        "integer micro-cents; bounded 20-row sample output",
    ),
    QuerySpec(
        "cuped_adjusted_lift",
        q_cuped_adjusted_lift,
        _CUPED_SQL,
        ("ml", "stats"),
        doc="CUPED variance-reduced A/B readout: hash coin arms, pooled "
        "theta from exact DECIMAL moments, order-pinned float fold for the "
        "adjusted mean; raw vs CUPED means per arm",
    ),
    QuerySpec(
        "winsorized_trimmed_mean",
        q_winsorized_trimmed_mean,
        _ROBUST_SQL,
        ("stats", "agg"),
        doc="5% winsorized + trimmed means per type from exact nearest-rank "
        "cutoffs; one rank window + one aggregate",
    ),
    QuerySpec(
        "shapley_channel_attribution",
        q_shapley_channel_attribution,
        _SHAP_SQL,
        ("ml", "attribution"),
        doc="EXACT Shapley multi-touch attribution over the 16-coalition "
        "grid (4 channels): two keyed aggregates, then constant-size "
        "integer Shapley sums reported x24 — no sampling, no rationals",
    ),
    QuerySpec(
        "skipgram_window_cooc",
        q_skipgram_window_cooc,
        _SG_SQL,
        ("text",),
        doc="word2vec skip-gram pair counts, window +/-2, canonicalized "
        "pairs from lead offsets in one per-doc window pass + one shuffle",
    ),
    QuerySpec(
        "qte_by_decile",
        q_qte_by_decile,
        _QTE_SQL,
        ("ml", "stats"),
        doc="Quantile treatment effects: exact nearest-rank deciles per "
        "hash-coin arm of per-user totals, 9-row treat-vs-control pivot",
    ),
    QuerySpec(
        "fourier_weekly_fit",
        q_fourier_weekly_fit,
        _FOURIER_SQL,
        ("timeseries", "stats"),
        doc="1-harmonic Fourier fit of weekly seasonality over the "
        "calendar-bounded daily series; ORDER-PINNED float folds keep the "
        "projections bit-identical cross-engine",
    ),
    QuerySpec(
        "als_rank1_step",
        q_als_rank1_step,
        _ALS_SQL,
        ("ml", "recsys"),
        doc="One exact rank-1 ALS alternation (hash init, closed-form user "
        "then item solves as keyed aggregates) in integer micro units — "
        "the scalable matrix-factorization shape, hash-checkable",
    ),
    QuerySpec(
        "mann_kendall_theilsen",
        q_mann_kendall_theilsen,
        _MK_SQL,
        ("timeseries", "stats"),
        doc="Mann-Kendall S + exact Theil-Sen median slope over the "
        "calendar-bounded daily frame (pairwise stays constant-size at any "
        "corpus scale); integer sign sums and rational slopes",
    ),
    QuerySpec(
        "diff_in_differences",
        q_diff_in_differences,
        _DID_SQL,
        ("ml", "stats"),
        doc="2x2 difference-in-differences with hash-coin arms and a "
        "pre/post split: one conditional aggregate, DiD + parallel-trends "
        "gap in exact micro-cents",
    ),
    QuerySpec(
        "caliper_matched_att",
        q_caliper_matched_att,
        _CALIPER_SQL,
        ("ml", "join"),
        doc="1-D caliper nearest-neighbor matching via one interleaved "
        "balance sort (no pair join): prev/next control carry-forward "
        "windows, ATT in exact micro-cents",
    ),
    QuerySpec(
        "nb_crossval_accuracy",
        q_nb_crossval_accuracy,
        _NBCV_SQL,
        ("ml", "text"),
        doc="5-fold CV of the NB language classifier where every fold's "
        "training statistics are corpus aggregates MINUS fold aggregates — "
        "one corpus tokenize instead of k retraining passes; micro-nat "
        "quantized, integer-exact scoring",
    ),
    QuerySpec(
        "holt_linear_forecast",
        q_holt_linear_forecast,
        _HOLT_SQL,
        ("timeseries", "pandas_udf"),
        doc="Holt double exponential smoothing per event type over the "
        "calendar-bounded daily series (applyInPandas); DuckDB recursive-CTE "
        "IEEE replay — bit-exact, no rounding fudge",
    ),
]
