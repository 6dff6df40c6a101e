"""Model-fitting and evaluation operators expressed as Spark aggregates:
k-NN voting, boosted stumps, conformal intervals, CV sweeps, fold
assignment, encodings, factorization steps, and expert-routing load.

Consolidated from the round-6..round-10 build modules (round 11, VERDICT
r10 item 6) — specs, oracles, and hashes unchanged; each spec keeps its
original design docstring. The distributed pattern this module
demonstrates: classical ML fitting/eval reduces to sufficient-statistics
aggregates over bounded feature domains plus O(|domain|) window solves —
never per-row model state, never a driver-side training loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_data_infrastructure_spark.functions.hashing import hash64, hash64_sql
from projet_data_infrastructure_spark.operators import similarity
from projet_data_infrastructure_spark.plans._portable import (
    fdiv as _fdiv,
    pround,
    pround_sql,
)
from projet_data_infrastructure_spark.plans.registry import QuerySpec
from projet_data_infrastructure_spark.sources.readers import (
    read_table,
    read_table_balanced,
)

SPECS: list[QuerySpec] = []

# --------------------------------------------------------------------------
# k-NN majority-vote classification over embeddings
# --------------------------------------------------------------------------

_KNN_Q = 20  # query vectors: vec_id < 20, candidates: the rest
_KNN_K = 5


def q_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _KNN_Q).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("true_label"),
    )
    cands = emb.filter(F.col("vec_id") >= _KNN_Q)
    scored = cands.join(F.broadcast(queries)).select(
        "qid",
        "true_label",
        "vec_id",
        "label",
        pround(similarity.cosine("embedding", "qv"), 6).alias("sim"),
    )
    wk = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    top = scored.withColumn("rnk", F.row_number().over(wk)).filter(F.col("rnk") <= _KNN_K)
    votes = top.groupBy("qid", "true_label", "label").agg(F.count(F.lit(1)).alias("votes"))
    wv = Window.partitionBy("qid").orderBy(F.desc("votes"), F.asc("label"))
    return (
        votes.withColumn("vrnk", F.row_number().over(wv))
        .filter(F.col("vrnk") == 1)
        .select(
            "qid",
            "true_label",
            F.col("label").alias("pred_label"),
            F.col("votes").cast("long").alias("votes"),
            (F.col("label") == F.col("true_label")).cast("int").alias("correct"),
        )
        .orderBy("qid")
    )


_KNN_SQL = f"""
WITH q AS (
    SELECT vec_id AS qid, embedding::DOUBLE[] AS qv, label AS true_label
    FROM embeddings WHERE vec_id < {_KNN_Q}
), scored AS (
    SELECT q.qid, q.true_label, e.vec_id, e.label,
           {pround_sql('list_cosine_similarity(e.embedding::DOUBLE[], q.qv)', 6)} AS sim
    FROM embeddings e, q
    WHERE e.vec_id >= {_KNN_Q}
), top AS (
    SELECT qid, true_label, label
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) <= {_KNN_K}
), votes AS (
    SELECT qid, true_label, label, count(*) AS votes
    FROM top GROUP BY qid, true_label, label
)
SELECT qid, true_label, label AS pred_label,
       CAST(votes AS BIGINT) AS votes,
       CAST(label = true_label AS INT) AS correct
FROM votes
QUALIFY row_number() OVER (PARTITION BY qid ORDER BY votes DESC, label ASC) = 1
ORDER BY qid
"""


# --------------------------------------------------------------------------
# Two-round L2 gradient boosting with decision stumps
# --------------------------------------------------------------------------

_GBDT_Y = "CAST(round(l_extendedprice * 100) AS BIGINT)"
_GBDT_X1 = "CAST(l_quantity AS BIGINT)"
_GBDT_X2 = "CAST(round(l_discount * 100) AS BIGINT)"


def _gbdt_split_exprs(big: str, op: str) -> dict[str, str]:
    """Split-score and stump-mean expressions over the cumulative frame
    columns (feat, nl, sl, nt, st). Engine-parameterized: ``big`` is
    DECIMAL(38,0) on Spark, HUGEINT on DuckDB; ``op`` is DIV / //."""
    nl, sl = f"CAST(nl AS {big})", f"CAST(sl AS {big})"
    nr, sr = f"(CAST(nt AS {big}) - {nl})", f"(CAST(st AS {big}) - {sl})"
    score = f"({sl} * {sl} * {nr} + {sr} * {sr} * {nl})"
    return {
        "score": score,
        "pred_l": f"CAST({_fdiv(f'{sl} * 1000', nl, op)} AS BIGINT)",
        "pred_r": f"CAST({_fdiv(f'{sr} * 1000', nr, op)} AS BIGINT)",
        "n_l": f"CAST(nl AS BIGINT)",
        "n_r": f"CAST(nt - nl AS BIGINT)",
    }


def _gbdt_best_stump(df: DataFrame, feat: str, target: str, milli: bool) -> DataFrame:
    """One boosting stage: (feature, n, Σtarget) aggregate → cumulative
    window over the ≤50-row feature frame → arg-max split. ``milli`` =
    target already in milli-cents (stage 2) vs cents (stage 1 scales ×1000
    inside pred via the shared expression)."""
    per = df.groupBy(F.col(feat).alias("feat")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(target).cast("decimal(25,0)")).alias("s"),
    )
    w = Window.orderBy("feat").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        "feat",
        F.sum("n").over(w).alias("nl"),
        F.sum("s").over(w).alias("sl"),
    )
    tot = per.agg(F.sum("n").alias("nt"), F.sum("s").alias("st"))
    cand = cum.crossJoin(F.broadcast(tot)).filter(F.col("nl") < F.col("nt"))
    ex = _gbdt_split_exprs("DECIMAL(38,0)", "DIV")
    pred_scale = "" if milli else " * 1000"
    scored = cand.select(
        "feat",
        F.expr(ex["score"]).alias("score"),
        F.expr(ex["pred_l"].replace(" * 1000", pred_scale)).alias("pred_l"),
        F.expr(ex["pred_r"].replace(" * 1000", pred_scale)).alias("pred_r"),
        F.expr(ex["n_l"]).alias("n_l"),
        F.expr(ex["n_r"]).alias("n_r"),
    )
    wb = Window.orderBy(F.desc("score"), F.asc("feat"))
    return scored.withColumn("brnk", F.row_number().over(wb)).filter(F.col("brnk") == 1)


def q_gbdt_stump_boost(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select(
        F.expr(_GBDT_X1).alias("x1"),
        F.expr(_GBDT_X2).alias("x2"),
        F.expr(_GBDT_Y).alias("y"),
    )
    # Stage 1: y (cents) ~ stump(x1); predictions in milli-cents.
    best1 = _gbdt_best_stump(li, "x1", "y", milli=False)
    with1 = li.crossJoin(F.broadcast(best1.select("feat", "pred_l", "pred_r"))).select(
        "x2",
        (
            F.col("y") * F.lit(1000)
            - F.when(F.col("x1") <= F.col("feat"), F.col("pred_l")).otherwise(F.col("pred_r"))
        ).alias("r1"),
    )
    mar1 = with1.agg(
        F.expr(
            f"CAST({_fdiv('CAST(sum(abs(r1)) AS DECIMAL(25,0))', 'count(*)', 'DIV')} AS BIGINT)"
        ).alias("mar")
    )
    # Stage 2: milli-cent residuals ~ stump(x2).
    best2 = _gbdt_best_stump(with1, "x2", "r1", milli=True)
    with2 = with1.crossJoin(F.broadcast(best2.select("feat", "pred_l", "pred_r"))).select(
        (
            F.col("r1")
            - F.when(F.col("x2") <= F.col("feat"), F.col("pred_l")).otherwise(F.col("pred_r"))
        ).alias("r2")
    )
    mar2 = with2.agg(
        F.expr(
            f"CAST({_fdiv('CAST(sum(abs(r2)) AS DECIMAL(25,0))', 'count(*)', 'DIV')} AS BIGINT)"
        ).alias("mar")
    )
    row1 = (
        best1.crossJoin(mar1)
        .select(
            F.lit(1).alias("stage"),
            F.lit("l_quantity").alias("feature"),
            F.col("feat").cast("long").alias("threshold"),
            F.col("n_l").alias("n_left"),
            F.col("n_r").alias("n_right"),
            F.col("pred_l").alias("pred_left_milli"),
            F.col("pred_r").alias("pred_right_milli"),
            F.col("mar").alias("mean_abs_resid_milli"),
        )
    )
    row2 = (
        best2.crossJoin(mar2)
        .select(
            F.lit(2).alias("stage"),
            F.lit("discount_pct").alias("feature"),
            F.col("feat").cast("long").alias("threshold"),
            F.col("n_l").alias("n_left"),
            F.col("n_r").alias("n_right"),
            F.col("pred_l").alias("pred_left_milli"),
            F.col("pred_r").alias("pred_right_milli"),
            F.col("mar").alias("mean_abs_resid_milli"),
        )
    )
    return row1.unionAll(row2).orderBy("stage")


def _gbdt_stage_sql(src: str, feat: str, target: str, pred_scale: str) -> str:
    """CTE text for one stage's best split (DuckDB side, HUGEINT math)."""
    ex = _gbdt_split_exprs("HUGEINT", "//")
    return f"""
    SELECT feat,
           {ex['pred_l'].replace(' * 1000', pred_scale)} AS pred_l,
           {ex['pred_r'].replace(' * 1000', pred_scale)} AS pred_r,
           {ex['n_l']} AS n_l, {ex['n_r']} AS n_r
    FROM (
        SELECT feat, nl, sl,
               (SELECT count(*) FROM {src}) AS nt,
               (SELECT CAST(sum({target}) AS HUGEINT) FROM {src}) AS st
        FROM (
            SELECT feat,
                   sum(n) OVER (ORDER BY feat) AS nl,
                   sum(s) OVER (ORDER BY feat) AS sl
            FROM (
                SELECT {feat} AS feat, count(*) AS n,
                       CAST(sum({target}) AS HUGEINT) AS s
                FROM {src} GROUP BY 1
            )
        )
        WHERE nl < (SELECT count(*) FROM {src})
    )
    QUALIFY row_number() OVER (ORDER BY {ex['score']} DESC, feat ASC) = 1
    """


_GBDT_SQL = f"""
WITH base AS (
    SELECT {_GBDT_X1} AS x1, {_GBDT_X2} AS x2, {_GBDT_Y} AS y FROM lineitem
), best1 AS ({_gbdt_stage_sql('base', 'x1', 'y', " * 1000")}
), staged AS (
    SELECT b.x2,
           b.y * 1000 - CASE WHEN b.x1 <= s.feat THEN s.pred_l ELSE s.pred_r END AS r1
    FROM base b, best1 s
), best2 AS ({_gbdt_stage_sql('staged', 'x2', 'r1', "")}
), staged2 AS (
    SELECT t.r1 - CASE WHEN t.x2 <= s.feat THEN s.pred_l ELSE s.pred_r END AS r2
    FROM staged t, best2 s
), mar1 AS (
    SELECT CAST({_fdiv('CAST(sum(abs(r1)) AS HUGEINT)', 'count(*)', '//')} AS BIGINT) AS mar
    FROM staged
), mar2 AS (
    SELECT CAST({_fdiv('CAST(sum(abs(r2)) AS HUGEINT)', 'count(*)', '//')} AS BIGINT) AS mar
    FROM staged2
)
SELECT 1 AS stage, 'l_quantity' AS feature, CAST(feat AS BIGINT) AS threshold,
       n_l AS n_left, n_r AS n_right, pred_l AS pred_left_milli,
       pred_r AS pred_right_milli, (SELECT mar FROM mar1) AS mean_abs_resid_milli
FROM best1
UNION ALL
SELECT 2 AS stage, 'discount_pct' AS feature, CAST(feat AS BIGINT) AS threshold,
       n_l AS n_left, n_r AS n_right, pred_l AS pred_left_milli,
       pred_r AS pred_right_milli, (SELECT mar FROM mar2) AS mean_abs_resid_milli
FROM best2
ORDER BY stage
"""


# --------------------------------------------------------------------------
# Split-conformal prediction intervals + coverage evaluation
# --------------------------------------------------------------------------

_CONF_CENTS = "CAST(round(value * 100) AS BIGINT)"
_CONF_SPLIT = hash64_sql("event_id", seed=51)  # DuckDB split hash


def q_conformal_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.expr(_CONF_CENTS).alias("cents"),
        F.pmod(hash64(F.col("event_id"), seed=51), F.lit(10)).alias("split"),
    )
    train = ev.filter(F.col("split") <= 5)
    calib = ev.filter(F.col("split").isin(6, 7))
    test = ev.filter(F.col("split") >= 8)
    model = train.groupBy("event_type").agg(
        F.expr(
            f"CAST({_fdiv('CAST(sum(cents) AS DECIMAL(25,0)) * 1000000', 'count(*)', 'DIV')}"
            " AS BIGINT)"
        ).alias("mean_micro")
    )
    cal = calib.join(F.broadcast(model), "event_type").select(
        "event_type",
        "event_id",
        F.abs(F.col("cents") * F.lit(1000000) - F.col("mean_micro")).alias("s"),
    )
    wc = Window.partitionBy("event_type").orderBy(F.asc("s"), F.asc("event_id"))
    ranked = cal.withColumn("rk", F.row_number().over(wc))
    ncal = cal.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_calib"))
    # q̂ = the ⌈0.9·(n+1)⌉-th smallest score, capped at n (exact nearest-rank)
    kq = ncal.select(
        "event_type",
        "n_calib",
        F.least(
            F.expr("CAST((9 * (n_calib + 1) + 9) DIV 10 AS BIGINT)"), F.col("n_calib")
        ).alias("k"),
    )
    qhat = ranked.join(F.broadcast(kq), "event_type").filter(F.col("rk") == F.col("k")).select(
        "event_type", "n_calib", F.col("s").alias("q_hat_micro")
    )
    cov = (
        test.join(F.broadcast(model), "event_type")
        .join(F.broadcast(qhat), "event_type")
        .groupBy("event_type", "n_calib", "q_hat_micro")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                (
                    F.abs(F.col("cents") * F.lit(1000000) - F.col("mean_micro"))
                    <= F.col("q_hat_micro")
                ).cast("long")
            ).alias("n_covered"),
        )
    )
    return cov.select(
        "event_type",
        "n_calib",
        "q_hat_micro",
        "n_test",
        "n_covered",
        F.expr("(n_covered * 1000000) DIV n_test").alias("coverage_micro"),
    ).orderBy("event_type")


_CONFORMAL_SQL = f"""
WITH ev AS (
    SELECT event_id, event_type, {_CONF_CENTS} AS cents,
           ({_CONF_SPLIT}) % 10 AS split
    FROM events
), model AS (
    SELECT event_type,
           CAST({_fdiv('CAST(sum(cents) AS HUGEINT) * 1000000', 'count(*)', '//')} AS BIGINT)
               AS mean_micro
    FROM ev WHERE split <= 5 GROUP BY event_type
), cal AS (
    SELECT e.event_type, e.event_id, abs(e.cents * 1000000 - m.mean_micro) AS s
    FROM ev e JOIN model m USING (event_type)
    WHERE e.split IN (6, 7)
), ranked AS (
    SELECT event_type, s,
           row_number() OVER (PARTITION BY event_type ORDER BY s ASC, event_id ASC) AS rk,
           count(*) OVER (PARTITION BY event_type) AS n_calib
    FROM cal
), qhat AS (
    SELECT event_type, n_calib, s AS q_hat_micro
    FROM ranked
    WHERE rk = least((9 * (n_calib + 1) + 9) // 10, n_calib)
)
SELECT e.event_type, q.n_calib, q.q_hat_micro,
       CAST(count(*) AS BIGINT) AS n_test,
       CAST(sum(CAST(abs(e.cents * 1000000 - m.mean_micro) <= q.q_hat_micro AS BIGINT))
            AS BIGINT) AS n_covered,
       CAST((sum(CAST(abs(e.cents * 1000000 - m.mean_micro) <= q.q_hat_micro AS BIGINT))
             * 1000000) // count(*) AS BIGINT) AS coverage_micro
FROM ev e JOIN model m USING (event_type) JOIN qhat q USING (event_type)
WHERE e.split >= 8
GROUP BY e.event_type, q.n_calib, q.q_hat_micro
ORDER BY e.event_type
"""




SPECS.extend(
    [
        QuerySpec(
            "knn_label_vote",
            q_knn_label_vote,
            _KNN_SQL,
            ("similarity", "ml"),
            doc="k-NN classification over embeddings: broadcast 20-query frame, "
            "per-query top-5 cosine as WindowGroupLimit, deterministic majority vote",
        ),
        QuerySpec(
            "gbdt_stump_boost",
            q_gbdt_stump_boost,
            _GBDT_SQL,
            ("ml", "agg"),
            doc="Two-round L2 gradient boosting with decision stumps: per-stage "
            "sufficient-stats aggregate + cumulative window over the bounded "
            "feature domain; exact integer milli-cent predictions and residuals",
        ),
        QuerySpec(
            "conformal_interval_coverage",
            q_conformal_interval_coverage,
            _CONFORMAL_SQL,
            ("ml", "stats"),
            doc="Split-conformal intervals per event_type: hash train/calib/test "
            "split, exact nearest-rank q-hat at 90%, integer micro coverage rate",
        ),
    ]
)


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




SPECS.append(
    QuerySpec(
        "routing_topk_experts",
        q_routing_topk_experts,
        _routing_sql(),
        ("llm",),
        doc="MoE top-2 routing load table over documents: deterministic "
        "hash gates, per-expert primary/secondary counts + load share",
    )
)


# --------------------------------------------------------------------------
# Rank-based quantile normalization per language (ML feature prep)
# --------------------------------------------------------------------------


def q_quantile_normalize_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based quantile normalization of document length WITHIN each
    language: qn = (rank − 0.5)/n ∈ (0,1) — the cross-population score
    alignment trick (a 0.9 means "90th percentile of ITS OWN language",
    so a verbose language can't dominate a mixed quality cut). Ranks come
    from the scale-safe :func:`grouped_rank` operator (range-bucketed
    parallel sorts + broadcast prefix offsets — no per-language window
    task). Output micro-quantiles are exact integers:
    qn_micro = (2·rank − 1)·10⁶ DIV (2·n). The output keeps the top-8
    rows per language (rank <= 8), so the row count is bounded by
    8·|langs| regardless of corpus size (40 rows here only because the
    testdata has 5 languages)."""
    from projet_data_infrastructure_spark.operators.ranks import grouped_rank

    docs = read_table_balanced(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("len")
    )
    ranked = grouped_rank(docs, "lang", "len", ties=("doc_id",))
    return (
        ranked.withColumn(
            "qn_micro",
            F.expr("((2 * rank - 1) * 1000000) DIV (2 * group_total)"),
        )
        .filter(F.col("rank") <= 8)
        .select("lang", F.col("rank").cast("long").alias("rank"), "doc_id", "len", "qn_micro")
        .orderBy("lang", "rank")
    )


_QNORM_SQL = """
WITH ranked AS (
    SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS len,
           row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
               AS rank,
           count(*) OVER (PARTITION BY lang) AS n
    FROM documents
)
SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id, len,
       CAST(((2 * rank - 1) * 1000000) // (2 * n) AS BIGINT) AS qn_micro
FROM ranked WHERE rank <= 8
ORDER BY lang, rank
"""



SPECS.append(
    QuerySpec(
        "quantile_normalize_scores",
        q_quantile_normalize_scores,
        _QNORM_SQL,
        ("llm", "ml"),
        doc="Per-language rank quantile normalization via scale-safe "
        "grouped_rank; exact integer micro-quantiles",
    )
)
