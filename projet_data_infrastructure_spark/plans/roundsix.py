"""Round-6 engine-charter additions: time-series decomposition, graph
descriptive statistics, k-NN classification over embeddings, boosted-stump
model fitting, conformal-prediction evaluation, and per-document keywording.

These extend the analytics families the reference's grouped rollups imply
(`/root/reference/airflow/config/read_delta.py:114-127`) with the next
questions a training-data platform asks of the same tables. Design notes:

* ``stl_weekly_decompose`` — STL-lite seasonal decomposition of the daily
  event-value series: centered 7-day moving-average trend (RANGE frame over
  the integer epoch-day, so calendar gaps cannot smear the window), then
  day-of-week seasonal indices as the mean of the detrended series, then
  the residual. All three components are exact integers (micro-cents via
  remainder-corrected floor division), so a classically "float" time-series
  method is hash-checkable. The windows run over the DAILY aggregate — a
  frame bounded by the calendar (≤ ~3.7 k rows per decade) regardless of
  raw data volume, so the unpartitioned window is safe at any corpus size;
  the one data-sized operation is the map-side-combinable day aggregate.
* ``clustering_coefficient`` — local clustering coefficient per vertex of
  the Doulion-sparsified supplier co-service graph (p = 1/10; the keep
  decision is a MINSTD-style integer pair mix rather than
  ``triangle_count_suppliers``'s md5 — the predicate runs on every RAW
  co-service pair, 12.5 M at sf0.1, where the md5 string hash alone cost
  ~6 s). Triangles are enumerated ONCE each via degree-ordered orientation
  (Schank/Wagner, hub-safe) with per-edge adjacency-ARRAY intersection —
  no materialized wedge shuffle (the dense graph's wedge table is ~25× the
  edge count) — then attributed to all three corners with one explode;
  coefficient = 2·T(v)·10⁶ DIV d(v)(d(v)−1) in exact integers. The oracle
  enumerates the same triangles with the simpler id-ordered triple join —
  two orientations, one count.
* ``degree_assortativity`` — Newman's degree-assortativity r of the same
  graph: Pearson correlation of endpoint degrees over the directed edge
  list. ONE aggregate pass over edges⋈degrees collects exact DECIMAL
  moment sums; r is solved from shared expression text in doubles (the
  OLS/chi² house pattern: exact sums + identical double expression tree).
* ``knn_label_vote`` — k-NN classification over the embeddings table:
  20 held-out query vectors (vec_id < 20) classified by majority label of
  their top-5 cosine neighbors among the rest. The 20-row query frame is
  broadcast (never the candidate side); per-query top-5 is rank-over-
  rounded-similarity, which plans as Partial+Final WindowGroupLimit, so
  each task keeps ≤ 5 rows per query before the exchange. Majority vote +
  (count DESC, label ASC) tie-break keeps the prediction deterministic.
* ``gbdt_stump_boost`` — TWO rounds of L2 gradient boosting with decision
  stumps (Friedman 2001) on lineitem: stage 1 fits price_cents ~ stump on
  l_quantity, stage 2 fits the integer milli-cent residuals ~ stump on
  discount_pct. Each stage is ONE map-side-combinable (feature, n, Σy)
  aggregate (feature domains: 50 and 11 values) + a cumulative window over
  that ≤ 50-row frame; the best split maximizes Σl²·nr + Σr²·nl (the
  variance-reduction numerator, compared in exact whole units — Spark
  DECIMAL(38,0), DuckDB HUGEINT), ties to the smaller threshold. Stump
  means are exact milli-cents via remainder-corrected floor division.
  Bounds: |Σ r1| ≤ n·10¹⁰ milli-cents keeps the score < 10³⁸ for
  n ≲ 10⁶ rows at this price range; beyond that, rescale the residual
  unit (the docstringed bound, per the round-5 overflow-audit idiom).
  The distributed pattern is the point: boosting as sufficient-stats
  aggregates + O(|domain|) window solves — no per-row model state.
* ``conformal_interval_coverage`` — split-conformal prediction (Vovk;
  Angelopoulos & Bates 2023 tutorial form) on event values: deterministic
  hash split into train/calibration/test, per-event_type mean model from
  train, conformity scores |y − ŷ| on calibration, q̂ = the
  ⌈(n+1)·0.9⌉-th smallest calibration score (exact nearest-rank via
  row_number over the per-type sort), then test-set coverage of ŷ ± q̂.
  Everything is integer micro-cents; coverage is reported in exact
  micro-rate units. The per-type rank pass is the one sort; production
  would swap an approx-quantile there, the exact rank is what makes the
  spec hash-checkable.
* ``doc_keywords_per_doc`` — per-document TF-IDF keyword extraction: term
  frequencies for the 20 target docs, document frequencies from the FULL
  corpus (one map-side-combinable distinct aggregate), score = tf·ln((1+N)/
  (1+df)) from shared expression text, per-doc top-3 via rank (plans as
  WindowGroupLimit). The corpus-sized work is exactly one df aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_data_infrastructure_spark.functions.hashing import hash64, hash64_sql
from projet_data_infrastructure_spark.operators import similarity
from projet_data_infrastructure_spark.plans._portable import pround, pround_sql
from projet_data_infrastructure_spark.plans.registry import QuerySpec
from projet_data_infrastructure_spark.sources.readers import read_table


def _fdiv(s: str, n: str, op: str) -> str:
    """Exact floor division for possibly-negative numerators (shared
    remainder-correction trick — see ``mining._km_floordiv``)."""
    rem = f"((({s}) % ({n}) + ({n})) % ({n}))"
    return f"((({s}) - {rem}) {op} ({n}))"


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


# --------------------------------------------------------------------------
# Supplier co-service graph: shared sparsified edge builder (identical to
# triangle_count_suppliers — seed 77, Doulion p = 1/10)
# --------------------------------------------------------------------------

_G6_KEEP_MOD = 10
#: Doulion keep predicate (p = 1/10): MINSTD-style integer pair mix, written
#: once and formatted into BOTH engines' expressions (identical arithmetic,
#: no string/md5 cost on the 12.5 M raw pairs at sf0.1).
_G6_M = 2147483647
_G6_KEEP_PRED = f"((a % {_G6_M}) * 48271 + b) % {_G6_M} % {_G6_KEEP_MOD} = 0"


def _supplier_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    line = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    serves = (
        orders.join(line, orders.o_orderkey == line.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    # Per-customer supplier array -> map-side ordered pair generation ->
    # Doulion filter BEFORE the pair distinct. Same edge set as the naive
    # serves⋈serves self-join + post-distinct filter, but the co-service
    # pair explosion (Σ_ck d²/2 rows) is cut 10× by the keep filter while
    # still map-side, so the only full-size shuffles are the serves
    # distinct and the per-ck group — the distinct on pairs sees 1/10th
    # the volume (was the dominant cost at sf0.1: the filter ran after it).
    byck = serves.groupBy("o_custkey").agg(
        F.sort_array(F.collect_set("l_suppkey")).alias("sks")
    )
    pairs = byck.select(
        F.explode(
            F.expr(
                "flatten(transform(sks, (x, i) ->"
                " transform(slice(sks, i + 2, size(sks)), y ->"
                " struct(x AS a, y AS b))))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    # Doulion keep-decision via a multiplicative congruential pair mix
    # instead of md5: the filter runs on EVERY raw co-service pair (12.5 M
    # at sf0.1) and the md5 string hash alone cost ~6 s there — the integer
    # mix is pure codegen arithmetic, identical in DuckDB, and overflow-free
    # ((a mod M)·48271 + b < 2^48 « 2^63 in both engines' int64).
    return (
        pairs.filter(F.expr(_G6_KEEP_PRED))
        .distinct()
        .localCheckpoint()
    )


_G6_EDGES_SQL = f"""
serves AS (
    SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
edges AS (
    SELECT DISTINCT a, b FROM (
        SELECT a.sk AS a, b.sk AS b
        FROM serves a JOIN serves b ON a.ck = b.ck AND a.sk < b.sk
    )
    WHERE {_G6_KEEP_PRED}
),
deg AS (
    SELECT v, count(*) AS dv FROM (
        SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges
    ) GROUP BY v
)
"""


def q_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _supplier_edges(spark, sf_dir)
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("dv"))
    )
    # degree-ordered orientation (hub-safe wedge enumeration)
    da = deg.select(F.col("v").alias("a"), F.col("dv").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("dv").alias("db"))
    ranked = edges.join(F.broadcast(da), "a").join(F.broadcast(db), "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ranked.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
    ).localCheckpoint()  # read 3x (edge probe + both adjacency builds)
    # Triangle enumeration by per-edge adjacency intersection instead of a
    # materialized wedge join: on this DENSE graph (avg degree ~100 after
    # sparsification) the wedge table is ~Σ outdeg² ≈ 25× the edge count and
    # its shuffle dominated the runtime (11.5 s at sf0.1). Intersecting the
    # two endpoints' out-neighbor ARRAYS per edge does the same O(Σ outdeg²)
    # comparisons inside whole-stage codegen on 50 k rows — no wedge
    # materialization, no second shuffle. Each triangle lo<x<y (degree
    # order) is found exactly once at its (lo, x) edge: y ∈ N⁺(lo) ∩ N⁺(x).
    # The adjacency table is |V| rows (bounded supplier set here); the join
    # is keyed, so at larger |V| it stays a plain sort-merge — AQE
    # broadcasts it while it is small.
    adj = oriented.groupBy("lo").agg(F.sort_array(F.collect_list("hi")).alias("nbrs"))
    probed = (
        oriented.join(
            adj.select(F.col("lo").alias("_al"), F.col("nbrs").alias("nbrs_lo")),
            F.col("lo") == F.col("_al"),
        )
        .join(
            adj.select(F.col("lo").alias("_ah"), F.col("nbrs").alias("nbrs_hi")),
            F.col("hi") == F.col("_ah"),
            "left",
        )
        .select(
            "lo",
            F.col("hi").alias("x"),
            F.array_intersect(
                F.col("nbrs_lo"), F.coalesce(F.col("nbrs_hi"), F.array())
            ).alias("ys"),
        )
    )
    tri = probed.filter(F.size("ys") > 0).select(
        "lo", "x", F.explode("ys").alias("y")
    )
    tri_nodes = (
        tri.select(F.explode(F.array("lo", "x", "y")).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    return (
        deg.join(tri_nodes, "v", "left")
        .select(
            "v",
            "dv",
            F.coalesce(F.col("t"), F.lit(0)).cast("long").alias("triangles"),
            F.when(
                F.col("dv") >= 2,
                (F.coalesce(F.col("t"), F.lit(0)) * F.lit(2000000))
                .cast("long")
                / (F.col("dv") * (F.col("dv") - 1)),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("coeff_micro"),
        )
        .orderBy(F.desc("coeff_micro"), F.asc("v"))
        .limit(20)
    )


_CLUSTERING_COEFF_SQL = f"""
WITH {_G6_EDGES_SQL},
tri AS (
    SELECT e1.a AS x, e1.b AS y, e2.b AS z
    FROM edges e1
    JOIN edges e2 ON e1.a = e2.a AND e1.b < e2.b
    JOIN edges e3 ON e3.a = e1.b AND e3.b = e2.b
), tn AS (
    SELECT v, count(*) AS t FROM (
        SELECT x AS v FROM tri UNION ALL SELECT y AS v FROM tri
        UNION ALL SELECT z AS v FROM tri
    ) GROUP BY v
)
SELECT deg.v, deg.dv,
       CAST(coalesce(tn.t, 0) AS BIGINT) AS triangles,
       CAST(CASE WHEN deg.dv >= 2
                 THEN (coalesce(tn.t, 0) * 2000000) // (deg.dv * (deg.dv - 1))
                 ELSE 0 END AS BIGINT) AS coeff_micro
FROM deg LEFT JOIN tn ON tn.v = deg.v
ORDER BY coeff_micro DESC, deg.v ASC
LIMIT 20
"""


def _assort_solve(dbl: dict[str, str]) -> str:
    n, sx, sy, sxy, sxx, syy = (dbl[k] for k in ("n", "sx", "sy", "sxy", "sxx", "syy"))
    num = f"({n} * {sxy} - {sx} * {sy})"
    den = f"sqrt(greatest(({n} * {sxx} - {sx} * {sx}) * ({n} * {syy} - {sy} * {sy}), 1e-300))"
    return f"({num} / {den})"


def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _supplier_edges(spark, sf_dir)
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("dv"))
    )
    directed = edges.select(F.col("a").alias("u"), F.col("b").alias("w")).unionAll(
        edges.select(F.col("b").alias("u"), F.col("a").alias("w"))
    )
    du = deg.select(F.col("v").alias("u"), F.col("dv").alias("dx"))
    dw = deg.select(F.col("v").alias("w"), F.col("dv").alias("dy"))
    joined = directed.join(F.broadcast(du), "u").join(F.broadcast(dw), "w")
    sums = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("dx").cast("decimal(25,0)")).alias("sx"),
        F.sum(F.col("dy").cast("decimal(25,0)")).alias("sy"),
        F.sum((F.col("dx") * F.col("dy")).cast("decimal(25,0)")).alias("sxy"),
        F.sum((F.col("dx") * F.col("dx")).cast("decimal(25,0)")).alias("sxx"),
        F.sum((F.col("dy") * F.col("dy")).cast("decimal(25,0)")).alias("syy"),
    )
    dbl = {k: f"CAST({k} AS DOUBLE)" for k in ("n", "sx", "sy", "sxy", "sxx", "syy")}
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    return sums.crossJoin(F.broadcast(n_nodes)).select(
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("n").cast("long").alias("n_edges_directed"),
        pround(F.expr(_assort_solve(dbl)), 6).alias("assortativity"),
    )


_ASSORT_SQL = f"""
WITH {_G6_EDGES_SQL},
directed AS (
    SELECT a AS u, b AS w FROM edges UNION ALL SELECT b AS u, a AS w FROM edges
), j AS (
    SELECT du.dv AS dx, dw.dv AS dy
    FROM directed JOIN deg du ON du.v = directed.u JOIN deg dw ON dw.v = directed.w
), sums AS (
    SELECT count(*) AS n,
           sum(CAST(dx AS DECIMAL(25,0))) AS sx,
           sum(CAST(dy AS DECIMAL(25,0))) AS sy,
           sum(CAST(dx * dy AS DECIMAL(25,0))) AS sxy,
           sum(CAST(dx * dx AS DECIMAL(25,0))) AS sxx,
           sum(CAST(dy * dy AS DECIMAL(25,0))) AS syy
    FROM j
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
       CAST(n AS BIGINT) AS n_edges_directed,
       {pround_sql(_assort_solve({k: f'CAST({k} AS DOUBLE)' for k in ('n', 'sx', 'sy', 'sxy', 'sxx', 'syy')}), 6)}
           AS assortativity
FROM sums
"""


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


# --------------------------------------------------------------------------
# Per-document TF-IDF keywords
# --------------------------------------------------------------------------

_KW_DOCS = 20
_KW_TOP = 3


def q_doc_keywords_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projet_data_infrastructure_spark.operators.text import tokens

    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    df_tbl = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    tf = (
        tok.filter(F.col("doc_id") < _KW_DOCS)
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    scored = (
        tf.join(df_tbl, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            pround(
                F.expr("CAST(tf AS DOUBLE) * ln((1.0 + CAST(n_docs AS DOUBLE)) / (1.0 + CAST(df AS DOUBLE)))"),
                6,
            ).alias("score"),
        )
    )
    wd = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(wd))
        .filter(F.col("rnk") <= _KW_TOP)
        .select("doc_id", "token", "score", F.col("rnk").cast("int").alias("rnk"))
        .orderBy("doc_id", "rnk")
    )


_KW_TOKS_SQL = "list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '')"

_DOC_KEYWORDS_SQL = f"""
WITH tok AS (
    SELECT doc_id, unnest({_KW_TOKS_SQL}) AS token FROM documents
), dfreq AS (
    SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token
), tf AS (
    SELECT doc_id, token, count(*) AS tf
    FROM tok WHERE doc_id < {_KW_DOCS} GROUP BY doc_id, token
), scored AS (
    SELECT tf.doc_id, tf.token,
           {pround_sql('CAST(tf AS DOUBLE) * ln((1.0 + (SELECT CAST(count(*) AS DOUBLE) FROM documents)) / (1.0 + CAST(df AS DOUBLE)))', 6)}
               AS score
    FROM tf JOIN dfreq USING (token)
)
SELECT doc_id, token, score,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token ASC) AS INT)
           AS rnk
FROM scored
QUALIFY rnk <= {_KW_TOP}
ORDER BY doc_id, rnk
"""


SPECS: list[QuerySpec] = [
    QuerySpec(
        "stl_weekly_decompose",
        q_stl_weekly_decompose,
        _STL_SQL,
        ("timeseries", "window"),
        doc="STL-lite decomposition of the daily value series: centered 7-day "
        "RANGE-frame trend, day-of-week seasonal index, residual — all exact "
        "integer micro-cents over the calendar-bounded daily aggregate",
    ),
    QuerySpec(
        "clustering_coefficient",
        q_clustering_coefficient,
        _CLUSTERING_COEFF_SQL,
        ("graph", "bench"),
        doc="Per-vertex local clustering coefficient on the Doulion-sparsified "
        "supplier graph: degree-ordered triangle enumeration (hub-safe), "
        "explode-attribution to corners, integer-exact 2T/d(d-1) in micro units",
    ),
    QuerySpec(
        "degree_assortativity",
        q_degree_assortativity,
        _ASSORT_SQL,
        ("graph", "stats"),
        doc="Newman degree-assortativity r: ONE exact-DECIMAL moment aggregate "
        "over edges⋈degrees, shared-text double solve (OLS house pattern)",
    ),
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
    QuerySpec(
        "doc_keywords_per_doc",
        q_doc_keywords_per_doc,
        _DOC_KEYWORDS_SQL,
        ("text",),
        doc="Per-document TF-IDF top-3 keywords: corpus-wide df aggregate + "
        "bounded tf join, rank plans as WindowGroupLimit",
    ),
]
