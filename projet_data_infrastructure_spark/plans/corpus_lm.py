"""Corpus-mixture, tokenization, and language-model readout operators —
the layer a multilingual LLM training pipeline runs after curation: how
much of each language to sample, how to weight and shard it, what the
tokenizer does to it, and the n-gram statistics/keyword readouts a data
team monitors.

Consolidated from the round-6..round-10 build modules (round 11, VERDICT
r10 item 6) — specs, oracles, and hashes unchanged; each spec keeps its
original design docstring. Scale shape: vocabulary/language-keyed
shuffles, nano-quantized order-free term sums, and bounded grids; the
corpus-sized work per spec is one or two map-side-combinable aggregates.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_data_infrastructure_spark.functions.hashing import hash64, hash64_sql
from projet_data_infrastructure_spark.operators.text import tokens
from projet_data_infrastructure_spark.plans._portable import (
    fdiv as _fdiv,
    pround,
    pround_sql,
)
from projet_data_infrastructure_spark.plans.registry import QuerySpec
from projet_data_infrastructure_spark.sources.readers import read_table

SPECS: list[QuerySpec] = []

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




SPECS.append(
    QuerySpec(
        "doc_keywords_per_doc",
        q_doc_keywords_per_doc,
        _DOC_KEYWORDS_SQL,
        ("text",),
        doc="Per-document TF-IDF top-3 keywords: corpus-wide df aggregate + "
        "bounded tf join, rank plans as WindowGroupLimit",
    )
)


# --------------------------------------------------------------------------
# TextRank keyword extraction (integer PageRank over the word co-occurrence
# graph — composition of the skipgram and fixed-point-PageRank house cores)
# --------------------------------------------------------------------------

_TR_ITERS = 3
_TR_UNIT = 1_000_000
_TR_MIN_COOC = 2
_TR_TOPK = 20


def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank (Mihalcea & Tarau 2004) keyword extraction: PageRank over
    the word co-occurrence graph (window ±2, same pair construction as
    ``skipgram_window_cooc`` — per-position lead offsets, never a token
    self-join), weighted by co-occurrence count and pruned at ≥ 2. The
    walk runs ``_TR_ITERS`` unrolled iterations in EXACT INTEGER
    micro-units — per-edge contribution (r·w) DIV wdeg, damping
    150000 + (85·inc) DIV 100 — the ``pagerank_fixed_point`` discipline,
    so the iterative NLP algorithm hash-checks against an unrolled DuckDB
    CTE with no FP summation-order leeway. Vertex set = corpus vocabulary
    (bounded); the emission frame broadcasts below the house vertex
    threshold and falls back to a keyed shuffle-hash join above it
    (``graph_geo.vertex_side``). Output: top-20 keywords (score desc,
    word asc)."""
    from projet_data_infrastructure_spark.plans.graph_geo import vertex_side

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(tokens(F.lower(F.col("text")))).alias("pos", "w"),
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    offs = toks
    for d in (1, 2):
        offs = offs.withColumn(f"n{d}", F.lead("w", d).over(wdoc))
    pairs = offs.select(
        "w", F.explode(F.array("n1", "n2")).alias("c")
    ).filter(F.col("c").isNotNull())
    und = (
        pairs.select(F.least("w", "c").alias("a"), F.greatest("w", "c").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("wt"))
        .filter(F.col("wt") >= _TR_MIN_COOC)
    )
    arcs = und.select(F.col("a").alias("src"), F.col("b").alias("dst"), "wt").unionByName(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"), "wt")
    )
    wdeg = arcs.groupBy("src").agg(F.sum("wt").alias("wdeg"))
    # (src, dst, wt, wdeg): read by every iteration — checkpoint once, the
    # pagerank edge-list discipline.
    edges = arcs.join(wdeg, "src").localCheckpoint(eager=True)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n_vertices = nodes.count()  # vocabulary-bounded; sizes the join strategy
    ranks = nodes.withColumn("r", F.lit(_TR_UNIT).cast("long"))
    for _ in range(_TR_ITERS):
        contrib = (
            edges.join(vertex_side(ranks, n_vertices), edges.src == ranks.node)
            .select("dst", F.expr("(r * wt) DIV wdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inc"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(150000) + F.expr("(85 * coalesce(inc, CAST(0 AS BIGINT))) DIV 100")
                )
                .cast("long")
                .alias("r"),
            )
        )
    return (
        ranks.orderBy(F.desc("r"), F.asc("node"))
        .limit(_TR_TOPK)
        .select(F.col("node").alias("word"), F.col("r").alias("tr_micro"))
    )


def _textrank_sql() -> str:
    from projet_data_infrastructure_spark.plans.roundseven import _BACKOFF_TOKS

    iters = []
    prev = "r0"
    for k in range(1, _TR_ITERS + 1):
        iters.append(
            f"""i{k} AS (
    SELECT n.node,
           CAST(150000 + (85 * coalesce(x.inc, 0)) // 100 AS BIGINT) AS r
    FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, CAST(sum((p.r * e.wt) // e.wdeg) AS BIGINT) AS inc
        FROM edges e JOIN {prev} p ON e.src = p.node GROUP BY e.dst
    ) x ON n.node = x.node
)"""
        )
        prev = f"i{k}"
    return f"""
WITH toks AS (
    SELECT doc_id, i AS pos, t[i] AS w
    FROM (SELECT doc_id, {_BACKOFF_TOKS} AS t FROM documents),
         unnest(range(1, len(t) + 1)) AS u(i)
), offs AS (
    SELECT w,
           lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS n1,
           lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS n2
    FROM toks
), und AS (
    SELECT a, b, count(*) AS wt FROM (
        SELECT least(w, c) AS a, greatest(w, c) AS b
        FROM (SELECT w, unnest([n1, n2]) AS c FROM offs)
        WHERE c IS NOT NULL AND w <> c
    ) GROUP BY a, b HAVING count(*) >= {_TR_MIN_COOC}
), arcs AS (
    SELECT a AS src, b AS dst, wt FROM und
    UNION ALL
    SELECT b AS src, a AS dst, wt FROM und
), wdeg AS (
    SELECT src, CAST(sum(wt) AS BIGINT) AS wdeg FROM arcs GROUP BY src
), edges AS (
    SELECT arcs.src, arcs.dst, arcs.wt, wdeg.wdeg FROM arcs JOIN wdeg USING (src)
), nodes AS (
    SELECT DISTINCT src AS node FROM edges
), r0 AS (
    SELECT node, CAST({_TR_UNIT} AS BIGINT) AS r FROM nodes
), {', '.join(iters)}
SELECT node AS word, r AS tr_micro FROM i{_TR_ITERS}
ORDER BY r DESC, word ASC LIMIT {_TR_TOPK}
"""




SPECS.append(
    QuerySpec(
        "textrank_keywords",
        q_textrank_keywords,
        _textrank_sql(),
        ("llm", "graph", "text"),
        doc="TextRank keyword extraction: integer fixed-point PageRank over "
        "the +/-2-window word co-occurrence graph; unrolled-CTE oracle",
    )
)


# --------------------------------------------------------------------------
# Interpolated Kneser–Ney bigram LM (continuation counts, D = 0.75)
# --------------------------------------------------------------------------

_KN_FORMULA = (
    "(greatest(CAST(c AS DOUBLE) - 0.75, 0.0) / CAST(cw1 AS DOUBLE)"
    " + 0.75 * CAST(n1f AS DOUBLE) / CAST(cw1 AS DOUBLE)"
    " * CAST(n1b AS DOUBLE) / CAST(bt AS DOUBLE))"
)


def q_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram probabilities over the documents
    corpus (D = 0.75): P(w2|w1) = max(c-D,0)/c(w1) + D*N1+(w1,.)/c(w1) *
    N1+(.,w2)/|bigram types| — the smoothing used by every n-gram LM the
    trigram-backoff spec approximates more crudely. All counts (bigram
    tokens, forward/backward continuation type counts, total types) are
    exact BIGINT group-bys on the vocabulary-bounded type table; the top-20
    readout orders by (count DESC, w1, w2) so ties are deterministic."""
    from projet_data_infrastructure_spark.operators.text import tokens

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(tokens(F.col("text")).alias("t")).filter(F.size("t") >= 2)
    bg = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    types = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    fwd = types.groupBy("w1").agg(
        F.sum("c").alias("cw1"), F.count(F.lit(1)).alias("n1f")
    )
    bwd = types.groupBy("w2").agg(F.count(F.lit(1)).alias("n1b"))
    bt = types.groupBy().agg(F.count(F.lit(1)).alias("bt"))
    top = (
        types.join(fwd, "w1")
        .join(bwd, "w2")
        .crossJoin(F.broadcast(bt))
        .orderBy(F.col("c").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(20)
    )
    return top.select(
        "w1", "w2", "c", pround(F.expr(_KN_FORMULA), 6).alias("kn_r")
    )


def _kn_sql() -> str:
    return f"""
WITH toks AS (
    SELECT list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '') AS t
    FROM documents
), bg AS (
    SELECT t[i] AS w1, t[i + 1] AS w2
    FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i)
    WHERE len(t) >= 2
), types AS (
    SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY w1, w2
), fwd AS (
    SELECT w1, CAST(sum(c) AS BIGINT) AS cw1,
           CAST(count(*) AS BIGINT) AS n1f
    FROM types GROUP BY w1
), bwd AS (
    SELECT w2, CAST(count(*) AS BIGINT) AS n1b FROM types GROUP BY w2
), bt AS (
    SELECT CAST(count(*) AS BIGINT) AS bt FROM types
)
SELECT w1, w2, c, {pround_sql(_KN_FORMULA, 6)} AS kn_r
FROM types JOIN fwd USING (w1) JOIN bwd USING (w2), bt
ORDER BY c DESC, w1 ASC, w2 ASC LIMIT 20
"""


# --------------------------------------------------------------------------
# Bigram entropy rate (corpus predictability, nano-quantized term sums)
# --------------------------------------------------------------------------

_BER_TERM = (
    "CAST(floor(-(CAST(c AS DOUBLE) / CAST(nb AS DOUBLE))"
    " * ln(CAST(c AS DOUBLE) / CAST(cw1 AS DOUBLE)) * 1000000000.0 + 0.5)"
    " AS BIGINT)"
)


def q_bigram_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional bigram entropy rate H(w2|w1) of the documents corpus and
    its perplexity — the predictability readout next to the Kneser-Ney LM:
    H = -sum p(w1,w2) ln p(w2|w1), each term nano-quantized so the
    vocabulary-sized sum is an exact BIGINT in any order (scale-safe: the
    type table shuffles on token keys, nothing is collected)."""
    from projet_data_infrastructure_spark.operators.text import tokens

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(tokens(F.col("text")).alias("t")).filter(F.size("t") >= 2)
    bg = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    types = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    fwd = types.groupBy("w1").agg(F.sum("c").alias("cw1"))
    tot = types.groupBy().agg(
        F.sum("c").alias("nb"), F.count(F.lit(1)).alias("n_types")
    )
    h = (
        types.join(fwd, "w1")
        .crossJoin(F.broadcast(tot))
        .groupBy("nb", "n_types")
        .agg(F.sum(F.expr(_BER_TERM)).alias("h_nano"))
    )
    return h.select(
        F.col("nb").alias("n_bigrams"),
        "n_types",
        pround(F.expr("CAST(h_nano AS DOUBLE) / 1000000000.0"), 6).alias("h_rate_r"),
        pround(F.expr("exp(CAST(h_nano AS DOUBLE) / 1000000000.0)"), 4).alias(
            "ppl_r"
        ),
    )


def _ber_sql() -> str:
    return f"""
WITH toks AS (
    SELECT list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '') AS t
    FROM documents
), bg AS (
    SELECT t[i] AS w1, t[i + 1] AS w2
    FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i)
    WHERE len(t) >= 2
), types AS (
    SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY w1, w2
), fwd AS (
    SELECT w1, CAST(sum(c) AS BIGINT) AS cw1 FROM types GROUP BY w1
), tot AS (
    SELECT CAST(sum(c) AS BIGINT) AS nb,
           CAST(count(*) AS BIGINT) AS n_types
    FROM types
), h AS (
    SELECT nb, n_types, CAST(sum({_BER_TERM}) AS BIGINT) AS h_nano
    FROM types JOIN fwd USING (w1), tot
    GROUP BY nb, n_types
)
SELECT nb AS n_bigrams, n_types,
       {pround_sql('CAST(h_nano AS DOUBLE) / 1000000000.0', 6)} AS h_rate_r,
       {pround_sql('exp(CAST(h_nano AS DOUBLE) / 1000000000.0)', 4)} AS ppl_r
FROM h
"""




SPECS.extend(
    [
        QuerySpec(
            "kneser_ney_bigram",
            q_kneser_ney_bigram,
            _kn_sql(),
            ("llm",),
            doc="Interpolated Kneser-Ney bigram LM over documents; exact "
            "continuation counts, micro-quantized probabilities",
        ),
        QuerySpec(
            "bigram_entropy_rate",
            q_bigram_entropy_rate,
            _ber_sql(),
            ("llm", "bench"),
            doc="Conditional bigram entropy rate + perplexity of the corpus; "
            "nano-quantized vocabulary-sized term sums",
        ),
    ]
)
