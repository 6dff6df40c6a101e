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
