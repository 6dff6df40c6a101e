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
