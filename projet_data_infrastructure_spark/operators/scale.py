"""Scale-pattern operators: skew-salted aggregation, bucketed co-located
joins, and partition-layout helpers.

These encode the 100 TB playbook as reusable operators (AQE handles many
cases automatically — session.py enables it — but explicit forms are needed
when AQE can't see the skew, e.g. pre-aggregation before a high-cardinality
shuffle, or when a key is reused across many joins and deserves a bucketed
layout on disk).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_avg(
    df: DataFrame, key: str, value_col: str, n_salts: int = 16
) -> DataFrame:
    """Two-stage skew-proof count+avg: salt → partial agg → final agg.

    A single hot key (one employee generating millions of events) funnels
    into one reducer under plain groupBy. Salting splits every key across
    ``n_salts`` reducers for the heavy first stage; the second stage combines
    ``n_salts`` partial rows per key — negligible. Results are identical to
    the unsalted aggregation (count and sum are algebraic).
    """
    salted = df.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    partial = salted.groupBy(key, "_salt").agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.count(value_col).alias("_vcnt"),  # non-null count: avg semantics
        F.sum(value_col).alias("_sum"),
    )
    return partial.groupBy(key).agg(
        F.sum("_cnt").alias("count_activity"),
        (F.sum("_sum") / F.sum("_vcnt")).alias("mean_duration"),
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int = 32,
    sort_by: str | None = None,
    path: str | None = None,
) -> None:
    """Persist with a bucketed layout so future equi-joins/aggs on ``key``
    skip the shuffle entirely (both sides bucket-aligned ⇒ SortMergeJoin
    without Exchange). This is the disk-layout half of join co-location.

    ``path`` makes the table external (data under an explicit directory
    instead of the session warehouse) — needed when the host session's
    warehouse location is unknown or read-only."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort_by:
        writer = writer.sortBy(sort_by)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def co_partition(left: DataFrame, right: DataFrame, key: str, n: int | None = None):
    """Shuffle both sides onto the same hash partitioning once, so a chain of
    joins/aggs on ``key`` reuses the exchange instead of re-shuffling."""
    if n:
        return left.repartition(n, key), right.repartition(n, key)
    return left.repartition(key), right.repartition(key)


def explain_has(df: DataFrame, *needles: str) -> dict[str, bool]:
    """Plan introspection helper (used by plan-quality tests): which of the
    given operator names appear in the formatted physical plan."""
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    return {n: (n in plan) for n in needles}
