"""Aggregation operators (SURVEY.md §2.5).

A1 per-entity count+avg, A2 top-k, A3 scalar count, A5 column profiles —
plus the distinct/rollup/cube/approx aggregates Spark gives for free (listed
as in-scope by SURVEY §2.5). All are plain ``groupBy().agg`` so Catalyst
emits partial (map-side) + final hash aggregation automatically — the pattern
that survives a 100 TB fact table because only partial aggregates shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def activity_stats(df: DataFrame, key: str, duration_col: str) -> DataFrame:
    """A1: per-entity ``count(*)`` + ``avg(duration)``.

    Mirrors ``/root/reference/airflow/config/read_delta.py:114-127``
    (``groupBy(id_employee).agg(count → count_activity, avg → mean_duration)``).
    """
    return df.groupBy(key).agg(
        F.count(F.lit(1)).alias("count_activity"),
        F.avg(duration_col).alias("mean_duration"),
    )


def top_k(df: DataFrame, group_col: str, k: int = 5) -> DataFrame:
    """A2: group count, order desc, limit k
    (``/root/reference/spark/SaveDelta.scala:236-242``).

    Tie-break on the group key so the result is deterministic (the reference
    was tie-unstable). Catalyst plans sort+limit as TakeOrderedAndProject —
    no global sort materializes, each partition keeps k rows then the driver
    merges, which is exactly what you want at scale.
    """
    return (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc(group_col))
        .limit(k)
    )


def scalar_count(df: DataFrame) -> DataFrame:
    """A3: table cardinality as a 1-row DataFrame (lazy, unlike ``.count()``)."""
    return df.agg(F.count(F.lit(1)).alias("n_rows"))


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """A5: data-quality profile — null count, min, max per column
    (GE expectations, ``airflow/dags/data_validation_dag.py:306-320``).

    One pass over the data for all columns (single partial+final agg)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}_nulls"))
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return df.agg(*aggs)
