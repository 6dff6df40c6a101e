"""Rows-only specs (no SQL oracle — genuinely non-SQL-expressible or
engine-specific algorithms): synthetic generator, multimodal feature
extraction, approximate aggregates. The driver records a weaker rows-only
check for these; their semantics are pinned by tests instead
(tests/test_generator.py, tests/test_operators.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_data_infrastructure_spark.plans.registry import QuerySpec
from projet_data_infrastructure_spark.sources.readers import read_table


def q_generator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1-G5 synthetic activity source (seeded, distribution-tested)."""
    from projet_data_infrastructure_spark.sources.generator import generate_activities

    return generate_activities(spark, n_employees=50, n_days=90, seed=42)


def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media columns → Arrow-batched feature extraction (stub decode)."""
    from projet_data_infrastructure_spark.operators.multimodal import (
        extract_features,
        synthetic_assets,
    )

    return extract_features(synthetic_assets(spark, n=128))


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL-sketch distinct counts (algorithm differs per engine → no oracle).

    At 100 TB this replaces exact countDistinct wherever a ~2% error is
    acceptable: no per-key state explosion, one pass, mergeable sketches.
    """
    orders = read_table(spark, sf_dir, "orders")
    return orders.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers"),
        F.countDistinct("o_custkey").alias("exact_customers"),
    )


def q_sampled_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample → profile (sampling is engine-specific RNG)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).agg(
        F.count(F.lit(1)).alias("sample_rows"),
        F.avg("l_quantity").alias("avg_qty_sampled"),
    )


SPECS: list[QuerySpec] = [
    QuerySpec("generator_activities", q_generator, None, ("generator", "rows-only")),
    QuerySpec("multimodal_features", q_multimodal, None, ("multimodal", "rows-only")),
    QuerySpec("approx_count_distinct", q_approx_distinct, None, ("agg", "rows-only")),
    QuerySpec("sampled_profile", q_sampled_profile, None, ("agg", "rows-only")),
]
