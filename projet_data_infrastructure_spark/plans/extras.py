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


def q_stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live CDC path: envelope stream → foreachBatch(op-aware apply) → state.

    Builds Debezium envelopes from the generator, streams them through
    ``apply_cdc_batch`` (upsert+delete), returns the resulting lake state.
    Non-SQL-expressible (stateful streaming side effects) → rows-only check;
    semantics pinned by tests/test_cdc.py golden envelopes.
    """
    import tempfile

    from projet_data_infrastructure_spark.sources.generator import generate_activities
    from projet_data_infrastructure_spark.streaming.cdc import apply_cdc_batch, parse_envelope

    work = tempfile.mkdtemp(prefix="cdc_apply_")
    acts = generate_activities(spark, n_employees=20, n_days=60, seed=5)
    env = acts.select(
        F.to_json(
            F.struct(
                F.struct(
                    F.lit(None).cast("string").alias("before"),
                    F.struct(
                        # int-range id (generator ids are partition-offset
                        # longs that would overflow the SERIAL int schema)
                        F.pmod(
                            F.xxhash64("id_employee", "start_datetime"), F.lit(2_000_000_000)
                        ).cast("int").alias("id"),
                        F.col("id_employee").cast("int").alias("id_employee"),
                        F.lit("gen").alias("first_name"),
                        F.lit("gen").alias("last_name"),
                        F.unix_micros(F.col("start_datetime")).alias("start_datetime"),
                        "sport_type",
                        "distance",
                        F.col("activity_duration").alias("activity_duration"),
                        "comment",
                    ).alias("after"),
                    F.lit("c").alias("op"),
                    F.lit(1000).alias("ts_ms"),
                ).alias("payload")
            )
        ).alias("value")
    )
    src = f"{work}/envelopes"
    env.coalesce(2).write.parquet(src)
    stream = spark.readStream.schema("value string").format("parquet").load(src)
    target = f"{work}/state"

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        apply_cdc_batch(target, parse_envelope(batch_df))

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", f"{work}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    from projet_data_infrastructure_spark.streaming.versioned import read_snapshot

    return read_snapshot(spark, target)


SPECS: list[QuerySpec] = [
    QuerySpec("generator_activities", q_generator, None, ("generator", "rows-only")),
    QuerySpec("stream_cdc_apply", q_stream_cdc_apply, None, ("streaming-live", "rows-only")),
    QuerySpec("multimodal_features", q_multimodal, None, ("multimodal", "rows-only")),
    QuerySpec("approx_count_distinct", q_approx_distinct, None, ("agg", "rows-only")),
    QuerySpec("sampled_profile", q_sampled_profile, None, ("agg", "rows-only")),
]
