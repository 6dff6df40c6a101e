"""Plan-quality gates: the physical plans the engine promises, asserted.

The scale story isn't prose — these tests fail if a dim join stops
broadcasting, a filter stops reaching the parquet scan, a limit query plans
a global sort, or Python sneaks into a hot path.
"""

import pytest
from pyspark.sql import functions as F

from projet_data_infrastructure_spark.operators.scale import explain_has
from projet_data_infrastructure_spark.plans.events_queries import q_cdc_envelope
from projet_data_infrastructure_spark.plans.llm_queries import q_text_stats
from projet_data_infrastructure_spark.plans.relational import (
    q_filter_pushdown,
    q_flagship,
    q_inner_join,
    q_orderby_limit,
    q_scan_project,
    q_topk,
)

SF = "/root/testdata/sf0.001"


def test_dim_joins_broadcast(spark):
    # No shuffle of the fact side for dim joins: BroadcastHashJoin, and the
    # only Exchange allowed is the aggregation's.
    checks = explain_has(q_inner_join(spark, SF), "BroadcastHashJoin", "SortMergeJoin")
    assert checks["BroadcastHashJoin"] and not checks["SortMergeJoin"]


def test_flagship_plan_shape(spark):
    checks = explain_has(
        q_flagship(spark, SF), "BroadcastHashJoin", "HashAggregate", "SortMergeJoin"
    )
    assert checks["BroadcastHashJoin"]
    assert checks["HashAggregate"]  # partial+final agg, no sort-based agg
    assert not checks["SortMergeJoin"]


def test_filter_reaches_scan(spark):
    df = q_filter_pushdown(spark, SF)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters: [" in plan
    # quantity predicate must be pushed, not just evaluated post-scan
    assert "l_quantity" in plan.split("PushedFilters")[1].split("]")[0]


def test_projection_prunes_scan(spark):
    df = q_scan_project(spark, SF)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "c_custkey" in read_schema and "c_acctbal" not in read_schema


def test_topk_avoids_global_sort(spark):
    # ORDER BY + LIMIT must plan as TakeOrderedAndProject (per-partition
    # heaps), never a full Sort + Exchange of the whole table.
    for df in (q_topk(spark, SF), q_orderby_limit(spark, SF)):
        checks = explain_has(df, "TakeOrderedAndProject")
        assert checks["TakeOrderedAndProject"]


def test_no_python_in_hot_paths(spark):
    # Text/CDC pipelines are pure JVM expressions: no BatchEvalPython (row
    # UDF) or ArrowEvalPython (pandas UDF) operators in their plans.
    for df in (q_text_stats(spark, SF), q_cdc_envelope(spark, SF)):
        checks = explain_has(df, "BatchEvalPython", "ArrowEvalPython")
        assert not checks["BatchEvalPython"] and not checks["ArrowEvalPython"]


def test_whole_stage_codegen_covers_scan_pipeline(spark):
    # simple mode marks codegen stages with "*(n)"
    plan = q_filter_pushdown(spark, SF)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "*(1)" in plan


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    # Bucketed layout on the join key ⇒ join without Exchange on either side.
    from projet_data_infrastructure_spark.operators.scale import write_bucketed

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force the issue
    try:
        orders = spark.range(10_000).select(
            (F.col("id") % 500).alias("custkey"), F.col("id").alias("orderkey")
        )
        cust = spark.range(500).select(F.col("id").alias("custkey"), F.lit("x").alias("seg"))
        write_bucketed(orders, "b_orders", "custkey", n_buckets=8)
        write_bucketed(cust, "b_cust", "custkey", n_buckets=8)
        joined = spark.table("b_orders").join(spark.table("b_cust"), "custkey")
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "Exchange" not in plan  # co-located: zero shuffles
        assert joined.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_cust")


def test_salted_agg_matches_plain(spark):
    from projet_data_infrastructure_spark.operators.scale import salted_count_avg

    df = spark.range(5000).select(
        (F.col("id") % 7).alias("k"),
        F.when(F.col("id") % 11 == 0, None).otherwise(F.col("id").cast("double")).alias("v"),
    )
    salted = {r["k"]: (r["count_activity"], round(r["mean_duration"], 6))
              for r in salted_count_avg(df, "k", "v").collect()}
    plain = {r["k"]: (r["cnt"], round(r["avg"], 6))
             for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("cnt"),
                                          F.avg("v").alias("avg")).collect()}
    assert salted == plain
