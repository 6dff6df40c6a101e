"""Exact-ntile / global-rank operator: hash-identical to the SQL window
forms, partition-invariant, and free of single-partition sorts."""

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from projet_data_infrastructure_spark.operators.ranks import (
    exact_ntile,
    global_rank,
    grouped_rank,
    ntile_from_rank_cols,
)


def _data(spark, n_rows, n_distinct, parts=1, seed=7):
    rng = random.Random(seed)
    rows = [(i, rng.randrange(n_distinct)) for i in range(n_rows)]
    df = spark.createDataFrame(rows, "id long, v long")
    return df.repartition(parts) if parts > 1 else df


@pytest.mark.parametrize(
    "n_rows,n_buckets,descending",
    [(1, 4, False), (7, 10, False), (100, 5, True), (1003, 10, False), (1003, 7, True)],
)
def test_exact_ntile_matches_window_ntile(spark, n_rows, n_buckets, descending):
    df = _data(spark, n_rows, n_distinct=max(2, n_rows // 5))
    order = [F.desc("v") if descending else F.asc("v"), F.asc("id")]
    ref = df.withColumn("bucket", F.ntile(n_buckets).over(Window.orderBy(*order)))
    got = exact_ntile(
        df, n_buckets, "v", ties=["id"], descending=descending, n_ranges=8
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))


def test_global_rank_matches_row_number(spark):
    df = _data(spark, 500, n_distinct=20)
    ref = df.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.asc("v"), F.asc("id"))).cast("long"),
    )
    got, n_total = global_rank(df, "v", ties=["id"], n_ranges=8)
    assert n_total == 500
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))


def test_exact_ntile_partition_invariant(spark):
    a = exact_ntile(_data(spark, 400, 11, parts=1), 10, "v", ties=["id"], n_ranges=8)
    b = exact_ntile(_data(spark, 400, 11, parts=13), 10, "v", ties=["id"], n_ranges=8)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_exact_ntile_single_hot_value(spark):
    # every row the same key: one bucket boundary can't split ties across
    # range buckets; result must still equal the SQL ntile.
    df = spark.createDataFrame([(i, 42) for i in range(97)], "id long, v long")
    ref = df.withColumn(
        "bucket", F.ntile(10).over(Window.orderBy(F.asc("v"), F.asc("id")))
    )
    got = exact_ntile(df, 10, "v", ties=["id"], n_ranges=8)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))


def test_exact_ntile_plan_has_no_global_window(spark):
    df = _data(spark, 300, 9)
    got = exact_ntile(df, 10, "v", ties=["id"], n_ranges=8)
    plan = got._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "ntile(" not in plan
    assert "Exchange SinglePartition" not in plan


def _grouped_data(spark, parts=1, seed=11):
    """Uneven groups (one hot, one tiny, one mid) with duplicate keys."""
    rng = random.Random(seed)
    rows = []
    for i in range(400):
        rows.append((i, "hot", rng.randrange(25)))
    for i in range(400, 430):
        rows.append((i, "mid", rng.randrange(7)))
    rows.append((430, "tiny", 3))
    rows.append((431, "tiny", 3))
    df = spark.createDataFrame(rows, "id long, g string, v long")
    return df.repartition(parts) if parts > 1 else df


@pytest.mark.parametrize("descending", [False, True])
def test_grouped_rank_matches_partitioned_row_number(spark, descending):
    df = _grouped_data(spark)
    order = [F.desc("v") if descending else F.asc("v"), F.asc("id")]
    ref = df.withColumn(
        "r", F.row_number().over(Window.partitionBy("g").orderBy(*order)).cast("long")
    )
    got = grouped_rank(
        df, "g", "v", ties=["id"], descending=descending, rank_col="r", n_ranges=8
    ).drop("group_total")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))


def test_grouped_ntile_cols_matches_partitioned_window_ntile(spark):
    # tiny group has fewer rows than buckets → exercises the q == 0 branch
    df = _grouped_data(spark)
    ref = df.withColumn(
        "bucket",
        F.ntile(3).over(Window.partitionBy("g").orderBy(F.desc("v"), F.asc("id"))),
    )
    ranked = grouped_rank(
        df, "g", "v", ties=["id"], descending=True, rank_col="_r", total_col="_t",
        n_ranges=8,
    )
    got = ranked.withColumn(
        "bucket", ntile_from_rank_cols(F.col("_r"), F.col("_t"), 3)
    ).drop("_r", "_t")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))


def test_grouped_rank_partition_invariant(spark):
    a = grouped_rank(_grouped_data(spark, parts=1), "g", "v", ties=["id"], n_ranges=8)
    b = grouped_rank(_grouped_data(spark, parts=13), "g", "v", ties=["id"], n_ranges=8)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_grouped_rank_plan_has_no_single_partition_exchange(spark):
    got = grouped_rank(_grouped_data(spark), "g", "v", ties=["id"], n_ranges=8)
    plan = got._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Exchange SinglePartition" not in plan
    # the window partitions on (group, range-bucket), never on group alone
    assert "ntile(" not in plan


def test_grouped_rank_null_group_ranks_correctly(spark):
    """ADVICE r5: a NULL group used to miss the driver-side offset map
    (concat_ws drops NULL operands) and silently yield NULL rank/total.
    NULL groups must rank as their own group, exactly like the window form.
    """
    rows = [(0, None, 5), (1, None, 2), (2, None, 9), (3, "a", 1), (4, "a", 7)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    ref = df.withColumn(
        "r",
        F.row_number()
        .over(Window.partitionBy("g").orderBy(F.asc("v"), F.asc("id")))
        .cast("long"),
    )
    got = grouped_rank(df, "g", "v", ties=["id"], rank_col="r", total_col="t", n_ranges=4)
    assert got.filter(F.col("r").isNull() | F.col("t").isNull()).count() == 0
    assert sorted(map(tuple, got.drop("t").collect())) == sorted(
        map(tuple, ref.collect())
    )
    totals = {(r["g"], r["t"]) for r in got.collect()}
    assert totals == {(None, 3), ("a", 2)}
