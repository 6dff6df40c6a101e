"""Synthetic generator distributions (SURVEY §2.8 G1-G5) — statistical
assertions with tolerances, not exact equality (SURVEY §7.3)."""

import pytest
from pyspark.sql import functions as F

from projet_data_infrastructure_spark.sources.generator import (
    DISTANCE_SPORTS,
    SPORTS,
    generate_activities,
)


@pytest.fixture(scope="module")
def acts(spark):
    df = generate_activities(spark, n_employees=200, n_days=366, seed=42).cache()
    df.count()
    yield df
    df.unpersist()


def test_g1_activity_probability(acts, spark):
    n = acts.count()
    # E[rows] = 200 × (261 weekdays × 0.05 + 105 weekend days × 0.15) ≈ 5 760
    assert 4500 < n < 7200
    weekend = acts.filter(F.dayofweek("start_datetime").isin(1, 7)).count()
    assert 0.4 < weekend / n < 0.65  # weekends are ~29% of days but 3× likelier


def test_g1_sports_uniform(acts):
    counts = dict(acts.groupBy("sport_type").count().collect())
    assert set(counts) <= set(SPORTS)
    assert len(counts) == len(SPORTS)
    lo, hi = min(counts.values()), max(counts.values())
    assert hi < 3 * lo  # roughly uniform


def test_g2_distance_ranges(acts):
    for sport, (lo, hi, _) in DISTANCE_SPORTS.items():
        row = (
            acts.filter(F.col("sport_type") == sport)
            .agg(F.min("distance"), F.max("distance"))
            .collect()[0]
        )
        assert row[0] >= lo and row[1] <= hi
    n_null = acts.filter(
        ~F.col("sport_type").isin(*DISTANCE_SPORTS) & F.col("distance").isNotNull()
    ).count()
    assert n_null == 0  # non-distance sports have NULL distance


def test_g3_duration_consistency(acts):
    # distance sports: duration ≈ distance/speed × 3600 × U(0.9, 1.1)
    sample = acts.filter(F.col("sport_type") == "Course à pied").select(
        (F.col("activity_duration") / (F.col("distance") / 10.0 * 3600)).alias("ratio")
    )
    row = sample.agg(F.min("ratio"), F.max("ratio")).collect()[0]
    assert 0.89 <= row[0] and row[1] <= 1.11
    other = acts.filter(~F.col("sport_type").isin(*DISTANCE_SPORTS))
    row = other.agg(F.min("activity_duration"), F.max("activity_duration")).collect()[0]
    assert 1800 <= row[0] and row[1] <= 7200


def test_g4_start_hours(acts):
    hours = acts.select(F.hour("start_datetime").alias("h"))
    assert hours.filter((F.col("h") < 6) | (F.col("h") >= 22)).count() == 0
    morning = hours.filter(F.col("h").between(6, 9)).count() / hours.count()
    assert 0.2 < morning < 0.4  # target 30%


def test_g5_comment_nulls(acts):
    null_ratio = acts.filter(F.col("comment").isNull()).count() / acts.count()
    assert 0.63 < null_ratio < 0.80  # target ≈ 71.4%


def test_seed_determinism(spark):
    a = generate_activities(spark, n_employees=20, n_days=30, seed=7)
    b = generate_activities(spark, n_employees=20, n_days=30, seed=7)
    assert a.drop("id").exceptAll(b.drop("id")).count() == 0
    c = generate_activities(spark, n_employees=20, n_days=30, seed=8)
    assert c.drop("id").exceptAll(a.drop("id")).count() > 0
