"""GE-style validation engine (SURVEY §2.11): rows engineered to pass/fail
each rule from the reference's suite (data_validation_dag.py:306-320)."""

import pytest

from projet_data_infrastructure_spark.operators.validate import (
    ValidationError,
    between,
    in_set,
    not_null,
    row_count,
    unique,
    validate,
)


@pytest.fixture(scope="module")
def activities(spark):
    rows = [
        (1, "2024-01-01 10:00:00", "Course à pied", 3600, 9.5),
        (2, "2024-01-02 11:00:00", "Natation", 1800, 1.2),
        (3, "2024-01-03 12:00:00", "Yoga", 2400, None),  # NULL distance ok
        (4, None, "Vélo", 5400, 25.0),  # NULL start_datetime → violation
        (5, "2024-01-05 09:00:00", None, -60, 3.0),  # NULL sport + negative duration
    ]
    return spark.createDataFrame(
        rows, "id int, start_datetime string, sport_type string, activity_duration int, distance double"
    )


def test_reference_suite_detects_each_violation(activities):
    report = validate(
        activities,
        [
            not_null("start_datetime"),
            not_null("sport_type"),
            between("activity_duration", min_value=0),
            between("distance", min_value=0, ignore_nulls=True),
        ],
    )
    by_kind = {(r.rule.kind, r.rule.column): r for r in report.results}
    assert not by_kind[("not_null", "start_datetime")].passed
    assert not by_kind[("not_null", "sport_type")].passed
    assert not by_kind[("between", "activity_duration")].passed
    assert by_kind[("between", "distance")].passed  # NULLs ignored like GE


def test_mostly_threshold(activities):
    # 4/5 non-null start_datetime = 0.8 → passes at mostly=0.8, fails above
    assert validate(activities, [not_null("start_datetime", mostly=0.8)]).passed
    assert not validate(activities, [not_null("start_datetime", mostly=0.9)]).passed


def test_unique_in_set_row_count(activities):
    report = validate(
        activities,
        [
            unique("id"),
            in_set("sport_type", ["Course à pied", "Natation", "Yoga", "Vélo"]),
            row_count(min_value=5, max_value=5),
        ],
    )
    assert report.passed


def test_raise_on_failure(activities):
    with pytest.raises(ValidationError, match="not_null"):
        validate(activities, [not_null("sport_type")], raise_on_failure=True)


def test_single_pass(activities):
    """All rules are evaluated in one aggregate (no per-rule scans)."""
    report = validate(
        activities,
        [not_null("sport_type"), between("activity_duration", 0, 10000), unique("id")],
    )
    assert len(report.results) == 3
