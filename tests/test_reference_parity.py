"""Reference-domain parity: the flagship bonus query run on sport-domain
tables with the reference's exact semantics (README.md:141-164 +
read_delta.py:234-294), including the FIXTURES.md edge rows:

* employee with no activities (NULL count from the left join),
* employee with invalid commute (prime = 0),
* employee with exactly 15 activities (is_valid_activities boundary),
* employee with a NULL-validation edge.

Every output row is checked against independently computed expectations.
"""

import pytest
from pyspark.sql import functions as F

from projet_data_infrastructure_spark.functions.scalar import bonus_amount
from projet_data_infrastructure_spark.operators.aggregates import activity_stats
from projet_data_infrastructure_spark.operators.joins import enrich


@pytest.fixture(scope="module")
def sport_tables(spark):
    employees = spark.createDataFrame(
        [
            (1, "Ana", "Blanc", "IT", 60000, "CDI"),
            (2, "Bob", "Noir", "HR", 40000, "CDD"),
            (3, "Cleo", "Vert", "IT", 80000, "CDI"),
            (4, "Dan", "Bleu", "OPS", 55000, "CDI"),  # no activities
            (5, "Eve", "Rouge", "IT", 30000, "CDI"),  # exactly 15 activities
        ],
        "id_employee int, first_name string, last_name string, business_unity string,"
        " gross_salary int, constract_type string",
    )
    validations = spark.createDataFrame(
        [
            (1, 1, 12.50, True, None),
            (2, 2, 28.00, False, None),  # too far: invalid
            (3, 3, 8.25, True, None),
            (4, 4, None, None, "API error"),  # errored validation: NULL is_valid
            (5, 5, 3.10, True, None),
        ],
        "id_validate int, id_employee int, calculed_distance double, is_valid boolean,"
        " error_message string",
    )
    acts = []
    aid = 0
    for emp, n in [(1, 20), (2, 16), (3, 5), (5, 15)]:
        for i in range(n):
            aid += 1
            acts.append((aid, emp, f"2024-01-{(i % 28) + 1:02d} 10:00:00", "Yoga", 3600 + i))
    activities = spark.createDataFrame(
        acts, "id int, id_employee int, start_datetime string, sport_type string,"
        " activity_duration int"
    )
    return employees, validations, activities


def flagship(employees, validations, activities):
    """The reference pipeline: 4-col projection → agg → inner ⋈ → left ⟕ →
    prime/total projection (read_delta.py:261,270,280,285 + README CASE)."""
    emp = employees.select("id_employee", "first_name", "business_unity", "gross_salary")
    stats = activity_stats(activities, "id_employee", "activity_duration")
    final = enrich(emp, validations.select("id_employee", "calculed_distance", "is_valid"),
                   "id_employee", "inner")
    final = final.join(stats, "id_employee", "left")
    prime = bonus_amount(F.col("is_valid"), F.col("gross_salary"))
    return final.select(
        "id_employee",
        "gross_salary",
        "is_valid",
        "count_activity",
        prime.alias("commute_prime"),
        F.when(F.col("count_activity") >= 15, F.lit(True)).otherwise(F.lit(False)).alias(
            "is_valid_activities"
        ),
        (F.col("gross_salary") + prime).alias("total_salary"),
    )


def test_flagship_reference_semantics(sport_tables):
    employees, validations, activities = sport_tables
    rows = {r["id_employee"]: r for r in flagship(employees, validations, activities).collect()}
    assert set(rows) == {1, 2, 3, 4, 5}

    # valid commute → prime = round(5% of salary), added to total
    assert rows[1]["commute_prime"] == 3000.0 and rows[1]["total_salary"] == 63000.0
    # invalid commute → zero prime (README.md:145 CASE ELSE 0)
    assert rows[2]["commute_prime"] == 0.0 and rows[2]["total_salary"] == 40000.0
    # NULL is_valid (errored validation) falls to ELSE 0 — 3-valued logic
    assert rows[4]["commute_prime"] == 0.0
    # no activities → NULL count from the left join (read_delta.py:285)...
    assert rows[4]["count_activity"] is None
    # ...and CASE count>=15 ELSE false → false, not NULL (README.md:157-160)
    assert rows[4]["is_valid_activities"] is False
    # activity threshold: 20 ≥ 15 true; 5 < 15 false; exactly 15 → true
    assert rows[1]["is_valid_activities"] is True
    assert rows[3]["is_valid_activities"] is False
    assert rows[5]["is_valid_activities"] is True
    # counts from the aggregation
    assert rows[1]["count_activity"] == 20 and rows[5]["count_activity"] == 15


def test_flagship_matches_sql_form(spark, sport_tables):
    """DataFrame pipeline ≡ the CTE/CASE SQL form of the same query."""
    employees, validations, activities = sport_tables
    employees.createOrReplaceTempView("employees")
    validations.createOrReplaceTempView("commute_validations")
    activities.createOrReplaceTempView("sport_activities")
    sql = spark.sql(
        """
        WITH stats AS (
            SELECT id_employee, count(*) AS count_activity
            FROM sport_activities GROUP BY id_employee
        ), prime AS (
            SELECT e.id_employee,
                   CASE WHEN v.is_valid
                        THEN floor(e.gross_salary * 0.05 * 100 + 0.50001) / 100
                        ELSE 0 END AS commute_prime
            FROM employees e JOIN commute_validations v USING (id_employee)
        )
        SELECT e.id_employee, p.commute_prime,
               CASE WHEN s.count_activity >= 15 THEN true ELSE false END AS is_valid_activities,
               e.gross_salary + p.commute_prime AS total_salary
        FROM employees e
        JOIN prime p USING (id_employee)
        LEFT JOIN stats s USING (id_employee)
        """
    ).collect()
    df_rows = {r["id_employee"]: r for r in
               flagship(employees, validations, activities).collect()}
    for r in sql:
        d = df_rows[r["id_employee"]]
        assert r["commute_prime"] == d["commute_prime"]
        assert r["is_valid_activities"] == d["is_valid_activities"]
        assert r["total_salary"] == d["total_salary"]


def test_masked_view_feeds_pipeline(spark, sport_tables):
    """Reference reads employees_masked, not employees (read_delta.py:258):
    masking must not disturb the bonus math."""
    from projet_data_infrastructure_spark.operators.transforms import mask_columns

    employees, validations, activities = sport_tables
    masked = mask_columns(employees, ["first_name", "last_name"], role="bi")
    rows = {r["id_employee"]: r for r in flagship(masked, validations, activities).collect()}
    assert rows[1]["commute_prime"] == 3000.0  # salary path intact
