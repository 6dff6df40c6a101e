"""Seeded synthetic sport-activity generator (SURVEY §2.8 G1-G5), pure Spark.

The reference generates a year of activities row-by-row in Python
(``/root/reference/activity_generator/sport_generation.py:136-208``) — a
driver-side loop that cannot scale. This is the same distribution re-expressed
as one declarative plan over ``spark.range``: employees × days cross join,
seeded ``rand()`` draws, chained ``when()`` — fully distributed, no Python in
the loop, linear in employees×days across the cluster.

Distributions mirrored (sport_generation.py):
* G1 P(activity) = 0.05 weekday / 0.15 weekend; uniform over 21 sports (:18-23,:174-181)
* G2 distance ranges per sport class; NULL for non-distance sports (:42-72)
* G3 duration = distance/speed_kmh × U(0.9,1.1) × 3600, else U(1800,7200) s (:75-113)
* G4 start hour: 30% in 06-09, 70% in 10-21; uniform min/sec (:115-134)
* G5 comment: uniform over 12 phrases ∪ 30×NULL ≈ 71.4% NULL (:26-39)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_data_infrastructure_spark.functions.hashing import hash64

SPORTS = [
    "Course à pied",
    "Marche",
    "Randonnée",
    "Vélo",
    "Trottinette",
    "Natation",
    "Football",
    "Basketball",
    "Tennis",
    "Badminton",
    "Escalade",
    "Yoga",
    "Musculation",
    "Boxe",
    "Danse",
    "Ski",
    "Surf",
    "Aviron",
    "Équitation",
    "Golf",
    "Volleyball",
]

#: (min_km, max_km, speed_kmh) per distance sport; others → NULL distance.
DISTANCE_SPORTS = {
    "Course à pied": (3.0, 15.0, 10.0),
    "Marche": (2.0, 8.0, 5.0),
    "Randonnée": (5.0, 20.0, 4.0),
    "Vélo": (10.0, 50.0, 20.0),
    "Trottinette": (5.0, 15.0, 12.0),
    "Natation": (0.5, 3.0, 2.5),
}

COMMENTS = [
    "Super séance !",
    "Bonne session",
    "Fatigué aujourd'hui",
    "Nouveau record personnel !",
    "Belle météo",
    "Séance difficile",
    "En forme",
    "Récupération active",
    "Avec des collègues",
    "Entraînement matinal",
    "Très motivé",
    "À refaire",
]
COMMENT_NULL_WEIGHT = 30  # 12 phrases ∪ 30×NULL ⇒ ≈71.4% NULL


def _key() -> Column:
    """Row identity as a string — '<employee>:<yyyy-mm-dd>' in both engines."""
    return F.concat(
        F.col("id_employee").cast("string"), F.lit(":"), F.col("day").cast("string")
    )


def _u01(salt: int, seed: int) -> Column:
    """Stateless uniform [0,1) from the row identity (employee, day).

    NOT ``rand()``: stateful RNG instances inside chained ``when()`` branches
    evaluate on different row subsets and desynchronize their sequences (a
    sport drawn in one branch won't match the sport stored in the column).
    A hash of the row keys is branch-safe, partition-invariant, and
    reproducible under any physical plan — the property a distributed
    generator actually needs. The hash is the PORTABLE seeded ``hash64``
    (md5-based, ``functions/hashing.py``) rather than ``xxhash64``, so the
    whole generation replays verbatim in the DuckDB oracle
    (``plans/extras._generator_sql``) — the round-10 "oracle the
    generator" requirement; swap back to ``F.xxhash64`` on a production
    cluster if hashing ever shows up in a profile.
    """
    h = hash64(_key(), seed=seed * 1000 + salt)
    return F.pmod(h, F.lit(1_000_000_000)) / F.lit(1_000_000_000.0)


def _uniform(lo: Column | float, hi: Column | float, salt: int, seed: int) -> Column:
    return _u01(salt, seed) * (F.lit(hi) - F.lit(lo)) + F.lit(lo)


def generate_activities(
    spark: SparkSession,
    n_employees: int = 100,
    n_days: int = 366,
    start_date: str = "2024-01-01",
    seed: int = 42,
) -> DataFrame:
    """One candidate row per employee×day; emitted with the G1 probability."""
    employees = spark.range(1, n_employees + 1).select(F.col("id").alias("id_employee"))
    days = spark.sql(
        f"SELECT explode(sequence(to_date('{start_date}'), "
        f"date_add(to_date('{start_date}'), {n_days - 1}), interval 1 day)) AS day"
    )
    # Cross join is |employees| × |days| — broadcast the (tiny) day dim so the
    # employee side stays partitioned and the plan scales with employees.
    grid = employees.crossJoin(F.broadcast(days))

    is_weekend = F.dayofweek("day").isin(1, 7)
    p_active = F.when(is_weekend, F.lit(0.15)).otherwise(F.lit(0.05))  # G1
    active = _u01(0, seed) < p_active

    sport_idx = (F.floor(_u01(1, seed) * len(SPORTS)) + 1).cast("int")
    sport = F.element_at(F.array(*[F.lit(s) for s in SPORTS]), sport_idx)

    # G2: per-sport distance ranges (km), NULL otherwise. Rounding is the
    # portable half-up floor (floor(x*100 + 0.5)/100 — F.round's HALF_UP vs
    # DuckDB's round diverge on exact .xx5 doubles), values positive.
    distance = F.lit(None).cast("double")
    for name, (lo, hi, _) in DISTANCE_SPORTS.items():
        rounded = F.floor(_uniform(lo, hi, 2, seed) * 100 + F.lit(0.5)) / F.lit(100.0)
        distance = F.when(sport == name, rounded).otherwise(distance)

    # G3: duration from distance/speed with ±10% jitter, else U(1800, 7200).
    # Explicit floor, not a bare int cast: Spark's double→int CAST truncates
    # while DuckDB's rounds — floor is the same function in both engines.
    speed = F.lit(None).cast("double")
    for name, (_, _, v) in DISTANCE_SPORTS.items():
        speed = F.when(sport == name, F.lit(v)).otherwise(speed)
    jitter = _uniform(0.9, 1.1, 3, seed)
    duration = F.when(
        distance.isNotNull(),
        F.floor(distance / speed * jitter * 3600).cast("int"),
    ).otherwise(F.floor(_uniform(1800, 7200, 4, seed)).cast("int"))

    # G4: start hour 30% in 06-09 (4h span), 70% in 10-21 (12h span).
    morning = _u01(5, seed) < 0.3
    hour = F.floor(
        F.when(morning, _uniform(6, 10, 6, seed)).otherwise(_uniform(10, 22, 7, seed))
    ).cast("int")
    minute = F.floor(_uniform(0, 60, 8, seed)).cast("int")
    second = F.floor(_uniform(0, 60, 9, seed)).cast("int")
    # NTZ: wall-clock components with no session-timezone dependence (the
    # DuckDB TIMESTAMP is NTZ by nature, and the hostile non-UTC probe must
    # not shift generated hours).
    start_dt = F.make_timestamp_ntz(
        F.year("day"), F.month("day"), F.dayofmonth("day"), hour, minute, second.cast("double")
    )

    # G5: comment ∈ 12 phrases ∪ 30×NULL.
    pool = COMMENTS + [None] * COMMENT_NULL_WEIGHT
    comment_idx = (F.floor(_u01(10, seed) * len(pool)) + 1).cast("int")
    comment = F.element_at(
        F.array(*[F.lit(c).cast("string") for c in pool]), comment_idx
    )

    out = (
        grid.filter(active)  # P11: emit only drawn rows
        .withColumn("sport_type", sport)
        .withColumn("distance", distance)
        .withColumn("activity_duration", duration)
        .withColumn("start_datetime", start_dt)
        .withColumn("comment", comment)
        .select(
            # Deterministic id from the row identity — NOT
            # monotonically_increasing_id(), whose value depends on partition
            # layout and so would differ across parallelism/cluster settings.
            hash64(_key(), seed=seed).alias("id"),
            "id_employee",
            "start_datetime",
            "sport_type",
            "distance",
            "activity_duration",
            "comment",
        )
    )
    return out
