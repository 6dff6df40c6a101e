"""Time-series analytics over the calendar-bounded daily/hourly grids:
decomposition, autocorrelation diagnostics, trend and changepoint screens,
forecasting fits, and the motif/discord matrix profile.

Consolidated from the round-6..round-10 build modules (round 11, VERDICT
r10 item 6) — specs, oracles, and hashes unchanged; each spec keeps its
original design docstring. The shared scale shape of this module: ONE
map-side-combinable corpus aggregate down to a calendar-bounded day (or
hour) grid, then every window/pair/lag operation runs on that ≤ 366-row
(per year) frame — the unpartitioned windows here are all members of the
documented bounded-window class (SCALE.md).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_data_infrastructure_spark.plans._portable import (
    fdiv as _fdiv,
    pround,
    pround_sql,
)
from projet_data_infrastructure_spark.plans.registry import QuerySpec
from projet_data_infrastructure_spark.sources.readers import read_table

SPECS: list[QuerySpec] = []

# --------------------------------------------------------------------------
# STL-lite weekly decomposition of the daily event-value series
# --------------------------------------------------------------------------

_STL_CENTS = "CAST(round(value * 100) AS BIGINT)"


def q_stl_weekly_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))).alias("d"),
            F.expr(_STL_CENTS).alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").alias("value_cents"))
    )
    # Calendar-bounded frame (≤ 31 days in the test data, ≤ ~3.7k/decade in
    # general): the unpartitioned RANGE window is safe at any raw-data scale.
    w7 = Window.orderBy("d").rangeBetween(-3, 3)
    trended = (
        daily.withColumn("sum7", F.sum("value_cents").over(w7))
        .withColumn("cnt7", F.count(F.lit(1)).over(w7))
        .filter(F.col("cnt7") == 7)
        # non-negative sum → DIV is already floor; ×10⁶ ≤ 7·10¹⁴ at test
        # scale (recast DECIMAL for >10¹² cents/week corpora)
        .withColumn("trend_micro", F.expr("(sum7 * 1000000) DIV 7"))
        .withColumn("detr_micro", F.col("value_cents") * F.lit(1000000) - F.col("trend_micro"))
        .withColumn("dow", F.pmod(F.col("d"), F.lit(7)))
    )
    seasonal = trended.groupBy("dow").agg(
        F.sum("detr_micro").alias("sdetr"), F.count(F.lit(1)).alias("ndetr")
    )
    seasonal = seasonal.select(
        "dow", F.expr(_fdiv("sdetr", "ndetr", "DIV")).alias("seasonal_micro")
    )
    return (
        trended.join(F.broadcast(seasonal), "dow")
        .select(
            "d",
            "value_cents",
            "trend_micro",
            "seasonal_micro",
            (F.col("detr_micro") - F.col("seasonal_micro")).alias("resid_micro"),
        )
        .orderBy("d")
    )


_STL_SQL = f"""
WITH daily AS (
    SELECT CAST(ts AS DATE) - DATE '1970-01-01' AS d,
           CAST(sum({_STL_CENTS}) AS BIGINT) AS value_cents
    FROM events GROUP BY 1
), trended AS (
    SELECT d, value_cents,
           sum(value_cents) OVER w7 AS sum7,
           count(*) OVER w7 AS cnt7
    FROM daily
    WINDOW w7 AS (ORDER BY d RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), full7 AS (
    SELECT d, value_cents,
           CAST((sum7 * 1000000) // 7 AS BIGINT) AS trend_micro,
           value_cents * 1000000 - CAST((sum7 * 1000000) // 7 AS BIGINT) AS detr_micro,
           d % 7 AS dow
    FROM trended WHERE cnt7 = 7
), seasonal AS (
    SELECT dow,
           CAST({_fdiv('CAST(sum(detr_micro) AS BIGINT)', 'count(*)', '//')} AS BIGINT)
               AS seasonal_micro
    FROM full7 GROUP BY dow
)
SELECT d, value_cents, trend_micro, seasonal_micro,
       detr_micro - seasonal_micro AS resid_micro
FROM full7 JOIN seasonal USING (dow)
ORDER BY d
"""




SPECS.append(
    QuerySpec(
        "stl_weekly_decompose",
        q_stl_weekly_decompose,
        _STL_SQL,
        ("timeseries", "window"),
        doc="STL-lite decomposition of the daily value series: centered 7-day "
        "RANGE-frame trend, day-of-week seasonal index, residual — all exact "
        "integer micro-cents over the calendar-bounded daily aggregate",
    )
)
