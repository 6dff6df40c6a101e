"""Distributed 2-D skyline (Pareto frontier) — maximize both dimensions.

Paper grounding: "Integration of Skyline Queries into Spark SQL" (EDBT
2023) integrates exactly this decomposition into Spark; the reference
engine has no skyline surface (engine-charter addition).

Algorithm (the textbook distributed form):

1. **Distinct pairs.** Collapse to distinct (x, y) with a representative
   key (hash aggregate, one shuffle). Equal points carry no dominance
   information and would break the strict-dominance running-max test.
2. **Local prune.** Bucket rows by a deterministic hash of (x, y) and run
   the sort-based skyline INSIDE each bucket (window partitioned by
   bucket): sorted by (x desc, y desc), a point survives iff its y exceeds
   the running max of y over all preceding points. Dominated-by-bucketmate
   points die here — removing a dominated point is always safe, because
   its dominator survives into phase 3. Work is parallel across buckets;
   no global sort touches the full table.
3. **Global pass.** The same sort-based rule over the union of bucket
   survivors. skyline(S) = skyline(∪ skyline(S_i)), so this is exact. The
   survivor set is the only globally-sorted input — for n random points
   its expected size is O(log n · buckets), not O(n); the docstring
   contract (and the plan test) is that the single-partition window runs
   on the pruned candidate set, never the raw table.

Correctness of the running-max test (points distinct, both axes maximized):
in (x desc, y desc) order every preceding point b has b.x > a.x, or
b.x == a.x and b.y > a.y. If max-preceding-y >= a.y then some b has
b.x >= a.x, b.y >= a.y with one strict (equality on both is impossible
after step 1) — a is dominated. If max-preceding-y < a.y no preceding
point dominates a, and following points have smaller x (or equal x with
smaller y), so none of them can either.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _sort_based_skyline(df: DataFrame, x: str, y: str, partition_cols: list[str]) -> DataFrame:
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(F.desc(x), F.desc(y))
        .rowsBetween(Window.unboundedPreceding, -1)
        if partition_cols
        else Window.orderBy(F.desc(x), F.desc(y)).rowsBetween(Window.unboundedPreceding, -1)
    )
    m = F.max(y).over(w)
    return df.withColumn("_prev_max_y", m).filter(
        F.col("_prev_max_y").isNull() | (F.col(y) > F.col("_prev_max_y"))
    ).drop("_prev_max_y")


def skyline_2d_max(
    df: DataFrame,
    x: str,
    y: str,
    key: str,
    n_buckets: int = 32,
) -> DataFrame:
    """Exact Pareto frontier maximizing ``x`` and ``y``.

    Returns one row per skyline point: (key = min representative, x, y).
    ``x`` and ``y`` must be orderable and non-null."""
    pts = df.groupBy(x, y).agg(F.min(key).alias(key))
    bucketed = pts.withColumn("_bkt", F.pmod(F.hash(F.col(x), F.col(y)), F.lit(n_buckets)))
    local = _sort_based_skyline(bucketed, x, y, ["_bkt"]).drop("_bkt")
    return _sort_based_skyline(local, x, y, []).select(key, x, y)
