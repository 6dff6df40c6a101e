"""Find heavy stages running on too few tasks (the AQE-coalesce fan-out trap).

Round-12 postmortem: five of the registry's most expensive specs were
spending 78-98% of their executor time on ONE task. The shared shape:

    small-bytes intermediate (an aggregate, a one-file scan, a distinct)
      -> AQE coalesces its shuffle to 1-2 partitions (it only sees BYTES)
        -> a downstream stage FANS OUT 20-1000x per row
           (pair explosion, blocked self-join, replica explode,
            grouped-map) on those same 1-2 tasks.

AQE cannot see the fan-out coming, so the fix is an explicit
AQE-coalesce-exempt repartition of the tiny input. Two traps to know:

* ``repartition(n, key)`` on a frame ALREADY hash-partitioned by ``key``
  is elided as redundant — use round-robin ``repartition(n)`` there.
* ``applyInPandas`` only requires clustered distribution, so an upstream
  user ``repartition(n, key)`` is reused verbatim (no second exchange)
  and pins the grouped-map parallelism.

This tool runs the top-N most expensive specs (by the committed
LOCAL_ORACLE_sf0.1.json timings) through the noop sink and flags every
stage that did > ``MIN_MS`` of executor work on <= ``MAX_TASKS`` tasks.

Usage: python tools/single_task_sweep.py [top_n] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from projet_data_infrastructure_spark.plans import all_specs
from projet_data_infrastructure_spark.session import get_spark

MAX_TASKS = 2
MIN_MS = 1500


def main() -> None:
    top_n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "LOCAL_ORACLE_sf0.1.json")) as f:
        results = json.load(f)["results"]
    timed = sorted(
        ((r.get("spark_sec", 0.0), n) for n, r in results.items()), reverse=True
    )[:top_n]
    specs = {s.name: s for s in all_specs()}

    # retainedStages must exceed the sweep's total stage count (full-registry
    # runs cross the default 1000-stage eviction cap, which would silently
    # shrink the percent-of-total denominator and could hide a late flag —
    # the same pathology scaling_curve.py fixed; ADVICE r12).
    spark = get_spark(
        "single-task-sweep",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    ui, app = spark.sparkContext.uiWebUrl, spark.sparkContext.applicationId
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def stages() -> dict:
        url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
        with urllib.request.urlopen(url, timeout=30) as r:
            return {s["stageId"]: s for s in json.load(r)}

    n_flagged = 0
    for _cost, name in timed:
        before = set(stages())
        try:
            specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001 - report and continue the sweep
            print(f"ERR  {name}: {type(e).__name__}", flush=True)
            continue
        new = [s for sid, s in stages().items() if sid not in before]
        bad = [
            (s["numTasks"], s["executorRunTime"])
            for s in new
            if s["numTasks"] <= MAX_TASKS and s["executorRunTime"] > MIN_MS
        ]
        total = sum(s["executorRunTime"] for s in new) or 1
        if bad:
            tasks, ms = max(bad, key=lambda x: x[1])
            n_flagged += 1
            print(
                f"FLAG {name}: {ms} ms on {tasks} task(s) "
                f"({100 * ms // total}% of {total} ms)",
                flush=True,
            )
        else:
            print(f"ok   {name}", flush=True)
        spark.catalog.clearCache()
        try:
            for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
                rdd.unpersist(False)
        except Exception:
            pass
    print(f"\n{n_flagged} flagged / {len(timed)} swept")
    spark.stop()


if __name__ == "__main__":
    main()
