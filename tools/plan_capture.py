"""Capture .explain("formatted") for named specs (or every pinned headliner)
into plans/r14/<query>_<label>.txt, plus a one-line smell summary per query.

Usage:
    python tools/plan_capture.py <label> [name ...]

With no names, captures every name in BENCH_HEADLINERS.json. Smells flagged:
BatchEvalPython/ArrowEvalPython nodes, SortMergeJoin, CartesianProduct,
Exchange count, missing PushedFilters on filtered scans.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, "/root/repo")

import json

from projet_data_infrastructure_spark.plans import all_specs
from projet_data_infrastructure_spark.session import get_spark

OUT_DIR = "/root/repo/plans/r14"


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    if not names:
        with open("/root/repo/BENCH_HEADLINERS.json") as f:
            names = json.load(f)["names"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("plan-capture")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    specs = {s.name: s for s in all_specs()}
    rows = []
    for name in names:
        spec = specs.get(name)
        if spec is None:
            print(f"!! unknown spec {name}")
            continue
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # streaming specs EXECUTE in fn(); skip plan
            rows.append((name, f"ERROR {type(e).__name__}: {e}"))
            continue
        with open(os.path.join(OUT_DIR, f"{name}_{label}.txt"), "w") as f:
            f.write(plan)
        n_exch = len(re.findall(r"\bExchange\b", plan))
        smells = []
        for pat in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct",
                    "SortMergeJoin", "BroadcastNestedLoopJoin"):
            k = len(re.findall(pat, plan))
            if k:
                smells.append(f"{pat}x{k}")
        rows.append((name, f"exch={n_exch} {' '.join(smells)}"))
    for name, info in rows:
        print(f"{name:40s} {info}")
    spark.stop()


if __name__ == "__main__":
    main()
