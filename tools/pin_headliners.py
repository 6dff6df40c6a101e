"""Freeze the round's bench headliner set into BENCH_HEADLINERS.json.

Run ONCE at the start of a round, before the first measurement, then commit
the file. Every subsequent ``bench.py`` run this round — the builder's local
runs AND the driver's end-of-round run — replays exactly this list, so
vs_prior totals always compare identical compositions (VERDICT r13 item 3:
the live auto-selection reads LOCAL_ORACLE_sf0.1.json, which is refreshed
mid-round, and r13's driver/local runs drifted to 119- vs 116-spec sets).

Selection = frozen BENCH_CORE ∪ "bench"-tagged specs ∪ top-N registered
specs by measured Spark cost (same rule bench.py applies live).

Usage::

    python tools/pin_headliners.py [round_number]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from projet_data_infrastructure_spark.plans import all_specs


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else None
    registry = all_specs()
    bench_names = {s.name for s in registry if "bench" in s.tags}
    auto_n = int(os.environ.get("SPARK_GRAFT_BENCH_AUTO_TOPN", "70"))
    auto = bench._top_measured_names(auto_n)
    names = sorted(bench_names | auto | set(bench.BENCH_CORE))
    unknown = [n for n in names if n not in {s.name for s in registry}]
    assert not unknown, f"pinned names not in registry: {unknown}"
    rec = {
        "round": rnd,
        "rule": f"BENCH_CORE ∪ bench-tagged ∪ top-{auto_n} by LOCAL_ORACLE_sf0.1 spark_sec",
        "n": len(names),
        "names": names,
    }
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "BENCH_HEADLINERS.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    print(f"pinned {len(names)} headliners -> {out}")


if __name__ == "__main__":
    main()
