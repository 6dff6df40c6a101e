"""Synthesize a deterministic sf1 decade for scaling measurement.

VERDICT r11 item 4: sf0.1 tops out at 600 k fact rows, where Spark's
per-job scheduling floor still colors wall-time exponents. This tool
manufactures a 10× decade WITHOUT new fixtures: each table is the UNION of
10 key-shifted copies of the driver-generated sf0.1 parquet (copy i adds
``i * KEY_STRIDE`` to every key column, copy 0 is the identity), giving 10
disjoint isomorphic sub-databases whose joins resolve within each copy.

Scope: only the tables the worst-exponent (graph-family) specs read —
orders, lineitem, customer, supplier. The construction scales |V| and |E|
exactly 10× with NO cross-copy edges, so the expected shuffle exponent of
a linear-in-|E| design is 1.0 by construction; what the measurement can
still expose is machinery whose cost grows super-linearly in |E| (join
blow-ups, wedge materialization, per-round lineage growth). It deliberately
does NOT reproduce the data-driven edge densification seen across the real
sf0.001→0.1 fixtures (more orders per customer ⇒ denser graph) — SCALING.md
documents both curves side by side.

Writes to /root/repo/synthdata/sf1 (git-ignored). Deterministic: re-running
produces byte-identical row sets (order within parquet files may differ;
all consumers aggregate).

Usage: python tools/synth_sf1.py [src_sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from projet_data_infrastructure_spark.session import get_spark

#: Added to every key column per copy. Far above any sf0.1 key (max key at
#: sf0.1 is o_orderkey ~ 6e5) and far below 2^63 / 20, so packed node ids
#: (customer k -> 2k, supplier k -> 2k+1) stay exact and disjoint.
KEY_STRIDE = 1_000_000_000

N_COPIES = 10

#: table -> key columns shifted per copy (all other columns pass through).
TABLES: dict[str, tuple[str, ...]] = {
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_suppkey", "l_partkey"),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/synthdata/sf1"
    spark = get_spark("synth-sf1")
    for table, keys in TABLES.items():
        df = spark.read.parquet(f"{src}/{table}.parquet")
        cp = df.withColumn(
            "_copy", F.explode(F.sequence(F.lit(0), F.lit(N_COPIES - 1)))
        )
        shifted = cp.select(
            *[
                (
                    (
                        F.col(c).cast("long")
                        + F.col("_copy").cast("long") * F.lit(KEY_STRIDE).cast("long")
                    ).alias(c)
                    if c in keys
                    else F.col(c)
                )
                for c in df.columns
            ]
        )
        dest = f"{out}/{table}.parquet"
        shifted.write.mode("overwrite").parquet(dest)
        print(f"{table}: {df.count()} -> {spark.read.parquet(dest).count()} rows")
    spark.stop()


if __name__ == "__main__":
    main()
