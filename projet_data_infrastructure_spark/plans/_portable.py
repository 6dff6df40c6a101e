"""Cross-engine deterministic helpers shared by every QuerySpec.

Spark's ``round()`` (BigDecimal HALF_UP on the double's shortest decimal
rendering) and DuckDB's ``round()`` (binary-double rounding) disagree on
half-way values (measured: 2/1500 mismatches on ``round(c_acctbal*0.05, 2)``),
so every rounded output uses the portable formulation

    pround(x, n) = floor(x * 10^n + 0.5) / 10^n

which is pure IEEE-double arithmetic and bit-identical in both engines.

Aggregates over doubles are order-sensitive in the last ulps, so every
floating aggregate output is rounded: 2 dp for avg-scale values, 0 dp for
large sums (absolute noise ~1e-4 at sf0.01 ≪ the 0.5 boundary).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(col: Column, n: int = 2) -> Column:
    """Portable round-half-up, identical in Spark and DuckDB (see module doc)."""
    scale = float(10**n)
    return (F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)).alias("pround")


def pround_sql(expr: str, n: int = 2) -> str:
    scale = float(10**n)
    return f"(floor(({expr}) * {scale} + 0.5) / {scale})"
