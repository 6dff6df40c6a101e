"""Deterministic, engine-portable hashing primitives.

The dedup/similarity operators (SURVEY.md §7.2 M4) need hash functions that
produce IDENTICAL values in Spark and in the DuckDB oracle, so correctness is
checkable cross-engine. ``xxhash64``/``hash`` are Spark-specific, so the
portable primitive is md5 (identical bytes-in/hex-out everywhere):

  hash64(s)   = int(hex(md5(s))[:15], 16)   -- 60 bits, fits a signed int64
  hash64(s,i) = hash64(concat(i, ':', s))   -- the i-th independent hash fn

In production on a real cluster you may swap ``hash64`` for ``F.xxhash64``
(cheaper); the operator algebra is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_PREFIX_LEN = 15  # 15 hex chars = 60 bits < 63 → always a valid signed int64


def md5_hex(col: Column) -> Column:
    return F.md5(col.cast("string"))


def hash64(col: Column, seed: int | None = None) -> Column:
    """Portable 60-bit hash of a string column (seeded variant for minhash)."""
    base = col.cast("string")
    if seed is not None:
        base = F.concat(F.lit(f"{seed}:"), base)
    return F.conv(F.substring(F.md5(base), 1, HEX_PREFIX_LEN), 16, 10).cast("long")


def hash64_sql(expr: str, seed: int | None = None) -> str:
    """The DuckDB-side rendering of :func:`hash64` (for oracle SQL)."""
    base = f"CAST({expr} AS VARCHAR)"
    if seed is not None:
        base = f"('{seed}:' || {base})"
    return f"CAST(('0x' || substr(md5({base}), 1, {HEX_PREFIX_LEN})) AS BIGINT)"
