"""Cross-engine determinism properties: the md5-derived hash64 and the
portable round must agree across Python (hashlib), Spark, and DuckDB on
arbitrary inputs — this is the foundation the whole oracle contract rests on.
Randomized inputs via hypothesis (single batch through each engine, not
per-example sessions)."""

import hashlib
import math

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from projet_data_infrastructure_spark.functions.hashing import HEX_PREFIX_LEN, hash64, hash64_sql


def py_hash64(s: str, seed: int | None = None) -> int:
    base = f"{seed}:{s}" if seed is not None else s
    return int(hashlib.md5(base.encode("utf-8")).hexdigest()[:HEX_PREFIX_LEN], 16)


def test_hash64_three_engine_agreement(spark):
    strings = st.text(min_size=0, max_size=60)

    @settings(max_examples=1, deadline=None)
    @given(st.lists(strings, min_size=150, max_size=150, unique=True))
    def run(samples):
        # one batch through all three engines
        samples = [s for s in samples if "\x00" not in s]  # NUL: varchar-hostile
        df = spark.createDataFrame([(s,) for s in samples], "s string")
        spark_vals = {
            r["s"]: (r["h"], r["hs"])
            for r in df.select(
                "s", hash64(F.col("s")).alias("h"), hash64(F.col("s"), seed=3).alias("hs")
            ).collect()
        }
        con = duckdb.connect()
        con.execute("CREATE TABLE t (s VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in samples])
        duck_vals = {
            r[0]: (r[1], r[2])
            for r in con.sql(
                f"SELECT s, {hash64_sql('s')}, {hash64_sql('s', seed=3)} FROM t"
            ).fetchall()
        }
        for s in samples:
            expected = (py_hash64(s), py_hash64(s, 3))
            assert spark_vals[s] == expected, f"spark mismatch on {s!r}"
            assert duck_vals[s] == expected, f"duckdb mismatch on {s!r}"

    run()


def test_pround_cross_engine_agreement(spark):
    from projet_data_infrastructure_spark.plans._portable import pround, pround_sql

    floats = st.floats(
        min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
    )

    @settings(max_examples=1, deadline=None)
    @given(st.lists(floats, min_size=50, max_size=80))
    def run(xs):
        df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i long, x double")
        s_vals = {
            r["i"]: (r["r2"], r["r0"])
            for r in df.select(
                "i", pround(F.col("x"), 2).alias("r2"), pround(F.col("x"), 0).alias("r0")
            ).collect()
        }
        con = duckdb.connect()
        con.execute("CREATE TABLE t (i BIGINT, x DOUBLE)")
        con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(xs)))
        d_vals = {
            r[0]: (r[1], r[2])
            for r in con.sql(
                f"SELECT i, {pround_sql('x', 2)}, {pround_sql('x', 0)} FROM t"
            ).fetchall()
        }
        mismatches = [i for i in s_vals if s_vals[i] != d_vals[i]]
        assert not mismatches, f"{len(mismatches)} mismatches, first: {mismatches[:3]}"

    run()


def test_ensure_table_bootstrap(spark):
    from projet_data_infrastructure_spark.operators.validate import ensure_table

    spark.sql("DROP TABLE IF EXISTS boot_t")
    existed = ensure_table(
        spark, "boot_t", "id int, sport string", seed_rows=[(1, "Yoga"), (2, "Vélo")]
    )
    assert not existed
    assert spark.table("boot_t").count() == 2
    assert ensure_table(spark, "boot_t", "id int, sport string")  # now exists
    assert spark.table("boot_t").count() == 2  # not re-seeded
    spark.sql("DROP TABLE boot_t")


def test_portable_round_halfway_bias(spark):
    # exact decimal halfway points round UP deterministically in both engines
    vals = [(0, 0.125), (1, 2.5), (2, -0.005), (3, 220721.135)]
    from projet_data_infrastructure_spark.plans._portable import pround, pround_sql

    df = spark.createDataFrame(vals, "i long, x double")
    s = {r["i"]: r["r"] for r in df.select("i", pround(F.col("x"), 2).alias("r")).collect()}
    con = duckdb.connect()
    d = dict(
        con.sql(
            "SELECT i, " + pround_sql("x", 2) + " FROM (VALUES (0, 0.125::DOUBLE), (1, 2.5::DOUBLE),"
            " (2, -0.005::DOUBLE), (3, 220721.135::DOUBLE)) t(i, x)"
        ).fetchall()
    )
    assert s == d
    assert not any(v is None or math.isnan(v) for v in s.values())
