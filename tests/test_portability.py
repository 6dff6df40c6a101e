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


def test_vector_fold_cross_engine_agreement(spark):
    # The sequential array folds (l2_sq / cosine) against DuckDB's
    # list_sum/list_cosine_similarity, rounded at 1e-6 — the algebra every
    # similarity/PQ/IVF oracle rests on. One random batch through both
    # engines.
    import duckdb as _dd

    from projet_data_infrastructure_spark.operators.similarity import cosine, l2_sq
    from projet_data_infrastructure_spark.plans._portable import pround, pround_sql

    floats = st.floats(min_value=-100.0, max_value=100.0,
                       allow_nan=False, allow_infinity=False, width=32)

    from hypothesis import HealthCheck

    @settings(
        max_examples=1,
        deadline=None,
        suppress_health_check=[
            HealthCheck.large_base_example,
            HealthCheck.data_too_large,
        ],
    )
    @given(st.lists(st.tuples(st.lists(floats, min_size=8, max_size=8),
                              st.lists(floats, min_size=8, max_size=8)),
                    min_size=30, max_size=30))
    def run(pairs):
        # Guard the cosine denominator: zero vectors are not in the contract.
        pairs = [(a, b) for a, b in pairs
                 if sum(x * x for x in a) > 1e-6 and sum(x * x for x in b) > 1e-6]
        if not pairs:
            return
        df = spark.createDataFrame(
            [(i, a, b) for i, (a, b) in enumerate(pairs)],
            "i long, a array<float>, b array<float>",
        )
        got = {
            r["i"]: (r["d"], r["c"])
            for r in df.select(
                "i",
                pround(l2_sq(F.col("a"), F.col("b")), 6).alias("d"),
                pround(cosine(F.col("a"), F.col("b")), 6).alias("c"),
            ).collect()
        }
        con = _dd.connect()
        con.execute("CREATE TABLE v (i BIGINT, a FLOAT[], b FLOAT[])")
        con.executemany("INSERT INTO v VALUES (?, ?, ?)",
                        [(i, a, b) for i, (a, b) in enumerate(pairs)])
        l2 = "list_sum(list_transform(generate_series(1, len(a)), j -> (a[j]::DOUBLE - b[j]::DOUBLE) ^ 2))"
        cos = "list_cosine_similarity(a::DOUBLE[], b::DOUBLE[])"
        want = {
            r[0]: (r[1], r[2])
            for r in con.sql(
                f"SELECT i, {pround_sql(l2, 6)}, {pround_sql(cos, 6)} FROM v"
            ).fetchall()
        }
        for i in got:
            assert got[i] == want[i], f"vector fold mismatch at row {i}: {got[i]} vs {want[i]}"

    run()


def test_greedy_pack_matches_reference_fold(spark):
    # Property: the distributed applyInPandas packing equals a plain-Python
    # greedy fold on any token-count sequence, and never overfills a window
    # except for single over-long docs.
    from projet_data_infrastructure_spark.operators.text import greedy_pack

    @settings(max_examples=1, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=400),
                    min_size=1, max_size=120))
    def run(counts):
        cap = 256
        rows = [(i % 3, i, n) for i, n in enumerate(counts)]  # 3 shards
        df = spark.createDataFrame(rows, "shard long, doc_id long, n_tokens long")
        got = {
            (r["shard"], r["doc_id"]): r["pack_id"]
            for r in greedy_pack(df.repartition(5), cap=cap).collect()
        }
        want = {}
        for shard in {s for s, _, _ in rows}:
            pack, cum = 0, 0
            for s, doc, n in sorted(rows):
                if s != shard:
                    continue
                if cum + n > cap and cum > 0:
                    pack, cum = pack + 1, 0
                want[(s, doc)] = pack
                cum += n
        assert got == want

    run()


def test_hdr_bucketing_three_engine_agreement(spark):
    # The HDR sketch's whole contract is that bucketing is pure integer
    # arithmetic, identical in Python, Spark, and DuckDB, with exact
    # bracket bounds: lb(idx) <= cents <= ub(idx) and width/lb <= 2^-7.
    from projet_data_infrastructure_spark.plans.sketches import _HDR_IDX

    def py_idx(cents: int) -> int:
        if cents < 256:
            return cents
        e = cents.bit_length() - 1
        return 128 * (e - 7) + (cents >> (e - 7))

    def py_bounds(idx: int) -> tuple[int, int]:
        if idx < 256:
            return idx, idx
        s = idx // 128 - 1
        m = idx - 128 * s
        return m << s, ((m + 1) << s) - 1

    duck_idx = (
        "CASE WHEN cents < 256 THEN cents ELSE"
        " 128 * (length(bin(cents)) - 1 - 7)"
        " + (cents >> (length(bin(cents)) - 1 - 7)) END"
    )

    @settings(max_examples=1, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=1, max_value=10**15),
            min_size=200,
            max_size=200,
            unique=True,
        )
    )
    def run(samples):
        expected = {c: py_idx(c) for c in samples}
        for c, idx in expected.items():
            lb, ub = py_bounds(idx)
            assert lb <= c <= ub, (c, idx, lb, ub)
            if c >= 256:
                assert (ub - lb) <= lb / 128.0, (c, idx)
        # monotone: bucketing never reorders values
        by_val = sorted(samples)
        assert all(
            expected[a] <= expected[b] for a, b in zip(by_val, by_val[1:])
        )
        df = spark.createDataFrame([(c,) for c in samples], "cents long")
        spark_vals = {
            r["cents"]: r["idx"]
            for r in df.select("cents", F.expr(_HDR_IDX).alias("idx")).collect()
        }
        con = duckdb.connect()
        con.execute("CREATE TABLE t (cents BIGINT)")
        con.executemany("INSERT INTO t VALUES (?)", [(c,) for c in samples])
        duck_vals = dict(con.sql(f"SELECT cents, {duck_idx} FROM t").fetchall())
        assert spark_vals == expected
        assert duck_vals == expected

    run()
