"""Semantics tests for plans/lakehouse.py (SCD2, incremental agg, KMV sketch)
and the cross-document duplicated-ngram signal."""

import datetime as dt

from pyspark.sql import functions as F

from projet_data_infrastructure_spark.plans import lakehouse
from projet_data_infrastructure_spark.plans.llm_queries import q_crossdoc_dup_ngrams

SF = "/root/testdata/sf0.001"


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_scd2_collapses_and_tiles(spark):
    """Consecutive equal attribute values collapse to one interval; intervals
    tile the timeline (each effective_to == next effective_from) and exactly
    one row per user is current."""
    rows = [
        (1, "a", _ts("2024-01-01T00:00:00"), 10),
        (1, "a", _ts("2024-01-02T00:00:00"), 11),  # no change — collapsed
        (1, "b", _ts("2024-01-03T00:00:00"), 12),
        (1, "a", _ts("2024-01-04T00:00:00"), 13),  # back to a — NEW interval
        (2, "x", _ts("2024-01-01T00:00:00"), 14),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp_ntz, event_id long")
    import projet_data_infrastructure_spark.plans.lakehouse as lh
    import projet_data_infrastructure_spark.sources.readers as readers

    orig = readers.read_table
    try:
        readers_patch = lambda sp, sf, name: df  # noqa: E731
        lh.read_table = readers_patch
        out = lh.q_scd2_user_history(spark, SF).orderBy("user_id", "effective_from_us").collect()
    finally:
        lh.read_table = orig

    u1 = [r for r in out if r.user_id == 1]
    assert [r.attr_value for r in u1] == ["a", "b", "a"]
    # intervals tile: effective_to of row i == effective_from of row i+1
    for prev, nxt in zip(u1, u1[1:]):
        assert prev.effective_to_us == nxt.effective_from_us
    assert [r.is_current for r in u1] == [0, 0, 1]
    u2 = [r for r in out if r.user_id == 2]
    assert len(u2) == 1 and u2[0].is_current == 1


def test_incremental_merge_equals_full_recompute(spark):
    """The algebraic-merge result is identical to a single full aggregation."""
    merged = lakehouse.q_incremental_agg_merge(spark, SF)
    from projet_data_infrastructure_spark.sources.readers import read_table

    orders = read_table(spark, SF, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    full = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"), F.sum(cents).alias("total_cents")
    )
    diff = (
        merged.select("o_custkey", "n_orders", "total_cents")
        .exceptAll(full)
        .unionAll(full.exceptAll(merged.select("o_custkey", "n_orders", "total_cents")))
    )
    assert diff.count() == 0


def test_kmv_exact_path_for_small_groups(spark):
    """Groups with fewer than k distinct values report the exact count."""
    df = spark.createDataFrame(
        [("t", i % 10, i) for i in range(100)], "event_type string, user_id long, event_id long"
    )
    import projet_data_infrastructure_spark.plans.lakehouse as lh

    orig = lh.read_table
    try:
        lh.read_table = lambda sp, sf, name: df
        out = lh.q_kmv_distinct_sketch(spark, SF).collect()
    finally:
        lh.read_table = orig
    assert len(out) == 1
    r = out[0]
    assert r.n_exact == 10
    assert r.kth_min_hash is None
    assert r.est_distinct == 10.0


def test_kmv_estimate_within_tolerance(spark):
    """On the real table the KMV estimate lands within the sketch's standard
    error envelope (~1/sqrt(k-1) ≈ 12.6% at k=64; allow 3σ)."""
    out = lakehouse.q_kmv_distinct_sketch(spark, "/root/testdata/sf0.01").collect()
    assert out, "no groups"
    for r in out:
        if r.kth_min_hash is None:
            assert r.est_distinct == float(r.n_exact)
        else:
            rel = abs(r.est_distinct - r.n_exact) / r.n_exact
            assert rel < 3 / (lakehouse._KMV_K - 1) ** 0.5, (r.event_type, rel)


def test_crossdoc_dup_ngrams_flags_exact_copies(spark):
    """Two verbatim copies of the same 12-token doc share every 8-gram →
    ratio 1.0; an unrelated doc shares none → ratio 0.0."""
    base = " ".join(f"w{i}" for i in range(12))
    other = " ".join(f"z{i}" for i in range(12))
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, other)], "doc_id long, text string"
    )
    import projet_data_infrastructure_spark.plans.llm_queries as lq

    orig = lq.read_table_balanced
    try:
        lq.read_table_balanced = lambda sp, sf, name: df
        out = {r.doc_id: r for r in q_crossdoc_dup_ngrams(spark, SF).collect()}
    finally:
        lq.read_table_balanced = orig
    assert out[1].n_shingles == 5  # 12 tokens → 5 distinct 8-grams
    assert out[1].shared_ratio == 1.0 and out[2].shared_ratio == 1.0
    assert out[3].shared_ratio == 0.0


def test_kmv_set_ops_identical_sets(spark):
    """When both event types map to the SAME user set, the sketch must
    report Jaccard exactly 1.0 and est_intersection == est_union."""
    rows = [(t, u, i) for i, (t, u) in enumerate(
        (t, u) for t in ("click", "purchase") for u in range(200)
    )]
    df = spark.createDataFrame(rows, "event_type string, user_id long, event_id long")
    import projet_data_infrastructure_spark.plans.lakehouse as lh

    orig = lh.read_table
    try:
        lh.read_table = lambda sp, sf, name: df
        r = lh.q_kmv_set_ops(spark, SF).collect()[0]
    finally:
        lh.read_table = orig
    assert r.n_union_exact == 200 and r.n_inter_exact == 200
    assert r.jaccard_est == 1.0
    assert r.est_intersection == r.est_union


def test_kmv_set_ops_disjoint_sets(spark):
    """Disjoint user sets → Jaccard and intersection estimate exactly 0."""
    rows = [("click", u, u) for u in range(100)] + [
        ("purchase", u, 1000 + u) for u in range(500, 600)
    ]
    df = spark.createDataFrame(rows, "event_type string, user_id long, event_id long")
    import projet_data_infrastructure_spark.plans.lakehouse as lh

    orig = lh.read_table
    try:
        lh.read_table = lambda sp, sf, name: df
        r = lh.q_kmv_set_ops(spark, SF).collect()[0]
    finally:
        lh.read_table = orig
    assert r.n_inter_exact == 0
    assert r.jaccard_est == 0.0 and r.est_intersection == 0.0


def test_kmv_set_ops_union_estimate_envelope(spark):
    """On real data the union estimate stays inside 3σ ≈ 3/sqrt(k-1)."""
    import projet_data_infrastructure_spark.plans.lakehouse as lh

    r = lh.q_kmv_set_ops(spark, "/root/testdata/sf0.01").collect()[0]
    if r.est_union != float(r.n_union_exact):  # estimate path only
        rel = abs(r.est_union - r.n_union_exact) / r.n_union_exact
        assert rel < 3 / (lh._KMV_K - 1) ** 0.5, rel


def test_resample_ffill_fills_gaps(spark):
    """User with events at hours 0 and 3 gets a 4-row grid; silent hours 1-2
    carry hour 0's LAST value (deterministic tie-break by ts, event_id)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (7, t0, 1, 1.00),
        (7, t0.replace(minute=30), 2, 2.00),            # later in hour 0 → wins
        (7, t0 + dt.timedelta(hours=3), 3, 9.00),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, event_id long, value double")
    import projet_data_infrastructure_spark.plans.events_queries as eq

    orig = eq.read_table
    try:
        eq.read_table = lambda sp, sf, name: df
        out = sorted(
            eq.q_resample_hourly_ffill(spark, SF).collect(), key=lambda r: r.hour_ts
        )
    finally:
        eq.read_table = orig
    assert [r.filled_cents for r in out] == [200, 200, 200, 900]


def test_countmin_overestimates_only_and_bounds(spark):
    """Count-min guarantees est ≥ exact for every key; with d=4, w=256 and
    N=15000 events over 150 users, the expected overshoot per cell is
    N/w ≈ 59 — assert the classical εN bound with ε = e/w at 3× slack."""
    import math

    import projet_data_infrastructure_spark.plans.lakehouse as lh

    rows = lh.q_countmin_user_counts(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) > 0
    n_total = sum(r.n_exact for r in rows)
    bound = 3 * math.e / lh._CM_WIDTH * n_total
    for r in rows:
        assert r.est_n >= r.n_exact, (r.user_id, r.est_n, r.n_exact)
        assert r.est_n - r.n_exact <= bound, (r.user_id, r.est_n - r.n_exact, bound)


def test_psi_zero_for_identical_populations(spark):
    """Splitting one population uniformly at random-ish by key parity gives
    near-identical distributions → PSI ≈ 0 (well under the 0.1 'stable'
    threshold); and the bucket shares must sum the smoothing correctly
    (contributions finite even for sparse buckets)."""
    import projet_data_infrastructure_spark.plans.lakehouse as lh

    rows = lh.q_psi_drift(spark, "/root/testdata/sf0.01").collect()
    assert rows
    psi = rows[0].psi_total
    assert all(r.psi_total == psi for r in rows)
    import math

    assert all(math.isfinite(r.psi_contrib) for r in rows)
    # nation assignment is hash-uniform over acctbal → distributions agree
    assert psi < 0.1, psi


def test_bloom_no_false_negatives_and_fp_bound(spark):
    """Every true member must be claimed (bloom's hard guarantee); the
    false-positive rate stays within 3x the theoretical (1-e^(-dn/m))^d."""
    import math

    import projet_data_infrastructure_spark.plans.lakehouse as lh

    rows = lh.q_bloom_membership(spark, "/root/testdata/sf0.01").collect()
    members = [r for r in rows if r.is_member]
    non = [r for r in rows if not r.is_member]
    assert members and non
    assert all(r.claimed for r in members), "false negative!"
    n = len(members)
    theo = (1 - math.exp(-lh._BLOOM_D * n / lh._BLOOM_M)) ** lh._BLOOM_D
    fp = sum(r.claimed for r in non) / len(non)
    assert fp <= 3 * theo + 0.01, (fp, theo)


def test_stream_hll_equals_batch_sketch(spark):
    # associative register merge ⇒ the streamed 4-batch sketch is
    # bit-identical to the single-pass batch sketch
    from projet_data_infrastructure_spark.plans.lakehouse import (
        q_hll_distinct_sketch,
        q_stream_hll_cardinality,
    )

    sf = "/root/testdata/sf0.001"
    batch = sorted(map(tuple, q_hll_distinct_sketch(spark, sf).collect()))
    streamed = sorted(map(tuple, q_stream_hll_cardinality(spark, sf).collect()))
    assert streamed == batch


def test_hll_register_merge_is_split_invariant(spark):
    from pyspark.sql import functions as F

    from projet_data_infrastructure_spark.plans.lakehouse import _hll_registers
    from projet_data_infrastructure_spark.sources.readers import read_table

    ev = read_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "event_type"
    )
    whole = sorted(map(tuple, _hll_registers(ev).collect()))
    h1 = ev.filter(F.col("event_id") % 2 == 0)
    h2 = ev.filter(F.col("event_id") % 2 == 1)
    merged = sorted(
        map(
            tuple,
            _hll_registers(h1)
            .unionByName(_hll_registers(h2))
            .groupBy("event_type", "bucket")
            .agg(F.max("m").alias("m"))
            .collect(),
        )
    )
    assert merged == whole
