"""Semantics tests for the frequency/membership sketches (Count-Min, Bloom)
and the Adamic-Adar link predictor: pure-Python reference parity, the CMS
one-sided-error guarantee, the Bloom zero-false-negative guarantee, and
no-nested-loop plan shapes."""

import hashlib
import math
from collections import defaultdict

import projet_data_infrastructure_spark.plans.graph_geo as gg
import projet_data_infrastructure_spark.plans.sketches as sk
from projet_data_infrastructure_spark.operators.scale import explain_has

SF = "/root/testdata/sf0.001"


def _h(seed, key):
    """Python replica of the seeded portable hash."""
    return int(hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:15], 16)


# --------------------------------------------------------------------------
# Count-Min
# --------------------------------------------------------------------------


def test_countmin_matches_python_reference_and_overestimates(spark):
    rows = sk.q_countmin_heavy_hitters(spark, SF).collect()
    # replica sketch over the same column
    ev = spark.read.parquet(f"{SF}/events.parquet").select("user_id").collect()
    regs = defaultdict(int)
    exact = defaultdict(int)
    for r in ev:
        exact[r.user_id] += 1
        for s in range(sk._CMS_D):
            regs[(s, _h(s, r.user_id) % sk._CMS_W)] += 1
    assert len(rows) == min(sk._CMS_TOPK, len(exact))
    for r in rows:
        want = min(regs[(s, _h(s, r.user_id) % sk._CMS_W)] for s in range(sk._CMS_D))
        assert r.n_est == want, r
        assert r.n_exact == exact[r.user_id]
        # the CMS guarantee: collisions only ever ADD
        assert r.overcount >= 0 and r.n_est >= r.n_exact
    # rows are the true top-k by exact count (desc, id asc)
    top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[: sk._CMS_TOPK]
    assert [(r.user_id, r.n_exact) for r in rows] == top


def test_countmin_probe_joins_are_broadcast(spark):
    checks = explain_has(
        sk.q_countmin_heavy_hitters(spark, SF),
        "BroadcastHashJoin",
        "SortMergeJoin",
        "CartesianProduct",
    )
    # the <=1024-row register table must broadcast under the probe keys;
    # a sort-merge join would shuffle the probe side for nothing
    assert checks["BroadcastHashJoin"]
    assert not checks["SortMergeJoin"]
    assert not checks["CartesianProduct"]


# --------------------------------------------------------------------------
# Bloom
# --------------------------------------------------------------------------


def test_bloom_audit_no_false_negatives_and_consistent_counts(spark):
    row = sk.q_bloom_membership_audit(spark, SF).collect()[0]
    assert row.n_false_negative == 0
    assert row.n_bloom_positive == row.n_members + row.n_false_positive
    assert row.n_queries >= row.n_bloom_positive >= row.n_members > 0


def test_bloom_crafted_members_always_positive(spark, monkeypatch):
    orders = spark.createDataFrame(
        [(i, k) for i, k in enumerate([1, 2, 3, 3])],
        "o_orderkey long, o_custkey long",
    )
    cust = spark.createDataFrame([(k,) for k in range(1, 11)], "c_custkey long")
    monkeypatch.setattr(
        sk,
        "read_table",
        lambda sp, sf, name: {"orders": orders, "customer": cust}[name],
        raising=True,
    )
    row = sk.q_bloom_membership_audit(spark, SF).collect()[0]
    assert row.n_queries == 10
    assert row.n_members == 3
    assert row.n_false_negative == 0  # members 1-3 MUST be positive
    # with 9 bits set in 16384 the 7 non-members are ~surely negative
    assert row.n_false_positive == 0


# --------------------------------------------------------------------------
# Adamic-Adar
# --------------------------------------------------------------------------


def _aa_reference(pairs, cap):
    """The exact quantized recurrence the operator claims, in plain Python."""
    deg = defaultdict(int)
    for c, _s in pairs:
        deg[c] += 1
    w = {
        c: math.floor(1_000_000.0 / math.log(d) + sk_qbias())
        for c, d in deg.items()
        if 2 <= d <= cap
    }
    scores = defaultdict(lambda: [0, 0])
    by_c = defaultdict(list)
    for c, s in pairs:
        if c in w:
            by_c[c].append(s)
    for c, ss in by_c.items():
        ss = sorted(ss)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                cell = scores[(ss[i], ss[j])]
                cell[0] += 1
                cell[1] += w[c]
    return scores


def sk_qbias():
    return gg._AA_QBIAS


def test_adamic_adar_matches_python_reference(spark, monkeypatch):
    # suppliers 10,20 share low-degree customers 1,2; customer 3 is a hub
    # above the cap and must contribute nothing
    trade = [
        (1, 10), (1, 20),
        (2, 10), (2, 20), (2, 30),
        (3, 10), (3, 20), (3, 30), (3, 40),
    ]
    orders = spark.createDataFrame(
        [(i, c) for i, (c, _s) in enumerate(trade)], "o_orderkey long, o_custkey long"
    )
    line = spark.createDataFrame(
        [(i, s) for i, (_c, s) in enumerate(trade)], "l_orderkey long, l_suppkey long"
    )
    monkeypatch.setattr(
        gg, "read_table", lambda sp, sf, name: {"orders": orders, "lineitem": line}[name],
        raising=True,
    )
    monkeypatch.setattr(gg, "_AA_DEG_CAP", 3, raising=True)
    got = {
        (r.s1, r.s2): (r.n_common, r.aa_unats)
        for r in gg.q_adamic_adar_links(spark, SF).collect()
    }
    want = {k: tuple(v) for k, v in _aa_reference(trade, cap=3).items()}
    assert got == want
    # customers 1 (deg 2) and 2 (deg 3) both link 10-20; hub 3 is excluded
    assert got[(10, 20)][0] == 2


def test_adamic_adar_plan_is_equi_join(spark):
    checks = explain_has(
        gg.q_adamic_adar_links(spark, SF),
        "CartesianProduct",
        "BroadcastNestedLoopJoin",
    )
    # the pair generator must stay an equi-join on the customer key —
    # a nested-loop form would be the quadratic all-pairs shape
    assert not checks["CartesianProduct"]
    assert not checks["BroadcastNestedLoopJoin"]


def test_stream_countmin_equals_batch_sketch(spark):
    # additive register merge ⇒ the streamed 4-batch sketch is
    # bit-identical to the single-pass batch sketch
    batch = sorted(map(tuple, sk.q_countmin_heavy_hitters(spark, SF).collect()))
    streamed = sorted(map(tuple, sk.q_stream_countmin_merge(spark, SF).collect()))
    assert streamed == batch


def test_cms_register_merge_is_split_invariant(spark):
    from pyspark.sql import functions as F
    from projet_data_infrastructure_spark.sources.readers import read_table

    ev = read_table(spark, SF, "events").select("user_id")
    whole = {
        (r.s, r.bucket): r.cnt for r in sk._cms_registers(ev).collect()
    }
    # split the stream arbitrarily, sketch each half, merge by addition
    a = sk._cms_registers(ev.filter(F.col("user_id") % 2 == 0))
    b = sk._cms_registers(ev.filter(F.col("user_id") % 2 == 1))
    merged = (
        a.unionByName(b).groupBy("s", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    got = {(r.s, r.bucket): r.cnt for r in merged.collect()}
    assert got == whole


def test_phash_and_zipf_plan_gates(spark):
    from projet_data_infrastructure_spark.plans.extras import (
        q_multimodal_phash_neardup,
    )
    from projet_data_infrastructure_spark.plans.learning import q_zipf_fit_slope

    checks = explain_has(
        q_multimodal_phash_neardup(spark, SF),
        "CartesianProduct",
        "BroadcastNestedLoopJoin",
    )
    # band candidates must come from equi-joins, never an all-pairs scan
    assert not checks["CartesianProduct"]
    assert not checks["BroadcastNestedLoopJoin"]

    plan = (
        q_zipf_fit_slope(spark, SF)._jdf.queryExecution().executedPlan().toString()
    )
    # the vocabulary cut must plan as TakeOrdered (every task keeps 1000
    # rows), not a global sort of the word-count table
    assert "TakeOrderedAndProject" in plan
