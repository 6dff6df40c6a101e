"""Semantics tests for the graph/geo/basket specs: fixed-point PageRank vs a
pure-Python reference recurrence, blocked geo pairs vs brute force, HLL
estimate accuracy, Benford share algebra, basket pair multiplicity."""

from collections import defaultdict

import pyspark.sql.functions as F

import projet_data_infrastructure_spark.plans.graph_geo as gg
from projet_data_infrastructure_spark.plans.lakehouse import q_hll_distinct_sketch

SF = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


def _pr_reference(edges):
    """The exact integer recurrence the operator claims, in plain Python."""
    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    ranks = {n: 1_000_000 for n in deg}
    for _ in range(gg._PR_ITERS):
        inc = defaultdict(int)
        for s, d in edges:
            inc[d] += ranks[s] // deg[s]
        ranks = {n: 150_000 + (85 * inc.get(n, 0)) // 100 for n in deg}
    return ranks


def _with_tables(monkeypatch, tables):
    monkeypatch.setattr(
        gg, "read_table", lambda sp, sf, name: tables[name], raising=True
    )


def test_pagerank_matches_python_reference(spark, monkeypatch):
    orders = spark.createDataFrame(
        [(100, 1), (101, 2), (102, 3), (103, 1)], "o_orderkey long, o_custkey long"
    )
    line = spark.createDataFrame(
        [(100, 10), (100, 20), (101, 10), (102, 10), (103, 20)],
        "l_orderkey long, l_suppkey long",
    )
    _with_tables(monkeypatch, {"orders": orders, "lineitem": line})
    got = {r.node: r.pr_score for r in gg.q_pagerank_fixed_point(spark, SF).collect()}
    pairs = [("c1", "s10"), ("c1", "s20"), ("c2", "s10"), ("c3", "s10")]
    edges = pairs + [(b, a) for a, b in pairs]
    assert got == _pr_reference(edges)
    # hub supplier s10 (degree 3) must outrank the leaf customers
    assert got["s10"] == max(got.values())


def test_pagerank_partition_invariant(spark):
    a = gg.q_pagerank_fixed_point(spark, SF).collect()
    # integer fixed-point arithmetic owes bit-identical results under any
    # physical partitioning; re-run under a different shuffle width
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = gg.q_pagerank_fixed_point(spark, SF).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b


def test_geo_blocked_pairs_equal_bruteforce(spark):
    blocked = {
        (r.cust_a, r.cust_b, r.d2)
        for r in gg.q_geo_cell_neighbor_pairs(spark, SF).collect()
    }
    pts = gg._geo_points(spark, SF)
    b = pts.select(
        F.col("c_custkey").alias("cust_b"),
        F.col("lat_m").alias("lat_b"),
        F.col("lon_m").alias("lon_b"),
    )
    d2 = (F.col("lat_m") - F.col("lat_b")) * (F.col("lat_m") - F.col("lat_b")) + (
        F.col("lon_m") - F.col("lon_b")
    ) * (F.col("lon_m") - F.col("lon_b"))
    brute = {
        (r.cust_a, r.cust_b, r.d2)
        for r in pts.crossJoin(b)
        .filter(F.col("c_custkey") < F.col("cust_b"))
        .withColumn("d2", d2)
        .filter(F.col("d2") <= gg._GEO_RADIUS_MILLI**2)
        .select(F.col("c_custkey").alias("cust_a"), "cust_b", "d2")
        .collect()
    }
    assert blocked == brute
    assert len(blocked) > 0


def test_hll_estimate_within_expected_error(spark):
    rows = q_hll_distinct_sketch(spark, SF_CORRECT).collect()
    assert len(rows) == 5
    for r in rows:
        # sigma ~ 1.04/sqrt(64) = 13%; allow 3 sigma
        assert abs(r.est_distinct - r.n_exact) / r.n_exact < 0.40, r
        # n >> 2.5m here, so most registers must be occupied
        assert r.n_empty_registers <= 2, r


def test_benford_shares_sum_to_one(spark):
    rows = gg.q_benford_digit_profile(spark, SF).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    assert abs(sum(r.observed for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.expected for r in rows) - 1.0) < 1e-4


def test_benford_matches_python_reference(spark):
    # r15 fixture-audit hand sample: the sum-to-one test above is a property
    # check, not an independent expectation — this one recomputes the whole
    # profile from the raw parquet in plain Python (the audit's standard).
    import math
    from collections import Counter

    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/orders.parquet", columns=["o_totalprice"])
    cnt = Counter()
    for p in t.column("o_totalprice").to_pylist():
        cents = int(math.floor(p * 100 + 0.5))
        cnt[int(str(cents)[0])] += 1
    total = sum(cnt.values())

    def py_pround(x, n=6):
        return math.floor(x * 10**n + 0.5) / 10**n

    rows = gg.q_benford_digit_profile(spark, SF).collect()
    assert [r.digit for r in rows] == sorted(cnt)
    for r in rows:
        assert r.n == cnt[r.digit], r
        assert r.observed == py_pround(cnt[r.digit] / total), r
        assert r.deviates == (abs(cnt[r.digit] / total - r.expected) > 0.02), r


def test_copurchase_counts_each_order_once(spark, monkeypatch):
    line = spark.createDataFrame(
        # order 1 buys brands A, A, B, C (A twice); order 2 buys A, B
        [(1, 11), (1, 12), (1, 20), (1, 30), (2, 11), (2, 20)],
        "l_orderkey long, l_partkey long",
    )
    part = spark.createDataFrame(
        [(11, "A"), (12, "A"), (20, "B"), (30, "C")], "p_partkey long, p_brand string"
    )
    _with_tables(monkeypatch, {"lineitem": line, "part": part})
    got = {
        (r.brand_a, r.brand_b): r.n_orders
        for r in gg.q_copurchase_brand_pairs(spark, SF).collect()
    }
    assert got == {("A", "B"): 2, ("A", "C"): 1, ("B", "C"): 1}


def test_triangle_count_k4_complete_graph(spark, monkeypatch):
    # 4 suppliers all serving one customer -> K4: 6 edges, 4 triangles
    orders = spark.createDataFrame([(1, 100)], "o_orderkey long, o_custkey long")
    line = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 3), (1, 4)], "l_orderkey long, l_suppkey long"
    )
    _with_tables(monkeypatch, {"orders": orders, "lineitem": line})
    monkeypatch.setattr(gg, "_TRI_KEEP_MOD", 1)  # disable sparsification
    row = gg.q_triangle_count(spark, SF).collect()[0]
    assert (row.n_edges_sampled, row.n_triangles) == (6, 4)
    assert row.doulion_estimate == 4.0


def test_triangle_count_matches_id_ordered_bruteforce(spark):
    import pyspark.sql.functions as FF

    row = gg.q_triangle_count(spark, SF).collect()[0]
    # rebuild the sampled edge set and count with the naive a<b<c triple join
    orders = gg.read_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    line = gg.read_table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
    serves = (
        orders.join(line, orders.o_orderkey == line.l_orderkey)
        .select(FF.col("o_custkey").alias("ck"), FF.col("l_suppkey").alias("sk"))
        .distinct()
    )
    b = serves.select(FF.col("ck").alias("ck2"), FF.col("sk").alias("sk2"))
    from projet_data_infrastructure_spark.functions.hashing import hash64

    key = FF.concat(
        FF.col("a").cast("string"), FF.lit(":"), FF.col("b").cast("string")
    )
    edges = (
        serves.join(b, (serves.ck == b.ck2) & (serves.sk < b.sk2))
        .select(FF.col("sk").alias("a"), FF.col("sk2").alias("b"))
        .distinct()
        .filter(FF.pmod(hash64(key, seed=77), FF.lit(gg._TRI_KEEP_MOD)) == 0)
    )
    e1 = edges
    e2 = edges.select(FF.col("a").alias("b_"), FF.col("b").alias("c_"))
    e3 = edges.select(FF.col("a").alias("a3"), FF.col("b").alias("c3"))
    naive = (
        e1.join(e2, e1.b == e2.b_)
        .join(e3, (FF.col("a") == FF.col("a3")) & (FF.col("c_") == FF.col("c3")))
        .count()
    )
    assert row.n_triangles == naive
    assert row.n_edges_sampled == edges.count()


def test_grid_dbscan_separated_blocks_and_noise(spark, monkeypatch):
    # two dense blocks far apart + isolated noise points
    rows = []
    # block A: 6 points in cell (0,0); block B: 5 points in cell (10,10)
    rows += [(i, 100 + i, 100 + i) for i in range(6)]
    rows += [(10 + i, 5100 + i, 5100 + i) for i in range(5)]
    # noise: 3 points alone in distinct far cells (below minPts)
    rows += [(100, 9900, 100), (101, 100, 9900), (102, 9900, 9900)]
    pts = spark.createDataFrame(rows, "c_custkey long, lat_m long, lon_m long")
    monkeypatch.setattr(gg, "_geo_points", lambda sp, sf: pts)
    out = {r.cluster: (r.n_cells, r.n_points) for r in gg.q_geo_grid_dbscan(spark, SF).collect()}
    # cell ids: (0,0) -> 0; (10,10) -> 1010; noise cells never appear
    assert out == {0: (1, 6), 1010: (1, 5)}


def test_grid_dbscan_adjacent_cells_merge(spark, monkeypatch):
    # two dense cells sharing a corner merge into one cluster
    rows = [(i, 400 + i, 400 + i) for i in range(4)]          # cell (0,0)
    rows += [(10 + i, 600 + i, 600 + i) for i in range(4)]    # cell (1,1)
    pts = spark.createDataFrame(rows, "c_custkey long, lat_m long, lon_m long")
    monkeypatch.setattr(gg, "_geo_points", lambda sp, sf: pts)
    out = {r.cluster: (r.n_cells, r.n_points) for r in gg.q_geo_grid_dbscan(spark, SF).collect()}
    assert out == {0: (2, 8)}


# --------------------------------------------------------------------------
# k-core peel + HITS
# --------------------------------------------------------------------------


def test_kcore_peels_pendant_and_keeps_core(spark, monkeypatch):
    # complete bipartite 3×3 (all degrees 3 → stable core) plus a pendant
    # customer c4–s1 that peels in round 1 (s1 drops 4→3, stays)
    orders = spark.createDataFrame(
        [(100 + i, i + 1) for i in range(3)] + [(200, 4)],
        "o_orderkey long, o_custkey long",
    )
    li_rows = [(100 + c, s + 1) for c in range(3) for s in range(3)] + [(200, 1)]
    line = spark.createDataFrame(li_rows, "l_orderkey long, l_suppkey long")
    # customer/supplier only feed the |V| broadcast-switch bound (metadata
    # counts), not the edge derivation
    cust = spark.createDataFrame([(i + 1,) for i in range(4)], "c_custkey long")
    supp = spark.createDataFrame([(i + 1,) for i in range(3)], "s_suppkey long")
    _with_tables(
        monkeypatch,
        {"orders": orders, "lineitem": line, "customer": cust, "supplier": supp},
    )
    monkeypatch.setattr(gg, "_KCORE_K", 3, raising=True)
    out = {r.round: (r.n_nodes, r.node_checksum) for r in
           gg.q_kcore_decomposition(spark, SF).collect()}
    core = [2, 4, 6, 3, 5, 7]  # c1,c2,c3 → 2k; s1,s2,s3 → 2k+1
    assert out[1] == (6, sum(core))
    assert out[2] == (6, sum(core))
    assert out[3] == (6, sum(core))


def test_kcore_fully_peels_sparse_graph(spark, monkeypatch):
    # a single path c1–s1–c2: every degree ≤ 2 < k → empty after round 1
    orders = spark.createDataFrame([(100, 1), (101, 2)], "o_orderkey long, o_custkey long")
    line = spark.createDataFrame([(100, 1), (101, 1)], "l_orderkey long, l_suppkey long")
    cust = spark.createDataFrame([(1,), (2,)], "c_custkey long")
    supp = spark.createDataFrame([(1,)], "s_suppkey long")
    _with_tables(
        monkeypatch,
        {"orders": orders, "lineitem": line, "customer": cust, "supplier": supp},
    )
    monkeypatch.setattr(gg, "_KCORE_K", 3, raising=True)
    out = {r.round: (r.n_nodes, r.node_checksum) for r in
           gg.q_kcore_decomposition(spark, SF).collect()}
    assert out == {1: (0, 0), 2: (0, 0), 3: (0, 0)}


def _hits_reference(pairs, iters=2, unit=1_000_000):
    """The exact integer recurrence q_hits_authorities claims."""
    from collections import defaultdict

    auth = defaultdict(int)
    for c, s in pairs:
        auth[s] += unit
    for it in range(iters):
        m = max(auth.values())
        authn = {s: (a * unit) // m for s, a in auth.items()}
        if it == iters - 1:
            return authn
        hub = defaultdict(int)
        for c, s in pairs:
            hub[c] += authn[s]
        mh = max(hub.values())
        hubn = {c: (h * unit) // mh for c, h in hub.items()}
        auth = defaultdict(int)
        for c, s in pairs:
            auth[s] += hubn[c]
    return auth


def test_hits_matches_python_reference(spark, monkeypatch):
    orders = spark.createDataFrame(
        [(100, 1), (101, 2), (102, 3), (103, 1)], "o_orderkey long, o_custkey long"
    )
    line = spark.createDataFrame(
        [(100, 10), (100, 20), (101, 10), (102, 10), (103, 30)],
        "l_orderkey long, l_suppkey long",
    )
    # r15: the |V| bound now comes from the dimension tables (metadata-only
    # counts); the crafted graph must ship them too. Only the COUNT matters
    # (it sizes the broadcast/shuffle switch), not the rows.
    cust = spark.createDataFrame([(1,), (2,), (3,)], "c_custkey long")
    supp = spark.createDataFrame([(10,), (20,), (30,)], "s_suppkey long")
    _with_tables(
        monkeypatch,
        {"orders": orders, "lineitem": line, "customer": cust, "supplier": supp},
    )
    got = {r.node: r.authority_micro for r in gg.q_hits_authorities(spark, SF).collect()}
    ref = _hits_reference([(1, 10), (1, 20), (2, 10), (3, 10), (1, 30)])
    assert got == {f"s{s}": a for s, a in ref.items()}
    # s10 (indegree 3, all hubs point at it) is the max authority
    assert got["s10"] == 1_000_000


def test_apriori_triples_on_crafted_baskets(spark, monkeypatch):
    # orders 1-3 contain {A,B,C}; order 4 contains {A,B} only → with
    # minsup=2: triple (A,B,C) support 3; no other triple exists
    line_rows = []
    parts = [(10, "A"), (11, "B"), (12, "C")]
    for o in (100, 101, 102):
        line_rows += [(o, 10), (o, 11), (o, 12)]
    line_rows += [(103, 10), (103, 11)]
    line = spark.createDataFrame(line_rows, "l_orderkey long, l_partkey long")
    part = spark.createDataFrame(parts, "p_partkey long, p_brand string")
    _with_tables(monkeypatch, {"lineitem": line, "part": part})
    out = [(r.brand_a, r.brand_b, r.brand_c, r.support)
           for r in gg.q_frequent_triples(spark, SF).collect()]
    assert out == [("A", "B", "C", 3)]


def test_apriori_prune_kills_pairwise_only_combos(spark, monkeypatch):
    # A,B / B,C / A,C each co-occur in 2 separate orders but never all
    # three together → F2 holds all three pairs, C3 generates (A,B,C),
    # but triple support is 0 → empty result
    line_rows = [(100, 10), (100, 11), (101, 11), (101, 12),
                 (102, 10), (102, 12), (103, 10), (103, 11),
                 (104, 11), (104, 12), (105, 10), (105, 12)]
    line = spark.createDataFrame(line_rows, "l_orderkey long, l_partkey long")
    part = spark.createDataFrame(
        [(10, "A"), (11, "B"), (12, "C")], "p_partkey long, p_brand string"
    )
    _with_tables(monkeypatch, {"lineitem": line, "part": part})
    assert gg.q_frequent_triples(spark, SF).collect() == []
