"""Fixture and replica tests for the mining/stats/retrieval specs.

The DuckDB oracle gate proves cross-engine agreement; these tests pin the
ALGORITHMS themselves: planted-coefficient recovery for the closed-form
OLS, a zero-statistic independence fixture for chi-squared, literal-
recurrence replicas for CUSUM/BFS/Bellman-Ford, brute-force equivalence
for the prefix-filtered similarity join, and the rank-sum identity for
Gini — each an implementation independent of both engines.
"""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from projet_data_infrastructure_spark.plans import mining

SF = "/root/testdata/sf0.001"


def _write_parquet(spark, rows, schema, path):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(path)


def test_ols_recovers_planted_coefficients(spark, tmp_path):
    # price_cents = 300 + 7*qty + 11*disc_pct exactly → the Cramer solve
    # must return the planted betas and R² = 1 with zero tolerance.
    sf = str(tmp_path / "sf")
    line = [
        (1, float(q), d / 100.0, (300 + 7 * q + 11 * d) / 100.0)
        for q in range(1, 11)
        for d in range(10)
    ]
    _write_parquet(
        spark, line, "l_suppkey long, l_quantity double, l_discount double, l_extendedprice double",
        f"{sf}/lineitem.parquet",
    )
    _write_parquet(spark, [(1, 0)], "s_suppkey long, s_nationkey long", f"{sf}/supplier.parquet")
    _write_parquet(spark, [(0, "N0")], "n_nationkey long, n_name string", f"{sf}/nation.parquet")
    row = mining.q_ols_two_feature(spark, sf).collect()[0]
    assert row["n_rows"] == 100
    assert row["beta_qty"] == 7.0
    assert row["beta_disc"] == 11.0
    assert row["intercept"] == 300.0
    assert row["r2"] == 1.0


def test_chi2_zero_on_independent_fixture(spark, tmp_path):
    # Perfectly balanced nation × priority grid ⇒ obs == exp everywhere ⇒
    # the statistic is exactly 0 (and dof = (2-1)(2-1) = 1).
    sf = str(tmp_path / "sf")
    orders, cust = [], []
    k = 0
    for nat in (0, 1):
        for pri in ("1-URGENT", "5-LOW"):
            for _ in range(5):
                orders.append((k, pri))
                cust.append((k, nat))
                k += 1
    _write_parquet(spark, orders, "o_custkey long, o_orderpriority string", f"{sf}/orders.parquet")
    _write_parquet(spark, cust, "c_custkey long, c_nationkey long", f"{sf}/customer.parquet")
    _write_parquet(
        spark, [(0, "NA"), (1, "NB")], "n_nationkey long, n_name string", f"{sf}/nation.parquet"
    )
    row = mining.q_chi2_nation_priority(spark, sf).collect()[0]
    assert row["n_obs"] == 20
    assert row["n_cells"] == 4
    assert row["dof"] == 1
    assert row["chi2"] == 0.0


def test_cusum_matches_literal_recurrence(spark):
    # The two-window closed form must equal S_i = max(0, S_{i-1} + (cnt-k))
    # folded literally per user.
    got = {
        (r["user_id"], r["day"].isoformat()): (r["cnt"], r["cusum"], r["alarm"])
        for r in mining.q_cusum_drift(spark, SF).collect()
    }
    daily = duckdb.sql(
        f"""SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS cnt
            FROM '{SF}/events.parquet' WHERE user_id < {mining._CUSUM_USERS}
            GROUP BY 1, 2 ORDER BY user_id, day"""
    ).fetchall()
    state: dict[int, int] = {}
    for uid, day, cnt in daily:
        s = max(0, state.get(uid, 0) + (cnt - mining._CUSUM_K))
        state[uid] = s
        assert got[(uid, day.isoformat())] == (cnt, s, s >= mining._CUSUM_H)
    assert len(got) == len(daily)


def test_prefix_filter_equals_bruteforce(spark):
    # Prefix filtering must find EXACTLY the pairs the quadratic scan finds
    # (completeness: no candidate pruned below the threshold is ever valid).
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' WHERE doc_id < {mining._PF_MAX_ID}"
    ).fetchall()
    toks = {d: set(t for t in text.split() if t) for d, text in rows}
    ids = sorted(toks)
    expected = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(toks[a] & toks[b])
            if 3 * inter >= len(toks[a]) + len(toks[b]):
                expected.add((a, b))
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in mining.q_prefix_filter_jaccard(spark, SF).collect()
    }
    assert set(got) == expected
    for (a, b), j in got.items():
        inter = len(toks[a] & toks[b])
        exact = inter / (len(toks[a]) + len(toks[b]) - inter)
        assert abs(j - exact) < 1e-3


def _trade_edges_py():
    return duckdb.sql(
        f"""SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
            FROM '{SF}/orders.parquet' o
            JOIN '{SF}/lineitem.parquet' l ON o.o_orderkey = l.l_orderkey"""
    ).fetchall()


def test_bfs_hops_match_python(spark):
    adj: dict[int, set[int]] = {}
    for ck, sk in _trade_edges_py():
        a, b = 2 * ck, 2 * sk + 1
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seeds = duckdb.sql(
        f"SELECT c_custkey FROM '{SF}/customer.parquet' WHERE c_custkey < {mining._BFS_SEED_MAX}"
    ).fetchall()
    visited = {2 * r[0]: 0 for r in seeds}
    frontier = set(visited)
    for hop in range(1, mining._BFS_HOPS + 1):
        nxt = set()
        for node in frontier:
            for nb in adj.get(node, ()):
                if nb not in visited:
                    visited[nb] = hop
                    nxt.add(nb)
        frontier = nxt
    expected = {}
    for node, hop in visited.items():
        n, c = expected.get(hop, (0, 0))
        expected[hop] = (n + 1, c + node)
    got = {
        r["hop"]: (r["n_nodes"], r["node_checksum"])
        for r in mining.q_bfs_khop(spark, SF).collect()
    }
    assert got == expected


def test_bellman_ford_matches_python_relaxation(spark):
    pairs = duckdb.sql(
        f"""SELECT o.o_custkey, l.l_suppkey, count(*) AS cnt
            FROM '{SF}/orders.parquet' o
            JOIN '{SF}/lineitem.parquet' l ON o.o_orderkey = l.l_orderkey
            GROUP BY 1, 2"""
    ).fetchall()
    edges = []
    for ck, sk, cnt in pairs:
        w = max(1, 6 - cnt)
        edges.append((2 * ck, 2 * sk + 1, w))
        edges.append((2 * sk + 1, 2 * ck, w))
    dist = {0: 0}
    for _ in range(mining._BF_ROUNDS):
        nd = dict(dist)
        for s, d, w in edges:
            if s in dist and dist[s] + w < nd.get(d, math.inf):
                nd[d] = dist[s] + w
        dist = nd
    lab = lambda n: ("c" if n % 2 == 0 else "s") + str(n // 2)
    expected = sorted(((d, lab(n)) for n, d in dist.items()))[:20]
    got = [(r["d"], r["node"]) for r in mining.q_bellman_ford(spark, SF).collect()]
    assert got == sorted(got)[: len(got)]
    assert [(d, n) for d, n in got] == expected


def test_gini_rank_sum_identity(spark):
    cents = [
        r[0]
        for r in duckdb.sql(
            f"""SELECT CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
                FROM '{SF}/orders.parquet' GROUP BY o_custkey"""
        ).fetchall()
    ]
    xs = sorted(cents)
    n, sx = len(xs), sum(xs)
    srx = sum((i + 1) * x for i, x in enumerate(xs))
    expected = (2.0 * srx) / (n * float(sx)) - (n + 1.0) / n
    row = mining.q_gini_revenue(spark, SF).collect()[0]
    assert row["n_customers"] == n
    assert row["total_cents"] == sx
    assert abs(row["gini"] - expected) < 1e-4
    assert 0.0 <= row["gini"] < 1.0


def test_rrf_score_is_reciprocal_rank_sum(spark):
    rows = mining.q_rrf_fusion(spark, SF).collect()
    assert rows, "fusion returned nothing"
    for r in rows:
        exp = 0.0
        if r["rank_tf"] is not None:
            exp += 1.0 / (mining._RRF_K + r["rank_tf"])
        if r["rank_norm"] is not None:
            exp += 1.0 / (mining._RRF_K + r["rank_norm"])
        assert abs(r["rrf"] - exp) < 1e-5
    scores = [r["rrf"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_kmeans_recovers_planted_clusters(spark, tmp_path):
    # Four well-separated planted clusters, seeds 0..3 one per cluster →
    # after 2 rounds every point must sit with its planted center and the
    # per-cluster id checksums are fully determined.
    sf = str(tmp_path / "sf")
    dim = 8
    rows = []
    for c in range(4):
        center = [float(10 * c)] * dim
        for j in range(10):
            vid = c + 4 * j  # vec_ids interleaved so seeds are 0,1,2,3
            jitter = [(0.001 * ((vid + d) % 5)) for d in range(dim)]
            rows.append((vid, [center[d] + jitter[d] for d in range(dim)]))
    _write_parquet(spark, rows, "vec_id long, embedding array<float>", f"{sf}/embeddings.parquet")
    got = {r["cl"]: (r["n_points"], r["id_checksum"]) for r in
           mining.q_kmeans_fixed_point(spark, sf).collect()}
    expected = {}
    for c in range(4):
        ids = [c + 4 * j for j in range(10)]
        expected[c] = (10, sum(ids))
    assert got == expected


def test_span_corruption_reconstructs_original(spark):
    # Substituting each <Xk> sentinel in input_text with its hidden tokens
    # from target_text must reproduce the original document exactly —
    # lossless denoising pairs, span ordinals consistent on both sides.
    import re

    rows = {r["doc_id"]: r for r in mining.q_span_corruption(spark, SF).collect()}
    orig = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{SF}/documents.parquet' WHERE doc_id < {mining._SC_MAX_ID}"
        ).fetchall()
    )
    assert set(rows) == set(orig)
    for doc_id, r in rows.items():
        spans: dict[str, list[str]] = {}
        cur = None
        for tok in r["target_text"].split():
            if re.fullmatch(r"<X\d+>", tok):
                cur = tok
                spans[cur] = []
            else:
                assert cur is not None
                spans[cur].append(tok)
        rebuilt = []
        for tok in r["input_text"].split():
            if re.fullmatch(r"<X\d+>", tok):
                rebuilt.extend(spans.pop(tok))
            else:
                rebuilt.append(tok)
        assert not spans, f"doc {doc_id}: unused target spans {list(spans)}"
        assert rebuilt == orig[doc_id].split(), f"doc {doc_id} reconstruction mismatch"
        assert r["n_tokens"] == len(orig[doc_id].split())


def test_attribution_linear_conserves_last_touch_total(spark):
    """Linear and last-touch attribute the SAME qualifying purchases (>=1
    deduped view in the 2 h lookback), so total allocated cents must be
    identical — the equal-credit split only redistributes between
    campaigns, never creates or destroys revenue."""
    last = mining.q_attribution_last_touch(spark, SF).collect()
    lin = mining.q_attribution_linear(spark, SF).collect()
    assert sum(r["attributed_cents"] for r in lin) == sum(
        r["attributed_cents"] for r in last
    )
    # linear fans out over touches: at least as many rows credited
    assert sum(r["n_touches"] for r in lin) >= sum(r["n_purchases"] for r in last)
