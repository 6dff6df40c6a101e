"""Round-13 independent fixtures, batch C: closing the PLAN-ONLY residue.

After the r13 ratchet closed the mirrored-only class at zero, 26 specs
remained "plan-only" — their plan shape is gated in test_plans_quality.py
but their VALUES had no third-way proof beyond the two-engine hash. This
file promotes them: every expectation is computed DEFINITIONALLY in pure
Python over the raw sf0.001 parquet (pyarrow) — dict folds, literal
nested-loop joins, brute-force scans — and compared against the REGISTERED
Spark builder, same discipline as tests/test_independent_fixtures*.py.

Float discipline: keys/counts exact; quantized (pround) values allow
±1.5 ulp-of-the-quantizer (fsum vs distributed pairwise summation).
"""

import math
import re
from collections import defaultdict
from datetime import datetime

import pyarrow.parquet as pq
import pytest

from projet_data_infrastructure_spark.plans.registry import queries_map

SF = "/root/testdata/sf0.001"
_RUN = None


def run(spark, name):
    global _RUN
    if _RUN is None:
        _RUN = queries_map()
    return _RUN[name](spark, SF).collect()


def pr(x: float, n: int = 2) -> float:
    """Mirror of plans/_portable.pround: floor(x*s + 0.5 + 1e-5)/s."""
    scale = float(10**n)
    return math.floor(x * scale + 0.50001) / scale


def ok(got, exp, n: int = 2) -> bool:
    if got is None or exp is None:
        return got is None and exp is None
    return abs(got - exp) <= 1.5 / 10**n


def _rows(table: str, cols: list[str]) -> list[tuple]:
    t = pq.read_table(f"{SF}/{table}.parquet", columns=cols)
    return list(zip(*[t.column(c).to_pylist() for c in cols]))


@pytest.fixture(scope="module")
def cust():
    return _rows("customer", ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"])


@pytest.fixture(scope="module")
def orders():
    return _rows(
        "orders",
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"],
    )


@pytest.fixture(scope="module")
def lineitem():
    return _rows(
        "lineitem",
        ["l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"],
    )


@pytest.fixture(scope="module")
def docs():
    return _rows("documents", ["doc_id", "text", "lang", "source"])


@pytest.fixture(scope="module")
def events():
    return _rows("events", ["event_id", "ts", "user_id", "event_type", "value"])


# ------------------------------------------------- relational stratum


def test_scan_project_literal(spark, cust):
    exp = sorted((k, n, m) for k, n, _nk, _b, m in cust)
    got = sorted((r.c_custkey, r.c_name, r.c_mktsegment) for r in run(spark, "scan_project"))
    assert got == exp


def test_filter_pushdown_literal(spark, lineitem):
    cut = datetime(1998, 1, 1)
    exp = sorted(
        (ok_, ln, q, sd) for ok_, ln, q, sd in lineitem if q <= 5 and sd >= cut
    )
    got = sorted(
        (r.l_orderkey, r.l_linenumber, r.l_quantity, r.l_shipdate)
        for r in run(spark, "filter_pushdown")
    )
    assert got == exp
    assert len(got) > 0  # non-degenerate at sf0.001


def test_inner_join_enrich_literal(spark, cust, orders):
    dim = {k: (n, m) for k, n, _nk, _b, m in cust}
    exp = sorted(
        (okey, ck, dim[ck][0], dim[ck][1], price)
        for okey, ck, _st, price, _d, _p in orders
        if ck in dim
    )
    got = sorted(
        (r.o_orderkey, r.o_custkey, r.c_name, r.c_mktsegment, r.o_totalprice)
        for r in run(spark, "inner_join_enrich")
    )
    assert got == exp


def test_orderby_limit_literal(spark, orders):
    exp = sorted(
        ((okey, price) for okey, _ck, _st, price, _d, _p in orders),
        key=lambda t: (-t[1], t[0]),
    )[:25]
    got = [(r.o_orderkey, r.o_totalprice) for r in run(spark, "orderby_limit")]
    # builder returns in its own order; the top-25 SET and the ordering
    # are both part of the definition
    assert [(k, p) for k, p in got] == exp


def test_topk_groups_literal(spark, orders):
    cnt = defaultdict(int)
    for _okey, _ck, _st, _price, _d, prio in orders:
        cnt[prio] += 1
    exp = sorted(cnt.items(), key=lambda t: (-t[1], t[0]))[:3]
    got = [(r[0], r[1]) for r in run(spark, "topk_groups")]
    assert got == [(g, c) for g, c in exp]


def test_window_rank_literal(spark, orders):
    by_cust = defaultdict(list)
    for okey, ck, _st, price, _d, _p in orders:
        by_cust[ck].append((price, okey))
    exp = []
    for ck, rows in by_cust.items():
        rows.sort(key=lambda t: (-t[0], t[1]))
        rnk_of = {}
        for i, (price, okey) in enumerate(rows, start=1):
            # rank(): ties share the first row number; (price, okey) is
            # unique so rank == row_number, but compute it definitionally
            key = (price,)
            if key not in rnk_of:
                rnk_of[key] = i
            if i <= 3:
                exp.append((ck, okey, price, i, rnk_of[key]))
    got = sorted(
        (r.o_custkey, r.o_orderkey, r.o_totalprice, r.rn, r.rnk)
        for r in run(spark, "window_rank")
    )
    assert got == sorted(exp)


def test_flagship_bonus_literal(spark, cust, orders):
    stats = defaultdict(lambda: [0, 0.0])
    for _okey, ck, _st, price, _d, _p in orders:
        stats[ck][0] += 1
        stats[ck][1] += price
    exp = {}
    for ck, name, _nk, bal, seg in cust:
        is_valid = bal > 0
        dist = pr(abs(bal) / 10.0)
        if ck in stats:
            n, tot = stats[ck]
            cnt, mean = n, pr(tot / n)
        else:
            cnt, mean = None, None
        prime = pr(bal * 0.05) if is_valid else 0.0
        exp[ck] = (
            seg, bal, is_valid, dist, cnt, mean, prime,
            (cnt or 0) >= 15, bal + prime,
        )
    rows = run(spark, "flagship_bonus")
    assert len(rows) == len(exp)
    for r in rows:
        seg, bal, is_valid, dist, cnt, mean, prime, act, total = exp[r.c_custkey]
        assert r.c_mktsegment == seg
        assert r.gross_salary == bal
        assert r.is_valid == is_valid
        assert ok(r.calculed_distance, dist)
        assert r.count_activity == cnt
        assert ok(r.mean_duration, mean)
        assert ok(r.commute_prime, prime)
        assert r.is_valid_activities == act
        assert ok(r.total_salary, total, n=6)


# --------------------------------------------------- events / documents


def test_cdc_envelope_parse_literal(spark, events):
    exp = sorted(
        (
            eid,
            uid,
            math.floor(v * 100 + 0.5),
            "c",
            # timestamp[us] interpreted UTC -> unix millis floors
            (ts - datetime(1970, 1, 1)) // __import__("datetime").timedelta(milliseconds=1),
        )
        for eid, ts, uid, _et, v in events
    )
    got = sorted(
        (r.id, r.user_id, r.value_cents, r.op, r.ts_ms)
        for r in run(spark, "cdc_envelope_parse")
    )
    assert got == exp


_EN_STOP = {"the", "a", "and", "of", "is"}


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.strip(), flags=re.ASCII) if t]


def test_text_stats_literal(spark, docs):
    exp = {}
    for doc_id, text, _lang, _src in docs:
        tk = _toks(text)
        n_tok, n_chars = len(tk), len(text)
        punct = len(re.sub(r"[a-z0-9\s]", "", text.lower(), flags=re.ASCII))
        stop = sum(1 for t in tk if t in _EN_STOP)
        exp[doc_id] = (
            n_tok,
            n_chars,
            pr(sum(len(t) for t in tk) / max(n_tok, 1), 4),
            pr(punct / max(n_chars, 1), 4),
            pr(stop / max(n_tok, 1), 4),
        )
    rows = run(spark, "text_stats")
    assert len(rows) == len(exp)
    for r in rows:
        n_tok, n_chars, avg_len, punct_r, stop_r = exp[r.doc_id]
        assert r.n_tokens == n_tok
        assert r.n_chars_measured == n_chars
        assert ok(r.avg_token_len, avg_len, n=4)
        assert ok(r.punct_ratio, punct_r, n=4)
        assert ok(r.stopword_ratio, stop_r, n=4)


# ------------------------------------------------ joins / calendar / RFM


def _ntile(rank: int, n: int, n_total: int) -> int:
    q, rem = divmod(n_total, n)
    if q == 0:
        return rank
    boundary = rem * (q + 1)
    if rank <= boundary:
        return (rank + q) // (q + 1)
    return rem + (rank - boundary + q - 1) // q


def test_bucketed_join_colocated_literal(spark):
    li = _rows("lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    od = {okey: prio for okey, _ck, _st, _pr, _d, prio in _rows(
        "orders",
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"],
    )}
    groups = defaultdict(list)
    for okey, ep, disc in li:
        if okey in od:
            groups[od[okey]].append(ep * (1 - disc))
    exp = {p: (len(v), pr(math.fsum(v))) for p, v in groups.items()}
    got = run(spark, "bucketed_join_colocated")
    assert [r.o_orderpriority for r in got] == sorted(exp)
    for r in got:
        n, rev = exp[r.o_orderpriority]
        assert r.n_lines == n
        assert ok(r.revenue, rev)


def test_events_partitioned_dpp_literal(spark, events):
    lo, hi = datetime(2024, 1, 1).date(), datetime(2024, 2, 29).date()
    cnt = defaultdict(int)
    for _eid, ts, _uid, et, _v in events:
        d = ts.date()
        if lo <= d <= hi and d.isocalendar()[1] == 2:
            cnt[et] += 1
    got = {r.event_type: r.n_events for r in run(spark, "events_partitioned_dpp")}
    assert got == dict(cnt)
    assert sum(cnt.values()) > 0


def test_weekly_revenue_movers_literal(spark, orders):
    from datetime import timedelta

    weekly = defaultdict(int)
    for _okey, ck, _st, price, d, _p in orders:
        wk = d.date() - timedelta(days=d.weekday())
        weekly[(ck, wk)] += math.floor(price * 100 + 0.5)
    by_cust = defaultdict(list)
    for (ck, wk), rev in weekly.items():
        by_cust[ck].append((wk, rev))
    cands = []
    for ck, rows in by_cust.items():
        rows.sort()
        for (pw, prev), (w, rev) in zip(rows, rows[1:]):
            cands.append((ck, w, rev, prev, rev - prev))
    cands.sort(key=lambda t: (-abs(t[4]), t[0], t[1]))
    exp = cands[:20]
    got = [
        (r.custkey, r.wk, r.rev, r.prev_rev, r.delta_cents)
        for r in run(spark, "weekly_revenue_movers")
    ]
    assert got == exp


def test_rfm_segmentation_literal(spark, events):
    per_user = {}
    for _eid, ts, uid, et, v in events:
        if et != "purchase":
            continue
        d = ts.date()
        cents = math.floor(v * 100 + 0.5)
        last, n, tot = per_user.get(uid, (None, 0, 0))
        per_user[uid] = (d if last is None or d > last else last, n + 1, tot + cents)
    corpus_max = max(last for last, _n, _t in per_user.values())
    base = {
        uid: ((corpus_max - last).days, n, tot)
        for uid, (last, n, tot) in per_user.items()
    }
    n_total = len(base)

    def scores(key_idx: int, descending: bool) -> dict:
        order = sorted(
            base.items(),
            key=lambda kv: (
                -kv[1][key_idx] if descending else kv[1][key_idx],
                kv[0],
            ),
        )
        return {uid: _ntile(i, 5, n_total) for i, (uid, _v) in enumerate(order, 1)}

    r_s = scores(0, True)
    f_s = scores(1, False)
    m_s = scores(2, False)
    rows = run(spark, "rfm_segmentation")
    assert len(rows) == n_total
    for r in rows:
        rec, freq, mon = base[r.user_id]
        assert (r.recency_days, r.frequency, r.monetary_cents) == (rec, freq, mon)
        assert (r.r_score, r.f_score, r.m_score) == (
            r_s[r.user_id], f_s[r.user_id], m_s[r.user_id],
        )


def _corr(xs: list, ys: list):
    n = len(xs)
    if n < 2:
        return None
    mx, my = math.fsum(xs) / n, math.fsum(ys) / n
    sxy = math.fsum((x - mx) * (y - my) for x, y in zip(xs, ys))
    sxx = math.fsum((x - mx) ** 2 for x in xs)
    syy = math.fsum((y - my) ** 2 for y in ys)
    if sxx == 0 or syy == 0:
        return None
    return sxy / math.sqrt(sxx * syy)


def test_acf_by_user_literal(spark, events):
    series = defaultdict(list)
    for eid, ts, uid, _et, v in events:
        series[uid].append((ts, eid, v))
    exp = {}
    for uid, rows in series.items():
        rows.sort(key=lambda t: (t[0], t[1]))
        vals = [v for _ts, _eid, v in rows]
        p1 = [(vals[i], vals[i - 1]) for i in range(1, len(vals))]
        p2 = [(vals[i], vals[i - 2]) for i in range(2, len(vals))]
        if len(p1) < 10:
            continue
        a1 = _corr([a for a, _ in p1], [b for _, b in p1])
        a2 = _corr([a for a, _ in p2], [b for _, b in p2])
        exp[uid] = (
            len(p1),
            pr(a1, 4) if a1 is not None else None,
            pr(a2, 4) if a2 is not None else None,
        )
    rows = run(spark, "acf_by_user")
    assert [r.user_id for r in rows] == sorted(exp)
    for r in rows:
        n, a1, a2 = exp[r.user_id]
        assert r.n_lag1_pairs == n
        assert ok(r.acf1, a1, 4) and ok(r.acf2, a2, 4)


def test_brand_affinity_lift_literal(spark):
    li = _rows("lineitem", ["l_orderkey", "l_partkey"])
    part = dict(_rows("part", ["p_partkey", "p_brand"]))
    baskets = {(okey, part[pk]) for okey, pk in li if pk in part}
    n_baskets = len({okey for okey, _b in baskets})
    support = defaultdict(int)
    by_order = defaultdict(set)
    for okey, b in baskets:
        support[b] += 1
        by_order[okey].add(b)
    n_ab = defaultdict(int)
    for brands in by_order.values():
        bl = sorted(brands)
        for i, a in enumerate(bl):
            for b in bl[i + 1:]:
                n_ab[(a, b)] += 1
    cands = [
        (a, b, nab, support[a], support[b],
         pr((nab * n_baskets) / (support[a] * support[b]), 6))
        for (a, b), nab in n_ab.items()
    ]
    cands.sort(key=lambda t: (-t[5], t[0], t[1]))
    exp = cands[:15]
    got = [
        (r.brand_a, r.brand_b, r.n_ab, r.n_a, r.n_b, r.lift)
        for r in run(spark, "brand_affinity_lift")
    ]
    assert [(a, b, nab, na, nb) for a, b, nab, na, nb, _l in got] == [
        (a, b, nab, na, nb) for a, b, nab, na, nb, _l in exp
    ]
    for g, e in zip(got, exp):
        assert ok(g[5], e[5], 6)


# --------------------------------------- SQL UDF / Arrow API surfaces


def test_sql_udf_rollup_literal(spark, orders):
    agg = defaultdict(lambda: [0, 0])
    for _okey, _ck, _st, price, _d, prio in orders:
        agg[prio][0] += math.floor(price * 100 + 0.5)
        agg[prio][1] += 1
    got = run(spark, "sql_udf_rollup")
    assert [r.o_orderpriority for r in got] == sorted(agg)
    for r in got:
        tot, n = agg[r.o_orderpriority]
        assert (r.total_cents, r.n_orders, r.avg_cents) == (tot, n, tot // n)


@pytest.fixture(scope="module")
def emb():
    return _rows("embeddings", ["vec_id", "embedding", "label"])


def _dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y  # left fold, same order as the engine
    return acc


def test_mapinarrow_vector_norm_literal(spark, emb):
    exp = [
        (vid, pr(_dot(v, v), 6)) for vid, v, _l in sorted(emb) if vid < 400
    ]
    got = [(r.vec_id, r.norm2) for r in run(spark, "mapinarrow_vector_norm")]
    assert [v for v, _ in got] == [v for v, _ in exp]
    for (gv, gn), (_ev, en) in zip(got, exp):
        assert ok(gn, en, 6)


def test_applyinarrow_label_stats_literal(spark, emb):
    agg = {}
    for vid, _v, lab in emb:
        n, lo, hi, s = agg.get(lab, (0, vid, vid, 0))
        agg[lab] = (n + 1, min(lo, vid), max(hi, vid), s + vid)
    got = run(spark, "applyinarrow_label_stats")
    assert [r.label for r in got] == sorted(agg)
    for r in got:
        assert (r.n, r.min_vec, r.max_vec, r.sum_vec) == agg[r.label]


# ----------------------------------------------- text corpus retrieval

_BM25_Q = ("spark", "join", "scan")


def test_bm25_topk_literal(spark, docs):
    per_doc = {}
    for doc_id, text, _lang, _src in docs:
        tk = _toks(text)
        if tk:
            per_doc[doc_id] = (len(tk), [tk.count(t) for t in _BM25_Q])
    n_docs = len(per_doc)
    sum_dl = sum(dl for dl, _ in per_doc.values())
    avgdl = sum_dl / n_docs
    df = [sum(1 for _dl, tf in per_doc.values() if tf[i] > 0) for i in range(3)]
    scored = []
    for doc_id, (dl, tf) in per_doc.items():
        if sum(tf) == 0:
            continue
        s = 0.0
        for i in range(3):
            if tf[i] == 0:
                continue
            idf = math.log((n_docs - df[i] + 0.5) / (df[i] + 0.5) + 1.0)
            tfn = (tf[i] * 2.2) / (tf[i] + 1.2 * (0.25 + 0.75 * dl / avgdl))
            s = s + idf * tfn
        scored.append((doc_id, pr(s, 4)))
    exp = sorted(scored, key=lambda t: (-t[1], t[0]))[:20]
    got = [(r.doc_id, r.bm25) for r in run(spark, "bm25_topk")]
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (gd, gs), (_ed, es) in zip(got, exp):
        assert ok(gs, es, 4)


def _shingles(tk: list[str], n: int) -> list[str]:
    return [" ".join(tk[i:i + n]) for i in range(len(tk) - n + 1)]


def test_benchmark_decontamination_literal(spark, docs):
    grams = {
        doc_id: set(_shingles(_toks(text), 5))
        for doc_id, text, _lang, _src in docs
        if len(_toks(text)) >= 5
    }
    eval_set = set()
    for doc_id, g in grams.items():
        if doc_id % 10 == 0:
            eval_set |= g
    exp = {
        doc_id: len(g & eval_set)
        for doc_id, g in grams.items()
        if doc_id % 10 != 0 and g & eval_set
    }
    got = run(spark, "benchmark_decontamination")
    assert [r.doc_id for r in got] == sorted(exp)
    for r in got:
        assert r.n_shared_grams == exp[r.doc_id]


def test_dup_span_removal_literal(spark, docs):
    toks = {d: _toks(t) for d, t, _l, _s in docs}
    doc_count = defaultdict(set)
    for d, tk in toks.items():
        for g in set(_shingles(tk, 5)):
            doc_count[g].add(d)
    shared = {g for g, ds in doc_count.items() if len(ds) >= 2}
    exp = {}
    for d, tk in toks.items():
        if not tk:
            continue
        covered = set()
        for i, g in enumerate(_shingles(tk, 5)):
            if g in shared:
                covered.update(range(i, i + 5))
        kept = [w for i, w in enumerate(tk) if i not in covered]
        exp[d] = (len(tk), len(tk) - len(kept), " ".join(kept))
    got = run(spark, "dup_span_removal")
    assert {r.doc_id for r in got} == set(exp)
    for r in got:
        assert (r.n_words, r.n_removed, r.kept_text) == exp[r.doc_id]


# ------------------------------------- IVF similarity / LM / curation


def _l2_sq(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + (x - y) ** 2
    return acc


def _cos(a, b):
    return _dot(a, b) / (math.sqrt(_dot(a, a)) * math.sqrt(_dot(b, b)))


def _ivf_assign(emb_rows, n_centroids):
    """Nearest of the first-C vectors by pround6 L2², ties to lowest id."""
    cents = sorted((vid, v) for vid, v, _l in emb_rows if vid < n_centroids)
    return {
        vid: min((pr(_l2_sq(v, c), 6), cid) for cid, c in cents)[1]
        for vid, v, _l in emb_rows
    }


def _bucketed_pairs(emb_rows, threshold, n_centroids):
    assign = _ivf_assign(emb_rows, n_centroids)
    norms = {vid: math.sqrt(_dot(v, v)) for vid, v, _l in emb_rows}
    by_bucket = defaultdict(list)
    for vid, v, _l in emb_rows:
        by_bucket[assign[vid]].append((vid, v))
    out = {}
    for rows in by_bucket.values():
        rows.sort()
        for i, (a_id, a) in enumerate(rows):
            for b_id, b in rows[i + 1:]:
                s = pr(_dot(a, b) / (norms[a_id] * norms[b_id]), 6)
                if s >= threshold:
                    out[(a_id, b_id)] = s
    return out


def test_embedding_neardup_bucketed_literal(spark, emb):
    c = max(8, math.floor(math.sqrt(len(emb))))
    exp = _bucketed_pairs(emb, 0.3, c)
    got = {(r.vec_a, r.vec_b): r.sim for r in run(spark, "embedding_neardup_bucketed")}
    assert set(got) == set(exp)
    for k, s in got.items():
        assert ok(s, exp[k], 6)
    assert len(exp) > 0


def test_ivf_topk_batch_literal(spark, emb):
    qids, k, nprobe = (3, 17, 33, 77, 91), 5, 2
    cents = sorted((vid, v) for vid, v, _l in emb if vid < 8)
    vecs = {vid: v for vid, v, _l in emb}
    dists = {
        vid: sorted((pr(_l2_sq(v, c), 6), cid) for cid, c in cents)
        for vid, v, _l in emb
    }
    assign = {vid: d[0][1] for vid, d in dists.items()}
    exp = []
    for q in qids:
        probes = {cid for _d, cid in dists[q][:nprobe]}
        cand = [
            (pr(_cos(vecs[vid], vecs[q]), 6), vid)
            for vid in vecs
            if assign[vid] in probes and vid != q
        ]
        top = sorted(cand, key=lambda t: (-t[0], t[1]))[:k]
        exp.extend((q, i, vid, s) for i, (s, vid) in enumerate(top, 1))
    got = [(r.query_id, r.rank, r.vec_id, r.sim) for r in run(spark, "ivf_topk_batch")]
    assert [(g[0], g[1], g[2]) for g in got] == [(e[0], e[1], e[2]) for e in exp]
    for g, e in zip(got, exp):
        assert ok(g[3], e[3], 6)


def test_label_propagation_literal(spark, emb):
    c = max(8, math.floor(math.sqrt(len(emb))))
    pairs = _bucketed_pairs(emb, 0.2, c)
    nbrs = defaultdict(list)  # src -> [dst]
    for a, b in pairs:
        nbrs[a].append(b)
        nbrs[b].append(a)
    labels = {vid: (lab if vid < 200 else None) for vid, _v, lab in emb}
    for _round in range(2):
        votes = defaultdict(lambda: defaultdict(int))
        for src, dsts in nbrs.items():
            for dst in dsts:
                if labels[dst] is not None:
                    votes[src][labels[dst]] += 1
        new = dict(labels)
        for node, vv in votes.items():
            if labels[node] is None:
                new[node] = min(vv.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        labels = new
    agg = defaultdict(lambda: [0, 0])
    for node, lab in labels.items():
        key = -1 if lab is None else lab
        agg[key][0] += 1
        agg[key][1] += node
    got = run(spark, "label_propagation")
    assert [r.final_label for r in got] == sorted(agg)
    for r in got:
        assert (r.n_nodes, r.id_checksum) == tuple(agg[r.final_label])


def test_ccnet_perplexity_buckets_literal(spark, docs):
    from collections import Counter

    cb, cw, per_doc = Counter(), Counter(), {}
    lang_of = {}
    for doc_id, text, lang, _src in docs:
        lang_of[doc_id] = lang
        tk = _toks(text)
        if len(tk) < 2:
            continue
        bgs = list(zip(tk, tk[1:]))
        per_doc[doc_id] = bgs
        for bg in bgs:
            cb[bg] += 1
            cw[bg[0]] += 1
    scores = {
        d: pr(math.fsum(math.log(cb[bg] / cw[bg[0]]) for bg in bgs) / len(bgs), 6)
        for d, bgs in per_doc.items()
    }
    by_lang = defaultdict(list)
    for d, s in scores.items():
        by_lang[lang_of[d]].append((d, s))
    exp_bucket = {}
    for lang, rows in by_lang.items():
        rows.sort(key=lambda t: (-t[1], t[0]))
        for i, (d, _s) in enumerate(rows, 1):
            exp_bucket[d] = _ntile(i, 3, len(rows))
    got = run(spark, "ccnet_perplexity_buckets")
    assert [r.doc_id for r in got] == sorted(scores)
    for r in got:
        assert r.lang == lang_of[r.doc_id]
        assert ok(r.avg_logprob, scores[r.doc_id], 6)
        assert r.bucket == exp_bucket[r.doc_id]


_GOPHER_STOP = {"the", "a", "and", "of", "is"}


def test_curation_funnel_report_literal(spark, docs):
    import hashlib

    def norm(t: str) -> str:
        return re.sub(r"\s+", " ", t.strip()).lower()

    def gopher_pass(tk: list[str]) -> bool:
        n = len(tk)
        mean_len = sum(len(w) for w in tk) / max(n, 1)
        alpha = sum(1 for w in tk if re.search(r"[a-z]", w)) / max(n, 1)
        stop = sum(1 for w in tk if w in _GOPHER_STOP)
        return 50 <= n <= 100000 and 3.0 <= mean_len <= 10.0 and alpha >= 0.8 and stop >= 2

    by_digest = {}
    text_of, src_of = {}, {}
    for doc_id, text, _lang, src in docs:
        text_of[doc_id], src_of[doc_id] = text, src
        dg = hashlib.md5(norm(text).encode()).hexdigest()
        if dg not in by_digest or doc_id < by_digest[dg]:
            by_digest[dg] = doc_id
    keepers = sorted(by_digest.values())
    quality = [d for d in keepers if gopher_pass(_toks(text_of[d]))]

    exp = defaultdict(lambda: [0, 0])
    for d in text_of:
        exp[(src_of[d], "raw")][0] += 1
        exp[(src_of[d], "raw")][1] += d
    for d in keepers:
        exp[(src_of[d], "exact_dedup")][0] += 1
        exp[(src_of[d], "exact_dedup")][1] += d
    for d in quality:
        exp[(src_of[d], "quality")][0] += 1
        exp[(src_of[d], "quality")][1] += d
    got = run(spark, "curation_funnel_report")
    assert [(r.source, r.stage) for r in got] == sorted(exp)
    for r in got:
        assert (r.n_docs, r.id_checksum) == tuple(exp[(r.source, r.stage)])
    assert len(quality) > 0
