"""Round-13 independent fixtures, part B: the embedding/similarity family.

The highest-risk residual stratum after the TPC-H/stream/function batches:
IVF bucketing, hyperplane SimHash, contrastive pair mining, MMR re-ranking,
LSH recall evaluation — hand-derived math mirrored on both engines. Every
test recomputes the full chain BRUTE-FORCE in pure Python over the raw
sf0.001 parquet (hashlib for the seeded hashes, left-fold float arithmetic
matching the plans' pinned accumulation order, integer popcounts) and
compares the registered builder's output exactly.

Float-order note: the plans deliberately pin left-associated accumulation
(``F.aggregate`` folds, explicit ``+`` chains) so the same IEEE-754 doubles
come out of any engine; the Python mirrors below fold in the same order,
which is why exact equality (after the shared 1e-6 quantizer) is assertable
rather than tolerance-based.
"""

import hashlib
import math
import re
from collections import defaultdict

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


def pr(x: float, n: int = 6) -> float:
    scale = float(10**n)
    return math.floor(x * scale + 0.50001) / scale


def h64(s, seed=None) -> int:
    base = f"{seed}:{s}" if seed is not None else str(s)
    return int(hashlib.md5(base.encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def emb():
    t = pq.read_table(f"{SF}/embeddings.parquet")
    return list(
        zip(
            t.column("vec_id").to_pylist(),
            t.column("embedding").to_pylist(),
            t.column("label").to_pylist(),
        )
    )


@pytest.fixture(scope="module")
def docs():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return list(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))


def dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y  # left fold, same order as F.aggregate
    return acc


def l2_sq(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + (x - y) ** 2
    return acc


def cos(a, b):
    return dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))


def ivf_buckets(emb_rows, n_centroids):
    """Mirror of ivf_assign/centroid_argmin_col: nearest (pround6 L2², ties
    to the lowest centroid id) of the first C vectors."""
    cents = [(vid, v) for vid, v, _l in emb_rows if vid < n_centroids]
    cents.sort()
    assign = {}
    for vid, v, _l in emb_rows:
        assign[vid] = min((pr(l2_sq(v, c)), cid) for cid, c in cents)[1]
    return assign


def bucketed_pairs(emb_rows, threshold, n_centroids):
    """Mirror of neardup_pairs_bucketed: same-bucket pairs, a<b, pround6
    cosine >= threshold. Norm hoisted exactly as in the plan (same fold)."""
    assign = ivf_buckets(emb_rows, n_centroids)
    norms = {vid: math.sqrt(dot(v, v)) for vid, v, _l in emb_rows}
    by_bucket = defaultdict(list)
    for vid, v, _l in emb_rows:
        by_bucket[assign[vid]].append((vid, v))
    out = {}
    for rows in by_bucket.values():
        rows.sort()
        for i, (va_id, va) in enumerate(rows):
            for vb_id, vb in rows[i + 1 :]:
                s = pr(dot(va, vb) / (norms[va_id] * norms[vb_id]))
                if s >= threshold:
                    out[(va_id, vb_id)] = s
    return out


def test_ivf_topk_ann_literal(spark, emb):
    assign = ivf_buckets(emb, 8)
    qb = assign[0]
    qvec = next(v for vid, v, _l in emb if vid == 0)
    cand = [
        (pr(cos(v, qvec)), vid) for vid, v, _l in emb if assign[vid] == qb and vid != 0
    ]
    exp = [(vid, s) for s, vid in sorted(cand, key=lambda t: (-t[0], t[1]))[:5]]
    got = [(r["vec_id"], r["sim"]) for r in run(spark, "ivf_topk_ann")]
    assert got == exp and len(exp) == 5


def test_label_centroids_literal(spark, emb):
    per = defaultdict(list)
    for _vid, v, lab in emb:
        for d, x in enumerate(v):
            per[(lab, d)].append(x)
    got = {(r["label"], r["dim"]): r["centroid_v"] for r in run(spark, "label_centroids")}
    assert set(got) == set(per)
    for k, vals in per.items():
        assert abs(got[k] - pr(math.fsum(vals) / len(vals))) <= 1.5e-6


def test_embedding_simhash_pairs_literal(spark, emb):
    planes = [
        [
            1.0 if int(hashlib.md5(f"hp:{j}:{d}".encode()).hexdigest()[:8], 16) & 1 else -1.0
            for d in range(64)
        ]
        for j in range(16)
    ]
    sig = {}
    for vid, v, _l in emb:
        s = 0
        for j, plane in enumerate(planes):
            acc = 0.0
            for d in range(64):
                acc = acc + v[d] * plane[d]  # left-assoc, mirrors the SQL chain
            if acc >= 0:
                s |= 1 << j
        sig[vid] = s
    # banding: 4 bands x 4 bits; candidates share >=1 band; hamming <= 2
    band = lambda s, b: (s >> (4 * b)) & 0xF
    ids = sorted(sig)
    exp = {}
    buckets = defaultdict(list)
    for vid in ids:
        for b in range(4):
            buckets[(b, band(sig[vid], b))].append(vid)
    seen = set()
    for rows in buckets.values():
        for i, a in enumerate(rows):
            for b_ in rows[i + 1 :]:
                key = (a, b_) if a < b_ else (b_, a)
                seen.add(key)
    for a, b_ in seen:
        h = bin(sig[a] ^ sig[b_]).count("1")
        if h <= 2:
            exp[(a, b_)] = h
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in run(spark, "embedding_simhash_pairs")}
    assert got == exp and exp


def test_hard_negative_and_positive_pairs_literal(spark, emb):
    c = max(8, int(math.floor(math.sqrt(float(len(emb))))))
    labels = {vid: lab for vid, _v, lab in emb}
    hn = [
        (s, a, b)
        for (a, b), s in bucketed_pairs(emb, 0.25, c).items()
        if labels[a] != labels[b]
    ]
    exp_hn = [
        (a, b, labels[a], labels[b], s)
        for s, a, b in sorted(hn, key=lambda t: (-t[0], t[1], t[2]))[:30]
    ]
    got_hn = [
        (r["vec_a"], r["vec_b"], r["label_a"], r["label_b"], r["sim"])
        for r in run(spark, "hard_negative_mining")
    ]
    assert got_hn == exp_hn and len(exp_hn) == 30
    pp = [
        (s, a, b)
        for (a, b), s in bucketed_pairs(emb, 0.3, c).items()
        if labels[a] == labels[b]
    ]
    exp_pp = [
        (a, b, labels[a], s) for s, a, b in sorted(pp, key=lambda t: (-t[0], t[1], t[2]))[:30]
    ]
    got_pp = [
        (r["vec_a"], r["vec_b"], r["label"], r["sim"])
        for r in run(spark, "positive_pair_mining")
    ]
    assert got_pp == exp_pp and 0 < len(exp_pp) <= 30


def test_mmr_diverse_rerank_literal(spark, emb):
    qvec = next(v for vid, v, _l in emb if vid == 0)
    rel = {
        vid: pr(cos(v, qvec)) for vid, v, _l in emb if vid != 0
    }
    cand = sorted(rel.items(), key=lambda t: (-t[1], t[0]))[:8]
    vecs = {vid: v for vid, v, _l in emb}
    sim = {
        (a, b): pr(cos(vecs[a], vecs[b]))
        for a, _ra in cand
        for b, _rb in cand
        if a != b
    }
    s1, score1 = cand[0]
    m2 = [
        (pr(0.7 * r - 0.3 * sim[(vid, s1)]), vid) for vid, r in cand if vid != s1
    ]
    score2, s2 = max(m2, key=lambda t: (t[0], -t[1]))
    m3 = [
        (pr(0.7 * r - 0.3 * max(sim[(vid, s1)], sim[(vid, s2)])), vid)
        for vid, r in cand
        if vid not in (s1, s2)
    ]
    score3, s3 = max(m3, key=lambda t: (t[0], -t[1]))
    got = [(r["rank"], r["vec_id"], r["mmr_score"]) for r in run(spark, "mmr_diverse_rerank")]
    assert got == [(1, s1, score1), (2, s2, score2), (3, s3, score3)]


def py_tokens(text):
    return [t for t in re.split(r"\s+", text.strip()) if t]


def test_lsh_recall_report_literal(spark, docs):
    # exact truth: unigram-set Jaccard >= 0.5 on doc_id < 200
    toks = {did: set(py_tokens(txt)) for did, txt in docs if did < 200}
    truth = set()
    ids = sorted(toks)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(toks[a] & toks[b])
            if inter and inter / (len(toks[a]) + len(toks[b]) - inter) >= 0.5:
                truth.add((a, b))
    # LSH candidates: 6 minhashes over 3-token shingles, 3 bands of 2
    sigs = {}
    for did, txt in docs:
        if did >= 200:
            continue
        ts = py_tokens(txt)
        if len(ts) < 3:
            continue
        sh = [" ".join(ts[i : i + 3]) for i in range(len(ts) - 2)]
        sigs[did] = [min(h64(s, seed=j) for s in sh) for j in range(6)]
    buckets = defaultdict(set)
    for did, m in sigs.items():
        for b in range(3):
            buckets[(b, f"{m[2*b]}_{m[2*b+1]}")].add(did)
    cands = set()
    for rows in buckets.values():
        rows = sorted(rows)
        for i, a in enumerate(rows):
            for b in rows[i + 1 :]:
                cands.add((a, b))
    hits = truth & cands
    r = run(spark, "lsh_recall_report")[0]
    assert (r["n_truth"], r["n_candidates"], r["n_hits"]) == (len(truth), len(cands), len(hits))
    if truth:
        assert abs(r["recall"] - pr(len(hits) / len(truth))) <= 1.5e-6
    if cands:
        assert abs(r["candidate_efficiency"] - pr(len(hits) / len(cands))) <= 1.5e-6


def test_recursive_cte_calendar_literal(spark):
    import pyarrow as pa
    from datetime import datetime, timedelta, timezone

    t = pq.read_table(f"{SF}/events.parquet", columns=["ts"])
    ts = t.column("ts")
    ints = ts.cast(pa.int64()).to_pylist()
    if ts.type.unit == "ns":
        ints = [v // 1000 for v in ints]
    days = [
        datetime.fromtimestamp(us // 1_000_000, tz=timezone.utc).date() for us in ints
    ]
    per = defaultdict(int)
    for d in days:
        per[d] += 1
    start = min(per)
    exp = [(start + timedelta(days=i), per.get(start + timedelta(days=i), 0)) for i in range(30)]
    got = [(r["day"], r["n_events"]) for r in run(spark, "recursive_cte_calendar")]
    assert got == exp


def test_pipe_syntax_rollup_literal(spark):
    from decimal import ROUND_HALF_UP, Decimal

    t = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderstatus", "o_orderpriority", "o_totalprice"]
    )
    agg = defaultdict(lambda: [0, 0])
    for st, prio, tp in zip(*[t.column(c).to_pylist() for c in t.column_names]):
        if st == "F":
            cents = int(Decimal(repr(tp * 100)).quantize(Decimal(1), ROUND_HALF_UP))
            agg[prio][0] += 1
            agg[prio][1] += cents
    got = [(r["o_orderpriority"], r["n_orders"], r["revenue_cents"]) for r in run(spark, "pipe_syntax_rollup")]
    assert got == [(p, n, c) for p, (n, c) in sorted(agg.items())]


def test_salted_skew_join_literal(spark):
    t = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    c = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    seg = dict(zip(c.column("c_custkey").to_pylist(), c.column("c_mktsegment").to_pylist()))
    agg = defaultdict(lambda: [0, 0])
    for ok_, ck, tp in zip(*[t.column(x).to_pylist() for x in t.column_names]):
        key = 1 if ok_ % 3 == 0 else ck
        if key in seg:  # inner join
            cents = math.floor(tp * 100 + 0.5)
            agg[seg[key]][0] += 1
            agg[seg[key]][1] += cents
    got = {r["c_mktsegment"]: (r["n_orders"], r["sum_cents"]) for r in run(spark, "salted_skew_join")}
    assert got == {s: (n, c_) for s, (n, c_) in agg.items()}


def test_sampled_profile_literal(spark):
    t = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_linenumber", "l_quantity"])
    kept = [
        q
        for ok_, ln, q in zip(*[t.column(x).to_pylist() for x in t.column_names])
        if h64(f"{ok_}:{ln}", seed=42) % 10 == 0
    ]
    r = run(spark, "sampled_profile")[0]
    assert r["sample_rows"] == len(kept)
    assert abs(r["avg_qty_sampled"] - pr(math.fsum(kept) / len(kept))) <= 1.5e-6


# -------------------------------- batch 6: lakehouse, multimodal, pipelines


@pytest.fixture(scope="module")
def docs_full():
    t = pq.read_table(f"{SF}/documents.parquet")
    return list(
        zip(
            t.column("doc_id").to_pylist(),
            t.column("text").to_pylist(),
            t.column("lang").to_pylist(),
            t.column("source").to_pylist(),
            t.column("n_chars").to_pylist(),
        )
    )


def _minhash_lsh_candidates(doc_texts):
    """Pure-Python mirror of minhash_signatures (6 seeded md5 minhashes over
    3-token shingles) + lsh_candidate_pairs (3 bands of 2)."""
    sigs = {}
    for did, txt in doc_texts:
        ts = py_tokens(txt)
        if len(ts) < 3:
            continue
        sh = [" ".join(ts[i : i + 3]) for i in range(len(ts) - 2)]
        sigs[did] = [min(h64(s, seed=j) for s in sh) for j in range(6)]
    buckets = defaultdict(set)
    for did, m in sigs.items():
        for b in range(3):
            buckets[(b, f"{m[2*b]}_{m[2*b+1]}")].add(did)
    cands = set()
    for rows in buckets.values():
        rows = sorted(rows)
        for i, a in enumerate(rows):
            for b in rows[i + 1 :]:
                cands.add((a, b))
    return cands


def test_partsupp_synth_literal(spark):
    t = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_partkey", "l_suppkey"])
    pairs = set(zip(t.column("l_partkey").to_pylist(), t.column("l_suppkey").to_pylist()))
    exp = {
        (pk, sk, 1 + h64(f"{pk}:{sk}", 11) % 9999, 100 + h64(f"{pk}:{sk}", 13) % 99901)
        for pk, sk in pairs
    }
    got = {
        (r["ps_partkey"], r["ps_suppkey"], r["ps_availqty"], r["ps_supplycost_cents"])
        for r in run(spark, "partsupp_synth")
    }
    assert got == exp


def test_zorder_scan_filtered_literal(spark):
    t = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "event_type", "value"])
    agg = defaultdict(lambda: [0, 0.0])
    for uid, et, v in zip(*[t.column(c).to_pylist() for c in t.column_names]):
        if v is not None and 10 <= uid <= 40 and v >= 50.0:
            agg[et][0] += 1
            agg[et][1] += v
    got = {r["event_type"]: (r["n_events"], r["total_value"]) for r in run(spark, "zorder_scan_filtered")}
    assert set(got) == set(agg)
    for et, (n, s) in agg.items():
        assert got[et][0] == n and abs(got[et][1] - pr(s, 2)) <= 0.015


def test_snapshot_time_travel_literal(spark):
    t = pq.read_table(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal"]
    )
    rows = list(zip(*[t.column(c).to_pylist() for c in t.column_names]))
    exp = {r for r in rows if r[2] < 5}
    got = {
        (r["c_custkey"], r["c_name"], r["c_nationkey"], r["c_acctbal"])
        for r in run(spark, "snapshot_time_travel")
    }
    assert got == exp and exp


def test_snapshot_diff_cdf_literal(spark):
    t = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    exp = {}
    for ck, nk in zip(t.column("c_custkey").to_pylist(), t.column("c_nationkey").to_pylist()):
        if nk >= 15:
            exp[ck] = "insert"
        elif nk == 7:
            exp[ck] = "delete"
        elif nk < 5:
            exp[ck] = "update"  # the +10 balance bump changes the fingerprint
    got = {r["c_custkey"]: r["_change_type"] for r in run(spark, "snapshot_diff_cdf")}
    assert got == exp


def test_schema_evolution_merge_literal(spark):
    t = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey", "c_name", "c_acctbal"])
    got = {r["c_custkey"]: (r["c_name"], r["has_balance"], r["balance_or_zero"]) for r in run(spark, "schema_evolution_merge")}
    for ck, nm, bal in zip(*[t.column(c).to_pylist() for c in t.column_names]):
        has = ck % 2 == 1
        g = got[ck]
        assert g[0] == nm and g[1] == has
        assert abs(g[2] - (pr(bal, 2) if has else 0.0)) <= 0.015


def test_python_datasource_scan_literal(spark):
    exp = set()
    for rid in range(2000):
        h = (rid * 2654435761) % 2**32
        exp.add((rid, h % 7, (h % 1000) / 100.0))
    got = {(r["id"], r["bucket"], r["score"]) for r in run(spark, "python_datasource_scan")}
    assert got == exp


def test_multimodal_features_and_frame_sample_literal(spark):
    def meta(i):
        payload = f"media-payload-{i}".encode()
        mtype = ["image/png", "audio/wav", "video/mp4"][i % 3]
        return (
            mtype,
            len(payload),
            16 + payload[0] % 64,
            16 + payload[-1] % 64,
            min(8, len(payload)),
            sum(payload[:8]),
        )

    got = {r["asset_id"]: tuple(r)[1:] for r in run(spark, "multimodal_features")}
    assert set(got) == set(range(128))
    for i in range(128):
        mt, nb, w, h, dim, bs = meta(i)
        assert got[i] == (mt, nb, w, h, dim, bs)
    # frame sample: every 5th asset per media type in asset_id order
    by_type = defaultdict(list)
    for i in range(128):
        by_type[i % 3].append(i)
    exp_ids = {ids[j] for ids in by_type.values() for j in range(0, len(ids), 5)}
    got_fs = {r["asset_id"]: (r["media_type"], r["n_bytes"], r["width"], r["height"]) for r in run(spark, "multimodal_frame_sample")}
    assert set(got_fs) == exp_ids
    for i in exp_ids:
        mt, nb, w, h, _d, _b = meta(i)
        assert got_fs[i] == (mt, nb, w, h)


def test_commute_enrichment_udf_literal(spark):
    t = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey", "c_name"])
    got = {r["c_custkey"]: tuple(r)[1:] for r in run(spark, "commute_enrichment_udf")}
    for ck, nm in zip(t.column("c_custkey").to_pylist(), t.column("c_name").to_pylist()):
        mode = ["walking", "bicycling", "other"][ck % 3]
        dist = int(hashlib.md5(nm.encode()).hexdigest()[:15], 16) % 30000
        limit = {"walking": 15000, "bicycling": 25000}.get(mode)
        if limit is None:
            exp = (mode, None, None, "unsupported transport mode")
        else:
            exp = (mode, dist, dist <= limit, None)
        assert got[ck] == exp


def test_compaction_bin_packing_literal(spark, docs_full):
    parts = defaultdict(int)
    for _did, _txt, lang, src, nc in docs_full:
        parts[(lang, src)] += nc
    cum = 0
    exp = []
    for (lang, src) in sorted(parts):
        exp.append((lang, src, parts[(lang, src)], cum // 8192))
        cum += parts[(lang, src)]
    got = [(r["lang"], r["source"], r["part_bytes"], r["bin_id"]) for r in run(spark, "compaction_bin_packing")]
    assert got == exp


def test_cross_source_contamination_literal(spark, docs_full):
    cands = _minhash_lsh_candidates([(d, t) for d, t, *_ in docs_full])
    toks = {d: set(py_tokens(t)) for d, t, *_ in docs_full}
    src = {d: s for d, _t, _l, s, _n in docs_full}
    cross = defaultdict(list)
    for a, b in cands:
        inter = len(toks[a] & toks[b])
        union = len(toks[a]) + len(toks[b]) - inter
        jac = inter / max(union, 1)
        if jac >= 0.5 and src[a] != src[b]:
            key = tuple(sorted((src[a], src[b])))
            cross[key].append(pr(jac, 4))
    got = {
        (r["source_a"], r["source_b"]): (r["n_pairs"], r["avg_jaccard"])
        for r in run(spark, "cross_source_contamination")
    }
    assert set(got) == set(cross)
    for k, vals in cross.items():
        assert got[k][0] == len(vals)
        assert abs(got[k][1] - pr(math.fsum(vals) / len(vals), 4)) <= 1.5e-4


def test_corpus_curation_pipeline_literal(spark, docs_full):
    def score(txt):
        ts = py_tokens(txt)
        n = len(ts)
        punct = len(re.sub(r"[a-z0-9\s]", "", txt.lower())) / max(len(txt), 1)
        stop = sum(1 for x in ts if x in ("the", "a", "and", "of", "is")) / max(n, 1)
        return 0.4 * min(n / 100.0, 1.0) + 0.3 * (1.0 - punct) + 0.3 * stop

    kept = {
        d: (lang, score(t))
        for d, t, lang, _s, _n in docs_full
        if score(t) >= 0.3 and lang in ("en", "fr", "de", "es")
    }
    cands = _minhash_lsh_candidates(
        [(d, t) for d, t, *_ in docs_full if d in kept]
    )
    losers = {b for _a, b in cands}
    exp = {d: (lang, pr(q, 4)) for d, (lang, q) in kept.items() if d not in losers}
    got = {r["doc_id"]: (r["lang"], r["quality"]) for r in run(spark, "corpus_curation_pipeline")}
    assert set(got) == set(exp)
    for d, (lang, q) in exp.items():
        assert got[d][0] == lang and abs(got[d][1] - q) <= 1.5e-4


# ----------------------------------- batch 7: the last mirrored-only ten


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_embedding_dup_clusters_literal(spark, emb):
    c = max(8, int(math.floor(math.sqrt(float(len(emb))))))
    pairs = list(bucketed_pairs(emb, 0.3, c))
    comp = _union_find(pairs)
    got = {r["vec_id"]: r["component"] for r in run(spark, "embedding_dup_clusters")}
    assert got == comp and comp


def _quantize(v, scale=1000):
    return [math.floor(x * scale) for x in v]


def test_ivf_trained_assign_literal(spark, emb):
    q = {vid: _quantize(v) for vid, v, _l in emb}
    cents = [q[i][:] for i in range(8)]
    for _ in range(2):
        sums = defaultdict(lambda: [0, 0])  # (cl, dim) -> [sum, n]
        for vid, x in q.items():
            cl = min((sum((xi - ci) ** 2 for xi, ci in zip(x, c)), i) for i, c in enumerate(cents))[1]
            for d, xi in enumerate(x):
                sums[(cl, d)][0] += xi
                sums[(cl, d)][1] += 1
        cents = [
            [
                (sums[(i, d)][0] // sums[(i, d)][1]) if sums[(i, d)][1] else cents[i][d]
                for d in range(64)
            ]
            for i in range(8)
        ]
    # final assignment: ivf_assign_to over DOUBLE centroids, pround6 L2²,
    # ties to the lowest centroid id
    fc = [[float(v) for v in c] for c in cents]
    exp = {}
    for vid, x in q.items():
        dx = [float(v) for v in x]
        d_, cid = min((pr(l2_sq(dx, c)), i) for i, c in enumerate(fc))
        exp[vid] = (cid, d_)
    got = {r["vec_id"]: (r["centroid_id"], r["dist"]) for r in run(spark, "ivf_trained_assign")}
    assert got == exp


def test_pq_trained_encode_literal(spark, emb):
    q = {vid: _quantize(v) for vid, v, _l in emb}
    X = [q[i] for i in range(256)]
    d = 64 // 8
    books = []
    for m in range(8):
        sub = [x[m * d : (m + 1) * d] for x in X]
        cs = [sub[j][:] for j in range(16)]
        for _ in range(2):
            sums = [[0] * d for _ in range(16)]
            cnt = [0] * 16
            for x in sub:
                j = min((sum((xi - ci) ** 2 for xi, ci in zip(x, c)), jj) for jj, c in enumerate(cs))[1]
                cnt[j] += 1
                for t in range(d):
                    sums[j][t] += x[t]
            cs = [
                [sums[j][t] // cnt[j] if cnt[j] else cs[j][t] for t in range(d)]
                for j in range(16)
            ]
        books.append([[float(v) for v in c] for c in cs])
    exp = {}
    for vid, x in q.items():
        code = []
        for m in range(8):
            sub = [float(v) for v in x[m * d : (m + 1) * d]]
            _dist, j = min((pr(l2_sq(sub, c)), jj) for jj, c in enumerate(books[m]))
            code.append(j)
        exp[vid] = ",".join(str(j) for j in code)
    got = {r["vec_id"]: r["pq_code"] for r in run(spark, "pq_trained_encode")}
    assert got == exp


def test_stream_minhash_dedup_literal(spark, docs):
    sigs = {}
    for did, txt in docs:
        ts = py_tokens(txt)
        if len(ts) < 3:
            continue
        sh = [" ".join(ts[i : i + 3]) for i in range(len(ts) - 2)]
        sigs[did] = ",".join(str(min(h64(s, seed=j) for s in sh)) for j in range(6))
    winners = {}
    for did in sorted(sigs):
        winners.setdefault(sigs[did], did)
    exp = {(did, sig) for sig, did in winners.items()}
    got = {(r["doc_id"], r["sig"]) for r in run(spark, "stream_minhash_dedup")}
    assert got == exp and exp


def test_stream_quality_curation_literal(spark, docs):
    exp = set()
    for _did, txt in docs:
        ts = py_tokens(txt)
        n = len(ts)
        if not (50 <= n <= 100000):
            continue
        mean_len = sum(len(t) for t in ts) / max(n, 1)
        alpha = sum(1 for t in ts if re.search(r"[a-z]", t)) / max(n, 1)
        stop = sum(1 for t in ts if t in ("the", "a", "and", "of", "is"))
        if 3.0 <= mean_len <= 10.0 and alpha >= 0.8 and stop >= 2:
            exp.add(hashlib.md5(txt.encode()).hexdigest())
    got = {r["digest"] for r in run(spark, "stream_quality_curation")}
    assert got == exp and exp


def test_stream_dedup_within_watermark_literal(spark):
    import pyarrow as pa

    t = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "user_id", "event_type"])
    exp = set(zip(*[t.column(c).to_pylist() for c in t.column_names]))
    got = {
        (r["event_id"], r["user_id"], r["event_type"])
        for r in run(spark, "stream_dedup_within_watermark")
    }
    assert got == exp  # every event delivered twice; exactly one survives


def test_stream_pit_attribution_literal(spark):
    import pyarrow as pa

    t = pq.read_table(f"{SF}/events.parquet")
    ts = t.column("ts")
    ints = ts.cast(pa.int64()).to_pylist()
    if ts.type.unit == "ns":
        ints = [v // 1000 for v in ints]
    rows = list(
        zip(
            t.column("user_id").to_pylist(),
            ints,
            t.column("event_id").to_pylist(),
            t.column("event_type").to_pylist(),
            t.column("value").to_pylist(),
        )
    )
    per_user = defaultdict(list)
    for uid, us, eid, et, v in rows:
        per_user[uid].append((us, int(et == "purchase"), eid, et, v))
    agg = defaultdict(lambda: [0, 0, 0])  # regime -> [n, cents_sum, n_nonnull]
    for uid, evs in per_user.items():
        evs.sort(key=lambda r: (r[0], r[1], r[2]))
        last = None
        for _us, _k, _eid, et, v in evs:
            if et != "purchase":
                last = et
            else:
                regime = last if last is not None else "none"
                agg[regime][0] += 1
                if v is not None:
                    agg[regime][1] += math.floor(v * 100 + 0.5)
                    agg[regime][2] += 1
    got = {r["regime"]: (r["n_purchases"], r["sum_cents"]) for r in run(spark, "stream_pit_attribution")}
    assert got == {
        reg: (n, cents if nn else None) for reg, (n, cents, nn) in agg.items()
    }


def test_stream_incremental_dedup_literal(spark, docs):
    def band_rows(doc_set):
        out = defaultdict(set)
        for did, txt in doc_set:
            ts = py_tokens(txt)
            if len(ts) < 3:
                continue
            sh = [" ".join(ts[i : i + 3]) for i in range(len(ts) - 2)]
            m = [min(h64(s, seed=j) for s in sh) for j in range(6)]
            for b in range(3):
                out[(b, f"{m[2*b]}_{m[2*b+1]}")].add(did)
        return out

    new = [(d, t) for d, t in docs if d % 2 == 1]
    idx = [(d, t) for d, t in docs if d % 2 == 0]
    nb, ib = band_rows(new), band_rows(idx)
    cand = set()
    for key, nids in nb.items():
        for a in nids:
            for b in ib.get(key, ()):
                cand.add((a, b))
    toks = {d: set(py_tokens(t)) for d, t in docs}
    best = {}
    nmatch = defaultdict(int)
    for a, b in cand:
        inter = len(toks[a] & toks[b])
        jac_micro = (1_000_000 * inter) // (len(toks[a]) + len(toks[b]) - inter)
        if jac_micro >= 500_000:
            nmatch[a] += 1
            cur = best.get(a)
            if cur is None or (jac_micro, -b) > (cur[0], -cur[1]):
                best[a] = (jac_micro, b)
    exp = {a: (b, jm, nmatch[a]) for a, (jm, b) in best.items()}
    got = {
        r["new_doc"]: (r["matched_index_doc"], r["jac_micro"], r["n_matches"])
        for r in run(spark, "stream_incremental_dedup")
    }
    assert got == exp and exp


def test_variant_json_extract_literal(spark):
    import json as _json
    import pyarrow as pa

    t = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "user_id", "event_type", "value", "props"])
    got = {r["event_id"]: (r["u"], r["t"], r["v_cents"], r["k"]) for r in run(spark, "variant_json_extract")}
    for eid, uid, et, v, props in zip(*[t.column(c).to_pylist() for c in t.column_names]):
        cents = None if v is None else math.floor(v * 100 + 0.5)
        try:
            k = _json.loads(props).get("k")
        except (ValueError, AttributeError):
            k = None
        assert got[eid] == (uid, et, cents, k), eid


def test_jdbc_roundtrip_derby_literal(spark):
    t = pq.read_table(f"{SF}/customer.parquet", columns=["c_nationkey", "c_acctbal"])
    per = defaultdict(list)
    for nk, bal in zip(t.column("c_nationkey").to_pylist(), t.column("c_acctbal").to_pylist()):
        per[nk].append(bal)
    got = {r["c_nationkey"]: (r["n_customers"], r["avg_acctbal"]) for r in run(spark, "jdbc_roundtrip_derby")}
    assert set(got) == set(per)
    for nk, vals in per.items():
        assert got[nk][0] == len(vals)
        assert abs(got[nk][1] - pr(math.fsum(vals) / len(vals), 2)) <= 0.015
