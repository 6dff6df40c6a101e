"""Semantics tests for the classic-ML spec family (plans/learning.py):
Naive Bayes on a separable crafted corpus, exact stump split on a known
boundary, winnowing vs a pure-Python reference, CF cosine algebra,
time-weighted average arithmetic, l-diversity flags."""

import hashlib
import math
from datetime import datetime, timezone

import projet_data_infrastructure_spark.plans.learning as lrn

SF = "/root/testdata/sf0.001"


def _patch(monkeypatch, tables):
    monkeypatch.setattr(lrn, "read_table", lambda sp, sf, name: tables[name], raising=True)
    monkeypatch.setattr(
        lrn, "read_table_balanced", lambda sp, sf, name: tables[name], raising=True
    )


def _hash64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# --------------------------------------------------------------------------
# Naive Bayes
# --------------------------------------------------------------------------


def test_naive_bayes_separable_corpus_is_diagonal(spark, monkeypatch):
    rows = []
    for i in range(4):
        rows.append((i, "the cat sat", "en", "w", 11))
    for i in range(4, 8):
        rows.append((i, "le chat noir", "fr", "w", 12))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    _patch(monkeypatch, {"documents": docs})
    got = {(r.lang, r.pred_lang): r.n_docs for r in lrn.q_naive_bayes_lang(spark, SF).collect()}
    assert got == {("en", "en"): 4, ("fr", "fr"): 4}


def test_naive_bayes_unseen_words_fall_back_to_prior(spark, monkeypatch):
    # 3 'en' docs vs 1 'fr' doc; a doc of entirely novel words should take
    # the majority prior (en) — its class-conditional mass is the same
    # per-lang default for every candidate except the per-lang total size.
    rows = [
        (0, "alpha beta", "en", "w", 9),
        (1, "alpha beta", "en", "w", 9),
        (2, "alpha beta", "en", "w", 9),
        (3, "gamma delta", "fr", "w", 10),
        (4, "zzz qqq", "en", "w", 7),  # novel words, true lang en
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    _patch(monkeypatch, {"documents": docs})
    got = {(r.lang, r.pred_lang): r.n_docs for r in lrn.q_naive_bayes_lang(spark, SF).collect()}
    # the novel-word doc contributes to the (en, en) cell via the prior
    assert got[("en", "en")] == 4


# --------------------------------------------------------------------------
# Decision stump
# --------------------------------------------------------------------------


def test_stump_finds_perfect_split(spark, monkeypatch):
    # y = 1 exactly when q <= 2  →  threshold 2 is a pure split (Gini 0)
    rows = [(1.0, "R"), (2.0, "R"), (3.0, "N"), (4.0, "N"), (1.0, "R"), (4.0, "N")]
    li = spark.createDataFrame(rows, "l_quantity double, l_returnflag string")
    _patch(monkeypatch, {"lineitem": li})
    out = lrn.q_decision_stump(spark, SF).collect()
    top = out[0]
    assert top.threshold == 2
    assert top.impurity_micro == 0
    assert top.n_left == 3 and top.n_right == 3


def test_stump_impurity_formula(spark, monkeypatch):
    # one mixed side: q<=1 → (2 pos, 0 neg); right side (1 pos, 1 neg)
    rows = [(1.0, "R"), (1.0, "R"), (2.0, "R"), (2.0, "N")]
    li = spark.createDataFrame(rows, "l_quantity double, l_returnflag string")
    _patch(monkeypatch, {"lineitem": li})
    out = lrn.q_decision_stump(spark, SF).collect()
    # only threshold 1 is a candidate (threshold 2 keeps nothing right)
    assert [r.threshold for r in out] == [1]
    # left pure → 0; right 1/1 → 2*1*1*1e6 // 2 = 1_000_000
    assert out[0].impurity_micro == 1_000_000


# --------------------------------------------------------------------------
# Retrieval eval
# --------------------------------------------------------------------------


def test_retrieval_eval_known_ranking(spark, monkeypatch):
    # 2-d embeddings: cosine to q=(1,0) decreases with angle; labels make
    # ranks 1 and 3 relevant → P@10 = 2/10, MRR = 1, NDCG computable.
    def vec(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    rows = [(0, vec(0.0), 7)]
    angles = [5, 10, 15, 20, 25, 30, 35, 40, 45, 50]
    labels = [7, 1, 7, 1, 1, 1, 1, 1, 1, 1]  # ranks 1,3 relevant
    for i, (a, lb) in enumerate(zip(angles, labels), start=1):
        rows.append((i, vec(float(a)), lb))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    _patch(monkeypatch, {"embeddings": emb})
    got = lrn.q_retrieval_eval(spark, SF).collect()[0]
    assert got.n_rel == 2
    assert got.p_at_10_micro == 200_000
    assert got.mrr_micro == 1_000_000
    wq = lambda i: math.floor(1_000_000.0 / math.log2(i + 1.0) + lrn._QBIAS)  # noqa: E731
    dcg = wq(1) + wq(3)
    idcg = wq(1) + wq(2)
    assert got.ndcg_micro == (dcg * 1_000_000) // idcg


# --------------------------------------------------------------------------
# CF cosine
# --------------------------------------------------------------------------


def test_brand_cf_cosine_algebra(spark, monkeypatch):
    orders = spark.createDataFrame(
        [(100, 1), (101, 2), (102, 3)], "o_orderkey long, o_custkey long"
    )
    line = spark.createDataFrame(
        [(100, 10), (100, 11), (101, 10), (101, 11), (102, 12)],
        "l_orderkey long, l_partkey long",
    )
    part = spark.createDataFrame(
        [(10, "A"), (11, "B"), (12, "C")], "p_partkey long, p_brand string"
    )
    _patch(monkeypatch, {"orders": orders, "lineitem": line, "part": part})
    out = {(r.brand_a, r.brand_b): r for r in lrn.q_brand_cf_cosine(spark, SF).collect()}
    # A and B co-bought by customers 1,2 → cos² = 2²/(2·2) = 1 → 1e6
    assert out[("A", "B")].cos2_micro == 1_000_000
    assert out[("A", "B")].n_both == 2
    # C shares no customer with A/B → pair rows absent entirely
    assert ("A", "C") not in out and ("B", "C") not in out


# --------------------------------------------------------------------------
# Winnowing
# --------------------------------------------------------------------------


def _winnow_py(words, k=3, w=4):
    """Pure-Python reference: window-min with rightmost tie rule."""
    grams = [
        (" ".join(words[i : i + k])) for i in range(len(words) - k + 1)
    ]
    hs = [_hash64(g) for g in grams]
    m = len(hs)
    chosen = set()
    for s in range(1, max(1, m - w + 1) + 1):
        frame = [(hs[p - 1], -p) for p in range(s, min(s + w - 1, m) + 1)]
        hmin, negp = min(frame)
        chosen.add((-negp, hmin))
    return chosen


def test_winnowing_matches_python_reference(spark, monkeypatch):
    words = "a b c a b c d e f a b".lower().split()
    text = " ".join(words)
    docs = spark.createDataFrame(
        [(1, text, "en", "w", len(text)), (2, "x y", "en", "w", 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    _patch(monkeypatch, {"documents": docs})
    out = {r.doc_id: r for r in lrn.q_winnowing_fingerprint(spark, SF).collect()}
    ref = _winnow_py(words)
    assert out[1].n_fingerprints == len(ref)
    assert out[1].fp_checksum == sum(h % 1_000_000_007 for _, h in ref)
    # doc 2 has fewer than k words → no fingerprints, row absent
    assert 2 not in out


def test_winnowing_guarantee_on_real_docs(spark):
    # Schleimer guarantee: ≥1 fingerprint per window ⇒ for a doc with m
    # k-grams, the selection density is ≥ ceil(max(1, m-3) / 4) / m — at
    # minimum, every doc with ≥k words has ≥1 fingerprint.
    out = lrn.q_winnowing_fingerprint(spark, SF).collect()
    assert len(out) > 0
    assert all(r.n_fingerprints >= 1 for r in out)


# --------------------------------------------------------------------------
# Time-weighted average
# --------------------------------------------------------------------------


def test_twa_piecewise_constant_hold(spark, monkeypatch):
    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)

    def ts(sec):
        return datetime.fromtimestamp(t0.timestamp() + sec, tz=timezone.utc)

    rows = [
        (1, 1, ts(0), "view", 10.0, "{}"),
        (2, 1, ts(10), "view", 20.0, "{}"),
        (3, 1, ts(30), "view", 99.0, "{}"),  # terminal value carries no weight
        (4, 2, ts(0), "view", 5.0, "{}"),  # single event → span 0 → excluded
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double, props string"
    )
    _patch(monkeypatch, {"events": ev})
    out = {r.user_id: r for r in lrn.q_twa_event_value(spark, SF).collect()}
    # (10·10 + 20·20) / 30 = 16.666666… → 16_666_666 micro (floor)
    assert out[1].twa_micro == 16_666_666
    assert out[1].span_s == 30
    assert 2 not in out


# --------------------------------------------------------------------------
# l-diversity
# --------------------------------------------------------------------------


def test_l_diversity_flags_homogeneous_group(spark, monkeypatch):
    rows = [
        # nation 1 / SEG-A: three customers all in band 1 → l=1 → risky
        (1, "c1", 1, 1500.0, "A"),
        (2, "c2", 1, 1600.0, "A"),
        (3, "c3", 1, 1700.0, "A"),
        # nation 2 / SEG-B: three distinct bands → l=3 → safe
        (4, "c4", 2, 500.0, "B"),
        (5, "c5", 2, 1500.0, "B"),
        (6, "c6", 2, 2500.0, "B"),
    ]
    cust = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string"
    )
    _patch(monkeypatch, {"customer": cust})
    out = {(r.c_nationkey, r.c_mktsegment): r for r in lrn.q_l_diversity_audit(spark, SF).collect()}
    assert out[(1, "A")].l_distinct == 1 and out[(1, "A")].risky
    assert out[(2, "B")].l_distinct == 3 and not out[(2, "B")].risky


# --------------------------------------------------------------------------
# MASE
# --------------------------------------------------------------------------


def test_mase_perfect_seasonal_pattern_scores_zero(spark, monkeypatch):
    # value repeats with period 24h exactly → seasonal-naive error 0 →
    # MASE 0 while the hour-over-hour naive error is positive
    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = []
    for h in range(48):
        v = 10.0 if h % 24 == 0 else float(1 + (h % 24) % 3)
        rows.append((h, 1, datetime.fromtimestamp(t0.timestamp() + 3600 * h, tz=timezone.utc),
                     "view", v, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double, props string"
    )
    _patch(monkeypatch, {"events": ev})
    got = lrn.q_forecast_mase(spark, SF).collect()[0]
    assert got.n_hours == 48
    assert got.maes_micro == 0 and got.mase_milli == 0
    assert got.mae1_micro > 0


# --------------------------------------------------------------------------
# Markov P²
# --------------------------------------------------------------------------


def test_markov_2step_deterministic_cycle(spark, monkeypatch):
    # chain A→B→C→A… : P is a permutation matrix → P² is too (p2 = 1e6)
    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    seq = ["A", "B", "C"] * 4 + ["A"]
    rows = [
        (i, 1, datetime.fromtimestamp(t0.timestamp() + 60 * i, tz=timezone.utc), et, 1.0, "{}")
        for i, et in enumerate(seq)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double, props string"
    )
    _patch(monkeypatch, {"events": ev})
    got = {(r.from_type, r.to_type): r.p2_micro for r in lrn.q_markov_2step(spark, SF).collect()}
    assert got == {("A", "C"): 1_000_000, ("B", "A"): 1_000_000, ("C", "B"): 1_000_000}


# --------------------------------------------------------------------------
# PMI
# --------------------------------------------------------------------------


def test_pmi_collocation_beats_frequent_pair(spark, monkeypatch):
    # "san francisco" always co-occurs (perfect collocation); "the end"
    # shares 'the' with many other bigrams → lower PMI
    docs = []
    for i in range(6):
        docs.append((i, "san francisco is the end of the line of the day", "en", "w", 40))
    docs = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    _patch(monkeypatch, {"documents": docs})
    out = lrn.q_pmi_collocations(spark, SF).collect()
    pmi = {(r.w1, r.w2): r.pmi_unats for r in out}
    assert ("san", "francisco") in pmi
    assert pmi[("san", "francisco")] == max(pmi.values())
    if ("the", "end") in pmi:
        assert pmi[("san", "francisco")] > pmi[("the", "end")]


# --------------------------------------------------------------------------
# Rendezvous sharding
# --------------------------------------------------------------------------


def test_rendezvous_is_a_partition_and_matches_reference(spark):
    out = lrn.q_rendezvous_shards(spark, SF).collect()
    import duckdb

    n_docs, sum_ids = duckdb.sql(
        f"SELECT count(*), sum(doc_id) FROM '{SF}/documents.parquet'"
    ).fetchone()
    assert sum(r.n_docs for r in out) == n_docs
    assert sum(r.id_checksum for r in out) == sum_ids
    assert all(0 <= r.shard < lrn._HRW_SHARDS for r in out)


def test_rendezvous_python_reference_small(spark, monkeypatch):
    docs = spark.createDataFrame(
        [(i, "t", "en", "w", 1) for i in range(40)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    _patch(monkeypatch, {"documents": docs})
    got = {r.shard: (r.n_docs, r.id_checksum) for r in lrn.q_rendezvous_shards(spark, SF).collect()}

    from collections import defaultdict

    ref = defaultdict(lambda: [0, 0])
    for d in range(40):
        best = max((_hash64(f"{s}:{d}"), s) for s in range(lrn._HRW_SHARDS))[1]
        ref[best][0] += 1
        ref[best][1] += d
    assert got == {s: tuple(v) for s, v in ref.items()}


# --------------------------------------------------------------------------
# Containment
# --------------------------------------------------------------------------


def test_containment_detects_subset_duplication(spark, monkeypatch):
    quote = "alpha beta gamma delta epsilon zeta"          # 6 words → 2 grams
    host = quote + " eta theta iota kappa lam mu nu xi"     # quote embedded
    other = "one two three four five six seven eight nine"  # disjoint
    docs = spark.createDataFrame(
        [(1, quote, "en", "w", 1), (2, host, "en", "w", 1), (3, other, "en", "w", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    _patch(monkeypatch, {"documents": docs})
    out = {(r.doc_a, r.doc_b): r for r in lrn.q_ngram_containment(spark, SF).collect()}
    # quote fully contained in host: C(1→2) = 1.0
    assert out[(1, 2)].containment_micro == 1_000_000
    # host only partially covered by quote → below the 0.6 gate → absent
    assert (2, 1) not in out
    # disjoint doc pairs never appear
    assert all(3 not in k for k in out)


# --------------------------------------------------------------------------
# JL projection
# --------------------------------------------------------------------------


def test_jl_unit_vector_ratio_is_exact(spark, monkeypatch):
    # b − a = 1000·e₀ after quantization → every projected coordinate
    # differs by ±1000 → d2_proj = 16·10⁶ → normalized ratio exactly 1e6
    zero = [0.0] * 64
    e0 = [1.0] + [0.0] * 63
    emb = spark.createDataFrame(
        [(0, zero, 1), (1, e0, 1)], "vec_id long, embedding array<float>, label int"
    )
    _patch(monkeypatch, {"embeddings": emb})
    out = lrn.q_jl_projection_distortion(spark, SF).collect()
    assert len(out) == 1
    r = out[0]
    assert r.d2_orig == 1_000_000
    assert r.d2_proj == lrn._JL_K * 1_000_000
    assert r.ratio_micro == 1_000_000


def test_jl_distortion_concentrates_on_real_embeddings(spark):
    # JL guarantee: with K=16 the per-pair ratio concentrates around 1e6;
    # all 50 pairs should land within a loose [0.2, 2.2]×1e6 band and the
    # mean within [0.7, 1.3]×1e6
    out = lrn.q_jl_projection_distortion(spark, SF).collect()
    assert len(out) == 50
    ratios = [r.ratio_micro for r in out]
    assert all(200_000 <= x <= 2_200_000 for x in ratios), sorted(ratios)[:3]
    mean = sum(ratios) / len(ratios)
    assert 700_000 <= mean <= 1_300_000


# --------------------------------------------------------------------------
# Kaplan-Meier
# --------------------------------------------------------------------------


def _km_reference(users):
    """users: list of (dur_days, observed). Returns the expected rows."""
    from collections import defaultdict

    day = defaultdict(lambda: [0, 0])  # dur -> [deaths, at_risk_entering... ]
    for dur, obs in users:
        day[dur][0] += obs
        day[dur][1] += 1
    out, cum = [], 0
    total = len(users)
    seen = 0
    for t in sorted(day):
        d, r = day[t]
        n_risk = total - seen
        seen += r
        if d == 0:
            continue
        if d < n_risk:
            cum += math.floor(
                math.log((n_risk - d) / n_risk) * 1_000_000.0 + lrn._QBIAS
            )
            out.append((t, n_risk, d, cum))
        else:
            out.append((t, n_risk, d, None))
    return out


def test_kaplan_meier_crafted_censoring(spark, monkeypatch):
    # day 0 = 2024-01-01. users 1,2 convert day 2; user 3 converts day 5;
    # user 4 NEVER converts and is censored at day 3 (leaves the risk set
    # without being a death); user 5 converts day 8 after the censoring.
    def ts(day, hour=0):
        return datetime(2024, 1, 1 + day, hour, tzinfo=timezone.utc).replace(
            tzinfo=None
        )

    rows = []
    eid = 0
    for u, conv_day in ((1, 2), (2, 2), (3, 5), (5, 8)):
        rows.append((eid, ts(0), u, "view", 1.0, "{}")); eid += 1
        rows.append((eid, ts(conv_day), u, "purchase", 1.0, "{}")); eid += 1
    rows.append((eid, ts(0), 4, "view", 1.0, "{}")); eid += 1
    rows.append((eid, ts(3), 4, "click", 1.0, "{}")); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    _patch(monkeypatch, {"events": ev})
    got = [
        (r.dur_days, r.n_risk, r.n_deaths, r.surv_unats)
        for r in lrn.q_kaplan_meier_retention(spark, SF).collect()
    ]
    want = _km_reference([(2, 1), (2, 1), (5, 1), (8, 1), (3, 0)])
    assert got == want
    # censored user 4 must shrink the risk set between day 2 and day 5
    by_day = {t: n for t, n, _d, _s in got}
    assert by_day[2] == 5 and by_day[5] == 2 and by_day[8] == 1
    # the last conversion empties the risk set -> exact-zero survival = NULL
    assert got[-1][3] is None


def test_kaplan_meier_survival_monotone_on_real_data(spark):
    rows = lrn.q_kaplan_meier_retention(spark, SF).collect()
    assert len(rows) > 0
    surv = [r.surv_unats for r in rows if r.surv_unats is not None]
    assert all(a >= b for a, b in zip(surv, surv[1:]))  # non-increasing
    assert all(s <= 0 for s in surv)  # log-space survival <= ln(1)


# --------------------------------------------------------------------------
# PCA power iteration
# --------------------------------------------------------------------------


def _pca_reference(q_rows):
    """Pure-Python replica of the exact integer recurrence (floor division
    throughout, max-norm clamped at 1)."""
    D = lrn._PCA_D
    n = len(q_rows)
    sx = [sum(r[i] for r in q_rows) for i in range(D)]
    sxy = [[sum(r[i] * r[j] for r in q_rows) for j in range(D)] for i in range(D)]
    cov = [[n * sxy[i][j] - sx[i] * sx[j] for j in range(D)] for i in range(D)]
    maxcov = max(1, max(abs(c) for row in cov for c in row))
    c = [[(cov[i][j] * 1_000_000) // maxcov for j in range(D)] for i in range(D)]
    v = [1_000_000] * D
    for _ in range(2):
        u = [sum(c[i][j] * v[j] for j in range(D)) for i in range(D)]
        m = max(1, max(abs(x) for x in u))
        v = [(u[i] * 1_000_000) // m for i in range(D)]
    return v


def _quantized_embeddings(sf):
    import pyarrow.parquet as pq

    emb = pq.read_table(f"{sf}/embeddings.parquet").column("embedding").to_pylist()
    return [
        [math.floor(x * 1000.0 + lrn._QBIAS) for x in e[: lrn._PCA_D]] for e in emb
    ]


def test_pca_matches_python_reference_and_rayleigh_monotone(spark):
    import numpy as np

    rows = lrn.q_pca_power_iteration(spark, SF).collect()
    assert [r.dim_idx for r in rows] == list(range(lrn._PCA_D))
    v = [r.loading_unit for r in rows]
    assert max(abs(x) for x in v) == 1_000_000  # max-normalized
    q = _quantized_embeddings(SF)
    assert v == _pca_reference(q)  # bit-exact integer recurrence
    # the iterate really climbs the spectrum: Rayleigh quotient of the
    # result beats the all-ones start (power-method progress guarantee)
    qa = np.array(q, dtype=float)
    cov = len(q) * (qa.T @ qa) - np.outer(qa.sum(0), qa.sum(0))
    ray = lambda x: (x @ cov @ x) / (x @ x)  # noqa: E731
    assert ray(np.array(v, dtype=float)) > ray(np.ones(lrn._PCA_D))


def test_pca_converges_on_dominant_direction(spark, monkeypatch):
    # embeddings with a strong first-axis component: after 2 integer
    # power-iteration rounds the loading must align with axis 0
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(0, 0.05, (200, lrn._PCA_D))
    base[:, 0] += rng.choice([-1.0, 1.0], 200) * 0.9  # dominant axis
    rows = [(i, [float(x) for x in base[i]] + [0.0] * 56, 0) for i in range(200)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    _patch(monkeypatch, {"embeddings": emb})
    got = [r.loading_unit for r in lrn.q_pca_power_iteration(spark, SF).collect()]
    v = np.array(got, dtype=float)
    assert abs(v[0]) == 1_000_000  # axis 0 carries the max loading
    assert (np.abs(v[1:]) < 250_000).all()  # the rest are noise-scale


def test_pca_plan_has_single_aggregate_no_join(spark):
    plan = (
        lrn.q_pca_power_iteration(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the only data-sized stage is the one moment aggregate; the solve is
    # pure projection arithmetic on the 1-row frame
    assert "Join" not in plan
    assert "Window" not in plan


# --------------------------------------------------------------------------
# ROC AUC
# --------------------------------------------------------------------------


def _auc_reference(pairs):
    """pairs: (cents, is_pos). Exact midrank Mann-Whitney, carried x2."""
    from collections import Counter

    cnt, pos = Counter(), Counter()
    for c, p in pairs:
        cnt[c] += 1
        pos[c] += p
    less, s2 = 0, 0
    for c in sorted(cnt):
        s2 += pos[c] * (2 * less + cnt[c] + 1)
        less += cnt[c]
    n_pos = sum(pos.values())
    n_neg = sum(cnt.values()) - n_pos
    u2 = s2 - n_pos * (n_pos + 1)
    return n_pos, n_neg, u2, (u2 * 1_000_000) // (2 * n_pos * n_neg)


def test_roc_auc_crafted_ties_and_perfect_split(spark, monkeypatch):
    # Monday: positives always score higher -> AUC exactly 1.
    # Tuesday: scores identical across classes -> AUC exactly 0.5 (midranks).
    rows, eid = [], 0
    for v, et in ((1.0, "view"), (2.0, "view"), (3.0, "purchase"), (4.0, "purchase")):
        rows.append((eid, datetime(2024, 1, 1), v, et)); eid += 1  # a Monday
    for v, et in ((5.0, "view"), (5.0, "purchase"), (5.0, "view"), (5.0, "purchase")):
        rows.append((eid, datetime(2024, 1, 2), v, et)); eid += 1  # a Tuesday
    ev = spark.createDataFrame(
        [(i, ts, 7, et, v, "{}") for (i, ts, v, et) in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    _patch(monkeypatch, {"events": ev})
    got = {r.dow: (r.n_pos, r.n_neg, r.u2, r.auc_micro)
           for r in lrn.q_roc_auc_by_dow(spark, SF).collect()}
    assert got[1] == (2, 2, 8, 1_000_000)  # perfect ranking
    assert got[2] == (2, 2, 4, 500_000)  # all tied -> exactly 0.5


def test_roc_auc_matches_python_reference(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/events.parquet", columns=["ts", "event_type", "value"])
    by_dow = {}
    for ts, et, v in zip(
        t.column("ts").to_pylist(),
        t.column("event_type").to_pylist(),
        t.column("value").to_pylist(),
    ):
        if et not in ("view", "purchase"):
            continue
        dow = ts.isoweekday()
        by_dow.setdefault(dow, []).append(
            (math.floor(v * 100.0 + lrn._QBIAS), int(et == "purchase"))
        )
    got = {r.dow: (r.n_pos, r.n_neg, r.u2, r.auc_micro)
           for r in lrn.q_roc_auc_by_dow(spark, SF).collect()}
    want = {d: _auc_reference(p) for d, p in by_dow.items()}
    assert got == want


# --------------------------------------------------------------------------
# Calibration + Zipf
# --------------------------------------------------------------------------


def test_calibration_bins_rates(spark, monkeypatch):
    # bin 0: 3 views + 1 purchase -> 250000 micro; bin 1: pure purchases
    rows = []
    for i, (v, et) in enumerate(
        [(10.0, "view"), (20.0, "view"), (30.0, "view"), (35.0, "purchase"),
         (45.0, "purchase"), (50.0, "purchase")]
    ):
        rows.append((i, datetime(2024, 1, 1), 1, et, v, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    _patch(monkeypatch, {"events": ev})
    got = {r.bin_id: (r.n, r.n_pos, r.rate_micro) for r in
           lrn.q_calibration_bins(spark, SF).collect()}
    assert got[0] == (4, 1, 250_000)
    assert got[1] == (2, 2, 1_000_000)


def test_zipf_slope_negative_and_replica(spark):
    import pyarrow.parquet as pq
    from collections import Counter

    row = lrn.q_zipf_fit_slope(spark, SF).collect()[0]
    assert row.zipf_slope < 0  # frequency falls with rank, always
    # pure-Python replica of the whole pipeline
    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    wc = Counter()
    for text in t.column("text").to_pylist():
        wc.update(w for w in text.lower().split() if w)
    top = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[: lrn._ZIPF_TOP]
    n = len(top)
    xs = [math.floor(math.log(r) * 1e6 + lrn._QBIAS) for r in range(1, n + 1)]
    ys = [math.floor(math.log(c) * 1e6 + lrn._QBIAS) for _w, c in top]
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (float(n) * float(sxy) - float(sx) * float(sy)) / (
        float(n) * float(sxx) - float(sx) * float(sx)
    )
    assert row.n_words == n
    assert abs(row.zipf_slope - slope) < 1e-5
