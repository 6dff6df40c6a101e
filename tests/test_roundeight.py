"""Semantics tests for the round-8 sampling / hygiene / contamination specs:
UniMax waterfilling vs a pure-Python reference, A-ES key algebra, PII scrub
accounting, epoch-shuffle determinism, boilerplate-vs-c4 distinction, and
contamination flagging of a planted duplicate."""

import pyspark.sql.functions as F

import projet_data_infrastructure_spark.plans.advanced as adv
import projet_data_infrastructure_spark.plans.corpus_lm as cl
import projet_data_infrastructure_spark.plans.ml_eval as mle
import projet_data_infrastructure_spark.plans.streaming_parity as spar
import projet_data_infrastructure_spark.plans.survival as sv

SF = "/root/testdata/sf0.001"


def _with_docs(monkeypatch, docs):
    monkeypatch.setattr(cl, "read_table_balanced", lambda sp, sf, name: docs)


# ---------------------------------------------------------------- UniMax


def _unimax_reference(caps: dict[str, int], budget: int) -> dict[str, int]:
    """Exact waterfill in plain Python: grow the capped prefix greedily."""
    order = sorted(caps, key=lambda l: (caps[l], l))
    L = len(order)
    capped, p = [], 0
    for i, lang in enumerate(order):
        if p + caps[lang] * (L - i) <= budget:
            capped.append(lang)
            p += caps[lang]
        else:
            break
    theta = (budget - p) // (L - len(capped)) if len(capped) < L else 0
    return {l: (caps[l] if l in capped else theta) for l in caps}


def test_unimax_matches_python_reference(spark, monkeypatch):
    # skewed corpus: tiny 'aa' and 'bb' must cap, big 'cc' takes theta
    rows = (
        [(i, "x y z", "aa") for i in range(2)]
        + [(10 + i, "x y z w", "bb") for i in range(3)]
        + [(20 + i, " ".join(["t"] * 10), "cc") for i in range(20)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    _with_docs(monkeypatch, docs)
    out = {r.lang: r for r in cl.q_unimax_sampling_plan(spark, SF).collect()}
    caps = {"aa": 6, "bb": 12, "cc": 200}
    budget = (sum(caps.values()) * cl._UNIMAX_BUDGET_NUM) // cl._UNIMAX_BUDGET_DEN
    ref = _unimax_reference(caps, budget)
    assert {l: r.alloc_tokens for l, r in out.items()} == ref
    assert out["aa"].capped == 1 and out["bb"].capped == 1 and out["cc"].capped == 0
    # never over budget, never over cap
    assert sum(r.alloc_tokens for r in out.values()) <= budget
    assert all(r.alloc_tokens <= r.cap for r in out.values())


def test_unimax_real_corpus_invariants(spark):
    rows = cl.q_unimax_sampling_plan(spark, SF).collect()
    budget = (sum(r.lang_tokens for r in rows) * cl._UNIMAX_BUDGET_NUM) // (
        cl._UNIMAX_BUDGET_DEN
    )
    assert sum(r.alloc_tokens for r in rows) <= budget
    thetas = {r.alloc_tokens for r in rows if r.capped == 0}
    assert len(thetas) <= 1  # all uncapped languages share one theta
    assert all(r.alloc_tokens == r.cap for r in rows if r.capped == 1)


# ---------------------------------------------------------------- PII


def test_pii_counts_and_redaction(spark):
    rows = cl.q_pii_redaction_scan(spark, SF).collect()
    assert all(r.n_emails >= 1 and r.n_ips >= 1 and r.n_phones >= 1 for r in rows)
    # redaction strictly shrinks (footer PII is longer than '[PII]')
    assert all(r.redacted_len < r.orig_len for r in rows)


# ----------------------------------------------------- epoch shuffle


def test_epoch_shuffle_manifest_is_deterministic_and_complete(spark):
    a = cl.q_epoch_shuffle_manifest(spark, SF).collect()
    b = cl.q_epoch_shuffle_manifest(spark, SF).collect()
    assert a == b
    assert all(0 <= r.shard < cl._SHUFFLE_SHARDS for r in a)
    from projet_data_infrastructure_spark.sources.readers import read_table

    n = read_table(spark, SF, "documents").count()
    assert sum(r.n_docs for r in a) == n


# ----------------------------------------------------- boilerplate


def test_boilerplate_flags_template_in_every_doc(spark, monkeypatch):
    # 'cookie banner here' appears in 3 docs -> boilerplate in ALL of them
    # (c4_line_dedup would keep the first); unique lines stay clean.
    rows = [
        (1, "cookie banner here real content one", "en"),
        (2, "cookie banner here other stuff two", "en"),
        (3, "cookie banner here more words three", "en"),
        (4, "completely unique document body four", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    _with_docs(monkeypatch, docs)
    out = {r.doc_id: r for r in cl.q_boilerplate_line_df(spark, SF).collect()}
    from projet_data_infrastructure_spark.plans.llm_queries import _C4_LINE_WORDS

    if _C4_LINE_WORDS == 5:
        # line 0 of docs 1-3 = 'cookie banner here real content' etc — these
        # differ after word 3, so craft the assertion on the shared prefix
        # only when lines align; the invariant that always holds:
        assert out[4].n_boiler == 0
    assert all(r.n_lines >= 1 for r in out.values())


def test_boilerplate_exact_shared_lines(spark, monkeypatch):
    from projet_data_infrastructure_spark.plans.llm_queries import _C4_LINE_WORDS

    shared = " ".join(["tpl"] * _C4_LINE_WORDS)
    uniq = lambda i: " ".join([f"u{i}{j}" for j in range(_C4_LINE_WORDS)])
    rows = [(i, f"{shared} {uniq(i)}", "en") for i in range(1, 4)] + [
        (4, f"{uniq(4)} {uniq(5)}", "en")
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    _with_docs(monkeypatch, docs)
    out = {r.doc_id: r for r in cl.q_boilerplate_line_df(spark, SF).collect()}
    assert out[1].n_boiler == out[2].n_boiler == out[3].n_boiler == 1
    assert out[1].n_lines == 2 and out[1].boiler_micro == 500_000
    assert out[4].n_boiler == 0 and out[4].boiler_micro == 0


# ----------------------------------------------------- contamination


def test_contamination_flags_planted_duplicate(spark, monkeypatch):
    import random

    rng = random.Random(7)
    dim = 8
    vecs = []
    for vid in range(40):
        vecs.append((vid, [rng.uniform(-1, 1) for _ in range(dim)], 0))
    # eval vec 30 (30 % 10 == 0) := exact copy of train vec 31
    vecs[30] = (30, list(vecs[31][1]), 0)
    emb = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    )
    monkeypatch.setattr(cl, "read_table", lambda sp, sf, name: emb)
    out = {r.eval_id: r for r in cl.q_semantic_contamination(spark, SF).collect()}
    assert out[30].train_id == 31
    assert abs(out[30].cos_sim - 1.0) < 1e-5
    assert out[30].contaminated == 1


# ----------------------------------------------------- temperature


def test_temperature_flattens_distribution(spark):
    rows = cl.q_temperature_sampling_weights(spark, SF).collect()
    raw = {r.lang: r.raw_share_r for r in rows}
    temp = {r.lang: r.temp_share_r for r in rows}
    assert abs(sum(raw.values()) - 1.0) < 1e-4
    assert abs(sum(temp.values()) - 1.0) < 1e-4
    big = max(raw, key=raw.get)
    small = min(raw, key=raw.get)
    assert temp[big] < raw[big]  # head shrinks
    assert temp[small] > raw[small]  # tail grows


# ----------------------------------------------------- fertility


def test_fertility_at_least_one_subword_per_word(spark):
    rows = cl.q_tokenizer_fertility_by_lang(spark, SF).collect()
    assert all(r.fertility_micro >= 1_000_000 for r in rows)
    assert all(r.n_subwords >= r.n_words for r in rows)


# ----------------------------------------------------- span corruption


def test_span_corruption_matches_python_recompute(spark):
    import hashlib

    def coin(doc_id, pos):
        h = int(
            hashlib.md5(f"{cl._SPAN_SEED}:{doc_id}:{pos}".encode()).hexdigest()[:15],
            16,
        )
        return h % 100 < cl._SPAN_PCT

    from projet_data_infrastructure_spark.sources.readers import read_table

    rows = {r.doc_id: r for r in cl.q_span_corruption_masks(spark, SF).collect()}
    docs = read_table(spark, SF, "documents").select("doc_id", "text").limit(5).collect()
    for d in docs:
        toks = d.text.split()
        masked = [coin(d.doc_id, p) for p in range(len(toks))]
        n_masked = sum(masked)
        n_spans = sum(
            1 for p, m in enumerate(masked) if m and (p == 0 or not masked[p - 1])
        )
        r = rows[d.doc_id]
        assert (r.n_tokens, r.n_masked, r.n_spans) == (len(toks), n_masked, n_spans)
    # global: spans never exceed masked positions; rate near 15%
    tot_m = sum(r.n_masked for r in rows.values())
    tot_t = sum(r.n_tokens for r in rows.values())
    assert all(r.n_spans <= r.n_masked for r in rows.values())
    assert 0.10 < tot_m / tot_t < 0.20


# ----------------------------------------------------- keep-best


def test_keepbest_picks_longest_then_smallest_id(spark, monkeypatch):
    import projet_data_infrastructure_spark.plans.llm_queries as llm

    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)], "doc_id long, component long"
    )

    class _FakeDedup:
        @staticmethod
        def minhash_signatures(docs):
            return docs

        @staticmethod
        def lsh_candidate_pairs(sig):
            return sig

        @staticmethod
        def duplicate_clusters(pairs):
            return comp

    docs = spark.createDataFrame(
        [(1, "x", "en", 10), (2, "x", "en", 30), (3, "x", "en", 30),
         (7, "x", "en", 5), (8, "x", "en", 4), (9, "x", "en", 99)],
        "doc_id long, text string, lang string, n_chars long",
    )
    monkeypatch.setattr(cl, "read_table_balanced", lambda sp, sf, n: docs)
    monkeypatch.setattr(cl, "read_table", lambda sp, sf, n: docs)
    import projet_data_infrastructure_spark.operators.dedup as dd

    monkeypatch.setattr(dd, "minhash_signatures", _FakeDedup.minhash_signatures)
    monkeypatch.setattr(dd, "lsh_candidate_pairs", _FakeDedup.lsh_candidate_pairs)
    monkeypatch.setattr(dd, "duplicate_clusters", _FakeDedup.duplicate_clusters)
    out = {r.component: r for r in cl.q_dedup_keepbest_canonical(spark, SF).collect()}
    # cluster 1: docs 2 and 3 tie at 30 chars -> smallest id (2) wins
    assert out[1].canonical_doc == 2 and out[1].canonical_chars == 30
    assert out[1].cluster_size == 3 and out[1].dropped_chars == 40
    # cluster 7: doc 7 (5 chars) beats doc 8 (4)
    assert out[7].canonical_doc == 7 and out[7].dropped_chars == 4


# ----------------------------------------------------- curriculum


def test_curriculum_phases_are_balanced_and_ordered(spark):
    rows = sorted(
        cl.q_curriculum_length_phases(spark, SF).collect(), key=lambda r: r.phase
    )
    assert [r.phase for r in rows] == list(range(cl._CURRICULUM_PHASES))
    sizes = [r.n_docs for r in rows]
    assert max(sizes) - min(sizes) <= 1  # exact-balance cut
    for a, b in zip(rows, rows[1:]):
        assert a.max_chars <= b.min_chars or a.max_chars == b.min_chars


# ----------------------------------------------------- OOV


def test_oov_rates_are_valid_shares(spark):
    rows = cl.q_oov_rate_by_lang(spark, SF).collect()
    assert all(0 <= r.oov_micro <= 1_000_000 for r in rows)
    assert all(r.n_oov <= r.n_tokens for r in rows)
    assert len(rows) == 5


# ----------------------------------------------------- incremental dedup


def test_incremental_dedup_matches_only_across_index_boundary(spark, monkeypatch):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (2, base, "en", len(base)),                 # index (even)
        (3, base + " extra", "en", len(base) + 6),  # new  (odd) near-copy of 2
        (5, base + " other", "en", len(base) + 6),  # new near-copy of 2 AND 3
        (7, "totally different words here nothing shared at all okay", "en", 50),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, n_chars long")
    monkeypatch.setattr(cl, "read_table_balanced", lambda sp, sf, n: docs)
    out = {r.new_doc: r for r in cl.q_incremental_index_dedup(spark, SF).collect()}
    # both odd docs match index doc 2; the odd-odd pair (3,5) is NOT emitted
    assert set(out) == {3, 5}
    assert out[3].matched_index_doc == 2 and out[5].matched_index_doc == 2
    # doc 3 vs 2: tokens 10 shared / 11 union -> 909090 micro
    assert out[3].jac_micro == (1_000_000 * 10) // 11


# ----------------------------------------------------- tokenset dedup


def test_tokenset_groups_reordered_copy(spark, monkeypatch):
    rows = [
        (1, "the quick brown fox", "en", 19),
        (2, "fox brown quick the", "en", 19),       # reordered copy of 1
        (3, "the quick quick brown fox fox", "en", 29),  # re-repeated copy
        (4, "something else entirely", "en", 23),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, n_chars long")
    monkeypatch.setattr(cl, "read_table_balanced", lambda sp, sf, n: docs)
    out = cl.q_tokenset_dedup_groups(spark, SF).collect()
    assert len(out) == 1
    g = out[0]
    assert g.keep_doc == 1 and g.n_docs == 3 and g.n_variants == 3


# ----------------------------------------------------- entropy


def test_char_entropy_matches_python_recompute(spark):
    import math
    from collections import Counter

    from projet_data_infrastructure_spark.sources.readers import read_table

    rows = {r.doc_id: r for r in cl.q_char_entropy_quality(spark, SF).collect()}
    docs = read_table(spark, SF, "documents").select("doc_id", "text").limit(4).collect()
    for d in docs:
        cnt = Counter(d.text)
        n = sum(cnt.values())
        ent = sum(
            c * math.floor(-math.log(c / n) * 1e6 + cl._ENT_QBIAS) for c in cnt.values()
        ) // n
        r = rows[d.doc_id]
        assert r.n_chars_counted == n
        assert r.entropy_unats == ent


def test_char_entropy_flags_repetitive_junk(spark, monkeypatch):
    rows = [
        (1, "a" * 200, "en", 200),                       # 0 nats
        (2, "ab" * 100, "en", 200),                      # ln 2 = 0.69 nats
        (3, "the quick brown fox jumps over the lazy dog " * 4, "en", 180),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, n_chars long")
    monkeypatch.setattr(cl, "read_table_balanced", lambda sp, sf, n: docs)
    out = {r.doc_id: r for r in cl.q_char_entropy_quality(spark, SF).collect()}
    assert out[1].entropy_unats == 0 and out[1].low_entropy == 1
    assert out[2].low_entropy == 1
    assert out[3].low_entropy == 0  # prose clears 3 nats


# ----------------------------------------------------- calibration


def test_minhash_calibration_bins_are_sane(spark):
    import projet_data_infrastructure_spark.operators.dedup as dd

    rows = sorted(
        cl.q_minhash_calibration_bins(spark, SF).collect(), key=lambda r: r.n_match
    )
    assert rows, "LSH candidates must exist in the shipped corpus"
    assert all(0 <= r.n_match <= dd.MINHASH_HASHES for r in rows)
    assert all(0 <= r.min_jac_micro <= r.max_jac_micro <= 1_000_000 for r in rows)
    # more agreeing components => (weakly) higher exact similarity
    assert rows[-1].mean_jac_micro >= rows[0].mean_jac_micro


# ----------------------------------------------------- streaming funnel


def test_stream_funnel_equals_batch_funnel(spark):
    from projet_data_infrastructure_spark.plans.advanced import q_funnel_conversion

    stream = {
        r.user_id: (r.first_view, r.first_purchase, r.seconds_to_convert)
        for r in spar.q_stream_funnel_conversion(spark, SF).collect()
    }
    batch = {
        r.user_id: (r.first_view, r.first_purchase, r.seconds_to_convert)
        for r in q_funnel_conversion(spark, SF).collect()
    }
    assert stream == batch  # stream == batch, cross-execution-mode


# ----------------------------------------------------- normalization


def test_normalize_text_stats_recompute(spark, monkeypatch):
    import hashlib
    import re as _re

    rows = [
        (1, "  Hello,   WORLD!!  123 ", "en", 24),
        (2, "no-change text", "en", 14),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, n_chars long")
    _with_docs(monkeypatch, docs)
    out = {r.doc_id: r for r in cl.q_normalize_text_stats(spark, SF).collect()}
    for doc_id, text, _, _ in rows:
        lowered = text.strip().lower()
        collapsed = _re.sub(r"\s+", " ", lowered)
        stripped = _re.sub(r"[^a-z0-9 ]", "", collapsed)
        r = out[doc_id]
        assert r.n_chars_raw == len(text)
        assert r.n_ws_collapsed == len(lowered) - len(collapsed)
        assert r.n_punct_removed == len(collapsed) - len(stripped)
        assert r.n_chars_norm == len(stripped)
        assert r.norm_digest == hashlib.md5(stripped.encode()).hexdigest()


# ----------------------------------------------------- keyless range join


def test_keyless_range_join_counts_exact_window(spark, monkeypatch):
    from datetime import datetime

    H = 3_600  # seconds
    base = datetime(2024, 1, 1, 12, 0, 0)

    def at(sec):
        return datetime.fromtimestamp(base.timestamp() + sec)

    rows = [
        (1, at(0), 10, "purchase", 1.0, "{}"),
        (2, at(-H), 11, "signup", None, "{}"),        # exactly 1h before: EXCLUDED (>)
        (3, at(-H + 1), 12, "signup", None, "{}"),    # inside window
        (4, at(0), 13, "signup", None, "{}"),         # same instant: INCLUDED (<=)
        (5, at(1), 14, "signup", None, "{}"),         # after: excluded
        (6, at(-2 * H), 15, "signup", None, "{}"),    # far before: excluded
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    monkeypatch.setattr(adv, "read_table", lambda sp, sf, n: ev)
    out = {r.event_id: r.n_signups_prev_hour for r in
           adv.q_range_join_keyless_bucketed(spark, SF).collect()}
    assert out == {1: 2}


# ----------------------------------------------------- log-rank


def test_logrank_matches_lifelines_style_reference(spark, monkeypatch):
    # hand-built cohort: arm decided by the hash coin is bypassed — instead
    # craft users whose hash64 parity is known by probing, then verify the
    # statistic against a pure-Python log-rank computation.
    import hashlib
    import math
    from datetime import datetime, timedelta

    def arm_of(uid):
        h = int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16)
        return h % 2

    base = datetime(2024, 1, 1)
    rows = []
    eid = 0
    # users 1..12: first event at base; purchasers buy at day (uid % 5 + 1)
    cohort = {}
    for uid in range(1, 13):
        rows.append((eid, base, uid, "view", None, "{}")); eid += 1
        if uid % 3 != 0:  # two thirds purchase
            dur = uid % 5 + 1
            rows.append((eid, base + timedelta(days=dur), uid, "purchase", 1.0, "{}")); eid += 1
            cohort[uid] = (dur, 1)
        else:  # censored at their last view, day (uid % 4 + 2)
            dur = uid % 4 + 2
            rows.append((eid, base + timedelta(days=dur), uid, "view", None, "{}")); eid += 1
            cohort[uid] = (dur, 0)
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    monkeypatch.setattr(sv, "read_table", lambda sp, sf, n: ev)
    got = sv.q_logrank_test(spark, SF).collect()[0]

    # pure-Python log-rank over the same cohort
    entries = [(cohort[u][0], cohort[u][1], arm_of(u)) for u in cohort]
    times = sorted({t for t, o, _ in entries if o == 1})
    num = var = 0.0
    n_times = 0
    for t in times:
        at_risk = [(o, a) for (d, o, a) in entries if d >= t]
        deaths = [(o, a) for (d, o, a) in entries if d == t and o == 1]
        nt, n1 = len(at_risk), sum(1 for _, a in at_risk if a == 1)
        dt, d1 = len(deaths), sum(1 for _, a in deaths if a == 1)
        if dt == 0 or nt <= 1:
            continue
        n_times += 1
        num += d1 - dt * n1 / nt
        var += (dt * n1 * (nt - n1) * (nt - dt)) / (nt * nt * (nt - 1.0))
    assert got.n_times == n_times
    assert abs(got.obs_minus_exp_r - num) < 1e-4
    assert abs(got.var_r - var) < 1e-4
    assert abs(got.z_r - num / math.sqrt(var)) < 1e-4


# ----------------------------------------------------- three-step funnel


def test_funnel_three_step_strict_order(spark, monkeypatch):
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)

    def at(m):
        return base + timedelta(minutes=m)

    rows = [
        # user 1: full strict path
        (1, at(0), 1, "view", None, "{}"),
        (2, at(5), 1, "click", None, "{}"),
        (3, at(9), 1, "purchase", 1.0, "{}"),
        # user 2: click BEFORE first view -> not clicked_after_view
        (4, at(1), 2, "click", None, "{}"),
        (5, at(2), 2, "view", None, "{}"),
        # user 3: purchase before click -> viewed + clicked, not purchased
        (6, at(0), 3, "view", None, "{}"),
        (7, at(1), 3, "purchase", 1.0, "{}"),
        (8, at(2), 3, "click", None, "{}"),
        # user 4: never views -> excluded entirely
        (9, at(0), 4, "click", None, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    monkeypatch.setattr(adv, "read_table", lambda sp, sf, n: ev)
    got = adv.q_funnel_three_step(spark, SF).collect()[0]
    assert got.n_viewed == 3
    assert got.n_clicked_after_view == 2  # users 1 and 3
    assert got.n_purchased_after_click == 1  # user 1 only
    assert got.n_viewed >= got.n_clicked_after_view >= got.n_purchased_after_click


# ----------------------------------------------------- quantile normalize


def test_quantile_normalize_bounds_and_ranks(spark):
    rows = mle.q_quantile_normalize_scores(spark, SF).collect()
    assert all(0 < r.qn_micro < 1_000_000 for r in rows)
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        rs = sorted(rs, key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        lens = [r.len for r in rs]
        assert lens == sorted(lens)  # rank follows length
        qns = [r.qn_micro for r in rs]
        assert qns == sorted(qns)
