"""Semantics tests for the analytic specs: exact OLS slope, blocked
Levenshtein pairs, nearest-rank percentile length gate."""

import datetime as dt

import projet_data_infrastructure_spark.plans.advanced as adv
import projet_data_infrastructure_spark.plans.llm_queries as lq

SF = "/root/testdata/sf0.001"


def test_regression_slope_exact_on_linear_data(spark):
    """y(cents) = 7x + 500 exactly → slope is exactly 7.0 (integer algebra,
    no float noise)."""
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, i, t0 + dt.timedelta(seconds=i * 10), (7 * (i * 10) + 500) / 100.0)
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp_ntz, value double")
    orig = adv.read_table
    try:
        adv.read_table = lambda sp, sf, name: df
        out = adv.q_regression_slope(spark, SF).collect()
    finally:
        adv.read_table = orig
    assert len(out) == 1
    assert out[0].n_events == 20
    assert out[0].slope_cents_per_sec == 7.0


def test_regression_slope_null_for_single_point(spark):
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, 1, t0, 5.0)], "user_id long, event_id long, ts timestamp_ntz, value double"
    )
    orig = adv.read_table
    try:
        adv.read_table = lambda sp, sf, name: df
        out = adv.q_regression_slope(spark, SF).collect()
    finally:
        adv.read_table = orig
    assert out[0].slope_cents_per_sec is None


def test_levenshtein_pairs_block_and_threshold(spark):
    """Only same-brand pairs are candidates; distance > 2 and identical
    names are excluded; each unordered pair appears once."""
    rows = [
        (1, "red widget", "B1"),
        (2, "red widgets", "B1"),   # dist 1 → pair (1,2)
        (3, "red widget", "B2"),    # other block: never joined to 1/2
        (4, "blue cog", "B1"),      # dist > 2 from both → excluded
        (5, "red widget", "B1"),    # identical name to 1 → excluded
    ]
    df = spark.createDataFrame(rows, "p_partkey long, p_name string, p_brand string")
    orig = adv.read_table
    try:
        adv.read_table = lambda sp, sf, name: df
        out = adv.q_levenshtein_pairs(spark, SF).collect()
    finally:
        adv.read_table = orig
    pairs = {(r.key_a, r.key_b): r.edit_dist for r in out}
    assert pairs == {(1, 2): 1, (2, 5): 1}


def test_length_percentile_filter_drops_tails(spark):
    """20 docs of one language: nearest-rank p5..p95 keeps ranks 1..19 —
    the single longest doc is dropped, shortest kept (ceil(0.05*20)=1)."""
    rows = [(i, " ".join(["w"] * (i + 1)), "en") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    orig = lq.read_table_balanced
    try:
        lq.read_table_balanced = lambda sp, sf, name: df
        out = lq.q_length_percentile_filter(spark, SF).collect()
    finally:
        lq.read_table_balanced = orig
    kept = sorted(r.doc_id for r in out)
    assert kept == list(range(19))  # doc 19 (longest) trimmed


def test_sessionize_splits_on_gap(spark):
    """Events ≤ 30 min apart share a session; a 31-min silence opens a new
    one; session ordinals are per-user."""
    import datetime as dt

    import projet_data_infrastructure_spark.plans.events_queries as eq

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1),
        (2, t0 + dt.timedelta(minutes=29), 1),   # same session
        (3, t0 + dt.timedelta(minutes=61), 1),   # 32-min gap → new session
        (4, t0, 2),                               # other user restarts at 1
    ]
    df = spark.createDataFrame(
        [(e, u, ts) for e, ts, u in rows], "event_id long, user_id long, ts timestamp_ntz"
    )
    orig = eq.read_table
    try:
        eq.read_table = lambda sp, sf, name: df
        out = {r.event_id: r.session_id for r in eq.q_sessionize_events(spark, SF).collect()}
    finally:
        eq.read_table = orig
    assert out == {1: 1, 2: 1, 3: 2, 4: 1}


def test_longest_streak_islands(spark):
    """Days {1,2,3, 5,6, 9} → longest consecutive run is 3; multiple events
    on one day count once."""
    import datetime as dt

    t = lambda day, h=0: dt.datetime(2024, 1, day, h)  # noqa: E731
    rows = [(1, t(1)), (1, t(1, 5)), (1, t(2)), (1, t(3)), (1, t(5)), (1, t(6)), (1, t(9)),
            (2, t(4))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz")
    orig = adv.read_table
    try:
        adv.read_table = lambda sp, sf, name: df
        out = {r.user_id: r.longest_streak for r in adv.q_longest_daily_streak(spark, SF).collect()}
    finally:
        adv.read_table = orig
    assert out == {1: 3, 2: 1}


def test_cohort_retention_offsets(spark):
    """Two users starting Jan 1 (one returns Jan 3), one starting Jan 2."""
    import datetime as dt

    d = lambda day: dt.datetime(2024, 1, day)  # noqa: E731
    rows = [(1, d(1)), (1, d(3)), (2, d(1)), (3, d(2))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz")
    orig = adv.read_table
    try:
        adv.read_table = lambda sp, sf, name: df
        out = {(str(r.cohort_day), r.day_offset): r.n_users
               for r in adv.q_cohort_retention(spark, SF).collect()}
    finally:
        adv.read_table = orig
    assert out == {("2024-01-01", 0): 2, ("2024-01-01", 2): 1, ("2024-01-02", 0): 1}


def test_ewma_matches_recurrence(spark):
    """applyInPandas EWMA equals the literal recurrence s_i = a*x_i + (1-a)*s_{i-1}."""
    import datetime as dt

    import projet_data_infrastructure_spark.plans.extras as ex

    t0 = dt.datetime(2024, 1, 1)
    vals = [10.0, 20.0, 5.0, 40.0]
    rows = [(1, i, t0 + dt.timedelta(minutes=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp_ntz, value double")
    orig = ex.read_table
    try:
        ex.read_table = lambda sp, sf, name: df
        out = {r.event_id: r.ewma for r in ex.q_ewma_by_user(spark, SF).collect()}
    finally:
        ex.read_table = orig
    a, s = 0.2, vals[0]
    expect = {0: s}
    for i, x in enumerate(vals[1:], start=1):
        s = a * x + (1 - a) * s
        expect[i] = s
    for i in range(len(vals)):
        assert abs(out[i] - expect[i]) < 1e-12, (i, out[i], expect[i])


def test_gopher_flags_crafted_docs(spark):
    """Hand-built docs on both sides of every gate: a 60-word doc with
    stopwords passes all; a 10-word doc fails word count; a digit-only doc
    fails the alpha-word fraction; a no-stopword doc fails the hit floor."""
    good = "the cattle sat upon a mattress and the doggy is nearby " * 5 + "end of story here now"
    short = "tiny doc with the a and of is words here"
    digits = " ".join(str(i) for i in range(60))
    nostop = " ".join(f"w{i}" for i in range(60))
    rows = [(1, good), (2, short), (3, digits), (4, nostop)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    orig = lq.read_table_balanced
    try:
        lq.read_table_balanced = lambda sp, sf, name: df
        out = {r["doc_id"]: r.asDict() for r in lq.q_gopher_quality_flags(spark, SF).collect()}
    finally:
        lq.read_table_balanced = orig
    assert out[1]["keep"] == 1 and out[1]["ok_word_count"] == 1
    assert out[2]["ok_word_count"] == 0 and out[2]["ok_stopwords"] == 1
    assert out[3]["ok_alpha"] == 0 and out[3]["keep"] == 0
    assert out[4]["ok_stopwords"] == 0 and out[4]["ok_alpha"] == 1


def test_token_diversity_known_ratios(spark):
    """'a a a a' → TTR 0.25 and bigram dup fraction 1 - 1/3 ≈ 0.6667; an
    all-distinct doc → TTR 1.0, dup fraction 0; a 1-token doc → defined
    zeros, no phantom bigram from Spark's descending sequence(1, 0)."""
    rows = [(1, "a a a a"), (2, "w x y z"), (3, "solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    orig = lq.read_table_balanced
    try:
        lq.read_table_balanced = lambda sp, sf, name: df
        out = {r["doc_id"]: r.asDict() for r in lq.q_token_diversity(spark, SF).collect()}
    finally:
        lq.read_table_balanced = orig
    assert out[1]["ttr"] == 0.25 and abs(out[1]["dup_bigram_frac"] - 0.6667) < 1e-9
    assert out[2]["ttr"] == 1.0 and out[2]["dup_bigram_frac"] == 0.0
    assert out[3]["n_tokens"] == 1 and out[3]["dup_bigram_frac"] == 0.0


def test_argmax_struct_max_breaks_ties_deterministically(spark):
    """Two events share the max value → the struct max picks the later ts;
    equal ts too → the lexicographically larger event_type. A window-less
    hash aggregate must still pin one winner."""
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 1, 2)
    rows = [
        (1, 10, t0, "view", 5.0),
        (1, 11, t1, "click", 5.0),  # same value, later ts -> winner
        (2, 20, t0, "aa", 3.0),
        (2, 21, t0, "zz", 3.0),  # same value+ts, larger type -> winner
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp_ntz, event_type string, value double"
    )
    orig = adv.read_table
    try:
        adv.read_table = lambda sp, sf, name: df
        out = {r["user_id"]: r.asDict() for r in adv.q_argmax_per_group(spark, SF).collect()}
    finally:
        adv.read_table = orig
    assert out[1]["at_event_type"] == "click" and out[1]["at_ts"] == t1
    assert out[2]["at_event_type"] == "zz" and out[2]["n_events"] == 2


def test_doc_chunking_overlap_and_coverage(spark):
    """A 40-token doc with chunk=32/stride=24 yields chunk0 = tokens 1..32
    and chunk1 = tokens 25..40 (16 tokens): chunks overlap by 8 and jointly
    cover every token; a 10-token doc yields exactly one short chunk."""
    long = " ".join(f"tok{i}" for i in range(1, 41))
    short = " ".join(f"s{i}" for i in range(10))
    df = spark.createDataFrame([(1, long), (2, short)], "doc_id long, text string")
    orig = lq.read_table_balanced
    try:
        lq.read_table_balanced = lambda sp, sf, name: df
        rows = lq.q_doc_chunking(spark, SF).collect()
    finally:
        lq.read_table_balanced = orig
    by = {(r["doc_id"], r["chunk_idx"]): r["n_chunk_tokens"] for r in rows}
    assert by == {(1, 0): 32, (1, 1): 16, (2, 0): 10}


def test_skyline_crafted_dominance(spark):
    """Known frontier: (5,50) dominates (5,40) (x tie, y strict) and (3,30);
    (1,90) survives on y; exact duplicates collapse to min key."""
    from projet_data_infrastructure_spark.operators.skyline import skyline_2d_max

    rows = [
        (1, 5, 50), (2, 5, 40), (3, 3, 30), (4, 1, 90),
        (5, 5, 50),              # duplicate of (5,50) -> representative key 1
        (6, 4, 60),              # survives: nothing has x>=4 AND y>=60
        (7, 2, 55),              # dominated by (4,60)
    ]
    df = spark.createDataFrame(rows, "k long, x long, y long")
    out = {(r["x"], r["y"]): r["k"] for r in skyline_2d_max(df, "x", "y", "k").collect()}
    assert out == {(5, 50): 1, (4, 60): 6, (1, 90): 4}


def test_skyline_matches_bruteforce_on_random_points(spark):
    """Exactness of the bucketed two-phase decomposition vs the O(n^2)
    dominance definition on 300 deterministic pseudo-random points
    (duplicates and axis ties included by construction: coords mod 40)."""
    from projet_data_infrastructure_spark.operators.skyline import skyline_2d_max

    pts = [(i, (i * 7919) % 40, (i * 104729) % 40) for i in range(300)]
    df = spark.createDataFrame(pts, "k long, x long, y long")
    got = {(r["x"], r["y"]) for r in skyline_2d_max(df, "x", "y", "k").collect()}
    uniq = {(x, y) for _, x, y in pts}
    expect = {
        (x, y)
        for x, y in uniq
        if not any(
            bx >= x and by >= y and (bx > x or by > y) for bx, by in uniq
        )
    }
    assert got == expect


def test_user_series_correlation_perfect_pairs(spark):
    """User 2 = 2x user 1 (corr exactly +1); user 3 anti-moves (corr -1);
    users share 10 hourly buckets (>= the 8-hour overlap gate)."""
    import projet_data_infrastructure_spark.plans.events_queries as eq

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for hr in range(10):
        base = float(hr + 1)
        rows.append((hr * 3 + 1, 1, t0 + dt.timedelta(hours=hr), base, "view"))
        rows.append((hr * 3 + 2, 2, t0 + dt.timedelta(hours=hr), 2 * base, "view"))
        rows.append((hr * 3 + 3, 3, t0 + dt.timedelta(hours=hr), 11.0 - base, "view"))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, value double, event_type string"
    )
    orig = eq.read_table
    try:
        eq.read_table = lambda sp, sf, name: df
        out = {(r.ua, r.ub): r.corr for r in eq.q_user_series_correlation(spark, SF).collect()}
    finally:
        eq.read_table = orig
    assert out[(1, 2)] == 1.0
    assert out[(1, 3)] == -1.0 and out[(2, 3)] == -1.0


def test_weighted_sampling_favors_heavy_weights(spark):
    """Statistical property of A-Res keys: with weights 1000 vs 1, heavy
    docs dominate the top of the key order. 200 docs, half heavy — the
    top-20 must be (almost) all heavy; exact determinism is pinned by the
    oracle, this pins the SEMANTICS (weighting actually biases the draw)."""
    rows = [(i, "x", 1000 if i % 2 == 0 else 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    orig = lq.read_table_balanced
    try:
        lq.read_table_balanced = lambda sp, sf, name: df
        out = [r["doc_id"] for r in lq.q_weighted_sample_topk(spark, SF).collect()]
    finally:
        lq.read_table_balanced = orig
    heavy = sum(1 for d in out if d % 2 == 0)
    assert len(out) == 20 and heavy >= 18, heavy


def test_grouped_skyline_independent_per_group(spark):
    """A point dominated inside its own nation survives in another: (10,1)
    is dominated by (20,2) in nation A but the identical point in nation B
    is that nation's whole frontier."""
    from projet_data_infrastructure_spark.operators.skyline import _sort_based_skyline

    rows = [
        (0, 1, 20, 2), (0, 2, 10, 1), (0, 3, 5, 9),
        (1, 4, 10, 1),
    ]
    df = spark.createDataFrame(rows, "c_nationkey long, c_custkey long, cents long, n_orders long")
    out = {
        (r["c_nationkey"], r["cents"], r["n_orders"])
        for r in _sort_based_skyline(df, "cents", "n_orders", ["c_nationkey"]).collect()
    }
    assert out == {(0, 20, 2), (0, 5, 9), (1, 10, 1)}


def test_temperature_mixture_flattens(spark):
    # alpha < 1 must up-sample the rarest source (boost > 1), down-sample
    # the heaviest (boost < 1), and the temperature weights must sum to 1.
    from projet_data_infrastructure_spark.plans.llm_queries import (
        q_temperature_mixture,
    )

    rows = q_temperature_mixture(spark, SF).collect()
    assert abs(sum(r.temp_weight for r in rows) - 1.0) < 1e-4
    lo = min(rows, key=lambda r: r.token_share)
    hi = max(rows, key=lambda r: r.token_share)
    assert lo.boost > 1.0 > hi.boost
    # monotone: lower natural share never gets a smaller boost
    by_share = sorted(rows, key=lambda r: r.token_share)
    boosts = [r.boost for r in by_share]
    assert all(b1 >= b2 - 1e-9 for b1, b2 in zip(boosts, boosts[1:]))


def test_leakage_safe_split_keeps_pairs_together(spark):
    # Every LSH candidate pair must land in the SAME split (the whole point),
    # and the overall assignment must still roughly respect 80/10/10.
    from projet_data_infrastructure_spark.operators import dedup
    from projet_data_infrastructure_spark.plans.llm_queries import (
        q_leakage_safe_split,
    )
    from projet_data_infrastructure_spark.sources.readers import read_table

    split = {r.doc_id: r.split for r in q_leakage_safe_split(spark, SF).collect()}
    docs = read_table(spark, SF, "documents")
    pairs = dedup.lsh_candidate_pairs(dedup.minhash_signatures(docs)).collect()
    assert pairs, "fixture should contain at least one near-dup pair"
    for p in pairs:
        assert split[p.doc_a] == split[p.doc_b]
    n = len(split)
    train = sum(1 for s in split.values() if s == "train")
    assert 0.6 * n < train < 0.95 * n


def test_k_anonymity_release_ladder(spark):
    # Crafted cells: one fine cell of size 5 releases fine; a small cell
    # whose (nation, segment) rollup reaches k releases coarse; an isolated
    # cell with a tiny rollup is suppressed.
    import projet_data_infrastructure_spark.plans.relational as rel
    from unittest import mock

    rows = [(1, "AUTO", 500.0)] * 5          # fine cell n=5
    rows += [(1, "AUTO", 1500.0)] * 2        # n_fine=2, coarse=7 -> coarse
    rows += [(2, "SHIP", 500.0)]             # n_fine=1, coarse=1 -> suppressed
    cust = spark.createDataFrame(
        rows, "c_nationkey int, c_mktsegment string, c_acctbal double"
    )
    with mock.patch.object(rel, "read_table", return_value=cust):
        got = {
            (r.c_nationkey, r.c_mktsegment, r.bal_band): (
                r.n_fine, r.n_coarse, r.released_level
            )
            for r in rel.q_k_anonymity_audit(spark, "unused").collect()
        }
    assert got == {
        (1, "AUTO", 0): (5, 7, "fine"),
        (1, "AUTO", 1): (2, 7, "coarse"),
        (2, "SHIP", 0): (1, 1, "suppressed"),
    }


# --------------------------------------------------------------------------
# BPE training rounds
# --------------------------------------------------------------------------


def _bpe_reference(word_counts, rounds=3):
    """Canonical BPE trainer (Sennrich et al.): pick max pair (ties: lexi),
    merge all non-overlapping occurrences left-to-right, repeat."""
    from collections import Counter

    vocab = {tuple(w): c for w, c in word_counts.items()}
    out = []
    for r in range(1, rounds + 1):
        pc = Counter()
        for toks, c in vocab.items():
            for i in range(len(toks) - 1):
                pc[(toks[i], toks[i + 1])] += c
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((r, a, b, a + b, cnt))
        new = {}
        for toks, c in vocab.items():
            merged, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(toks[i])
                    i += 1
            new[tuple(merged)] = new.get(tuple(merged), 0) + c
        vocab = new
    return out


def test_bpe_train_rounds_matches_reference_incl_char_runs(spark):
    # 'aaaa' exercises the run-of-same-char merge (a,a)x2 -> (aa,aa);
    # 'lower'/'lowest' exercise the classic shared-prefix merges
    docs_rows = []
    corpus = ["low low low lower lowest", "aaaa aaaa aaaa aaaa aaaa aaaa"]
    for i, text in enumerate(corpus):
        docs_rows.append((i, text, "en", "w", len(text)))
    df = spark.createDataFrame(
        docs_rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = lq.read_table_balanced
    try:
        lq.read_table_balanced = lambda sp, sf, name: df
        got = [
            (r.round, r.token_a, r.token_b, r.merged, r.n_occurrences)
            for r in lq.q_bpe_train_rounds(spark, SF).collect()
        ]
    finally:
        lq.read_table_balanced = orig
    from collections import Counter

    wc = Counter(w for t in corpus for w in t.lower().split())
    assert got == _bpe_reference(wc)
    # round 1 must be (a,a) with 18 occurrences: 3 non-overlapping per
    # 'aaaa'... no — 'aaaa' has pairs (a,a)x3 counted, 6 words -> 18
    assert got[0][:2] == (1, "a")
    # and round 2 merges the MERGED token (aa,aa) — proving rounds compose
    assert ("aa", "aa") in {(a, b) for _r, a, b, _m, _c in got}


def test_bpe_train_rounds_on_real_corpus_matches_reference(spark):
    import pyarrow.parquet as pq
    from collections import Counter

    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    wc = Counter(
        w for text in t.column("text").to_pylist() for w in text.lower().split() if w
    )
    got = [
        (r.round, r.token_a, r.token_b, r.merged, r.n_occurrences)
        for r in lq.q_bpe_train_rounds(spark, SF).collect()
    ]
    assert got == _bpe_reference(wc)


def test_wordpiece_scores_match_reference(spark):
    import pyarrow.parquet as pq
    from collections import Counter

    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    wc = Counter(
        w for text in t.column("text").to_pylist() for w in text.lower().split() if w
    )
    chars, pairs = Counter(), Counter()
    for w, c in wc.items():
        for ch in w:
            chars[ch] += c
        for i in range(len(w) - 1):
            pairs[(w[i], w[i + 1])] += c
    scored = sorted(
        (
            (-(n * 10**12 // (chars[a] * chars[b])), a, b, n)
            for (a, b), n in pairs.items()
        )
    )[:20]
    want = [(a, b, n, -s) for s, a, b, n in scored]
    got = [
        (r.a, r.b, r.n_pair, r.score_pico)
        for r in lq.q_wordpiece_merge_scores(spark, SF).collect()
    ]
    assert got == want
    # likelihood scoring is NOT count scoring: the top WordPiece pair need
    # not be the most frequent pair (rare-but-exclusive pairs can win)
    assert len(got) == 20


def test_c4_line_dedup_keep_first_and_rebuild(spark):
    """C4 global line dedup on crafted docs: an exact-copy doc loses every
    line (keep-first goes to the lower doc_id), a doc sharing one line keeps
    only its unique line, and a trailing <3-word line segment is dropped by
    the word-count floor before dedup."""
    import hashlib

    l0 = " ".join(f"a{i}" for i in range(10))
    l1 = " ".join(f"b{i}" for i in range(10))
    l2 = " ".join(f"c{i}" for i in range(10))
    rows = [
        (1, f"{l0} {l1}"),          # 2 unique lines, first occurrence
        (2, f"{l0} {l1}"),          # exact copy: every line already kept by doc 1
        (3, f"{l0} {l2}"),          # shares l0 with doc 1, keeps only l2
        # 12 words: one full line + a 2-word tail dropped by the word floor
        (4, " ".join(f"d{i}" for i in range(12))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    orig = lq.read_table_balanced
    try:
        lq.read_table_balanced = lambda sp, sf, name: df
        out = {r["doc_id"]: r.asDict() for r in lq.q_c4_line_dedup(spark, SF).collect()}
    finally:
        lq.read_table_balanced = orig
    assert out[1]["n_lines"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["kept_digest"] == hashlib.md5(f"{l0} {l1}".encode()).hexdigest()
    assert out[2]["n_lines"] == 2 and out[2]["n_kept"] == 0
    assert out[2]["kept_ratio"] == 0.0
    assert out[2]["kept_digest"] == hashlib.md5(b"").hexdigest()
    assert out[3]["n_lines"] == 2 and out[3]["n_kept"] == 1
    assert out[3]["kept_ratio"] == 0.5
    assert out[3]["kept_digest"] == hashlib.md5(l2.encode()).hexdigest()
    # the 2-word tail segment of doc 4 is dropped pre-dedup
    assert out[4]["n_lines"] == 1 and out[4]["n_kept"] == 1


def test_dup_line_fraction_gopher_repetition(spark):
    """Within-doc repetition: a doc whose 3 lines include one repeated line
    has dup_line_frac 1/3 and (equal-length lines) dup_char_frac 1/3; an
    all-distinct doc scores 0 on both."""
    line_a = "aa bb cc dd ee ff gg hh ii jj"  # 10 words, 29 chars
    line_b = "kk ll mm nn oo pp qq rr ss tt"
    line_c = "uu vv ww xx yy zz ab cd ef gh"
    rows = [
        (1, f"{line_a} {line_a} {line_b}"),   # lines: a, a, b
        (2, f"{line_a} {line_b} {line_c}"),   # all distinct
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    orig = lq.read_table_balanced
    try:
        lq.read_table_balanced = lambda sp, sf, name: df
        out = {r["doc_id"]: r.asDict() for r in lq.q_dup_line_fraction(spark, SF).collect()}
    finally:
        lq.read_table_balanced = orig
    assert out[1]["n_lines"] == 3
    assert out[1]["dup_line_frac"] == 0.333333
    assert out[1]["dup_char_frac"] == 0.333333
    assert out[2]["dup_line_frac"] == 0.0 and out[2]["dup_char_frac"] == 0.0
