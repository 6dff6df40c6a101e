"""Round-10 batch-2 specs: plain-Python fixture checks, sketch properties,
plan gates for the scale-sensitive shapes, and the hostile-TZ pin."""

import hashlib
import math
from collections import Counter

from pyspark.sql import functions as F

from projet_data_infrastructure_spark.operators.scale import explain_has

SF = "/root/testdata/sf0.001"


def _lineitem(spark, *cols):
    return spark.read.parquet(f"{SF}/lineitem.parquet").select(*cols).collect()


def _group_moments(rows):
    per = {}
    for g, y in rows:
        n, s, q = per.get(g, (0, 0, 0))
        per[g] = (n + 1, s + y, q + y * y)
    return per


def _f_stat(per):
    k = len(per)
    n = sum(m[0] for m in per.values())
    s = sum(m[1] for m in per.values())
    q = sum(m[2] for m in per.values())
    bsum = sum(m[1] ** 2 / m[0] for m in per.values())
    ssb = bsum - s * s / n
    ssw = q - bsum
    return n, k, ssb, ssw, (ssb / (k - 1)) / (ssw / (n - k))


def test_anova_f_fixture(spark):
    from projet_data_infrastructure_spark.plans.stats_inference import q_anova_oneway_f

    rows = [(r[0], int(r[1])) for r in _lineitem(spark, "l_returnflag", "l_quantity")]
    n, k, ssb, ssw, f = _f_stat(_group_moments(rows))
    got = q_anova_oneway_f(spark, SF).collect()[0]
    assert (got["n"], got["k"]) == (n, k)
    assert math.isclose(got["ssb_r"], ssb, rel_tol=0, abs_tol=5e-4)
    assert math.isclose(got["ssw_r"], ssw, rel_tol=0, abs_tol=5e-4)
    assert math.isclose(got["f_r"], f, rel_tol=0, abs_tol=5e-6)


def test_levene_brown_forsythe_fixture(spark):
    from projet_data_infrastructure_spark.plans.stats_inference import (
        q_levene_brown_forsythe,
    )

    rows = [(r[0], int(r[1])) for r in _lineitem(spark, "l_returnflag", "l_quantity")]
    by_g = {}
    for g, y in rows:
        by_g.setdefault(g, []).append(y)
    devs = []
    for g, ys in by_g.items():
        ys.sort()
        n = len(ys)
        m2 = ys[(n - 1) // 2] + ys[n // 2]  # doubled median
        devs.extend((g, abs(2 * y - m2)) for y in ys)
    _, k, _, _, f = _f_stat(_group_moments(devs))
    got = q_levene_brown_forsythe(spark, SF).collect()[0]
    assert got["k"] == k
    assert math.isclose(got["f_r"], f, rel_tol=0, abs_tol=5e-6)


def test_jonckheere_fixture(spark):
    # grid-free reference: per-group value Counters, U_ij summed directly.
    from projet_data_infrastructure_spark.plans.stats_inference import (
        q_jonckheere_terpstra,
    )

    orders = {
        r[0]: int(r[1][0])
        for r in spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderkey", "o_orderpriority")
        .collect()
    }
    li = _lineitem(spark, "l_orderkey", "l_quantity")
    groups = {}
    for ok, v in li:
        groups.setdefault(orders[ok], Counter())[int(v)] += 1
    gs = sorted(groups)
    jt2 = 0
    for a in range(len(gs)):
        for b in range(a + 1, len(gs)):
            ci, cj = groups[gs[a]], groups[gs[b]]
            for v, cjv in cj.items():
                less = sum(c for u, c in ci.items() if u < v)
                jt2 += cjv * (2 * less + ci.get(v, 0))
    ngs = [sum(c.values()) for c in groups.values()]
    tvs = Counter()
    for c in groups.values():
        tvs.update(c)
    n = sum(ngs)
    e2 = (n * n - sum(g * g for g in ngs)) / 2.0
    a_n = n * (n - 1) * (2 * n + 5)
    a_g = sum(g * (g - 1) * (2 * g + 5) for g in ngs)
    a_t = sum(t * (t - 1) * (2 * t + 5) for t in tvs.values())
    b_g = sum(g * (g - 1) * (g - 2) for g in ngs)
    b_t = sum(t * (t - 1) * (t - 2) for t in tvs.values())
    c_g = sum(g * (g - 1) for g in ngs)
    c_t = sum(t * (t - 1) for t in tvs.values())
    var = (
        (a_n - a_g - a_t) / 72.0
        + b_g * b_t / (36.0 * n * (n - 1) * (n - 2))
        + c_g * c_t / (8.0 * n * (n - 1))
    )
    z = (jt2 - e2) / (2.0 * math.sqrt(var))
    got = q_jonckheere_terpstra(spark, SF).collect()[0]
    assert got["n"] == n
    assert math.isclose(got["z_r"], z, rel_tol=0, abs_tol=5e-6)


def _jt2_reference(groups):
    """Grid-free doubled JT pair count over {group: Counter(value)}."""
    gs = sorted(groups)
    jt2 = 0
    for a in range(len(gs)):
        for b in range(a + 1, len(gs)):
            ci, cj = groups[gs[a]], groups[gs[b]]
            for v, cjv in cj.items():
                less = sum(c for u, c in ci.items() if u < v)
                jt2 += cjv * (2 * less + ci.get(v, 0))
    return jt2


def test_jonckheere_sparse_support(spark):
    # ADVICE r10: a j-value absent from group i's support must still
    # contribute 2*C_i(v) (count of smaller group-i values), which the
    # pre-fix sparse equi-join silently dropped. Groups {1,1,3} vs {2}:
    # value 2 is not in group 1's grid, yet 2*U_12 = 4.
    from projet_data_infrastructure_spark.plans.stats_inference import jt_stats_from_gv

    cases = [
        {1: Counter([1, 1, 3]), 2: Counter([2])},
        # three groups, fully disjoint supports (every cross-group value
        # misses the other group's grid)
        {1: Counter([10, 20]), 2: Counter([15]), 3: Counter([5, 25])},
        # singleton groups at distinct values
        {1: Counter([7]), 2: Counter([3]), 3: Counter([9, 9])},
    ]
    for groups in cases:
        rows = [(g, int(v)) for g, c in groups.items() for v, k in c.items() for _ in range(k)]
        gv = spark.createDataFrame(rows, "g int, v long")
        fin = jt_stats_from_gv(gv).collect()[0]
        assert int(fin["jt2"]) == _jt2_reference(groups), groups
        assert fin["n"] == len(rows)


def test_mutual_information_fixture(spark):
    from projet_data_infrastructure_spark.plans.stats_inference import (
        q_mutual_information_flags,
    )

    rows = _lineitem(spark, "l_returnflag", "l_linestatus")
    cells = Counter((r[0], r[1]) for r in rows)
    rt = Counter()
    ct = Counter()
    for (a, b), o in cells.items():
        rt[a] += o
        ct[b] += o
    n = sum(cells.values())
    mi = sum(o / n * math.log(o * n / (rt[a] * ct[b])) for (a, b), o in cells.items())
    hr = -sum(v / n * math.log(v / n) for v in rt.values())
    hc = -sum(v / n * math.log(v / n) for v in ct.values())
    got = q_mutual_information_flags(spark, SF).collect()[0]
    assert got["n"] == n
    assert math.isclose(got["mi_r"], mi, rel_tol=0, abs_tol=5e-6)
    assert math.isclose(got["nmi_r"], mi / math.sqrt(hr * hc), rel_tol=0, abs_tol=5e-6)


def test_sprt_fixture(spark):
    from projet_data_infrastructure_spark.plans import stats_inference as rb

    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(F.to_date("ts").alias("day"), "event_type")
        .collect()
    )
    daily = {}
    for r in ev:
        ne, cc = daily.get(r["day"], (0, 0))
        daily[r["day"]] = (ne + 1, cc + (r["event_type"] == "purchase"))
    la = math.log(rb._SPRT_P1 / rb._SPRT_P0)
    lb = math.log((1 - rb._SPRT_P1) / (1 - rb._SPRT_P0))
    a_up = math.log((1 - rb._SPRT_BETA) / rb._SPRT_ALPHA)
    nc = cc = 0
    d_h1 = None
    epoch = __import__("datetime").date(1970, 1, 1).toordinal()
    for day in sorted(daily):
        ne, conv = daily[day]
        nc, cc = nc + ne, cc + conv
        llr = cc * la + (nc - cc) * lb
        if d_h1 is None and llr >= a_up:
            d_h1 = day.toordinal() - epoch
    got = rb.q_sprt_ab_decision(spark, SF).collect()[0]
    assert got["n"] == nc and got["conv"] == cc
    if d_h1 is not None:
        assert got["decision"] == "accept_h1" and got["decision_day"] == d_h1
    assert math.isclose(got["llr_last_r"], cc * la + (nc - cc) * lb, abs_tol=5e-6)


# --------------------------------------------------------------------------
# HDR sketch: bracket correctness, bounded relative error, mergeability
# --------------------------------------------------------------------------


def _hdr_idx(cents: int) -> int:
    if cents < 256:
        return cents
    e = cents.bit_length() - 1
    return 128 * (e - 7) + (cents >> (e - 7))


def test_hdr_quantiles_bracket_and_merge(spark):
    from projet_data_infrastructure_spark.plans.sketches import (
        _HDR_QS,
    )
    from projet_data_infrastructure_spark.plans.sketches import (
        q_hdr_histogram_quantiles,
    )

    prices = [
        math.floor(r[0] * 100 + 0.5)
        for r in spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_totalprice")
        .collect()
    ]
    prices.sort()
    n = len(prices)
    rows = {r["q"]: r for r in q_hdr_histogram_quantiles(spark, SF).collect()}
    assert set(rows) == set(_HDR_QS)
    for q, r in rows.items():
        exact = prices[math.ceil(q * n) - 1] / 100.0
        assert r["lb_usd_r"] <= exact <= r["ub_usd_r"] + 0.01, (q, exact, r)
        # 8-significant-bit sketch: bucket width / lower bound <= 2^-7
        assert (r["ub_usd_r"] - r["lb_usd_r"]) <= r["lb_usd_r"] / 128.0 + 0.02
    # mergeability: per-partition histograms sum to the global histogram
    whole = Counter(_hdr_idx(c) for c in prices)
    merged = Counter()
    for part in (prices[: n // 3], prices[n // 3 : 2 * n // 3], prices[2 * n // 3 :]):
        merged.update(_hdr_idx(c) for c in part)
    assert merged == whole


def test_hodges_lehmann_fixture(spark):
    from projet_data_infrastructure_spark.plans.stats_inference import (
        q_hodges_lehmann_shift,
    )

    rows = _lineitem(spark, "l_returnflag", "l_quantity")
    xa = sorted(int(r[1]) for r in rows if r[0] == "A")
    xr = sorted(int(r[1]) for r in rows if r[0] == "R")
    diffs = Counter()
    ca, cr = Counter(xa), Counter(xr)
    for v, cv in cr.items():
        for u, cu in ca.items():
            diffs[v - u] += cv * cu
    n_pairs = len(xa) * len(xr)
    lo_pos, hi_pos = (n_pairs + 1) // 2, n_pairs // 2 + 1
    cum = 0
    d_lo = d_hi = None
    for d in sorted(diffs):
        cum += diffs[d]
        if d_lo is None and cum >= lo_pos:
            d_lo = d
        if d_hi is None and cum >= hi_pos:
            d_hi = d
    got = q_hodges_lehmann_shift(spark, SF).collect()[0]
    assert got["n_pairs"] == n_pairs
    assert (got["d_lo"], got["d_hi"]) == (d_lo, d_hi)
    assert got["hl_shift"] == (d_lo + d_hi) / 2.0


def test_page_hinkley_fixture(spark):
    from projet_data_infrastructure_spark.plans.timeseries import (
        _PH_LAMBDA,
    )
    from projet_data_infrastructure_spark.plans.timeseries import (
        q_page_hinkley_drift,
    )

    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(F.to_date("ts").alias("day"), "value")
        .collect()
    )
    daily = {}
    for r in ev:
        daily[r["day"]] = daily.get(r["day"], 0) + math.floor(r["value"] * 100 + 0.5)
    s = m = 0
    mn = 0
    best = None
    first_alarm = None
    n_alarms = 0
    epoch = __import__("datetime").date(1970, 1, 1).toordinal()
    for t, day in enumerate(sorted(daily), start=1):
        x = daily[day]
        s += x
        m += math.floor((x - s / t) * 1e6 + 0.5)
        mn = min(mn, m)
        ph = m - mn
        d = day.toordinal() - epoch
        if best is None or ph > best[0]:
            best = (ph, d)
        if ph > _PH_LAMBDA:
            n_alarms += 1
            if first_alarm is None:
                first_alarm = d
    got = q_page_hinkley_drift(spark, SF).collect()[0]
    assert got["peak_day"] == best[1]
    assert math.isclose(got["ph_max_usd_r"], best[0] / 1e8, rel_tol=0, abs_tol=5e-4)
    assert got["first_alarm_day"] == first_alarm
    assert got["n_alarm_days"] == n_alarms


def test_ransac_fixture_and_plan(spark):
    from projet_data_infrastructure_spark.plans.stats_inference import (
        _RANSAC_K,
    )
    from projet_data_infrastructure_spark.plans.stats_inference import (
        _RANSAC_TOL_CENTS,
    )
    from projet_data_infrastructure_spark.plans.stats_inference import (
        q_ransac_line_fit,
    )

    li = [
        (r[0], r[1], int(r[2]), math.floor(r[3] * 100 + 0.5))
        for r in _lineitem(
            spark, "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
        )
    ]

    def h(ok, ln):
        return int(hashlib.md5(f"{ok}-{ln}".encode()).hexdigest()[:15], 16)

    sample = sorted(li, key=lambda r: (h(r[0], r[1]), r[0], r[1]))[:_RANSAC_K]
    best = None
    for p in range(_RANSAC_K // 2):
        (x1, y1), (x2, y2) = sample[2 * p][2:], sample[2 * p + 1][2:]
        if x1 == x2:
            continue
        dx, dy = x2 - x1, y2 - y1
        inl = sum(
            abs(y * dx - y1 * dx - dy * (x - x1)) <= _RANSAC_TOL_CENTS * abs(dx)
            for _, _, x, y in li
        )
        key = (inl, -(p + 1))
        if best is None or key > best[0]:
            best = (key, p + 1, dy / dx / 100.0)
    got = q_ransac_line_fit(spark, SF).collect()[0]
    assert got["cand"] == best[1] and got["inliers"] == best[0][0]
    assert math.isclose(got["slope_usd_r"], best[2], rel_tol=0, abs_tol=5e-4)
    # scoring must be a broadcast nested-loop over the 16-line frame —
    # map-only over the corpus, never a shuffle/cartesian of row pairs
    checks = explain_has(
        q_ransac_line_fit(spark, SF), "BroadcastNestedLoopJoin", "CartesianProduct"
    )
    assert checks["BroadcastNestedLoopJoin"] and not checks["CartesianProduct"]


def test_kneser_ney_fixture(spark):
    from projet_data_infrastructure_spark.plans.corpus_lm import q_kneser_ney_bigram

    texts = [
        r[0]
        for r in spark.read.parquet(f"{SF}/documents.parquet").select("text").collect()
    ]
    bg = Counter()
    for t in texts:
        toks = [w for w in t.strip().split() if w]
        bg.update(zip(toks, toks[1:]))
    cw1 = Counter()
    n1f = Counter()
    n1b = Counter()
    for (w1, w2), c in bg.items():
        cw1[w1] += c
        n1f[w1] += 1
        n1b[w2] += 1
    bt = len(bg)
    got = q_kneser_ney_bigram(spark, SF).collect()
    assert len(got) == 20
    expect_top = sorted(bg.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r["w1"], r["w2"], r["c"]) for r in got] == [
        (w1, w2, c) for (w1, w2), c in expect_top
    ]
    for r in got:
        w1, w2 = r["w1"], r["w2"]
        kn = (
            max(bg[(w1, w2)] - 0.75, 0.0) / cw1[w1]
            + 0.75 * n1f[w1] / cw1[w1] * n1b[w2] / bt
        )
        assert 0.0 < r["kn_r"] <= 1.0
        assert math.isclose(r["kn_r"], kn, rel_tol=0, abs_tol=5e-6)


# --------------------------------------------------------------------------
# Plan gates + hostile-TZ pin
# --------------------------------------------------------------------------


def test_bounded_window_specs_are_post_aggregate(spark):
    # Every unpartitioned window in the new specs must consume a bounded
    # post-aggregate grid (bucket/difference/day), never corpus rows.
    from projet_data_infrastructure_spark.plans.sketches import (
        q_hdr_histogram_quantiles,
    )
    from projet_data_infrastructure_spark.plans.stats_inference import (
        q_hodges_lehmann_shift,
    )
    from projet_data_infrastructure_spark.plans.timeseries import (
        q_page_hinkley_drift,
    )

    for fn, grid_key in (
        (q_hdr_histogram_quantiles, "keys=[idx"),
        (q_hodges_lehmann_shift, "keys=[d"),
        (q_page_hinkley_drift, "keys=[d"),
    ):
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        win_pos = plan.index("Window")
        agg_below = plan.find("HashAggregate(" , win_pos)
        assert agg_below != -1 and grid_key in plan[agg_below:], plan
        # no corpus-identity columns flow into the window segment
        assert "o_orderkey" not in plan[win_pos:agg_below], plan
        assert "event_id" not in plan[win_pos:agg_below], plan


def test_levene_and_jt_windows_are_group_keyed(spark):
    import re

    from projet_data_infrastructure_spark.plans.stats_inference import (
        q_jonckheere_terpstra,
        q_levene_brown_forsythe,
    )

    for fn in (q_levene_brown_forsythe, q_jonckheere_terpstra):
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        for m in re.finditer(r"Window \[", plan):
            seg = plan[m.start() : plan.index("\n", m.start())]
            assert "g#" in seg, seg  # cumulative windows keyed by group


def test_day_grid_specs_hostile_tz_invariant_b(spark):
    from projet_data_infrastructure_spark.plans.timeseries import (
        q_page_hinkley_drift,
    )
    from projet_data_infrastructure_spark.plans.stats_inference import (
        q_sprt_ab_decision,
    )

    tz_key = "spark.sql.session.timeZone"
    infer_key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    base = [
        q_sprt_ab_decision(spark, SF).collect(),
        q_page_hinkley_drift(spark, SF).collect(),
    ]
    old_infer, old_tz = spark.conf.get(infer_key), spark.conf.get(tz_key)
    try:
        spark.conf.set(infer_key, "false")
        spark.conf.set(tz_key, "America/New_York")
        dfs = [q_sprt_ab_decision(spark, SF), q_page_hinkley_drift(spark, SF)]
        spark.conf.set(tz_key, "Pacific/Kiritimati")
        got = [df.collect() for df in dfs]
        assert got == base
    finally:
        spark.conf.set(infer_key, old_infer)
        spark.conf.set(tz_key, old_tz)


# --------------------------------------------------------------------------
# Batch 3: streaming parity, IRLS fixture, Friedman fixture
# --------------------------------------------------------------------------


def test_stream_sprt_matches_batch(spark):
    from projet_data_infrastructure_spark.plans.stats_inference import (
        q_sprt_ab_decision,
    )
    from projet_data_infrastructure_spark.plans.streaming_parity import (
        q_stream_sprt_ab,
    )

    assert (
        q_stream_sprt_ab(spark, SF).collect()
        == q_sprt_ab_decision(spark, SF).collect()
    )


def test_logistic_irls_fixture(spark):
    # un-quantized float IRLS on the same grid; the micro-quantization
    # perturbs moments by < 1e-6 relative, so weights agree to ~1e-5.
    from projet_data_infrastructure_spark.plans.stats_inference import (
        _IRLS_STEPS,
    )
    from projet_data_infrastructure_spark.plans.stats_inference import (
        q_logistic_irls_qty,
    )

    rows = _lineitem(spark, "l_quantity", "l_returnflag")
    grid = Counter((int(r[0]), int(r[1] == "R")) for r in rows)
    w0 = w1 = 0.0
    for _ in range(_IRLS_STEPS):
        sw = swx = swxx = g0 = g1 = 0.0
        for (x, y), c in grid.items():
            p = 1.0 / (1.0 + math.exp(-(w0 + w1 * x)))
            wgt = c * p * (1.0 - p)
            sw += wgt
            swx += wgt * x
            swxx += wgt * x * x
            g0 += c * (y - p)
            g1 += c * x * (y - p)
        det = sw * swxx - swx * swx
        w0, w1 = w0 + (swxx * g0 - swx * g1) / det, w1 + (sw * g1 - swx * g0) / det
    ll = sum(
        c
        * (
            y * math.log(1.0 / (1.0 + math.exp(-(w0 + w1 * x))))
            + (1 - y) * math.log(1.0 - 1.0 / (1.0 + math.exp(-(w0 + w1 * x))))
        )
        for (x, y), c in grid.items()
    )
    got = q_logistic_irls_qty(spark, SF).collect()[0]
    assert got["n"] == sum(grid.values())
    assert math.isclose(got["w0_r"], w0, rel_tol=0, abs_tol=1e-4)
    assert math.isclose(got["w1_r"], w1, rel_tol=0, abs_tol=1e-5)
    assert math.isclose(got["ll_r"], ll, rel_tol=0, abs_tol=0.05)


def test_friedman_fixture(spark):
    from fractions import Fraction

    from projet_data_infrastructure_spark.plans.stats_inference import (
        q_friedman_nation_priority,
    )

    orders = {
        r[0]: (r[1], int(r[2][0]))
        for r in spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderpriority")
        .collect()
    }
    nation = {
        r[0]: r[1]
        for r in spark.read.parquet(f"{SF}/customer.parquet")
        .select("c_custkey", "c_nationkey")
        .collect()
    }
    cells = {}
    for ok, v in _lineitem(spark, "l_orderkey", "l_quantity"):
        ck, p = orders[ok]
        key = (nation[ck], p)
        s, c = cells.get(key, (0, 0))
        cells[key] = (s + int(v), c + 1)
    k = len({p for _, p in cells})
    blocks = {}
    for (nk, p), (s, c) in cells.items():
        blocks.setdefault(nk, {})[p] = Fraction(s, c)
    blocks = {nk: d for nk, d in blocks.items() if len(d) == k}
    r_sum = Counter()
    for d in blocks.values():
        for p, v in d.items():
            less = sum(u < v for u in d.values())
            eq = sum(u == v for q, u in d.items() if q != p)
            r_sum[p] += Fraction(2 * less + eq + 2, 2)
    nb = len(blocks)
    chi2 = 12.0 / (nb * k * (k + 1)) * float(
        sum(r * r for r in r_sum.values())
    ) - 3.0 * nb * (k + 1)
    got = q_friedman_nation_priority(spark, SF).collect()[0]
    assert (got["n_blocks"], got["k"], got["df"]) == (nb, k, k - 1)
    assert math.isclose(got["chi2_r"], chi2, rel_tol=0, abs_tol=5e-6)


def test_logistic_and_friedman_are_window_free(spark):
    from projet_data_infrastructure_spark.plans.stats_inference import (
        q_friedman_nation_priority,
        q_logistic_irls_qty,
    )

    for fn in (q_logistic_irls_qty, q_friedman_nation_priority):
        checks = explain_has(fn(spark, SF), "WindowExec", "CartesianProduct")
        assert not checks["WindowExec"] and not checks["CartesianProduct"]


# --------------------------------------------------------------------------
# Batch 4: matrix profile + Cox PH fixtures
# --------------------------------------------------------------------------


def _daily_series(spark, col="value"):
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(F.to_date("ts").alias("day"), col)
        .collect()
    )
    daily = {}
    for r in ev:
        daily[r["day"]] = daily.get(r["day"], 0) + math.floor(r[col] * 100 + 0.5)
    return [daily[d] for d in sorted(daily)]


def test_matrix_profile_fixture(spark):
    from projet_data_infrastructure_spark.plans.timeseries import (
        _MP_M,
    )
    from projet_data_infrastructure_spark.plans.timeseries import (
        q_matrix_profile_daily,
    )

    xs = [c // 100 for c in _daily_series(spark)]
    nw = len(xs) - _MP_M + 1
    wins = [xs[t : t + _MP_M] for t in range(nw)]

    def dmicro(a, b):
        s1, s2 = sum(a), sum(b)
        q1, q2 = sum(v * v for v in a), sum(v * v for v in b)
        d1v, d2v = _MP_M * q1 - s1 * s1, _MP_M * q2 - s2 * s2
        if d1v <= 0 or d2v <= 0:
            return None
        dot = sum(u * v for u, v in zip(a, b))
        r = (_MP_M * dot - s1 * s2) / math.sqrt(d1v * d2v)
        return math.floor(2.0 * _MP_M * (1.0 - r) * 1e6 + 0.5)

    pairs = {}
    for i in range(nw):
        for j in range(nw):
            if abs(i - j) >= _MP_M:
                d = dmicro(wins[i], wins[j])
                if d is not None:
                    pairs[(i + 1, j + 1)] = d
    motif = min(((d, t1, t2) for (t1, t2), d in pairs.items() if t1 < t2))
    prof = {}
    for (t1, _), d in pairs.items():
        prof[t1] = min(prof.get(t1, d), d)
    discord = max(((d, -t) for t, d in prof.items()))
    got = q_matrix_profile_daily(spark, SF).collect()[0]
    assert (got["motif_t1"], got["motif_t2"]) == (motif[1], motif[2])
    assert math.isclose(got["motif_dist_r"], motif[0] / 1e6, abs_tol=5e-4)
    assert got["discord_t"] == -discord[1]
    assert math.isclose(got["discord_dist_r"], discord[0] / 1e6, abs_tol=5e-4)


def test_cox_fixture(spark):
    from projet_data_infrastructure_spark.plans.survival import (
        _COX_STEPS,
    )
    from projet_data_infrastructure_spark.plans.survival import (
        q_cox_ph_binary_newton,
    )

    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "event_type", "ts")
        .collect()
    )
    fv, pu = {}, {}
    horizon = max(r["ts"] for r in ev).date()
    for r in ev:
        if r["event_type"] == "view":
            if r["user_id"] not in fv or r["ts"] < fv[r["user_id"]]:
                fv[r["user_id"]] = r["ts"]
    for r in ev:
        u = r["user_id"]
        if r["event_type"] == "purchase" and u in fv and r["ts"] >= fv[u]:
            if u not in pu or r["ts"] < pu[u]:
                pu[u] = r["ts"]
    subj = []
    for u, t0 in fv.items():
        x = int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2
        if u in pu:
            subj.append((x, (pu[u].date() - t0.date()).days, 1))
        else:
            subj.append((x, (horizon - t0.date()).days, 0))
    taus = sorted({d for _, d, e in subj if e})
    b = 0.0
    for _ in range(_COX_STEPS):
        u_sum = i_sum = 0
        for t in taus:
            d0 = sum(1 for x, d, e in subj if e and d == t and x == 0)
            d1 = sum(1 for x, d, e in subj if e and d == t and x == 1)
            n0 = sum(1 for x, d, _ in subj if d >= t and x == 0)
            n1 = sum(1 for x, d, _ in subj if d >= t and x == 1)
            eb = math.exp(b)
            den = n0 + n1 * eb
            u_sum += math.floor((d1 - (d0 + d1) * n1 * eb / den) * 1e6 + 0.5)
            i_sum += math.floor(
                ((d0 + d1) * n0 * n1 * eb / (den * den)) * 1e6 + 0.5
            )
        b += u_sum / i_sum
    got = q_cox_ph_binary_newton(spark, SF).collect()[0]
    assert got["n_subj"] == len(subj)
    assert got["n_events"] == sum(e for _, _, e in subj)
    assert math.isclose(got["beta_r"], b, rel_tol=0, abs_tol=5e-6)
    assert math.isclose(got["hr_r"], math.exp(b), rel_tol=0, abs_tol=5e-6)


def test_cox_risk_window_is_arm_keyed_and_mp_pairs_bounded(spark):
    from projet_data_infrastructure_spark.plans.survival import (
        q_cox_ph_binary_newton,
    )
    from projet_data_infrastructure_spark.plans.timeseries import (
        q_matrix_profile_daily,
    )

    # cox has NO window at all: risk sets come from the bounded grid join
    checks = explain_has(q_cox_ph_binary_newton(spark, SF), "WindowExec")
    assert not checks["WindowExec"]
    # matrix-profile pair join consumes the day-grid aggregate, not events
    plan2 = (
        q_matrix_profile_daily(spark, SF)._jdf.queryExecution().executedPlan().toString()
    )
    join_pos = plan2.index("SortMergeJoin") if "SortMergeJoin" in plan2 else plan2.index("Join")
    assert "event_id" not in plan2[join_pos:], plan2


def test_day_grid_specs_hostile_tz_invariant_c(spark):
    from projet_data_infrastructure_spark.plans.survival import (
        q_cox_ph_binary_newton,
    )
    from projet_data_infrastructure_spark.plans.timeseries import (
        q_matrix_profile_daily,
    )

    tz_key = "spark.sql.session.timeZone"
    infer_key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    base = [
        q_matrix_profile_daily(spark, SF).collect(),
        q_cox_ph_binary_newton(spark, SF).collect(),
    ]
    old_infer, old_tz = spark.conf.get(infer_key), spark.conf.get(tz_key)
    try:
        spark.conf.set(infer_key, "false")
        spark.conf.set(tz_key, "Pacific/Kiritimati")
        got = [
            q_matrix_profile_daily(spark, SF).collect(),
            q_cox_ph_binary_newton(spark, SF).collect(),
        ]
        assert got == base
    finally:
        spark.conf.set(infer_key, old_infer)
        spark.conf.set(tz_key, old_tz)


# --------------------------------------------------------------------------
# Batch 5: Mantel-Haenszel + bigram entropy fixtures
# --------------------------------------------------------------------------


def test_mantel_haenszel_fixture(spark):
    from projet_data_infrastructure_spark.plans.stats_inference import (
        q_mantel_haenszel_or,
    )

    orders = {
        r[0]: (r[1], int(r[2][0]) <= 2)
        for r in spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderpriority")
        .collect()
    }
    nation = {
        r[0]: r[1]
        for r in spark.read.parquet(f"{SF}/customer.parquet")
        .select("c_custkey", "c_nationkey")
        .collect()
    }
    ret = {}
    for ok, rf in _lineitem(spark, "l_orderkey", "l_returnflag"):
        ret[ok] = ret.get(ok, False) or (rf == "R")
    t22 = {}
    for ok, y in ret.items():
        ck, e = orders[ok]
        cell = t22.setdefault(nation[ck], [0, 0, 0, 0])
        cell[(0 if e else 2) + (0 if y else 1)] += 1
    snum = sden = se = sv = sa = 0
    n_strata = 0
    for a, b, c, d in t22.values():
        n = a + b + c + d
        if n <= 1:
            continue
        n_strata += 1
        sa += a
        snum += math.floor(a * d / n * 1e6 + 0.5)
        sden += math.floor(b * c / n * 1e6 + 0.5)
        se += math.floor((a + b) * (a + c) / n * 1e6 + 0.5)
        sv += math.floor(
            (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1)) * 1e6 + 0.5
        )
    chi2 = (abs(sa - se / 1e6) - 0.5) ** 2 / (sv / 1e6)
    got = q_mantel_haenszel_or(spark, SF).collect()[0]
    assert got["n_strata"] == n_strata
    assert math.isclose(got["or_mh_r"], snum / sden, rel_tol=0, abs_tol=5e-6)
    assert math.isclose(got["chi2_cmh_r"], chi2, rel_tol=0, abs_tol=5e-6)
    assert 0.0 <= got["p_r"] <= 1.0


def test_bigram_entropy_fixture(spark):
    from projet_data_infrastructure_spark.plans.corpus_lm import (
        q_bigram_entropy_rate,
    )

    texts = [
        r[0]
        for r in spark.read.parquet(f"{SF}/documents.parquet").select("text").collect()
    ]
    bg = Counter()
    for t in texts:
        toks = [w for w in t.strip().split() if w]
        bg.update(zip(toks, toks[1:]))
    cw1 = Counter()
    for (w1, _), c in bg.items():
        cw1[w1] += c
    nb = sum(bg.values())
    h = -sum(c / nb * math.log(c / cw1[w1]) for (w1, _), c in bg.items())
    got = q_bigram_entropy_rate(spark, SF).collect()[0]
    assert got["n_bigrams"] == nb and got["n_types"] == len(bg)
    assert math.isclose(got["h_rate_r"], h, rel_tol=0, abs_tol=5e-6)
    assert math.isclose(got["ppl_r"], math.exp(h), rel_tol=0, abs_tol=5e-3)


# --------------------------------------------------------------------------
# Batch 6: streaming HDR parity + Cramér–von Mises fixture
# --------------------------------------------------------------------------


def test_stream_hdr_matches_batch_sketch(spark):
    from projet_data_infrastructure_spark.plans.sketches import (
        _HDR_IDX,
        _hdr_readout,
    )
    from projet_data_infrastructure_spark.plans.streaming_parity import (
        q_stream_hdr_quantiles,
    )
    from projet_data_infrastructure_spark.sources.readers import read_table

    ev = read_table(spark, SF, "events").select(
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents")
    )
    batch_hist = (
        ev.select(F.expr(_HDR_IDX).alias("idx"))
        .groupBy("idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    batch = sorted(map(tuple, _hdr_readout(batch_hist).collect()))
    stream = sorted(map(tuple, q_stream_hdr_quantiles(spark, SF).collect()))
    assert stream == batch


def test_cramer_von_mises_fixture(spark):
    from projet_data_infrastructure_spark.plans.stats_inference import (
        q_cramer_von_mises,
    )

    rows = _lineitem(spark, "l_returnflag", "l_quantity")
    ca_, cb_ = Counter(), Counter()
    for g, v in rows:
        if g == "A":
            ca_[int(v)] += 1
        elif g == "R":
            cb_[int(v)] += 1
    na, nb = sum(ca_.values()), sum(cb_.values())
    num = 0
    cum_a = cum_b = 0
    for v in sorted(set(ca_) | set(cb_)):
        cum_a += ca_.get(v, 0)
        cum_b += cb_.get(v, 0)
        d = nb * cum_a - na * cum_b
        num += (ca_.get(v, 0) + cb_.get(v, 0)) * d * d
    t = num / (na * nb * (na + nb) ** 2)
    got = q_cramer_von_mises(spark, SF).collect()[0]
    assert (got["n_a"], got["n_b"]) == (na, nb)
    assert math.isclose(got["t_r"], t, rel_tol=0, abs_tol=5e-6)
    assert math.isclose(
        got["t_null_mean_r"], (1 + 1 / (na + nb)) / 6, rel_tol=0, abs_tol=5e-6
    )


# --------------------------------------------------------------------------
# Batch 7: day-grid diagnostics fixtures
# --------------------------------------------------------------------------


def test_runs_test_fixture(spark):
    from projet_data_infrastructure_spark.plans.timeseries import q_runs_test_daily

    xs = _daily_series(spark)
    by = sorted(xs)
    n = len(by)
    m2 = by[(n - 1) // 2] + by[n // 2]
    signs = [1 if 2 * x > m2 else 0 for x in xs if 2 * x != m2]
    n1, n2 = sum(signs), len(signs) - sum(signs)
    r = 1 + sum(a != b for a, b in zip(signs, signs[1:]))
    mu = 2 * n1 * n2 / (n1 + n2) + 1
    var = (
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
        / ((n1 + n2) ** 2 * (n1 + n2 - 1))
    )
    z = (r - mu) / math.sqrt(var)
    got = q_runs_test_daily(spark, SF).collect()[0]
    assert (got["n1"], got["n2"], got["r"]) == (n1, n2, r)
    assert math.isclose(got["z_r"], z, rel_tol=0, abs_tol=5e-6)


def test_durbin_watson_fixture(spark):
    from projet_data_infrastructure_spark.plans.timeseries import (
        q_durbin_watson_daily,
    )

    xs = [c // 100 for c in _daily_series(spark)]
    n = len(xs)
    ts = list(range(1, n + 1))
    st, stt = sum(ts), sum(t * t for t in ts)
    sy, sty = sum(xs), sum(t * x for t, x in zip(ts, xs))
    b = (n * sty - st * sy) / (n * stt - st * st)
    a = (sy - b * st) / n
    e = [x - a - b * t for t, x in zip(ts, xs)]
    dw = sum((u - v) ** 2 for u, v in zip(e[1:], e)) / sum(v * v for v in e)
    got = q_durbin_watson_daily(spark, SF).collect()[0]
    assert math.isclose(got["dw_r"], dw, rel_tol=0, abs_tol=5e-5)
    assert 0.0 < got["dw_r"] < 4.0


def test_ljung_box_fixture(spark):
    from projet_data_infrastructure_spark.plans.timeseries import (
        _LB_LAGS,
    )
    from projet_data_infrastructure_spark.plans.timeseries import (
        q_ljung_box_q,
    )

    xs = [c // 100 for c in _daily_series(spark)]
    n = len(xs)
    s = sum(xs)
    dv = [n * x - s for x in xs]
    den = sum(d * d for d in dv)
    q = 0.0
    for k in range(1, _LB_LAGS + 1):
        num = sum(dv[t] * dv[t + k] for t in range(n - k))
        q += (num / den) ** 2 / (n - k)
    q *= n * (n + 2)
    got = q_ljung_box_q(spark, SF).collect()[0]
    assert got["n"] == n and got["df"] == _LB_LAGS
    assert math.isclose(got["q_r"], q, rel_tol=0, abs_tol=5e-3)


# --------------------------------------------------------------------------
# Personalized PageRank fixture (python integer replica)
# --------------------------------------------------------------------------


def test_personalized_pagerank_fixture(spark):
    from projet_data_infrastructure_spark.plans.graph_geo import (
        _PPR_ITERS,
    )
    from projet_data_infrastructure_spark.plans.graph_geo import (
        q_personalized_pagerank,
    )

    orders = {
        r[0]: r[1]
        for r in spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderkey", "o_custkey")
        .collect()
    }
    pairs = {
        (orders[r[0]] * 2, r[1] * 2 + 1)
        for r in _lineitem(spark, "l_orderkey", "l_suppkey")
    }
    edges = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    seeds = {
        r[0] * 2
        for r in spark.read.parquet(f"{SF}/customer.parquet")
        .filter("c_nationkey = 0")
        .select("c_custkey")
        .collect()
    }
    deg = Counter(s for s, _ in edges)
    ppr = {n: (1_000_000 if n in seeds else 0) for n in deg}
    for _ in range(_PPR_ITERS):
        inc = Counter()
        for s, d in edges:
            inc[d] += ppr[s] // deg[s]
        ppr = {
            n: (150_000 if n in seeds else 0) + 85 * inc.get(n, 0) // 100
            for n in deg
        }

    def lab(n):
        return ("c" if n % 2 == 0 else "s") + str(n // 2)

    expect = sorted(
        ((v, lab(n)) for n, v in ppr.items()), key=lambda p: (-p[0], p[1])
    )[:20]
    got = q_personalized_pagerank(spark, SF).collect()
    assert [(r["ppr"], r["node"]) for r in got] == expect
    # teleport restriction: every seed holds at least its own teleport mass
    seed_rows = [r for r in got if r["seed"] == 1]
    assert all(r["ppr"] >= 150_000 for r in seed_rows)


def test_poisson_rate_ratio_fixture(spark):
    from projet_data_infrastructure_spark.plans.stats_inference import (
        q_poisson_rate_ratio,
    )

    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "event_type", F.to_date("ts").alias("day"))
        .collect()
    )
    arms = {}
    for r in ev:
        u = r["user_id"]
        arm = int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2
        users, days, conv = arms.setdefault(arm, [set(), set(), 0])
        users.add(u)
        days.add(r["day"])
        arms[arm][2] = conv + (r["event_type"] == "purchase")
    c0, c1 = arms[0][2], arms[1][2]
    e0 = len(arms[0][0]) * len(arms[0][1])
    e1 = len(arms[1][0]) * len(arms[1][1])
    z = (math.log(c1 / c0) - math.log(e1 / e0)) / math.sqrt(1 / c1 + 1 / c0)
    got = q_poisson_rate_ratio(spark, SF).collect()[0]
    assert (got["c0"], got["c1"], got["e0"], got["e1"]) == (c0, c1, e0, e1)
    assert math.isclose(got["z_r"], z, rel_tol=0, abs_tol=5e-6)
    assert math.isclose(
        got["rate_ratio_r"], (c1 / e1) / (c0 / e0), rel_tol=0, abs_tol=5e-6
    )


def test_ansari_bradley_fixture(spark):
    # brute force: pooled sort, tie-averaged min(i, N+1-i) scores
    from projet_data_infrastructure_spark.plans.stats_inference import q_ansari_bradley

    rows = _lineitem(spark, "l_returnflag", "l_quantity")
    pooled = sorted(
        (int(v), g) for g, v in rows if g in ("A", "R")
    )
    n = len(pooled)
    raw = [min(i, n + 1 - i) for i in range(1, n + 1)]
    # tie-average scores over equal values
    score = {}
    i = 0
    while i < n:
        j = i
        while j < n and pooled[j][0] == pooled[i][0]:
            j += 1
        avg = sum(raw[i:j]) / (j - i)
        score[pooled[i][0]] = avg
        i = j
    ab = sum(score[v] for v, g in pooled if g == "A")
    na = sum(1 for _, g in pooled if g == "A")
    nb = n - na
    a_vals = [score[v] for v, _ in pooled]
    mean = sum(a_vals) / n
    var = na * nb * (sum(a * a for a in a_vals) - n * mean * mean) / (n * (n - 1))
    z = (ab - na * mean) / math.sqrt(var)
    got = q_ansari_bradley(spark, SF).collect()[0]
    assert (got["n_a"], got["n_b"]) == (na, nb)
    assert math.isclose(got["ab_r"], ab, rel_tol=0, abs_tol=0.1)
    assert math.isclose(got["z_r"], z, rel_tol=0, abs_tol=5e-6)


def test_nelson_aalen_fixture(spark):
    from projet_data_infrastructure_spark.plans.survival import (
        q_nelson_aalen_hazard,
    )

    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "event_type", "ts")
        .collect()
    )
    fv, pu = {}, {}
    horizon = max(r["ts"] for r in ev).date()
    for r in ev:
        if r["event_type"] == "view" and (
            r["user_id"] not in fv or r["ts"] < fv[r["user_id"]]
        ):
            fv[r["user_id"]] = r["ts"]
    for r in ev:
        u = r["user_id"]
        if r["event_type"] == "purchase" and u in fv and r["ts"] >= fv[u]:
            if u not in pu or r["ts"] < pu[u]:
                pu[u] = r["ts"]
    durs = []
    for u, t0 in fv.items():
        end = pu[u].date() if u in pu else horizon
        durs.append(((end - t0.date()).days, u in pu))
    taus = sorted({d for d, e in durs if e})
    h = 0.0
    expect = []
    for t in taus:
        d = sum(1 for dd, e in durs if e and dd == t)
        n = sum(1 for dd, _ in durs if dd >= t)
        h += math.floor(d / n * 1e9 + 0.5) / 1e9
        expect.append((t, d, n, h))
    got = sorted(
        (r["dur"], r["d"], r["n_risk"], r["na_hazard_r"])
        for r in q_nelson_aalen_hazard(spark, SF).collect()
    )
    assert len(got) == len(expect)
    for (t1, d1, n1, h1), (t2, d2, n2, h2) in zip(got, expect):
        assert (t1, d1, n1) == (t2, d2, n2)
        assert math.isclose(h1, h2, rel_tol=0, abs_tol=5e-6)


def test_tukey_hsd_fixture(spark):
    from projet_data_infrastructure_spark.plans.stats_inference import q_tukey_hsd_pairs

    orders = {
        r[0]: int(r[1][0])
        for r in spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderkey", "o_orderpriority")
        .collect()
    }
    per = {}
    for ok, y in _lineitem(spark, "l_orderkey", "l_quantity"):
        g = orders[ok]
        n, s, q = per.get(g, (0, 0, 0))
        per[g] = (n + 1, s + int(y), q + int(y) * int(y))
    k = len(per)
    n = sum(m[0] for m in per.values())
    qq = sum(m[2] for m in per.values())
    bsum = sum(m[1] ** 2 / m[0] for m in per.values())
    msw = (qq - bsum) / (n - k)
    got = {(r["gi"], r["gj"]): r for r in q_tukey_hsd_pairs(spark, SF).collect()}
    assert len(got) == k * (k - 1) // 2
    for (gi, gj), r in got.items():
        ni, si, _ = per[gi]
        nj, sj, _ = per[gj]
        diff = si / ni - sj / nj
        qstat = abs(diff) / math.sqrt(msw / 2 * (1 / ni + 1 / nj))
        assert math.isclose(r["mean_diff_r"], diff, rel_tol=0, abs_tol=5e-6)
        assert math.isclose(r["q_stat_r"], qstat, rel_tol=0, abs_tol=5e-5)


def test_ansari_block_score_range_sum_property(spark):
    # the trickiest integer algebra in the module: S(l, r) must equal the
    # brute-force sum of min(i, N+1-i) over the block for ANY (l, r, N)
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def s_formula(l, r, nn):  # the python mirror of _AB_S's split algebra
        h = (nn + 1) // 2
        t1 = (
            (min(r, h) * (min(r, h) + 1) - (l - 1) * l) // 2
            if l <= min(r, h)
            else 0
        )
        m2 = max(l, h + 1)
        t2 = (
            (r - m2 + 1) * (nn + 1) - (r * (r + 1) - (m2 - 1) * m2) // 2
            if m2 <= r
            else 0
        )
        return t1 + t2

    @settings(max_examples=300, deadline=None)
    @given(st.integers(min_value=1, max_value=400), st.data())
    def run(nn, data):
        l = data.draw(st.integers(min_value=1, max_value=nn))
        r = data.draw(st.integers(min_value=l, max_value=nn))
        brute = sum(min(i, nn + 1 - i) for i in range(l, r + 1))
        assert s_formula(l, r, nn) == brute, (l, r, nn)

    run()


def test_ab_score_engine_wide_at_hostile_scale(spark):
    # ADVICE r10: the pre-fix r*(r+1) products wrapped int64 around
    # sf1400 (~9e22 at sf100k). Evaluate the WIDENED _AB_S in BOTH
    # engines at 100 TB-scale block coordinates and pin it to exact
    # Python integer algebra.
    import duckdb

    from projet_data_infrastructure_spark.plans.stats_inference import _AB_S

    def exact(l, r, nn):
        h = (nn + 1) // 2
        s = 0
        if l <= min(r, h):
            a, b = l, min(r, h)
            s += (a + b) * (b - a + 1) // 2
        m2 = max(l, h + 1)
        if m2 <= r:
            s += (r - m2 + 1) * (nn + 1) - (m2 + r) * (r - m2 + 1) // 2
        return s

    nn = 600_000_000_000  # ~sf100k pooled rows
    cases = [
        (1, nn, nn),                       # whole pooled range
        (nn // 2 - 5, nn // 2 + 5, nn),    # straddles the fold point h
        (nn - 100, nn, nn),                # the descending tail
        (1, 1, nn),
        (3, 10**11, nn),
    ]
    rows = [(l, r, nn, (nn + 1) // 2) for l, r, nn in cases]
    sdf = spark.createDataFrame(rows, "l long, r long, nn long, h long")
    got_spark = [int(x[0]) for x in sdf.selectExpr(f"{_AB_S} AS s").collect()]
    con = duckdb.connect()
    dk = _AB_S.replace(" DIV ", " // ")
    got_duck = [
        int(
            con.sql(
                f"SELECT {dk} AS s FROM (SELECT CAST({l} AS BIGINT) l,"
                f" CAST({r} AS BIGINT) r, CAST({nn} AS BIGINT) nn,"
                f" CAST({(nn + 1) // 2} AS BIGINT) h)"
            ).fetchone()[0]
        )
        for l, r, nn in cases
    ]
    want = [exact(l, r, nn) for l, r, nn in cases]
    assert got_spark == want
    assert got_duck == want


def test_wide_quantizers_no_saturation(spark):
    # The cast-quantizer must carry ~1.9e20 micro-unit terms (where
    # Spark's floor(DOUBLE)->LONG silently saturates at 2^63) exactly
    # in both engines.
    import duckdb

    expr = "CAST(CAST(x AS DOUBLE) * 1000000.0 + 0.00001 AS DECIMAL(38,0))"
    xs = [1.9e14, 8.2e13, 2.5e-6, 123.456789]
    sdf = spark.createDataFrame([(x,) for x in xs], "x double")
    got_spark = [x[0] for x in sdf.selectExpr(f"{expr} AS q").collect()]
    con = duckdb.connect()
    got_duck = [
        con.sql(f"SELECT {expr} AS q FROM (SELECT CAST({x!r} AS DOUBLE) x)").fetchone()[0]
        for x in xs
    ]
    assert [int(a) for a in got_spark] == [int(b) for b in got_duck]
    assert int(got_spark[0]) == int(1.9e14 * 1e6)  # > 2^63, not clamped


def test_jonckheere_random_sparse_supports_property(spark):
    # Deterministic pseudo-random sparse group supports (the hypothesis-
    # style sweep, seeded for reproducibility): engine jt2 must equal the
    # grid-free Python reference for ANY support pattern, including
    # disjoint and partially-overlapping grids.
    import random

    from projet_data_infrastructure_spark.plans.stats_inference import (
        jt_stats_from_gv,
    )

    rng = random.Random(1109)
    for _ in range(6):
        k = rng.randint(2, 4)
        groups = {}
        for g in range(1, k + 1):
            n = rng.randint(1, 8)
            groups[g] = Counter(rng.choice([1, 2, 3, 5, 8, 13, 21]) for _ in range(n))
        rows = [
            (g, int(v)) for g, c in groups.items() for v, m in c.items() for _ in range(m)
        ]
        gv = spark.createDataFrame(rows, "g int, v long")
        fin = jt_stats_from_gv(gv).collect()[0]
        assert int(fin["jt2"]) == _jt2_reference(groups), groups
        assert fin["n"] == len(rows)
