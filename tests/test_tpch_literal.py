"""Independent (third-way) fixtures for the mirrored-oracle-only TPC-H specs.

VERDICT r12 item 2 (fixture ratchet): each test here re-implements the
TPC-H query DEFINITIONALLY in pure Python — dict folds and nested loops
over the raw sf0.001 parquet read with pyarrow, never Spark or DuckDB —
and compares the registered Spark builder's output row-for-row. A formula
mirrored wrong on BOTH engines (the round-10 Jonckheere–Terpstra class)
cannot also pass these folds.

Semantics source: the public TPC-H specification (q2-q22 shapes) with this
repo's concrete parameter choices (dates, brands, the synthesized partsupp
of plans/partsupp.py). ``h64`` mirrors the hashlib-backed ``hash64`` that
tests/test_portability.py already property-proves against Spark md5.

Float discipline: group keys, counts, orderings, and LIMIT cutoffs are
compared EXACTLY; cent-rounded double sums allow ±0.02 (pure-Python
``math.fsum`` vs Spark's distributed pairwise sums differ by ulps, and the
``floor(x*100+0.50001)/100`` cent quantizer can flip a boundary). A shared
formula bug moves results by orders of magnitude more than a cent.
"""

import hashlib
import math
from collections import defaultdict
from datetime import datetime, timedelta

import pyarrow.parquet as pq
import pytest

from projet_data_infrastructure_spark.plans.registry import queries_map

SF = "/root/testdata/sf0.001"

RUN = None  # populated lazily; queries_map() imports every plan module


def run(spark, name):
    global RUN
    if RUN is None:
        RUN = queries_map()
    return RUN[name](spark, SF).collect()


def h64(s: str, seed: int) -> int:
    return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)


def pr(x: float, n: int = 2) -> float:
    scale = float(10**n)
    return math.floor(x * scale + 0.50001) / scale


def approx_cents(got: float, exp: float, n: int = 2) -> bool:
    return abs(got - exp) <= 1.5 / 10**n


def _rows(table: str, cols: list[str]) -> list[tuple]:
    t = pq.read_table(f"{SF}/{table}.parquet", columns=cols)
    return list(zip(*[t.column(c).to_pylist() for c in cols]))


@pytest.fixture(scope="module")
def li():
    return _rows(
        "lineitem",
        [
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_returnflag",
            "l_shipdate",
        ],
    )


@pytest.fixture(scope="module")
def orders():
    return _rows(
        "orders",
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"],
    )


@pytest.fixture(scope="module")
def cust():
    return _rows("customer", ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"])


@pytest.fixture(scope="module")
def supp():
    return _rows("supplier", ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"])


@pytest.fixture(scope="module")
def part():
    return _rows("part", ["p_partkey", "p_name", "p_brand", "p_type", "p_size"])


@pytest.fixture(scope="module")
def nation():
    return _rows("nation", ["n_nationkey", "n_name", "n_regionkey"])


@pytest.fixture(scope="module")
def region():
    return _rows("region", ["r_regionkey", "r_name"])


@pytest.fixture(scope="module")
def partsupp(li):
    """The synthesized partsupp of plans/partsupp.py, folded literally:
    distinct (l_partkey, l_suppkey) -> hash-derived availqty / cost_cents."""
    ps = {}
    for _ok, pk, sk, *_ in li:
        if (pk, sk) not in ps:
            key = f"{pk}:{sk}"
            ps[(pk, sk)] = (
                1 + h64(key, 11) % 9999,  # ps_availqty
                100 + h64(key, 13) % 99901,  # ps_supplycost_cents
            )
    return ps


def D(s: str) -> datetime:
    return datetime.strptime(s, "%Y-%m-%d")


# --------------------------------------------------------------- queries


def test_tpch_q2_literal(spark, li, part, supp, nation, region, partsupp):
    nat = {nk: (nm, rk) for nk, nm, rk in nation}
    europe = {rk for rk, rn in region if rn == "EUROPE"}
    sup = {sk: (nm, nk, bal) for sk, nm, nk, bal in supp}
    std_parts = {pk for pk, _nm, _b, ty, sz in part if ty == "STANDARD" and sz <= 15}
    eligible = []  # (acctbal, s_name, n_name, partkey, cost)
    for (pk, sk), (_aq, cost) in partsupp.items():
        if pk not in std_parts:
            continue
        s_name, s_nk, s_bal = sup[sk]
        n_name, n_rk = nat[s_nk]
        if n_rk in europe:
            eligible.append((s_bal, s_name, n_name, pk, cost))
    mc = defaultdict(lambda: 1 << 62)
    for _b, _sn, _nn, pk, cost in eligible:
        mc[pk] = min(mc[pk], cost)
    rows = [e for e in eligible if e[4] == mc[e[3]]]
    rows.sort(key=lambda e: (-e[0], e[2], e[1], e[3]))
    exp = rows[:100]
    got = run(spark, "tpch_q2_min_cost_supplier")
    assert len(got) == len(exp) and len(exp) > 0
    for g, e in zip(got, exp):
        assert (g["s_acctbal"], g["s_name"], g["n_name"], g["p_partkey"], g["supplycost_cents"]) == e


def test_tpch_q3_literal(spark, li, orders, cust):
    bld = {ck for ck, _n, _nk, _b, seg in cust if seg == "BUILDING"}
    cut = D("1998-03-15")
    okeys = {ok: od for ok, ck, _st, _tp, od, _pr in orders if ck in bld and od < cut}
    rev = defaultdict(list)
    for ok, _pk, _sk, _q, ep, disc, _rf, sd in li:
        if ok in okeys and sd > cut:
            rev[ok].append(ep * (1 - disc))
    rows = [(ok, pr(math.fsum(v)), okeys[ok].strftime("%Y-%m-%d")) for ok, v in rev.items()]
    rows.sort(key=lambda r: (-r[1], r[0]))
    exp = rows[:10]
    got = run(spark, "tpch_q3_priority")
    assert len(got) == len(exp) > 0
    for g, e in zip(got, exp):
        assert (g["l_orderkey"], g["order_date"]) == (e[0], e[2])
        assert approx_cents(g["revenue"], e[1])


def test_tpch_q4_literal(spark, li, orders):
    lo, hi = D("1997-01-01"), D("1997-04-01")
    ords = {ok: (od, prio) for ok, _ck, _st, _tp, od, prio in orders if lo <= od < hi}
    late = set()
    for ok, *_rest, sd in [(r[0], r[7]) for r in li]:
        if ok in ords and sd > ords[ok][0] + timedelta(days=60):
            late.add(ok)
    cnt = defaultdict(int)
    for ok in late:
        cnt[ords[ok][1]] += 1
    exp = sorted(cnt.items())
    got = run(spark, "tpch_q4_late_orders")
    assert [(g["o_orderpriority"], g["order_count"]) for g in got] == exp and exp


def test_tpch_q5_literal(spark, li, orders, cust, supp, nation, region):
    nat = {nk: (nm, rk) for nk, nm, rk in nation}
    asia = {rk for rk, rn in region if rn == "ASIA"}
    cnk = {ck: nk for ck, _n, nk, _b, _s in cust}
    snk = {sk: nk for sk, _n, nk, _b in supp}
    lo, hi = D("1996-01-01"), D("1997-01-01")
    ocust = {ok: ck for ok, ck, _st, _tp, od, _pr in orders if lo <= od < hi}
    rev = defaultdict(list)
    for ok, _pk, sk, _q, ep, disc, _rf, _sd in li:
        if ok not in ocust:
            continue
        c_nk, s_nk = cnk[ocust[ok]], snk[sk]
        if c_nk != s_nk:
            continue
        n_name, n_rk = nat[s_nk]
        if n_rk in asia:
            rev[n_name].append(ep * (1 - disc))
    rows = sorted(((n, pr(math.fsum(v))) for n, v in rev.items()), key=lambda r: (-r[1], r[0]))
    got = run(spark, "tpch_q5_local_supplier")
    assert [g["n_name"] for g in got] == [r[0] for r in rows] and rows
    for g, r in zip(got, rows):
        assert approx_cents(g["revenue"], r[1])


def test_tpch_q6_literal(spark, li):
    lo, hi = D("1997-01-01"), D("1998-01-01")
    vals = [
        ep * disc
        for _ok, _pk, _sk, q, ep, disc, _rf, sd in li
        if lo <= sd < hi and 0.05 <= disc <= 0.07 and q < 24
    ]
    got = run(spark, "tpch_q6_forecast_revenue")
    assert len(got) == 1 and vals
    assert approx_cents(got[0]["revenue"], pr(math.fsum(vals)))


def test_tpch_q7_literal(spark, li, orders, cust, supp, nation):
    nname = {nk: nm for nk, nm, _rk in nation}
    cnat = {ck: nname[nk] for ck, _n, nk, _b, _s in cust}
    snat = {sk: nname[nk] for sk, _n, nk, _b in supp}
    ocust = {ok: ck for ok, ck, _st, _tp, _od, _pr in orders}
    rev = defaultdict(list)
    for ok, _pk, sk, _q, ep, disc, _rf, sd in li:
        sn, cn = snat[sk], cnat[ocust[ok]]
        if sn != cn:
            rev[(sn, cn, sd.year)].append(ep * (1 - disc))
    rows = sorted((k[0], k[1], k[2], pr(math.fsum(v))) for k, v in rev.items())
    got = run(spark, "tpch_q7_nation_volume")
    assert [(g["supp_nation"], g["cust_nation"], g["l_year"]) for g in got] == [
        r[:3] for r in rows
    ] and rows
    for g, r in zip(got, rows):
        assert approx_cents(g["revenue"], r[3])


def test_tpch_q8_literal(spark, li, orders, cust, supp, nation, region, part):
    nat = {nk: (nm, rk) for nk, nm, rk in nation}
    asia = {rk for rk, rn in region if rn == "ASIA"}
    promo = {pk for pk, _nm, _b, ty, _sz in part if ty == "PROMO"}
    cnk = {ck: nk for ck, _n, nk, _b, _s in cust}
    snat = {sk: nat[nk][0] for sk, _n, nk, _b in supp}
    ometa = {ok: (ck, od.year) for ok, ck, _st, _tp, od, _pr in orders if 1996 <= od.year <= 1997}
    num, den = defaultdict(list), defaultdict(list)
    for ok, pk, sk, _q, ep, disc, _rf, _sd in li:
        if pk not in promo or ok not in ometa:
            continue
        ck, yr = ometa[ok]
        if nat[cnk[ck]][1] not in asia:
            continue
        v = ep * (1 - disc)
        den[yr].append(v)
        if snat[sk] == "NATION_2":
            num[yr].append(v)
    got = run(spark, "tpch_q8_mkt_share")
    assert [g["o_year"] for g in got] == sorted(den) and den
    for g in got:
        share = pr(math.fsum(num[g["o_year"]]) / math.fsum(den[g["o_year"]]), 6)
        assert abs(g["mkt_share"] - share) <= 2e-6


def test_tpch_q9_literal(spark, li, orders, supp, nation, part, partsupp):
    nname = {nk: nm for nk, nm, _rk in nation}
    snat = {sk: nname[nk] for sk, _n, nk, _b in supp}
    bolt = {pk for pk, nm, _b, _t, _sz in part if "bolt" in nm}
    oyear = {ok: od.year for ok, _ck, _st, _tp, od, _pr in orders}
    prof = defaultdict(list)
    for ok, pk, sk, q, ep, disc, _rf, _sd in li:
        if pk in bolt:
            cost = partsupp[(pk, sk)][1]
            prof[(snat[sk], oyear[ok])].append(ep * (1 - disc) - (cost * q) / 100.0)
    rows = sorted(((n, y, pr(math.fsum(v))) for (n, y), v in prof.items()), key=lambda r: (r[0], -r[1]))
    got = run(spark, "tpch_q9_product_profit")
    assert [(g["nation"], g["o_year"]) for g in got] == [r[:2] for r in rows] and rows
    for g, r in zip(got, rows):
        assert approx_cents(g["sum_profit"], r[2])


def test_tpch_q10_literal(spark, li, orders, cust, nation):
    nname = {nk: nm for nk, nm, _rk in nation}
    cmeta = {ck: (nm, bal, nname[nk]) for ck, nm, nk, bal, _s in cust}
    lo, hi = D("1996-10-01"), D("1997-01-01")
    ocust = {ok: ck for ok, ck, _st, _tp, od, _pr in orders if lo <= od < hi}
    rev = defaultdict(list)
    for ok, _pk, _sk, _q, ep, disc, rf, _sd in li:
        if rf == "R" and ok in ocust:
            rev[ocust[ok]].append(ep * (1 - disc))
    rows = [
        (ck, cmeta[ck][0], cmeta[ck][1], cmeta[ck][2], pr(math.fsum(v))) for ck, v in rev.items()
    ]
    rows.sort(key=lambda r: (-r[4], r[0]))
    exp = rows[:20]
    got = run(spark, "tpch_q10_returns")
    assert len(got) == len(exp) > 0
    for g, e in zip(got, exp):
        assert (g["c_custkey"], g["c_name"], g["c_acctbal"], g["n_name"]) == e[:4]
        assert approx_cents(g["revenue"], e[4])


def test_tpch_q11_literal(spark, supp, nation, region, partsupp):
    nat = {nk: rk for nk, _nm, rk in nation}
    europe = {rk for rk, rn in region if rn == "EUROPE"}
    eur_supp = {sk for sk, _n, nk, _b in supp if nat[nk] in europe}
    val = defaultdict(int)
    for (pk, sk), (aq, cost) in partsupp.items():
        if sk in eur_supp:
            val[pk] += cost * aq  # exact integer fold — no float in sight
    total = sum(val.values())
    rows = sorted(
        ((pk, v) for pk, v in val.items() if v * 10000 > total), key=lambda r: (-r[1], r[0])
    )
    got = run(spark, "tpch_q11_important_stock")
    assert [(g["ps_partkey"], g["value_cents"]) for g in got] == rows and rows


def test_tpch_q12_literal(spark, li, orders):
    ometa = {ok: (od, prio) for ok, _ck, _st, _tp, od, prio in orders}
    cnt = {False: [0, 0], True: [0, 0]}
    for ok, _pk, _sk, _q, _ep, _d, _rf, sd in li:
        od, prio = ometa[ok]
        late = sd > od + timedelta(days=90)
        cnt[late][0 if prio in ("1-URGENT", "2-HIGH") else 1] += 1
    got = run(spark, "tpch_q12_late_shipments")
    assert [(g["is_late"], g["high_line_count"], g["low_line_count"]) for g in got] == [
        (k, cnt[k][0], cnt[k][1]) for k in (False, True)
    ]


def test_tpch_q13_literal(spark, orders, cust):
    per = {ck: 0 for ck, *_ in cust}
    for _ok, ck, _st, _tp, _od, prio in orders:
        if prio != "1-URGENT" and ck in per:
            per[ck] += 1
    dist = defaultdict(int)
    for c in per.values():
        dist[c] += 1
    rows = sorted(((cc, n) for cc, n in dist.items()), key=lambda r: (-r[1], -r[0]))
    got = run(spark, "tpch_q13_custdist")
    assert [(g["c_count"], g["custdist"]) for g in got] == rows and rows


def test_tpch_q14_literal(spark, li, part):
    promo = {pk for pk, _nm, _b, ty, _sz in part if ty == "PROMO"}
    lo, hi = D("1997-09-01"), D("1997-10-01")
    num, den = [], []
    for _ok, pk, _sk, _q, ep, disc, _rf, sd in li:
        if lo <= sd < hi:
            v = ep * (1 - disc)
            den.append(v)
            if pk in promo:
                num.append(v)
    exp = pr(100.0 * math.fsum(num) / math.fsum(den), 4)
    got = run(spark, "tpch_q14_promo_share")
    assert len(got) == 1 and den
    assert abs(got[0]["promo_revenue_pct"] - exp) <= 2e-4


def test_tpch_q15_literal(spark, li, supp):
    lo, hi = D("1997-01-01"), D("1997-04-01")
    rev = defaultdict(list)
    for _ok, _pk, sk, _q, ep, disc, _rf, sd in li:
        if lo <= sd < hi:
            rev[sk].append(ep * (1 - disc))
    tot = {sk: pr(math.fsum(v)) for sk, v in rev.items()}
    best = max(tot.values())
    sname = {sk: nm for sk, nm, _nk, _b in supp}
    exp = sorted((sk, sname[sk], r) for sk, r in tot.items() if r == best)
    got = run(spark, "tpch_q15_top_supplier")
    assert [(g["s_suppkey"], g["s_name"]) for g in got] == [e[:2] for e in exp] and exp
    for g, e in zip(got, exp):
        assert approx_cents(g["total_revenue"], e[2])


def test_tpch_q16_literal(spark, supp, part, partsupp):
    bad_supp = {sk for sk, _n, _nk, bal in supp if bal < 0}
    meta = {pk: (b, t, sz) for pk, _nm, b, t, sz in part}
    sizes = {1, 3, 9, 14, 19, 23, 36, 45}
    seen = defaultdict(set)
    for (pk, sk), _v in partsupp.items():
        b, t, sz = meta[pk]
        if b != "Brand#9" and t != "PROMO" and sz in sizes and sk not in bad_supp:
            seen[(b, t, sz)].add(sk)
    rows = sorted(((b, t, sz, len(s)) for (b, t, sz), s in seen.items()), key=lambda r: (-r[3], r[0], r[1], r[2]))
    got = run(spark, "tpch_q16_supplier_cnt")
    assert [(g["p_brand"], g["p_type"], g["p_size"], g["supplier_cnt"]) for g in got] == rows and rows


def test_tpch_q17_literal(spark, li, part):
    sel = {pk for pk, _nm, b, _t, sz in part if b == "Brand#1" and sz < 15}
    qty, price = defaultdict(list), []
    joined = [(pk, q, ep) for _ok, pk, _sk, q, ep, _d, _rf, _sd in li if pk in sel]
    for pk, q, _ep in joined:
        qty[pk].append(q)
    cut = {pk: (math.fsum(v) / len(v)) * 0.5 for pk, v in qty.items()}
    price = [ep for pk, q, ep in joined if q < cut[pk]]
    got = run(spark, "tpch_q17_small_qty")
    assert len(got) == 1 and price
    assert approx_cents(got[0]["avg_yearly"], pr(math.fsum(price) / 7.0))


def test_tpch_q19_literal(spark, li, part):
    meta = {pk: (b, sz) for pk, _nm, b, _t, sz in part}
    vals = []
    for _ok, pk, _sk, q, ep, disc, _rf, _sd in li:
        b, sz = meta[pk]
        if (
            (b == "Brand#1" and 1 <= sz <= 10 and 1 <= q <= 15)
            or (b == "Brand#2" and 5 <= sz <= 20 and 10 <= q <= 25)
            or (b == "Brand#3" and 10 <= sz <= 30 and 20 <= q <= 35)
        ):
            vals.append(ep * (1 - disc))
    got = run(spark, "tpch_q19_disjunctive")
    assert len(got) == 1 and vals
    assert got[0]["n_lineitems"] == len(vals)
    assert approx_cents(got[0]["revenue"], pr(math.fsum(vals)))


def test_tpch_q18_literal(spark, li, orders, cust):
    qty = defaultdict(list)
    for ok, _pk, _sk, q, *_ in li:
        qty[ok].append(q)
    big = {ok: pr(math.fsum(v)) for ok, v in qty.items() if pr(math.fsum(v)) > 180}
    cname = {ck: nm for ck, nm, *_ in cust}
    rows = [
        (cname[ck], ck, ok, tp, big[ok])
        for ok, ck, _st, tp, _od, _pr_ in orders
        if ok in big
    ]
    rows.sort(key=lambda r: (-r[3], r[2]))
    exp = rows[:50]
    got = run(spark, "tpch_q18_large_orders")
    assert len(got) == len(exp) > 0
    for g, e in zip(got, exp):
        assert (g["c_name"], g["c_custkey"], g["o_orderkey"], g["o_totalprice"]) == e[:4]
        assert approx_cents(g["total_qty"], e[4])


def test_tpch_q20_literal(spark, li, supp, nation, part, partsupp):
    red = {pk for pk, nm, _b, _t, _sz in part if nm.startswith("red")}
    lo, hi = D("1997-01-01"), D("1998-01-01")
    shipped = defaultdict(int)
    for _ok, pk, sk, q, _ep, _d, _rf, sd in li:
        if pk in red and lo <= sd < hi:
            shipped[(pk, sk)] += int(q)
    excess = {
        sk for (pk, sk), tot in shipped.items() if partsupp[(pk, sk)][0] * 2 > tot
    }
    nname = {nk: nm for nk, nm, _rk in nation}
    rows = sorted(
        (nm, sk) for sk, nm, nk, _b in supp if nname[nk] == "NATION_3" and sk in excess
    )
    got = run(spark, "tpch_q20_excess_stock")
    assert [(g["s_name"], g["s_suppkey"]) for g in got] == rows and rows


def test_tpch_q21_literal(spark, li, orders, supp):
    ometa = {ok: od for ok, _ck, st, _tp, od, _pr in orders if st == "F"}
    late = {}
    for ok, _pk, sk, _q, _ep, _d, _rf, sd in li:
        if ok in ometa:
            key = (ok, sk)
            late[key] = max(late.get(key, 0), int(sd > ometa[ok] + timedelta(days=90)))
    by_order = defaultdict(list)
    for (ok, sk), w in late.items():
        by_order[ok].append((sk, w))
    sname = {sk: nm for sk, nm, _nk, _b in supp}
    cnt = defaultdict(int)
    for ok, pairs in by_order.items():
        for sk, w in pairs:
            if w != 1:
                continue
            others = [(s2, w2) for s2, w2 in pairs if s2 != sk]
            if others and not any(w2 == 1 for _s2, w2 in others):
                cnt[sname[sk]] += 1
    rows = sorted(((nm, n) for nm, n in cnt.items()), key=lambda r: (-r[1], r[0]))[:20]
    got = run(spark, "tpch_q21_waiting_supplier")
    assert [(g["s_name"], g["numwait"]) for g in got] == rows and rows


def test_tpch_q22_literal(spark, orders, cust):
    pos = [bal for _ck, _nm, _nk, bal, _s in cust if bal > 0]
    cut = pr(math.fsum(pos) / len(pos), 6)
    urgent = {ck for _ok, ck, _st, _tp, _od, prio in orders if prio == "1-URGENT"}
    grp = defaultdict(list)
    for ck, _nm, nk, bal, _s in cust:
        if bal > cut and ck not in urgent:
            grp[nk].append(bal)
    rows = sorted((nk, len(v), pr(math.fsum(v))) for nk, v in grp.items())
    got = run(spark, "tpch_q22_inactive")
    assert [(g["c_nationkey"], g["numcust"]) for g in got] == [r[:2] for r in rows] and rows
    for g, r in zip(got, rows):
        assert approx_cents(g["totacctbal"], r[2])
