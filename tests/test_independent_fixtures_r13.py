"""Round-13 independent fixtures: the oracle-divergent residue and the
relational mirrored-only stratum (VERDICT r12 item 2, continued).

Same discipline as tests/test_independent_fixtures.py: every expectation is
computed DEFINITIONALLY in pure Python over the raw sf0.001 parquet
(pyarrow) — dict folds, brute-force pair scans, literal prefix sums — and
compared against the registered Spark builder. These specs' oracles either
diverge textually from the Spark plan (salting, unpivot, grouping sets,
range join) or mirror it closely enough that only a third-way fold breaks
the shared-formula blind spot.

Float discipline: keys/counts exact; cent-rounded sums/avgs allow ±1.5
ulp-of-the-quantizer (fsum vs distributed pairwise summation).
"""

import math
from collections import defaultdict
from datetime import datetime, timedelta, timezone

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
def orders():
    return _rows(
        "orders",
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"],
    )


@pytest.fixture(scope="module")
def cust():
    return _rows("customer", ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"])


@pytest.fixture(scope="module")
def events_us():
    t = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "ts", "user_id"])
    import pyarrow as pa

    ts = t.column("ts")
    ints = ts.cast(pa.int64()).to_pylist()
    if ts.type.unit == "ns":
        ints = [v // 1000 for v in ints]
    return list(zip(t.column("event_id").to_pylist(), ints, t.column("user_id").to_pylist()))


# ----------------------------------------------------- oracle-divergent four


def test_salted_groupby_skew_literal(spark, orders):
    """The salted two-phase aggregate must be EXACTLY the plain group-by:
    count and mean per customer, independent of the salt fan-out."""
    per = defaultdict(list)
    for _ok_, ck, _st, tp, _od, _pr_ in orders:
        per[ck].append(tp)
    got = {r["o_custkey"]: (r["count_activity"], r["mean_duration"]) for r in run(spark, "salted_groupby_skew")}
    assert set(got) == set(per)
    for ck, vals in per.items():
        n, m = got[ck]
        assert n == len(vals) and ok(m, pr(math.fsum(vals) / len(vals)))


def test_range_join_pairs_literal(spark, events_us):
    """Brute-force per-user pair scan: ev_a < ev_b and ts_b within
    [ts_a, ts_a + 2 min] — the banded range-join must return exactly it."""
    per = defaultdict(list)
    for eid, us, uid in events_us:
        per[uid].append((eid, us))
    exp = set()
    for uid, evs in per.items():
        for ea, ta in evs:
            for eb, tb in evs:
                if ea < eb and ta <= tb <= ta + 120_000_000:
                    exp.add((uid, ea, eb))
    got = {(r["user_id"], r["ev_a"], r["ev_b"]) for r in run(spark, "range_join_pairs")}
    assert got == exp and exp


def test_grouping_sets_literal(spark, orders):
    by_status, by_prio = defaultdict(int), defaultdict(int)
    for _ok_, _ck, st, _tp, _od, prio in orders:
        by_status[st] += 1
        by_prio[prio] += 1
    exp = (
        {(st, None, n) for st, n in by_status.items()}
        | {(None, p, n) for p, n in by_prio.items()}
        | {(None, None, len(orders))}
    )
    got = {(r["o_orderstatus"], r["o_orderpriority"], r["n"]) for r in run(spark, "grouping_sets")}
    assert got == exp


def test_unpivot_measures_literal(spark, cust):
    exp = {(ck, "acctbal", bal) for ck, _n, _nk, bal, _s in cust} | {
        (ck, "nationkey", float(nk)) for ck, _n, nk, _bal, _s in cust
    }
    got = {(r["c_custkey"], r["measure"], r["value"]) for r in run(spark, "unpivot_measures")}
    assert got == exp and len(got) == 2 * len(cust)


# ------------------------------------------------------- relational stratum


def test_groupby_count_avg_literal(spark, orders):
    per = defaultdict(list)
    for _ok_, ck, _st, tp, _od, _pr_ in orders:
        per[ck].append(tp)
    got = {r["o_custkey"]: (r["count_activity"], r["mean_duration"]) for r in run(spark, "groupby_count_avg")}
    assert set(got) == set(per)
    for ck, vals in per.items():
        assert got[ck][0] == len(vals) and ok(got[ck][1], pr(math.fsum(vals) / len(vals)))


def test_left_join_agg_literal(spark, orders, cust):
    per = defaultdict(list)
    for _ok_, ck, _st, tp, _od, _pr_ in orders:
        per[ck].append(tp)
    got = {
        r["c_custkey"]: (r["c_name"], r["count_activity"], r["mean_duration"], r["count_activity_filled"])
        for r in run(spark, "left_join_agg")
    }
    assert set(got) == {ck for ck, *_ in cust}
    for ck, nm, _nk, _bal, _seg in cust:
        name, n, m, filled = got[ck]
        assert name == nm
        if ck in per:
            assert n == len(per[ck]) == filled and ok(m, pr(math.fsum(per[ck]) / len(per[ck])))
        else:
            assert n is None and m is None and filled == 0


def test_anti_semi_join_literal(spark, orders, cust):
    with_orders = {ck for _ok_, ck, *_ in orders}
    exp_anti = {(ck, nm) for ck, nm, *_ in cust if ck not in with_orders}
    got_anti = {(r["c_custkey"], r["c_name"]) for r in run(spark, "anti_join")}
    assert got_anti == exp_anti
    recent = {ck for _ok_, ck, _st, _tp, od, _pr_ in orders if od >= datetime(2000, 1, 1)}
    exp_semi = {(ck, nm) for ck, nm, *_ in cust if ck in recent}
    got_semi = {(r["c_custkey"], r["c_name"]) for r in run(spark, "semi_join")}
    assert got_semi == exp_semi


def test_set_ops_literal(spark, orders, cust):
    building = [(ck, seg) for ck, _n, _nk, bal, seg in cust if seg == "BUILDING"]
    negative = [(ck, seg) for ck, _n, _nk, bal, seg in cust if bal < 0]
    got_union = sorted((r["c_custkey"], r["c_mktsegment"]) for r in run(spark, "set_union_all"))
    assert got_union == sorted(building + negative)  # bag semantics: duplicates kept
    with_orders = {ck for _ok_, ck, *_ in orders}
    rich = {ck for ck, _n, _nk, bal, _s in cust if bal > 5000}
    got_inter = {r["c_custkey"] for r in run(spark, "set_intersect")}
    assert got_inter == (with_orders & rich)
    got_except = {r["c_custkey"] for r in run(spark, "set_except")}
    assert got_except == {ck for ck, *_ in cust} - with_orders


def test_distinct_scalar_counts_literal(spark, orders):
    r = run(spark, "distinct_agg")[0]
    assert r["n_customers"] == len({ck for _ok_, ck, *_ in orders})
    assert r["n_statuses"] == len({st for _ok_, _ck, st, *_ in orders})
    assert r["n_orders"] == len(orders)
    li_n = pq.ParquetFile(f"{SF}/lineitem.parquet").metadata.num_rows
    assert run(spark, "scalar_count")[0]["n_rows"] == li_n


def test_rollup_cube_literal(spark, orders):
    combo, by_st, by_pr = defaultdict(list), defaultdict(list), defaultdict(list)
    allv = []
    for _ok_, _ck, st, tp, _od, prio in orders:
        combo[(st, prio)].append(tp)
        by_st[st].append(tp)
        by_pr[prio].append(tp)
        allv.append(tp)
    exp_rollup = (
        {(st, p, len(v), pr(math.fsum(v), 0)) for (st, p), v in combo.items()}
        | {(st, None, len(v), pr(math.fsum(v), 0)) for st, v in by_st.items()}
        | {(None, None, len(allv), pr(math.fsum(allv), 0))}
    )
    got = {
        (r["o_orderstatus"], r["o_orderpriority"], r["n_orders"], r["sum_price"])
        for r in run(spark, "rollup_agg")
    }
    assert {g[:3] for g in got} == {e[:3] for e in exp_rollup}
    exp_by_key = {e[:3]: e[3] for e in exp_rollup}
    for st, p, n, s in got:
        assert ok(s, exp_by_key[(st, p, n)], 0)
    # cube adds the (None, priority) slice, with avg instead of sum
    got_cube = {
        (r["o_orderstatus"], r["o_orderpriority"]): (r["n_orders"], r["avg_price"])
        for r in run(spark, "cube_agg")
    }
    assert set(got_cube) == set(combo) | {(st, None) for st in by_st} | {
        (None, p) for p in by_pr
    } | {(None, None)}
    for p, v in by_pr.items():
        n, a = got_cube[(None, p)]
        assert n == len(v) and ok(a, pr(math.fsum(v) / len(v)))


def test_window_running_sum_and_lag_literal(spark, orders):
    per = defaultdict(list)
    for ok_, ck, _st, tp, od, _pr_ in orders:
        per[ck].append((od, ok_, tp))
    exp_run, exp_lag = {}, {}
    for ck, rows in per.items():
        rows.sort(key=lambda r: (r[0], r[1]))
        acc = 0.0
        prev_date = None
        for od, ok_, tp in rows:
            acc += tp
            exp_run[(ck, ok_)] = pr(acc)
            exp_lag[(ck, ok_)] = None if prev_date is None else (od.date() - prev_date).days
            prev_date = od.date()
    got_run = {(r["o_custkey"], r["o_orderkey"]): r["running_spend"] for r in run(spark, "window_running_sum")}
    assert set(got_run) == set(exp_run)
    assert all(ok(v, exp_run[k]) for k, v in got_run.items())
    got_lag = {(r["o_custkey"], r["o_orderkey"]): r["days_since_prev"] for r in run(spark, "window_lag")}
    assert got_lag == exp_lag


def test_subqueries_literal(spark, orders, cust):
    big_cust = {ck for _ok_, ck, _st, tp, *_ in orders if tp > 400000}
    got = {(r["c_custkey"], r["c_name"]) for r in run(spark, "exists_subquery")}
    assert got == {(ck, nm) for ck, nm, *_ in cust if ck in big_cust}
    avg_price = math.fsum(tp for _ok_, _ck, _st, tp, *_ in orders) / len(orders)
    exp = {(ok_, ck, tp) for ok_, ck, _st, tp, *_ in orders if tp > 1.5 * avg_price}
    got2 = {(r["o_orderkey"], r["o_custkey"], r["o_totalprice"]) for r in run(spark, "scalar_subquery")}
    # avg is a shared float boundary; tolerate rows within 1e-6 of the cut
    sym = got2 ^ exp
    assert all(abs(tp - 1.5 * avg_price) < 1e-6 * avg_price for _o, _c, tp in sym), sym


def test_having_filter_literal(spark, orders):
    per = defaultdict(list)
    for _ok_, ck, _st, tp, *_ in orders:
        per[ck].append(tp)
    exp = {ck: (len(v), pr(math.fsum(v), 0)) for ck, v in per.items() if len(v) >= 15}
    got = {r["o_custkey"]: (r["n_orders"], r["total_spend"]) for r in run(spark, "having_filter")}
    assert set(got) == set(exp)
    for ck, (n, s) in exp.items():
        assert got[ck][0] == n and ok(got[ck][1], s, 0)


def test_pivot_status_counts_literal(spark, orders):
    cnt = defaultdict(lambda: {"F": 0, "O": 0, "P": 0})
    for _ok_, _ck, st, _tp, _od, prio in orders:
        if st in cnt[prio]:
            cnt[prio][st] += 1
    got = {r["o_orderpriority"]: (r["n_f"], r["n_o"], r["n_p"]) for r in run(spark, "pivot_status_counts")}
    assert got == {p: (c["F"], c["O"], c["P"]) for p, c in cnt.items()}


def test_masked_view_literal(spark, cust):
    got = {(r["c_custkey"], r["c_name"], r["c_mktsegment"], r["c_acctbal"]) for r in run(spark, "masked_view")}
    assert got == {(ck, None, seg, bal) for ck, _nm, _nk, bal, seg in cust}


def test_histogram_acctbal_literal(spark, cust):
    bins = defaultdict(int)
    for _ck, _nm, _nk, bal, _seg in cust:
        bins[math.floor((bal - (-1000.0)) / 1000.0)] += 1
    got = [(r["bucket"], r["n_customers"]) for r in run(spark, "histogram_acctbal")]
    assert got == sorted(bins.items())


def test_hourly_heatmap_literal(spark, events_us):
    cnt = defaultdict(int)
    for _eid, us, _uid in events_us:
        dt = datetime.fromtimestamp(us // 1_000_000, tz=timezone.utc)
        cnt[(dt.strftime("%A"), dt.hour)] += 1
    got = {(r["day_name"], r["hour_of_day"], r["n_events"]) for r in run(spark, "hourly_heatmap")}
    assert got == {(d, h, n) for (d, h), n in cnt.items()}


def test_date_arithmetic_literal(spark, orders):
    import calendar

    got = {r["o_orderkey"]: r for r in run(spark, "date_arithmetic")}
    assert set(got) == {ok_ for ok_, *_ in orders}
    for ok_, _ck, _st, _tp, od, _pr_ in orders:
        d = od.date()
        g = got[ok_]
        assert g["due_date"] == d + timedelta(days=30)
        assert g["week_before"] == d - timedelta(days=7)
        assert g["month_start"] == d.replace(day=1)
        assert g["month_end"] == d.replace(day=calendar.monthrange(d.year, d.month)[1])
        assert g["days_to_2002"] == (datetime(2002, 1, 1).date() - d).days
        assert g["qtr"] == (d.month + 2) // 3


def test_stats_aggregates_literal(spark):
    t = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_quantity", "l_extendedprice", "l_discount"]
    )
    per = defaultdict(list)
    for rf, q, ep, disc in zip(*[t.column(c).to_pylist() for c in t.column_names]):
        per[rf].append((q, ep, disc))
    got = {r["l_returnflag"]: r for r in run(spark, "stats_aggregates")}
    assert set(got) == set(per)
    for rf, rows in per.items():
        n = len(rows)
        qs = [r[0] for r in rows]
        mq = math.fsum(qs) / n
        var = math.fsum((q - mq) ** 2 for q in qs) / (n - 1)
        me = math.fsum(r[1] for r in rows) / n
        md = math.fsum(r[2] for r in rows) / n
        cov_qe = math.fsum((q - mq) * (e - me) for q, e, _ in rows) / (n - 1)
        var_e = math.fsum((e - me) ** 2 for _, e, _ in rows) / (n - 1)
        cov_qd = math.fsum((q - mq) * (d - md) for q, _, d in rows) / (n - 1)
        g = got[rf]
        assert ok(g["sd_qty"], pr(math.sqrt(var), 4), 4)
        assert ok(g["var_qty"], pr(var, 4), 4)
        assert ok(g["corr_qty_price"], pr(cov_qe / math.sqrt(var * var_e), 4), 4)
        assert ok(g["covar_qty_disc"], pr(cov_qd, 6), 6)


# --------------------------------------------------- function surface batch


@pytest.fixture(scope="module")
def events_full():
    t = pq.read_table(
        f"{SF}/events.parquet", columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    import pyarrow as pa

    ts = t.column("ts")
    ints = ts.cast(pa.int64()).to_pylist()
    if ts.type.unit == "ns":
        ints = [v // 1000 for v in ints]
    return list(
        zip(
            t.column("event_id").to_pylist(),
            ints,
            t.column("user_id").to_pylist(),
            t.column("event_type").to_pylist(),
            t.column("value").to_pylist(),
            t.column("props").to_pylist(),
        )
    )


@pytest.fixture(scope="module")
def part():
    return _rows("part", ["p_partkey", "p_name", "p_brand", "p_type"])


def _utc(us: int) -> datetime:
    return datetime.fromtimestamp(us // 1_000_000, tz=timezone.utc).replace(
        tzinfo=None
    ) + timedelta(microseconds=us % 1_000_000)


def test_array_agg_sorted_literal(spark, orders):
    per = defaultdict(list)
    for ok_, ck, *_ in orders:
        if ck < 20:
            per[ck].append(ok_)
    got = {r["o_custkey"]: (r["orderkeys"], r["n"]) for r in run(spark, "array_agg_sorted")}
    assert got == {ck: (",".join(str(k) for k in sorted(v)), len(v)) for ck, v in per.items()}


def test_string_funcs_literal(spark, cust, part):
    import re

    got = {r["c_custkey"]: r for r in run(spark, "string_funcs")}
    for ck, nm, _nk, _bal, seg in cust:
        g = got[ck]
        assert g["display_name"] == f"{nm} {seg}"
        assert g["segment_upper"] == seg.upper()
        assert g["name_prefix"] == nm[:8]
        assert g["name_len"] == len(nm)
        assert g["cust_tag"] == f"cust-{ck}"
    got2 = {r["p_partkey"]: r for r in run(spark, "string_funcs2")}
    for pk, nm, brand, ptype in part:
        g = got2[pk]
        m = re.search(r"([A-Z]+)", nm)
        assert g["first_word"] == (m.group(1) if m else "")
        assert g["padded_key"] == str(pk).rjust(10, "0")
        assert g["brand_clean"] == brand.replace("#", "-")
        assert g["type_rev"] == ptype[::-1]
        assert g["name5"] == nm[:5]
        assert g["is_promo"] == ("PROMO" in ptype)


def test_conditional_case_cast_literal(spark, cust):
    got = {r["c_custkey"]: r for r in run(spark, "conditional_funcs")}
    for ck, _nm, _nk, bal, seg in cust:
        g = got[ck]
        seg_or_null = None if seg == "BUILDING" else seg
        assert g["seg_or_null"] == seg_or_null
        assert g["seg_filled"] == (seg_or_null if seg_or_null is not None else "MASKED")
        assert g["bal_floor0"] == max(bal, 0.0)
        assert g["bal_cap1k"] == min(bal, 1000.0)
        assert g["bal_abs"] == abs(bal)
        assert g["bal_sign"] == (0.0 if bal == 0 else math.copysign(1.0, bal))
    got2 = {r["c_custkey"]: (r["tier"], r["bonus"]) for r in run(spark, "case_when_bonus")}
    for ck, _nm, _nk, bal, _seg in cust:
        tier = "debtor" if bal < 0 else ("standard" if bal < 5000 else "premium")
        bonus = pr(bal * 0.05) if bal > 0 else 0.0
        t, b = got2[ck]
        assert t == tier and ok(b, bonus)


def test_cast_types_literal(spark):
    t = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_quantity", "l_shipdate", "l_linenumber"],
    )
    rows = list(zip(*[t.column(c).to_pylist() for c in t.column_names]))
    got = sorted(
        (r["orderkey_str"], r["quantity_int"], r["ship_date"], r["linenumber_long"])
        for r in run(spark, "cast_types")
    )
    exp = sorted((str(ok_), math.floor(q), sd.date(), int(ln)) for ok_, q, sd, ln in rows)
    assert got == exp


def test_date_funcs_literal(spark, orders):
    got = {r["o_orderkey"]: r for r in run(spark, "date_funcs")}
    for ok_, _ck, _st, _tp, od, _pr_ in orders:
        g = got[ok_]
        assert g["order_year"] == od.year and g["order_month"] == od.month
        assert g["order_ym"] == f"{od.year:04d}-{od.month:02d}"
        assert g["is_weekend"] == (od.weekday() >= 5)  # Python Mon=0 .. Sun=6


def test_null_logic_full_outer_null_safe_literal(spark, orders, cust, events_full):
    n_orders = defaultdict(int)
    for _ok_, ck, *_ in orders:
        n_orders[ck] += 1
    got = {r["c_custkey"]: r for r in run(spark, "null_logic_coalesce")}
    for ck, *_ in cust:
        g, n = got[ck], n_orders.get(ck)
        assert g["n_orders"] == n
        assert g["ge10_raw"] == (None if n is None else n >= 10)
        assert g["ge10_case"] == (n is not None and n >= 10)
        assert g["n_orders_filled"] == (n or 0)
    buys, clicks = defaultdict(int), defaultdict(int)
    for _eid, _us, uid, et, _v, _p in events_full:
        if et == "purchase":
            buys[uid] += 1
        elif et == "click":
            clicks[uid] += 1
    got_fo = {r["user_id"]: (r["n_buys"], r["n_clicks"]) for r in run(spark, "full_outer_join")}
    assert got_fo == {u: (buys.get(u, 0), clicks.get(u, 0)) for u in set(buys) | set(clicks)}
    nk = {ck: (None if ck % 7 == 0 else nkey) for ck, _nm, nkey, _bal, _seg in cust}
    group = defaultdict(int)
    for v in nk.values():
        group[v] += 1
    got_ns = {r["c_custkey"]: (r["nk"], r["nation_group_size"]) for r in run(spark, "null_safe_join")}
    assert got_ns == {ck: (v, group[v]) for ck, v in nk.items()}


def test_multiway_join_rollup_literal(spark, orders, cust):
    nat = _rows("nation", ["n_nationkey", "n_name", "n_regionkey"])
    reg = dict(_rows("region", ["r_regionkey", "r_name"]))
    nmeta = {nk: (nm, reg[rk]) for nk, nm, rk in nat}
    cmeta = {ck: nk for ck, _nm, nk, _bal, _seg in cust}
    agg = defaultdict(list)
    for _ok_, ck, _st, tp, *_ in orders:
        n_name, r_name = nmeta[cmeta[ck]]
        agg[(r_name, n_name)].append(tp)
    got = {(r["r_name"], r["n_name"]): (r["n_orders"], r["sum_price"]) for r in run(spark, "multiway_join_rollup")}
    assert set(got) == set(agg)
    for k, v in agg.items():
        assert got[k][0] == len(v) and ok(got[k][1], pr(math.fsum(v), 0), 0)


def test_ratio_to_report_literal(spark, orders, cust):
    nat = dict(
        (nk, nm) for nk, nm, _rk in _rows("nation", ["n_nationkey", "n_name", "n_regionkey"])
    )
    cmeta = {ck: nk for ck, _nm, nk, _bal, _seg in cust}
    cents = defaultdict(int)
    for _ok_, ck, _st, tp, *_ in orders:
        cents[nat[cmeta[ck]]] += math.floor(tp * 100 + 0.5)
    total = sum(cents.values())
    got = {r["n_name"]: (r["rev_cents"], r["rev_share"]) for r in run(spark, "ratio_to_report")}
    assert {k: v[0] for k, v in got.items()} == dict(cents)
    for nm, c in cents.items():
        assert ok(got[nm][1], pr(c / total, 6), 6)


def test_cumulative_new_users_literal(spark, events_full):
    first = {}
    for _eid, us, uid, _et, _v, _p in events_full:
        d = _utc(us).date()
        if uid not in first or d < first[uid]:
            first[uid] = d
    per_day = defaultdict(int)
    for d in first.values():
        per_day[d] += 1
    acc, exp = 0, []
    for d in sorted(per_day):
        acc += per_day[d]
        exp.append((d, per_day[d], acc))
    got = [(r["first_day"], r["n_new_users"], r["cumulative_users"]) for r in run(spark, "cumulative_new_users")]
    assert got == exp


def test_json_epoch_late_literal(spark, events_full):
    import json as _json

    exp_json = {}
    for eid, _us, _uid, _et, _v, props in events_full:
        try:
            k = _json.loads(props).get("k")
        except (ValueError, AttributeError):
            k = None
        if isinstance(k, (int, float)) and int(k) > 50:
            exp_json[eid] = int(k)
    got_json = {r["event_id"]: r["k_value"] for r in run(spark, "json_extract")}
    assert got_json == exp_json
    got_ep = {r["event_id"]: (r["ts_us"], r["ts_decoded"]) for r in run(spark, "epoch_us_roundtrip")}
    assert got_ep == {eid: (us, _utc(us)) for eid, us, *_ in events_full}
    horizon = max(us for _eid, us, *_ in events_full) - 7 * 86_400_000_000
    cnt = defaultdict(int)
    for _eid, us, _uid, et, _v, _p in events_full:
        if us >= horizon:
            cnt[et] += 1
    got_late = {r["event_type"]: r["n_recent"] for r in run(spark, "late_data_filter")}
    assert got_late == dict(cnt)


def test_preference_pairs_literal(spark, events_full):
    per = defaultdict(list)
    for eid, _us, uid, et, v, _p in events_full:
        if et == "purchase" and v is not None:
            per[uid].append((v, eid))
    exp = {}
    for uid, rows in per.items():
        if len(rows) >= 2:
            mx, mn = max(rows), min(rows)
            exp[uid] = (mx[1], mn[1], pr(mx[0], 4), pr(mn[0], 4), pr(mx[0] - mn[0], 4), len(rows))
    got = {
        r["user_id"]: (
            r["chosen_event"], r["rejected_event"], r["chosen_value"], r["rejected_value"], r["margin"], r["n_candidates"],
        )
        for r in run(spark, "preference_pairs")
    }
    assert set(got) == set(exp)
    for uid, e in exp.items():
        g = got[uid]
        assert g[:2] == e[:2] and g[5] == e[5]
        assert ok(g[2], e[2], 4) and ok(g[3], e[3], 4) and ok(g[4], e[4], 4)


def test_bitwise_funcs_literal(spark, orders):
    from functools import reduce

    per = defaultdict(list)
    for ok_, ck, *_ in orders:
        per[ck].append(ok_ & 0xFFFF)
    got = [tuple(r) for r in run(spark, "bitwise_funcs")]
    exp = []
    for ck in sorted(per):
        lows = per[ck]
        exp.append(
            (
                ck,
                len(lows),
                reduce(lambda a, b: a & b, lows),
                reduce(lambda a, b: a | b, lows),
                reduce(lambda a, b: a ^ b, lows),
                ck & 255,
                ck | 4096,
                ck ^ 0x5A5A,
                ~ck,
                ck << 3,
                ck >> 2,
                bin(ck).count("1"),
            )
        )
    assert got == exp


# ------------------------------------------- batch 4: windows, HOFs, corpus


def h64(s, seed=None) -> int:
    import hashlib

    base = f"{seed}:{s}" if seed is not None else str(s)
    return int(hashlib.md5(base.encode()).hexdigest()[:15], 16)


def py_tokens(text):
    import re

    return [t for t in re.split(r"\s+", text.strip()) if t]


@pytest.fixture(scope="module")
def docs():
    return _rows("documents", ["doc_id", "text", "lang", "n_chars"])


def _per_cust_sorted(orders):
    per = defaultdict(list)
    for ok_, ck, _st, _tp, od, _pr_ in orders:
        per[ck].append((od, ok_))
    for rows in per.values():
        rows.sort()
    return per


def test_window_funcs2_literal(spark, orders):
    per = _per_cust_sorted(orders)
    got = {
        (r["o_custkey"], r["o_orderkey"]): (r["quartile"], r["pct_rank"], r["first_order"], r["next_order"])
        for r in run(spark, "window_funcs2")
    }
    for ck, rows in per.items():
        n = len(rows)
        base, rem = divmod(n, 4)
        for i, (_od, ok_) in enumerate(rows):
            # ntile: first `rem` buckets get base+1 rows
            acc, tile = 0, 0
            for t in range(1, 5):
                acc += base + (1 if t <= rem else 0)
                if i < acc:
                    tile = t
                    break
            prk = 0.0 if n == 1 else pr(i / (n - 1), 6)
            nxt = rows[i + 1][1] if i + 1 < n else None
            q, p, f, nx = got[(ck, ok_)]
            assert q == tile and f == rows[0][1] and nx == nxt
            assert ok(p, prk, 6)


def test_window_funcs3_literal(spark, orders):
    per = _per_cust_sorted(orders)
    got = {
        (r["o_custkey"], r["o_orderkey"]): (r["cdist"], r["drank"], r["second_order"], r["prev_order"])
        for r in run(spark, "window_funcs3")
    }
    for ck, rows in per.items():
        n = len(rows)
        for i, (_od, ok_) in enumerate(rows):
            c, d, s, p = got[(ck, ok_)]
            assert ok(c, pr((i + 1) / n, 6), 6)
            assert d == i + 1
            assert s == (rows[1][1] if n >= 2 else None)
            assert p == (rows[i - 1][1] if i > 0 else -1)


def test_higher_order_funcs_literal(spark):
    t = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])
    per = defaultdict(list)
    for ok_, q in zip(t.column("l_orderkey").to_pylist(), t.column("l_quantity").to_pylist()):
        per[ok_].append(int(q))  # cast("long") truncates toward zero, as int() does for q>0
    got = {r["l_orderkey"]: r for r in run(spark, "higher_order_funcs")}
    assert set(got) == set(per)
    for ok_, qs in per.items():
        qs = sorted(qs)
        g = got[ok_]
        assert g["n_over_25"] == sum(1 for x in qs if x > 25)
        assert g["doubled_sum"] == sum(2 * x for x in qs)
        assert g["any_ge_45"] == any(x >= 45 for x in qs)
        assert g["all_positive"] == all(x > 0 for x in qs)
        assert g["qtys_csv"] == ",".join(str(x) for x in qs)


def test_map_funcs_literal(spark, events_full):
    cnt = defaultdict(lambda: defaultdict(int))
    for _eid, _us, uid, et, _v, _p in events_full:
        cnt[uid][et] += 1
    got = {r["user_id"]: (r["n_types"], r["hot_types"], r["hot_counts_x2"]) for r in run(spark, "map_funcs")}
    assert set(got) == set(cnt)
    for uid, types in cnt.items():
        hot = [(et, n * 2) for et, n in sorted(types.items()) if n >= 13]
        assert got[uid] == (
            len(types),
            ",".join(et for et, _ in hot),
            ",".join(str(n) for _, n in hot),
        )


def test_try_functions_literal(spark, events_full):
    got = {r["event_id"]: (r["parsed_id"], r["value_per_bucket"]) for r in run(spark, "try_functions")}
    for eid, _us, uid, _et, v, _p in events_full:
        parsed = None if eid % 5 == 0 else eid
        div = uid % 3
        vpb = None if (div == 0 or v is None) else pr(v / div, 4)
        g = got[eid]
        assert g[0] == parsed
        assert (g[1] is None) == (vpb is None) and (vpb is None or ok(g[1], vpb, 4))


def test_listagg_param_sql_literal(spark, orders):
    per = defaultdict(list)
    for ok_, ck, *_ in orders:
        if ck < 30:
            per[ck].append(ok_)
    got = [(r["custkey"], r["n_orders"], r["orderkeys_desc"]) for r in run(spark, "listagg_param_sql")]
    exp = [
        (ck, len(v), ",".join(str(k) for k in sorted(v, reverse=True)))
        for ck, v in sorted(per.items())
    ]
    assert got == exp


def test_lateral_subquery_topn_literal(spark, cust):
    from decimal import ROUND_HALF_UP, Decimal

    nat = _rows("nation", ["n_nationkey", "n_name"])
    per = defaultdict(list)
    for ck, _nm, nk, bal, _seg in cust:
        cents = int(Decimal(repr(bal * 100)).quantize(Decimal(1), ROUND_HALF_UP))
        per[nk].append((-cents, ck))
    exp = []
    for nk, n_name in sorted(nat, key=lambda r: r[1]):
        top = sorted(per.get(nk, []))[:3]
        exp.extend((n_name, ck, -negc) for negc, ck in top)
    got = [(r["n_name"], r["c_custkey"], r["cents"]) for r in run(spark, "lateral_subquery_topn")]
    assert got == exp and exp


def test_skew_validation_profile_literal(spark):
    t = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_suppkey", "l_quantity", "l_discount", "l_extendedprice"],
    )
    sk = t.column("l_suppkey").to_pylist()
    per = defaultdict(int)
    for k in sk:
        per[k] += 1
    r = run(spark, "skew_profile")[0]
    mx = max(per.values())
    assert r["n_keys"] == len(per) and r["total_rows"] == len(sk)
    assert r["max_cnt"] == mx and r["min_cnt"] == min(per.values())
    assert r["hottest_key"] == min(k for k, n in per.items() if n == mx)
    assert ok(r["skew_ratio"], pr(mx / (len(sk) / len(per)), 4), 4)
    v = run(spark, "validation_profile")[0]
    for c in ("l_quantity", "l_discount", "l_extendedprice"):
        vals = t.column(c).to_pylist()
        assert v[f"{c}_nulls"] == sum(1 for x in vals if x is None)
        assert v[f"{c}_min"] == min(x for x in vals if x is not None)
        assert v[f"{c}_max"] == max(x for x in vals if x is not None)
    assert v["n_rows"] == len(sk)


def test_corpus_split_and_stratified_literal(spark, docs):
    got = {r["doc_id"]: (r["bucket"], r["split"]) for r in run(spark, "corpus_split_assign")}
    for did, _txt, _lang, _nc in docs:
        b = h64(did) % 100
        s = "train" if b < 80 else ("val" if b < 90 else "test")
        assert got[did] == (b, s)
    rates = {"en": 0.3, "fr": 1.0, "de": 1.0, "es": 1.0, "zh": 1.0}
    exp = set()
    for did, _txt, lang, _nc in docs:
        u = (h64(did, 7) % 1_000_000) / 1_000_000.0
        if u < rates.get(lang, 0.0):
            exp.add((did, lang))
    got2 = {(r["doc_id"], r["lang"]) for r in run(spark, "stratified_sample_lang")}
    assert got2 == exp and exp


def test_weighted_sample_per_lang_literal(spark, docs):
    per = defaultdict(list)
    for did, _txt, lang, nc in docs:
        u = ((h64(did, 13) % 1_000_000) + 1) / 1_000_001.0
        per[lang].append((pr(math.log(u) / nc, 6), -did))
    exp = set()
    for lang, rows in per.items():
        for rnk, (key, negd) in enumerate(sorted(rows, reverse=True)[:3], 1):
            exp.add((lang, -negd, rnk))
    got = {(r["lang"], r["doc_id"], r["rnk"]) for r in run(spark, "weighted_sample_per_lang")}
    assert got == exp


def test_sequence_packing_literal(spark, docs):
    per = defaultdict(list)
    for did, txt, _lang, _nc in docs:
        per[h64(did, 5) % 8].append((did, len(py_tokens(txt))))
    exp = {}
    for shard, rows in per.items():
        rows.sort()
        pack_id = cum = 0
        for did, n in rows:
            if cum + n > 256 and cum > 0:
                pack_id += 1
                cum = 0
            exp[did] = (shard, n, pack_id)
            cum += n
    got = {r["doc_id"]: (r["shard"], r["n_tokens"], r["pack_id"]) for r in run(spark, "sequence_packing")}
    assert got == exp


def test_udtf_tokenize_positions_literal(spark, docs):
    exp = set()
    for did, txt, _lang, _nc in docs:
        if txt:
            for i, tok in enumerate(txt.split()):
                exp.add((did, i, tok))
    got = {(r["doc_id"], r["pos"], r["token"]) for r in run(spark, "udtf_tokenize_positions")}
    assert got == exp


def test_lang_vocab_overlap_literal(spark, docs):
    vocab = defaultdict(set)
    for _did, txt, lang, _nc in docs:
        vocab[lang].update(py_tokens(txt))
    langs = sorted(vocab)
    exp = {}
    for i, a in enumerate(langs):
        for b in langs[i + 1 :]:
            common = len(vocab[a] & vocab[b])
            if common:
                jac = common / (len(vocab[a]) + len(vocab[b]) - common)
                exp[(a, b)] = (len(vocab[a]), len(vocab[b]), common, pr(jac, 6))
    got = {
        (r["lang_a"], r["lang_b"]): (r["v_a"], r["v_b"], r["n_common"], r["jaccard"])
        for r in run(spark, "lang_vocab_overlap")
    }
    assert set(got) == set(exp)
    for k, e in exp.items():
        assert got[k][:3] == e[:3] and ok(got[k][3], e[3], 6)
