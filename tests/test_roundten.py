"""Round-10 specs: fixture tests against plain-Python references, plan
gates for the scale-sensitive shapes, and the journey-state parity pins."""

import math

import pytest
from pyspark.sql import functions as F

from projet_data_infrastructure_spark.operators.scale import explain_has

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# operators/ranks.py — shared grid-rank core
# --------------------------------------------------------------------------


def test_value_grid_ranks_average_ranks(spark):
    # values [5, 5, 7, 9, 9, 9]: avg ranks 1.5, 1.5, 3, 5, 5, 5
    from projet_data_infrastructure_spark.operators.ranks import (
        average_rank_table,
        value_grid_ranks,
    )

    df = spark.createDataFrame([(5,), (5,), (7,), (9,), (9,), (9,)], "v INT")
    grid = {
        r["v"]: (r["t"], r["cum"])
        for r in value_grid_ranks(df, "v").collect()
    }
    assert grid == {5: (2, 2), 7: (1, 3), 9: (3, 6)}
    ranks = {
        r["v"]: r["r2"] for r in average_rank_table(df, "v", "r2").collect()
    }
    # 2·r̄: 5→3 (=2·1.5), 7→6, 9→10 (=2·5)
    assert ranks == {5: 3, 7: 6, 9: 10}


def test_rank_specs_share_the_helper():
    # VERDICT r9 item 3: all three rank statistics route through
    # operators/ranks — pin it so an inline re-derivation can't creep back.
    import inspect

    from projet_data_infrastructure_spark.plans import stats_inference

    assert "value_grid_ranks" in inspect.getsource(stats_inference.q_mann_whitney_u)
    assert "average_rank_table" in inspect.getsource(
        stats_inference.q_spearman_corr_qty_price
    )
    assert "value_grid_ranks" in inspect.getsource(stats_inference.q_kruskal_wallis_h)


# --------------------------------------------------------------------------
# journey_state — LIVE row-pattern state
# --------------------------------------------------------------------------


def test_journey_state_accumulates_in_time_order(spark):
    from projet_data_infrastructure_spark.streaming.stateful import journey_state

    rows = [
        (1, 30, 103, "purchase"),
        (1, 10, 101, "view"),
        (1, 20, 102, "click"),
        (2, 10, 201, "view"),
        (2, 10, 200, "error"),  # same ts: event_id orders e before v? no — 200 < 201
    ]
    src = spark.createDataFrame(
        rows, "user_id BIGINT, ts_us BIGINT, event_id BIGINT, event_type STRING"
    )
    work = str(spark.conf.get("spark.sql.warehouse.dir")) + "/journey_src"
    src.coalesce(1).write.mode("overwrite").parquet(work)
    stream = spark.readStream.schema(src.schema).format("parquet").load(work)
    q = (
        journey_state(stream)
        .writeStream.outputMode("update")
        .queryName("journey_test_sink")
        .trigger(availableNow=True)
        .format("memory")
        .start()
    )
    assert q.awaitTermination(120), "journey stream timed out"
    q.stop()
    got = {r["user_id"]: r["journey"] for r in spark.table("journey_test_sink").collect()}
    assert got == {1: "vcp", 2: "ev"}


def test_stream_event_pattern_matches_batch(spark):
    # stream == batch: the LIVE spec must equal the batch spec exactly.
    from projet_data_infrastructure_spark.plans.events_queries import (
        q_event_pattern_match,
    )
    from projet_data_infrastructure_spark.plans.streaming_parity import (
        q_stream_event_pattern_match,
    )

    batch = q_event_pattern_match(spark, SF).collect()[0]
    live = q_stream_event_pattern_match(spark, SF).collect()[0]
    assert (batch["n_users"], batch["n_matched"]) == (
        live["n_users"],
        live["n_matched"],
    )


# --------------------------------------------------------------------------
# Fixture tests: statistics vs plain-Python references
# --------------------------------------------------------------------------


def _daily_cents(spark):
    from projet_data_infrastructure_spark.sources.readers import read_table

    return (
        read_table(spark, SF, "events")
        .select(F.to_date("ts").alias("day"), "value")
        .groupBy("day")
        .agg(
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("y")
        )
        .collect()
    )


def test_mann_kendall_z_fixture(spark):
    from collections import Counter

    from projet_data_infrastructure_spark.plans.timeseries import q_mann_kendall_z

    daily = _daily_cents(spark)
    ys = [y for _, y in sorted((r["day"], r["y"]) for r in daily)]
    n = len(ys)
    s_stat = sum(
        (y2 > y1) - (y2 < y1) for i, y1 in enumerate(ys) for y2 in ys[i + 1 :]
    )
    tie_poly = sum(t * (t - 1) * (2 * t + 5) for t in Counter(ys).values())
    var = (n * (n - 1) * (2 * n + 5) - tie_poly) / 18.0
    z = (
        (s_stat - 1) / math.sqrt(var)
        if s_stat > 0
        else (s_stat + 1) / math.sqrt(var)
        if s_stat < 0
        else 0.0
    )
    got = q_mann_kendall_z(spark, SF).collect()[0]
    assert got["n_days"] == n and got["mk_s"] == s_stat
    assert math.isclose(got["z_r"], z, rel_tol=0, abs_tol=5e-7)


def test_changepoint_cusum_fixture(spark):
    from projet_data_infrastructure_spark.plans.timeseries import (
        q_changepoint_cusum_mean,
    )

    daily = _daily_cents(spark)
    pts = sorted((r["day"], r["y"]) for r in daily)
    n = len(pts)
    total = sum(y for _, y in pts)
    best = None
    cum = 0
    for t, (day, y) in enumerate(pts, start=1):
        cum += y
        dd = n * cum - t * total
        key = (abs(dd), -t)
        if best is None or key > best[0]:
            best = (key, day, abs(dd))
    got = q_changepoint_cusum_mean(spark, SF).collect()[0]
    epoch = __import__("datetime").date(1970, 1, 1).toordinal()
    assert got["cp_day"] == best[1].toordinal() - epoch
    assert math.isclose(
        got["max_dev_usd_r"], best[2] / n / 100.0, rel_tol=0, abs_tol=5e-5
    )


def test_gini_fixture_vs_python(spark):
    from projet_data_infrastructure_spark.plans.stats_inference import (
        q_gini_lorenz_by_nation,
    )

    cust = spark.read.parquet(f"{SF}/customer.parquet").select(
        "c_nationkey", "c_custkey", "c_acctbal"
    ).collect()
    by_nation = {}
    for r in cust:
        cents = math.floor(r["c_acctbal"] * 100 + 0.5)
        if cents >= 0:
            by_nation.setdefault(r["c_nationkey"], []).append(cents)
    got = {r["nationkey"]: r for r in q_gini_lorenz_by_nation(spark, SF).collect()}
    for nk, xs in by_nation.items():
        xs.sort()
        n, sx = len(xs), sum(xs)
        six = sum(i * x for i, x in enumerate(xs, start=1))
        g = (2.0 * six - (n + 1) * sx) / (n * sx)
        assert got[nk]["n_cust"] == n
        assert math.isclose(got[nk]["gini_r"], g, rel_tol=0, abs_tol=5e-7)


def test_chisq_fixture_vs_python(spark):
    from collections import Counter

    from projet_data_infrastructure_spark.plans.stats_inference import (
        q_chisq_priority_status,
    )

    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderpriority", "o_orderstatus"
    ).collect()
    cells = Counter((r[0], r[1]) for r in orders)
    rt = Counter()
    ct = Counter()
    for (m, f), o in cells.items():
        rt[m] += o
        ct[f] += o
    n = sum(cells.values())
    chi2_micro = sum(
        math.floor(
            (o - rt[m] * ct[f] / n) ** 2 / (rt[m] * ct[f] / n) * 1e6 + 0.5
        )
        for (m, f), o in cells.items()
    )
    got = q_chisq_priority_status(spark, SF).collect()[0]
    assert got["n"] == n
    assert got["df"] == (len(rt) - 1) * (len(ct) - 1)
    assert math.isclose(
        got["chi2_r"], chi2_micro / 1e6, rel_tol=0, abs_tol=5e-5
    )


def test_routing_loads_sum_to_one(spark):
    from projet_data_infrastructure_spark.plans.ml_eval import (
        q_routing_topk_experts,
    )

    rows = q_routing_topk_experts(spark, SF).collect()
    nd = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r["n_primary"] for r in rows) == nd
    assert sum(r["n_secondary"] for r in rows) == nd
    # no doc routes primary == secondary (the mask excludes the primary)
    assert math.isclose(sum(r["load_share_r"] for r in rows), 1.0, abs_tol=1e-4)


def test_srm_guard_passes_on_hash_split(spark):
    from projet_data_infrastructure_spark.plans.stats_inference import q_ab_srm_guard

    row = q_ab_srm_guard(spark, SF).collect()[0]
    assert row["srm_flag"] == 0  # the deterministic split is not mismatched
    assert abs(row["z_r"]) < 3.3


# --------------------------------------------------------------------------
# Plan gates (scale-sensitive shapes)
# --------------------------------------------------------------------------


def test_mann_kendall_z_is_window_free_and_day_bounded(spark):
    # no window at all; the non-equi pair join's inputs are both the
    # day-grid aggregate (checkpointed calendar frame), never event rows.
    from projet_data_infrastructure_spark.plans.timeseries import q_mann_kendall_z

    df = q_mann_kendall_z(spark, SF)
    checks = explain_has(df, "WindowExec")
    assert not checks["WindowExec"]


def test_changepoint_window_only_over_day_grid(spark):
    from projet_data_infrastructure_spark.plans.timeseries import (
        q_changepoint_cusum_mean,
    )

    plan = (
        q_changepoint_cusum_mean(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    win_pos = plan.index("Window")
    day_agg = plan.find("HashAggregate(keys=[d", win_pos)
    assert day_agg != -1, plan
    assert "event_id" not in plan[win_pos:day_agg], plan
    # argmax is TakeOrdered, never a full sort+collect
    assert "TakeOrderedAndProject" in plan, plan


def test_gini_window_is_nation_keyed(spark):
    from projet_data_infrastructure_spark.plans.stats_inference import (
        q_gini_lorenz_by_nation,
    )

    plan = (
        q_gini_lorenz_by_nation(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    for m in re.finditer(r"Window \[", plan):
        seg = plan[m.start() : plan.index("\n", m.start())]
        assert "c_nationkey" in seg, seg  # every window partitioned by nation


def test_routing_is_map_side_only(spark):
    # scoring is map-only; the only shuffles are the two 8-row aggregates.
    from projet_data_infrastructure_spark.plans.ml_eval import (
        q_routing_topk_experts,
    )

    df = q_routing_topk_experts(spark, SF)
    checks = explain_has(df, "CartesianProduct", "WindowExec")
    assert not checks["CartesianProduct"] and not checks["WindowExec"]


def test_generator_oracle_registered(spark):
    # the last rows-only spec is now oracled (VERDICT r9 item 6)
    from projet_data_infrastructure_spark.plans import all_specs

    spec = {s.name: s for s in all_specs()}["generator_activities"]
    assert spec.oracle is not None and "make_timestamp" in spec.oracle


def test_grubbs_fixture(spark):
    from projet_data_infrastructure_spark.plans.stats_inference import q_grubbs_outlier_day

    daily = _daily_cents(spark)
    pts = sorted((r["day"], r["y"]) for r in daily)
    n = len(pts)
    total = sum(y for _, y in pts)
    mean = total / n
    s = math.sqrt(sum((y - mean) ** 2 for _, y in pts) / (n - 1))
    day, dev = max(((d, abs(n * y - total)) for d, y in pts), key=lambda p: (p[1], -p[0].toordinal()))
    got = q_grubbs_outlier_day(spark, SF).collect()[0]
    epoch = __import__("datetime").date(1970, 1, 1).toordinal()
    assert got["outlier_day"] == day.toordinal() - epoch
    assert math.isclose(got["g_r"], (dev / n) / s, rel_tol=0, abs_tol=5e-6)


def test_segmented_elbow_fixture(spark):
    from projet_data_infrastructure_spark.plans.timeseries import (
        q_segmented_regression_elbow,
    )

    daily = _daily_cents(spark)
    pts = sorted((r["day"], r["y"]) for r in daily)
    n = len(pts)

    def sse(seg):
        m = len(seg)
        sx = sum(t for t, _ in seg)
        sy = sum(y for _, y in seg)
        sxx = sum(t * t for t, _ in seg) - sx * sx / m
        sxy = sum(t * y for t, y in seg) - sx * sy / m
        syy = sum(y * y for _, y in seg) - sy * sy / m
        return syy - sxy * sxy / sxx

    xy = [(t, y) for t, (_, y) in enumerate(pts, start=1)]
    best = min(
        ((sse(xy[:k]) + sse(xy[k:]), k) for k in range(2, n - 1)),
        key=lambda p: (p[0], p[1]),
    )
    got = q_segmented_regression_elbow(spark, SF).collect()[0]
    epoch = __import__("datetime").date(1970, 1, 1).toordinal()
    assert got["split_day"] == pts[best[1] - 1][0].toordinal() - epoch
    assert math.isclose(
        got["sse_ratio_r"], best[0] / sse(xy), rel_tol=0, abs_tol=5e-6
    )


def test_day_grid_specs_hostile_tz_invariant(spark):
    # build-then-collect TZ flip (the r5 driver gap): the round-10 day-grid
    # specs must be byte-stable because read_table pins NTZ + UTC.
    from projet_data_infrastructure_spark.plans.timeseries import (
        q_changepoint_cusum_mean,
        q_mann_kendall_z,
    )

    tz_key = "spark.sql.session.timeZone"
    infer_key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    base = [
        q_mann_kendall_z(spark, SF).collect(),
        q_changepoint_cusum_mean(spark, SF).collect(),
    ]
    old_infer, old_tz = spark.conf.get(infer_key), spark.conf.get(tz_key)
    try:
        spark.conf.set(infer_key, "false")
        spark.conf.set(tz_key, "America/New_York")
        dfs = [q_mann_kendall_z(spark, SF), q_changepoint_cusum_mean(spark, SF)]
        spark.conf.set(tz_key, "Pacific/Kiritimati")
        got = [df.collect() for df in dfs]
        assert got == base
    finally:
        spark.conf.set(infer_key, old_infer)
        spark.conf.set(tz_key, old_tz)


def test_kendall_oob_guard_column(spark, monkeypatch):
    # qty outside the 1..50 pivot domain must surface in n_oob (visible in
    # the result, hash-fails the oracle) instead of silently skewing tau.
    from projet_data_infrastructure_spark.plans import stats_inference as r9

    df = spark.createDataFrame(
        [(1.0, 100.0), (2.0, 200.0), (77.0, 300.0)],
        "l_quantity DOUBLE, l_extendedprice DOUBLE",
    )
    monkeypatch.setattr(r9, "read_table", lambda sp, sf, name: df)
    out = r9.q_kendall_tau_b(spark, SF).first()
    assert out["n_oob"] == 1
    clean = spark.createDataFrame(
        [(1.0, 100.0), (2.0, 200.0)], "l_quantity DOUBLE, l_extendedprice DOUBLE"
    )
    monkeypatch.setattr(r9, "read_table", lambda sp, sf, name: clean)
    assert r9.q_kendall_tau_b(spark, SF).first()["n_oob"] == 0
