"""Benchmark harness (driver contract).

Runs the headline queries (registry specs tagged "bench") at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": ...}

Each query materializes through the noop sink (full execution, no
driver-side row transfer) after one untimed warmup of the session/JIT.
Each query is executed REPS (3) times across full name-order passes and the
median is reported: run-to-run variance on identical code spans ~1.5x
totals, which made single-shot per-query deltas (±3 s on a 4 s query)
unattributable. Medians over interleaved passes absorb transient system
noise without hiding a real regression.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from projet_data_infrastructure_spark.plans import all_specs
from projet_data_infrastructure_spark.session import get_spark

#: Frozen benchmark core (VERDICT r7 item 5): these 30 specs must stay
#: bench-tagged FOREVER so every round's BENCH_r{N}.json carries a directly
#: comparable vs_prior delta for them. Rounds may ADD headliners; removing
#: or un-tagging any name here fails tests/test_registry.py. One per major
#: family: TPC-H relational, joins/aggs, windows/streaming, dedup/LSH,
#: ANN/embeddings, text/LLM curation, graph, geo, causal/stats, multimodal.
BENCH_CORE = (
    "tpch_q1_pricing", "tpch_q3_priority", "tpch_q5_local_supplier",
    "tpch_q7_nation_volume", "tpch_q9_product_profit", "tpch_q10_returns",
    "tpch_q12_late_shipments", "tpch_q18_large_orders",
    "flagship_bonus", "inner_join_enrich", "groupby_count_avg",
    "multiway_join_rollup", "asof_join", "window_running_sum",
    "tumbling_window_agg", "resample_hourly_ffill", "cdc_envelope_parse",
    "dedup_exact_groups", "minhash_signatures", "crossdoc_dup_ngrams",
    "c4_line_dedup", "cosine_topk_bruteforce", "ivf_topk_batch",
    "embedding_neardup_bucketed", "text_stats", "bm25_topk",
    "naive_bayes_lang", "pagerank_fixed_point", "geo_cell_neighbor_pairs",
    "multimodal_phash_neardup",
)


def _release_cached_blocks(spark) -> None:
    """Drop every cached table and persistent RDD block between specs.

    Several headliners ``localCheckpoint(eager=True)`` their iteration
    frontiers; those blocks live in executor storage memory until the
    ContextCleaner happens to reap them. Over 58 specs x 3+ passes the
    accumulated blocks squeeze execution memory exactly on the heavy
    iterative queries late in name order (VERDICT r9 item 1: the driver's
    +5.7 s carried-set drift concentrated on clustering_coefficient /
    kcore / pagerank while an idle local run showed -2.3 s). Explicitly
    unpersisting after every spec makes each measurement start from the
    same storage state regardless of machine load or GC timing.

    Measurement-basis note (one-time rebase, round 10): Spark's
    CacheManager matches cached plans by LOGICAL PLAN EQUALITY, so under
    the old harness a spec whose implementation persists an intermediate
    (e.g. ``grouped_rank``'s range-bucketed input inside
    ``ccnet_perplexity_buckets``) had its rep-2/3 executions silently
    served from rep-1's cache — the reported median measured a warm cache
    read, not the query. Releasing between specs makes every rep pay the
    honest cost, which REBASES those specs' medians upward once (ccnet
    ≈ +1.3 s, corpus_curation ≈ +1.0 s at sf0.1) — in exchange the number
    is load-robust and the storage leak that distorted late heavy queries
    is gone. Driver and local benches share this basis from r10 on.
    """
    spark.catalog.clearCache()
    try:
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist(False)
    except Exception:
        pass  # py4j view quirks must never abort a bench run


def _calibration_run() -> float:
    """Wall time of a fixed single-thread CPU workload (~0.3 s idle).

    Pure CPU (md5 over ~160 MB), no IO, no allocation growth — under
    container-level CPU contention the thread is descheduled and wall time
    inflates roughly with load, giving each bench run a machine-load
    fingerprint (VERDICT r5 item 5: round 5's uniform ~1.25x drift was
    indistinguishable from a code regression without an idle rerun).
    """
    import hashlib

    block = b"\xa5" * 65536
    t0 = time.perf_counter()
    h = hashlib.md5()
    for _ in range(2500):
        h.update(block)
    h.hexdigest()
    return time.perf_counter() - t0


def _calibration_membw_run() -> float:
    """Wall time of a fixed memory-bandwidth workload (~0.1 s idle).

    Copies a 128 MB buffer: bound by memory bandwidth, not ALU. The md5
    probe above misses co-tenant pressure on the shared memory subsystem
    (round-13 finding: same-code same-protocol runs drifted ±10-13% at
    IDENTICAL md5 calibration — the drift class the CPU probe cannot see).
    Tracking both fingerprints lets a future round separate "the cores are
    descheduled" from "the memory bus is saturated"."""
    buf = bytearray(128 * 1024 * 1024)
    t0 = time.perf_counter()
    for _ in range(4):
        buf2 = bytes(buf)  # full-buffer read+write pass
    del buf2
    return time.perf_counter() - t0


def _calibrate(n: int = 3) -> list[float]:
    return [round(_calibration_run(), 4) for _ in range(n)]


def _calibrate_membw(n: int = 3) -> list[float]:
    return [round(_calibration_membw_run(), 4) for _ in range(n)]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    cal_before = _calibrate()
    membw_before = _calibrate_membw()
    spark = get_spark("bench")

    # Name order, NOT registry order: the registry is reordered per round for
    # the correctness driver's window, and execution position shifts per-query
    # timings (the first queries absorb residual JIT/codegen warm-up). A fixed
    # order keeps vs-prior-round deltas attributable to code, not position.
    registry = all_specs()
    bench_names = {s.name for s in registry if "bench" in s.tags}
    # Measured-cost auto-selection (VERDICT r11 item 5): the hand-curated
    # bench tags can miss a future heavy spec. The committed
    # LOCAL_ORACLE_sf0.1.json times every registered spec's Spark side; any
    # name in its top-N by measured cost joins the headliner set
    # automatically.
    #
    # Per-round PIN (VERDICT r13 item 3): LOCAL_ORACLE_sf0.1.json is itself
    # refreshed mid-round, so two same-round bench runs could auto-select
    # slightly different sets (r13: driver 119 vs local 116 specs) and the
    # vs_prior totals compared near-but-not-identical compositions. The
    # selection is therefore frozen once per round into the committed
    # BENCH_HEADLINERS.json (tools/pin_headliners.py); every bench run of
    # the round — local or driver — replays exactly that list. Recompute
    # only at the START of a round, before the first measurement.
    pinned = _pinned_headliners()
    if pinned is not None:
        selected = set(pinned) & {s.name for s in registry}
        auto_added = sorted(selected - bench_names)
    else:
        auto_n = int(os.environ.get("SPARK_GRAFT_BENCH_AUTO_TOPN", "70"))
        auto_added = sorted(_top_measured_names(auto_n) - bench_names)
        selected = bench_names | set(auto_added)
    specs = sorted((s for s in registry if s.name in selected), key=lambda s: s.name)
    missing_core = set(BENCH_CORE) - {s.name for s in specs}
    assert not missing_core, f"frozen bench core missing from selection: {missing_core}"

    # Warmup (untimed): spin up executors/codegen and touch every table's
    # footer/listing so the first measured query doesn't pay cold IO setup.
    from projet_data_infrastructure_spark.sources.readers import TABLES, read_table

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in TABLES:
        read_table(spark, sf_dir, t).limit(1).collect()

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    samples: dict[str, list[float]] = {s.name: [] for s in specs}
    for _ in range(reps):
        for spec in specs:
            t0 = time.time()
            df = spec.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples[spec.name].append(time.time() - t0)
            _release_cached_blocks(spark)

    import statistics

    timings = {name: round(statistics.median(ts), 3) for name, ts in samples.items()}
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    prior = _latest_prior_round()
    prior_ok = (
        prior is not None
        and prior.get("sf") == sf_val
        and isinstance(prior.get("value"), (int, float))
    )
    # Load-noise guard (verdict r4 item 8): a transient system spike during
    # one pass can fake a per-query regression that an idle rerun dissolves
    # (round 4 had three such phantoms). Any query whose median moved >20%
    # AND >0.15 s vs the prior round is re-measured with `reps` fresh
    # interleaved passes folded into its sample before reporting, so the
    # emitted vs_prior deltas are trustworthy as-is.
    requeried: list[str] = []
    if prior_ok:
        prior_q = prior.get("queries", {})
        suspects = [
            s
            for s in specs
            if s.name in prior_q
            and isinstance(prior_q[s.name], (int, float))
            and abs(timings[s.name] - prior_q[s.name])
            > max(0.2 * prior_q[s.name], 0.15)
        ]
        for _ in range(reps):
            for spec in suspects:
                t0 = time.time()
                spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples[spec.name].append(time.time() - t0)
                _release_cached_blocks(spark)
        for spec in suspects:
            timings[spec.name] = round(statistics.median(samples[spec.name]), 3)
            requeried.append(spec.name)

    total = round(sum(timings.values()), 3)
    cal_after = _calibrate()
    membw_after = _calibrate_membw()
    membw_median = round(statistics.median(membw_before + membw_after), 4)
    cal_median = round(statistics.median(cal_before + cal_after), 4)
    out = {
        "metric": f"headline-query wall time (noop sink), sum of per-query medians of {reps}",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "reps": reps,
        "sf": sf_val,
        # Machine-load fingerprint: a fixed single-thread CPU loop timed
        # around the run. Compare `median` across rounds — a load_ratio far
        # from 1.0 says the box, not the code, moved (VERDICT r5 item 5).
        "calibration": {"before": cal_before, "after": cal_after, "median": cal_median,
                        "membw_before": membw_before, "membw_after": membw_after,
                        "membw_median": membw_median},
    }
    if requeried:
        out["requeried"] = requeried
    if auto_added:
        out["auto_headliners"] = auto_added
    if pinned is not None:
        out["headliner_pin"] = {"file": "BENCH_HEADLINERS.json", "n": len(specs)}
    if prior_ok:
        prior_q = prior.get("queries", {})
        out["vs_prior"] = {
            "prior_total": prior["value"],
            "delta_total": round(total - prior["value"], 3),
            # per-query delta (sec); only queries present in both rounds
            "delta_queries": {
                k: round(v - prior_q[k], 3) for k, v in timings.items() if k in prior_q
            },
        }
        prior_cal = prior.get("calibration", {})
        if isinstance(prior_cal, dict) and isinstance(
            prior_cal.get("median"), (int, float)
        ) and prior_cal["median"] > 0:
            # >1: this round's box is slower than the prior round's. The
            # adjusted delta divides out that environmental factor so a real
            # code regression separates from container drift without a
            # manual idle rerun.
            ratio = round(cal_median / prior_cal["median"], 4)
            out["vs_prior"]["load_ratio"] = ratio
            out["vs_prior"]["delta_total_load_adjusted"] = round(
                total / ratio - prior["value"], 3
            )
    # Full record: stdout (for local capture) + files beside the script, so
    # the per-query map survives even when the driver keeps only a 2,000-char
    # stdout tail. ROUND-STAMPED (VERDICT r14 item 1): the driver's low-core
    # scaling re-run overwrote BENCH_FULL_LATEST.json in r14, losing the
    # round's 32-core record — stamping by (round, cpus) keeps both.
    full_line = json.dumps(out)
    print(full_line)
    here = os.path.dirname(os.path.abspath(__file__))
    n_cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 0))
    for fname in (
        "BENCH_FULL_LATEST.json",
        f"BENCH_FULL_r{_max_driver_round() + 1}_c{n_cpus}.json",
    ):
        try:
            with open(os.path.join(here, fname), "w") as f:
                f.write(full_line + "\n")
        except OSError:
            pass
    # Compact summary as the FINAL stdout line (VERDICT r12 item 4): the
    # driver json-parses the tail of stdout, and the full record outgrew its
    # 2,000-char capture in rounds 11-12 (BENCH_r{11,12}.json parsed=null).
    # r13/r14 printed totals only, which left the driver's per-query and
    # scaling comparisons empty (VERDICT r14 item 1) — restore a "queries"
    # map packed to the tail budget: top-cost specs at 0.1 s rounding plus
    # an elided-remainder count, so the line parses whole inside the capture.
    print(json.dumps(_compact_summary(out, timings)))
    spark.stop()


#: Byte budget for the final stdout line. The driver captures the last
#: ~2,000 chars of stdout and parses the final JSON line; leave headroom so
#: the whole line (plus trailing newline) always fits inside the capture.
_COMPACT_BUDGET = 1850


def _compact_summary(out: dict, timings: dict[str, float]) -> dict:
    """The driver-facing final line: every scalar from the full record plus
    as many per-query entries as fit the tail budget, most expensive first
    (the top ~50 by cost cover >90% of total seconds; elided specs are
    summarised by count + their summed seconds so the map remains auditable
    against "value"). Values are rounded to 0.1 s — coarse but sufficient
    for the driver's regression/geomean screen; exact medians live in the
    round-stamped BENCH_FULL record."""
    compact = {
        "metric": "headline-query wall time (noop sink); top-cost per-query subset, full map in BENCH_FULL_r{N}_c{cpus}.json",
        "value": out["value"],
        "unit": "sec",
        "n": len(timings),
        "reps": out["reps"],
        "sf": out["sf"],
        "calibration_median": out["calibration"]["median"],
        "membw_median": out["calibration"]["membw_median"],
        "queries": {},
        "elided": {"n": 0, "sum_sec": 0.0},
    }
    if "vs_prior" in out:
        compact["vs_prior"] = {
            k: out["vs_prior"][k]
            for k in ("prior_total", "delta_total", "load_ratio", "delta_total_load_adjusted")
            if k in out["vs_prior"]
        }
    by_cost = sorted(timings.items(), key=lambda kv: (-kv[1], kv[0]))
    # Fixed-part length with an empty queries map, then pack greedily.
    budget = _COMPACT_BUDGET - len(json.dumps(compact))
    used = 0
    for name, sec in by_cost:
        entry = len(json.dumps(name)) + len(json.dumps(round(sec, 1))) + 4  # `"n": v, `
        if used + entry > budget:
            break
        compact["queries"][name] = round(sec, 1)
        used += entry
    elided = [sec for name, sec in timings.items() if name not in compact["queries"]]
    compact["elided"] = {"n": len(elided), "sum_sec": round(sum(elided), 1)}
    return compact


def _max_driver_round() -> int:
    """Newest round number among the driver's committed BENCH_r{N}.json
    records (the driver writes its record only after the round's bench, so
    during round N the max on disk is N-1). 0 when none exist."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    return max(rounds, default=0)


def _pinned_headliners() -> list[str] | None:
    """The round's frozen headliner list from BENCH_HEADLINERS.json, or None
    when no pin exists (fall back to live auto-selection).

    Written once per round by ``tools/pin_headliners.py`` and committed, so
    the driver's end-of-round bench and every local bench measure the SAME
    composition regardless of when LOCAL_ORACLE_sf0.1.json was refreshed.
    ``SPARK_GRAFT_BENCH_IGNORE_PIN=1`` bypasses (for pin regeneration)."""
    if os.environ.get("SPARK_GRAFT_BENCH_IGNORE_PIN") == "1":
        return None
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_HEADLINERS.json"
    )
    try:
        with open(path) as f:
            rec = json.load(f)
    except (OSError, json.JSONDecodeError):
        return None
    names = rec.get("names")
    if isinstance(names, list) and all(isinstance(n, str) for n in names) and names:
        return names
    return None


def _top_measured_names(n: int) -> set[str]:
    """Top-n spec names by Spark-side cost from the committed full-registry
    oracle run at sf0.1 (tools/check_oracle.py writes per-spec `spark_sec`).
    Empty set when the record predates the timing field."""
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "LOCAL_ORACLE_sf0.1.json"
    )
    try:
        with open(path) as f:
            results = json.load(f).get("results", {})
    except (OSError, json.JSONDecodeError):
        return set()
    timed = [
        (rec["spark_sec"], name)
        for name, rec in results.items()
        if isinstance(rec, dict) and isinstance(rec.get("spark_sec"), (int, float))
    ]
    return {name for _sec, name in sorted(timed, reverse=True)[:n]}


def _latest_prior_round() -> dict | None:
    """Newest parseable benchmark record beside this script — the baseline
    for per-query regression attribution. Candidates, newest round first:
    the driver's BENCH_r{N}.json and our own committed BENCH_LOCAL_r{N}.json
    (the driver has shipped rounds whose stdout tail is front-truncated past
    the queries dict — BENCH_r08 — so the locally written full record is the
    fallback that keeps vs_prior continuity alive)."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    driver = []
    local = []
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            driver.append((int(m.group(1)), 1, p))
    max_driver = max((r for r, _, _ in driver), default=-1)
    for p in glob.glob(os.path.join(here, "BENCH_LOCAL_r*.json")):
        m = re.search(r"BENCH_LOCAL_r(\d+)\.json$", p)
        # cap LOCAL candidates at the newest DRIVER round so the current
        # round's own freshly written local record never becomes its own
        # "prior" (the driver writes BENCH_r{N}.json only after this run).
        if m and int(m.group(1)) <= max_driver:
            local.append((int(m.group(1)), 0, p))
    for _, _, path in sorted(driver + local, reverse=True):
        got = _parse_bench_record(path)
        # From round 13 on the driver's parsed record may be the COMPACT
        # summary (totals only). It is useless as a per-query baseline —
        # fall through to the same round's full BENCH_LOCAL record instead.
        if got is not None and isinstance(got.get("queries"), dict) and got["queries"]:
            return got
    return None


def _parse_bench_record(path: str) -> dict | None:
    import re

    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, json.JSONDecodeError):
        return None
    # The driver wraps our JSON line under "parsed" alongside run metadata —
    # but has also shipped rounds with parsed=null and only a FRONT-TRUNCATED
    # stdout tail (BENCH_r04). Recover value/queries by regex from the tail
    # and the sf from the driver's own metadata so vs_prior still engages.
    parsed = data.get("parsed")
    if isinstance(parsed, dict):
        return parsed
    if "queries" in data:
        return data
    tail = data.get("tail")
    if not isinstance(tail, str):
        return None
    mv = re.search(r'"value": ([0-9.]+)', tail)
    mq = re.search(r'"queries": (\{[^{}]*\})', tail)
    if not (mv and mq):
        return None
    try:
        queries = json.loads(mq.group(1))
        sf_meta = data.get("sf")
        return {
            "value": float(mv.group(1)),
            "queries": queries,
            "sf": float(sf_meta) if sf_meta is not None else None,
        }
    except (ValueError, json.JSONDecodeError):
        return None


if __name__ == "__main__":
    main()
