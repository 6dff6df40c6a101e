"""Query registry — the single source of truth behind ``__spark_entry__.py``.

Each :class:`QuerySpec` pairs a Spark DataFrame builder with the equivalent
ANSI SQL that DuckDB runs as the correctness oracle (driver contract in
``/root/repo/__spark_entry__.py``). Specs with ``oracle=None`` are genuinely
non-SQL-expressible (streaming/stateful) and get the driver's rows-only check.

Column-name discipline: the driver compares after sorting columns by name, so
every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the pre-registered parquet views
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


# Round-3 driver window. The per-round correctness driver samples a bounded
# window (~50 names) from the front of ``all_specs()``; rounds 1-2 together
# covered 100 of the 115 registered names. This ordering fronts (a) the 15
# names with no driver row ever, (b) ``array_agg_sorted`` (red in r2 on a
# harness list-hash issue, now emitted as a joined string), (c) specs new in
# round 3, then (d) a rotating re-verify sample of the most load-bearing
# previously-green specs so old evidence is periodically refreshed rather
# than accumulating forever unchecked. Names absent from the registry are
# ignored, so this list never blocks adding/removing specs.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) never driver-checked before round 3
    "stream_running_totals",
    "stream_dedup_ids",
    "tpch_q13_custdist",
    "tpch_q17_small_qty",
    "tpch_q19_disjunctive",
    "tpch_q22_inactive",
    "ivf_trained_assign",
    "generator_activities",
    "stream_cdc_apply",
    "multimodal_features",
    "approx_count_distinct",
    "sampled_profile",
    "window_funcs2",
    "string_funcs2",
    "conditional_funcs",
    # (b) needs a fresh green row after the string-form fix
    "array_agg_sorted",
    # (c) new in round 3 — newest first: the driver window covers ~50 names,
    # so the specs with the least accumulated evidence (added latest in the
    # round) must sit ahead of the ones already exercised by the builder's
    # local gate runs all round. Live-stream specs lead with them: the
    # round-3 testdata regeneration flipped events.ts ns→µs and silently
    # broke every ts-dependent stream spec (fixed by unit detection in
    # streaming/sources.epoch_us_divisor) — fresh driver rows prove the fix
    # under the driver's own harness.
    "pq_encode",
    "pq_adc_topk",
    "ivfpq_topk",
    "pq_trained_encode",
    "mixture_resample",
    "rolling_7day_revenue",
    "equidepth_histogram",
    "robust_outliers",
    "lm_bigram_score",
    "embedding_dup_clusters",
    "sequence_packing",
    "heavy_hitters",
    "session_paths_topk",
    "rfm_segmentation",
    "event_transition_matrix",
    "order_total_reconciliation",
    "revenue_decile_share",
    "stream_stream_join",
    "stream_stream_left_join",
    "stream_stream_full_join",
    "stream_tumbling_counts",
    "stream_session_counts",
    "stream_filter_project",
    "multimodal_size_histogram",
    "tpch_q8_mkt_share",
    "tpch_q15_top_supplier",
    "tpch_q21_waiting_supplier",
    "bucketed_join_colocated",
    "benchmark_decontamination",
    "repetition_ngram_ratio",
    "embedding_simhash_pairs",
    "stream_static_join",
    "snapshot_time_travel",
    "domain_mixture_weights",
    "char_entropy",
    "zorder_scan_filtered",
    "approx_quantiles",
    "scd2_user_history",
    "incremental_agg_merge",
    "kmv_distinct_sketch",
    "crossdoc_dup_ngrams",
    "regression_slope_by_user",
    "levenshtein_blocked_pairs",
    "length_percentile_filter",
    "kmv_sketch_set_ops",
    "resample_hourly_ffill",
    "snapshot_diff_cdf",
    "corpus_split_assign",
    "sessionize_events",
    "udtf_tokenize_positions",
    "longest_daily_streak",
    "cohort_retention",
    "ratio_to_report",
    "ewma_by_user",
    "countmin_user_counts",
    "psi_drift_profile",
    "dedup_cluster_sizes",
    "ivf_topk_multiprobe",
    "bloom_membership",
    # (d) rotating re-verify sample — round 1 greens not re-checked since r1,
    # heaviest/most load-bearing first
    "flagship_bonus",
    "scan_project",
    "filter_pushdown",
    "cdc_envelope_parse",
    "epoch_us_roundtrip",
    "json_extract",
    "masked_view",
    "inner_join_enrich",
    "left_join_agg",
    "semi_join",
    "anti_join",
    "groupby_count_avg",
    "topk_groups",
    "validation_profile",
    "multiway_join_rollup",
    "tpch_q1_pricing",
    "tpch_q3_priority",
    "tpch_q5_local_supplier",
    "window_rank",
    "window_running_sum",
    "rollup_agg",
    "cube_agg",
    "string_funcs",
    "date_funcs",
    "cast_types",
    "case_when_bonus",
    "null_logic_coalesce",
    "tumbling_window_agg",
    "session_window_agg",
    "dedup_earliest_event",
    "dedup_exact_groups",
    "dedup_exact_keep",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash_32bit",
    "cosine_topk_bruteforce",
    # r2 greens most worth a refresh if slots remain
    "dedup_clusters",
    "lsh_verified_pairs",
    "embedding_neardup_bucketed",
    "corpus_curation_pipeline",
    "jdbc_roundtrip_derby",
    "events_partitioned_dpp",
)


def all_specs() -> list[QuerySpec]:
    # Imported lazily so a syntax error in one domain module surfaces clearly
    # and module import order cannot create cycles.
    from projet_data_infrastructure_spark.plans import (
        advanced,
        events_queries,
        extras,
        lakehouse,
        llm_queries,
        relational,
    )

    specs: list[QuerySpec] = []
    specs.extend(relational.SPECS)
    specs.extend(events_queries.SPECS)
    specs.extend(llm_queries.SPECS)
    specs.extend(advanced.SPECS)
    specs.extend(extras.SPECS)
    specs.extend(lakehouse.SPECS)
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate query names in registry"
    # Stable sort: prioritized names first (in _DRIVER_PRIORITY order), the
    # rest keep their module order behind them.
    rank = {name: i for i, name in enumerate(_DRIVER_PRIORITY)}
    specs.sort(key=lambda s: rank.get(s.name, len(rank)))
    return specs


def queries_map() -> dict[str, QueryFn]:
    return {s.name: s.fn for s in all_specs()}


def oracle_sql_map() -> dict[str, str]:
    return {s.name: s.oracle for s in all_specs() if s.oracle is not None}
