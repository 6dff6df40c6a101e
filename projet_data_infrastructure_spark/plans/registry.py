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


# Round-8 driver window. Ordering: (a) the 17 round-6/7 specs whose ONLY
# round-7 defect was a HUGEINT-typed DuckDB oracle output (all now CAST to
# BIGINT and re-gated locally under the hardened strict/Arrow replica) —
# fronted so the driver records them green; (b) the 58 specs that have never
# appeared in any CORRECTNESS_r{N} window (= LOCAL_ORACLE minus all
# CORRECTNESS_r1..r7 names). The ~50-name window covers (a) plus the first
# ~33 of (b); the remainder of (b) leads the round-9 rotation. Rows-only
# specs stay pinned behind every oracled spec. Names absent from the
# registry are ignored.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) round-7 HUGEINT-oracle reds, fixed this round
    "pit_regime_attribution",
    "stream_pit_attribution",
    "trigram_backoff_score",
    "precision_recall_sweep",
    "token_ngram_novelty",
    "content_defined_chunking",
    "bootstrap_mean_ci",
    "target_encode_loo",
    "cuped_adjusted_lift",
    "winsorized_trimmed_mean",
    "shapley_channel_attribution",
    "qte_by_decile",
    "mann_kendall_theilsen",
    "diff_in_differences",
    "caliper_matched_att",
    "nb_crossval_accuracy",
    "cusum_drift_flags",
    # (b) never-driver-checked (oldest registration first, alphabetical)
    "ab_test_z_score",
    "adamic_adar_links",
    "argmax_per_group",
    "attribution_linear",
    "benford_digit_profile",
    "bitwise_funcs",
    "bloom_membership_audit",
    "bpe_merge_candidates",
    "bpe_train_rounds",
    "brand_cf_cosine",
    "c4_line_dedup",
    "calibration_bins",
    "ccnet_perplexity_buckets",
    "chi2_nation_priority",
    "compaction_bin_packing",
    "countmin_heavy_hitters",
    "curation_funnel_report",
    "decision_stump_quantity",
    "dow_seasonality_lift",
    "dp_noisy_counts",
    "dsir_importance_weights",
    "dup_line_fraction",
    "entity_resolution_clusters",
    "forecast_mase_seasonal",
    "frequent_triples_apriori",
    "geo_point_in_polygon",
    "gini_revenue_concentration",
    "higher_order_funcs",
    "hits_authorities",
    "ivf_topk_batch",
    "jl_projection_distortion",
    "kaplan_meier_retention",
    "kcore_decomposition",
    "l_diversity_audit",
    "listagg_param_sql",
    "markov_2step_matrix",
    "mmr_diverse_rerank",
    "multimodal_phash_neardup",
    "naive_bayes_lang",
    "ngram_containment_pairs",
    "null_safe_join",
    "pca_power_iteration",
    "pipe_syntax_rollup",
    "pmi_collocations",
    "rendezvous_shards",
    "retrieval_eval_metrics",
    "roc_auc_by_dow",
    "skew_profile",
    "spend_percentile_rank",
    "stream_countmin_merge",
    "stream_hll_cardinality",
    "try_functions",
    "twa_event_value",
    "weekly_revenue_movers",
    "window_funcs3",
    "winnowing_fingerprint",
    "wordpiece_merge_scores",
    "zipf_fit_slope",
    # (c) round-8 additions — never driver-checked; behind (a)+(b) so the
    # round-8 window clears the fixed reds + oldest backlog first, and the
    # round-9 window picks these up next
    "unimax_sampling_plan",
    "temperature_sampling_weights",
    "pii_redaction_scan",
    "epoch_shuffle_manifest",
    "boilerplate_line_df",
    "semantic_contamination",
    "tokenizer_fertility_by_lang",
    "span_corruption_masks",
    "dedup_keepbest_canonical",
    "curriculum_length_phases",
    "oov_rate_by_lang",
    "incremental_index_dedup",
    "tokenset_dedup_groups",
    "char_entropy_quality",
    "minhash_calibration_bins",
    "stream_funnel_conversion",
    "normalize_text_stats",
    "range_join_keyless_bucketed",
    "logrank_test",
    "funnel_three_step",
    "quantile_normalize_scores",
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
        roundeight,
        roundseven,
        roundsix,
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
    specs.extend(roundsix.SPECS)
    specs.extend(roundseven.SPECS)
    specs.extend(roundeight.SPECS)
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
