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


# Round-7 driver window. Ordering: (a) the sixteen never-driver-checked
# round-6/round-7 additions (roundsix.py was finished in round 6 but not
# registered until round 7 — these have local-gate + fixture-test evidence
# only); (b) the round-6 (c)/(d) blocks that sat at positions ~70-100 of
# the round-6 priority list and were likely cut by the ~50-name window
# (partsupp/TPC-H analogs, tokenizer apply, hashed-linear inference);
# (c) cusum_drift_flags — round 5's one red row, kept near the front until
# a driver window shows it green post-NTZ-fix; (d) a rotating re-verify
# sample of the oldest-evidence greens. Rows-only specs stay pinned behind
# every oracled spec. Names absent from the registry are ignored.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) round-7 registrations, never driver-checked
    "pit_regime_attribution",
    "t_closeness_audit",
    "higher_moments_by_type",
    "trigram_backoff_score",
    "precision_recall_sweep",
    "token_ngram_novelty",
    "stratified_kfold_assign",
    "gdpr_erasure_cascade",
    "holt_linear_forecast",
    "stream_pit_attribution",
    "content_defined_chunking",
    "mode_percentile_disc",
    "bootstrap_mean_ci",
    "target_encode_loo",
    "cuped_adjusted_lift",
    "winsorized_trimmed_mean",
    "shapley_channel_attribution",
    "skipgram_window_cooc",
    "qte_by_decile",
    "fourier_weekly_fit",
    "als_rank1_step",
    "mann_kendall_theilsen",
    "diff_in_differences",
    "caliper_matched_att",
    "nb_crossval_accuracy",
    "stl_weekly_decompose",
    "clustering_coefficient",
    "degree_assortativity",
    "knn_label_vote",
    "gbdt_stump_boost",
    "conformal_interval_coverage",
    "doc_keywords_per_doc",
    # (b) round-6 additions likely cut by the round-6 window
    "bpe_encode_corpus",
    "hashed_linear_score",
    "partsupp_synth",
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q16_supplier_cnt",
    "tpch_q20_excess_stock",
    # (c) round-5 red row (NTZ fix landed round 6; keep fronted until a
    # driver window records it green)
    "cusum_drift_flags",
    # (d) oldest-evidence green rotation (r1/r2-era evidence first)
    "inner_join_enrich",
    "left_join_agg",
    "anti_join",
    "semi_join",
    "full_outer_join",
    "scalar_count",
    "orderby_limit",
    "filter_pushdown",
    "scan_project",
    "cast_types",
    "string_funcs",
    "date_funcs",
    "date_arithmetic",
    "epoch_us_roundtrip",
    "distinct_agg",
    "rollup_agg",
    "cube_agg",
    "grouping_sets",
    "having_filter",
    "set_union_all",
    "set_intersect",
    "set_except",
    "window_lag",
    "window_funcs2",
    "pivot_status_counts",
    "unpivot_measures",
    "exists_subquery",
    "scalar_subquery",
    "array_agg_sorted",
    "wordcount_top20",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returns",
    "tpch_q13_custdist",
    "tpch_q18_large_orders",
    "dedup_exact_groups",
    "minhash_signatures",
    "lsh_verified_pairs",
    "embedding_neardup_bucketed",
    "ivf_topk_ann",
    "text_stats",
    "lang_id_heuristic",
    "quality_score",
    "token_count_bpe",
    "doc_fingerprint",
    "sessionize_events",
    "cohort_retention",
    "funnel_conversion",
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
