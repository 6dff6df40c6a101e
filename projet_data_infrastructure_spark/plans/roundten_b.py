"""Round-10 second batch: the classical-inference completions next to the
round-9/10 rank and independence tests, plus sketch/robust/LM operators.

* ``anova_oneway_f`` — one-way ANOVA F of quantity across return flags: the
  parametric companion to ``kruskal_wallis_h`` (the rank analog). Per-group
  moments (n, Σy, Σy²) are exact BIGINTs from one corpus aggregate; the
  between-group sum Σ S_g²/n_g is quantized to integer micro-units so the
  k-term sum is order-insensitive in both engines.
* ``levene_brown_forsythe`` — the Brown–Forsythe variance-homogeneity test
  (Levene with group medians): the assumption check that decides between
  ``anova_oneway_f`` and ``kruskal_wallis_h``. Group medians come from the
  value-bounded quantity grid as exact DOUBLED medians (v_lo + v_hi), so
  |2y − 2m| stays integer and the ANOVA-on-deviations F is computed from
  exact BIGINT moments (F is scale-invariant, so the doubling cancels).
* ``jonckheere_terpstra`` — the ordered-alternative trend test across the
  five order-priority groups (the directional refinement of
  ``kruskal_wallis_h``): 2·JT from per-pair Mann-Whitney counts on the
  (group × quantity)-grid via keyed cumulative windows — never a corpus
  sort — with the full Hollander–Wolfe tie-corrected variance accumulated
  in DECIMAL(38,0) (the n³-scale products pass int64 near sf1).
* ``mutual_information_flags`` — mutual information + normalized MI between
  return flag and line status: the information-theoretic association
  measure next to ``chisq_priority_status``/``cramers_v``; nano-unit
  quantized term sums over the ≤ 3×2 cell grid.
* ``sprt_ab_decision`` — Wald's sequential probability-ratio test on the
  daily purchase-rate stream (p₀=0.15 vs p₁=0.20, α=β=0.05): cumulative
  log-likelihood over the ≤ ~366-row day grid with the ln(·) factors folded
  to shared double literals, so every llr is a bit-identical IEEE tree and
  the boundary-crossing day is deterministic in both engines.

Scale shapes: every spec is one (or two) corpus aggregates to a bounded
grid — 3-row flag moments, ≤ 250-cell priority×quantity grid, ≤ 6-cell
flag×status grid, ≤ 366-row day grid; all windows are keyed or run on
post-aggregate grids (the bounded-window class, SCALE.md)."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_data_infrastructure_spark.functions.stats import two_sided_p_sql
from projet_data_infrastructure_spark.plans._portable import pround, pround_sql
from projet_data_infrastructure_spark.plans.registry import QuerySpec
from projet_data_infrastructure_spark.sources.readers import read_table

# --------------------------------------------------------------------------
# Shared one-way-F tail (anova_oneway_f + levene_brown_forsythe)
# --------------------------------------------------------------------------
#
# Both specs reduce to per-group exact BIGINT moments (ng, sg=Σy, qg=Σy²)
# and the identical F algebra. The between-group term S_g²/n_g is fractional,
# so it is quantized to integer micro-units per group BEFORE the k-term sum
# (the chisq_priority_status discipline) — order-insensitive in both
# engines; S_g² goes through DECIMAL(19,0)² → DECIMAL(38,0) so it cannot
# wrap int64 at large SFs. The expression TEXT is shared verbatim between
# the Spark (F.expr) and DuckDB sides, so the double trees are identical.

# Wide cast-quantizer, no floor(): Spark's floor(DOUBLE) returns LONG and
# saturates at 2^63 while this term reaches ~1.9e20 micro-units at sf100k
# (ADVICE r10). CAST-to-DECIMAL(38,0) rounds to nearest in both engines;
# the +1e-5 shifts exact .5 ties off the boundary (Spark HALF_UP vs
# DuckDB half-even only disagree there), so the quantizer is by
# construction identical cross-engine and never overflows until 10^38.
_BG_TERM_MICRO = (
    "CAST(CAST(CAST(sg AS DECIMAL(19,0)) * CAST(sg AS DECIMAL(19,0))"
    " AS DOUBLE) / CAST(ng AS DOUBLE) * 1000000.0 + 0.00001"
    " AS DECIMAL(38,0))"
)
_SSB = (
    "(CAST(bmicro AS DOUBLE) / 1000000.0"
    " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
)
_SSW = "(CAST(q AS DOUBLE) - CAST(bmicro AS DOUBLE) / 1000000.0)"
_F_STAT = (
    f"(({_SSB} / (CAST(k AS DOUBLE) - 1.0))"
    f" / ({_SSW} / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))))"
)


def _f_from_group_moments(per: DataFrame) -> DataFrame:
    """One-row (k, n, ssb_r, ssw_r, f_r) from per-group (ng, sg, qg)."""
    tot = per.groupBy().agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ng").alias("n"),
        F.sum("sg").alias("s"),
        F.sum("qg").alias("q"),
        F.sum(F.expr(_BG_TERM_MICRO)).alias("bmicro"),
    )
    return tot.select(
        "k",
        "n",
        pround(F.expr(_SSB), 4).alias("ssb_r"),
        pround(F.expr(_SSW), 4).alias("ssw_r"),
        pround(F.expr(_F_STAT), 6).alias("f_r"),
    )


def _f_tail_sql() -> str:
    """The DuckDB rendering of :func:`_f_from_group_moments`, reading a CTE
    named ``per(g, ng, sg, qg)``."""
    return f"""
tot AS (
    SELECT CAST(count(*) AS BIGINT) AS k,
           CAST(sum(ng) AS BIGINT) AS n,
           CAST(sum(sg) AS BIGINT) AS s,
           CAST(sum(qg) AS BIGINT) AS q,
           CAST(sum({_BG_TERM_MICRO}) AS DECIMAL(38,0)) AS bmicro
    FROM per
)
SELECT k, n,
       {pround_sql(_SSB, 4)} AS ssb_r,
       {pround_sql(_SSW, 4)} AS ssw_r,
       {pround_sql(_F_STAT, 6)} AS f_r
FROM tot
"""


def q_anova_oneway_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F of l_quantity across l_returnflag — the parametric
    companion to ``kruskal_wallis_h``. One corpus aggregate to the 3-row
    group-moment frame; SSB/SSW/F from exact BIGINT (n, Σy, Σy²) with the
    between-group term micro-quantized (module doc)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").cast("long").alias("y"),
    )
    per = li.groupBy("g").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("y").alias("sg"),
        F.sum(F.col("y") * F.col("y")).alias("qg"),
    )
    return _f_from_group_moments(per)


def _anova_sql() -> str:
    return f"""
WITH li AS (
    SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS y FROM lineitem
), per AS (
    SELECT g, CAST(count(*) AS BIGINT) AS ng,
           CAST(sum(y) AS BIGINT) AS sg,
           CAST(sum(y * y) AS BIGINT) AS qg
    FROM li GROUP BY g
), {_f_tail_sql()}
"""


def q_levene_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe variance-homogeneity test: ANOVA F on |y − median_g|.

    The per-group median comes from the value-bounded quantity grid
    (≤ 50 rows per group, keyed cumulative window) as the exact DOUBLED
    median m2 = v_lo + v_hi — lo/hi the two middle order statistics — so
    the deviation |2y − m2| is an exact integer and every group moment
    stays BIGINT. F is scale-invariant, so F(|2y − m2|) == F(|y − m|)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").cast("long").alias("v"),
    )
    grid = li.groupBy("g", "v").agg(F.count(F.lit(1)).alias("t"))
    wc = Window.partitionBy("g").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cumg = grid.withColumn("cum", F.sum("t").over(wc))
    ngs = grid.groupBy("g").agg(F.sum("t").alias("ng0"))
    med = (
        cumg.join(F.broadcast(ngs), "g")
        .groupBy("g")
        .agg(
            (
                F.min(F.when(F.col("cum") >= F.expr("(ng0 + 1) DIV 2"), F.col("v")))
                + F.min(F.when(F.col("cum") >= F.expr("ng0 DIV 2 + 1"), F.col("v")))
            ).alias("m2")
        )
    )
    z = grid.join(F.broadcast(med), "g").withColumn(
        "z", F.abs(2 * F.col("v") - F.col("m2"))
    )
    per = z.groupBy("g").agg(
        F.sum("t").alias("ng"),
        F.sum(F.col("t") * F.col("z")).alias("sg"),
        F.sum(F.col("t") * F.col("z") * F.col("z")).alias("qg"),
    )
    return _f_from_group_moments(per)


def _levene_sql() -> str:
    return f"""
WITH li AS (
    SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v FROM lineitem
), grid AS (
    SELECT g, v, CAST(count(*) AS BIGINT) AS t FROM li GROUP BY g, v
), cumg AS (
    SELECT g, v, t,
           CAST(sum(t) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
    FROM grid
), ngs AS (
    SELECT g, CAST(sum(t) AS BIGINT) AS ng0 FROM grid GROUP BY g
), med AS (
    SELECT c.g,
           min(CASE WHEN cum >= (ng0 + 1) // 2 THEN v END)
           + min(CASE WHEN cum >= ng0 // 2 + 1 THEN v END) AS m2
    FROM cumg c JOIN ngs USING (g) GROUP BY c.g
), devs AS (
    SELECT grid.g AS g, t, abs(2 * v - m2) AS z
    FROM grid JOIN med ON grid.g = med.g
), per AS (
    SELECT g, CAST(sum(t) AS BIGINT) AS ng,
           CAST(sum(t * z) AS BIGINT) AS sg,
           CAST(sum(t * z * z) AS BIGINT) AS qg
    FROM devs GROUP BY g
), {_f_tail_sql()}
"""


# --------------------------------------------------------------------------
# Jonckheere–Terpstra ordered-trend test (grid-pair Mann-Whitney counts)
# --------------------------------------------------------------------------

# Doubled pair-count identity on the per-group value grid: with c_i(v) the
# group-i tie count at value v and C_i(v) its keyed cumulative,
#   2·U_ij = Σ_v c_j(v) · (2·C_i(v) − c_i(v))
# (each j-row at v counts 2 per strictly-smaller i-row and 1 per tied one),
# so 2·JT = Σ_{i<j} 2·U_ij is one bounded grid join. C_i(v) must be defined
# at EVERY pooled value v with c_j(v) > 0 — including values absent from
# group i's own support, where c_i(v)=0 but C_i(v) (the count of group-i
# values < v) is generally nonzero — so each group's cumulative is
# DENSIFIED onto the pooled distinct-value frame (groups × pooled-values
# left join, still the same bounded grid) before the pair join. A sparse
# equi-join on group-i support alone silently drops those terms (it only
# "worked" on l_quantity because every group covers the dense 1..50
# domain); ``test_jonckheere_sparse_support`` pins the fix. DECIMAL(38,0)
# accumulation: the tie-variance products are n³-scale and pass int64
# around sf1 (the Spearman/ols discipline, plans/roundnine.py).

_JT_E2 = (
    "((CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(sum_g2 AS DOUBLE)) / 2.0)"
)
_JT_VAR = (
    "((CAST(an AS DOUBLE) - CAST(agx AS DOUBLE) - CAST(atx AS DOUBLE)) / 72.0"
    " + CAST(bgx AS DOUBLE) * CAST(btx AS DOUBLE)"
    " / (36.0 * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)"
    " * (CAST(n AS DOUBLE) - 2.0))"
    " + CAST(cgx AS DOUBLE) * CAST(ctx AS DOUBLE)"
    " / (8.0 * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))"
)
_JT_Z = f"((CAST(jt2 AS DOUBLE) - {_JT_E2}) / (2.0 * sqrt({_JT_VAR})))"


def _tie_poly(col: str, duck: bool) -> dict[str, str]:
    """The three Hollander–Wolfe tie polynomials of a BIGINT count column,
    accumulated 128-bit-exact. The WIDE type differs per engine — Spark
    caps chained DECIMAL(19,0) products at DECIMAL(38,0) (values ≤ ~n³
    fit), while DuckDB's decimal binder rejects >38-digit product widths,
    so the DuckDB side uses HUGEINT — but both are exact integers, so the
    final CAST(… AS DOUBLE) is the identical value on both engines."""
    wide = "HUGEINT" if duck else "DECIMAL(19,0)"
    d = f"CAST({col} AS {wide})"
    d1 = f"CAST({col} - 1 AS {wide})"
    out = "HUGEINT" if duck else "DECIMAL(38,0)"
    return {
        "a": f"CAST(sum({d} * {d1} * CAST(2 * {col} + 5 AS {wide})) AS {out})",
        "b": f"CAST(sum({d} * {d1} * CAST({col} - 2 AS {wide})) AS {out})",
        "c": f"CAST(sum({d} * {d1}) AS {out})",
    }


def jt_stats_from_gv(gv: DataFrame) -> DataFrame:
    """Jonckheere–Terpstra core over a ``(g, v)`` long-typed observation
    frame: returns the 1-row frame with n, jt2, and the z statistic. The
    group cumulatives are densified onto the pooled distinct-value grid
    (module comment) so sparse per-group supports are handled exactly."""
    grid = gv.groupBy("g", "v").agg(F.count(F.lit(1)).alias("c"))
    dense = (
        grid.select("g")
        .distinct()
        .crossJoin(grid.select("v").distinct())
        .join(grid, ["g", "v"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0).cast("long")))
    )
    wc = Window.partitionBy("g").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cumg = dense.withColumn("cc", F.sum("c").over(wc))
    gi = cumg.select(
        F.col("g").alias("g_i"),
        F.col("v").alias("v_i"),
        F.col("c").alias("c_i"),
        F.col("cc").alias("cc_i"),
    )
    gj = grid.select(F.col("g").alias("g_j"), "v", F.col("c").alias("c_j"))
    jt = (
        gj.join(
            F.broadcast(gi),
            (F.col("v") == F.col("v_i")) & (F.col("g_i") < F.col("g_j")),
        )
        .groupBy()
        .agg(
            F.coalesce(
                F.sum(
                    F.expr(
                        "CAST(c_j AS DECIMAL(19,0))"
                        " * CAST(2 * cc_i - c_i AS DECIMAL(19,0))"
                    )
                ),
                F.lit(0),
            ).cast("decimal(38,0)").alias("jt2")
        )
    )
    ngs = grid.groupBy("g").agg(F.sum("c").alias("ng"))
    gp = _tie_poly("ng", duck=False)
    gstats = ngs.groupBy().agg(
        F.expr(
            "CAST(sum(CAST(ng AS DECIMAL(19,0)) * CAST(ng AS DECIMAL(19,0)))"
            " AS DECIMAL(38,0))"
        ).alias("sum_g2"),
        F.expr(gp["a"]).alias("agx"),
        F.expr(gp["b"]).alias("bgx"),
        F.expr(gp["c"]).alias("cgx"),
    )
    tvs = grid.groupBy("v").agg(F.sum("c").alias("tv"))
    tp = _tie_poly("tv", duck=False)
    tstats = tvs.groupBy().agg(
        F.expr(tp["a"]).alias("atx"),
        F.expr(tp["b"]).alias("btx"),
        F.expr(tp["c"]).alias("ctx"),
    )
    nn = grid.groupBy().agg(F.sum("c").alias("n"))
    fin = (
        jt.crossJoin(F.broadcast(gstats))
        .crossJoin(F.broadcast(tstats))
        .crossJoin(F.broadcast(nn))
        .withColumn(
            "an",
            F.expr(
                "CAST(n AS DECIMAL(19,0)) * CAST(n - 1 AS DECIMAL(19,0))"
                " * CAST(2 * n + 5 AS DECIMAL(19,0))"
            ).cast("decimal(38,0)"),
        )
        .withColumn("z", F.expr(_JT_Z))
    )
    return fin


def q_jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere–Terpstra test for an ordered quantity trend across the
    five order-priority groups (1-URGENT < … < 5-LOW): the directional
    refinement of ``kruskal_wallis_h``. 2·JT from the doubled pair-count
    identity on the ≤ 250-cell (group × quantity) grid with per-group
    cumulatives densified onto the pooled value frame (module comment);
    mean and the FULL tie-corrected variance from DECIMAL(38,0)-exact group
    and tie polynomials; z → Zelen-Severo two-sided p."""
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("g"),
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_quantity").cast("long").alias("v"),
    )
    fin = jt_stats_from_gv(li.join(o, "ok").select("g", "v"))
    return fin.select(
        "n",
        pround(F.col("z"), 6).alias("z_r"),
        pround(F.expr(two_sided_p_sql("z")), 8).alias("p_r"),
    )


def _jt_sql() -> str:
    gp = _tie_poly("ng", duck=True)
    tp = _tie_poly("tv", duck=True)
    return f"""
WITH j AS (
    SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS g,
           CAST(l_quantity AS BIGINT) AS v
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), grid AS (
    SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM j GROUP BY g, v
), dense AS (
    -- densify each group's cumulative onto the POOLED value frame so
    -- C_i(v) exists at j-values outside group i's own support
    SELECT gs.g, vals.v, CAST(COALESCE(grid.c, 0) AS BIGINT) AS c
    FROM (SELECT DISTINCT g FROM grid) gs
    CROSS JOIN (SELECT DISTINCT v FROM grid) vals
    LEFT JOIN grid ON grid.g = gs.g AND grid.v = vals.v
), cumg AS (
    SELECT g, v, c,
           CAST(sum(c) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cc
    FROM dense
), jt AS (
    SELECT CAST(COALESCE(sum(CAST(gj.c AS DECIMAL(19,0))
               * CAST(2 * gi.cc - gi.c AS DECIMAL(19,0))), 0)
           AS DECIMAL(38,0)) AS jt2
    FROM grid gj JOIN cumg gi ON gi.v = gj.v AND gi.g < gj.g
), ngs AS (
    SELECT g, CAST(sum(c) AS BIGINT) AS ng FROM grid GROUP BY g
), gstats AS (
    SELECT CAST(sum(CAST(ng AS DECIMAL(19,0)) * CAST(ng AS DECIMAL(19,0)))
               AS DECIMAL(38,0)) AS sum_g2,
           {gp['a']} AS agx, {gp['b']} AS bgx, {gp['c']} AS cgx
    FROM ngs
), tvs AS (
    SELECT v, CAST(sum(c) AS BIGINT) AS tv FROM grid GROUP BY v
), tstats AS (
    SELECT {tp['a']} AS atx, {tp['b']} AS btx, {tp['c']} AS ctx FROM tvs
), nn AS (
    SELECT CAST(sum(c) AS BIGINT) AS n FROM grid
), fin AS (
    SELECT n, jt2, sum_g2, agx, bgx, cgx, atx, btx, ctx,
           CAST(CAST(n AS HUGEINT) * CAST(n - 1 AS HUGEINT)
                * CAST(2 * n + 5 AS HUGEINT) AS HUGEINT) AS an
    FROM jt, gstats, tstats, nn
), zrow AS (
    SELECT n, {_JT_Z} AS z FROM fin
)
SELECT n, {pround_sql('z', 6)} AS z_r,
       {pround_sql(two_sided_p_sql('z'), 8)} AS p_r
FROM zrow
"""


# --------------------------------------------------------------------------
# Mutual information / normalized MI (nano-unit term sums on the cell grid)
# --------------------------------------------------------------------------

_MI_TERM_NANO = (
    "CAST(floor((CAST(o AS DOUBLE) / CAST(n AS DOUBLE))"
    " * ln(CAST(o AS DOUBLE) * CAST(n AS DOUBLE)"
    " / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))) * 1000000000.0 + 0.5)"
    " AS BIGINT)"
)
_H_TERM_NANO = (
    "CAST(floor(-(CAST({m} AS DOUBLE) / CAST(n AS DOUBLE))"
    " * ln(CAST({m} AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000000.0 + 0.5)"
    " AS BIGINT)"
)
_NMI = (
    "(CAST(mi_nano AS DOUBLE)"
    " / sqrt(CAST(hr_nano AS DOUBLE) * CAST(hc_nano AS DOUBLE)))"
)


def q_mutual_information_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information and normalized MI between l_returnflag and
    l_linestatus — the information-theoretic association measure next to
    the chi-square test and Cramér's V. One corpus aggregate to the ≤ 3×2
    cell grid; each p·ln(p/(p·p)) term is quantized to integer NANO-units
    before the ≤ 6-term sum (order-insensitive; ln noise ~1e-16 ≪ the 1e-9
    grid), marginal entropies the same way; NMI = MI/√(H_row·H_col)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("rf"), F.col("l_linestatus").alias("ls")
    )
    cells = li.groupBy("rf", "ls").agg(F.count(F.lit(1)).alias("o"))
    rows = cells.groupBy("rf").agg(F.sum("o").alias("rt"))
    cols = cells.groupBy("ls").agg(F.sum("o").alias("ct"))
    tot = cells.groupBy().agg(F.sum("o").alias("n"))
    mi = (
        cells.join(F.broadcast(rows), "rf")
        .join(F.broadcast(cols), "ls")
        .crossJoin(F.broadcast(tot))
        .groupBy("n")
        .agg(F.sum(F.expr(_MI_TERM_NANO)).alias("mi_nano"))
    )
    hr = rows.crossJoin(F.broadcast(tot)).groupBy().agg(
        F.sum(F.expr(_H_TERM_NANO.format(m="rt"))).alias("hr_nano")
    )
    hc = cols.crossJoin(F.broadcast(tot)).groupBy().agg(
        F.sum(F.expr(_H_TERM_NANO.format(m="ct"))).alias("hc_nano")
    )
    fin = mi.crossJoin(F.broadcast(hr)).crossJoin(F.broadcast(hc))
    return fin.select(
        "n",
        pround(F.expr("CAST(mi_nano AS DOUBLE) / 1000000000.0"), 6).alias("mi_r"),
        pround(F.expr("CAST(hr_nano AS DOUBLE) / 1000000000.0"), 6).alias("h_row_r"),
        pround(F.expr("CAST(hc_nano AS DOUBLE) / 1000000000.0"), 6).alias("h_col_r"),
        pround(F.expr(_NMI), 6).alias("nmi_r"),
    )


def _mi_sql() -> str:
    return f"""
WITH li AS (
    SELECT l_returnflag AS rf, l_linestatus AS ls FROM lineitem
), cells AS (
    SELECT rf, ls, CAST(count(*) AS BIGINT) AS o FROM li GROUP BY rf, ls
), rows_m AS (
    SELECT rf, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY rf
), cols_m AS (
    SELECT ls, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY ls
), tot AS (
    SELECT CAST(sum(o) AS BIGINT) AS n FROM cells
), mi AS (
    SELECT n, CAST(sum({_MI_TERM_NANO}) AS BIGINT) AS mi_nano
    FROM cells JOIN rows_m USING (rf) JOIN cols_m USING (ls), tot
    GROUP BY n
), hr AS (
    SELECT CAST(sum({_H_TERM_NANO.format(m='rt')}) AS BIGINT) AS hr_nano
    FROM rows_m, tot
), hc AS (
    SELECT CAST(sum({_H_TERM_NANO.format(m='ct')}) AS BIGINT) AS hc_nano
    FROM cols_m, tot
)
SELECT n,
       {pround_sql('CAST(mi_nano AS DOUBLE) / 1000000000.0', 6)} AS mi_r,
       {pround_sql('CAST(hr_nano AS DOUBLE) / 1000000000.0', 6)} AS h_row_r,
       {pround_sql('CAST(hc_nano AS DOUBLE) / 1000000000.0', 6)} AS h_col_r,
       {pround_sql(_NMI, 6)} AS nmi_r
FROM mi, hr, hc
"""


# --------------------------------------------------------------------------
# Wald SPRT on the daily purchase-rate stream (shared-literal llr tree)
# --------------------------------------------------------------------------

_SPRT_P0, _SPRT_P1 = 0.15, 0.20
_SPRT_ALPHA = _SPRT_BETA = 0.05
#: ln factors folded to Python double literals: both engines parse the same
#: repr, every llr is BIGINT·literal + BIGINT·literal — bit-identical IEEE.
_L_CONV = repr(math.log(_SPRT_P1 / _SPRT_P0))
_L_MISS = repr(math.log((1.0 - _SPRT_P1) / (1.0 - _SPRT_P0)))
_A_UPPER = repr(math.log((1.0 - _SPRT_BETA) / _SPRT_ALPHA))
_B_LOWER = repr(math.log(_SPRT_BETA / (1.0 - _SPRT_ALPHA)))
_LLR = (
    f"(CAST(cc AS DOUBLE) * {_L_CONV}"
    f" + (CAST(nc AS DOUBLE) - CAST(cc AS DOUBLE)) * {_L_MISS})"
)


def _sprt_from_daily(daily: DataFrame) -> DataFrame:
    """SPRT decision readout from a (d, ne, nconv) day grid — shared by the
    batch spec and its LIVE streaming-parity twin."""
    wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    llr = daily.select(
        "d",
        F.sum("ne").over(wcum).alias("nc"),
        F.sum("nconv").over(wcum).alias("cc"),
    ).withColumn("llr", F.expr(_LLR))
    agg = llr.groupBy().agg(
        F.min(F.when(F.col("llr") >= F.lit(float(_A_UPPER)), F.col("d"))).alias("d_h1"),
        F.min(F.when(F.col("llr") <= F.lit(float(_B_LOWER)), F.col("d"))).alias("d_h0"),
        F.max_by("llr", "d").alias("llr_last"),
        F.max("nc").alias("n"),
        F.max("cc").alias("conv"),
    )
    return agg.select(
        F.expr(
            "CASE WHEN d_h1 IS NOT NULL AND (d_h0 IS NULL OR d_h1 <= d_h0)"
            " THEN 'accept_h1'"
            " WHEN d_h0 IS NOT NULL THEN 'accept_h0' ELSE 'continue' END"
        ).alias("decision"),
        F.expr(
            "CASE WHEN d_h1 IS NOT NULL AND (d_h0 IS NULL OR d_h1 <= d_h0)"
            " THEN d_h1 ELSE d_h0 END"
        ).alias("decision_day"),
        pround(F.col("llr_last"), 6).alias("llr_last_r"),
        "n",
        "conv",
    )


def q_sprt_ab_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's SPRT monitoring the purchase rate day by day: H₀ p=0.15 vs
    H₁ p=0.20, α=β=0.05 — the sequential companion to ``ab_srm_guard`` /
    ``ab_test_z_score`` (peeking-safe early stopping). One corpus aggregate
    to the day grid; cumulative (events, purchases) are exact BIGINTs, the
    llr is a shared-literal double tree (module constant), and the decision
    is the earliest day the llr leaves (B, A)."""
    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))).alias("d"),
            (F.col("event_type") == "purchase").cast("long").alias("conv"),
        )
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("ne"), F.sum("conv").alias("nconv"))
    )
    return _sprt_from_daily(daily)


def _sprt_sql() -> str:
    return f"""
WITH daily AS (
    SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
           CAST(count(*) AS BIGINT) AS ne,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS nconv
    FROM events GROUP BY 1
), cum AS (
    SELECT d,
           CAST(sum(ne) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS nc,
           CAST(sum(nconv) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cc
    FROM daily
), llr AS (
    SELECT d, nc, cc, {_LLR} AS llr FROM cum
), agg AS (
    SELECT min(CASE WHEN llr >= {_A_UPPER} THEN d END) AS d_h1,
           min(CASE WHEN llr <= {_B_LOWER} THEN d END) AS d_h0,
           arg_max(llr, d) AS llr_last,
           max(nc) AS n,
           max(cc) AS conv
    FROM llr
)
SELECT CASE WHEN d_h1 IS NOT NULL AND (d_h0 IS NULL OR d_h1 <= d_h0)
            THEN 'accept_h1'
            WHEN d_h0 IS NOT NULL THEN 'accept_h0' ELSE 'continue' END
           AS decision,
       CASE WHEN d_h1 IS NOT NULL AND (d_h0 IS NULL OR d_h1 <= d_h0)
            THEN d_h1 ELSE d_h0 END AS decision_day,
       {pround_sql('llr_last', 6)} AS llr_last_r,
       n, conv
FROM agg
"""


SPECS: list[QuerySpec] = [
    QuerySpec(
        "anova_oneway_f",
        q_anova_oneway_f,
        _anova_sql(),
        ("stats",),
        doc="One-way ANOVA F of quantity across return flags; exact BIGINT "
        "group moments, micro-quantized between-group term",
    ),
    QuerySpec(
        "levene_brown_forsythe",
        q_levene_brown_forsythe,
        _levene_sql(),
        ("stats",),
        doc="Brown-Forsythe variance-homogeneity test: ANOVA F on "
        "|2y - doubled group median| from the bounded quantity grid",
    ),
    QuerySpec(
        "jonckheere_terpstra",
        q_jonckheere_terpstra,
        _jt_sql(),
        ("stats", "bench"),
        doc="Ordered-trend test across priority groups: grid-pair doubled "
        "Mann-Whitney counts + full tie-corrected variance in DECIMAL(38,0)",
    ),
    QuerySpec(
        "mutual_information_flags",
        q_mutual_information_flags,
        _mi_sql(),
        ("stats",),
        doc="Mutual information + NMI between return flag and line status; "
        "nano-unit quantized term sums on the cell grid",
    ),
    QuerySpec(
        "sprt_ab_decision",
        q_sprt_ab_decision,
        _sprt_sql(),
        ("stats", "timeseries"),
        doc="Wald SPRT on the daily purchase-rate stream; shared-literal "
        "llr tree, earliest boundary-crossing day",
    ),
]


# --------------------------------------------------------------------------
# HDR-histogram quantiles (integer-exact mergeable sketch)
# --------------------------------------------------------------------------
#
# HdrHistogram bucketing with 8 significant bits: for cents < 256 the
# bucket IS the value; above, idx = 128*(e-7) + (cents >> (e-7)) with
# e = floor(log2(cents)) taken EXACTLY as length(bin(cents)) - 1 — no
# floating log anywhere, so the sketch is bit-identical cross-engine and
# buckets merge by integer addition (relative error <= 2^-7 per readout).
# The readout scans the bounded bucket grid (<= 128*57 indexes, a few
# hundred occupied) with one unpartitioned cumulative window — the
# post-aggregate bounded-window class.

_HDR_QS = (0.5, 0.9, 0.99, 0.999)


_HDR_IDX = (
    "CASE WHEN cents < 256 THEN cents ELSE"
    " 128 * (length(bin(cents)) - 1 - 7)"
    " + shiftright(cents, length(bin(cents)) - 1 - 7) END"
)


def _hdr_readout(hist: DataFrame) -> DataFrame:
    """Quantile readout from an (idx, cnt) HDR bucket histogram — shared by
    the batch sketch and its LIVE streaming twin (sketches merge by
    integer addition, so any partial histogram re-aggregates first)."""
    spark = hist.sparkSession
    wcum = Window.orderBy("idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(wcum))
    tot = hist.groupBy().agg(F.sum("cnt").alias("n"))
    qs = spark.createDataFrame([(q,) for q in _HDR_QS], "q double")
    hit = (
        qs.crossJoin(F.broadcast(tot))
        .join(
            cum,
            F.col("cum") >= F.ceil(F.col("q") * F.col("n")).cast("long"),
        )
        .groupBy("q", "n")
        .agg(F.min("idx").alias("idx"))
    )
    lb = (
        "CASE WHEN idx < 256 THEN idx ELSE"
        " shiftleft(idx - 128 * (idx DIV 128 - 1), idx DIV 128 - 1) END"
    )
    ub = (
        "CASE WHEN idx < 256 THEN idx ELSE"
        " shiftleft(idx - 128 * (idx DIV 128 - 1) + 1, idx DIV 128 - 1) - 1 END"
    )
    return hit.select(
        "q",
        "n",
        "idx",
        pround(F.expr(f"CAST({lb} AS DOUBLE) / 100.0"), 2).alias("lb_usd_r"),
        pround(F.expr(f"CAST({ub} AS DOUBLE) / 100.0"), 2).alias("ub_usd_r"),
    )


def q_hdr_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-price quantiles from an HdrHistogram-style integer sketch:
    exact power-of-2 + 7-bit-mantissa bucketing (module comment), one
    corpus aggregate to the bucket grid, quantile readout at the smallest
    bucket whose cumulative count reaches ceil(q*n). lb/ub are the exact
    integer bucket bounds, so the answer carries its own error bar."""
    o = read_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents")
    )
    hist = (
        o.select(F.expr(_HDR_IDX).alias("idx"))
        .groupBy("idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return _hdr_readout(hist)


def _hdr_sql(
    source: str = "SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
    " AS cents FROM orders",
) -> str:
    lb = (
        "CASE WHEN idx < 256 THEN idx ELSE"
        " ((idx - 128 * (idx // 128 - 1)) << (idx // 128 - 1)) END"
    )
    ub = (
        "CASE WHEN idx < 256 THEN idx ELSE"
        " ((idx - 128 * (idx // 128 - 1) + 1) << (idx // 128 - 1)) - 1 END"
    )
    return f"""
WITH o AS (
    {source}
), bucketed AS (
    SELECT CASE WHEN cents < 256 THEN cents ELSE
           128 * (length(bin(cents)) - 1 - 7)
           + (cents >> (length(bin(cents)) - 1 - 7)) END AS idx
    FROM o
), hist AS (
    SELECT idx, CAST(count(*) AS BIGINT) AS cnt FROM bucketed GROUP BY idx
), cum AS (
    SELECT idx, CAST(sum(cnt) OVER (ORDER BY idx
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
    FROM hist
), tot AS (
    SELECT CAST(sum(cnt) AS BIGINT) AS n FROM hist
), qs(q) AS (
    VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)),
           (CAST(0.99 AS DOUBLE)), (CAST(0.999 AS DOUBLE))
), hit AS (
    SELECT q, n, min(idx) AS idx
    FROM qs, tot, cum
    WHERE cum >= CAST(ceil(q * n) AS BIGINT)
    GROUP BY q, n
)
SELECT q, n, idx,
       {pround_sql(f'CAST({lb} AS DOUBLE) / 100.0', 2)} AS lb_usd_r,
       {pround_sql(f'CAST({ub} AS DOUBLE) / 100.0', 2)} AS ub_usd_r
FROM hit
"""


# --------------------------------------------------------------------------
# Hodges–Lehmann shift estimator (grid x grid pairwise-difference median)
# --------------------------------------------------------------------------


def q_hodges_lehmann_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges–Lehmann estimator of the R-vs-A quantity shift: the median of
    all n_R*n_A pairwise differences — the robust location companion to
    ``mann_whitney_u``. The pair multiset is never materialized: the two
    value grids (<= 50 rows each) cross-join to the <= 99-row difference
    grid with BIGINT pair weights, and the weighted median comes off one
    bounded cumulative window; the DOUBLED median (d_lo + d_hi) keeps the
    answer integer-exact through the even-N average."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("v")
    )
    ga = (
        li.filter(F.col("l_returnflag") == "A")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("ca"))
        .select(F.col("v").alias("va"), "ca")
    )
    gr = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cr"))
        .select(F.col("v").alias("vr"), "cr")
    )
    dgrid = (
        gr.crossJoin(F.broadcast(ga))
        .select(
            (F.col("vr") - F.col("va")).alias("d"),
            (F.col("cr") * F.col("ca")).alias("w"),
        )
        .groupBy("d")
        .agg(F.sum("w").alias("w"))
    )
    wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = dgrid.withColumn("cum", F.sum("w").over(wcum))
    tot = dgrid.groupBy().agg(F.sum("w").alias("np"))
    fin = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("np")
        .agg(
            F.min(F.when(F.col("cum") >= F.expr("(np + 1) DIV 2"), F.col("d"))).alias("d_lo"),
            F.min(F.when(F.col("cum") >= F.expr("np DIV 2 + 1"), F.col("d"))).alias("d_hi"),
        )
    )
    return fin.select(
        F.col("np").alias("n_pairs"),
        "d_lo",
        "d_hi",
        (F.expr("CAST(d_lo + d_hi AS DOUBLE)") / F.lit(2.0)).alias("hl_shift"),
    )


_HL_SQL = """
WITH li AS (
    SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v FROM lineitem
), ga AS (
    SELECT v AS va, CAST(count(*) AS BIGINT) AS ca FROM li WHERE g = 'A' GROUP BY v
), gr AS (
    SELECT v AS vr, CAST(count(*) AS BIGINT) AS cr FROM li WHERE g = 'R' GROUP BY v
), dgrid AS (
    SELECT vr - va AS d, CAST(sum(cr * ca) AS BIGINT) AS w
    FROM gr, ga GROUP BY vr - va
), cum AS (
    SELECT d, CAST(sum(w) OVER (ORDER BY d
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
    FROM dgrid
), tot AS (
    SELECT CAST(sum(w) AS BIGINT) AS np FROM dgrid
), fin AS (
    SELECT np,
           min(CASE WHEN cum >= (np + 1) // 2 THEN d END) AS d_lo,
           min(CASE WHEN cum >= np // 2 + 1 THEN d END) AS d_hi
    FROM cum, tot GROUP BY np
)
SELECT np AS n_pairs, d_lo, d_hi, CAST(d_lo + d_hi AS DOUBLE) / 2.0 AS hl_shift
FROM fin
"""


# --------------------------------------------------------------------------
# Page–Hinkley drift detector (micro-quantized deviations on the day grid)
# --------------------------------------------------------------------------

#: Alarm threshold: $500 of accumulated positive deviation, in cent-micros.
_PH_LAMBDA = 500 * 100 * 1_000_000


def q_page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page–Hinkley mean-INCREASE drift detector on the daily-revenue
    series (delta=0): m_t = sum_{i<=t}(x_i - mean_i) with mean_i the
    running prefix mean, PH_t = m_t - min_{i<=t} m_i, alarm when PH > the
    $500 threshold — the online companion to the offline
    ``changepoint_cusum_mean``. Each deviation is quantized to integer
    cent-micros BEFORE accumulation (the chisq micro-unit discipline), so
    every m_t, the prefix min and the argmax day are integer-exact; only
    the reported magnitude converts to dollars."""
    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))).alias("d"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").alias("x"))
    )
    wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pre = daily.select(
        "d",
        "x",
        F.sum("x").over(wcum).alias("s"),
        F.row_number().over(Window.orderBy("d")).alias("t"),
    )
    dev = pre.withColumn(
        "dev",
        F.expr(
            "CAST(floor((CAST(x AS DOUBLE) - CAST(s AS DOUBLE) / CAST(t AS DOUBLE))"
            " * 1000000.0 + 0.5) AS BIGINT)"
        ),
    )
    ph = dev.select(
        "d",
        (
            F.sum("dev").over(wcum) - F.min(F.sum("dev").over(wcum)).over(wcum)
        ).alias("ph"),
    )
    peak = ph.orderBy(F.col("ph").desc(), F.col("d").asc()).limit(1)
    alarms = ph.groupBy().agg(
        F.min(F.when(F.col("ph") > F.lit(_PH_LAMBDA), F.col("d"))).alias(
            "first_alarm_day"
        ),
        F.sum((F.col("ph") > F.lit(_PH_LAMBDA)).cast("long")).alias("n_alarm_days"),
    )
    return peak.crossJoin(F.broadcast(alarms)).select(
        F.col("d").alias("peak_day"),
        pround(F.expr("CAST(ph AS DOUBLE) / 1000000.0 / 100.0"), 4).alias(
            "ph_max_usd_r"
        ),
        "first_alarm_day",
        "n_alarm_days",
    )


def _ph_sql() -> str:
    return f"""
WITH daily AS (
    SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
    FROM events GROUP BY 1
), pre AS (
    SELECT d, x,
           CAST(sum(x) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s,
           row_number() OVER (ORDER BY d) AS t
    FROM daily
), dev AS (
    SELECT d, CAST(floor((CAST(x AS DOUBLE) - CAST(s AS DOUBLE) / CAST(t AS DOUBLE))
               * 1000000.0 + 0.5) AS BIGINT) AS dev
    FROM pre
), m AS (
    SELECT d, CAST(sum(dev) OVER (ORDER BY d
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS m
    FROM dev
), ph AS (
    SELECT d, m - min(m) OVER (ORDER BY d
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph
    FROM m
), peak AS (
    SELECT d AS peak_day, ph FROM ph ORDER BY ph DESC, d ASC LIMIT 1
), alarms AS (
    SELECT min(CASE WHEN ph > {_PH_LAMBDA} THEN d END) AS first_alarm_day,
           CAST(sum(CASE WHEN ph > {_PH_LAMBDA} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_alarm_days
    FROM ph
)
SELECT peak_day,
       {pround_sql('CAST(ph AS DOUBLE) / 1000000.0 / 100.0', 4)} AS ph_max_usd_r,
       first_alarm_day, n_alarm_days
FROM peak, alarms
"""


# --------------------------------------------------------------------------
# Deterministic RANSAC line fit (hash-seeded candidates, exact inlier test)
# --------------------------------------------------------------------------

_RANSAC_K = 32  # sample rows -> 16 candidate lines
_RANSAC_TOL_CENTS = 50_000  # +-$500 inlier band


def q_ransac_line_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANSAC robust line fit of extendedprice ~ quantity with every source
    of randomness replaced by the portable hash (``functions/hashing``):
    the 32 sample rows are the corpus-wide minima of hash64(orderkey-line)
    — a top-k, never a sort — paired in hash order into 16 candidate
    lines; the inlier test clears denominators so it is exact BIGINT
    arithmetic (|y*dx - y1*dx - dy*(x-x1)| <= tol*|dx|), evaluated as one
    broadcast nested-loop pass over the corpus (map-only, no shuffle);
    best candidate by (inliers DESC, id ASC). Cited next to the reference's
    random draws (`/root/reference` generator): same determinism policy."""
    from projet_data_infrastructure_spark.functions.hashing import hash64

    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        F.col("l_quantity").cast("long").alias("x"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long").alias("y"),
    )
    keyed = li.withColumn(
        "h", hash64(F.concat_ws("-", F.col("ok"), F.col("ln")))
    )
    sample = keyed.orderBy("h", "ok", "ln").limit(_RANSAC_K)
    numbered = sample.withColumn(
        "rn", F.row_number().over(Window.orderBy("h", "ok", "ln"))
    )
    cands = (
        numbered.groupBy(F.expr("(rn + 1) DIV 2").alias("cand"))
        .agg(
            F.max(F.when(F.col("rn") % 2 == 1, F.col("x"))).alias("x1"),
            F.max(F.when(F.col("rn") % 2 == 1, F.col("y"))).alias("y1"),
            F.max(F.when(F.col("rn") % 2 == 0, F.col("x"))).alias("x2"),
            F.max(F.when(F.col("rn") % 2 == 0, F.col("y"))).alias("y2"),
        )
        .filter(F.col("x1") != F.col("x2"))
        .select(
            "cand",
            "x1",
            "y1",
            (F.col("x2") - F.col("x1")).alias("dx"),
            (F.col("y2") - F.col("y1")).alias("dy"),
        )
    )
    scored = (
        li.crossJoin(F.broadcast(cands))
        .select(
            "cand",
            "x1",
            "y1",
            "dx",
            "dy",
            (
                F.abs(
                    F.col("y") * F.col("dx")
                    - F.col("y1") * F.col("dx")
                    - F.col("dy") * (F.col("x") - F.col("x1"))
                )
                <= F.lit(_RANSAC_TOL_CENTS) * F.abs(F.col("dx"))
            ).cast("long").alias("inl"),
        )
        .groupBy("cand", "x1", "y1", "dx", "dy")
        .agg(F.sum("inl").alias("inliers"), F.count(F.lit(1)).alias("n"))
    )
    best = scored.orderBy(F.col("inliers").desc(), F.col("cand").asc()).limit(1)
    return best.select(
        "cand",
        "inliers",
        "n",
        pround(
            F.expr("CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE) / 100.0"), 4
        ).alias("slope_usd_r"),
        pround(
            F.expr(
                "(CAST(y1 AS DOUBLE) - CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE)"
                " * CAST(x1 AS DOUBLE)) / 100.0"
            ),
            4,
        ).alias("intercept_usd_r"),
    )


def _ransac_sql() -> str:
    from projet_data_infrastructure_spark.functions.hashing import hash64_sql

    h = hash64_sql("CAST(ok AS VARCHAR) || '-' || CAST(ln AS VARCHAR)")
    return f"""
WITH li AS (
    SELECT l_orderkey AS ok, l_linenumber AS ln,
           CAST(l_quantity AS BIGINT) AS x,
           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
    FROM lineitem
), keyed AS (
    SELECT ok, ln, x, y, {h} AS h FROM li
), sample_rows AS (
    SELECT * FROM keyed ORDER BY h, ok, ln LIMIT {_RANSAC_K}
), numbered AS (
    SELECT x, y, row_number() OVER (ORDER BY h, ok, ln) AS rn FROM sample_rows
), cands AS (
    SELECT (rn + 1) // 2 AS cand,
           max(CASE WHEN rn % 2 = 1 THEN x END) AS x1,
           max(CASE WHEN rn % 2 = 1 THEN y END) AS y1,
           max(CASE WHEN rn % 2 = 0 THEN x END) AS x2,
           max(CASE WHEN rn % 2 = 0 THEN y END) AS y2
    FROM numbered GROUP BY 1
), lines AS (
    SELECT cand, x1, y1, x2 - x1 AS dx, y2 - y1 AS dy
    FROM cands WHERE x1 != x2
), scored AS (
    SELECT cand, x1, y1, dx, dy,
           CAST(sum(CASE WHEN abs(y * dx - y1 * dx - dy * (x - x1))
                              <= {_RANSAC_TOL_CENTS} * abs(dx)
                         THEN 1 ELSE 0 END) AS BIGINT) AS inliers,
           CAST(count(*) AS BIGINT) AS n
    FROM li, lines
    GROUP BY cand, x1, y1, dx, dy
), best AS (
    SELECT * FROM scored ORDER BY inliers DESC, cand ASC LIMIT 1
)
SELECT cand, inliers, n,
       {pround_sql('CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE) / 100.0', 4)}
           AS slope_usd_r,
       {pround_sql(
           '(CAST(y1 AS DOUBLE) - CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE)'
           ' * CAST(x1 AS DOUBLE)) / 100.0', 4)}
           AS intercept_usd_r
FROM best
"""


# --------------------------------------------------------------------------
# Interpolated Kneser–Ney bigram LM (continuation counts, D = 0.75)
# --------------------------------------------------------------------------

_KN_FORMULA = (
    "(greatest(CAST(c AS DOUBLE) - 0.75, 0.0) / CAST(cw1 AS DOUBLE)"
    " + 0.75 * CAST(n1f AS DOUBLE) / CAST(cw1 AS DOUBLE)"
    " * CAST(n1b AS DOUBLE) / CAST(bt AS DOUBLE))"
)


def q_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram probabilities over the documents
    corpus (D = 0.75): P(w2|w1) = max(c-D,0)/c(w1) + D*N1+(w1,.)/c(w1) *
    N1+(.,w2)/|bigram types| — the smoothing used by every n-gram LM the
    trigram-backoff spec approximates more crudely. All counts (bigram
    tokens, forward/backward continuation type counts, total types) are
    exact BIGINT group-bys on the vocabulary-bounded type table; the top-20
    readout orders by (count DESC, w1, w2) so ties are deterministic."""
    from projet_data_infrastructure_spark.operators.text import tokens

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(tokens(F.col("text")).alias("t")).filter(F.size("t") >= 2)
    bg = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    types = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    fwd = types.groupBy("w1").agg(
        F.sum("c").alias("cw1"), F.count(F.lit(1)).alias("n1f")
    )
    bwd = types.groupBy("w2").agg(F.count(F.lit(1)).alias("n1b"))
    bt = types.groupBy().agg(F.count(F.lit(1)).alias("bt"))
    top = (
        types.join(fwd, "w1")
        .join(bwd, "w2")
        .crossJoin(F.broadcast(bt))
        .orderBy(F.col("c").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(20)
    )
    return top.select(
        "w1", "w2", "c", pround(F.expr(_KN_FORMULA), 6).alias("kn_r")
    )


def _kn_sql() -> str:
    return f"""
WITH toks AS (
    SELECT list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '') AS t
    FROM documents
), bg AS (
    SELECT t[i] AS w1, t[i + 1] AS w2
    FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i)
    WHERE len(t) >= 2
), types AS (
    SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY w1, w2
), fwd AS (
    SELECT w1, CAST(sum(c) AS BIGINT) AS cw1,
           CAST(count(*) AS BIGINT) AS n1f
    FROM types GROUP BY w1
), bwd AS (
    SELECT w2, CAST(count(*) AS BIGINT) AS n1b FROM types GROUP BY w2
), bt AS (
    SELECT CAST(count(*) AS BIGINT) AS bt FROM types
)
SELECT w1, w2, c, {pround_sql(_KN_FORMULA, 6)} AS kn_r
FROM types JOIN fwd USING (w1) JOIN bwd USING (w2), bt
ORDER BY c DESC, w1 ASC, w2 ASC LIMIT 20
"""


SPECS.extend(
    [
        QuerySpec(
            "hdr_histogram_quantiles",
            q_hdr_histogram_quantiles,
            _hdr_sql(),
            ("sketch",),
            doc="HdrHistogram-style quantile sketch: exact integer "
            "power-of-2 + 7-bit bucketing, mergeable, bounded-grid readout",
        ),
        QuerySpec(
            "hodges_lehmann_shift",
            q_hodges_lehmann_shift,
            _HL_SQL,
            ("stats",),
            doc="Hodges-Lehmann R-vs-A shift: weighted median of pairwise "
            "differences from the 99-row grid-product, never the pair set",
        ),
        QuerySpec(
            "page_hinkley_drift",
            q_page_hinkley_drift,
            _ph_sql(),
            ("stats", "timeseries"),
            doc="Page-Hinkley mean-increase detector on daily revenue; "
            "micro-quantized deviations, integer-exact PH and alarms",
        ),
        QuerySpec(
            "ransac_line_fit",
            q_ransac_line_fit,
            _ransac_sql(),
            ("learning",),
            doc="Deterministic RANSAC price~quantity line: hash-seeded "
            "candidate pairs, exact BIGINT inlier test, map-only scoring",
        ),
        QuerySpec(
            "kneser_ney_bigram",
            q_kneser_ney_bigram,
            _kn_sql(),
            ("llm",),
            doc="Interpolated Kneser-Ney bigram LM (D=0.75) with exact "
            "continuation counts; top-20 bigrams with KN probability",
        ),
    ]
)


# --------------------------------------------------------------------------
# LIVE streaming SPRT (stream == batch hash parity, same oracle)
# --------------------------------------------------------------------------


def q_stream_sprt_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SPRT running LIVE: a streaming groupBy(day) aggregation in
    update mode (availableNow) materializes the daily (events, purchases)
    grid — the state Structured Streaming keeps is exactly one row per day,
    bounded by the calendar — and the identical bounded-grid readout
    (:func:`_sprt_from_daily`) produces the decision, so the spec
    hash-checks against the SAME oracle as ``sprt_ab_decision`` (the
    stream == batch parity discipline). This is the shape of a production
    always-on experiment monitor: per-micro-batch updates to the day grid,
    decision recomputed from ≤ 366 rows."""
    from projet_data_infrastructure_spark.plans.events_queries import (
        _events_stream,
        _run_stream,
    )

    stream = _events_stream(spark, sf_dir)
    daily = (
        stream.select(
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))).alias("d"),
            (F.col("event_type") == "purchase").cast("long").alias("conv"),
        )
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("ne"), F.sum("conv").alias("nconv"))
    )
    table = _run_stream(
        daily.writeStream.outputMode("update"), spark, "stream_sprt_sink"
    )
    return _sprt_from_daily(table)


# --------------------------------------------------------------------------
# Logistic regression via IRLS on the value grid (3 unrolled Newton steps)
# --------------------------------------------------------------------------
#
# P(return | quantity) = sigmoid(w0 + w1*qty). The corpus collapses to the
# <= 100-cell (quantity, label) grid in ONE aggregate; each IRLS step is
# then a grid-sized aggregate of micro-quantized weighted moments (the
# chisq discipline: quantize each cell's double term to an integer BEFORE
# the sum, so accumulation order cannot matter), and the Newton solve of
# the 2x2 system runs on one row. Three steps unrolled identically on both
# engines; the shared 1e6 factor in all five moments cancels in the ratios.

_LOGIT_P = "(1.0 / (1.0 + exp(-(w0 + w1 * CAST(x AS DOUBLE)))))"


def _q6(e: str) -> str:
    # Wide cast-quantizer (the _BG_TERM_MICRO discipline): the swxx cell
    # terms approach int64 near sf100k and a BIGINT sum accumulator wraps
    # around sf7000 (ADVICE r10); DECIMAL(38,0) terms + accumulators are
    # exact to 10^38, and the +1e-5 keeps exact .5 ties off the
    # HALF_UP-vs-half-even boundary.
    return f"CAST(({e}) * 1000000.0 + 0.00001 AS DECIMAL(38,0))"


_IRLS_TERMS = {
    "sw": _q6(f"CAST(c AS DOUBLE) * {_LOGIT_P} * (1.0 - {_LOGIT_P})"),
    "swx": _q6(
        f"CAST(c AS DOUBLE) * {_LOGIT_P} * (1.0 - {_LOGIT_P}) * CAST(x AS DOUBLE)"
    ),
    "swxx": _q6(
        f"CAST(c AS DOUBLE) * {_LOGIT_P} * (1.0 - {_LOGIT_P})"
        " * CAST(x AS DOUBLE) * CAST(x AS DOUBLE)"
    ),
    "g0": _q6(f"CAST(c AS DOUBLE) * (CAST(y AS DOUBLE) - {_LOGIT_P})"),
    "g1": _q6(
        f"CAST(c AS DOUBLE) * (CAST(y AS DOUBLE) - {_LOGIT_P}) * CAST(x AS DOUBLE)"
    ),
}
_IRLS_DET = (
    "(CAST(sw AS DOUBLE) * CAST(swxx AS DOUBLE)"
    " - CAST(swx AS DOUBLE) * CAST(swx AS DOUBLE))"
)
_IRLS_NW0 = (
    f"(w0 + (CAST(swxx AS DOUBLE) * CAST(g0 AS DOUBLE)"
    f" - CAST(swx AS DOUBLE) * CAST(g1 AS DOUBLE)) / {_IRLS_DET})"
)
_IRLS_NW1 = (
    f"(w1 + (CAST(sw AS DOUBLE) * CAST(g1 AS DOUBLE)"
    f" - CAST(swx AS DOUBLE) * CAST(g0 AS DOUBLE)) / {_IRLS_DET})"
)
_IRLS_LL = _q6(
    f"CAST(c AS DOUBLE) * (CAST(y AS DOUBLE) * ln({_LOGIT_P})"
    f" + (1.0 - CAST(y AS DOUBLE)) * ln(1.0 - {_LOGIT_P}))"
)
_IRLS_STEPS = 3


def q_logistic_irls_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression of (l_returnflag = 'R') on l_quantity, fit with
    three unrolled IRLS/Newton steps on the ≤ 100-cell value grid (module
    comment). Output: n, the fitted weights, and the final log-likelihood —
    every moment micro-quantized so both engines sum identical integers."""
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("x"),
        (F.col("l_returnflag") == "R").cast("long").alias("y"),
    )
    grid = li.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c"))
    w = spark.range(1).select(F.lit(0.0).alias("w0"), F.lit(0.0).alias("w1"))
    for _ in range(_IRLS_STEPS):
        sums = (
            grid.crossJoin(F.broadcast(w))
            .groupBy("w0", "w1")
            .agg(*[F.sum(F.expr(t)).alias(k) for k, t in _IRLS_TERMS.items()])
        )
        w = sums.select(
            F.expr(_IRLS_NW0).alias("w0"), F.expr(_IRLS_NW1).alias("w1")
        )
    fin = (
        grid.crossJoin(F.broadcast(w))
        .groupBy("w0", "w1")
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.expr(_IRLS_LL)).alias("ll_micro"),
        )
    )
    return fin.select(
        "n",
        pround(F.col("w0"), 6).alias("w0_r"),
        pround(F.col("w1"), 6).alias("w1_r"),
        pround(F.expr("CAST(ll_micro AS DOUBLE) / 1000000.0"), 4).alias("ll_r"),
    )


def _logistic_sql() -> str:
    terms = ",\n           ".join(
        f"CAST(sum({t}) AS DECIMAL(38,0)) AS {k}" for k, t in _IRLS_TERMS.items()
    )
    ctes = [
        """
WITH li AS (
    SELECT CAST(l_quantity AS BIGINT) AS x,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
    FROM lineitem
), grid AS (
    SELECT x, y, CAST(count(*) AS BIGINT) AS c FROM li GROUP BY x, y
), it0 AS (SELECT 0.0 AS w0, 0.0 AS w1)"""
    ]
    for i in range(_IRLS_STEPS):
        ctes.append(
            f""", s{i} AS (
    SELECT w0, w1, {terms}
    FROM grid, it{i} GROUP BY w0, w1
), it{i + 1} AS (
    SELECT {_IRLS_NW0} AS w0, {_IRLS_NW1} AS w1 FROM s{i}
)"""
        )
    ctes.append(
        f""", fin AS (
    SELECT w0, w1, CAST(sum(c) AS BIGINT) AS n,
           CAST(sum({_IRLS_LL}) AS DECIMAL(38,0)) AS ll_micro
    FROM grid, it{_IRLS_STEPS} GROUP BY w0, w1
)
SELECT n, {pround_sql('w0', 6)} AS w0_r, {pround_sql('w1', 6)} AS w1_r,
       {pround_sql('CAST(ll_micro AS DOUBLE) / 1000000.0', 4)} AS ll_r
FROM fin"""
    )
    return "".join(ctes)


# --------------------------------------------------------------------------
# Friedman test (blocked ranks, exact cross-multiplied comparisons)
# --------------------------------------------------------------------------
#
# Blocks = nations, treatments = the five order priorities, response = the
# block-cell mean quantity. Cell means are kept as EXACT integer fractions
# (sq, cnt) and ranked within each block by cross-multiplication
# (sq_a*cnt_b vs sq_b*cnt_a) — no floating comparison anywhere — via a
# <= (25*5*5)-row within-block pair join. DOUBLED average ranks
# r2 = 2*less + eq_others + 2 stay integer through ties; only the final
# chi-square converts to double.

_FRIEDMAN_CHI2 = (
    "(12.0 / (CAST(nb AS DOUBLE) * CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0))"
    " * (CAST(sum_r2sq AS DOUBLE) / 4.0)"
    " - 3.0 * CAST(nb AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0))"
)


def q_friedman_nation_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test: do the five order priorities rank consistently by
    mean line quantity across nation blocks? The repeated-measures
    companion to ``kruskal_wallis_h`` (which ignores blocking). Exact
    integer ranking by cross-multiplication on the ≤ 125-cell
    (nation × priority) grid; blocks missing a treatment are dropped
    (complete-block design), k is derived from the data."""
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_custkey").alias("ck"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("p"),
    )
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"), F.col("c_nationkey").alias("nk")
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_quantity").cast("long").alias("v"),
    )
    cells = (
        li.join(o, "ok")
        .join(F.broadcast(c), "ck")
        .groupBy("nk", "p")
        .agg(F.sum("v").alias("sq"), F.count(F.lit(1)).alias("cnt"))
    )
    kk = cells.groupBy().agg(F.countDistinct("p").alias("k"))
    complete = (
        cells.groupBy("nk")
        .agg(F.count(F.lit(1)).alias("np"))
        .crossJoin(F.broadcast(kk))
        .filter(F.col("np") == F.col("k"))
        .select("nk")
    )
    cc = cells.join(F.broadcast(complete), "nk")
    a = cc.select(
        "nk", F.col("p").alias("pa"), F.col("sq").alias("sqa"), F.col("cnt").alias("ca")
    )
    b = cc.select(
        "nk", F.col("p").alias("pb"), F.col("sq").alias("sqb"), F.col("cnt").alias("cb")
    )
    pairs = a.join(F.broadcast(b), "nk").filter(F.col("pa") != F.col("pb"))
    r2 = pairs.groupBy("nk", "pa").agg(
        (
            2
            + 2 * F.sum((F.col("sqb") * F.col("ca") < F.col("sqa") * F.col("cb")).cast("long"))
            + F.sum((F.col("sqb") * F.col("ca") == F.col("sqa") * F.col("cb")).cast("long"))
        ).alias("r2")
    )
    rj = r2.groupBy("pa").agg(F.sum("r2").alias("r2j"), F.count(F.lit(1)).alias("nb"))
    fin = rj.groupBy("nb").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("r2j") * F.col("r2j")).alias("sum_r2sq"),
    )
    return fin.select(
        F.col("nb").cast("long").alias("n_blocks"),
        F.col("k").cast("long").alias("k"),
        pround(F.expr(_FRIEDMAN_CHI2), 6).alias("chi2_r"),
        (F.col("k") - 1).cast("long").alias("df"),
    )


def _friedman_sql() -> str:
    return f"""
WITH o AS (
    SELECT o_orderkey AS ok, o_custkey AS ck,
           CAST(substr(o_orderpriority, 1, 1) AS INT) AS p
    FROM orders
), cells AS (
    SELECT c_nationkey AS nk, p,
           CAST(sum(l_quantity) AS BIGINT) AS sq,
           CAST(count(*) AS BIGINT) AS cnt
    FROM lineitem JOIN o ON l_orderkey = ok JOIN customer ON ck = c_custkey
    GROUP BY 1, 2
), kk AS (
    SELECT CAST(count(DISTINCT p) AS BIGINT) AS k FROM cells
), complete AS (
    SELECT nk FROM cells, kk GROUP BY nk, k HAVING count(*) = k
), cc AS (
    SELECT cells.* FROM cells JOIN complete USING (nk)
), pairs AS (
    SELECT a.nk, a.p AS pa,
           CAST(sum(CASE WHEN b.sq * a.cnt < a.sq * b.cnt THEN 1 ELSE 0 END)
                AS BIGINT) AS less,
           CAST(sum(CASE WHEN b.sq * a.cnt = a.sq * b.cnt THEN 1 ELSE 0 END)
                AS BIGINT) AS eq
    FROM cc a JOIN cc b ON a.nk = b.nk AND a.p != b.p
    GROUP BY a.nk, a.p
), r2 AS (
    SELECT nk, pa, 2 + 2 * less + eq AS r2 FROM pairs
), rj AS (
    SELECT pa, CAST(sum(r2) AS BIGINT) AS r2j,
           CAST(count(*) AS BIGINT) AS nb
    FROM r2 GROUP BY pa
), fin AS (
    SELECT nb, CAST(count(*) AS BIGINT) AS k,
           CAST(sum(r2j * r2j) AS BIGINT) AS sum_r2sq
    FROM rj GROUP BY nb
)
SELECT nb AS n_blocks, k, {pround_sql(_FRIEDMAN_CHI2, 6)} AS chi2_r,
       k - 1 AS df
FROM fin
"""


SPECS.extend(
    [
        QuerySpec(
            "stream_sprt_ab",
            q_stream_sprt_ab,
            _sprt_sql(),
            ("streaming", "stats", "timeseries"),
            doc="LIVE SPRT: streaming day-grid aggregation (update mode, "
            "state = one row per day) + the shared bounded-grid readout; "
            "same oracle as the batch spec",
        ),
        QuerySpec(
            "logistic_irls_qty",
            q_logistic_irls_qty,
            _logistic_sql(),
            ("learning",),
            doc="Logistic P(return|qty) by 3 unrolled IRLS steps on the "
            "100-cell value grid; micro-quantized moments each step",
        ),
        QuerySpec(
            "friedman_nation_priority",
            q_friedman_nation_priority,
            _friedman_sql(),
            ("stats",),
            doc="Friedman blocked-rank test of priority effects across "
            "nation blocks; exact cross-multiplied fraction ranking",
        ),
    ]
)


# --------------------------------------------------------------------------
# Matrix profile on the daily series (bounded calendar-squared pair set)
# --------------------------------------------------------------------------
#
# STOMP-style matrix profile with window m=7 over the daily-revenue series:
# the top motif (closest non-overlapping window pair) and top discord
# (window farthest from its nearest neighbor). The pair set is
# calendar-BOUNDED (<= 366^2 window pairs x 7 lags), never corpus-sized:
# one corpus aggregate makes the day grid, a 7-row lag frame expands each
# window, and all distances come from exact BIGINT moments
# (D = m*Q - S^2, m*dot - S1*S2) with the z-normalized distance
# 2m(1 - r) micro-quantized before every argmin/argmax, so motif and
# discord are integer-exact decisions in both engines.

_MP_M = 7
_MP_DIST_MICRO = (
    f"CAST(floor(2.0 * {_MP_M}.0 * (1.0 - "
    "(CAST({m} * dot - s1 * s2 AS DOUBLE)"
    " / sqrt(CAST(d1v AS DOUBLE) * CAST(d2v AS DOUBLE))))"
    " * 1000000.0 + 0.5) AS BIGINT)".replace("{m}", str(_MP_M))
)


def q_matrix_profile_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matrix-profile motif + discord over daily revenue (module comment).
    Windows are indexed by row_number on the day grid (the series is
    daily-dense in this corpus); the exclusion zone |t1-t2| >= m keeps
    trivial matches out. Zero-variance windows are excluded (undefined
    z-normalized distance)."""
    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))).alias("d"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .groupBy("d")
        .agg(F.expr("CAST(sum(cents) AS BIGINT) DIV 100").alias("x"))
    )
    grid = daily.select(
        F.row_number().over(Window.orderBy("d")).alias("ts_i"), "x"
    )
    lags = spark.range(_MP_M).select(F.col("id").cast("int").alias("k"))
    el = (
        grid.crossJoin(F.broadcast(lags))
        .select((F.col("ts_i") - F.col("k")).alias("t"), "k", "x")
        .filter(F.col("t") >= 1)
    )
    nwin = grid.groupBy().agg((F.max("ts_i") - F.lit(_MP_M - 1)).alias("nw"))
    el = el.crossJoin(F.broadcast(nwin)).filter(F.col("t") <= F.col("nw")).drop("nw")
    mom = el.groupBy("t").agg(
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
    ).withColumn("dv", F.expr(f"{_MP_M} * q - s * s"))
    e1 = el.select(F.col("t").alias("t1"), "k", F.col("x").alias("x1"))
    e2 = el.select(F.col("t").alias("t2"), "k", F.col("x").alias("x2"))
    dots = (
        e1.join(e2, "k")
        .filter(F.abs(F.col("t1") - F.col("t2")) >= _MP_M)
        .groupBy("t1", "t2")
        .agg(F.sum(F.col("x1") * F.col("x2")).alias("dot"))
    )
    m1 = mom.select(
        F.col("t").alias("t1"), F.col("s").alias("s1"), F.col("dv").alias("d1v")
    )
    m2 = mom.select(
        F.col("t").alias("t2"), F.col("s").alias("s2"), F.col("dv").alias("d2v")
    )
    pairs = (
        dots.join(F.broadcast(m1), "t1")
        .join(F.broadcast(m2), "t2")
        .filter((F.col("d1v") > 0) & (F.col("d2v") > 0))
        .withColumn("dmicro", F.expr(_MP_DIST_MICRO))
    )
    motif = pairs.filter(F.col("t1") < F.col("t2")).orderBy(
        "dmicro", "t1", "t2"
    ).limit(1)
    prof = pairs.groupBy("t1").agg(F.min("dmicro").alias("nn"))
    discord = prof.orderBy(F.col("nn").desc(), F.col("t1").asc()).limit(1)
    return (
        motif.select(
            F.col("t1").alias("motif_t1"),
            F.col("t2").alias("motif_t2"),
            pround(F.expr("CAST(dmicro AS DOUBLE) / 1000000.0"), 4).alias(
                "motif_dist_r"
            ),
        )
        .crossJoin(
            discord.select(
                F.col("t1").alias("discord_t"),
                pround(F.expr("CAST(nn AS DOUBLE) / 1000000.0"), 4).alias(
                    "discord_dist_r"
                ),
            )
        )
    )


def _mp_sql() -> str:
    return f"""
WITH daily AS (
    SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               // 100 AS x
    FROM events GROUP BY 1
), grid AS (
    SELECT row_number() OVER (ORDER BY d) AS ts_i, x FROM daily
), nwin AS (
    SELECT max(ts_i) - {_MP_M - 1} AS nw FROM grid
), el AS (
    SELECT ts_i - k AS t, k, x
    FROM grid, unnest(generate_series(0, {_MP_M - 1})) AS g(k), nwin
    WHERE ts_i - k >= 1 AND ts_i - k <= nw
), mom AS (
    SELECT t, CAST(sum(x) AS BIGINT) AS s,
           CAST(sum(x * x) AS BIGINT) AS q,
           CAST({_MP_M} * sum(x * x) - sum(x) * sum(x) AS BIGINT) AS dv
    FROM el GROUP BY t
), dots AS (
    SELECT a.t AS t1, b.t AS t2, CAST(sum(a.x * b.x) AS BIGINT) AS dot
    FROM el a JOIN el b ON a.k = b.k AND abs(a.t - b.t) >= {_MP_M}
    GROUP BY a.t, b.t
), pairs AS (
    SELECT t1, t2,
           {_MP_DIST_MICRO} AS dmicro
    FROM dots
    JOIN (SELECT t AS t1, s AS s1, dv AS d1v FROM mom) USING (t1)
    JOIN (SELECT t AS t2, s AS s2, dv AS d2v FROM mom) USING (t2)
    WHERE d1v > 0 AND d2v > 0
), motif AS (
    SELECT t1 AS motif_t1, t2 AS motif_t2, dmicro
    FROM pairs WHERE t1 < t2 ORDER BY dmicro, t1, t2 LIMIT 1
), prof AS (
    SELECT t1, min(dmicro) AS nn FROM pairs GROUP BY t1
), discord AS (
    SELECT t1 AS discord_t, nn FROM prof ORDER BY nn DESC, t1 ASC LIMIT 1
)
SELECT motif_t1, motif_t2,
       {pround_sql('CAST(dmicro AS DOUBLE) / 1000000.0', 4)} AS motif_dist_r,
       discord_t,
       {pround_sql('CAST(nn AS DOUBLE) / 1000000.0', 4)} AS discord_dist_r
FROM motif, discord
"""


# --------------------------------------------------------------------------
# Cox proportional hazards (binary arm, Breslow ties, 3 Newton steps)
# --------------------------------------------------------------------------
#
# Time-to-convert survival model: subjects are users with a first view,
# the event is the first later purchase, censoring at the corpus horizon
# (max event date), arm x = hash64(user_id) % 2 — the same deterministic
# split ab_srm_guard audits. With a binary covariate the Breslow partial
# likelihood needs only (d0, d1, n0, n1) per event day: the subject frame
# collapses to the (duration, arm) grid in one aggregate, risk sets come
# from a bounded grid-x-grid non-equi join (dur >= tau — covering taus
# where an arm has no cell of its own), and each Newton step is a
# <= 366-row aggregate of micro-quantized score/info terms (the IRLS
# discipline above).

_COX_U = _q6(
    "CAST(d1 AS DOUBLE) - CAST(d0 + d1 AS DOUBLE) * CAST(n1 AS DOUBLE) * exp(b)"
    " / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE) * exp(b))"
)
_COX_I = _q6(
    "CAST(d0 + d1 AS DOUBLE) * CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) * exp(b)"
    " / ((CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE) * exp(b))"
    " * (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE) * exp(b)))"
)
_COX_STEPS = 3


def q_cox_ph_binary_newton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox PH hazard ratio between the two hash arms for time-to-purchase
    (module comment): one user-level aggregate, one (duration, arm) grid,
    risk sets from the bounded dur >= tau grid join, three unrolled Newton
    steps on the event-day grid. Output: subjects, events, beta, hazard
    ratio."""
    from projet_data_infrastructure_spark.functions.hashing import hash64

    ev = read_table(spark, sf_dir, "events")
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fv"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    conv = (
        fv.join(
            purch,
            (F.col("user_id") == F.col("pu")) & (F.col("pts") >= F.col("fv")),
            "left",
        )
        .groupBy("user_id", "fv")
        .agg(F.min("pts").alias("p"))
    )
    horizon = ev.groupBy().agg(F.max(F.to_date("ts")).alias("hz"))
    subj = conv.crossJoin(F.broadcast(horizon)).select(
        (hash64(F.col("user_id")) % 2).cast("int").alias("x"),
        F.datediff(
            F.coalesce(F.to_date("p"), F.col("hz")), F.to_date("fv")
        ).alias("dur"),
        F.col("p").isNotNull().cast("long").alias("ev"),
    )
    cells = subj.groupBy("dur", "x").agg(
        F.count(F.lit(1)).alias("c"), F.sum("ev").alias("de")
    )
    # Event-day grid and risk sets. The risk count n_x(tau) must cover
    # every subject with dur >= tau even when arm x has no cell at tau
    # itself, so it is a bounded non-equi join of the <= 366-row event-day
    # grid against the duration cells (grid x grid, never subjects).
    taudays = (
        cells.groupBy("dur")
        .agg(
            F.sum(F.when(F.col("x") == 0, F.col("de")).otherwise(0)).alias("d0"),
            F.sum(F.when(F.col("x") == 1, F.col("de")).otherwise(0)).alias("d1"),
        )
        .filter(F.col("d0") + F.col("d1") > 0)
        .select(F.col("dur").alias("tau"), "d0", "d1")
    )
    tau = (
        taudays.join(F.broadcast(cells), F.col("dur") >= F.col("tau"))
        .groupBy("tau", "d0", "d1")
        .agg(
            F.sum(F.when(F.col("x") == 0, F.col("c")).otherwise(0)).alias("n0"),
            F.sum(F.when(F.col("x") == 1, F.col("c")).otherwise(0)).alias("n1"),
        )
    )
    b = spark.range(1).select(F.lit(0.0).alias("b"))
    for _ in range(_COX_STEPS):
        sums = (
            tau.crossJoin(F.broadcast(b))
            .groupBy("b")
            .agg(
                F.sum(F.expr(_COX_U)).alias("u"),
                F.sum(F.expr(_COX_I)).alias("i"),
            )
        )
        b = sums.select(
            F.expr("b + CAST(u AS DOUBLE) / CAST(i AS DOUBLE)").alias("b")
        )
    stats = subj.groupBy().agg(
        F.count(F.lit(1)).alias("n_subj"), F.sum("ev").alias("n_events")
    )
    return stats.crossJoin(F.broadcast(b)).select(
        "n_subj",
        "n_events",
        pround(F.col("b"), 6).alias("beta_r"),
        pround(F.expr("exp(b)"), 6).alias("hr_r"),
    )


def _cox_sql() -> str:
    from projet_data_infrastructure_spark.functions.hashing import hash64_sql

    h = hash64_sql("user_id")
    steps = []
    for i in range(_COX_STEPS):
        steps.append(
            f""", s{i} AS (
    SELECT b, CAST(sum({_COX_U}) AS BIGINT) AS u,
           CAST(sum({_COX_I}) AS BIGINT) AS i
    FROM tau, bt{i} GROUP BY b
), bt{i + 1} AS (
    SELECT b + CAST(u AS DOUBLE) / CAST(i AS DOUBLE) AS b FROM s{i}
)"""
        )
    return f"""
WITH fv AS (
    SELECT user_id, min(ts) AS fv FROM events
    WHERE event_type = 'view' GROUP BY user_id
), conv AS (
    SELECT f.user_id, f.fv, min(e.ts) AS p
    FROM fv f LEFT JOIN events e
      ON e.user_id = f.user_id AND e.event_type = 'purchase' AND e.ts >= f.fv
    GROUP BY f.user_id, f.fv
), horizon AS (
    SELECT max(CAST(ts AS DATE)) AS hz FROM events
), subj AS (
    SELECT CAST({h} % 2 AS INT) AS x,
           datediff('day', CAST(fv AS DATE),
                    CAST(coalesce(CAST(p AS DATE), hz) AS DATE)) AS dur,
           CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END AS ev
    FROM conv, horizon
), cells AS (
    SELECT dur, x, CAST(count(*) AS BIGINT) AS c,
           CAST(sum(ev) AS BIGINT) AS de
    FROM subj GROUP BY dur, x
), taudays AS (
    SELECT dur AS tau,
           CAST(sum(CASE WHEN x = 0 THEN de ELSE 0 END) AS BIGINT) AS d0,
           CAST(sum(CASE WHEN x = 1 THEN de ELSE 0 END) AS BIGINT) AS d1
    FROM cells GROUP BY dur
    HAVING sum(de) > 0
), tau AS (
    SELECT tau, d0, d1,
           CAST(sum(CASE WHEN x = 0 THEN c ELSE 0 END) AS BIGINT) AS n0,
           CAST(sum(CASE WHEN x = 1 THEN c ELSE 0 END) AS BIGINT) AS n1
    FROM taudays JOIN cells ON dur >= tau
    GROUP BY tau, d0, d1
), bt0 AS (SELECT 0.0 AS b){''.join(steps)}, stats AS (
    SELECT CAST(count(*) AS BIGINT) AS n_subj,
           CAST(sum(ev) AS BIGINT) AS n_events
    FROM subj
)
SELECT n_subj, n_events, {pround_sql('b', 6)} AS beta_r,
       {pround_sql('exp(b)', 6)} AS hr_r
FROM stats, bt{_COX_STEPS}
"""


SPECS.extend(
    [
        QuerySpec(
            "matrix_profile_daily",
            q_matrix_profile_daily,
            _mp_sql(),
            ("timeseries", "bench"),
            doc="Matrix-profile motif + discord (m=7) on daily revenue; "
            "exact BIGINT window moments, micro-quantized z-distances",
        ),
        QuerySpec(
            "cox_ph_binary_newton",
            q_cox_ph_binary_newton,
            _cox_sql(),
            ("stats", "learning", "timeseries", "bench"),
            doc="Cox PH hazard ratio between hash arms for time-to-purchase; "
            "Breslow ties, bounded-grid risk sets, 3 Newton steps",
        ),
    ]
)


# --------------------------------------------------------------------------
# Mantel–Haenszel stratified odds ratio + CMH test (nation strata)
# --------------------------------------------------------------------------
#
# Exposure = urgent order (priority 1-2), outcome = any lineitem returned,
# strata = customer nation: the confounding-adjusted association readout
# every experimentation/epidemiology pipeline runs where a pooled 2x2
# would Simpson-flip. One order-level aggregate, then a 25-stratum 2x2
# grid; the per-stratum a*d/n, b*c/n, E and V terms are micro-quantized
# before the stratum sums (the chisq discipline); the (a+b)(c+d)(a+c)(b+d)
# variance product goes through DOUBLE (it passes int64 near 1e6-row
# strata) — deterministically, as both engines convert the same BIGINTs.

_MH_NUM = _q6("CAST(a AS DOUBLE) * CAST(d AS DOUBLE) / CAST(n AS DOUBLE)")
_MH_DEN = _q6("CAST(b AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE)")
_MH_E = _q6(
    "CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE) / CAST(n AS DOUBLE)"
)
_MH_V = _q6(
    "CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE) * CAST(a + c AS DOUBLE)"
    " * CAST(b + d AS DOUBLE)"
    " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))"
)
_CMH_CHI2 = (
    "((abs(CAST(sa AS DOUBLE) - CAST(se AS DOUBLE) / 1000000.0) - 0.5)"
    " * (abs(CAST(sa AS DOUBLE) - CAST(se AS DOUBLE) / 1000000.0) - 0.5)"
    " / (CAST(sv AS DOUBLE) / 1000000.0))"
)


def q_mantel_haenszel_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel–Haenszel common odds ratio and the continuity-corrected CMH
    chi-square across nation strata (module comment). Output: strata count,
    MH odds ratio, CMH chi2 and its df=1 p-value (P(chi2>x) = 2*P(Z>sqrt x),
    the shared Zelen-Severo tree)."""
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_custkey").alias("ck"),
        (F.substring("o_orderpriority", 1, 1).cast("int") <= 2)
        .cast("int")
        .alias("e"),
    )
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"), F.col("c_nationkey").alias("nk")
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"),
        (F.col("l_returnflag") == "R").cast("int").alias("ret"),
    )
    per_order = li.groupBy("ok").agg(F.max("ret").alias("y"))
    t22 = (
        per_order.join(o, "ok")
        .join(F.broadcast(c), "ck")
        .groupBy("nk")
        .agg(
            F.sum(((F.col("e") == 1) & (F.col("y") == 1)).cast("long")).alias("a"),
            F.sum(((F.col("e") == 1) & (F.col("y") == 0)).cast("long")).alias("b"),
            F.sum(((F.col("e") == 0) & (F.col("y") == 1)).cast("long")).alias("c"),
            F.sum(((F.col("e") == 0) & (F.col("y") == 0)).cast("long")).alias("d"),
        )
        .withColumn("n", F.expr("a + b + c + d"))
        .filter(F.col("n") > 1)
    )
    agg = t22.groupBy().agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum("a").alias("sa"),
        F.sum(F.expr(_MH_NUM)).alias("snum"),
        F.sum(F.expr(_MH_DEN)).alias("sden"),
        F.sum(F.expr(_MH_E)).alias("se"),
        F.sum(F.expr(_MH_V)).alias("sv"),
    )
    fin = agg.withColumn("chi2", F.expr(_CMH_CHI2))
    return fin.select(
        "n_strata",
        pround(F.expr("CAST(snum AS DOUBLE) / CAST(sden AS DOUBLE)"), 6).alias(
            "or_mh_r"
        ),
        pround(F.col("chi2"), 6).alias("chi2_cmh_r"),
        pround(F.expr(two_sided_p_sql("sqrt(chi2)")), 8).alias("p_r"),
    )


def _mh_sql() -> str:
    return f"""
WITH per_order AS (
    SELECT l_orderkey AS ok, max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
           AS y
    FROM lineitem GROUP BY 1
), t22 AS (
    SELECT c_nationkey AS nk,
        CAST(sum(CASE WHEN CAST(substr(o_orderpriority,1,1) AS INT) <= 2
                       AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        CAST(sum(CASE WHEN CAST(substr(o_orderpriority,1,1) AS INT) <= 2
                       AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        CAST(sum(CASE WHEN CAST(substr(o_orderpriority,1,1) AS INT) > 2
                       AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        CAST(sum(CASE WHEN CAST(substr(o_orderpriority,1,1) AS INT) > 2
                       AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
    FROM per_order
    JOIN orders ON ok = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
), t22n AS (
    SELECT *, a + b + c + d AS n FROM t22 WHERE a + b + c + d > 1
), agg AS (
    SELECT CAST(count(*) AS BIGINT) AS n_strata,
           CAST(sum(a) AS BIGINT) AS sa,
           CAST(sum({_MH_NUM}) AS BIGINT) AS snum,
           CAST(sum({_MH_DEN}) AS BIGINT) AS sden,
           CAST(sum({_MH_E}) AS BIGINT) AS se,
           CAST(sum({_MH_V}) AS BIGINT) AS sv
    FROM t22n
), fin AS (
    SELECT n_strata, snum, sden, {_CMH_CHI2} AS chi2 FROM agg
)
SELECT n_strata,
       {pround_sql('CAST(snum AS DOUBLE) / CAST(sden AS DOUBLE)', 6)} AS or_mh_r,
       {pround_sql('chi2', 6)} AS chi2_cmh_r,
       {pround_sql(two_sided_p_sql('sqrt(chi2)'), 8)} AS p_r
FROM fin
"""


# --------------------------------------------------------------------------
# Bigram entropy rate (corpus predictability, nano-quantized term sums)
# --------------------------------------------------------------------------

_BER_TERM = (
    "CAST(floor(-(CAST(c AS DOUBLE) / CAST(nb AS DOUBLE))"
    " * ln(CAST(c AS DOUBLE) / CAST(cw1 AS DOUBLE)) * 1000000000.0 + 0.5)"
    " AS BIGINT)"
)


def q_bigram_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional bigram entropy rate H(w2|w1) of the documents corpus and
    its perplexity — the predictability readout next to the Kneser-Ney LM:
    H = -sum p(w1,w2) ln p(w2|w1), each term nano-quantized so the
    vocabulary-sized sum is an exact BIGINT in any order (scale-safe: the
    type table shuffles on token keys, nothing is collected)."""
    from projet_data_infrastructure_spark.operators.text import tokens

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(tokens(F.col("text")).alias("t")).filter(F.size("t") >= 2)
    bg = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    types = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    fwd = types.groupBy("w1").agg(F.sum("c").alias("cw1"))
    tot = types.groupBy().agg(
        F.sum("c").alias("nb"), F.count(F.lit(1)).alias("n_types")
    )
    h = (
        types.join(fwd, "w1")
        .crossJoin(F.broadcast(tot))
        .groupBy("nb", "n_types")
        .agg(F.sum(F.expr(_BER_TERM)).alias("h_nano"))
    )
    return h.select(
        F.col("nb").alias("n_bigrams"),
        "n_types",
        pround(F.expr("CAST(h_nano AS DOUBLE) / 1000000000.0"), 6).alias("h_rate_r"),
        pround(F.expr("exp(CAST(h_nano AS DOUBLE) / 1000000000.0)"), 4).alias(
            "ppl_r"
        ),
    )


def _ber_sql() -> str:
    return f"""
WITH toks AS (
    SELECT list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '') AS t
    FROM documents
), bg AS (
    SELECT t[i] AS w1, t[i + 1] AS w2
    FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i)
    WHERE len(t) >= 2
), types AS (
    SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY w1, w2
), fwd AS (
    SELECT w1, CAST(sum(c) AS BIGINT) AS cw1 FROM types GROUP BY w1
), tot AS (
    SELECT CAST(sum(c) AS BIGINT) AS nb,
           CAST(count(*) AS BIGINT) AS n_types
    FROM types
), h AS (
    SELECT nb, n_types, CAST(sum({_BER_TERM}) AS BIGINT) AS h_nano
    FROM types JOIN fwd USING (w1), tot
    GROUP BY nb, n_types
)
SELECT nb AS n_bigrams, n_types,
       {pround_sql('CAST(h_nano AS DOUBLE) / 1000000000.0', 6)} AS h_rate_r,
       {pround_sql('exp(CAST(h_nano AS DOUBLE) / 1000000000.0)', 4)} AS ppl_r
FROM h
"""


SPECS.extend(
    [
        QuerySpec(
            "mantel_haenszel_or",
            q_mantel_haenszel_or,
            _mh_sql(),
            ("stats",),
            doc="Mantel-Haenszel common OR + continuity-corrected CMH chi2 "
            "across nation strata; micro-quantized stratum terms",
        ),
        QuerySpec(
            "bigram_entropy_rate",
            q_bigram_entropy_rate,
            _ber_sql(),
            ("llm", "bench"),
            doc="Conditional bigram entropy rate + perplexity of the corpus; "
            "nano-quantized vocabulary-sized term sums",
        ),
    ]
)


# --------------------------------------------------------------------------
# LIVE streaming HDR sketch (mergeable quantiles under Structured Streaming)
# --------------------------------------------------------------------------


def q_stream_hdr_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HDR quantile sketch running LIVE over the event-value stream:
    a streaming groupBy(idx) count in update mode IS the sketch — state is
    one row per occupied bucket (a few hundred, regardless of volume) and
    partial emissions merge by taking each bucket's LATEST count (counts
    are monotone across micro-batches, so max == latest), exactly how
    per-executor partial histograms merge by addition in the batch plan.
    The shared :func:`_hdr_readout` then produces the same bounded-grid
    readout, hash-checked against a DuckDB replay of the whole stream."""
    from projet_data_infrastructure_spark.plans.events_queries import (
        _events_stream,
        _run_stream,
    )

    stream = _events_stream(spark, sf_dir).select(
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents")
    )
    counts = (
        stream.select(F.expr(_HDR_IDX).alias("idx"))
        .groupBy("idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    table = _run_stream(
        counts.writeStream.outputMode("update"), spark, "stream_hdr_sink"
    )
    hist = table.groupBy("idx").agg(F.max("cnt").alias("cnt"))
    return _hdr_readout(hist)


# --------------------------------------------------------------------------
# Two-sample Cramér–von Mises (integer ECDF-difference accumulation)
# --------------------------------------------------------------------------
#
# T = nA*nB/N^2 * sum over pooled observations of (F_A - F_B)^2. The
# integer form t_v * (nB*cumA - nA*cumB)^2 is exact but its inner products
# wrap int64 near sf2000 and the squared term exceeds even DECIMAL(38,0)
# beyond that (ADVICE r10), so the accumulation works in the NORMALIZED
# domain instead: each grid row's t_v * (cumA/nA - cumB/nB)^2 <= t_v is
# nano-quantized through the wide cast-quantizer (the _BG_TERM_MICRO
# discipline — identical expression text on both engines, so the double
# trees match bit-for-bit) and summed DECIMAL(38,0); the sum is <= N*1e9
# ~ 6e20 at sf100k, far inside the 10^38 envelope. The 1e-9 grid noise is
# ~1e3x below the pround(6) output resolution.

_CVM_NANO_TERM = (
    "CAST(CAST(ta + tb AS DOUBLE)"
    " * (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)"
    " - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))"
    " * (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)"
    " - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))"
    " * 1000000000.0 + 0.00001 AS DECIMAL(38,0))"
)
_CVM_T = (
    "(CAST(num AS DOUBLE) / 1000000000.0"
    " * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)"
    " / ((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))"
    " * (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))))"
)
_CVM_EXPECT = (
    "((1.0 + 1.0 / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))) / 6.0)"
)


def q_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér–von Mises statistic between the A and R quantity
    distributions — the omnibus ECDF-difference companion to the KS drift
    statistic (`ks_drift_statistic` weighs the max gap; CvM integrates all
    of it). Nano-quantized normalized ECDF-difference numerator on the
    ≤ 50-row pooled value grid (module comment — wide-safe to 10^38); the
    null expectation (1+1/N)/6 ships alongside so the readout is
    self-calibrating."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("v")
    )
    grid = (
        li.filter(F.col("l_returnflag").isin("A", "R"))
        .groupBy("v")
        .agg(
            F.sum((F.col("l_returnflag") == "A").cast("long")).alias("ta"),
            F.sum((F.col("l_returnflag") == "R").cast("long")).alias("tb"),
        )
    )
    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = grid.select(
        "v",
        "ta",
        "tb",
        F.sum("ta").over(wcum).alias("ca"),
        F.sum("tb").over(wcum).alias("cb"),
    )
    tot = grid.groupBy().agg(F.sum("ta").alias("na"), F.sum("tb").alias("nb"))
    num = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("na", "nb")
        .agg(
            F.sum(F.expr(_CVM_NANO_TERM)).cast("decimal(38,0)").alias("num")
        )
    )
    return num.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        pround(F.expr(_CVM_T), 6).alias("t_r"),
        pround(F.expr(_CVM_EXPECT), 6).alias("t_null_mean_r"),
    )


_CVM_SQL = f"""
WITH li AS (
    SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v
    FROM lineitem WHERE l_returnflag IN ('A', 'R')
), grid AS (
    SELECT v,
           CAST(sum(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ta,
           CAST(sum(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS tb
    FROM li GROUP BY v
), cum AS (
    SELECT v, ta, tb,
           CAST(sum(ta) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
           CAST(sum(tb) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cb
    FROM grid
), tot AS (
    SELECT CAST(sum(ta) AS BIGINT) AS na, CAST(sum(tb) AS BIGINT) AS nb
    FROM grid
), numer AS (
    SELECT na, nb,
           CAST(sum({_CVM_NANO_TERM}) AS DECIMAL(38,0)) AS num
    FROM cum, tot GROUP BY na, nb
)
SELECT na AS n_a, nb AS n_b,
       {pround_sql(_CVM_T, 6)} AS t_r,
       {pround_sql(_CVM_EXPECT, 6)} AS t_null_mean_r
FROM numer
"""


SPECS.extend(
    [
        QuerySpec(
            "stream_hdr_quantiles",
            q_stream_hdr_quantiles,
            _hdr_sql(
                "SELECT CAST(floor(value * 100 + 0.5) AS BIGINT)"
                " AS cents FROM events"
            ),
            ("streaming", "sketch"),
            doc="LIVE HDR quantile sketch: streaming bucket counts (state = "
            "occupied buckets), shared bounded-grid readout vs a full DuckDB "
            "replay of the stream",
        ),
        QuerySpec(
            "cramer_von_mises",
            q_cramer_von_mises,
            _CVM_SQL,
            ("stats",),
            doc="Two-sample Cramer-von Mises on the A/R quantity grids; "
            "exact 128-bit ECDF-difference numerator, self-calibrating",
        ),
    ]
)


# --------------------------------------------------------------------------
# Day-grid diagnostics: runs test, Durbin–Watson, Ljung–Box
# --------------------------------------------------------------------------
#
# Three classical serial-structure diagnostics, all on the calendar-bounded
# daily-revenue grid (one corpus aggregate each): randomness of the
# above/below-median sign sequence (Wald–Wolfowitz runs), first-order
# residual autocorrelation of the linear trend fit (Durbin–Watson), and
# joint autocorrelation at lags 1..7 (Ljung–Box). Exactness: signs compare
# 2x against the exact doubled median; DW residual terms are micro-
# quantized from exact OLS moment formulas; Ljung–Box autocorrelations are
# EXACT integer ratios via the scaled deviations d_t = n*x_t - S (the n
# factors cancel in r_k = sum d_t d_{t+k} / sum d_t^2), accumulated
# 128-bit.

_RUNS_MU = "(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE) + 1.0)"
_RUNS_VAR = (
    "(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)"
    " * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)"
    " - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE))"
    " / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)"
    " * (CAST(n1 + n2 AS DOUBLE) - 1.0)))"
)
_RUNS_Z = f"((CAST(r AS DOUBLE) - {_RUNS_MU}) / sqrt({_RUNS_VAR}))"


def q_runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test of randomness on the daily-revenue sign
    sequence (above/below the exact median; ties at the median dropped,
    the standard convention). Doubled-median comparison keeps the sign an
    integer decision; runs counted by one lag on the day grid."""
    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))).alias("d"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").alias("x"))
    )
    byval = daily.select("d", "x", F.row_number().over(Window.orderBy("x", "d")).alias("rk"))
    nn = daily.groupBy().agg(F.count(F.lit(1)).alias("n"))
    med = (
        byval.crossJoin(F.broadcast(nn))
        .groupBy()
        .agg(
            (
                F.min(F.when(F.col("rk") == F.expr("(n + 1) DIV 2"), F.col("x")))
                + F.min(F.when(F.col("rk") == F.expr("n DIV 2 + 1"), F.col("x")))
            ).alias("m2")
        )
    )
    signed = (
        daily.crossJoin(F.broadcast(med))
        .filter(2 * F.col("x") != F.col("m2"))
        .select("d", (2 * F.col("x") > F.col("m2")).cast("int").alias("s"))
    )
    lagged = signed.select(
        "s", F.lag("s").over(Window.orderBy("d")).alias("prev")
    )
    agg = lagged.groupBy().agg(
        F.sum(F.col("s")).alias("n1"),
        F.sum(1 - F.col("s")).alias("n2"),
        (
            1
            + F.sum(
                (F.col("prev").isNotNull() & (F.col("s") != F.col("prev"))).cast(
                    "long"
                )
            )
        ).alias("r"),
    )
    return agg.select(
        "n1",
        "n2",
        "r",
        pround(F.expr(_RUNS_Z), 6).alias("z_r"),
        pround(F.expr(two_sided_p_sql(_RUNS_Z)), 8).alias("p_r"),
    )


_RUNS_SQL = f"""
WITH daily AS (
    SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
    FROM events GROUP BY 1
), byval AS (
    SELECT d, x, row_number() OVER (ORDER BY x, d) AS rk FROM daily
), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily), med AS (
    SELECT min(CASE WHEN rk = (n + 1) // 2 THEN x END)
           + min(CASE WHEN rk = n // 2 + 1 THEN x END) AS m2
    FROM byval, nn
), signed AS (
    SELECT d, CASE WHEN 2 * x > m2 THEN 1 ELSE 0 END AS s
    FROM daily, med WHERE 2 * x != m2
), lagged AS (
    SELECT s, lag(s) OVER (ORDER BY d) AS prev FROM signed
), agg AS (
    SELECT CAST(sum(s) AS BIGINT) AS n1,
           CAST(sum(1 - s) AS BIGINT) AS n2,
           CAST(1 + sum(CASE WHEN prev IS NOT NULL AND s != prev
                             THEN 1 ELSE 0 END) AS BIGINT) AS r
    FROM lagged
)
SELECT n1, n2, r, {pround_sql(_RUNS_Z, 6)} AS z_r,
       {pround_sql(two_sided_p_sql(_RUNS_Z), 8)} AS p_r
FROM agg
"""


_DW_B = (
    "((CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)"
    " - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)"
    " - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)))"
)
_DW_A = f"((CAST(sy AS DOUBLE) - {_DW_B} * CAST(st AS DOUBLE)) / CAST(n AS DOUBLE))"
_DW_RESID = f"(CAST(x AS DOUBLE) - {_DW_A} - {_DW_B} * CAST(t AS DOUBLE))"


def q_durbin_watson_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin–Watson first-order autocorrelation diagnostic on the
    residuals of the daily-revenue linear trend: OLS (a, b) from exact
    BIGINT moments in one shared double tree, residuals and their lagged
    differences on the day grid, numerator/denominator terms micro-
    quantized before the grid sums. DW ~ 2(1 - rho1)."""
    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))).alias("d"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .groupBy("d")
        .agg(F.expr("CAST(sum(cents) AS BIGINT) DIV 100").alias("x"))
    )
    seq = daily.select(
        "x", F.row_number().over(Window.orderBy("d")).alias("t")
    )
    mom = seq.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("st"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum("x").alias("sy"),
        F.sum(F.col("t") * F.col("x")).alias("sty"),
    )
    res = seq.crossJoin(F.broadcast(mom)).select(
        "t", F.expr(_DW_RESID).alias("e")
    )
    lagged = res.select(
        "e", F.lag("e").over(Window.orderBy("t")).alias("ep")
    )
    # cast-quantizer, not floor(): Spark floor(DOUBLE) saturates at 2^63
    # and the e^2 micro terms reach ~1e22 at sf100 (the ansari_bradley
    # lesson); both engines' double->wide cast rounds half-away for
    # positive x, exact to 10^38.
    agg = lagged.groupBy().agg(
        F.sum(F.expr("CAST(e * e * 1000000.0 AS DECIMAL(38,0))")).alias(
            "den_micro"
        ),
        F.sum(
            F.expr(
                "CASE WHEN ep IS NULL THEN CAST(0 AS DECIMAL(38,0)) ELSE"
                " CAST((e - ep) * (e - ep) * 1000000.0 AS DECIMAL(38,0)) END"
            )
        ).alias("num_micro"),
    )
    return agg.select(
        pround(
            F.expr("CAST(num_micro AS DOUBLE) / CAST(den_micro AS DOUBLE)"), 6
        ).alias("dw_r")
    )


_DW_SQL = f"""
WITH daily AS (
    SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               // 100 AS x
    FROM events GROUP BY 1
), seq AS (
    SELECT x, row_number() OVER (ORDER BY d) AS t FROM daily
), mom AS (
    SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(t) AS BIGINT) AS st,
           CAST(sum(t * t) AS BIGINT) AS stt, CAST(sum(x) AS BIGINT) AS sy,
           CAST(sum(t * x) AS BIGINT) AS sty
    FROM seq
), res AS (
    SELECT t, {_DW_RESID} AS e FROM seq, mom
), lagged AS (
    SELECT e, lag(e) OVER (ORDER BY t) AS ep FROM res
), agg AS (
    SELECT CAST(sum(CAST(e * e * 1000000.0 AS HUGEINT)) AS HUGEINT)
               AS den_micro,
           CAST(sum(CASE WHEN ep IS NULL THEN CAST(0 AS HUGEINT)
                    ELSE CAST((e - ep) * (e - ep) * 1000000.0 AS HUGEINT)
                    END) AS HUGEINT) AS num_micro
    FROM lagged
)
SELECT {pround_sql('CAST(num_micro AS DOUBLE) / CAST(den_micro AS DOUBLE)', 6)}
           AS dw_r
FROM agg
"""

_LB_LAGS = 7


def q_ljung_box_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box portmanteau Q over lags 1..7 of the daily-revenue series.
    Autocorrelations are EXACT integer ratios: with d_t = n*x_t - S (the
    scaled deviation), r_k = sum d_t*d_{t+k} / sum d_t^2 — the n factors
    cancel — accumulated DECIMAL(38,0)/HUGEINT; each r_k^2/(n-k) term is
    micro-quantized before the 7-term fold. Q ~ chi2(7) under the null."""
    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))).alias("d"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .groupBy("d")
        .agg(F.expr("CAST(sum(cents) AS BIGINT) DIV 100").alias("x"))
    )
    seq = daily.select("x", F.row_number().over(Window.orderBy("d")).alias("t"))
    mom = seq.groupBy().agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"))
    dev = seq.crossJoin(F.broadcast(mom)).select(
        "t", "n", (F.col("n") * F.col("x") - F.col("s")).alias("dv")
    )
    den = dev.groupBy("n").agg(
        F.sum(
            F.expr("CAST(dv AS DECIMAL(19,0)) * CAST(dv AS DECIMAL(19,0))")
        ).cast("decimal(38,0)").alias("den")
    )
    lags = spark.range(1, _LB_LAGS + 1).select(F.col("id").cast("int").alias("k"))
    a = dev.select(F.col("t").alias("t1"), F.col("dv").alias("d1"))
    b = dev.select(F.col("t").alias("t2"), F.col("dv").alias("d2"))
    nums = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("t2") == F.col("t1") + F.col("k"))
        .groupBy("k")
        .agg(
            F.sum(
                F.expr("CAST(d1 AS DECIMAL(19,0)) * CAST(d2 AS DECIMAL(19,0))")
            ).cast("decimal(38,0)").alias("num")
        )
    )
    term = _q6(
        "(CAST(num AS DOUBLE) / CAST(den AS DOUBLE))"
        " * (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))"
        " / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))"
    )
    qsum = (
        nums.crossJoin(F.broadcast(den))
        .groupBy("n")
        .agg(F.sum(F.expr(term)).alias("q_micro"))
    )
    return qsum.select(
        "n",
        F.lit(_LB_LAGS).cast("int").alias("df"),
        pround(
            F.expr(
                "CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0)"
                " * CAST(q_micro AS DOUBLE) / 1000000.0"
            ),
            4,
        ).alias("q_r"),
    )


def _lb_sql() -> str:
    term = _q6(
        "(CAST(num AS DOUBLE) / CAST(den AS DOUBLE))"
        " * (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))"
        " / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))"
    )
    return f"""
WITH daily AS (
    SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               // 100 AS x
    FROM events GROUP BY 1
), seq AS (
    SELECT x, row_number() OVER (ORDER BY d) AS t FROM daily
), mom AS (
    SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s FROM seq
), dev AS (
    SELECT t, n, CAST(n * x - s AS BIGINT) AS dv FROM seq, mom
), den AS (
    SELECT n, CAST(sum(CAST(dv AS HUGEINT) * CAST(dv AS HUGEINT)) AS HUGEINT)
               AS den
    FROM dev GROUP BY n
), nums AS (
    SELECT k, CAST(sum(CAST(a.dv AS HUGEINT) * CAST(b.dv AS HUGEINT))
               AS HUGEINT) AS num
    FROM dev a
    JOIN unnest(generate_series(1, {_LB_LAGS})) AS g(k) ON true
    JOIN dev b ON b.t = a.t + k
    GROUP BY k
), qsum AS (
    SELECT n, CAST(sum({term}) AS BIGINT) AS q_micro
    FROM nums, den GROUP BY n
)
SELECT n, CAST({_LB_LAGS} AS INT) AS df,
       {pround_sql(
           'CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0)'
           ' * CAST(q_micro AS DOUBLE) / 1000000.0', 4)} AS q_r
FROM qsum
"""


SPECS.extend(
    [
        QuerySpec(
            "runs_test_daily",
            q_runs_test_daily,
            _RUNS_SQL,
            ("stats", "timeseries"),
            doc="Wald-Wolfowitz runs test on the above/below-median daily "
            "sign sequence; doubled-median integer signs",
        ),
        QuerySpec(
            "durbin_watson_daily",
            q_durbin_watson_daily,
            _DW_SQL,
            ("stats", "timeseries"),
            doc="Durbin-Watson on daily linear-trend residuals; exact OLS "
            "moments, micro-quantized residual terms",
        ),
        QuerySpec(
            "ljung_box_q",
            q_ljung_box_q,
            _lb_sql(),
            ("stats", "timeseries"),
            doc="Ljung-Box Q over lags 1..7; exact integer autocorrelation "
            "ratios via scaled deviations n*x - S",
        ),
    ]
)


# --------------------------------------------------------------------------
# Personalized PageRank (seed-restricted teleport, integer fixed point)
# --------------------------------------------------------------------------

_PPR_ITERS = 3


def q_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank on the customer–supplier trade graph with the
    teleport restricted to a seed set (nation-0 customers) — the
    recommendation / related-entity query that global `pagerank_fixed_point`
    cannot answer. Same plan shape per iteration (emission table broadcast
    into the edge join, one destination aggregate, edges never shuffled;
    `graph_geo.vertex_side` size-switch applies) and the same all-integer
    rank arithmetic, so the result hash-matches the unrolled-CTE oracle
    exactly. Seeds get the 15% teleport mass; non-seeds accumulate only
    propagated rank, so scores measure proximity to the seed cohort."""
    from projet_data_infrastructure_spark.plans.graph_geo import (
        _trade_edges,
        vertex_side,
    )

    edges = _trade_edges(spark, sf_dir)
    seeds = read_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey") == 0
    ).select((F.col("c_custkey") * 2).cast("long").alias("node"))
    deg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("degree"))
        .join(seeds, F.col("src") == F.col("node"), "left")
        .select(
            "src", "degree", F.col("node").isNotNull().cast("int").alias("seed")
        )
        .localCheckpoint()
    )
    n_vertices = deg.count()
    ranks = deg.select(
        F.col("src").alias("node"),
        "degree",
        "seed",
        (F.col("seed") * F.lit(1_000_000)).cast("long").alias("ppr"),
    )
    for _ in range(_PPR_ITERS):
        emit = ranks.select("node", F.expr("ppr DIV degree").alias("c"))
        contrib = (
            edges.join(vertex_side(emit, n_vertices), edges.src == emit.node)
            .groupBy("dst")
            .agg(F.sum("c").alias("inc"))
        )
        ranks = deg.join(
            vertex_side(contrib, n_vertices), deg.src == contrib.dst, "left"
        ).select(
            F.col("src").alias("node"),
            "degree",
            "seed",
            (
                F.col("seed") * F.lit(150_000)
                + F.expr("(85 * coalesce(inc, CAST(0 AS BIGINT))) DIV 100")
            )
            .cast("long")
            .alias("ppr"),
        )
    label = F.concat(
        F.when(F.col("node") % 2 == 0, F.lit("c")).otherwise(F.lit("s")),
        F.expr("node DIV 2").cast("string"),
    )
    return (
        ranks.select(label.alias("node"), "seed", "ppr")
        .orderBy(F.desc("ppr"), F.asc("node"))
        .limit(20)
    )


def _ppr_oracle() -> str:
    head = """
WITH e0 AS (
    SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
edges AS (
    SELECT CAST(ck * 2 AS BIGINT) AS src, CAST(sk * 2 + 1 AS BIGINT) AS dst FROM e0
    UNION ALL
    SELECT CAST(sk * 2 + 1 AS BIGINT) AS src, CAST(ck * 2 AS BIGINT) AS dst FROM e0
),
seedset AS (
    SELECT CAST(c_custkey * 2 AS BIGINT) AS node FROM customer
    WHERE c_nationkey = 0
),
deg AS (
    SELECT src, CAST(count(*) AS BIGINT) AS degree,
           CASE WHEN src IN (SELECT node FROM seedset) THEN 1 ELSE 0 END AS seed
    FROM edges GROUP BY src
),
r0 AS (
    SELECT src AS node, degree, seed,
           CAST(seed * 1000000 AS BIGINT) AS ppr
    FROM deg
)
"""
    steps = []
    for i in range(1, _PPR_ITERS + 1):
        steps.append(
            f""",
c{i} AS (
    SELECT e.dst AS node, CAST(SUM(r.ppr // r.degree) AS BIGINT) AS inc
    FROM edges e JOIN r{i - 1} r ON e.src = r.node
    GROUP BY e.dst
),
r{i} AS (
    SELECT d.src AS node, d.degree, d.seed,
           CAST(d.seed * 150000 + (85 * COALESCE(c.inc, 0)) // 100 AS BIGINT)
               AS ppr
    FROM deg d LEFT JOIN c{i} c ON d.src = c.node
)"""
        )
    tail = f"""
SELECT CASE WHEN node % 2 = 0 THEN 'c' || CAST(node // 2 AS VARCHAR)
            ELSE 's' || CAST(node // 2 AS VARCHAR) END AS node,
       seed, ppr
FROM r{_PPR_ITERS}
ORDER BY ppr DESC,
         CASE WHEN node % 2 = 0 THEN 'c' || CAST(node // 2 AS VARCHAR)
              ELSE 's' || CAST(node // 2 AS VARCHAR) END ASC
LIMIT 20
"""
    return head + "".join(steps) + tail


SPECS.append(
    QuerySpec(
        "personalized_pagerank",
        q_personalized_pagerank,
        _ppr_oracle(),
        ("graph",),
        doc="Personalized PageRank with teleport restricted to nation-0 "
        "customers; same broadcast-emission integer fixed point as the "
        "global spec, unrolled-CTE oracle",
    )
)


# --------------------------------------------------------------------------
# Poisson rate-ratio test (two-arm daily event rates)
# --------------------------------------------------------------------------

_RR_Z = (
    "((ln(CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE))"
    " - ln(CAST(e1 AS DOUBLE) / CAST(e0 AS DOUBLE)))"
    " / sqrt(1.0 / CAST(c1 AS DOUBLE) + 1.0 / CAST(c0 AS DOUBLE)))"
)
_RR = (
    "((CAST(c1 AS DOUBLE) / CAST(e1 AS DOUBLE))"
    " / (CAST(c0 AS DOUBLE) / CAST(e0 AS DOUBLE)))"
)


def q_poisson_rate_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-arm Poisson rate-ratio test on purchase events: arm = the hash
    split `ab_srm_guard` audits, exposure = user-days at risk (users in
    the arm × observed days), ln-rate-ratio z with the standard 1/c1+1/c0
    variance — the count-data companion to `mantel_haenszel_or` (binary
    outcomes) and `sprt_ab_decision` (sequential). One corpus aggregate;
    every input to the shared double tree is an exact BIGINT."""
    from projet_data_infrastructure_spark.functions.hashing import hash64

    ev = read_table(spark, sf_dir, "events")
    armed = ev.select(
        (hash64(F.col("user_id")) % 2).cast("int").alias("arm"),
        "user_id",
        (F.col("event_type") == "purchase").cast("long").alias("conv"),
        F.to_date("ts").alias("day"),
    )
    per_arm = armed.groupBy("arm").agg(
        F.sum("conv").alias("c"),
        (F.countDistinct("user_id") * F.countDistinct("day")).alias("e"),
    )
    wide = per_arm.groupBy().agg(
        F.max(F.when(F.col("arm") == 0, F.col("c"))).alias("c0"),
        F.max(F.when(F.col("arm") == 1, F.col("c"))).alias("c1"),
        F.max(F.when(F.col("arm") == 0, F.col("e"))).alias("e0"),
        F.max(F.when(F.col("arm") == 1, F.col("e"))).alias("e1"),
    )
    return wide.select(
        "c0",
        "c1",
        "e0",
        "e1",
        pround(F.expr(_RR), 6).alias("rate_ratio_r"),
        pround(F.expr(_RR_Z), 6).alias("z_r"),
        pround(F.expr(two_sided_p_sql(_RR_Z)), 8).alias("p_r"),
    )


def _rr_sql() -> str:
    from projet_data_infrastructure_spark.functions.hashing import hash64_sql

    h = hash64_sql("user_id")
    return f"""
WITH armed AS (
    SELECT CAST({h} % 2 AS INT) AS arm, user_id,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv,
           CAST(ts AS DATE) AS day
    FROM events
), per_arm AS (
    SELECT arm, CAST(sum(conv) AS BIGINT) AS c,
           CAST(count(DISTINCT user_id) * count(DISTINCT day) AS BIGINT) AS e
    FROM armed GROUP BY arm
), wide AS (
    SELECT max(CASE WHEN arm = 0 THEN c END) AS c0,
           max(CASE WHEN arm = 1 THEN c END) AS c1,
           max(CASE WHEN arm = 0 THEN e END) AS e0,
           max(CASE WHEN arm = 1 THEN e END) AS e1
    FROM per_arm
)
SELECT c0, c1, e0, e1,
       {pround_sql(_RR, 6)} AS rate_ratio_r,
       {pround_sql(_RR_Z, 6)} AS z_r,
       {pround_sql(two_sided_p_sql(_RR_Z), 8)} AS p_r
FROM wide
"""


SPECS.append(
    QuerySpec(
        "poisson_rate_ratio",
        q_poisson_rate_ratio,
        _rr_sql(),
        ("stats",),
        doc="Two-arm Poisson rate-ratio z-test on purchase events; exact "
        "BIGINT counts and user-day exposures into one shared tree",
    )
)


# --------------------------------------------------------------------------
# Ansari–Bradley scale test (exact integer block-score range sums)
# --------------------------------------------------------------------------
#
# Rank-based dispersion test between the A and R quantity samples — the
# scale companion to Mann-Whitney (location) and the nonparametric
# alternative to Brown–Forsythe. Pooled AB scores a(i) = min(i, N+1-i)
# collapse per tie block [l, r] to an EXACT integer range sum S(l, r)
# (triangular-number algebra split at h = (N+1) DIV 2); the statistic
# sums the tie-averaged score tA*S/t per block and the tie-corrected
# moments come from sum S and sum S^2/t — all on the <= 50-row pooled
# grid, accumulated DECIMAL(38,0) in integer MICRO-units (the wide accumulator
# absorbs the 1e6 scale even at 100 TB row counts; error <= 5e-7 per
# grid row, deterministic in both engines).
# E[AB] = nA*mean(score); Var = nA*nB*(sum a^2 - N*mean^2)/(N*(N-1))
# (sampling nA scores without replacement from the score multiset).

def _tri(k: str) -> str:
    """k·(k+1)/2 exactly in DECIMAL(38,0) without a decimal DIV: halve
    whichever factor is even BEFORE widening (k and k+1 fit BIGINT near
    sf100k; only their PRODUCT doesn't — r·(r+1) reaches ~9e22, ADVICE
    r10 — so the halved-factor product is computed wide)."""
    return (
        f"(CASE WHEN ({k}) % 2 = 0"
        f" THEN CAST(({k}) DIV 2 AS DECIMAL(19,0))"
        f" * CAST(({k}) + 1 AS DECIMAL(19,0))"
        f" ELSE CAST(({k}) AS DECIMAL(19,0))"
        f" * CAST((({k}) + 1) DIV 2 AS DECIMAL(19,0)) END)"
    )


_AB_S = (
    f"(CASE WHEN l <= least(r, h)"
    f" THEN {_tri('least(r, h)')} - {_tri('l - 1')} ELSE 0 END"
    f" + CASE WHEN greatest(l, h + 1) <= r"
    f" THEN CAST(r - greatest(l, h + 1) + 1 AS DECIMAL(19,0))"
    f" * CAST(nn + 1 AS DECIMAL(19,0))"
    f" - ({_tri('r')} - {_tri('greatest(l, h + 1) - 1')}) ELSE 0 END)"
)
#: Quantization WITHOUT floor(): Spark's floor(DOUBLE) returns LONG and
#: SATURATES at 2^63 (observed: the sf0.1 sumsq terms ~8e19 silently
#: clamped, flipping the variance negative while DuckDB stayed exact).
#: The direct double->wide cast rounds to NEAREST in both engines but the
#: tie-break differs — Spark DECIMAL(38,0) is HALF_UP while DuckDB HUGEINT
#: is half-to-even (CAST(2.5::DOUBLE AS HUGEINT) = 2, observed; ADVICE
#: r10) — so the +1e-5 shifts any exact .5 tie off the boundary, making
#: the quantizer identical cross-engine by construction; it never
#: overflows until 10^38.
_AB_TERM = (
    "CAST(CAST(ta AS DOUBLE) * CAST(s AS DOUBLE) / CAST(t AS DOUBLE)"
    " * 1000000.0 + 0.00001 AS DECIMAL(38,0))"
)
_AB_SQ = (
    "CAST(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(t AS DOUBLE)"
    " * 1000000.0 + 0.00001 AS DECIMAL(38,0))"
)
_AB_MEAN = "(CAST(suma AS DOUBLE) / CAST(nn AS DOUBLE))"
_AB_STAT = "(CAST(ab AS DOUBLE) / 1000000.0)"
_AB_E = f"(CAST(na AS DOUBLE) * {_AB_MEAN})"
_AB_VAR = (
    f"(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)"
    f" * (CAST(sumsq AS DOUBLE) / 1000000.0"
    f" - CAST(nn AS DOUBLE) * {_AB_MEAN} * {_AB_MEAN})"
    f" / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)))"
)
_AB_Z = f"(({_AB_STAT} - {_AB_E}) / sqrt({_AB_VAR}))"


def q_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ansari–Bradley two-sample scale test on the A/R quantity grids
    (module comment): exact integer tie-block score sums, DECIMAL(38,0)
    statistic/moment accumulation, shared-tree z and Zelen-Severo p."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("v")
    )
    grid = (
        li.filter(F.col("l_returnflag").isin("A", "R"))
        .groupBy("v")
        .agg(
            F.sum((F.col("l_returnflag") == "A").cast("long")).alias("ta"),
            F.sum((F.col("l_returnflag") == "R").cast("long")).alias("tb"),
        )
        .withColumn("t", F.col("ta") + F.col("tb"))
    )
    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = grid.groupBy().agg(
        F.sum("ta").alias("na"),
        F.sum("tb").alias("nb"),
        (F.sum("ta") + F.sum("tb")).alias("nn"),
    )
    blocks = (
        grid.withColumn("r", F.sum("t").over(wcum))
        .withColumn("l", F.col("r") - F.col("t") + 1)
        .crossJoin(F.broadcast(tot))
        .withColumn("h", F.expr("(nn + 1) DIV 2"))
        .withColumn("s", F.expr(_AB_S))
    )
    agg = blocks.groupBy("na", "nb", "nn").agg(
        F.sum(F.expr(_AB_TERM)).alias("ab"),
        F.sum("s").alias("suma"),
        F.sum(F.expr(_AB_SQ)).alias("sumsq"),
    )
    return agg.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        pround(F.expr(_AB_STAT), 1).alias("ab_r"),
        pround(F.expr(_AB_Z), 6).alias("z_r"),
        pround(F.expr(two_sided_p_sql(_AB_Z)), 8).alias("p_r"),
    )


def _ab_sql() -> str:
    term = _AB_TERM.replace("DECIMAL(38,0)", "HUGEINT")
    sq = _AB_SQ.replace("DECIMAL(38,0)", "HUGEINT")
    s_expr = _AB_S.replace(" DIV ", " // ")
    return f"""
WITH li AS (
    SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v
    FROM lineitem WHERE l_returnflag IN ('A', 'R')
), grid AS (
    SELECT v,
           CAST(sum(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ta,
           CAST(sum(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS tb,
           CAST(count(*) AS BIGINT) AS t
    FROM li GROUP BY v
), tot AS (
    SELECT CAST(sum(ta) AS BIGINT) AS na, CAST(sum(tb) AS BIGINT) AS nb,
           CAST(sum(t) AS BIGINT) AS nn
    FROM grid
), blocks AS (
    SELECT ta, tb, t, na, nb, nn, (nn + 1) // 2 AS h,
           CAST(sum(t) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS r,
           CAST(sum(t) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               - t + 1 AS l
    FROM grid, tot
), scored AS (
    SELECT ta, t, na, nb, nn, {s_expr} AS s FROM blocks
), agg AS (
    SELECT na, nb, nn,
           CAST(sum({term}) AS HUGEINT) AS ab,
           CAST(sum(s) AS HUGEINT) AS suma,
           CAST(sum({sq}) AS HUGEINT) AS sumsq
    FROM scored GROUP BY na, nb, nn
)
SELECT na AS n_a, nb AS n_b,
       {pround_sql(_AB_STAT, 1)} AS ab_r,
       {pround_sql(_AB_Z, 6)} AS z_r,
       {pround_sql(two_sided_p_sql(_AB_Z), 8)} AS p_r
FROM agg
"""


SPECS.append(
    QuerySpec(
        "ansari_bradley",
        q_ansari_bradley,
        _ab_sql(),
        ("stats",),
        doc="Ansari-Bradley rank scale test on the A/R quantity grids; "
        "exact integer tie-block score sums, 128-bit moments",
    )
)


# --------------------------------------------------------------------------
# Nelson–Aalen cumulative hazard (the KM/logrank family's hazard analog)
# --------------------------------------------------------------------------


def q_nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimate for time-to-purchase:
    H(t) = sum_{tau <= t} d_tau / n_tau over the event-day grid — the
    hazard-scale companion to `kaplan_meier_retention` and the base curve
    under `cox_ph_binary_newton`. Subjects collapse to the duration grid
    once; risk sets are a reverse cumulative on that calendar-bounded
    grid (every event day IS a duration row, so no missing-cell hazard);
    each d/n term is nano-quantized before the bounded cumulative sum."""
    ev = read_table(spark, sf_dir, "events")
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fv"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    conv = (
        fv.join(
            purch,
            (F.col("user_id") == F.col("pu")) & (F.col("pts") >= F.col("fv")),
            "left",
        )
        .groupBy("user_id", "fv")
        .agg(F.min("pts").alias("p"))
    )
    horizon = ev.groupBy().agg(F.max(F.to_date("ts")).alias("hz"))
    subj = conv.crossJoin(F.broadcast(horizon)).select(
        F.datediff(
            F.coalesce(F.to_date("p"), F.col("hz")), F.to_date("fv")
        ).alias("dur"),
        F.col("p").isNotNull().cast("long").alias("ev"),
    )
    cells = subj.groupBy("dur").agg(
        F.count(F.lit(1)).alias("c"), F.sum("ev").alias("d")
    )
    wrev = Window.orderBy(F.col("dur").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = cells.withColumn("n_risk", F.sum("c").over(wrev))
    terms = risk.filter(F.col("d") > 0).withColumn(
        "t_nano",
        F.expr(
            "CAST(floor(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)"
            " * 1000000000.0 + 0.5) AS BIGINT)"
        ),
    )
    wcum = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = terms.withColumn("h_nano", F.sum("t_nano").over(wcum))
    return out.select(
        "dur",
        "d",
        "n_risk",
        pround(F.expr("CAST(h_nano AS DOUBLE) / 1000000000.0"), 6).alias(
            "na_hazard_r"
        ),
    )


_NA_SQL = f"""
WITH fv AS (
    SELECT user_id, min(ts) AS fv FROM events
    WHERE event_type = 'view' GROUP BY user_id
), conv AS (
    SELECT f.user_id, f.fv, min(e.ts) AS p
    FROM fv f LEFT JOIN events e
      ON e.user_id = f.user_id AND e.event_type = 'purchase' AND e.ts >= f.fv
    GROUP BY f.user_id, f.fv
), horizon AS (
    SELECT max(CAST(ts AS DATE)) AS hz FROM events
), subj AS (
    SELECT datediff('day', CAST(fv AS DATE),
                    CAST(coalesce(CAST(p AS DATE), hz) AS DATE)) AS dur,
           CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END AS ev
    FROM conv, horizon
), cells AS (
    SELECT dur, CAST(count(*) AS BIGINT) AS c, CAST(sum(ev) AS BIGINT) AS d
    FROM subj GROUP BY dur
), risk AS (
    SELECT dur, d,
           CAST(sum(c) OVER (ORDER BY dur DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS n_risk
    FROM cells
), terms AS (
    SELECT dur, d, n_risk,
           CAST(floor(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)
               * 1000000000.0 + 0.5) AS BIGINT) AS t_nano
    FROM risk WHERE d > 0
), cum AS (
    SELECT dur, d, n_risk,
           CAST(sum(t_nano) OVER (ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS h_nano
    FROM terms
)
SELECT dur, d, n_risk,
       {pround_sql('CAST(h_nano AS DOUBLE) / 1000000000.0', 6)} AS na_hazard_r
FROM cum
"""


# --------------------------------------------------------------------------
# Tukey HSD post-hoc pairs (ANOVA follow-up on the priority groups)
# --------------------------------------------------------------------------

_TUKEY_MSW = (
    "((CAST(q AS DOUBLE) - CAST(bmicro AS DOUBLE) / 1000000.0)"
    " / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))"
)
_TUKEY_Q = (
    "(abs(CAST(si AS DOUBLE) / CAST(ni AS DOUBLE)"
    " - CAST(sj AS DOUBLE) / CAST(nj AS DOUBLE))"
    f" / sqrt({_TUKEY_MSW} / 2.0"
    " * (1.0 / CAST(ni AS DOUBLE) + 1.0 / CAST(nj AS DOUBLE))))"
)


def q_tukey_hsd_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey HSD studentized-range statistics for every priority-group
    pair — the post-hoc step after a significant `anova_oneway_f`
    (quantity across the five order priorities here): q_ij =
    |mean_i - mean_j| / sqrt(MSW/2 * (1/n_i + 1/n_j)) with MSW from the
    same exact BIGINT group moments (micro-quantized between-group term).
    One corpus aggregate, a 10-row pair join of the 5-row moment frame."""
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("g"),
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_quantity").cast("long").alias("y"),
    )
    per = (
        li.join(o, "ok")
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("ng"),
            F.sum("y").alias("sg"),
            F.sum(F.col("y") * F.col("y")).alias("qg"),
        )
    )
    tot = per.groupBy().agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ng").alias("n"),
        F.sum("qg").alias("q"),
        F.sum(F.expr(_BG_TERM_MICRO)).alias("bmicro"),
    )
    a = per.select(
        F.col("g").alias("gi"), F.col("ng").alias("ni"), F.col("sg").alias("si")
    )
    b = per.select(
        F.col("g").alias("gj"), F.col("ng").alias("nj"), F.col("sg").alias("sj")
    )
    pairs = a.join(F.broadcast(b), F.col("gi") < F.col("gj")).crossJoin(
        F.broadcast(tot)
    )
    return pairs.select(
        "gi",
        "gj",
        pround(
            F.expr(
                "CAST(si AS DOUBLE) / CAST(ni AS DOUBLE)"
                " - CAST(sj AS DOUBLE) / CAST(nj AS DOUBLE)"
            ),
            6,
        ).alias("mean_diff_r"),
        pround(F.expr(_TUKEY_Q), 6).alias("q_stat_r"),
    )


def _tukey_sql() -> str:
    return f"""
WITH j AS (
    SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS g,
           CAST(l_quantity AS BIGINT) AS y
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), per AS (
    SELECT g, CAST(count(*) AS BIGINT) AS ng,
           CAST(sum(y) AS BIGINT) AS sg,
           CAST(sum(y * y) AS BIGINT) AS qg
    FROM j GROUP BY g
), tot AS (
    SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
           CAST(sum(qg) AS BIGINT) AS q,
           CAST(sum({_BG_TERM_MICRO}) AS DECIMAL(38,0)) AS bmicro
    FROM per
), pairs AS (
    SELECT a.g AS gi, b.g AS gj, a.ng AS ni, a.sg AS si,
           b.ng AS nj, b.sg AS sj, k, n, q, bmicro
    FROM per a JOIN per b ON a.g < b.g, tot
)
SELECT gi, gj,
       {pround_sql(
           'CAST(si AS DOUBLE) / CAST(ni AS DOUBLE)'
           ' - CAST(sj AS DOUBLE) / CAST(nj AS DOUBLE)', 6)} AS mean_diff_r,
       {pround_sql(_TUKEY_Q, 6)} AS q_stat_r
FROM pairs
"""


SPECS.extend(
    [
        QuerySpec(
            "nelson_aalen_hazard",
            q_nelson_aalen_hazard,
            _NA_SQL,
            ("stats", "timeseries"),
            doc="Nelson-Aalen cumulative hazard for time-to-purchase; "
            "reverse-cumulative risk sets, nano-quantized d/n terms",
        ),
        QuerySpec(
            "tukey_hsd_pairs",
            q_tukey_hsd_pairs,
            _tukey_sql(),
            ("stats",),
            doc="Tukey HSD studentized-range pairs across the priority "
            "groups; MSW from the shared exact ANOVA moments",
        ),
    ]
)
