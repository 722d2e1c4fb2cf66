"""Distribution tests, robust trends, and experiment-planning surfaces.

Round-6 additions: the nonparametric / planning half of the ML-analytics
shelf.  ``conversion_ztest``/``sprt_monitor`` (rangeops) answer "did the
metric move?"; these answer the questions around that one — "do the two
DISTRIBUTIONS differ?" (Kolmogorov–Smirnov, Mann–Whitney), "what is the
robust trend?" (Theil–Sen), "how big must the experiment be?" (power /
MDE grid), "which measures co-move?" (exact-moment correlation matrix),
and the closed-form multi-feature OLS that `price_elasticity`'s simple
regression generalizes to.

Determinism discipline (the `spearman_price_qty` playbook):

- every count / rank / cumulative is an exact integer (bigint, or
  DECIMAL(38,0) where fact-scale products can overflow int64);
- average ranks are carried DOUBLED (`2·cum − t + 1`) so ties stay exact;
- each statistic surfaces as ONE fixed double expression of those exact
  integers, rounded once (6 dp) at the output boundary;
- sorted-selection medians tie-break on a full deterministic key, or use
  `percentile`/`quantile_cont` whose (1−f)·a+f·b interpolation is
  bit-identical across Spark and DuckDB (see rangeops module docstring).

Scale shapes: every operator aggregates to a bounded surface before any
global window — distinct-VALUE tables for CDFs (domain-bounded, not
row-bounded), calendar-bounded day grids for trend pairs, group-bounded
moment rows for correlation/OLS.  The only global windows run over those
bounded tables, never over facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import read_table

# experiment-planning constants: two-sided alpha=0.05, power=0.80
Z_ALPHA = "1.959963984540054"
Z_BETA = "0.8416212335729143"
POWER_MDE_GRID = (0.02, 0.05, 0.10, 0.20)


def ks_price_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov D between the order-price
    distributions of urgent (priority 1–2) and non-urgent orders — the
    distribution-shift screen that catches what a mean test misses.

    D = max over values v of |F_a(v) − F_b(v)|.  With exact per-value
    counts the scaled gap |ca·n_b − cb·n_a| is an exact DECIMAL(38,0)
    integer, so the argmax (and its tie-break: smallest value attaining
    the max) is decided in integer arithmetic; the single division
    happens once at the surface.

    Scale shape: one fact scan → distinct-value (cents) aggregate, a
    value-domain-bounded CDF window, and a 1-row broadcast of totals.
    The fact table is never windowed.
    """
    o = read_table(spark, sf_dir, "orders").select(
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("cents"),
        F.expr(
            "if(o_orderpriority in ('1-URGENT', '2-HIGH'), 1L, 0L)"
        ).alias("is_a"),
    )
    # the per-value count table feeds BOTH the CDF window and the totals,
    # and the gap table feeds BOTH the argmax and the tie-break join —
    # exchange reuse does not dedupe either, so without the two
    # checkpoints the fact scan executed four times.  Both tables are
    # value-domain bounded (distinct cents), the safe checkpoint size.
    per = o.groupBy("cents").agg(
        F.sum("is_a").cast("bigint").alias("a_n"),
        F.sum(F.expr("1L - is_a")).cast("bigint").alias("b_n"),
    ).localCheckpoint(eager=True)
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        "cents",
        F.sum("a_n").over(w).alias("ca"),
        F.sum("b_n").over(w).alias("cb"),
    )
    tot = per.agg(
        F.sum("a_n").cast("bigint").alias("n_a"),
        F.sum("b_n").cast("bigint").alias("n_b"),
    )
    d = cum.crossJoin(F.broadcast(tot)).select(
        "cents",
        "n_a",
        "n_b",
        F.expr(
            "abs(cast(ca as decimal(38,0)) * n_b"
            " - cast(cb as decimal(38,0)) * n_a)"
        ).alias("dnum"),
    ).localCheckpoint(eager=True)
    m = d.agg(F.max("dnum").alias("dmax"))
    return (
        d.join(F.broadcast(m), d.dnum == m.dmax)
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.min("cents").alias("ks_at_cents"),
            F.max("dnum").alias("dm"),
        )
        .select(
            "n_a",
            "n_b",
            "ks_at_cents",
            F.round(
                F.expr(
                    "cast(dm as double)"
                    " / (cast(n_a as double) * cast(n_b as double))"
                ),
                6,
            ).alias("ks_stat"),
        )
    )


def mannwhitney_value_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) comparing purchase vs click
    event values — the nonparametric location test that stays valid when
    the value distribution is skewed (and event revenue always is).

    Doubled average ranks keep ties exact; U₁×2 = Σ2r₁ − n₁(n₁+1) is an
    exact integer; the tie-corrected normal z uses the standard
    σ² = n₁n₂/12 · ((n+1) − Σ(t³−t)/(n(n−1))) with Σ(t³−t) carried as an
    exact DECIMAL sum.

    Scale shape: distinct-value rank table (domain-bounded) + one
    1-row moment aggregate; no fact-side window.
    """
    ev = (
        read_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "click"))
        .where(F.col("value").isNotNull())
        .select(
            F.expr("cast(round(value * 100) as bigint)").alias("cents"),
            F.expr("if(event_type = 'purchase', 1L, 0L)").alias("is_a"),
        )
    )
    per = ev.groupBy("cents").agg(
        F.count(F.lit(1)).alias("t"),
        F.sum("is_a").cast("bigint").alias("a_n"),
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    r = per.withColumn("cum", F.sum("t").over(w)).select(
        "cents",
        "t",
        "a_n",
        F.expr("2 * cum - t + 1").alias("r2"),
    )
    agg = r.agg(
        F.sum("a_n").cast("bigint").alias("n_a"),
        F.sum(F.expr("t - a_n")).cast("bigint").alias("n_b"),
        F.sum(F.expr("cast(a_n as decimal(38,0)) * r2")).alias("s2a"),
        F.sum(
            F.expr(
                "cast(t as decimal(38,0)) * t * t - t"
            )
        ).alias("tcorr"),
    )
    u1x2 = "s2a - cast(n_a as decimal(38,0)) * (n_a + 1)"
    nd = "cast(n_a + n_b as double)"
    sigma2 = (
        f"cast(n_a as double) * cast(n_b as double) / 12.0"
        f" * (({nd} + 1.0) - cast(tcorr as double)"
        f" / ({nd} * ({nd} - 1.0)))"
    )
    return agg.select(
        "n_a",
        "n_b",
        F.expr(f"cast({u1x2} as bigint)").alias("u1_x2"),
        F.round(
            F.expr(
                f"(cast({u1x2} as double)"
                f" - cast(n_a as double) * cast(n_b as double))"
                f" / (2.0 * sqrt({sigma2}))"
            ),
            6,
        ).alias("z_stat"),
    )


def theilsen_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of daily order counts: the median of all
    pairwise day-to-day slopes — immune to the outlier days that wreck
    an OLS fit of the same series.

    Slopes are IEEE doubles of exact integer differences, identical in
    both engines; the median uses `percentile`/`quantile_cont`, whose
    (1−f)·a + f·b interpolation is bit-identical (rangeops docstring).

    Scale shape: the pair set is CALENDAR-bounded (days², independent of
    fact rows — ~2.9M pairs for a 7-year grid), built by broadcasting
    the day-grid aggregate against itself; facts are touched once.
    """
    d = read_table(spark, sf_dir, "orders").groupBy(
        F.expr("datediff(o_orderdate, date '1970-01-01')").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    nd = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    x = d.select(F.col("d").alias("dx"), F.col("c").alias("cx"))
    y = d.select(F.col("d").alias("dy"), F.col("c").alias("cy"))
    pairs = x.join(F.broadcast(y), F.col("dy") > F.col("dx")).select(
        F.expr(
            "cast(cy - cx as double) / cast(dy - dx as double)"
        ).alias("slope")
    )
    return (
        pairs.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(F.expr("percentile(slope, 0.5)"), 6).alias(
                "trend_per_day"
            ),
        )
        .crossJoin(F.broadcast(nd))
        # a single-day grid has no slope pairs and therefore no trend
        # row -- matching the oracle's GROUP-BY-over-empty semantics
        # (degenerate sweep, round 8)
        .filter(F.col("n_pairs") > 0)
        .select("n_days", "n_pairs", "trend_per_day")
    )


def ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power planning: per relative-MDE candidate, the
    required observations PER ARM to detect that lift of the observed
    baseline purchase share at two-sided α=0.05 with 80% power — the
    two-proportion sample-size formula
    n = (z_{α/2}·√(2p̄q̄) + z_β·√(p₀q₀+p₁q₁))² / (p₁−p₀)².

    The baseline is the EVENT-level purchase share (a rate safely below
    1/(1+max lift), so p₁ stays a probability at every grid point —
    per-user conversion here is ~0.9 and would push p₁ past 1).  Exact
    integer inputs; the whole formula is one fixed double expression per
    grid row, ceil'd to a bigint.  Grid rows come from a literal explode
    on both engines.

    Scale shape: one map-side-combinable aggregate (1 row) × a 4-row
    literal grid.
    """
    base = read_table(spark, sf_dir, "events").agg(
        F.count(F.lit(1)).cast("bigint").alias("nu"),
        F.sum(F.expr("if(event_type = 'purchase', 1L, 0L)"))
        .cast("bigint")
        .alias("nc"),
    )
    grid = base.select(
        "nu",
        "nc",
        F.explode(
            F.array(*[F.lit(x) for x in POWER_MDE_GRID])
        ).alias("rel_mde"),
    )
    p0 = "(cast(nc as double) / cast(nu as double))"
    p1 = f"({p0} * (1.0 + rel_mde))"
    pbar = f"(({p0} + {p1}) / 2.0)"
    n_expr = (
        f"pow({Z_ALPHA} * sqrt(2.0 * {pbar} * (1.0 - {pbar}))"
        f" + {Z_BETA} * sqrt({p0} * (1.0 - {p0})"
        f" + {p1} * (1.0 - {p1})), 2)"
        f" / pow({p1} - {p0}, 2)"
    )
    return grid.select(
        "rel_mde",
        F.round(F.expr(p0), 6).alias("p0_rate"),
        F.round(F.expr(p1), 6).alias("p1_rate"),
        F.expr(f"cast(ceil({n_expr}) as bigint)").alias("n_per_arm"),
    )


# correlation-matrix measures: (short name, exact-integer extraction)
_CORR_MEASURES = [
    ("quantity", "cast(round(l_quantity) as bigint)"),
    ("price", "cast(round(l_extendedprice * 100) as bigint)"),
    ("discount", "cast(round(l_discount * 10000) as bigint)"),
    ("tax", "cast(round(l_tax * 10000) as bigint)"),
]


def corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over the four lineitem
    measures (quantity, price, discount, tax) — the co-movement screen
    run before any feature goes into a model.

    All 14 moments (4 sums, 4 squares, 6 cross-products) are exact
    DECIMAL(38,0) sums of integer-scaled values, collected in ONE scan /
    one aggregate row; each of the 6 correlations is the usual
    (n·Sxy − Sx·Sy) / √(n·Sxx − Sx²)·√(n·Syy − Sy²) evaluated as one
    fixed double expression, then unpivoted to (m_x, m_y, corr) rows.

    Scale shape: single map-side-combinable aggregate; the unpivot is a
    6-row literal stack on a 1-row input.
    """
    names = [n for n, _ in _CORR_MEASURES]
    src = read_table(spark, sf_dir, "lineitem").select(
        *[F.expr(e).alias(n) for n, e in _CORR_MEASURES]
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for n, _ in _CORR_MEASURES:
        aggs.append(F.sum(F.expr(f"cast({n} as decimal(38,0))")).alias(f"s_{n}"))
        aggs.append(
            F.sum(F.expr(f"cast({n} as decimal(38,0)) * {n}")).alias(f"ss_{n}")
        )
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            aggs.append(
                F.sum(
                    F.expr(f"cast({a} as decimal(38,0)) * {b}")
                ).alias(f"sx_{a}_{b}")
            )
    mom = src.agg(*aggs)
    pair_cols = []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            expr = corr_pair_expr(a, b)
            pair_cols.append(F.round(F.expr(expr), 6).alias(f"c_{a}_{b}"))
    flat = mom.select("n", *pair_cols)
    stack_args = ", ".join(
        f"'{a}', '{b}', c_{a}_{b}"
        for i, a in enumerate(names)
        for b in names[i + 1 :]
    )
    return flat.selectExpr(
        "n",
        f"stack(6, {stack_args}) as (m_x, m_y, corr)",
    ).select("m_x", "m_y", "n", "corr")


def corr_pair_expr(a: str, b: str, big: str = "decimal(38,0)") -> str:
    """The shared Spark/DuckDB double expression for one Pearson cell —
    the oracle imports this with big='HUGEINT' so both engines evaluate
    the same expression tree over the same exact-integer moments (the
    wide-int TYPE differs per engine; the values, and therefore the
    nearest-double conversions, are identical)."""
    num = f"cast(n as {big}) * sx_{a}_{b} - cast(s_{a} as {big}) * s_{b}"
    dena = f"cast(n as {big}) * ss_{a} - cast(s_{a} as {big}) * s_{a}"
    denb = f"cast(n as {big}) * ss_{b} - cast(s_{b} as {big}) * s_{b}"
    # zero variance on either side leaves the correlation undefined:
    # NULL on both engines (the exact-integer = 0 probe costs no division,
    # so it is ANSI-safe to evaluate first) -- degenerate sweep, round 8
    return (
        f"(CASE WHEN {dena} = 0 OR {denb} = 0 THEN NULL ELSE"
        f" cast({num} as double) / (sqrt(cast({dena} as double))"
        f" * sqrt(cast({denb} as double))) END)"
    )


# shared Cramer's-rule double expressions for the 2-feature OLS — the
# oracle f-string imports these so both engines evaluate identical trees.
_OLS_D = {
    v: f"cast({v} as double)"
    for v in ("n", "s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y")
}
OLS_DET = (
    "({n} * ({s11} * {s22} - {s12} * {s12})"
    " - {s1} * ({s1} * {s22} - {s12} * {s2})"
    " + {s2} * ({s1} * {s12} - {s11} * {s2}))"
).format(**_OLS_D)
OLS_B0 = (
    "({sy} * ({s11} * {s22} - {s12} * {s12})"
    " - {s1} * ({s1y} * {s22} - {s12} * {s2y})"
    " + {s2} * ({s1y} * {s12} - {s11} * {s2y}))"
).format(**_OLS_D)
OLS_B1 = (
    "({n} * ({s1y} * {s22} - {s12} * {s2y})"
    " - {sy} * ({s1} * {s22} - {s12} * {s2})"
    " + {s2} * ({s1} * {s2y} - {s1y} * {s2}))"
).format(**_OLS_D)
OLS_B2 = (
    "({n} * ({s11} * {s2y} - {s1y} * {s12})"
    " - {s1} * ({s1} * {s2y} - {s1y} * {s2})"
    " + {sy} * ({s1} * {s12} - {s11} * {s2}))"
).format(**_OLS_D)


def ols_price_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form two-feature OLS per part brand: quantity regressed on
    discount (bps) and unit price (cents) via the 3×3 normal equations
    solved by Cramer's rule — the multi-feature generalization of
    `price_elasticity`'s simple regression, with no iterative fitting.

    All nine moments are exact DECIMAL(38,0) sums gathered in one keyed
    aggregate; the three determinants are fixed double expressions
    (shared verbatim with the oracle via OLS_DET/B0/B1/B2).  Intercept
    rounds at 6 dp; the per-bps / per-cent slopes at 9 dp (their natural
    magnitude).  Degenerate groups (det = 0) surface NULL coefficients.

    Scale shape: one fact scan, one broadcast dim join, one keyed
    map-side-combinable aggregate (25 brand rows); solving is per-row
    arithmetic.
    """
    # a zero-quantity line has no unit price: exclude it BEFORE the
    # division, which raises under ANSI (degenerate sweep, round 8;
    # the oracle applies the same predicate)
    li = (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 0)
        .select(
            "l_partkey",
            F.expr("cast(round(l_quantity) as bigint)").alias("y"),
            F.expr("cast(round(l_discount * 10000) as bigint)").alias("x1"),
            F.expr(
                "cast(round(l_extendedprice / l_quantity * 100) as bigint)"
            ).alias("x2"),
        )
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    d = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    mom = d.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("cast(x1 as decimal(38,0))")).alias("s1"),
        F.sum(F.expr("cast(x2 as decimal(38,0))")).alias("s2"),
        F.sum(F.expr("cast(y as decimal(38,0))")).alias("sy"),
        F.sum(F.expr("cast(x1 as decimal(38,0)) * x1")).alias("s11"),
        F.sum(F.expr("cast(x1 as decimal(38,0)) * x2")).alias("s12"),
        F.sum(F.expr("cast(x2 as decimal(38,0)) * x2")).alias("s22"),
        F.sum(F.expr("cast(x1 as decimal(38,0)) * y")).alias("s1y"),
        F.sum(F.expr("cast(x2 as decimal(38,0)) * y")).alias("s2y"),
    )
    return mom.select(
        "p_brand",
        "n",
        F.round(
            F.expr(f"if({OLS_DET} = 0.0, null, {OLS_B0} / {OLS_DET})"), 6
        ).alias("intercept"),
        F.round(
            F.expr(f"if({OLS_DET} = 0.0, null, {OLS_B1} / {OLS_DET})"), 9
        ).alias("beta_discount_bps"),
        F.round(
            F.expr(f"if({OLS_DET} = 0.0, null, {OLS_B2} / {OLS_DET})"), 9
        ).alias("beta_price_cent"),
    )


L_DIVERSITY_MIN_K = 10
L_DIVERSITY_MIN_L = 3


def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the privacy check k-anonymity
    (`k_anonymity_audit`) famously misses: a quasi-identifier group can
    be large (k-anonymous) yet expose everyone in it because all its
    rows share one SENSITIVE value.  Per (nation, market-segment) group
    over customer orders: group size k, distinct sensitive order
    priorities l, and the entropy of the sensitive distribution
    (ln k − Σc·ln c / k — exact counts, one double expression).

    Scale shape: two-level keyed aggregate — (QI, sensitive) counts then
    QI rollup — both map-side combinable; no fact-side window.
    """
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    d = o.join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
    per = d.groupBy("c_nationkey", "c_mktsegment", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    return per.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("cnt").cast("bigint").alias("k"),
        F.count(F.lit(1)).cast("bigint").alias("l"),
        F.round(
            F.expr(
                "ln(cast(sum(cnt) as double))"
                " - sum(cast(cnt as double) * ln(cast(cnt as double)))"
                " / cast(sum(cnt) as double)"
            ),
            6,
        ).alias("sens_entropy"),
        F.expr(
            f"sum(cnt) < {L_DIVERSITY_MIN_K}"
            f" or count(1) < {L_DIVERSITY_MIN_L}"
        ).alias("is_weak"),
    )


SN_WINDOW = 2
SN_JACCARD_MIN = 0.25


def sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood entity-resolution blocking over part names —
    the OTHER classic ER blocking scheme next to `part_er_blocking`'s
    key-equality blocks: sort records by a blocking key and compare each
    record only to its SN_WINDOW successors, so near-duplicates that
    disagree on every exact key still meet if they sort adjacently.
    Candidates are verified with distinct-token Jaccard ≥ 0.25.

    The neighbor join is an equality join on rank offset (rn + 1, rn + 2
    exploded), never an inequality scan.  Spark verifies with
    array_intersect/array_union on distinct token arrays; the oracle
    unnests tokens and counts matches — two algorithms, same sets.

    Scale shape: dim-sized sort (at 100 TB: range-partition the sort and
    duplicate the SN_WINDOW boundary rows per partition — the classic
    distributed sorted-neighborhood construction); the verify touches
    only the 2N candidate pairs.
    """
    p = read_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        F.array_distinct(F.split("p_name", " ")).alias("toks"),
    )
    rn = p.withColumn(
        "rn",
        F.row_number().over(Window.orderBy("p_name", "p_partkey")),
    )
    probe = rn.select(
        F.col("p_partkey").alias("pk_b"),
        F.col("toks").alias("toks_b"),
        F.explode(
            F.array(*[F.expr(f"rn - {i}") for i in range(1, SN_WINDOW + 1)])
        ).alias("rn_a"),
    )
    base = rn.select(
        F.col("rn").alias("rn_a"),
        F.col("p_partkey").alias("pk_a"),
        F.col("toks").alias("toks_a"),
    )
    pairs = base.join(probe, "rn_a").select(
        "pk_a",
        "pk_b",
        F.size(F.array_intersect("toks_a", "toks_b")).cast("bigint").alias(
            "n_inter"
        ),
        F.size(F.array_union("toks_a", "toks_b")).cast("bigint").alias(
            "n_union"
        ),
    )
    return pairs.select(
        "pk_a",
        "pk_b",
        "n_inter",
        "n_union",
        F.round(
            F.expr("cast(n_inter as double) / cast(n_union as double)"), 6
        ).alias("jaccard"),
    ).where(F.col("jaccard") >= SN_JACCARD_MIN)


def quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of per-source document lengths onto the
    global length distribution — the cross-source calibration step
    (bioinformatics' quantile normalization) that makes length-based
    quality thresholds comparable across sources with different length
    profiles.

    Each doc's DOUBLED average rank r2 within its source (ns docs) maps
    to the global position tr = ⌈r2·N / (2·ns)⌉ — computed in exact
    integer arithmetic as (r2·N + 2·ns − 1) div (2·ns), positive
    operands so floor-div and trunc-div agree across engines — and the
    normalized value is the global n_chars at sorted position tr
    (position→value lookup on the distinct-value CDF, so equal values
    give one deterministic answer regardless of tie order).

    Scale shape: per-source rank windows over (source, n_chars) distinct
    pairs; the global CDF is a distinct-VALUE table (domain-bounded)
    range-joined by containment — at petabyte scale swap it for an
    approx-quantile sketch lookup, same mapping.
    """
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    grp = docs.groupBy("source", "n_chars").agg(
        F.count(F.lit(1)).cast("bigint").alias("t")
    )
    ws = (
        Window.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = grp.withColumn("cum", F.sum("t").over(ws)).select(
        "source",
        "n_chars",
        F.expr("2 * cum - t + 1").alias("r2"),
    )
    sizes = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("ns")
    )
    tot = docs.agg(F.count(F.lit(1)).cast("bigint").alias("nn"))
    tr = (
        ranked.join(F.broadcast(sizes), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_chars",
            F.expr("(r2 * nn + 2 * ns - 1) div (2 * ns)").alias("tr"),
        )
    )
    gv = docs.groupBy(F.col("n_chars").alias("gv")).agg(
        F.count(F.lit(1)).cast("bigint").alias("gt")
    )
    wg = Window.orderBy("gv").rowsBetween(Window.unboundedPreceding, 0)
    gcum = gv.withColumn("gcum", F.sum("gt").over(wg))
    looked = tr.join(
        F.broadcast(gcum),
        (F.col("tr") > F.col("gcum") - F.col("gt"))
        & (F.col("tr") <= F.col("gcum")),
    ).select("source", "n_chars", F.col("gv").alias("norm_chars"))
    return docs.join(looked, ["source", "n_chars"]).select(
        "doc_id", "source", "n_chars", "norm_chars"
    )


ACF_LAGS = (1, 2, 7, 14)


def autocorrelation_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily order-count series at the standard
    diagnostic lags (1, 2, 7, 14 days) — the seasonality/memory screen
    read before fitting any forecast (`holt_forecast_error`,
    `seasonal_forecast_error` downstream).

    ACF(k) is the Pearson correlation of (c_t, c_{t−k}) over the pairs
    where BOTH days are observed (sparse-calendar semantics, documented:
    no zero-imputation).  All moments are exact integer sums gathered
    per lag after an equality self-join on the day grid; each
    correlation is one fixed double expression rounded 6 dp.

    Scale shape: the day grid is CALENDAR-bounded; the lag join is an
    equality join on (day − lag) after a 4-way literal lag explode —
    broadcast-sized at any fact scale.
    """
    d = read_table(spark, sf_dir, "orders").groupBy(
        F.expr("datediff(o_orderdate, date '1970-01-01')").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    lags = d.select(
        "d",
        "c",
        F.explode(F.array(*[F.lit(k) for k in ACF_LAGS])).alias("lag"),
    )
    prev = d.select(F.col("d").alias("dp"), F.col("c").alias("cp"))
    j = lags.join(
        F.broadcast(prev), F.expr("dp = d - lag")
    ).select("lag", "c", "cp")
    mom = j.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("cast(c as decimal(38,0))")).alias("s_a"),
        F.sum(F.expr("cast(cp as decimal(38,0))")).alias("s_b"),
        F.sum(F.expr("cast(c as decimal(38,0)) * c")).alias("ss_a"),
        F.sum(F.expr("cast(cp as decimal(38,0)) * cp")).alias("ss_b"),
        F.sum(F.expr("cast(c as decimal(38,0)) * cp")).alias("sx_a_b"),
    )
    return mom.select(
        "lag",
        "n",
        F.round(F.expr(corr_pair_expr("a", "b")), 6).alias("acf"),
    )


# shared Spark/DuckDB SSE expressions for best_changepoint (column names
# k/s/ss = left prefix, kt/st/sst = totals)
# nullif guards the right-segment denominator: under Spark's ANSI mode
# the projection can be evaluated on the (filtered-out) k = kt row, and
# ANSI double division by zero THROWS instead of yielding NULL/Inf.
CP_SSE2 = (
    "(cast(ss as double) - cast(s as double) * cast(s as double)"
    " / cast(k as double))"
    " + (cast(sst - ss as double)"
    "    - cast(st - s as double) * cast(st - s as double)"
    "      / cast(nullif(kt - k, 0) as double))"
)
CP_SSE1 = (
    "cast(sst as double) - cast(st as double)"
    " * cast(st as double) / cast(kt as double)"
)


def best_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single best changepoint of the daily order-count series — binary
    segmentation's first (and most informative) step: the split day t
    minimizing SSE_left(t) + SSE_right(t), i.e. the two-segment
    piecewise-constant fit.

    With prefix sums (k, s, ss) every candidate's total SSE is the fixed
    double expression (ss_l − s_l²/k_l) + (ss_r − s_r²/k_r) of exact
    integers, so the argmin — and its earliest-day tie-break — is a
    deterministic decision.  Both boundary directions keep ≥ 1 day.

    Scale shape: facts collapse to the calendar-bounded day grid; the
    prefix-sum window and the argmin run over that grid only.
    """
    d = read_table(spark, sf_dir, "orders").groupBy(
        F.expr("datediff(o_orderdate, date '1970-01-01')").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    pre = d.select(
        "d",
        F.count(F.lit(1)).over(w).cast("bigint").alias("k"),
        F.sum("c").over(w).cast("bigint").alias("s"),
        F.sum(F.expr("cast(c as decimal(38,0)) * c")).over(w).alias("ss"),
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("kt"),
        F.sum("c").cast("bigint").alias("st"),
        F.sum(F.expr("cast(c as decimal(38,0)) * c")).alias("sst"),
    )
    cand = (
        pre.crossJoin(F.broadcast(tot))
        .where(F.expr("k < kt"))
        .select("d", F.round(F.expr(CP_SSE2), 6).alias("sse2"))
    )
    m = cand.agg(F.min("sse2").alias("best"))
    return (
        cand.join(F.broadcast(m), cand.sse2 == m.best)
        .agg(
            F.min("d").alias("split_day"),
            F.min("sse2").alias("sse_two_segment"),
        )
        .crossJoin(
            F.broadcast(
                tot.select(
                    "kt",
                    F.round(F.expr(CP_SSE1), 6).alias("sse_one_segment"),
                )
            )
        )
        .select(
            "split_day",
            F.col("kt").alias("n_days"),
            "sse_one_segment",
            "sse_two_segment",
        )
    )


MAD_K = 3.0
MAD_CONSISTENCY = 1.4826


def mad_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-revenue anomaly flags: days whose order revenue sits
    more than 3 robust sigmas (1.4826·MAD) from the median — the
    outlier monitor whose thresholds a single spike cannot drag (unlike
    mean/stddev z-scores).  Revenue, not counts: count-valued series at
    small scale factors have a degenerate (zero) MAD.

    Median and MAD both use the bit-identical percentile/quantile_cont
    interpolation (rangeops docstring); deviations |rev − med| are exact
    doubles of integer cents; the flag compares against one fixed
    threshold expression (guarded for mad = 0), and the rounded robust z
    is emitted for ranking.

    Scale shape: calendar-bounded day grid; two grid-sized percentile
    aggregates (the second over |rev − med|), one broadcast join back.
    """
    d = read_table(spark, sf_dir, "orders").groupBy(
        F.expr("datediff(o_orderdate, date '1970-01-01')").alias("d")
    ).agg(
        F.sum(F.expr("cast(round(o_totalprice * 100) as bigint)"))
        .cast("bigint")
        .alias("rev_c")
    )
    med = d.agg(F.expr("percentile(rev_c, 0.5)").alias("med"))
    dev = d.crossJoin(F.broadcast(med)).select(
        "d",
        "rev_c",
        "med",
        F.expr("abs(cast(rev_c as double) - med)").alias("adev"),
    )
    mad = dev.agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    z = f"(cast(rev_c as double) - med) / ({MAD_CONSISTENCY!r} * mad)"
    return (
        dev.crossJoin(F.broadcast(mad))
        .where(F.expr(f"mad > 0.0 and abs({z}) > {MAD_K!r}"))
        .select(
            "d",
            "rev_c",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            F.round(F.expr(z), 6).alias("robust_z"),
        )
    )


RP_BUCKETS = 16


def range_partition_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-planning audit: assign part keys to RP_BUCKETS buckets
    by (a) md5-hash partitioning and (b) weight-balanced RANGE
    partitioning (boundaries from the cumulative row-count CDF — what a
    range-partitioned sort/write would pick), and report each bucket's
    key count, row load, and load ratio vs the ideal total/N.  The
    planner's answer to "will this partitioning skew?" BEFORE shuffling
    100 TB by it.

    Hash buckets reuse the LSH md5→28-bit idiom (bit-identical across
    engines); range buckets are the exact integer ((cum − w)·N) div
    total over the key-sorted cumulative weights.

    Scale shape: facts collapse to the key-domain-bounded (key, weight)
    table; the CDF window runs over keys only; both bucketings are
    per-row expressions on that table.
    """
    keys = read_table(spark, sf_dir, "lineitem").groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("w")
    )
    tot = keys.agg(F.sum("w").cast("bigint").alias("total"))
    hashed = keys.select(
        F.lit("hash").alias("scheme"),
        F.expr(
            "cast(cast(conv(substring(md5(cast(l_partkey as string)), 1, 7),"
            f" 16, 10) as bigint) % {RP_BUCKETS} as int)"
        ).alias("bucket"),
        "w",
    )
    wc = Window.orderBy("l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranged = (
        keys.withColumn("cum", F.sum("w").over(wc))
        .crossJoin(F.broadcast(tot))
        .select(
            F.lit("range").alias("scheme"),
            F.expr(
                f"cast(((cum - w) * {RP_BUCKETS}) div total as int)"
            ).alias("bucket"),
            "w",
        )
    )
    per = (
        hashed.unionByName(ranged)
        .groupBy("scheme", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum("w").cast("bigint").alias("n_rows"),
        )
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "scheme",
        "bucket",
        "n_keys",
        "n_rows",
        F.round(
            F.expr(
                f"cast(n_rows as double) * {RP_BUCKETS}"
                " / cast(total as double)"
            ),
            6,
        ).alias("load_ratio"),
    )


BLOOM_BPK_GRID = (8, 12, 16, 20)
LN2 = "0.6931471805599453"


def bloom_fpr_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter sizing plan for the lineitem part-key set: per
    bits-per-key candidate, the filter size, optimal hash count
    k = round(ln2·bpk), and the resulting false-positive rate
    (1 − e^(−k/bpk))^k — the capacity planning read before shipping a
    semi-join filter (`bloom_semi_join_audit` measures the realized
    counterpart).

    Exact distinct-key count; the FPR is one fixed double expression of
    that count and the grid literal, rounded 9 dp.

    Scale shape: one distinct-count aggregate × a 4-row literal grid.
    """
    base = read_table(spark, sf_dir, "lineitem").agg(
        F.countDistinct("l_partkey").cast("bigint").alias("n_keys")
    )
    grid = base.select(
        "n_keys",
        F.explode(
            F.array(*[F.lit(int(b)) for b in BLOOM_BPK_GRID])
        ).alias("bits_per_key"),
    )
    k = f"cast(round({LN2} * bits_per_key) as int)"
    fpr = (
        f"pow(1.0 - exp(-cast({k} as double)"
        " / cast(bits_per_key as double)),"
        f" cast({k} as double))"
    )
    return grid.select(
        "bits_per_key",
        "n_keys",
        F.expr("cast(n_keys as bigint) * bits_per_key").alias("m_bits"),
        F.expr(k).alias("k_hashes"),
        F.round(F.expr(fpr), 9).alias("fpr"),
    )


TRIM_PCT = 5  # percent trimmed from EACH side


def trimmed_mean_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-trimmed mean of event values per event type, next to the raw
    mean — the robust location estimate that DROPS the tails
    (`value_winsorize` clips them; trimming is the other classic).

    The trim boundary lo = (5·n) div 100 is exact; each distinct value
    contributes kept_cnt = max(0, min(cum, n−lo) − max(cum−t, lo))
    occurrences — pure integer interval intersection on the value CDF,
    so the kept multiset is exact and engine-independent; one division
    at the surface.

    Scale shape: distinct-value CDF per type (domain-bounded window),
    exact integer aggregate; no fact-side sort.
    """
    ev = (
        read_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            F.expr("cast(round(value * 100) as bigint)").alias("cents"),
        )
    )
    per = ev.groupBy("event_type", "cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("t")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = per.withColumn("cum", F.sum("t").over(w))
    nn = per.groupBy("event_type").agg(F.sum("t").cast("bigint").alias("n"))
    j = cum.join(F.broadcast(nn), "event_type").select(
        "event_type",
        "cents",
        "t",
        "n",
        F.expr(f"(({TRIM_PCT} * n) div 100)").alias("lo"),
        F.expr(
            f"greatest(0L, least(cum, n - (({TRIM_PCT} * n) div 100))"
            f" - greatest(cum - t, ({TRIM_PCT} * n) div 100))"
        ).alias("kept"),
    )
    return j.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max("lo").alias("n_trimmed_each_side"),
        F.round(
            F.expr(
                "cast(sum(cast(cents as decimal(38,0)) * t) as double)"
                " / cast(max(n) as double)"
            ),
            6,
        ).alias("mean_cents"),
        F.round(
            F.expr(
                "cast(sum(cast(cents as decimal(38,0)) * kept) as double)"
                " / cast(sum(kept) as double)"
            ),
            6,
        ).alias("trimmed_mean_cents"),
    )


def hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman revenue-concentration index per nation: the
    sum of squared customer revenue shares — the antitrust-standard
    concentration measure beside `gini_by_type`'s inequality curve.
    HHI = Σsᵢ² = Σrᵢ² / (Σrᵢ)² over exact integer cents, plus the
    normalized form (HHI − 1/n)/(1 − 1/n) ∈ [0, 1] (NULL for
    single-customer nations, where normalization is undefined).

    Scale shape: two keyed map-side-combinable aggregates (customer
    rollup, then nation rollup) and one broadcast dim join; the squares
    are DECIMAL(38,0)/HUGEINT exact.
    """
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("cents"),
    )
    per_cust = (
        o.join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "c_custkey")
        .agg(F.sum("cents").cast("bigint").alias("rev"))
    )
    mom = per_cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum(F.expr("cast(rev as decimal(38,0))")).alias("s"),
        F.sum(F.expr("cast(rev as decimal(38,0)) * rev")).alias("ss"),
    )
    nation = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    hhi = (
        "cast(ss as double) / (cast(s as double) * cast(s as double))"
    )
    return mom.join(
        F.broadcast(nation), mom.c_nationkey == nation.n_nationkey
    ).select(
        "c_nationkey",
        "n_name",
        "n_customers",
        F.round(F.expr(hhi), 6).alias("hhi"),
        F.round(
            F.expr(
                f"if(n_customers = 1, null,"
                f" ({hhi} - 1.0 / cast(n_customers as double))"
                f" / (1.0 - 1.0 / cast(n_customers as double)))"
            ),
            6,
        ).alias("hhi_normalized"),
    )


def weekday_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of daily order counts grouped by weekday — the
    day-of-week seasonality significance test behind what
    `autocorrelation_daily`'s lag-7 coefficient only hints at.  Emits
    the F statistic, effect size η² = SSB/SST, and the Fano dispersion
    ratio (variance/mean) of the whole series as the overdispersion
    check.

    Weekday is (epoch_day + 4) % 7 — pure integer arithmetic (1970-01-01
    was a Thursday), never the engine-specific dayofweek() whose origin
    differs between Spark (1=Sunday) and DuckDB (0=Sunday).  Per-group
    squared-sum terms s_g²/n_g are MICRO-QUANTIZED (×10⁶, rounded to
    bigint) before the cross-group sum — the retention_survival
    discipline that keeps a sum of doubles order-independent — and the
    F/η² surface is one fixed double expression of those exact micros.

    Scale shape: facts → calendar-bounded day grid → 7 weekday moment
    rows → 1-row fold; nothing wider than the day grid ever shuffles.
    """
    d = read_table(spark, sf_dir, "orders").groupBy(
        F.expr("datediff(o_orderdate, date '1970-01-01')").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    g = d.groupBy(F.expr("(d + 4) % 7").alias("wd")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("c").cast("bigint").alias("s_g"),
        F.sum(F.expr("cast(c as decimal(38,0)) * c")).alias("ss_g"),
    )
    micro = g.select(
        "n_g",
        "s_g",
        "ss_g",
        F.expr(
            "cast(round(cast(s_g as double) * cast(s_g as double)"
            " / cast(n_g as double) * 1000000.0) as bigint)"
        ).alias("term_micro"),
    )
    tot = micro.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").cast("bigint").alias("s"),
        F.sum("ss_g").alias("ss"),
        F.sum("term_micro").cast("bigint").alias("tm"),
    )
    grand = (
        "cast(s as double) * cast(s as double) / cast(n as double)"
    )
    ssb = f"(cast(tm as double) / 1000000.0 - {grand})"
    ssw = "(cast(ss as double) - cast(tm as double) / 1000000.0)"
    sst = f"(cast(ss as double) - {grand})"
    # degenerate designs (one weekday group, zero within/total variance,
    # or a single day) leave the statistics undefined: NULL on both
    # engines, never an ANSI division error (degenerate sweep, round 8)
    return tot.select(
        F.col("n").alias("n_days"),
        F.expr(
            f"if(k < 2 or n = k or {ssw} = 0, cast(null as double),"
            f" round(({ssb} / (cast(k as double) - 1.0))"
            f" / ({ssw} / (cast(n as double) - cast(k as double))), 6))"
        ).alias("f_stat"),
        F.expr(
            f"if({sst} = 0, cast(null as double),"
            f" round({ssb} / {sst}, 6))"
        ).alias("eta_sq"),
        F.expr(
            f"if(n < 2, cast(null as double),"
            f" round(({sst} / (cast(n as double) - 1.0))"
            " / (cast(s as double) / cast(n as double)), 6))"
        ).alias("fano_dispersion"),
    )


def interevent_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal burstiness B = (σ−μ)/(σ+μ) of per-user inter-event gaps,
    pooled per event type (Goh & Barabási 2008) — B→1 is bursty, B→−1
    metronomic, B≈0 Poisson.  The temporal twin of `term_burstiness`'s
    lexical statistic, and the check that decides whether a Poisson
    rate model (`bloom_fpr_plan`-style closed forms) is even admissible.

    Gaps are exact microsecond integers from a per-user lag window
    (deterministic (us, event_id) order); μ and the POPULATION σ come
    from exact DECIMAL moment sums; B is one fixed double expression
    rounded 6 dp.

    Scale shape: one keyed (user) sort window over facts — the same
    shape as sessionization — then a map-side-combinable per-type
    moment aggregate.
    """
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = (
        ev.withColumn("pus", F.lag("us").over(w))
        .where(F.col("pus").isNotNull())
        .select("event_type", F.expr("us - pus").alias("gap"))
    )
    mom = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum(F.expr("cast(gap as decimal(38,0))")).alias("s"),
        F.sum(F.expr("cast(gap as decimal(38,0)) * gap")).alias("ss"),
    )
    # surfaces are micro-second scale (~4e10): round(x, 6) there is past
    # the double's fractional precision and the engines' fractional
    # rounding algorithms diverge (found as a real sf0.1 mismatch in r7).
    # Mean is an exact integer centi-division; std/burstiness quantize
    # via integer round of a <2^53 scaled double (identical both engines).
    mu = "(cast(s as double) / cast(n_gaps as double))"
    sig = (
        f"sqrt(cast(ss as double) / cast(n_gaps as double)"
        f" - {mu} * {mu})"
    )
    return mom.select(
        "event_type",
        "n_gaps",
        F.expr(
            "cast((s * 100) div n_gaps as bigint) / 1e2"
        ).alias("mean_gap_us"),
        F.expr(f"cast(round({sig} * 1e2) as bigint) / 1e2").alias("std_gap_us"),
        F.expr(
            f"cast(round(({sig} - {mu}) / ({sig} + {mu}) * 1e6) as bigint) / 1e6"
        ).alias("burstiness"),
    )


def markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical entropy rate of the per-user event-type Markov chain:
    H = −Σ_ab p(a,b)·ln p(b|a) over observed transitions — how
    predictable the next action is given the current one, the
    one-number summary of the transition matrix `markov_stationary`
    iterates on (H = 0: deterministic flows; H = ln|types|: uniform).

    Each transition's term (c_ab/C)·ln(c_a/c_ab) is micro-quantized
    (×10⁹ → bigint; ln of a ratio of exact counts) and the cross-cell
    sum is EXACT integer addition — the order-independent double-sum
    discipline — with one division at the surface.  Per-row conditional
    entropies are emitted alongside for drill-down.

    Scale shape: one keyed (user) lag window over facts, a |types|²
    transition aggregate, a |types| marginal join, and a 1-row fold.
    """
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    tr = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .where(F.col("prev").isNotNull())
        .groupBy(F.col("prev").alias("a"), F.col("event_type").alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
    )
    marg = tr.groupBy("a").agg(F.sum("c_ab").cast("bigint").alias("c_a"))
    cells = tr.join(F.broadcast(marg), "a").select(
        "a",
        "b",
        "c_ab",
        "c_a",
        F.expr(
            "cast(round(cast(c_ab as double)"
            " * ln(cast(c_a as double) / cast(c_ab as double))"
            " * 1000000000.0) as bigint)"
        ).alias("nano_term"),
    )
    return cells.agg(
        F.sum("c_ab").cast("bigint").alias("n_transitions"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.round(
            F.expr(
                "cast(sum(nano_term) as double) / 1000000000.0"
                " / cast(sum(c_ab) as double)"
            ),
            6,
        ).alias("entropy_rate_nats"),
    )


def cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic cohort-retention triangle: users grouped by the
    calendar month of their FIRST event (cohort), retention(k) = share
    of the cohort active in cohort-month + k — the product-analytics
    view that `retention_survival`'s Kaplan–Meier curve aggregates
    away (a KM curve cannot show cohort-quality drift; this can).

    Month index is year·12 + month — pure integer arithmetic from the
    timestamp fields both engines extract identically.  Counts are
    exact; retention is one division rounded 6 dp.

    Scale shape: user-keyed min-aggregate (cohort assignment), distinct
    (user, month) activity, one keyed join + (cohort, k) rollup — all
    map-side combinable; output is months² triangle rows.
    """
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("year(ts) * 12 + month(ts)").alias("mi"),
    )
    cohort = ev.groupBy("user_id").agg(F.min("mi").alias("m0"))
    size = cohort.groupBy("m0").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cohort")
    )
    active = (
        ev.distinct()
        .join(cohort, "user_id")
        .groupBy("m0", F.expr("mi - m0").alias("k"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )
    return active.join(F.broadcast(size), "m0").select(
        F.col("m0").alias("cohort_month_idx"),
        F.col("k").cast("int").alias("months_since"),
        "n_active",
        "n_cohort",
        F.round(
            F.expr("cast(n_active as double) / cast(n_cohort as double)"), 6
        ).alias("retention"),
    )


def ratio_metric_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method confidence interval for a RATIO metric (purchase
    revenue per event) per experiment variant — the estimator
    experimentation platforms need because per-user ratios are not
    i.i.d.: Var(ΣX/ΣY) ≈ (Var x − 2R·Cov(x,y) + R²·Var y) / (n·ȳ²)
    over per-user totals (x = purchase cents, y = events).

    All six per-variant moments (Σx, Σy, Σx², Σy², Σxy, n) are exact
    DECIMAL sums of integer cents/counts; R, the standard error, and
    the 95% Wald interval are one fixed double expression each.

    Scale shape: user-keyed rollup then a 2-row variant aggregate —
    both map-side combinable; no window.
    """
    per_user = (
        read_table(spark, sf_dir, "events")
        .groupBy(F.expr("user_id % 2").alias("variant"), F.col("user_id"))
        .agg(
            F.sum(
                F.expr(
                    "if(event_type = 'purchase' and value is not null,"
                    " cast(round(value * 100) as bigint), 0L)"
                )
            ).alias("x"),
            F.count(F.lit(1)).cast("bigint").alias("y"),
        )
    )
    mom = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("cast(x as decimal(38,0))")).alias("sx"),
        F.sum(F.expr("cast(y as decimal(38,0))")).alias("sy"),
        F.sum(F.expr("cast(x as decimal(38,0)) * x")).alias("sxx"),
        F.sum(F.expr("cast(y as decimal(38,0)) * y")).alias("syy"),
        F.sum(F.expr("cast(x as decimal(38,0)) * y")).alias("sxy"),
    )
    nd = "cast(n as double)"
    mx = f"(cast(sx as double) / {nd})"
    my = f"(cast(sy as double) / {nd})"
    ratio = "(cast(sx as double) / cast(sy as double))"
    vx = f"(cast(sxx as double) / {nd} - {mx} * {mx})"
    vy = f"(cast(syy as double) / {nd} - {my} * {my})"
    cxy = f"(cast(sxy as double) / {nd} - {mx} * {my})"
    se = (
        f"sqrt(({vx} - 2.0 * {ratio} * {cxy}"
        f" + {ratio} * {ratio} * {vy}) / ({nd} * {my} * {my}))"
    )
    return mom.select(
        "variant",
        F.col("n").alias("n_users"),
        F.round(F.expr(ratio), 6).alias("cents_per_event"),
        F.round(F.expr(se), 6).alias("se"),
        F.round(F.expr(f"{ratio} - {Z_ALPHA} * {se}"), 6).alias("ci_lo"),
        F.round(F.expr(f"{ratio} + {Z_ALPHA} * {se}"), 6).alias("ci_hi"),
    )


def wasserstein_price_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Wasserstein (earth-mover) distance between the urgent and
    non-urgent order-price distributions — the integral ∫|F_a − F_b|
    that reports HOW FAR mass moved where `ks_price_test`'s sup-norm
    only reports the single worst gap.

    On the distinct-value CDF, W₁ = Σᵢ |ca·n_b − cb·n_a| · (vᵢ₊₁ − vᵢ)
    / (n_a·n_b): the scaled gap × gap-width products are exact wide
    integers (value-domain bounded), summed exactly; ONE division at
    the surface.  Also emits the normalized form W₁ / (max − min).

    Scale shape: identical to ks_price_test — distinct-value CDF window
    + lead(), 1-row broadcast of totals, no fact-side window.
    """
    o = read_table(spark, sf_dir, "orders").select(
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("cents"),
        F.expr(
            "if(o_orderpriority in ('1-URGENT', '2-HIGH'), 1L, 0L)"
        ).alias("is_a"),
    )
    per = o.groupBy("cents").agg(
        F.sum("is_a").cast("bigint").alias("a_n"),
        F.sum(F.expr("1L - is_a")).cast("bigint").alias("b_n"),
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    wl = Window.orderBy("cents")
    cum = per.select(
        "cents",
        F.sum("a_n").over(w).alias("ca"),
        F.sum("b_n").over(w).alias("cb"),
        F.lead("cents").over(wl).alias("next_cents"),
    )
    tot = per.agg(
        F.sum("a_n").cast("bigint").alias("n_a"),
        F.sum("b_n").cast("bigint").alias("n_b"),
        F.min("cents").cast("bigint").alias("v_min"),
        F.max("cents").cast("bigint").alias("v_max"),
    )
    seg = (
        cum.where(F.col("next_cents").isNotNull())
        .crossJoin(F.broadcast(tot))
        .select(
            "n_a",
            "n_b",
            "v_min",
            "v_max",
            F.expr(
                "abs(cast(ca as decimal(38,0)) * n_b"
                " - cast(cb as decimal(38,0)) * n_a)"
                " * (next_cents - cents)"
            ).alias("seg_mass"),
        )
    )
    return seg.groupBy("n_a", "n_b", "v_min", "v_max").agg(
        F.round(
            F.expr(
                "cast(sum(seg_mass) as double)"
                " / (cast(n_a as double) * cast(n_b as double))"
            ),
            6,
        ).alias("w1_cents"),
        F.round(
            F.expr(
                "cast(sum(seg_mass) as double)"
                " / (cast(n_a as double) * cast(n_b as double))"
                " / cast(v_max - v_min as double)"
            ),
            6,
        ).alias("w1_normalized"),
    ).select("n_a", "n_b", "w1_cents", "w1_normalized")


# Cramér's V matrix: categorical dimension pairs over the order/customer
# denormalized row (column, short label)
CRAMER_DIMS = [
    ("o_orderpriority", "priority"),
    ("c_mktsegment", "segment"),
    ("o_orderstatus", "status"),
]


def cramers_v_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Cramér's V over the categorical order dimensions
    (priority × segment × status) — the categorical counterpart of
    `corr_matrix`: V = √(χ² / (n·min(r−1, c−1))) per dimension pair,
    the effect size behind `chi2_independence`'s per-cell terms.

    Each cell's χ² term is computed as one double expression of exact
    marginals, MICRO-QUANTIZED (×10⁶ → bigint) and summed exactly — the
    order-independent cross-cell sum discipline — with the √ and the
    final division applied once per pair.

    Scale shape: one denormalized scan feeds three keyed cell
    aggregates (each |dims|² rows); marginals broadcast back; output is
    3 rows.
    """
    d = (
        read_table(spark, sf_dir, "orders")
        .join(
            F.broadcast(
                read_table(spark, sf_dir, "customer").select(
                    "c_custkey", "c_mktsegment"
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(*[F.col(c).alias(lbl) for c, lbl in CRAMER_DIMS])
        .localCheckpoint()
    )
    outs = []
    labels = [lbl for _, lbl in CRAMER_DIMS]
    for i, a in enumerate(labels):
        for b in labels[i + 1 :]:
            cells = d.groupBy(a, b).agg(
                F.count(F.lit(1)).cast("bigint").alias("o")
            )
            rows = cells.groupBy(a).agg(
                F.sum("o").cast("bigint").alias("rn")
            )
            cols = cells.groupBy(b).agg(
                F.sum("o").cast("bigint").alias("cn")
            )
            tot = cells.agg(
                F.sum("o").cast("bigint").alias("n"),
                F.countDistinct(a).cast("bigint").alias("r"),
                F.countDistinct(b).cast("bigint").alias("c"),
            )
            term = (
                "cast(round(pow(cast(o as double)"
                " - cast(rn as double) * cast(cn as double)"
                "   / cast(n as double), 2)"
                " / (cast(rn as double) * cast(cn as double)"
                "    / cast(n as double)) * 1000000.0) as bigint)"
            )
            per = (
                cells.join(F.broadcast(rows), a)
                .join(F.broadcast(cols), b)
                .crossJoin(F.broadcast(tot))
                .select(
                    "n",
                    "r",
                    "c",
                    F.expr(term).alias("term_micro"),
                )
            )
            outs.append(
                per.groupBy("n", "r", "c")
                .agg(
                    F.sum("term_micro").cast("bigint").alias("tm")
                )
                .select(
                    F.lit(a).alias("dim_x"),
                    F.lit(b).alias("dim_y"),
                    "n",
                    F.round(
                        F.expr("cast(tm as double) / 1000000.0"), 6
                    ).alias("chi2"),
                    # a single-category dimension has min(r-1, c-1) = 0:
                    # V is undefined -> NULL, not an ANSI division error
                    # (degenerate sweep, round 8)
                    F.expr(
                        "if(least(r - 1, c - 1) = 0, cast(null as double),"
                        " round(sqrt(cast(tm as double) / 1000000.0"
                        " / (cast(n as double)"
                        "    * cast(least(r - 1, c - 1) as double))), 6))"
                    ).alias("cramers_v"),
                )
            )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


HIST_CBRT = "cast(0.3333333333333333 as double)"


def optimal_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram bin-count planning for the two money measures (order
    price, event value): Freedman–Diaconis (2·IQR/n^⅓ bin width) next
    to Sturges (⌈log₂n⌉+1) — what a dashboard or data-profiler layer
    computes before rendering a distribution at 100 TB (the answer
    decides the width of the ONE aggregation pass that builds the
    histogram).

    Quartiles via the bit-identical percentile/quantile_cont
    interpolation; the cube root is pow(n, 0.3333333333333333) with the
    exponent pinned as an explicit double literal on both engines
    (never 1/3, whose decimal-division value differs by parser); bin
    counts ceil to bigints, NULL when IQR = 0.

    Scale shape: two 1-row aggregates (percentile buffers are
    value-domain bounded at the reporting grain).
    """
    parts = []
    for label, table, expr_ in (
        ("order_price", "orders", "cast(round(o_totalprice * 100) as bigint)"),
        ("event_value", "events", "cast(round(value * 100) as bigint)"),
    ):
        src = read_table(spark, sf_dir, table).select(
            F.expr(expr_).alias("v")
        ).where(F.col("v").isNotNull())
        agg = src.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("v").cast("bigint").alias("v_min"),
            F.max("v").cast("bigint").alias("v_max"),
            F.expr("percentile(v, 0.25)").alias("q1"),
            F.expr("percentile(v, 0.75)").alias("q3"),
        )
        h = f"(2.0 * (q3 - q1) / pow(cast(n as double), {HIST_CBRT}))"
        parts.append(
            agg.select(
                F.lit(label).alias("measure"),
                "n",
                "v_min",
                "v_max",
                F.round(F.expr("q3 - q1"), 6).alias("iqr"),
                F.expr(
                    f"if(q3 - q1 = 0.0, null,"
                    f" cast(ceil(cast(v_max - v_min as double) / {h})"
                    f" as bigint))"
                ).alias("bins_fd"),
                F.expr(
                    "cast(ceil(ln(cast(n as double)) /"
                    " ln(cast(2 as double))) + 1 as bigint)"
                ).alias("bins_sturges"),
            )
        )
    return parts[0].unionByName(parts[1])


P_CHART_SIGMA = "3.0"


def p_chart_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-process-control p-chart over the daily purchase
    share: per-day proportion with 3σ binomial control limits around
    the overall rate (limits vary with the day's sample size) and an
    out-of-control flag — the Shewhart companion to
    `cusum_daily_counts`' drift detector and `sprt_monitor`'s
    sequential test (Shewhart catches big single-day shifts; CUSUM
    catches small sustained ones).

    Counts are exact; p̂, p̄, and the limits are fixed double
    expressions (clamped to [0, 1]); the flag compares the UNROUNDED
    expressions so display rounding cannot flip it.

    Scale shape: one keyed daily aggregate + a 1-row broadcast of the
    center line.
    """
    d = read_table(spark, sf_dir, "events").groupBy(
        F.expr("cast(unix_micros(ts) div 86400000000 as bigint)").alias("d")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("if(event_type = 'purchase', 1L, 0L)"))
        .cast("bigint")
        .alias("x"),
    )
    tot = d.agg(
        F.sum("n").cast("bigint").alias("tn"),
        F.sum("x").cast("bigint").alias("tx"),
    )
    pbar = "(cast(tx as double) / cast(tn as double))"
    half = (
        f"({P_CHART_SIGMA} * sqrt({pbar} * (1.0 - {pbar})"
        " / cast(n as double)))"
    )
    phat = "(cast(x as double) / cast(n as double))"
    return d.crossJoin(F.broadcast(tot)).select(
        "d",
        "n",
        "x",
        F.round(F.expr(phat), 6).alias("p_hat"),
        F.round(F.expr(pbar), 6).alias("p_bar"),
        F.round(F.expr(f"greatest(0.0, {pbar} - {half})"), 6).alias("lcl"),
        F.round(F.expr(f"least(1.0, {pbar} + {half})"), 6).alias("ucl"),
        F.expr(
            f"{phat} < greatest(0.0, {pbar} - {half})"
            f" or {phat} > least(1.0, {pbar} + {half})"
        ).alias("out_of_control"),
    )


CWS_WINDOWS_DAYS = (1, 3, 7, 14)


def conversion_window_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion at four attribution-window widths —
    the sensitivity sweep that decides how long a conversion window the
    funnel metrics (`window_funnel`, `promo_attribution`) should use:
    report the rate at 1/3/7/14 days and let the elbow pick.

    Per user: first signup time t0 (exact µs), earliest purchase delay
    dt = min(purchase_us − t0 > 0); each window's conversion is an
    exact conditional count over dt.  One user-keyed aggregate, one
    4-way literal unpivot.

    Scale shape: two keyed user aggregates + a broadcast join; the
    window sweep is arithmetic on the already-aggregated delays.
    """
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
    )
    t0s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("us").alias("t0"))
    )
    dts = (
        ev.where(F.col("event_type") == "purchase")
        .join(t0s, "user_id")
        .where(F.col("us") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min(F.expr("us - t0")).alias("dt"))
    )
    base = t0s.join(dts, "user_id", "left")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_users")]
    for wd in CWS_WINDOWS_DAYS:
        us = wd * 86_400 * 1_000_000
        aggs.append(
            F.sum(
                F.expr(f"if(dt is not null and dt <= {us}, 1L, 0L)")
            ).cast("bigint").alias(f"c_{wd}")
        )
    flat = base.agg(*aggs)
    stack = ", ".join(f"{wd}, c_{wd}" for wd in CWS_WINDOWS_DAYS)
    return flat.selectExpr(
        "n_users",
        f"stack({len(CWS_WINDOWS_DAYS)}, {stack})"
        " as (window_days, n_converted)",
    ).select(
        F.col("window_days").cast("int").alias("window_days"),
        "n_users",
        "n_converted",
        F.round(
            F.expr(
                "cast(n_converted as double) / cast(n_users as double)"
            ),
            6,
        ).alias("conversion"),
    )


def kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall τ-b between daily order count and daily revenue — the
    fully tie-aware rank association completing the correlation shelf
    (Pearson `corr_matrix`, Spearman `spearman_price_qty`): τ-b counts
    concordant/discordant day pairs, so it is EXACT integer arithmetic
    end to end, no ranks needed.

    S = C − D over all day pairs; τ_b = S / √((n₀−n₁)(n₀−n₂)) with the
    standard tie terms — every count a bigint, the denominator one
    double √ at the surface.

    Scale shape: facts collapse to the calendar-bounded day grid; the
    pair join broadcasts the grid against itself (days², fact-size
    independent).
    """
    d = read_table(spark, sf_dir, "orders").groupBy(
        F.expr("datediff(o_orderdate, date '1970-01-01')").alias("d")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("x"),
        F.sum(F.expr("cast(round(o_totalprice * 100) as bigint)"))
        .cast("bigint")
        .alias("y"),
    )
    a = d.select(
        F.col("d").alias("da"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = d.select(
        F.col("d").alias("db"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    # sign(Δx)·sign(Δy), never sign(Δx·Δy): the cross product of a count
    # delta and a cents delta overflows int64 at fact scale (and Spark's
    # ANSI mode throws on overflow rather than wrapping)
    pairs = a.join(F.broadcast(b), F.col("db") > F.col("da")).select(
        F.expr(
            "cast(sign(xb - xa) as bigint)"
            " * cast(sign(yb - ya) as bigint)"
        ).alias("cmp")
    )
    cd = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n0"),
        F.sum(F.expr("if(cmp = 1, 1L, 0L)")).cast("bigint").alias("c"),
        F.sum(F.expr("if(cmp = -1, 1L, 0L)")).cast("bigint").alias("dd"),
    )
    tx = (
        d.groupBy("x")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(F.expr("t * (t - 1) div 2")).cast("bigint").alias("n1")
        )
    )
    ty = (
        d.groupBy("y")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(F.expr("t * (t - 1) div 2")).cast("bigint").alias("n2")
        )
    )
    return (
        cd.crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .select(
            "n0",
            F.expr("c - dd").alias("s"),
            "n1",
            "n2",
            F.round(
                F.expr(
                    "cast(c - dd as double)"
                    " / sqrt(cast(n0 - n1 as double)"
                    "        * cast(n0 - n2 as double))"
                ),
                6,
            ).alias("tau_b"),
        )
    )


def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall monotone-trend test on the daily order-count
    series: S = Σ_{i<j} sign(x_j − x_i) with the tie-corrected variance
    (n(n−1)(2n+5) − Σt(t−1)(2t+5))/18 and the continuity-corrected z —
    the nonparametric significance test for the direction
    `theilsen_daily_trend` estimates.

    S, n, and the tie sum are exact integers; z is one fixed double
    expression (S shifted toward zero by 1 per the standard
    correction).

    Scale shape: day-grid pair join (calendar-bounded broadcast) + a
    distinct-count tie rollup.
    """
    d = read_table(spark, sf_dir, "orders").groupBy(
        F.expr("datediff(o_orderdate, date '1970-01-01')").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    a = d.select(F.col("d").alias("da"), F.col("x").alias("xa"))
    b = d.select(F.col("d").alias("db"), F.col("x").alias("xb"))
    s = (
        a.join(F.broadcast(b), F.col("db") > F.col("da"))
        .agg(
            F.sum(F.expr("cast(sign(xb - xa) as bigint)"))
            .cast("bigint")
            .alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n0"),
        )
    )
    ties = (
        d.groupBy("x")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.expr("t * (t - 1) * (2 * t + 5)"))
            .cast("bigint")
            .alias("tsum"),
            F.sum("t").cast("bigint").alias("nd"),
        )
    )
    var = (
        "(cast(nd as double) * (cast(nd as double) - 1.0)"
        " * (2.0 * cast(nd as double) + 5.0)"
        " - cast(tsum as double)) / 18.0"
    )
    z = (
        f"case when s > 0 then (cast(s as double) - 1.0) / sqrt({var})"
        f" when s < 0 then (cast(s as double) + 1.0) / sqrt({var})"
        f" else 0.0 end"
    )
    return s.crossJoin(F.broadcast(ties)).select(
        F.col("nd").alias("n_days"),
        "s",
        F.round(F.expr(var), 6).alias("var_s"),
        F.round(F.expr(z), 6).alias("z_stat"),
    )


HILL_K = 200


def hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the order-revenue tail index over the top
    HILL_K order statistics: α̂ = K / Σᵢ ln(xᵢ/x₍K+1₎) — the heavy-tail
    exponent behind `degree_powerlaw_fit`'s graph version, here for
    money amounts (is revenue Pareto, and how fat?).

    The (K+1)-th order statistic is found on the distinct-value
    DESCENDING CDF (an integer containment decision, tie-exact:
    boundary rows contribute ln(thr/thr) = 0, so only v > thr terms
    matter).  Each value's ln(v/thr) term is nano-quantized and
    multiplied by its exact count, summed as exact integers; the final
    α is one division.

    Scale shape: distinct-value CDF window (value-domain bounded) + a
    1-row fold; no fact-side sort.
    """
    o = read_table(spark, sf_dir, "orders").select(
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("cents")
    )
    per = o.groupBy("cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("t")
    )
    w = (
        Window.orderBy(F.col("cents").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = per.withColumn("cumd", F.sum("t").over(w))
    thr = (
        cum.where(
            (F.col("cumd") - F.col("t") < F.lit(HILL_K + 1))
            & (F.lit(HILL_K + 1) <= F.col("cumd"))
        )
        .select(F.col("cents").alias("thr"))
    )
    terms = (
        per.crossJoin(F.broadcast(thr))
        .where(F.col("cents") > F.col("thr"))
        .select(
            "thr",
            F.expr(
                "t * cast(round(ln(cast(cents as double)"
                " / cast(thr as double)) * 1000000000.0) as bigint)"
            ).alias("nano"),
            "t",
        )
    )
    return terms.groupBy("thr").agg(
        F.sum("t").cast("bigint").alias("n_exceed"),
        F.round(
            F.expr(
                f"{HILL_K}.0 / (cast(sum(nano) as double) / 1000000000.0)"
            ),
            6,
        ).alias("hill_alpha"),
    ).select(
        F.col("thr").alias("threshold_cents"), "n_exceed", "hill_alpha"
    )


def negbin_fit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-binomial method-of-moments fit of lines-per-order: the
    overdispersed count model (r = μ²/(σ²−μ), p = r/(r+μ)) with the
    dispersion index — the model-selection read on top of
    `weekday_anova`'s Fano ratio: σ²/μ ≈ 1 says Poisson is enough,
    > 1 says negative binomial (and r says how far).

    Moments are exact integers (order line counts); every fitted
    parameter is one fixed double expression; NULL when the data is
    under-dispersed (σ² ≤ μ — MoM undefined).

    Scale shape: one keyed count aggregate (orders) + a 1-row moment
    fold.
    """
    per = read_table(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    mom = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.expr("cast(x as decimal(38,0)) * x")).alias("ss"),
    )
    mu = "(cast(s as double) / cast(n as double))"
    v = f"(cast(ss as double) / cast(n as double) - {mu} * {mu})"
    r = f"({mu} * {mu} / nullif({v} - {mu}, 0.0))"
    return mom.select(
        "n",
        F.round(F.expr(mu), 6).alias("mean_lines"),
        F.round(F.expr(v), 6).alias("var_lines"),
        F.round(F.expr(f"{v} / {mu}"), 6).alias("dispersion_index"),
        F.round(
            F.expr(f"if({v} <= {mu}, null, {r})"), 6
        ).alias("nb_r"),
        F.round(
            F.expr(f"if({v} <= {mu}, null, {r} / ({r} + {mu}))"), 6
        ).alias("nb_p"),
    )


DP_EPS_GRID = (0.1, 0.5, 1.0, 2.0)
DP_ERR_T = "10.0"


def dp_laplace_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy noise planning for a daily-event-count
    release: the L1 sensitivity is measured FROM THE DATA (the max
    events one user contributes to one day — the quantity a bounded-
    contribution pipeline must clamp), then for each ε candidate the
    Laplace scale b = Δ/ε, the expected absolute noise (= b), and
    P(|noise| > 10 counts) = e^(−10/b) — the utility-vs-privacy curve
    read before choosing ε.  The planning shelf next to
    `k_anonymity_audit`/`l_diversity_audit`'s syntactic checks.

    Sensitivity is an exact integer max; each grid row is one fixed
    double expression of it and literal constants.

    Scale shape: one (user, day)-keyed count + max aggregate × a 4-row
    literal grid.
    """
    sens = (
        read_table(spark, sf_dir, "events")
        .groupBy(
            "user_id",
            F.expr("cast(unix_micros(ts) div 86400000000 as bigint)").alias(
                "d"
            ),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .agg(F.max("c").cast("bigint").alias("sensitivity"))
    )
    grid = sens.select(
        "sensitivity",
        F.explode(
            F.array(*[F.lit(e) for e in DP_EPS_GRID])
        ).alias("epsilon"),
    )
    b = "(cast(sensitivity as double) / epsilon)"
    return grid.select(
        F.col("epsilon"),
        "sensitivity",
        F.round(F.expr(b), 6).alias("laplace_scale"),
        F.round(F.expr(f"exp(-{DP_ERR_T} / {b})"), 6).alias(
            "p_err_gt_10"
        ),
    )


def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Freedman–Diaconis histogram itself (bins_fd from
    `optimal_histogram_bins`, realized): equal-width bins over order
    price with per-bin counts — the ONE aggregation pass the profiler
    plan promised, exactly as wide as the FD rule says.

    Bin width h = (max−min)/bins is a fixed double expression of exact
    integers; assignment least(bins−1, floor((v−min)/h)) is identical
    IEEE arithmetic in both engines.

    Scale shape: the stats pass is a 1-row aggregate broadcast into a
    per-row bin expression; the histogram is one keyed count — two
    scans total, both column-pruned to the measure.
    """
    o = read_table(spark, sf_dir, "orders").select(
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("v")
    )
    st_ = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("v").cast("bigint").alias("v_min"),
        F.max("v").cast("bigint").alias("v_max"),
        F.expr("percentile(v, 0.25)").alias("q1"),
        F.expr("percentile(v, 0.75)").alias("q3"),
    )
    h = f"(2.0 * (q3 - q1) / pow(cast(n as double), {HIST_CBRT}))"
    # a constant-price corpus has IQR 0 / zero range: the FD rule is
    # undefined there, so the histogram collapses to ONE bin on both
    # engines instead of an ANSI division error (degenerate sweep, r8)
    bins = (
        f"if(q3 = q1 or v_max = v_min, 1L,"
        f" cast(ceil(cast(v_max - v_min as double) / {h}) as bigint))"
    )
    binned = o.crossJoin(F.broadcast(st_)).select(
        "v_min",
        "v_max",
        F.expr(bins).alias("n_bins"),
        F.expr(
            f"if({bins} = 1, 0L,"
            f" least({bins} - 1,"
            f" cast(floor(cast(v - v_min as double)"
            f" / (cast(v_max - v_min as double) / {bins})) as bigint)))"
        ).alias("bin"),
    )
    return binned.groupBy("bin", "v_min", "v_max", "n_bins").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    ).select(
        "bin",
        "n_bins",
        F.round(
            F.expr(
                "cast(v_min as double) + bin"
                " * (cast(v_max - v_min as double)"
                " / cast(n_bins as double))"
            ),
            6,
        ).alias("bin_lo_cents"),
        "cnt",
    )


AMS_K = 16


def ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS second-frequency-moment sketch (Alon–Matias–Szegedy 1996)
    over the event user stream: K estimators Zₖ = Σᵤ sₖ(u)·fᵤ with md5
    sign hashes sₖ ∈ {−1, +1}; each Zₖ² is an unbiased F₂ estimate and
    the mean is the sketch's answer — reported NEXT TO the exact
    F₂ = Σfᵤ² and the relative error, so the operator is its own
    accuracy audit (the sketch shelf's frequency-moment member beside
    HLL's F₀ and CMS's point counts).

    The sign of estimator k for user u is the low bit of
    md5(k || '|' || u) — deterministic, engine-portable, and the reason
    this sketch is oracle-checkable at all.  All sums are exact
    integers; the estimate and error are fixed double expressions.

    Scale shape: one user-keyed count, a K-way literal explode of the
    (user, count) table (K·users rows, keyed sum — map-side
    combinable), and exact F₂ from the same base.
    """
    per = read_table(spark, sf_dir, "events").groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("f")
    )
    exact = per.agg(
        F.sum(F.expr("cast(f as decimal(38,0)) * f")).alias("f2_exact"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
    )
    ks = per.select(
        "user_id",
        "f",
        F.explode(
            F.array(*[F.lit(int(k)) for k in range(AMS_K)])
        ).alias("k"),
    )
    signed = ks.select(
        "k",
        F.expr(
            "if(conv(substring(md5(concat(cast(k as string), '|',"
            " cast(user_id as string))), 32, 1), 16, 10) % 2 = 0,"
            " f, -f)"
        ).alias("sf"),
    )
    z = signed.groupBy("k").agg(F.sum("sf").cast("bigint").alias("z"))
    est = z.agg(
        F.sum(F.expr("cast(z as decimal(38,0)) * z")).alias("zz"),
        F.count(F.lit(1)).cast("bigint").alias("kk"),
    )
    return est.crossJoin(F.broadcast(exact)).select(
        F.col("n_users"),
        F.expr("cast(f2_exact as bigint)").alias("f2_exact"),
        F.round(
            F.expr("cast(zz as double) / cast(kk as double)"), 6
        ).alias("f2_estimate"),
        F.round(
            F.expr(
                "abs(cast(zz as double) / cast(kk as double)"
                " - cast(f2_exact as double))"
                " / cast(f2_exact as double)"
            ),
            6,
        ).alias("rel_error"),
    )


ISO_BINS = 20
PACF_LAGS = (1, 2, 3)
# Durbin-Levinson closed forms over the lag-1..3 autocorrelations —
# shared with the DuckDB oracle so both engines evaluate the identical
# double expression tree over identically-derived r1/r2/r3.
PACF_PHI22 = "((r2 - r1 * r1) / (1.0 - r1 * r1))"
_PACF_PHI21 = f"(r1 * (1.0 - {PACF_PHI22}))"
PACF_PHI33 = (
    f"((r3 - {_PACF_PHI21} * r2 - {PACF_PHI22} * r1)"
    f" / (1.0 - {_PACF_PHI21} * r1 - {PACF_PHI22} * r2))"
)
ABSORB_STEPS = 8
ABSORB_TARGET = "purchase"


def isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic regression (PAVA fit) of the high-priority share over
    order-price bins — the calibration step a classifier pipeline runs
    between raw scores and decisions (Zadrozny & Elkan 2002): the
    monotone step function closest (L2) to the per-bin rates.

    Instead of the sequential pool-adjacent-violators sweep, the fit is
    computed by PAVA's minimax characterization — g(t) = max_{i<=t}
    min_{j>=t} mean(y_i..y_j) — which is pure joins/aggregates over the
    BIN-indexed prefix sums, so the whole fit is declarative (no UDF,
    no driver loop).  Bin assignment is exact integer arithmetic
    ((v - v_min) div w with w = span div B + 1); every prefix sum is an
    exact bigint; segment means are single double divisions of exact
    integers, so min/max comparisons agree bit-for-bit across engines.

    Scale shape: one fact pass to a B-row bin table (B = 20); the
    minimax runs over O(B^2) segment means joined to a B-row grid —
    driver-free and broadcast-sized regardless of fact scale.
    """
    o = read_table(spark, sf_dir, "orders").select(
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("v"),
        F.expr(
            "if(o_orderpriority in ('1-URGENT', '2-HIGH'), 1L, 0L)"
        ).alias("y"),
    )
    st_ = o.agg(
        F.min("v").cast("bigint").alias("v_min"),
        F.max("v").cast("bigint").alias("v_max"),
    )
    bins = (
        o.crossJoin(F.broadcast(st_))
        .select(
            F.expr(
                f"(v - v_min) div ((v_max - v_min) div {ISO_BINS} + 1)"
            ).alias("bin"),
            "y",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("s"),
        )
    )
    w = Window.orderBy("bin")
    cum = bins.select(
        "bin",
        "n",
        "s",
        F.row_number().over(w).alias("r"),
        F.sum("n").over(w).cast("bigint").alias("cn"),
        F.sum("s").over(w).cast("bigint").alias("cs"),
    )
    lo = cum.select(
        F.col("r").alias("i0"), F.col("cn").alias("n0"), F.col("cs").alias("s0")
    ).unionByName(
        spark.range(1).select(
            F.lit(0).alias("i0"),
            F.lit(0).cast("bigint").alias("n0"),
            F.lit(0).cast("bigint").alias("s0"),
        )
    )
    seg = (
        cum.select(
            F.col("r").alias("j"), F.col("cn").alias("nj"), F.col("cs").alias("sj")
        )
        .join(F.broadcast(lo), F.expr("i0 < j"))
        .select(
            F.expr("i0 + 1").alias("i"),
            "j",
            F.expr(
                "cast(sj - s0 as double) / cast(nj - n0 as double)"
            ).alias("avg_ij"),
        )
    )
    grid = cum.select(F.col("r").alias("t"), "bin", "n", "s")
    inner = (
        seg.join(F.broadcast(grid.select("t")), F.expr("i <= t and j >= t"))
        .groupBy("t", "i")
        .agg(F.min("avg_ij").alias("mn"))
    )
    iso = inner.groupBy("t").agg(F.max("mn").alias("iso"))
    return (
        grid.join(iso, "t")
        .select(
            "bin",
            "n",
            F.round(F.expr("cast(s as double) / cast(n as double)"), 6).alias(
                "raw_rate"
            ),
            F.round(F.col("iso"), 6).alias("iso_rate"),
        )
    )


def pacf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of the daily order-count series at lags
    1-3 via the Durbin-Levinson recursion unrolled to closed form —
    the AR-order selection read next to `autocorrelation_daily`'s ACF
    (an AR(p) series shows PACF cutting off after lag p while the ACF
    tails; together they pick the forecast model family).

    Each lag's autocorrelation is the pairwise-complete Pearson over
    the sparse day grid (exact integer moments, the ACF_LAGS
    discipline, documented deviation from the equal-n textbook form);
    phi_22/phi_33 are fixed double expressions of r1..r3 shared
    verbatim with the oracle.

    Scale shape: calendar-bounded day grid, 3-way literal lag explode,
    one broadcast self-join, one 3-row moment aggregate folded to a
    single row.
    """
    d = read_table(spark, sf_dir, "orders").groupBy(
        F.expr("datediff(o_orderdate, date '1970-01-01')").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    lags = d.select(
        "d",
        "c",
        F.explode(F.array(*[F.lit(k) for k in PACF_LAGS])).alias("lag"),
    )
    prev = d.select(F.col("d").alias("dp"), F.col("c").alias("cp"))
    j = lags.join(F.broadcast(prev), F.expr("dp = d - lag")).select(
        "lag", "c", "cp"
    )
    mom = j.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("cast(c as decimal(38,0))")).alias("s_a"),
        F.sum(F.expr("cast(cp as decimal(38,0))")).alias("s_b"),
        F.sum(F.expr("cast(c as decimal(38,0)) * c")).alias("ss_a"),
        F.sum(F.expr("cast(cp as decimal(38,0)) * cp")).alias("ss_b"),
        F.sum(F.expr("cast(c as decimal(38,0)) * cp")).alias("sx_a_b"),
    )
    r = mom.select("lag", F.expr(corr_pair_expr("a", "b")).alias("r"))
    piv = r.agg(
        *[
            F.max(F.expr(f"if(lag = {k}, r, null)")).alias(f"r{k}")
            for k in PACF_LAGS
        ]
    )
    return piv.select(
        F.round("r1", 6).alias("acf_1"),
        F.round("r2", 6).alias("acf_2"),
        F.round("r3", 6).alias("acf_3"),
        F.round("r1", 6).alias("pacf_1"),
        F.round(F.expr(PACF_PHI22), 6).alias("pacf_2"),
        F.round(F.expr(PACF_PHI33), 6).alias("pacf_3"),
    )


def markov_absorption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absorption probability of the per-user event-type Markov chain:
    for every current state, the probability of reaching a purchase
    within ABSORB_STEPS transitions under the empirical transition
    matrix — the "how close is this state to converting" companion to
    `markov_stationary`'s long-run occupancy and
    `markov_entropy_rate`'s predictability number.

    The value iteration h_{k+1}(a) = sum_b T(a,b) * (b = target ? 1 :
    h_k(b)) runs entirely in quantized integer space: h is carried as
    nano-probability bigints, each step's numerator sum_b c_ab * h_b is
    an EXACT bigint sum (order-independent), and the single division by
    c_a re-rounds to integer nanos — so all ABSORB_STEPS iterations are
    bit-identical across engines and the oracle can unroll them as
    CTEs.

    Scale shape: one keyed lag window over facts to a |types|^2
    transition table; the value iteration then collapses the
    |types|-bounded matrix to ONE array row and runs all ABSORB_STEPS
    rounds inside a single `aggregate(sequence(...))` higher-order
    expression (the `_ma_absorption_all` / ewma fold idiom — round 8:
    was 8 broadcast-join jobs per run, now one codegen'd fold; the
    inner numerator stays an EXACT bigint sum so collect_list order
    cannot matter, and the per-round rounded division is byte-identical
    to the join form and the oracle's unrolled CTEs).  Scan count over
    the largest fact table: 1.
    """
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    tr = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .where(F.col("prev").isNotNull())
        .groupBy(F.col("prev").alias("a"), F.col("event_type").alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
    )
    packed = tr.agg(F.collect_list(F.struct("a", "b", "c_ab")).alias("m"))
    # state vector = sorted distinct source states with their exact
    # out-degree; h carried as nano-probability bigints, init 0
    init = (
        "transform(array_sort(array_distinct(transform(m, e -> e.a))),"
        " a -> named_struct('st', a,"
        " 'c_a', aggregate(filter(m, e -> e.a = a), 0L,"
        " (n, e) -> n + e.c_ab), 'h', 0L))"
    )
    step = (
        "transform(acc, x -> named_struct('st', x.st, 'c_a', x.c_a, 'h',"
        " cast(round(cast(aggregate(filter(m, e -> e.a = x.st), 0L,"
        f" (n, e) -> n + e.c_ab * IF(e.b = '{ABSORB_TARGET}', 1000000000L,"
        " coalesce(try_element_at(filter(acc, y -> y.st = e.b), 1).h, 0L))) as double)"
        " / cast(x.c_a as double)) as bigint)))"
    )
    fold = f"aggregate(sequence(1, {ABSORB_STEPS}), {init}, (acc, i) -> {step})"
    return (
        packed.select(F.explode(F.expr(fold)).alias("r"))
        .select(
            F.col("r.st").alias("state"),
            F.col("r.c_a").alias("n_out"),
            F.round(
                F.expr("cast(r.h as double) / 1000000000.0"), 6
            ).alias(f"p_absorb_{ABSORB_STEPS}"),
        )
    )


# ---------- Welch t-test (shared expression trees) ----------
#
# All expressions below are format strings over the pivoted exact-integer
# moment columns (n_a, s_a, ss_a, n_b, s_b, ss_b); the oracle imports
# them and instantiates with big='HUGEINT' so both engines evaluate the
# identical double expression tree over identical integers.

def welch_mean_expr(g: str) -> str:
    return f"(cast(s_{g} as double) / cast(n_{g} as double))"


def welch_var_expr(g: str, big: str) -> str:
    """Unbiased sample variance from exact integer moments."""
    return (
        f"(cast(cast(n_{g} as {big}) * ss_{g} - cast(s_{g} as {big}) * s_{g}"
        f" as double) / (cast(n_{g} as double) * cast(n_{g} - 1 as double)))"
    )


def welch_se2_expr(big: str) -> str:
    return (
        f"({welch_var_expr('a', big)} / cast(n_a as double)"
        f" + {welch_var_expr('b', big)} / cast(n_b as double))"
    )


def welch_t_expr(big: str) -> str:
    # guard WHENs are separate clauses (not OR'd) so the se2 probe never
    # evaluates while an arm has n < 2 -- its (n-1) division would raise
    # under ANSI before the guard could apply (degenerate sweep, round 8)
    return (
        f"(CASE WHEN n_a < 2 OR n_b < 2 THEN NULL"
        f" WHEN {welch_se2_expr(big)} = 0 THEN NULL"
        f" ELSE (({welch_mean_expr('a')} - {welch_mean_expr('b')})"
        f" / sqrt({welch_se2_expr(big)})) END)"
    )


def welch_df_expr(big: str) -> str:
    """Welch-Satterthwaite effective degrees of freedom (NULL when an arm
    has n < 2 or both arms are zero-variance -- same guard discipline as
    welch_t_expr)."""
    va_n = f"({welch_var_expr('a', big)} / cast(n_a as double))"
    vb_n = f"({welch_var_expr('b', big)} / cast(n_b as double))"
    se2 = welch_se2_expr(big)
    return (
        f"(CASE WHEN n_a < 2 OR n_b < 2 THEN NULL"
        f" WHEN {se2} = 0 THEN NULL"
        f" ELSE (({se2} * {se2}) / ({va_n} * {va_n} / cast(n_a - 1 as double)"
        f" + {vb_n} * {vb_n} / cast(n_b - 1 as double))) END)"
    )


def welch_ttest_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between purchase and click event
    values — the default two-sample mean test (Welch 1947): unlike the
    pooled-variance Student t it stays calibrated when the two arms have
    different spreads and sizes, which real event values always do.  The
    Satterthwaite df says which t distribution the statistic should be
    referred to.  Completes the location-test shelf next to the exact
    z (`conversion_ztest`), rank (`mannwhitney_value_test`) and
    distribution (`ks_price_test` / `wasserstein_price_shift`) tests.

    Determinism: values enter as exact integer cents; each arm's three
    moments (n, Σx, Σx²) are exact wide integers; mean/variance/t/df are
    ONE shared double expression tree (module constants, imported by the
    oracle) over those integers — bit-identical across engines.

    Scale shape: one fact scan folded to a 2-row moment aggregate,
    pivoted to a single row; the test itself is O(1).
    """
    ev = read_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click")
    ).select(
        F.expr("if(event_type = 'purchase', 'a', 'b')").alias("g"),
        F.expr("cast(floor(value * 100) as bigint)").alias("cents"),
    )
    mom = ev.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("cast(cents as decimal(38,0))")).alias("s"),
        F.sum(F.expr("cast(cents as decimal(38,0)) * cents")).alias("ss"),
    )
    piv = mom.agg(
        *[
            F.max(F.expr(f"if(g = '{g}', {c}, null)")).alias(f"{c}_{g}")
            for g in ("a", "b")
            for c in ("n", "s", "ss")
        ]
    )
    big = "decimal(38,0)"
    return piv.select(
        F.col("n_a").alias("n_purchase"),
        F.col("n_b").alias("n_click"),
        F.round(F.expr(welch_mean_expr("a")), 6).alias("mean_purchase"),
        F.round(F.expr(welch_mean_expr("b")), 6).alias("mean_click"),
        F.round(F.expr(welch_t_expr(big)), 6).alias("t_welch"),
        F.round(F.expr(welch_df_expr(big)), 6).alias("df_welch"),
    )


# ---------- Jarque-Bera normality (shared expression trees) ----------
#
# Central moments from raw power sums; cents² is computed as an exact
# bigint FIRST (c ≤ ~6e7 so c² < 2⁶³) and only the wide casts ride the
# aggregation, keeping Σc³/Σc⁴ exact at any SF that fits 38 digits.

_JB_ND = "cast(n as double)"
_JB_MU = f"(cast(s1 as double) / {_JB_ND})"
JB_M2 = f"(cast(s2 as double) / {_JB_ND} - {_JB_MU} * {_JB_MU})"
JB_M3 = (
    f"(cast(s3 as double) / {_JB_ND}"
    f" - 3.0 * {_JB_MU} * (cast(s2 as double) / {_JB_ND})"
    f" + 2.0 * {_JB_MU} * {_JB_MU} * {_JB_MU})"
)
JB_M4 = (
    f"(cast(s4 as double) / {_JB_ND}"
    f" - 4.0 * {_JB_MU} * (cast(s3 as double) / {_JB_ND})"
    f" + 6.0 * {_JB_MU} * {_JB_MU} * (cast(s2 as double) / {_JB_ND})"
    f" - 3.0 * {_JB_MU} * {_JB_MU} * {_JB_MU} * {_JB_MU})"
)
# a zero-variance group (all values identical) leaves skew/kurtosis
# undefined: NULL on both engines (the oracle imports these strings, so
# the guard pairs by construction) -- degenerate sweep, round 8
JB_SKEW = f"(CASE WHEN {JB_M2} = 0 THEN NULL ELSE ({JB_M3} / ({JB_M2} * sqrt({JB_M2}))) END)"
JB_KURT = f"(CASE WHEN {JB_M2} = 0 THEN NULL ELSE ({JB_M4} / ({JB_M2} * {JB_M2}) - 3.0) END)"
JB_STAT = (
    f"({_JB_ND} / 6.0 * ({JB_SKEW} * {JB_SKEW}"
    f" + {JB_KURT} * {JB_KURT} / 4.0))"
)


def jarque_bera_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test of order totals per priority class —
    skewness and excess kurtosis from exact raw moments plus the omnibus
    JB = n/6·(g₁² + g₂²/4) statistic (χ²₂ under normality).  The
    model-assumption audit read before trusting the t/z family on a
    measure: heavy tails here say "use the rank or robust tests".

    Determinism: cents are exact integers; c² is an exact bigint before
    the wide-integer power sums (Σc, Σc², Σc³, Σc⁴ all exact); the
    skew/kurt/JB surface is one shared double expression tree (module
    constants, oracle-imported) over those integers.

    Scale shape: one scan, one |priorities|-row moment aggregate; the
    statistics are O(1) per group.
    """
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("c"),
        F.expr(
            "cast(round(o_totalprice * 100) as bigint)"
            " * cast(round(o_totalprice * 100) as bigint)"
        ).alias("c2"),
    )
    mom = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("cast(c as decimal(38,0))")).alias("s1"),
        F.sum(F.expr("cast(c2 as decimal(38,0))")).alias("s2"),
        F.sum(F.expr("cast(c2 as decimal(38,0)) * c")).alias("s3"),
        F.sum(F.expr("cast(c2 as decimal(38,0)) * c2")).alias("s4"),
    )
    return mom.select(
        F.col("o_orderpriority").alias("priority"),
        "n",
        F.round(F.expr(JB_SKEW), 6).alias("skewness"),
        F.round(F.expr(JB_KURT), 6).alias("excess_kurtosis"),
        F.round(F.expr(JB_STAT), 6).alias("jb_stat"),
    )


# ---------- Wilson score interval (shared expression trees) ----------

_WZ2 = "(1.96 * 1.96)"


def wilson_p_expr(sfx: str = "") -> str:
    return f"(cast(x{sfx} as double) / cast(n{sfx} as double))"


def wilson_center_expr(sfx: str = "") -> str:
    nd = f"cast(n{sfx} as double)"
    den = f"(1.0 + {_WZ2} / {nd})"
    return f"(({wilson_p_expr(sfx)} + {_WZ2} / (2.0 * {nd})) / {den})"


def wilson_half_expr(sfx: str = "") -> str:
    nd = f"cast(n{sfx} as double)"
    den = f"(1.0 + {_WZ2} / {nd})"
    p = wilson_p_expr(sfx)
    return (
        f"(1.96 * sqrt({p} * (1.0 - {p}) / {nd}"
        f" + {_WZ2} / (4.0 * {nd} * {nd})) / {den})"
    )


WILSON_P = wilson_p_expr()
WILSON_CENTER = wilson_center_expr()
WILSON_HALF = wilson_half_expr()


def wilson_ci_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score 95% interval for the per-variant user conversion
    share — the binomial CI that stays inside [0, 1] and behaves at
    small n / extreme p where the Wald interval collapses (Wilson 1927;
    the interval behind every honest A/B readout).  Pairs with
    `conversion_ztest` (the test) and `ab_power_mde` (the plan).

    Determinism: numerator and denominator are exact distinct-user
    counts; center and half-width are one shared double expression tree
    (module constants, oracle-imported) over (x, n).

    Scale shape: one user-keyed conversion rollup (combiner-folded),
    then a 2-row variant aggregate.
    """
    per_user = (
        read_table(spark, sf_dir, "events")
        .groupBy(F.expr("user_id % 2").alias("variant"), F.col("user_id"))
        .agg(
            F.max(
                F.expr("if(event_type = 'purchase', 1L, 0L)")
            ).alias("converted")
        )
    )
    agg = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("converted").cast("bigint").alias("x"),
    )
    return agg.select(
        "variant",
        "n",
        F.col("x").alias("conversions"),
        F.round(F.expr(WILSON_P), 6).alias("p_hat"),
        F.round(F.expr(f"{WILSON_CENTER} - {WILSON_HALF}"), 6).alias(
            "wilson_lo"
        ),
        F.round(F.expr(f"{WILSON_CENTER} + {WILSON_HALF}"), 6).alias(
            "wilson_hi"
        ),
    )


# ---------- Mahalanobis outliers (shared expression trees) ----------
#
# Price-cents second moments exceed 2⁶³ at sf0.1, so every moment rides
# a wide integer (decimal(38,0) Spark-side, HUGEINT in the oracle) and
# the expressions are parametrized by the engine's wide type — the
# corr_pair_expr discipline.

MAHA_K = 25


def maha_d2_expr(big: str) -> str:
    nd = "cast(n as double)"
    mux = f"(cast(sx as double) / {nd})"
    muy = f"(cast(sy as double) / {nd})"
    cxx = (
        f"(cast(cast(n as {big}) * sxx - cast(sx as {big}) * sx as double)"
        f" / ({nd} * {nd}))"
    )
    cyy = (
        f"(cast(cast(n as {big}) * syy - cast(sy as {big}) * sy as double)"
        f" / ({nd} * {nd}))"
    )
    cxy = (
        f"(cast(cast(n as {big}) * sxy - cast(sx as {big}) * sy as double)"
        f" / ({nd} * {nd}))"
    )
    det = f"({cxx} * {cyy} - {cxy} * {cxy})"
    dx = f"(cast(x as double) - {mux})"
    dy = f"(cast(y as double) - {muy})"
    return (
        f"(({cyy} * {dx} * {dx}"
        f" - 2.0 * {cxy} * {dx} * {dy}"
        f" + {cxx} * {dy} * {dy}) / {det})"
    )


def mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K bivariate Mahalanobis outliers over (quantity, price) line
    items — the covariance-aware distance that catches points ordinary
    per-column z-scores miss (a high price is normal FOR a high
    quantity; Mahalanobis scores the pair against the joint ellipse via
    the closed-form 2×2 inverse).  The multivariate companion of
    `value_outliers`' univariate flags.

    Determinism: quantity and cents are exact integers; the five global
    moments are exact bigints (n·Σ products stay < 2⁶³ through SF100 —
    documented bound); d² is ONE shared double expression tree over
    those integers, so the descending order and the K-boundary are the
    same in both engines; ties broken by (orderkey, linenumber).

    Scale shape: 1-row moment aggregate broadcast into a per-row
    codegen'd distance, then a global top-K (TakeOrderedAndProject —
    map-side partial top-K, never a full sort).
    """
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.expr("cast(round(l_quantity) as bigint)").alias("x"),
        F.expr("cast(round(l_extendedprice * 100) as bigint)").alias("y"),
    )
    st_ = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("cast(x as decimal(38,0))")).alias("sx"),
        F.sum(F.expr("cast(y as decimal(38,0))")).alias("sy"),
        F.sum(F.expr("cast(x as decimal(38,0)) * x")).alias("sxx"),
        F.sum(F.expr("cast(y as decimal(38,0)) * y")).alias("syy"),
        F.sum(F.expr("cast(x as decimal(38,0)) * y")).alias("sxy"),
    )
    return (
        li.crossJoin(F.broadcast(st_))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("x").alias("quantity"),
            F.col("y").alias("price_cents"),
            F.expr(maha_d2_expr("decimal(38,0)")).alias("d2_raw"),
        )
        .orderBy(
            F.col("d2_raw").desc(), F.col("l_orderkey"), F.col("l_linenumber")
        )
        .limit(MAHA_K)
        .select(
            "l_orderkey",
            "l_linenumber",
            "quantity",
            "price_cents",
            F.round(F.col("d2_raw"), 6).alias("mahalanobis_d2"),
        )
    )


# ---------- Chow structural-break test (shared expression trees) ----------

def chow_sse_expr(g: str) -> str:
    """Two-variable OLS SSE from exact centered integer moments:
    SSE = (Cyy - Cxy²/Cxx) / n with C.. = n·Σab - Σa·Σb (exact bigints;
    day indices and daily counts keep every product < 2⁶³ at any SF)."""
    cxx = f"cast(n_{g} * sxx_{g} - sx_{g} * sx_{g} as double)"
    cxy = f"cast(n_{g} * sxy_{g} - sx_{g} * sy_{g} as double)"
    cyy = f"cast(n_{g} * syy_{g} - sy_{g} * sy_{g} as double)"
    return (
        f"(({cyy} - {cxy} * {cxy} / nullif({cxx}, 0.0))"
        f" / cast(n_{g} as double))"
    )


CHOW_F = (
    f"((((sse_p) - (sse_1) - (sse_2)) / 2.0)"
    f" / (((sse_1) + (sse_2)) / (cast(n_p as double) - 4.0)))"
)


def chow_break_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chow (1960) structural-break F-test of the daily order-count
    trend at the integer midpoint of the date span: do the two halves
    follow the SAME linear trend, or did the data-generating process
    change?  The hypothesis-test companion of `best_changepoint` (which
    finds the split; Chow says whether ANY split is significant) and
    the trend tests (`theilsen_daily_trend`, `mann_kendall_trend`).

    Determinism: the split day is exact integer midpoint arithmetic
    (min + (max-min) div 2 — the div discipline every midpoint op
    follows); all six moments per segment are exact bigints from one
    conditional aggregate; pooled moments are the exact sums of the
    segment moments; SSE and F are one shared double expression tree.

    Scale shape: one fact scan to the day grid, a broadcast 1-row
    midpoint, one 1-row conditional moment aggregate.
    """
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy(
            F.expr("datediff(o_orderdate, date '1970-01-01')").alias("d")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    mid = daily.agg(
        F.expr("min(d) + (max(d) - min(d)) div 2").alias("mid")
    )
    seg = daily.crossJoin(F.broadcast(mid)).select(
        F.expr("if(d < mid, 1, 2)").alias("g"), "d", "c", "mid"
    )
    mom = seg.groupBy().agg(
        F.max("mid").alias("break_day"),
        *[
            a
            for g in (1, 2)
            for a in (
                F.sum(F.expr(f"if(g = {g}, 1L, 0L)")).alias(f"n_{g}"),
                F.sum(F.expr(f"if(g = {g}, d, 0L)")).alias(f"sx_{g}"),
                F.sum(F.expr(f"if(g = {g}, c, 0L)")).alias(f"sy_{g}"),
                F.sum(F.expr(f"if(g = {g}, d * d, 0L)")).alias(f"sxx_{g}"),
                F.sum(F.expr(f"if(g = {g}, c * c, 0L)")).alias(f"syy_{g}"),
                F.sum(F.expr(f"if(g = {g}, d * c, 0L)")).alias(f"sxy_{g}"),
            )
        ],
    )
    pooled = mom.select(
        "break_day",
        *[F.col(f"{c}_1") for c in ("n", "sx", "sy", "sxx", "syy", "sxy")],
        *[F.col(f"{c}_2") for c in ("n", "sx", "sy", "sxx", "syy", "sxy")],
        *[
            F.expr(f"{c}_1 + {c}_2").alias(f"{c}_p")
            for c in ("n", "sx", "sy", "sxx", "syy", "sxy")
        ],
    )
    sse = pooled.select(
        "break_day",
        "n_p",
        F.col("n_1").alias("n_pre"),
        F.col("n_2").alias("n_post"),
        F.expr(chow_sse_expr("p")).alias("sse_p"),
        F.expr(chow_sse_expr("1")).alias("sse_1"),
        F.expr(chow_sse_expr("2")).alias("sse_2"),
    )
    return sse.select(
        "break_day",
        F.col("n_p").alias("n_days"),
        "n_pre",
        "n_post",
        F.round("sse_p", 6).alias("sse_pooled"),
        F.round(F.expr("sse_1 + sse_2"), 6).alias("sse_segments"),
        F.round(F.expr(CHOW_F), 6).alias("chow_f"),
    )


# ---------- Newcombe score-interval difference CI ----------

def newcombe_lo_expr() -> str:
    d = f"({wilson_p_expr('_0')} - {wilson_p_expr('_1')})"
    l0 = f"({wilson_center_expr('_0')} - {wilson_half_expr('_0')})"
    u1 = f"({wilson_center_expr('_1')} + {wilson_half_expr('_1')})"
    return (
        f"({d} - sqrt(({wilson_p_expr('_0')} - {l0})"
        f" * ({wilson_p_expr('_0')} - {l0})"
        f" + ({u1} - {wilson_p_expr('_1')})"
        f" * ({u1} - {wilson_p_expr('_1')})))"
    )


def newcombe_hi_expr() -> str:
    d = f"({wilson_p_expr('_0')} - {wilson_p_expr('_1')})"
    u0 = f"({wilson_center_expr('_0')} + {wilson_half_expr('_0')})"
    l1 = f"({wilson_center_expr('_1')} - {wilson_half_expr('_1')})"
    return (
        f"({d} + sqrt(({u0} - {wilson_p_expr('_0')})"
        f" * ({u0} - {wilson_p_expr('_0')})"
        f" + ({wilson_p_expr('_1')} - {l1})"
        f" * ({wilson_p_expr('_1')} - {l1})))"
    )


def newcombe_diff_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newcombe (1998) hybrid-score 95% CI for the DIFFERENCE of two
    conversion proportions — the interval a two-arm readout should
    report instead of the Wald ±1.96·SE band, built by combining each
    arm's Wilson interval (method 10 of Newcombe's comparison; it keeps
    coverage at small n and extreme p where Wald collapses).  The
    difference-scale companion of `wilson_ci_variants`; agrees in
    direction with `conversion_ztest`'s z.

    Determinism: the per-arm (x, n) counts are exact integers; every
    bound is one shared double expression tree (module functions,
    oracle-imported) over the pivoted 4-integer row.

    Scale shape: one user-keyed conversion rollup, a 2-row aggregate
    pivoted to a single row; the interval is O(1).
    """
    per_user = (
        read_table(spark, sf_dir, "events")
        .groupBy(F.expr("user_id % 2").alias("variant"), F.col("user_id"))
        .agg(
            F.max(
                F.expr("if(event_type = 'purchase', 1L, 0L)")
            ).alias("converted")
        )
    )
    agg = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("converted").cast("bigint").alias("x"),
    )
    piv = agg.agg(
        *[
            F.max(F.expr(f"if(variant = {v}, {c}, null)")).alias(f"{c}_{v}")
            for v in (0, 1)
            for c in ("n", "x")
        ]
    )
    return piv.select(
        F.col("n_0").alias("n_control"),
        F.col("x_0").alias("conv_control"),
        F.col("n_1").alias("n_treat"),
        F.col("x_1").alias("conv_treat"),
        F.round(
            F.expr(f"{wilson_p_expr('_0')} - {wilson_p_expr('_1')}"), 6
        ).alias("p_diff"),
        F.round(F.expr(newcombe_lo_expr()), 6).alias("diff_lo"),
        F.round(F.expr(newcombe_hi_expr()), 6).alias("diff_hi"),
    )


XCORR_LAGS = (-3, -2, -1, 0, 1, 2, 3)


def xcorr_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between daily purchase and click
    counts at lags −3..+3 days: r(lag) = corr(purchases_t,
    clicks_{t−lag}) — the lead-lag read that says whether click volume
    LEADS purchase volume (positive lag peaks) or merely co-moves
    (peak at 0), the bivariate companion of `autocorrelation_daily` /
    `pacf_daily` and the precedence evidence `event_precedence_matrix`
    gives at user grain, here at aggregate grain.

    Determinism: pairwise-complete day alignment via lag-offset
    EQUALITY joins on the calendar-bounded grid; exact integer moments
    through the shared corr_pair_expr template.

    Scale shape: one keyed day aggregation per type, a 7-literal lag
    explode, one broadcast self-join of the day grid, a 7-row moment
    aggregate.
    """
    daily = (
        read_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "click"))
        .groupBy(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    p = daily.where(F.col("event_type") == "purchase").select(
        "day", F.col("c").alias("cp")
    )
    cl = daily.where(F.col("event_type") == "click").select(
        F.col("day").alias("day_c"), F.col("c").alias("cc")
    )
    lags = p.select(
        "day",
        "cp",
        F.explode(F.array(*[F.lit(k) for k in XCORR_LAGS])).alias("lag"),
    )
    j = lags.join(
        F.broadcast(cl), F.expr("day_c = day - lag")
    ).select("lag", F.col("cp").alias("a"), F.col("cc").alias("b"))
    mom = j.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("cast(a as decimal(38,0))")).alias("s_a"),
        F.sum(F.expr("cast(b as decimal(38,0))")).alias("s_b"),
        F.sum(F.expr("cast(a as decimal(38,0)) * a")).alias("ss_a"),
        F.sum(F.expr("cast(b as decimal(38,0)) * b")).alias("ss_b"),
        F.sum(F.expr("cast(a as decimal(38,0)) * b")).alias("sx_a_b"),
    )
    return mom.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n").alias("n_days"),
        F.round(F.expr(corr_pair_expr("a", "b")), 6).alias("xcorr"),
    )


# ---------- empirical-Bayes beta-binomial shrinkage ----------
#
# Method-of-moments prior over the per-group rates, with every p_g
# nano-quantized BEFORE the cross-group sums so the prior's moments are
# exact integer arithmetic (order-independent) — the shared-tree
# discipline.  Columns: k groups, sp = Σp_nano, spp = Σp_nano².

EB_M = "(cast(sp as double) / (cast(k as double) * 1000000000.0))"
EB_V = (
    "(cast(cast(k as decimal(38,0)) * spp - cast(sp as decimal(38,0)) * sp"
    " as double) / (cast(k as double) * cast(k as double) * 1e18))"
)
# prior strength M = m(1-m)/v - 1; degenerate (v <= 0 or M <= 0) -> null
EB_STRENGTH = (
    f"(CASE WHEN {EB_V} > 0.0"
    f" AND ({EB_M} * (1.0 - {EB_M}) / {EB_V} - 1.0) > 0.0"
    f" THEN {EB_M} * (1.0 - {EB_M}) / {EB_V} - 1.0 END)"
)
EB_SHRUNK = (
    f"(CASE WHEN {EB_STRENGTH} IS NULL"
    " THEN cast(x as double) / cast(n as double)"
    f" ELSE (cast(x as double) + {EB_M} * {EB_STRENGTH})"
    f" / (cast(n as double) + {EB_STRENGTH}) END)"
)


def eb_shrunk_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-nation urgent-order shares: a
    beta-binomial prior fitted by method of moments across the nation
    rates, then each nation's rate shrunk toward the prior mean with
    strength ∝ prior confidence vs its own n — the James-Stein-style
    estimator every per-segment dashboard needs so small segments stop
    topping the leaderboard on noise (Robbins 1956; Efron & Morris
    1975).

    Determinism: per-group (x, n) are exact integers; each group rate
    is nano-quantized BEFORE the cross-group moment sums (exact
    integers, order-independent); prior mean/variance/strength and the
    shrunk rate are one shared double expression tree (module
    constants, oracle-imported).  Degenerate prior (zero between-group
    variance or non-positive strength) falls back to the raw rate with
    a NULL strength column.

    Scale shape: one fact scan to a |nations|-row conditional
    aggregate; the prior is a broadcast 1-row moment fold over that.
    """
    o = (
        read_table(spark, sf_dir, "orders")
        .join(
            F.broadcast(
                read_table(spark, sf_dir, "customer").select(
                    F.col("c_custkey").alias("o_custkey"), "c_nationkey"
                )
            ),
            "o_custkey",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.expr(
                    "if(o_orderpriority in ('1-URGENT', '2-HIGH'), 1L, 0L)"
                )
            ).cast("bigint").alias("x"),
        )
    )
    rates = o.withColumn(
        "p_nano",
        F.expr(
            "cast(round(cast(x as double) / cast(n as double)"
            " * 1000000000.0) as bigint)"
        ),
    )
    prior = rates.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("p_nano").cast("bigint").alias("sp"),
        F.sum(F.expr("cast(p_nano as decimal(38,0)) * p_nano")).alias("spp"),
    )
    return (
        rates.crossJoin(F.broadcast(prior))
        .select(
            "c_nationkey",
            "n",
            F.col("x").alias("n_urgent"),
            F.round(
                F.expr("cast(x as double) / cast(n as double)"), 6
            ).alias("raw_rate"),
            F.round(F.expr(EB_M), 6).alias("prior_mean"),
            F.round(F.expr(EB_STRENGTH), 6).alias("prior_strength"),
            F.round(F.expr(EB_SHRUNK), 6).alias("shrunk_rate"),
        )
    )


# SRM chi-square for a 50/50 design: chi2 = (n0-n1)^2 / (n0+n1), exact
# integers, one division — shared with the oracle.
SRM_CHI2 = (
    "(cast((n_0 - n_1) * (n_0 - n_1) as double)"
    " / cast(n_0 + n_1 as double))"
)


def srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check for the user_id % 2 experiment
    split: the 1-df chi-square of observed arm sizes against the
    designed 50/50 allocation, flagged at the 0.001 level (χ² > 10.83)
    — THE health gate every A/B readout must pass first, because a
    biased assignment invalidates `conversion_ztest` /
    `wilson_ci_variants` / `newcombe_diff_ci` no matter what they say
    (Fabijan et al. 2019).

    Determinism: arm sizes are exact distinct-user counts; for a 50/50
    design the statistic collapses to (n₀−n₁)²/(n₀+n₁) — one exact
    integer square, one division; the flag compares unrounded.

    Scale shape: one user-keyed distinct, one 2-row aggregate, a 1-row
    pivot.
    """
    arms = (
        read_table(spark, sf_dir, "events")
        .select(F.expr("user_id % 2").alias("variant"), "user_id")
        .distinct()
        .groupBy("variant")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    piv = arms.agg(
        F.max(F.expr("if(variant = 0, n, null)")).alias("n_0"),
        F.max(F.expr("if(variant = 1, n, null)")).alias("n_1"),
    )
    return piv.select(
        F.col("n_0").alias("n_control"),
        F.col("n_1").alias("n_treat"),
        F.round(
            F.expr(
                "cast(n_0 as double) / cast(n_0 + n_1 as double)"
            ),
            6,
        ).alias("control_share"),
        F.round(F.expr(SRM_CHI2), 6).alias("srm_chi2"),
        F.expr(f"{SRM_CHI2} > 10.83").alias("srm_detected"),
    )


# ---------- Newton logistic regression (shared expression trees) ----------

LOGIT_ITERS = 8
LOGIT_ETA = "((cast(b0 as double) + cast(b1 as double) * x) / 1000000000.0)"
LOGIT_P = f"(1.0 / (1.0 + exp(0.0 - {LOGIT_ETA})))"
LOGIT_PC = (
    f"(greatest(least({LOGIT_P}, 1.0 - 1e-12), 1e-12))"
)
LOGIT_G0 = f"cast(round((y - {LOGIT_P}) * 1000000.0) as bigint)"
LOGIT_G1 = f"cast(round((y - {LOGIT_P}) * x * 1000000.0) as bigint)"
LOGIT_W = f"cast(round({LOGIT_P} * (1.0 - {LOGIT_P}) * 1000000.0) as bigint)"
LOGIT_WX = (
    f"cast(round({LOGIT_P} * (1.0 - {LOGIT_P}) * x * 1000000.0) as bigint)"
)
LOGIT_WXX = (
    f"cast(round({LOGIT_P} * (1.0 - {LOGIT_P}) * x * x * 1000000.0)"
    " as bigint)"
)
_LOGIT_DET = (
    "(cast(sw as double) * cast(swxx as double)"
    " - cast(swx as double) * cast(swx as double))"
)
LOGIT_D0 = (
    f"((cast(sg0 as double) * cast(swxx as double)"
    f" - cast(sg1 as double) * cast(swx as double)) / {_LOGIT_DET})"
)
LOGIT_D1 = (
    f"((cast(sw as double) * cast(sg1 as double)"
    f" - cast(swx as double) * cast(sg0 as double)) / {_LOGIT_DET})"
)
LOGIT_DEV_T = (
    f"cast(round((0.0 - 2.0) * (y * ln({LOGIT_PC}) + (1.0 - y)"
    f" * ln(1.0 - {LOGIT_PC})) * 1000000.0) as bigint)"
)


def logistic_price_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression of order urgency on log price by
    Newton-Raphson (IRLS) — the canonical GLM, fitted INSIDE the engine
    with LOGIT_ITERS exact unrolled Newton steps: per step, the
    gradient and the 2×2 Hessian fold from per-row micro-quantized
    terms (exact bigint sums, order-independent), the update solves the
    2×2 system by Cramer's rule in one shared double expression, and
    the new coefficients re-quantize to nano units — so every iterate
    is bit-identical across engines and the oracle unrolls the steps as
    CTEs.  Completes the regression shelf next to `ols_price_model`
    (linear), `isotonic_calibration` (monotone) and `woe_encoding`
    (binned log-odds).

    Scale shape: LOGIT_ITERS full scans of the fact table, each a
    map-side moment fold against a broadcast 1-row coefficient state —
    the textbook distributed IRLS (gradient aggregation), no shuffle of
    rows ever.
    """
    # a zero-price order has no log-price feature: exclude it on both
    # engines (Spark ln(0) yields NULL while DuckDB raises -- degenerate
    # sweep, round 8)
    o = (
        read_table(spark, sf_dir, "orders")
        .filter(F.expr("cast(round(o_totalprice * 100) as bigint) > 0"))
        .select(
            F.expr(
                "ln(cast(cast(round(o_totalprice * 100) as bigint) as double)"
                " / 100.0)"
            ).alias("x"),
            F.expr(
                "cast(if(o_orderpriority in ('1-URGENT', '2-HIGH'),"
                " 1.0, 0.0) as double)"
            ).alias("y"),
        )
    )
    beta = spark.range(1).select(
        F.lit(0).cast("bigint").alias("b0"),
        F.lit(0).cast("bigint").alias("b1"),
    )
    for _ in range(LOGIT_ITERS):
        mom = (
            o.crossJoin(F.broadcast(beta))
            .select(
                F.expr(LOGIT_G0).alias("g0"),
                F.expr(LOGIT_G1).alias("g1"),
                F.expr(LOGIT_W).alias("w"),
                F.expr(LOGIT_WX).alias("wx"),
                F.expr(LOGIT_WXX).alias("wxx"),
                "b0",
                "b1",
            )
            .groupBy("b0", "b1")
            .agg(
                F.sum("g0").cast("bigint").alias("sg0"),
                F.sum("g1").cast("bigint").alias("sg1"),
                F.sum("w").cast("bigint").alias("sw"),
                F.sum("wx").cast("bigint").alias("swx"),
                F.sum("wxx").cast("bigint").alias("swxx"),
            )
        )
        beta = mom.select(
            F.expr(
                f"b0 + cast(round({LOGIT_D0} * 1000000000.0) as bigint)"
            ).alias("b0"),
            F.expr(
                f"b1 + cast(round({LOGIT_D1} * 1000000000.0) as bigint)"
            ).alias("b1"),
        ).localCheckpoint(eager=True)
    fit = (
        o.crossJoin(F.broadcast(beta))
        .select(F.expr(LOGIT_DEV_T).alias("dev"), "b0", "b1")
        .groupBy("b0", "b1")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("dev").cast("bigint").alias("sdev"),
        )
    )
    return fit.select(
        "n",
        F.round(
            F.expr("cast(b0 as double) / 1000000000.0"), 6
        ).alias("beta0"),
        F.round(
            F.expr("cast(b1 as double) / 1000000000.0"), 6
        ).alias("beta1"),
        F.round(
            F.expr("cast(sdev as double) / 1000000.0"), 4
        ).alias("deviance"),
    )


# ---------- best binary split by Gini impurity ----------

GINI_N_CANDIDATES = 19  # ventile boundaries


def gini_expr(x: str, n: str) -> str:
    """Gini impurity 1 - p² - (1-p)² of a binary class split cell from
    exact counts — shared with the oracle."""
    p = f"(cast({x} as double) / cast({n} as double))"
    return f"(1.0 - {p} * {p} - (1.0 - {p}) * (1.0 - {p}))"


def best_gini_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first split of a CART decision tree on the price feature:
    among the 19 exact ventile boundaries of order price, the threshold
    that minimizes the weighted child Gini impurity of the urgency
    class — the decision-stump baseline every tree ensemble grows from
    (Breiman et al. 1984), and the nonparametric split companion to
    `logistic_price_model`'s smooth fit and `woe_encoding`'s bins.

    Determinism: candidate boundaries come from the bit-identical
    exact-percentile interpolation; left/right counts are exact
    integers from ONE conditional aggregate pass; impurities are shared
    double trees; the argmin breaks ties on the candidate index.

    Scale shape: a 1-row boundary aggregate broadcast, one fact pass
    exploded ×19 into a 19-row conditional rollup, a top-1.
    """
    o = read_table(spark, sf_dir, "orders").select(
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("v"),
        F.expr(
            "if(o_orderpriority in ('1-URGENT', '2-HIGH'), 1L, 0L)"
        ).alias("y"),
    )
    k = GINI_N_CANDIDATES
    qs = ", ".join(str(i / (k + 1)) for i in range(1, k + 1))
    bounds = o.agg(F.expr(f"percentile(v, array({qs}))").alias("bs"))
    grid = (
        o.crossJoin(F.broadcast(bounds))
        .select(
            "v",
            "y",
            F.explode(
                F.array(*[F.lit(i) for i in range(1, k + 1)])
            ).alias("idx"),
            "bs",
        )
        .select(
            "idx",
            F.expr("element_at(bs, idx)").alias("thr"),
            F.expr("if(v <= element_at(bs, idx), 1L, 0L)").alias("is_l"),
            "y",
        )
        .groupBy("idx", "thr")
        .agg(
            F.sum("is_l").cast("bigint").alias("n_l"),
            F.sum(F.expr("is_l * y")).cast("bigint").alias("x_l"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("x"),
        )
        .select(
            "idx",
            "thr",
            "n_l",
            "x_l",
            F.expr("n - n_l").alias("n_r"),
            F.expr("x - x_l").alias("x_r"),
            "n",
            "x",
        )
        .where((F.col("n_l") > 0) & (F.col("n_r") > 0))
    )
    weighted = (
        f"((cast(n_l as double) * {gini_expr('x_l', 'n_l')}"
        f" + cast(n_r as double) * {gini_expr('x_r', 'n_r')})"
        " / cast(n as double))"
    )
    return (
        grid.select(
            "idx",
            "thr",
            "n_l",
            "n_r",
            F.expr(weighted).alias("w_raw"),
            F.expr(gini_expr("x", "n")).alias("g_parent"),
        )
        .orderBy(F.col("w_raw").asc(), F.col("idx").asc())
        .limit(1)
        .select(
            F.col("idx").cast("int").alias("candidate_idx"),
            # seed-87 randomized-audit find: thr is a percentile midpoint
            # over integer cents, so it lands on EXACT .5 cents whenever
            # the interpolation fraction is a half — round(thr/100.0, 2)
            # is then the fresh-fractional half-boundary class (Spark's
            # BigDecimal shortest-repr HALF_UP read 2135.305 → 2135.31
            # while DuckDB rounds the binary 2135.30499… → 2135.3).
            # Convention fix: round at the INTEGER cents scale (exact
            # halves are exactly representable; both engines round them
            # away from zero identically), then one exact division.
            # double division (bigint / DECIMAL-literal would surface a
            # Decimal column, which the driver hashes differently)
            F.expr(
                "cast(cast(round(thr) as bigint) as double)"
                " / cast(100.0 as double)"
            ).alias("threshold_price"),
            "n_l",
            "n_r",
            F.round("g_parent", 6).alias("gini_parent"),
            F.round("w_raw", 6).alias("gini_weighted"),
            F.round(F.expr("g_parent - w_raw"), 6).alias("gini_gain"),
        )
    )


# ---------- deterministic randomization test ----------

PERM_B = 64
# content-hash pseudo-random arm for replicate b — the hash_split
# bucketing idiom, engine-portable (DuckDB hex-cast = Spark conv)
PERM_ARM = (
    "cast(conv(substring(md5(concat(cast(event_id as string), '|',"
    " cast(b as string))), 1, 7), 16, 10) as bigint) % 2"
)


def perm_test_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization (approximate permutation) test for the
    purchase-vs-click mean value difference: the observed difference is
    compared against PERM_B label reassignments, each a DETERMINISTIC
    content-hash relabeling (md5(event_id|b) % 2 — no RNG, so the test
    reproduces bit-for-bit across engines/reruns and is embarrassingly
    parallel).  The distribution-free companion of
    `welch_ttest_values` (parametric) and `mannwhitney_value_test`
    (rank): p = (1 + #{|Δ_b| ≥ |Δ_obs|}) / (B + 1), the standard
    add-one Monte-Carlo estimate (Davison & Hinkley 1997).

    Determinism: per-replicate sums are exact integers off ONE
    conditional pass (the ×B explode is combiner-folded map-side);
    each Δ is one double expression; the comparison runs on identical
    doubles in both engines.

    Scale shape: one fact scan exploded ×B into a B-row conditional
    rollup — no shuffle of raw rows, no per-replicate pass.
    """
    ev = read_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click")
    ).select(
        "event_id",
        F.expr("if(event_type = 'purchase', 1, 0)").alias("arm"),
        F.expr("cast(floor(value * 100) as bigint)").alias("cents"),
    )
    # an empty arm (observed or permuted) leaves the mean diff
    # undefined: NULL on both engines, and the NULL |d| comparison then
    # counts as non-extreme identically (degenerate sweep, round 8)
    obs = ev.agg(
        F.expr(
            "if(sum(if(arm = 1, 1.0, 0.0)) = 0"
            " or sum(if(arm = 0, 1.0, 0.0)) = 0, cast(null as double),"
            " cast(sum(if(arm = 1, cents, 0L)) as double)"
            " / sum(if(arm = 1, 1.0, 0.0))"
            " - cast(sum(if(arm = 0, cents, 0L)) as double)"
            " / sum(if(arm = 0, 1.0, 0.0)))"
        ).alias("d_obs")
    )
    reps = (
        ev.select(
            "event_id",
            "cents",
            F.explode(
                F.array(*[F.lit(b) for b in range(1, PERM_B + 1)])
            ).alias("b"),
        )
        .select("cents", "b", F.expr(PERM_ARM).alias("parm"))
        .groupBy("b")
        .agg(
            F.expr(
                "if(sum(if(parm = 1, 1.0, 0.0)) = 0"
                " or sum(if(parm = 0, 1.0, 0.0)) = 0, cast(null as double),"
                " cast(sum(if(parm = 1, cents, 0L)) as double)"
                " / sum(if(parm = 1, 1.0, 0.0))"
                " - cast(sum(if(parm = 0, cents, 0L)) as double)"
                " / sum(if(parm = 0, 1.0, 0.0)))"
            ).alias("d_b")
        )
    )
    return (
        reps.crossJoin(F.broadcast(obs))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_replicates"),
            F.sum(
                F.expr("if(abs(d_b) >= abs(d_obs), 1L, 0L)")
            ).cast("bigint").alias("n_extreme"),
            F.round(F.max("d_obs"), 6).alias("d_obs"),
        )
        .select(
            "n_replicates",
            "n_extreme",
            "d_obs",
            F.round(
                F.expr(
                    "cast(1 + n_extreme as double)"
                    " / cast(n_replicates + 1 as double)"
                ),
                6,
            ).alias("p_value"),
        )
    )


# ---------- Huber robust location (shared expression trees) ----------

HUBER_ITERS = 6
HUBER_C = 1.345  # 95% efficiency at the normal
# weight for one row given mu (nano) and c (nano): min(1, c/|x - mu|)
HUBER_W = (
    "if(abs(cast(x as double) - cast(mu as double) / 1000000000.0)"
    " < 1e-9, 1.0,"
    " least(1.0, (cast(c as double) / 1000000000.0)"
    " / abs(cast(x as double) - cast(mu as double) / 1000000000.0)))"
)


def huber_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huber M-estimator of the purchase-value location — the robust
    mean (Huber 1964): IRLS with the min(1, c/|x−μ|) weight, tuning
    c = 1.345·MAD-scale (95% efficiency at the normal, near-immunity to
    the heavy tail that drags the plain mean).  Completes the robust
    shelf beside `trimmed_mean_values` (drop), `value_winsorize`
    (clip) and `mad_anomaly_days` (flag) with the estimator that uses
    ALL the data at reduced weight.

    Determinism: the start (median) and scale (1.4826·MAD) use the
    bit-identical percentile interpolation, quantized to nano; each
    IRLS round quantizes per-row (w, w·x) to micro BEFORE summing
    (exact bigints) and re-quantizes μ to nano — every iterate is
    bit-identical across engines and the oracle unrolls the rounds.

    Scale shape: two percentile passes + HUBER_ITERS scans, each a
    map-side fold against a broadcast 1-row (μ, c) state.
    """
    x = read_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    ).select(F.expr("cast(floor(value * 100) as bigint)").alias("x"))
    med = x.agg(
        F.expr(
            "cast(round(percentile(x, 0.5) * 1000000000.0) as bigint)"
        ).alias("mu")
    )
    scale = (
        x.crossJoin(F.broadcast(med))
        .select(
            F.expr(
                "abs(cast(x as double) - cast(mu as double)"
                " / 1000000000.0)"
            ).alias("ad"),
            "mu",
        )
        .groupBy("mu")
        .agg(
            F.expr(
                f"cast(round(percentile(ad, 0.5) * 1.4826 * {HUBER_C}"
                " * 1000000000.0) as bigint)"
            ).alias("c")
        )
    )
    st_ = scale.select("mu", "c").localCheckpoint(eager=True)
    for _ in range(HUBER_ITERS):
        st_ = (
            x.crossJoin(F.broadcast(st_))
            .select(
                F.expr(
                    f"cast(round({HUBER_W} * 1000000.0) as bigint)"
                ).alias("w"),
                F.expr(
                    f"cast(round({HUBER_W} * cast(x as double)"
                    " * 1000000.0) as bigint)"
                ).alias("wx"),
                "c",
            )
            .groupBy("c")
            .agg(
                F.expr(
                    "cast(round(cast(sum(wx) as double)"
                    " / cast(sum(w) as double) * 1000000000.0) as bigint)"
                ).alias("mu")
            )
            .select("mu", "c")
            .localCheckpoint(eager=True)
        )
    n = x.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return st_.crossJoin(F.broadcast(n)).select(
        "n",
        F.round(
            F.expr("cast(mu as double) / 1000000000.0 / 100.0"), 6
        ).alias("huber_location"),
        F.round(
            F.expr(
                f"cast(c as double) / 1000000000.0 / {HUBER_C} / 100.0"
            ),
            6,
        ).alias("mad_scale"),
    )


# ---------- OLS residual diagnostics (shared expression trees) ----------

_ORD_B = (
    "(cast(n * sxy - sx * sy as double) / cast(n * sxx - sx * sx as double))"
)
_ORD_A = f"((cast(sy as double) - {_ORD_B} * cast(sx as double)) / cast(n as double))"
# zero x- or y-variance leaves R2 undefined: NULL on both engines (the
# oracle imports this string) -- degenerate sweep, round 8
ORD_R2 = (
    "(CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL"
    " ELSE cast(n * sxy - sx * sy as double) * cast(n * sxy - sx * sy as double)"
    " / (cast(n * sxx - sx * sx as double)"
    " * cast(n * syy - sy * sy as double)) END)"
)


def ols_residual_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual diagnostics for the daily-order-count trend OLS:
    Durbin-Watson autocorrelation (DW ≈ 2(1−ρ₁); <2 means positive
    serial correlation — the assumption `chow_break_test` and the trend
    tests silently need) and the Breusch-Pagan heteroscedasticity
    statistic (n·R² of e² on the regressor; large means the variance
    itself trends, invalidating the OLS standard errors).  The
    "should you trust the fit" companion to `ols_price_model` /
    `theilsen_daily_trend`.

    Determinism: the fit comes from exact integer moments; fitted
    coefficients are nano-quantized before residuals are computed, and
    every residual is micro-quantized before the DW / BP sums — so the
    ratio numerators/denominators are exact wide-integer arithmetic and
    each output is one double expression.

    Scale shape: one fact scan to the day grid, one 1-row moment
    aggregate broadcast back, one ordered lag window over the
    |days|-row grid.
    """
    from pyspark.sql import Window

    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy(
            F.expr("datediff(o_orderdate, date '1970-01-01')").alias("d")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    mom = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("d").cast("bigint").alias("sx"),
        F.sum("c").cast("bigint").alias("sy"),
        F.sum(F.expr("d * d")).cast("bigint").alias("sxx"),
        F.sum(F.expr("d * c")).cast("bigint").alias("sxy"),
        F.sum(F.expr("c * c")).cast("bigint").alias("syy"),
    ).select(
        "n",
        "sx",
        "sy",
        "sxx",
        "sxy",
        "syy",
        # a single-day grid (or constant x) has no fit: NULL coefficients
        # cascade to NULL diagnostics on both engines (degenerate sweep, r8)
        F.expr(
            f"if(n * sxx - sx * sx = 0, cast(null as bigint),"
            f" cast(round({_ORD_B} * 1000000000.0) as bigint))"
        ).alias("b_nano"),
        F.expr(
            f"if(n * sxx - sx * sx = 0, cast(null as bigint),"
            f" cast(round({_ORD_A} * 1000000000.0) as bigint))"
        ).alias("a_nano"),
    )
    resid = daily.crossJoin(F.broadcast(mom)).select(
        "d",
        "n",
        "sx",
        "sxx",
        F.expr(ORD_R2).alias("r2"),
        F.expr(
            "cast(round((cast(c as double)"
            " - (cast(a_nano as double) + cast(b_nano as double) * d)"
            " / 1000000000.0) * 1000000.0) as bigint)"
        ).alias("em"),
    )
    w = Window.orderBy("d")
    lagged = resid.withColumn("em_prev", F.lag("em").over(w))
    agg = lagged.groupBy("n", "sx", "sxx", "r2").agg(
        F.sum(F.expr("cast(em as decimal(38,0)) * em")).alias("see"),
        F.sum(
            F.expr(
                "if(em_prev is null, cast(0 as decimal(38,0)),"
                " cast(em - em_prev as decimal(38,0)) * (em - em_prev))"
            )
        ).alias("sdd"),
        F.sum(F.expr("cast(em as decimal(38,0)) * em * d")).alias("sxu"),
        F.sum(
            F.expr("cast(em as decimal(38,0)) * em * (cast(em as"
                   " decimal(38,0)) * em)")
        ).alias("suu"),
    )
    # Σu (the aux regressand total) IS Σem² = see
    bp_r2 = (
        "(cast(cast(n as decimal(38,0)) * sxu - cast(sx as decimal(38,0))"
        " * see as double) * cast(cast(n as decimal(38,0)) * sxu"
        " - cast(sx as decimal(38,0)) * see as double)"
        " / (cast(cast(n as decimal(38,0)) * sxx - cast(sx as"
        " decimal(38,0)) * sx as double)"
        " * cast(cast(n as decimal(38,0)) * suu - cast(see as"
        " decimal(38,0)) * see as double)))"
    )
    return agg.select(
        F.col("n").alias("n_days"),
        F.round("r2", 6).alias("r2"),
        # a perfect fit (all residuals zero) leaves DW/BP undefined
        F.expr(
            "if(see is null or see = 0, cast(null as double),"
            " round(cast(sdd as double) / cast(see as double), 6))"
        ).alias("dw_stat"),
        F.expr(
            "if(see is null"
            " or cast(n as decimal(38,0)) * sxx"
            "    - cast(sx as decimal(38,0)) * sx = 0"
            " or cast(n as decimal(38,0)) * suu"
            "    - cast(see as decimal(38,0)) * see = 0,"
            " cast(null as double),"
            f" round(cast(n as double) * {bp_r2}, 6))"
        ).alias("bp_stat"),
    )


# ---------- Gumbel block-maxima fit (shared expression trees) ----------

GUMBEL_EULER = "0.5772156649015329"
GUMBEL_SQRT6_PI = "0.7796968012336093"  # sqrt(6)/pi as a pinned literal


def gumbel_daily_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel (EV-I) fit of daily maximum order totals by method of
    moments — block-maxima extreme-value analysis (Gumbel 1958):
    β = s·√6/π, μ = m̄ − γ·β over the daily-max series, plus the
    fitted probability that a future day's maximum exceeds the
    corpus-wide record (the capacity/risk number extreme-value theory
    exists for).  Reads beside `hill_tail_index` (tail exponent of the
    ALL-order distribution; Gumbel models the per-block maxima).

    Determinism: daily maxima are exact integers; mean/std come from
    exact wide-integer moments; β, μ and the exceedance probability
    are one shared double expression tree with √6/π and Euler's γ
    pinned as explicit literals (never engine math-constant calls).

    Scale shape: one keyed max aggregation to the day grid, one 1-row
    moment fold.
    """
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy(
            F.expr("datediff(o_orderdate, date '1970-01-01')").alias("d")
        )
        .agg(
            F.max(
                F.expr("cast(round(o_totalprice * 100) as bigint)")
            ).alias("m")
        )
    )
    mom = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("m").cast("bigint").alias("s1"),
        F.sum(F.expr("cast(m as decimal(38,0)) * m")).alias("s2"),
        F.max("m").cast("bigint").alias("record"),
    )
    sd = (
        "sqrt(cast(cast(n as decimal(38,0)) * s2 - cast(s1 as"
        " decimal(38,0)) * s1 as double)"
        " / (cast(n as double) * cast(n - 1 as double)))"
    )
    beta = f"({sd} * {GUMBEL_SQRT6_PI})"
    mu = (
        f"(cast(s1 as double) / cast(n as double)"
        f" - {GUMBEL_EULER} * {beta})"
    )
    p_exceed = (
        f"(1.0 - exp(0.0 - exp(0.0 - (cast(record as double) - {mu})"
        f" / {beta})))"
    )
    # a single day or a zero-variance maxima series has no Gumbel fit
    # (beta = 0 would also divide the exceedance probability by zero):
    # NULL on both engines (degenerate sweep, round 8)
    degen = (
        "(n < 2 or cast(n as decimal(38,0)) * s2"
        " - cast(s1 as decimal(38,0)) * s1 = 0)"
    )
    return mom.select(
        F.col("n").alias("n_days"),
        F.expr(
            f"if({degen}, cast(null as double), round({mu} / 100.0, 4))"
        ).alias("gumbel_mu"),
        F.expr(
            f"if({degen}, cast(null as double), round({beta} / 100.0, 4))"
        ).alias("gumbel_beta"),
        F.round(F.expr("cast(record as double) / 100.0"), 2).alias(
            "record_max"
        ),
        F.expr(
            f"if({degen}, cast(null as double), round({p_exceed}, 6))"
        ).alias("p_exceed_record"),
    )


# ---------- historical VaR / expected shortfall ----------

CVAR_ALPHA_DEN = 20  # tail = top n div 20 (the 95% level)


def cvar_value_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical Value-at-Risk and Expected Shortfall of order totals:
    VaR95 = the 95th-percentile order value, ES95 = the exact mean of
    the top n/20 order values — the coherent tail-risk pair (Artzner et
    al. 1999; ES is what Basel replaced VaR with, because it sees HOW
    BAD the tail is, not just where it starts).  Reads beside
    `hill_tail_index` / `gumbel_daily_max` as the nonparametric
    tail-risk number.

    Determinism: VaR uses the bit-identical percentile interpolation;
    the tail set is the exact top-k (k = n div 20) chosen by descending
    rank with key tie-break on the distinct-value CDF, so the ES mean
    is a ratio of exact integers.

    Scale shape: one 1-row percentile aggregate; the top-k mean comes
    from the value-domain CDF (distinct values + counts), never a full
    sort of the fact table.
    """
    o = read_table(spark, sf_dir, "orders").select(
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("v")
    )
    var_ = o.agg(
        F.expr("percentile(v, 0.95)").alias("var95_raw"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    cdf = (
        o.groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("v").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = cdf.withColumn(
        "cum", F.sum("cnt").over(w).cast("bigint")
    )
    tail = (
        ranked.crossJoin(F.broadcast(var_))
        .where(F.expr(f"cum - cnt < n div {CVAR_ALPHA_DEN}"))
        .select(
            "v",
            "cnt",
            "cum",
            "n",
            "var95_raw",
            # clip the boundary value's multiplicity to exactly fill k
            F.expr(
                f"least(cnt, n div {CVAR_ALPHA_DEN} - (cum - cnt))"
            ).alias("take"),
        )
    )
    return tail.groupBy("n", "var95_raw").agg(
        F.sum("take").cast("bigint").alias("k"),
        F.sum(F.expr("cast(v as decimal(38,0)) * take")).alias("sv"),
    ).select(
        "n",
        F.col("k").alias("tail_k"),
        F.round(F.expr("var95_raw / 100.0"), 4).alias("var95"),
        F.round(
            F.expr(
                "cast(sv as double) / cast(k as double) / 100.0"
            ),
            4,
        ).alias("es95"),
    )


def last_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-digit uniformity audit of order cents — the fraud/entry
    screen that pairs with `benford_audit`: FIRST digits follow
    Benford's law in natural data, but LAST digits should be UNIFORM;
    spikes at 0/5 betray rounding, fabrication or price-point policy.
    Reports per-digit counts, shares, and the 9-df chi-square against
    uniform.

    Determinism: digits and counts are exact integers; each cell's χ²
    term is one double expression of exact ints; the statistic is an
    exact integer identity n·(100·Σc² /n² ...) folded as one tree.

    Scale shape: one scan, a 10-row rollup, a broadcast total.
    """
    o = read_table(spark, sf_dir, "orders").select(
        F.expr(
            "cast(round(o_totalprice * 100) as bigint) % 10"
        ).alias("digit")
    )
    cells = o.groupBy("digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = cells.agg(F.sum("n").cast("bigint").alias("nn"))
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.round(
                F.expr("cast(n as double) / cast(nn as double)"), 6
            ).alias("share"),
            F.round(
                F.expr(
                    "cast((10 * n - nn) as double)"
                    " * cast((10 * n - nn) as double)"
                    " / (10.0 * cast(nn as double))"
                ),
                6,
            ).alias("chi2_term"),
        )
    )


# ---------- Granger lag-1 causality (shared expression trees) ----------
#
# Centered cross-moments C_ab = n·Σab − Σa·Σb over the lagged daily grid
# (exact bigints: day counts and their pairwise products stay far below
# 2⁶³ at any tested SF).  The restricted model regresses y_t on its own
# lag; the unrestricted adds the candidate cause's lag; the F-ratio for
# the ONE extra regressor is the Granger statistic.

def _gr_c(a: str, b: str) -> str:
    return f"cast(n * s{a}{b} - s{a} * s{b} as double)"


GR_SSE_RESTRICTED = (
    f"(({_gr_c('y', 'y')} - {_gr_c('u', 'y')} * {_gr_c('u', 'y')}"
    f" / nullif({_gr_c('u', 'u')}, 0.0)) / cast(n as double))"
)
_GR_EXPLAINED_U = (
    f"(({_gr_c('u', 'y')} * {_gr_c('u', 'y')} * {_gr_c('v', 'v')}"
    f" - 2.0 * {_gr_c('u', 'y')} * {_gr_c('v', 'y')} * {_gr_c('u', 'v')}"
    f" + {_gr_c('v', 'y')} * {_gr_c('v', 'y')} * {_gr_c('u', 'u')})"
    f" / nullif({_gr_c('u', 'u')} * {_gr_c('v', 'v')}"
    f" - {_gr_c('u', 'v')} * {_gr_c('u', 'v')}, 0.0))"
)
GR_SSE_UNRESTRICTED = (
    f"(({_gr_c('y', 'y')} - {_GR_EXPLAINED_U}) / cast(n as double))"
)


def granger_lag1_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger (1969) lag-1 causality test: do yesterday's CLICK counts
    improve today's PURCHASE-count prediction beyond what yesterday's
    purchases already explain?  F = (SSE_restricted − SSE_unrestricted)
    / (SSE_unrestricted / (n−3)) for the one extra regressor — the
    directional companion of `xcorr_purchase_click` (correlation at a
    lag says the series co-move; Granger says the lag ADDS predictive
    information).

    Determinism: the day spine is densified (zero-filled) so both
    engines see the identical lag alignment; counts are exact integers;
    every centered moment is exact (C_ab = n·Σab − Σa·Σb over bigints);
    SSEs and F are ONE shared double expression tree (module constants,
    imported by the oracle), rounded at the surface.

    Scale shape: one fact scan folds to the |days|-row grid
    (combiner-folded conditional counts); the lag window and the moment
    aggregate run on that bounded grid (a year is 365 rows regardless
    of SF), so the only data-sized stage is the first rollup.
    """
    ev = read_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("d"), "event_type"
    )
    daily = ev.groupBy("d").agg(
        F.sum(F.expr("if(event_type = 'purchase', 1L, 0L)")).alias("buy"),
        F.sum(F.expr("if(event_type = 'click', 1L, 0L)")).alias("clk"),
    )
    bounds = daily.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    spine = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("d")
    )
    grid = (
        spine.join(daily, "d", "left")
        .select(
            "d",
            F.coalesce("buy", F.lit(0)).alias("buy"),
            F.coalesce("clk", F.lit(0)).alias("clk"),
        )
    )
    w = Window.orderBy("d")
    lagged = (
        grid.withColumn("u", F.lag("buy").over(w))
        .withColumn("v", F.lag("clk").over(w))
        .filter(F.col("u").isNotNull())
        .select(F.col("buy").alias("y"), "u", "v")
    )
    mom = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[
            F.sum(F.expr(e)).alias(a)
            for a, e in [
                ("sy", "y"), ("su", "u"), ("sv", "v"),
                ("syy", "y * y"), ("suu", "u * u"), ("svv", "v * v"),
                ("suy", "u * y"), ("svy", "v * y"), ("suv", "u * v"),
            ]
        ],
    )
    return mom.select(
        F.col("n").alias("n_obs"),
        F.round(F.expr(GR_SSE_RESTRICTED), 6).alias("sse_restricted"),
        F.round(F.expr(GR_SSE_UNRESTRICTED), 6).alias("sse_unrestricted"),
        F.round(
            F.expr(
                f"(({GR_SSE_RESTRICTED}) - ({GR_SSE_UNRESTRICTED}))"
                f" / nullif(({GR_SSE_UNRESTRICTED}) / (cast(n as double) - 3.0), 0.0)"
            ),
            6,
        ).alias("f_granger"),
    )


def brown_forsythe_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe (1974) homogeneity-of-variance test across event
    types: a one-way ANOVA on absolute deviations from each GROUP MEDIAN
    — the robust form of Levene's test (median centers keep the test
    calibrated under the heavy-tailed value distributions that break the
    mean-centered original).  The variance-comparison companion of the
    location shelf (`welch_ttest_values`, `weekday_anova`): Welch asks
    if means differ, this asks if SPREADS do.

    Determinism: values enter as exact integer cents; each group's
    median is taken EXACTLY via dual mid-ranks kept at 2× scale
    (med2 = c[(n+1) div 2] + c[(n+2) div 2], an exact integer for odd
    and even n alike); deviations z = |2c − med2| are exact integers;
    the three per-group moments are exact DECIMAL(38,0) sums, and the
    W statistic is one shared double expression over them.

    Scale shape: one keyed rank window per event_type (single shuffle)
    for the medians, one combiner-folded moment aggregate over the same
    partitioning, |types| rows thereafter.  At 100 TB the rank-median
    swaps for the two-pass bucket-refine exact median
    (relational.scalable_median) with identical output.
    """
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    ).select(
        "event_type",
        "event_id",
        F.expr("cast(floor(value * 100) as bigint)").alias("c"),
    )
    w = Window.partitionBy("event_type").orderBy("c", "event_id")
    ranked = ev.withColumn("r", F.row_number().over(w)).withColumn(
        "ng", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
    )
    med2 = (
        ranked.select(
            "event_type",
            (
                F.expr("if(r = (ng + 1) div 2, c, 0L)")
                + F.expr("if(r = (ng + 2) div 2, c, 0L)")
            ).alias("m"),
        )
        .groupBy("event_type")
        .agg(F.sum("m").cast("bigint").alias("med2"))
    )
    z = ev.join(F.broadcast(med2), "event_type").select(
        "event_type", F.expr("abs(2L * c - med2)").alias("z")
    )
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("nj"),
        F.sum(F.expr("cast(z as decimal(38,0))")).alias("sj"),
        F.sum(F.expr("cast(z as decimal(38,0)) * z")).alias("ssj"),
    )
    # per-group double terms are bit-identical across engines (pure
    # functions of exact integers); micro-quantize BEFORE the cross-group
    # sum so aggregation order cannot drift a ulp (module-doc discipline).
    # The micro terms are held in DECIMAL(38,0) (HUGEINT oracle-side):
    # sj²/nj·1e6 is ~1e18 already at sf0.1 and grows linearly with group
    # size, so a bigint accumulator would overflow near sf1.
    tot = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("nj").cast("bigint").alias("n"),
        F.sum(
            F.expr(
                "cast(round(cast(sj as double) * cast(sj as double) / nj * 1e6)"
                " as decimal(38,0))"
            )
        ).alias("sqn_micro"),
        F.sum("sj").alias("s_all"),
        F.sum(
            F.expr(
                "cast(round((cast(ssj as double)"
                " - cast(sj as double) * cast(sj as double) / nj) * 1e6)"
                " as decimal(38,0))"
            )
        ).alias("within_micro"),
    )
    # ss_between and w_stat are FRESH fractional doubles, so round(x, 6)
    # sits on half boundaries the two engines resolve differently (seed-16
    # randomized audit: a ...610870.5 half case) — quantize via
    # round-to-integer of the 1e6-scaled double (module-doc discipline;
    # valid while |x·1e6| < 2^53, i.e. SS < ~9e9, comfortably above the
    # cents-scaled deviations at any tested SF).  ss_within stays a plain
    # round: within_micro/1e6 is already quantized, the safe case.
    between = (
        "cast(sqn_micro as double) / 1e6"
        " - cast(s_all as double) * cast(s_all as double)"
        " / cast(n as double)"
    )
    wstat = (
        f"(({between}) / (k - 1.0))"
        " / nullif((cast(within_micro as double) / 1e6)"
        " / (cast(n as double) - k), 0.0)"
    )
    return tot.select(
        F.col("k").alias("k_groups"),
        F.col("n").alias("n_obs"),
        F.expr(
            f"cast(round(({between}) * 1e6) as bigint) / 1e6"
        ).alias("ss_between"),
        F.round(F.expr("cast(within_micro as double) / 1e6"), 6).alias("ss_within"),
        F.expr(
            f"cast(round(({wstat}) * 1e6) as bigint) / 1e6"
        ).alias("w_stat"),
    )


WINSOR_LO_PCT = 5
WINSOR_HI_PCT = 95


def winsorized_mean_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean of event values per type: clamp below the exact
    empirical p05 and above the p95 (rank-based lower quantiles,
    ceil(p·n) — no interpolation, so the bounds are actual data values),
    then average — the outlier-robust location estimate that KEEPS the
    tail observations (at the fence) where the trimmed mean deletes
    them: the right choice when extreme rows are real but noisy.
    Completes the robust-location shelf beside `huber_location`
    (M-estimate) and `trimmed_mean_values` (deletion).

    Determinism: cents are exact integers; fence ranks are integer
    ceil-division; the clamped sum is an exact DECIMAL(38,0); one double
    division at the surface.

    Scale shape: one keyed rank window per type (the BF-median shuffle,
    shared discipline), fences broadcast back, one combiner-folded
    clamped aggregate.  At 100 TB the rank swaps for the two-pass
    bucket-refine quantile (relational.scalable_median form).
    """
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    ).select(
        "event_type",
        "event_id",
        F.expr("cast(floor(value * 100) as bigint)").alias("c"),
    )
    w = Window.partitionBy("event_type").orderBy("c", "event_id")
    ranked = ev.withColumn("r", F.row_number().over(w)).withColumn(
        "ng", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
    )
    fences = (
        ranked.select(
            "event_type",
            F.expr(
                f"if(r = greatest(1L, (ng * {WINSOR_LO_PCT} + 99) div 100), c, null)"
            ).alias("lo"),
            F.expr(
                f"if(r = (ng * {WINSOR_HI_PCT} + 99) div 100, c, null)"
            ).alias("hi"),
        )
        .groupBy("event_type")
        .agg(F.max("lo").alias("lo"), F.max("hi").alias("hi"))
    )
    clamped = ev.join(F.broadcast(fences), "event_type").select(
        "event_type",
        "lo",
        "hi",
        F.expr("least(greatest(c, lo), hi)").alias("cw"),
        F.col("c"),
    )
    return clamped.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max("lo").cast("bigint").alias("lo_cents"),
        F.max("hi").cast("bigint").alias("hi_cents"),
        # 6dp-dollar means quantize via round-to-integer of the 1e4-scaled
        # cent sum (mean·1e6 = Σcents·1e4/n): a fresh round(x, 6) sits on
        # half boundaries whenever n divides Σcents·1e4 to an exact .5 —
        # guaranteed territory for power-of-two group sizes (seed-21
        # randomized audit, round 8)
        F.expr(
            "cast(round(cast(sum(cast(cw as decimal(38,0))) as double)"
            " * 1e4 / count(*)) as bigint) / 1e6"
        ).alias("winsorized_mean"),
        F.expr(
            "cast(round(cast(sum(cast(c as decimal(38,0))) as double)"
            " * 1e4 / count(*)) as bigint) / 1e6"
        ).alias("raw_mean"),
    )


GPD_THRESHOLD_PCT = 90


def gpd_tail_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peaks-over-threshold extreme-value fit: generalized Pareto
    (shape ξ, scale σ) over order-price exceedances of the exact
    empirical p90, by probability-weighted moments (Hosking & Wallis
    1987) — the EVT companion of `gumbel_daily_max` (block maxima need a
    blocking choice; POT uses every tail observation) and the tail-index
    sibling of `hill_tail_index` (Hill assumes ξ>0; PWM-GPD estimates
    its sign, the bounded/unbounded-tail verdict).

    Determinism: cents are exact integers; the threshold is the
    rank-based lower p90 (integer ceil-division rank, key tie-break);
    both PWM sums are exact bigints over integer exceedances with
    integer rank weights (b1's descending (1−F) weights (m−i)/(m(m−1))
    — the Hosking β₁ estimator — stay integral
    until ONE division); ξ and σ are one shared double tree.

    Scale shape: NO global single-partition rank — both rankings (the
    threshold and the exceedance order statistics) use the two-level
    bucket-carry form (row_number per price bucket + cumulative offsets
    over the |buckets|-row summary, the balance_deciles discipline);
    everything else is combiner-folded aggregation.
    """
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("c"),
    )

    def two_level_rank(df, col, key):
        b = df.withColumn("wb", F.expr(f"{col} div 100000"))
        w_local = Window.partitionBy("wb").orderBy(F.col(col).asc(), F.col(key).asc())
        local = b.withColumn("lr", F.row_number().over(w_local))
        summary = b.groupBy("wb").agg(F.count(F.lit(1)).alias("cnt"))
        w_carry = Window.orderBy("wb").rowsBetween(Window.unboundedPreceding, -1)
        offsets = summary.select(
            "wb", F.coalesce(F.sum("cnt").over(w_carry), F.lit(0)).alias("off")
        )
        return local.join(F.broadcast(offsets), "wb").withColumn(
            "r", F.expr("off + lr")
        )

    ranked = two_level_rank(o, "c", "o_orderkey")
    tot = o.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    # checkpoint the 1-row threshold and the ~(1-pct) tail table: u's
    # lineage contains the whole ranking and exceed's contains u, so the
    # three downstream consumers would otherwise re-run the ranking
    # pipeline multiplicatively (exchange reuse does not dedupe it)
    u = (
        ranked.join(F.broadcast(tot))
        .filter(F.expr(f"r = (n * {GPD_THRESHOLD_PCT} + 99) div 100"))
        .select(F.col("c").alias("u"))
        .localCheckpoint(eager=True)
    )
    exceed = (
        o.join(F.broadcast(u))
        .filter(F.col("c") > F.col("u"))
        .select("o_orderkey", F.expr("c - u").alias("y"), "u")
        .localCheckpoint(eager=True)
    )
    ex_ranked = two_level_rank(exceed, "y", "o_orderkey")
    m_tot = exceed.agg(F.count(F.lit(1)).cast("bigint").alias("m_in"))
    pwm = ex_ranked.join(F.broadcast(m_tot)).groupBy("u").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum(F.expr("cast(y as decimal(38,0))")).alias("sy"),
        F.sum(F.expr("cast(y as decimal(38,0)) * (m_in - r)")).alias("t1"),
    )
    b0 = "(cast(sy as double) / m)"
    b1 = "(cast(t1 as double) / (cast(m as double) * (m - 1)))"
    return pwm.select(
        F.col("u").alias("u_cents"),
        F.col("m").alias("n_exceed"),
        F.round(F.expr(b0), 6).alias("pwm_b0"),
        F.round(F.expr(b1), 6).alias("pwm_b1"),
        F.round(F.expr(f"2.0 - {b0} / ({b0} - 2.0 * {b1})"), 6).alias("gpd_shape"),
        F.round(
            F.expr(f"2.0 * {b0} * {b1} / ({b0} - 2.0 * {b1})"), 6
        ).alias("gpd_scale"),
    )


# child-segment SSE expressions for binary segmentation (prefix columns
# k/s/ss, the level-0 break's prefix k1/s1/ss1, totals kt/st/sst); every
# denominator nullif-guarded for ANSI evaluation on filtered rows
BINSEG_LEFT = (
    "(cast(ss as double) - cast(s as double) * cast(s as double)"
    " / cast(nullif(k, 0) as double))"
    " + (cast(ss1 - ss as double)"
    "    - cast(s1 - s as double) * cast(s1 - s as double)"
    "      / cast(nullif(k1 - k, 0) as double))"
)
BINSEG_RIGHT = (
    "(cast(ss - ss1 as double)"
    " - cast(s - s1 as double) * cast(s - s1 as double)"
    "   / cast(nullif(k - k1, 0) as double))"
    " + (cast(sst - ss as double)"
    "    - cast(st - s as double) * cast(st - s as double)"
    "      / cast(nullif(kt - k, 0) as double))"
)
BINSEG_PARENT_LEFT = (
    "cast(ss1 as double) - cast(s1 as double) * cast(s1 as double)"
    " / cast(nullif(k1, 0) as double)"
)
BINSEG_PARENT_RIGHT = (
    "cast(sst - ss1 as double)"
    " - cast(st - s1 as double) * cast(st - s1 as double)"
    "   / cast(nullif(kt - k1, 0) as double)"
)


def binseg_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-2 binary segmentation of the daily order-count series: the
    best global changepoint (level 0), then the best changepoint WITHIN
    each resulting half (level 1) — up to three breaks with their SSE
    gains, the standard multi-changepoint procedure built on
    `best_changepoint`'s single split (Scott & Knott 1974 lineage).
    The gain column is what a model-selection rule (BIC / permutation)
    thresholds to decide how many breaks are real.

    Determinism: identical prefix-sum machinery as best_changepoint —
    exact integer (k, s, ss) prefixes, per-candidate SSE is one shared
    double expression, argmin ties break to the earliest day.

    Scale shape: facts collapse to the calendar-bounded day grid; every
    stage after runs on that grid (two windows, two broadcast 1-row
    joins).
    """
    daily = read_table(spark, sf_dir, "orders").groupBy(
        F.expr("datediff(o_orderdate, date '1970-01-01')").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    pre = daily.select(
        "d",
        F.count(F.lit(1)).over(w).cast("bigint").alias("k"),
        F.sum("c").over(w).cast("bigint").alias("s"),
        F.sum(F.expr("cast(c as decimal(38,0)) * c")).over(w).alias("ss"),
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("kt"),
        F.sum("c").cast("bigint").alias("st"),
        F.sum(F.expr("cast(c as decimal(38,0)) * c")).alias("sst"),
    )
    cand0 = (
        pre.crossJoin(F.broadcast(tot))
        .where(F.expr("k < kt"))
        .select("d", "k", "s", "ss", "kt", "st", "sst", F.expr(CP_SSE2).alias("sse2"))
    )
    w0 = Window.orderBy(F.col("sse2").asc(), F.col("d").asc())
    best0 = (
        cand0.withColumn("rn", F.row_number().over(w0))
        .filter(F.col("rn") == 1)
        .select(
            F.col("d").alias("t1_d"),
            F.col("k").alias("k1"),
            F.col("s").alias("s1"),
            F.col("ss").alias("ss1"),
            F.col("sse2").alias("sse2_best"),
        )
    )
    root = best0.crossJoin(F.broadcast(tot)).select(
        F.lit(0).cast("int").alias("level"),
        F.lit("root").alias("side"),
        F.col("t1_d").cast("bigint").alias("break_day"),
        F.col("k1").cast("bigint").alias("n_left"),
        F.expr("kt - k1").cast("bigint").alias("n_right"),
        F.round(F.expr(f"({CP_SSE1}) - sse2_best"), 6).alias("gain"),
    )
    seg = pre.crossJoin(F.broadcast(best0)).crossJoin(F.broadcast(tot))
    children = seg.select(
        "d",
        "k",
        F.expr(
            "CASE WHEN k < k1 THEN 'left'"
            "     WHEN k > k1 AND k < kt THEN 'right' END"
        ).alias("side"),
        F.expr(
            f"CASE WHEN k < k1 THEN {BINSEG_LEFT}"
            f"     WHEN k > k1 AND k < kt THEN {BINSEG_RIGHT} END"
        ).alias("sse"),
        F.expr(
            f"CASE WHEN k < k1 THEN {BINSEG_PARENT_LEFT}"
            f"     WHEN k > k1 AND k < kt THEN {BINSEG_PARENT_RIGHT} END"
        ).alias("parent_sse"),
        F.expr("CASE WHEN k < k1 THEN k ELSE k - k1 END").alias("nl"),
        F.expr("CASE WHEN k < k1 THEN k1 - k ELSE kt - k END").alias("nr"),
    ).filter(F.col("side").isNotNull())
    wc = Window.partitionBy("side").orderBy(F.col("sse").asc(), F.col("d").asc())
    child_rows = (
        children.withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") == 1)
        .select(
            F.lit(1).cast("int").alias("level"),
            "side",
            F.col("d").cast("bigint").alias("break_day"),
            F.col("nl").cast("bigint").alias("n_left"),
            F.col("nr").cast("bigint").alias("n_right"),
            F.round(F.expr("parent_sse - sse"), 6).alias("gain"),
        )
    )
    return root.unionByName(child_rows)
