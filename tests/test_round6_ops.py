"""Round-6 operator invariants (ML-stats / experiment-planning batch).

Closed-form and property checks that hold independently of the oracle
parity sweep (tests/test_oracle_parity.py covers value equality; these
pin the STATISTICAL semantics — bounds, symmetries, known closed forms
on tiny hand-built frames).
"""

from __future__ import annotations

import math

import numpy as np

from helium_arango_etl_spark.registry import QUERIES


def test_ks_stat_in_unit_interval(spark, sf_dir):
    row = QUERIES["ks_price_test"](spark, sf_dir).collect()[0]
    assert 0.0 <= row.ks_stat <= 1.0
    assert row.n_a > 0 and row.n_b > 0


def test_ks_matches_scipy_style_recompute(spark, sf_dir):
    """Recompute D with numpy CDFs over the same cents values."""
    import duckdb

    row = QUERIES["ks_price_test"](spark, sf_dir).collect()[0]
    d = duckdb.sql(
        f"""SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderpriority IN ('1-URGENT', '2-HIGH') AS is_a
            FROM '{sf_dir}/orders.parquet'"""
    ).df()
    a = np.sort(d[d.is_a].cents.to_numpy())
    b = np.sort(d[~d.is_a].cents.to_numpy())
    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    assert abs(row.ks_stat - np.max(np.abs(fa - fb))) < 2e-6


def test_mannwhitney_u_symmetry(spark, sf_dir):
    """U1 + U2 = n_a * n_b (doubled: u1_x2 + u2_x2 = 2·n_a·n_b)."""
    row = QUERIES["mannwhitney_value_test"](spark, sf_dir).collect()[0]
    assert 0 <= row.u1_x2 <= 2 * row.n_a * row.n_b
    # z is centered: swapping groups flips the sign, so |z| is bounded by
    # the no-ties maximum |U - mean| / sigma_min
    assert abs(row.z_stat) < 40.0


def test_theilsen_slope_is_median_of_pairs(spark, sf_dir):
    import duckdb

    row = QUERIES["theilsen_daily_trend"](spark, sf_dir).collect()[0]
    d = duckdb.sql(
        f"""SELECT datediff('day', DATE '1970-01-01', o_orderdate) AS d,
               count(*) AS c
            FROM '{sf_dir}/orders.parquet' GROUP BY 1"""
    ).df()
    dd = d.d.to_numpy()
    cc = d.c.to_numpy()
    i, j = np.triu_indices(len(dd), k=1)
    slopes = (cc[j] - cc[i]) / (dd[j] - dd[i])
    assert row.n_days == len(dd)
    assert row.n_pairs == len(slopes)
    assert abs(row.trend_per_day - np.median(slopes)) < 2e-6


def test_power_mde_monotone(spark, sf_dir):
    """Bigger detectable lift -> smaller required sample; all positive."""
    rows = sorted(
        QUERIES["ab_power_mde"](spark, sf_dir).collect(),
        key=lambda r: r.rel_mde,
    )
    assert all(r.n_per_arm > 0 for r in rows)
    ns = [r.n_per_arm for r in rows]
    assert ns == sorted(ns, reverse=True)
    for r in rows:
        assert 0.0 < r.p0_rate < r.p1_rate < 1.0


def test_power_mde_closed_form(spark, sf_dir):
    """Recompute one grid row with math.* directly."""
    rows = QUERIES["ab_power_mde"](spark, sf_dir).collect()
    r = next(x for x in rows if abs(x.rel_mde - 0.10) < 1e-12)
    p0 = r.p0_rate
    p1 = p0 * 1.10
    pbar = (p0 + p1) / 2
    n = (
        1.959963984540054 * math.sqrt(2 * pbar * (1 - pbar))
        + 0.8416212335729143 * math.sqrt(p0 * (1 - p0) + p1 * (1 - p1))
    ) ** 2 / (p1 - p0) ** 2
    # p0_rate is rounded at 6dp, so allow the propagated tolerance
    assert abs(r.n_per_arm - n) / n < 1e-2


def test_corr_matrix_bounds_and_numpy_match(spark, sf_dir):
    import duckdb

    rows = QUERIES["corr_matrix"](spark, sf_dir).collect()
    assert len(rows) == 6
    d = duckdb.sql(
        f"""SELECT CAST(round(l_quantity) AS BIGINT) AS quantity,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS price,
               CAST(round(l_discount * 10000) AS BIGINT) AS discount,
               CAST(round(l_tax * 10000) AS BIGINT) AS tax
            FROM '{sf_dir}/lineitem.parquet'"""
    ).df()
    for r in rows:
        assert -1.0 - 1e-9 <= r.corr <= 1.0 + 1e-9
        ref = np.corrcoef(d[r.m_x].to_numpy(), d[r.m_y].to_numpy())[0, 1]
        assert abs(r.corr - ref) < 2e-6, (r.m_x, r.m_y)


def test_ols_matches_numpy_lstsq(spark, sf_dir):
    import duckdb

    rows = QUERIES["ols_price_model"](spark, sf_dir).collect()
    d = duckdb.sql(
        f"""SELECT p.p_brand,
               CAST(round(l.l_quantity) AS BIGINT) AS y,
               CAST(round(l.l_discount * 10000) AS BIGINT) AS x1,
               CAST(round(l.l_extendedprice / l.l_quantity * 100)
                 AS BIGINT) AS x2
            FROM '{sf_dir}/lineitem.parquet' l
            JOIN '{sf_dir}/part.parquet' p ON l.l_partkey = p.p_partkey"""
    ).df()
    checked = 0
    for r in rows:
        g = d[d.p_brand == r.p_brand]
        if len(g) < 10 or r.intercept is None:
            continue
        X = np.column_stack(
            [np.ones(len(g)), g.x1.to_numpy(), g.x2.to_numpy()]
        )
        beta = np.linalg.lstsq(X, g.y.to_numpy().astype(float), rcond=None)[0]
        assert abs(r.intercept - beta[0]) < 1e-3
        assert abs(r.beta_discount_bps - beta[1]) < 1e-6
        assert abs(r.beta_price_cent - beta[2]) < 1e-6
        checked += 1
    assert checked >= 5


def test_l_diversity_entropy_bounds(spark, sf_dir):
    rows = QUERIES["l_diversity_audit"](spark, sf_dir).collect()
    for r in rows:
        assert r.l <= r.k
        # 0 <= H <= ln(l), equality at uniform sensitive distribution
        assert -1e-6 <= r.sens_entropy <= math.log(r.l) + 1e-6
        assert r.is_weak == (r.k < 10 or r.l < 3)


def test_sorted_neighborhood_is_subset_of_rank_pairs(spark, sf_dir):
    rows = QUERIES["sorted_neighborhood_pairs"](spark, sf_dir).collect()
    for r in rows:
        assert r.pk_a != r.pk_b
        assert 0 < r.n_inter <= r.n_union
        assert r.jaccard >= 0.25
        assert abs(r.jaccard - round(r.n_inter / r.n_union, 6)) < 1e-9


def test_quantile_normalize_preserves_order_and_marginals(spark, sf_dir):
    import pandas as pd

    pdf = QUERIES["quantile_normalize"](spark, sf_dir).toPandas()
    # every doc mapped, exactly once
    assert pdf.doc_id.is_unique
    # within a source, the mapping is monotone in the original value
    for _, g in pdf.groupby("source"):
        gs = g.sort_values(["n_chars", "doc_id"])
        assert (gs.norm_chars.diff().dropna() >= 0).all()
    # normalized values are drawn from the global value set
    assert set(pdf.norm_chars) <= set(pdf.n_chars)
    # the largest doc of the largest source maps to the global max
    big = pdf.groupby("source").size().idxmax()
    g = pdf[pdf.source == big]
    assert g.norm_chars.max() == pdf.n_chars.max()
    assert isinstance(pdf, pd.DataFrame)


def test_acf_bounds_and_lag1_positive(spark, sf_dir):
    rows = QUERIES["autocorrelation_daily"](spark, sf_dir).collect()
    assert {r.lag for r in rows} == {1, 2, 7, 14}
    for r in rows:
        assert -1.0 - 1e-9 <= r.acf <= 1.0 + 1e-9
        assert r.n > 0


def test_changepoint_reduces_sse(spark, sf_dir):
    row = QUERIES["best_changepoint"](spark, sf_dir).collect()[0]
    assert row.sse_two_segment <= row.sse_one_segment + 1e-6
    assert row.n_days > 1


def test_changepoint_matches_numpy_scan(spark, sf_dir):
    import duckdb

    row = QUERIES["best_changepoint"](spark, sf_dir).collect()[0]
    d = duckdb.sql(
        f"""SELECT datediff('day', DATE '1970-01-01', o_orderdate) AS d,
               count(*) AS c
            FROM '{sf_dir}/orders.parquet' GROUP BY 1 ORDER BY 1"""
    ).df()
    c = d.c.to_numpy().astype(float)
    best, bestd = None, None
    for t in range(1, len(c)):
        l, r = c[:t], c[t:]
        sse = ((l - l.mean()) ** 2).sum() + ((r - r.mean()) ** 2).sum()
        if best is None or sse < best - 1e-9:
            best, bestd = sse, d.d.iloc[t - 1]
    assert abs(row.sse_two_segment - best) < 1e-3
    assert row.split_day == bestd


def test_mad_anomalies_are_extreme(spark, sf_dir):
    rows = QUERIES["mad_anomaly_days"](spark, sf_dir).collect()
    for r in rows:
        assert abs(r.robust_z) > 3.0
        assert r.mad > 0


def test_assortativity_bounds(spark, sf_dir):
    rows = QUERIES["city_assortativity"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.assortativity is not None:
            assert -1.0 - 1e-9 <= r.assortativity <= 1.0 + 1e-9
        assert r.n_edges > 0


def test_ppr_sums_to_one_and_seed_dominates(spark, sf_dir):
    pdf = QUERIES["city_ppr_joins"](spark, sf_dir).toPandas()
    assert len(pdf)
    for _, g in pdf.groupby("city_key"):
        # total PPR mass is conserved (up to per-iteration quantization)
        assert abs(g.ppr.sum() - 1.0) < 1e-3
        assert (g.ppr >= -1e-9).all()


def test_memorization_risk_bounds(spark, sf_dir):
    rows = QUERIES["memorization_risk_ngrams"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_singleton <= r.n_distinct <= r.n_ngrams
        assert 0.0 <= r.risk_ratio <= 1.0


def test_range_partition_planner_conservation(spark, sf_dir):
    import duckdb

    rows = QUERIES["range_partition_planner"](spark, sf_dir).collect()
    total = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/lineitem.parquet'"
    ).fetchone()[0]
    for scheme in ("hash", "range"):
        g = [r for r in rows if r.scheme == scheme]
        assert sum(r.n_rows for r in g) == total, scheme
        assert all(0 <= r.bucket < 16 for r in g)
    # range partitioning balances rows better than (or as well as) hash
    # partitioning balances them on this skewless key — both near 1.0
    rng = [r for r in rows if r.scheme == "range"]
    assert max(r.load_ratio for r in rng) < 2.0


def test_bloom_fpr_decreases_with_bits(spark, sf_dir):
    rows = sorted(
        QUERIES["bloom_fpr_plan"](spark, sf_dir).collect(),
        key=lambda r: r.bits_per_key,
    )
    fprs = [r.fpr for r in rows]
    assert fprs == sorted(fprs, reverse=True)
    assert all(0.0 < f < 0.05 for f in fprs)
    for r in rows:
        assert r.m_bits == r.n_keys * r.bits_per_key
        # k* = ln2 * bits/key, and fpr ~ 0.6185^bpk
        assert abs(r.fpr - 0.6185 ** r.bits_per_key) / r.fpr < 0.15


def test_trimmed_mean_between_bounds(spark, sf_dir):
    import duckdb

    rows = QUERIES["trimmed_mean_values"](spark, sf_dir).collect()
    d = duckdb.sql(
        f"""SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
            FROM '{sf_dir}/events.parquet' WHERE value IS NOT NULL"""
    ).df()
    import numpy as np

    for r in rows:
        vals = np.sort(d[d.event_type == r.event_type].cents.to_numpy())
        lo = (5 * len(vals)) // 100
        ref = vals[lo : len(vals) - lo].mean()
        assert abs(r.trimmed_mean_cents - ref) < 1e-3, r.event_type
        assert r.n == len(vals) and r.n_trimmed_each_side == lo


def test_hhi_bounds_and_closed_form(spark, sf_dir):
    rows = QUERIES["hhi_concentration"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 1/n <= HHI <= 1
        assert 1.0 / r.n_customers - 1e-9 <= r.hhi <= 1.0 + 1e-9
        if r.hhi_normalized is not None:
            assert -1e-6 <= r.hhi_normalized <= 1.0 + 1e-9


def test_weekday_anova_positive(spark, sf_dir):
    row = QUERIES["weekday_anova"](spark, sf_dir).collect()[0]
    assert row.f_stat >= 0.0
    assert 0.0 <= row.eta_sq <= 1.0
    assert row.fano_dispersion > 0.0


def test_burstiness_in_range(spark, sf_dir):
    rows = QUERIES["interevent_burstiness"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r.burstiness <= 1.0
        assert r.std_gap_us >= 0.0 and r.mean_gap_us > 0.0


def test_entropy_rate_bounds(spark, sf_dir):
    row = QUERIES["markov_entropy_rate"](spark, sf_dir).collect()[0]
    # 0 <= H <= ln(#event types) = ln 5
    assert -1e-6 <= row.entropy_rate_nats <= math.log(5) + 1e-6
    assert row.n_cells <= 25


def test_transitivity_vs_local_clustering(spark, sf_oracle_dir):
    # sf0.01: the sf0.001 co-witness projection is empty (same as
    # local_clustering_coeff — no dst has two witnesses at that scale)
    rows = QUERIES["city_transitivity"](spark, sf_oracle_dir).collect()
    assert rows
    for r in rows:
        if r.transitivity is not None:
            assert -1e-9 <= r.transitivity <= 1.0 + 1e-9
        # every triangle contains exactly 3 wedges
        assert 3 * r.triangles <= r.wedges


def test_cohort_retention_monotone_k0(spark, sf_dir):
    rows = QUERIES["cohort_retention_matrix"](spark, sf_dir).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        assert 0.0 < r.retention <= 1.0
        assert r.n_active <= r.n_cohort
        by_cohort.setdefault(r.cohort_month_idx, {})[r.months_since] = r
    for _, ks in by_cohort.items():
        # month 0 contains every cohort member by construction
        assert ks[0].retention == 1.0


def test_ratio_metric_ci_contains_ratio(spark, sf_dir):
    rows = QUERIES["ratio_metric_ci"](spark, sf_dir).collect()
    assert len(rows) == 2
    for r in rows:
        assert r.ci_lo <= r.cents_per_event <= r.ci_hi
        assert r.se >= 0.0


def test_wasserstein_vs_numpy(spark, sf_dir):
    import duckdb
    import numpy as np

    row = QUERIES["wasserstein_price_shift"](spark, sf_dir).collect()[0]
    d = duckdb.sql(
        f"""SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderpriority IN ('1-URGENT', '2-HIGH') AS is_a
            FROM '{sf_dir}/orders.parquet'"""
    ).df()
    a = np.sort(d[d.is_a].cents.to_numpy())
    b = np.sort(d[~d.is_a].cents.to_numpy())
    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    ref = float(np.sum(np.abs(fa[:-1] - fb[:-1]) * np.diff(grid)))
    assert abs(row.w1_cents - ref) < 1e-2
    assert 0.0 <= row.w1_normalized <= 1.0


def test_geo_core_points_neighbor_symmetry(spark, sf_dir):
    pdf = QUERIES["geo_core_points"](spark, sf_dir).toPandas()
    assert pdf.s_suppkey.is_unique
    # total neighbor relation is symmetric -> even sum
    assert int(pdf.n_neighbors.sum()) % 2 == 0
    for _, r in pdf.iterrows():
        assert r.is_core == (r.n_neighbors >= 3)


def test_readability_scores_sane(spark, sf_dir):
    rows = QUERIES["readability_scores"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_words > 0 and r.n_syllables > 0
        assert r.n_sentences >= r.n_docs  # floor of 1 per doc
        assert -200.0 < r.flesch_ease < 207.0


def test_stylometry_delta_symmetric_nonneg(spark, sf_dir):
    rows = QUERIES["stylometry_delta"](spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r.source_a < r.source_b
        assert r.delta >= 0.0
        assert 0 < r.n_words <= 50
        seen.add((r.source_a, r.source_b))
    assert len(seen) == len(rows)


def test_cramers_v_in_unit_interval(spark, sf_dir):
    rows = QUERIES["cramers_v_matrix"](spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert 0.0 <= r.cramers_v <= 1.0 + 1e-6
        assert r.chi2 >= 0.0


def test_histogram_bins_positive(spark, sf_dir):
    rows = QUERIES["optimal_histogram_bins"](spark, sf_dir).collect()
    assert {r.measure for r in rows} == {"order_price", "event_value"}
    for r in rows:
        assert r.bins_sturges > 0
        if r.bins_fd is not None:
            assert r.bins_fd > 0
            # FD typically recommends more bins than Sturges at scale
            assert r.bins_fd >= 1


def test_p_chart_limits_bracket_center(spark, sf_dir):
    rows = QUERIES["p_chart_days"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.lcl <= r.p_bar <= r.ucl <= 1.0
        assert 0.0 <= r.p_hat <= 1.0
        assert r.x <= r.n


def test_conversion_window_monotone(spark, sf_dir):
    rows = sorted(
        QUERIES["conversion_window_sensitivity"](spark, sf_dir).collect(),
        key=lambda r: r.window_days,
    )
    assert [r.window_days for r in rows] == [1, 3, 7, 14]
    convs = [r.conversion for r in rows]
    # wider window can only capture more conversions
    assert convs == sorted(convs)
    for r in rows:
        assert r.n_converted <= r.n_users


def test_training_step_plan_consistency(spark, sf_dir):
    rows = QUERIES["training_step_plan"](spark, sf_dir).collect()
    assert {r.split for r in rows} == {"train", "val", "test"}
    for r in rows:
        assert r.n_seqs == -(-r.tokens // 512)
        assert r.steps_per_epoch == r.n_seqs // r.batch_size
        assert r.seqs_dropped == r.n_seqs % r.batch_size
        # == 1.0 when the split is smaller than one global batch
        assert 0.0 <= r.drop_fraction <= 1.0


def test_kendall_tau_vs_scipy_free_recompute(spark, sf_dir):
    import duckdb

    row = QUERIES["kendall_tau_daily"](spark, sf_dir).collect()[0]
    d = duckdb.sql(
        f"""SELECT count(*) AS x,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
            FROM '{sf_dir}/orders.parquet'
            GROUP BY datediff('day', DATE '1970-01-01', o_orderdate)"""
    ).df()
    x = d.x.to_numpy()
    y = d.y.to_numpy()
    i, j = np.triu_indices(len(x), k=1)
    cmp_ = np.sign(x[j] - x[i]) * np.sign(y[j] - y[i])
    s = int(np.sum(cmp_))
    assert row.s == s
    assert -1.0 <= row.tau_b <= 1.0


def test_mann_kendall_consistent_with_theilsen(spark, sf_dir):
    mk = QUERIES["mann_kendall_trend"](spark, sf_dir).collect()[0]
    ts = QUERIES["theilsen_daily_trend"](spark, sf_dir).collect()[0]
    # the trend test's direction agrees with the robust slope's sign
    # (both zero-ish counts as agreement)
    if abs(mk.z_stat) > 2.0:
        assert (mk.s > 0) == (ts.trend_per_day > 0)


def test_hill_alpha_positive(spark, sf_dir):
    row = QUERIES["hill_tail_index"](spark, sf_dir).collect()[0]
    assert row.hill_alpha > 0.0
    assert row.n_exceed <= 200
    assert row.threshold_cents > 0


def test_negbin_fit_closed_form(spark, sf_dir):
    row = QUERIES["negbin_fit_orders"](spark, sf_dir).collect()[0]
    assert row.dispersion_index > 0.0
    if row.nb_r is not None:
        mu, r = row.mean_lines, row.nb_r
        assert abs(row.nb_p - r / (r + mu)) < 1e-4
        assert r > 0.0


def test_isotonic_calibration_is_monotone_and_pooled(spark, sf_dir):
    rows = sorted(
        QUERIES["isotonic_calibration"](spark, sf_dir).collect(),
        key=lambda r: r.bin,
    )
    iso = [r.iso_rate for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(iso, iso[1:]))
    assert all(0.0 <= v <= 1.0 for v in iso)
    # PAVA preserves the weighted mean of the fitted sequence
    n = [r.n for r in rows]
    raw = [r.raw_rate for r in rows]
    w_raw = sum(ni * ri for ni, ri in zip(n, raw)) / sum(n)
    w_iso = sum(ni * vi for ni, vi in zip(n, iso)) / sum(n)
    assert abs(w_raw - w_iso) < 1e-4


def test_isotonic_matches_sklearn_style_pava(spark, sf_dir):
    """Independent sequential PAVA (pool-adjacent-violators sweep) must
    agree with the declarative minimax form."""
    rows = sorted(
        QUERIES["isotonic_calibration"](spark, sf_dir).collect(),
        key=lambda r: r.bin,
    )
    blocks = []  # (sum_y_estimate*n via raw-rate, n)
    for r in rows:
        s, n = r.raw_rate * r.n, r.n
        blocks.append([s, n])
        while len(blocks) > 1 and (
            blocks[-2][0] * blocks[-1][1] > blocks[-1][0] * blocks[-2][1]
        ):
            s1, n1 = blocks.pop()
            blocks[-1][0] += s1
            blocks[-1][1] += n1
    # expand: each block covers as many bins as merged
    fit = []
    i = 0
    for s, n in blocks:
        covered = 0
        while covered < n - 1e-6:
            covered += rows[i].n
            fit.append(s / n)
            i += 1
    assert len(fit) == len(rows)
    for got, r in zip(fit, rows):
        assert abs(got - r.iso_rate) < 1e-4


def test_pacf_lag1_equals_acf_lag1(spark, sf_dir):
    row = QUERIES["pacf_daily"](spark, sf_dir).collect()[0]
    assert row.pacf_1 == row.acf_1
    for v in (row.pacf_1, row.pacf_2, row.pacf_3):
        assert -1.0 - 1e-9 <= v <= 1.0 + 1e-9


def test_markov_absorption_bounds_and_growth(spark, sf_dir):
    from helium_arango_etl_spark.operators.mlstats import ABSORB_STEPS

    rows = QUERIES["markov_absorption"](spark, sf_dir).collect()
    col = f"p_absorb_{ABSORB_STEPS}"
    assert rows
    for r in rows:
        assert 0.0 <= r[col] <= 1.0
        assert r.n_out > 0
    # with a purchase event type present, some state must have a
    # nonzero absorption probability within 8 steps
    assert any(r[col] > 0.0 for r in rows)


def test_event_precedence_antisymmetry(spark, sf_dir):
    rows = QUERIES["event_precedence_matrix"](spark, sf_dir).collect()
    by_key = {(r.a, r.b): r for r in rows}
    for (a, b), r in by_key.items():
        mirror = by_key[(b, a)]
        assert mirror.n_both == r.n_both
        # strict-precedence counts can't double-count: ties go to neither
        assert r.n_a_first + mirror.n_a_first <= r.n_both
        assert 0.0 <= r.p_a_first <= 1.0
