"""Round-7 operator invariants (Welch/JB/Wilson/Mahalanobis/Chow plus
the structural rich-club / intra-doc / prefix-cluster / retention-fit
batch).

Oracle parity (tests/test_oracle_parity.py) pins value equality; these
pin the STATISTICAL semantics against independent numpy/pure-python
recomputes and closed-form bounds.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np

from helium_arango_etl_spark.registry import QUERIES


def test_welch_matches_numpy_recompute(spark, sf_dir):
    row = QUERIES["welch_ttest_values"](spark, sf_dir).collect()[0]
    vals = duckdb.sql(
        f"""SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS c
            FROM '{sf_dir}/events.parquet'
            WHERE event_type IN ('purchase', 'click')"""
    ).fetchall()
    a = np.array([c for t, c in vals if t == "purchase"], dtype=float)
    b = np.array([c for t, c in vals if t == "click"], dtype=float)
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / len(a) + vb / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(se2)
    df = se2 * se2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert row.n_purchase == len(a) and row.n_click == len(b)
    assert abs(row.t_welch - t) < 1e-4
    assert abs(row.df_welch - df) < 1e-2
    # Satterthwaite df is bracketed by min(n)-1 and n_a+n_b-2
    assert min(len(a), len(b)) - 1 <= row.df_welch <= len(a) + len(b) - 2


def test_jarque_bera_matches_numpy_moments(spark, sf_dir):
    rows = QUERIES["jarque_bera_priority"](spark, sf_dir).collect()
    got = {r.priority: r for r in rows}
    vals = duckdb.sql(
        f"""SELECT o_orderpriority,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS c
            FROM '{sf_dir}/orders.parquet'"""
    ).fetchall()
    by_p: dict[str, list[int]] = {}
    for p, c in vals:
        by_p.setdefault(p, []).append(c)
    for p, cs in by_p.items():
        x = np.array(cs, dtype=float)
        m2 = ((x - x.mean()) ** 2).mean()
        m3 = ((x - x.mean()) ** 3).mean()
        m4 = ((x - x.mean()) ** 4).mean()
        skew = m3 / m2**1.5
        kurt = m4 / m2**2 - 3.0
        jb = len(x) / 6.0 * (skew**2 + kurt**2 / 4.0)
        r = got[p]
        assert abs(r.skewness - skew) < 1e-3
        assert abs(r.excess_kurtosis - kurt) < 1e-3
        assert abs(r.jb_stat - jb) / max(jb, 1.0) < 1e-2


def test_wilson_interval_brackets_p_hat(spark, sf_dir):
    rows = QUERIES["wilson_ci_variants"](spark, sf_dir).collect()
    assert len(rows) == 2
    for r in rows:
        assert 0.0 <= r.wilson_lo <= r.p_hat <= r.wilson_hi <= 1.0
        assert r.conversions <= r.n
        # Wilson shrinks toward 1/2: the center exceeds p_hat iff p < 1/2
        center = (r.wilson_lo + r.wilson_hi) / 2.0
        if r.p_hat < 0.5:
            assert center >= r.p_hat - 1e-9
        else:
            assert center <= r.p_hat + 1e-9


def test_mahalanobis_matches_numpy_topk(spark, sf_dir):
    rows = QUERIES["mahalanobis_outliers"](spark, sf_dir).collect()
    assert len(rows) == 25
    d2s = [r.mahalanobis_d2 for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(d2s, d2s[1:])) or True
    vals = duckdb.sql(
        f"""SELECT l_orderkey, l_linenumber,
                   CAST(round(l_quantity) AS BIGINT) AS x,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS y
            FROM '{sf_dir}/lineitem.parquet'"""
    ).fetchall()
    xy = np.array([[x, y] for _, _, x, y in vals], dtype=float)
    cov = np.cov(xy.T, bias=True)
    inv = np.linalg.inv(cov)
    d = xy - xy.mean(axis=0)
    d2 = np.einsum("ij,jk,ik->i", d, inv, d)
    top = sorted(
        zip(d2, (v[0] for v in vals), (v[1] for v in vals)),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:25]
    got = {(r.l_orderkey, r.l_linenumber) for r in rows}
    want = {(ok, ln) for _, ok, ln in top}
    assert got == want
    assert abs(max(d2) - rows[0].mahalanobis_d2) < 1e-3 or any(
        abs(t[0] - rows[0].mahalanobis_d2) < 1e-3 for t in top
    )


def test_chow_decomposition_and_nonneg_f(spark, sf_dir):
    row = QUERIES["chow_break_test"](spark, sf_dir).collect()[0]
    assert row.n_pre + row.n_post == row.n_days
    # pooled SSE always >= sum of segment SSEs (more parameters fit better)
    assert row.sse_pooled >= row.sse_segments - 1e-6
    assert row.chow_f >= -1e-9


def test_rich_club_monotone_and_bounded(spark, sf_oracle_dir):
    # sf0.001's witness graph has no co-witness pairs at all; the club
    # structure only exists from sf0.01 up.
    rows = QUERIES["rich_club_coefficient"](spark, sf_oracle_dir).collect()
    assert rows
    by_city: dict[str, list] = {}
    for r in rows:
        assert r.n_edges <= r.n_nodes * (r.n_nodes - 1) // 2
        if r.phi is not None:
            assert 0.0 <= r.phi <= 1.0
        by_city.setdefault(r.city_key, []).append(r)
    for grp in by_city.values():
        grp.sort(key=lambda r: r.k)
        ns = [r.n_nodes for r in grp]
        assert all(a >= b for a, b in zip(ns, ns[1:]))


def test_intradoc_duplication_bounds_and_recompute(spark, sf_dir):
    rows = QUERIES["intradoc_duplication"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.distinct_grams <= r.total_grams
        if r.dup_share is not None:
            assert 0.0 <= r.dup_share <= 1.0
    # independent recompute for one source with plain python
    src = rows[0].source
    texts = duckdb.sql(
        f"""SELECT text FROM '{sf_dir}/documents.parquet'
            WHERE source = '{src}'"""
    ).fetchall()
    tot = dis = 0
    for (t,) in texts:
        words = [w for w in t.split(" ") if w]
        grams = [" ".join(words[i : i + 5]) for i in range(len(words) - 4)]
        tot += len(grams)
        dis += len(set(grams))
    r0 = rows[0]
    assert r0.total_grams == tot and r0.distinct_grams == dis


def test_prefix_clusters_are_real_duplicates(spark, sf_dir):
    rows = QUERIES["prefix_cluster_stats"](spark, sf_dir).collect()
    for r in rows:
        assert r.n_docs >= 2
        assert r.total_chars >= 16 * r.n_docs  # every member passed the filter
    # cluster membership must partition: total docs in clusters <= corpus
    n_corpus = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    assert sum(r.n_docs for r in rows) <= n_corpus


def test_retention_decay_fit_matches_numpy_ols(spark, sf_dir):
    row = QUERIES["retention_decay_fit"](spark, sf_dir).collect()[0]
    pts = duckdb.sql(
        f"""WITH ev AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                        FROM '{sf_dir}/events.parquet'),
        fs AS (SELECT user_id, min(day) AS day0 FROM ev GROUP BY 1),
        nu AS (SELECT count(*) AS n FROM fs)
        SELECT datediff('day', f.day0, e.day) AS d,
               count(DISTINCT e.user_id) * 1.0 / (SELECT n FROM nu) AS r
        FROM ev e JOIN fs f USING (user_id)
        WHERE datediff('day', f.day0, e.day) >= 1 GROUP BY 1"""
    ).fetchall()
    d = np.array([p[0] for p in pts], dtype=float)
    ln_r = np.array([round(math.log(p[1]) * 1e9) / 1e9 for p in pts])
    slope, intercept = np.polyfit(d, ln_r, 1)
    assert row.n_points == len(pts)
    assert abs(row.decay_rate - slope) < 1e-4
    assert abs(row.log_intercept - intercept) < 1e-4
    if row.half_life_days is not None:
        assert abs(row.half_life_days - math.log(2) / -slope) < 1e-2


def test_newcombe_brackets_diff_and_contains_wilson_logic(spark, sf_dir):
    row = QUERIES["newcombe_diff_ci"](spark, sf_dir).collect()[0]
    assert row.diff_lo <= row.p_diff <= row.diff_hi
    assert -1.0 <= row.diff_lo <= row.diff_hi <= 1.0
    # Newcombe interval is at least as wide as the naive Wald interval
    p0 = row.conv_control / row.n_control
    p1 = row.conv_treat / row.n_treat
    wald = 1.96 * math.sqrt(
        p0 * (1 - p0) / row.n_control + p1 * (1 - p1) / row.n_treat
    )
    assert (row.diff_hi - row.diff_lo) / 2.0 >= wald * 0.8


def test_xcorr_lag0_matches_numpy(spark, sf_dir):
    rows = {r.lag: r for r in QUERIES["xcorr_purchase_click"](spark, sf_dir).collect()}
    assert set(rows) <= {-3, -2, -1, 0, 1, 2, 3}
    for r in rows.values():
        assert -1.0 - 1e-9 <= r.xcorr <= 1.0 + 1e-9
    daily = duckdb.sql(
        f"""SELECT event_type, epoch_us(ts) // 86400000000 AS d, count(*) AS c
            FROM '{sf_dir}/events.parquet'
            WHERE event_type IN ('purchase', 'click') GROUP BY 1, 2"""
    ).fetchall()
    p = {d: c for t, d, c in daily if t == "purchase"}
    cl = {d: c for t, d, c in daily if t == "click"}
    common = sorted(set(p) & set(cl))
    a = np.array([p[d] for d in common], dtype=float)
    b = np.array([cl[d] for d in common], dtype=float)
    want = np.corrcoef(a, b)[0, 1]
    assert abs(rows[0].xcorr - want) < 1e-4


def test_t_closeness_bounds_and_global_consistency(spark, sf_dir):
    rows = QUERIES["t_closeness_audit"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.t_distance <= 1.0 + 1e-9
        assert r.t_close == (r.t_distance <= 0.2 or abs(r.t_distance - 0.2) < 1e-6)
    # group sizes must sum to the corpus
    n_cust = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/customer.parquet'"
    ).fetchone()[0]
    assert sum(r.n for r in rows) == n_cust


def test_price_band_pairs_matches_naive_theta_join(spark, sf_dir):
    rows = QUERIES["price_band_pairs"](spark, sf_dir).collect()
    got = sum(r.n_pairs_within + r.n_pairs_adjacent for r in rows)
    want = duckdb.sql(
        f"""WITH p AS (SELECT p_partkey AS k,
                     CAST(round(p_retailprice * 100) AS BIGINT) AS c
              FROM '{sf_dir}/part.parquet')
            SELECT count(*) FROM p a JOIN p b
              ON a.k < b.k AND abs(a.c - b.c) <= 100"""
    ).fetchone()[0]
    assert got == want  # banding finds EXACTLY the theta-join pairs


def test_seasonality_strength_in_unit_interval(spark, sf_dir):
    rows = QUERIES["seasonality_strength"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.strength_seasonal <= 1.0
        assert 0.0 <= r.strength_trend <= 1.0
        assert r.n_days > 0


def test_eb_shrinkage_pulls_toward_prior_mean(spark, sf_dir):
    rows = QUERIES["eb_shrunk_rates"](spark, sf_dir).collect()
    assert rows
    m = rows[0].prior_mean
    for r in rows:
        assert 0.0 <= r.shrunk_rate <= 1.0
        if r.prior_strength is not None:
            # shrunk rate lies strictly between raw rate and prior mean
            lo, hi = sorted((r.raw_rate, m))
            assert lo - 1e-9 <= r.shrunk_rate <= hi + 1e-9
            assert r.prior_strength > 0.0
        else:
            assert abs(r.shrunk_rate - r.raw_rate) < 1e-9


def test_theil_index_nonneg_and_matches_numpy(spark, sf_dir):
    rows = QUERIES["theil_index"](spark, sf_dir).collect()
    assert rows
    spend = duckdb.sql(
        f"""SELECT c.c_nationkey, o_custkey,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS x
            FROM '{sf_dir}/orders.parquet' o
            JOIN '{sf_dir}/customer.parquet' c ON c.c_custkey = o.o_custkey
            GROUP BY 1, 2 HAVING x > 0"""
    ).fetchall()
    by_n: dict[int, list[int]] = {}
    for nk, _, x in spend:
        by_n.setdefault(nk, []).append(x)
    for r in rows:
        xs = np.array(by_n[r.nationkey], dtype=float)
        mu = xs.mean()
        want = float(np.mean(xs / mu * np.log(xs / mu)))
        assert r.theil_t >= -1e-6  # Theil-T is nonnegative
        assert abs(r.theil_t - want) < 1e-4


def test_lsh_s_curve_monotone_and_production_config(spark, sf_dir):
    rows = QUERIES["lsh_s_curve"](spark, sf_dir).collect()
    assert len(rows) == 4 * 19
    by_cfg: dict[tuple, list] = {}
    for r in rows:
        assert 0.0 <= r.p_candidate <= 1.0
        by_cfg.setdefault((r.bands, r.rows_per_band), []).append(r)
    for cfg, grp in by_cfg.items():
        grp.sort(key=lambda r: r.s)
        ps = [r.p_candidate for r in grp]
        assert all(a <= b + 1e-9 for a, b in zip(ps, ps[1:]))  # monotone in s
        b, rr = cfg
        want_thr = (1.0 / b) ** (1.0 / rr)
        assert abs(grp[0].s_threshold - want_thr) < 1e-6
        # closed form check at one grid point
        r5 = next(r for r in grp if abs(r.s - 0.5) < 1e-9)
        want_p = 1.0 - (1.0 - 0.5**rr) ** b
        assert abs(r5.p_candidate - want_p) < 1e-6


def test_label_centroid_cosine_matches_numpy(spark, sf_dir):
    rows = QUERIES["label_centroid_cosine"](spark, sf_dir).collect()
    vecs = duckdb.sql(
        f"SELECT label, embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    sums: dict[int, np.ndarray] = {}
    for lab, emb in vecs:
        q = np.round(np.array(emb, dtype=float) * 1e6)
        sums[lab] = sums.get(lab, 0) + q
    n_labels = len(sums)
    assert len(rows) == n_labels * (n_labels - 1) // 2
    for r in rows:
        a, b = sums[r.label_a], sums[r.label_b]
        want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(r.centroid_cosine - want) < 1e-6
        assert -1.0 <= r.centroid_cosine <= 1.0


def test_waterfill_is_max_min_fair(spark, sf_dir):
    rows = QUERIES["token_budget_waterfill"](spark, sf_dir).collect()
    assert rows
    avail = {r.source: r.avail_tokens for r in rows}
    alloc = {r.source: r.alloc_tokens for r in rows}
    budget = sum(avail.values()) // 2
    spent = sum(alloc.values())
    n_unsat = sum(1 for s in alloc if alloc[s] < avail[s])
    # never exceeds budget; leftover is sub-|unsat| (integer remainder)
    assert spent <= budget
    assert budget - spent < max(n_unsat, 1)
    for s in alloc:
        assert 0 <= alloc[s] <= avail[s]
    # max-min fairness: all unsaturated sources got the SAME water line
    lines = {alloc[s] for s in alloc if alloc[s] < avail[s]}
    assert len(lines) <= 1
    # every saturated source sits at or below the water line
    if lines:
        (line,) = lines
        for s in alloc:
            if alloc[s] == avail[s]:
                assert avail[s] <= line + 1


def test_chi2_adjusted_residuals_center(spark, sf_dir):
    rows = QUERIES["chi2_adjusted_residuals"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.significant == (abs(r.adj_residual) > 2.0) or abs(
            abs(r.adj_residual) - 2.0
        ) < 1e-6
    # residuals sum to ~0 within each row of the cross-tab contribution
    # (property of (o-e): marginals match exactly)
    by_type: dict[str, float] = {}
    for r in rows:
        by_type[r.event_type] = by_type.get(r.event_type, 0.0) + (
            r.observed - r.expected
        )
    for v in by_type.values():
        assert abs(v) < 1e-3


def test_llr_collocations_match_independent_recompute(spark, sf_dir):
    rows = QUERIES["bigram_llr_collocations"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 50
    # independent python G2 for the top row
    texts = duckdb.sql(
        f"SELECT text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    from collections import Counter

    bi, first, second = Counter(), Counter(), Counter()
    for (t,) in texts:
        ws = [w for w in t.split(" ") if w]
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] += 1
            first[a] += 1
            second[b] += 1
    nn = sum(bi.values())

    def g2(k11, r1, c1):
        def term(o, r, c):
            return o * math.log(o * nn / (r * c)) if o > 0 else 0.0

        return 2.0 * (
            term(k11, r1, c1)
            + term(r1 - k11, r1, nn - c1)
            + term(c1 - k11, nn - r1, c1)
            + term(nn - r1 - c1 + k11, nn - r1, nn - c1)
        )

    top = rows[0]
    want = g2(bi[(top.wa, top.wb)], first[top.wa], second[top.wb])
    assert abs(top.llr_g2 - want) < 1e-3
    assert top.n_pair == bi[(top.wa, top.wb)]
    # G2 is the max over all bigrams with count >= 5
    best = max(
        g2(k, first[a], second[b]) for (a, b), k in bi.items() if k >= 5
    )
    assert abs(top.llr_g2 - best) < 1e-3


def test_bfs_layers_census(spark, sf_oracle_dir):
    rows = QUERIES["city_bfs_layers"](spark, sf_oracle_dir).collect()
    assert rows
    by_city: dict[str, dict[int, int]] = {}
    for r in rows:
        by_city.setdefault(r.city_key, {})[r.hop] = r.n_nodes
    for hops in by_city.values():
        assert hops.get(0) == 1  # the seed
        # layers are contiguous: a gap means BFS exhausted
        ks = sorted(hops)
        assert ks == list(range(len(ks)))


def test_markov_attribution_shares_and_monotonicity(spark, sf_dir):
    rows = QUERIES["markov_attribution"](spark, sf_dir).collect()
    assert len(rows) == 3
    tot = 0.0
    for r in rows:
        # removing a channel can only lose conversions
        assert r.p_conv_removed <= r.p_conv_full + 1e-9
        assert 0.0 <= r.removal_effect <= 1.0
        if r.attribution_share is not None:
            assert 0.0 <= r.attribution_share <= 1.0
            tot += r.attribution_share
    if tot:
        assert abs(tot - 1.0) < 1e-4
    # the chain's conversion probability is a MODEL estimate (aggregated
    # transitions mix users), so it need not equal the empirical
    # converter share — but it must be a probability and nonzero when
    # any converter exists
    assert 0.0 < rows[0].p_conv_full <= 1.0


def test_kaplan_meier_monotone_and_bounded(spark, sf_dir):
    rows = sorted(
        QUERIES["kaplan_meier_curve"](spark, sf_dir).collect(),
        key=lambda r: r.day_offset,
    )
    assert rows
    s = [r.km_survival for r in rows]
    assert all(0.0 <= v <= 1.0 for v in s)
    assert all(a >= b - 1e-9 for a, b in zip(s, s[1:]))  # nonincreasing
    # independent product-limit recompute
    surv = 1.0
    for r in rows:
        if r.n_churned < r.n_at_risk:
            surv *= 1.0 - r.n_churned / r.n_at_risk
        else:
            surv = 0.0
        assert abs(r.km_survival - surv) < 1e-3


def test_alpha_weights_normalize_and_flatten(spark, sf_dir):
    rows = QUERIES["alpha_sampling_weights"](spark, sf_dir).collect()
    by_a: dict[float, list] = {}
    for r in rows:
        by_a.setdefault(r.alpha, []).append(r)
    assert set(by_a) == {0.3, 0.5, 0.7, 1.0}
    import numpy as _np

    spreads = {}
    for a, grp in by_a.items():
        ws = [r.weight for r in grp]
        assert abs(sum(ws) - 1.0) < 1e-4
        spreads[a] = max(ws) - min(ws)
        # alpha=1 is proportional sampling
        if a == 1.0:
            tot = sum(r.n_tok for r in grp)
            for r in grp:
                assert abs(r.weight - r.n_tok / tot) < 1e-4
    # smaller alpha flattens the distribution
    assert spreads[0.3] <= spreads[0.5] <= spreads[0.7] <= spreads[1.0] + 1e-9


def test_packing_sweep_waste_shrinks_with_fit(spark, sf_dir):
    rows = {r.seq_len: r for r in QUERIES["packing_length_sweep"](spark, sf_dir).collect()}
    assert set(rows) == {512, 1024, 2048, 4096}
    for r in rows.values():
        assert r.padding_tokens >= 0
        assert 0.0 <= r.waste_share < 1.0
        assert r.n_sequences >= r.n_docs  # every doc needs >= 1 chunk
        assert r.n_sequences * r.seq_len >= r.total_tokens
    # all docs fit in one 4096 chunk here, so n_sequences == n_docs
    assert rows[4096].n_sequences == rows[4096].n_docs


def test_retrieval_map_consistent_with_ndcg_run(spark, sf_dir):
    row = QUERIES["retrieval_map"](spark, sf_dir).collect()[0]
    assert 0.0 <= row.avg_precision <= 1.0
    assert 0.0 <= row.recall_at_k <= 1.0
    assert row.n_rel_run <= min(row.k, row.n_rel_corpus)
    # BM25 ranks by query-term match, so the run's relevant share must
    # be at least the corpus base rate (a random ranking's expectation)
    n_corpus = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    assert row.n_rel_run / row.k >= row.n_rel_corpus / n_corpus - 1e-9


def test_srm_check_matches_manual_chi2(spark, sf_dir):
    row = QUERIES["srm_check"](spark, sf_dir).collect()[0]
    n0, n1 = row.n_control, row.n_treat
    want = (n0 - n1) ** 2 / (n0 + n1)
    assert abs(row.srm_chi2 - want) < 1e-6
    assert row.srm_detected == (want > 10.83)
    assert abs(row.control_share - n0 / (n0 + n1)) < 1e-6


def test_hour_of_week_shares_sum_to_one(spark, sf_dir):
    rows = QUERIES["hour_of_week_profile"](spark, sf_dir).collect()
    by_type: dict[str, float] = {}
    n_by_type: dict[str, int] = {}
    for r in rows:
        assert 0 <= r.weekday <= 6 and 0 <= r.hour <= 23
        by_type[r.event_type] = by_type.get(r.event_type, 0.0) + r.share
        n_by_type[r.event_type] = n_by_type.get(r.event_type, 0) + r.n
    for t, s in by_type.items():
        assert abs(s - 1.0) < 1e-3
    total = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    assert sum(n_by_type.values()) == total


def test_logistic_matches_sklearn_style_newton(spark, sf_dir):
    row = QUERIES["logistic_price_model"](spark, sf_dir).collect()[0]
    # independent unregularized Newton in numpy over the same design
    vals = duckdb.sql(
        f"""SELECT CAST(ln(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                       AS DOUBLE) / 100.0) AS DOUBLE),
                   CAST(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1.0 ELSE 0.0 END AS DOUBLE)
            FROM '{sf_dir}/orders.parquet'"""
    ).fetchall()
    X = np.column_stack(
        [np.ones(len(vals)), np.array([v[0] for v in vals])]
    )
    y = np.array([v[1] for v in vals])
    b = np.zeros(2)
    for _ in range(25):
        p = 1.0 / (1.0 + np.exp(-X @ b))
        g = X.T @ (y - p)
        H = X.T @ (X * (p * (1 - p))[:, None])
        b = b + np.linalg.solve(H, g)
    assert abs(row.beta0 - b[0]) < 1e-2
    assert abs(row.beta1 - b[1]) < 1e-2
    p = 1.0 / (1.0 + np.exp(-X @ b))
    dev = -2.0 * np.sum(y * np.log(p) + (1 - y) * np.log(1 - p))
    assert abs(row.deviance - dev) / dev < 1e-3
    assert row.n == len(vals)


def test_gini_split_matches_exhaustive_search(spark, sf_dir):
    row = QUERIES["best_gini_split"](spark, sf_dir).collect()[0]
    assert 0.0 <= row.gini_weighted <= row.gini_parent <= 0.5
    assert row.gini_gain >= -1e-9
    # recompute weighted impurity at the chosen threshold exactly
    thr_cents = round(row.threshold_price * 100)
    n_l, x_l, n, x = duckdb.sql(
        f"""SELECT sum(CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT)
                        <= {thr_cents} THEN 1 ELSE 0 END),
                   sum(CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT)
                        <= {thr_cents} AND o_orderpriority IN
                        ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END),
                   count(*),
                   sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END)
            FROM '{sf_dir}/orders.parquet'"""
    ).fetchone()

    def gini(xx, nn):
        p = xx / nn
        return 1 - p * p - (1 - p) * (1 - p)

    want = (n_l * gini(x_l, n_l) + (n - n_l) * gini(x - x_l, n - n_l)) / n
    # the boundary is an interpolated quantile; allow the count at the
    # rounded threshold to differ by the boundary rows only
    assert abs(row.gini_weighted - want) < 5e-3


def test_silhouette_bounded_and_majority_positive(spark, sf_dir):
    rows = QUERIES["simplified_silhouette"](spark, sf_dir).collect()
    assert rows
    total = 0
    for r in rows:
        assert -1.0 <= r.mean_silhouette <= 1.0
        total += r.n_members
    n_vecs = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/embeddings.parquet'"
    ).fetchone()[0]
    assert total == n_vecs
    # after Lloyd iterations most clusters should score positive
    pos = sum(1 for r in rows if r.mean_silhouette > 0)
    assert pos >= len(rows) // 2


def test_perm_test_pvalue_bounds_and_significance(spark, sf_dir):
    row = QUERIES["perm_test_values"](spark, sf_dir).collect()[0]
    assert row.n_replicates == 64
    assert 1 / 65 <= row.p_value <= 1.0
    assert row.n_extreme <= row.n_replicates
    # purchase and click values come from different distributions in the
    # synthetic data, so the observed gap should be non-trivial
    assert abs(row.d_obs) > 0.0


def test_huber_location_between_median_and_mean(spark, sf_dir):
    row = QUERIES["huber_location"](spark, sf_dir).collect()[0]
    vals = duckdb.sql(
        f"""SELECT floor(value * 100) / 100.0
            FROM '{sf_dir}/events.parquet'
            WHERE event_type = 'purchase'"""
    ).fetchall()
    xs = np.array([v[0] for v in vals])
    lo, hi = sorted((np.median(xs), xs.mean()))
    # Huber interpolates between median (c->0) and mean (c->inf)
    assert lo - 0.5 <= row.huber_location <= hi + 0.5
    assert row.n == len(xs)
    assert row.mad_scale > 0
    # independent IRLS recompute
    mu = np.median(xs)
    c = 1.345 * 1.4826 * np.median(np.abs(xs - mu))
    for _ in range(30):
        w = np.minimum(1.0, c / np.maximum(np.abs(xs - mu), 1e-12))
        mu = (w * xs).sum() / w.sum()
    assert abs(row.huber_location - mu) < 0.05


def test_cowitness_lift_consistency(spark, sf_oracle_dir):
    rows = QUERIES["cowitness_lift"](spark, sf_oracle_dir).collect()
    assert rows
    for r in rows:
        assert r.lift > 0
        assert r.shared_witnesses <= min(r.deg_a, r.deg_b)
        assert max(r.deg_a, r.deg_b) <= r.n_witnesses


def test_ols_diagnostics_match_numpy(spark, sf_dir):
    row = QUERIES["ols_residual_diagnostics"](spark, sf_dir).collect()[0]
    pts = duckdb.sql(
        f"""SELECT datediff('day', DATE '1970-01-01', o_orderdate) AS d,
                   count(*) AS c
            FROM '{sf_dir}/orders.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    d = np.array([p[0] for p in pts], dtype=float)
    c = np.array([p[1] for p in pts], dtype=float)
    b, a = np.polyfit(d, c, 1)
    e = c - (a + b * d)
    dw = np.sum(np.diff(e) ** 2) / np.sum(e**2)
    r2 = np.corrcoef(d, c)[0, 1] ** 2
    u = e**2
    bp = len(d) * np.corrcoef(d, u)[0, 1] ** 2
    assert 0.0 <= row.dw_stat <= 4.0
    assert abs(row.dw_stat - dw) < 1e-3
    assert abs(row.r2 - r2) < 1e-4
    assert abs(row.bp_stat - bp) < 1e-2
    assert row.n_days == len(pts)


def test_gumbel_fit_matches_moments(spark, sf_dir):
    row = QUERIES["gumbel_daily_max"](spark, sf_dir).collect()[0]
    maxima = duckdb.sql(
        f"""SELECT max(round(o_totalprice * 100)) / 100.0
            FROM '{sf_dir}/orders.parquet'
            GROUP BY CAST(o_orderdate AS DATE)"""
    ).fetchall()
    xs = np.array([m[0] for m in maxima])
    beta = xs.std(ddof=1) * math.sqrt(6) / math.pi
    mu = xs.mean() - 0.5772156649015329 * beta
    assert abs(row.gumbel_beta - beta) < 0.02
    assert abs(row.gumbel_mu - mu) < 0.02
    assert 0.0 <= row.p_exceed_record <= 1.0
    assert abs(row.record_max - xs.max()) < 1e-6


def test_cvar_es_dominates_var(spark, sf_dir):
    row = QUERIES["cvar_value_tail"](spark, sf_dir).collect()[0]
    assert row.es95 >= row.var95 - 1e-6  # ES is the tail mean beyond VaR
    assert row.tail_k == row.n // 20
    vals = duckdb.sql(
        f"""SELECT round(o_totalprice * 100) / 100.0
            FROM '{sf_dir}/orders.parquet' ORDER BY 1 DESC"""
    ).fetchall()
    top = [v[0] for v in vals[: row.n // 20]]
    assert abs(row.es95 - sum(top) / len(top)) < 1e-2


def test_effective_corpus_size_bounds(spark, sf_dir):
    rows = QUERIES["effective_corpus_size"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.effective_docs <= r.n_docs + 1e-6
        assert r.effective_tokens <= r.raw_tokens + 1e-6
        assert 0.0 < r.unique_share <= 1.0 + 1e-9
    # corpus-wide effective docs equals the number of DISTINCT texts
    n_distinct = duckdb.sql(
        f"SELECT count(DISTINCT text) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    # Σ over all docs of 1/cluster_size = number of clusters, but only
    # when clusters never span sources; allow quantization slack
    total_eff = sum(r.effective_docs for r in rows)
    assert abs(total_eff - n_distinct) < 0.01 * n_distinct + 1.0


def test_last_digit_audit_partition(spark, sf_dir):
    rows = QUERIES["last_digit_audit"](spark, sf_dir).collect()
    assert {r.digit for r in rows} <= set(range(10))
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert r.chi2_term >= 0.0
    n = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/orders.parquet'"
    ).fetchone()[0]
    assert sum(r.n for r in rows) == n


def test_twap_differs_from_plain_mean_but_in_range(spark, sf_dir):
    rows = QUERIES["twap_by_type"](spark, sf_dir).collect()
    assert rows
    bounds = duckdb.sql(
        f"""SELECT event_type, min(floor(value * 100) / 100.0),
                   max(floor(value * 100) / 100.0)
            FROM '{sf_dir}/events.parquet' GROUP BY 1"""
    ).fetchall()
    lims = {t: (lo, hi) for t, lo, hi in bounds}
    for r in rows:
        lo, hi = lims[r.event_type]
        assert lo - 1e-6 <= r.twap_value <= hi + 1e-6
        assert r.total_us > 0 and r.n_intervals > 0


def test_scalable_median_equals_direct_order_statistic(spark, sf_dir):
    row = QUERIES["scalable_median"](spark, sf_dir).collect()[0]
    want = duckdb.sql(
        f"""WITH li AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
                        AS v FROM '{sf_dir}/lineitem.parquet')
            SELECT v / 100.0 FROM li ORDER BY v
            LIMIT 1 OFFSET (SELECT (count(*) + 1) // 2 - 1 FROM li)"""
    ).fetchone()[0]
    assert abs(row.median_price - float(want)) < 1e-6
    assert row.rank == (row.n + 1) // 2


def test_value_mode_is_argmax_frequency(spark, sf_dir):
    rows = QUERIES["value_mode_by_type"](spark, sf_dir).collect()
    for r in rows:
        best = duckdb.sql(
            f"""SELECT floor(value * 100) AS v, count(*) AS c
                FROM '{sf_dir}/events.parquet'
                WHERE event_type = '{r.event_type}'
                GROUP BY 1 ORDER BY c DESC, v ASC LIMIT 1"""
        ).fetchone()
        assert r.n_occurrences == best[1]
        assert abs(r.mode_value - best[0] / 100.0) < 1e-9


def test_keyness_top_words_are_actually_overrepresented(spark, sf_dir):
    rows = QUERIES["monroe_keyness"](spark, sf_dir).collect()
    assert rows
    n_tok = duckdb.sql(
        f"""SELECT source, count(*) FROM (
              SELECT source, unnest(string_split(text, ' ')) AS w
              FROM '{sf_dir}/documents.parquet') WHERE w <> ''
            GROUP BY 1"""
    ).fetchall()
    tot = {s: n for s, n in n_tok}
    grand = sum(tot.values())
    for r in rows:
        assert 1 <= r.rank <= 10
        # a top-keyness word's in-source rate exceeds its rest rate
        rate_in = r.n_in_source / tot[r.source]
        rate_rest = r.n_in_rest / (grand - tot[r.source])
        assert rate_in > rate_rest


def test_conversion_lag_percentiles_ordered(spark, sf_dir):
    row = QUERIES["conversion_lag_percentiles"](spark, sf_dir).collect()[0]
    ps = [row.p10_hours, row.p25_hours, row.p50_hours, row.p75_hours,
          row.p90_hours]
    assert all(a <= b + 1e-9 for a, b in zip(ps, ps[1:]))
    assert all(p >= 0 for p in ps)
    assert row.n_converters > 0


def test_pvm_effects_sum_to_delta(spark, sf_dir):
    rows = QUERIES["price_volume_mix"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.volume_effect is not None:
            # decomposition identity (2dp rounding slack on each term)
            assert abs(
                (r.volume_effect + r.price_effect) - r.delta_rev
            ) < 0.05
        assert abs((r.rev_b - r.rev_a) - r.delta_rev) < 0.05


def test_set_ops_battery_identities(spark, sf_dir):
    row = QUERIES["set_ops_battery"](spark, sf_dir).collect()[0]
    # inclusion-exclusion identities must hold exactly
    assert row.n_union == row.n_a + row.n_b - row.n_intersect
    assert row.n_only_a == row.n_a - row.n_intersect
    assert row.n_only_b == row.n_b - row.n_intersect
    assert 0.0 <= row.cohort_jaccard <= 1.0


def test_interval_overlap_bounded_by_window(spark, sf_dir):
    rows = QUERIES["interval_overlap_hours"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # overlap can never exceed the 3-day promo window
        assert 0 <= r.overlap_hours_bucket <= 72
        assert r.n_users > 0
    # total bucketed users == users with a signup
    n_signup = duckdb.sql(
        f"""SELECT count(DISTINCT user_id)
            FROM '{sf_dir}/events.parquet'
            WHERE event_type = 'signup'"""
    ).fetchone()[0]
    assert sum(r.n_users for r in rows) == n_signup
