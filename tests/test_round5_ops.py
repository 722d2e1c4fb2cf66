"""Round-5 operator invariants + plan-quality pins."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from helium_arango_etl_spark.registry import QUERIES


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ---------- invariants ----------


def test_auc_in_unit_interval_and_counts(spark, sf_dir):
    row = QUERIES["auc_roc"](spark, sf_dir).collect()[0]
    assert 0.0 <= row.auc <= 1.0
    assert row.n_pos > 0 and row.n_neg > 0


def test_calibration_bins_partition_population(spark, sf_dir):
    rows = QUERIES["calibration_bins"](spark, sf_dir).collect()
    assert sorted(r.bin for r in rows) == list(range(len(rows)))
    for r in rows:
        assert 0.0 <= r.confidence <= 1.0 and 0.0 <= r.accuracy <= 1.0
        assert abs(r.abs_gap - abs(r.accuracy - r.confidence)) < 2e-6


def test_mutual_information_bounds(spark, sf_dir):
    row = QUERIES["mutual_information"](spark, sf_dir).collect()[0]
    # MI >= 0 (up to quantization) and MI <= min(H_x, H_y)
    assert row.mi_nats >= -1e-6
    assert row.mi_nats <= min(row.h_nation, row.h_segment) + 1e-6
    assert 0.0 <= row.nmi <= 1.0 + 1e-6


def test_incremental_agg_merge_all_match(spark, sf_dir):
    rows = QUERIES["incremental_agg_merge"](spark, sf_dir).collect()
    assert rows and all(r.merge_matches_direct for r in rows)


def test_cdc_apply_excludes_tombstones(spark, sf_dir):
    df = QUERIES["cdc_apply"](spark, sf_dir)
    assert df.filter(F.col("final_op") == "D").count() == 0


def test_kmv_estimate_reasonable(spark, sf_dir):
    for r in QUERIES["kmv_distinct"](spark, sf_dir).collect():
        # KMV with K=64 has ~1/sqrt(62) ~ 13% relative error; allow 3x
        assert r.rel_err < 0.4, r


def test_mutual_knn_edges_canonical_and_bounded(spark, sf_dir):
    from helium_arango_etl_spark.operators.similarity import KNN_K

    df = QUERIES["mutual_knn_graph"](spark, sf_dir)
    assert df.filter(F.col("vec_a") >= F.col("vec_b")).count() == 0
    # each node appears at most KNN_K times per side (mutual ⊆ kNN)
    per = (
        df.select(F.col("vec_a").alias("v"))
        .unionByName(df.select(F.col("vec_b").alias("v")))
        .groupBy("v")
        .count()
    )
    assert per.agg(F.max("count")).collect()[0][0] <= 2 * KNN_K


def test_tip_decomposition_supports_above_threshold(spark, sf_dir):
    from helium_arango_etl_spark.operators.graph import TIP_K

    rows = QUERIES["tip_decomposition"](spark, sf_dir).collect()
    assert all(r.support >= TIP_K for r in rows)


def test_langid_confusion_counts_consistent(spark, sf_dir):
    rows = QUERIES["langid_confusion"](spark, sf_dir).collect()
    n_docs = QUERIES["text_stats"](spark, sf_dir).count()
    assert sum(r.n_actual for r in rows) == n_docs
    assert sum(r.n_pred for r in rows) == n_docs
    assert all(r.tp <= min(r.n_pred, r.n_actual) for r in rows)


def test_ndcg_bounds(spark, sf_dir):
    row = QUERIES["ndcg_at_k"](spark, sf_dir).collect()[0]
    assert 0.0 <= row.ndcg_at_10 <= 1.0 + 1e-9
    assert 0.0 <= row.mrr <= 1.0
    assert 0.0 <= row.p_at_10 <= 1.0


def test_neyman_allocation_sums_to_budget(spark, sf_dir):
    from helium_arango_etl_spark.operators.pipeline import NEYMAN_BUDGET

    rows = QUERIES["neyman_allocation"](spark, sf_dir).collect()
    assert sum(r.n_allocated for r in rows) == NEYMAN_BUDGET


def test_markov_stationary_is_distribution(spark, sf_dir):
    rows = QUERIES["markov_stationary"](spark, sf_dir).collect()
    total = sum(r.stationary_prob for r in rows)
    # truncating div loses < k micro per iteration; allow small slack
    assert 0.99 <= total <= 1.0 + 1e-9
    assert all(r.stationary_prob >= 0 for r in rows)


def test_gap_islands_bounds(spark, sf_dir):
    df = QUERIES["gap_islands"](spark, sf_dir)
    bad = df.filter(
        (F.col("longest_streak") > F.col("n_active_days"))
        | (F.col("n_islands") > F.col("n_active_days"))
    )
    assert bad.count() == 0


def test_sprt_decisions_monotone_until_first_cross(spark, sf_dir):
    rows = QUERIES["sprt_monitor"](spark, sf_dir).collect()
    byv = {}
    for r in sorted(rows, key=lambda r: (r.variant, r.day_idx)):
        byv.setdefault(r.variant, []).append(r.decision)
    for decs in byv.values():
        assert set(decs) <= {"accept_h1", "accept_h0", "continue"}


def test_user_saturation_cumulative_monotone(spark, sf_dir):
    rows = QUERIES["user_saturation_curve"](spark, sf_dir).collect()
    byt = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.day_idx)):
        prev = byt.get(r.event_type, 0)
        assert r.cum_users >= prev
        assert r.n_active >= r.n_new
        byt[r.event_type] = r.cum_users


# ---------- plan pins ----------


def test_price_elasticity_broadcasts_dim(spark, sf_dir):
    plan = plan_of(QUERIES["price_elasticity"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_auc_scan_prunes_columns(spark, sf_dir):
    plan = plan_of(QUERIES["auc_roc"](spark, sf_dir))
    widths = [
        len(s.split(","))
        for s in re.findall(r"ReadSchema: struct<([^>]*)", plan)
    ]
    assert widths and max(widths) <= 2, (widths, plan)


def test_cdc_apply_single_shuffle(spark, sf_dir):
    plan = plan_of(QUERIES["cdc_apply"](spark, sf_dir))
    assert plan.count("Exchange") <= 2, plan  # keyed agg (+AQE read)


def test_attribution_no_nested_loop_join(spark, sf_dir):
    plan = plan_of(QUERIES["attribution_models"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# ---------- batch 9-15 invariants ----------


def test_ktruss_supports_above_threshold_and_subset(spark, sf_dir):
    from helium_arango_etl_spark.operators.graph import TRUSS_SUPPORT

    truss = QUERIES["ktruss_edges"](spark, sf_dir)
    rows = truss.collect()
    assert all(r.support >= TRUSS_SUPPORT for r in rows)
    proj = QUERIES["co_witness_pairs"](spark, sf_dir).select(
        "city_key", "src_a", "src_b"
    )
    extra = truss.select("city_key", "src_a", "src_b").exceptAll(proj)
    assert extra.count() == 0  # truss edges ⊆ projection edges


def test_stickiness_bounded(spark, sf_dir):
    for r in QUERIES["stickiness_dau_mau"](spark, sf_dir).collect():
        assert 0.0 < r.stickiness <= 1.0 + 1e-9
        assert r.dau <= r.mau


def test_hll_mau_error_bounded(spark, sf_dir):
    # HLL with m=64 has ~13% typical error; allow 3 sigma
    for r in QUERIES["hll_mau_window"](spark, sf_dir).collect():
        assert abs(r.rel_error) < 0.4, r


def test_symspell_pairs_are_distance_one(spark, sf_dir):
    for r in QUERIES["symspell_typo_pairs"](spark, sf_dir).collect():
        assert r.edit_distance == 1
        assert (r.typo_freq, r.typo) < (r.correction_freq, r.correction) or (
            r.typo_freq < r.correction_freq
        )


def test_geo_join_within_radius(spark, sf_dir):
    from helium_arango_etl_spark.operators.relational import GEO_RADIUS_M

    df = QUERIES["geo_grid_join"](spark, sf_dir)
    assert df.filter(F.col("distance_m") > GEO_RADIUS_M).count() == 0


def test_spearman_in_unit_interval(spark, sf_dir):
    for r in QUERIES["spearman_price_qty"](spark, sf_dir).collect():
        if r.spearman_rho is not None:
            assert -1.0 - 1e-9 <= r.spearman_rho <= 1.0 + 1e-9


def test_perplexity_prune_retention_band(spark, sf_dir):
    for r in QUERIES["perplexity_prune"](spark, sf_dir).collect():
        assert 0 < r.n_kept <= r.n_docs
        assert r.band_lo_bits <= r.band_hi_bits


def test_length_buckets_reduce_padding(spark, sf_dir):
    rows = QUERIES["length_bucket_batches"](spark, sf_dir).collect()
    bucketed_pad = sum(r.pad_tokens for r in rows)
    assert bucketed_pad <= rows[0].naive_pad  # bucketing never hurts


def test_weighted_median_within_range(spark, sf_dir):
    for r in QUERIES["weighted_median_udaf"](spark, sf_dir).collect():
        assert r.wmedian_cents > 0 and r.w_total > 0


def test_phash_clusters_consistent(spark, sf_dir):
    rows = QUERIES["phash_dup_clusters"](spark, sf_dir).collect()
    for r in rows:
        assert r.cluster_id <= r.doc_id
        assert r.cluster_size >= 2  # only docs with >= 1 near pair appear
