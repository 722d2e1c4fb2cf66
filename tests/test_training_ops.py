"""Behavioral tests for the training-data operators beyond oracle parity:
do the detectors actually *detect* (constructed positives), and do the
approximate paths agree with exact baselines where they should."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

from helium_arango_etl_spark.operators.dedup import lsh_candidate_pairs, ngram_jaccard_pairs
from helium_arango_etl_spark.operators.similarity import near_dup_pairs_for


def test_cosine_near_dup_detects_constructed_pairs(spark):
    schema = StructType(
        [StructField("vec_id", LongType()), StructField("embedding", ArrayType(FloatType()))]
    )
    base = [float((i * 7) % 13 - 6) for i in range(64)]
    near = list(base)
    near[0] += 0.01  # tiny perturbation -> cosine ~ 1
    far = [float((i * 11) % 17 - 8) for i in range(64)]
    df = spark.createDataFrame([(1, base), (2, near), (3, far)], schema)
    pairs = near_dup_pairs_for(df).collect()
    assert [(r["vec_a"], r["vec_b"]) for r in pairs] == [(1, 2)]
    assert pairs[0]["cosine_sim"] >= 0.999


def test_lsh_finds_true_near_dups(spark, sf_oracle_dir):
    """At sf0.01 the corpus contains real near-duplicate documents; LSH must
    surface them and the exact verifier must score them high."""
    verified = ngram_jaccard_pairs(spark, sf_oracle_dir)
    hits = verified.filter(F.col("jaccard") >= 0.9).collect()
    assert len(hits) > 0
    # estimator and exact value should agree loosely on strong pairs
    for r in hits:
        assert r["est_jaccard"] >= 0.5, r


def test_lsh_pairs_are_symmetric_free(spark, sf_oracle_dir):
    pairs = lsh_candidate_pairs(spark, sf_oracle_dir).collect()
    seen = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert all(a < b for a, b in seen)
    assert len(seen) == len(pairs)  # distinct


def test_ann_bucket_subset_of_bruteforce_universe(spark, sf_oracle_dir):
    """The bucketed ANN result must be a subset of the corpus scored by the
    brute-force baseline, with identical cosine values for shared ids."""
    from helium_arango_etl_spark.operators.similarity import ann_cosine_topk, lsh_bucket_topk

    brute = {r["vec_id"]: r["cosine_sim"] for r in ann_cosine_topk(spark, sf_oracle_dir).collect()}
    bucket = lsh_bucket_topk(spark, sf_oracle_dir).collect()
    assert len(bucket) > 0
    assert bucket[0]["vec_id"] == 0  # query vector matches itself at sim 1.0
    for r in bucket:
        if r["vec_id"] in brute:
            assert r["cosine_sim"] == pytest.approx(brute[r["vec_id"]], abs=1e-6)


def test_ivf_topk_agrees_with_bruteforce(spark, sf_oracle_dir):
    """IVF probes a coarse-quantizer list: scores for returned ids must be
    identical to the brute-force values and the query must match itself."""
    from helium_arango_etl_spark.operators.similarity import ann_cosine_topk, ivf_topk

    brute = {r["vec_id"]: r["cosine_sim"] for r in ann_cosine_topk(spark, sf_oracle_dir).collect()}
    ivf = ivf_topk(spark, sf_oracle_dir).collect()
    assert len(ivf) > 0
    assert ivf[0]["vec_id"] == 0 and ivf[0]["cosine_sim"] == pytest.approx(1.0, abs=1e-6)
    for r in ivf:
        if r["vec_id"] in brute:
            assert r["cosine_sim"] == pytest.approx(brute[r["vec_id"]], abs=1e-6)
