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


def test_hot_bucket_cap_bounds_pair_generation(spark):
    """ADVICE r1: a 10k-member near-identical bucket must not O(k^2)-explode
    one task.  With max_bucket=64, pair gen stays within doc_id-contiguous
    chunks: O(k * cap) pairs total, and every pair is intra-chunk."""
    from pyspark.sql import functions as F

    from helium_arango_etl_spark.operators.dedup import _bucket_pairs

    n, cap = 10_000, 64
    sig = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.col("id").cast("string").alias("sig"),
        F.lit("HOT").alias("band0"),
        *[F.concat(F.lit(f"u{b}_"), F.col("id")).alias(f"band{b}") for b in range(1, 8)],
    )
    pairs = _bucket_pairs(sig, max_bucket=cap)
    got = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.expr(f"doc_a div {cap} != doc_b div {cap}"), 1).otherwise(0)).alias(
            "cross_chunk"
        ),
    ).first()
    full, rem = n // cap, n % cap
    expected = full * (cap * (cap - 1) // 2) + rem * (rem - 1) // 2
    assert got["n"] == expected
    assert got["cross_chunk"] == 0


def test_bucket_stats_accounting_matches_cap(spark):
    """lsh_bucket_stats' capped/dropped arithmetic equals what _bucket_pairs
    actually generates for the same signature table (no silent caps)."""
    from pyspark.sql import functions as F

    from helium_arango_etl_spark.operators.dedup import LSH_MAX_BUCKET, _bucket_pairs

    n = 1000  # > LSH_MAX_BUCKET so the cap engages
    sig = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.col("id").cast("string").alias("sig"),
        F.lit("HOT").alias("band0"),
        *[F.concat(F.lit(f"u{b}_"), F.col("id")).alias(f"band{b}") for b in range(1, 8)],
    )
    capped_n = _bucket_pairs(sig, max_bucket=LSH_MAX_BUCKET).count()
    m = LSH_MAX_BUCKET
    expected_capped = (n // m) * (m * (m - 1) // 2) + (n % m) * ((n % m) - 1) // 2
    assert capped_n == expected_capped


def test_decontaminate_flags_shingle_overlap(spark, sf_dir):
    """A training doc that shares a shingle with the eval slice must be
    flagged; eval docs themselves never appear in the output."""
    from pyspark.sql import functions as F

    from helium_arango_etl_spark.io import read_table
    from helium_arango_etl_spark.operators.dedup import EVAL_MAX_ID, decontaminate

    out = decontaminate(spark, sf_dir)
    assert out.filter(F.col("doc_id") < EVAL_MAX_ID).count() == 0
    n_train = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") >= EVAL_MAX_ID)
        .count()
    )
    assert out.count() == n_train
    # an exact copy of an eval doc (byte-identical text) must be flagged
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    ev_texts = {r.text for r in docs.filter(F.col("doc_id") < EVAL_MAX_ID).collect()}
    copies = [
        r.doc_id
        for r in docs.filter(F.col("doc_id") >= EVAL_MAX_ID).collect()
        if r.text in ev_texts
    ]
    if copies:
        flagged = {
            r.doc_id: r.contaminated
            for r in out.filter(F.col("doc_id").isin(copies)).collect()
        }
        assert all(flagged.values()), flagged


def test_mixture_sample_hits_target_rates(spark, sf_dir):
    """Realized per-language acceptance must track the recipe weights
    (hash uniformity gives a few-percent band at 500 docs)."""
    from pyspark.sql import functions as F

    from helium_arango_etl_spark.operators.pipeline import (
        MIX_DEFAULT,
        MIX_RATES,
        mixture_sample,
    )

    rows = (
        mixture_sample(spark, sf_dir)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("accepted").cast("int")).alias("acc"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        target = MIX_RATES.get(r.lang, MIX_DEFAULT) / 100.0
        realized = r.acc / r.n
        assert abs(realized - target) < 0.25, (r.lang, realized, target)


def test_dedup_clusters_transitive_chain(spark, tmp_path):
    """A ~ B and B ~ C (but A !~ C directly) must land in ONE cluster with
    cluster_id = min doc_id — the transitivity that greedy pairwise
    keep-smallest (near_dup_keep) cannot express."""
    from helium_arango_etl_spark.operators.dedup import clear_sig_cache, dedup_clusters

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    drift = base.split()
    mid = " ".join(drift[2:] + ["lambda", "mu"])       # overlaps both ends
    far = " ".join(drift[4:] + ["lambda", "mu", "nu", "xi"])
    rows = [
        (0, base, "en", "web", len(base)),
        (1, mid, "en", "web", len(mid)),
        (2, far, "en", "web", len(far)),
        (3, "totally different content about completely other things entirely", "en", "web", 60),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    clear_sig_cache(spark)
    try:
        out = {r["doc_id"]: r for r in dedup_clusters(spark, str(tmp_path)).collect()}
        # the chain 0-1-2 collapses to cluster 0 whether or not 0~2 verifies
        # directly; 3 stays alone
        assert out[0]["cluster_id"] == 0 and out[0]["is_canonical"]
        assert out[1]["cluster_id"] == 0 and not out[1]["is_canonical"]
        assert out[2]["cluster_id"] == 0
        assert out[0]["cluster_size"] == 3
        assert out[3]["cluster_id"] == 3 and out[3]["cluster_size"] == 1
    finally:
        clear_sig_cache(spark)


def test_segment_dedup_strips_shared_boilerplate(spark, tmp_path):
    """A segment (8-token chunk) shared by two docs is boilerplate and is
    removed from both; unique segments survive in order."""
    from helium_arango_etl_spark.operators.dedup import clear_sig_cache, segment_dedup

    boiler = "one two three four five six seven eight"
    u1 = "u1a u1b u1c u1d u1e u1f u1g u1h"
    u2 = "u2a u2b u2c u2d u2e u2f u2g u2h"
    rows = [
        (0, boiler + " " + u1, "en", "web", 0),
        (1, boiler + " " + u2, "en", "web", 0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    clear_sig_cache(spark)
    try:
        out = {r["doc_id"]: r for r in segment_dedup(spark, str(tmp_path)).collect()}
        assert out[0]["n_segments"] == 2 and out[0]["n_boiler_segments"] == 1
        assert out[0]["clean_text"] == u1
        assert out[1]["clean_text"] == u2
    finally:
        clear_sig_cache(spark)


def test_pii_scrub_masks_constructed_pii(spark, tmp_path):
    """The synthetic corpus has no PII, so the masking path is pinned on
    constructed documents: emails and long digit runs are replaced with
    typed placeholders and counted; short digit runs survive."""
    from helium_arango_etl_spark.operators.textops import pii_scrub

    rows = [
        (0, "contact me at alice.w@example.com or call 5551234567 now", "en", "web", 0),
        (1, "pin 123 is short but 98765 is long", "en", "web", 0),
        (2, "nothing sensitive here", "en", "web", 0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in pii_scrub(spark, str(tmp_path)).collect()}
    assert out[0]["scrubbed_text"] == "contact me at <EMAIL> or call <NUM> now"
    assert out[0]["n_masked"] == 2
    assert out[1]["scrubbed_text"] == "pin 123 is short but <NUM> is long"
    assert out[1]["n_masked"] == 1
    assert out[2]["n_masked"] == 0


def test_split_leakage_detects_cross_split_copies(spark, tmp_path):
    """Byte-identical copies whose doc_ids hash into different splits must
    be flagged (the contamination the id-keyed split cannot see).  Doc ids
    are chosen so the copies provably land in distinct splits."""
    import duckdb

    from helium_arango_etl_spark.operators.pipeline import SPLIT_TRAIN, split_leakage

    # find two ids on opposite sides of the train boundary via the same
    # bucket function both engines use
    con = duckdb.connect()
    buckets = {
        i: con.execute(
            f"SELECT ('0x' || substr(md5('{i}'), 1, 7))::BIGINT % 100"
        ).fetchone()[0]
        for i in range(60)
    }
    train_id = next(i for i, b in buckets.items() if b < SPLIT_TRAIN)
    test_id = next(i for i, b in buckets.items() if b >= SPLIT_TRAIN)
    dup_text = "identical text that was crawled twice from two mirrors"
    rows = [
        (train_id, dup_text, "en", "web", 0),
        (test_id, dup_text, "en", "web", 0),
        (55, "unrelated singleton document", "en", "web", 0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = split_leakage(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0]["canonical_doc_id"] == min(train_id, test_id)
    assert out[0]["n_copies"] == 2
    assert "," in out[0]["splits"]


def test_chunk_documents_invariants(spark, sf_dir):
    """Chunk geometry: chunks tile every token with exactly CHUNK_TOKS-
    CHUNK_STRIDE overlap; stitching stride-aligned prefixes reconstructs
    the document's token stream."""
    from helium_arango_etl_spark.operators.pipeline import (
        CHUNK_STRIDE,
        CHUNK_TOKS,
        chunk_documents,
    )
    from helium_arango_etl_spark.io import read_table
    from helium_arango_etl_spark.operators.textops import TOKS

    chunks = chunk_documents(spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["t"]
        for r in read_table(spark, sf_dir, "documents")
        .select("doc_id", F.expr(TOKS).alias("t"))
        .collect()
    }
    by_doc: dict = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {d for d, t in docs.items() if t}
    for doc_id, rows in by_doc.items():
        toks = docs[doc_id]
        rows.sort(key=lambda r: r["chunk_idx"])
        for i, r in enumerate(rows):
            assert r["chunk_idx"] == i
            assert r["tok_start"] == i * CHUNK_STRIDE
            assert r["tok_end"] == min(i * CHUNK_STRIDE + CHUNK_TOKS, len(toks))
            assert r["chunk_text"] == " ".join(toks[r["tok_start"] : r["tok_end"]])
        # every token is covered: last chunk reaches the end, and starts
        # advance by the stride (gap-free because stride < window)
        assert rows[-1]["tok_end"] == len(toks)
        # stitching the stride-aligned prefix of each chunk reconstructs
        # the token stream exactly once
        stitched = []
        for r in rows:
            stitched.extend(r["chunk_text"].split(" ")[:CHUNK_STRIDE])
        assert stitched[: len(toks)] == toks


def test_city_communities_partition_sanity(spark, sf_dir):
    """Communities partition each city's node set: every node appears
    once, community_id is one of the city's own nodes, and sizes sum to
    the node count per city."""
    from helium_arango_etl_spark.operators.graph import (
        city_communities,
        witness_subgraph,
    )

    out = city_communities(spark, sf_dir).collect()
    edges = witness_subgraph(spark, sf_dir).select("city_key", "src", "dst").collect()
    nodes_by_city: dict = {}
    for e in edges:
        nodes_by_city.setdefault(e["city_key"], set()).update((e["src"], e["dst"]))
    seen: dict = {}
    sizes: dict = {}
    for r in out:
        seen.setdefault(r["city_key"], set()).add(r["node"])
        assert r["community_id"] in nodes_by_city[r["city_key"]]
        sizes.setdefault((r["city_key"], r["community_id"]), 0)
        sizes[(r["city_key"], r["community_id"])] += 1
    assert seen == nodes_by_city
    for r in out:
        assert r["community_size"] == sizes[(r["city_key"], r["community_id"])]


def test_stratified_split_exact_quotas(spark, sf_dir):
    """The whole point vs hash_split: every (source, lang) stratum lands
    EXACTLY floor(80%·n) train and floor(90%·n)−floor(80%·n) val docs."""
    from helium_arango_etl_spark.operators.pipeline import stratified_split

    rows = (
        stratified_split(spark, sf_dir)
        .groupBy("source", "lang", "n_stratum")
        .pivot("split", ["train", "val", "test"])
        .count()
        .fillna(0)
        .collect()
    )
    assert rows
    for r in rows:
        n = r["n_stratum"]
        assert r["train"] == n * 80 // 100, r
        assert r["val"] == n * 90 // 100 - n * 80 // 100, r
        assert r["test"] == n - n * 90 // 100, r


def test_temperature_mixture_budget_properties(spark, sf_dir):
    """The limiting source must be fully consumed (accept_rate == 1) and
    no source can be over-sampled; realized counts track rate·n within
    hash-uniformity noise."""
    from helium_arango_etl_spark.operators.pipeline import temperature_mixture

    rows = temperature_mixture(spark, sf_dir).collect()
    assert rows
    assert max(r["accept_rate"] for r in rows) == pytest.approx(1.0, abs=1e-6)
    for r in rows:
        assert 0 < r["accept_rate"] <= 1.0 + 1e-9
        assert r["n_accepted"] <= r["n_docs"]
        # deterministic-hash realization: within 20% + small-count slack
        expect = r["accept_rate"] * r["n_docs"]
        assert abs(r["n_accepted"] - expect) <= max(10, 0.2 * expect), r


def test_triangle_stats_internal_consistency(spark, sf_oracle_dir):
    """Triangles never exceed wedges/3 and transitivity is in [0, 1] —
    plus the degree-ordered count must equal a naive recount on the
    smallest city (independent of the DuckDB oracle's lexicographic
    3-way join, this pins the orientation rewrite directly in-engine)."""
    from itertools import combinations

    from helium_arango_etl_spark.operators.graph import (
        city_triangle_stats,
        co_witness_pairs,
    )

    stats = {r["city_key"]: r for r in city_triangle_stats(spark, sf_oracle_dir).collect()}
    assert stats
    for r in stats.values():
        assert 3 * r["n_triangles"] <= r["n_wedges"], r
        assert 0.0 <= r["transitivity"] <= 1.0, r
    cw = co_witness_pairs(spark, sf_oracle_dir).collect()
    by_city = {}
    for r in cw:
        by_city.setdefault(r["city_key"], set()).add((r["src_a"], r["src_b"]))
    city = min(by_city, key=lambda c: len(by_city[c]))
    edges = by_city[city]
    nodes = sorted({n for e in edges for n in e})
    naive = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if (a, b) in edges and (a, c) in edges and (b, c) in edges
    )
    assert stats[city]["n_triangles"] == naive


def test_weighted_sample_invariants_and_bias(spark, sf_dir):
    """A-ES weighted sampling: at most K per source without replacement,
    dense ranks, and the inclusion probability actually tracks the
    weights — heavy documents must be overrepresented vs a uniform draw."""
    from pyspark.sql import functions as F

    from helium_arango_etl_spark.operators.pipeline import (
        WS_PER_SOURCE_K,
        WS_U_EXPR,
        weighted_sample,
    )

    out = weighted_sample(spark, sf_dir)
    per = out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("doc_id").alias("nd"),
        F.max("rank").alias("mr"),
    )
    for r in per.collect():
        assert r["n"] == r["nd"] <= WS_PER_SOURCE_K
        assert r["mr"] == r["n"]  # dense 1..n ranks

    # weight bias on a synthetic single-source corpus where the sample is
    # a strict subset: heavy docs (w=9x) should dominate the kept set
    heavy = [(i, "s", 8102) for i in range(400)]  # ln(1+8102) ~ 9
    light = [(i, "s", 1) for i in range(400, 2000)]  # ln(2) ~ 0.69
    df = spark.createDataFrame(heavy + light, "doc_id long, source string, n_chars long")
    from pyspark.sql import Window

    keyed = df.withColumn(
        "sample_key", F.expr(f"-ln({WS_U_EXPR}) / ln(1.0 + n_chars)")
    )
    win = Window.partitionBy("source").orderBy("sample_key", "doc_id")
    kept = (
        keyed.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= 100)
        .filter(F.col("doc_id") < 400)
        .count()
    )
    # uniform sampling would keep ~20 heavy docs of 100; weights w_h/w_l ~ 13x
    # push the expected heavy share to ~2000*13/(400*13+1600) ~ 76
    assert kept > 50, kept


def test_similar_docs_topk_is_candidate_subset(spark, sf_dir):
    """Neighbors come only from the banded candidate set, ranks are
    dense per doc, and the top-1 neighbor carries the doc's max est."""
    from pyspark.sql import functions as F

    from helium_arango_etl_spark.operators.dedup import (
        SIMILAR_TOPK,
        lsh_candidate_pairs,
        similar_docs_topk,
    )

    out = similar_docs_topk(spark, sf_dir).collect()
    assert out
    cand = {
        frozenset((r["doc_a"], r["doc_b"]))
        for r in lsh_candidate_pairs(spark, sf_dir).collect()
    }
    best: dict = {}
    per_doc: dict = {}
    for r in out:
        assert frozenset((r["doc_id"], r["similar_doc_id"])) in cand
        per_doc.setdefault(r["doc_id"], []).append(r["rank"])
        best[r["doc_id"]] = max(best.get(r["doc_id"], 0.0), r["est_jaccard"])
    for doc, ranks in per_doc.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= SIMILAR_TOPK


def test_bpe_encode_compresses_merged_words(spark, sf_dir):
    """Applying the trained merges must (a) never exceed one token per
    char, (b) actually compress somewhere (the 3 learned merges cover
    the corpus's top pairs), and (c) price every word of every doc."""
    from pyspark.sql import functions as F

    from helium_arango_etl_spark.io import read_table
    from helium_arango_etl_spark.operators.textops import TOKS, bpe_encode_stats

    rows = bpe_encode_stats(spark, sf_dir).collect()
    assert rows
    assert all(r["n_tokens"] <= r["n_chars"] for r in rows)
    assert any(r["n_tokens"] < r["n_chars"] for r in rows)  # real compression
    n_docs_with_words = (
        read_table(spark, sf_dir, "documents")
        .filter(F.size(F.expr(TOKS)) > 0)
        .count()
    )
    assert len(rows) == n_docs_with_words
