"""Similarity search over the embedding column (`array<float>`, 64-dim).

- :func:`ann_cosine_topk` — brute-force cosine top-k: the exact baseline.
  At scale this is a map-side scan + TakeOrderedAndProject (no shuffle of
  the corpus; only k rows per partition reach the driver-side heap).
- :func:`lsh_bucket_topk` — the scale path: random-hyperplane LSH buckets;
  only the query's bucket is scanned.  Hyperplane coefficients are a
  deterministic pseudo-random function of (plane, dim) so the oracle can
  reproduce them (no RNG in either engine).
- :func:`cosine_near_dup_pairs` — embedding-cosine near-duplicate detection
  via bucketed self-join (same LSH trick as MinHash banding: pairs form
  inside buckets, never across the full corpus).

All arithmetic in float64 (cast up from float32 storage) and rounded before
comparison so summation-order differences cannot flip a hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table

DIM = 64
QUERY_VEC_ID = 0
TOP_K = 10
NUM_PLANES = 8

# cosine(a, b) in float64 over zip_with fold — deterministic sequential sum
_DOT = "aggregate(zip_with(va, vb, (x, y) -> x * y), cast(0 as double), (acc, v) -> acc + v)"
_NA = "sqrt(aggregate(transform(va, x -> x * x), cast(0 as double), (acc, v) -> acc + v))"
_NB = "sqrt(aggregate(transform(vb, x -> x * x), cast(0 as double), (acc, v) -> acc + v))"
COSINE = f"round({_DOT} / ({_NA} * {_NB}), 6)"

_CAST64 = "transform(embedding, x -> cast(x as double))"


def _plane_coef(plane: int, dim_expr: str) -> str:
    """Deterministic pseudo-random coefficient in [-0.5, 0.5): a fixed-point
    hash of (plane, dim) both engines compute identically with integer
    arithmetic."""
    return f"(((({dim_expr} + 1) * {plane * 2 + 1} * 2654435761) % 1000) / 1000.0 - 0.5)"


def _bucket_expr(vec_expr: str) -> str:
    """LSH bucket id: sign bits of NUM_PLANES hyperplane projections."""
    bits = []
    for p in range(NUM_PLANES):
        proj = (
            f"aggregate(transform(sequence(0, {DIM - 1}),"
            f" i -> element_at({vec_expr}, i + 1) * {_plane_coef(p, 'i')}),"
            " cast(0 as double), (acc, v) -> acc + v)"
        )
        bits.append(f"IF({proj} > 0, '1', '0')")
    return "concat(" + ", ".join(bits) + ")"


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k against the query vector (vec_id=0): the
    exact-answer baseline every ANN variant is judged against."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.expr(_CAST64).alias("va"))
    corpus = emb.select("vec_id", "label", F.expr(_CAST64).alias("vb"))
    return (
        corpus.join(F.broadcast(q))
        .select("vec_id", "label", F.expr(COSINE).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col("vec_id").asc())
        .limit(TOP_K)
    )


def lsh_bucket_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF/LSH-bucketed ANN: score only vectors sharing the query's
    hyperplane-sign bucket.  Approximate by design — recall depends on
    NUM_PLANES — but the scan is 1/2^planes of the corpus in expectation."""
    emb = read_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", F.expr(_bucket_expr(_CAST64))
    )
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.expr(_CAST64).alias("va"), F.col("bucket").alias("q_bucket")
    )
    corpus = emb.select("vec_id", "label", F.expr(_CAST64).alias("vb"), "bucket")
    return (
        corpus.join(F.broadcast(q), corpus.bucket == q.q_bucket)
        .select("vec_id", "label", F.expr(COSINE).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col("vec_id").asc())
        .limit(TOP_K)
    )


def near_dup_pairs_for(emb: DataFrame, threshold: float = 0.99) -> DataFrame:
    """Core of embedding near-dup detection over any (vec_id, embedding)
    DataFrame: LSH-bucketed self-join, cosine ≥ threshold.  A real near-dup
    (cosine→1) lands in the same bucket with high probability; the quadratic
    pair formation happens only inside buckets."""
    bucketed = emb.withColumn("bucket", F.expr(_bucket_expr(_CAST64)))
    a = bucketed.select(
        F.col("vec_id").alias("vec_a"), F.expr(_CAST64).alias("va"), "bucket"
    )
    b = bucketed.select(
        F.col("vec_id").alias("vec_b"), F.expr(_CAST64).alias("vb"), "bucket"
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", F.expr(COSINE).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def cosine_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (sim ≥ 0.99) — the embedding
    analog of MinHash near-dup detection.  (Empty on the synthetic testdata,
    whose max pairwise cosine is ~0.37; tests/test_training_ops.py proves the
    detection path on constructed near-dups.)"""
    return near_dup_pairs_for(read_table(spark, sf_dir, "embeddings"))


def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding statistics (sanity/monitoring surface for the
    similarity stack)."""
    emb = read_table(spark, sf_dir, "embeddings").withColumn("va", F.expr(_CAST64))
    norm = "sqrt(aggregate(transform(va, x -> x * x), cast(0 as double), (acc, v) -> acc + v))"
    return (
        emb.select("label", F.round(F.expr(norm), 6).alias("l2_norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("l2_norm"), 4).alias("avg_norm"),
            F.round(F.min("l2_norm"), 4).alias("min_norm"),
            F.round(F.max("l2_norm"), 4).alias("max_norm"),
        )
    )
