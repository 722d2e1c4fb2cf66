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

import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table, spread

DIM = 64
QUERY_VEC_ID = 0
TOP_K = 10
NUM_PLANES = 8

# cosine(a, b) in float64 over zip_with fold — deterministic sequential sum.
# Norms are precomputed per VECTOR (na/nb columns) before any pair join, so
# per-pair work is one dot product, not three folds — at corpus scale the
# pair count dwarfs the vector count.  Same arithmetic as dividing inside
# the pair (na is bit-identical either way), so the oracle needs no change.
_DOT = "aggregate(zip_with(va, vb, (x, y) -> x * y), cast(0 as double), (acc, v) -> acc + v)"
_NORM = "sqrt(aggregate(transform({v}, x -> x * x), cast(0 as double), (acc, v) -> acc + v))"
# a zero-norm vector leaves cosine undefined: NULL on both engines (and
# NULLS sort LAST under DESC in both, so top-k ordering agrees) -- not an
# ANSI division error (degenerate sweep, round 8)
COSINE = f"(CASE WHEN na * nb = 0 THEN NULL ELSE round({_DOT} / (na * nb), 6) END)"

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


# One persisted prepared-embedding table per (session, sf_dir): the
# float64 cast, the L2 norm, and the hyperplane bucket are recomputed
# identically by every similarity query (and the bucket expression is the
# most expensive interpreted higher-order chain in the engine — 8 planes
# × DIM per row), so a real pipeline materializes them once per cycle.
# Same lifecycle pattern as the dedup signature table.
_EMB_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def clear_emb_cache(spark: SparkSession) -> None:
    """Drop this session's prepared-embedding tables and the fitted
    k-means centroids derived from them (bench/test hook)."""
    for df in _EMB_CACHE.pop(spark, {}).values():
        df.unpersist()
    _KM_CACHE.pop(spark, None)


def embedding_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, v64, nv, bucket) — persisted per (session, sf_dir);
    arithmetic is exactly the per-query expressions, just materialized."""
    per_session = _EMB_CACHE.setdefault(spark, {})
    df = per_session.get(sf_dir)
    if df is None:
        df = (
            spread(read_table(spark, sf_dir, "embeddings"))
            .withColumn("v64", F.expr(_CAST64))
            .withColumn("nv", F.expr(_NORM.format(v="v64")))
            .withColumn("bucket", F.expr(_bucket_expr("v64")))
            .select("vec_id", "label", "v64", "nv", "bucket")
        ).persist()
        per_session[sf_dir] = df
    return df


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k against the query vector (vec_id=0): the
    exact-answer baseline every ANN variant is judged against."""
    emb = embedding_table(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v64").alias("va"), F.col("nv").alias("na")
    )
    corpus = emb.select("vec_id", "label", F.col("v64").alias("vb"), F.col("nv").alias("nb"))
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
    # the float64 vector is materialized BEFORE the bucket expression in
    # embedding_table: element_at inside the plane lambdas would otherwise
    # re-run the cast-transform per element (O(DIM²) per plane per row)
    emb = embedding_table(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v64").alias("va"), F.col("bucket").alias("q_bucket"), F.col("nv").alias("na")
    )
    corpus = emb.select(
        "vec_id", "label", F.col("v64").alias("vb"), "bucket", F.col("nv").alias("nb")
    )
    return (
        corpus.join(F.broadcast(q), corpus.bucket == q.q_bucket)
        .select("vec_id", "label", F.expr(COSINE).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col("vec_id").asc())
        .limit(TOP_K)
    )


NUM_QUERIES = 10
BATCH_K = 5


def ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch brute-force ANN: top-BATCH_K corpus vectors per query for a
    whole query SET (vec_id < NUM_QUERIES) in one pass — the shape a
    retrieval pipeline actually runs (N queries, not 1).

    The query block broadcasts (bounded by construction); scoring is one
    map-side pass over the corpus; per-query top-k is a rank window on
    q_id.  At large Q·corpus the brute-force score table itself is the
    bottleneck — that is what the bucketed (lsh_bucket_topk) and
    inverted-list (ivf_topk) variants bound, by scoring only each query's
    probe lists; this operator is their exact-baseline yardstick."""
    emb = embedding_table(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < NUM_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v64").alias("va"), F.col("nv").alias("na")
    )
    corpus = emb.select("vec_id", "label", F.col("v64").alias("vb"), F.col("nv").alias("nb"))
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.col("cosine_sim").desc(), F.col("vec_id").asc())
    return (
        corpus.join(F.broadcast(q))
        .select("q_id", "vec_id", "label", F.expr(COSINE).alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BATCH_K)
    )


def near_dup_pairs_for(emb: DataFrame, threshold: float = 0.99) -> DataFrame:
    """Core of embedding near-dup detection over any (vec_id, embedding)
    DataFrame: LSH-bucketed self-join, cosine ≥ threshold.  A real near-dup
    (cosine→1) lands in the same bucket with high probability; the quadratic
    pair formation happens only inside buckets."""
    bucketed = (
        emb.withColumn("v64", F.expr(_CAST64))
        .withColumn("bucket", F.expr(_bucket_expr("v64")))
        .withColumn("nv", F.expr(_NORM.format(v="v64")))
    )
    return _bucketed_pairs(bucketed, threshold)


def _bucketed_pairs(bucketed: DataFrame, threshold: float) -> DataFrame:
    """Pair generation over a prepared (vec_id, v64, nv, bucket) table.

    One pass: bucket -> collect members -> pairs from inside the bucket
    array (same single-scan shape as dedup.lsh_candidate_pairs; a self-join
    would compute the bucket+norm pipeline twice)."""
    buckets = (
        bucketed.groupBy("bucket")
        .agg(F.sort_array(F.collect_list(F.struct(F.col("vec_id"), F.col("v64"), F.col("nv")))).alias("vs"))
        .filter(F.size("vs") >= 2)
    )
    pair_gen = (
        "flatten(transform(vs, (a, i) ->"
        " transform(slice(vs, i + 2, size(vs) - i - 1),"
        " b -> struct(a.vec_id AS vec_a, b.vec_id AS vec_b,"
        " a.v64 AS va, b.v64 AS vb, a.nv AS na, b.nv AS nb))))"
    )
    return (
        buckets.select(F.explode(F.expr(pair_gen)).alias("p"))
        .select("p.vec_a", "p.vec_b", "p.va", "p.vb", "p.na", "p.nb")
        .select("vec_a", "vec_b", F.expr(COSINE).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def cosine_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (sim ≥ 0.99) — the embedding
    analog of MinHash near-dup detection.  (Empty on the synthetic testdata,
    whose max pairwise cosine is ~0.37; tests/test_training_ops.py proves the
    detection path on constructed near-dups.)"""
    return _bucketed_pairs(embedding_table(spark, sf_dir), 0.99)


def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding statistics (sanity/monitoring surface for the
    similarity stack)."""
    emb = embedding_table(spark, sf_dir)
    # norms are held as integer MICRO units end-to-end: re-rounding a
    # 6dp-quantized value at 4dp lands on .5 halves at the 5th digit
    # (seed-33 --degen audit, round 8), so the 4dp surface rounds the
    # integer-micro value instead — byte-equal off the boundary
    return (
        emb.select("label", F.expr("cast(round(nv * 1e6) as bigint)").alias("ln6"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.expr(
                "cast(round(sum(ln6) / (cast(count(1) as double) * 100))"
                " as bigint) / 1e4"
            ).alias("avg_norm"),
            F.expr(
                "cast(round(min(ln6) / cast(100 as double)) as bigint) / 1e4"
            ).alias("min_norm"),
            F.expr(
                "cast(round(max(ln6) / cast(100 as double)) as bigint) / 1e4"
            ).alias("max_norm"),
        )
    )


NUM_CENTROIDS = 16
NPROBE = 2


def _centroid_array_row(cent: DataFrame) -> DataFrame:
    """Collapse a (centroid_id, cv) table to ONE row holding every
    centroid as an id-sorted struct array.  Broadcast-joined to the
    corpus, per-vector assignment becomes a pure expression sort/fold
    over K elements — the previous form exploded the corpus ×K and
    ranked with a row_number() window whose partitionBy(vec_id) hash
    Exchange shuffled corpus×K rows INCLUDING the v64 payload arrays
    (optimization guide §2.3/§2.4: decide locally, never ship payload
    bytes through an exchange the decision doesn't need).  K is bounded
    by construction (the coarse-quantizer codebook), so the single
    collected row stays broadcast-sized at any corpus scale."""
    return cent.agg(
        F.sort_array(F.collect_list(F.struct("centroid_id", "cv"))).alias("cents")
    )


# Per-centroid dot scores of v64 against every centroid in `cents`.
_CENT_SCORED = (
    "transform(cents, c -> named_struct("
    "'dot', aggregate(zip_with(v64, c.cv, (x, y) -> x * y),"
    " cast(0 as double), (acc, v) -> acc + v),"
    "'centroid_id', c.centroid_id, 'cv', c.cv))"
)

# Comparator replicating EXACTLY the row_number() ordering it replaces:
# dot DESC (Spark sort semantics: NaN before every non-NaN under DESC,
# NULLs last), centroid_id ASC tie-break.
_BY_DOT_DESC = (
    "(l, r) -> CASE"
    " WHEN l.dot IS NULL AND r.dot IS NOT NULL THEN 1"
    " WHEN r.dot IS NULL AND l.dot IS NOT NULL THEN -1"
    " WHEN l.dot IS NOT NULL AND r.dot IS NOT NULL"
    "  AND isnan(l.dot) AND NOT isnan(r.dot) THEN -1"
    " WHEN l.dot IS NOT NULL AND r.dot IS NOT NULL"
    "  AND isnan(r.dot) AND NOT isnan(l.dot) THEN 1"
    " WHEN l.dot > r.dot THEN -1"
    " WHEN l.dot < r.dot THEN 1"
    " WHEN l.centroid_id < r.centroid_id THEN -1"
    " WHEN l.centroid_id > r.centroid_id THEN 1"
    " ELSE 0 END"
)

_CENT_RANKED = f"array_sort({_CENT_SCORED}, {_BY_DOT_DESC})"


def _with_centroid_assignment(emb: DataFrame) -> DataFrame:
    """IVF coarse quantization over a prepared (vec_id, label, v64, nv)
    table: centroids are the NUM_CENTROIDS seed vectors (vec_id 0..15 —
    training-free, deterministic, oracle-reproducible); every vector is
    assigned to its NPROBE best centroids by dot product.

    Scale shape: the centroid array is broadcast as ONE row (it is tiny
    by construction); assignment is one map-side expression pass — the
    inverted-file build never shuffles (or ×K-explodes) the corpus.
    """
    seeds = (
        emb.filter(F.col("vec_id") < NUM_CENTROIDS)
        .select(F.col("vec_id").alias("centroid_id"), F.col("v64").alias("cv"))
    )
    return (
        emb.select("vec_id", "label", "v64", "nv")
        .join(F.broadcast(_centroid_array_row(seeds)))
        .select(
            "vec_id",
            "label",
            "v64",
            "nv",
            F.posexplode(F.expr(f"slice({_CENT_RANKED}, 1, {NPROBE})")),
        )
        .select(
            "vec_id",
            "label",
            "v64",
            "nv",
            F.col("col.centroid_id").alias("centroid_id"),
            (F.col("pos") + 1).cast("int").alias("probe_rank"),
        )
    )


def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: scan only the inverted lists of the query's NPROBE nearest
    centroids.  Complements lsh_bucket_topk (hyperplane signs) with the
    coarse-quantizer family — each vector is indexed under its NPROBE best
    centroids, the query probes its own best list, so recall comes from
    multi-assignment rather than multi-probe.
    """
    assigned = _with_centroid_assignment(embedding_table(spark, sf_dir))
    q = assigned.filter(
        (F.col("vec_id") == QUERY_VEC_ID) & (F.col("probe_rank") == 1)
    ).select(
        F.col("v64").alias("va"),
        F.col("centroid_id").alias("q_centroid"),
        F.col("nv").alias("na"),
    )
    corpus = assigned.select(
        "vec_id", "label", F.col("v64").alias("vb"), "centroid_id", F.col("nv").alias("nb")
    )
    return (
        corpus.join(F.broadcast(q), corpus.centroid_id == q.q_centroid)
        .select("vec_id", "label", F.expr(COSINE).alias("cosine_sim"))
        .dropDuplicates(["vec_id"])
        .orderBy(F.col("cosine_sim").desc(), F.col("vec_id").asc())
        .limit(TOP_K)
    )


# Lloyd's k-means: fixed iteration count + per-iteration centroid
# quantization (round 6dp) so the iterative float state is bit-reproducible
# across engines — the assignment argmax reads identical quantized
# centroids on both sides, which is what makes an iterative float algorithm
# oracle-checkable at all.
KMEANS_ITERS = 2


def _kmeans_assign(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """Assign every vector to its best centroid (max dot product, ties to
    the smallest centroid_id).  The centroid array is broadcast as ONE
    row — K×DIM doubles — so assignment is one map-side expression pass
    over the corpus (no ×K fan-out, no window exchange).  The
    size-guard keeps the empty-centroid-table degenerate case identical
    to the old inner-join-with-empty semantics (zero rows out)."""
    return (
        emb.select("vec_id", "v64")
        .join(F.broadcast(_centroid_array_row(cent)))
        .where(F.expr("size(cents) > 0"))
        .withColumn("best", F.expr(f"{_CENT_RANKED}[0]"))
        .select(
            "vec_id",
            "v64",
            F.col("best.centroid_id").alias("centroid_id"),
            F.col("best.cv").alias("cv"),
        )
    )


# Fitted-centroid cache per (session, sf_dir): three consumers
# (kmeans_centroids, ivf_topk_trained, semantic_dedup) run the identical
# KMEANS_ITERS Lloyd fit — a production pipeline trains the coarse
# quantizer once per corpus snapshot and every index/dedup stage reuses
# it.  The cached table is NUM_CENTROIDS rows (localCheckpointed).
_KM_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def kmeans_fit_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_session = _KM_CACHE.setdefault(spark, {})
    cent = per_session.get(sf_dir)
    if cent is None:
        cent = _kmeans_fit(embedding_table(spark, sf_dir))
        per_session[sf_dir] = cent
    return cent


def _kmeans_fit(emb: DataFrame) -> DataFrame:
    """Run KMEANS_ITERS Lloyd updates from the quantized seed centroids;
    returns the fitted (centroid_id, cv) table (16 rows,
    localCheckpoint'ed — lineage is truncated each iteration)."""
    cent = (
        emb.filter(F.col("vec_id") < NUM_CENTROIDS)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.expr("transform(v64, x -> round(x, 6))").alias("cv"),
        )
        .localCheckpoint()
    )
    for _ in range(KMEANS_ITERS):
        assigned = _kmeans_assign(emb, cent)
        upd = (
            assigned.select("centroid_id", F.posexplode("v64").alias("d", "x"))
            .groupBy("centroid_id", "d")
            .agg(F.round(F.avg("x"), 6).alias("ax"))
            .groupBy("centroid_id")
            .agg(
                F.expr(
                    "transform(sort_array(collect_list(struct(d, ax))), s -> s.ax)"
                ).alias("cv_new")
            )
        )
        cent = (
            cent.join(upd, "centroid_id", "left")
            .select("centroid_id", F.coalesce("cv_new", "cv").alias("cv"))
            .localCheckpoint()
        )
    return cent


def kmeans_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means over the embedding corpus: KMEANS_ITERS
    update steps from the deterministic seed centroids (vec_id <
    NUM_CENTROIDS — the same training-free seeds :func:`ivf_topk` uses;
    this operator is the trained upgrade of that coarse quantizer).

    Scale shape per iteration: assignment is a broadcast-join map pass
    (never shuffles the corpus); the centroid update explodes assigned
    vectors to (centroid, dim, x) triples and mean-reduces them — map-side
    partial aggregation folds each partition to at most K·DIM cells before
    the shuffle, so the exchange is O(partitions · K · DIM), independent of
    corpus size.  Empty clusters keep their previous centroid (left-join
    coalesce).  Output is the per-centroid summary (members, norm, inertia)
    — scalar columns only, driver-canonicalizer-safe.
    """
    emb = embedding_table(spark, sf_dir)
    cent = kmeans_fit_cached(spark, sf_dir)
    final = _kmeans_assign(emb, cent)
    dist2 = (
        "aggregate(zip_with(v64, cv, (x, y) -> (x - y) * (x - y)),"
        " cast(0 as double), (acc, v) -> acc + v)"
    )
    cnorm = "sqrt(aggregate(transform(cv, x -> x * x), cast(0 as double), (acc, v) -> acc + v))"
    return (
        final.withColumn("d2", F.expr(dist2))
        .groupBy("centroid_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(F.sum("d2"), 2).alias("inertia"),
        )
        .join(
            F.broadcast(
                cent.select("centroid_id", F.round(F.expr(cnorm), 6).alias("centroid_norm"))
            ),
            "centroid_id",
        )
        .select("centroid_id", "n_members", "inertia", "centroid_norm")
    )


def ivf_topk_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over TRAINED centroids: the full train → index → query
    composition (:func:`kmeans_centroids` fits the coarse quantizer,
    multi-assignment builds the inverted lists, the query probes its best
    list) — the production counterpart of the training-free
    :func:`ivf_topk`.

    Scale shape is identical to ivf_topk — the fitted centroid table is
    K×DIM and broadcasts everywhere; the corpus is scanned once for
    assignment and only the probed lists are scored.
    """
    emb = embedding_table(spark, sf_dir)
    cent = kmeans_fit_cached(spark, sf_dir)
    assigned = (
        emb.select("vec_id", "label", "v64", "nv")
        .join(F.broadcast(_centroid_array_row(cent)))
        .select(
            "vec_id",
            "label",
            "v64",
            "nv",
            F.posexplode(F.expr(f"slice({_CENT_RANKED}, 1, {NPROBE})")),
        )
        .select(
            "vec_id",
            "label",
            "v64",
            "nv",
            F.col("col.centroid_id").alias("centroid_id"),
            (F.col("pos") + 1).cast("int").alias("rnk"),
        )
    )
    q = assigned.filter(
        (F.col("vec_id") == QUERY_VEC_ID) & (F.col("rnk") == 1)
    ).select(
        F.col("v64").alias("va"),
        F.col("centroid_id").alias("q_centroid"),
        F.col("nv").alias("na"),
    )
    corpus = assigned.select(
        "vec_id", "label", F.col("v64").alias("vb"), "centroid_id", F.col("nv").alias("nb")
    )
    return (
        corpus.join(F.broadcast(q), corpus.centroid_id == q.q_centroid)
        .select("vec_id", "label", F.expr(COSINE).alias("cosine_sim"))
        .dropDuplicates(["vec_id"])
        .orderBy(F.col("cosine_sim").desc(), F.col("vec_id").asc())
        .limit(TOP_K)
    )


def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization per embedding (the storage/serving
    compression step of a production vector index — 4× smaller than
    float32, 8× than float64): scale = max|v| / 127, code_i =
    floor(v_i / scale + 0.5) — floor(x + 0.5) rather than round() because
    double round-half behavior differs across engines while floor is
    exact — plus the L2 reconstruction error.

    Pure per-row codegen'd expressions over the prepared embedding table:
    zero shuffle at any scale.  Codes render as a ','-joined string
    (driver-canonicalizer-safe; int formatting is engine-identical).
    """
    emb = embedding_table(spark, sf_dir)
    amax = "array_max(transform(v64, x -> abs(x)))"
    q = emb.select(
        "vec_id",
        "label",
        "v64",
        F.expr(amax).alias("amax"),
    ).select(
        "vec_id",
        "label",
        "v64",
        (F.col("amax") / 127).alias("scale"),
    )
    # a zero vector has scale 0: its codes are identically zero, not an
    # ANSI division error (degenerate sweep, round 8)
    codes = (
        "transform(v64, x -> if(scale = 0, 0,"
        " cast(floor(x / scale + 0.5d) as int)))"
    )
    recon = (
        "sqrt(aggregate(zip_with(codes, v64, (c, x) -> (c * scale - x) * (c * scale - x)),"
        " cast(0 as double), (acc, v) -> acc + v))"
    )
    return (
        q.withColumn("codes", F.expr(codes))
        .select(
            "vec_id",
            "label",
            "scale",
            F.expr("array_join(transform(codes, c -> cast(c as string)), ',')").alias(
                "codes"
            ),
            F.expr(recon).alias("recon_err"),
        )
    )


def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@K audit of the hyperplane-bucketed ANN path against the exact
    brute-force answer, per query (vec_id < NUM_QUERIES): the quality gauge
    a production ANN index ships next to its latency numbers — an
    approximate index without a measured recall is an unvalidated one.

    For each query: ``n_candidates`` = vectors sharing the query's bucket
    (the fraction of the corpus the approximate path scans),
    ``n_hits`` = overlap between the bucketed top-BATCH_K and the exact
    top-BATCH_K, ``recall`` = n_hits / BATCH_K.

    Scale shape: both rankings reuse the persisted prepared-embedding
    table; the query block broadcasts; the exact side is the one
    brute-force pass (the yardstick — priced once, here), the bucketed
    side scans 1/2^NUM_PLANES of the corpus in expectation; the overlap
    join is K·Q rows. No oracle surprises: ranks order by the ROUNDED
    cosine then vec_id on both engines, so tie-breaks are identical.
    """
    from pyspark.sql import Window

    emb = embedding_table(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < NUM_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("v64").alias("va"),
        F.col("nv").alias("na"),
        F.col("bucket").alias("q_bucket"),
    )
    corpus = emb.select(
        "vec_id", F.col("v64").alias("vb"), F.col("nv").alias("nb"), "bucket"
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id").asc()
    )
    exact = (
        corpus.join(F.broadcast(q))
        .select("q_id", "vec_id", F.expr(COSINE).alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BATCH_K)
        .select("q_id", "vec_id")
    )
    probed = corpus.join(F.broadcast(q), corpus.bucket == q.q_bucket)
    n_cand = probed.groupBy("q_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates")
    )
    approx = (
        probed.select("q_id", "vec_id", F.expr(COSINE).alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BATCH_K)
        .select("q_id", "vec_id")
    )
    # exact/approx rankings are K·Q rows by construction — broadcast them
    # through the overlap and attach joins so no ranking ever shuffles
    hits = (
        approx.join(F.broadcast(exact), ["q_id", "vec_id"])
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    )
    return (
        n_cand.join(F.broadcast(hits), "q_id", "left")
        .select(
            "q_id",
            "n_candidates",
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            F.round(F.coalesce("n_hits", F.lit(0)) / BATCH_K, 6).alias("recall"),
        )
    )


# Product quantization: DIM is split into PQ_M subspaces of PQ_SUB dims;
# each subspace gets a PQ_K-codeword codebook (the seed vectors' subvectors,
# quantized to 6dp so the iterative-free codebook is bit-reproducible across
# engines — same discipline as the kmeans centroids).  A vector's code is
# its per-subspace nearest codeword: 64 doubles compress to 4 small ints
# (memory ratio DIM·8 : PQ_M — the step that makes billion-vector indexes
# fit in RAM).  Queries score against codes with the ADC lookup table.
PQ_M = 4
PQ_SUB = DIM // PQ_M
PQ_K = 16

# squared L2 between subvector s of v64 and codeword (s, j) of the cb array
# (cb is the 64-entry broadcast codebook row, indexed s*PQ_K + j, 1-based)
_PQ_D = (
    f"aggregate(zip_with(slice(v64, (s) * {PQ_SUB} + 1, {PQ_SUB}),"
    f" element_at(cb, (s) * {PQ_K} + (j) + 1),"
    " (x, y) -> (x - y) * (x - y)), cast(0 as double), (acc, v) -> acc + v)"
)

# per-subspace argmin as array_min over (d, j) structs: struct ordering
# compares d first, then j — ties resolve to the smallest codeword id with
# no second evaluation of the distance expression
_PQ_MINS = (
    f"transform(sequence(0, {PQ_M - 1}), s ->"
    f" array_min(transform(sequence(0, {PQ_K - 1}), j ->"
    f" named_struct('d', {_PQ_D}, 'j', j))))"
)


def _pq_codebook_row(emb: DataFrame) -> DataFrame:
    """One-row DF holding the flattened codebook: cb[s*PQ_K + j + 1] =
    6dp-quantized subvector s of seed vector j.  64 × 16 doubles — always
    broadcastable."""
    entries = emb.filter(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").cast("int").alias("j"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {PQ_M - 1}), s ->"
                f" transform(slice(v64, s * {PQ_SUB} + 1, {PQ_SUB}),"
                " x -> round(x, 6)))"
            )
        ).alias("s", "cv"),
    )
    return entries.groupBy().agg(
        F.expr(
            "transform(sort_array(collect_list(struct(s, j, cv))), e -> e.cv)"
        ).alias("cb")
    )


def _pq_codes(emb: DataFrame) -> DataFrame:
    """(vec_id, label, mins) with mins[s] = struct(d, j) of the winning
    codeword per subspace.  The codebook row cross-joins as a broadcast
    (single row); encoding is a pure per-row expression — the corpus never
    shuffles to be encoded, exactly like the hyperplane bucketing."""
    return (
        emb.select("vec_id", "label", "v64")
        .crossJoin(F.broadcast(_pq_codebook_row(emb)))
        .withColumn("mins", F.expr(_PQ_MINS))
    )


def pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding of the corpus: per-vector subspace
    codes (rendered ','-joined — canonicalizer-safe) plus the L2
    reconstruction error — the compression/quality table a PQ index build
    reports.  Zero shuffle at any scale (see _pq_codes)."""
    enc = _pq_codes(embedding_table(spark, sf_dir))
    return enc.select(
        "vec_id",
        "label",
        F.expr("array_join(transform(mins, m -> cast(m.j as string)), ',')").alias(
            "codes_csv"
        ),
        F.round(
            F.expr(
                "sqrt(aggregate(transform(mins, m -> m.d),"
                " cast(0 as double), (acc, v) -> acc + v))"
            ),
            6,
        ).alias("recon_err"),
    )


def pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN via asymmetric distance computation: the query (vec_id =
    QUERY_VEC_ID) builds its PQ_M×PQ_K lookup table of exact
    subvector→codeword distances ONCE; every corpus vector scores as
    PQ_M table lookups on its 4-int code — no float vector math per
    candidate.  This is the memory-bound scale path beside ivf_topk's
    compute-bound one: at 100 TB the codes table is ~DIM·2 bytes/vector
    and the scan reads codes only, never embeddings.

    Scale shape: codebook row and query lookup-table row are broadcast
    singles; scoring is per-row expression + TakeOrderedAndProject."""
    emb = embedding_table(spark, sf_dir)
    cbrow = _pq_codebook_row(emb)
    dt_expr = (
        f"transform(sequence(0, {PQ_M * PQ_K - 1}), i -> "
        + _PQ_D.replace("(s)", f"(cast(i div {PQ_K} as int))").replace(
            "(j)", f"(cast(i % {PQ_K} as int))"
        )
        + ")"
    )
    qrow = (
        emb.filter(F.col("vec_id") == QUERY_VEC_ID)
        .crossJoin(F.broadcast(cbrow))
        .select(F.expr(dt_expr).alias("dt"))
    )
    codes = _pq_codes(emb).select(
        "vec_id", "label", F.expr("transform(mins, m -> m.j)").alias("codes")
    )
    adc = (
        f"aggregate(transform(sequence(0, {PQ_M - 1}), s ->"
        f" element_at(dt, s * {PQ_K} + element_at(codes, s + 1) + 1)),"
        " cast(0 as double), (acc, v) -> acc + v)"
    )
    return (
        codes.crossJoin(F.broadcast(qrow))
        .select("vec_id", "label", F.round(F.expr(adc), 6).alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col("vec_id").asc())
        .limit(TOP_K)
    )


def ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: the composition that actually runs billion-vector search —
    the IVF coarse quantizer prunes the corpus to the query's probe lists
    (compute bound: 1/K of the corpus in expectation per probe), then PQ
    asymmetric-distance scores the survivors from their 4-int codes
    (memory bound: candidates are read as codes, not vectors).

    Scale shape: every auxiliary relation — coarse centroids, PQ codebook
    row, the query's ADC lookup-table row — is broadcast; candidate
    pruning and scoring are map-side; top-k is TakeOrderedAndProject.
    The corpus is scanned once to build (centroid_id, codes) and never
    shuffles.
    """
    emb = embedding_table(spark, sf_dir)
    cbrow = _pq_codebook_row(emb)
    # coarse lists: every vector indexed under its NPROBE best centroids
    assigned = _with_centroid_assignment(emb).select(
        "vec_id", "label", "v64", "centroid_id", "probe_rank"
    )
    # PQ codes for the whole corpus (zero shuffle, shared expression)
    coded = (
        assigned.crossJoin(F.broadcast(cbrow))
        .withColumn("mins", F.expr(_PQ_MINS))
        .select(
            "vec_id",
            "label",
            "centroid_id",
            "probe_rank",
            F.expr("transform(mins, m -> m.j)").alias("codes"),
        )
    )
    dt_expr = (
        f"transform(sequence(0, {PQ_M * PQ_K - 1}), i -> "
        + _PQ_D.replace("(s)", f"(cast(i div {PQ_K} as int))").replace(
            "(j)", f"(cast(i % {PQ_K} as int))"
        )
        + ")"
    )
    qrow = (
        assigned.filter(
            (F.col("vec_id") == QUERY_VEC_ID) & (F.col("probe_rank") == 1)
        )
        .crossJoin(F.broadcast(cbrow))
        .select(
            F.col("centroid_id").alias("q_centroid"), F.expr(dt_expr).alias("dt")
        )
    )
    adc = (
        f"aggregate(transform(sequence(0, {PQ_M - 1}), s ->"
        f" element_at(dt, s * {PQ_K} + element_at(codes, s + 1) + 1)),"
        " cast(0 as double), (acc, v) -> acc + v)"
    )
    return (
        coded.join(F.broadcast(qrow), coded.centroid_id == qrow.q_centroid)
        .select("vec_id", "label", F.round(F.expr(adc), 6).alias("adc_dist"))
        .dropDuplicates(["vec_id"])
        .orderBy(F.col("adc_dist").asc(), F.col("vec_id").asc())
        .limit(TOP_K)
    )


def pq_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@BATCH_K of PQ ADC scoring against the exact L2 ranking, per
    query (vec_id < NUM_QUERIES): isolates pure QUANTIZATION loss — both
    sides rank by squared L2, one from floats, one from 4-int codes — the
    companion gauge to ann_recall_audit's bucketing loss.  A production PQ
    index tunes (PQ_M, PQ_K) against exactly this curve.

    Scale shape: the query block, codebook row, and per-query lookup
    tables are broadcast; the exact side is the priced yardstick pass;
    the ADC side reads codes only; overlap is K·Q rows."""
    from pyspark.sql import Window

    emb = embedding_table(spark, sf_dir)
    cbrow = _pq_codebook_row(emb)
    q = emb.filter(F.col("vec_id") < NUM_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v64").alias("qv")
    )
    d2 = (
        "aggregate(zip_with(qv, v64, (x, y) -> (x - y) * (x - y)),"
        " cast(0 as double), (acc, v) -> acc + v)"
    )
    w_ex = Window.partitionBy("q_id").orderBy(F.col("d").asc(), F.col("vec_id").asc())
    exact = (
        emb.select("vec_id", "v64")
        .join(F.broadcast(q))
        .select("q_id", "vec_id", F.round(F.expr(d2), 6).alias("d"))
        .withColumn("r", F.row_number().over(w_ex))
        .filter(F.col("r") <= BATCH_K)
        .select("q_id", "vec_id")
    )
    dt_expr = (
        f"transform(sequence(0, {PQ_M * PQ_K - 1}), i -> "
        + _PQ_D.replace("(s)", f"(cast(i div {PQ_K} as int))").replace(
            "(j)", f"(cast(i % {PQ_K} as int))"
        )
        + ")"
    )
    qdt = (
        emb.filter(F.col("vec_id") < NUM_QUERIES)
        .crossJoin(F.broadcast(cbrow))
        .select(F.col("vec_id").alias("q_id"), F.expr(dt_expr).alias("dt"))
    )
    codes = _pq_codes(emb).select(
        "vec_id", F.expr("transform(mins, m -> m.j)").alias("codes")
    )
    adc = (
        f"aggregate(transform(sequence(0, {PQ_M - 1}), s ->"
        f" element_at(dt, s * {PQ_K} + element_at(codes, s + 1) + 1)),"
        " cast(0 as double), (acc, v) -> acc + v)"
    )
    approx = (
        codes.join(F.broadcast(qdt))
        .select("q_id", "vec_id", F.round(F.expr(adc), 6).alias("d"))
        .withColumn("r", F.row_number().over(w_ex))
        .filter(F.col("r") <= BATCH_K)
        .select("q_id", "vec_id")
    )
    hits = (
        approx.join(F.broadcast(exact), ["q_id", "vec_id"])
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    )
    allq = q.select("q_id")
    return allq.join(F.broadcast(hits), "q_id", "left").select(
        "q_id",
        F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
        F.round(F.coalesce("n_hits", F.lit(0)) / BATCH_K, 6).alias("recall"),
    )


RERANK_SHORTLIST = 50


def pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval — the production ANN serving pattern the other
    PQ queries stop short of: ADC code scoring shortlists
    RERANK_SHORTLIST candidates (codes only, memory-bound), then ONLY the
    shortlist is re-scored with exact float L2 against the true
    embeddings and the final TOP_K re-ranked.  Recovers most of the
    recall PQ quantization loses (pq_recall_audit measures that loss)
    while touching RERANK_SHORTLIST/N of the float vectors.

    Scale shape: stage 1 is pq_topk's plan with a wider limit
    (TakeOrderedAndProject, broadcast lookup table); stage 2 joins the
    50-id shortlist back to the embedding table as a BROADCAST semi-side
    — the big float table is probed, never shuffled; exact scoring is
    50 rows of work regardless of corpus size."""
    emb = embedding_table(spark, sf_dir)
    cbrow = _pq_codebook_row(emb)
    dt_expr = (
        f"transform(sequence(0, {PQ_M * PQ_K - 1}), i -> "
        + _PQ_D.replace("(s)", f"(cast(i div {PQ_K} as int))").replace(
            "(j)", f"(cast(i % {PQ_K} as int))"
        )
        + ")"
    )
    qrow = (
        emb.filter(F.col("vec_id") == QUERY_VEC_ID)
        .crossJoin(F.broadcast(cbrow))
        .select(F.expr(dt_expr).alias("dt"), F.col("v64").alias("qv"))
    )
    codes = _pq_codes(emb).select(
        "vec_id", F.expr("transform(mins, m -> m.j)").alias("codes")
    )
    adc = (
        f"aggregate(transform(sequence(0, {PQ_M - 1}), s ->"
        f" element_at(dt, s * {PQ_K} + element_at(codes, s + 1) + 1)),"
        " cast(0 as double), (acc, v) -> acc + v)"
    )
    shortlist = (
        codes.crossJoin(F.broadcast(qrow.select("dt")))
        .select("vec_id", F.round(F.expr(adc), 6).alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col("vec_id").asc())
        .limit(RERANK_SHORTLIST)
    )
    d2 = (
        "aggregate(zip_with(qv, v64, (x, y) -> (x - y) * (x - y)),"
        " cast(0 as double), (acc, v) -> acc + v)"
    )
    return (
        emb.select("vec_id", "label", "v64")
        .join(F.broadcast(shortlist), "vec_id")
        .crossJoin(F.broadcast(qrow.select("qv")))
        .select(
            "vec_id",
            "label",
            "adc_dist",
            F.round(F.expr(d2), 6).alias("exact_dist"),
        )
        .orderBy(F.col("exact_dist").asc(), F.col("vec_id").asc())
        .limit(TOP_K)
    )


def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/std over the corpus — the calibration pass
    feeding normalization, whitening, and quantizer range selection
    (embedding_quantize's min/max is the cheap form; mean±k·std is the
    robust one).  Values quantize to integer micro-units BEFORE the sums
    so every aggregation is exact bigint arithmetic — float partial sums
    across partitions are order-sensitive and would hash-drift the 6dp
    surface between engines.

    Scale shape: posexplode to (dim, value) pairs, one keyed shuffle of
    DIM groups with map-side partials; output is DIM rows regardless of
    corpus size — the same mergeable-counter class as the sketches.
    """
    emb = embedding_table(spark, sf_dir)
    dims = emb.select(F.posexplode("v64").alias("dim", "x")).select(
        "dim", F.expr("cast(round(x * 1000000) as bigint)").alias("xi")
    )
    return (
        dims.groupBy("dim")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("xi").alias("sx"),
            F.sum(F.expr("xi * xi")).alias("sxx"),
        )
        .select(
            F.col("dim").cast("int").alias("dim"),
            "n",
            # mean·1e6 = sx/n: round the scaled integer division, not a
            # fresh round(x, 6) — a 32-vector corpus (power-of-two n)
            # lands sx/n on an exact .5 micro, which the engines resolve
            # differently AND propagates into every consumer of the
            # published stats (seed-46 audit: whiten_audit diverged on 8
            # rows purely through this mean)
            F.expr(
                "cast(round(sx / cast(n as double)) as bigint) / 1e6"
            ).alias("mean"),
            # variance numerator n·sxx − sx² stays an EXACT integer; only
            # one int→double conversion + sqrt + divide touch floats, so
            # no cross-engine association drift (a chained double formula
            # differed by 1 ulp at 6dp); std·1e6 = sqrt(·)/n, quantized
            # the same way
            F.expr(
                "cast(round(sqrt(cast(n * sxx - sx * sx as double))"
                " / cast(n as double)) as bigint) / 1e6"
            ).alias("std"),
        )
    )


# Matryoshka-style truncation: rank by the first MRL_PREFIX_DIM of DIM
# dimensions (the memory/latency lever MRL-trained embeddings expose)
MRL_PREFIX_DIM = 16


def mrl_prefix_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@K of PREFIX-dimension ranking vs the full-dimension exact
    ranking, per query — the audit behind Matryoshka-representation
    serving: if embeddings tolerate truncation (MRL-trained ones do),
    scoring the first 16 of 64 dims cuts ANN memory traffic 4× and this
    measures exactly what that costs in ranking quality.  Same
    shape/tie-break discipline as ann_recall_audit (rounded cosine, then
    vec_id), so the compare is bit-stable across engines.

    Scale shape: both rankings reuse the persisted prepared-embedding
    table and broadcast the query block; prefix norms are computed
    per-row in codegen (slice + in-order fold); the overlap join is
    K·Q rows, broadcast.
    """
    from pyspark.sql import Window

    p = MRL_PREFIX_DIM
    emb = embedding_table(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < NUM_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v64").alias("va"), F.col("nv").alias("na")
    )
    corpus = emb.select("vec_id", F.col("v64").alias("vb"), F.col("nv").alias("nb"))
    joined = corpus.join(F.broadcast(q))
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id").asc()
    )
    exact = (
        joined.select("q_id", "vec_id", F.expr(COSINE).alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BATCH_K)
        .select("q_id", "vec_id")
    )
    pdot = (
        f"aggregate(zip_with(slice(va, 1, {p}), slice(vb, 1, {p}),"
        " (x, y) -> x * y), cast(0 as double), (acc, v) -> acc + v)"
    )
    pnorm = (
        "sqrt(aggregate(transform(slice({v}, 1, %d), x -> x * x),"
        " cast(0 as double), (acc, v) -> acc + v))" % p
    )
    pn = f"({pnorm.format(v='va')} * {pnorm.format(v='vb')})"
    # a zero-norm PREFIX (zero vector, or zeros in the first p dims)
    # leaves the prefix cosine undefined -> NULL, sorted last under DESC
    # on both engines (degenerate sweep, round 8)
    pcos = f"(CASE WHEN {pn} = 0 THEN NULL ELSE round({pdot} / {pn}, 6) END)"
    prefix = (
        joined.select("q_id", "vec_id", F.expr(pcos).alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BATCH_K)
        .select("q_id", "vec_id")
    )
    hits = (
        prefix.join(F.broadcast(exact), ["q_id", "vec_id"])
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    )
    return (
        q.select("q_id")
        .join(F.broadcast(hits), "q_id", "left")
        .select(
            "q_id",
            F.lit(p).cast("int").alias("prefix_dim"),
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            F.round(F.coalesce("n_hits", F.lit(0)) / BATCH_K, 6).alias("recall"),
        )
    )


def hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor (the
    NUM_QUERIES query block), the BATCH_K most-similar corpus vectors whose
    label DIFFERS from the anchor's — the near-miss negatives that make
    InfoNCE/triplet losses actually learn (random negatives are trivially
    separable; the hardest ones sit right at the decision boundary).
    Embedding-space counterpart of the graph-side `contrastive_pairs`
    (which mines negatives by adjacency, not geometry).

    Scale shape: identical to ann_batch_topk — the anchor block broadcasts,
    the corpus is scanned once map-side (label filter applied before the
    dot product), per-anchor top-k is a rank window keyed by q_id.  The
    production variant swaps the brute-force scan for the IVF probe path;
    this is its exact yardstick.
    """
    from pyspark.sql import Window

    emb = embedding_table(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < NUM_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("anchor_label"),
        F.col("v64").alias("va"),
        F.col("nv").alias("na"),
    )
    corpus = emb.select(
        "vec_id", F.col("label").alias("neg_label"),
        F.col("v64").alias("vb"), F.col("nv").alias("nb"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id").asc()
    )
    return (
        corpus.join(F.broadcast(q), F.col("neg_label") != F.col("anchor_label"))
        .select(
            "q_id", "anchor_label", "vec_id", "neg_label",
            F.expr(COSINE).alias("cosine_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BATCH_K)
    )


# SemDeDup (Abbas et al. 2023): semantic dedup = cluster the corpus, then
# prune near-identical pairs WITHIN each cluster only.  The cluster bound
# is what makes the quadratic tractable: sum(k_i^2) with k_i ~ n/K, and a
# production run sizes K ~ sqrt(n) so per-cluster pair counts stay flat as
# the corpus grows.  Threshold chosen against the synthetic corpus' cosine
# distribution (same-label q99.9 ~ 0.35) so the op exercises real drops.
SEMDEDUP_THRESH = 0.30


def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: k-means-bucketed embedding dedup.  Reuses the trained
    Lloyd quantizer (`_kmeans_fit` — quantized, oracle-reproducible),
    assigns every vector to its single best centroid, forms pairs only
    inside a cluster, and greedily keeps the smaller vec_id of any pair
    with cosine >= SEMDEDUP_THRESH (same keep-smallest discipline as
    `near_dup_keep`).  Output is the full per-vector verdict: cluster,
    kept flag, and the strongest within-cluster similarity that caused a
    drop (NULL when kept).

    Scale shape: centroids broadcast (K x DIM); assignment is one map-side
    argmax pass (corpus never shuffles to build the index); the only
    shuffle is the within-cluster self-join keyed on centroid_id, whose
    size sum(k_i^2) is bounded by the cluster granularity — the paper's
    entire point.  Vector bodies leave the join immediately; only
    (vec_id, cosine) pairs reach the verdict aggregation.
    """
    emb = embedding_table(spark, sf_dir)
    cent = kmeans_fit_cached(spark, sf_dir)
    # assigned is consumed three times (both pair sides + the verdict
    # spine) — materialize the single assignment pass instead of running
    # the broadcast argmax once per consumer (a cluster run persists
    # this to storage between pipeline stages); the argmax itself is a
    # map-side expression fold, so the checkpointed job has NO exchange
    assigned = (
        emb.select("vec_id", "v64", "nv")
        .join(F.broadcast(_centroid_array_row(cent)))
        .where(F.expr("size(cents) > 0"))
        .withColumn("best", F.expr(f"{_CENT_RANKED}[0]"))
        .select(
            "vec_id",
            "v64",
            "nv",
            F.col("best.centroid_id").alias("centroid_id"),
        )
        .localCheckpoint()
    )
    a = assigned.select(
        F.col("centroid_id").alias("ca"), F.col("vec_id").alias("ia"),
        F.col("v64").alias("va"), F.col("nv").alias("na"),
    )
    b = assigned.select(
        F.col("centroid_id").alias("cb"), F.col("vec_id").alias("ib"),
        F.col("v64").alias("vb"), F.col("nv").alias("nb"),
    )
    dup = (
        a.join(b, (F.col("ca") == F.col("cb")) & (F.col("ia") < F.col("ib")))
        .select("ib", F.expr(COSINE).alias("cos"))
        .filter(F.col("cos") >= SEMDEDUP_THRESH)
        .groupBy("ib")
        .agg(F.max("cos").alias("max_dup_sim"))
    )
    return (
        assigned.select("vec_id", "centroid_id")
        .join(dup.withColumnRenamed("ib", "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            "centroid_id",
            F.col("max_dup_sim").isNull().alias("is_kept"),
            "max_dup_sim",
        )
    )


# MMR (Carbonell & Goldstein 1998): diversity-aware rerank of a retrieval
# shortlist — greedily pick argmax of lambda*relevance - (1-lambda)*max
# similarity to the already-picked set.  lambda = 0.5, so in integer
# MICRO-units the step score is simply rel_micro - max_prev_micro (the
# common scale factor 2 cannot flip an argmax).
MMR_CANDS = 20
MMR_K = 5


def mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance rerank: per query (the NUM_QUERIES
    block), fetch the MMR_CANDS brute-force nearest candidates, then
    greedily select MMR_K of them, each step maximizing relevance minus
    the strongest similarity to anything already selected — the standard
    answer to "my top-10 are 10 copies of the same document" after
    dedup-free retrieval.

    Determinism: relevance and pairwise similarity quantize to integer
    micro-units (6dp cosine x 1e6) before any comparison, so every argmax
    is exact bigint arithmetic with vec_id tie-breaks — bit-stable across
    engines; the oracle unrolls the same MMR_K greedy steps as CTEs.

    Scale shape: candidate generation is the ann_batch_topk scan (corpus
    never shuffles); everything after operates on Q x MMR_CANDS rows and
    their Q x C^2 pairwise sims — bounded by construction, localCheckpoint
    per step keeps the unrolled lineage flat.  The selection loop is
    static unrolling (MMR_K steps), not data-dependent iteration.
    """
    from pyspark.sql import Window

    emb = embedding_table(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < NUM_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v64").alias("va"), F.col("nv").alias("na")
    )
    corpus = emb.select("vec_id", F.col("v64").alias("vb"), F.col("nv").alias("nb"))
    micro = f"cast(round(({COSINE}) * 1000000) as bigint)"
    wc = Window.partitionBy("q_id").orderBy(
        F.col("rel_micro").desc(), F.col("vec_id").asc()
    )
    cand = (
        corpus.join(F.broadcast(q))
        .select("q_id", "vec_id", F.expr(micro).alias("rel_micro"))
        # zero-norm query or corpus vectors have NULL relevance: they are
        # not rankable candidates -- exclude BEFORE the rank window on
        # both engines (degenerate sweep, round 8); with zero-norm rows
        # gone, every downstream pairwise sim is non-NULL too
        .filter(F.col("rel_micro").isNotNull())
        .withColumn("rk", F.row_number().over(wc))
        .filter(F.col("rk") <= MMR_CANDS)
        .drop("rk")
        .localCheckpoint()
    )
    cv = cand.join(emb.select("vec_id", "v64", "nv"), "vec_id")
    pa = cv.select(
        "q_id", F.col("vec_id").alias("ia"),
        F.col("v64").alias("va"), F.col("nv").alias("na"),
    )
    pb = cv.select(
        "q_id", F.col("vec_id").alias("ib"),
        F.col("v64").alias("vb"), F.col("nv").alias("nb"),
    )
    pairs = (
        pa.join(pb, "q_id")
        .filter(F.col("ia") != F.col("ib"))
        .select("q_id", "ia", "ib", F.expr(micro).alias("sim_micro"))
        .localCheckpoint()
    )
    # The greedy selection runs as ONE codegen'd expression fold per
    # query (the markov_absorption fold idiom — round 8: was MMR_K-1
    # join+window+checkpoint rounds, now one job): candidates and their
    # pairwise sims are Q x C / Q x C² bounded arrays, every argmax is
    # an integer-micro comparator sort with vec_id tie-breaks, and the
    # max-prev reduction is an exact bigint greatest-fold — byte-
    # identical to the join form and the oracle's unrolled greedy CTEs.
    cs = cand.groupBy("q_id").agg(
        F.sort_array(F.collect_list(F.struct("vec_id", "rel_micro"))).alias("cs")
    )
    ps = pairs.groupBy("q_id").agg(
        F.collect_list(F.struct("ia", "ib", "sim_micro")).alias("ps0")
    )
    packed = cs.join(ps, "q_id", "left").select(
        "q_id", "cs", F.expr("coalesce(ps0, array())").alias("ps")
    )
    # best-first comparator: (rel - mp) desc, vec_id asc
    by_score = (
        "(l, r) -> CASE WHEN l.rel_micro - l.mp > r.rel_micro - r.mp THEN -1"
        " WHEN l.rel_micro - l.mp < r.rel_micro - r.mp THEN 1"
        " WHEN l.vec_id < r.vec_id THEN -1"
        " WHEN l.vec_id > r.vec_id THEN 1 ELSE 0 END"
    )
    first = (
        "array_sort(transform(cs, c -> named_struct("
        "'vec_id', c.vec_id, 'rel_micro', c.rel_micro, 'mp', 0L)),"
        f" {by_score})[0]"
    )
    init = (
        f"array(named_struct('vec_id', {first}.vec_id,"
        f" 'rel_micro', {first}.rel_micro, 'sel_order', 1,"
        " 'max_prev_micro', 0L))"
    )
    # per step: score unselected candidates (mp = exact max sim to any
    # selected; -2e6 init is below the cosine-micro floor of -1e6 and a
    # pair to each selected always exists), pick the comparator minimum
    scored = (
        "transform("
        " filter(cs, c -> size(filter(acc, s -> s.vec_id = c.vec_id)) = 0),"
        " c -> named_struct('vec_id', c.vec_id, 'rel_micro', c.rel_micro,"
        " 'mp', aggregate("
        "   filter(ps, p -> p.ia = c.vec_id"
        "     AND size(filter(acc, s -> s.vec_id = p.ib)) > 0),"
        "   -2000000L, (m, p) -> greatest(m, p.sim_micro))))"
    )
    step = (
        f"CASE WHEN size({scored}) = 0 THEN acc"
        f" ELSE concat(acc, array(named_struct("
        f"'vec_id', array_sort({scored}, {by_score})[0].vec_id,"
        f" 'rel_micro', array_sort({scored}, {by_score})[0].rel_micro,"
        f" 'sel_order', cast(i as int),"
        f" 'max_prev_micro', array_sort({scored}, {by_score})[0].mp))) END"
    )
    fold = f"aggregate(sequence(2, {MMR_K}), {init}, (acc, i) -> {step})"
    return (
        packed.select("q_id", F.explode(F.expr(fold)).alias("r"))
        .select(
            "q_id",
            F.col("r.sel_order").cast("int").alias("sel_order"),
            F.col("r.vec_id").alias("vec_id"),
            F.round(F.col("r.rel_micro") / 1e6, 6).alias("cosine_sim"),
            F.round(
                (F.col("r.rel_micro") - F.col("r.max_prev_micro")) / 1e6, 6
            ).alias("mmr_score"),
        )
    )


# Reciprocal-rank fusion (Cormack et al. 2009): the standard way a modern
# retrieval stack combines keyword (BM25) and semantic (embedding ANN)
# rankings without score calibration — 1/(RRF_K + rank) per list, summed.
RRF_K = 60


def hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: fuse the BM25 keyword top-k (`textops.bm25_topk`)
    with the embedding cosine top-k for the same corpus (vec_id == doc_id
    where embeddings exist) by reciprocal-rank fusion.  Docs surfaced by
    only one ranking still score (the other contribution is absent) —
    exactly how RRF rewards agreement without requiring it.

    Determinism: RRF contributions are round(1e6/(K + rank)) integers, so
    the fused score is an exact bigint sum; ties break on doc_id.

    Scale shape: both input rankings are already bounded top-k results
    (TakeOrderedAndProject each); everything downstream — the full-outer
    fusion join, the re-rank — operates on <= 2k rows.
    """
    from pyspark.sql import Window

    from .textops import BM25_TOP_K, bm25_topk

    bm = bm25_topk(spark, sf_dir).select("doc_id", F.col("rank").alias("bm25_rank"))
    emb = embedding_table(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v64").alias("va"), F.col("nv").alias("na")
    )
    corpus = emb.select("vec_id", F.col("v64").alias("vb"), F.col("nv").alias("nb"))
    semtop = (
        corpus.join(F.broadcast(q))
        .select("vec_id", F.expr(COSINE).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col("vec_id").asc())
        .limit(TOP_K)
    )
    ws = Window.orderBy(F.col("cosine_sim").desc(), F.col("vec_id").asc())
    sem = semtop.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number().over(ws).cast("int").alias("sem_rank"),
    )
    contrib = f"coalesce(cast(round(1000000 / ({RRF_K} + {{r}})) as bigint), 0)"
    fused = (
        bm.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            "bm25_rank",
            "sem_rank",
            F.expr(
                contrib.format(r="bm25_rank") + " + " + contrib.format(r="sem_rank")
            ).alias("rrf_micro"),
        )
        .orderBy(F.col("rrf_micro").desc(), F.col("doc_id").asc())
        .limit(BM25_TOP_K)
    )
    wr = Window.orderBy(F.col("rrf_micro").desc(), F.col("doc_id").asc())
    return fused.select(
        "doc_id",
        "bm25_rank",
        "sem_rank",
        F.round(F.col("rrf_micro") / 1e6, 6).alias("rrf_score"),
        F.row_number().over(wr).cast("int").alias("rank"),
    )


PROTO_SUSPECTS = 5


def prototype_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Noisy-label screening by class-prototype distance: each label's
    prototype is the per-dimension mean of its member vectors (quantized
    6dp, the Lloyd-update discipline); every vector scores its cosine to
    its OWN label's prototype, and the PROTO_SUSPECTS lowest per label
    surface as mislabel suspects — the classic confident-learning-style
    audit a labeled corpus runs before training.

    Scale shape: prototypes reduce via posexplode -> (label, dim) mean —
    map-side partial aggregation folds each partition to |labels| x DIM
    cells before the shuffle; the |labels|-row prototype table broadcasts
    back onto one corpus scan; suspects come from a keyed rank window per
    label.
    """
    from pyspark.sql import Window

    emb = embedding_table(spark, sf_dir)
    proto = (
        emb.select("label", F.posexplode("v64").alias("d", "x"))
        .groupBy("label", "d")
        .agg(F.round(F.avg("x"), 6).alias("px"))
        .groupBy("label")
        .agg(
            F.expr(
                "transform(sort_array(collect_list(struct(d, px))), s -> s.px)"
            ).alias("pv")
        )
        .select(
            "label",
            F.col("pv").alias("vb"),
            F.expr(_NORM.format(v="pv")).alias("nb"),
        )
    )
    scored = (
        emb.select("vec_id", "label", F.col("v64").alias("va"), F.col("nv").alias("na"))
        .join(F.broadcast(proto), "label")
        .select("vec_id", "label", F.expr(COSINE).alias("proto_cos"))
    )
    w = Window.partitionBy("label").orderBy(F.col("proto_cos").asc(), F.col("vec_id").asc())
    # zero-norm vectors have NULL proto_cos: exclude them BEFORE ranking
    # on both engines (Spark sorts NULLs first ascending, DuckDB last --
    # and an undefined cosine is not a mislabel signal) -- degenerate
    # sweep, round 8
    return (
        scored.filter(F.col("proto_cos").isNotNull())
        .withColumn("suspect_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("suspect_rank") <= PROTO_SUSPECTS)
        .select("vec_id", "label", "proto_cos", "suspect_rank")
    )


def embedding_whiten_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitening audit: per vector, the norm and max |z| of its
    per-dimension standardized form z_i = (x_i − μ_i)/σ_i using the
    corpus calibration from :func:`embedding_dim_stats` — a whitened
    corpus should show norms ≈ √DIM and no dimension with extreme |z|;
    rows that don't are scaling bugs or outliers headed for the
    quantizer's clip range.

    Determinism: μ/σ enter as the 6dp-rounded published stats (identical
    doubles both engines); each z² term quantizes to integer micro-units
    inside the fold (exact bigint sum); max|z| is an integer array max.

    Scale shape: the DIM-row stats table folds to a 2-array single row
    and broadcasts; the audit is one map-side pass over the corpus —
    nothing shuffles but the DIM-group stats aggregation itself.
    """
    stats = embedding_dim_stats(spark, sf_dir)
    srow = stats.agg(
        F.expr("transform(sort_array(collect_list(struct(dim, mean))), s -> s.mean)")
        .alias("ms"),
        F.expr("transform(sort_array(collect_list(struct(dim, std))), s -> s.std)")
        .alias("ss"),
    )
    z = (
        "IF(element_at(ss, i) = 0.0, cast(0.0 as double),"
        " (element_at(v64, i) - element_at(ms, i)) / element_at(ss, i))"
    )
    zsq = (
        f"aggregate(sequence(1, {DIM}), cast(0 as bigint),"
        f" (acc, i) -> acc + cast(round(({z}) * ({z}) * 1000000) as bigint))"
    )
    zmax = (
        f"array_max(transform(sequence(1, {DIM}),"
        f" i -> cast(round(abs({z}) * 1000000) as bigint)))"
    )
    emb = embedding_table(spark, sf_dir)
    return (
        emb.crossJoin(F.broadcast(srow))
        .select(
            "vec_id",
            F.round(F.sqrt(F.expr(zsq) / F.lit(1e6)), 6).alias("whitened_norm"),
            F.round(F.expr(zmax) / 1e6, 6).alias("max_abs_z"),
        )
    )


# power iteration for the top principal component: fixed iterations with
# 6dp-quantized state per step (the Lloyd-fit discipline) — an iterative
# float algorithm made oracle-checkable
PCA_ITERS = 3


def embedding_top_pc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus by power
    iteration — the dimensionality-reduction family's representative
    (whitening's audit told you the scales; this tells you the dominant
    direction, the first step of PCA compression and a drift fingerprint
    between corpus snapshots).

    Determinism: the covariance numerator n·Σxᵢxⱼ − Σxᵢ·Σxⱼ accumulates
    in exact integer MILLI-unit products (overflow-sized for 100k-row
    corpora; partition-order-proof); each matvec/norm is a sequential
    fold over dimension-ORDERED arrays (the COSINE discipline — both
    engines fold left-to-right over identical lists); the iterate
    re-quantizes to 6dp each step, so all PCA_ITERS states are
    bit-reproducible.  Sign is fixed by making the largest-|loading|
    component positive (eigenvectors are sign-ambiguous).

    Scale shape: the DIM² covariance cells accumulate with map-side
    combine (bounded state, like the dim-stats pass); iterations operate
    on DIM rows with the 1-row DIM-array iterate broadcast — corpus is
    scanned once for the covariance, never again; the loop is
    orchestration-only (localCheckpointed 1-row state, no driver
    collect).
    """
    emb = embedding_table(spark, sf_dir)
    milli = emb.select(
        F.expr("transform(v64, x -> cast(round(x * 1000) as bigint))").alias("xs")
    )
    sums = (
        milli.select(F.posexplode("xs").alias("i", "x"))
        .groupBy("i")
        .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n"))
    )
    pairs = (
        milli.select(F.posexplode("xs").alias("i", "x"), F.col("xs"))
        .select("i", "x", F.posexplode("xs").alias("j", "y"))
        .groupBy("i", "j")
        .agg(F.sum(F.expr("x * y")).alias("sxy"))
    )
    si = sums.select(F.col("i"), F.col("sx").alias("sxi"), "n")
    sj = sums.select(F.col("i").alias("j"), F.col("sx").alias("sxj"))
    cov_rows = (
        pairs.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .select(
            "i", "j",
            F.expr("cast(n * sxy - sxi * sxj as double)").alias("c"),
        )
        .groupBy("i")
        .agg(
            F.expr("transform(sort_array(collect_list(struct(j, c))), s -> s.c)")
            .alias("crow")
        )
    ).localCheckpoint()
    init = ", ".join([str(round(1.0 / DIM**0.5, 6))] * DIM)
    vrow = spark.range(1).select(F.expr(f"array({init})").alias("vv"))
    dot = (
        "aggregate(zip_with(crow, vv, (a, b) -> a * b),"
        " cast(0 as double), (acc, t) -> acc + t)"
    )
    nrm = (
        "sqrt(aggregate(transform(ws, x -> x * x), cast(0 as double),"
        " (acc, t) -> acc + t))"
    )
    for _ in range(PCA_ITERS):
        w = cov_rows.crossJoin(F.broadcast(vrow)).select(
            "i", F.expr(dot).alias("w")
        )
        vrow = (
            w.groupBy()
            .agg(
                F.expr(
                    "transform(sort_array(collect_list(struct(i, w))), s -> s.w)"
                ).alias("ws")
            )
            .select(F.expr(f"transform(ws, x -> round(x / ({nrm}), 6))").alias("vv"))
            .localCheckpoint()
        )
    lam = (
        cov_rows.crossJoin(F.broadcast(vrow))
        .select("i", F.expr(dot).alias("w"), F.col("vv"))
        .groupBy()
        .agg(
            F.expr(
                "aggregate(zip_with("
                "transform(sort_array(collect_list(struct(i, w))), s -> s.w),"
                " any_value(vv), (a, b) -> a * b),"
                " cast(0 as double), (acc, t) -> acc + t)"
            ).alias("lam")
        )
    )
    out = (
        cov_rows.select("i")
        .crossJoin(F.broadcast(vrow))
        .crossJoin(F.broadcast(lam))
        .select(
            F.col("i").cast("int").alias("dim"),
            F.expr("round(element_at(vv, cast(i as int) + 1), 6)").alias("loading"),
            F.round(F.expr("lam / 1e12"), 4).alias("eigenvalue_scaled"),
        )
    )
    sign = (
        out.orderBy(F.abs(F.col("loading")).desc(), F.col("dim").asc())
        .limit(1)
        .select(F.expr("IF(loading < 0, -1.0, 1.0)").alias("sg"))
    )
    return out.crossJoin(F.broadcast(sign)).select(
        "dim",
        F.round(F.col("loading") * F.col("sg"), 6).alias("loading"),
        "eigenvalue_scaled",
    )


KNN_K = 5

# Scale guard for the corpus² demo (VERDICT r9 #7): sf0.1 carries 2k
# vectors; the r9 ANN probe's 20k-vector corpus is where the exact form
# times out — the threshold sits between them so harness scales run
# free and a production-sized corpus gets the refusal + twin pointer.
EXACT_DEMO_MAX_VECTORS = 10_000


def mutual_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual k-nearest-neighbor graph over the embedding corpus: an
    edge (a, b) exists iff b is in a's cosine top-K AND a is in b's —
    the symmetric pruning that turns raw kNN into the graph clustering /
    manifold-learning substrate (UMAP's and SemDeDup-style cluster
    seeds both start here), far more noise-robust than one-directional
    kNN because hub vectors can't attach to everything.

    Determinism: ranking compares micro-quantized cosines with vec_id
    tie-break; the mutual check is an exact id-pair semi-join; each
    surviving edge emits once in (min, max) canonical order.

    Scale shape: the demo path scores all pairs (corpus² dot products,
    fine at harness scale); the 100 TB path swaps the pair source for
    the LSH bucket candidates (`lsh_bucket_topk`'s bucket join) with
    identical downstream rank/mutual logic — the rank window keys on
    vec_id either way, and norms come precomputed off the shared
    embedding table so per-pair work is one fold.

    Scale guard (VERDICT r9 #7): above EXACT_DEMO_MAX_VECTORS rows the
    corpus² plan refuses with a pointer to `mutual_knn_graph_lsh`
    unless SPARK_GRAFT_ALLOW_EXACT_DEMO=1 — the r9 ANN probe measured
    the exact form timing out (>600 s) at 20k vectors where the LSH
    twin finishes in 14 s.
    """
    import os

    from pyspark.sql import Window

    from .graph import ALLOW_EXACT_DEMO_ENV

    if os.environ.get(ALLOW_EXACT_DEMO_ENV) != "1":
        # raw-table count: parquet row-group metadata, no column eval —
        # the guard must stay cheap on exactly the corpora it refuses
        n = read_table(spark, sf_dir, "embeddings").count()
        if n > EXACT_DEMO_MAX_VECTORS:
            raise RuntimeError(
                f"mutual_knn_graph is the documented corpus-squared DEMO;"
                f" this corpus has {n} vectors"
                f" (> {EXACT_DEMO_MAX_VECTORS}). Use the bounded"
                f" production twin `mutual_knn_graph_lsh` instead, or set"
                f" {ALLOW_EXACT_DEMO_ENV}=1 to opt in explicitly."
            )
    emb = embedding_table(spark, sf_dir)
    a = emb.select(
        F.col("vec_id").alias("ia"),
        F.col("label").alias("la"),
        F.col("v64").alias("va"),
        F.col("nv").alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("ib"),
        F.col("label").alias("lb"),
        F.col("v64").alias("vb"),
        F.col("nv").alias("nb"),
    )
    scored = (
        a.crossJoin(b)
        .filter(F.col("ia") != F.col("ib"))
        .select(
            "ia",
            "la",
            "ib",
            "lb",
            F.expr(
                f"if(na * nb = 0, cast(null as bigint),"
                f" cast(round(({_DOT} / (na * nb)) * 1000000) as bigint))"
            ).alias(
                "cos_micro"
            ),
        )
    )
    w = Window.partitionBy("ia").orderBy(
        F.col("cos_micro").desc(), F.col("ib").asc()
    )
    knn = scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= KNN_K
    )
    rev = knn.select(
        F.col("ib").alias("ia"), F.col("ia").alias("ib")
    )
    mutual = knn.join(rev, ["ia", "ib"], "leftsemi").filter(
        F.col("ia") < F.col("ib")
    )
    return mutual.select(
        F.col("ia").alias("vec_a"),
        F.col("ib").alias("vec_b"),
        F.round(F.col("cos_micro") / 1e6, 6).alias("cosine_sim"),
        (F.col("la") == F.col("lb")).alias("same_label"),
    )


def mutual_knn_graph_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of :func:`mutual_knn_graph`: identical rank /
    mutual-semi-join / canonical-edge logic, but the pair source is the
    hyperplane-LSH bucket join instead of the corpus² cross join — each
    vector is ranked only against candidates sharing its sign bucket
    (1/2^NUM_PLANES of the corpus in expectation), so the scored-pair
    table is keyed-join-sized, never cartesian (pinned in
    tests/test_plan_quality.py).  Approximate by design: a true
    neighbor in another bucket is missed — the recall/cost dial is
    NUM_PLANES, exactly as in :func:`lsh_bucket_topk`.

    Determinism: buckets are the deterministic hyperplane sign bits
    (integer-hash coefficients, no RNG); ranking compares micro-quantized
    cosines with vec_id tie-break; the mutual check is an exact id-pair
    semi-join; each surviving edge emits once in (min, max) order.

    Scale shape: one equi-join on the bucket key (shuffle bounded by
    in-bucket candidate counts; a hot bucket caps exactly like the
    MinHash hot-bucket cap), rank window keyed on vec_id, semi-join on
    the reversed id pair.  Norms and buckets come precomputed off the
    shared persisted embedding table, so per-pair work is one fold.
    """
    from pyspark.sql import Window

    emb = embedding_table(spark, sf_dir)
    a = emb.select(
        F.col("vec_id").alias("ia"),
        F.col("label").alias("la"),
        F.col("v64").alias("va"),
        F.col("nv").alias("na"),
        F.col("bucket").alias("bucket_a"),
    )
    b = emb.select(
        F.col("vec_id").alias("ib"),
        F.col("label").alias("lb"),
        F.col("v64").alias("vb"),
        F.col("nv").alias("nb"),
        F.col("bucket").alias("bucket_b"),
    )
    scored = (
        a.join(b, F.col("bucket_a") == F.col("bucket_b"))
        .filter(F.col("ia") != F.col("ib"))
        .select(
            "ia",
            "la",
            "ib",
            "lb",
            F.expr(
                f"if(na * nb = 0, cast(null as bigint),"
                f" cast(round(({_DOT} / (na * nb)) * 1000000) as bigint))"
            ).alias(
                "cos_micro"
            ),
        )
    )
    w = Window.partitionBy("ia").orderBy(F.col("cos_micro").desc(), F.col("ib").asc())
    knn = scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= KNN_K)
    rev = knn.select(F.col("ib").alias("ia"), F.col("ia").alias("ib"))
    mutual = knn.join(rev, ["ia", "ib"], "leftsemi").filter(F.col("ia") < F.col("ib"))
    return mutual.select(
        F.col("ia").alias("vec_a"),
        F.col("ib").alias("vec_b"),
        F.round(F.col("cos_micro") / 1e6, 6).alias("cosine_sim"),
        (F.col("la") == F.col("lb")).alias("same_label"),
    )


def ivf_balance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-file health report: PRIMARY-assignment (probe_rank 1)
    cluster sizes with each list's share and imbalance factor
    (size · k / n, 1.0 = perfectly balanced) — the index diagnostic that
    decides re-training: a fat list makes its probes scan-heavy (the
    IVF analog of join skew), an empty list wastes a probe budget slot.

    Determinism: sizes are exact integers; share and imbalance are one
    rounded division each off exact counts.

    Scale shape: assignment is the shared broadcast-centroid pass; the
    report is one keyed count over |centroids| groups.
    """
    emb = embedding_table(spark, sf_dir)
    assigned = _with_centroid_assignment(emb).filter(F.col("probe_rank") == 1)
    sizes = assigned.groupBy("centroid_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors")
    )
    total = sizes.agg(
        F.sum("n_vectors").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    return sizes.crossJoin(F.broadcast(total)).select(
        "centroid_id",
        "n_vectors",
        F.round(F.expr("n_vectors / cast(n as double)"), 6).alias("share"),
        F.round(F.expr("n_vectors * k / cast(n as double)"), 6).alias(
            "imbalance"
        ),
    )


def label_centroid_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between CLUSTER CENTROIDS of the
    embedding corpus (by stored label) — the cluster-overlap monitor
    that says when two assigned clusters have collapsed onto the same
    direction (near-1 centroid cosine ⇒ merge candidates; the
    aggregate-grain companion of `cosine_near_dup_pairs`' per-vector
    reads and `ivf_balance_report`'s size-only view).

    Algorithm: centroid cosine equals the cosine of the per-label
    component SUM vectors (the 1/n factors cancel), so no mean is ever
    floated: components are micro-quantized per row, summed exactly per
    (label, dim), and the pairwise dot/norms are exact wide-integer
    folds with ONE double division at the surface.

    Scale shape: one posexplode to (label, dim) exact sums —
    |labels|×64 rows — then a broadcast-sized self-join over label
    pairs; the corpus is scanned once and never shuffled by vector.
    """
    comp = (
        read_table(spark, sf_dir, "embeddings")
        .select(
            "label",
            F.posexplode("embedding").alias("dim", "v"),
        )
        .select(
            "label",
            "dim",
            F.expr("cast(round(cast(v as double) * 1000000.0) as bigint)").alias(
                "vq"
            ),
        )
        .groupBy("label", "dim")
        .agg(F.sum("vq").cast("bigint").alias("s"))
    )
    sizes = (
        read_table(spark, sf_dir, "embeddings")
        .groupBy("label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"))
    )
    a = comp.select(
        F.col("label").alias("label_a"), "dim", F.col("s").alias("sa")
    )
    b = comp.select(
        F.col("label").alias("label_b"), "dim", F.col("s").alias("sb")
    )
    dots = (
        a.join(b, "dim")
        .where(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(F.expr("cast(sa as decimal(38,0)) * sb")).alias("dot")
        )
    )
    norms = comp.groupBy("label").agg(
        F.sum(F.expr("cast(s as decimal(38,0)) * s")).alias("n2")
    )
    na = norms.select(
        F.col("label").alias("label_a"), F.col("n2").alias("n2_a")
    )
    nb = norms.select(
        F.col("label").alias("label_b"), F.col("n2").alias("n2_b")
    )
    sa_ = sizes.select(
        F.col("label").alias("label_a"), F.col("n_vecs").alias("n_a")
    )
    sb_ = sizes.select(
        F.col("label").alias("label_b"), F.col("n_vecs").alias("n_b")
    )
    return (
        dots.join(F.broadcast(na), "label_a")
        .join(F.broadcast(nb), "label_b")
        .join(F.broadcast(sa_), "label_a")
        .join(F.broadcast(sb_), "label_b")
        .select(
            "label_a",
            "label_b",
            "n_a",
            "n_b",
            # a zero-norm centroid (a label whose components sum to the
            # zero vector — guaranteed once a degenerate corpus has a
            # zero-embedding singleton label) is an ANSI job killer, not
            # a NaN: exact-integer probe BEFORE the division, NULL out,
            # the shared-COSINE convention (seed-34 --degen audit)
            F.expr(
                "CASE WHEN n2_a = 0 OR n2_b = 0 THEN NULL"
                " ELSE round(cast(dot as double)"
                " / (sqrt(cast(n2_a as double))"
                " * sqrt(cast(n2_b as double))), 6) END"
            ).alias("centroid_cosine"),
        )
    )


def simplified_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette per trained k-means cluster: for every
    vector, a = distance to its OWN centroid and b = distance to the
    nearest OTHER centroid, s = (b − a)/max(a, b); reported as the
    per-cluster mean — the O(N·K) clustering-quality score (Hruschka et
    al. 2004) that replaces the O(N²) full silhouette at corpus scale,
    and the quality companion to `kmeans_centroids`' inertia and
    `ivf_balance_report`'s size skew (low mean silhouette ⇒ the cluster
    overlaps a neighbor ⇒ see `label_centroid_cosine`).

    Determinism: distances are fixed fold expressions over the shared
    prepared embeddings and the cached quantized centroids; each
    vector's s is micro-quantized BEFORE the per-cluster mean so the
    aggregate is exact integer arithmetic.

    Scale shape: assignment and the all-centroid distance pass are the
    same broadcast map passes as `_kmeans_assign` (K×DIM doubles
    broadcast; the corpus never shuffles by vector); the surface is a
    K-row rollup.
    """
    emb = embedding_table(spark, sf_dir)
    cent = kmeans_fit_cached(spark, sf_dir)
    own = _kmeans_assign(emb, cent).select("vec_id", "centroid_id")
    d2 = (
        "aggregate(zip_with(v64, cv, (x, y) -> (x - y) * (x - y)),"
        " cast(0 as double), (acc, v) -> acc + v)"
    )
    dists = (
        emb.select("vec_id", "v64")
        .join(F.broadcast(cent.select("centroid_id", "cv")))
        .select(
            "vec_id",
            F.col("centroid_id").alias("cid"),
            F.expr(f"sqrt({d2})").alias("d"),
        )
    )
    per_vec = (
        dists.join(own, "vec_id")
        .groupBy("vec_id", "centroid_id")
        .agg(
            F.max(F.expr("if(cid = centroid_id, d, null)")).alias("a"),
            F.min(F.expr("if(cid != centroid_id, d, null)")).alias("b"),
        )
        .select(
            "centroid_id",
            # a point coincident with both its own and the nearest
            # other centroid (a = b = 0) has silhouette 0 by convention,
            # not an ANSI 0/0 error (degenerate sweep, round 8)
            F.expr(
                "if(greatest(a, b) = 0, 0L,"
                " cast(round((b - a) / greatest(a, b) * 1000000.0)"
                " as bigint))"
            ).alias("s_micro"),
        )
    )
    return per_vec.groupBy("centroid_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        # mean of integer-micro silhouettes: round the scaled integer
        # division, not a fresh round(x, 6) — power-of-two cluster sizes
        # land Σmicro/n on exact .5 halves (seed-25 randomized audit)
        F.expr(
            "cast(round(cast(sum(s_micro) as double) / cast(count(*) as double))"
            " as bigint) / 1e6"
        ).alias("mean_silhouette"),
    )


def knn_hubness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness diagnostic of the LSH-bucketed kNN graph: the in-degree
    distribution (how many vectors' top-K lists each vector appears in).
    High-dimensional embedding spaces concentrate — a few "hub" vectors
    invade everyone's neighbor lists and poison kNN-based dedup /
    retrieval (Radovanović et al. 2010); this audit is the health check
    run beside the index (`ivf_balance_report` watches list sizes, this
    watches neighbor asymmetry — the thing `mutual_knn_graph`'s mutual
    filter exists to defeat).

    Determinism: the kNN lists are the exact micro-quantized-cosine /
    vec_id-tie-break ranking of :func:`mutual_knn_graph_lsh`; in-degrees
    and the distribution are exact integer counts (antihub vectors —
    in-degree 0 — are counted explicitly from the corpus total).

    Scale shape: the bucket equi-join bounds candidate pairs (never
    cartesian); in-degree is one keyed count over (≤ K·n) edge rows; the
    distribution is |distinct in-degrees| rows.
    """
    from pyspark.sql import Window

    emb = embedding_table(spark, sf_dir)
    a = emb.select(
        F.col("vec_id").alias("ia"),
        F.col("v64").alias("va"),
        F.col("nv").alias("na"),
        F.col("bucket").alias("bucket_a"),
    )
    b = emb.select(
        F.col("vec_id").alias("ib"),
        F.col("v64").alias("vb"),
        F.col("nv").alias("nb"),
        F.col("bucket").alias("bucket_b"),
    )
    scored = (
        a.join(b, F.col("bucket_a") == F.col("bucket_b"))
        .filter(F.col("ia") != F.col("ib"))
        .select(
            "ia",
            "ib",
            F.expr(
                f"if(na * nb = 0, cast(null as bigint),"
                f" cast(round(({_DOT} / (na * nb)) * 1000000) as bigint))"
            ).alias(
                "cos_micro"
            ),
        )
    )
    w = Window.partitionBy("ia").orderBy(F.col("cos_micro").desc(), F.col("ib").asc())
    knn = scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= KNN_K)
    indeg = knn.groupBy("ib").agg(F.count(F.lit(1)).cast("bigint").alias("in_degree"))
    dist = indeg.groupBy("in_degree").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors")
    )
    total = emb.agg(F.count(F.lit(1)).cast("bigint").alias("n_corpus"))
    linked = indeg.agg(F.count(F.lit(1)).cast("bigint").alias("n_linked"))
    zero = (
        total.join(F.broadcast(linked))
        .select(
            F.lit(0).cast("bigint").alias("in_degree"),
            (F.col("n_corpus") - F.col("n_linked")).alias("n_vectors"),
        )
        .filter(F.col("n_vectors") > 0)
    )
    return dist.unionByName(zero)


def cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External cluster-quality audit of the fitted k-means clustering
    against the ground-truth labels: per cluster, the majority label's
    share (purity) — the label-supervised complement of
    `simplified_silhouette` (geometry-only): silhouette says the
    clusters are tight, purity says they mean something.  The quality
    gate before `semantic_dedup`'s clusters are trusted to group
    same-topic documents.

    Determinism: assignment reads the session-cached quantized Lloyd
    centroids (the shared fit); majority is argmax count with label
    tie-break; purity is one division over exact counts.

    Scale shape: one broadcast-centroid assignment pass over the shared
    embedding table, a (cluster, label) keyed count, and an argmax
    window over |clusters|·|labels| rows.
    """
    from pyspark.sql import Window

    emb = embedding_table(spark, sf_dir)
    cent = kmeans_fit_cached(spark, sf_dir)
    assigned = _kmeans_assign(emb, cent).select("vec_id", "centroid_id")
    lab = assigned.join(emb.select("vec_id", "label"), "vec_id")
    counts = lab.groupBy("centroid_id", "label").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w = Window.partitionBy("centroid_id").orderBy(
        F.col("cnt").desc(), F.col("label").asc()
    )
    top = counts.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    sizes = counts.groupBy("centroid_id").agg(
        F.sum("cnt").cast("bigint").alias("n_vectors")
    )
    return (
        top.join(sizes, "centroid_id")
        .select(
            "centroid_id",
            "n_vectors",
            F.col("label").alias("majority_label"),
            F.col("cnt").alias("n_majority"),
            F.round(F.expr("cnt / cast(n_vectors as double)"), 6).alias("purity"),
        )
    )


IVF_SWEEP_PROBES = [1, 2, 4, 8]


def ivf_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall-vs-cost curve of the IVF index across query probe depths:
    for nprobe ∈ IVF_SWEEP_PROBES, the mean recall@BATCH_K (against the
    exact brute-force top-K) and the mean candidate count over the
    NUM_QUERIES query block — THE operating-point table an ANN deployment
    is tuned from (pick the smallest nprobe whose recall clears the
    product bar).  Generalizes `ann_recall_audit` (one operating point,
    hyperplane buckets) to the inverted-file family's dial.

    Determinism: centroids are the training-free seed vectors; every
    ranking orders by micro-exact dot/cosine with id tie-breaks; recall
    and candidate means are exact integer ratios, one division each.

    Scale shape: corpus→centroid assignment is the shared broadcast
    pass (single-assignment lists); per-(query, vector) candidacy
    carries the ONE matching probe rank, so the sweep explode costs
    |candidates|·|probes rows ≥ rank| — bounded by the deepest probe,
    not probes × corpus; all rankings window on (q_id, nprobe).
    """
    from pyspark.sql import Window

    emb = embedding_table(spark, sf_dir)
    corpus = _with_centroid_assignment(emb).filter(
        F.col("probe_rank") == 1
    ).select("vec_id", "v64", "nv", "centroid_id")
    seeds = emb.filter(F.col("vec_id") < NUM_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("v64").alias("cv")
    )
    q = emb.filter(F.col("vec_id") < NUM_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v64").alias("va"), F.col("nv").alias("na")
    )
    qdot = (
        "aggregate(zip_with(va, cv, (x, y) -> x * y),"
        " cast(0 as double), (acc, v) -> acc + v)"
    )
    wq = Window.partitionBy("q_id").orderBy(F.col("qd").desc(), F.col("centroid_id").asc())
    q_cent = (
        q.join(F.broadcast(seeds))
        .withColumn("qd", F.expr(qdot))
        .withColumn("rc", F.row_number().over(wq))
        .filter(F.col("rc") <= max(IVF_SWEEP_PROBES))
        .select("q_id", "va", "na", "centroid_id", "rc")
    )
    # exact yardstick: brute-force top-K per query
    wr = Window.partitionBy("q_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id").asc()
    )
    exact = (
        corpus.select("vec_id", F.col("v64").alias("vb"), F.col("nv").alias("nb"))
        .join(F.broadcast(q))
        .select("q_id", "vec_id", F.expr(COSINE).alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= BATCH_K)
        .select("q_id", "vec_id")
    )
    # each corpus vector matches a query under exactly ONE probe rank
    cand = corpus.select(
        "vec_id", F.col("v64").alias("vb"), F.col("nv").alias("nb"), "centroid_id"
    ).join(F.broadcast(q_cent), "centroid_id")
    probes = F.array(*[F.lit(p) for p in IVF_SWEEP_PROBES])
    swept = cand.select(
        "q_id",
        "vec_id",
        F.expr(COSINE).alias("cosine_sim"),
        F.explode(F.filter(probes, lambda p: p >= F.col("rc"))).alias("nprobe"),
    )
    wn = Window.partitionBy("q_id", "nprobe").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id").asc()
    )
    topk = (
        swept.withColumn("rank", F.row_number().over(wn))
        .filter(F.col("rank") <= BATCH_K)
        .select("q_id", "nprobe", "vec_id")
    )
    hits = (
        topk.join(F.broadcast(exact), ["q_id", "vec_id"])
        .groupBy("nprobe")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    )
    n_cand = swept.groupBy("nprobe").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates")
    )
    return (
        n_cand.join(hits, "nprobe", "left")
        .select(
            F.col("nprobe").cast("bigint").alias("nprobe"),
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            "n_candidates",
            F.round(
                F.coalesce("n_hits", F.lit(0))
                / F.lit(float(NUM_QUERIES * BATCH_K)),
                6,
            ).alias("mean_recall"),
            F.round(
                F.col("n_candidates") / F.lit(float(NUM_QUERIES)), 6
            ).alias("avg_candidates"),
        )
    )


def pq_distortion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-subspace health report of the PQ codebook: mean squared
    quantization error, distinct codewords actually used, and the top
    codeword's share — the index diagnostic that decides codebook
    re-training, exactly as `ivf_balance_report` does for the coarse
    quantizer: a subspace with one dominant codeword carries ~zero bits
    (its ADC column is near-constant), and a fat mean error means the
    subspace needs more codewords or a rotation.  Completes the PQ shelf
    (encode → search → recall audit → distortion audit).

    Determinism: winning codewords come from the exact (d, j) argmin
    struct ordering; per-row squared errors are deterministic folds,
    micro-quantized BEFORE the per-subspace sum; shares are exact-count
    ratios.

    Scale shape: encoding is the shared zero-shuffle broadcast-codebook
    pass; the audit folds to PQ_M·PQ_K usage cells and PQ_M error rows.
    """
    enc = _pq_codes(embedding_table(spark, sf_dir))
    win = enc.select(F.posexplode("mins").alias("s", "m")).select(
        "s",
        F.col("m.j").alias("j"),
        F.expr("cast(round(m.d * 1e6) as bigint)").alias("d_micro"),
    )
    usage = win.groupBy("s", "j").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    tops = usage.groupBy("s").agg(
        F.max("cnt").cast("bigint").alias("top_code_count"),
        F.count(F.lit(1)).cast("bigint").alias("n_codewords_used"),
        F.sum("cnt").cast("bigint").alias("n_vectors"),
    )
    err = win.groupBy("s").agg(F.sum("d_micro").cast("bigint").alias("sum_d_micro"))
    return tops.join(err, "s").select(
        F.col("s").cast("bigint").alias("subspace"),
        "n_vectors",
        "n_codewords_used",
        "top_code_count",
        F.round(F.expr("top_code_count / cast(n_vectors as double)"), 6).alias(
            "top_code_share"
        ),
        F.round(F.expr("sum_d_micro / 1e6 / n_vectors"), 6).alias("mean_sq_err"),
    )
