"""Training-corpus assembly: deterministic sampling/splitting and the
composed end-to-end retention pipeline (quality gate ∩ dedup ∩ split).

Sampling is CONTENT-HASH bucketing, not RNG: membership is a pure function
of the stable document id, so it needs no seed coordination across
executors, reproduces bit-for-bit across engines and reruns, survives
repartitioning, and newly-arriving data joins the sample at the same rate —
the only sampling idiom that stays consistent over a 100 TB corpus that is
continuously appended to.  Everything here is a per-row codegen'd
expression (zero shuffle) composed with the dedup chain's keyed anti-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table, spread
from .dedup import near_dup_keep
from .textops import text_stats

# 28-bit md5 prefix -> bucket in [0, 100): engine-portable (DuckDB hex cast
# reproduces conv() exactly), uniform enough for split assignment
BUCKET_EXPR = "cast(conv(substring(md5(cast(doc_id as string)), 1, 7), 16, 10) as bigint) % 100"

SAMPLE_PCT = 10  # in_sample: the 10% stratum used for eval/debug subsets
SPLIT_TRAIN, SPLIT_VAL = 80, 90  # bucket < 80 -> train, < 90 -> val, else test
QUALITY_MIN = 0.4  # text_stats.quality_score floor for corpus admission


def hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment + sample membership per
    document, as pure functions of md5(doc_id) (no RNG — see module doc)."""
    docs = read_table(spark, sf_dir, "documents")
    b = F.expr(BUCKET_EXPR)
    return docs.select(
        "doc_id",
        b.alias("bucket"),
        F.when(b < SPLIT_TRAIN, F.lit("train"))
        .when(b < SPLIT_VAL, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
        (b < SAMPLE_PCT).alias("in_sample"),
    )


# Target mixture: per-language acceptance percentage (a training-data
# recipe's source-mixing weights).  Languages not listed get the default.
MIX_RATES = {"en": 100, "es": 50, "de": 40, "fr": 30, "zh": 20}
MIX_DEFAULT = 25


def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture sampling: accept each document with its
    language's target rate, decided by the same content-hash bucket as
    :func:`hash_split` — no RNG, so the mixture is reproducible across
    engines/reruns and newly-arriving documents join their language's
    stratum at the target rate.  Per-row codegen'd expression, zero
    shuffle; the realized mixture converges to the recipe weights by the
    uniformity of the hash."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    b = F.expr(BUCKET_EXPR)
    rate = F.lit(MIX_DEFAULT)
    for lang, pct in MIX_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(pct)).otherwise(rate)
    return docs.select(
        "doc_id", "lang", b.alias("bucket"), (b < rate).alias("accepted")
    )


def corpus_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed end-to-end corpus assembly pipeline: a document survives
    iff it (1) passes the quality gate (text_stats.quality_score >=
    QUALITY_MIN), (2) survives exact + near dedup (near_dup_keep), and it
    carries its (3) deterministic split assignment.  At scale this is the
    shape of a real pre-training data job: per-row scoring and splitting
    compose with the shared signature table and keyed semi/anti joins —
    document bodies still never shuffle."""
    kept = near_dup_keep(spark, sf_dir)
    good = (
        text_stats(spark, sf_dir)
        .filter(F.col("quality_score") >= QUALITY_MIN)
        .select("doc_id")
    )
    return kept.join(good, "doc_id", "left_semi").join(
        hash_split(spark, sf_dir).select("doc_id", "split"), "doc_id"
    )


PER_SOURCE_CAP = 10  # max documents kept per source (per-domain cap)


def per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (the per-domain cap of web-corpus assembly:
    no single site/source may dominate the mixture): keep at most
    PER_SOURCE_CAP documents per source, chosen by deterministic
    content-hash rank — no RNG, so the kept set is reproducible and stable
    under appends (a new document displaces the previous rank-boundary doc
    only if its hash ranks earlier, never reshuffling the whole stratum).

    Scale shape: one shuffle on source (bounded cardinality) + a top-k
    window; ties cannot occur (md5 of distinct doc_ids collide only if md5
    collides; doc_id breaks even that).
    """
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("hash_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("hash_rank") <= PER_SOURCE_CAP)
        .select("doc_id", "source", "hash_rank")
    )


def corpus_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) corpus health rollup: doc/token counts, quality
    pass rate inputs, exact-dup counts, mean quality — the monitoring
    query a corpus-assembly pipeline runs per ingest cycle.

    Scale shape: per-row scoring composes with one (text_hash, id)-pair
    shuffle for the dup flag and one bounded-cardinality groupBy on
    (source, lang); map-side partial aggregation folds each partition to
    at most |sources|·|langs| cells before the exchange.
    """
    from .dedup import exact_dedup
    from .textops import TOKS, text_stats

    docs = (
        read_table(spark, sf_dir, "documents")
        .withColumn("n_tokens", F.size(F.expr(TOKS)))
        .withColumn("text_hash", F.md5("text"))
    )
    quality = text_stats(spark, sf_dir).select("doc_id", "quality_score")
    canon = exact_dedup(spark, sf_dir).select("text_hash", "canonical_doc_id")
    return (
        docs.join(quality, "doc_id")
        .join(canon, "text_hash")
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum(F.when(F.col("quality_score") >= QUALITY_MIN, 1).otherwise(0))
            .cast("bigint")
            .alias("n_quality_pass"),
            F.sum(F.when(F.col("doc_id") != F.col("canonical_doc_id"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_exact_dups"),
            # decimal-exact sum, cast to double AFTER (the rewards_5d
            # pattern): a rounded double MEAN of 4dp scores lands on the
            # x.xxxx5 half-boundary constantly and the engines' rounding
            # of the binary double disagrees there
            F.sum(F.col("quality_score").cast("decimal(8,4)"))
            .cast("double")
            .alias("sum_quality"),
        )
    )


def corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed manifest of the assembled corpus (the version
    stamp a reproducible data pipeline publishes per release): kept-doc
    count, total tokens, and an ORDER-INDEPENDENT corpus hash — the XOR
    of each kept doc's md5-derived 60-bit integer.  XOR is associative,
    commutative, and overflow-free, so the hash combines map-side under
    any partitioning and merges across appends (a SUM of 60-bit values
    would overflow int64 — which Spark wraps and DuckDB silently promotes
    to HUGEINT, diverging).  Two corpora match iff their kept doc-id sets
    match (up to the 60-bit collision bound; ids are unique so XOR's
    even-multiplicity blindness is moot).
    """
    from .textops import TOKS

    kept = corpus_retention(spark, sf_dir).select("doc_id")
    docs = read_table(spark, sf_dir, "documents").join(kept, "doc_id", "left_semi")
    h = "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint)"
    return docs.select(
        "doc_id",
        F.expr(h).alias("h"),
        F.size(F.expr(TOKS)).alias("nt"),
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nt").cast("bigint").alias("total_tokens"),
        F.expr("bit_xor(h)").cast("bigint").alias("corpus_hash"),
    )


def split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-leakage audit: content hashes whose byte-identical copies
    landed in MORE THAN ONE of train/val/test — the contamination the
    doc_id-keyed split cannot see (copies have different ids, so they
    split independently; any eval doc with a training twin is leaked).
    Returns one row per leaking hash with the canonical doc and the
    distinct splits it reached.

    Scale shape: one (text_hash, split) pair shuffle with map-side
    distinct, then a groupBy on hash — bodies never shuffle; the result
    is bounded by the duplicate count, not the corpus.
    """
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("text_hash")
    )
    with_split = docs.join(
        hash_split(spark, sf_dir).select("doc_id", "split"), "doc_id"
    )
    return (
        with_split.groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.sort_array(F.collect_set("split")).alias("splits"),
        )
        .filter(F.size("splits") >= 2)
        .select(
            "text_hash",
            "canonical_doc_id",
            "n_copies",
            F.array_join("splits", ",").alias("splits"),
        )
    )


def mixture_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture calibration report: per language, the documents seen,
    accepted count, realized acceptance rate, and the recipe's target
    rate — the monitoring view that tells you whether the hash-bucket
    acceptance is tracking the recipe (it converges by hash uniformity;
    drift means skewed ids, not randomness).

    One bounded-cardinality combiner-folded groupBy over the
    mixture_sample output."""
    rates = F.lit(MIX_DEFAULT)
    for lang, pct in MIX_RATES.items():
        rates = F.when(F.col("lang") == lang, F.lit(pct)).otherwise(rates)
    return (
        mixture_sample(spark, sf_dir)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("accepted"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_accepted"),
        )
        .select(
            "lang",
            "n_docs",
            "n_accepted",
            F.round(F.col("n_accepted") / F.col("n_docs") * 100, 4).alias("realized_pct"),
            rates.cast("bigint").alias("target_pct"),
        )
    )


# Overlapping token-window chunking: window of CHUNK_TOKS tokens advancing
# CHUNK_STRIDE at a time (16-token overlap) — the standard RAG/training
# chunking geometry.  A chunk starts at every stride boundary < n_toks, so
# every token lands in >= 1 chunk and the tail chunk may run short.
CHUNK_TOKS = 64
CHUNK_STRIDE = 48


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into overlapping token-window chunks with
    (tok_start, tok_end) offsets — the chunking pass a retrieval or
    packing pipeline runs between cleaning and embedding.

    Scale shape: tokenize + sequence + posexplode are all per-row codegen
    (zero shuffle); output rows ≈ n_tokens / CHUNK_STRIDE per doc.  The
    chunk text is re-joined from the token slice, so chunk boundaries are
    exact token offsets, not byte guesses — what a tokenizer-aligned
    packing stage needs downstream (see pack_sequences).
    """
    from .textops import TOKS

    docs = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .withColumn("t", F.expr(TOKS))
        .withColumn("n", F.size("t"))
        .filter(F.col("n") > 0)
    )
    s, c = CHUNK_STRIDE, CHUNK_TOKS
    return (
        docs.select(
            "doc_id",
            "t",
            "n",
            F.posexplode(F.expr(f"sequence(0, cast((n + {s} - 1) div {s} as int) - 1)")
                         ).alias("chunk_idx", "_i"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            (F.col("_i") * s).cast("bigint").alias("tok_start"),
            F.least(F.col("_i") * s + c, F.col("n")).cast("bigint").alias("tok_end"),
            F.array_join(F.expr(f"slice(t, _i * {s} + 1, {c})"), " ").alias("chunk_text"),
        )
    )


# Temperature-scaled source mixing (the multilingual-corpus reweighting
# idiom: raising low-resource sources toward a flatter mixture).  T = 0.5
# exactly so the weight is sqrt(n) — an IEEE-exact operation, unlike a
# general pow(), so the oracle reproduces it bit-for-bit.  Weights are
# snapped to integer-valued doubles (floor(sqrt(n)*1e6 + 0.5)) before
# summation: integer-valued doubles sum exactly in ANY order, so the
# normalization is immune to aggregation-order nondeterminism on both
# engines.
MIX_TEMP_SCALE = 1_000_000
TEMP_BUCKETS = 10_000
TEMP_BUCKET_EXPR = (
    "cast(conv(substring(md5(cast(doc_id as string)), 9, 7), 16, 10) as bigint)"
    f" % {TEMP_BUCKETS}"
)


def temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source temperature mixture plan + realized acceptance: target
    share ∝ sqrt(n_source) (temperature 0.5), budget set so the limiting
    source is fully consumed (max acceptance rate = 1), membership decided
    by the same deterministic content-hash bucketing as every sampler here
    (module doc) — no RNG, append-stable, engine-reproducible.

    Scale shape: the source dimension is tiny (a groupBy that collapses to
    |sources| rows), the plan columns are computed on that dim via an
    unpartitioned window over |sources| rows (NOT over the corpus), and
    acceptance is a broadcast join back + one combiner-folded count.
    Document bodies never shuffle.
    """
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    w_all = Window.partitionBy()
    plan = (
        counts.withColumn(
            "w", F.floor(F.sqrt("n_docs") * MIX_TEMP_SCALE + 0.5).cast("double")
        )
        .withColumn("target_share", F.col("w") / F.sum("w").over(w_all))
        .withColumn("budget", F.min(F.col("n_docs") / F.col("target_share")).over(w_all))
        .withColumn("accept_rate", F.col("budget") * F.col("target_share") / F.col("n_docs"))
    )
    accepted = (
        docs.join(F.broadcast(plan.select("source", "accept_rate")), "source")
        .filter(F.expr(TEMP_BUCKET_EXPR) < F.col("accept_rate") * TEMP_BUCKETS)
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_accepted"))
    )
    return (
        plan.join(accepted, "source", "left")
        .select(
            "source",
            "n_docs",
            F.round("target_share", 6).alias("target_share"),
            F.round("accept_rate", 6).alias("accept_rate"),
            F.coalesce("n_accepted", F.lit(0)).cast("bigint").alias("n_accepted"),
        )
    )


def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup attrition rollup per source: how many documents each source
    loses to exact dedup and to near-dup removal, and what fraction
    survives — the per-provider data-quality scorecard a corpus curation
    run reports (a source with an outlier dup rate is a crawler bug or a
    mirror).

    Scale shape: pure composition — the canonical-id and kept-id sets come
    from the shared dedup chain (keyed id sets, no body shuffle); the
    rollup is two membership left-joins on doc_id and one combiner-folded
    groupBy collapsing to |sources| rows.
    """
    from .dedup import exact_dedup

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    canon = (
        exact_dedup(spark, sf_dir)
        .select(F.col("canonical_doc_id").alias("doc_id"))
        .withColumn("is_canon", F.lit(1))
    )
    kept = near_dup_keep(spark, sf_dir).withColumn("is_kept", F.lit(1))
    return (
        docs.join(canon, "doc_id", "left")
        .join(kept, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("is_canon").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_exact_copies"),
            F.sum(
                F.when(F.col("is_canon").isNotNull() & F.col("is_kept").isNull(), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_near_dropped"),
            F.sum(F.when(F.col("is_kept").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
        )
        .select(
            "source",
            "n_docs",
            "n_exact_copies",
            "n_near_dropped",
            "n_kept",
            F.round(F.col("n_kept") / F.col("n_docs"), 6).alias("keep_rate"),
        )
    )


# stratified split: rank-exact quotas within each (source, lang) stratum.
# RANK_BUCKETS sub-buckets per stratum bound every window partition at
# ~|stratum|/256 rows — the bucket-carry two-level rank (same pattern as
# balance_deciles / temporal's as-of join), so no unbounded partition
# window exists even when one stratum is billions of rows.
RANK_BUCKETS = 256
STRATUM_HASH = "md5(cast(doc_id as string))"
STRATUM_BUCKET = f"cast(conv(substring({STRATUM_HASH}, 1, 2), 16, 10) as bigint)"


def stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota stratified train/val/test split: within every
    (source, lang) stratum, documents are ranked in a deterministic
    pseudo-random order (md5 of the id, then id) and the first 80% of the
    stratum — exactly, by rank arithmetic, not in hash expectation — goes
    to train, the next 10% to val, the rest to test.  The per-stratum
    guarantee is what :func:`hash_split` (global, rate-in-expectation)
    cannot give: a 50-doc low-resource language still lands 40/5/5.

    Scale shape: the global per-stratum rank is reconstructed two-level —
    row_number inside (stratum, hash-bucket) partitions of ~1/256 of the
    stratum each, plus a carry of preceding-bucket counts computed on the
    tiny (strata × 256)-row rollup and broadcast back.  Split assignment
    is exact integer arithmetic (rank·100 vs quota·n) — no doubles, no
    ties, engine-identical.
    """
    from pyspark.sql import Window

    docs = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "lang")
        .withColumn("h", F.expr(STRATUM_HASH))
        .withColumn("rb", F.expr(STRATUM_BUCKET) % RANK_BUCKETS)
    )
    w_local = Window.partitionBy("source", "lang", "rb").orderBy("h", "doc_id")
    local = docs.withColumn("local_rank", F.row_number().over(w_local))
    rollup = docs.groupBy("source", "lang", "rb").agg(
        F.count(F.lit(1)).alias("n_bucket")
    )
    w_carry = (
        Window.partitionBy("source", "lang")
        .orderBy("rb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy("source", "lang")
    carry = rollup.select(
        "source",
        "lang",
        "rb",
        F.coalesce(F.sum("n_bucket").over(w_carry), F.lit(0)).alias("carry"),
        F.sum("n_bucket").over(w_tot).alias("n_stratum"),
    )
    return (
        local.join(F.broadcast(carry), ["source", "lang", "rb"])
        .withColumn("stratum_rank", (F.col("carry") + F.col("local_rank")).cast("bigint"))
        .select(
            "doc_id",
            "source",
            "lang",
            "stratum_rank",
            F.col("n_stratum").cast("bigint").alias("n_stratum"),
            F.when(
                F.col("stratum_rank") * 100 <= F.col("n_stratum") * SPLIT_TRAIN,
                F.lit("train"),
            )
            .when(
                F.col("stratum_rank") * 100 <= F.col("n_stratum") * SPLIT_VAL,
                F.lit("val"),
            )
            .otherwise(F.lit("test"))
            .alias("split"),
        )
    )


SHUFFLE_EPOCHS = 2
SHUFFLE_SHARDS = 8


def epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch training order: every epoch reshuffles the
    corpus into SHUFFLE_SHARDS shards with a fresh within-shard order,
    keyed entirely by md5(epoch|doc_id) — reproducible across reruns and
    engines with no RNG state, the property a resumable 100 TB training
    run needs (restart epoch 7, get epoch 7's exact order back).

    Scale shape: shard assignment is a pure per-row expression; the only
    shuffle is the per-(epoch, shard) rank window — 1/SHUFFLE_SHARDS of
    an epoch per task, never a global sort.  Shards map 1:1 to loader
    workers, which is exactly how distributed trainers consume data, so
    the "no global order" limitation is the deployment shape, not a
    compromise.
    """
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    epochs = spark.range(SHUFFLE_EPOCHS).select(F.col("id").cast("int").alias("epoch"))
    keyed = docs.crossJoin(F.broadcast(epochs)).withColumn(
        "k", F.md5(F.concat_ws("|", F.col("epoch"), F.col("doc_id")))
    )
    shard = F.expr(
        f"cast(conv(substring(k, 1, 4), 16, 10) as bigint) % {SHUFFLE_SHARDS}"
    )
    w = Window.partitionBy("epoch", "shard").orderBy("k")
    return (
        keyed.withColumn("shard", shard.cast("int"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select("epoch", "shard", "pos", "doc_id")
    )


# T5-style span corruption: disjoint 6-token blocks; a selected block
# masks its first 3 tokens.  Selection probability 0.3 => ~15% of tokens
# masked, the T5 default rate, with zero overlap bookkeeping because the
# blocks are disjoint by construction.
CORRUPT_BLOCK = 6
CORRUPT_MASK = 3
CORRUPT_SEL_PCT = 30  # % of blocks selected (md5 threshold)


def span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Masked-span corruption (the T5/UL2 denoising objective's data
    stage): per document, deterministically mask ~15% of tokens in
    3-token spans and emit the (input, target) pair — input with each
    span replaced by its sentinel, target with sentinel-prefixed span
    contents, exactly the seq2seq example format.

    Determinism without an RNG: token positions partition into disjoint
    CORRUPT_BLOCK-token blocks; block b of doc d is selected iff the
    16-bit md5(d|b) prefix clears a threshold — reproducible across
    engines/epochs, and disjoint blocks mean span overlap (the fold
    problem BPE's merge needed the run-parity trick for) cannot arise.

    Scale shape: tokens explode to (doc, position) rows once, join their
    block's selection row, and fold back with one grouped sort — a
    token-stream-sized keyed shuffle, the same class as segment_dedup;
    sentinel numbering is a per-doc rank window over selected blocks
    (bounded by doc length / block).
    """
    from pyspark.sql import Window

    from .textops import TOKS

    docs = (
        spread(read_table(spark, sf_dir, "documents"))
        .withColumn("t", F.expr(TOKS))
        .select("doc_id", "t")
    )
    toks = docs.select(
        "doc_id",
        F.posexplode("t").alias("i0", "tok"),
    ).withColumn("bk", F.expr(f"i0 div {CORRUPT_BLOCK}"))
    sel = (
        toks.select("doc_id", "bk")
        .distinct()
        .filter(
            F.expr(
                "cast(conv(substring(md5(concat_ws('|', doc_id, bk)), 1, 4),"
                f" 16, 10) as bigint) % 100 < {CORRUPT_SEL_PCT}"
            )
        )
        .withColumn(
            "k",
            F.row_number()
            .over(Window.partitionBy("doc_id").orderBy("bk"))
            - 1,
        )
    )
    j = toks.join(sel, ["doc_id", "bk"], "left").withColumn(
        "masked", F.col("k").isNotNull() & (F.expr(f"i0 % {CORRUPT_BLOCK}") < CORRUPT_MASK)
    )
    sentinel = F.concat(F.lit("<extra_id_"), F.col("k").cast("string"), F.lit(">"))
    in_piece = (
        F.when(F.col("masked") & (F.expr(f"i0 % {CORRUPT_BLOCK}") == 0), sentinel)
        .when(~F.col("masked"), F.col("tok"))
    )
    tg_piece = (
        F.when(
            F.col("masked") & (F.expr(f"i0 % {CORRUPT_BLOCK}") == 0),
            F.concat(sentinel, F.lit(" "), F.col("tok")),
        )
        .when(F.col("masked"), F.col("tok"))
    )
    pieces = j.select(
        "doc_id", "i0", "masked", in_piece.alias("ip"), tg_piece.alias("tp")
    )
    agg = pieces.groupBy("doc_id").agg(
        F.expr(
            "array_join(transform(sort_array(collect_list("
            "IF(ip IS NULL, NULL, struct(i0, ip)))), x -> x.ip), ' ')"
        ).alias("input_text"),
        F.expr(
            "array_join(transform(sort_array(collect_list("
            "IF(tp IS NULL, NULL, struct(i0, tp)))), x -> x.tp), ' ')"
        ).alias("target_text"),
        F.sum(F.col("masked").cast("bigint")).alias("n_masked"),
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
    )
    return docs.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("input_text", F.lit("")).alias("input_text"),
        F.coalesce("target_text", F.lit("")).alias("target_text"),
        F.coalesce("n_masked", F.lit(0)).cast("bigint").alias("n_masked"),
        F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
    )


# weighted sampling: per-source keep budget and the md5-derived uniform
# (first 8 hex chars -> (0,1), +1 so u is never exactly 0 and ln(u) is
# finite) feeding the exponential sort key
WS_PER_SOURCE_K = 50
WS_U_EXPR = (
    "(cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as double)"
    " + 1.0) / 4294967297.0"
)


def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, per source: keep the
    WS_PER_SOURCE_K documents with the smallest exponential sort key
    ``-ln(u)/w`` — the Efraimidis-Spirakis (A-ES) one-pass reservoir
    order statistic, which draws each subset with probability
    proportional to its weights without ever materializing cumulative
    weight sums.  The weight is a quality proxy (log document length);
    the uniform ``u`` is md5-derived, NOT an RNG — the same
    content-hash determinism as every sampler in this module (module
    doc), so the sample is reproducible across engines/reruns and
    append-stable: a newly arriving document competes under the same
    key function without re-drawing anyone else's key.

    Scale shape: the key is a per-row codegen'd expression; selection
    is one row_number window partitioned by source (a single keyed
    shuffle of (source, key) — top-K per group, never a global sort).
    At 100 TB the window input can be pre-pruned with an approximate
    per-source key cutoff, turning the shuffle into O(K·sources).
    """
    from pyspark.sql import Window

    # Zero-weight docs (n_chars = 0, w = ln(1) = 0) would get sample_key
    # = -ln(u)/0 = +Inf and backfill undersized sources; A-ES semantics
    # give them zero selection probability, so exclude them up front.
    docs = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "n_chars")
        .filter(F.col("n_chars") > 0)
    )
    keyed = docs.withColumn("w", F.expr("ln(1.0 + n_chars)")).withColumn(
        "sample_key", F.expr(f"-ln({WS_U_EXPR}) / ln(1.0 + n_chars)")
    )
    win = Window.partitionBy("source").orderBy(
        F.col("sample_key").asc(), F.col("doc_id").asc()
    )
    return (
        keyed.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= WS_PER_SOURCE_K)
        .select(
            "source",
            "doc_id",
            F.round("w", 6).alias("weight"),
            F.round("sample_key", 6).alias("sample_key"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def curated_corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-4 capstone composition — what actually ships to
    training: documents that survive the full curation chain (quality
    gate ∩ exact+near dedup ∩ split assignment, via
    :func:`corpus_retention`) AND the DSIR importance-resample
    (`dsir_resample` top-N), rolled up per split with token budget and
    mean quality/importance — the one-page manifest a training run is
    provisioned from.

    Determinism: the intersection is a keyed semi-join of id sets; the
    means floor-quantize exact integer sums (quality at 4dp-exact milli,
    DSIR log-weight at 6dp-exact micro) before one division each.

    Scale shape: pure composition of the shared chains — signature
    table, DSIR distribution tables, split hashing; only ids and
    per-doc scalars move; rollup is |splits| rows.
    """
    from ..operators.textops import dsir_resample, text_stats

    kept = corpus_retention(spark, sf_dir).select("doc_id", "split")
    chosen = dsir_resample(spark, sf_dir).select(
        "doc_id", F.expr("cast(round(log_weight * 1000000) as bigint)").alias("lw")
    )
    stats = text_stats(spark, sf_dir).select(
        "doc_id",
        "n_tokens",
        F.expr("cast(round(quality_score * 10000) as bigint)").alias("q"),
    )
    return (
        kept.join(chosen, "doc_id")
        .join(stats, "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.expr(
                "round(cast(floor(sum(q) / cast(count(*) as double)) as bigint)"
                " / 1e4, 6)"
            ).alias("mean_quality"),
            F.expr(
                "round(cast(floor(sum(lw) / cast(count(*) as double)) as bigint)"
                " / 1e6, 6)"
            ).alias("mean_log_weight"),
        )
    )


NEYMAN_BUDGET = 1000


def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation over event types:
    split a NEYMAN_BUDGET-row sample budget ∝ N_h·σ_h (stratum size ×
    value standard deviation) — the design that minimizes the variance
    of the estimated mean for a fixed budget (Neyman 1934), i.e. the
    principled answer to "how many rows should each stratum contribute"
    that proportional allocation gets wrong when strata differ in
    spread.  Fractional seats resolve by the LARGEST-REMAINDER method,
    so the allocations are integers that sum exactly to the budget.

    Determinism: population variances come from exact DECIMAL(38,0)
    cent-square sums (the `price_elasticity` overflow discipline); σ is
    micro-quantized ONCE per stratum; every allocation step after that
    is integer arithmetic — base = (B·w_h) div W, remainders ranked
    exactly with a stratum-name tie-break.

    Scale shape: one keyed moment aggregation (map-side combined), then
    window ranking over |strata| rows.
    """
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events").select(
        "event_type", F.expr("cast(floor(value * 100) as bigint)").alias("cents")
    )
    mom = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h"),
        F.sum("cents").alias("s1"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias("s2"),
    )
    # population variance = (n·Σx² − (Σx)²) / n²; σ micro-quantized once
    sig = mom.select(
        "event_type",
        "n_h",
        F.expr(
            "cast(round(sqrt(cast(n_h * s2 - cast(s1 as decimal(38,0)) * s1"
            " as double)) / n_h * 1000000) as bigint)"
        ).alias("sigma_micro"),
    ).withColumn("w", F.expr("n_h * sigma_micro"))
    tot = sig.agg(F.sum("w").alias("w_tot"))
    alloc = (
        sig.crossJoin(F.broadcast(tot))
        .withColumn("base", F.expr(f"({NEYMAN_BUDGET}L * w) div w_tot"))
        .withColumn("rem", F.expr(f"({NEYMAN_BUDGET}L * w) % w_tot"))
    )
    w_rank = Window.orderBy(F.col("rem").desc(), F.col("event_type").asc())
    leftover = alloc.agg(
        (F.lit(NEYMAN_BUDGET) - F.sum("base")).alias("extra")
    )
    return (
        alloc.withColumn("rk", F.row_number().over(w_rank))
        .crossJoin(F.broadcast(leftover))
        .select(
            "event_type",
            "n_h",
            F.round(F.expr("sigma_micro / 1e6"), 6).alias("sigma"),
            F.expr("base + if(rk <= extra, 1L, 0L)").cast("bigint").alias(
                "n_allocated"
            ),
        )
    )


# perplexity-band pruning: drop the lowest (boilerplate) and highest
# (noise) cross-entropy percentiles, per source
PPL_LO_PCT, PPL_HI_PCT = 10, 90


def perplexity_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-band pruning (the CCNet/Gopher recipe): score every
    document with the corpus bigram cross-entropy
    (`bigram_cross_entropy`), then keep only the per-SOURCE middle band
    [p10, p90] — the low tail is template/boilerplate (reads too much
    like the corpus), the high tail is noise (reads like nothing).
    Banding per source keeps one domain's register from eating
    another's budget.  Output: per-source retention report with the
    band boundaries — the audit a curation run publishes.

    Determinism: cross-entropy scores are already exact-micro folds;
    band boundaries are exact rank positions ((n−1)·p) div 100 on
    (score, doc_id)-ordered rows, so the cut is an integer rank
    comparison, never a float percentile.

    Scale shape: scoring is the shared cross-entropy pass; banding is
    one per-source rank window over (score, doc_id) pairs; the report
    is |sources| rows.
    """
    from pyspark.sql import Window

    from .textops import bigram_cross_entropy

    scored = (
        bigram_cross_entropy(spark, sf_dir)
        .select("doc_id", "cross_entropy_bits")
        .join(
            read_table(spark, sf_dir, "documents").select("doc_id", "source"),
            "doc_id",
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.col("cross_entropy_bits").asc(), F.col("doc_id").asc()
    )
    ranked = scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
    n = ranked.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    banded = ranked.join(F.broadcast(n), "source").withColumn(
        "kept",
        F.expr(
            f"rk - 1 >= ((n - 1) * {PPL_LO_PCT}) div 100"
            f" AND rk - 1 <= ((n - 1) * {PPL_HI_PCT}) div 100"
        ),
    )
    return banded.groupBy("source").agg(
        F.max("n").alias("n_docs"),
        F.sum(F.expr("if(kept, 1L, 0L)")).cast("bigint").alias("n_kept"),
        F.round(
            F.expr("sum(if(kept, 1, 0)) / cast(max(n) as double)"), 6
        ).alias("retention"),
        F.min(F.expr("if(kept, cross_entropy_bits, null)")).alias("band_lo_bits"),
        F.max(F.expr("if(kept, cross_entropy_bits, null)")).alias("band_hi_bits"),
    )


BATCH_SIZE = 32
LEN_BUCKETS = 8


def length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed dynamic batching audit (the SortishSampler /
    bucket-by-sequence-length trick): assign documents to LEN_BUCKETS
    per-corpus length-quantile buckets, form BATCH_SIZE-doc batches
    INSIDE each bucket (deterministic doc_id order), and report each
    bucket's padding waste — pad tokens = Σ(batch_max − len) — next to
    the waste the same batches would suffer under naive corpus-order
    batching.  This is the measured argument for length bucketing: the
    padding fraction a trainer pays is the gap between the two.

    Determinism: bucket boundaries are exact integer rank cuts
    (the `perplexity_prune` discipline); batch membership and maxima
    are integer arithmetic over (bucket, doc_id) order.

    Scale shape: one rank window over (n_tokens, doc_id), one keyed
    (bucket, batch) max/sum, one |buckets| rollup — never a global
    sort of the corpus (ranks come from the same two-pass prefix
    machinery as every rank cut here).
    """
    from pyspark.sql import Window

    from .textops import TOKS

    docs = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", F.expr(f"size({TOKS})").cast("bigint").alias("len"))
    )
    n_tot = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ranked = (
        docs.crossJoin(F.broadcast(n_tot))
        .withColumn(
            "rk",
            F.row_number()
            .over(Window.orderBy(F.col("len").asc(), F.col("doc_id").asc()))
            .cast("bigint"),
        )
        .withColumn(
            "bucket", F.expr(f"least({LEN_BUCKETS - 1}L, ((rk - 1) * {LEN_BUCKETS}) div n)")
        )
    )
    batched = ranked.withColumn(
        "batch", F.expr(f"(row_number() over (partition by bucket order by doc_id) - 1) div {BATCH_SIZE}")
    )
    per_batch = batched.groupBy("bucket", "batch").agg(
        F.max("len").alias("bmax"),
        F.sum("len").alias("btok"),
        F.count(F.lit(1)).cast("bigint").alias("bn"),
    )
    # naive baseline: batches formed in plain doc_id order across the corpus
    naive = (
        docs.withColumn(
            "batch",
            F.expr(
                f"(row_number() over (order by doc_id) - 1) div {BATCH_SIZE}"
            ),
        )
        .groupBy("batch")
        .agg(
            F.max("len").alias("bmax"),
            F.sum("len").alias("btok"),
            F.count(F.lit(1)).cast("bigint").alias("bn"),
        )
        .agg(
            F.sum(F.expr("bmax * bn - btok")).cast("bigint").alias("naive_pad")
        )
    )
    return (
        per_batch.groupBy("bucket")
        .agg(
            F.sum("bn").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_batches"),
            F.sum(F.expr("bmax * bn - btok")).cast("bigint").alias("pad_tokens"),
            F.sum("btok").cast("bigint").alias("real_tokens"),
        )
        .crossJoin(F.broadcast(naive))
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            "n_docs",
            "n_batches",
            "pad_tokens",
            # a bucket of all-empty docs has zero padded AND real tokens:
            # NULL, not an ANSI division error (degenerate sweep, round 8)
            F.expr(
                "if(pad_tokens + real_tokens = 0, cast(null as double),"
                " round(pad_tokens / cast(pad_tokens + real_tokens as double), 6))"
            ).alias("pad_frac"),
            "naive_pad",
        )
    )


TSP_BATCH_SIZES = (32, 128, 512)


def training_step_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steps-per-epoch planning per split × global batch size — the
    arithmetic a training launcher runs over the packed corpus before
    provisioning: packed SEQ_LEN sequences per split (contiguous
    stream packing, so n_seqs = ⌈Σtokens / SEQ_LEN⌉ — the
    pack_sequences invariant), steps = n_seqs div B with drop_last,
    and the residual sequences (and token fraction) dropped.

    Exact integer arithmetic throughout (ceil as (t + L − 1) div L,
    positive operands); the dropped-token share is the only double.

    Scale shape: per-doc token counts (codegen'd), one split-keyed
    rollup, 3-row literal batch grid.
    """
    from .textops import TOKS

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.expr(BUCKET_EXPR).alias("b"),
    )
    split = docs.select(
        F.when(F.col("b") < SPLIT_TRAIN, F.lit("train"))
        .when(F.col("b") < SPLIT_VAL, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
        F.expr(f"cast(size({TOKS}) as bigint)").alias("n_tokens"),
    )
    per = split.groupBy("split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("tokens"),
    )
    from .temporal import SEQ_LEN

    grid = per.select(
        "split",
        "n_docs",
        "tokens",
        F.expr(f"(tokens + {SEQ_LEN - 1}) div {SEQ_LEN}").alias("n_seqs"),
        F.explode(
            F.array(*[F.lit(int(b)) for b in TSP_BATCH_SIZES])
        ).alias("batch_size"),
    )
    return grid.select(
        "split",
        "batch_size",
        "n_docs",
        "tokens",
        "n_seqs",
        F.expr("n_seqs div batch_size").alias("steps_per_epoch"),
        F.expr("n_seqs % batch_size").alias("seqs_dropped"),
        F.round(
            F.expr(
                "cast(n_seqs % batch_size as double)"
                " / cast(n_seqs as double)"
            ),
            6,
        ).alias("drop_fraction"),
    )


WF_BUDGET_DEN = 2  # budget = total available tokens div 2
WF_ROUNDS = 20  # >= max saturation waves (= |sources| worst case)


def token_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling allocation of a global token budget across sources:
    every unsaturated source gets an equal share of the remaining
    budget each round, capped at its availability; freed budget
    redistributes to the still-unsaturated sources next round — the
    max-min fair allocation (classic water-filling) that a mixture
    planner runs AFTER `per_source_cap` decides availability and BEFORE
    `mixture_sample` draws: small sources are fully taken, large
    sources split the remainder equally.

    Determinism: availability is exact integer tokens (n_chars div 4
    proxy, the repo-wide convention); each round's share is a
    truncating integer div of the remaining budget by the unsaturated
    count; every add is min(share, headroom) — all-bigint state, so
    the fixpoint is bit-exact and the oracle unrolls the rounds as
    CTEs.  The final sub-|sources| remainder stays unallocated
    (documented; a production run hands it to the largest source).

    Scale shape: one corpus scan to a |sources|-row availability
    table; the WF_ROUNDS rounds then run inside a single
    `aggregate(sequence(...))` higher-order expression over the
    array-collected state (the markov_absorption fold idiom — round 8:
    was 20 rounds × two checkpointed jobs, now one codegen'd fold; the
    per-round scalars Σalloc and n_unsat are EXACT bigint folds over
    the array, so element order cannot matter, and the truncating `div`
    share math is byte-identical to the join form and the oracle's
    unrolled CTEs).  Scan count over the largest fact table: 1.
    """
    avail = (
        read_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.sum(F.expr("n_chars div 4")).cast("bigint").alias("avail")
        )
    )
    packed = avail.agg(
        F.sort_array(F.collect_list(F.struct("source", "avail"))).alias("s")
    ).withColumn(
        "budget",
        F.expr(f"aggregate(s, 0L, (n, x) -> n + x.avail) div {WF_BUDGET_DEN}"),
    )
    step = (
        "transform(acc, x -> named_struct("
        "'source', x.source, 'avail', x.avail, 'alloc',"
        " x.alloc + IF(x.alloc < x.avail"
        " AND aggregate(acc, 0L,"
        " (n, y) -> n + IF(y.alloc < y.avail, 1L, 0L)) > 0,"
        " least((budget - aggregate(acc, 0L, (n, y) -> n + y.alloc))"
        " div aggregate(acc, 0L,"
        " (n, y) -> n + IF(y.alloc < y.avail, 1L, 0L)),"
        " x.avail - x.alloc), 0L)))"
    )
    fold = (
        f"aggregate(sequence(1, {WF_ROUNDS}),"
        " transform(s, x -> named_struct("
        "'source', x.source, 'avail', x.avail, 'alloc', 0L)),"
        f" (acc, i) -> {step})"
    )
    return (
        packed.select(F.explode(F.expr(fold)).alias("r"))
        .select(
            F.col("r.source").alias("source"),
            F.col("r.avail").alias("avail_tokens"),
            F.col("r.alloc").alias("alloc_tokens"),
            (F.col("r.alloc") == F.col("r.avail")).alias("saturated"),
            F.round(
                F.expr("cast(r.alloc as double) / cast(r.avail as double)"), 6
            ).alias("take_share"),
        )
    )


ALPHA_GRID = (0.3, 0.5, 0.7, 1.0)


def alpha_sampling_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling weights: for each exponent α
    in the grid, w_s = n_s^α / Σ_t n_t^α over per-source token counts —
    the exponential smoothing every multilingual/multi-source
    pretraining mixture uses (XLM-R's α = 0.3, GPT-3's quality-scaled
    variants): α = 1 is proportional sampling, α → 0 is uniform, and
    the sweep shows how much each α boosts the tail sources.  Reads
    beside `mixture_report` (realized mix) and `token_budget_waterfill`
    (capped allocation).

    Determinism: n^α = exp(α·ln n) evaluated as one fixed double
    expression per row, then nano-quantized BEFORE the denominator sum
    so normalization is exact integer arithmetic; one division at the
    surface.

    Scale shape: one corpus scan to a |sources|-row table, a 4-literal
    α explode, a |grid|-row broadcast denominator.
    """
    avail = (
        read_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum(F.expr("n_chars div 4")).cast("bigint").alias("n_tok"))
        # zero-token sources have zero weight at every alpha; excluding
        # them up front keeps ln(n) finite on both engines
        .where(F.col("n_tok") > 0)
    )
    grid = avail.select(
        "source",
        "n_tok",
        F.explode(
            F.array(*[F.lit(a) for a in ALPHA_GRID])
        ).alias("alpha"),
    ).select(
        "source",
        "n_tok",
        "alpha",
        F.expr(
            "cast(round(exp(alpha * ln(cast(n_tok as double)))"
            " * 1000.0) as bigint)"
        ).alias("pw_milli"),
    )
    den = grid.groupBy("alpha").agg(
        F.sum("pw_milli").cast("bigint").alias("den_milli")
    )
    return (
        grid.join(F.broadcast(den), "alpha")
        .select(
            "source",
            "alpha",
            "n_tok",
            F.round(
                F.expr(
                    "cast(pw_milli as double) / cast(den_milli as double)"
                ),
                6,
            ).alias("weight"),
        )
    )


PACK_LEN_GRID = (512, 1024, 2048, 4096)


def packing_length_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length provisioning sweep: for each candidate training
    sequence length L, the number of sequences and the padding-waste
    share when every document is chunked independently to length-L
    pieces (the no-cross-doc-packing regime) — the table that says what
    `pack_sequences`' chosen length costs versus alternatives and how
    much cross-document packing could recover.  Waste for a doc with T
    tokens is L·⌈T/L⌉ − T (the padding of its final chunk).

    Determinism: all counts are exact integers (ceiling division via
    (T + L − 1) div L); the waste share is one division at the surface.

    Scale shape: one corpus scan; the grid explode happens on the
    per-document token count projection (4 rows per doc of two ints),
    folded map-side to a 4-row surface.
    """
    toks = read_table(spark, sf_dir, "documents").select(
        F.expr("n_chars div 4").alias("t")
    ).where(F.col("t") > 0)
    grid = toks.select(
        "t",
        F.explode(
            F.array(*[F.lit(l) for l in PACK_LEN_GRID])
        ).alias("seq_len"),
    )
    return (
        grid.groupBy("seq_len")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("t").cast("bigint").alias("total_tokens"),
            F.sum(F.expr("(t + seq_len - 1) div seq_len"))
            .cast("bigint")
            .alias("n_sequences"),
        )
        .select(
            "seq_len",
            "n_docs",
            "total_tokens",
            "n_sequences",
            F.expr("n_sequences * seq_len - total_tokens").alias(
                "padding_tokens"
            ),
            F.round(
                F.expr(
                    "cast(n_sequences * seq_len - total_tokens as double)"
                    " / cast(n_sequences * seq_len as double)"
                ),
                6,
            ).alias("waste_share"),
        )
    )


TARGET_SHARD_BYTES = 16_384


def compaction_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction plan: assign documents to ~TARGET_SHARD_BYTES
    output shards by contiguous byte-offset chunking — shard = (bytes
    before me, within my source) div TARGET — and report each planned
    shard's fill.  This is the planning half of the small-files problem a
    100 TB corpus store fights continuously (thousands of tiny parquet
    files per sync cycle → one compaction pass into uniform shards);
    offset chunking is what makes the plan DETERMINISTIC and
    embarrassingly parallel, unlike first-fit-decreasing bin packing
    (order-sensitive, inherently sequential).  Shards fill to the target
    plus at most one document's overhang — the same tolerance file
    writers (maxRecordsPerFile / Delta OPTIMIZE) accept.

    Determinism: byte sizes are exact integers; the running offset is an
    exact prefix sum ordered by the unique doc_id; shard assignment is
    integer div.

    Scale shape: one keyed window per source (single shuffle, prefix sum
    — no driver loop, no global sort), then a combiner-folded rollup on
    (source, shard_idx).
    """
    from pyspark.sql import Window

    # octet_length, not length: the target and the outputs are BYTES,
    # and multi-byte text undercounts under character semantics (the
    # planned shards would silently exceed the byte budget).
    docs = read_table(spark, sf_dir, "documents").select(
        "source", "doc_id", F.octet_length("text").cast("bigint").alias("bytes")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    assigned = docs.withColumn(
        "off", F.coalesce(F.sum("bytes").over(w), F.lit(0))
    ).withColumn("shard_idx", F.expr(f"off div {TARGET_SHARD_BYTES}"))
    return assigned.groupBy("source", "shard_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("bytes").cast("bigint").alias("shard_bytes"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
        F.max("doc_id").cast("bigint").alias("last_doc"),
        F.round(
            F.sum("bytes") / F.lit(float(TARGET_SHARD_BYTES)), 6
        ).alias("fill_ratio"),
    )
