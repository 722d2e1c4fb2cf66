"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the *decode* step is stubbed
(deterministic fake behind an import-try — see ``_decode_rgb``); everything
Spark-side is real and tested: schema, binary payload handling, metadata
structs, Arrow batch shapes, partition-parallel UDF execution, frame
explosion.

Scale notes: mapInPandas streams Arrow record batches through the Python
worker — memory is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
regardless of partition size, which is what makes a 100 TB binary-column
scan feasible (no row-at-a-time pickling, no whole-partition buffering).
Binary payloads stay columnar end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table, spread

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

# Work-aware fan-out floor for the Python-boundary map stages (guide
# §2.2/§4): one task per ~1 MiB of input file bytes, capped at cluster
# parallelism inside spread().  The mapInPandas bodies here do light
# vectorized numpy per byte — at small inputs the per-task fixed cost
# (scheduler + Python worker handshake + Arrow framing) dominates, and
# BENCH_r10's 8-vs-32-core probe showed the full fan-out ANTI-scaling
# (image_features ratio 0.49).  A genuinely large input still fans out to
# every core; a well-split source bypasses spread() entirely.
PY_TASK_MIN_BYTES = 1 << 20

FEATURE_SCHEMA = (
    "doc_id bigint, width int, height int, format string, "
    "n_bytes int, mean_byte double, byte_histogram array<int>"
)

FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes binary, frame_mean double"


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Materialize an opaque binary column + typed metadata struct from the
    documents table (stand-in for a real image/audio bytes column; the
    payload is the utf-8 text so it is deterministic and content-correlated).
    """
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("fake/rgb8").alias("format"),
            (F.pmod(F.col("doc_id"), F.lit(64)) + 16).cast("int").alias("width"),
            (F.pmod(F.col("doc_id"), F.lit(48)) + 16).cast("int").alias("height"),
            F.length("text").cast("int").alias("n_bytes"),
        ).alias("media_meta"),
    )


def _decode_rgb(payload: bytes, width: int, height: int):
    """Decode step: real PIL decode when the library is available AND the
    payload is an actual image; otherwise the deterministic fake (the raw
    bytes ARE the pixel buffer).  This container's synthetic payloads are
    utf-8 text — not decodable images — so results are identical whether or
    not PIL is installed; a better-equipped environment gets real decoding
    of real images for free instead of a crash."""
    if _HAVE_PIL:
        import io as _io

        try:
            with Image.open(_io.BytesIO(bytes(payload))) as img:
                return img.convert("L").tobytes()
        except Exception:  # not a decodable image -> deterministic fake
            pass
    return payload  # deterministic fake: bytes ARE the pixels


def extract_image_features(binary_df: DataFrame) -> DataFrame:
    """Feature extraction over the binary column via mapInPandas: per-batch
    vectorized numpy over the raw bytes (mean, 8-bin histogram)."""
    import numpy as np

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_meta"], strict=True
            ):
                pixels = np.frombuffer(
                    _decode_rgb(payload, meta["width"], meta["height"]), dtype=np.uint8
                )
                hist = np.bincount(pixels >> 5, minlength=8)[:8]
                out.append(
                    (
                        doc_id,
                        int(meta["width"]),
                        int(meta["height"]),
                        meta["format"],
                        int(pixels.size),
                        # exact integer-sum / n division (not rounded): the
                        # DuckDB oracle reproduces the identical float64;
                        # an empty payload has no mean -> NULL on both
                        # engines (degenerate sweep, round 8)
                        float(pixels.mean()) if pixels.size else None,
                        [int(x) for x in hist],
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "format",
                    "n_bytes",
                    "mean_byte",
                    "byte_histogram",
                ],
            )

    return binary_df.mapInPandas(features, schema=FEATURE_SCHEMA)


def sample_frames(binary_df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for "video" payloads: slice the byte stream into
    n_frames equal windows (1 row -> N frame rows) — the UDTF-shaped
    multimodal fan-out, mirroring the witness-explode pattern (M3)."""
    import numpy as np

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"], strict=True):
                buf = bytes(payload)
                step = max(1, len(buf) // n_frames)
                for i in range(n_frames):
                    frame = buf[i * step : (i + 1) * step]
                    arr = np.frombuffer(frame, dtype=np.uint8)
                    out.append((doc_id, i, frame, float(arr.mean()) if arr.size else 0.0))
            yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "frame_bytes", "frame_mean"])

    return binary_df.mapInPandas(frames, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = "doc_id bigint, out_width int, out_height int, resized binary, resized_mean double"

AUDIO_SCHEMA = (
    "doc_id bigint, n_samples int, rms double, peak int, zero_crossings int, "
    "window_rms array<double>"
)


def resize_images(binary_df: DataFrame, out_width: int = 8, out_height: int = 8) -> DataFrame:
    """Nearest-neighbor resize over the binary column via mapInPandas.

    The decode is the deterministic fake (bytes = pixel buffer); the resize
    math — index grid, gather, re-serialize — is the real thing and is what a
    PIL/opencv-backed decode would feed at 100 TB."""
    import numpy as np

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_meta"], strict=True
            ):
                w, h = int(meta["width"]), int(meta["height"])
                pixels = np.frombuffer(_decode_rgb(payload, w, h), dtype=np.uint8)
                if pixels.size == 0:
                    # nothing to resize -> NULL on both engines
                    # (degenerate sweep, round 8)
                    out.append((doc_id, out_width, out_height, None, None))
                    continue
                # pad/trim the fake buffer to the declared geometry
                img = np.resize(pixels, (h, w))
                ys = (np.arange(out_height) * h) // out_height
                xs = (np.arange(out_width) * w) // out_width
                small = img[np.ix_(ys, xs)]
                out.append(
                    (
                        doc_id,
                        out_width,
                        out_height,
                        small.tobytes(),
                        float(small.mean()),
                    )
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "out_width", "out_height", "resized", "resized_mean"]
            )

    return binary_df.mapInPandas(resize, schema=RESIZE_SCHEMA)


def extract_audio_features(binary_df: DataFrame, n_windows: int = 4) -> DataFrame:
    """Audio feature extraction: treat the payload as signed 8-bit PCM and
    compute RMS / peak / zero-crossing count plus per-window RMS.  With a
    real codec the `np.frombuffer` line becomes the decoder output; the
    Spark-side contract (binary in, fixed-schema features out, Arrow batches)
    is identical."""
    import numpy as np

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"], strict=True):
                samples = np.frombuffer(bytes(payload), dtype=np.int8).astype(np.float64)
                n = samples.size
                if n == 0:
                    # no samples: rms/peak are undefined -> NULL on both
                    # engines (degenerate sweep, round 8)
                    out.append((doc_id, 0, None, None, 0, [0.0] * n_windows))
                    continue
                signs = np.sign(samples)
                nz = signs != 0
                zc = int(np.count_nonzero(np.diff(signs[nz]) != 0))
                step = max(1, n // n_windows)
                wins = [
                    float(np.sqrt(np.mean(np.square(samples[i * step : (i + 1) * step]))))
                    if samples[i * step : (i + 1) * step].size
                    else 0.0
                    for i in range(n_windows)
                ]
                out.append(
                    (
                        doc_id,
                        int(n),
                        # unrounded: integer sum-of-squares / n then sqrt is
                        # bit-deterministic, so the oracle matches exactly
                        float(np.sqrt(np.mean(np.square(samples)))),
                        int(np.abs(samples).max()),
                        zc,
                        wins,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "n_samples", "rms", "peak", "zero_crossings", "window_rms"],
            )

    return binary_df.mapInPandas(features, schema=AUDIO_SCHEMA)


# Registry-facing outputs keep a DRIVER-SAFE surface: the driver's pandas
# canonicalizer cannot sort top-level list cells (CORRECTNESS_r01 err on
# byte_histogram/window_rms) and stringifies binary cells ambiguously — so
# arrays of ints render as ','-joined strings (int formatting is identical
# across engines; double formatting is NOT, so double arrays split into
# scalar columns) and binary renders as hex.  The array/binary forms stay on
# the internal extract_*/sample_*/resize_* operators for pipeline use.


def image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: documents -> binary payload -> decoded features."""
    feats = extract_image_features(
        attach_binary_payload(spread(read_table(spark, sf_dir, "documents"), per_task_bytes=PY_TASK_MIN_BYTES))
    )
    return feats.withColumn("byte_histogram", F.array_join("byte_histogram", ","))


def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: documents -> binary payload -> 4 sampled frames each."""
    frames = sample_frames(attach_binary_payload(spread(read_table(spark, sf_dir, "documents"), per_task_bytes=PY_TASK_MIN_BYTES)))
    return frames.select(
        "doc_id", "frame_idx", F.hex("frame_bytes").alias("frame_hex"), "frame_mean"
    )


def image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: documents -> binary payload -> 8x8 nearest-neighbor."""
    small = resize_images(attach_binary_payload(spread(read_table(spark, sf_dir, "documents"), per_task_bytes=PY_TASK_MIN_BYTES)))
    return small.select(
        "doc_id", "out_width", "out_height", F.hex("resized").alias("resized_hex"), "resized_mean"
    )


def audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: documents -> binary payload as PCM -> waveform stats."""
    feats = extract_audio_features(
        attach_binary_payload(spread(read_table(spark, sf_dir, "documents"), per_task_bytes=PY_TASK_MIN_BYTES))
    )
    return feats.select(
        "doc_id",
        "n_samples",
        "rms",
        "peak",
        "zero_crossings",
        *[F.element_at("window_rms", i + 1).alias(f"win_rms_{i}") for i in range(4)],
    )


PHASH_SCHEMA = "doc_id bigint, phash string"

# prefix-bucket width (hex chars) for phash pair generation, and the
# Hamming radius for "near-duplicate image"
PHASH_BUCKET_HEX = 4
PHASH_MAX_HAMMING = 10


def compute_phash(binary_df: DataFrame, out: int = 8) -> DataFrame:
    """Perceptual average-hash over the decoded image: nearest-neighbor
    resize to out×out (same gather math as resize_images), threshold each
    pixel against the block mean, pack the 64 bits into 16 lowercase hex
    chars (bit 0 = MSB, row-major).  Byte-deterministic, so the DuckDB
    oracle reproduces it from the utf-8 payload."""
    import numpy as np

    def phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_meta"], strict=True
            ):
                w, h = int(meta["width"]), int(meta["height"])
                pixels = np.frombuffer(_decode_rgb(payload, w, h), dtype=np.uint8)
                img = np.resize(pixels, (h, w))
                ys = (np.arange(out) * h) // out
                xs = (np.arange(out) * w) // out
                small = img[np.ix_(ys, xs)].astype(np.float64)
                bits = (small.flatten() > small.mean()).astype(np.uint64)
                val = 0
                for b in bits:
                    val = (val << 1) | int(b)
                rows.append((doc_id, format(val, "016x")))
            yield pd.DataFrame(rows, columns=["doc_id", "phash"])

    return binary_df.mapInPandas(phash, schema=PHASH_SCHEMA)


def image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: documents -> binary payload -> 64-bit perceptual
    hash — the image-dedup fingerprint (images that survive re-encoding /
    mild edits keep a small phash Hamming distance)."""
    return compute_phash(
        attach_binary_payload(spread(read_table(spark, sf_dir, "documents"), per_task_bytes=PY_TASK_MIN_BYTES))
    )


def phash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs by phash Hamming distance — the
    multimodal analog of SimHash text dedup.

    Scale shape: the quadratic pair formation is bucketed on the
    PHASH_BUCKET_HEX-char hash prefix (identical/near-identical images
    share it; the multi-band generalization is the LSH banding already
    used for text), so only same-prefix images are compared, via the same
    single-scan groupBy-collect pair generation as the text pipelines —
    never an all-pairs self-join.  Only (doc_id, 16-char hash) pairs ever
    shuffle."""
    ph = compute_phash(
        attach_binary_payload(spread(read_table(spark, sf_dir, "documents"), per_task_bytes=PY_TASK_MIN_BYTES))
    )
    buckets = (
        ph.withColumn("bucket", F.substring("phash", 1, PHASH_BUCKET_HEX))
        .groupBy("bucket")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "phash"))).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    pair_gen = (
        "flatten(transform(ds, (a, i) ->"
        " transform(slice(ds, i + 2, size(ds) - i - 1),"
        " b -> struct(a.doc_id AS doc_a, b.doc_id AS doc_b,"
        " a.phash AS ph_a, b.phash AS ph_b))))"
    )
    ham = (
        "aggregate(transform(sequence(1, 16),"
        " i -> bit_count(cast(conv(substring(ph_a, i, 1), 16, 10) as int)"
        " ^ cast(conv(substring(ph_b, i, 1), 16, 10) as int))),"
        " 0, (acc, v) -> acc + v)"
    )
    return (
        buckets.select(F.explode(F.expr(pair_gen)).alias("p"))
        .select("p.doc_a", "p.doc_b", F.expr(ham.replace("ph_a", "p.ph_a").replace("ph_b", "p.ph_b")).cast("bigint").alias("hamming"))
        .filter(F.col("hamming") <= PHASH_MAX_HAMMING)
        .distinct()
    )


RESAMPLE_FACTOR = 4

RESAMPLE_SCHEMA = "doc_id bigint, n_in int, n_out int, resampled_hex string, out_rms double"


def audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decimation by RESAMPLE_FACTOR (keep every R-th sample of the
    signed-8-bit PCM payload) with before/after sample counts and the
    resampled RMS — the rate-reduction step of an audio ingest pipeline.
    (A production resampler low-pass-filters first; the Spark-side
    contract — binary in, fixed schema out, Arrow batches — is what this
    pins.)  Byte-deterministic, fully oracled."""
    import numpy as np

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"], strict=True):
                samples = np.frombuffer(bytes(payload), dtype=np.int8)
                kept = samples[::RESAMPLE_FACTOR]
                f = kept.astype(np.float64)
                rms = float(np.sqrt(np.mean(np.square(f)))) if kept.size else 0.0
                out.append(
                    (doc_id, int(samples.size), int(kept.size), kept.tobytes().hex(), rms)
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "n_in", "n_out", "resampled_hex", "out_rms"]
            )

    binary_df = attach_binary_payload(spread(read_table(spark, sf_dir, "documents"), per_task_bytes=PY_TASK_MIN_BYTES))
    return binary_df.mapInPandas(resample, schema=RESAMPLE_SCHEMA)


# Cap for in-bucket pair generation in capped video-dedup runs — same
# role (and same chunked-pair-gen formula) as dedup.LSH_MAX_BUCKET.
VIDEO_MAX_BUCKET = 256


def _frame_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc_id, frame-hash) pairs: frame BYTES reduce to 16-byte
    md5 hashes executor-locally; empty frames excluded so short payloads
    cannot form a corpus-wide mega-bucket."""
    frames = sample_frames(
        attach_binary_payload(spread(read_table(spark, sf_dir, "documents"), per_task_bytes=PY_TASK_MIN_BYTES))
    )
    return (
        frames.filter(F.length("frame_bytes") > 0)
        .select("doc_id", F.md5("frame_bytes").alias("fh"))
        .distinct()
    )


def video_frame_dup_pairs(
    spark: SparkSession, sf_dir: str, max_bucket: int | None = None
) -> DataFrame:
    """Cross-video duplicate-frame pairs: two "videos" are near-dups when
    they share sampled-frame content — the video analog of segment-level
    text dedup (a re-upload, a re-encode of the same clip, or a shared
    intro sequence shows up as identical sampled frames).  Frames come
    from the same sample_frames fan-out as video_frame_sample; frame
    identity is md5 over the raw frame bytes.

    Scale shape: one (frame-hash, doc_id) shuffle — frame BYTES never
    shuffle, only their 16-byte hashes; pair generation is the same
    single-scan groupBy-collect used by the LSH/phash buckets (never an
    all-pairs self-join).  ``max_bucket`` guards the pathological shared
    frame (a black intro frame across millions of videos): pair gen
    inside an oversized bucket is restricted to doc_id-contiguous chunks
    of that size — O(k·cap) pairs instead of O(k²) — with dropped pairs
    ACCOUNTED by :func:`video_frame_bucket_stats`, mirroring
    dedup._bucket_pairs/LSH_MAX_BUCKET.  The registry/oracle form runs
    uncapped (exact semantics); production passes VIDEO_MAX_BUCKET.
    """
    groups = (
        _frame_hashes(spark, sf_dir)
        .groupBy("fh")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    if max_bucket is None:
        end = "size(ds)"
    else:
        end = f"least((i div {max_bucket} + 1) * {max_bucket}, size(ds))"
    pair_gen = (
        "flatten(transform(ds, (a, i) ->"
        f" transform(slice(ds, i + 2, {end} - i - 1),"
        " b -> struct(a AS doc_a, b AS doc_b))))"
    )
    return (
        groups.select(F.explode(F.expr(pair_gen)).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_frames"))
    )


def video_frame_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-bucket size distribution + cap accounting for video dedup:
    bucket counts, the largest shared-frame fan-in, exact candidate-pair
    count, and how many pairs a VIDEO_MAX_BUCKET-capped run generates vs
    drops.  The no-silent-caps surface for :func:`video_frame_dup_pairs`
    — sizes only, no pair materialization, so it stays cheap even when
    the exact pair count would not be."""
    sizes = _frame_hashes(spark, sf_dir).groupBy("fh").agg(
        F.count(F.lit(1)).alias("k")
    )
    m = VIDEO_MAX_BUCKET
    per = sizes.select(
        "k",
        F.expr("k * (k - 1) div 2").alias("all_pairs"),
        F.expr(
            f"(k div {m}) * ({m} * ({m} - 1) div 2) + (k % {m}) * (k % {m} - 1) div 2"
        ).alias("capped_pairs"),
    )
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.sum(F.when(F.col("k") >= 2, 1).otherwise(0)).cast("bigint").alias("n_multi_buckets"),
        F.max("k").cast("bigint").alias("max_bucket_size"),
        F.sum("all_pairs").cast("bigint").alias("candidate_pairs"),
        F.sum("capped_pairs").cast("bigint").alias("capped_pairs"),
        (F.sum("all_pairs") - F.sum("capped_pairs")).cast("bigint").alias("dropped_pairs"),
    )


def phash_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-duplicate CLUSTERS: connected components over the
    phash near-pair graph (`phash_near_pairs`) — the multimodal mirror
    of text `dedup_clusters`, because greedy pairwise drops over-delete
    hamming chains A~B~C where A≁C; the cluster view keeps exactly one
    representative (the min doc_id) per visually-equivalent group.

    Determinism: min-label propagation over exact integer ids to a
    fixpoint (confluent), so the RECURSIVE-reachability oracle matches
    exactly; only docs that appear in ≥ 1 near-pair cluster (singletons
    are trivially their own cluster and are omitted).

    Scale shape: the pair graph is banded-bucket generated (see
    `phash_near_pairs`); propagation shuffles (id, label) pairs only —
    image bytes never enter the loop.
    """
    edges = phash_near_pairs(spark, sf_dir).select("doc_a", "doc_b").distinct()
    nodes = (
        edges.select(F.col("doc_a").alias("node"))
        .unionByName(edges.select(F.col("doc_b").alias("node")))
        .distinct()
    )
    und = edges.select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    ).unionByName(
        edges.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b"))
    )
    from .cc import propagate_min_labels

    labels = propagate_min_labels(
        nodes.select("node", F.col("node").alias("label")),
        und,
        keys=[],
        max_iters=20,
    )
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return labels.join(sizes, "label").select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        "cluster_size",
    )
