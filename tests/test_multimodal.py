"""Multimodal plumbing tests: binary payload schema, Arrow-batched feature
extraction, frame fan-out — the decode step falls back to a deterministic
fake when no imaging lib is present (this container), the Spark plumbing is
real.  Registry-facing surfaces are driver-safe: int arrays as ','-joined
strings, double arrays as scalar columns, binary as hex."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from helium_arango_etl_spark.io import read_table
from helium_arango_etl_spark.operators.multimodal import (
    _HAVE_PIL,
    _decode_rgb,
    attach_binary_payload,
    audio_features,
    extract_audio_features,
    image_features,
    image_resize,
    resize_images,
    sample_frames,
    video_frame_sample,
)


def test_binary_payload_schema(spark, sf_dir):
    df = attach_binary_payload(read_table(spark, sf_dir, "documents"))
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert types["payload"] == "binary"
    assert types["media_meta"].startswith("struct<format:string,width:int,height:int")


def test_decode_falls_back_to_fake_on_non_image():
    """Non-image payloads must decode to the deterministic fake (bytes are
    the pixels) in EVERY environment — with or without PIL installed.  The
    round-1 gate was inverted (raised when PIL existed)."""
    payload = b"definitely not a PNG"
    assert bytes(_decode_rgb(payload, 4, 5)) == payload


@pytest.mark.skipif(not _HAVE_PIL, reason="PIL not installed in this container")
def test_decode_real_image_with_pil():
    """When PIL exists, a real image payload decodes to its pixel buffer."""
    import io

    from PIL import Image

    img = Image.new("L", (3, 2))
    img.putdata([0, 50, 100, 150, 200, 250])
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    decoded = _decode_rgb(buf.getvalue(), 3, 2)
    assert bytes(decoded) == bytes([0, 50, 100, 150, 200, 250])


def test_image_features_deterministic_and_complete(spark, sf_dir):
    n_docs = read_table(spark, sf_dir, "documents").count()
    feats = image_features(spark, sf_dir)
    rows = feats.collect()
    assert len(rows) == n_docs
    r = {x["doc_id"]: x for x in rows}[0]
    hist = [int(x) for x in r["byte_histogram"].split(",")]
    assert len(hist) == 8
    assert r["n_bytes"] > 0 and sum(hist) == r["n_bytes"]
    assert 0.0 < r["mean_byte"] < 255.0
    # re-run identical (fake decode is deterministic)
    again = {x["doc_id"]: x for x in image_features(spark, sf_dir).collect()}[0]
    assert again == r


def test_frame_sampling_fanout(spark, sf_dir):
    n_docs = read_table(spark, sf_dir, "documents").count()
    frames = video_frame_sample(spark, sf_dir)
    assert frames.count() == 4 * n_docs
    per_doc = frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    assert all(r["n"] == 4 for r in per_doc)
    f0 = frames.filter((F.col("doc_id") == 0) & (F.col("frame_idx") == 0)).first()
    assert len(f0["frame_hex"]) > 0 and len(f0["frame_hex"]) % 2 == 0
    # internal operator keeps the raw binary frames
    raw = sample_frames(
        attach_binary_payload(read_table(spark, sf_dir, "documents"))
    ).filter((F.col("doc_id") == 0) & (F.col("frame_idx") == 0)).first()
    assert isinstance(raw["frame_bytes"], (bytes, bytearray))
    assert bytes(raw["frame_bytes"]).hex().upper() == f0["frame_hex"]


def test_image_resize_geometry(spark, sf_dir):
    n_docs = read_table(spark, sf_dir, "documents").count()
    rows = image_resize(spark, sf_dir).collect()
    assert len(rows) == n_docs
    for r in rows:
        assert r["out_width"] == 8 and r["out_height"] == 8
        assert len(r["resized_hex"]) == 128  # 8x8 single-channel fake pixels, hex
        assert 0.0 <= r["resized_mean"] <= 255.0
    # internal operator keeps the raw resized buffer
    raw = resize_images(attach_binary_payload(read_table(spark, sf_dir, "documents"))).first()
    assert len(raw["resized"]) == 64


def test_audio_features_waveform_stats(spark, sf_dir):
    n_docs = read_table(spark, sf_dir, "documents").count()
    rows = audio_features(spark, sf_dir).collect()
    assert len(rows) == n_docs
    for r in rows:
        assert r["n_samples"] > 0
        assert 0.0 < r["rms"] <= 128.0
        assert 0 <= r["peak"] <= 128
        for i in range(4):
            assert r[f"win_rms_{i}"] >= 0.0
    # internal operator keeps the window_rms array
    raw = extract_audio_features(
        attach_binary_payload(read_table(spark, sf_dir, "documents"))
    ).first()
    assert len(raw["window_rms"]) == 4
    # determinism
    again = audio_features(spark, sf_dir).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_video_dup_cap_accounting(spark, sf_dir):
    """The capped pair run and the bucket-stats accounting must agree:
    uncapped pair volume == candidate_pairs, a max_bucket=1 run emits
    zero pairs, and a cap at least the max bucket size drops nothing."""
    from pyspark.sql import functions as F

    from helium_arango_etl_spark.operators.multimodal import (
        video_frame_bucket_stats,
        video_frame_dup_pairs,
    )

    stats = video_frame_bucket_stats(spark, sf_dir).collect()[0]
    # per-bucket pair volume (n_shared_frames sums one per shared bucket)
    uncapped = video_frame_dup_pairs(spark, sf_dir)
    total_pairs = uncapped.agg(F.sum("n_shared_frames")).collect()[0][0] or 0
    assert total_pairs == stats["candidate_pairs"]
    assert stats["dropped_pairs"] == stats["candidate_pairs"] - stats["capped_pairs"]

    assert video_frame_dup_pairs(spark, sf_dir, max_bucket=1).count() == 0

    big = int(stats["max_bucket_size"])
    full = video_frame_dup_pairs(spark, sf_dir, max_bucket=max(big, 2))
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, uncapped.collect()))
