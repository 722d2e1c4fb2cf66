"""Streaming ingest screening must agree with the batch incremental_dedup
operator: a doc admitted by the stream is exactly a doc NOT flagged by
the batch boundary check over the same corpus/batch split."""

from __future__ import annotations

from pyspark.sql import functions as F

from helium_arango_etl_spark.io import read_table
from helium_arango_etl_spark.operators.dedup import NEW_MIN_ID, clear_sig_cache, incremental_dedup
from helium_arango_etl_spark.streaming.ingest_dedup import run_ingest_screen


def test_stream_screen_matches_batch_incremental(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") < NEW_MIN_ID)
    arriving = docs.filter(F.col("doc_id") >= NEW_MIN_ID)

    # corpus-only table dir (the "existing corpus" the stream screens against)
    corpus_dir = str(tmp_path / "corpus")
    corpus.write.mode("overwrite").parquet(corpus_dir + "/documents.parquet")

    # arriving docs in 2 files -> 2 micro-batches
    inc_dir = str(tmp_path / "incoming")
    arriving.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode("overwrite").parquet(inc_dir)
    arriving.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(inc_dir)

    clear_sig_cache(spark)
    try:
        admitted = set(
            run_ingest_screen(
                spark, corpus_dir, inc_dir, "ingest_test", str(tmp_path / "ckpt")
            )
        )
    finally:
        clear_sig_cache(spark)

    # batch reference over the ORIGINAL table: flagged new docs are dups
    clear_sig_cache(spark)
    try:
        flagged = {r["doc_id"] for r in incremental_dedup(spark, sf_dir).collect()}
        all_new = {r["doc_id"] for r in arriving.select("doc_id").collect()}
    finally:
        clear_sig_cache(spark)
    assert admitted == all_new - flagged
    assert flagged  # the testdata's dup docs must actually exercise the screen
