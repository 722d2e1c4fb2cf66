"""Streaming corpus ingestion with near-dup screening: every arriving
micro-batch of documents is checked against the EXISTING corpus before
admission — the streaming composition of ``operators.dedup
.incremental_dedup`` (batch form) with the follower's foreachBatch merge
pattern (streaming/follower.py).

Per micro-batch inside ``foreachBatch`` (batch-DataFrame context, so the
full batch API is available):
1. signature-build ONLY the arriving docs (per-row map work);
2. LSH-band them against the persisted corpus signature table — candidate
   pairs form per band via an equi-join on (band_idx, band_hash), so the
   corpus side is touched only where band hashes collide;
3. exact-Jaccard verify candidates; admit the batch minus verified dups.

State at 100 TB: the corpus contributes its signature table (a few
hundred bytes per doc, persisted once per cycle and reusable across every
batch), never its bodies; per-batch work scales with the batch, not the
corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    NEAR_DUP_THRESH,
    NUM_BANDS,
    _exact_jaccard,
    _build_signature_table,
    signature_table,
)


def _sig_of(docs: DataFrame) -> DataFrame:
    """Signature-build an arbitrary documents DataFrame (not a table path):
    reuse the table builder's expression pipeline via a temp view-free
    projection — same constants, same oracle-portable hashing."""
    from ..operators.dedup import HASH_PAIRS, SHINGLES_OVER_T, SHINGLE_K, BAND_ROWS, NUM_HASHES, _signature_cols
    from ..operators.textops import TOKS

    base = (
        docs.withColumn("t", F.expr(TOKS))
        .filter(F.expr(f"size(t) >= {SHINGLE_K}"))
        .withColumn("sh", F.expr(SHINGLES_OVER_T))
        .withColumn("hs", F.expr(HASH_PAIRS))
    )
    sig = base.select("doc_id", F.array_distinct("sh").alias("sh"), *_signature_cols())
    band_cols = [
        F.md5(F.concat_ws("|", *[f"mh{b * BAND_ROWS + r}" for r in range(BAND_ROWS)])).alias(f"band{b}")
        for b in range(NUM_BANDS)
    ]
    return sig.select(
        "doc_id", "sh",
        F.concat_ws("|", *[f"mh{h}" for h in range(NUM_HASHES)]).alias("sig"),
        *band_cols,
    )


def screen_batch(batch_docs: DataFrame, corpus_sig: DataFrame) -> DataFrame:
    """Admit the arriving docs that are NOT verified near-dups of the
    corpus.  Returns (doc_id) of admitted docs (byte-identical semantics
    to operators.dedup.incremental_dedup's complement over the same
    boundary)."""
    new_sig = _sig_of(batch_docs)
    bands = [F.col(f"band{b}") for b in range(NUM_BANDS)]
    explode = lambda sig, side: sig.select(  # noqa: E731
        F.col("doc_id").alias(f"doc_{side}"),
        F.posexplode(F.array(*bands)).alias("band_idx", "band_hash"),
    )
    cand = (
        explode(corpus_sig, "a")
        .join(explode(new_sig, "b"), ["band_idx", "band_hash"])
        .select("doc_a", "doc_b")
        .distinct()
    )
    both_sig = corpus_sig.select("doc_id", "sh").unionByName(new_sig.select("doc_id", "sh"))
    dup = (
        _exact_jaccard(cand, both_sig)
        .filter(F.col("jaccard") >= NEAR_DUP_THRESH)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return batch_docs.select("doc_id").join(dup, "doc_id", "left_anti")


def run_ingest_screen(
    spark: SparkSession,
    corpus_sf_dir: str,
    incoming_dir: str,
    out_table: str,
    checkpoint_dir: str,
):
    """availableNow file-source stream over ``incoming_dir`` (parquet docs
    with the documents schema): each micro-batch is screened against the
    corpus signatures and admitted doc_ids are appended to the in-memory
    ``out_table`` list (test sink; a production sink merges into storage —
    io.merge_ignore)."""
    corpus_sig = signature_table(spark, corpus_sf_dir)
    admitted: list = []

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        kept = screen_batch(batch_df, corpus_sig)
        admitted.extend(r["doc_id"] for r in kept.collect())

    schema = spark.read.parquet(corpus_sf_dir + "/documents.parquet").schema
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(incoming_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return admitted
