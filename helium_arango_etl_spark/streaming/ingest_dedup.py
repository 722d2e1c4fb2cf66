"""Streaming corpus ingestion with near-dup screening: every arriving
micro-batch of documents is checked against the EXISTING corpus before
admission — the streaming composition of ``operators.dedup
.incremental_dedup`` (batch form) with the follower's foreachBatch merge
pattern (streaming/follower.py).

Per micro-batch inside ``foreachBatch`` (batch-DataFrame context, so the
full batch API is available):
1. signature-build ONLY the arriving docs (per-row map work);
2. LSH-band them against the accumulated corpus signature table AND
   against themselves — candidate pairs form per band via an equi-join on
   (band_idx, band_hash), so the corpus side is touched only where band
   hashes collide, and intra-batch near-dups are caught too;
3. exact-Jaccard verify candidates; append the admitted doc rows to the
   parquet sink and fold their signatures into the screening state.

State at 100 TB: the corpus contributes its signature table (a few
hundred bytes per doc, persisted once per cycle and reusable across every
batch), never its bodies; per-batch work scales with the batch, not the
corpus.  On a cluster the signature state lives in a real checkpoint dir
(setCheckpointDir) or a compacted parquet table instead of
localCheckpoint.
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
    corpus OR of an earlier batch member.

    Candidate pairs band the batch against the corpus signatures AND the
    batch against itself (``doc_a < doc_b``), so near-duplicates arriving
    inside one micro-batch no longer slip through together.  Rejection is
    the same greedy rule as operators.dedup.near_dup_keep: any doc that is
    the ``doc_b`` of a verified pair — i.e. a dup of a corpus doc or of a
    smaller-id batch sibling — is rejected (a chain A~B~C with A kept
    drops both B and C).  Returns (doc_id) of admitted docs.
    """
    new_sig = _sig_of(batch_docs)
    bands = [F.col(f"band{b}") for b in range(NUM_BANDS)]
    explode = lambda sig, side: sig.select(  # noqa: E731
        F.col("doc_id").alias(f"doc_{side}"),
        F.posexplode(F.array(*bands)).alias("band_idx", "band_hash"),
    )
    new_bands = explode(new_sig, "b")
    cross = (
        explode(corpus_sig, "a")
        .join(new_bands, ["band_idx", "band_hash"])
        .select("doc_a", "doc_b")
    )
    intra = (
        new_bands.select(
            F.col("doc_b").alias("doc_a"), "band_idx", "band_hash"
        )
        .join(new_bands, ["band_idx", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    cand = cross.unionByName(intra).distinct()
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
    out_dir: str,
    checkpoint_dir: str,
) -> str:
    """availableNow file-source stream over ``incoming_dir`` (parquet docs
    with the documents schema): each micro-batch is screened against the
    accumulated corpus signatures and the ADMITTED DOC ROWS are appended
    to the parquet table at ``out_dir`` — storage is the sink, nothing is
    collected to the driver.  Admitted docs' signatures fold into the
    screening state (localCheckpoint per batch), so a doc arriving in
    batch N is also screened against batches 0..N−1's admissions, not
    just the initial corpus — first arrival wins across batches, smallest
    doc_id wins within one.  Returns ``out_dir``.
    """
    state = {"sig": signature_table(spark, corpus_sf_dir)}

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        kept = screen_batch(batch_df, state["sig"])
        batch_df.join(kept, "doc_id", "left_semi").write.mode("append").parquet(out_dir)
        admitted_sig = _sig_of(batch_df).join(kept, "doc_id", "left_semi")
        state["sig"] = state["sig"].unionByName(admitted_sig).localCheckpoint()

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
    return out_dir
