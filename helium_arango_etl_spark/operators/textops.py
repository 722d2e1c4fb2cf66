"""Text-analysis operators for the training-data pipeline (task brief:
language-ID, quality scoring, token counting, document fingerprinting).

All pure column expressions (codegen'd, no UDFs): tokenization is
``split``+``filter``, per-token work is higher-order array functions.
At 100 TB these run embarrassingly parallel over document partitions with
zero shuffle (per-row only); only downstream aggregations shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table, spread

# token array: whitespace split, empties dropped (both engines agree on this)
TOKS = "filter(split(text, ' '), x -> x != '')"

STOPWORDS = ("the", "a", "of", "and", "to", "in")

# lang marker tokens -> language guess, in deterministic priority order
LANG_MARKERS = [("en", "the"), ("es", "la"), ("de", "der"), ("fr", "le"), ("zh", "zh")]

# BPE-ish pre-tokenizer: letter runs | digit runs | single punctuation —
# the GPT-2 pre-tokenization shape reduced to classes both Java regex
# (Spark) and RE2 (DuckDB) evaluate identically.  Space is excluded
# explicitly (not \s) so the engines never disagree on the class.
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring + token counting per document.

    Deterministic quality score: 0.4·stopword_ratio + 0.3·min(n_tokens/100,1)
    + 0.3·alpha_ratio — a classic cheap-heuristic filter stage.
    """
    # tokenize ONCE into t; referencing the tokenizer expression 7 times
    # would re-split the text per use site (multi-use aliases survive
    # CollapseProject, single-use ones get inlined — keep them multi-use)
    docs = spread(read_table(spark, sf_dir, "documents")).withColumn("t", F.expr(TOKS))
    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    return docs.select(
        "doc_id",
        F.expr("size(t)").alias("n_tokens"),
        F.length("text").alias("n_chars"),
        F.expr(
            "round(aggregate(transform(t, x -> length(x)), 0, (acc, v) -> acc + v)"
            " / cast(size(t) as double), 4)"
        ).alias("avg_token_len"),
        F.expr(
            f"round(size(filter(t, x -> x in ({sw}))) / cast(size(t) as double), 4)"
        ).alias("stopword_ratio"),
        F.expr(
            "round((length(text) - length(regexp_replace(text, '[a-z]', '')))"
            " / cast(length(text) as double), 4)"
        ).alias("alpha_ratio"),
        F.expr(
            f"round(0.4 * (size(filter(t, x -> x in ({sw}))) / cast(size(t) as double))"
            " + 0.3 * least(size(t) / 100.0, 1.0)"
            " + 0.3 * ((length(text) - length(regexp_replace(text, '[a-z]', '')))"
            " / cast(length(text) as double)), 4)"
        ).alias("quality_score"),
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram-heuristic language ID: count marker-token hits per language,
    argmax with deterministic priority-order tie-break.  (The heuristic's
    *accuracy* is data-dependent; the operator contract is the deterministic
    scoring formula, oracle-checked.)"""
    docs = spread(read_table(spark, sf_dir, "documents")).withColumn("t", F.expr(TOKS))
    cols = [F.col("doc_id"), F.col("lang").alias("actual_lang")]
    for lang, marker in LANG_MARKERS:
        cols.append(F.expr(f"size(filter(t, x -> x = '{marker}'))").alias(f"c_{lang}"))
    df = docs.select(*cols)
    # argmax in priority order: first lang whose count equals the row max
    counts = [F.col(f"c_{lang}") for lang, _ in LANG_MARKERS]
    mx = F.greatest(*counts)
    pred = F.lit("und")
    for lang, _ in reversed(LANG_MARKERS):
        pred = F.when(F.col(f"c_{lang}") == mx, F.lit(lang)).otherwise(pred)
    return df.withColumn("predicted_lang", F.when(mx > 0, pred).otherwise(F.lit("und")))


def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, BPE-pre-tokenizer flavor (task brief: "whitespace +
    a BPE-ish regex"): letter-run / digit-run / punctuation tokens per
    document plus the tokens-per-word fan-out ratio a real BPE vocabulary
    would amplify.  Pure codegen'd column expressions — per-row, zero
    shuffle, linear scan at any scale."""
    docs = (
        spread(read_table(spark, sf_dir, "documents"))
        .withColumn("b", F.expr(f"regexp_extract_all(lower(text), '{BPE_RE}', 0)"))
        .withColumn("t", F.expr(TOKS))
    )
    return docs.select(
        "doc_id",
        F.expr("size(b)").alias("n_bpe_tokens"),
        F.expr("size(filter(b, x -> x rlike '^[a-z]'))").alias("n_word_tokens"),
        F.expr("size(filter(b, x -> x rlike '^[0-9]'))").alias("n_digit_tokens"),
        F.expr("size(filter(b, x -> x rlike '^[^a-z0-9]'))").alias("n_punct_tokens"),
        F.expr("round(size(b) / cast(size(t) as double), 4)").alias("tokens_per_word"),
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: order-insensitive bag-of-words hash + an
    order-sensitive prefix hash (cheap rolling-hash stand-in; both engines
    compute identical md5-based values)."""
    docs = spread(read_table(spark, sf_dir, "documents")).withColumn("t", F.expr(TOKS))
    return docs.select(
        "doc_id",
        F.expr("md5(array_join(array_sort(array_distinct(t)), ' '))").alias("bow_fingerprint"),
        F.expr("md5(array_join(slice(t, 1, 8), ' '))").alias("prefix_fingerprint"),
    )
