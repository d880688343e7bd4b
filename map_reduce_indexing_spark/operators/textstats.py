"""Text analysis for training-data pipelines (EXT tier).

Per-document quality metrics, language identification (n-gram/stopword
heuristic), token counting (whitespace + BPE-ish regex), and document
fingerprinting — all in built-in expressions over the `documents`
fixture, mirroring the reference's normalization rules where tokens are
involved (SURVEY.md §0.1).

Every metric is a per-row computation (no shuffle) except the final
aggregates — at 100 TB these run as a single map pass over the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.registry import register
from ..sources.tables import load_table
from .dedup import (
    DUCK_TOKENS_LIST,
    duck_shingles,
    shingle_rows,
    spark_tokens_expr,
)

# Stopword sets for the language-ID vote. [a-z]-only (the tokenizer's
# alphabet). Deterministic priority order breaks ties: en > es > de > fr.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "es": ["el", "la", "de", "los", "que", "y", "en", "un"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "des", "que", "une", "dans"],
}
EN_STOP = STOPWORDS["en"]

BPE_ISH = "[a-z]+|[0-9]+|[^a-z0-9 ]"  # letters | digits | single symbol
FINGERPRINT_K = 5


def _vote(engine: str, lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    if engine == "spark":
        return f"size(filter(toks, t -> t in ({words})))"
    return f"len(list_filter(toks, t -> t in ({words})))"


@register(
    "text_quality",
    oracle=f"""
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
               CASE WHEN len(toks) > 0
                    THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                    ELSE 0.0 END AS type_token_ratio,
               CASE WHEN len(toks) > 0
                    THEN CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / len(toks)
                    ELSE 0.0 END AS avg_token_len,
               CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS BIGINT)
                 AS n_punct,
               CASE WHEN length(text) > 0
                    THEN CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
                         / length(text)
                    ELSE 0.0 END AS punct_ratio,
               CASE WHEN len(toks) > 0
                    THEN CAST(len(list_filter(toks, t -> t IN ({', '.join(f"'{w}'" for w in EN_STOP)}))) AS DOUBLE)
                         / len(toks)
                    ELSE 0.0 END AS stopword_ratio
        FROM (SELECT doc_id, lower(text) AS text, {DUCK_TOKENS_LIST} AS toks FROM documents)
    """,
    tier="llm",
    doc="Per-doc quality metrics: token/type counts, type-token ratio, "
    "average token length, punctuation ratio, stopword ratio — the "
    "standard pre-training quality-filter signals.",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    stop = ", ".join(f"'{w}'" for w in EN_STOP)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.lower("text").alias("text"))
        .withColumn("toks", F.expr(spark_tokens_expr("text")))
    )
    n_tok = F.size("toks")
    n_typ = F.size(F.array_distinct("toks"))
    n_punct = (F.length("text") - F.length(F.regexp_replace("text", "[^a-z0-9 ]", ""))).cast("long")
    return docs.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        n_typ.cast("long").alias("n_types"),
        F.when(n_tok > 0, n_typ.cast("double") / n_tok).otherwise(0.0).alias("type_token_ratio"),
        F.when(
            n_tok > 0,
            F.expr("aggregate(transform(toks, t -> length(t)), 0L, (a, x) -> a + x)").cast("double") / n_tok,
        )
        .otherwise(0.0)
        .alias("avg_token_len"),
        n_punct.alias("n_punct"),
        F.when(F.length("text") > 0, n_punct.cast("double") / F.length("text"))
        .otherwise(0.0)
        .alias("punct_ratio"),
        F.when(n_tok > 0, F.expr(f"size(filter(toks, t -> t in ({stop})))").cast("double") / n_tok)
        .otherwise(0.0)
        .alias("stopword_ratio"),
    )


@register(
    "text_langid",
    oracle=f"""
        SELECT doc_id, lang AS lang_actual,
               CASE WHEN en >= es AND en >= de AND en >= fr THEN 'en'
                    WHEN es >= de AND es >= fr THEN 'es'
                    WHEN de >= fr THEN 'de'
                    ELSE 'fr' END AS lang_pred
        FROM (
            SELECT doc_id, lang,
                   {_vote('duck', 'en')} AS en, {_vote('duck', 'es')} AS es,
                   {_vote('duck', 'de')} AS de, {_vote('duck', 'fr')} AS fr
            FROM (SELECT doc_id, lang, {DUCK_TOKENS_LIST} AS toks FROM documents)
        )
    """,
    tier="llm",
    doc="Language-ID heuristic: stopword voting over four languages with "
    "a fixed tie-break priority. (The fixture's text is synthetic, so "
    "lang_actual is carried for comparison, not asserted.)",
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "text")
        .withColumn("toks", F.expr(spark_tokens_expr("text")))
    )
    for lang in STOPWORDS:
        docs = docs.withColumn(lang, F.expr(_vote("spark", lang)))
    pred = (
        F.when((F.col("en") >= F.col("es")) & (F.col("en") >= F.col("de")) & (F.col("en") >= F.col("fr")), "en")
        .when((F.col("es") >= F.col("de")) & (F.col("es") >= F.col("fr")), "es")
        .when(F.col("de") >= F.col("fr"), "de")
        .otherwise("fr")
    )
    return docs.select("doc_id", F.col("lang").alias("lang_actual"), pred.alias("lang_pred"))


@register(
    "text_token_counts",
    oracle=f"""
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_ws_tokens,
               CAST(len({DUCK_TOKENS_LIST}) AS BIGINT) AS n_norm_tokens,
               CAST(len(regexp_extract_all(lower(text), '{BPE_ISH}')) AS BIGINT) AS n_bpe_tokens,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM documents
    """,
    tier="llm",
    doc="Token counting three ways: raw whitespace split, reference-"
    "normalized tokens, and a BPE-ish regex segmentation (letters / "
    "digit runs / single symbols) — the token-budget accounting pass.",
)
def q_text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select(
        "doc_id",
        F.expr("size(filter(split(text, ' ', -1), x -> x != ''))").cast("long").alias("n_ws_tokens"),
        F.size(F.expr(spark_tokens_expr("text"))).cast("long").alias("n_norm_tokens"),
        F.size(F.expr(f"regexp_extract_all(lower(text), '{BPE_ISH}', 0)")).cast("long").alias("n_bpe_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


SPLIT_PCT = (80, 10, 10)  # train / val / test


@register(
    "text_train_val_test_split",
    oracle=f"""
        SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM (
            SELECT n_chars,
                   CASE WHEN bucket < {SPLIT_PCT[0]} THEN 'train'
                        WHEN bucket < {SPLIT_PCT[0] + SPLIT_PCT[1]} THEN 'val'
                        ELSE 'test' END AS split
            FROM (
                SELECT n_chars,
                       CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                         % 100 AS bucket
                FROM documents))
        GROUP BY split
    """,
    tier="llm",
    doc=f"Deterministic {SPLIT_PCT[0]}/{SPLIT_PCT[1]}/{SPLIT_PCT[2]} "
    "train/val/test split by md5(doc_id) bucket — the eval-split "
    "operator every training-data pipeline needs. Hash-based (not "
    "rand(seed)) so the assignment is stable across engines, runs, "
    "partitionings, and appends: a doc's split never changes when the "
    "corpus grows, which rand-based splits cannot guarantee.",
)
def q_text_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < SPLIT_PCT[0], "train")
        .when(bucket < SPLIT_PCT[0] + SPLIT_PCT[1], "val")
        .otherwise("test")
    )
    return (
        docs.select(F.col("n_chars"), split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "text_fingerprint",
    oracle=f"""
        SELECT doc_id,
               list_sort(list_distinct(list_transform({duck_shingles('toks')},
                   s -> md5(s))))[1:{FINGERPRINT_K}] AS fp
        FROM (SELECT doc_id, {DUCK_TOKENS_LIST} AS toks FROM documents)
        WHERE len(toks) >= 3
    """,
    tier="llm",
    doc=f"Document fingerprint: the {FINGERPRINT_K} lexicographically "
    "smallest md5s of word shingles (min-k sketch) — order-stable, "
    "cross-engine-identical, usable as a compact near-dup key.",
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # shingle_rows is already distinct per doc; min-k = sort + slice
    return (
        shingle_rows(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.expr(f"slice(array_sort(collect_set(md5(s))), 1, {FINGERPRINT_K})").alias("fp")
        )
    )
