"""Query surface over the inverted index (SURVEY.md §2 IMPLIED tier).

The reference builds the index but implements no search (client.c only
submits indexing jobs, SURVEY.md §0); the queryable artifact is the
letter-bucketed file set, where term lookup = scan ./index/<first-letter>.
This module implements the search surface that index implies: term lookup
(partition-pruned), boolean multi-term search (AND = semi join,
OR = union, NOT = anti join — SURVEY.md §2.3 J1/J3, §2.7), ranking
(window functions, §2.5 W1), and per-doc term-frequency vectors (§2.4 A8).

Scale posture: term lookup against the persisted index is a partition-
pruned scan (letter = word[0] prunes 25/26) plus a pushed-down `word =`
filter — at 100 TB this touches only the matching partition's row groups.
Boolean search joins are doc-keyed; the per-term posting lists are the
small side and broadcast under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..plans.registry import register
from .indexing import POSTINGS_SQL, postings_for, read_index

# Fixed probe terms for registered queries — present in the synthetic
# documents fixture vocabulary at every sf.
TERM_A = "spark"
TERM_B = "query"
TERM_NOT = "slow"


def term_lookup(index: DataFrame, word: str) -> DataFrame:
    """Lookup one term. Against a partitioned index this prunes on
    `letter` (the reference's open-one-letter-file, helper_reduce.c:241)
    and pushes the word equality into the Parquet scan."""
    return index.filter((F.col("letter") == word[0]) & (F.col("word") == word))


def search_and(postings: DataFrame, terms: list[str]) -> DataFrame:
    """Docs containing ALL terms: iterated left-semi join on doc_id."""
    docs = postings.filter(F.col("word") == terms[0]).select("doc_id")
    for t in terms[1:]:
        docs = docs.join(
            postings.filter(F.col("word") == t).select("doc_id"), "doc_id", "left_semi"
        )
    return docs


def search_or(postings: DataFrame, terms: list[str]) -> DataFrame:
    """Docs containing ANY term: IN-filter + distinct."""
    return postings.filter(F.col("word").isin(terms)).select("doc_id").distinct()


def search_not(postings: DataFrame, include: str, exclude: str) -> DataFrame:
    """Docs containing `include` but not `exclude`: left-anti join."""
    inc = postings.filter(F.col("word") == include).select("doc_id")
    exc = postings.filter(F.col("word") == exclude).select("doc_id")
    return inc.join(exc, "doc_id", "left_anti")


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------


@register(
    "search_term_lookup",
    oracle=(
        f"SELECT doc_id, cnt FROM ({POSTINGS_SQL}) WHERE word = '{TERM_A}'"
    ),
    tier="implied",
    doc="Single-term lookup: the scan of ./index/<letter> the reference "
    "implies (helper_reduce.c:238-257).",
)
def q_term_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = postings_for(spark, sf_dir)
    return p.filter(F.col("word") == TERM_A).select("doc_id", "cnt")


@register(
    "search_and",
    oracle=(
        f"SELECT doc_id FROM ({POSTINGS_SQL}) WHERE word = '{TERM_A}' "
        f"AND doc_id IN (SELECT doc_id FROM ({POSTINGS_SQL}) WHERE word = '{TERM_B}')"
    ),
    tier="implied",
    doc="Multi-term AND search = left-semi join of posting lists on doc "
    "(SURVEY.md §2.3 J1/J3).",
)
def q_search_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    return search_and(postings_for(spark, sf_dir), [TERM_A, TERM_B])


@register(
    "search_or",
    oracle=(
        f"SELECT DISTINCT doc_id FROM ({POSTINGS_SQL}) "
        f"WHERE word IN ('{TERM_A}', '{TERM_B}')"
    ),
    tier="implied",
    doc="Multi-term OR search = union of posting lists (SURVEY.md §2.7).",
)
def q_search_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    return search_or(postings_for(spark, sf_dir), [TERM_A, TERM_B])


@register(
    "search_not",
    oracle=(
        f"SELECT doc_id FROM ({POSTINGS_SQL}) WHERE word = '{TERM_A}' "
        f"AND doc_id NOT IN (SELECT doc_id FROM ({POSTINGS_SQL}) WHERE word = '{TERM_NOT}')"
    ),
    tier="implied",
    doc="NOT search = left-anti join (SURVEY.md §2.3 J3).",
)
def q_search_not(spark: SparkSession, sf_dir: str) -> DataFrame:
    return search_not(postings_for(spark, sf_dir), TERM_A, TERM_NOT)


@register(
    "search_term_topk",
    oracle=(
        f"SELECT doc_id, cnt FROM ({POSTINGS_SQL}) WHERE word = '{TERM_A}' "
        "ORDER BY cnt DESC, doc_id LIMIT 10"
    ),
    tier="implied",
    doc="Top-k documents for a term, ranked by term frequency "
    "(SURVEY.md §2.6 O4); deterministic tie-break on doc_id.",
)
def q_search_term_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        postings_for(spark, sf_dir)
        .filter(F.col("word") == TERM_A)
        .select("doc_id", "cnt")
        .orderBy(F.desc("cnt"), "doc_id")
        .limit(10)
    )


@register(
    "search_topk_per_term",
    oracle=(
        "SELECT word, doc_id, cnt FROM ("
        "  SELECT word, doc_id, cnt, ROW_NUMBER() OVER ("
        "    PARTITION BY word ORDER BY cnt DESC, doc_id) AS rn "
        f"  FROM ({POSTINGS_SQL}) WHERE word IN ('{TERM_A}', '{TERM_B}', '{TERM_NOT}')"
        ") WHERE rn <= 3"
    ),
    tier="implied",
    doc="Best docs per term via ranking window (SURVEY.md §2.5 W1).",
)
def q_search_topk_per_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("word").orderBy(F.desc("cnt"), "doc_id")
    return (
        postings_for(spark, sf_dir)
        .filter(F.col("word").isin([TERM_A, TERM_B, TERM_NOT]))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("word", "doc_id", "cnt")
    )


@register(
    "search_doc_tf_vector",
    oracle=(
        "SELECT doc_id, list(word || ':' || cnt ORDER BY word) AS tf "
        f"FROM ({POSTINGS_SQL}) WHERE doc_id < 50 GROUP BY doc_id"
    ),
    tier="implied",
    doc="Per-doc term-frequency vector (SURVEY.md §2.4 A8), encoded as a "
    "sorted array of word:count strings for oracle comparability.",
)
def q_search_doc_tf_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        postings_for(spark, sf_dir)
        .filter(F.col("doc_id") < 50)
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.concat_ws(":", "word", "cnt"))
            ).alias("tf")
        )
    )
