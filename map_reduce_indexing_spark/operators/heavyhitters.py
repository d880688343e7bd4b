"""Heavy hitters at scale: per-partition Misra-Gries candidates, then
an exact recount of candidates only (SURVEY.md §2 EXT tier; the sketch
family next to dedup_minhash_* and ann_pq_*).

The reference's vocabulary queries (WordCount.java:43-67 semantics)
materialize the FULL word histogram and then look at the head. At
100 TB the full histogram is itself huge (the long tail dominates the
shuffle), while the questions people actually ask — "which tokens
exceed 0.2% of the corpus?" — have tiny answers. The classic two-pass
answer:

  pass 1  mapInPandas Misra-Gries summary per input partition with k
          counters. Mergeable-summaries guarantee (Agarwal et al.,
          PODS'12): any item with global frequency >= n/k survives in
          the union of per-partition summaries. Output is <= k rows
          per partition — no shuffle of the tail, ever.
  pass 2  broadcast the candidate set, left-semi filter the token
          stream, exact COUNT only for candidates, threshold filter.

The final output is therefore EXACT (identical to the full-histogram
answer, which is what the DuckDB oracle computes) while shuffling
only |candidates| * partitions rows instead of |vocab| rows. With
k = 2 * den/num (twice the inverse support) the guarantee covers the
threshold with 2x margin.

The support threshold is a rational num/den and the cutoff is computed
with integer ceil division ((n*num + den - 1) div den) on BOTH engines
— no float boundary drift at exact multiples.

mapInPandas is the genuinely-imperative path here (a decaying counter
set has no DataFrame expression form); each Arrow batch is first
reduced with vectorized value_counts, then MG-merged into the running
summary, so Python work is per-distinct-value per batch, not per row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.registry import register
from .indexing import TOKENS_SQL

# Support = PHI_NUM / PHI_DEN of total occurrences (0.2%).
PHI_NUM = 2
PHI_DEN = 1000


def misra_gries_candidates(items: DataFrame, col: str, k: int) -> DataFrame:
    """<= k candidate values per input partition, guaranteed to include
    every value with global count >= n/k.

    Per batch: exact value_counts (vectorized), then the standard MG
    merge — add summaries, and if more than k keys remain, subtract
    the (k+1)-th largest count from all and drop the non-positive.
    MG summaries are mergeable with additive error, so the
    per-partition guarantee (count_p deviation <= n_p/k) holds
    regardless of batch boundaries.
    """

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary: pd.Series | None = None
        for pdf in batches:
            counts = pdf[col].value_counts()
            summary = counts if summary is None else summary.add(counts, fill_value=0)
            if len(summary) > k:
                cut = summary.nlargest(k + 1).iloc[-1]
                summary = (summary - cut)[lambda s: s > 0]
        if summary is not None and len(summary):
            yield pd.DataFrame({col: summary.index})

    return items.select(col).mapInPandas(part, f"{col} string")


def recount_candidates(
    items: DataFrame,
    cands: DataFrame,
    col: str,
    phi_num: int = PHI_NUM,
    phi_den: int = PHI_DEN,
) -> DataFrame:
    """Pass 2, shared with the streaming sketch (stream_heavy_hitters):
    exact COUNT of candidate values only (broadcast candidate prune)
    + the integer-ceil support threshold. Candidate SOURCE differs
    (per-partition MG vs per-key-range stream state); the recount and
    threshold must be one code path or the two operators drift from
    the shared full-histogram oracle.

    ONE pass over `items` (r14; previously two — a count(*) for the
    threshold plus a semi-join recount): non-candidates fold into a
    single NULL group (map-side combined, so the tail still never
    crosses the shuffle un-aggregated), making n_total = SUM(cnt) over
    the <= k+1 groups — exact, from the same scan. The total rides a
    single-partition window over those k+1 rows instead of a second
    corpus aggregate."""
    from pyspark.sql import Window

    # distinct: a duplicate candidate under a plain (non-semi) join
    # would fan out item rows and corrupt both cnt and the total
    marked = items.join(
        F.broadcast(
            cands.select(col).distinct().withColumn("__cand", F.lit(1))
        ),
        col,
        "left",
    )
    grouped = (
        marked.groupBy(
            F.when(F.col("__cand").isNotNull(), F.col(col)).alias(col)
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return (
        grouped.withColumn(
            "n_total", F.sum("cnt").over(Window.partitionBy())
        )
        .filter(
            F.col(col).isNotNull()
            & (
                F.col("cnt")
                >= F.expr(
                    f"(n_total * {phi_num} + {phi_den - 1}) div {phi_den}"
                )
            )
        )
        .select(col, "cnt")
    )


def exact_heavy_hitters(
    items: DataFrame, col: str, phi_num: int = PHI_NUM, phi_den: int = PHI_DEN
) -> DataFrame:
    """Exact counts of every value with count >= ceil(n * phi)."""
    k = 2 * phi_den // phi_num  # 2x margin over the 1/phi minimum
    cands = misra_gries_candidates(items, col, k).distinct()
    return recount_candidates(items, cands, col, phi_num, phi_den)


def _hh_oracle(tokens_sql: str, col: str) -> str:
    return f"""
        WITH toks AS ({tokens_sql}),
        n AS (SELECT count(*) AS n_total FROM toks)
        SELECT {col}, CAST(count(*) AS BIGINT) AS cnt
        FROM toks, n
        GROUP BY {col}, n_total
        HAVING count(*) >= (n_total * {PHI_NUM} + {PHI_DEN - 1}) // {PHI_DEN}
    """


@register(
    "index_heavy_hitters",
    oracle=_hh_oracle(TOKENS_SQL, "word"),
    tier="implied",
    doc="Tokens exceeding 0.2% of the corpus, exactly — via per-partition "
    "Misra-Gries candidates + candidate-only recount. Shuffles O(k * "
    "partitions), never the vocabulary tail. Oracle is the full "
    "histogram + HAVING, so the sketch's exactness is what's verified.",
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .tokens import token_rows

    tokens = token_rows(spark, sf_dir, out_col="word").select("word")
    return exact_heavy_hitters(tokens, "word")


# One row per in-document bigram occurrence; the order-correct
# formulation proven by index_bigram_postings (search.py:483-501):
# generate_subscripts keeps DuckDB's token order, the rn self-join
# pairs adjacent tokens.
_BIGRAMS_SQL = """
    WITH toks AS (
        SELECT doc_id, word, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
        FROM (
            SELECT doc_id, unnest(words) AS word,
                   generate_subscripts(words, 1) AS pos
            FROM (
                SELECT doc_id,
                       list_filter(list_transform(
                           string_split(replace(lower(text), chr(10), ' '), ' '),
                           t -> regexp_replace(t, '[^a-z]', '', 'g')), t -> t <> '') AS words
                FROM documents)
        )
    )
    SELECT a.word || ' ' || b.word AS word
    FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.rn = a.rn + 1
"""


@register(
    "index_heavy_hitters_bigram",
    export=False,  # pytest-verified variant: same machinery, larger domain
    oracle=_hh_oracle(_BIGRAMS_SQL, "word"),
    tier="implied",
    doc="Heavy hitters over within-document word bigrams — the n-gram "
    "domain is |vocab|^2, which is where candidate pruning starts to "
    "pay even at fixture scale. Bigrams are built order-safely from "
    "the per-document token array (zip_with of the array against its "
    "own tail), no window needed.",
)
def q_heavy_hitters_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .tokens import tokenized_docs

    arr = tokenized_docs(spark, sf_dir).select(F.col("ws").alias("toks"))
    tail_len = F.greatest(F.size("toks") - 1, F.lit(0))
    bigrams = arr.select(
        F.explode(
            F.zip_with(
                F.slice("toks", 1, tail_len),
                F.slice("toks", 2, tail_len),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("word")
    )
    return exact_heavy_hitters(bigrams, "word")
