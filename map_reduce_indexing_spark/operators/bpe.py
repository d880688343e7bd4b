"""BPE tokenizer training over the corpus vocabulary (EXT tier).

The text tier counts BPE-ish segments (textstats.py's regex); this
module TRAINS the merges — the byte-pair-encoding loop every LLM
tokenizer pipeline runs (Sennrich et al., ACL'16), expressed
Spark-first:

  vocab    (word, freq) from the session tokens artifact — BPE trains
           on the word-frequency table, never the raw corpus, so the
           whole loop runs over ~|vocab| rows regardless of corpus
           size (the 100-TB posture: one corpus-pass to build the
           artifact, then vocab-sized training rounds).
  round r  adjacent-symbol pair counts weighted by word frequency
           (per-row transform over the split symbol string + one
           pair-keyed aggregation), argmax pair by (count DESC, pair
           ASC) — a bounded 1-row model fetch, the same declared
           pattern as the k-means centroid collects — then the merge
           applied to every word's symbol string by a LEFT FOLD.

The fold is the determinism keystone: both engines run the identical
greedy leftmost non-overlapping merge as a string accumulator fold —
Spark `aggregate(...)`, DuckDB `list_reduce(...)` — appending the
second symbol to the accumulator when it ends with the first symbol
(symbol boundary = the space separator, so 'x'+'a' never false-matches
a pair starting with 'a'). "a a a" + merge(a,a) -> "aa a" on both.
Symbols are [a-z]+ by the tokenizer contract, so inlining them in SQL
literals needs no escaping.

The oracle unrolls all N_BPE_MERGES rounds as CTE chains (same
discipline as the k-means oracles) and must reproduce the learned
merge table bit-for-bit — pair identity AND count per round.

Reference parity: the reference has no tokenizer training (its
tokenizer is the fixed §0.1 pipeline); this is the extension tier's
train-then-serve story applied to the tokenizer itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..localrel import local_rows_df
from ..plans.registry import register
from .indexing import TOKENS_SQL

N_BPE_MERGES = 6


def _spark_char_seq(word: str) -> str:
    """Space-joined characters of `word` (the round-0 symbol string)."""
    return (
        f"concat_ws(' ', transform(sequence(1, length({word})), "
        f"i -> substring({word}, i, 1)))"
    )


def _spark_merge_fold(seq: str, a: str, b: str) -> str:
    """Greedy leftmost non-overlapping application of merge (a, b) to
    the symbol string `seq`, as a left fold. `a`/`b` are [a-z]+ symbol
    literals (inlined unquoted-safe by the tokenizer contract)."""
    return (
        f"aggregate(split({seq}, ' '), '', (acc, x) -> "
        f"CASE WHEN acc = '' THEN x "
        f"WHEN (acc = '{a}' OR endswith(acc, ' {a}')) AND x = '{b}' "
        f"THEN concat(acc, '{b}') "
        f"ELSE concat(acc, ' ', x) END)"
    )


def bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, freq, seq): the word-frequency table with each word
    split to its character symbol string."""
    from .tokens import token_rows

    return (
        token_rows(spark, sf_dir, out_col="word")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("seq", F.expr(_spark_char_seq("word")))
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent-symbol pair counts weighted by word freq —
    a per-row transform over the split symbol string plus ONE pair-
    keyed aggregation (1-symbol words contribute nothing: sequence's
    descending-for-empty trap is guarded by the size test)."""
    pairs = F.expr(
        "CASE WHEN size(split(seq, ' ')) >= 2 THEN "
        "transform(sequence(1, size(split(seq, ' ')) - 1), "
        "i -> struct(element_at(split(seq, ' '), i) AS a, "
        "element_at(split(seq, ' '), i + 1) AS b)) "
        "ELSE array() END"
    )
    return (
        vocab.select("freq", F.explode(pairs).alias("p"))
        .groupBy("p.a", "p.b")
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


# Above this many merge rounds, train_bpe_merges collects the (bounded,
# vocab-sized) word-frequency table ONCE and runs the merge loop
# driver-local: production tokenizers run 30k-50k merges, and one Spark
# job per merge would mean 30k sequential jobs whose per-round input
# never exceeds the vocab anyway. Same auto-switch discipline as
# assign_nearest's ASSIGN_LITERAL_MAX_K; the per-round Spark path stays
# the oracle-checkable contract at small N (and the local loop is
# pinned merge-for-merge against it, and against the pure-Python
# reference at N=50+, in tests/test_bpe.py).
BPE_SPARK_ROUNDS_MAX = 8


def _local_merge(symbols: list[str], a: str, b: str) -> list[str]:
    """Greedy leftmost non-overlapping merge — the driver-local replay
    of _spark_merge_fold's accumulator semantics."""
    out: list[str] = []
    i = 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def train_bpe_merges_from_vocab(
    vocab: dict[str, int], n_merges: int
) -> list[dict]:
    """Driver-local BPE training over a collected word-frequency table
    with INCREMENTAL pair-count maintenance (the Sennrich-style index:
    only words containing the merged pair are recounted), so 30k
    merges cost total-affected-symbols work, not
    n_merges * total-symbols. Identical argmax order to the Spark
    loop: (count DESC, pair ASC), stop below count 2."""
    from collections import Counter, defaultdict

    seqs = {w: list(w) for w in vocab}
    counts: Counter = Counter()
    where: dict[tuple[str, str], set] = defaultdict(set)
    for w, f in vocab.items():
        s = seqs[w]
        for i in range(len(s) - 1):
            counts[(s[i], s[i + 1])] += f
            where[(s[i], s[i + 1])].add(w)
    merges: list[dict] = []
    for r in range(n_merges):
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append(
            {"rank": r, "a": a, "b": b, "merged": a + b, "cnt": int(cnt)}
        )
        for w in list(where[(a, b)]):
            f = vocab[w]
            old = seqs[w]
            for i in range(len(old) - 1):
                p = (old[i], old[i + 1])
                counts[p] -= f
                if counts[p] <= 0:
                    del counts[p]
                where[p].discard(w)
            new = _local_merge(old, a, b)
            seqs[w] = new
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                counts[p] += f
                where[p].add(w)
    return merges


def train_bpe_merges(
    spark: SparkSession,
    sf_dir: str,
    n_merges: int = N_BPE_MERGES,
    driver_local: bool | None = None,
) -> list[dict]:
    """The Lloyd-style training loop for the tokenizer: n_merges rounds
    of (pair count -> 1-row argmax fetch -> fold merge into every
    word's symbol string). Returns the learned merge table
    [{rank, a, b, merged, cnt}, ...]; stops early if no pair occurs
    twice (merging a count-1 pair learns nothing). Above
    BPE_SPARK_ROUNDS_MAX merges (or with driver_local=True) the
    word-frequency table is collected once — a bounded vocab-sized
    model fetch, the same discipline as the k-means centroid
    collects — and the loop runs driver-local with incremental pair
    counts (train_bpe_merges_from_vocab), merge-for-merge equal by
    construction and by test."""
    if driver_local is None:
        driver_local = n_merges > BPE_SPARK_ROUNDS_MAX
    if driver_local:
        vocab = {
            r["word"]: int(r["freq"])
            for r in bpe_vocab(spark, sf_dir).select("word", "freq").collect()
        }
        return train_bpe_merges_from_vocab(vocab, n_merges)
    from ..checkpoints import release_local_checkpoint

    vocab = bpe_vocab(spark, sf_dir).localCheckpoint(eager=True)
    merges: list[dict] = []
    for r in range(n_merges):
        best = (
            _pair_counts(vocab)
            .orderBy(F.desc("cnt"), "a", "b")
            .head(1)  # bounded model fetch, like the centroid collects
        )
        if not best or best[0]["cnt"] < 2:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append(
            {"rank": r, "a": a, "b": b, "merged": a + b, "cnt": cnt}
        )
        prev = vocab
        vocab = vocab.withColumn(
            "seq", F.expr(_spark_merge_fold("seq", a, b))
        ).localCheckpoint(eager=True)
        # the new round is materialized; the previous round's blocks are
        # no longer reachable from anything this function returns (r15:
        # bounded storage per call instead of one pinned copy per round)
        release_local_checkpoint(prev)
    # the returned value is the driver-side merge list — the last
    # vocab checkpoint is not referenced by it either
    release_local_checkpoint(vocab)
    return merges


def apply_bpe(
    vocab: DataFrame, merges: list[dict], seq_col: str = "seq"
) -> DataFrame:
    """Serve a learned merge table: apply the merges in rank order to a
    (.., seq) frame — the encode half of train-then-serve (chained
    folds over the small merge list; each is a map-only expression)."""
    out = vocab
    for m in sorted(merges, key=lambda m: m["rank"]):
        out = out.withColumn(
            seq_col, F.expr(_spark_merge_fold(seq_col, m["a"], m["b"]))
        )
    return out


def _duck_bpe_ctes(n_merges: int = N_BPE_MERGES) -> str:
    """The whole training loop unrolled as CTEs: vocab0 (char split),
    then per round pair counts -> top-1 -> list_reduce fold (the
    Spark fold's exact semantics; probed green on 'a a a')."""
    parts = [
        f"toks AS ({TOKENS_SQL})",
        """vocab0 AS (
            SELECT word, COUNT(*) AS freq,
                   array_to_string(list_transform(range(1, len(word) + 1),
                       i -> word[i]), ' ') AS seq
            FROM toks GROUP BY word)""",
    ]
    for r in range(n_merges):
        parts.append(
            f"""p{r} AS (
            SELECT pr.a AS a, pr.b AS b, CAST(SUM(freq) AS BIGINT) AS cnt
            FROM (
                SELECT freq,
                       unnest(list_transform(range(1, len(s)),
                           i -> struct_pack(a := s[i], b := s[i + 1]))) AS pr
                FROM (SELECT freq, string_split(seq, ' ') AS s FROM vocab{r})
                WHERE len(s) >= 2)
            GROUP BY 1, 2)"""
        )
        parts.append(
            f"b{r} AS (SELECT a, b, cnt FROM p{r} "
            f"ORDER BY cnt DESC, a, b LIMIT 1)"
        )
        parts.append(
            f"""vocab{r + 1} AS (
            SELECT word, freq,
                   list_reduce(string_split(seq, ' '), (acc, x) ->
                       CASE WHEN (acc = bb.a OR ends_with(acc, ' ' || bb.a))
                                 AND x = bb.b
                            THEN acc || bb.b
                            ELSE acc || ' ' || x END) AS seq
            FROM vocab{r} CROSS JOIN b{r} bb)"""
        )
    return ",\n".join(parts)


def _duck_bpe_merges_sql(n_merges: int = N_BPE_MERGES) -> str:
    rows = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS rank, a AS pair_a, b AS pair_b, "
        f"a || b AS merged, cnt AS n_pair FROM b{r} WHERE cnt >= 2"
        for r in range(n_merges)
    )
    return f"WITH {_duck_bpe_ctes(n_merges)} {rows}"


@register(
    "text_bpe_merges",
    oracle=_duck_bpe_merges_sql(),
    tier="llm",
    doc=f"BPE tokenizer training: the {N_BPE_MERGES} highest-frequency "
    "adjacent-symbol merges learned over the word-frequency table "
    "(greedy leftmost fold application each round, count-DESC/pair-ASC "
    "argmax, counts weighted by word frequency). Training cost is "
    "vocab-sized per round, never corpus-sized — the corpus is touched "
    "once, by the tokens artifact. The oracle unrolls every round as "
    "CTEs (pair counts -> top-1 -> list_reduce fold) and must match "
    "the learned table bit-for-bit, merge identity AND count.",
)
def q_text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges = train_bpe_merges(spark, sf_dir)
    return local_rows_df(
        spark,
        [
            (m["rank"], m["a"], m["b"], m["merged"], m["cnt"])
            for m in merges
        ],
        "rank long, pair_a string, pair_b string, merged string, n_pair long",
    )


@register(
    "text_bpe_merges_local",
    oracle=_duck_bpe_merges_sql(),
    tier="llm",
    export=False,  # pytest + sweep variant: the driver-local trainer
    doc=f"The driver-local merge loop (train_bpe_merges_from_vocab) "
    f"pinned at N={N_BPE_MERGES} against the SAME unrolled-CTE oracle "
    "as text_bpe_merges: one bounded vocab fetch, incremental "
    "pair-count maintenance, zero per-merge Spark jobs — the "
    "production form for 30k+ merge tokenizers, cross-engine-checked "
    "at contract scale.",
)
def q_text_bpe_merges_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges = train_bpe_merges(spark, sf_dir, driver_local=True)
    return local_rows_df(
        spark,
        [
            (m["rank"], m["a"], m["b"], m["merged"], m["cnt"])
            for m in merges
        ],
        "rank long, pair_a string, pair_b string, merged string, n_pair long",
    )


@register(
    "text_bpe_pair_counts",
    oracle=f"""
        WITH {_duck_bpe_ctes(0)}
        SELECT pr.a AS pair_a, pr.b AS pair_b,
               CAST(SUM(freq) AS BIGINT) AS n_pair
        FROM (
            SELECT freq,
                   unnest(list_transform(range(1, len(s)),
                       i -> struct_pack(a := s[i], b := s[i + 1]))) AS pr
            FROM (SELECT freq, string_split(seq, ' ') AS s FROM vocab0)
            WHERE len(s) >= 2)
        GROUP BY 1, 2
        ORDER BY n_pair DESC, pair_a, pair_b LIMIT 20
    """,
    tier="llm",
    export=False,  # pytest + sweep variant: round 0 of the trainer
    doc="Round 0 of BPE training in isolation: the top-20 adjacent "
    "CHARACTER pairs by frequency-weighted count — the statistic the "
    "trainer's first argmax consumes, pinned separately so a trainer "
    "regression is attributable (pair mining vs fold application).",
)
def q_text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = _pair_counts(bpe_vocab(spark, sf_dir))
    return (
        counts.orderBy(F.desc("cnt"), "a", "b")
        .limit(20)
        .select(
            F.col("a").alias("pair_a"),
            F.col("b").alias("pair_b"),
            F.col("cnt").alias("n_pair"),
        )
    )


@register(
    "text_bpe_doc_tokens",
    oracle=f"""
        WITH {_duck_bpe_ctes()},
        wl AS (
            SELECT word, len(string_split(seq, ' ')) AS n_sym
            FROM vocab{N_BPE_MERGES})
        SELECT t.doc_id,
               CAST(SUM(wl.n_sym) AS BIGINT) AS n_bpe_trained_tokens,
               CAST(SUM(len(t.word)) AS BIGINT) AS n_chars_tokenized
        FROM toks t JOIN wl ON t.word = wl.word
        GROUP BY t.doc_id
    """,
    tier="llm",
    doc="Token accounting under the TRAINED tokenizer (the serve half "
    "of text_bpe_merges): each word's symbol count after applying the "
    "learned merges, summed per document — the number that sizes "
    "context windows and training budgets, computed as a vocab-sized "
    "encode (apply_bpe over distinct words) broadcast-joined back to "
    "the token stream; the corpus is never re-scanned per merge. "
    "n_chars_tokenized (the merge-free ceiling) rides along so the "
    "compression the merges bought is visible per doc.",
)
def q_text_bpe_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .tokens import token_rows

    merges = train_bpe_merges(spark, sf_dir)
    encoded = apply_bpe(bpe_vocab(spark, sf_dir), merges).select(
        "word", F.size(F.split("seq", " ")).cast("long").alias("n_sym")
    )
    return (
        token_rows(spark, sf_dir, out_col="word")
        .join(F.broadcast(encoded), "word")
        .groupBy("doc_id")
        .agg(
            F.sum("n_sym").cast("long").alias("n_bpe_trained_tokens"),
            F.sum(F.length("word")).cast("long").alias("n_chars_tokenized"),
        )
    )
