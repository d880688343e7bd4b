"""Differential tokenizer tests: Spark expression chain vs the reference's
exact shell pipeline (helper_map.c:166) on adversarial strings.

Validates the SURVEY.md §0.1 rules: space/newline-only splitting (tabs do
NOT split), lowercasing, [^a-z] stripping inside tokens, empty-token drop.
"""

from __future__ import annotations

import collections
import subprocess

import pytest

from map_reduce_indexing_spark.functions.text import normalize_tokens_expr, tokenize

MAP_PIPELINE = (
    "tr ' ' '\\n' | tr '[:upper:]' '[:lower:]' | sed -e 's/[^a-z]//g' "
    "| sort | uniq -c | awk '{print $2\" \"$1}'"
)


def shell_counts(text: str) -> dict[str, int]:
    """Run the reference map pipeline; drop the blank key the alphabetic
    partitioner drops (helper_map.c:357-360)."""
    out = subprocess.run(
        MAP_PIPELINE, shell=True, input=text.encode(), capture_output=True, check=True
    ).stdout.decode()
    counts: dict[str, int] = {}
    for line in out.splitlines():
        parts = line.split(" ")
        if parts[0]:
            counts[parts[0]] = int(parts[1])
    return counts


def python_tokens(text: str) -> list[str]:
    """Pure-python rendering of the §0.1 rules (second oracle)."""
    toks = text.replace("\n", " ").lower().split(" ")
    toks = ["".join(c for c in t if "a" <= c <= "z") for t in toks]
    return [t for t in toks if t]


CASES = [
    "Don'T stop! 42 times\tcat-dog cat",
    "Hello, World!  double  space",
    "tabs\tdo\tnot\tsplit but spaces do",
    "line one\nline TWO\n\npunct-only: !!! ...",
    "42 1234 ---",
    "",
    "   ",
    "MiXeD CaSe WoRdS",
    "apostrophe's and hyphen-ated under_scored",
    "trailing space \nand newline\n",
]


@pytest.mark.parametrize("text", CASES)
def test_spark_matches_shell_pipeline(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(normalize_tokens_expr("text").alias("toks")).head()[0]
    assert collections.Counter(got) == shell_counts(text)
    assert got == python_tokens(text)  # order-preserving check too


@pytest.mark.parametrize("text", CASES)
def test_tokenize_hot_path_matches_shell_pipeline(spark, text):
    """The production explode path (per-document regex formulation,
    functions/text.py:tokenize) against the same shell oracle."""
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    words = [r.word for r in tokenize(df).select("word").collect()]
    assert collections.Counter(words) == shell_counts(text)


def test_property_random_ascii(spark):
    import random

    rng = random.Random(42)
    alphabet = "abcDEF '-.!42\t\n xyz"
    texts = ["".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 80))) for _ in range(60)]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select("text", normalize_tokens_expr("text").alias("toks")).collect()
    for r in rows:
        assert collections.Counter(r.toks) == shell_counts(r.text), repr(r.text)


def test_differential_vs_python_oracle_full_ascii(spark):
    """Differential test over the full control+printable ASCII range:
    the Spark expression chain must equal the pure-python rendering of
    the §0.1 rules (seeded generation so the corpus is reproducible;
    one Spark job over the whole batch keeps this fast)."""
    import random

    rng = random.Random(123)
    alphabet = "".join(chr(c) for c in range(0x09, 0x7F))
    examples = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 60)))
        for _ in range(50)
    ] + ["a\tb", "A  B", "''", "\n\n", "x-y z"]
    df = spark.createDataFrame(list(enumerate(examples)), "i long, text string")
    rows = df.select("i", normalize_tokens_expr("text").alias("toks")).collect()
    by_i = {r.i: r.toks for r in rows}
    for i, text in enumerate(examples):
        assert by_i[i] == python_tokens(text), repr(text)


def test_property_tokenize_equals_array_path(spark):
    """The per-document-regex explode path and the per-token array path
    are provably equivalent (deleting non-separator chars cannot move a
    token boundary); property-check it on random strings."""
    import random

    rng = random.Random(7)
    alphabet = "abcDEF '-.!42\t\n xyz"
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 120)))
        for _ in range(80)
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    via_tokenize = {
        (r.doc_id, r.word): r.cnt
        for r in tokenize(df).groupBy("doc_id", "word").count().withColumnRenamed("count", "cnt").collect()
    }
    rows = df.select("doc_id", normalize_tokens_expr("text").alias("toks")).collect()
    via_array: dict[tuple[int, str], int] = {}
    for r in rows:
        for w, n in collections.Counter(r.toks).items():
            via_array[(r.doc_id, w)] = n
    assert via_tokenize == via_array


def test_hypothesis_python_oracle_matches_shell_pipeline():
    """Property-based cross-validation of the two oracles themselves:
    for ANY printable-ASCII string, the pure-python rendering of the
    §0.1 rules must count-match the reference's actual shell pipeline.
    Hypothesis shrinks any counterexample to a minimal failing string."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=120, deadline=None)
    @given(
        st.text(
            alphabet=st.characters(min_codepoint=0x09, max_codepoint=0x7E),
            max_size=80,
        )
    )
    def check(text):
        assert collections.Counter(python_tokens(text)) == shell_counts(text)

    check()
