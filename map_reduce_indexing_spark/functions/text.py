"""Text normalization — exact parity with the reference map pipeline.

Reference (helper_map.c:166-168):

    tr ' ' '\\n' | tr '[:upper:]' '[:lower:]' | sed -e 's/[^a-z]//g'
      | sort | uniq -c | awk '{print $2" "$1}'

Normative rules (SURVEY.md §0.1, empirically probed):

1. Token separators are SPACE and NEWLINE only. Tabs do NOT split —
   ``times\\tcat-dog`` collapses to ``timescatdog`` after rule 3.
2. Lowercase the whole stream.
3. Delete every character outside [a-z] *within* each token.
4. Drop empty tokens (the reference's alpha partitioner silently drops
   them, helper_map.c:357-360; they never reach the index).

Everything here is built-in Column expressions — JVM-side, inside
whole-stage codegen. No UDF is needed for reference parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def normalize_tokens_expr(text: Column | str) -> Column:
    """`text` -> array<string> of normalized non-empty tokens.

    Split on space/newline only (rule 1), lowercase (2), strip [^a-z]
    within tokens (3), drop empties (4).
    """
    col = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.lower(col), "[ \n]", -1)
    cleaned = F.transform(toks, lambda t: F.regexp_replace(t, "[^a-z]", ""))
    return F.filter(cleaned, lambda t: t != F.lit(""))


def tokenize(df: DataFrame, text_col: str = "text", out_col: str = "word") -> DataFrame:
    """Explode a document DataFrame into one row per token occurrence.

    Keeps all other columns; the exploded column is `out_col`.

    Physical shape: run the character-strip regex ONCE over the whole
    lowered document, then split/explode. Deleting characters that are
    not separators can neither create nor destroy a space/newline
    boundary, so this is exactly equivalent to stripping within each
    token after the split (rule 3) — but it is one regex pass per
    document instead of one per token: measured 3-5x faster than the
    per-token formulation on a 95 MB corpus (2s vs 7-11s, local[32]),
    and ~10x faster than transform/filter array HOFs (interpreted, not
    codegen). Equivalence is property-tested in test_tokenizer.py.
    """
    cleaned = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z \n]", "")
    raw = df.withColumn(out_col, F.explode(F.split(cleaned, "[ \n]", -1)))
    return raw.filter(F.col(out_col) != "")


# DuckDB-side rendering of the same rules, used by oracle SQL strings.
# (FIXTURES.md §2 documents this as the oracle formulation.)
def duckdb_tokens_sql(text_expr: str = "text") -> str:
    """A DuckDB table-expression fragment producing one row per token.

    Usage: f"SELECT ... FROM (SELECT doc_id, {duckdb_tokens_sql()} AS word
    FROM documents) WHERE word <> ''".
    """
    return (
        "regexp_replace(unnest(string_split(lower(replace({t}, chr(10), ' ')), ' ')), "
        "'[^a-z]', '', 'g')"
    ).format(t=text_expr)
