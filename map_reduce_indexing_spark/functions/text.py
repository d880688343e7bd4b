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

    Physical shape: explode the raw split FIRST, then normalize each
    token as a plain row-level expression — everything stays in
    whole-stage codegen. (Normalizing inside the array via
    transform/filter HOFs is semantically identical but interpreted,
    ~5x slower on the hot path, measured at sf0.1.)
    """
    raw = df.withColumn(
        out_col, F.explode(F.split(F.lower(F.col(text_col)), "[ \n]", -1))
    )
    return raw.withColumn(out_col, F.regexp_replace(out_col, "[^a-z]", "")).filter(
        F.col(out_col) != ""
    )


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
