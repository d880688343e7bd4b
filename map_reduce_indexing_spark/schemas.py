"""Central schema declarations (SURVEY.md §1.2-1.3).

The reference has exactly three scalar types, all text-encoded: string,
int (atoi — helper_reduce.c:99,112), and an implicit first-letter char
routing key (helper_reduce.c:255). Here every artifact gets an explicit
StructType; counts are LongType because at 100 TB int32 overflows.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---- reference-domain artifacts -------------------------------------------

# One row per document (reference: one file under ./data/<collection>/<doc>,
# worker.c:188-190).
DOCUMENT = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

# A posting: the reference's `word docname count` line (helper_reduce.c:149-155).
POSTING = T.StructType(
    [
        T.StructField("word", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("cnt", T.LongType(), False),
    ]
)

# The master index adds the first-letter routing key (helper_reduce.c:255);
# persisted as a Hive partition column so term lookups prune 25/26 of the data.
INDEX = T.StructType(POSTING.fields + [T.StructField("letter", T.StringType(), False)])

# ---- fixture tables (TESTDATA.md; driver-generated, read-only) -------------

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),  # JSON
    ]
)

EMBEDDING = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

# All fixture tables available under /root/testdata/sf*/ (TESTDATA.md).
FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
