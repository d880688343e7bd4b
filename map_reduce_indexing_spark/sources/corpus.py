"""Text-corpus source: the reference's input domain.

The reference reads one plain-text file per document under
``./data/<collection>/<doc>`` (worker.c:188-190) and derives the doc name
by stripping directories and extension (get_origin_name, worker.c:285-302).
Spark equivalent: a wholetext read plus `input_file_name()` string surgery
— no manual byte-range splitting (worker.c:179-229) needed, Spark plans
input splits itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_corpus_dir(spark: SparkSession, glob_path: str) -> DataFrame:
    """Read a `<collection>/<doc>` text tree into (doc_id, collection, text).

    One row per document (`wholetext`), mirroring the reference's
    one-file-one-job model but scanned in parallel.
    """
    # NB: must pass wholetext as the .text() kwarg — PySpark's .text()
    # sets the option itself and would override .option("wholetext").
    raw = spark.read.text(glob_path, wholetext=True)
    fname = F.input_file_name()
    return raw.select(
        F.regexp_extract(fname, r"([^/]+?)(\.[^./]*)?$", 1).alias("doc_id"),
        F.element_at(F.split(fname, "/"), -2).alias("collection"),
        F.col("value").alias("text"),
    )
