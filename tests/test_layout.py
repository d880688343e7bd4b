"""Range-clustered sorted layout (sources/layout.py): footer-level
data-skipping evidence plus read-back correctness.

The claim under test: after ``write_range_clustered(key=l_shipdate)``,
parquet min/max statistics partition the key space so a range
predicate touches only the overlapping subset of files — the layout
that makes time-range scans sublinear at 100 TB.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from map_reduce_indexing_spark.sources.layout import write_lineitem_by_shipdate
from map_reduce_indexing_spark.sources.tables import load_table

from .conftest import SF_DIR_MID

N_FILES = 8


def _file_key_ranges(path: str) -> list[tuple]:
    """(min, max) of l_shipdate per data file, from footer statistics."""
    ranges = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index("l_shipdate")
        rg_stats = [md.row_group(i).column(idx).statistics for i in range(md.num_row_groups)]
        assert all(s is not None and s.has_min_max for s in rg_stats)
        ranges.append((min(s.min for s in rg_stats), max(s.max for s in rg_stats)))
    return ranges


def test_range_clustered_files_are_disjoint_and_skippable(spark, tmp_path):
    out = str(tmp_path / "li_by_shipdate")
    write_lineitem_by_shipdate(spark, SF_DIR_MID, out, n_files=N_FILES)

    ranges = _file_key_ranges(out)
    assert len(ranges) == N_FILES

    # Range partitioning ⇒ file key ranges are pairwise disjoint:
    # sorted by min, every file starts after the previous one ends.
    ordered = sorted(ranges)
    for (_, prev_max), (next_min, _) in zip(ordered, ordered[1:]):
        assert next_min >= prev_max

    # Data-skipping evidence: a one-year predicate overlaps a strict
    # subset of files — any min/max-aware reader skips the rest.
    # (INT64-micros UTC timestamps -> pyarrow stats are tz-aware.)
    import datetime

    utc = datetime.timezone.utc
    lo = datetime.datetime(1996, 1, 1, tzinfo=utc)
    hi = datetime.datetime(1997, 1, 1, tzinfo=utc)
    overlapping = [r for r in ranges if r[0] < hi and r[1] >= lo]
    assert 0 < len(overlapping) < N_FILES


def test_range_clustered_readback_matches_source(spark, tmp_path):
    out = str(tmp_path / "li_by_shipdate_rb")
    write_lineitem_by_shipdate(spark, SF_DIR_MID, out, n_files=N_FILES)

    pred = "l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'"
    back = spark.read.parquet(out).filter(pred)
    src = load_table(spark, SF_DIR_MID, "lineitem").filter(pred)
    assert back.count() == src.count() > 0

    # The predicate reaches the scan (PushedFilters), so footer stats
    # are actually consulted at read time.
    scan_plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in scan_plan
    assert "l_shipdate" in scan_plan.split("PushedFilters:")[1][:200]


def test_lsh_bucket_partitioned_embeddings_prune(spark, tmp_path):
    """The ANN/dedup scale posture stores embeddings partitioned by LSH
    bucket so a bucket lookup is a pruned scan; prove the pruning: a
    `bucket = k` read must touch only that Hive partition."""
    from pyspark.sql import functions as F

    from map_reduce_indexing_spark.operators.dedup import spark_lsh_bucket
    from .conftest import SF_DIR

    out = str(tmp_path / "emb_by_bucket")
    e = (
        spark.read.parquet(SF_DIR + "/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .withColumn("bucket", F.expr(spark_lsh_bucket("v")))
    )
    e.write.partitionBy("bucket").parquet(out)

    some_bucket = spark.read.parquet(out).select("bucket").head().bucket
    scan = spark.read.parquet(out).filter(F.col("bucket") == some_bucket)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert f"bucket#" in plan or "PartitionFilters" in plan
    assert "PartitionFilters: []" not in plan  # the filter reached the scan
    # semantic check: pruned read returns exactly that bucket's rows
    want = e.filter(F.col("bucket") == some_bucket).count()
    assert scan.count() == want > 0


def test_index_write_is_scale_bounded(spark, tmp_path):
    """The 100-TB layout claim of write_letter_partitioned: with a small
    forced per-file record bound, a hot letter is written as SEVERAL
    files (no single writer task / giant file per letter), the files of
    each letter cover pairwise-disjoint word ranges (a word lookup reads
    one file, not the whole partition), and rows stay word-sorted inside
    every file (zone maps survive)."""
    import collections
    import os

    from map_reduce_indexing_spark.operators.indexing import (
        build_postings,
        write_index,
    )
    from .conftest import SF_DIR

    path = str(tmp_path / "bounded_index")
    postings = build_postings(
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
    )
    write_index(postings, path, max_records_per_file=150)

    by_letter: dict[str, list[str]] = collections.defaultdict(list)
    for letter_dir in sorted(glob.glob(f"{path}/letter=*")):
        letter = os.path.basename(letter_dir).split("=", 1)[1]
        by_letter[letter] = sorted(glob.glob(f"{letter_dir}/*.parquet"))

    # A hot letter exceeds the record bound -> at least two files.
    assert any(len(files) >= 2 for files in by_letter.values()), {
        k: len(v) for k, v in by_letter.items()
    }

    for letter, files in by_letter.items():
        ranges = []
        for f in files:
            md = pq.ParquetFile(f).metadata
            assert md.num_rows <= 150  # the size bound held
            idx = md.schema.to_arrow_schema().get_field_index("word")
            stats = [
                md.row_group(i).column(idx).statistics
                for i in range(md.num_row_groups)
            ]
            assert all(s is not None and s.has_min_max for s in stats)
            ranges.append(
                (min(s.min for s in stats), max(s.max for s in stats))
            )
            # in-file word sort (zone maps stay monotone)
            words = [r.word for r in spark.read.parquet(f).collect()]
            assert words == sorted(words)
        # files within the letter are pairwise disjoint in word range
        ordered = sorted(ranges)
        for (_, prev_max), (next_min, _) in zip(ordered, ordered[1:]):
            assert next_min >= prev_max, (letter, ordered)

    # lossless: the bounded layout reads back to the exact postings
    assert spark.read.parquet(path).count() == postings.count()


# ---------------------------------------------------------------------------
# Z-order clustering
# ---------------------------------------------------------------------------

ZN_FILES = 16


def _file_ranges_for(path: str, col: str) -> list[tuple]:
    """(min, max) of `col` per data file, from footer statistics."""
    ranges = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        stats = [md.row_group(i).column(idx).statistics for i in range(md.num_row_groups)]
        assert all(s is not None and s.has_min_max for s in stats)
        ranges.append((min(s.min for s in stats), max(s.max for s in stats)))
    return ranges


def _overlapping(ranges: list[tuple], lo, hi) -> int:
    return sum(1 for mn, mx in ranges if mn <= hi and mx >= lo)


def test_zorder_skips_on_both_dimensions(spark, tmp_path):
    """The multi-dim claim: after z-ordering on (l_partkey, l_suppkey),
    footer stats prune files for a selective predicate on EITHER
    column, while the single-key range layout prunes only its own sort
    key (every file spans the full range of the other column)."""
    from pyspark.sql import functions as F

    from map_reduce_indexing_spark.sources.layout import (
        write_range_clustered,
        write_zorder_clustered,
    )

    li = load_table(spark, SF_DIR_MID, "lineitem")
    zpath = str(tmp_path / "li_zorder")
    rpath = str(tmp_path / "li_partkey_only")
    write_zorder_clustered(li, ["l_partkey", "l_suppkey"], zpath, ZN_FILES)
    write_range_clustered(li, "l_partkey", rpath, ZN_FILES)

    pk_min, pk_max, sk_min, sk_max = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).first()
    # bottom ~eighth of each key range
    pk_hi = pk_min + (pk_max - pk_min) // 8
    sk_hi = sk_min + (sk_max - sk_min) // 8

    z_pk = _overlapping(_file_ranges_for(zpath, "l_partkey"), pk_min, pk_hi)
    z_sk = _overlapping(_file_ranges_for(zpath, "l_suppkey"), sk_min, sk_hi)
    r_pk = _overlapping(_file_ranges_for(rpath, "l_partkey"), pk_min, pk_hi)
    r_sk = _overlapping(_file_ranges_for(rpath, "l_suppkey"), sk_min, sk_hi)

    # single-key layout: prunes its sort key, blind on the other
    assert 0 < r_pk < ZN_FILES
    assert r_sk == ZN_FILES
    # z-order: prunes on BOTH
    assert 0 < z_pk < ZN_FILES, (z_pk, ZN_FILES)
    assert 0 < z_sk < ZN_FILES, (z_sk, ZN_FILES)


def test_zorder_readback_matches_source(spark, tmp_path):
    from pyspark.sql import functions as F

    from map_reduce_indexing_spark.sources.layout import write_zorder_clustered

    li = load_table(spark, SF_DIR_MID, "lineitem")
    out = str(tmp_path / "li_zorder_rb")
    write_zorder_clustered(li, ["l_partkey", "l_suppkey"], out, ZN_FILES)

    back = spark.read.parquet(out)
    assert sorted(back.columns) == sorted(li.columns)  # curve column dropped
    assert back.count() == li.count()
    # box predicate returns identical row multiset
    pred = (F.col("l_partkey") <= 200) & (F.col("l_suppkey") <= 20)
    a = back.filter(pred).groupBy("l_orderkey").count()
    b = li.filter(pred).groupBy("l_orderkey").count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_bucketed_join_runs_without_input_exchanges(spark):
    """The co-location contract: both bucketed scans already satisfy
    the join's hash distribution, so the ONLY Exchange in the whole
    plan is the post-join aggregation — the join inputs are
    bucket-pruned scans + sorts, never a shuffle."""
    import re

    from map_reduce_indexing_spark.plans import registry
    from tests.conftest import SF_DIR

    df = registry.get("rel_bucketed_join_agg").fn(spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    from collections import Counter

    nodes = Counter(re.findall(r"\(\d+\) ([A-Za-z]+)", plan))
    assert nodes["SortMergeJoin"] == 1
    assert nodes["Exchange"] == 1  # only the final aggregation shuffles
    assert plan.count("SelectedBucketsCount") == 2  # both scans bucketed

    # and the results equal the plain-parquet join (layout-independent)
    from map_reduce_indexing_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR as _SFD

    o = load_table(spark, _SFD, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, _SFD, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    want = {
        r.priority: (r.n_orders, r.n_items, r.total_qty)
        for r in o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
        )
        .collect()
    }
    got = {
        r.priority: (r.n_orders, r.n_items, r.total_qty)
        for r in df.collect()
    }
    assert got == want


def test_bucketed_tables_rekey_on_corpus_content_change(spark, tmp_path):
    """Round 9 (ADVICE): the bucketed-table memo and names carry a
    content fingerprint — regenerating the corpus at the same path
    mid-application must produce NEW tables (with different names),
    not serve stale bucketed data."""
    import os
    import shutil

    from map_reduce_indexing_spark.sources.layout import (
        bucketed_fact_tables,
    )
    from tests.conftest import SF_DIR

    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    for t in ("orders", "lineitem"):
        shutil.copy(
            os.path.join(SF_DIR, f"{t}.parquet"),
            os.path.join(corpus, f"{t}.parquet"),
        )
    first = bucketed_fact_tables(spark, corpus)
    n_first = spark.table(first[0]).count()
    # regenerate: drop half the orders, rewrite both files
    from map_reduce_indexing_spark.sources.tables import load_table

    kept = (
        load_table(spark, corpus, "orders")
        .limit(max(1, n_first // 2))
        .toPandas()
    )
    os.remove(os.path.join(corpus, "orders.parquet"))
    kept.to_parquet(os.path.join(corpus, "orders.parquet"))
    second = bucketed_fact_tables(spark, corpus)
    assert second != first  # content-keyed names changed
    assert spark.table(second[0]).count() == max(1, n_first // 2)
