"""The lakehouse tier end to end: tags, file skipping, bloom point
lookups, incremental materialized views, and view routing (round 9,
sources/generations.py + operators/matview.py).

One managed store, one lifecycle:

1. land a first batch, publish a generation with bloom sidecars, TAG
   it 'train-v1' (the tag blocks retention expiry until dropped);
2. keep appending — each publish records footer min/max + blooms for
   the NEW files only;
3. serve four query shapes without ever full-scanning:
   - a range query pruned by manifest min/max (no listing, no footer
     opens at query time);
   - a point lookup pruned by bloom sidecars (the key column is
     unclustered — bounds can't help);
   - the pinned read at the tag (exactly the training snapshot);
   - generation_diff since the tag (exactly what arrived after it);
4. maintain a materialized aggregate incrementally — counts, exact
   sums, and DISTINCT keys via the support-table IVM — refreshing
   with only the appended files, and answer a coarser GROUP BY from
   the view's stored partials alone (routing);
5. (round 10) DELETE one source's rows copy-on-write — the tagged
   snapshot still serves every original row, and the view's next
   refresh RETRACTS exactly (the signed change feed over only the
   rewritten files; a rewrite span is never key-diffed).

    python examples/lakehouse_tour.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from map_reduce_indexing_spark.operators.matview import (  # noqa: E402
    create_matview,
    read_matview,
    refresh_matview,
    rollup_matview,
)
from map_reduce_indexing_spark.session import get_spark  # noqa: E402
from map_reduce_indexing_spark.sources.generations import (  # noqa: E402
    generation_diff,
    plan_generation_scan,
    publish_generation,
    read_generation,
    tag_generation,
)


def batch(spark, lo: int, n: int):
    return spark.range(lo, lo + n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5).cast("string").alias("source"),
        (F.col("id") % 97).alias("author_id"),
        (F.col("id") * 13 % 1000).alias("quality"),
    )


def main() -> None:
    spark = get_spark(app_name="lakehouse-tour")
    work = tempfile.mkdtemp(prefix="mri_lakehouse_")
    store = os.path.join(work, "docs")
    view = os.path.join(work, "by_source")

    # 1. first batch -> generation 1, tagged
    batch(spark, 0, 5_000).repartitionByRange(4, "doc_id").write.parquet(store)
    publish_generation(store, bloom_cols=["doc_id"])
    tag_generation(store, "train-v1")

    # materialized view over the tagged base
    create_matview(
        spark,
        store,
        view,
        ["source"],
        {
            "n_docs": ("count", "*"),
            "total_quality": ("sum", "quality"),
            "n_authors": ("count_distinct", "author_id"),
        },
        row_keys=["doc_id"],
    )

    # 2. ingest continues — two more generations
    for lo in (5_000, 7_000):
        batch(spark, lo, 2_000).coalesce(1).write.mode("append").parquet(store)
        publish_generation(store)

    # 3a. range query: manifest min/max pruning
    pred = [("doc_id", "between", (1_000, 1_999))]
    _root, kept, total = plan_generation_scan(store, where=pred)
    n_range = read_generation(spark, store, where=pred).count()
    print(f"range scan: kept {len(kept)}/{total} files, {n_range} rows")

    # 3b. point lookup: bloom sidecars on the unclustered key
    probe = [("doc_id", "=", 4_242)]
    _root, kept, total = plan_generation_scan(store, where=probe)
    row = read_generation(spark, store, where=probe).collect()
    print(f"point lookup: kept {len(kept)}/{total} files -> {len(row)} row")

    # 3c. the pinned read and its complement
    pinned = read_generation(spark, store, at="train-v1").count()
    arrived = generation_diff(spark, store, since="train-v1").count()
    print(f"pinned@train-v1: {pinned} rows; arrived since: {arrived} rows")
    assert pinned == 5_000 and arrived == 4_000

    # 4. delta-only refresh, then answer a coarser grouping from the
    #    view alone (here: the global rollup — sub_keys = [])
    report = refresh_matview(spark, view)
    print(
        f"refresh: gen {report['from']} -> {report['to']}, "
        f"scanned {report['delta_files']} delta file(s)"
    )
    served = {
        r.source: (r.n_docs, r.n_authors)
        for r in read_matview(spark, view).collect()
    }
    truth = {
        r.source: (r.n, r.a)
        for r in read_generation(spark, store)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("author_id").alias("a"),
        )
        .collect()
    }
    assert served == truth
    print(f"view serves {len(served)} groups, incremental == full: True")

    total_row = rollup_matview(spark, view, []).collect()[0]
    print(
        f"routed global rollup: {total_row.n_docs} docs, "
        f"{total_row.n_authors} distinct authors (no base scan)"
    )
    assert total_row.n_docs == 9_000

    # 5. (round 10) row-level DELETE: erase one source, copy-on-write —
    #    only the files that MAY hold it rewrite (source is in every
    #    file here, so all rewrite — see tests/test_delete.py for the
    #    pruned case); the tagged snapshot
    #    still serves every original row; the view rebuilds exactly
    from map_reduce_indexing_spark.sources.generations import delete_rows

    dreport = delete_rows(spark, store, [("source", "=", "1")])
    print(
        f"delete source=1: {dreport['deleted_rows']} rows gone, "
        f"{dreport['rewritten_files']} file(s) rewritten, "
        f"{dreport['kept_files']} untouched"
    )
    assert read_generation(spark, store, at="train-v1").count() == 5_000
    report = refresh_matview(spark, view)
    # the spec is fully retractable (counts/sums/distinct supports +
    # row keys), so the rewrite span refreshes by RETRACTION — the
    # change feed over only the rewritten files — not a rebuild
    assert report["mode"] == "retract"
    assert "1" not in {
        r.source for r in read_matview(spark, view).collect()
    }
    print("post-delete: pinned snapshot intact, view retracted exactly")

    spark.stop()


if __name__ == "__main__":
    main()
