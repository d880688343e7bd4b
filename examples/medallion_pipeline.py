"""The round-10 third wave end to end: gated ingest, chained
incremental pipelines, histogram views with served percentiles, the
quarantine repair loop, and metadata-served aggregates
(sources/expectations.py + sources/pipeline.py + operators/matview.py).

The medallion lifecycle on one synthetic feed:

1. BRONZE — two dirty batches admitted through declared expectations:
   passing rows publish audited generations, rejects split to the
   store's `.quarantine` sibling tagged with what they failed;
2. SILVER — run_incremental_pipeline promotes bronze with a transform
   and its own promotion gate; the second run consumes ONLY the new
   bronze generation (exactly-once bookmark in the silver manifest);
3. GOLD — a histogram matview over silver serves interpolated
   percentiles from maintained bin counts, refreshing delta-only;
4. REPAIR — readmit fixes the quarantined rows and re-gates them; the
   cured rows append as an audited generation and flow bronze→silver→
   view on the next runs;
5. METADATA — row count, column bounds, and a predicate count answered
   from the manifest without opening data files.

    python examples/medallion_pipeline.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from map_reduce_indexing_spark.operators.matview import (  # noqa: E402
    create_matview,
    hist_quantile,
    read_matview,
    refresh_matview,
)
from map_reduce_indexing_spark.session import get_spark  # noqa: E402
from map_reduce_indexing_spark.sources.expectations import (  # noqa: E402
    append_with_expectations,
    expectation_audit,
    read_quarantine,
    readmit,
)
from map_reduce_indexing_spark.sources.generations import (  # noqa: E402
    generation_column_bounds,
    generation_predicate_count,
    generation_row_count,
    read_generation,
)
from map_reduce_indexing_spark.sources.pipeline import (  # noqa: E402
    pipeline_runs,
    run_incremental_pipeline,
)

HIST = "hist:0:1000:10"


def batch(spark, lo: int, n: int):
    return spark.createDataFrame(
        [
            (
                lo + i,
                f"src{(lo + i) % 3}",
                ((lo + i) * 13) % 1200,  # some rows exceed the cap
            )
            for i in range(n)
        ],
        "rid long, source string, score long",
    )


def main() -> None:
    spark = get_spark(app_name="medallion-pipeline")
    work = tempfile.mkdtemp(prefix="mri_medallion_")
    bronze = os.path.join(work, "bronze")
    silver = os.path.join(work, "silver")
    view = os.path.join(work, "view")
    gate = {"score_cap": [("score", "<=", 1000)]}

    # 1. gated bronze ingest: two batches, each an audited generation
    for lo in (0, 200):
        rep = append_with_expectations(
            spark, bronze, batch(spark, lo, 200), gate, mode="quarantine"
        )
        print(
            f"bronze g{rep['generation']}: {rep['rows_appended']} admitted, "
            f"{rep['rows_quarantined']} quarantined {rep['violations']}"
        )
    n_quarantined = read_quarantine(spark, bronze).count()
    assert n_quarantined > 0
    assert expectation_audit(bronze)["mode"] == "quarantine"

    # 2. bronze -> silver, gated promotion, exactly-once
    promote = lambda df: df.withColumn(
        "grade", (F.col("score") / 100).cast("long")
    )
    sgate = {"known_source": [("source", "in", ["src0", "src1", "src2"])]}
    run_incremental_pipeline(spark, bronze, silver, promote, expectations=sgate)
    rep = run_incremental_pipeline(
        spark, bronze, silver, promote, expectations=sgate
    )
    assert rep["mode"] == "noop"  # nothing new: exactly-once
    print("silver runs:", [
        (r.since, r.until, r.mode)
        for r in pipeline_runs(spark, silver).collect()
    ])

    # 3. gold: histogram view + served percentiles
    create_matview(
        spark,
        silver,
        view,
        ["source"],
        {"n": ("count", "*"), "h": (HIST, "score")},
        row_keys=["rid"],
    )
    q = hist_quantile(
        read_matview(spark, view), "h", HIST, ["source"], [0.5, 0.95]
    )
    print("served percentiles:")
    q.orderBy("source", "p").show(truncate=False)

    # 4. repair loop: clamp over-cap scores, re-admit, flow downstream
    rep = readmit(
        spark,
        bronze,
        gate,
        fix=lambda df: df.withColumn(
            "score", F.least(F.col("score"), F.lit(1000))
        ),
    )
    assert rep["still_quarantined"] == 0
    assert read_quarantine(spark, bronze).count() == 0
    r1 = run_incremental_pipeline(
        spark, bronze, silver, promote, expectations=sgate
    )
    assert r1["mode"] == "append"  # only the readmit generation
    r2 = refresh_matview(spark, view)
    assert r2["mode"] == "incremental"
    assert read_generation(spark, silver).count() == 400
    total = sum(r.n for r in read_matview(spark, view).collect())
    assert total == 400
    print(f"readmitted {rep['readmitted']} rows; view total {total}")

    # 5. metadata-served aggregates: zero Spark jobs
    n = generation_row_count(silver)
    lo, hi = generation_column_bounds(silver, "score")
    pc = generation_predicate_count(spark, silver, [("score", "<=", 500)])
    print(
        f"metadata: rows={n}, score bounds=({lo}, {hi}), "
        f"count(score<=500)={pc['count']} "
        f"({pc['files_metadata']} files by metadata, "
        f"{pc['files_scanned']} scanned)"
    )
    assert n == 400 and hi <= 1000
    print("medallion pipeline complete.")


if __name__ == "__main__":
    main()
