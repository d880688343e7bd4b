"""Incremental-view-maintenance scaling: refresh cost vs base size.

The claim that makes matviews worth maintaining (operators/matview.py)
is that a refresh costs the DELTA, not the base: at 100 TB with daily
appends, a refresh scans one day. This tool measures exactly that
shape — a generations-managed base store grown to several multiples of
the sf0.1 orders table, a FIXED-SIZE delta appended, then:

- full   = create_matview from scratch over the whole base (what a
           rebuild-the-dashboard job pays);
- refresh = refresh_matview consuming only the appended files;
- join_refresh (round 10) = the same fixed delta refreshed through a
  FACT ⋈ DIM view (create_matview_join; dim stable) — the telescoping
  delta's common case, which must stay flat as the fact grows;
- retract vs rebuild (round 10 second wave) = a FIXED-SIZE predicate
  delete (one order-date day) refreshed two ways: the retraction path
  (signed change feed over only the rewritten files) on a retractable
  spec, and the full rebuild a non-retractable spec pays — the gap is
  the whole point of retraction and must WIDEN with the base.

The view carries the full aggregate menu: count, exact-decimal sum,
min/max, COUNT DISTINCT (support-table IVM — the support merge is
(delta-support + stored-support), both answer-sized), and an HLL
sketch. Replicas shift o_orderkey/o_custkey so distinct counts keep
growing with the base instead of saturating.

Also measures manifest-level file skipping on the same store: a
1-month predicate read via read_generation(where=...) versus the full
scan + filter, with kept/total file counts from plan_generation_scan.

Usage: python tools/matview_scale.py [sf_dir] [multiples...]
Defaults: /root/testdata/sf0.1, multiples 1 4 16.
Prints one JSON line per multiple.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from map_reduce_indexing_spark.operators.matview import (  # noqa: E402
    create_matview,
    refresh_matview,
)
from map_reduce_indexing_spark.session import get_spark  # noqa: E402
from map_reduce_indexing_spark.sources.generations import (  # noqa: E402
    plan_generation_scan,
    publish_generation,
    read_generation,
)

AGGS = {
    "n": ("count", "*"),
    "total": ("sum", "price_dec"),
    "lo": ("min", "o_orderdate"),
    "hi": ("max", "o_orderdate"),
    "n_custs": ("count_distinct", "o_custkey"),
    "approx_custs": ("approx_distinct", "o_custkey"),
}
DELTA_ROWS = 10_000


def orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        "o_orderdate",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price_dec"),
    )


def replicate(df, mult):
    """mult shifted copies: keys offset per replica so distinct
    cardinalities scale with the base."""
    reps = None
    for i in range(mult):
        r = df.select(
            (F.col("o_orderkey") + F.lit(i * 100_000_000)).alias("o_orderkey"),
            (F.col("o_custkey") + F.lit(i * 10_000_000)).alias("o_custkey"),
            "o_orderpriority",
            "o_orderdate",
            "price_dec",
        )
        reps = r if reps is None else reps.unionByName(r)
    return reps


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mults = [int(a) for a in sys.argv[2:]] or [1, 4, 16]
    spark = get_spark()
    src = orders(spark, sf_dir)
    n_src = src.count()

    for mult in mults:
        work = tempfile.mkdtemp(prefix="mri_mv_scale_")
        base = os.path.join(work, "base")
        try:
            big = replicate(src, mult)
            files = max(4, 4 * mult)
            big.repartitionByRange(files, "o_orderdate").write.parquet(base)
            publish_generation(base)

            t0 = time.monotonic()
            create_matview(
                spark, base, os.path.join(work, "v_full"),
                ["o_orderpriority"], AGGS, row_keys=["o_orderkey"],
            )
            full_s = time.monotonic() - t0

            # the view to refresh, pinned BEFORE the delta lands
            create_matview(
                spark, base, os.path.join(work, "v_inc"),
                ["o_orderpriority"], AGGS, row_keys=["o_orderkey"],
            )
            delta = src.limit(DELTA_ROWS).select(
                (F.col("o_orderkey") + F.lit(99_000_000_000)).alias(
                    "o_orderkey"
                ),
                "o_custkey",
                "o_orderpriority",
                "o_orderdate",
                "price_dec",
            )
            delta.coalesce(1).write.mode("append").parquet(base)
            publish_generation(base)
            t0 = time.monotonic()
            rep = refresh_matview(spark, os.path.join(work, "v_inc"))
            refresh_s = time.monotonic() - t0

            # join-IVM (round 10): fact ⋈ priority-dim, dim stable —
            # the refresh is ΔF ⋈ dim and must stay delta-sized. The
            # view was pinned at the pre-delta generation, so this
            # refresh consumes exactly the same appended file.
            from map_reduce_indexing_spark.operators.matview import (
                create_matview_join,
            )

            dim = os.path.join(work, "dim")
            read_generation(spark, base, at=1).select(
                "o_orderpriority"
            ).distinct().select(
                "o_orderpriority",
                F.substring("o_orderpriority", 1, 1).alias("prio_band"),
            ).coalesce(1).write.parquet(dim)
            publish_generation(dim)
            create_matview_join(
                spark, os.path.join(work, "v_join"), base,
                [{"path": dim, "on": ["o_orderpriority"],
                  "select": ["prio_band"]}],
                ["prio_band"],
                {"n": ("count", "*"), "total": ("sum", "price_dec"),
                 "n_custs": ("count_distinct", "o_custkey")},
                at=1,
            )
            t0 = time.monotonic()
            jrep = refresh_matview(spark, os.path.join(work, "v_join"))
            join_refresh_s = time.monotonic() - t0
            assert jrep["mode"] == "incremental", jrep

            # retraction vs rebuild across a fixed-size DELETE span:
            # two views over the same base — retractable spec (counts/
            # sums/distinct) vs the full menu (min/max forces rebuild)
            from map_reduce_indexing_spark.sources.generations import (
                delete_rows,
            )

            # two retractable shapes: group-sized state (counts/sums/
            # avg — the shape retraction exists for) and answer-sized
            # state (a count_distinct support that must fold)
            create_matview(
                spark, base, os.path.join(work, "v_retract"),
                ["o_orderpriority"],
                {"n": ("count", "*"), "total": ("sum", "price_dec"),
                 "mean_price": ("avg", "price_dec")},
                row_keys=["o_orderkey"],
            )
            create_matview(
                spark, base, os.path.join(work, "v_retract_cd"),
                ["o_orderpriority"],
                {"n": ("count", "*"), "total": ("sum", "price_dec"),
                 "n_custs": ("count_distinct", "o_custkey")},
                row_keys=["o_orderkey"],
            )
            create_matview(
                spark, base, os.path.join(work, "v_rebuild"),
                ["o_orderpriority"], AGGS, row_keys=["o_orderkey"],
            )
            import datetime as _dt

            drep = delete_rows(
                spark, base,
                [("o_orderdate", "between",
                  (_dt.datetime(1995, 3, 1), _dt.datetime(1995, 3, 2)))],
            )
            t0 = time.monotonic()
            rrep = refresh_matview(spark, os.path.join(work, "v_retract"))
            retract_s = time.monotonic() - t0
            assert rrep["mode"] == "retract", rrep
            t0 = time.monotonic()
            rcrep = refresh_matview(
                spark, os.path.join(work, "v_retract_cd")
            )
            retract_cd_s = time.monotonic() - t0
            assert rcrep["mode"] == "retract", rcrep
            t0 = time.monotonic()
            brep = refresh_matview(spark, os.path.join(work, "v_rebuild"))
            rebuild_span_s = time.monotonic() - t0
            assert brep["mode"] == "rebuild", brep

            # manifest skipping on the same clustered store
            import datetime

            lo = datetime.datetime(1995, 6, 1)
            hi = datetime.datetime(1995, 6, 30)
            pred = [("o_orderdate", "between", (lo, hi))]
            _root, kept, total = plan_generation_scan(base, where=pred)
            t0 = time.monotonic()
            n_pruned = read_generation(spark, base, where=pred).count()
            pruned_s = time.monotonic() - t0
            t0 = time.monotonic()
            n_full = (
                read_generation(spark, base)
                .filter(
                    (F.col("o_orderdate") >= F.lit(lo))
                    & (F.col("o_orderdate") <= F.lit(hi))
                )
                .count()
            )
            fullscan_s = time.monotonic() - t0
            assert n_pruned == n_full

            print(
                json.dumps(
                    {
                        "mult": mult,
                        "base_rows": n_src * mult,
                        "delta_rows": DELTA_ROWS,
                        "full_rebuild_sec": round(full_s, 3),
                        "refresh_sec": round(refresh_s, 3),
                        "refresh_delta_files": rep["delta_files"],
                        "join_refresh_sec": round(join_refresh_s, 3),
                        "delete_rewrote_files": drep["rewritten_files"],
                        "retract_refresh_sec": round(retract_s, 3),
                        "retract_distinct_sec": round(retract_cd_s, 3),
                        "rebuild_refresh_sec": round(rebuild_span_s, 3),
                        "skip_kept_files": len(kept),
                        "skip_total_files": total,
                        "pruned_read_sec": round(pruned_s, 3),
                        "full_filter_sec": round(fullscan_s, 3),
                        "rows_matched": n_pruned,
                    }
                ),
                flush=True,
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
