"""Round 12 end to end: a store's schema LIFETIME, plus the SQL seat.

The single most common lakehouse change is a producer adding a column;
the second is an analyst asking for plain SQL over the table and its
history. This walkthrough runs both against one store:

1. BASELINE — append v1 batches (id, region, amount int): the schema
   is recorded in the manifest with the publish;
2. DRIFT REFUSED — a producer whose batch quietly changed shape is
   stopped at the gate (schema_mode='strict', the default);
3. EVOLVE — the same batch lands under schema_mode='evolve': amount
   widens int->long, a currency column appears; the head read
   reconciles (old rows serve NULL currency, amounts cast losslessly)
   while the pinned generation 1 keeps its original narrow shape;
4. SQL + TIME TRAVEL — register_store/store_sql: one ANSI query joins
   the head against `sales@1` inline (VERSION AS OF, spelled in the
   text);
5. RETROFIT + DROP — optimize_store folds the mixed listing back to
   ONE schema version; drop_columns retires a column as an explicit
   rewrite (appends can never drop), with the wide history still
   pinned and queryable;
6. LINEAGE — schema_history answers "what shape was this table, when"
   from one manifest read.

    python examples/schema_evolution_tour.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from map_reduce_indexing_spark.session import get_spark  # noqa: E402
from map_reduce_indexing_spark.sources.catalog import (  # noqa: E402
    register_store,
    store_sql,
)
from map_reduce_indexing_spark.sources.generations import (  # noqa: E402
    SchemaEvolutionError,
    append_rows,
    drop_columns,
    optimize_store,
    read_generation,
    schema_history,
    store_schema,
)


def main() -> None:
    spark = get_spark(
        app_name="schema-evolution-tour", master="local[4]",
        shuffle_partitions=4,
    )
    root = tempfile.mkdtemp(prefix="mri_evotour_")
    store = os.path.join(root, "sales")

    # 1. baseline: two v1 batches
    v1 = spark.createDataFrame(
        [(i, ["emea", "apac"][i % 2], 100 + i) for i in range(8)],
        "id long, region string, amount int",
    )
    append_rows(spark, store, v1)
    print("baseline schema:", store_schema(store).simpleString())

    # 2. drift refused by default
    v2 = spark.createDataFrame(
        [(100 + i, "emea", 10_000_000_000 + i, "EUR") for i in range(4)],
        "id long, region string, amount long, currency string",
    )
    try:
        append_rows(spark, store, v2)
        raise AssertionError("strict gate should have refused")
    except SchemaEvolutionError as e:
        print("strict gate refused:", str(e)[:88], "...")

    # 3. the same batch lands as a DECLARED evolution
    append_rows(spark, store, v2, schema_mode="evolve")
    head = read_generation(spark, store)
    print("head after evolve:", dict(head.dtypes))
    head.orderBy("id").show(12, truncate=False)
    g1 = read_generation(spark, store, at=1)
    print("generation 1 keeps its shape:", dict(g1.dtypes))

    # 4. SQL + inline time travel
    register_store(spark, "sales", store)
    spark.sql(
        "SELECT region, count(*) AS n, sum(amount) AS amt "
        "FROM sales GROUP BY region"
    ).show()
    store_sql(
        spark,
        """
        SELECT h.region,
               h.n AS n_now,
               b.n AS n_at_v1
        FROM (SELECT region, count(*) AS n FROM sales GROUP BY 1) h
        LEFT JOIN (SELECT region, count(*) AS n FROM sales@1
                   GROUP BY 1) b
          ON h.region = b.region
        """,
        {"sales": store},
    ).show()

    # 5. retrofit fold, then an explicit column drop
    optimize_store(spark, store, cluster_by=["id"], n_files=2)
    drop_columns(spark, store, ["currency"])
    print("after drop:", store_schema(store).simpleString())
    assert "currency" not in read_generation(spark, store).columns

    # 6. lineage
    hist = schema_history(store)
    for gen in sorted(hist["generations"]):
        sid = hist["generations"][gen]
        cols = sorted((hist["schemas"].get(sid) or {}).keys())
        print(f"generation {gen}: schema v{sid} {cols}")

    n = read_generation(spark, store).count()
    assert n == 12, n
    print("OK: 12 rows, three schema eras, history pinned")
    spark.stop()


if __name__ == "__main__":
    main()
