"""Simulate the driver's verify pass against __spark_entry__.

Runs entry(spark) as a smoke check, then every queries() entry at the
given sf dir and compares row-count + column set + order-insensitive
value frame against oracle_sql() via DuckDB. Usage:

    python tools/check_contract.py [--all] [sf_dir] [query_name ...]

With query names given, checks only those (fast iteration loop).
--all additionally sweeps the export=False variants (pytest-only
queries hidden from the external window) against their oracles.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from map_reduce_indexing_spark.session import get_spark  # noqa: E402
from map_reduce_indexing_spark.schemas import FIXTURE_TABLES  # noqa: E402


def compare(sp_df, con, sql: str) -> str:
    sp = sp_df.toPandas()
    du = con.execute(sql).fetchdf()
    if sorted(sp.columns) != sorted(du.columns):
        return f"SCHEMA MISMATCH spark={sorted(sp.columns)} oracle={sorted(du.columns)}"
    if len(sp) != len(du):
        return f"ROWCOUNT MISMATCH spark={len(sp)} oracle={len(du)}"
    cols = sorted(sp.columns)
    # Driver order: sort_values on RAW columns first (list cells raise
    # "unhashable type: 'list'" there, as in CORRECTNESS_r01), then stringify.
    sp = sp[cols].sort_values(cols, ignore_index=True).astype(str)
    du = du[cols].sort_values(cols, ignore_index=True).astype(str)
    if not sp.equals(du):
        diff = sp.compare(du) if hasattr(sp, "compare") else None
        return f"VALUE MISMATCH\n{diff.head(5) if diff is not None else ''}"
    return "OK"


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--all"]
    include_unexported = "--all" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    spark = get_spark(app_name="contract-check")
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    only = set(args[1:])
    status = 0
    if not only:
        rows = entrymod.entry(spark).collect()
        print(f"entry(): {len(rows)} rows  schema ok" if rows else "entry(): EMPTY", flush=True)
        status = 0 if rows else 1

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if include_unexported:
        from map_reduce_indexing_spark.plans.registry import _REGISTRY

        for n, q in _REGISTRY.items():
            if not q.export:
                qs[n] = q.fn
                if q.oracle is not None:
                    oracles[n] = q.oracle
    if only:
        qs = {n: f for n, f in qs.items() if n in only}
    for name, fn in qs.items():
        try:
            if name in oracles:
                verdict = compare(fn(spark, sf_dir), con, oracles[name])
            else:
                n = fn(spark, sf_dir).count()
                verdict = f"rows-only: {n} rows"
        except Exception as e:  # surface, don't abort the sweep
            verdict = f"ERROR {type(e).__name__}: {str(e)[:200]}"
        flag = "" if verdict.startswith(("OK", "rows-only")) else "  <<< FAIL"
        if flag:
            status = 1
        print(f"  {name:32s} {verdict}{flag}", flush=True)
    spark.stop()
    return status


if __name__ == "__main__":
    sys.exit(main())
