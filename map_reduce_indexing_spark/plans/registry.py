"""Query registry: the bridge between operator modules and the driver.

Every operator from SURVEY.md §2 registers a named query callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) the
equivalent DuckDB oracle SQL. ``__spark_entry__.queries()`` /
``oracle_sql()`` are thin views over this registry.

Oracle-SQL discipline (so the driver's order-insensitive value hash
matches):
- alias every computed column identically on both sides;
- cast DuckDB aggregates explicitly (COUNT -> BIGINT, SUM(decimal) ->
  DOUBLE after rounding) so dtypes line up with Spark;
- make double-typed aggregates deterministic by summing exact decimals
  and rounding once at the end (see operators/relational.py).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> driver does rows-only check
    tier: str  # 'ref' | 'implied' | 'relational' | 'streaming' | 'llm'
    doc: str = ""


_REGISTRY: dict[str, RegisteredQuery] = {}


def register(name: str, *, oracle: str | None = None, tier: str, doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = RegisteredQuery(name, fn, oracle, tier, doc)
        return fn

    return deco


def _ensure_loaded() -> None:
    # Import operator modules for their registration side effects.
    from .. import operators  # noqa: F401
    from .. import streaming  # noqa: F401


def get(name: str) -> RegisteredQuery:
    _ensure_loaded()
    return _REGISTRY[name]


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: q.fn for name, q in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: q.oracle for name, q in _REGISTRY.items() if q.oracle is not None}
