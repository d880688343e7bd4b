"""Incremental materialized aggregates over artifact generations.

The reference rebuilds its derived stores from scratch on every
mutation (helper_reduce.c regenerates the whole letter file on
append); this module is the extension tier's scale answer for the
aggregate-shaped derived stores: a MATERIALIZED VIEW over a
generations-managed base artifact that refreshes by consuming ONLY
the rows added since the generation it last saw.

Design — classic incremental view maintenance (IVM) restricted to the
homomorphic aggregates, which is exactly what makes it exact:

- The view persists PARTIAL aggregates per group: `count` and `sum`
  add, `min`/`max` combine, `avg` is served as sum/count at read.
  Because the base artifact's row set is append-only (appends add
  rows; compaction rewrites files but folds/preserves rows — the
  store contract throughout this repo), every supported aggregate is
  a commutative monoid over the row multiset, so
      merge(view@G1, agg(rows added in G1..G2)) == agg(rows@G2)
  holds EXACTLY, not approximately. Deletions would break min/max
  (not a monoid under removal) — `refresh` therefore consumes
  `generation_diff`, which either proves the span append-only (file
  containment) or falls back to an exact anti-join on caller-named
  row keys, and never silently rescans.

- Refresh cost is delta-sized: the diff's fast path scans ONLY the
  files published after the view's pinned generation, the delta
  partial-agg shuffles delta-group cardinality, and the merge is a
  union + re-aggregate of (stored groups + delta groups) — the
  stored side is group-cardinality-sized, not base-row-sized. At
  100 TB with daily appends this is the difference between a full
  corpus scan per refresh and a scan of one day.

- Durability follows the house artifact discipline: the view is a
  parquet directory plus a `_matview.json` sidecar (base path, pinned
  base generation, spec), written via staged `os.replace` swap under
  `index_writer_lock(view_path)` — a crash leaves the old view + old
  sidecar (the pinned generation is re-consumable because generations
  are immutable and retained), a torn state is impossible.

Spec shape: `aggs` maps output column -> (op, input column) with op in
{"count", "sum", "min", "max"}; `("count", "*")` counts rows.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.generations import (
    diff_plan,
    generation_diff,
    generation_head,
    read_generation,
)

MATVIEW_FILE = "_matview.json"

_OPS = {"count", "sum", "min", "max"}


def _load_spec(view_path: str) -> dict:
    p = os.path.join(view_path, MATVIEW_FILE)
    with open(p) as fh:
        return json.load(fh)


def _partial_agg(df: DataFrame, key_cols: list[str], aggs: dict) -> DataFrame:
    """One partial-aggregate row per group. Spark's hash aggregate
    computes this with a map-side combine, so the exchange carries
    group cardinality, not row counts."""
    exprs = []
    for out, (op, col) in aggs.items():
        if op == "count":
            exprs.append(
                (F.count(F.lit(1)) if col == "*" else F.count(col)).alias(out)
            )
        elif op == "sum":
            exprs.append(F.sum(col).alias(out))
        elif op == "min":
            exprs.append(F.min(col).alias(out))
        elif op == "max":
            exprs.append(F.max(col).alias(out))
        else:
            raise ValueError(f"unsupported aggregate op {op!r}")
    return df.groupBy(*key_cols).agg(*exprs)


def _merge_partials(
    stored: DataFrame, delta: DataFrame, key_cols: list[str], aggs: dict
) -> DataFrame:
    """Fold two partial-aggregate frames into one: counts and sums ADD
    (count-of-nonnull partials merge by summation, not re-counting —
    re-counting would count partial ROWS), min/max combine."""
    exprs = []
    for out, (op, _col) in aggs.items():
        if op in ("count", "sum"):
            exprs.append(F.sum(out).alias(out))
        elif op == "min":
            exprs.append(F.min(out).alias(out))
        else:
            exprs.append(F.max(out).alias(out))
    return stored.unionByName(delta).groupBy(*key_cols).agg(*exprs)


def _write_view(
    df: DataFrame, view_path: str, sidecar: dict
) -> None:
    """Staged write + atomic swap of data AND sidecar together, under
    the view's writer flock (same crash story as compact_artifact:
    old view intact until the final rename pair)."""
    import shutil
    import tempfile

    from .indexing import _chmod_staging, index_writer_lock

    with index_writer_lock(view_path):
        staging = tempfile.mkdtemp(
            prefix="mri_matview_", dir=os.path.dirname(view_path) or "."
        )
        _chmod_staging(staging)
        df.write.mode("overwrite").parquet(staging)
        with open(os.path.join(staging, MATVIEW_FILE), "w") as fh:
            json.dump(sidecar, fh)
        old = view_path + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(view_path):
            os.replace(view_path, old)
        os.replace(staging, view_path)
        shutil.rmtree(old, ignore_errors=True)


def create_matview(
    spark: SparkSession,
    base_path: str,
    view_path: str,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    at: int | None = None,
    row_keys: list[str] | None = None,
) -> int:
    """Materialize the partial-aggregate view of base generation `at`
    (head when None) at `view_path` and pin that generation in the
    sidecar. `row_keys` (e.g. ["doc_id"]) names the base's row
    identity for the compaction-crossing refresh fallback; omit it
    and a refresh across a compaction refuses instead."""
    for out, (op, _c) in aggs.items():
        if op not in _OPS:
            raise ValueError(f"unsupported aggregate op {op!r} for {out!r}")
    gen = generation_head(base_path) if at is None else int(at)
    base = read_generation(spark, base_path, at=gen)
    view = _partial_agg(base, key_cols, aggs)
    _write_view(
        view,
        view_path,
        {
            "base_path": os.path.abspath(base_path),
            "base_gen": gen,
            "key_cols": list(key_cols),
            "aggs": {k: list(v) for k, v in aggs.items()},
            "row_keys": list(row_keys or []),
        },
    )
    return gen


def refresh_matview(spark: SparkSession, view_path: str) -> dict:
    """Advance the view to the base's current head generation by
    merging the partial aggregates of exactly the rows added since the
    pinned generation. Returns a report:
    {"from": g, "to": g', "delta_files": n, "refreshed": bool} —
    `delta_files` counts the files the refresh scanned (the
    append-only fast path; -1 marks the anti-join fallback across a
    compaction, which scans both snapshots but stays exact)."""
    spec = _load_spec(view_path)
    base_path, pinned = spec["base_path"], int(spec["base_gen"])
    head = generation_head(base_path)
    if head <= pinned:
        return {
            "from": pinned, "to": pinned, "delta_files": 0, "refreshed": False
        }
    key_cols = spec["key_cols"]
    aggs = {k: tuple(v) for k, v in spec["aggs"].items()}
    mode, delta_rels = diff_plan(base_path, since=pinned, until=head)
    delta = generation_diff(
        spark,
        base_path,
        since=pinned,
        until=head,
        key_cols=tuple(spec.get("row_keys") or ()),
    )
    n_files = len(delta_rels) if mode == "append" else -1
    stored = spark.read.parquet(view_path)
    merged = _merge_partials(
        stored, _partial_agg(delta, key_cols, aggs), key_cols, aggs
    )
    sidecar = dict(spec)
    sidecar["base_gen"] = head
    _write_view(merged, view_path, sidecar)
    return {
        "from": pinned, "to": head, "delta_files": n_files, "refreshed": True
    }


def read_matview(spark: SparkSession, view_path: str) -> DataFrame:
    """The view's final form: stored partials are already one row per
    group, served as-is (derived ratios like avg = sum/count are the
    caller's one-liner over these columns)."""
    return spark.read.parquet(view_path)
