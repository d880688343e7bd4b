"""Fixture-drift tripwire.

The driver regenerates /root/testdata between rounds and the encoding of
events.ts has already flipped once (TIMESTAMP(NANOS) in rounds 1-2 ->
timestamp[us]-no-tz in round 3, which Spark 4 reads as TIMESTAMP_NTZ and
which broke every unix_micros() call site). `load_table` normalizes all
known encodings to TimestampType; this test pins that contract for every
sf dir so the NEXT regeneration fails one obvious test instead of three
opaque queries.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import TimestampType

from map_reduce_indexing_spark.sources.tables import load_table

SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_normalizes_to_timestamp(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampType), (
        f"{sf_dir}: events.ts loads as {ev.schema['ts'].dataType} — "
        "fixture encoding drifted again; extend the normalization branch "
        "in sources/tables.py:load_table"
    )


def test_no_table_leaks_timestamp_ntz(spark):
    """Every fixture table must load free of TIMESTAMP_NTZ columns —
    the encoding that silently breaks unix_micros/watermark call sites
    when the driver regenerates fixtures."""
    from map_reduce_indexing_spark.schemas import FIXTURE_TABLES

    for sf_dir in SF_DIRS:
        for name in FIXTURE_TABLES:
            bad = [
                c
                for c, t in load_table(spark, sf_dir, name).dtypes
                if t == "timestamp_ntz"
            ]
            assert not bad, f"{sf_dir}/{name}: NTZ columns {bad}"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_values_survive_normalization(spark, sf_dir):
    """The normalization must be value-identity vs the raw file read as
    UTC-naive (what the DuckDB oracle sees): count and min/max epoch
    micros must agree with pyarrow's view of the file."""
    import pyarrow.parquet as pq

    ev = load_table(spark, sf_dir, "events")
    row = ev.selectExpr(
        "count(*) AS n", "min(unix_micros(ts)) AS lo", "max(unix_micros(ts)) AS hi"
    ).first()

    t = pq.read_table(os.path.join(sf_dir, "events.parquet"), columns=["ts"])
    col = t.column("ts").combine_chunks()
    # pyarrow timestamps compare as integers in their storage unit.
    import pyarrow.compute as pc

    # Integer arithmetic only: epoch-nanos exceed 2^53, so a float scale
    # factor (int * (1/1000)) rounds and can mis-assert by ~1us exactly
    # when the fixture drifts back to TIMESTAMP(NANOS) — the scenario
    # this tripwire exists to catch. Floor division matches load_table's
    # DIV semantics.
    unit = t.schema.field("ts").type.unit
    to_us = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": None}[unit]

    def as_micros(v: int) -> int:
        return v // 1000 if to_us is None else v * to_us

    lo = as_micros(pc.min(col).cast("int64").as_py())
    hi = as_micros(pc.max(col).cast("int64").as_py())
    assert row.n == len(col)
    assert row.lo == lo
    assert row.hi == hi
