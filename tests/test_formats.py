"""Interchange-format round-trips (SURVEY.md §2.1 S5).

Every format must reproduce the source frame exactly — schema and
values — and ORC must keep the pushdown/pruning contract parquet has.
"""

from __future__ import annotations

import pytest

from map_reduce_indexing_spark.sources import formats
from map_reduce_indexing_spark.sources.tables import load_table

from .conftest import SF_DIR


def _orders_sorted(df):
    return [tuple(r) for r in df.orderBy("o_orderkey").collect()]


@pytest.mark.parametrize("fmt", ["csv", "jsonl", "orc"])
def test_roundtrip_orders(spark, tmp_path, fmt):
    src = load_table(spark, SF_DIR, "orders")
    path = str(tmp_path / f"orders_{fmt}")
    if fmt == "csv":
        formats.write_csv(src, path)
        back = formats.read_csv(spark, path, src.schema)
    elif fmt == "jsonl":
        formats.write_jsonl(src, path)
        back = formats.read_jsonl(spark, path, src.schema)
    else:
        formats.write_orc(src, path)
        back = formats.read_orc(spark, path)
    assert back.schema == src.schema
    assert _orders_sorted(back) == _orders_sorted(src)


def test_csv_nulls_and_delimiters_survive(spark, tmp_path):
    """Quoting/escaping: values containing the delimiter, quotes,
    newlines, and nulls must round-trip byte-identically."""
    rows = [
        (1, 'comma, inside', 2.5),
        (2, 'quote " inside', None),
        (3, None, -0.0),
        (4, "newline\ninside", 1e300),
        (5, "", 3.14),  # empty string vs null
    ]
    src = spark.createDataFrame(rows, "id long, s string, x double")
    path = str(tmp_path / "tricky_csv")
    formats.write_csv(src, path)
    # multiline: embedded quoted newlines need whole-file parsing
    back = formats.read_csv(spark, path, src.schema, multiline=True)
    got = sorted([tuple(r) for r in back.collect()], key=lambda t: t[0])
    want = sorted(rows, key=lambda t: t[0])
    # CSV cannot distinguish empty string from null without an
    # emptyValue convention; everything else must be exact
    for g, w in zip(got, want):
        assert g[0] == w[0]
        assert (g[1] or "") == (w[1] or "")
        assert g[2] == w[2]


def test_orc_pushdown_and_pruning(spark, tmp_path):
    """ORC scans honor the same filter-pushdown + column-pruning
    contract as parquet — the property that makes format choice a
    storage decision, not a plan decision."""
    src = load_table(spark, SF_DIR, "lineitem")
    path = str(tmp_path / "lineitem_orc")
    formats.write_orc(src, path)
    df = (
        formats.read_orc(spark, path)
        .filter("l_quantity < 5")
        .select("l_orderkey", "l_quantity")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_quantity)" in plan
    scan_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_orderkey" in scan_schema and "l_quantity" in scan_schema
    assert "l_extendedprice" not in scan_schema
