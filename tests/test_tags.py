"""Named generation tags and cross-store savepoints (round 9).

sources/generations.py grows Iceberg-style REFS: `tag_generation`
pins a generation under a name that (a) resolves anywhere a
generation number does (`read_generation(at="name")`,
`IndexSession.postings_at("name")`, `generation_diff(since="name")`)
and (b) BLOCKS retention expiry until dropped — so a week-long
training run can pin its input by name while ingest and compaction
churn freely, where the TTL policy alone only guarantees a wall-clock
window. `create_savepoint` applies one shared tag across several
stores, giving a multi-artifact consumer a single handle.

Pinned here: a tag survives append+compact eras that expire every
untagged sibling (through the REAL compaction path, so
carry_generations must carry refs and honor them in its own expiry);
tag reads equal generation-number reads; dropping a tag re-enters
normal retention; unknown/invalid names fail loudly; a savepoint pins
each store's head and feeds `generation_diff(since=name)`.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_indexing_spark.api import IndexSession
from map_reduce_indexing_spark.sources.generations import (
    GEN_RETAIN,
    create_savepoint,
    drop_savepoint,
    drop_tag,
    generation_diff,
    generation_head,
    list_tags,
    load_manifest,
    publish_generation,
    read_generation,
    tag_generation,
)


def _docs(spark, lo: int, n: int, word: str):
    return spark.createDataFrame(
        [(lo + i, f"{word} common") for i in range(n)],
        "doc_id long, text string",
    )


def test_tag_survives_eras_that_expire_untagged_siblings(
    spark, tmp_path, monkeypatch
):
    import map_reduce_indexing_spark.sources.generations as G

    monkeypatch.setattr(G, "GEN_TTL_SECONDS", 0.0)  # pure count aging
    s = IndexSession.build(spark, _docs(spark, 0, 10, "alpha"), str(tmp_path / "ix"))
    s.append(_docs(spark, 100, 5, "beta"))
    pinned = tag_generation(s.index_path, "train-v1")
    want = {(r.word, r.doc_id) for r in s.postings_at("train-v1").collect()}
    assert want and list_tags(s.index_path) == {"train-v1": pinned}

    for i in range(GEN_RETAIN + 2):  # churn far past the retention count
        s.append(_docs(spark, 1000 + i, 1, f"w{i}"))
        s.compact()  # the REAL swap: carry_generations must keep the ref

    m = load_manifest(s.index_path)
    assert str(pinned) in m["gens"]  # the tagged era survived every expiry
    # untagged generations between the pin and the retained tail are gone
    kept = sorted(int(k) for k in m["gens"])
    assert kept[0] == pinned and kept[1] > pinned + 1
    got = {(r.word, r.doc_id) for r in s.postings_at("train-v1").collect()}
    assert got == want  # and still reads the exact pinned rows

    drop_tag(s.index_path, "train-v1")
    s.append(_docs(spark, 2000, 1, "zz"))  # next publish prunes it
    s.compact()
    assert str(pinned) not in load_manifest(s.index_path)["gens"]
    with pytest.raises(ValueError, match="no tag"):
        s.postings_at("train-v1").collect()


def test_tag_read_equals_generation_read_and_validation(spark, tmp_path):
    base = str(tmp_path / "b")
    spark.range(10).coalesce(1).write.parquet(base)
    publish_generation(base)
    spark.range(10, 20).coalesce(1).write.mode("append").parquet(base)
    publish_generation(base)
    g = tag_generation(base, "first", at=1)
    assert g == 1
    by_tag = sorted(r.id for r in read_generation(spark, base, at="first").collect())
    by_gen = sorted(r.id for r in read_generation(spark, base, at=1).collect())
    assert by_tag == by_gen == list(range(10))

    with pytest.raises(ValueError, match="no tag 'nope'"):
        read_generation(spark, base, at="nope")
    with pytest.raises(ValueError, match="invalid tag name"):
        tag_generation(base, "7")  # digits-first: confusable with a number
    with pytest.raises(ValueError, match="no generation manifest"):
        tag_generation(str(tmp_path / "missing"), "x")


def test_savepoint_pins_stores_and_feeds_generation_diff(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    spark.range(5).coalesce(1).write.parquet(a)
    publish_generation(a)
    spark.range(100, 103).coalesce(1).write.parquet(b)
    publish_generation(b)

    sp = create_savepoint([a, b], "sp1")
    assert sp == {a: 1, b: 1}

    # writers keep publishing after the savepoint
    spark.range(5, 9).coalesce(1).write.mode("append").parquet(a)
    publish_generation(a)
    spark.range(103, 110).coalesce(1).write.mode("append").parquet(b)
    publish_generation(b)

    assert sorted(
        r.id for r in read_generation(spark, a, at="sp1").collect()
    ) == list(range(5))
    assert sorted(
        r.id for r in read_generation(spark, b, at="sp1").collect()
    ) == list(range(100, 103))
    # incremental consumption from the savepoint: only the delta files
    delta = generation_diff(spark, a, since="sp1")
    assert sorted(r.id for r in delta.collect()) == list(range(5, 9))

    drop_savepoint([a, b], "sp1")
    assert list_tags(a) == {} and list_tags(b) == {}
    assert generation_head(a) == 2  # data untouched by tag lifecycle


def test_time_travel_by_timestamp(spark, tmp_path):
    from map_reduce_indexing_spark.sources.generations import (
        generation_at_timestamp,
    )

    base = str(tmp_path / "b")
    spark.range(3).coalesce(1).write.parquet(base)
    publish_generation(base)
    spark.range(3, 6).coalesce(1).write.mode("append").parquet(base)
    publish_generation(base)
    m = load_manifest(base)
    t1 = float(m["gens"]["1"]["created"])
    t2 = float(m["gens"]["2"]["created"])

    assert generation_at_timestamp(base, t1) == 1  # inclusive at publish
    assert generation_at_timestamp(base, (t1 + t2) / 2) in (1, 2)
    assert generation_at_timestamp(base, t2 + 10.0) == 2  # future: head
    with pytest.raises(ValueError, match="aged out"):
        generation_at_timestamp(base, t1 - 10.0)  # before the first publish
    g = generation_at_timestamp(base, t1)
    assert read_generation(spark, base, at=g).count() == 3


def test_describe_generations_metadata_table(spark, tmp_path):
    from map_reduce_indexing_spark.sources.generations import (
        describe_generations,
    )

    base = str(tmp_path / "b")
    spark.range(100).coalesce(2).write.parquet(base)
    publish_generation(base)
    tag_generation(base, "train-v1")
    spark.range(100, 150).coalesce(1).write.mode("append").parquet(base)
    publish_generation(base)

    d = {r.generation: r for r in describe_generations(spark, base).collect()}
    assert set(d) == {1, 2}
    assert d[1].n_files == 2 and d[1].n_rows == 100
    assert d[2].n_files == 3 and d[2].n_rows == 150
    assert d[1].tags == "train-v1" and d[2].tags is None
    assert (d[1].is_head, d[2].is_head) == (False, True)
    assert d[1].bytes > 0 and d[2].bytes > d[1].bytes
    assert d[1].published <= d[2].published


def test_describe_generations_dv_and_schema_columns(spark, tmp_path):
    """Round 13: the snapshots table reports LOGICAL rows (physical
    minus deletion-vector entries, matching generation_row_count),
    the vector size, and the declared schema id."""
    from map_reduce_indexing_spark.sources.generations import (
        append_rows,
        delete_rows_dv,
        describe_generations,
    )

    base = str(tmp_path / "b")
    append_rows(
        spark,
        base,
        spark.createDataFrame([(i, i) for i in range(20)], "id long, v long"),
    )
    delete_rows_dv(spark, base, [("id", "<", 4)])
    d = {r.generation: r for r in describe_generations(spark, base).collect()}
    assert d[1].n_rows == 20 and d[1].n_deleted == 0
    assert d[2].n_rows == 16 and d[2].n_deleted == 4  # logical rows
    assert d[1].schema_id is not None
    assert d[2].schema_id == d[1].schema_id
