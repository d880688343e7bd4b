"""Export sink (sources/export.py): sharded write + manifest sidecar.

Pins: the manifest certifies what landed (verify passes on an intact
export); each shard is ONE file whose PHYSICAL row order is the
defined (h, doc_id) order (pyarrow read, no Spark reshuffle to mask
it); exports are deterministic (re-export -> identical manifest); and
tampering (a deleted shard) is detected."""

from __future__ import annotations

import glob
import json
import os

import pyarrow.parquet as pq

from map_reduce_indexing_spark.sources.export import (
    MANIFEST_FILE,
    export_shards,
    verify_export,
)
from tests.conftest import SF_DIR


def test_export_lifecycle_and_physical_order(spark, tmp_path):
    out = str(tmp_path / "export")
    manifest = export_shards(spark, SF_DIR, out)
    assert os.path.exists(os.path.join(out, MANIFEST_FILE))
    assert manifest["total_docs"] == 500
    assert sum(s["n_docs"] for s in manifest["shards"].values()) == 500
    assert verify_export(spark, out) == {}

    # one data file per shard, physical order == the defined order
    shard_dirs = sorted(glob.glob(os.path.join(out, "shard_id=*")))
    assert len(shard_dirs) == len(manifest["shards"])
    for d in shard_dirs:
        files = [
            f for f in glob.glob(os.path.join(d, "*.parquet"))
        ]
        assert len(files) == 1
        tbl = pq.read_table(files[0]).to_pydict()
        order = list(zip(tbl["h"], tbl["doc_id"]))
        assert order == sorted(order)

    # determinism: a second export produces the identical manifest
    out2 = str(tmp_path / "export2")
    manifest2 = export_shards(spark, SF_DIR, out2)
    assert manifest2 == manifest


def test_export_tampering_is_detected(spark, tmp_path):
    out = str(tmp_path / "tamper")
    export_shards(spark, SF_DIR, out)
    import shutil

    victim = sorted(glob.glob(os.path.join(out, "shard_id=*")))[0]
    shutil.rmtree(victim)
    problems = verify_export(spark, out)
    sid = victim.rsplit("=", 1)[1]
    assert sid in problems and "missing" in problems[sid]
    assert len(problems) == 1  # every other shard still verifies


def test_export_row_scramble_is_detected(spark, tmp_path):
    """Same rows, permuted physical order: membership checks would
    pass, but the manifest pins PHYSICAL order, so verify must flag
    exactly the scrambled shard."""
    out = str(tmp_path / "scramble")
    export_shards(spark, SF_DIR, out)
    victim_dir = sorted(glob.glob(os.path.join(out, "shard_id=*")))[0]
    [victim] = glob.glob(os.path.join(victim_dir, "*.parquet"))
    tbl = pq.read_table(victim)
    n = tbl.num_rows
    assert n >= 2
    perm = list(range(1, n)) + [0]  # rotate rows by one
    pq.write_table(tbl.take(perm), victim)
    # stale .crc would fail the read after rewrite — drop it
    for crc in glob.glob(os.path.join(victim_dir, ".*.crc")):
        os.remove(crc)
    problems = verify_export(spark, out)
    sid = victim_dir.rsplit("=", 1)[1]
    assert list(problems) == [sid]
    want = problems[sid]["want"]
    got = problems[sid]["got"]
    assert want["n_docs"] == got["n_docs"]  # same membership...
    assert want["order_checksum"] != got["order_checksum"]  # ...wrong order
