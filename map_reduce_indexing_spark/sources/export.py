"""Training-data export sink: the text_shuffle_shards permutation made
DURABLE — hash-sharded parquet plus a `_manifest.json` sidecar that
pins each shard's row count and order checksum, so a training consumer
(or a later verify pass) can prove the export is complete and in the
exact seed-stable order without trusting the writer.

The sidecar-beside-the-data pattern is the engine's store discipline
(`_quantizer.json` / `_codebook.json` in the vector store); the
reference analogue is the same artifact lifecycle (client.c:39 builds,
helper_reduce.c:238-257 serves) applied to the EXPORT artifact.

Scale shape: one exchange on shard_id + a per-shard local sort — the
repartition/sortWithinPartitions/partitionBy shuffle-write pattern, no
global sort anywhere; the manifest aggregation rides the same
partitioning. Each shard lands as one file (hash repartition on the
shard key sends a shard to exactly one task)."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators.textstats import (
    _CKSUM_P,
    N_SHARDS,
    shard_id_col,
    shuffle_hash_col,
)
from ..sources.tables import load_table

MANIFEST_FILE = "_manifest.json"


def _shard_summary(docs: DataFrame, physical: bool = False) -> DataFrame:
    """(shard_id, n_docs, order_checksum) — the text_shuffle_shards
    checksum arithmetic: both factors reduced mod p before multiplying,
    exact decimal sum.

    `physical=False` ranks by the DEFINED order (h, doc_id);
    `physical=True` ranks by ARRIVAL order (file name, then
    monotonically_increasing_id — increasing in read order within each
    scan partition, with split partitions of one file enumerated in
    offset order), i.e. the order a training consumer actually reads.
    A verify pass that re-sorted by (h, doc_id) would reconstruct the
    intended order no matter how the rows physically lie and certify a
    scrambled file as intact — exactly the failure the checksum exists
    to catch."""
    if physical:
        order = [F.input_file_name(), F.monotonically_increasing_id()]
    else:
        order = [F.col("h"), F.col("doc_id")]
    rn = F.row_number().over(Window.partitionBy("shard_id").orderBy(*order))
    return (
        docs.withColumn("rn", rn.cast("long"))
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (
                F.sum(
                    (
                        ((F.col("rn") % _CKSUM_P) * (F.col("doc_id") % _CKSUM_P))
                        % _CKSUM_P
                    ).cast("decimal(38,0)")
                )
                % _CKSUM_P
            )
            .cast("long")
            .alias("order_checksum"),
        )
    )


def _sharded(docs: DataFrame) -> DataFrame:
    h = shuffle_hash_col()
    return docs.select(
        "doc_id", "text", h.alias("h")
    ).withColumn("shard_id", shard_id_col(F.col("h")))


def export_shards(
    spark: SparkSession, sf_dir: str, out_path: str
) -> dict:
    """Write the corpus as N_SHARDS seed-stable shards + manifest;
    returns the manifest. The manifest is computed by READING BACK the
    written files (not from the pre-write frame), so it certifies what
    actually landed on disk."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sharded = _sharded(docs)
    # The local sort LEADS with shard_id: FileFormatWriter demands its
    # input ordered by the partition columns (so it can write one open
    # file at a time) and inserts its OWN — unstable — sort when that
    # requiredOrdering isn't already satisfied, which would scramble
    # the within-shard (h, doc_id) order this export exists to pin.
    # Sorting (shard_id, h, doc_id) satisfies the writer's requirement,
    # so no second sort runs and the physical row order in every shard
    # file is exactly the manifest's defined order (pyarrow-verified in
    # tests/test_export.py).
    (
        sharded.repartition("shard_id")
        .sortWithinPartitions("shard_id", "h", "doc_id")
        .write.partitionBy("shard_id")
        .mode("overwrite")
        .parquet(out_path)
    )
    written = spark.read.parquet(out_path)
    rows = _shard_summary(written).collect()
    # The writer must have landed the DEFINED order physically: compare
    # the arrival-order checksums against the defined-order ones and
    # refuse to publish a manifest over a scrambled export (this is the
    # guard for the FileFormatWriter unstable-sort hazard noted above).
    phys = {
        r.shard_id: (r.n_docs, r.order_checksum)
        for r in _shard_summary(written, physical=True).collect()
    }
    for r in rows:
        if phys.get(r.shard_id) != (r.n_docs, r.order_checksum):
            raise RuntimeError(
                f"shard {r.shard_id}: physical row order does not match "
                "the defined (h, doc_id) order — refusing to write a "
                "manifest over a scrambled export"
            )
    manifest = {
        "n_shards": N_SHARDS,
        "seed_scheme": "md5(doc_id:seed) order, shard = first8hex mod N",
        "total_docs": int(sum(r.n_docs for r in rows)),
        "shards": {
            str(r.shard_id): {
                "n_docs": int(r.n_docs),
                "order_checksum": int(r.order_checksum),
            }
            for r in rows
        },
    }
    tmp = os.path.join(out_path, MANIFEST_FILE + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_path, MANIFEST_FILE))
    return manifest


def verify_export(spark: SparkSession, out_path: str) -> dict:
    """Recompute every shard's count + PHYSICAL-order checksum from the
    files and diff against the manifest. Returns {} when the export is
    intact; otherwise a dict of per-shard discrepancies (missing shard,
    extra shard, count, checksum, or row-order mismatch). Physical
    ranking means a same-rows-permuted shard FAILS here — the manifest
    pins the order consumers read, not just membership."""
    with open(os.path.join(out_path, MANIFEST_FILE)) as fh:
        manifest = json.load(fh)
    got = {
        str(r.shard_id): {
            "n_docs": int(r.n_docs),
            "order_checksum": int(r.order_checksum),
        }
        for r in _shard_summary(
            spark.read.parquet(out_path), physical=True
        ).collect()
    }
    want = manifest["shards"]
    problems: dict = {}
    for sid in sorted(set(want) | set(got)):
        if sid not in got:
            problems[sid] = {"missing": want[sid]}
        elif sid not in want:
            problems[sid] = {"unexpected": got[sid]}
        elif got[sid] != want[sid]:
            problems[sid] = {"want": want[sid], "got": got[sid]}
    return problems
