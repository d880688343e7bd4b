"""Artifact generations: snapshot isolation for the maintained stores.

Every flock-managed artifact (count index, positional index, tokens,
vector stores) is append-then-compact: appends add parquet files,
compaction rewrites the directory behind a staged `os.replace` swap.
That gives readers atomicity (old or new wholesale) but no way to PIN
a version across a multi-query session — e.g. train on snapshot S
while ingest continues, or run a two-query reconciliation that must
see one consistent file set.

This module adds monotonically versioned generations — the
export_shards manifest pattern applied inward:

- `_generations.json` at the artifact root (underscore-prefixed, so
  Spark directory scans never see it, same as `_quantizer.json`)
  records, per generation, a root ("." or a retained `_gen/g{N}`
  subdir) and the file list under it.
- Appends are naturally snapshot-friendly: files are immutable and
  only ADDED, so generation N is simply the listing at publish time —
  `publish_generation` after each append, `ensure_base_generation`
  before the first (so the pre-append state is pinnable).
- Compaction REPLACES the directory, so `carry_generations` (called
  by `compact_artifact` on the staging dir, before the swap)
  hardlinks the head generation's files into `staging/_gen/g{head}`,
  carries forward previously retained generation dirs within
  GEN_RETAIN, and writes the new manifest — head+1 = the compacted
  live files — INTO staging so manifest and data swap atomically.
  The live path is never mutated pre-swap: a crash discards staging
  and leaves the old store (and old manifest) intact, exactly the
  existing crash-safety story.
- `read_generation(spark, path, at=N)` reads exactly generation N's
  files (basePath-anchored so Hive partition columns survive), with
  one re-resolve retry: a reader racing the swap re-reads the
  manifest, under which its pinned generation has moved to `_gen`.

Retention: the newest GEN_RETAIN relocated generations survive each
compaction; older ones age out (their rows live on in the compacted
head — only the historical file layout is dropped). At 100 TB this
is the Iceberg/Delta snapshot pattern reduced to its data-plane half:
manifests + immutable files + retention, no metastore required.

Reference parity: the reference's ./index has no versioning at all
(SURVEY.md §2.12 — its appends aren't even locked); this is the
extension tier's answer to "what does a long-lived store need that
the reference never addressed".
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

GEN_FILE = "_generations.json"
GEN_DIR = "_gen"  # underscore: invisible to Spark directory scans
GEN_RETAIN = 3  # relocated generations surviving each compaction


def _gen_path(path: str) -> str:
    return os.path.join(path, GEN_FILE)


def _data_files(path: str) -> list[str]:
    """Relative paths of the artifact's data files (recursive;
    underscore/dot entries — sidecars, _gen, success markers —
    excluded at every level, mirroring Spark's discovery rules)."""
    out: list[str] = []
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in files:
            if f.startswith(("_", ".")) or f.endswith(".crc"):
                continue
            out.append(os.path.relpath(os.path.join(root, f), path))
    return sorted(out)


def load_manifest(path: str) -> dict | None:
    p = _gen_path(path)
    if not os.path.isfile(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def _save_manifest(path: str, manifest: dict) -> None:
    tmp = _gen_path(path) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, _gen_path(path))


def generation_head(path: str) -> int:
    """The newest published generation (0 = nothing published yet)."""
    m = load_manifest(path)
    return int(m["head"]) if m else 0


def ensure_base_generation(path: str) -> int:
    """Publish the CURRENT live listing as generation 1 iff no
    manifest exists — called by writers before their first mutation so
    the pre-mutation state is pinnable. Callers hold the artifact's
    writer flock."""
    if not os.path.isdir(path):
        return 0  # store not created yet: nothing to pin before the write
    m = load_manifest(path)
    if m is not None:
        return int(m["head"])
    m = {"head": 1, "gens": {"1": {"root": ".", "files": _data_files(path)}}}
    _save_manifest(path, m)
    return 1


def publish_generation(path: str) -> int:
    """Snapshot the live listing as a new head generation. Appends only
    add files, so every previously published live-rooted generation's
    file set is still intact and stays pinnable. Callers hold the
    artifact's writer flock."""
    m = load_manifest(path) or {"head": 0, "gens": {}}
    head = int(m["head"]) + 1
    m["head"] = head
    m["gens"][str(head)] = {"root": ".", "files": _data_files(path)}
    _save_manifest(path, m)
    return head


def carry_generations(path: str, staging: str) -> None:
    """Compaction support, called on the STAGING directory after the
    rewrite and before the swap (the live path is never touched):

    1. hardlink (copy on link failure) the head generation's live
       files into `staging/_gen/g{head}` — the file set a reader
       pinned at head must still resolve after the swap;
    2. carry forward the newest GEN_RETAIN-1 previously relocated
       generation dirs the same way;
    3. write the post-swap manifest into staging: every surviving
       generation re-rooted under `_gen`, plus head+1 = the staging
       rewrite's own live files.

    No-op when the artifact has no manifest (generations never
    requested for this store)."""
    import shutil

    m = load_manifest(path)
    if m is None:
        return
    head = int(m["head"])
    gens = {int(k): v for k, v in m["gens"].items()}
    new_gens: dict[str, dict] = {}

    def link_tree(src_root: str, rels: list[str], dst_root: str) -> None:
        for rel in rels:
            dst = os.path.join(dst_root, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            try:
                os.link(os.path.join(src_root, rel), dst)
            except OSError:
                shutil.copy2(os.path.join(src_root, rel), dst)

    # One relocated root per compaction era: the head's live file set
    # is a SUPERSET of every live-rooted generation's (appends only
    # add files), so linking it once under _gen/g{head} preserves all
    # of them — each live-rooted generation is remapped to that root
    # with its own (sub)listing.
    live = [n for n, g in gens.items() if g["root"] == "."]
    if live:
        era_root = os.path.join(GEN_DIR, f"g{head}")
        link_tree(
            path,
            gens[max(live)]["files"],
            os.path.join(staging, era_root),
        )
        for n in live:
            new_gens[str(n)] = {"root": era_root, "files": gens[n]["files"]}
    # Carry forward the newest previously relocated roots within
    # retention (GEN_RETAIN roots total including the new era's).
    old_roots = sorted(
        {g["root"] for g in gens.values() if g["root"] != "."},
        key=lambda r: int(r.rsplit("g", 1)[1]),
        reverse=True,
    )[: max(GEN_RETAIN - 1, 0)]
    for root in old_roots:
        members = {n: g for n, g in gens.items() if g["root"] == root}
        link_tree(
            os.path.join(path, root),
            gens[max(members)]["files"],
            os.path.join(staging, root),
        )
        for n, g in members.items():
            new_gens[str(n)] = {"root": root, "files": g["files"]}
    new_head = head + 1
    new_gens[str(new_head)] = {"root": ".", "files": _data_files(staging)}
    _save_manifest(staging, {"head": new_head, "gens": new_gens})


def read_generation(
    spark: SparkSession, path: str, at: int | None = None
) -> DataFrame:
    """A DataFrame over exactly generation `at`'s files (head when
    None). basePath anchors partition-column discovery to the
    generation's root, so `letter=`/`bucket=`/`cell=` columns survive
    relocation. One re-resolve retry covers a reader racing the
    compaction swap (its generation relocated under `_gen` between
    manifest read and plan execution)."""
    from ..operators.indexing import recover_index

    def resolve() -> tuple[str, list[str]]:
        recover_index(path)
        m = load_manifest(path)
        if m is None:
            raise ValueError(
                f"{path!r} has no generation manifest; use the live read "
                "or publish a generation first"
            )
        n = int(m["head"]) if at is None else int(at)
        g = m["gens"].get(str(n))
        if g is None:
            raise ValueError(
                f"generation {n} of {path!r} is not available "
                f"(retained: {sorted(int(k) for k in m['gens'])}); "
                f"raise GEN_RETAIN or pin a newer snapshot"
            )
        root = path if g["root"] == "." else os.path.join(path, g["root"])
        return root, [os.path.join(root, f) for f in g["files"]]

    root, files = resolve()
    if not all(os.path.exists(f) for f in files):
        root, files = resolve()  # raced a swap: re-resolve once
    if not files:
        raise ValueError(f"generation has no data files in {path!r}")
    return spark.read.option("basePath", root).parquet(*files)
