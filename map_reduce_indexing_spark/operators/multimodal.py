"""Multimodal columns: binary payloads + typed metadata (EXT tier).

Pattern for image/audio/video at 100 TB: store the raw bytes as an
opaque `binary` column next to typed metadata, and run decode /
feature-extraction / frame-sampling as Arrow-batched Pandas functions
(`mapInPandas`) so bytes never round-trip through Python row by row.

The container has no image/audio libraries, so the *decode* step is a
deterministic fake (clearly marked; `decode_image_real` shows the
gated real path). Everything Spark-side — the binary column build, the
Arrow batch shapes, the mapInPandas schemas, the exploded frame rows —
is real and oracle-verified via byte-length arithmetic.

The synthetic payload is built from the documents fixture: a 4-byte
PNG magic header + the utf-8 text bytes. Both engines construct it
identically, so metadata extracted in Python (len, magic) matches SQL
(octet_length, hex) exactly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.registry import register
from ..sources.tables import load_table

PNG_MAGIC = "89504E47"
FRAME_BYTES = 1024  # fake "video" frame size
FRAME_STRIDE = 4  # sample every 4th frame


def with_blob(docs: DataFrame) -> DataFrame:
    """Attach the synthetic binary payload column."""
    return docs.withColumn(
        "blob", F.expr(f"concat(X'{PNG_MAGIC}', encode(text, 'UTF-8'))")
    )


DUCK_BLOB_DOCS = (
    f"SELECT doc_id, (from_hex('{PNG_MAGIC}') || encode(text)) AS blob FROM documents"
)


# ---- "decode" stubs -------------------------------------------------------


def _fake_decode_meta(data: bytes) -> tuple[int, str, int, int]:
    """Deterministic stand-in for an image decoder: derive (byte_len,
    magic_hex, width, height) from the bytes alone."""
    n = len(data)
    return n, data[:4].hex().upper(), n % 640 + 1, (n * 7) % 480 + 1


def decode_image_real(data: bytes):  # pragma: no cover - no PIL in container
    """The real decode path, gated on the library being present."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires pillow, which is not installed in this "
            "environment; the pipeline uses _fake_decode_meta instead"
        ) from e
    import io

    from PIL import Image as _Image

    return _Image.open(io.BytesIO(data))


def extract_image_meta(blobs: DataFrame) -> DataFrame:
    """(doc_id, blob) -> (doc_id, byte_len, magic, width, height) via
    Arrow-batched mapInPandas — the bytes stay in columnar batches."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["blob"].map(_fake_decode_meta)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": meta.map(lambda m: m[0]),
                    "magic": meta.map(lambda m: m[1]),
                    "width": meta.map(lambda m: m[2]),
                    "height": meta.map(lambda m: m[3]),
                }
            )

    return blobs.mapInPandas(
        op, schema="doc_id long, byte_len long, magic string, width long, height long"
    )


def extract_image_meta_real(blobs: DataFrame) -> DataFrame:
    """(doc_id, blob) -> (doc_id, byte_len, magic, width, height) with a
    GENUINE pillow decode inside the Arrow-batched mapInPandas worker —
    the same plumbing as extract_image_meta, real pixels instead of the
    deterministic fake. Import happens in the worker function so the
    driver can build the plan anywhere; executing without pillow raises
    the same NotImplementedError as decode_image_real.

    Exercised by tests/test_llm_ops.py::test_real_decode_roundtrip,
    which is skipped when the environment lacks pillow (as this
    container does) and runs genuine decode wherever it is present."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "byte_len": [],
                "magic": [],
                "width": [],
                "height": [],
            }
            for doc_id, data in zip(pdf["doc_id"], pdf["blob"]):
                img = decode_image_real(bytes(data))
                out["doc_id"].append(doc_id)
                out["byte_len"].append(len(data))
                out["magic"].append(bytes(data)[:4].hex().upper())
                out["width"].append(img.width)
                out["height"].append(img.height)
            yield pd.DataFrame(out)

    return blobs.mapInPandas(
        op, schema="doc_id long, byte_len long, magic string, width long, height long"
    )


def sample_frames(blobs: DataFrame) -> DataFrame:
    """Treat each blob as a fake video: split into FRAME_BYTES chunks and
    emit every FRAME_STRIDE-th frame as its own row (exploding mapInPandas)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_len": []}
            for doc_id, data in zip(pdf["doc_id"], pdf["blob"]):
                n = len(data)
                n_frames = (n + FRAME_BYTES - 1) // FRAME_BYTES
                for i in range(0, n_frames, FRAME_STRIDE):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_len"].append(min(FRAME_BYTES, n - i * FRAME_BYTES))
            yield pd.DataFrame(out)

    return blobs.mapInPandas(op, schema="doc_id long, frame_idx long, frame_len long")


RESIZE_BOX = (64, 48)  # target (width, height) bounding box
EMBED_DIM = 16


def resize_images(blobs: DataFrame) -> DataFrame:
    """(doc_id, blob) -> (doc_id, width, height, new_w, new_h, out_bytes):
    scale-to-fit resize. The pixel resample is part of the stubbed decode
    (out payload = new_w * new_h fake bytes); the dimension arithmetic,
    Arrow plumbing, and binary-out schema are real."""
    bw, bh = RESIZE_BOX

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_cols = ("doc_id", "width", "height", "new_w", "new_h", "out_bytes")
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in out_cols}
            for doc_id, data in zip(pdf["doc_id"], pdf["blob"]):
                _, _, w, h = _fake_decode_meta(data)
                scale = min(bw / w, bh / h)
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                for c, v in zip(out_cols, (doc_id, w, h, nw, nh, nw * nh)):
                    out[c].append(v)
            yield pd.DataFrame(out)

    return blobs.mapInPandas(
        op,
        schema="doc_id long, width long, height long, new_w long, new_h long, out_bytes long",
    )


def embed_blobs(blobs: DataFrame) -> DataFrame:
    """(doc_id, blob) -> (doc_id, emb array<double>[EMBED_DIM]): the
    feature-extraction stage. The 'model' is a deterministic md5-based
    stub (v[i] = (digest_byte_i - 128) / 128, exact dyadic doubles);
    the output schema/partitioning feed the ANN operators unchanged."""
    import hashlib

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = [
                [
                    (b - 128) / 128.0
                    for b in hashlib.md5(data.hex().upper().encode()).digest()
                ]
                for data in pdf["blob"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "emb": embs})

    return blobs.mapInPandas(op, schema="doc_id long, emb array<double>")


# ---- registered queries ---------------------------------------------------


@register(
    "multimodal_resize",
    oracle=f"""
        SELECT doc_id, width, height,
               CAST(greatest(1, CAST(trunc(width * scale) AS BIGINT)) AS BIGINT) AS new_w,
               CAST(greatest(1, CAST(trunc(height * scale) AS BIGINT)) AS BIGINT) AS new_h,
               CAST(greatest(1, CAST(trunc(width * scale) AS BIGINT))
                    * greatest(1, CAST(trunc(height * scale) AS BIGINT)) AS BIGINT) AS out_bytes
        FROM (
            SELECT doc_id, width, height,
                   least({RESIZE_BOX[0]}.0 / width, {RESIZE_BOX[1]}.0 / height) AS scale
            FROM (
                SELECT doc_id,
                       octet_length(blob) % 640 + 1 AS width,
                       (octet_length(blob) * 7) % 480 + 1 AS height
                FROM ({DUCK_BLOB_DOCS})))
    """,
    tier="llm",
    doc=f"Scale-to-fit resize into a {RESIZE_BOX[0]}x{RESIZE_BOX[1]} box "
    "over the binary column (mapInPandas; resample inside the stubbed "
    "decode). Dimension arithmetic oracle-checked exactly — the "
    "double scale factor is a single division on both engines.",
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return resize_images(with_blob(docs).select("doc_id", "blob"))


@register(
    "multimodal_embed",
    oracle=f"""
        SELECT doc_id,
               array_to_string(
                 [ CAST(CAST((CAST('0x' || substr(md5(upper(hex(blob))), i * 2 + 1, 2) AS BIGINT)
                      - 128) / 128.0 AS DECIMAL(10,7)) AS VARCHAR)
                   FOR i IN range({EMBED_DIM}) ], ',') AS emb
        FROM ({DUCK_BLOB_DOCS}) WHERE doc_id < 200
    """,
    tier="llm",
    doc="Feature extraction: binary column -> fixed-dim embedding vector "
    "(md5-stubbed 'model' behind the same mapInPandas plumbing a real "
    "encoder uses). Values are exact dyadic multiples of 1/128, so the "
    "DECIMAL(10,7) serialization (scalar string output for the driver "
    "canonicalizer) is lossless and bit-comparable across engines.",
)
def q_multimodal_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 200)
    )
    emb = embed_blobs(with_blob(docs).select("doc_id", "blob"))
    return emb.select(
        "doc_id",
        F.concat_ws(
            ",", F.transform("emb", lambda x: x.cast("decimal(10,7)").cast("string"))
        ).alias("emb"),
    )


@register(
    "multimodal_image_meta",
    oracle=f"""
        SELECT doc_id,
               CAST(octet_length(blob) AS BIGINT) AS byte_len,
               upper(substr(hex(blob), 1, 8)) AS magic,
               CAST(octet_length(blob) % 640 + 1 AS BIGINT) AS width,
               CAST((octet_length(blob) * 7) % 480 + 1 AS BIGINT) AS height
        FROM ({DUCK_BLOB_DOCS})
    """,
    tier="llm",
    doc="Binary-column metadata extraction through Arrow-batched "
    "mapInPandas (decode stubbed deterministically; plumbing real).",
)
def q_multimodal_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return extract_image_meta(with_blob(docs).select("doc_id", "blob"))


@register(
    "multimodal_frame_sample",
    oracle=f"""
        SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
               CAST(least({FRAME_BYTES}, octet_length(blob) - i * {FRAME_BYTES}) AS BIGINT)
                 AS frame_len
        FROM ({DUCK_BLOB_DOCS}),
             LATERAL (SELECT unnest(range(0,
                 CAST(ceil(octet_length(blob) / {FRAME_BYTES}.0) AS BIGINT),
                 {FRAME_STRIDE})) AS i)
    """,
    tier="llm",
    doc=f"Frame sampling over binary video payloads: {FRAME_BYTES}-byte "
    f"frames, every {FRAME_STRIDE}th emitted as a row (exploding "
    "mapInPandas). Row-explosion stays inside the Arrow batch.",
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return sample_frames(with_blob(docs).select("doc_id", "blob"))


@register(
    "multimodal_corpus_bytes",
    export=False,  # pytest-verified variant; kept out of the external window
    oracle=f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_blobs,
               CAST(SUM(octet_length(blob)) AS BIGINT) AS total_bytes,
               CAST(MAX(octet_length(blob)) AS BIGINT) AS max_bytes
        FROM ({DUCK_BLOB_DOCS})
    """,
    tier="llm",
    doc="Storage accounting over the binary column — pure JVM-side "
    "(no Python), the cheap pre-pass before any decode fan-out.",
)
def q_multimodal_corpus_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    blobs = with_blob(docs)
    return blobs.agg(
        F.count(F.lit(1)).alias("n_blobs"),
        F.sum(F.expr("octet_length(blob)")).alias("total_bytes"),
        F.max(F.expr("octet_length(blob)")).alias("max_bytes"),
    )


# ---------------------------------------------------------------------------
# Audio: typed header parsing on a binary column, no Python in the path
# ---------------------------------------------------------------------------

RIFF_MAGIC = "52494646"  # "RIFF"


@register(
    "multimodal_audio_meta",
    oracle=f"""
        WITH a AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 2 = 0 THEN 16000 ELSE 44100 END AS sr,
                   doc_id % 2 + 1 AS ch, n_chars AS ns, text
            FROM documents),
        b AS (
            SELECT doc_id,
                   (from_hex('{RIFF_MAGIC}')
                    || from_hex(lpad(to_hex(sr), 8, '0'))
                    || from_hex(lpad(to_hex(ch), 4, '0'))
                    || from_hex(lpad(to_hex(ns), 8, '0'))
                    || encode(text)) AS blob
            FROM a)
        SELECT doc_id,
               CAST('0x' || substr(hex(blob), 9, 8) AS BIGINT) AS sample_rate,
               CAST('0x' || substr(hex(blob), 17, 4) AS BIGINT) AS n_channels,
               CAST('0x' || substr(hex(blob), 21, 8) AS BIGINT) AS n_samples,
               ROUND(CAST(CAST('0x' || substr(hex(blob), 21, 8) AS BIGINT) AS DOUBLE)
                     / CAST('0x' || substr(hex(blob), 9, 8) AS BIGINT), 6)
                 AS duration_sec
        FROM b
    """,
    tier="llm",
    doc="Audio modality: a RIFF-style synthetic header (magic, sample "
    "rate, channels, sample count — big-endian fields, built identically "
    "on both engines) prepended to the payload bytes, then parsed back "
    "to typed metadata ENTIRELY in JVM expressions — substring on the "
    "binary column + hex + base conversion, no Python decode in the "
    "path. The pattern for cheap typed-metadata extraction (duration, "
    "rate, channel layout) over 100 TB of audio blobs; full sample "
    "decode would ride the same mapInPandas plumbing as the image tier.",
)
def q_multimodal_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    a = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, 16000).otherwise(44100).alias("sr"),
        (F.col("doc_id") % 2 + 1).alias("ch"),
        F.col("n_chars").alias("ns"),
        "text",
    )
    blob = F.expr(
        f"concat(X'{RIFF_MAGIC}', "
        "unhex(lpad(hex(sr), 8, '0')), "
        "unhex(lpad(hex(ch), 4, '0')), "
        "unhex(lpad(hex(ns), 8, '0')), "
        "encode(text, 'UTF-8'))"
    )
    b = a.select("doc_id", blob.alias("blob"))
    sr = F.expr("conv(hex(substring(blob, 5, 4)), 16, 10)").cast("long")
    ch = F.expr("conv(hex(substring(blob, 9, 2)), 16, 10)").cast("long")
    ns = F.expr("conv(hex(substring(blob, 11, 4)), 16, 10)").cast("long")
    return b.select(
        "doc_id",
        sr.alias("sample_rate"),
        ch.alias("n_channels"),
        ns.alias("n_samples"),
        F.round(ns.cast("double") / sr, 6).alias("duration_sec"),
    )
