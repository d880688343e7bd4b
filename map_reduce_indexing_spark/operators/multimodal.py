"""Multimodal columns: binary payloads + typed metadata (EXT tier).

Pattern for image/audio/video at 100 TB: store the raw bytes as an
opaque `binary` column next to typed metadata, and run decode /
feature-extraction / frame-sampling as Arrow-batched Pandas functions
(`mapInPandas`) so bytes never round-trip through Python row by row.

The container has no image libraries, so the image payload is an
UNCOMPRESSED format a pure-numpy decoder can genuinely parse: each doc
gets a binary-exact P6 PPM (ASCII header `P6\n<w> <h>\n255\n` + w*h*3
raw RGB bytes, pixels derived from repeated md5(text) so both engines
can reconstruct them). `decode_ppm` is a REAL parser — magic check,
header tokenization, frombuffer + reshape — and the resize operator
does a real nearest-neighbor resample on the decoded array; oracles
recompute header arithmetic and pixel sums independently in SQL.

The frame/byte-accounting queries keep the simpler opaque payload
(4-byte PNG magic + utf-8 text bytes): their semantics are byte
arithmetic, not pixel decode.
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


# ---- real PPM image tier --------------------------------------------------
#
# Per-doc image dimensions (small on purpose: the oracle recomputes
# per-pixel sums with SQL list comprehensions).
PPM_W = "doc_id % 13 + 4"  # 4..16
PPM_H = "doc_id % 9 + 3"  # 3..11

# Pixel bytes = md5(text) hex, repeated to cover w*h*3 bytes, truncated.
# /32.0 divides by a power of two, so the double is exact and ceil agrees
# bit-for-bit across engines.
_PPM_HEX = "substring(repeat(md5(encode(text, 'UTF-8')), cast(ceil(({w}) * ({h}) * 6 / 32.0) as int)), 1, ({w}) * ({h}) * 6)"


def with_ppm_blob(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, blob): a binary-exact P6 PPM image —
    ASCII header `P6\\n<w> <h>\\n255\\n` followed by w*h*3 raw RGB bytes.
    Built entirely in JVM expressions; `decode_ppm` parses it back."""
    hexpx = _PPM_HEX.format(w=PPM_W, h=PPM_H)
    return docs.withColumn(
        "blob",
        F.expr(
            "concat("
            f"encode(concat('P6\\n', cast({PPM_W} as string), ' ', "
            f"cast({PPM_H} as string), '\\n255\\n'), 'UTF-8'), "
            f"unhex({hexpx}))"
        ),
    )


DUCK_PPM_DIMS = (
    f"SELECT doc_id, {PPM_W} AS w, {PPM_H} AS h, text FROM documents"
)

# DuckDB list of pixel byte values (1-based list, length w*h*3).
DUCK_PPM_PX = (
    "[ CAST('0x' || substr(ph, i * 2 + 1, 2) AS INT) FOR i IN range(w * h * 3) ]"
)
DUCK_PPM_PH = (
    "substr(repeat(md5(text), CAST(ceil(w * h * 6 / 32.0) AS INT)), 1, w * h * 6)"
)


def decode_ppm(data: bytes):
    """REAL image decode: parse a binary P6 PPM into an (h, w, 3) uint8
    numpy array. Magic check, ASCII header tokenization, frombuffer +
    reshape — no image library required because the format is
    uncompressed; this is the honest pure-numpy decoder the 100-TB
    pipeline would swap for a turbojpeg/pillow call on real data."""
    import numpy as np

    if data[:2] != b"P6":
        raise ValueError(f"not a P6 PPM (magic {data[:2]!r})")
    # Exactly three header newlines precede the payload; pixel bytes may
    # themselves contain 0x0A, so bound the split.
    magic, dims, maxval, payload = data.split(b"\n", 3)
    w, h = map(int, dims.split())
    if int(maxval) != 255:
        raise ValueError(f"unsupported maxval {maxval!r}")
    px = np.frombuffer(payload, dtype=np.uint8)
    if px.size != w * h * 3:
        raise ValueError(f"payload {px.size} bytes != {w}x{h}x3")
    return px.reshape(h, w, 3)


def extract_image_meta(blobs: DataFrame) -> DataFrame:
    """(doc_id, blob) -> (doc_id, byte_len, magic, width, height, px_sum)
    via Arrow-batched mapInPandas with a GENUINE decode: dimensions come
    from the parsed PPM header (not from the byte length) and px_sum
    sums the decoded pixel array, proving the payload was read."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "byte_len": [],
                "magic": [],
                "width": [],
                "height": [],
                "px_sum": [],
            }
            for doc_id, data in zip(pdf["doc_id"], pdf["blob"]):
                data = bytes(data)
                arr = decode_ppm(data)
                out["doc_id"].append(doc_id)
                out["byte_len"].append(len(data))
                out["magic"].append(data[:2].decode("ascii"))
                out["width"].append(arr.shape[1])
                out["height"].append(arr.shape[0])
                out["px_sum"].append(int(arr.sum()))
            yield pd.DataFrame(out)

    return blobs.mapInPandas(
        op,
        schema="doc_id long, byte_len long, magic string, width long, "
        "height long, px_sum long",
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
    """(doc_id, blob) -> (doc_id, width, height, new_w, new_h, out_bytes,
    out_px_sum): scale-to-fit into RESIZE_BOX with a REAL nearest-
    neighbor resample on the decoded pixel array. Source row/col for out
    pixel (y, x) is (y*h // nh, x*w // nw) — pure integer math, so the
    SQL oracle reproduces the resampled pixel sum exactly."""
    import numpy as np

    bw, bh = RESIZE_BOX

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_cols = (
            "doc_id", "width", "height", "new_w", "new_h", "out_bytes",
            "out_px_sum",
        )
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in out_cols}
            for doc_id, data in zip(pdf["doc_id"], pdf["blob"]):
                arr = decode_ppm(bytes(data))
                h, w = arr.shape[:2]
                scale = min(bw / w, bh / h)
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                src_y = (np.arange(nh) * h) // nh
                src_x = (np.arange(nw) * w) // nw
                resized = arr[src_y][:, src_x]  # (nh, nw, 3) gather
                vals = (doc_id, w, h, nw, nh, nw * nh * 3, int(resized.sum()))
                for c, v in zip(out_cols, vals):
                    out[c].append(v)
            yield pd.DataFrame(out)

    return blobs.mapInPandas(
        op,
        schema="doc_id long, width long, height long, new_w long, "
        "new_h long, out_bytes long, out_px_sum long",
    )


PATCH_GRID = 2  # 2x2 patch grid over the decoded image
N_FEATS = PATCH_GRID * PATCH_GRID * 3 + 2  # per-patch-per-channel sums + (w, h)
EMBED_SCALE = 1024.0  # 2^10: dyadic, so the projection stays bit-exact


def projection_matrix():
    """The PINNED fixed projection standing in for a learned encoder's
    final linear layer: EMBED_DIM x N_FEATS integer matrix, entries
    ((k*31 + f*17) mod 13) - 6 in [-6, 6]. Deterministic formula rather
    than a weights file so the DuckDB oracle regenerates the identical
    matrix; swapping in trained weights changes ONLY this function —
    the decode -> patch-stats -> projection plumbing is the production
    shape."""
    import numpy as np

    return np.array(
        [
            [(k * 31 + f * 17) % 13 - 6 for f in range(N_FEATS)]
            for k in range(EMBED_DIM)
        ],
        dtype=np.int64,
    )


def embed_blobs(blobs: DataFrame) -> DataFrame:
    """(doc_id, blob) -> (doc_id, emb array<double>[EMBED_DIM]): the
    REAL embedding shape — decode the P6 PPM payload, extract patch
    statistics from the pixel array (per-channel integer sums over a
    {PATCH_GRID}x{PATCH_GRID} grid, plus width/height), then apply the
    pinned fixed projection (`projection_matrix`, the stand-in for a
    learned encoder — the one declared model seam left). All math is
    integer until the final dyadic divide by 2^10, so the vectors are
    exact doubles both engines reproduce bit-for-bit. Output schema
    feeds the ANN operators unchanged."""
    import numpy as np

    P = projection_matrix()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            embs: list = []
            for doc_id, data in zip(pdf["doc_id"], pdf["blob"]):
                arr = decode_ppm(bytes(data)).astype(np.int64)
                h, w = arr.shape[:2]
                feats = []
                for pi in range(PATCH_GRID):
                    y0, y1 = pi * h // PATCH_GRID, (pi + 1) * h // PATCH_GRID
                    for pj in range(PATCH_GRID):
                        x0 = pj * w // PATCH_GRID
                        x1 = (pj + 1) * w // PATCH_GRID
                        patch = arr[y0:y1, x0:x1]
                        feats.extend(
                            int(patch[:, :, c].sum()) for c in range(3)
                        )
                feats.extend([w, h])
                v = P @ np.array(feats, dtype=np.int64)
                ids.append(doc_id)
                embs.append([x / EMBED_SCALE for x in v.tolist()])
            yield pd.DataFrame({"doc_id": ids, "emb": embs})

    return blobs.mapInPandas(op, schema="doc_id long, emb array<double>")


def _duck_patch_sum(pi: int, pj: int, c: int) -> str:
    """DuckDB expr: integer pixel sum of channel `c` over patch (pi, pj)
    of the PATCH_GRID grid — identical floor-division bounds to the
    numpy slicing in `embed_blobs`. coalesce: an EMPTY patch (dimension
    smaller than the grid) sums to NULL in SQL but 0 in numpy."""
    g = PATCH_GRID
    y0, y1 = f"({pi} * h // {g})", f"(({pi} + 1) * h // {g})"
    x0, x1 = f"({pj} * w // {g})", f"(({pj} + 1) * w // {g})"
    nx = f"({x1} - {x0})"
    return (
        f"coalesce(list_sum([ px[(({y0} + i // {nx}) * w + {x0} + (i % {nx})) * 3 "
        f"+ {c} + 1] FOR i IN range(({y1} - {y0}) * {nx}) ]), 0)"
    )


def _duck_embed_exprs() -> tuple[str, str]:
    """DuckDB SQL: (emb-string expr over a `feats` list column, the
    feats-list expr over px/w/h columns). The projection matrix is
    REGENERATED from the same pinned formula — matrix drift between
    engines is impossible."""
    P = projection_matrix()
    feats_list = (
        "[ "
        + ", ".join(
            _duck_patch_sum(pi, pj, c)
            for pi in range(PATCH_GRID)
            for pj in range(PATCH_GRID)
            for c in range(3)
        )
        + ", w, h ]"
    )
    terms = []
    for k in range(EMBED_DIM):
        dot = " + ".join(
            f"({int(P[k][f])}) * feats[{f + 1}]" for f in range(N_FEATS)
        )
        terms.append(
            f"CAST(CAST(CAST({dot} AS DOUBLE) / {int(EMBED_SCALE)} "
            f"AS DECIMAL(24,10)) AS VARCHAR)"
        )
    emb_string = "array_to_string([ " + ", ".join(terms) + " ], ',')"
    return emb_string, feats_list


# ---- registered queries ---------------------------------------------------


@register(
    "multimodal_resize",
    oracle=f"""
        WITH dims AS ({DUCK_PPM_DIMS}),
        px AS (
            SELECT doc_id, w, h, {DUCK_PPM_PX} AS px
            FROM (SELECT doc_id, w, h, {DUCK_PPM_PH} AS ph FROM dims)),
        sz AS (
            SELECT doc_id, w, h, px,
                   greatest(1, CAST(trunc(w * scale) AS BIGINT)) AS nw,
                   greatest(1, CAST(trunc(h * scale) AS BIGINT)) AS nh
            FROM (SELECT *, least({RESIZE_BOX[0]}.0 / w, {RESIZE_BOX[1]}.0 / h) AS scale
                  FROM px))
        SELECT doc_id,
               CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
               CAST(nw AS BIGINT) AS new_w, CAST(nh AS BIGINT) AS new_h,
               CAST(nw * nh * 3 AS BIGINT) AS out_bytes,
               CAST(list_sum(
                 [ px[((((i // (3 * nw)) * h) // nh) * w
                       + (((i // 3) % nw) * w) // nw) * 3 + (i % 3) + 1]
                   FOR i IN range(nh * nw * 3) ]) AS BIGINT) AS out_px_sum
        FROM sz
    """,
    tier="llm",
    doc=f"Scale-to-fit resize into a {RESIZE_BOX[0]}x{RESIZE_BOX[1]} box: "
    "REAL decode of the P6 PPM payload + nearest-neighbor resample on "
    "the pixel array inside Arrow-batched mapInPandas. The oracle "
    "recomputes the resampled pixel sum with integer index math in SQL, "
    "so the gather itself — not just the dimensions — is verified.",
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return resize_images(with_ppm_blob(docs).select("doc_id", "blob"))


_EMB_STR, _FEATS_LIST = _duck_embed_exprs()


@register(
    "multimodal_embed",
    oracle=f"""
        WITH dims AS ({DUCK_PPM_DIMS}),
        px AS (
            SELECT doc_id, w, h, {DUCK_PPM_PX} AS px
            FROM (SELECT doc_id, w, h, {DUCK_PPM_PH} AS ph FROM dims
                  WHERE doc_id < 200)),
        feats AS (SELECT doc_id, {_FEATS_LIST} AS feats FROM px)
        SELECT doc_id, {_EMB_STR} AS emb FROM feats
    """,
    tier="llm",
    doc="Image embedding with the production shape end-to-end: decode "
    "the P6 PPM payload (real pure-numpy parser), extract patch "
    f"statistics from the DECODED PIXELS (per-channel sums over a "
    f"{PATCH_GRID}x{PATCH_GRID} grid + width/height = {N_FEATS} "
    "features), then a PINNED fixed integer projection "
    f"(projection_matrix) down to {EMBED_DIM} dims — the declared "
    "stand-in for a learned encoder's linear head; swap in trained "
    "weights and nothing else changes. Integer math until one dyadic "
    "divide by 2^10, so vectors are exact doubles; serialized as "
    "fixed-scale DECIMAL(24,10) strings (scalar output for the "
    "driver canonicalizer). The oracle re-decodes the pixels, "
    "re-derives the patch sums with the same floor-division bounds, "
    "and regenerates the matrix from the same formula in SQL.",
)
def q_multimodal_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 200)
    )
    emb = embed_blobs(with_ppm_blob(docs).select("doc_id", "blob"))
    return emb.select(
        "doc_id",
        F.concat_ws(
            ",", F.transform("emb", lambda x: x.cast("decimal(24,10)").cast("string"))
        ).alias("emb"),
    )


@register(
    "multimodal_image_meta",
    oracle=f"""
        WITH dims AS ({DUCK_PPM_DIMS})
        SELECT doc_id,
               CAST(length('P6' || chr(10) || w || ' ' || h || chr(10)
                           || '255' || chr(10)) + w * h * 3 AS BIGINT) AS byte_len,
               'P6' AS magic,
               CAST(w AS BIGINT) AS width,
               CAST(h AS BIGINT) AS height,
               CAST(list_sum({DUCK_PPM_PX}) AS BIGINT) AS px_sum
        FROM (SELECT doc_id, w, h, {DUCK_PPM_PH} AS ph FROM dims)
    """,
    tier="llm",
    doc="Binary-column metadata extraction through Arrow-batched "
    "mapInPandas with a GENUINE pure-numpy P6 PPM decode: width/height "
    "come from the parsed header and px_sum from the decoded pixel "
    "array; the oracle rebuilds both from the payload formula in SQL.",
)
def q_multimodal_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return extract_image_meta(with_ppm_blob(docs).select("doc_id", "blob"))


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


# ---------------------------------------------------------------------------
# Perceptual image dedup: decoded pixels -> dHash -> pigeonhole pairs
# ---------------------------------------------------------------------------
#
# The image-dedup step every multimodal training pipeline runs, composed
# from this module's REAL decoder (decode_ppm) and dedup.py's pigeonhole
# blocking (dedup_simhash_pairs): each document's fixed-dimension PPM is
# decoded to pixels, grayscale-downsampled to a PH_ROWS x PH_COLS sample
# grid (nearest-neighbor, integer index arithmetic), and fingerprinted
# with a dHash — one bit per horizontal gradient sign, PH_ROWS*(PH_COLS-1)
# = 56 bits. Near-duplicate images differ in few gradient signs, so
# candidate pairs come from PH_BANDS 14-bit band buckets (pigeonhole: a
# pair within PH_HAMMING_MAX=3 flips agrees on >= 1 band -> recall 1.0,
# same argument as simhash), then only candidates pay the exact Hamming
# verify. Never all-pairs: the join key is (band_idx, band_val) equality.
#
# Fixture images use FIXED dims (PH_W x PH_H) with the payload derived
# from the normalized text (single-byte [a-z0-9 ] chars, so byte i ==
# char i on both engines): near-duplicate TEXTS produce near-duplicate
# IMAGES, giving the operator true near-dup structure to find. On real
# data the decode step swaps for turbojpeg/pillow inside the same
# mapInPandas; everything downstream is unchanged.

PH_W, PH_H = 16, 12  # fixed perceptual-image dims
PH_LEN = PH_W * PH_H * 3  # 576 payload bytes
PH_ROWS, PH_COLS = 7, 9  # dHash sample grid -> 7 * 8 = 56 bits
PH_BITS = PH_ROWS * (PH_COLS - 1)
PH_BAND_BITS = 14
PH_BANDS = PH_BITS // PH_BAND_BITS  # 4 x 14-bit pigeonhole bands
PH_HAMMING_MAX = 3  # <= 3 gradient flips = near-duplicate

_PH_NORM_SPARK = (
    f"rpad(regexp_replace(lower(text), '[^a-z0-9 ]', ''), {PH_LEN}, ' ')"
)
_PH_NORM_DUCK = (
    f"rpad(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), {PH_LEN}, ' ')"
)


def with_phash_blob(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, blob): a fixed-dim P6 PPM whose pixel
    bytes are the normalized text (truncated/space-padded to PH_LEN)."""
    return docs.select(
        "doc_id",
        F.expr(
            f"concat(encode('P6\\n{PH_W} {PH_H}\\n255\\n', 'UTF-8'), "
            f"encode({_PH_NORM_SPARK}, 'UTF-8'))"
        ).alias("blob"),
    )


def phash_fingerprints(blobs: DataFrame) -> DataFrame:
    """(doc_id, blob) -> (doc_id, ph bigint): decode -> grayscale ->
    nearest-neighbor sample grid -> 56-bit dHash. Arrow-batched
    mapInPandas like multimodal_embed; all-integer arithmetic, so the
    DuckDB oracle's unrolled expression is bit-identical.

    The phash blobs are FIXED-dim P6 PPMs (with_phash_blob pads every
    doc to PH_W x PH_H), so a whole Arrow batch decodes as ONE numpy
    reshape and the dHash comparisons vectorize across all documents at
    once — no per-document Python loop (r15; guide §4.2 "hand whole
    batches to vectorized native libraries"). The per-row decode_ppm
    path remains as the fallback for variable-dim input, and the batch
    path still VERIFIES every header byte (same magic/dims/maxval check
    the parser does, just vectorized)."""
    import numpy as np

    rr = [(i * PH_H) // PH_ROWS for i in range(PH_ROWS)]
    cc = [(j * PH_W) // PH_COLS for j in range(PH_COLS)]
    header = f"P6\n{PH_W} {PH_H}\n255\n".encode()
    blob_len = len(header) + PH_LEN
    # bit weight of each (row, gradient) position: ph |= 1 << (i*8 + j)
    shifts = (
        np.arange(PH_ROWS, dtype=np.int64)[:, None] * 8
        + np.arange(PH_COLS - 1, dtype=np.int64)[None, :]
    )
    weights = np.int64(1) << shifts  # (PH_ROWS, PH_COLS-1), bits 0..54

    def _ph_rowwise(doc_ids, datas) -> pd.DataFrame:
        ids, phs = [], []
        for doc_id, data in zip(doc_ids, datas):
            arr = decode_ppm(bytes(data))
            gray = arr.astype(np.int64).sum(axis=2)  # (h, w)
            grid = gray[np.ix_(rr, cc)]  # (PH_ROWS, PH_COLS)
            ph = 0
            for i in range(PH_ROWS):
                for j in range(PH_COLS - 1):
                    if grid[i, j + 1] > grid[i, j]:
                        ph |= 1 << (i * 8 + j)
            ids.append(doc_id)
            phs.append(ph)
        return pd.DataFrame({"doc_id": ids, "ph": phs})

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            raw = b"".join(bytes(d) for d in pdf["blob"])
            if len(raw) != n * blob_len:
                yield _ph_rowwise(pdf["doc_id"], pdf["blob"])
                continue
            arr = np.frombuffer(raw, dtype=np.uint8).reshape(n, blob_len)
            hdr = np.frombuffer(header, dtype=np.uint8)
            if not (arr[:, : len(header)] == hdr).all():
                yield _ph_rowwise(pdf["doc_id"], pdf["blob"])
                continue
            px = arr[:, len(header):].reshape(n, PH_H, PH_W, 3)
            gray = px.astype(np.int64).sum(axis=3)  # (n, h, w)
            grid = gray[:, rr][:, :, cc]  # (n, PH_ROWS, PH_COLS)
            # same comparisons, same bit weights, summed over disjoint
            # powers of two == the old per-bit OR, exactly
            bits = grid[:, :, 1:] > grid[:, :, :-1]
            ph = (bits * weights).sum(axis=(1, 2))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].to_numpy(), "ph": ph}
            )

    return blobs.mapInPandas(op, schema="doc_id long, ph long")


def _duck_phash_expr(norm: str) -> str:
    """The dHash unrolled as one SQL expression over the normalized
    text (byte i == char i: single-byte alphabet by construction)."""

    def gray(r: int, c: int) -> str:
        base = 3 * (r * PH_W + c)
        return (
            "("
            + " + ".join(
                f"ascii(substr({norm}, {base + k + 1}, 1))" for k in range(3)
            )
            + ")"
        )

    terms = []
    for i in range(PH_ROWS):
        rr = (i * PH_H) // PH_ROWS
        for j in range(PH_COLS - 1):
            c0 = (j * PH_W) // PH_COLS
            c1 = ((j + 1) * PH_W) // PH_COLS
            terms.append(
                f"(CASE WHEN {gray(rr, c1)} > {gray(rr, c0)} "
                f"THEN {1 << (i * 8 + j)} ELSE 0 END)"
            )
    return "(" + " + ".join(terms) + ")"


@register(
    "multimodal_phash",
    oracle=f"""
        SELECT doc_id, CAST({_duck_phash_expr(_PH_NORM_DUCK)} AS BIGINT) AS ph
        FROM documents
    """,
    tier="llm",
    export=False,
    doc="Fingerprint parity pin for the perceptual dedup: the decoded-"
    "pixel dHash per document vs the oracle's unrolled integer "
    "expression — bit-identical, so the pairs query's blocking and "
    "Hamming verify rest on verified hashes.",
)
def q_multimodal_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return phash_fingerprints(with_phash_blob(docs))


@register(
    "multimodal_dedup_pairs",
    oracle=f"""
        WITH p AS (
            SELECT doc_id, CAST({_duck_phash_expr(_PH_NORM_DUCK)} AS BIGINT) AS ph
            FROM documents)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming
        FROM p a JOIN p b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.ph, b.ph)) <= {PH_HAMMING_MAX}
    """,
    tier="llm",
    doc=f"Perceptual image dedup: decode pixels (decode_ppm via "
    "mapInPandas), dHash the grayscale sample grid, then Hamming-"
    f"blocked pairs — {PH_BANDS} x {PH_BAND_BITS}-bit pigeonhole bands "
    f"as the candidate join key (recall 1.0 at Hamming <= "
    f"{PH_HAMMING_MAX} by the simhash argument), exact bit_count "
    "verify on candidates only. The oracle recomputes hash + Hamming "
    "symbolically and compares ALL pairs — the blocked plan must "
    "reproduce the quadratic ground truth exactly. Never all-pairs on "
    "the Spark side: plan-asserted no CartesianProduct in "
    "tests/test_multimodal_dedup.py.",
)
def q_multimodal_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..checkpoints import rotating_local_checkpoint

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # The fingerprint frame feeds both self-join sides; rotated (r15)
    # so repeat calls release older materialized generations.
    fps = rotating_local_checkpoint(
        phash_fingerprints(with_phash_blob(docs)),
        "multimodal.dedup_pairs.fps",
    )
    band_vals = F.array(
        *[
            F.expr(
                f"shiftright(ph, {b * PH_BAND_BITS}) & {(1 << PH_BAND_BITS) - 1}"
            )
            for b in range(PH_BANDS)
        ]
    )
    bands = fps.select(
        "doc_id", "ph", F.posexplode(band_vals).alias("band_idx", "band_val")
    )
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(F.col("a.ph").bitwiseXOR(F.col("b.ph"))).cast("long")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= PH_HAMMING_MAX)
        .distinct()
    )
