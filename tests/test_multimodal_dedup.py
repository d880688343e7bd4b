"""Perceptual image dedup: decoded pixels -> dHash -> pigeonhole pairs.

The multimodal x dedup composition (VERDICT r7 task 5): fingerprints
come from REAL pixel decode (multimodal.decode_ppm) via mapInPandas,
candidate pairs from 14-bit pigeonhole bands (dedup_simhash_pairs'
machinery), exact Hamming verify on candidates only. Pinned here:
oracle parity of the hashes, perfect blocking recall vs brute force
(the pigeonhole guarantee at Hamming <= 3), plan shape (no cartesian,
Python only in the fingerprint stage), and constructed near/far cases.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_indexing_spark.operators.multimodal import (
    PH_HAMMING_MAX,
    PH_LEN,
    phash_fingerprints,
    q_multimodal_dedup_pairs,
    with_phash_blob,
)
from tests.conftest import SF_DIR, assert_df_matches_oracle, duck_connect


def test_fingerprints_match_oracle(spark):
    from map_reduce_indexing_spark.plans import registry

    q = registry.get("multimodal_phash")
    con = duck_connect(SF_DIR)
    try:
        assert_df_matches_oracle(q.fn(spark, SF_DIR), con, q.oracle)
    finally:
        con.close()


def test_blocked_pairs_equal_brute_force(spark):
    """The pigeonhole blocking must reproduce the quadratic ground
    truth exactly (recall 1.0 at Hamming <= PH_HAMMING_MAX)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    fps = {
        r["doc_id"]: r["ph"]
        for r in phash_fingerprints(with_phash_blob(docs)).collect()
    }
    ids = sorted(fps)
    brute = {
        (a, b, bin(fps[a] ^ fps[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fps[a] ^ fps[b]).count("1") <= PH_HAMMING_MAX
    }
    blocked = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in q_multimodal_dedup_pairs(spark, SF_DIR).collect()
    }
    assert blocked == brute
    assert len(brute) > 0  # the fixture contains duplicate images


def test_plan_is_blocked_not_quadratic(spark):
    plan = (
        q_multimodal_dedup_pairs(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_constructed_near_and_far_cases(spark):
    """A doc pair differing by one word -> few gradient flips -> a
    near-dup pair; an unrelated doc pairs with neither."""
    base = "the quick brown fox jumps over the lazy dog " * 20
    near = base.replace("lazy", "hazy", 1)
    far = "completely different content with other words entirely " * 20
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    fps = {
        r["doc_id"]: r["ph"]
        for r in phash_fingerprints(with_phash_blob(docs)).collect()
    }
    assert bin(fps[1] ^ fps[2]).count("1") <= PH_HAMMING_MAX
    assert bin(fps[1] ^ fps[3]).count("1") > PH_HAMMING_MAX


def test_vectorized_phash_bitequal_to_rowwise(spark):
    """r15: the batch-decoded dHash must equal a per-document reference
    replay of the original loop (decode -> gray -> grid -> per-bit
    compare) on the real corpus, bit for bit."""
    import numpy as np

    from map_reduce_indexing_spark.operators.multimodal import (
        PH_COLS,
        PH_H,
        PH_ROWS,
        PH_W,
        decode_ppm,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    blobs = with_phash_blob(docs)
    got = {
        r["doc_id"]: r["ph"]
        for r in phash_fingerprints(blobs).collect()
    }
    rr = [(i * PH_H) // PH_ROWS for i in range(PH_ROWS)]
    cc = [(j * PH_W) // PH_COLS for j in range(PH_COLS)]
    n_checked = 0
    for row in blobs.collect():
        arr = decode_ppm(bytes(row["blob"]))
        gray = arr.astype(np.int64).sum(axis=2)
        grid = gray[np.ix_(rr, cc)]
        ph = 0
        for i in range(PH_ROWS):
            for j in range(PH_COLS - 1):
                if grid[i, j + 1] > grid[i, j]:
                    ph |= 1 << (i * 8 + j)
        assert got[row["doc_id"]] == ph, row["doc_id"]
        n_checked += 1
    assert n_checked == len(got) > 0


def test_variable_dim_blobs_take_the_rowwise_fallback(spark):
    """Blobs that are not the fixed phash shape (different dims, so a
    different header) must still hash correctly through the per-row
    decode path the batch op falls back to."""
    import numpy as np

    from map_reduce_indexing_spark.operators.multimodal import (
        PH_COLS,
        PH_ROWS,
        decode_ppm,
    )

    from map_reduce_indexing_spark.operators.multimodal import PH_H, PH_W

    # a 20x14 PPM — parses fine, but fails the fixed-dim header check
    w, h = 20, 14
    payload = bytes((i * 37) % 256 for i in range(w * h * 3))
    blob = f"P6\n{w} {h}\n255\n".encode() + payload
    df = spark.createDataFrame([(7, bytearray(blob))], "doc_id long, blob binary")
    got = phash_fingerprints(df).collect()[0]["ph"]
    # the fallback replays the original loop, whose sample grid is
    # anchored to the FIXED phash dims (a sub-grid of a larger image)
    rr = [(i * PH_H) // PH_ROWS for i in range(PH_ROWS)]
    cc = [(j * PH_W) // PH_COLS for j in range(PH_COLS)]
    gray = decode_ppm(blob).astype(np.int64).sum(axis=2)
    grid = gray[np.ix_(rr, cc)]
    want = 0
    for i in range(PH_ROWS):
        for j in range(PH_COLS - 1):
            if grid[i, j + 1] > grid[i, j]:
                want |= 1 << (i * 8 + j)
    assert got == want


def test_blob_is_a_real_fixed_dim_ppm(spark):
    from map_reduce_indexing_spark.operators.multimodal import decode_ppm

    docs = spark.createDataFrame(
        [(1, "some document text")], "doc_id long, text string"
    )
    blob = bytes(with_phash_blob(docs).collect()[0]["blob"])
    arr = decode_ppm(blob)
    assert arr.shape == (12, 16, 3)
    assert arr.size == PH_LEN
    # payload bytes are the normalized text, space-padded
    assert bytes(arr.reshape(-1)[:18]).decode() == "some document text"
    assert set(bytes(arr.reshape(-1)[18:])) == {ord(" ")}
