"""PQ compression inside the maintained VectorStore.

The IVF-PQ serving tier existed as registered queries
(ann_pq_codes / ann_ivf_pq_topk); these tests pin its integration into
the build/append/compact/topk lifecycle of api.VectorStore
(similarity.py build_vector_store pq=True): the codebook persists as a
`_codebook.json` sidecar next to `_quantizer.json`, the 4-bit codes
are store columns, appends (batch AND checkpointed streaming) re-encode
against the persisted codebook, compaction carries codebook + codes
through the staged swap, and `topk(..., serving="pq")` runs the ADC
shortlist + exact re-rank against the store's own codes.

Reference parity: the reference has no vector tier; this is the
extension-tier storage story (at 100 TB the raw float64 vectors are
the storage bottleneck; a lookup's cold scan should touch 8-byte
codes, not 512-byte float rows).
"""

from __future__ import annotations

import os

import pytest

from map_reduce_indexing_spark.api import VectorStore
from map_reduce_indexing_spark.operators.similarity import (
    PQ_CODEBOOKS,
    QUERY_VEC_ID,
    embeddings_double,
    load_codebook,
    pq_store,
    vector_store_topk,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def pq_vs(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pqstore") / "store")
    e = embeddings_double(spark, SF_DIR).select("vec_id", "v")
    vs = VectorStore.build(spark, e, path, layout="ivf", pq=True)
    return vs


def _probe(spark):
    r = (
        embeddings_double(spark, SF_DIR)
        .filter(f"vec_id = {QUERY_VEC_ID}")
        .collect()[0]
    )
    return [float(x) for x in r["v"]]


def test_codebook_sidecar_and_codes(spark, pq_vs):
    assert load_codebook(pq_vs.path) == PQ_CODEBOOKS
    got = {
        r["vec_id"]: list(r["code"]) for r in pq_vs.vectors().collect()
    }
    # the stored codes are bit-identical to the session pq artifact's
    # (both encode with the same literal expressions)
    want = {
        r["vec_id"]: list(r["code"])
        for r in pq_store(spark, SF_DIR).collect()
    }
    assert got == want


def test_pq_serving_prunes_and_reranks(spark, pq_vs):
    qv = _probe(spark)
    df = vector_store_topk(
        spark, pq_vs.path, qv, k=10, exclude_vec_id=QUERY_VEC_ID, serving="pq"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan  # probed cell only, not the store
    rows = df.collect()
    assert 0 < len(rows) <= 10
    assert rows == sorted(rows, key=lambda r: (-r["cosine"], r["vec_id"]))


def test_pq_recall_vs_exact_serving(spark, pq_vs):
    """Recall@10 of pq serving vs the store's own exact serving — the
    same bar as ann_pq_recall_eval (>= 0.5). Both paths probe the same
    cell, so this isolates ADC + re-rank loss."""
    qv = _probe(spark)
    exact = {
        r["vec_id"]
        for r in vector_store_topk(
            spark, pq_vs.path, qv, k=10, exclude_vec_id=QUERY_VEC_ID
        ).collect()
    }
    pq = {
        r["vec_id"]
        for r in vector_store_topk(
            spark,
            pq_vs.path,
            qv,
            k=10,
            exclude_vec_id=QUERY_VEC_ID,
            serving="pq",
        ).collect()
    }
    assert len(exact & pq) / len(exact) >= 0.5


def test_append_reencodes_then_compact_carries_codebook(spark, tmp_path):
    e = embeddings_double(spark, SF_DIR).select("vec_id", "v")
    path = str(tmp_path / "store")
    vs = VectorStore.build(spark, e, path, layout="ivf", pq=True)
    qv = _probe(spark)
    new_id = 10**6
    vs.append(
        spark.createDataFrame([(new_id, qv)], "vec_id long, v array<double>")
    )
    # the appended row was re-encoded: it has a non-null code identical
    # to the original vec_id-0 row's (same vector, same codebook)
    codes = {
        r["vec_id"]: list(r["code"])
        for r in vs.vectors()
        .filter(f"vec_id IN ({QUERY_VEC_ID}, {new_id})")
        .collect()
    }
    assert codes[new_id] == codes[QUERY_VEC_ID]
    assert all(c is not None for c in codes[new_id])
    # pq serving sees the appended vector (cosine 1.0 duplicate)
    got = [
        r["vec_id"]
        for r in vs.topk(qv, k=3, serving="pq").collect()
    ]
    assert got[:2] == [QUERY_VEC_ID, new_id]
    before = {
        (r["vec_id"], r["cosine"])
        for r in vs.topk(qv, k=10, serving="pq").collect()
    }
    vs.compact()
    assert load_codebook(path) == PQ_CODEBOOKS  # sidecar rode the swap
    after = {
        (r["vec_id"], r["cosine"])
        for r in vs.topk(qv, k=10, serving="pq").collect()
    }
    assert after == before
    # one file per occupied cell after compaction
    for d in os.listdir(path):
        if d.startswith("cell="):
            files = [
                f
                for f in os.listdir(os.path.join(path, d))
                if f.endswith(".parquet")
            ]
            assert len(files) == 1, (d, files)


def test_streaming_ingest_encodes_against_store_codebook(spark, tmp_path):
    from map_reduce_indexing_spark.streaming.events import (
        incremental_vector_append,
    )

    from pyspark.sql import functions as F

    from map_reduce_indexing_spark.sources.tables import load_table

    e = embeddings_double(spark, SF_DIR).select("vec_id", "v")
    path = str(tmp_path / "store")
    VectorStore.build(
        spark, e.filter("vec_id < 100"), path, layout="ivf", pq=True
    )
    # Streaming ingest into an EXISTING (flat) store runs in raw-append
    # mode (the checkpointed batch layout can't mix with it) — that
    # path delegates to append_vectors, which re-encodes against the
    # store's codebook sidecar.
    staging = str(tmp_path / "staging")
    load_table(spark, SF_DIR, "embeddings").filter(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 160)
    ).write.parquet(staging)
    incremental_vector_append(spark, staging, path, glob="*.parquet")
    vs = VectorStore(spark, path)
    ingested = vs.vectors().filter("vec_id >= 100")
    assert ingested.count() == 60
    assert ingested.filter("code IS NULL").count() == 0
    # codes identical to a fresh encode of the same vectors
    want = {
        r["vec_id"]: list(r["code"])
        for r in pq_store(spark, SF_DIR).filter("vec_id >= 100 AND vec_id < 160").collect()
    }
    got = {r["vec_id"]: list(r["code"]) for r in ingested.collect()}
    assert got == want
    qv = _probe(spark)
    rows = vs.topk(qv, k=2, serving="pq").collect()
    assert rows[0]["cosine"] == pytest.approx(1.0)


def test_trained_codebooks_through_the_store_lifecycle(spark, tmp_path):
    """train_pq_codebooks -> build(pq=True, codebooks=...) -> the
    trained books persist in the sidecar and every later append/topk
    encodes against THEM (not the pinned defaults); recall vs the
    store's own exact serving holds the same bar."""
    from map_reduce_indexing_spark.operators.similarity import (
        train_pq_codebooks,
    )

    books = train_pq_codebooks(spark, SF_DIR)
    assert books != PQ_CODEBOOKS  # Lloyd actually moved the centroids
    assert all(
        round(x, 9) == x for b in books for c in b for x in c
    )  # 9dp contract
    e = embeddings_double(spark, SF_DIR).select("vec_id", "v")
    path = str(tmp_path / "store")
    vs = VectorStore.build(
        spark, e, path, layout="ivf", pq=True, codebooks=books
    )
    assert load_codebook(path) == books
    qv = _probe(spark)
    new_id = 10**6
    vs.append(
        spark.createDataFrame([(new_id, qv)], "vec_id long, v array<double>")
    )
    codes = {
        r["vec_id"]: list(r["code"])
        for r in vs.vectors()
        .filter(f"vec_id IN ({QUERY_VEC_ID}, {new_id})")
        .collect()
    }
    # appended row re-encoded with the TRAINED books: identical to the
    # build-time encoding of the same vector
    assert codes[new_id] == codes[QUERY_VEC_ID]
    exact = {
        r["vec_id"]
        for r in vs.topk(qv, k=10).collect()
    }
    pq = {
        r["vec_id"]
        for r in vs.topk(qv, k=10, serving="pq").collect()
    }
    assert len(exact & pq) / len(exact) >= 0.5
    vs.compact()
    assert load_codebook(path) == books  # trained sidecar rode the swap


def test_codebooks_param_is_validated(spark, tmp_path):
    e = embeddings_double(spark, SF_DIR).select("vec_id", "v").limit(10)
    with pytest.raises(ValueError, match="requires pq=True"):
        VectorStore.build(
            spark, e, str(tmp_path / "s1"), codebooks=PQ_CODEBOOKS
        )
    with pytest.raises(ValueError, match="codebooks must be"):
        VectorStore.build(
            spark, e, str(tmp_path / "s2"), pq=True, codebooks=[[[0.0]]]
        )


def test_retrain_recovers_pq_recall_after_drift(spark, tmp_path):
    """Round 9: compact(retrain=True) must re-train the CODEBOOKS, not
    just the quantizer. Build a compressed store from the fixture
    embeddings, then append a strongly drifted population (affine
    shift far outside the original range): the stale books collapse
    every drifted subvector onto the same few codes, so the ADC
    shortlist cannot discriminate among drifted candidates and pq
    recall for a drifted query craters. Retraining at compaction
    warm-starts the books on the store's CURRENT vectors, re-encodes
    every row, and recall recovers to the serving bar."""
    from map_reduce_indexing_spark.operators.similarity import (
        spark_pq_code,
    )
    from pyspark.sql import functions as F

    e = embeddings_double(spark, SF_DIR).select("vec_id", "v")
    path = str(tmp_path / "store")
    vs = VectorStore.build(spark, e, path, layout="ivf", pq=True)
    # dimension-rotate + 3x scale: per-coordinate distributions move
    # far outside the stale books' range while pairwise cosines inside
    # the drifted cohort stay diverse (a pure offset would collapse
    # every drifted vector onto one direction and make exact top-k a
    # tie-break lottery)
    drifted = e.select(
        (F.col("vec_id") + 10**6).alias("vec_id"),
        F.expr(
            "transform(sequence(0, size(v) - 1), "
            "d -> 3.0d * element_at(v, (d + 8) % size(v) + 1))"
        ).alias("v"),
    )
    vs.append(drifted)
    qrow = (
        vs.vectors().filter(f"vec_id = {10**6 + QUERY_VEC_ID}").collect()[0]
    )
    qv = [float(x) for x in qrow["v"]]

    def recall():
        exact = [
            r["vec_id"]
            for r in vector_store_topk(
                spark, path, qv, k=10,
                exclude_vec_id=10**6 + QUERY_VEC_ID,
            ).collect()
        ]
        pq = {
            r["vec_id"]
            for r in vector_store_topk(
                spark, path, qv, k=10,
                exclude_vec_id=10**6 + QUERY_VEC_ID,
                serving="pq",
            ).collect()
        }
        return len(set(exact) & pq) / len(exact)

    stale = recall()
    vs.compact(retrain=True)
    books = load_codebook(path)
    assert books != PQ_CODEBOOKS  # the sidecar actually retrained
    fresh = recall()
    assert fresh >= 0.5, (stale, fresh)
    assert fresh > stale, (stale, fresh)
    # every stored code agrees with a re-encode against the NEW books:
    # codes and sidecar swapped together, no stale-encoding rows
    mismatches = (
        vs.vectors()
        .withColumn(
            "want", F.expr(spark_pq_code("v", books)).cast("array<int>")
        )
        .filter("code IS DISTINCT FROM want")
        .count()
    )
    assert mismatches == 0
