"""Similarity search over embeddings (EXT tier, BASELINE.json north star).

Three tiers over the `embeddings` fixture (vec_id, embedding float[64]):

- brute-force cosine top-k: the exactness baseline; one pass, no index.
- LSH (random-hyperplane signs): the scale path — bucket on an 8-bit
  signature, search only the query's bucket. Hyperplanes are integer
  vectors from a fixed deterministic formula so Spark and DuckDB build
  identical buckets.
- IVF (coarse quantization): assign each vector to its nearest of 8
  fixed centroids, search only the query's cell.

Scale posture (100 TB): brute force is a full scan per query — fine for
batch scoring (it is embarrassingly parallel and shuffle-free), wrong
for interactive lookup. The LSH/IVF variants turn a lookup into a
partition-prunable equality predicate (`bucket = q_bucket`), the same
trick the reference uses with its 26 letter files (helper_reduce.c:238).
Persist bucketed/partitioned by `bucket` and a query touches one cell.

All dot products fold left-to-right in double on both engines, so
cosine values compare bit-exact against the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.registry import register
from ..sources.tables import load_table
from .dedup import (
    EMB_DIM,
    N_PLANES,
    SPARK_DOT,
    _duck_arr,
    _spark_arr,
    duck_cosine,
    duck_lsh_bucket,
    spark_cosine,
    spark_lsh_bucket,
)

# Single source of truth for the embedding dimension (shared with the
# LSH hyperplanes in dedup.py): mismatched lengths would make zip_with
# pad with nulls and silently collapse every bucket/cell to 0.
DIM = EMB_DIM
QUERY_VEC_ID = 0
N_CENTROIDS = 8  # IVF cells

# Deterministic integer centroids, inlined into both engines. (The LSH
# hyperplanes/bucket builders live in operators/dedup.py, shared with the
# embedding near-dup operator.)
CENTROIDS = [
    [((j * 37 + d * 11) % 9) - 4 for d in range(DIM)] for j in range(N_CENTROIDS)
]


def spark_ivf_cell(vec: str) -> str:
    """1-based index of the nearest centroid (first-min tie-break).

    d2(v, c) = |v|^2 - 2 v.c + |c|^2; |v|^2 is common -> argmin over
    (|c|^2 - 2 v.c), exact in double for integer centroids.
    """
    dists = ", ".join(
        f"({sum(x * x for x in c)}.0d - 2.0d * {SPARK_DOT.format(a=vec, b=_spark_arr(c))})"
        for c in CENTROIDS
    )
    return f"array_position(array({dists}), array_min(array({dists})))"


def duck_ivf_cell(vec: str) -> str:
    dists = ", ".join(
        f"({sum(x * x for x in c)}.0 - 2.0 * list_dot_product({vec}, {_duck_arr(c)}))"
        for c in CENTROIDS
    )
    return f"list_indexof([{dists}], list_min([{dists}]))"


def embeddings_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )


# ---------------------------------------------------------------------------
# Partitioned vector stores: the ANN serving layout
# ---------------------------------------------------------------------------


def lsh_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, v, bucket) served from a session-persisted store
    Hive-partitioned by the 8-bit hyperplane bucket. A `bucket = q`
    predicate prunes to ~1/256th of the files — the 'persist partitioned
    by bucket' posture the module docstring promises, materialized.
    Caching semantics: `operators.indexing.session_artifact_df`."""
    from .indexing import session_artifact_df

    def build(path: str) -> None:
        (
            embeddings_double(spark, sf_dir)
            .select("vec_id", "v")
            .withColumn("bucket", F.expr(spark_lsh_bucket("v")))
            .repartition("bucket")  # one compact file per bucket
            .write.partitionBy("bucket")
            .parquet(path)
        )

    return session_artifact_df(
        spark, sf_dir, "emb_store", "embeddings.parquet", build
    )


def ivf_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, v, cell) partitioned by the IVF coarse-quantization
    cell — one Hive partition per centroid, so probing n cells reads n
    partitions."""
    from .indexing import session_artifact_df

    def build(path: str) -> None:
        (
            embeddings_double(spark, sf_dir)
            .select("vec_id", "v")
            .withColumn("cell", F.expr(spark_ivf_cell("v")).cast("long"))
            .repartition("cell")  # one compact file per cell
            .write.partitionBy("cell")
            .parquet(path)
        )

    return session_artifact_df(
        spark, sf_dir, "ivf_store", "embeddings.parquet", build
    )


def query_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixture's probe vector (qv) — extracted from the raw table,
    as a serving query would arrive from outside the store."""
    return (
        embeddings_double(spark, sf_dir)
        .filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(F.col("v").alias("qv"))
    )


def _qv_literal(qv):
    """The probe vector inlined as an array literal — the serving-path
    shape where the query arrives driver-side; keeps the pruned store
    scan the ONLY distributed job in the lookup."""
    return F.array(*[F.lit(float(x)) for x in qv])


def _probe_row(df: DataFrame):
    """Eager 1-row driver fetch of the probe vector (the serving-path
    contract: ANN lookup queries run a bounded job at PLAN-BUILD time to
    fetch the probe — `bench --explain` therefore triggers it too). A
    regenerated fixture without vec_id == QUERY_VEC_ID would make
    first() return None and crash later with AttributeError; fail
    loudly at the fetch instead."""
    row = df.first()
    if row is None:
        raise ValueError(
            f"probe vector vec_id={QUERY_VEC_ID} not found in the "
            "embeddings fixture; ANN serving queries need it"
        )
    return row


DUCK_EMB = "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings"
DUCK_QVEC = f"SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}"


@register(
    "ann_knn_bruteforce",
    oracle=f"""
        SELECT vec_id, {duck_cosine('v', 'qv')} AS cosine
        FROM ({DUCK_EMB}) CROSS JOIN ({DUCK_QVEC})
        WHERE vec_id <> {QUERY_VEC_ID}
        ORDER BY cosine DESC, vec_id LIMIT 10
    """,
    tier="llm",
    doc="Exact cosine top-k for one query vector: broadcast the query, "
    "scan once, TakeOrdered — the ANN correctness baseline.",
)
def q_ann_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = embeddings_double(spark, sf_dir)
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("v").alias("qv"))
    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", F.expr(spark_cosine("v", "qv")).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(10)
    )


@register(
    "ann_lsh_bucket_histogram",
    export=False,  # pytest-verified variant; kept out of the external window
    oracle=f"""
        SELECT {duck_lsh_bucket('v')} AS bucket, CAST(COUNT(*) AS BIGINT) AS n
        FROM ({DUCK_EMB}) GROUP BY 1
    """,
    tier="llm",
    doc=f"LSH bucket assignment ({N_PLANES} hyperplanes, {2**N_PLANES} "
    "buckets): per-row arithmetic, zero shuffle before the final count.",
)
def q_ann_lsh_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = embeddings_double(spark, sf_dir)
    return (
        e.withColumn("bucket", F.expr(spark_lsh_bucket("v")))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "ann_lsh_topk",
    oracle=f"""
        WITH e AS (SELECT vec_id, v, {duck_lsh_bucket('v')} AS bucket FROM ({DUCK_EMB})),
        q AS (SELECT v AS qv, bucket AS qbucket FROM e WHERE vec_id = {QUERY_VEC_ID})
        SELECT vec_id, {duck_cosine('v', 'qv')} AS cosine
        FROM e CROSS JOIN q
        WHERE e.bucket = q.qbucket AND vec_id <> {QUERY_VEC_ID}
        ORDER BY cosine DESC, vec_id LIMIT 10
    """,
    tier="llm",
    doc="LSH-bucketed ANN top-k against the PERSISTED bucket-partitioned "
    "store — the serving shape: the probe vector is fetched driver-side "
    "(1 bounded row, as a live query would arrive), its bucket becomes "
    "a STATIC partition filter, and the only distributed job is the "
    "pruned scan of that one Hive partition (~1/256 of the store).",
)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    qrow = _probe_row(
        query_vector(spark, sf_dir)
        .withColumn("qbucket", F.expr(spark_lsh_bucket("qv")))
    )
    return (
        lsh_store(spark, sf_dir)
        .filter(
            (F.col("bucket") == int(qrow.qbucket))
            & (F.col("vec_id") != QUERY_VEC_ID)
        )
        .withColumn("qv", _qv_literal(qrow.qv))
        .select("vec_id", F.expr(spark_cosine("v", "qv")).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(10)
    )


N_BATCH_QUERIES = 8
BATCH_K = 10


@register(
    "ann_knn_batch_numpy",
    # Tolerance-verdict oracle: BLAS reorders the double summation, so raw
    # BLAS cosines differ from a left-to-right SQL fold in the last ulp.
    # The query therefore uses BLAS only to PRUNE (per-cell top-(k+5)),
    # re-ranks the surviving ~cells*q*(k+5) candidates with the exact
    # left-to-right fold (bit-identical on both engines), and emits a
    # boolean asserting |blas - fold| <= 1e-9. The oracle ranks by the
    # same fold and emits literal TRUE.
    oracle=f"""
        WITH e AS ({DUCK_EMB}),
        q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < {N_BATCH_QUERIES}),
        scored AS (
            SELECT q_id, e.vec_id, {duck_cosine('e.v', 'q.qv')} AS cosine
            FROM e CROSS JOIN q
            WHERE e.vec_id <> q.q_id
        ),
        ranked AS (
            SELECT q_id, vec_id, cosine,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY cosine DESC, vec_id) AS rn
            FROM scored
        )
        SELECT q_id, vec_id, cosine, CAST(rn AS BIGINT) AS rn,
               TRUE AS blas_within_1e9
        FROM ranked WHERE rn <= {BATCH_K}
    """,
    tier="llm",
    doc="Batch multi-query exact KNN (SURVEY.md §2.10 applyInPandas "
    "surface): score all vectors against 8 query vectors at once with "
    "one numpy/BLAS matmul per IVF cell (grouped map, Arrow-batched), "
    "keep a per-cell partial top-k per query, then merge with a window. "
    "This is the batch-scoring shape for 100 TB: per-partition dense "
    "matmul amortizes Python/Arrow overhead over the whole cell, and "
    "the partial top-k bounds the shuffle to cells x queries x k rows.",
)
def q_ann_knn_batch_numpy(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    e = ivf_store(spark, sf_dir)
    qrows = (
        e.filter(F.col("vec_id") < N_BATCH_QUERIES)
        .select("vec_id", "v")
        .collect()
    )
    q_ids = np.array([r.vec_id for r in qrows])
    Q = np.array([r.v for r in qrows], dtype=np.float64)  # (q, dim)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    # Per-cell margin over k so the final fold-ordered top-k set cannot be
    # changed by last-ulp BLAS-vs-fold differences at the cut boundary;
    # the in-cell selection tie-breaks on vec_id (same as the oracle's
    # ROW_NUMBER ordering), so exact-duplicate cosines can never evict
    # the fold-rank winner, and the margin covers near-ties within the
    # 1e-9 BLAS band.
    PRUNE_K = BATCH_K + 10

    def score_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        M = np.stack(pdf["v"].values).astype(np.float64)  # (n, dim)
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        C = Mn @ Qn.T  # (n, q) cosines
        out = []
        vec_ids = pdf["vec_id"].values
        for qi, q_id in enumerate(q_ids):
            col = C[:, qi]
            mask = vec_ids != q_id
            cand_ids, cand_cos = vec_ids[mask], col[mask]
            take = min(PRUNE_K, len(cand_ids))
            if take == 0:
                continue
            # lexsort: primary -cosine (desc), secondary vec_id (asc)
            part = np.lexsort((cand_ids, -cand_cos))[:take]
            out.append(
                pd.DataFrame(
                    {"q_id": q_id, "vec_id": cand_ids[part], "blas_cosine": cand_cos[part]}
                )
            )
        if not out:
            return pd.DataFrame({"q_id": [], "vec_id": [], "blas_cosine": []})
        return pd.concat(out, ignore_index=True)

    partial = e.groupBy("cell").applyInPandas(
        score_cell, schema="q_id long, vec_id long, blas_cosine double"
    )
    # Re-rank the pruned candidates (~cells * q * PRUNE_K rows) with the
    # exact left-to-right fold so ordering and values are bit-identical to
    # the oracle; the BLAS score survives only as a tolerance verdict.
    cand = partial.join(
        e.select("vec_id", "v"), "vec_id"
    ).join(
        F.broadcast(
            e.filter(F.col("vec_id") < N_BATCH_QUERIES).select(
                F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
            )
        ),
        "q_id",
    ).select(
        "q_id",
        "vec_id",
        "blas_cosine",
        F.expr(spark_cosine("v", "qv")).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        cand.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= BATCH_K)
        .select(
            "q_id",
            "vec_id",
            "cosine",
            "rn",
            (F.abs(F.col("blas_cosine") - F.col("cosine")) <= F.lit(1e-9)).alias(
                "blas_within_1e9"
            ),
        )
    )


@register(
    "ann_ivf_cells",
    export=False,  # pytest-verified variant; kept out of the external window
    oracle=f"""
        SELECT CAST({duck_ivf_cell('v')} AS BIGINT) AS cell,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM ({DUCK_EMB}) GROUP BY 1
    """,
    tier="llm",
    doc=f"IVF coarse quantization: nearest of {N_CENTROIDS} fixed centroids "
    "per vector (argmin over exact squared distances).",
)
def q_ann_ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = embeddings_double(spark, sf_dir)
    return (
        e.withColumn("cell", F.expr(spark_ivf_cell("v")).cast("long"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "ann_ivf_topk",
    oracle=f"""
        WITH e AS (SELECT vec_id, v, {duck_ivf_cell('v')} AS cell FROM ({DUCK_EMB})),
        q AS (SELECT v AS qv, cell AS qcell FROM e WHERE vec_id = {QUERY_VEC_ID})
        SELECT vec_id, {duck_cosine('v', 'qv')} AS cosine
        FROM e CROSS JOIN q
        WHERE e.cell = q.qcell AND vec_id <> {QUERY_VEC_ID}
        ORDER BY cosine DESC, vec_id LIMIT 10
    """,
    tier="llm",
    doc="IVF ANN top-k against the persisted cell-partitioned store: "
    "probe only the query's cell (nprobe=1) — a static partition "
    "filter, one partition read (serving shape, 1-row driver fetch).",
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    qrow = _probe_row(
        query_vector(spark, sf_dir)
        .withColumn("qcell", F.expr(spark_ivf_cell("qv")).cast("long"))
    )
    return (
        ivf_store(spark, sf_dir)
        .filter(
            (F.col("cell") == int(qrow.qcell)) & (F.col("vec_id") != QUERY_VEC_ID)
        )
        .withColumn("qv", _qv_literal(qrow.qv))
        .select("vec_id", F.expr(spark_cosine("v", "qv")).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Recall-improving probe strategies (the production knobs for LSH / IVF)
# ---------------------------------------------------------------------------

# Multi-probe LSH: the query's bucket plus every bucket at Hamming
# distance 1 in signature space (flip one hyperplane sign) — 9 probes of
# 256 buckets. Vectors near a hyperplane land one bit away; probing the
# adjacent buckets recovers most of the recall lost to that boundary
# effect without adding hash tables.
PROBE_MASKS = [0] + [1 << j for j in range(N_PLANES)]


@register(
    "ann_lsh_multiprobe",
    oracle=f"""
        WITH e AS (SELECT vec_id, v, {duck_lsh_bucket('v')} AS bucket FROM ({DUCK_EMB})),
        q AS (SELECT v AS qv, bucket AS qbucket FROM e WHERE vec_id = {QUERY_VEC_ID}),
        probes AS (
            SELECT qv, xor(qbucket, m.m) AS pbucket
            FROM q, (VALUES {', '.join(f'({m})' for m in PROBE_MASKS)}) AS m(m))
        SELECT vec_id, {duck_cosine('v', 'qv')} AS cosine
        FROM e JOIN probes ON e.bucket = probes.pbucket
        WHERE vec_id <> {QUERY_VEC_ID}
        ORDER BY cosine DESC, vec_id LIMIT 10
    """,
    tier="llm",
    doc=f"Multi-probe LSH ANN: search the query's bucket plus its "
    f"{N_PLANES} Hamming-1 neighbors ({len(PROBE_MASKS)}/{2**N_PLANES} "
    "buckets). Still an equality join on the bucket key — each probe is "
    "a pruned partition read at scale — recovering boundary-effect "
    "recall without extra hash tables or a wider scan.",
)
def q_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    qrow = _probe_row(
        query_vector(spark, sf_dir)
        .withColumn("qbucket", F.expr(spark_lsh_bucket("qv")))
    )
    probes = [int(qrow.qbucket) ^ m for m in PROBE_MASKS]
    return (
        lsh_store(spark, sf_dir)
        .filter(F.col("bucket").isin(probes) & (F.col("vec_id") != QUERY_VEC_ID))
        .withColumn("qv", _qv_literal(qrow.qv))
        .select("vec_id", F.expr(spark_cosine("v", "qv")).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(10)
    )


N_PROBE = 2  # IVF cells probed


def _duck_ivf_cell_dists(qv: str) -> str:
    """UNION ALL of (cell, d) rows: squared-distance surrogate per centroid."""
    return " UNION ALL ".join(
        f"SELECT {j + 1} AS cell, "
        f"({sum(x * x for x in c)}.0 - 2.0 * list_dot_product({qv}, {_duck_arr(c)})) AS d FROM q"
        for j, c in enumerate(CENTROIDS)
    )


def spark_ivf_probe_cells(vec: str, nprobe: int) -> str:
    """Spark expr: the nprobe nearest centroid indices, tie-broken by
    centroid index (== ORDER BY d, cell in the oracle)."""
    structs = ", ".join(
        f"struct(({sum(x * x for x in c)}.0d - 2.0d * {SPARK_DOT.format(a=vec, b=_spark_arr(c))}) AS d, {j + 1} AS i)"
        for j, c in enumerate(CENTROIDS)
    )
    return f"transform(slice(array_sort(array({structs})), 1, {nprobe}), s -> s.i)"


@register(
    "ann_ivf_topk_nprobe",
    oracle=f"""
        WITH e AS (SELECT vec_id, v, {duck_ivf_cell('v')} AS cell FROM ({DUCK_EMB})),
        q AS (SELECT v AS qv FROM ({DUCK_EMB}) WHERE vec_id = {QUERY_VEC_ID}),
        cand AS ({_duck_ivf_cell_dists('qv')}),
        probecells AS (SELECT cell, qv FROM cand, q ORDER BY d, cell LIMIT {N_PROBE})
        SELECT vec_id, {duck_cosine('v', 'qv')} AS cosine
        FROM e JOIN probecells ON e.cell = probecells.cell
        WHERE vec_id <> {QUERY_VEC_ID}
        ORDER BY cosine DESC, vec_id LIMIT 10
    """,
    tier="llm",
    doc=f"IVF ANN with nprobe={N_PROBE}: search the {N_PROBE} nearest "
    "cells instead of one. The query's probe list explodes to rows and "
    "equi-joins the cell key, so each extra probe is one more pruned "
    "partition read — the standard recall/latency knob for "
    "quantization-based indexes.",
)
def q_ann_ivf_topk_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    qrow = _probe_row(
        query_vector(spark, sf_dir)
        .withColumn("pcells", F.expr(spark_ivf_probe_cells("qv", N_PROBE)))
    )
    probes = [int(c) for c in qrow.pcells]
    return (
        ivf_store(spark, sf_dir)
        .filter(F.col("cell").isin(probes) & (F.col("vec_id") != QUERY_VEC_ID))
        .withColumn("qv", _qv_literal(qrow.qv))
        .select("vec_id", F.expr(spark_cosine("v", "qv")).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(10)
    )


@register(
    "ann_recall_eval",
    oracle=f"""
        WITH e AS (SELECT vec_id, v, {duck_lsh_bucket('v')} AS bucket,
                          {duck_ivf_cell('v')} AS cell FROM ({DUCK_EMB})),
        q AS (SELECT v AS qv, bucket AS qbucket, cell AS qcell
              FROM e WHERE vec_id = {QUERY_VEC_ID}),
        bf AS (SELECT vec_id FROM e CROSS JOIN q
               WHERE vec_id <> {QUERY_VEC_ID}
               ORDER BY {duck_cosine('v', 'qv')} DESC, vec_id LIMIT 10),
        lsh AS (SELECT vec_id FROM e CROSS JOIN q
                WHERE e.bucket = q.qbucket AND vec_id <> {QUERY_VEC_ID}
                ORDER BY {duck_cosine('v', 'qv')} DESC, vec_id LIMIT 10),
        ivf AS (SELECT vec_id FROM e CROSS JOIN q
                WHERE e.cell = q.qcell AND vec_id <> {QUERY_VEC_ID}
                ORDER BY {duck_cosine('v', 'qv')} DESC, vec_id LIMIT 10)
        SELECT CAST((SELECT COUNT(*) FROM bf) AS BIGINT) AS k,
               CAST((SELECT COUNT(*) FROM bf JOIN lsh USING (vec_id)) AS BIGINT)
                 AS lsh_hits,
               CAST((SELECT COUNT(*) FROM bf JOIN ivf USING (vec_id)) AS BIGINT)
                 AS ivf_hits,
               ROUND(CAST((SELECT COUNT(*) FROM bf JOIN lsh USING (vec_id)) AS DOUBLE)
                     / (SELECT COUNT(*) FROM bf), 6) AS lsh_recall,
               ROUND(CAST((SELECT COUNT(*) FROM bf JOIN ivf USING (vec_id)) AS DOUBLE)
                     / (SELECT COUNT(*) FROM bf), 6) AS ivf_recall
    """,
    tier="llm",
    doc="ANN recall@10 evaluation: how much of the exact brute-force "
    "top-10 the LSH-bucketed and IVF-cell lookups recover — the "
    "accuracy/latency trade every approximate index must report before "
    "replacing an exact scan. Composes the three registered lookups "
    "(shared stores, shared probe vector) into one 1-row metrics frame.",
)
def q_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    bf = q_ann_knn_bruteforce(spark, sf_dir).select("vec_id")
    lsh = q_ann_lsh_topk(spark, sf_dir).select("vec_id")
    ivf = q_ann_ivf_topk(spark, sf_dir).select("vec_id")
    k = bf.agg(F.count(F.lit(1)).alias("k"))
    lsh_hits = bf.join(lsh, "vec_id", "left_semi").agg(
        F.count(F.lit(1)).alias("lsh_hits")
    )
    ivf_hits = bf.join(ivf, "vec_id", "left_semi").agg(
        F.count(F.lit(1)).alias("ivf_hits")
    )
    return (
        k.crossJoin(F.broadcast(lsh_hits))
        .crossJoin(F.broadcast(ivf_hits))
        .select(
            "k",
            "lsh_hits",
            "ivf_hits",
            F.round(F.col("lsh_hits").cast("double") / F.col("k"), 6).alias(
                "lsh_recall"
            ),
            F.round(F.col("ivf_hits").cast("double") / F.col("k"), 6).alias(
                "ivf_recall"
            ),
        )
    )
