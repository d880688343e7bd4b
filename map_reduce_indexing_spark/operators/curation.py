"""Cross-tier curation compositions: operators that only exist because
the engine's tiers share one DataFrame currency — here, quality-aware
near-dup resolution (the dedup tier's clusters x the text tier's
quality scores).

Reference parity anchor: the reference has no quality tier at all
(SURVEY.md §2.12 — it indexes everything it is given); this module is
extension tier, following the same build-then-query artifact
discipline (both inputs are served from session artifacts: the minhash
signatures and the tokens artifact)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..plans.registry import register
from .dedup import DUCK_CLUSTERS_CTES, q_dedup_clusters
from .textstats import EN_STOP
from .tokens import tokenized_docs


def _duck_stopword_ratio() -> str:
    from .dedup import DUCK_TOKENS_LIST

    stops = ", ".join(f"'{w}'" for w in EN_STOP)
    return f"""
        SELECT doc_id,
               CASE WHEN len(toks) > 0
                    THEN CAST(len(list_filter(toks, t -> t IN ({stops})))
                              AS DOUBLE) / len(toks)
                    ELSE 0.0 END AS stopword_ratio
        FROM (SELECT doc_id, {DUCK_TOKENS_LIST} AS toks FROM documents)
    """


@register(
    "dedup_cluster_keep_best",
    oracle=f"""{DUCK_CLUSTERS_CTES},
        clusters AS (
            SELECT node AS doc_id, CAST(MIN(lab) AS BIGINT) AS cluster_id
            FROM reach GROUP BY node),
        q AS ({_duck_stopword_ratio()}),
        ranked AS (
            SELECT c.cluster_id, c.doc_id, q.stopword_ratio,
                   ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                       ORDER BY q.stopword_ratio DESC, c.doc_id) AS rn,
                   COUNT(*) OVER (PARTITION BY c.cluster_id) AS nm
            FROM clusters c JOIN q ON c.doc_id = q.doc_id)
        SELECT cluster_id, CAST(doc_id AS BIGINT) AS keep_doc,
               CAST(nm AS BIGINT) AS n_members,
               ROUND(stopword_ratio, 9) AS keep_stopword_ratio
        FROM ranked WHERE rn = 1
    """,
    tier="llm",
    doc="Quality-aware near-dup resolution: per duplicate cluster, keep "
    "the HIGHEST-quality member (EN-stopword ratio, the text tier's "
    "quality signal; deterministic lowest-doc_id tie-break) instead of "
    "dedup_clusters' arbitrary min-doc_id canonical — the keeper "
    "policy real curation pipelines use (of N crawls of one page, keep "
    "the cleanest extraction). Composition: the cluster labels come "
    "from the full LSH->verify->CC pipeline, the scores are a map-only "
    "projection of the tokens artifact, and the pick is one window per "
    "cluster (clusters are tiny, so the partition-by is skew-free). "
    "Both ranking keys are exact integer ratios / ids — identical "
    "doubles cross-engine, so the argmax is deterministic.",
)
def q_dedup_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    clusters = q_dedup_clusters(spark, sf_dir)
    t = tokenized_docs(spark, sf_dir)
    from .textstats import _vote

    n_tok = F.col("n_norm_tokens")
    q = t.select(
        "doc_id",
        F.when(
            n_tok > 0,
            F.expr(_vote("spark", "en", "ws")).cast("double") / n_tok,
        )
        .otherwise(F.lit(0.0))
        .alias("stopword_ratio"),
    )
    w = Window.partitionBy("cluster_id")
    ranked = clusters.join(q, "doc_id").select(
        "cluster_id",
        "doc_id",
        "stopword_ratio",
        F.row_number()
        .over(w.orderBy(F.desc("stopword_ratio"), "doc_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(w).alias("nm"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "cluster_id",
        F.col("doc_id").alias("keep_doc"),
        F.col("nm").cast("long").alias("n_members"),
        F.round("stopword_ratio", 9).alias("keep_stopword_ratio"),
    )
