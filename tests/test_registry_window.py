"""Guard the external verifier's 50-query window.

The driver checks only the FIRST 50 entries of __spark_entry__.queries()
(registration order), so the priority window must stay exactly 50 long,
reference every tier, and contain only oracle-backed queries. A failure
here means a whole tier would silently lose its external correctness
signal.
"""

from __future__ import annotations

import __spark_entry__ as entrymod
from map_reduce_indexing_spark.plans import registry
from map_reduce_indexing_spark.plans.registry import PRIORITY_WINDOW

WINDOW = 50


def test_priority_window_is_exactly_the_driver_window():
    assert len(PRIORITY_WINDOW) == WINDOW
    assert len(set(PRIORITY_WINDOW)) == WINDOW
    names = list(entrymod.queries())
    assert names[:WINDOW] == PRIORITY_WINDOW


def test_window_covers_every_tier():
    tiers = {registry.get(n).tier for n in PRIORITY_WINDOW}
    assert tiers == {"ref", "implied", "relational", "llm", "streaming"}


def test_window_covers_every_operator_family():
    families = {n.split("_", 1)[0] for n in PRIORITY_WINDOW}
    assert {"index", "search", "rel", "dedup", "ann", "text", "multimodal", "stream"} <= families


def test_window_exercises_eval_layer_and_ntz_path():
    """Round-5 promotion: the externally-verified set must include the
    sketch-calibration evals and the time-RANGE frame (the once-broken
    TIMESTAMP_NTZ normalization path)."""
    # (ann_recall_eval itself rotated out in r9 — accuracy evaluation
    # keeps dedup_lsh_recall_eval external; see round9 test)
    # (rel_window_range_frame itself rotated out in r12 after 6 stable
    # rounds — the NTZ normalization path stays pinned by pytest +
    # sweep, and window serving stays external via
    # rel_matview_hist_quantile's three-window plan; see round12 test)
    assert "dedup_lsh_recall_eval" in set(PRIORITY_WINDOW)


def test_window_exercises_round5_families():
    """Round-5 rotation: the newest operator families (CDC, heavy
    hitters, event-flow) must be externally verified; the rows they
    replaced keep an in-window family representative."""
    w = set(PRIORITY_WINDOW)
    # (index_heavy_hitters and rel_funnel rotated out in r9 — both
    # families keep their STRICTER streaming consumers external:
    # stream_heavy_hitters and stream_funnel; see round9 test)
    # (rel_cdc_scd2 rotated out in the r9 second batch — SCD2 stays
    # external via stream_scd2_temporal_join, CDC via
    # rel_cdc_merge_upsert; see round9 second-batch test)
    # (rel_sessionize rotated out in the r9 third batch — the
    # sessionization family keeps its STRICTER streaming consumer
    # stream_session_windows external; see round9 third-batch test)
    # (rel_cdc_merge_upsert rotated out in the r10 third batch — MERGE
    # keeps its STRICTER store-level consumer rel_upsert_rows external)
    # (stream_session_windows rotated out in r11 — the streaming
    # family keeps six external rows incl. the stateful tier's
    # stream_stateful_user_stats; see round11 test)
    # (stream_stateful_user_stats rotated out in r13 — the stateful
    # family keeps its stricter consumer stream_heavy_hitters; see
    # round13 test)
    assert {
        "rel_upsert_rows",
        "stream_heavy_hitters",
    } <= w
    # family representatives that must stay
    # (dedup_simhash and rel_percentiles rotated out in r9 — pigeonhole
    # Hamming stays external via multimodal machinery + sweep,
    # distribution stats via rel_profile_drift; see round9 test)
    # (dedup_exact_kept rotated out in the r10 third batch after 9
    # stable rounds — the dedup tier keeps six external rows)
    assert {
        "dedup_jaccard_prefix_pairs",
        "search_topk_per_term",
    } <= w


def test_window_exercises_round6_rotation():
    """Round-6 rotation survivors: the round-5 operator families stay
    externally verified, and every r6-retired row's family keeps an
    in-window representative."""
    w = set(PRIORITY_WINDOW)
    # (rel_attribution_first_touch and rel_anomaly_daily rotated out
    # in r10 — event-flow keeps retention_cohorts + stream_funnel,
    # time-series/distribution keep rel_profile_drift; see round10 test)
    # (rel_retention_cohorts rotated out in r11 — event-flow keeps
    # stream_funnel + rel_profile_drift; see round11 test)
    assert {
        "ann_ivf_pq_topk",
        "rel_profile_drift",
    } <= w
    # retired rows stay registered + oracle-backed (sweep-checked)
    # (stream_session_windows, retired here in r6, was RE-promoted in
    # the r8 rotation — see test_window_exercises_round8_rotation)
    retired = {
        "rel_q3_shipping_priority",
        "rel_join_outer_counts",
        "rel_window_lag_gap",
        "ann_lsh_topk",
    }
    assert retired.isdisjoint(w)
    for name in retired:
        q = registry.get(name)
        assert q.export and q.oracle is not None
    # each retired row's family representative still in window
    # (rel_q5_local_supplier rotated out in the r10 third batch after
    # 9 stable rounds — multi-join agg keeps rel_bucketed_join_agg)
    assert {"rel_q1_pricing_summary", "rel_bucketed_join_agg"} <= w  # scan+agg / multi-join
    # (rel_join_anti and rel_theta_join_bands rotated out in r10,
    # rel_join_semi in r13 — the join family keeps rel_join_asof and
    # the DML paths' semi/anti joins; see round10/round13 tests)
    assert "rel_join_asof" in w  # join family
    # windows: rank_parts rotated out in r8, range_frame in r12; the
    # hist-quantile serving plan (three window specs) carries the tier
    assert "rel_matview_hist_quantile" in w
    # ann family (ann_knn_batch_numpy itself rotated out in the r9
    # third batch — the ANN tier keeps four external rows; see round9
    # third-batch test)
    # (ann_ivf_trained_topk rotated out in r11 — train-then-serve
    # stays external via ann_ivf_pq_topk + ann_kmeans_train_k64)
    assert {"ann_kmeans_train_k64", "ann_ivf_pq_topk"} <= w
    # streaming (cdc_upsert rotated out in r8, stateful_user_stats in
    # r13 — heavy_hitters is the stricter state-API consumer)
    assert "stream_heavy_hitters" in w


def test_window_exercises_round7_rotation():
    """Round-7 rotation (VERDICT r6 #4): flagship and never-external
    families promoted — production PMI (tokens-artifact path),
    blocked-Levenshtein fuzzy names, SCD2 temporal streaming join,
    cohort retention, positional-index proximity. Every retired row
    stays registered + oracle-backed and its family keeps another
    external representative."""
    w = set(PRIORITY_WINDOW)
    # (text_pmi_windowed rotated out in the r9 third batch — the text
    # tier keeps five external rows; see round9 third-batch test)
    # (search_proximity and stream_scd2_temporal_join rotated out in
    # r10 — the positional artifact stays pytest+sweep-checked, the
    # streaming family keeps five external rows; see round10 test)
    # (dedup_fuzzy_names and rel_retention_cohorts rotated out in r11
    # — the dedup tier keeps four external rows, event-flow keeps
    # stream_funnel; see round11 test)
    assert {
        "dedup_jaccard_prefix_pairs",
        "stream_funnel",
    } <= w
    retired = {
        "search_phrase",  # positional artifact: search_proximity
        "rel_resample_daily",  # time-series: rel_anomaly_daily
        "dedup_ngram_jaccard",  # calibration stat: dedup_lsh_recall_eval
        "text_langid",  # llm tier: text_quality/token_counts/pmi
        "stream_tumbling_counts",  # windowed agg: cdc_upsert/stateful
    }
    assert retired.isdisjoint(w)
    for name in retired:
        q = registry.get(name)
        assert q.export and q.oracle is not None
    assert {"search_term_lookup", "search_topk_per_term"} <= w
    # (rel_anomaly_daily rotated out in r10; rel_sessionize in r9 third;
    # rel_retention_cohorts itself in r11 — rel_profile_drift carries)
    assert "rel_profile_drift" in w
    # (dedup_minhash_lsh_pairs was itself rotated out in the second r7
    # batch — the banding family's representative is now the recall
    # eval; see test_window_exercises_round7_second_batch)
    assert "dedup_lsh_recall_eval" in w


def test_coverage_doc_export_count():
    """COVERAGE.md's export count must match the live registry (r15 —
    the r13/r14 verdicts caught the doc drifting from 184 to the real
    194; this pin makes the line self-verifying)."""
    import os
    import re

    doc = open(
        os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")
    ).read()
    m = re.search(r"`queries\(\)` exports (\d+) entries", doc)
    assert m, "COVERAGE.md lost its export-count line"
    assert int(m.group(1)) == len(entrymod.queries())


def test_every_exported_query_has_an_oracle():
    oracles = entrymod.oracle_sql()
    for name in entrymod.queries():
        assert name in oracles, f"{name} would get only a rows-only check"


def test_unexported_variants_still_resolvable_for_tests():
    for name in (
        "index_vocabulary_topk_salted",
        "rel_rollup_orders",
        "rel_cube_lineitem",
        "rel_distinct_counts",
        "rel_topk_orders",
        "rel_window_running_total",
        "stream_sliding_counts",
        "multimodal_corpus_bytes",
        "ann_lsh_bucket_histogram",
        "ann_ivf_cells",
    ):
        q = registry.get(name)
        assert q.export is False
        assert q.oracle is not None
        assert name not in entrymod.queries()


def test_window_exercises_round7_second_batch():
    """Round-7 second batch: the new substring-dedup class gets a
    driver row; the retired LSH-candidate row's banding stays external
    via the recall eval (which generates candidates through the same
    lsh_candidate_pairs code path) and via dedup_clusters (which
    consumes q_dedup_minhash_lsh_pairs end-to-end)."""
    w = set(PRIORITY_WINDOW)
    # (dedup_common_passages itself rotated out in r10 — gram-keyed
    # lossless dedup keeps dedup_jaccard_prefix_pairs external)
    assert "dedup_jaccard_prefix_pairs" in w
    assert "dedup_minhash_lsh_pairs" not in w
    q = registry.get("dedup_minhash_lsh_pairs")
    assert q.export and q.oracle is not None
    # (dedup_minhash_signatures rotated out in r9; dedup_clusters in
    # the r9 third batch — the recall eval plus the keeper, which
    # consumes the full cluster path end-to-end, stay external)
    assert {"dedup_lsh_recall_eval", "dedup_cluster_keep_best"} <= w


def test_window_exercises_round7_third_batch():
    """Round-7 third batch: the trained coarse quantizer (iterative
    refinement — a new algorithm class for the window) and the
    training-export permutation op go external. Each retired row stays
    registered + oracle-backed and its family keeps representatives."""
    w = set(PRIORITY_WINDOW)
    # (ann_kmeans_train itself rotated out in r8 — its training loop
    # stays external inside ann_ivf_trained_topk; see round8 test)
    # (text_shuffle_shards itself rotated out in the r10 third batch —
    # the export/permutation class stays pinned by the export-manifest
    # pytest tier, and the text tier's store-composition row is now
    # text_incremental_pipeline)
    assert "text_incremental_pipeline" in w
    retired = {
        "ann_knn_bruteforce",  # exact cosine: ann_knn_batch_numpy + evals
        "text_token_counts",  # token stats: artifact tests + sweep
    }
    assert retired.isdisjoint(w)
    for name in retired:
        q = registry.get(name)
        assert q.export and q.oracle is not None
    # (ann_recall_eval rotated out in r9; ann_knn_batch_numpy and
    # text_pmi_windowed in the r9 third batch)
    assert "ann_ivf_pq_topk" in w
    assert "text_bpe_merges" in w


def test_window_exercises_round8_rotation():
    """Round-8 rotation (VERDICT r7 #4): never-external rows promoted —
    the train-then-serve quantizer composition, MERGE upsert semantics,
    watermarked session windows, binary audio metadata parsing, and
    train/eval decontamination. Every retired row stays registered +
    oracle-backed and its family keeps another external representative."""
    w = set(PRIORITY_WINDOW)
    # (rel_cdc_merge_upsert rotated out in the r10 third batch — MERGE
    # stays external via the store-level rel_upsert_rows)
    # (ann_ivf_trained_topk and stream_session_windows rotated out in
    # r11 — train-then-serve stays external via ann_ivf_pq_topk +
    # ann_kmeans_train_k64, the streaming family keeps six rows)
    # (stream_stateful_user_stats rotated out in r13; see round13 test)
    assert {
        "ann_ivf_pq_topk",
        "rel_upsert_rows",
        "stream_heavy_hitters",
        "multimodal_audio_meta",
        "text_decontaminate",
    } <= w
    retired = {
        "ann_kmeans_train",  # training runs inside ann_ivf_trained_topk
        "stream_cdc_upsert",  # upsert: rel_cdc_merge_upsert (batch MERGE)
        "text_quality",  # quality scoring: sweep + artifact equivalence
        "search_and",  # boolean AND: search_proximity (AND + position)
        "rel_window_rank_parts",  # rank: search_topk_per_term, cohorts
    }
    assert retired.isdisjoint(w)
    for name in retired:
        q = registry.get(name)
        assert q.export and q.oracle is not None
    # each retired row's family keeps an in-window representative
    # (search_proximity itself rotated out in r10)
    assert {"search_term_lookup", "search_topk_per_term"} <= w
    # (rel_cdc_scd2 itself rotated out in the r9 second batch;
    # rel_cdc_merge_upsert in the r10 third batch;
    # rel_window_range_frame in r12)
    assert {"rel_upsert_rows", "rel_matview_hist_quantile"} <= w
    # (stream_scd2_temporal_join itself rotated out in r10;
    # stream_session_windows in r11; stateful_user_stats in r13 —
    # heavy_hitters carries the state-API tier)
    assert "stream_heavy_hitters" in w
    # (text_shuffle_shards out in the r10 third batch; pipeline row carries)
    assert "text_incremental_pipeline" in w
    assert "ann_ivf_pq_topk" in w  # (ann_recall_eval rotated out in r9)


def test_round8_second_batch_rotation():
    """Round-8 second batch: the round's brand-new algorithm class
    (iterative graph analytics — weighted PageRank) gets an external
    row; rel_approx_distinct retires after 7 stable rounds with
    rel_percentiles carrying the approximate-distribution family."""
    w = set(PRIORITY_WINDOW)
    assert "rel_pagerank_trade" in w
    assert "rel_approx_distinct" not in w
    q = registry.get("rel_approx_distinct")
    assert q.export and q.oracle is not None  # still sweep-checked
    # (rel_percentiles itself rotated out in r9 — the distribution
    # family's external row is now rel_profile_drift; see round9 test)
    assert "rel_profile_drift" in w


def test_round8_third_batch_rotation():
    """Round-8 third batch: the session's six never-external new
    classes go external — sparse-vector similarity from the index,
    the one-pass trained quality classifier, learned-cell semantic
    dedup, triangle counting, BPE tokenizer training, and streaming
    heavy hitters. Every retired row stays registered + oracle-backed
    and its family keeps another external representative."""
    w = set(PRIORITY_WINDOW)
    # (dedup_semantic_pairs rotated out in r11 — its exact-verify
    # cosine arithmetic stays external via ann_filtered_topk's pruned
    # cell scans; see round11 test)
    # (search_related_docs rotated out in r13 — sparse similarity stays
    # sweep-checked, the search family keeps term_lookup/topk_per_term)
    assert {
        "text_classifier_train",
        "ann_filtered_topk",
        "rel_triangles_trade",
        "text_bpe_merges",
        "stream_heavy_hitters",
    } <= w
    retired = {
        "search_bm25_rank",  # ranking: topk_per_term + related_docs
        "search_doc_tf_vector",  # TF accounting: artifact tests + sweep
        "dedup_embedding_pairs",  # embedding near-dup: semantic_pairs
        "rel_scalar_functions",  # scalar surface: rel_json_parse
        "multimodal_embed",  # UDF surface: knn_batch_numpy + stateful
        "stream_incremental_index",  # index sink: pytest crash/flock tier
    }
    assert retired.isdisjoint(w)
    for name in retired:
        q = registry.get(name)
        assert q.export and q.oracle is not None
    # each retired row's family keeps an in-window representative
    assert {"search_term_lookup", "search_topk_per_term"} <= w
    # (rel_json_parse and dedup_simhash rotated out in r9;
    # dedup_semantic_pairs itself in r11 — cluster_keep_best carries
    # quality-aware resolution, ann_filtered_topk the cosine path)
    assert "dedup_cluster_keep_best" in w
    assert "multimodal_audio_meta" in w
    assert {"index_postings", "index_letter_histogram"} <= w
    assert "stream_heavy_hitters" in w


def test_window_exercises_round9_rotation():
    """Round-9 rotation (VERDICT r8 #6 + #1): never-external flagship
    rows promoted — the large-k broadcast quantizer training, trained
    PQ codebooks, lossless prefix-filtered exact Jaccard, the
    exchange-free bucketed join, exact-under-disorder streaming
    funnel, quality-aware cluster resolution, PSI drift monitoring,
    and the round's scale fix text_lm_resample. Every retired row
    stays registered + oracle-backed and its family keeps another
    external representative."""
    w = set(PRIORITY_WINDOW)
    # (ann_pq_train itself rotated out in r12 — PQ codebooks stay
    # external via ann_ivf_pq_topk; see round12 test)
    # (text_lm_resample rotated out in r13 — the resample plan stays
    # sweep-checked; see round13 test)
    assert {
        "ann_kmeans_train_k64",
        "dedup_jaccard_prefix_pairs",
        "rel_bucketed_join_agg",
        "stream_funnel",
        "dedup_cluster_keep_best",
        "rel_profile_drift",
    } <= w
    retired = {
        "rel_percentiles",  # distribution stats: rel_profile_drift
        "rel_json_parse",  # scalar/json surface: sweep
        "rel_set_ops",  # set semantics: sweep
        "ann_recall_eval",  # accuracy eval: dedup_lsh_recall_eval
        "rel_funnel",  # funnel: stream_funnel (same batch oracle logic)
        "dedup_minhash_signatures",  # signatures: lsh_recall_eval path
        "dedup_simhash",  # pigeonhole Hamming: multimodal bands + sweep
        "index_heavy_hitters",  # MG machinery: stream_heavy_hitters
    }
    assert retired.isdisjoint(w)
    for name in retired:
        q = registry.get(name)
        assert q.export and q.oracle is not None
    # each retired row's family keeps an in-window representative
    # (rel_grouping_sets itself rotated out in the r9 second batch)
    assert {"rel_profile_drift", "rel_q1_pricing_summary"} <= w
    # (dedup_clusters itself rotated out in the r9 third batch — the
    # keeper consumes the full cluster path end-to-end)
    assert {"dedup_lsh_recall_eval", "dedup_cluster_keep_best"} <= w
    assert {"stream_heavy_hitters", "stream_funnel"} <= w
    # (ann_ivf_trained_topk rotated out in r11; pq_topk + kmeans carry)
    assert {"ann_kmeans_train_k64", "ann_ivf_pq_topk"} <= w


def test_round9_second_batch_rotation():
    """Round-9 second batch: the generation manifest becomes a real
    table-format data plane and both halves go external — the
    manifest-stats file-skipping scan and the incrementally maintained
    materialized aggregate (whose full-table oracle makes the external
    hash match an incremental==full proof). Retired rows keep family
    representatives external and stay sweep-checked."""
    w = set(PRIORITY_WINDOW)
    assert {"rel_snapshot_pruned_scan", "rel_matview_refresh"} <= w
    retired = {
        "rel_cdc_scd2",  # SCD2: stream_scd2_temporal_join (stricter)
        "rel_grouping_sets",  # A7 multi-agg: rel_q1 + sweep
    }
    assert retired.isdisjoint(w)
    for name in retired:
        q = registry.get(name)
        assert q.export and q.oracle is not None
    # (stream_scd2_temporal_join itself rotated out in r10 — SCD2
    # stays sweep-checked; rel_cdc_merge_upsert followed in the r10
    # third batch — the CDC family's external row is the store-level
    # rel_upsert_rows, its strictly stricter consumer)
    assert "rel_upsert_rows" in w
    assert "rel_q1_pricing_summary" in w


def test_round9_third_batch_rotation():
    """Round-9 third batch: the lakehouse tier's flagships go external
    — distinct-count IVM (the non-distributive aggregate maintained
    via support views), bloom-sidecar point lookup, the named-tag
    pinned read, and the streaming continuous aggregate. Every retired
    row stays registered + oracle-backed and its family keeps another
    external representative."""
    w = set(PRIORITY_WINDOW)
    # (rel_savepoint_pinned_read itself rotated out in r12 — pinned
    # reads stay external via rel_snapshot_pruned_scan and the @1
    # time-travel reference in rel_store_sql_travel; see round12 test)
    # (rel_matview_distinct rotated out in r13 — distinct-count IVM
    # stays sweep-checked, the matview family keeps four external rows)
    assert {
        "rel_bloom_point_lookup",
        "stream_continuous_agg",
    } <= w
    retired = {
        "rel_sessionize",  # sessions: stream_session_windows (stricter)
        "dedup_clusters",  # cluster path: dedup_cluster_keep_best (consumes it)
        "ann_knn_batch_numpy",  # ANN keeps 4 external rows
        "text_pmi_windowed",  # text keeps 5 external rows
    }
    assert retired.isdisjoint(w)
    for name in retired:
        q = registry.get(name)
        assert q.export and q.oracle is not None
    # (stream_session_windows rotated out in r11, stateful_user_stats
    # in r13 — the streaming family keeps six external rows)
    assert {"stream_heavy_hitters", "dedup_cluster_keep_best"} <= w
    # (ann_ivf_trained_topk rotated out in r11 — filtered_topk joins;
    # ann_pq_train out in r12 — PQ stays external via ann_ivf_pq_topk)
    assert {
        "ann_filtered_topk",
        "ann_ivf_pq_topk",
        "ann_kmeans_train_k64",
    } <= w
    # (text_shuffle_shards itself rotated out in the r10 third batch —
    # the tier keeps five external rows incl. the pipeline)
    # (text_lm_resample rotated out in r13)
    assert {
        "text_decontaminate",
        "text_incremental_pipeline",
        "text_classifier_train",
        "text_bpe_merges",
    } <= w
    # the new rows' own families
    assert {"rel_matview_refresh", "rel_snapshot_pruned_scan"} <= w


def test_round10_rotation():
    """Round-10 rotation (VERDICT r9 #6): the lakehouse tier completes
    its external surface — the four judge-verified-but-never-external
    rows (matview rollup routing, row-level CDF, the delta-files-only
    diff scan, the metadata-only COUNT(*)) plus the round's two new
    store operations (join-IVM matviews, predicate DELETE). Every
    retired row stays registered + oracle-backed and its family keeps
    another external representative."""
    w = set(PRIORITY_WINDOW)
    assert {
        "rel_matview_rollup_route",
        "rel_generation_changes",
        "rel_generation_diff_scan",
        "rel_metadata_count",
        "rel_matview_join_refresh",
        "rel_delete_rows",
        "rel_upsert_rows",
    } <= w
    retired = {
        "search_proximity",  # positional artifact: pytest + sweep
        "rel_theta_join_bands",  # joins: semi/asof/q5
        "rel_join_anti",  # anti rides every generation_diff consumer
        "rel_attribution_first_touch",  # event-flow: cohorts + funnel
        "rel_anomaly_daily",  # time-series: cohorts; dist: profile_drift
        "dedup_common_passages",  # gram-keyed: jaccard_prefix_pairs
        "stream_scd2_temporal_join",  # streaming keeps 5 external rows
    }
    assert retired.isdisjoint(w)
    for name in retired:
        q = registry.get(name)
        assert q.export and q.oracle is not None
    # each retired row's family keeps an in-window representative
    # (search_related_docs itself rotated out in r13)
    assert {"search_term_lookup", "search_topk_per_term"} <= w
    # (rel_q5_local_supplier rotated out in the r10 third batch,
    # rel_join_semi in r13 — asof + the DML semi/anti paths carry)
    assert {"rel_join_asof", "rel_q1_pricing_summary"} <= w
    # (rel_retention_cohorts itself rotated out in r11)
    assert {"stream_funnel", "rel_profile_drift"} <= w
    # (dedup_exact_kept itself rotated out in the r10 third batch)
    assert {"dedup_jaccard_prefix_pairs", "dedup_incremental_lsh_pairs"} <= w
    # (stream_session_windows itself rotated out in r11 — replaced in
    # the family by the two round-11 ingest rows)
    # (stream_stateful_user_stats itself rotated out in r13 — the
    # family keeps six external rows incl. stream_store_cdf)
    assert {
        "stream_continuous_agg",
        "stream_funnel",
        "stream_gated_ingest",
        "stream_autocompact_ingest",
        "stream_store_cdf",
        "stream_heavy_hitters",
    } <= w
    # the lakehouse tier's full external surface
    # (rel_cdc_merge_upsert itself rotated out in the r10 third batch
    # — the store-level rel_upsert_rows is the stricter MERGE row)
    # (rel_savepoint_pinned_read itself rotated out in r12; see
    # round12 test)
    # (rel_matview_distinct itself rotated out in r13)
    assert {
        "rel_snapshot_pruned_scan",
        "rel_matview_refresh",
        "rel_bloom_point_lookup",
        "rel_upsert_rows",
    } <= w


def test_round10_third_batch_rotation():
    """Round-10 third batch: the session's four new classes go
    external — the publish-time admission gate (quarantine split),
    the maintainable histogram serving percentiles through an
    append-then-DELETE lifecycle, incremental batch dedup over a
    generations store, and the chained store-to-store incremental
    pipeline. Every retired row stays registered + oracle-backed and
    its family keeps another external representative."""
    w = set(PRIORITY_WINDOW)
    assert {
        "rel_expectations_quarantine",
        "rel_matview_hist_quantile",
        "dedup_incremental_lsh_pairs",
        "text_incremental_pipeline",
    } <= w
    retired = {
        "rel_q5_local_supplier",  # multi-join agg: q1 + bucketed_join_agg
        "dedup_exact_kept",  # exact dedup: sweep; tier keeps 6 rows
        "text_shuffle_shards",  # export permutation: pytest tier + sweep
        "rel_cdc_merge_upsert",  # MERGE: rel_upsert_rows (store-level)
    }
    assert retired.isdisjoint(w)
    for name in retired:
        q = registry.get(name)
        assert q.export and q.oracle is not None
    # the gate's audit row sits just outside the window, still exported
    q = registry.get("rel_expectations_audit")
    assert q.export and q.oracle is not None
    assert "rel_expectations_audit" not in w
    # each retired row's family keeps an in-window representative
    assert {"rel_q1_pricing_summary", "rel_bucketed_join_agg"} <= w
    # (dedup_fuzzy_names itself rotated out in r11)
    assert {"dedup_jaccard_prefix_pairs", "dedup_cluster_keep_best"} <= w
    assert {"text_decontaminate", "text_incremental_pipeline"} <= w
    assert "rel_upsert_rows" in w
    # the histogram row joins the matview family's external surface
    assert {"rel_matview_refresh", "rel_matview_hist_quantile",
            "rel_matview_join_refresh"} <= w


def test_round11_rotation():
    """Round-11 rotation (VERDICT r10 #6): the judge-verified but
    never-external round-10 rows go external — filtered ANN, the
    (now replay-idempotent) gated streaming ingest, and the
    quarantine repair loop — plus the round's two new store flagships:
    optimistic concurrent appends under the object-store CAS backend
    and the auto-compacted streaming ingest. Every retired row stays
    registered + oracle-backed and its family keeps another external
    representative."""
    w = set(PRIORITY_WINDOW)
    assert {
        "ann_filtered_topk",
        "stream_gated_ingest",
        "rel_expectations_readmit",
        "rel_concurrent_append",
        "stream_autocompact_ingest",
    } <= w
    retired = {
        "rel_retention_cohorts",  # event-flow: stream_funnel + drift
        "dedup_fuzzy_names",  # dedup tier keeps four external rows
        "dedup_semantic_pairs",  # cosine path: ann_filtered_topk
        "ann_ivf_trained_topk",  # train-then-serve: pq_topk + kmeans
        "stream_session_windows",  # streaming keeps six external rows
    }
    assert retired.isdisjoint(w)
    for name in retired:
        q = registry.get(name)
        assert q.export and q.oracle is not None
    # each retired row's family keeps an in-window representative
    assert {"stream_funnel", "rel_profile_drift"} <= w
    assert {
        "dedup_jaccard_prefix_pairs",
        "dedup_lsh_recall_eval",
        "dedup_cluster_keep_best",
        "dedup_incremental_lsh_pairs",
    } <= w
    assert {"ann_ivf_pq_topk", "ann_kmeans_train_k64"} <= w
    # (stream_stateful_user_stats itself rotated out in r13)
    assert {
        "stream_continuous_agg",
        "stream_heavy_hitters",
    } <= w
    # the admission-gate family now has its full lifecycle external:
    # batch gate -> streaming gate -> repair/readmit -> auto-compaction
    assert {
        "rel_expectations_quarantine",
        "rel_expectations_readmit",
        "stream_gated_ingest",
        "stream_autocompact_ingest",
    } <= w


def test_round12_rotation():
    """Round-12 rotation (VERDICT r11 #6): the round's three new store
    capabilities go external — schema evolution (evolved store read
    whose hash pins null-fill + widening reconciliation), the SQL
    catalog surface (spark.sql over registered views with inline
    @generation time travel), and the scheduled-maintenance lifecycle
    (one maintain_store call: policy-fired fold + residue vacuum).
    Every retired row stays registered + oracle-backed and its family
    keeps another external representative."""
    w = set(PRIORITY_WINDOW)
    assert {
        "rel_schema_evolution",
        "rel_store_sql_travel",
        "rel_store_maintenance",
    } <= w
    retired = {
        # pinned reads: rel_snapshot_pruned_scan + the @1 reference
        # inside rel_store_sql_travel carry the family
        "rel_savepoint_pinned_read",
        # PQ training: ann_ivf_pq_topk trains AND serves the codebooks
        "ann_pq_train",
        # window frames: hist_quantile's three-window serving plan and
        # search_topk_per_term keep the window family external
        "rel_window_range_frame",
    }
    assert retired.isdisjoint(w)
    for name in retired:
        q = registry.get(name)
        assert q.export and q.oracle is not None
    # the new rows are exported and oracle-backed
    for name in (
        "rel_schema_evolution",
        "rel_store_sql_travel",
        "rel_store_maintenance",
    ):
        q = registry.get(name)
        assert q.export and q.oracle is not None
    # family representatives for the retired rows
    assert {"rel_snapshot_pruned_scan", "ann_ivf_pq_topk"} <= w
    assert {"search_topk_per_term", "rel_matview_hist_quantile"} <= w


def test_round13_rotation():
    """Round-13 rotation (VERDICT r12 #4 + this round's builds): the
    three judge-green-but-never-external round-12 verbs go external
    (merge-on-read DELETE, partition evolution, column retirement)
    plus round 13's two new flagships (metadata-only column rename,
    the change-feed subscription). Every retired row stays registered
    + oracle-backed and its family keeps another external
    representative."""
    w = set(PRIORITY_WINDOW)
    assert {
        "rel_delete_dv",
        "rel_partition_evolution",
        "rel_drop_columns",
        "rel_schema_rename",
        "stream_store_cdf",
    } <= w
    retired = {
        # joins: asof stays; semi/anti ride upsert_rows' survivor
        # anti-join, the DV anti-join, and generation_diff's fallback
        "rel_join_semi",
        # distinct-count IVM: matview family keeps four external rows
        "rel_matview_distinct",
        # sparse TF-IDF similarity: search keeps term_lookup + topk;
        # similarity arithmetic rides the dedup/ANN tiers
        "search_related_docs",
        # broadcast-cutpoint resample: text tier keeps four rows
        "text_lm_resample",
        # state-API family: stream_heavy_hitters is the stricter
        # applyInPandasWithState consumer
        "stream_stateful_user_stats",
    }
    assert retired.isdisjoint(w)
    for name in retired:
        q = registry.get(name)
        assert q.export and q.oracle is not None
    # the promoted rows are exported and oracle-backed
    for name in (
        "rel_delete_dv",
        "rel_partition_evolution",
        "rel_drop_columns",
        "rel_schema_rename",
        "stream_store_cdf",
    ):
        q = registry.get(name)
        assert q.export and q.oracle is not None
    # family representatives for the retired rows
    assert {"rel_join_asof", "rel_upsert_rows"} <= w
    assert {"rel_matview_refresh", "rel_matview_hist_quantile",
            "rel_matview_join_refresh", "rel_matview_rollup_route"} <= w
    assert {"search_term_lookup", "search_topk_per_term"} <= w
    assert {"text_decontaminate", "text_incremental_pipeline",
            "text_classifier_train", "text_bpe_merges"} <= w
    assert {"stream_heavy_hitters", "stream_continuous_agg"} <= w
    # the store tier's full r12+r13 external surface
    assert {
        "rel_schema_evolution",
        "rel_schema_rename",
        "rel_drop_columns",
        "rel_partition_evolution",
        "rel_delete_dv",
        "rel_store_sql_travel",
        "rel_store_maintenance",
        "stream_store_cdf",
    } <= w
