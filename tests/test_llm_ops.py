"""Similarity, text-analysis, and multimodal tiers vs the DuckDB oracle."""

from __future__ import annotations

import pytest

from map_reduce_indexing_spark.operators.multimodal import decode_ppm
from map_reduce_indexing_spark.plans import registry

from .conftest import SF_DIR, assert_df_matches_oracle

ORACLE_QUERIES = [
    "ann_knn_bruteforce",
    "ann_knn_batch_numpy",
    "ann_lsh_bucket_histogram",
    "ann_lsh_topk",
    "ann_lsh_multiprobe",
    "ann_ivf_cells",
    "ann_ivf_topk",
    "ann_ivf_topk_nprobe",
    "ann_recall_eval",
    "ann_pq_codes",
    "ann_ivf_pq_topk",
    "ann_pq_recall_eval",
    "text_quality",
    "text_quality_filter",
    "text_langid",
    "text_langid_eval",
    "text_token_counts",
    "text_train_val_test_split",
    "text_pii_redact",
    "text_repetition",
    "text_lm_score",
    "text_lm_score_kn",
    "text_lm_resample",
    "text_decontaminate",
    "text_sample_mixture",
    "text_pack_sequences",
    "text_pmi_cooccurrence",
    "text_pmi_windowed",
    "multimodal_image_meta",
    "multimodal_audio_meta",
    "multimodal_frame_sample",
    "multimodal_corpus_bytes",
    "multimodal_resize",
]


def test_pmi_windowed_pair_generation_is_linear(spark):
    """The scale fix the windowed form exists for: a long document with
    an all-distinct vocabulary generates O(tokens * K) pairs — the
    doc-level comprehension would generate tokens*(tokens-1)/2. The
    per-row array size IS the per-task work, so this bounds what any
    single task materializes for a book-length doc."""
    import itertools

    from pyspark.sql import functions as F

    from map_reduce_indexing_spark.operators.dedup import spark_tokens_expr
    from map_reduce_indexing_spark.operators.textstats import (
        PMI_WINDOW_K,
        windowed_pair_expr,
    )

    n = 10_000
    vocab = [
        "".join(t)
        for t in itertools.islice(
            itertools.product("abcdefghijklmnopqrstuvwxyz", repeat=3), n
        )
    ]
    df = spark.createDataFrame(
        [(1, " ".join(vocab))], "doc_id long, text string"
    )
    n_pairs = (
        df.select(F.expr(spark_tokens_expr("text")).alias("ws"))
        .select(F.size(F.expr(windowed_pair_expr())).alias("n"))
        .head()
        .n
    )
    expected = sum(min(PMI_WINDOW_K, n - 1 - i) for i in range(n))
    assert n_pairs == expected
    assert n_pairs <= n * PMI_WINDOW_K
    assert n_pairs < n * (n - 1) // 2 // 100  # >100x below quadratic


def test_pmi_windowed_plan_has_no_recomputed_totals(spark):
    """r14 end-state shape: ZERO corpus scans (r6 had 4 pinned
    tokenizing corpus scans), and the corpus-sized pair explode runs
    ONCE, at checkpoint time — the grouped pair table is materialized
    and feeds both the PMI join and the n_pairs total (SUM(d_pair)
    over the groups is exactly the old per-row array-sizing sum,
    without building every row's pair array a second time; AQE stage
    reuse verifiably does NOT fire across those consumers, so the
    checkpoint is what guarantees the single pass). Pin: 0 corpus
    scans, exactly ONE tokens-artifact scan left in the final plan
    (the lightweight n_tokens sizing read), 2 lm_counts scans (one per
    join side), ZERO explodes in the final plan (it ran at checkpoint
    time — the pair table enters as the materialized RDD), no
    tokenizer regex."""
    df = registry.get("text_pmi_windowed").fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("documents.parquet") == 0, plan
    assert plan.count("mri_session_tokens") == 1, plan
    assert plan.count("mri_session_lm_counts") == 2, plan
    assert plan.count("Generate explode") == 0, plan
    assert "ExistingRDD" in plan, plan  # the checkpointed pair table
    assert "regexp_replace" not in plan, plan


def test_text_family_plans_scan_artifact_not_corpus(spark):
    """The r7 artifact-discipline gate for the whole text family: no
    registered text_* query may re-tokenize the corpus — its executed
    plan must be free of the tokenizer's regexp_replace and of any
    `text`-column read. The deliberate exceptions scan raw
    text/metadata by design: pii_redact (rewrites raw text),
    train_val_test_split and sample_mixture (metadata-only), and
    shuffle_shards (metadata-only: doc_id + n_chars — it stays in the
    checked set because it never tokenizes, so the gate holds)."""
    from map_reduce_indexing_spark.plans.registry import _REGISTRY, _ensure_loaded

    _ensure_loaded()
    exempt = {"text_pii_redact", "text_train_val_test_split", "text_sample_mixture"}
    checked = []
    for name, q in _REGISTRY.items():
        if not name.startswith("text_") or name in exempt:
            continue
        plan = q.fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "regexp_replace" not in plan, f"{name} re-tokenizes: {plan[:2000]}"
        checked.append(name)
    assert len(checked) >= 10  # the family is actually covered


def test_multimodal_embed_matches_oracle(spark, duck):
    # emb is a comma-joined DECIMAL(24,10) string (scalar, driver-sortable)
    q = registry.get("multimodal_embed")
    assert_df_matches_oracle(q.fn(spark, SF_DIR), duck, q.oracle)
    sample = q.fn(spark, SF_DIR).head()
    assert len(sample.emb.split(",")) == 16


def test_embed_derives_from_decoded_pixels(spark):
    """VERDICT r5 #3: the embedding must be a function of the DECODED
    PIXELS, not header arithmetic. Two docs with the same doc_id share
    identical PPM headers (w, h derive from doc_id alone) but different
    pixel payloads (pixels derive from md5(text)) — their vectors must
    differ."""
    from map_reduce_indexing_spark.operators.multimodal import (
        embed_blobs,
        with_ppm_blob,
    )

    def emb_of(text):
        df = spark.createDataFrame([(5, text)], "doc_id long, text string")
        return embed_blobs(
            with_ppm_blob(df).select("doc_id", "blob")
        ).head().emb

    assert emb_of("hello world") != emb_of("different text")


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_llm_query_matches_oracle(spark, duck, name):
    q = registry.get(name)
    assert_df_matches_oracle(q.fn(spark, SF_DIR), duck, q.oracle)


def test_fingerprint_matches_oracle(spark, duck):
    # fp is a space-joined min-k md5 string (scalar, driver-sortable)
    q = registry.get("text_fingerprint")
    assert_df_matches_oracle(q.fn(spark, SF_DIR), duck, q.oracle)


def test_lsh_topk_is_subset_of_bruteforce_space(spark):
    """LSH returns true neighbors from its bucket: its cosines must all
    appear in the brute-force ranking's value set for those ids."""
    brute = {
        r.vec_id: r.cosine
        for r in registry.get("ann_knn_bruteforce").fn(spark, SF_DIR).collect()
    }
    lsh = registry.get("ann_lsh_topk").fn(spark, SF_DIR).collect()
    assert len(lsh) > 0
    for r in lsh:
        if r.vec_id in brute:
            assert abs(brute[r.vec_id] - r.cosine) < 1e-12


def test_knn_batch_numpy_matches_sql(spark):
    """The applyInPandas/numpy batch-KNN path must reproduce the SQL
    brute-force top-k for the shared query vector: the final ranking is
    by the exact left-to-right fold, so cosines match bit-for-bit, and
    the per-row boolean certifies BLAS agreed within 1e-9."""
    brute = registry.get("ann_knn_bruteforce").fn(spark, SF_DIR).collect()
    batch = registry.get("ann_knn_batch_numpy").fn(spark, SF_DIR).collect()
    q0 = sorted((r for r in batch if r.q_id == 0), key=lambda r: r.rn)
    assert [r.vec_id for r in q0] == [r.vec_id for r in brute]
    for got, want in zip(q0, brute):
        assert got.cosine == want.cosine  # identical fold -> bit-exact
    assert all(r.blas_within_1e9 for r in batch)
    # every query id produced a full top-k
    qids = {r.q_id for r in batch}
    assert len(qids) == 8
    for q in qids:
        assert sum(1 for r in batch if r.q_id == q) == 10


def test_decode_ppm_parses_and_rejects(spark):
    """The numpy PPM decoder is a real parser: known bytes decode to the
    exact pixel array (including payload bytes that equal 0x0A), and
    malformed inputs are rejected, not silently passed through."""
    import numpy as np

    payload = bytes([0, 10, 255, 10, 10, 10])  # newline bytes inside pixels
    data = b"P6\n2 1\n255\n" + payload
    arr = decode_ppm(data)
    assert arr.shape == (1, 2, 3)
    assert arr.tobytes() == payload
    assert int(arr.sum()) == sum(payload)

    with pytest.raises(ValueError):
        decode_ppm(b"\x89PNG....")  # wrong magic
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 1\n255\n\x00\x01")  # truncated payload
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 1\n15\n" + payload)  # unsupported maxval


def test_real_decode_roundtrip(spark):
    """Genuine decode through the Arrow mapInPandas plumbing: hand-built
    P6 PPMs of known dimensions and pixel content, decoded distributed;
    dimensions come from the parsed header, px_sum from the pixels."""
    from map_reduce_indexing_spark.operators.multimodal import extract_image_meta

    rows = []
    for doc_id, (w, h) in enumerate([(3, 5), (17, 11), (64, 2)]):
        px = bytes((doc_id + i) % 256 for i in range(w * h * 3))
        data = f"P6\n{w} {h}\n255\n".encode() + px
        rows.append((doc_id, bytearray(data), w, h, sum(px)))
    df = spark.createDataFrame(
        [(d, b) for d, b, _, _, _ in rows], "doc_id long, blob binary"
    )
    got = {
        r.doc_id: (r.width, r.height, r.magic, r.px_sum)
        for r in extract_image_meta(df).collect()
    }
    for d, _, w, h, s in rows:
        assert got[d] == (w, h, "P6", s)


def test_pii_regexes_on_crafted_text(spark):
    """The portable EMAIL/IPV4 regexes must hit known PII and leave
    clean text alone (guards against a shared-bug passing the oracle)."""
    from pyspark.sql import functions as F

    from map_reduce_indexing_spark.operators.textstats import EMAIL_RE, IPV4_RE

    rows = [
        ("mail me at a.b-c_1@sub.example.org now", 1, 0),
        ("two: x@y.com and z.z@w.io plus 1.2.3.4 and 10.0.0.255", 2, 2),
        ("no pii here just words", 0, 0),
        ("version 1.2 is not an ip, 1.2.3 neither", 0, 0),
    ]
    df = spark.createDataFrame([(t,) for t, _, _ in rows], "text string").select(
        F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), 0)).alias("e"),
        F.size(F.regexp_extract_all("text", F.lit(IPV4_RE), 0)).alias("i"),
        F.regexp_replace(
            F.regexp_replace("text", EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
        ).alias("clean"),
    )
    got = df.collect()
    for (text, n_e, n_i), r in zip(rows, got):
        assert (r.e, r.i) == (n_e, n_i), text
        if n_e or n_i:
            assert "@" not in r.clean
        else:
            assert r.clean == text


def test_repetition_is_map_only(spark):
    """text_repetition never shuffles: a doc's grams live in one
    artifact row, so the per-doc occurrence stats are a per-row
    sorted-run-length scan — the plan must show zero Exchange and zero
    Generate (no explode), and each gram comprehension must be sorted
    ONCE (CollapseProject declining to inline the non-cheap array into
    the run-length aggregate's many references)."""
    plan = (
        registry.get("text_repetition")
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "Generate" not in plan, plan
    assert plan.count("array_sort") == 2, plan


def test_fingerprint_is_map_only(spark):
    """text_fingerprint is a per-row reshape of the artifact's token
    array (hash distinct shingles, sort, slice): zero Exchange, zero
    Generate — the explode + collect_set form shuffled every doc's
    md5 set."""
    plan = (
        registry.get("text_fingerprint")
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "Generate" not in plan, plan


def test_run_stats_expr_matches_bruteforce(spark):
    """The run-length accumulator against a brute-force python count
    model on adversarial arrays (empty, singleton, all-equal, all
    distinct, runs at both ends)."""
    from collections import Counter

    from pyspark.sql import functions as F

    from map_reduce_indexing_spark.operators.textstats import _run_stats_expr

    cases = [
        [],
        ["a"],
        ["a", "a"],
        ["a", "b"],
        ["a"] * 7,
        ["a", "a", "b", "c", "c", "c"],
        ["x", "y", "y", "z"],
        list("abcdef"),
        ["m", "m", "n", "n"],
    ]
    df = spark.createDataFrame(
        [(i, sorted(c)) for i, c in enumerate(cases)], "i int, a array<string>"
    ).select("i", F.expr(_run_stats_expr("a")).alias("s"))
    got = {r.i: (r.s.maxr, r.s.dup) for r in df.collect()}
    for i, c in enumerate(cases):
        counts = Counter(c)
        maxr = max(counts.values()) if counts else 0
        dup = sum(v for v in counts.values() if v > 1)
        assert got[i] == (maxr, dup), (c, got[i], (maxr, dup))


def test_repetition_signals_bounds_and_extremes(spark):
    """Repetition fractions are in [0,1]; the fixture's synthetic docs
    (small vocab) must show real trigram repetition somewhere."""
    rows = registry.get("text_repetition").fn(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r.top_bigram_frac <= 1.0
        assert 0.0 <= r.dup_trigram_frac <= 1.0
    assert any(r.dup_trigram_frac > 0 for r in rows)


def test_decontaminate_flags_only_train_docs(spark):
    """Every flagged doc must be in the train split (bucket < 80) and
    overlap counts must be positive."""
    from pyspark.sql import functions as F

    out = registry.get("text_decontaminate").fn(spark, SF_DIR)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    )
    rows = out.withColumn("bucket", bucket).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.bucket < 80
        assert r.n_shared_shingles >= 1
        assert r.n_eval_docs >= 1


def test_pack_sequences_is_gapless_per_source(spark):
    """Packing invariant: within each source, offsets reconstruct the
    exclusive running sum exactly — pack_id*budget + start_offset is
    non-decreasing with no gaps (sum of earlier docs' tokens)."""
    from map_reduce_indexing_spark.operators.textstats import PACK_BUDGET

    rows = registry.get("text_pack_sequences").fn(spark, SF_DIR).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    assert len(by_src) > 1
    for src, docs in by_src.items():
        docs.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in docs:
            assert r.pack_id * PACK_BUDGET + r.start_offset == cum, (src, r)
            assert r.spans_boundary == (r.start_offset + r.n_tokens > PACK_BUDGET)
            cum += r.n_tokens


def test_sample_mixture_rates_are_respected(spark):
    """Sampled fraction must track the per-source rate (exact membership
    is hash-determined; with 25+ docs/source a 3x departure from the
    rate would indicate a broken bucket computation)."""
    rows = registry.get("text_sample_mixture").fn(spark, SF_DIR).collect()
    assert len(rows) >= 2
    seen_rates = set()
    for r in rows:
        assert 0 <= r.n_sampled <= r.n_docs
        seen_rates.add(r.rate_bps)
    assert len(seen_rates) == 5  # all five mixture weights exercised


def test_probe_strategies_never_lose_recall(spark):
    """Multi-probe LSH and nprobe=2 IVF search supersets of their
    single-probe variants' candidate sets, so their overlap with the
    brute-force top-10 cannot be smaller."""
    brute = {r.vec_id for r in registry.get("ann_knn_bruteforce").fn(spark, SF_DIR).collect()}

    def top(name):
        return {r.vec_id for r in registry.get(name).fn(spark, SF_DIR).collect()}

    assert len(top("ann_lsh_multiprobe") & brute) >= len(top("ann_lsh_topk") & brute)
    assert len(top("ann_ivf_topk_nprobe") & brute) >= len(top("ann_ivf_topk") & brute)


def test_lm_counts_artifact_matches_live_aggregation(spark):
    """The persisted LM model (session_lm_counts) equals a live
    re-aggregation of the gram stream for both k slices, and the k=1
    row count equals the countDistinct vocabulary size text_lm_score's
    smoothing divides by."""
    from pyspark.sql import functions as F

    from map_reduce_indexing_spark.operators.textstats import (
        _gram_occurrences,
        lm_counts,
    )
    from map_reduce_indexing_spark.operators.tokens import token_rows

    model = lm_counts(spark, SF_DIR)
    live_ug = (
        token_rows(spark, SF_DIR, out_col="g").groupBy("g").count()
    ).select("g", F.col("count").cast("long").alias("c"))
    live_bg = (
        _gram_occurrences(spark, SF_DIR, 2).groupBy("g").count()
    ).select("g", F.col("count").cast("long").alias("c"))
    for k, live in ((1, live_ug), (2, live_bg)):
        art = model.filter(F.col("k") == k).select(
            "g", F.col("c").cast("long").alias("c")
        )
        assert art.exceptAll(live).unionAll(live.exceptAll(art)).count() == 0, k
    v_art = model.filter(F.col("k") == 1).count()
    v_live = token_rows(spark, SF_DIR, out_col="w").select("w").distinct().count()
    assert v_art == v_live


def test_fingerprint_skips_short_docs(spark, tmp_path):
    """Docs with fewer than SHINGLE_K tokens have no shingles and must
    be ABSENT from the fingerprint output (the oracle's len(toks) >= 3
    filter) — not present with a colliding empty-string fingerprint."""
    from map_reduce_indexing_spark.operators.textstats import q_text_fingerprint

    d = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(1, "hello world"), (2, "a b c d e"), (3, "")],
        "doc_id long, text string",
    ).write.parquet(d + "/documents.parquet")
    rows = q_text_fingerprint(spark, d).collect()
    assert [(r.doc_id, r.fp != "") for r in rows] == [(2, True)]


def test_run_stats_expr_hypothesis_random_arrays(spark):
    """Property form of the brute-force check: random small-alphabet
    lists (maximizing run/tie structure) through the Spark fold vs a
    Counter model — one batched Spark job over all drawn cases."""
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    import hypothesis.strategies as st
    from pyspark.sql import functions as F

    from map_reduce_indexing_spark.operators.textstats import _run_stats_expr

    drawn: list[list[str]] = []

    @settings(
        max_examples=60,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(st.lists(st.sampled_from("abc"), max_size=12))
    def draw(xs):
        drawn.append(list(xs))

    draw()
    df = spark.createDataFrame(
        [(i, sorted(c)) for i, c in enumerate(drawn)], "i int, a array<string>"
    ).select("i", F.expr(_run_stats_expr("a")).alias("s"))
    got = {r.i: (r.s.maxr, r.s.dup) for r in df.collect()}
    for i, c in enumerate(drawn):
        counts = Counter(c)
        maxr = max(counts.values()) if counts else 0
        dup = sum(v for v in counts.values() if v > 1)
        assert got[i] == (maxr, dup), (c, got[i], (maxr, dup))


def test_lm_score_pruned_broadcasts_the_model(spark):
    """The serving-path contract the full scorer's docstring promises:
    every scoring join against the pruned model must be broadcast-hash
    — no sort-merge/shuffle join of the doc gram stream anywhere in
    the executed plan — and the output must be sane (scored docs are a
    subset of the full scorer's, counts positive, logp negative)."""
    q = registry.get("text_lm_score_pruned")
    df = q.fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    rows = df.collect()
    assert rows
    full_docs = {
        r.doc_id for r in registry.get("text_lm_score").fn(spark, SF_DIR).collect()
    }
    for r in rows:
        assert r.doc_id in full_docs
        assert r.n_scored >= 1
        assert r.avg_logp < 0.0


def test_shuffle_shards_permutation_is_seedstable_and_complete(spark):
    """Every doc lands in exactly one shard; the permutation checksum
    matches an independent Python md5 model (portable-hash contract),
    and the plan is one exchange with the aggregation riding the
    window's shard partitioning (no second shuffle, no Generate)."""
    import hashlib

    from map_reduce_indexing_spark.operators.textstats import (
        _CKSUM_P,
        N_SHARDS,
        SHUFFLE_SEED,
        q_text_shuffle_shards,
    )

    df = q_text_shuffle_shards(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "Generate" not in plan

    import duckdb

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, n_chars FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    con.close()
    shards: dict[int, list] = {}
    for doc_id, n_chars in docs:
        h = hashlib.md5(f"{doc_id}:{SHUFFLE_SEED}".encode()).hexdigest()
        shards.setdefault(int(h[:8], 16) % N_SHARDS, []).append(
            (h, doc_id, n_chars)
        )
    want = {}
    for sid, rows in shards.items():
        rows.sort()
        cks = 0
        for rn, (_, doc_id, _) in enumerate(rows, start=1):
            cks = (cks + (rn * doc_id) % _CKSUM_P) % _CKSUM_P
        want[sid] = (
            len(rows),
            sum(nc for _, _, nc in rows),
            cks,
            rows[0][1],
        )
    got = {
        r.shard_id: (r.n_docs, r.total_chars, r.order_checksum, r.first_doc_id)
        for r in df.collect()
    }
    assert got == want
    assert sum(v[0] for v in got.values()) == len(docs)  # a partition


def test_lm_score_kn_semantics(spark):
    """KN sanity on the fixture: every score is a negative avg log
    probability, the doc set equals the add-one scorer's (same bigram
    stream), and the two smoothers actually DISAGREE on values (the
    continuation term is doing something)."""
    kn = registry.get("text_lm_score_kn").fn(spark, SF_DIR).collect()
    assert kn and all(r["avg_logp_kn"] < 0 for r in kn)
    addone = {
        r["doc_id"]: r["avg_logp"]
        for r in registry.get("text_lm_score").fn(spark, SF_DIR).collect()
    }
    assert {r["doc_id"] for r in kn} == set(addone)
    n_bigrams = {r["doc_id"]: r["n_bigrams"] for r in kn}
    assert any(r["avg_logp_kn"] != addone[r["doc_id"]] for r in kn)
    # same bigram accounting as the add-one scorer
    ao_counts = {
        r["doc_id"]: r["n_bigrams"]
        for r in registry.get("text_lm_score").fn(spark, SF_DIR).collect()
    }
    assert n_bigrams == ao_counts


def test_lm_resample_stratification_invariants(spark):
    """The per-decile contract: the strata cover every scored doc
    exactly once; the top decile's keep-rate is exactly 100% (hex8 %
    100 < 100 always); keep counts never exceed stratum size; strata
    are score-ordered (percentile-cutpoint range lookup), so ranges
    are non-overlapping up to boundary ties."""
    rows = sorted(
        registry.get("text_lm_resample").fn(spark, SF_DIR).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    scored_docs = registry.get("text_lm_score").fn(spark, SF_DIR).count()
    assert sum(r["n_docs"] for r in rows) == scored_docs
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_docs"]
        assert r["lo_score"] <= r["hi_score"]
    assert rows[-1]["n_kept"] == rows[-1]["n_docs"]  # decile 10 keeps all
    for a, b in zip(rows, rows[1:]):
        assert a["hi_score"] <= b["lo_score"]  # score-ordered strata
    # lower strata keep strictly less than everything on the fixture
    assert rows[0]["n_kept"] < rows[0]["n_docs"]
    # cutpoint strata are near-equal-sized on a near-unique score
    # distribution: every stratum within ±2 of the NTILE ideal
    ideal = scored_docs / 10
    assert all(abs(r["n_docs"] - ideal) <= 2 for r in rows)


def test_lm_resample_plan_has_no_global_window(spark):
    """The r9 scale fix, pinned: the exported resampler assigns
    deciles via broadcast percentile cutpoints + a map-only range
    lookup — the plan must contain NO Window operator and no global
    sort (the old NTILE form's single-partition total order now lives
    only in the pytest-only text_lm_resample_ntile pin, which keeps
    exactly that shape)."""
    plan = (
        registry.get("text_lm_resample")
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # NB: can't grep for "ntile" — "percentile" contains it; absence
    # of any Window operator already rules the window function out.
    assert "Window" not in plan
    ntile_plan = (
        registry.get("text_lm_resample_ntile")
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in ntile_plan  # the pin keeps the contract shape
