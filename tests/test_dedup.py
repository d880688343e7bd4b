"""Dedup-tier queries vs the DuckDB oracle, plus semantic sanity checks."""

from __future__ import annotations

import pytest

from map_reduce_indexing_spark.plans import registry

from .conftest import SF_DIR, assert_df_matches_oracle

ORACLE_QUERIES = [
    "dedup_exact",
    "dedup_exact_kept",
    "dedup_ngram_jaccard",
    "dedup_minhash_estimate",
    "dedup_lsh_recall_eval",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_embedding_pairs",
    "dedup_clusters",
    "dedup_fuzzy_names",
    "dedup_common_passages",
    "dedup_boilerplate_frac",
]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_dedup_query_matches_oracle(spark, duck, name):
    q = registry.get(name)
    assert_df_matches_oracle(q.fn(spark, SF_DIR), duck, q.oracle)


def test_minhash_signatures_match_oracle(spark, duck):
    # sig is a comma-joined string of K permutation minima (scalar,
    # driver-sortable)
    q = registry.get("dedup_minhash_signatures")
    assert_df_matches_oracle(q.fn(spark, SF_DIR), duck, q.oracle)


def test_lsh_pairs_match_oracle(spark, duck):
    q = registry.get("dedup_minhash_lsh_pairs")
    assert_df_matches_oracle(q.fn(spark, SF_DIR), duck, q.oracle)


def test_exact_dedup_finds_injected_dups(spark):
    rows = registry.get("dedup_exact").fn(spark, SF_DIR).collect()
    # the dup-injected corpus copies every doc_id % 3 == 0
    assert all(r.n_copies >= 2 for r in rows)
    assert len(rows) > 0


def test_lsh_recall_against_exact_jaccard(spark):
    """Every high-Jaccard pair should be an LSH candidate (recall check);
    with 4x4 bands at J>=0.8 collision prob is ~1-(1-0.8^4)^4 ~ 0.88,
    and near-identical pairs (J~1) collide with certainty."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in registry.get("dedup_ngram_jaccard").fn(spark, SF_DIR).collect()
        if r.jaccard >= 0.95
    }
    cand = {
        (r.doc_a, r.doc_b)
        for r in registry.get("dedup_minhash_lsh_pairs").fn(spark, SF_DIR).collect()
    }
    assert exact <= cand, f"missed near-identical pairs: {exact - cand}"


def test_clusters_are_consistent_with_pairs(spark):
    """Cluster labels must respect the verified-pair graph: the edge set
    is LSH candidates that pass exact Jaccard, so every Jaccard pair
    that is ALSO an LSH candidate must share a label, and each label is
    the min doc_id of its member set (canonical representative)."""
    jac = {
        (r.doc_a, r.doc_b)
        for r in registry.get("dedup_ngram_jaccard").fn(spark, SF_DIR).collect()
    }
    cand = {
        (r.doc_a, r.doc_b)
        for r in registry.get("dedup_minhash_lsh_pairs").fn(spark, SF_DIR).collect()
    }
    labels = {
        r.doc_id: r.cluster_id
        for r in registry.get("dedup_clusters").fn(spark, SF_DIR).collect()
    }
    verified = jac & cand
    assert len(verified) > 0 and len(labels) > 0
    for a, b in verified:
        assert labels[a] == labels[b]
    # every clustered doc appears in at least one verified edge
    edge_nodes = {d for p in verified for d in p}
    assert set(labels) == edge_nodes
    members: dict[int, list[int]] = {}
    for doc, lab in labels.items():
        members.setdefault(lab, []).append(doc)
    for lab, docs in members.items():
        assert lab == min(docs)


def test_simhash_pairs_plan_has_no_theta_join(spark):
    """The pigeonhole-blocked pair search must compile to equi-keyed
    aggregation only — no nested-loop/cartesian theta join anywhere."""
    df = registry.get("dedup_simhash_pairs").fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_embedding_pairs_plan_has_no_theta_join(spark):
    df = registry.get("dedup_embedding_pairs").fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_simhash_blocking_has_perfect_recall_vs_allpairs(spark):
    """Pigeonhole guarantee: Hamming <= 3 with 4 blocks means at least
    one block matches exactly, so the blocked search must find EVERY
    all-pairs match on a bounded slice (brute force here, in python)."""
    from map_reduce_indexing_spark.operators.dedup import (
        HAMMING_MAX,
        simhash_docs,
    )

    sh = {
        r.doc_id: r.simhash
        for r in simhash_docs(spark, SF_DIR).filter("doc_id < 150").collect()
    }
    ids = sorted(sh)
    want = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sh[a] ^ sh[b]).count("1") <= HAMMING_MAX
    }
    got = {
        (r.doc_a, r.doc_b)
        for r in registry.get("dedup_simhash_pairs").fn(spark, SF_DIR).collect()
        if r.doc_a < 150 and r.doc_b < 150
    }
    assert want <= got
    assert got == want  # slice-restricted: no extras either


def test_embedding_bucket_recall_on_slice(spark):
    """LSH-bucketed near-dup pairs vs exhaustive all-pairs on a bounded
    slice: everything found must be a true pair (precision 1 by the
    exact verify), and recall on the fixture's near-dup pairs must be
    substantial (buckets split some pairs across hyperplanes)."""
    from map_reduce_indexing_spark.operators.dedup import (
        COSINE_THRESHOLD,
        spark_cosine,
    )
    from pyspark.sql import functions as F

    e = (
        registry.get("dedup_embedding_pairs")
        .fn(spark, SF_DIR)
        .filter("vec_a < 300 and vec_b < 300")
    )
    got = {(r.vec_a, r.vec_b) for r in e.collect()}
    ev = (
        spark.read.parquet(SF_DIR + "/embeddings.parquet")
        .filter("vec_id < 300")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )
    a, b = ev.alias("a"), ev.alias("b")
    allp = (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.expr(spark_cosine("a.v", "b.v")).alias("cosine"),
        )
        .filter(F.col("cosine") >= COSINE_THRESHOLD)
    )
    want = {(r.vec_a, r.vec_b) for r in allp.collect()}
    assert got <= want  # precision 1
    if want:
        assert len(got) / len(want) >= 0.5  # recall floor on fixture


def test_star_cc_matches_minlabel_on_fixture(spark, duck):
    """large-star/small-star CC must produce the identical labeling and
    hash-match the same recursive-CTE oracle as min-label."""
    q = registry.get("dedup_clusters_star")
    assert_df_matches_oracle(q.fn(spark, SF_DIR), duck, q.oracle)
    a = {
        (r.doc_id, r.cluster_id)
        for r in registry.get("dedup_clusters").fn(spark, SF_DIR).collect()
    }
    b = {(r.doc_id, r.cluster_id) for r in q.fn(spark, SF_DIR).collect()}
    assert a == b


def test_star_cc_handles_deep_chains(spark):
    """A diameter-400 path would exhaust min-label's 50-round budget;
    the star variant must converge in O(log n) rounds."""
    from pyspark.sql import functions as F

    from map_reduce_indexing_spark.operators.dedup import connected_components_star

    edges = [(i, i + 1) for i in range(400)] + [(500, 501), (501, 502), (500, 502)]
    df = spark.createDataFrame(edges, "src long, dst long")
    sym = df.union(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    out = {r.doc_id: r.cluster_id for r in connected_components_star(sym).collect()}
    assert all(out[i] == 0 for i in range(401))
    assert all(out[i] == 500 for i in (500, 501, 502))


def test_session_signatures_artifact_matches_direct_build(spark):
    """The persisted signature artifact may never drift from the live
    pipeline it snapshots — row-for-row equality including the sig
    arrays — and the cached read is the SAME DataFrame object across
    calls (one build per session, the artifact contract)."""
    from pyspark.sql import functions as F

    from map_reduce_indexing_spark.operators.dedup import (
        minhash_signatures,
        session_signatures,
    )

    art = session_signatures(spark, SF_DIR)
    direct = minhash_signatures(spark, SF_DIR)
    a = art.select("doc_id", F.col("sig").cast("array<long>").alias("sig"))
    d = direct.select("doc_id", F.col("sig").cast("array<long>").alias("sig"))
    assert a.exceptAll(d).unionAll(d.exceptAll(a)).count() == 0
    assert session_signatures(spark, SF_DIR) is art


def test_boilerplate_frac_consistent_with_common_passages(spark):
    """Cross-operator invariant: every doc containing one of the top
    common passages must have boilerplate_frac > 0, fractions live in
    [0,1], and n_common <= n_grams."""
    from pyspark.sql import functions as F

    from map_reduce_indexing_spark.operators.dedup import _passage_grams

    frac = {r.doc_id: r for r in registry.get("dedup_boilerplate_frac").fn(spark, SF_DIR).collect()}
    assert frac
    for r in frac.values():
        assert 0 <= r.n_common <= r.n_grams
        assert 0.0 <= r.boilerplate_frac <= 1.0
    top = registry.get("dedup_common_passages").fn(spark, SF_DIR)
    docs_with_top = (
        _passage_grams(spark, SF_DIR)
        .join(top.select(F.col("passage").alias("g")), "g", "left_semi")
        .select("doc_id").distinct().collect()
    )
    assert docs_with_top
    for row in docs_with_top:
        assert frac[row.doc_id].n_common > 0


def test_prefix_filtered_jaccard_is_lossless_and_prunes(spark):
    """The prefix-filter theorem in practice: the blocked plan's output
    equals the exhaustive quadratic query's exactly (pair set AND
    jaccard values), while generating strictly fewer candidate pairs
    than the all-shared-shingles join."""
    from pyspark.sql import functions as F

    from map_reduce_indexing_spark.operators.dedup import shingle_rows

    from map_reduce_indexing_spark.operators.dedup import JACCARD_PREFIX_T

    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in registry.get("dedup_jaccard_prefix_pairs")
        .fn(spark, SF_DIR)
        .collect()
    }
    # ground truth: the exhaustive quadratic query (t=0.3 calibration
    # form) restricted to the prefix operator's production threshold —
    # same intersection arithmetic, so values compare exactly
    want = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in registry.get("dedup_ngram_jaccard").fn(spark, SF_DIR).collect()
        if r.jaccard >= JACCARD_PREFIX_T
    }
    assert got == want  # lossless: identical pairs, identical values
    assert want  # non-vacuous on the fixture

    # pruning really bites: prefix candidates << all-shared-shingle pairs
    rows = shingle_rows(spark, SF_DIR)
    e = rows.select("doc_id", F.col("s").alias("sh"))
    a, b = e.alias("a"), e.alias("b")
    all_pairs = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id"), F.col("b.doc_id"))
        .distinct()
        .count()
    )
    # recompute the operator's candidate set size via its own plan
    # fragment: prefix join + length filter
    from map_reduce_indexing_spark.operators.dedup import _JAC_DEN, _JAC_NUM
    from pyspark.sql import Window

    dfreq = rows.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id")
    ranked = rows.join(dfreq, "s").select(
        "doc_id",
        F.col("s").alias("sh"),
        F.row_number().over(w.orderBy("df", "s")).alias("rk"),
        F.count(F.lit(1)).over(w).alias("n_sh"),
    )
    plen = (
        F.col("n_sh")
        - F.floor((_JAC_NUM * F.col("n_sh") + (_JAC_DEN - 1)) / _JAC_DEN)
        + 1
    )
    prefix = ranked.filter(F.col("rk") <= plen)
    pa, pb = prefix.alias("a"), prefix.alias("b")
    cand = (
        pa.join(
            pb,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                _JAC_NUM * F.greatest(F.col("a.n_sh"), F.col("b.n_sh"))
                <= _JAC_DEN * F.least(F.col("a.n_sh"), F.col("b.n_sh"))
            ),
        )
        .select(F.col("a.doc_id"), F.col("b.doc_id"))
        .distinct()
        .count()
    )
    assert set(want) and cand < all_pairs  # the filter prunes
    assert cand >= len(want)  # ...but never below the true pair count


def test_cluster_keep_best_picks_the_max_quality_member(spark):
    """Composition consistency: one keeper per cluster, the keeper is a
    member, and its stopword ratio is the cluster max (ties -> lowest
    doc_id), checked against an independent driver-side recompute."""
    clusters = {}
    for r in registry.get("dedup_clusters").fn(spark, SF_DIR).collect():
        clusters.setdefault(r.cluster_id, []).append(r.doc_id)
    scores = {
        r.doc_id: r.stopword_ratio
        for r in registry.get("text_quality").fn(spark, SF_DIR).collect()
    }
    kept = {
        r.cluster_id: r
        for r in registry.get("dedup_cluster_keep_best")
        .fn(spark, SF_DIR)
        .collect()
    }
    assert set(kept) == set(clusters)
    for cid, members in clusters.items():
        r = kept[cid]
        assert r.n_members == len(members)
        best = min(members, key=lambda d: (-scores[d], d))
        assert r.keep_doc == best
        assert abs(r.keep_stopword_ratio - round(scores[best], 9)) < 1e-12


def test_prefix_filter_completeness_property():
    """The prefix-filter theorem under fuzz, no Spark: on random small
    shingle universes, EVERY pair with J >= t must share a token in
    both docs' (df-asc, token-asc)-ordered prefixes of length
    n - ceil(t*n) + 1 AND pass the length-ratio filter — the exact
    candidate rule the operator compiles. Catches off-by-ones in the
    integer prefix arithmetic that the fixture's few pairs might
    never exercise."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from map_reduce_indexing_spark.operators.dedup import _JAC_DEN, _JAC_NUM

    t = _JAC_NUM / _JAC_DEN

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(
            st.frozensets(st.integers(0, 25), min_size=1, max_size=14),
            min_size=2,
            max_size=9,
        )
    )
    def run(sets):
        docs = {i: s for i, s in enumerate(sets)}
        df = {}
        for s in docs.values():
            for tok in s:
                df[tok] = df.get(tok, 0) + 1
        order = {d: sorted(s, key=lambda x: (df[x], x)) for d, s in docs.items()}

        def plen(n):
            return n - (_JAC_NUM * n + (_JAC_DEN - 1)) // _JAC_DEN + 1

        prefix = {d: set(o[: plen(len(o))]) for d, o in order.items()}
        for a in docs:
            for b in docs:
                if a >= b:
                    continue
                i = len(docs[a] & docs[b])
                na, nb = len(docs[a]), len(docs[b])
                if i / (na + nb - i) >= t:
                    # candidate rule must fire for every true pair
                    assert _JAC_NUM * max(na, nb) <= _JAC_DEN * min(na, nb)
                    assert prefix[a] & prefix[b], (
                        docs[a],
                        docs[b],
                        order,
                    )

    run()


def test_incremental_lsh_equals_full_restricted_to_delta(spark):
    """The incremental path (delta signatures vs corpus artifact) finds
    exactly the pairs the batch introduced: the full from-scratch band
    join's pairs restricted to delta-touching ones. Also pins that the
    store span really is the append fast path (the diff scans only the
    appended files, not the corpus)."""
    from map_reduce_indexing_spark.operators.dedup import (
        _INCR_DELTA_MOD,
        _INCR_DELTA_REM,
        documents_incremental_store,
        lsh_candidate_pairs,
        q_dedup_incremental_lsh_pairs,
        session_signatures,
    )
    from map_reduce_indexing_spark.sources.generations import diff_plan

    sf = "/root/testdata/sf0.001"
    incr = {
        (r.doc_a, r.doc_b)
        for r in q_dedup_incremental_lsh_pairs(spark, sf).collect()
    }
    full = lsh_candidate_pairs(session_signatures(spark, sf)).collect()
    is_delta = lambda d: d % _INCR_DELTA_MOD == _INCR_DELTA_REM
    expected = {
        (r.doc_a, r.doc_b) for r in full if is_delta(r.doc_a) or is_delta(r.doc_b)
    }
    assert incr == expected and incr

    kind, rels = diff_plan(documents_incremental_store(spark, sf), 1, 2)
    assert kind == "append" and len(rels) == 1
