"""PageRank operator (operators/graph.py): semantics vs a pure-Python
power iteration (including the dangling-node mass term the fixture's
trade graph never exercises — every nation has out-edges there), rank
conservation, and the iteration's plan discipline."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

from map_reduce_indexing_spark.operators.graph import (
    PR_DAMPING,
    pagerank,
    trade_edges,
)
from map_reduce_indexing_spark.plans import registry
from tests.conftest import SF_DIR

# a -> b -> c, c dangling; a also links c directly
TOY_EDGES = [("a", "b", 3), ("a", "c", 1), ("b", "c", 2)]
TOY_NODES = ["a", "b", "c"]


def _py_pagerank(nodes, edges, rounds, d=PR_DAMPING):
    """Reference implementation mirroring the engine contract: per-edge
    terms quantized to 12 dp (the DECIMAL(28,12) cast), exact decimal
    sums, 12-dp round per round."""
    q = Decimal("1e-12")

    def dec(x):
        return Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP)

    wout = {}
    for s, _t, w in edges:
        wout[s] = wout.get(s, 0) + w
    n = float(len(nodes))
    r = {v: 1.0 / n for v in nodes}
    for _ in range(rounds):
        s = {v: Decimal(0) for v in nodes}
        for src, dst, w in edges:
            s[dst] += dec(r[src] * (w / wout[src]))
        dm = sum((dec(r[v]) for v in nodes if v not in wout), Decimal(0))
        r = {
            v: float(
                Decimal(
                    repr((1.0 - d) / n + d * (float(dm) / n) + d * float(s[v]))
                ).quantize(q, rounding=ROUND_HALF_UP)
            )
            for v in nodes
        }
    return r


@pytest.mark.parametrize("rounds", [1, 4])
def test_pagerank_matches_reference_with_dangling_mass(spark, rounds):
    edges = spark.createDataFrame(TOY_EDGES, "src string, dst string, w long")
    nodes = spark.createDataFrame([(v,) for v in TOY_NODES], "node string")
    got = {
        r["node"]: r["r"]
        for r in pagerank(nodes, edges, rounds=rounds).collect()
    }
    want = _py_pagerank(TOY_NODES, TOY_EDGES, rounds)
    assert set(got) == set(want)
    for v in TOY_NODES:
        assert got[v] == pytest.approx(want[v], abs=1e-9), (v, got, want)
    # dangling mass really moved: c has no out-edges yet total rank
    # stays ~1 (the stochastic-matrix fix), and a (never linked to)
    # keeps only the teleport + dangling share
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)
    assert got["c"] == max(got.values())


def test_pagerank_total_mass_conserved_on_trade_graph(spark):
    edges = trade_edges(spark, SF_DIR)
    nodes = (
        edges.select("src").union(edges.select("dst")).distinct()
        .select(F.col("src").alias("node"))
    )
    ranks = pagerank(nodes, edges, rounds=3)
    total = ranks.agg(F.sum("r")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-6)
    assert ranks.filter(F.col("r") <= 0).count() == 0


def test_pagerank_iteration_plan_discipline(spark):
    """The trade graph has no dangling nodes, so the loop takes the
    single-reference lazy shape: ONE plan holding all 6 rounds as a
    LINEAR join-agg chain over the checkpointed edge table (Scan
    ExistingRDD leaves — without the edge checkpoint each round would
    re-embed the 5-join lineitem pipeline). Since r14 the graph
    scalars (N, danglingness) come from one bounded probe job and ride
    as driver literals, so NO per-round 1-row broadcast remains: zero
    BroadcastNestedLoopJoins, and nothing degenerates to a cartesian
    product."""
    q = registry.get("rel_pagerank_trade")
    df = q.fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert plan.count("Scan ExistingRDD") >= 1, plan  # checkpointed edges
    assert "lineitem" not in plan, plan  # edge derivation ran ONCE, before
    # scalars are literals since r14: no 1-row nested-loop broadcasts
    assert plan.count("BroadcastNestedLoopJoin") == 0, plan


def test_pagerank_dangling_path_checkpoints_per_round(spark):
    """With dangling nodes the rank vector is referenced twice per
    round; the loop must materialize per round (the final plan reads
    the PREVIOUS round's ranks as a checkpoint scan, keeping plan size
    constant in round count) and carry the dangling-mass broadcast."""
    edges = spark.createDataFrame(TOY_EDGES, "src string, dst string, w long")
    nodes = spark.createDataFrame([(v,) for v in TOY_NODES], "node string")
    df = pagerank(nodes, edges, rounds=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    # exactly the FINAL round is visible: its dangling-mass broadcast
    # (the N scalar is a driver literal since r14)
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan


def test_registered_trade_pagerank_is_deterministic(spark):
    q = registry.get("rel_pagerank_trade")
    a = {(r["node"], r["rank"]) for r in q.fn(spark, SF_DIR).collect()}
    b = {(r["node"], r["rank"]) for r in q.fn(spark, SF_DIR).collect()}
    assert a == b
    assert len(a) == 25  # every nation participates at this SF


# ---------------------------------------------------------------------------
# Triangle counting (rel_triangles_trade)
# ---------------------------------------------------------------------------


def test_triangles_match_pure_python_reference(spark):
    """Per-node triangle counts vs an independent set-based Python
    count over the same collected edge set — proves the degree-ordered
    orientation enumerates every triangle exactly once (no double
    count, no miss)."""
    und = {
        (min(r.src, r.dst), max(r.src, r.dst))
        for r in trade_edges(spark, SF_DIR).collect()
        if r.src != r.dst
    }
    adj: dict[str, set[str]] = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want_t = {node: 0 for node in adj}
    for u, v in und:
        for w in adj[u] & adj[v]:
            # each triangle seen via all 3 edges -> /... count per node:
            # edge (u,v) + common neighbor w increments w's count once,
            # and each of a triangle's nodes is "the common neighbor"
            # for exactly one of its edges.
            want_t[w] += 1
    got = {
        r.node: (r.degree, r.triangles, r.clustering)
        for r in registry.get("rel_triangles_trade").fn(spark, SF_DIR).collect()
    }
    assert set(got) == set(adj)
    for node, (degree, triangles, clustering) in got.items():
        assert degree == len(adj[node])
        assert triangles == want_t[node]
        if degree > 1:
            expect = round(2.0 * triangles / (degree * (degree - 1.0)), 9)
            assert abs(clustering - expect) < 1e-12
            assert 0.0 <= clustering <= 1.0
        else:
            assert clustering == 0.0


def test_triangles_plan_has_no_cartesian(spark):
    df = registry.get("rel_triangles_trade").fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_triangles_wedge_join_evaluates_once(spark):
    """r15: the per-node triangle counts aggregate explode([x, y, z])
    over ONE evaluation of the wedge/closure join — the prior
    union-of-three-projections form re-executed the two-join closure
    subtree once per branch (6 inner joins in the plan instead of 2,
    i.e. 3x the most expensive work in the query)."""
    df = registry.get("rel_triangles_trade").fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    inner = sum(
        1
        for line in plan.splitlines()
        if "Inner" in line
        and any(
            j in line
            for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
        )
    )
    assert inner == 2, f"wedge-closure joins duplicated: {inner}\n{plan}"
    # both unions replaced: endpoints and triangle corners explode
    assert plan.count("Generate explode") == 2, plan
    assert "Union" not in plan, plan
