"""PageRank (operators/graph.py): closed-form checks on hand-built graphs
and the conservation invariant. Cross-engine parity for the TPC-H
co-transaction graph runs in tests/test_oracle_queries.py (q139)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from franzoxide_spark.operators.graph import pagerank


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_symmetric_cycle_stays_uniform(spark):
    # 3-cycle in both directions: uniform is the fixed point
    e = [(1, 2), (2, 3), (3, 1), (2, 1), (3, 2), (1, 3)]
    got = _ranks(spark, e, iters=4)
    for v in got.values():
        assert v == pytest.approx(1 / 3, abs=1e-12)


def test_star_graph_matches_hand_iteration(spark):
    # undirected star: hub 0, leaves 1..3
    e = []
    for leaf in (1, 2, 3):
        e += [(0, leaf), (leaf, 0)]
    d, n = 0.85, 4
    hub, leaf = 1 / n, 1 / n
    for _ in range(3):
        hub, leaf = (
            (1 - d) / n + d * 3 * leaf,       # leaves have deg 1
            (1 - d) / n + d * hub / 3,         # hub spreads over 3
        )
    got = _ranks(spark, e, iters=3)
    assert got[0] == pytest.approx(hub, rel=1e-12)
    for v in (1, 2, 3):
        assert got[v] == pytest.approx(leaf, rel=1e-12)


def test_mass_is_conserved_without_dangling_nodes(spark):
    e = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3), (1, 4), (4, 1)]
    df = spark.createDataFrame(e, "src long, dst long")
    total = pagerank(df, iters=5).agg(F.sum("rank")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-9)


def test_bsp_fallback_equals_broadcast_path(spark):
    """Both physical strategies compute the same recurrence: forcing the
    shuffle-join (BSP) branch via broadcast_threshold=0 must reproduce
    the broadcast path's ranks exactly-ish (FP summation order is the
    only wobble) on an asymmetric graph where a plan bug would show.
    Until r12 the 5M-node fallback had never executed (r11 verdict
    item #2 — an untested branch is a 100 TB-only surprise)."""
    e = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3), (1, 4), (4, 1),
         (1, 3), (3, 1), (5, 1), (1, 5)]
    df = spark.createDataFrame(e, "src long, dst long")
    fast = {r["node"]: r["rank"] for r in pagerank(df, iters=4).collect()}
    bsp = {
        r["node"]: r["rank"]
        for r in pagerank(df, iters=4, broadcast_threshold=0).collect()
    }
    assert set(fast) == set(bsp)
    for node, rank in fast.items():
        assert bsp[node] == pytest.approx(rank, rel=1e-12), node


def test_symmetric_fast_path_equals_general_path(spark):
    """``symmetric=True`` (r13: skip the per-iteration dangling-teleport
    join — every node of a both-directions edge list has in-degree >= 1)
    must reproduce the general path's ranks exactly on an undirected
    graph, across iteration counts straddling the checkpoint cadence."""
    e = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3), (1, 4), (4, 1),
         (1, 3), (3, 1), (5, 1), (1, 5)]
    for iters in (1, 3, 5, 9):
        general = _ranks(spark, e, iters=iters)
        fast = _ranks(spark, e, iters=iters, symmetric=True)
        assert set(general) == set(fast), iters
        for node, rank in general.items():
            assert fast[node] == pytest.approx(rank, rel=1e-12), (iters, node)


def test_symmetric_vouched_node_count_equals_general(spark):
    """``n_nodes`` caller-vouched (r18: q139 derives it in its edge-build
    job) + the folded first iteration must reproduce the general path's
    ranks across iteration counts, including iters=1 (the fold IS the
    whole run) and iters=0 (uniform start over the node list)."""
    e = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3), (1, 4), (4, 1),
         (1, 3), (3, 1), (5, 1), (1, 5)]
    for iters in (0, 1, 3, 5):
        general = _ranks(spark, e, iters=iters)
        fast = _ranks(spark, e, iters=iters, symmetric=True, n_nodes=5)
        assert set(general) == set(fast), iters
        for node, rank in general.items():
            assert fast[node] == pytest.approx(rank, rel=1e-12), (iters, node)


def test_bsp_fallback_plan_has_no_broadcast_join(spark, monkeypatch):
    """The threshold actually routes the physical plan: below it the
    rank-vector join is a BroadcastHashJoin (the explicit hint wins even
    with autoBroadcast disabled); forcing the fallback, the iteration
    plan must carry NO broadcast join — asserting the plan, not just the
    numbers, so a silently-ignored hint can't pass. localCheckpoint is
    no-op'd for the test (it truncates the visible plan to a Scan
    ExistingRDD; it is a lineage/perf device, not semantics)."""
    import pyspark.sql.classic.dataframe as _D  # the concrete class —
    # patching the pyspark.sql.dataframe ABC does not intercept calls

    monkeypatch.setattr(
        _D.DataFrame, "localCheckpoint", lambda self, eager=True: self
    )
    e = [(1, 2), (2, 1), (2, 3), (3, 2)]
    df = spark.createDataFrame(e, "src long, dst long")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fast_plan = (
            pagerank(df, iters=1)
            ._jdf.queryExecution().executedPlan().toString()
        )
        bsp_plan = (
            pagerank(df, iters=1, broadcast_threshold=0)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in fast_plan
        assert "BroadcastHashJoin" not in bsp_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
