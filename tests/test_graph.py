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
