"""Distributed PageRank over a relational co-occurrence graph.

The iterative graph-analytics representative next to q57's connected
components and q125's k-means: power-iteration PageRank (Page et al.
1999) run as a sequence of DataFrame joins, with the driver coordinating
iterations only (no data ever returns to the driver).

Scale shape:

- Each iteration is ONE shuffle: contributions = edges ⋈ ranks on src
  (both sides hash-partitioned on the node key, and AQE keeps reusing
  that partitioning), then a map-side-combined sum by dst. Work per
  iteration is O(|E|) — the textbook bulk-synchronous PageRank.
- Out-degrees are computed once and ride the edge relation, so the
  per-iteration join has exactly two inputs: the (src, dst, deg) edge
  table and the current (node, rank) vector.
- Lineage is flattened with ``localCheckpoint`` per iteration —
  otherwise the plan doubles each round and the optimizer, not the data,
  becomes the bottleneck (the same hazard documented for q57's label
  propagation in operators/dedup.py).
- The graph here is built undirected (each edge emitted both ways), so
  every node has out-degree ≥ 1 and the dangling-mass correction term
  vanishes — both engines then compute the exact same recurrence
  ``r' = (1-d)/N + d·Σ_in r/deg`` with no redistribution step.

Determinism: ranks are exact functions of the graph; the only
cross-engine wobble is FP summation order, absorbed by rounding the
FINAL ranks to 9 decimals (values are ~1/N; double error after a few
hundred adds is ~1e-15).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Power-iteration PageRank over ``edges (src bigint, dst bigint)``.

    Every node mentioned as an endpoint participates; callers that want
    an undirected graph emit each edge in both directions (then no node
    dangles). Returns ``(node, rank)`` with ``rank`` the raw (unrounded)
    value after ``iters`` iterations from the uniform start.
    """
    spark = edges.sparkSession
    edges = edges.select("src", "dst").distinct()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    ed = edges.join(deg, "src").localCheckpoint(eager=False)
    n_nodes = nodes.count()

    ranks = nodes.select("node", (F.lit(1.0) / n_nodes).alias("rank"))
    base = (1.0 - damping) / n_nodes
    for _ in range(iters):
        contribs = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        # nodes with no in-edges still hold the teleport mass
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (F.lit(base) + damping * F.coalesce("in_mass", F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def sql_pagerank_unrolled(
    edges_cte: str,
    *,
    iters: int = 3,
    damping: float = 0.85,
) -> str:
    """DuckDB mirror: the same recurrence unrolled ``iters`` times.

    ``edges_cte`` must be a complete ``SELECT`` producing (src, dst),
    already deduplicated and both-directions for undirected graphs.
    Produces CTEs ``nodes``, ``ed``, ``r0`` … ``r{iters}``; the caller
    selects from ``r{iters}``.
    """
    parts = [
        f"edges AS ({edges_cte})",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "ed AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN "
        "(SELECT src, COUNT(*) AS deg FROM edges GROUP BY src) d ON d.src = e.src)",
        "r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"r{i} AS ("
            f"SELECT n.node, (1.0 - {damping}) / nn.n + {damping} * "
            f"COALESCE(m.in_mass, 0.0) AS rank "
            f"FROM nodes n CROSS JOIN nn LEFT JOIN ("
            f"SELECT ed.dst AS node, SUM(r.rank / ed.deg) AS in_mass "
            f"FROM ed JOIN r{i-1} r ON r.node = ed.src GROUP BY ed.dst"
            f") m ON m.node = n.node)"
        )
    return "WITH " + ",\n".join(parts)
