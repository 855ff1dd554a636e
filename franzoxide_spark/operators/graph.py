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
    broadcast_threshold: int = 5_000_000,
    symmetric: bool = False,
    checkpoint_every: int = 4,
    pre_materialized: bool = False,
    n_nodes: int | None = None,
) -> DataFrame:
    """Power-iteration PageRank over ``edges (src bigint, dst bigint)``.

    Every node mentioned as an endpoint participates; callers that want
    an undirected graph emit each edge in both directions (then no node
    dangles). Returns ``(node, rank)`` with ``rank`` the raw (unrounded)
    value after ``iters`` iterations from the uniform start.

    If ``edges`` already carries a ``deg`` column (the source node's
    out-degree), it is trusted and the edges are assumed deduplicated —
    the caller often computes degrees far cheaper than the generic
    ``groupBy`` here (q139's bipartite build attaches both sides' degrees
    with two vocabulary-sized broadcast joins before doubling the
    directions — profiled: the edge build, not the iterations, dominates
    PageRank wall-clock, so cheapening it is what matters).

    ``symmetric``: the caller vouches every edge appears in BOTH
    directions (trusted, like ``deg``). Then every node has in-degree
    >= 1, so the per-iteration dangling-teleport left-join against the
    node table is the identity and is SKIPPED: an iteration collapses
    to join + aggregate, and the node set is just ``distinct dst``.
    At the bench SF this halves the per-iteration job count — the
    scheduler floor, not the O(|E|) work, dominates small-graph
    iteration cost (r12 verdict item #3).

    ``n_nodes``: caller-vouched count of distinct nodes (trusted, like
    ``deg``/``symmetric``). Callers that can derive it from their own
    edge-build job (q139: countDistinct per bipartite side in the job
    that materializes its checkpoint) skip the separate count action
    here. In symmetric mode with ``iters >= 1`` the node table is then
    never constructed at all — the first iteration folds into one
    aggregation over the edge relation (uniform start ⇒ every source
    contributes exactly (1/N)/deg), r18.

    ``checkpoint_every``: lineage-flattening cadence. The rank vector
    is consumed ONCE per iteration, so the lazy plan grows LINEARLY
    (not the doubling hazard q57's label propagation has, where each
    round reads its input twice) — a handful of iterations run as one
    chained job, and the checkpoint only exists to bound optimizer
    time on long runs. Every iteration (the old behavior) paid one
    materialization barrier per round for no reuse benefit.
    """
    if "deg" in edges.columns:
        pre = edges.select("src", "dst", "deg")
    else:
        edges = edges.select("src", "dst").distinct()
        deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
        pre = edges.join(deg, "src")
    # Materialize the edge table ONCE: nodes, degrees, and every
    # iteration's joins all read this checkpoint. Deriving them from the
    # raw `edges` plan instead re-executed the upstream edge construction
    # (a fact-fact join + distinct in q139) once per iteration — measured
    # 6.4 s -> 2.1 s at sf0.1 for 3 iterations. Lazy (eager=False): the
    # n_nodes count below is the first consumer and materializes it in
    # the same job, one scheduling round fewer per invocation.
    #
    # ``pre_materialized``: the caller vouches ``edges`` is already a
    # cheap derivation of its own checkpoint/materialized relation (q139
    # checkpoints the degree-attached pair list and unions the two
    # directions from it). Then checkpointing here would materialize the
    # SAME data a second time at 2x|pairs| width — skip it (r17: q139
    # 1.97 -> 1.66 s isolated min-of-6).
    ed = pre if pre_materialized else pre.localCheckpoint(eager=False)
    # ``n_nodes``: caller-vouched distinct-node count (trusted like
    # ``deg``/``symmetric`` — q139 derives it as countDistinct(s) +
    # countDistinct(c) in the SAME job that materializes its edge
    # checkpoint, r18: one scheduling round fewer than counting the
    # doubled edge list's distinct dst here). In symmetric mode the
    # node table itself is never needed (see below), so a vouched count
    # removes the entire node-derivation subtree.
    if symmetric:
        nodes = None
        if n_nodes is None:
            # both directions present -> dst alone names every node
            n_nodes = ed.select("dst").distinct().count()
    else:
        nodes = (
            ed.select(F.col("src").alias("node"))
            .union(ed.select(F.col("dst").alias("node")))
            .distinct()
            .localCheckpoint(eager=False)
        )
        if n_nodes is None:
            n_nodes = nodes.count()

    # The rank vector is |nodes| rows. When that fits a broadcast (the
    # common case even for large graphs — 5M nodes x 16B is ~80 MB), the
    # per-iteration join and the dangling-node left join both go map-side
    # and an iteration costs ZERO shuffles beyond the bounded in-mass
    # combine (measured 1.6 s -> 0.4 s for 3 iterations at sf0.1). Above
    # the threshold, fall back to the shuffle join — the classic BSP
    # PageRank, one O(|E|) exchange per iteration. The threshold is a
    # caller-injectable parameter so the BSP branch is testable on small
    # fixtures (r11 verdict item #2) and tunable to executor memory.
    small = n_nodes <= broadcast_threshold
    b = F.broadcast if small else (lambda df: df)

    base = (1.0 - damping) / n_nodes
    if symmetric and iters >= 1:
        # First iteration folded (r18, VERDICT #4): from the uniform
        # start every source contributes exactly (1/N)/deg, so round 1's
        # edges⋈r0 join is a constant lookup — r1 comes straight off the
        # edge relation with ONE aggregation, and the node table is
        # never built at all (r1 already names every node: symmetric ⇒
        # in-degree >= 1). Bit-for-bit the same arithmetic as the join
        # form: the joined rank value was the literal 1/N for every row,
        # and groupBy summation order was never deterministic.
        ranks = (
            ed.select(
                F.col("dst").alias("node"),
                ((F.lit(1.0) / n_nodes) / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
            .select(
                "node",
                (F.lit(base) + damping * F.col("in_mass")).alias("rank"),
            )
        )
        if 1 % checkpoint_every == 0 and 1 < iters:
            ranks = ranks.localCheckpoint(eager=False)
        start_iter = 2
    elif symmetric:
        # iters == 0: the uniform start itself is the answer — the one
        # symmetric case that still needs the node list
        return (
            ed.select(F.col("dst").alias("node"))
            .distinct()
            .select("node", (F.lit(1.0) / n_nodes).alias("rank"))
        )
    else:
        ranks = nodes.select("node", (F.lit(1.0) / n_nodes).alias("rank"))
        start_iter = 1
    for i in range(start_iter, iters + 1):
        contribs = (
            ed.join(b(ranks), ed["src"] == ranks["node"])
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        if symmetric:
            # every node received mass — base + d*in_mass IS the full
            # recurrence, no dangling-teleport join needed
            ranks = contribs.select(
                "node",
                (F.lit(base) + damping * F.col("in_mass")).alias("rank"),
            )
        else:
            # nodes with no in-edges still hold the teleport mass
            ranks = nodes.join(b(contribs), "node", "left").select(
                "node",
                (F.lit(base) + damping * F.coalesce("in_mass", F.lit(0.0))).alias(
                    "rank"
                ),
            )
        if i % checkpoint_every == 0 and i < iters:
            ranks = ranks.localCheckpoint(eager=False)
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
