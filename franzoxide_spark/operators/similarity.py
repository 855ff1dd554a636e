"""Similarity search over embedding columns.

Three paths, same contract:

- ``topk_cosine_exact``  — brute-force: broadcast the (small) query set
  against the full corpus, expression-based dot products (JVM codegen, no
  Python), window top-k. Scales linearly in corpus size with NO shuffle of
  the corpus — the only exchange is the final per-query top-k combine,
  which AQE keeps tiny. This is the correctness baseline.

- ``lsh_ann_topk``       — random-hyperplane LSH (Charikar '02 SimHash for
  vectors): deterministic md5-derived ±1 hyperplanes, signature buckets,
  multiprobe (hamming <= 1) candidate generation, exact re-rank of
  candidates. At 100 TB the bucket join replaces the corpus scan per query
  batch; recall is tunable via bits/probes. Approximate by nature ->
  rows-only checked, with recall measured against the exact path in tests.

- ``ivf_ann_topk``       — inverted-file ANN: seeded k-means cells +
  nearest-centroid multiprobe + exact rerank of probed cells. The
  data-adaptive counterpart to LSH; same rows-only + recall-test regime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from franzoxide_spark.functions.vectors import cosine_rounded


def topk_cosine_exact(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """For each query vector: top-k neighbors by cosine (self excluded),
    deterministic ties (rounded cosine desc, neighbor id asc)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine_rounded("qv", "nv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos", "rnk")
    )


# --------------------------------------------------------------------------
# random-hyperplane LSH
# --------------------------------------------------------------------------


def _plane_matrix(bits: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes: plane_j[d] = +1 iff the shared
    60-bit md5 hash of 'j:dd' is even — computed driver-side with hashlib
    (bit-identical to the engines' md5) and inlined as a literal, so the
    per-row work is just ``bits`` dot products."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{j}:d{d}".encode()).hexdigest()[:15], 16) % 2 == 0
            else -1.0
            for d in range(dim)
        ]
        for j in range(bits)
    ]


def _signature_expr(vec_col: str, bits: int, dim: int) -> str:
    planes = _plane_matrix(bits, dim)
    lit = "array(" + ", ".join(
        "array(" + ", ".join(f"{v:.1f}d" for v in row) + ")" for row in planes
    ) + ")"
    plane_dot = (
        f"aggregate(zip_with({vec_col}, element_at({lit}, j + 1),"
        " (x, p) -> cast(x as double) * p),"
        " cast(0.0 as double), (acc, v) -> acc + v)"
    )
    return (
        f"aggregate(sequence(0, {bits - 1}), cast(0 as bigint), (acc, j) ->"
        f" acc + case when {plane_dot} > 0 then shiftleft(cast(1 as bigint), j)"
        " else cast(0 as bigint) end)"
    )


def with_lsh_signature(
    emb: DataFrame, vec_col: str, bits: int = 4, dim: int = 64
) -> DataFrame:
    return emb.withColumn("lsh_sig", F.expr(_signature_expr(vec_col, bits, dim)))


def ivf_ann_topk(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means the corpus into ``n_lists``
    cells; each query probes its ``n_probe`` nearest centroids and
    exact-reranks only those cells' members.

    At 100 TB the assignment is a map-side transform against broadcast
    centroids and the probe join touches n_probe/n_lists of the corpus —
    the complementary trade to LSH (data-adaptive cells vs oblivious
    hyperplanes). Seeded k-means -> deterministic per dataset, but
    data-dependent -> rows-only checked; recall vs the exact path is
    asserted in tests.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")
    ).withColumn("features", array_to_vector(F.expr("transform(nv, x -> cast(x as double))")))
    km = KMeans(k=n_lists, seed=seed, maxIter=5).fit(corpus)
    assigned = km.transform(corpus).withColumnRenamed("prediction", "cell")

    centers = [c.tolist() for c in km.clusterCenters()]
    centers_df = emb.sparkSession.createDataFrame(
        [(i, c) for i, c in enumerate(centers)], "cell int, center array<double>"
    )
    qs = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    # each query's n_probe nearest cells by centroid distance
    qc = (
        qs.crossJoin(F.broadcast(centers_df))
        .withColumn(
            "d2",
            F.expr(
                "aggregate(zip_with(qv, center,"
                " (x, c) -> (cast(x as double) - c) * (cast(x as double) - c)),"
                " cast(0.0 as double), (acc, v) -> acc + v)"
            ),
        )
    )
    wq = Window.partitionBy("query_id").orderBy("d2", "cell")
    probes = (
        qc.withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= n_probe)
        .select("query_id", "qv", "cell")
    )
    cand = assigned.join(F.broadcast(probes), "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        cand.withColumn("cos", cosine_rounded("qv", "nv"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos", "rnk")
    )


def lsh_ann_topk(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    bits: int = 4,
    max_probe_hamming: int = 1,
) -> DataFrame:
    corpus = with_lsh_signature(
        emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")),
        "nv",
        bits,
    )
    qs = with_lsh_signature(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        "qv",
        bits,
    ).withColumnRenamed("lsh_sig", "q_sig")
    cand = corpus.join(
        F.broadcast(qs),
        (F.col("query_id") != F.col("neighbor_id"))
        & (
            F.bit_count(F.col("lsh_sig").bitwiseXOR(F.col("q_sig")))
            <= max_probe_hamming
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        cand.withColumn("cos", cosine_rounded("qv", "nv"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos", "rnk")
    )
