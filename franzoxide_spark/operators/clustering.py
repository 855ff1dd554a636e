"""Distributed Lloyd k-means over an embedding column.

The iterative-algorithm representative of the ML-primitive family
(q53's IVF index fits its coarse centroids on a driver-side SAMPLE;
this is the full distributed loop a corpus-scale clustering needs):

- init: deterministic — the k rows with the smallest ids seed the
  centroids (no RNG; same corpus -> same clustering);
- assign + update, fused (r17): ONE Arrow pass per iteration computes
  each row's nearest centroid against the BROADCAST centroid matrix
  (one numpy GEMM per batch, the q83 pattern) and accumulates the
  per-(cluster, dimension) int64 partial sums in-task, emitting at most
  k x dim rows per task — the corpus never shuffles, never returns
  per-row values to the JVM, and the only exchange is the
  tasks-x-k-x-dim partial merge (the q92 centroid shape, bounded
  regardless of corpus size) — then the k x dim result collects to the
  driver (tiny) to become the next broadcast.

Per iteration: one corpus scan, one bounded shuffle, one tiny collect.
Iterations are the outer loop a driver coordinates — exactly how MLlib
schedules it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from franzoxide_spark.functions.numeric import scaled_int

# numpy/pandas are imported at module scope (not inside the UDF builders)
# because pandas_udf resolves the postponed 'pd.Series' type-hint strings
# against the function's globals — a local import leaves them unresolvable


def _assign_udf(centroids):
    """Returns a pandas UDF mapping an embedding column to the nearest
    centroid id (squared-L2 argmin via one GEMM per Arrow batch)."""
    from pyspark.sql.functions import pandas_udf

    c = np.asarray(centroids, dtype=np.float64)  # k x dim
    c_sq = (c * c).sum(axis=1)  # k

    @pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        x = np.vstack(v.to_numpy())  # n x dim
        # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; ||x||^2 constant per row
        d = -2.0 * (x @ c.T) + c_sq
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    return assign


# Per-iteration driver traffic is k×dim partial-sum rows — independent
# of corpus size (that's the operator's 100 TB contract). Bound it hard
# so a caller can't silently request a centroid table that turns the
# per-iteration collect into a driver bottleneck.
_KMEANS_MAX_DRIVER_CELLS = 10_000_000  # k * dim


def kmeans_fit(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 5,
) -> tuple[list[list[float]], DataFrame]:
    """Run ``iters`` Lloyd iterations; returns (centroids, assigned)
    where assigned = emb plus a ``cluster_id`` column for the FINAL
    centroids. Deterministic seeding: the k smallest ids.

    100 TB contract: each iteration is one corpus scan (broadcast-GEMM
    assignment), one map-side-combined (cluster, pos) partial-sum
    shuffle, and ONE driver collect of exactly k×dim rows — bounded by
    the model size, never the corpus. The k×dim product is checked
    against ``_KMEANS_MAX_DRIVER_CELLS`` up front.
    """
    if k <= 0 or iters <= 0:
        raise ValueError(f"k and iters must be positive ({k}, {iters})")
    seed_rows = (
        emb.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )
    if len(seed_rows) < k:
        raise ValueError(f"corpus has fewer than k={k} rows")
    centroids = [list(r[vec_col]) for r in seed_rows]
    dim0 = len(centroids[0])
    if k * dim0 > _KMEANS_MAX_DRIVER_CELLS:
        raise ValueError(
            f"k*dim = {k}*{dim0} exceeds the per-iteration driver bound"
            f" {_KMEANS_MAX_DRIVER_CELLS}; shard the centroid table or"
            " reduce k"
        )
    for _ in range(iters):
        # fused assign+partial-sum kernel (r17 batch 4, guide §4.1/§2.3):
        # one Arrow pass computes the assignment GEMM (bit-identical to
        # _assign_udf — same float64 expression, same argmin) AND
        # accumulates the per-(cluster, dim) int64 partial sums in-task,
        # emitting ≤ k×dim rows per task. This replaces the previous
        # [per-row assign UDF → posexplode (rows×dim Generate) → hash
        # aggregate over the exploded stream]: no per-row Arrow return
        # leg, no corpus×dim aggregation input. Exactness is unchanged:
        # np.floor(x·1e6 + 0.5) IS scaled_int's double-domain half-up
        # quantization (identical IEEE ops), and int64 partial sums are
        # order-free — the module's "same corpus -> same clustering"
        # contract holds under any partition layout (r13 review), pinned
        # against the posexplode reference in tests/test_clustering.py.
        c_arr = np.asarray(centroids, dtype=np.float64)
        c_sq = (c_arr * c_arr).sum(axis=1)
        n_k, n_dim = c_arr.shape

        def _partials(batches, _c=c_arr, _csq=c_sq, _k=n_k, _d=n_dim):
            s = np.zeros((_k, _d), dtype=np.int64)
            n = np.zeros(_k, dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                # float64 up-cast FIRST: scaled_int quantizes after a
                # double cast, and a float32 embedding column would
                # otherwise keep x*1e6 in float32 (numpy's scalar
                # promotion) and drift from the Spark-side reference.
                # The GEMM is unchanged — matmul promotes float32
                # operands to float64 exactly, so _assign_udf's d is
                # the same matrix.
                x = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
                d = -2.0 * (x @ _c.T) + _csq
                cid = np.argmin(d, axis=1)
                q = np.floor(x * 1_000_000.0 + 0.5).astype(np.int64)
                np.add.at(s, cid, q)
                n += np.bincount(cid, minlength=_k)
            nz = np.nonzero(n)[0]
            if len(nz):
                yield pd.DataFrame(
                    {
                        "cluster_id": np.repeat(nz, _d).astype(np.int32),
                        "pos": np.tile(np.arange(_d, dtype=np.int32), len(nz)),
                        "s": s[nz].ravel(),
                        "n": np.repeat(n[nz], _d),
                    }
                )

        # tasks×k×dim partial rows → the same k×dim (s, n) rows the
        # posexplode shape produced (n repeats per pos within a cluster,
        # so sum(n) per (cluster, pos) == the old per-group row count)
        sums = (
            emb.select(vec_col)
            .mapInPandas(_partials, "cluster_id int, pos int, s long, n long")
            .groupBy("cluster_id", "pos")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        # the partial-sum relation is grouped on (cluster, pos): at most
        # k*dim rows regardless of corpus size — the bound checked above
        assert len(sums) <= k * dim0, (len(sums), k, dim0)
        by_cluster: dict[int, dict[int, float]] = {}
        counts: dict[int, int] = {}
        for r in sums:
            by_cluster.setdefault(r["cluster_id"], {})[r["pos"]] = r["s"]
            counts[r["cluster_id"]] = r["n"]
        dim = len(centroids[0])
        centroids = [
            [by_cluster[c][p] / counts[c] / 1_000_000.0 for p in range(dim)]
            if c in by_cluster
            else centroids[c]  # empty cluster keeps its centroid
            for c in range(k)
        ]
    assigned = emb.withColumn(
        "cluster_id", _assign_udf(centroids)(F.col(vec_col))
    )
    return centroids, assigned


def kmeans_summary(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 5,
) -> DataFrame:
    """Bounded clustering report: per cluster, size and mean squared
    distance to its centroid. mean_sq_dist averages 6dp-quantized
    per-row distances in exact int64 (the q92 pattern) so the report is
    bit-stable under any partition layout, like the fit it describes."""
    centroids, _ = kmeans_fit(emb, vec_col, id_col, k, iters)
    from pyspark.sql.functions import pandas_udf

    c = np.asarray(centroids, dtype=np.float64)
    c_sq = (c * c).sum(axis=1)

    # ONE fused kernel for the report pass (r17, guide §4.1): the final
    # assignment and the distance to the chosen centroid come from the
    # same GEMM, so computing them in separate pandas UDFs paid two
    # Arrow round-trips and re-did the distance matrix. ||x-c||^2 =
    # ||x||^2 - 2x.c + ||c||^2 evaluated exactly as the assign kernel
    # does (same expression, same dtype, same argmin), so cluster ids
    # are bit-identical to _assign_udf's.
    @pandas_udf("struct<cid:int,d2:double>")
    def assign_d2(v: pd.Series) -> pd.DataFrame:
        x = np.vstack(v.to_numpy())
        d = -2.0 * (x @ c.T) + c_sq
        cid = np.argmin(d, axis=1)
        d2 = d[np.arange(len(cid)), cid] + (x * x).sum(axis=1)
        return pd.DataFrame(
            {"cid": cid.astype(np.int32), "d2": d2}
        )

    return (
        emb.select(assign_d2(F.col(vec_col)).alias("__a"))
        .select(
            F.col("__a.cid").alias("cluster_id"),
            F.col("__a.d2").alias("__d2"),
        )
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.round(
                F.sum(scaled_int("__d2", scale=1_000_000)).cast("double")
                / F.count(F.lit(1))
                / 1_000_000.0,
                4,
            ).alias("mean_sq_dist"),
        )
    )
