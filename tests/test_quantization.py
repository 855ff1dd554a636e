"""Semantic tests for the int8 embedding quantization (q77,
functions/vectors.py). Oracle parity runs in test_oracle_queries.py;
these pin the guarantees the audit numbers rest on: the per-element
error bound implied by symmetric max-abs rounding, code range, and —
the reason to quantize at all — that nearest-neighbor structure
survives the round trip."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from franzoxide_spark.functions.vectors import dequant_mse, quantize_int8
from franzoxide_spark.tables import table


def test_quantization_error_bound_and_code_range(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings").limit(50)
    scale = F.expr(
        "greatest(aggregate(embedding, cast(0.0 as double),"
        " (m, y) -> greatest(m, abs(cast(y as double)))), cast(1e-30 as double))"
    )
    rows = emb.select(
        scale.alias("s"),
        dequant_mse("embedding", digits=12).alias("mse"),
        F.array_max(F.transform(quantize_int8("embedding"), F.abs)).alias("mc"),
        F.array_min(quantize_int8("embedding")).alias("lo"),
    ).collect()
    for r in rows:
        # symmetric rounding: per-element error <= 0.5 * s/127, so
        # mse <= (s/254)^2; codes stay in [-127, 127]
        assert r["mse"] <= (r["s"] / 254.0) ** 2 + 1e-15
        assert r["mc"] <= 127 and r["lo"] >= -127


def test_quantization_preserves_nearest_neighbors(spark, sf_dir):
    emb = (
        table(spark, sf_dir, "embeddings")
        .limit(120)
        .select("vec_id", "embedding")
        .collect()
    )
    ids = [r["vec_id"] for r in emb]
    v = np.array([r["embedding"] for r in emb], dtype=np.float64)
    s = np.maximum(np.abs(v).max(axis=1, keepdims=True), 1e-30)
    deq = np.round(v / s * 127) * s / 127

    def topk(mat, q, k=5):
        sim = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q) + 1e-30)
        order = np.argsort(-sim)
        return [ids[i] for i in order[1 : k + 1]]  # skip self

    recalls = []
    for qi in range(0, 20):
        exact = set(topk(v, v[qi]))
        quant = set(topk(deq, deq[qi]))
        recalls.append(len(exact & quant) / len(exact))
    assert np.mean(recalls) >= 0.8, recalls
