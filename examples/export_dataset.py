"""End-to-end dataset export: the hand-off pipeline from curated corpus
to training shards, composed from the round-7 operators.

    documents
      → near-dup pairs            (MinHash-LSH, q33's plan)
      → leakage-safe split        (cluster-keyed 90/5/5 — near-copies
                                   never straddle splits)
      → train shard export        (size-capped JSONL + verifiable
                                   manifest; checksums sum to the
                                   dataset checksum)
      → layout                    (z-order write of an analytics copy so
                                   (doc_id, length) box scans prune)
      → change audit              (snapshot diff of this export vs a
                                   perturbed 'previous' one)

Prints stage counts and verifies every invariant inline. Plan shapes
are the 100 TB ones throughout: band-bucket dedup, one corpus hash join
for the split, map-side export capping, range-exchange z-write,
full-outer fingerprint diff.

Usage: python examples/export_dataset.py
       [env: SPARK_GRAFT_SF_DIR (/root/testdata/sf0.001), OUT_DIR]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from franzoxide_spark.operators.curation import cluster_safe_split  # noqa: E402
from franzoxide_spark.operators.dedup import minhash_near_duplicates  # noqa: E402
from franzoxide_spark.operators.export import (  # noqa: E402
    dataset_checksum,
    export_jsonl_shards,
    shard_manifest,
)
from franzoxide_spark.operators.layout import zorder_write  # noqa: E402
from franzoxide_spark.operators.snapshot import snapshot_diff  # noqa: E402
from franzoxide_spark.session import get_spark  # noqa: E402
from franzoxide_spark.tables import table  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    out = os.environ.get("OUT_DIR") or tempfile.mkdtemp(prefix="export_")
    spark = get_spark(app_name="export_dataset", driver_memory="8g")
    docs = table(spark, sf_dir, "documents")
    n_docs = docs.count()
    print(f"[1/5] corpus: {n_docs} documents from {sf_dir}")

    pairs = minhash_near_duplicates(docs, "text", "doc_id", threshold=0.8)
    split = cluster_safe_split(docs, pairs, id_col="doc_id")
    per_split = {r["split"]: r["n"] for r in
                 split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    print(f"[2/5] leakage-safe split: {per_split}")
    # invariant: near-dup pairs never straddle splits
    s = split.select("doc_id", "split")
    straddle = (
        pairs.join(s.withColumnRenamed("doc_id", "id_a")
                    .withColumnRenamed("split", "sa"), "id_a")
        .join(s.withColumnRenamed("doc_id", "id_b")
               .withColumnRenamed("split", "sb"), "id_b")
        .filter(F.col("sa") != F.col("sb")).count()
    )
    assert straddle == 0, f"{straddle} near-dup pairs straddle splits"

    train = docs.join(s.filter(F.col("split") == "train"), "doc_id")
    shards_dir = os.path.join(out, "train_shards")
    export_jsonl_shards(
        train.select("doc_id", "lang", "source", "text"), shards_dir, 512
    )
    manifest = shard_manifest(spark, shards_dir)
    m = manifest.collect()
    total_ck = sum(int(r["checksum"]) for r in m)
    want_ck = int(dataset_checksum(
        train.select("doc_id", "lang", "source", "text")))
    assert total_ck == want_ck, "manifest does not verify"
    print(f"[3/5] exported {sum(r['n_rows'] for r in m)} train rows in "
          f"{len(m)} shards; manifest checksum verified")

    analytics_dir = os.path.join(out, "analytics_zorder")
    zorder_write(
        docs.select("doc_id", "n_chars", "lang", "source"),
        analytics_dir, "doc_id", "n_chars", n_files=8, bits=12,
    )
    print(f"[4/5] z-ordered analytics copy: 8 files at {analytics_dir}")

    prev = docs.filter(F.col("doc_id") % 31 != 0)  # a 'previous' export
    diff = snapshot_diff(prev, docs, "doc_id", ["text", "lang", "source"])
    kinds = {r["change"]: r["n"] for r in
             diff.groupBy("change").agg(F.count("*").alias("n")).collect()}
    print(f"[5/5] change audit vs previous export: {kinds}")
    assert set(kinds) == {"added"} and kinds["added"] == docs.count() - prev.count()

    print(f"done; artifacts in {out}")
    spark.stop()
    if not os.environ.get("OUT_DIR"):
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
