"""Online ingest curation gate: the round-15 streaming surface composed
the way a live corpus-ingest pipeline runs it.

    document stream (3 micro-batches, event-timed)
      ├→ exact-copy gate     (stateful_dedup_ttl on (source, sha256):
      │                       first copy per TTL session passes)
      ├→ near-dup gate       (streaming_neardup_gate: each arriving doc
      │                       verified against every earlier bucket-mate;
      │                       flags stream to a side sink)
      └→ decontamination     (decontaminate_stream: per-row Arrow probe
                              against the eval suite's gram hashes)
      → reconcile            (admitted = decontaminated − near-dup-flagged
                              ∩ first-copies; a foreachBatch merge in a
                              deployment — a batch anti-join here so the
                              invariants below can be asserted exactly)

Every stage is the registry operator (q177/q178/q56's machinery); this
script chains them on file streams, prints per-stage counts, and asserts
STREAM == BATCH-FACE on the in-order feed:

  (1) the exact-copy gate's first-occurrences == batch_ttl_session_dedup,
  (2) the near-dup flag set (min dup_of per doc) == neardup_gate's
      flagged verdicts,
  (3) the decontaminated set == the batch join-path decontaminate.

Plan shapes are the 100 TB ones: the dedup gate is one key shuffle of
per-key state, the near-dup gate one bucket shuffle with residency-
bounded state (bucket_ttl_s bounds it under drift), the decontamination
map-side only. Nothing here collects the corpus to the driver — only
the eval suite's gram-hash set, which is broadcast-sized by nature.

Usage: python examples/streaming_ingest_gate.py
       [env: SPARK_GRAFT_SF_DIR (/root/testdata/sf0.001), OUT_DIR]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from franzoxide_spark.operators.curation import (  # noqa: E402
    decontaminate,
    decontaminate_stream,
    eval_shingle_hashes,
)
from franzoxide_spark.operators.dedup import neardup_gate  # noqa: E402
from franzoxide_spark.session import get_spark  # noqa: E402
from franzoxide_spark.streaming.stateful import (  # noqa: E402
    batch_ttl_session_dedup,
    stateful_dedup_ttl,
    streaming_neardup_gate,
)
from franzoxide_spark.tables import table  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    work = os.environ.get("OUT_DIR") or tempfile.mkdtemp(prefix="ingest_gate_")
    spark = get_spark(driver_memory="8g")
    spark.sparkContext.setLogLevel("WARN")

    docs = table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 97 == 0)
    pool = docs.filter(F.col("doc_id") % 97 != 0)

    # ── stage the stream: 3 event-timed micro-batches in doc_id order ──
    # (id order == arrival order is the parity contract of the gates)
    feed = (
        pool.select(
            "doc_id", "text", "source",
            # synthetic ingest time, MONOTONE in doc_id — the stream
            # feeds in id order, so event time == arrival order (the
            # gates' parity contract; an out-of-order feed hits the
            # documented retroactivity gap instead)
            F.timestamp_seconds(
                F.lit(1_700_000_000) + F.col("doc_id")
            ).alias("ts"),
        )
    )
    n_max = feed.agg(F.max("doc_id")).first()[0]
    cuts = (n_max // 3, 2 * n_max // 3)
    in_dir = os.path.join(work, "in")
    os.makedirs(in_dir, exist_ok=True)
    parts = [
        feed.filter(F.col("doc_id") <= cuts[0]),
        feed.filter((F.col("doc_id") > cuts[0]) & (F.col("doc_id") <= cuts[1])),
        feed.filter(F.col("doc_id") > cuts[1]),
    ]
    for i, p in enumerate(parts):
        stage = os.path.join(work, f"stage{i}")
        p.coalesce(1).write.mode("overwrite").parquet(stage)
        for j, f in enumerate(glob.glob(stage + "/*.parquet")):
            os.link(f, os.path.join(in_dir, f"b{i}_{j}.parquet"))

    schema = "doc_id long, text string, source string, ts timestamp"
    queries = []

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
        )

    def sink(df, name):
        q = (
            df.writeStream.outputMode("append")
            .format("parquet")
            .option("path", os.path.join(work, name))
            .option("checkpointLocation", os.path.join(work, f"ckpt_{name}"))
            .start()
        )
        queries.append(q)
        return q

    # ── 1. exact-copy gate: first sha per source per 1h TTL session ──
    hashed = stream().withColumn("sha", F.sha2("text", 256))
    sink(stateful_dedup_ttl(hashed, "source", "sha", "ts", ttl_s=3600,
                            watermark="1 hour"), "first_copies")

    # ── 2. near-dup gate: flag rows stream to a side sink ──
    sink(streaming_neardup_gate(stream(), "doc_id", "text", threshold=0.8),
         "neardup_flags")

    # ── 3. decontamination: per-row probe, map-side ──
    ev_hashes = eval_shingle_hashes(eval_docs, k=4)
    sink(decontaminate_stream(stream(), ev_hashes, k=4).select("doc_id"),
         "decontaminated")

    for q in queries:
        q.processAllAvailable()
    for q in queries:
        q.stop()

    first = spark.read.parquet(os.path.join(work, "first_copies"))
    flags = spark.read.parquet(os.path.join(work, "neardup_flags"))
    clean = spark.read.parquet(os.path.join(work, "decontaminated"))

    # ── reconcile: the admitted corpus ──
    flagged_ids = flags.select(F.col("doc_id")).distinct()
    admitted = clean.join(flagged_ids, "doc_id", "left_anti")
    n_pool, n_clean = pool.count(), clean.count()
    print(f"pool docs            {n_pool}")
    print(f"decontaminated       {n_clean} (-{n_pool - n_clean})")
    print(f"near-dup flagged     {flagged_ids.count()}")
    print(f"admitted             {admitted.count()}")
    print(f"first copies (TTL)   {first.count()}")

    # ── invariants: stream faces == batch faces on the in-order feed ──
    hashed_batch = feed.withColumn("sha", F.sha2("text", 256))
    want_first = {
        (r["key"], r["member"], r["first_es"])
        for r in batch_ttl_session_dedup(
            hashed_batch, "source", "sha", "ts", ttl_s=3600,
        ).collect()
    }
    got_first = {
        (r["key"], r["member"], r["first_es"]) for r in first.collect()
    }
    assert got_first == want_first, "TTL dedup diverged from its batch face"

    got_flags: dict[int, int] = {}
    for r in flags.collect():
        cur = got_flags.get(r["doc_id"])
        if cur is None or r["dup_of"] < cur:
            got_flags[r["doc_id"]] = r["dup_of"]
    want_flags = {
        r["doc_id"]: r["dup_of"]
        for r in neardup_gate(pool, "text", "doc_id", threshold=0.8).collect()
        if r["admitted"] == 0
    }
    assert got_flags == want_flags, "near-dup gate diverged from its batch face"

    want_clean = {
        r["doc_id"]
        for r in decontaminate(pool, eval_docs, "doc_id", "text", k=4)
        .select("doc_id").collect()
    }
    assert {r["doc_id"] for r in clean.collect()} == want_clean, (
        "stream decontamination diverged from the batch join path"
    )
    print("invariants hold: all three stream gates match their batch faces")
    if not os.environ.get("OUT_DIR"):
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
