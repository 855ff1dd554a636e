"""Rate-source throughput evidence for the stateful streaming twins
(r18, VERDICT r17 item #9).

The three applyInPandasWithState operators (TTL session dedup, MinHash
near-dup gate, bottom-k quantiles) have batch-parity tests but no
recorded throughput. This script drives each with Spark's `rate` source
at a saturating rows/s, runs a fixed wall-clock window, and reports the
achieved processedRowsPerSecond from the engine's own progress metrics
(median over completed micro-batches, first batch dropped as warm-up).

Input synthesis per operator (deterministic expressions over the rate
stream's ``value``):
- ttl_dedup: key = value % 1k keys, member = value % 50k (so ~98% of
  arrivals are duplicates within a key's TTL window — the dedup-heavy
  regime), event time = rate timestamp.
- neardup_gate: ~20-token pseudo-docs over a 500-word vocabulary with
  value-seeded drift; bands/shingles at the q178 defaults. This is the
  EXPENSIVE twin (per-doc MinHash + bucket-state verify in Python).
- quantiles: key = value % 100, rid = value, value = a deterministic
  float spread.

Usage: python examples/streaming_throughput.py [seconds_per_op]
Env: SPARK_GRAFT_RATE (target input rows/s, default 200000; the gate
runs at RATE/20 — its per-row Python cost is orders higher by design).
Prints one JSON document; results recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from franzoxide_spark.session import get_spark  # noqa: E402
from franzoxide_spark.streaming.stateful import (  # noqa: E402
    stateful_dedup_ttl,
    streaming_neardup_gate,
    streaming_quantiles,
)

RATE = int(os.environ.get("SPARK_GRAFT_RATE", "200000"))


def measure(spark, name, build, seconds: int, rows_per_s: int) -> dict:
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_s)
        .option("numPartitions", 8)
        .load()
    )
    out = build(src)
    q = (
        out.writeStream.format("noop")
        .option("checkpointLocation", f"/tmp/stream_tp/{name}_{time.time_ns()}")
        .outputMode("update" if name == "quantiles" else "append")
        .start()
    )
    try:
        time.sleep(seconds)
    finally:
        try:
            # stopping mid-micro-batch surfaces the batch's interrupt as
            # an exception on some paths — the progress history is still
            # valid, which is all this probe reads
            q.stop()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: stop raised {type(e).__name__}", file=sys.stderr)
    # Spark 4 returns StreamingQueryProgress objects; older APIs JSON str
    progress = [
        p if isinstance(p, dict) else json.loads(getattr(p, "json", p))
        for p in q.recentProgress
    ]
    rates = [
        p["processedRowsPerSecond"]
        for p in progress[1:]
        if p.get("numInputRows", 0) > 0
    ]
    batches = [
        p["batchDuration"] for p in progress[1:] if p.get("numInputRows", 0) > 0
    ]
    return {
        "offered_rows_per_s": rows_per_s,
        "batches_completed": len(rates),
        "processed_rows_per_s_median": round(statistics.median(rates))
        if rates
        else None,
        "processed_rows_per_s_max": round(max(rates)) if rates else None,
        "batch_ms_median": round(statistics.median(batches)) if batches else None,
    }


def main() -> None:
    seconds = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    spark = get_spark(app_name="streaming_throughput", driver_memory="8g")
    spark.sparkContext.setLogLevel("ERROR")

    def ttl(src):
        ev = src.select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % 1000).alias("user_id"),
            (F.col("value") % 50000).cast("string").alias("member"),
        )
        return stateful_dedup_ttl(ev, "user_id", "member", "ts",
                                  ttl_s=300, watermark="10 seconds")

    def gate(src):
        docs = src.select(
            F.col("value").alias("doc_id"),
            F.expr(
                "concat_ws(' ', transform(sequence(1, 20), i -> "
                "concat('w', pmod(value * i + i, 500))))"
            ).alias("text"),
        )
        return streaming_neardup_gate(docs, "doc_id", "text",
                                      threshold=0.8)

    def quant(src):
        ev = src.select(
            (F.col("value") % 100).alias("k"),
            F.col("value").alias("rid"),
            (F.pmod(F.col("value") * 2654435761, F.lit(100000)) / 100.0)
            .alias("v"),
        )
        return streaming_quantiles(ev, "k", "rid", "v", capacity=256)

    report = {"seconds_per_op": seconds, "results": {}}
    for name, build, rate in (
        ("ttl_dedup", ttl, RATE),
        ("quantiles", quant, RATE),
        ("neardup_gate", gate, max(1000, RATE // 20)),
    ):
        report["results"][name] = measure(spark, name, build, seconds, rate)
        print(name, report["results"][name], file=sys.stderr, flush=True)
    print(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
