"""Benchmark harness: runs every registered query on $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed as plan-build + execution to completion
(df.write.format("noop") would skip result materialization; we use
count-style full materialization via toPandas-free collect of the
aggregated result — queries return small results by design, except scans,
which we materialize with count()).
"""

from __future__ import annotations

import json
import os
import sys
import time

from franzoxide_spark import queries as q
from franzoxide_spark.session import get_spark



def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    q.load_all()
    spark = get_spark(app_name="franzoxide_spark_bench")

    # Warm the catalog (file listings + parquet footers for every table)
    # and the JVM/codegen paths once so per-query timings reflect a warm
    # engine, mirroring the reference's warm-session protocol.
    from franzoxide_spark.tables import TABLES, table

    for t in TABLES:
        table(spark, sf_dir, t).schema
    q.QUERIES["q02_agg_pricing_summary"](spark, sf_dir).toPandas()

    # Steady-state protocol: each query runs RUNS times on the warm
    # session and reports the fastest — one-shot Janino codegen compile
    # (~0.3-0.8s per unique plan) is a constant that vanishes at real data
    # scale and would otherwise dominate small-SF timings; the min also
    # rejects shared-host load spikes (observed 2x suite variance).
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    for name in sorted(q.QUERIES):
        fn = q.QUERIES[name]
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            # Arrow-batched materialization: executes the full plan and
            # transfers the result columnar (comparable to the DuckDB
            # reference's native fetch, unlike row-at-a-time collect()).
            fn(spark, sf_dir).toPandas()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    oracle_names = set(q.ORACLES)
    oracle_total = round(
        sum(v for k, v in timings.items() if k in oracle_names), 4
    )
    print(
        json.dumps(
            {
                "metric": "suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                # oracle-checked subset only — the apples-to-apples number
                # vs the DuckDB reference (rows-only queries have no DuckDB
                # counterpart)
                "oracle_value": oracle_total,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
