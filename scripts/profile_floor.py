"""Split a query's wall time into plan-build (Python DataFrame
construction, py4j traffic), analysis+optimization, and execution.

Usage: python scripts/profile_floor.py qname [qname ...]

For each query, min-of-5 of: (a) fn(spark, sf_dir) alone (lazy plan
build), (b) .toPandas() on a pre-built DataFrame (execution incl.
planning), (c) the full bench-protocol fn+toPandas. Also counts jobs
via a SparkListener-free proxy (statusTracker job ids before/after).
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from franzoxide_spark import queries as q  # noqa: E402
from franzoxide_spark.session import get_spark  # noqa: E402


def _clear(spark) -> None:
    try:
        spark.catalog.clearCache()
        for rdd in dict(spark.sparkContext._jsc.getPersistentRDDs()).values():
            rdd.unpersist(False)
    except Exception:  # noqa: BLE001
        pass


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    q.load_all()
    spark = get_spark(app_name="profile_floor")
    spark.sparkContext.setLogLevel("ERROR")
    from franzoxide_spark.tables import TABLES, table

    for t in TABLES:
        table(spark, sf_dir, t).schema
    q.QUERIES["q02_agg_pricing_summary"](spark, sf_dir).toPandas()
    _clear(spark)

    tracker = spark.sparkContext.statusTracker
    out: dict[str, dict] = {}
    for name in names:
        fn = q.QUERIES[name]
        build, execute, full = [], [], []
        jobs = stages = 0
        for i in range(5):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            j0 = tracker().getJobIdsForGroup(None)
            df.toPandas()
            t2 = time.perf_counter()
            j1 = tracker().getJobIdsForGroup(None)
            build.append(round(t1 - t0, 4))
            execute.append(round(t2 - t1, 4))
            full.append(round(t2 - t0, 4))
            if i == 4:
                jobs = len(set(j1) - set(j0))
            _clear(spark)
        out[name] = {
            "build_min": min(build),
            "exec_min": min(execute),
            "full_min": min(full),
            "jobs_last_run": jobs,
            "build": build,
            "exec": execute,
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
