"""Isolated per-query A/B measurement, bench-protocol-faithful.

Usage: python scripts/isolate_bench.py [--runs N] [--explain] qname [qname ...]

Mirrors bench.py's measurement exactly (warm session, toPandas
materialization, min-of-N with clearCache between runs) but isolates the
named queries so host-window noise from a 176-query suite is out of the
picture.  With --explain, also writes .explain("formatted") output to
stdout per query.  Environment: SPARK_GRAFT_SF_DIR (default sf0.1),
SPARK_GRAFT_CPUS.
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
    args = sys.argv[1:]
    runs = 5
    explain = False
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif args[i] == "--explain":
            explain = True
            i += 1
        else:
            names.append(args[i])
            i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    q.load_all()
    spark = get_spark(app_name="isolate_bench")
    spark.sparkContext.setLogLevel("ERROR")
    # same warm-up as bench.py
    from franzoxide_spark.tables import TABLES, table

    for t in TABLES:
        table(spark, sf_dir, t).schema
    q.QUERIES["q02_agg_pricing_summary"](spark, sf_dir).toPandas()
    _clear(spark)

    out: dict[str, dict] = {}
    for name in names:
        fn = q.QUERIES[name]
        spark.sparkContext.setJobDescription(name)
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).toPandas()
            samples.append(round(time.perf_counter() - t0, 4))
            _clear(spark)
        out[name] = {"min": min(samples), "samples": samples}
        spark.sparkContext.setJobDescription(None)
    if explain:
        for name in names:
            df = q.QUERIES[name](spark, sf_dir)
            print(f"===== {name} =====")
            print(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
