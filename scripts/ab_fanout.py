"""Interleaved fan-out A/B under the bench protocol.

Usage: python scripts/ab_fanout.py [--rounds N] qname [qname ...]

For each named query, alternates SPARK_GRAFT_FANOUT=0 (plain) and =1
(fanned) runs within ONE session, N rounds each, bench-protocol
faithful (toPandas materialization, clearCache+unpersist between runs).
Interleaving makes host-load drift hit both arms equally — the
sequential-arm version of this comparison was shown unreliable on a
noisy shared host (r16 'discarded first attempt' precedent).

Prints per-query {plain_min, fanned_min, plain_samples, fanned_samples}
and a keep/revert suggestion (>10% margin on the min).
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
    rounds = 4
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--rounds":
            rounds = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    q.load_all()
    spark = get_spark(app_name="ab_fanout")
    spark.sparkContext.setLogLevel("ERROR")
    from franzoxide_spark.tables import TABLES, table

    for t in TABLES:
        table(spark, sf_dir, t).schema
    q.QUERIES["q02_agg_pricing_summary"](spark, sf_dir).toPandas()
    _clear(spark)

    out: dict[str, dict] = {}
    for name in names:
        fn = q.QUERIES[name]
        arms: dict[str, list[float]] = {"plain": [], "fanned": []}
        # one untimed warm run per query (codegen compile) so neither arm
        # eats the first-touch cost
        fn(spark, sf_dir).toPandas()
        _clear(spark)
        for _ in range(rounds):
            for arm, lever in (("plain", "0"), ("fanned", "1")):
                os.environ["SPARK_GRAFT_FANOUT"] = lever
                t0 = time.perf_counter()
                fn(spark, sf_dir).toPandas()
                arms[arm].append(round(time.perf_counter() - t0, 4))
                _clear(spark)
        os.environ.pop("SPARK_GRAFT_FANOUT", None)
        p, f = min(arms["plain"]), min(arms["fanned"])
        verdict = (
            "KEEP fanned" if f < p * 0.9
            else ("REVERT to plain" if p < f * 0.9 else "flat")
        )
        out[name] = {
            "plain_min": p,
            "fanned_min": f,
            "verdict": verdict,
            "plain": arms["plain"],
            "fanned": arms["fanned"],
        }
        print(json.dumps({name: out[name]}), flush=True)
    print("== SUMMARY ==")
    for name, r in out.items():
        print(f"{name}: plain {r['plain_min']} fanned {r['fanned_min']} -> {r['verdict']}")


if __name__ == "__main__":
    main()
