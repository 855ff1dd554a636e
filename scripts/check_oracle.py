"""Driver-style oracle check, runnable locally for a subset of queries.

Usage: python scripts/check_oracle.py [qname ...]   (default: all oracles)

Mirrors the driver's compare: run the Spark query and the DuckDB oracle on
the same sf0.01 parquet, sort columns by name, compare row count, schema
(column names), and an order-insensitive value hash.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from franzoxide_spark import queries as q  # noqa: E402
from franzoxide_spark.session import get_spark  # noqa: E402
from franzoxide_spark.tables import TABLES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _hash(df: pd.DataFrame) -> int:
    # Sort by the SAME rendering that is hashed: sorting on full-precision
    # str() while hashing at .6g lets benign cross-engine float noise
    # reorder tolerance-identical rows differently per engine -> spurious
    # mismatch.
    df = df.reindex(sorted(df.columns), axis=1)
    rendered = df.map(lambda v: f"{v:.6g}" if isinstance(v, float) else str(v))
    rendered = rendered.sort_values(by=list(rendered.columns)).reset_index(
        drop=True
    )
    return hash(tuple(map(tuple, rendered.itertuples(index=False))))


def main() -> int:
    q.load_all()
    names = sys.argv[1:] or sorted(q.ORACLES)
    spark = get_spark(app_name="oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    bad = 0
    for name in names:
        if name not in q.ORACLES:
            print(f"{name}: SKIP (no oracle)")
            continue
        try:
            sdf = q.QUERIES[name](spark, SF_DIR).toPandas()
            odf = con.execute(q.ORACLES[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERR {type(e).__name__}: {e}")
            bad += 1
            continue
        rows = len(sdf) == len(odf)
        cols = sorted(sdf.columns) == sorted(odf.columns)
        vals = rows and cols and _hash(sdf) == _hash(odf)
        status = "OK" if (rows and cols and vals) else "MISMATCH"
        if status != "OK":
            bad += 1
            print(f"{name}: {status} rows={len(sdf)}/{len(odf)} "
                  f"cols_match={cols} hash_match={vals}")
        else:
            print(f"{name}: OK ({len(sdf)} rows)")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
