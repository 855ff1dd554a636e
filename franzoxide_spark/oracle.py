"""Local DuckDB-oracle comparison harness.

Mirrors the driver's t2 gate so every query is validated locally before the
driver ever sees it: run the Spark query and the oracle SQL on the same
parquet fixtures, canonicalize (sort columns by name, round floats to 6
decimals, stringify), and compare as an order-insensitive multiset.
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pandas as pd

from franzoxide_spark.tables import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for name in TABLES:
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
            )
        return con.execute(sql).df()
    finally:
        con.close()


def _canon_value(v) -> str:
    if v is None:
        return "NULL"
    # Spark's toPandas yields BYTEARRAY for binary columns while DuckDB
    # yields BYTES — str() rendered them differently ("bytearray(b'x')"
    # vs "b'x'"), failing the compare on byte-identical results (r13
    # review). numpy float scalars (float32 never subclasses float)
    # must also take the rounding path, not str().
    if isinstance(v, (bytes, bytearray, memoryview)):
        return "0x" + bytes(v).hex()
    if type(v).__module__ == "numpy" and type(v).__name__.startswith(
        "float"
    ):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        r = round(v, 6)
        if r == 0:
            r = 0.0  # IEEE -0.0 == 0.0: never render a signed zero —
            # a value straddling ±ε rounds to -0.0 on one engine and
            # +0.0 on the other (libm last-ulp noise, r12 sf0.1 sweep)
        return f"{r:.6f}"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_value(v) for v in row))
    return out


def compare(spark_df, oracle_pdf: pd.DataFrame) -> tuple[bool, str]:
    """Order-insensitive multiset compare of a Spark DataFrame vs the oracle
    result. Returns (match, diagnostic)."""
    spark_pdf = spark_df.toPandas()
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return False, (
            f"column mismatch: spark={sorted(spark_pdf.columns)} "
            f"oracle={sorted(oracle_pdf.columns)}"
        )
    # enforce width-exact schemas (int32 vs int64 drift between engines is
    # invisible to the value hash but not to a schema comparison)
    dt = [
        (c, str(spark_pdf[c].dtype), str(oracle_pdf[c].dtype))
        for c in spark_pdf.columns
        if str(spark_pdf[c].dtype) != str(oracle_pdf[c].dtype)
    ]
    if dt:
        return False, f"dtype mismatch: {dt}"
    a = Counter(canonicalize(spark_pdf))
    b = Counter(canonicalize(oracle_pdf))
    if a == b:
        return True, f"OK rows={len(spark_pdf)}"
    only_spark = list((a - b).items())[:5]
    only_oracle = list((b - a).items())[:5]
    return False, (
        f"rows spark={len(spark_pdf)} oracle={len(oracle_pdf)}; "
        f"only-in-spark={only_spark}; only-in-oracle={only_oracle}"
    )
