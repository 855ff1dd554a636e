"""Physical-layout operators: z-order clustering and small-file compaction.

The write-side half of data skipping at 100 TB: parquet scans prune via
per-row-group min/max statistics, and those statistics only bite when
rows that are close in FILTER space are close in FILE space. Z-ordering
(bit-interleaving two filter dimensions into one sort key — the curve
Delta's OPTIMIZE ZORDER and Iceberg's sort orders use) makes a
two-dimensional box predicate touch a small, contiguous set of files,
where a one-dimensional sort only localizes its leading column.

``compact_output`` is the executor for q106's layout plan: rewrite a
directory into ~target-size files per Hive partition (the small-files
cure after streaming ingest).

Everything here is deterministic integer math (bit interleave) or
metadata-driven repartitioning — both engines agree exactly, so the
z-value computation is oracle-checked (q123).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints into the
    Morton (z-curve) key: x's bit i lands at position 2i, y's at 2i+1.
    Values are masked to ``bits`` first (callers bucket/scale real
    columns into that range). Pure JVM expression — map-side, codegen."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    xc = (F.col(x) if isinstance(x, str) else x).cast("long")
    yc = (F.col(y) if isinstance(y, str) else y).cast("long")
    mask = (1 << bits) - 1
    xm = xc.bitwiseAND(F.lit(mask))
    ym = yc.bitwiseAND(F.lit(mask))
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.shiftleft(
            F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i
        ).cast("long")
        out = out + F.shiftleft(
            F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1
        ).cast("long")
    return out


def sql_zorder_value(x: str, y: str, bits: int = 16) -> str:
    """DuckDB mirror of zorder_value (same masking and interleave)."""
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        terms.append(f"((({x} & {mask}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({y} & {mask}) >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    out_path: str,
    x: str,
    y: str,
    n_files: int,
    bits: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` parquet files range-partitioned and
    sorted along the z-curve of (x, y): each file covers a contiguous
    z-range, so its parquet min/max stats on BOTH x and y are tight and
    a box predicate prunes to the few files whose curve segment crosses
    the box. One range-exchange (sampled boundaries), sort within files,
    no other shuffle."""
    zv = zorder_value(x, y, bits).alias("__z")
    (
        df.withColumn("__z", zv)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_path)
    )


def compact_output(
    spark,
    in_path: str,
    out_path: str,
    target_bytes: int,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Rewrite ``in_path`` into ~``target_bytes`` files (per Hive
    partition when ``partition_cols`` is given) — the executor for the
    q106 layout plan. Returns a 1-row-per-partition report
    ``(partition, n_files)`` of what was written.

    File counts derive from the ACTUAL input bytes (driver-side file
    listing — metadata only, never data). The partitioned path writes
    one job per partition value for EXACT per-partition file counts;
    each job's filter prunes to that partition's files when the input
    is itself hive-partitioned on ``partition_cols`` (the normal
    compaction input). On an UNPARTITIONED input every job re-scans the
    full relation — acceptable for the handful-of-partitions case, and
    the single-partition path below stays one read + one write."""
    import math
    import os

    total = 0
    for root, _dirs, files in os.walk(in_path):
        for fname in files:
            if fname.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, fname))
    df = spark.read.parquet(in_path)
    if partition_cols:
        # per-partition sizes approximated by row share of total bytes
        rows = df.groupBy(*partition_cols).count().collect()
        all_rows = sum(r["count"] for r in rows) or 1
        report = []
        first = True
        for r in rows:
            part_df = df
            for c in partition_cols:
                # eqNullSafe: a NULL partition value is a real group
                # (groupBy keeps it) and `col == None` is never true —
                # a plain == silently wrote ZERO rows for the NULL
                # partition while still reporting it (r13 review)
                part_df = part_df.filter(F.col(c).eqNullSafe(F.lit(r[c])))
            n = max(
                1,
                math.ceil(total * (r["count"] / all_rows) / target_bytes),
            )
            (
                part_df.repartition(n)
                .write.mode("overwrite" if first else "append")
                .partitionBy(*partition_cols)
                .parquet(out_path)
            )
            first = False
            report.append(
                ("/".join(str(r[c]) for c in partition_cols), n)
            )
    else:
        n = max(1, math.ceil(total / target_bytes))
        df.repartition(n).write.mode("overwrite").parquet(out_path)
        report = [("", n)]
    return spark.createDataFrame(report, "partition string, n_files int")
