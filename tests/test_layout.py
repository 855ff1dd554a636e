"""Physical-layout operators (operators/layout.py): z-order locality,
z-ordered writes, and the small-file compactor."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from franzoxide_spark.operators.layout import (
    compact_output,
    zorder_value,
    zorder_write,
)


def _grid(spark, n=64):
    return spark.range(n * n).selectExpr(
        f"cast(id % {n} as long) as x", f"cast(id / {n} as long) as y",
        "id as rid",
    )


def test_zorder_localizes_both_dimensions(spark):
    """The property the curve exists for: bucketing files along z-order
    keeps BOTH an x-box and a y-box query inside a few buckets, while a
    linear (x, y) sort localizes only x — a y-only predicate touches
    every file."""
    n, buckets = 64, 16
    df = _grid(spark, n)
    w_z = F.ntile(buckets).over(Window.orderBy(zorder_value("x", "y", 6)))
    w_lin = F.ntile(buckets).over(Window.orderBy("x", "y"))
    tagged = df.select("x", "y", w_z.alias("zb"), w_lin.alias("lb")).cache()

    def touched(col, cond):
        return tagged.filter(cond).select(col).distinct().count()

    y_box = (F.col("y") >= 16) & (F.col("y") < 24)
    x_box = (F.col("x") >= 16) & (F.col("x") < 24)
    # linear layout: y-only predicate touches EVERY bucket
    assert touched("lb", y_box) == buckets
    # z-order layout: both single-dimension boxes stay in a fraction
    assert touched("zb", y_box) <= buckets // 2
    assert touched("zb", x_box) <= buckets // 2
    # and the 2-D box is highly local on the curve
    assert touched("zb", x_box & y_box) <= 4
    tagged.unpersist()


def test_zorder_write_round_trips_and_files_cover_zranges(spark, tmp_path):
    out = str(tmp_path / "z")
    df = _grid(spark, 32)
    zorder_write(df, out, "x", "y", n_files=8, bits=5)
    back = spark.read.parquet(out)
    assert back.count() == 32 * 32
    assert back.exceptAll(df).count() == 0
    files = glob.glob(out + "/*.parquet")
    assert len(files) == 8
    # each file covers a contiguous, non-overlapping z-range
    ranges = []
    for f in files:
        zf = spark.read.parquet(f).select(
            zorder_value("x", "y", 5).alias("z")
        )
        row = zf.agg(F.min("z").alias("lo"), F.max("z").alias("hi")).first()
        ranges.append((row["lo"], row["hi"]))
    ranges.sort()
    for (_, hi_prev), (lo, _) in zip(ranges, ranges[1:]):
        assert lo > hi_prev, f"overlapping z-ranges: {ranges}"


def test_zorder_value_rejects_bad_bits(spark):
    with pytest.raises(ValueError, match="bits"):
        zorder_value("x", "y", 0)


def test_compact_output_hits_target_file_count(spark, tmp_path):
    src = str(tmp_path / "small_files")
    # simulate streaming ingest debris: 40 tiny files
    spark.range(20000).selectExpr(
        "id", "cast(id % 7 as int) as k", "repeat('x', 64) as pad"
    ).repartition(40).write.parquet(src)
    assert len(glob.glob(src + "/*.parquet")) == 40
    import os

    total = sum(
        os.path.getsize(f) for f in glob.glob(src + "/*.parquet")
    )
    out = str(tmp_path / "compacted")
    report = compact_output(spark, src, out, target_bytes=total // 3 + 1)
    n_files = len(glob.glob(out + "/*.parquet"))
    assert n_files == 3
    assert {r["n_files"] for r in report.collect()} == {3}
    # content survives the rewrite
    a = spark.read.parquet(src)
    b = spark.read.parquet(out)
    assert a.count() == b.count() and a.exceptAll(b).count() == 0


def test_compact_output_partitioned(spark, tmp_path):
    src = str(tmp_path / "psrc")
    spark.range(9000).selectExpr(
        "id", "cast(id % 3 as int) as k", "repeat('y', 32) as pad"
    ).repartition(30).write.parquet(src)
    out = str(tmp_path / "pout")
    report = compact_output(
        spark, src, out, target_bytes=10**9, partition_cols=["k"]
    )
    # huge target -> one file per partition
    per_part = {r["partition"]: r["n_files"] for r in report.collect()}
    assert per_part == {"0": 1, "1": 1, "2": 1}
    for k in (0, 1, 2):
        assert len(glob.glob(out + f"/k={k}/*.parquet")) == 1
    assert spark.read.parquet(out).count() == 9000
