"""Plan introspection (operators/introspect.py): the report must agree
with the hand-audited plan properties test_plans.py pins."""

from __future__ import annotations

from franzoxide_spark.operators.introspect import plan_report, plan_summary
from franzoxide_spark.queries import QUERIES, load_all

load_all()


def test_report_on_broadcast_chain(spark, sf_dir):
    s = plan_summary(QUERIES["q05_broadcast_dim_chain"](spark, sf_dir))
    assert s["n_broadcast_joins"] == 3
    assert s["n_sortmerge_joins"] == 0
    assert s["n_nested_loop_joins"] == 0
    assert s["n_python_stages"] == 0


def test_report_sees_pushdown_and_pruning(spark, sf_dir):
    s = plan_summary(QUERIES["q01_scan_filter_project"](spark, sf_dir))
    assert s["n_pushed_filters"] >= 2  # IsNotNull + LessThanOrEqual
    assert s["scan_columns"] == 5  # 4 projected + the filter column
    assert s["n_exchanges"] == 0


def test_report_sees_python_boundary(spark, sf_dir):
    s = plan_summary(QUERIES["q47_pandas_udf_score"](spark, sf_dir))
    assert s["n_python_stages"] >= 1


def test_report_composes_as_dataframe(spark, sf_dir):
    rep = plan_report(QUERIES["q03_join_agg_mktsegment"](spark, sf_dir))
    row = rep.collect()[0]
    assert row["n_broadcast_joins"] == 1
    assert row["n_nested_loop_joins"] == 0
    # the deploy-gate shape: a plain filter over the report
    assert rep.filter("n_nested_loop_joins = 0").count() == 1


def test_report_flags_global_sort(spark):
    import pyspark.sql.functions as F

    df = spark.range(1000).orderBy(F.desc("id"))
    s = plan_summary(df)
    assert s["has_global_sort"]
    # top-k is NOT a global sort
    s2 = plan_summary(spark.range(1000).orderBy(F.desc("id")).limit(5))
    assert not s2["has_global_sort"]


def test_parquet_layout_report_matches_pyarrow(spark, tmp_path):
    import pandas as pd
    import pyarrow.parquet as pq

    from franzoxide_spark.operators.introspect import parquet_layout_report

    p = str(tmp_path / "t.parquet")
    pd.DataFrame(
        {"a": range(1000), "b": ["x" * 20] * 1000}
    ).to_parquet(p, row_group_size=300)
    got = {
        r["column"]: r.asDict()
        for r in parquet_layout_report(spark, [p]).collect()
    }
    md = pq.ParquetFile(p).metadata
    assert md.num_row_groups == 4  # 300*3 + 100
    for col in ("a", "b"):
        assert got[col]["n_row_groups"] == 4
        assert got[col]["n_rows"] == 1000
        comp = sum(
            md.row_group(rg).column(ci).total_compressed_size
            for rg in range(4)
            for ci in range(md.row_group(rg).num_columns)
            if md.row_group(rg).column(ci).path_in_schema == col
        )
        assert got[col]["compressed_bytes"] == comp
        assert got[col]["ratio"] is not None and got[col]["codec"]


def test_parquet_layout_report_expands_directories(spark, tmp_path):
    """A table path at real scale is a DIRECTORY of part-files (every
    Spark-written table); the report must expand it to the data files
    and skip marker entries (r18 — the 10x replica surfaced a hard
    OSError: 'is a directory')."""
    out = str(tmp_path / "tdir.parquet")
    spark.range(100).selectExpr("id", "id * 2 as v").repartition(
        3
    ).write.parquet(out)
    rows = parquet_layout_report_rows(spark, out)
    # one row per (part-file, column); 3 part files x 2 columns
    files = {r["file"] for r in rows}
    assert len(files) == 3
    assert all(f.endswith(".parquet") for f in files)
    assert not any(f.startswith("_") for f in files)
    assert sum(r["n_rows"] for r in rows) == 100 * 2  # each column row
    # a (dir, plain-file) mix expands only the dir
    single = str(tmp_path / "single.parquet")
    import pandas as pd

    pd.DataFrame({"a": [1, 2, 3]}).to_parquet(single)
    from franzoxide_spark.operators.introspect import parquet_layout_report

    mixed = parquet_layout_report(spark, [out, single]).collect()
    assert {r["file"] for r in mixed} >= files | {"single.parquet"}


def parquet_layout_report_rows(spark, path):
    from franzoxide_spark.operators.introspect import parquet_layout_report

    return parquet_layout_report(spark, [path]).collect()
