"""Plan introspection: the engine's own scale-audit, queryable as data.

``plan_report`` condenses a DataFrame's physical plan into the handful
of numbers a reviewer checks before letting a query near 100 TB — scan
pushdown, join strategies, exchange count, Python-boundary presence,
codegen coverage. The same properties tests/test_plans.py pins for the
registry queries, exposed as an operator so a pipeline can gate on them
("fail the deploy if this plan gained a SortMergeJoin or lost its
pushed filter") instead of re-deriving them from explain() text by hand.

Driver-side only (parses the formatted explain string — metadata, never
data); returns a 1-row DataFrame so reports compose with plain filters.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_summary(df: DataFrame) -> dict:
    """Dict form of the report (see plan_report for the column story)."""
    spark = df.sparkSession
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # Count nodes from the DETAILS section headers — exactly one
    # `(N) NodeName` line per node, with or without a codegen suffix.
    # The old substring-count//2 heuristic double-counted nodes whose
    # name appears once per section but not in both (r13 review:
    # n_scans/n_python_stages counted 2 per node; "Sort " missed the
    # AQE details header entirely, flooring n_sorts to 0).
    from collections import Counter

    headers = Counter(
        m.strip()
        for m in re.findall(
            r"^\(\d+\) ([^\n\[]+?)(?: \[codegen id : \d+\])?\s*$",
            plan,
            re.M,
        )
    )

    def nodes(prefix: str) -> int:
        return sum(v for k, v in headers.items() if k.startswith(prefix))

    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    read_schemas = re.findall(r"ReadSchema: [^\n]*struct<([^>]*)>", plan)
    return {
        "n_scans": nodes("Scan parquet") + nodes("BatchScan"),
        "n_pushed_filters": sum(
            len([f for f in p.split(",") if f.strip()]) for p in pushed
        ),
        "scan_columns": sum(
            len([c for c in rs.split(",") if c.strip()]) for rs in read_schemas
        ),
        "n_exchanges": plan.count("Arguments: hashpartitioning(")
        + plan.count("Arguments: rangepartitioning("),
        "n_broadcast_joins": nodes("BroadcastHashJoin"),
        "n_sortmerge_joins": nodes("SortMergeJoin"),
        "n_shuffledhash_joins": nodes("ShuffledHashJoin"),
        "n_nested_loop_joins": nodes("BroadcastNestedLoopJoin")
        + nodes("CartesianProduct"),
        "n_aggregates": nodes("HashAggregate")
        + nodes("SortAggregate")
        + nodes("ObjectHashAggregate"),
        # exact name: SortAggregate / SortMergeJoin must not count here
        "n_sorts": headers.get("Sort", 0),
        "n_python_stages": nodes("ArrowEvalPython")
        + nodes("FlatMapGroupsInPandas")
        + nodes("MapInPandas")
        + nodes("BatchEvalPython"),
        # NOTE: whole-stage-codegen span ids are only assigned in the FINAL
        # adaptive plan (post-execution) — under AQE the static explain
        # carries none, so a codegen count is deliberately absent here
        "has_global_sort": "rangepartitioning(" in plan
        and "TakeOrderedAndProject" not in plan,
    }


def plan_report(df: DataFrame) -> DataFrame:
    """1-row report over ``df``'s physical plan:

    ``n_scans, n_pushed_filters, scan_columns, n_exchanges,
    n_broadcast_joins, n_sortmerge_joins, n_shuffledhash_joins,
    n_nested_loop_joins, n_aggregates, n_sorts, n_python_stages,
    has_global_sort`` — e.g. gate a deploy on
    ``n_nested_loop_joins == 0`` or alert when ``n_pushed_filters``
    drops to 0 on a scan that used to prune."""
    s = plan_summary(df)
    spark = df.sparkSession
    return spark.createDataFrame(
        [tuple(s.values())],
        ", ".join(
            f"{k} {'boolean' if isinstance(v, bool) else 'int'}"
            for k, v in s.items()
        ),
    )


def parquet_layout_report(spark, paths: list[str]) -> DataFrame:
    """Distributed parquet FOOTER introspection: per (file, column) the
    row-group count, row count, compressed/uncompressed byte totals, the
    ratio, and the encoding set — the evidence behind every layout
    decision (compaction q123, target file size q106, z-ordering).

    Scale shape: footers only — no data pages are ever read, so cost is
    O(#files), and the file list distributes via mapInPandas (each
    executor opens only its batch's footers). At 100 TB with ~100k files
    this is a seconds-long metadata sweep; the same op over file CONTENT
    would be the full corpus scan this exists to avoid.
    """
    import os

    import pandas as pd

    # A table "path" at real scale is a DIRECTORY of part-files (every
    # Spark-written table; the 10x replica fixtures surfaced this as a
    # hard failure — pq.ParquetFile cannot open a directory). Expand
    # directories to their data files driver-side (names only, no
    # footer reads here); hidden/marker entries (_SUCCESS, .crc) are
    # skipped the same way Spark's own file index skips them.
    expanded: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, names in os.walk(p):
                for n in sorted(names):
                    if not n.startswith(("_", ".")):
                        expanded.append(os.path.join(root, n))
        else:
            expanded.append(p)

    files = spark.createDataFrame([(p,) for p in expanded], "path string")

    def read_footers(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for path in pdf["path"]:
                md = pq.ParquetFile(path).metadata
                per_col: dict = {}
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        c = g.column(ci)
                        name = c.path_in_schema
                        e = per_col.setdefault(name, [0, 0, set(), set()])
                        e[0] += c.total_compressed_size
                        e[1] += c.total_uncompressed_size
                        e[2].update(str(x) for x in c.encodings)
                        # codecs accumulate as a set too: a column's codec
                        # may legally differ across row groups (e.g. after
                        # mixed-writer compaction — exactly what this
                        # report exists to surface)
                        e[3].add(str(c.compression))
                for name, (comp, uncomp, encs, codecs) in sorted(
                    per_col.items()
                ):
                    rows.append(
                        (
                            path.rsplit("/", 1)[-1],
                            name,
                            md.num_row_groups,
                            md.num_rows,
                            comp,
                            uncomp,
                            round(uncomp / comp, 4) if comp else None,
                            ",".join(sorted(codecs)),
                            ",".join(sorted(encs)),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file", "column", "n_row_groups", "n_rows",
                    "compressed_bytes", "uncompressed_bytes", "ratio",
                    "codec", "encodings",
                ],
            )

    return files.mapInPandas(
        read_footers,
        schema=(
            "file string, column string, n_row_groups int, n_rows long,"
            " compressed_bytes long, uncompressed_bytes long, ratio double,"
            " codec string, encodings string"
        ),
    )
