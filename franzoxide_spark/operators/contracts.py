"""Data contracts: declarative constraint validation over a table.

The admission gate a pipeline runs before trusting a new drop of data —
the shape dbt tests / Great Expectations standardized: a rule list
evaluated into one violations report ``(rule, n_violations, passed)``.

Rule kinds:
- ``not_null(col)``             — col IS NULL counts
- ``unique(cols)``              — rows beyond the first per key
- ``accepted_values(col, vals)``— col outside the enumerated set
- ``in_range(col, lo, hi)``     — col outside [lo, hi]
- ``foreign_key(col, dim_df, dim_col)`` — col values absent from the
  dimension (anti-join; the dim side broadcasts when small)
- ``expression(sql)``           — rows where the SQL predicate is FALSE

Scale shape: every row-local rule folds into ONE aggregate pass over a
single scan (a sum of conditionals per rule — no per-rule scans);
``unique`` adds one shuffle on its key; each ``foreign_key`` adds one
anti-join against its dimension. The report is |rules| rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class Rule:
    name: str
    kind: str
    params: dict[str, Any] = field(default_factory=dict)


def not_null(col: str) -> Rule:
    return Rule(f"not_null({col})", "not_null", {"col": col})


def unique(*cols: str) -> Rule:
    return Rule(f"unique({','.join(cols)})", "unique", {"cols": list(cols)})


def accepted_values(col: str, values: list) -> Rule:
    return Rule(
        f"accepted_values({col})", "accepted_values",
        {"col": col, "values": list(values)},
    )


def in_range(col: str, lo, hi) -> Rule:
    return Rule(f"in_range({col})", "in_range", {"col": col, "lo": lo, "hi": hi})


def foreign_key(col: str, dim: DataFrame, dim_col: str) -> Rule:
    return Rule(
        f"foreign_key({col})", "foreign_key",
        {"col": col, "dim": dim, "dim_col": dim_col},
    )


def expression(name: str, sql_predicate: str) -> Rule:
    return Rule(name, "expression", {"sql": sql_predicate})


def _row_local_violation(rule: Rule):
    p = rule.params
    if rule.kind == "not_null":
        return F.col(p["col"]).isNull()
    if rule.kind == "accepted_values":
        return ~F.col(p["col"]).isin(p["values"]) | F.col(p["col"]).isNull()
    if rule.kind == "in_range":
        c = F.col(p["col"])
        return c.isNull() | (c < F.lit(p["lo"])) | (c > F.lit(p["hi"]))
    if rule.kind == "expression":
        # violation = predicate NOT satisfied (null-safe: null -> violation)
        return ~F.coalesce(F.expr(p["sql"]), F.lit(False))
    return None


def validate_contracts(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule; returns ``(rule, n_violations bigint,
    passed boolean)`` ordered as given."""
    if not rules:
        raise ValueError("rules must be non-empty")
    # an unrecognized kind must fail LOUDLY up front: the Rule dataclass
    # is public, and a typo'd kind previously contributed NO report row
    # — the admission gate passed every other rule while the typo'd
    # check simply never ran (r13 review)
    known = {
        "not_null", "accepted_values", "in_range", "expression",
        "unique", "foreign_key",
    }
    unknown = [r.name for r in rules if r.kind not in known]
    if unknown:
        raise ValueError(
            f"validate_contracts: unknown rule kind for {unknown!r} — "
            f"supported kinds: {sorted(known)}"
        )
    spark = df.sparkSession
    reports: list[DataFrame] = []

    # one aggregate pass for ALL row-local rules
    local = [(r, _row_local_violation(r)) for r in rules]
    local = [(r, v) for r, v in local if v is not None]
    if local:
        agg = df.agg(
            *[
                F.sum(v.cast("long")).alias(f"__v{i}")
                for i, (_, v) in enumerate(local)
            ]
        )
        row = F.array(
            *[
                F.struct(
                    F.lit(r.name).alias("rule"),
                    F.coalesce(F.col(f"__v{i}"), F.lit(0)).alias("n_violations"),
                )
                for i, (r, _) in enumerate(local)
            ]
        )
        reports.append(
            agg.select(F.explode(row).alias("r")).select("r.*")
        )

    for r in rules:
        if r.kind == "unique":
            cols = r.params["cols"]
            dup = (
                df.groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("__n"))
                .agg(
                    F.coalesce(
                        F.sum(F.greatest(F.col("__n") - 1, F.lit(0))), F.lit(0)
                    ).alias("n_violations")
                )
                .select(F.lit(r.name).alias("rule"), "n_violations")
            )
            reports.append(dup)
        elif r.kind == "foreign_key":
            p = r.params
            missing = (
                df.select(F.col(p["col"]))
                .filter(F.col(p["col"]).isNotNull())
                .join(
                    p["dim"].select(
                        F.col(p["dim_col"]).alias(p["col"])
                    ).distinct(),
                    p["col"],
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).alias("n_violations"))
                .select(F.lit(r.name).alias("rule"), "n_violations")
            )
            reports.append(missing)

    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    order = {r.name: i for i, r in enumerate(rules)}
    order_expr = F.when(F.col("rule") == list(order)[0], 0)
    for name, i in list(order.items())[1:]:
        order_expr = order_expr.when(F.col("rule") == name, i)
    return (
        out.withColumn("__o", order_expr)
        .orderBy("__o")
        .select(
            "rule",
            F.col("n_violations").cast("bigint").alias("n_violations"),
            (F.col("n_violations") == 0).alias("passed"),
        )
    )


def quarantine_split(
    df: DataFrame, rules: list[Rule]
) -> tuple[DataFrame, DataFrame]:
    """Row-level contract side-output: returns (good, bad) where ``bad``
    carries a ``violated`` column naming the failed ROW-LOCAL rules
    (comma-joined in rule order — deterministic). This is the streaming
    dead-letter shape: inside foreachBatch, write ``good`` to the main
    sink and ``bad`` to quarantine, so one malformed record never stalls
    the pipeline. Table-level rules (unique/foreign_key) have no
    single-row blame and are rejected here — run validate_contracts for
    those."""
    if not rules:
        raise ValueError("rules must be non-empty")
    bad_kinds = [r.name for r in rules if _row_local_violation(r) is None]
    if bad_kinds:
        raise ValueError(
            f"quarantine_split takes row-local rules only; got {bad_kinds}"
        )
    marks = [
        F.when(_row_local_violation(r), F.lit(r.name)) for r in rules
    ]
    tagged = df.withColumn("violated", F.concat_ws(",", *marks))
    good = tagged.filter(F.col("violated") == "").drop("violated")
    bad = tagged.filter(F.col("violated") != "")
    return good, bad
