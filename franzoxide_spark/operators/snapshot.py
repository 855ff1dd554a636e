"""Snapshot diff: the row-level companion to the q104 table checksum.

q104 answers "are these two copies identical?" with two numbers; when
they are NOT, this operator answers "which rows differ, and how" —
the audit a 100 TB migration/replication/backfill needs before anyone
trusts the new copy. Rows are compared by a canonical fingerprint
(injective tag+length-prefixed rendering -> md5 prefix, the same
canonicalization q104 sums), keyed on a unique id column.

Scale shape: each side computes its fingerprint MAP-SIDE (the document
payload never travels — only id + 16-char fingerprint shuffle), then ONE
full-outer hash join on the id. Output is only the differing rows, which
for a sane migration is millions of times smaller than the input.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canon_expr_spark(c: str) -> str:
    """Injective per-column rendering (Spark-SQL text): ``N`` for NULL,
    else ``V<len>:<value>``. The old ``'|'``-joined COALESCE rendering
    was delimiter-ambiguous — ('x|y', 'z') and ('x', 'y|z') both became
    ``x|y|z``, and a real ``'<null>'`` string collided with NULL — so
    the very audit meant to certify a migration could report "no
    change" for changed rows (r13 review). The tag separates NULL from
    every value; the length prefix makes the joined string parseable
    left-to-right, so no two distinct column tuples render alike."""
    v = f"cast({c} as string)"
    return (
        f"case when {c} is null then 'N' "
        f"else concat('V', cast(length({v}) as string), ':', {v}) end"
    )


def canon_expr_duckdb(c: str) -> str:
    """DuckDB mirror of :func:`canon_expr_spark` — identical rendering."""
    v = f"CAST({c} AS VARCHAR)"
    return (
        f"CASE WHEN {c} IS NULL THEN 'N' "
        f"ELSE 'V' || CAST(LENGTH({v}) AS VARCHAR) || ':' || {v} END"
    )


def _fingerprint(cols: Sequence[str]):
    return F.substring(
        F.md5(
            F.concat_ws("|", *[F.expr(canon_expr_spark(c)) for c in cols])
        ),
        1,
        16,
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    compare_cols: Sequence[str],
) -> DataFrame:
    """Rows differing between two snapshots of an id-unique table:
    ``(id_col, change)`` with change ``added`` (id only in ``new``),
    ``removed`` (only in ``old``), or ``changed`` (both, fingerprint of
    ``compare_cols`` differs). Identical rows are absent from the output.

    ``id_col`` must be unique within each snapshot — with duplicate ids a
    row-level diff is ill-defined (which copy changed?); dedupe or pick a
    compound key first.
    """
    if not compare_cols:
        raise ValueError("compare_cols must be non-empty")
    o = old.select(F.col(id_col), _fingerprint(compare_cols).alias("__fp_o"))
    n = new.select(F.col(id_col), _fingerprint(compare_cols).alias("__fp_n"))
    change = (
        F.when(F.col("__fp_o").isNull(), F.lit("added"))
        .when(F.col("__fp_n").isNull(), F.lit("removed"))
        .when(F.col("__fp_o") != F.col("__fp_n"), F.lit("changed"))
    )
    return (
        o.join(n, id_col, "full_outer")
        .withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(id_col, "change")
    )


def sql_snapshot_diff(
    old_rel: str,
    new_rel: str,
    id_col: str,
    compare_cols: Sequence[str],
) -> str:
    """DuckDB mirror: same fingerprint canonicalization, same full-outer
    shape. ``old_rel``/``new_rel`` are relation expressions (table names
    or parenthesized subqueries)."""
    fp = (
        "substr(md5("
        + " || '|' || ".join(canon_expr_duckdb(c) for c in compare_cols)
        + "), 1, 16)"
    )
    return f"""
WITH o AS (SELECT {id_col}, {fp} AS fp_o FROM {old_rel}),
n AS (SELECT {id_col}, {fp} AS fp_n FROM {new_rel}),
j AS (
  SELECT COALESCE(o.{id_col}, n.{id_col}) AS {id_col}, fp_o, fp_n
  FROM o FULL OUTER JOIN n ON o.{id_col} = n.{id_col}
)
SELECT {id_col},
       CASE WHEN fp_o IS NULL THEN 'added'
            WHEN fp_n IS NULL THEN 'removed'
            WHEN fp_o <> fp_n THEN 'changed'
       END AS change
FROM j
WHERE fp_o IS NULL OR fp_n IS NULL OR fp_o <> fp_n
"""


def scd2_merge(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    compare_cols: Sequence[str],
    t_old: str,
    t_new: str,
) -> DataFrame:
    """Slowly-changing-dimension type 2 from two snapshots: one row per
    VERSION of each entity — ``(id_col, version_fp, valid_from,
    valid_to, is_current)`` — where a changed or removed row's old
    version closes at ``t_new`` and changed/new rows open a current
    version at ``t_new``. The dimension-history pattern a warehouse
    maintains so facts can join the attributes as-of their event time.

    Same canonical fingerprint as snapshot_diff/q104 (injective
    tag+length rendering); ``id_col`` must be unique per snapshot. Scale shape:
    map-side fingerprints, ONE full-outer join on the id, map-side
    version construction — the attribute payload never shuffles.
    """
    if not compare_cols:
        raise ValueError("compare_cols must be non-empty")
    o = old.select(F.col(id_col), _fingerprint(compare_cols).alias("__fp_o"))
    n = new.select(F.col(id_col), _fingerprint(compare_cols).alias("__fp_n"))
    j = o.join(n, id_col, "full_outer")
    same = F.col("__fp_o") == F.col("__fp_n")
    # both version rows come out of ONE pass over the joined relation
    # (map-side array build + explode) — a union of two filtered branches
    # would re-execute the full-outer join per branch (observed as a
    # doubled join in the physical plan before this restructure)
    old_version = F.when(
        F.col("__fp_o").isNotNull(),
        F.struct(
            F.col("__fp_o").alias("version_fp"),
            F.lit(t_old).alias("valid_from"),
            F.when(same, F.lit(None).cast("string"))
            .otherwise(F.lit(t_new))
            .alias("valid_to"),
            F.coalesce(same, F.lit(False)).alias("is_current"),
        ),
    )
    new_version = F.when(
        F.col("__fp_n").isNotNull() & (F.col("__fp_o").isNull() | ~same),
        F.struct(
            F.col("__fp_n").alias("version_fp"),
            F.lit(t_new).alias("valid_from"),
            F.lit(None).cast("string").alias("valid_to"),
            F.lit(True).alias("is_current"),
        ),
    )
    versions = F.filter(
        F.array(old_version, new_version), lambda x: x.isNotNull()
    )
    return j.select(
        F.col(id_col), F.explode(versions).alias("__v")
    ).select(id_col, "__v.*")


def sql_scd2_merge(
    old_rel: str,
    new_rel: str,
    id_col: str,
    compare_cols: Sequence[str],
    t_old: str,
    t_new: str,
) -> str:
    """DuckDB mirror of scd2_merge."""
    fp = (
        "substr(md5("
        + " || '|' || ".join(canon_expr_duckdb(c) for c in compare_cols)
        + "), 1, 16)"
    )
    return f"""
WITH o AS (SELECT {id_col}, {fp} AS fp_o FROM {old_rel}),
n AS (SELECT {id_col}, {fp} AS fp_n FROM {new_rel}),
j AS (
  SELECT COALESCE(o.{id_col}, n.{id_col}) AS {id_col}, fp_o, fp_n
  FROM o FULL OUTER JOIN n ON o.{id_col} = n.{id_col}
)
SELECT {id_col}, fp_o AS version_fp,
       '{t_old}' AS valid_from,
       CASE WHEN fp_n IS NOT NULL AND fp_o = fp_n THEN NULL
            ELSE '{t_new}' END AS valid_to,
       COALESCE(fp_o = fp_n, FALSE) AS is_current
FROM j WHERE fp_o IS NOT NULL
UNION ALL
SELECT {id_col}, fp_n AS version_fp,
       '{t_new}' AS valid_from,
       NULL AS valid_to,
       TRUE AS is_current
FROM j WHERE fp_n IS NOT NULL AND (fp_o IS NULL OR fp_o <> fp_n)
"""


def pit_join(
    facts: DataFrame,
    dim_history: DataFrame,
    key_col: str,
    ts_col: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Point-in-time join: each fact row picks the dimension VERSION that
    was valid at its event time — ``from_col <= ts < to_col`` (half-open,
    so version boundaries never double-match). The read-side counterpart
    of scd2_merge: facts join history, not the current snapshot, which is
    what makes backfilled training features leak-free.

    Scale shape: an equi-join on the key with the validity bounds as a
    RESIDUAL predicate (same plan family as q09's range join) — never a
    nested loop. Version counts per key are small by construction (SCD2
    history), so the join fans out by history depth, not quadratically;
    a broadcastable dimension keeps the fact side shuffle-free.
    """
    # a NULL to_col is the OPEN-ENDED current version (exactly what
    # scd2_merge emits for current rows) — `ts < NULL` is NULL/false, so
    # without the isNull arm every fact landing in an entity's current
    # period would silently vanish from the inner join (r13 review; the
    # in-repo q154 caller only dodged this by hand-building a 9999-01-01
    # sentinel instead of consuming scd2_merge output)
    cond = (
        (facts[key_col] == dim_history[key_col])
        & (facts[ts_col] >= dim_history[from_col])
        & (
            dim_history[to_col].isNull()
            | (facts[ts_col] < dim_history[to_col])
        )
    )
    # Drop the dimension-side key: when callers rename the dim key to the
    # fact key name (q154), keeping both would make every later name-based
    # reference to the key AMBIGUOUS_REFERENCE. The fact-side key survives.
    return facts.join(dim_history, cond).drop(dim_history[key_col])
