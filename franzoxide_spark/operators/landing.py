"""Family-agnostic write-once/join-many landings (r16 plan item #1,
groundwork landed r15).

The dedup family proved the trade at 100 TB scale: land a relation
bucketed on its family's join/partition key once per corpus snapshot,
and every downstream pass runs exchange-free
(operators/dedup.py:land_shingle_relation / shared_shingle_relation —
markers, fingerprint adoption, staleness reclaim, all r10-r13-hardened).
This module applies the same machinery to the EVENTS family: every
user-keyed operator (rolling features, sessionization, TTL dedup,
funnels, cohorts, ...) shares one plan shape — ONE exchange on the user
key then key-bounded work — so an events table landed bucketed by the
user key retires that exchange for the whole family (measured: q177's
batch face 0.73 -> 0.31 s at sf0.1 with zero exchanges,
examples/bucketed_events_demo.py; plan-pinned in tests/test_plans.py).

The session/adoption flow REUSES dedup.py's hardened helpers (markers
with writer id + source fingerprint + file census, cross-session
adoption as an external bucketed table, stale-dir reclaim with a grace
window, per-session caches with stopped-session eviction, the
LANDING_EVENTS telemetry) — r15 parametrized the marker's bucket/sort
spec so adoption reproduces ANY landing's layout, not just the shingle
relation's ``(g)``. Registry routing (the r11 move for the dedup
family) is deliberately NOT done here — that is the recorded round-16
scope; this module lands the capability and its tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from franzoxide_spark.operators.dedup import _shared_landing


def land_events_relation(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    out_table: str,
    *,
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> DataFrame:
    """Persist ``events`` bucketed on ``key_col`` and in-bucket sorted on
    (``key_col``, ``ts_col``), and return the re-read table. Schema is
    passed through untouched — consumers see the same events relation,
    just pre-partitioned, so routing a query through the landing is
    semantically neutral (only the physical plan changes: the user-key
    exchange disappears; plan-pinned).

    The in-bucket (key, ts) sort clusters each key's events in time
    order — the window sort that survives is per-bucket and local (Spark
    cannot prove sortBy(key, ts) orders derived expressions like
    unix_timestamp(ts), so it keeps a spill-free in-partition Sort).

    ``n_buckets`` sizes downstream parallelism — pick it like shuffle
    partitions at the target scale, not from the fixture (the same
    guidance as land_shingle_relation).
    """
    (
        events
        # one file per bucket (the landing contract adoption's file
        # census assumes): repartition on the bucket hash first
        .repartition(n_buckets, key_col)
        .write.mode(mode)
        .bucketBy(n_buckets, key_col)
        .sortBy(key_col, ts_col)
        .saveAsTable(out_table)
    )
    return events.sparkSession.table(out_table)


def shared_events_relation(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    source_key: str,
    *,
    n_buckets: int = 16,
) -> DataFrame:
    """Session-shared events landing: the first call per (session,
    corpus, key, buckets) lands the bucketed table; later calls in the
    same session reuse it, and a FRESH session finding a marked,
    fingerprint-matching landing ADOPTS it without rewriting (the
    shared_shingle_relation contract, same machinery, same telemetry in
    LANDING_EVENTS). A changed corpus (fingerprint mismatch) reclaims
    and re-lands with a warning naming the previous writer."""
    return _shared_landing(
        events,
        ident=("events", source_key, key_col, ts_col, n_buckets),
        name_prefix="events_rel_",
        family="events",
        land_fn=lambda d, name: land_events_relation(
            d, key_col, ts_col, name, n_buckets=n_buckets,
        ),
        marker_extra={
            "n_buckets": n_buckets,
            "bucket_cols": [key_col],
            "sort_cols": [key_col, ts_col],
        },
    )
