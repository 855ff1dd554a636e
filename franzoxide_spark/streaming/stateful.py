"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no stateful processing at all; this is the Tier C
surface for operators the built-in windows can't express — arbitrary
per-key state evolved across micro-batches. The state store lives in the
query checkpoint, so recovery is exactly-once.

``running_counts`` is the canonical shape: per-key accumulators updated
per batch, emitting the updated snapshot each time. Real pipelines swap
the accumulator for e.g. a Bloom filter (streaming dedup beyond the
watermark), a CMS sketch, or per-user session state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, n_events bigint, total double"
STATE_SCHEMA = "n bigint, total double"


def _update(key, pdf_iter, state: GroupState):
    import pandas as pd

    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"key": [key[0]], "n_events": [n], "total": [total]})


DEDUP_OUTPUT_SCHEMA = "key string, member string"
DEDUP_STATE_SCHEMA = "seen array<string>"


def _dedup_update(key, pdf_iter, state: GroupState):
    import pandas as pd

    seen = set(state.get[0]) if state.exists else set()
    fresh: list[str] = []
    for pdf in pdf_iter:
        for m in pdf["member"]:
            if m not in seen:
                seen.add(m)
                fresh.append(m)
    state.update((list(seen),))
    yield pd.DataFrame({"key": [key[0]] * len(fresh), "member": fresh})


def stateful_dedup(events: DataFrame, key_col: str, member_col: str) -> DataFrame:
    """Streaming dedup with UNBOUNDED retention — emits each (key, member)
    exactly once across the whole stream, beyond any watermark horizon
    (``dropDuplicatesWithinWatermark`` forgets after the watermark passes;
    this holds per-key state in the checkpointed store forever).

    State grows linearly with distinct members — correct but unbounded, so
    this exact variant is for bounded key domains. At 100 TB stream scale
    use :func:`stateful_dedup_bloom`, which holds the same contract in a
    fixed-size per-key Bloom filter.
    """
    keyed = events.selectExpr(
        f"cast({key_col} as string) as key", f"cast({member_col} as string) as member"
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _dedup_update,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# `enc` stamps the member-encoding version into state so an encoding
# change can never be REPLAYED silently: recovery from a checkpoint
# written under a different encoding must fail loudly (the r12 tag-byte
# change would otherwise re-emit every previously-deduped member — the
# old bits are unreachable under new hash positions). Schema changes
# (v1 had no `enc` field) fail at Spark's state-schema validation;
# same-schema encoding bumps fail at the explicit check in the update
# fn. Bump _BLOOM_ENC whenever _bloom_positions' encoding changes.
BLOOM_STATE_SCHEMA = "bits binary, n bigint, enc int"
_BLOOM_ENC = 2  # v2: 0x01 tag-byte members, 0x00 null sentinel (r12)


def bloom_params(capacity: int, fpp: float) -> tuple[int, int]:
    """Standard Bloom sizing: m bits for ``capacity`` insertions at false-
    positive rate ``fpp``, k hash functions. m is rounded up to whole
    bytes so the state blob has a fixed, predictable size. Degenerate
    parameters are refused HERE, on the driver, where the message points
    at the argument — fpp >= 1 yields m <= 0, which would otherwise
    surface as a ZeroDivisionError/ValueError crash-loop inside the
    executor on the first record (r11 review)."""
    import math

    if capacity <= 0:
        raise ValueError(f"bloom capacity must be positive, got {capacity}")
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"bloom fpp must be in (0, 1), got {fpp}")
    m = math.ceil(-capacity * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 7) // 8) * 8
    k = max(1, round(m / capacity * math.log(2)))
    return m, k


def _bloom_positions(member: str | None, m: int, k: int) -> list[int]:
    """k bit positions via double hashing over one md5 digest — fully
    deterministic (no process-salted ``hash()``) so state survives
    checkpoint recovery on a different executor/process. A null member
    hashes under a sentinel byte (a poison record must dedup like any
    other value, matching the exact variant's set semantics — it may
    NOT crash-loop the query on checkpoint replay, r11 review). Real
    members carry a 0x01 tag byte so no utf-8 string can alias the
    0x00 null sentinel (r11 ADVICE: the old "\\x00<null>" sentinel
    collided with a literal member of the same text)."""
    import hashlib

    # Arrow surfaces SQL NULL as None, float('nan'), or pd.NA depending
    # on the column's pandas dtype; a bare `member != member` raises on
    # pd.NA (ambiguous truth value — the sessionizer's crash class).
    # ONLY those null faces hash to the 0x00 sentinel. Any other
    # non-str member (int, bytes, Decimal delivered by Arrow for a
    # mistyped column) is a contract violation and must raise LOUDLY:
    # hashing real values into the single null slot would emit the
    # first row and silently drop every later distinct member as a
    # "duplicate" — near-total data loss with no error (r12 ADVICE #2).
    if isinstance(member, str):
        null = False
    elif member is None:
        null = True
    else:
        import pandas as pd

        try:
            null = bool(pd.isna(member))
        except (TypeError, ValueError):
            # pd.isna on an array-like returns an array (ambiguous
            # truth) — an array member is not a null face
            null = False
        if not null:
            raise TypeError(
                "bloom dedup member column must be string (or null); got "
                f"{type(member).__name__}: {member!r} — cast the member "
                "column to string upstream, values of other types would "
                "all alias the null sentinel and be dropped as duplicates"
            )
    raw = b"\x00" if null else b"\x01" + member.encode("utf-8")
    d = hashlib.md5(raw).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:16], "big") | 1
    return [(h1 + i * h2) % m for i in range(k)]


def make_bloom_dedup_update(capacity: int, fpp: float):
    """Build the applyInPandasWithState update fn for the Bloom dedup:
    per-key state is a FIXED m/8-byte bit array + insert counter, however
    many members stream through — the bounded-state counterpart of
    ``_dedup_update``'s exact set. One-sided error: a false positive drops
    a genuinely-new member (rate <= fpp while n <= capacity); duplicates
    are NEVER emitted, which is the right trade for training-data dedup."""
    m, k = bloom_params(capacity, fpp)

    def _update(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.exists:
            raw, n, enc = state.get
            if enc != _BLOOM_ENC:
                raise ValueError(
                    f"bloom dedup state was checkpointed under member "
                    f"encoding v{enc}, this build hashes v{_BLOOM_ENC} — "
                    "recovered bits are unreachable under the new "
                    "positions and replay would re-emit every deduped "
                    "member. Restart from a fresh checkpoint."
                )
            bits = bytearray(raw)
        else:
            bits, n = bytearray(m // 8), 0
        fresh: list[str] = []
        for pdf in pdf_iter:
            for member in pdf["member"]:
                pos = _bloom_positions(member, m, k)
                if all(bits[p >> 3] & (1 << (p & 7)) for p in pos):
                    continue  # probably seen (or false positive)
                for p in pos:
                    bits[p >> 3] |= 1 << (p & 7)
                n += 1
                fresh.append(member)
        state.update((bytes(bits), n, _BLOOM_ENC))
        yield pd.DataFrame({"key": [key[0]] * len(fresh), "member": fresh})

    return _update


def stateful_dedup_bloom(
    events: DataFrame,
    key_col: str,
    member_col: str,
    capacity: int = 1_000_000,
    fpp: float = 0.01,
) -> DataFrame:
    """Streaming dedup with BOUNDED per-key state: same contract as
    :func:`stateful_dedup` (first-seen members emitted exactly once, beyond
    any watermark horizon) but the checkpointed state is a fixed-size Bloom
    filter — ~1.2 MB per key at the defaults (1M members @ 1% fpp) forever,
    vs the exact set's unbounded linear growth. Use the exact variant when
    emitted-member loss is unacceptable; use this at 100 TB stream scale.
    """
    keyed = events.selectExpr(
        f"cast({key_col} as string) as key", f"cast({member_col} as string) as member"
    )
    return keyed.groupBy("key").applyInPandasWithState(
        make_bloom_dedup_update(capacity, fpp),
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=BLOOM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# TTL'd exact dedup: watermark-evicted per-key member sets (r15 unfreeze
# item #1a). Between NoTimeout exact dedup (unbounded state) and the Bloom
# variant (bounded but lossy), this holds the EXACT set only while the key
# is active: once the event-time watermark passes last_event + ttl the
# state drops, and a member re-arriving later re-emits — session-scoped
# dedup, the semantics of most production stream dedup (and of
# dropDuplicatesWithinWatermark, but per-KEY idle-based rather than
# per-ROW age-based, and with an explicit, batch-expressible contract).
# --------------------------------------------------------------------------

DEDUP_TTL_OUTPUT_SCHEMA = "key string, member string, first_es long"
DEDUP_TTL_STATE_SCHEMA = "seen array<string>, last_s long"


def make_dedup_ttl_update(ttl_s: int):
    """applyInPandasWithState update fn for TTL-scoped exact dedup: state
    is (seen-member set, last event time) per key. Events process in
    event-time order within the batch; a gap > ttl resets the seen set
    (a new TTL session) so in-batch semantics match the cross-batch
    timeout eviction exactly — the batch face
    (:func:`batch_ttl_session_dedup`) is then a pure window expression.
    Late events (behind the key's frontier but inside the watermark)
    dedup against the CURRENT session's set, and an already-emitted
    member's first_es is never rewritten (append mode can't retract) —
    whereas the batch face, which sees all data sorted, may place a late
    event in an earlier session or report a smaller first_es. That
    retroactivity gap is inherent to one-pass session semantics (the
    same caveat the sessionizer documents); the parity tests feed in
    event-time order, where the two faces agree row-for-row."""

    def _update(key, pdf_iter, state: GroupState):
        import pandas as pd

        cols = ["key", "member", "first_es"]
        if state.hasTimedOut:
            # watermark passed last_event + ttl: the key went idle —
            # forget its members (the whole point of the TTL)
            state.remove()
            yield pd.DataFrame([], columns=cols)
            return
        if state.exists:
            seen, last = set(state.get[0]), state.get[1]
        else:
            seen, last = set(), None
        rows: list[tuple[int, str]] = []
        for pdf in pdf_iter:
            for es, m in zip(pdf["es"], pdf["member"]):
                # null event time can't place the event in a session
                # (engine-side filter guards this; belt and suspenders
                # so a poison row can't crash-loop on replay)
                if pd.isna(es):
                    continue
                # normalize pandas nulls (None/NaN/pd.NA) to None: null
                # members are LEGAL (the batch face emits null-member
                # groups), but a raw NaN would alias float('nan') != None
                # in the seen set and break the sort key below
                rows.append((int(es), None if pd.isna(m) else m))
        rows.sort(key=lambda r: r[0])
        out: list[tuple[str, str, int]] = []
        for es, m in rows:
            if last is not None and es - last > ttl_s:
                seen = set()  # in-batch TTL expiry: new session
            last = es if last is None else max(last, es)
            if m not in seen:
                seen.add(m)
                out.append((key[0], m, es))
        if last is not None:
            # null-safe sort: the seen set may contain None (null members
            # dedup like any other — batch-face parity), and Python's
            # default sort raises TypeError on None-vs-str, which would
            # fail the micro-batch and crash-loop on replay (r15 ADVICE;
            # the same poison-row rule _bloom_positions enforces)
            state.update(
                (sorted(seen, key=lambda m: (m is None, m)), last)
            )
            state.setTimeoutTimestamp(
                max((last + ttl_s) * 1000, state.getCurrentWatermarkMs() + 1)
            )
        yield pd.DataFrame(out, columns=cols)

    return _update


def stateful_dedup_ttl(
    events: DataFrame,
    key_col: str,
    member_col: str,
    ts_col: str,
    ttl_s: int = 3600,
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked streaming exact-dedup with TTL'd key state: emits each
    (key, member) once per TTL session — first occurrence, with its event
    time — and DROPS the key's member set once the watermark passes its
    last event + ttl. Memory is bounded by members per ACTIVE session,
    not stream history (the NoTimeout variant's flaw at 100 TB).

    Batch face: :func:`batch_ttl_session_dedup` (oracle-checked as
    q177); streaming-vs-batch parity + eviction re-emission are locked
    in tests/test_streaming.py. For exact forever-dedup use
    :func:`stateful_dedup`; for bounded-but-lossy use
    :func:`stateful_dedup_bloom`.
    """
    keyed = (
        events.filter(F.col(ts_col).isNotNull())
        .select(
            F.col(ts_col).alias("ts"),
            # true-UTC epoch seconds computed engine-side (the pandas
            # face of a timestamp is session-tz-localized — the
            # sessionizer's r11 lesson)
            F.unix_timestamp(F.col(ts_col)).alias("es"),
            F.col(key_col).cast("string").alias("key"),
            F.col(member_col).cast("string").alias("member"),
        )
        .withWatermark("ts", watermark)
    )
    return keyed.groupBy("key").applyInPandasWithState(
        make_dedup_ttl_update(ttl_s),
        outputStructType=DEDUP_TTL_OUTPUT_SCHEMA,
        stateStructType=DEDUP_TTL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def batch_ttl_session_dedup(
    events: DataFrame,
    key_col: str,
    member_col: str,
    ts_col: str,
    ttl_s: int = 3600,
) -> DataFrame:
    """Batch face of :func:`stateful_dedup_ttl`: per key, order events by
    time, cut a new TTL session at every gap > ttl (one lag + running sum
    — the q74 sessionization window shape), then keep the first
    occurrence of each member within each session. One key shuffle, all
    window/agg work group-bounded — the plan scales like every other
    user-key query in the suite."""
    from pyspark.sql import Window

    # partition the window and group on the RAW key column: the string
    # cast is injective, so casting only in the output select yields the
    # identical relation while letting a key-bucketed input (the r15
    # events landing) satisfy the distribution — cast(key) would defeat
    # the exchange elision the landing exists for (plan-asserted)
    w = Window.partitionBy("__k").orderBy("es")
    keyed = events.filter(F.col(ts_col).isNotNull()).select(
        F.col(key_col).alias("__k"),
        F.col(member_col).cast("string").alias("member"),
        F.unix_timestamp(F.col(ts_col)).alias("es"),
    )
    sessioned = keyed.withColumn(
        "__new",
        (F.col("es") - F.lag("es").over(w) > ttl_s).cast("int"),
    ).withColumn(
        "__session",
        F.sum(F.coalesce("__new", F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        sessioned.groupBy("__k", "__session", "member")
        .agg(F.min("es").alias("first_es"))
        .select(
            F.col("__k").cast("string").alias("key"), "member", "first_es"
        )
    )


def running_counts(events: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key running (count, sum) across micro-batches.

    ``events`` must be a streaming DataFrame; output mode 'update' emits
    one refreshed row per key per batch it appears in.
    """
    keyed = events.selectExpr(f"cast({key_col} as string) as key", f"{value_col} as value")
    return keyed.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# transformWithStateInPandas variant (Spark 4 stateful API)
# --------------------------------------------------------------------------

OUTPUT_SCHEMA_TWS = OUTPUT_SCHEMA


def running_counts_tws(events: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key running (count, sum) on Spark 4's ``transformWithState``
    API — the successor of ``applyInPandasWithState`` with typed state
    handles (ValueState/ListState/MapState), timers, and TTL support.
    Same contract and output as :func:`running_counts`; requires the
    RocksDB state store provider (set
    ``spark.sql.streaming.stateStore.providerClass`` to
    ``...state.RocksDBStateStoreProvider`` before starting the query —
    TWS state lives in RocksDB, not the default HDFS-backed store).

    Kept alongside the applyInPandasWithState variants rather than
    replacing them: TWS is the forward path (per-state-variable TTL and
    timers are what a production Bloom-dedup wants for key expiry), while
    applyInPandasWithState runs on any state store provider.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._agg.get() if self._agg.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._agg.update((n, total))
            yield pd.DataFrame(
                {"key": [key[0]], "n_events": [n], "total": [total]}
            )

        def close(self) -> None:
            pass

    keyed = events.selectExpr(
        f"cast({key_col} as string) as key", f"{value_col} as value"
    )
    return keyed.groupBy("key").transformWithStateInPandas(
        statefulProcessor=RunningCounts(),
        outputStructType=OUTPUT_SCHEMA_TWS,
        outputMode="Update",
        timeMode="None",
    )


# --------------------------------------------------------------------------
# streaming incremental near-dup: LSH band buckets as state keys
# --------------------------------------------------------------------------

NEARDUP_OUTPUT_SCHEMA = "id_a long, id_b long, jaccard double"
NEARDUP_STATE_SCHEMA = "ids array<long>, shs array<array<long>>"


def make_neardup_update(threshold: float):
    """applyInPandasWithState update fn for one LSH band bucket: state is
    the (doc_id, shingle-hash set) of every doc that ever hashed into this
    bucket; each arriving doc is exact-Jaccard-verified against the
    bucket's residents, then joins them. Pairs therefore emit when the
    LATER doc arrives — the incremental contract a streaming ingest needs
    (new docs checked against the whole history, never a recheck of the
    past)."""

    def _update(key, pdf_iter, state):
        import pandas as pd

        if state.exists:
            ids, shs = list(state.get[0]), [set(x) for x in state.get[1]]
        else:
            ids, shs = [], []
        known = set(ids)
        out: list[tuple[int, int, float]] = []
        for pdf in pdf_iter:
            for doc_id, sh in zip(pdf["doc_id"], pdf["sh"]):
                doc_id = int(doc_id)
                if doc_id in known:  # replayed doc: already a resident
                    continue
                sh_set = set(int(x) for x in sh)
                for pid, psh in zip(ids, shs):
                    union = len(sh_set | psh)
                    if not union:
                        continue
                    j = round(len(sh_set & psh) / union, 6)
                    if j >= threshold:
                        a, b = sorted((pid, doc_id))
                        out.append((a, b, j))
                ids.append(doc_id)
                shs.append(sh_set)
                known.add(doc_id)
        state.update((ids, [sorted(s) for s in shs]))
        yield pd.DataFrame(out, columns=["id_a", "id_b", "jaccard"])

    return _update


def _banded_sh60(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int,
    bands: int,
    shingle_k: int,
    ts_col: str | None = None,
) -> DataFrame:
    """Shared candidate generator for the streaming near-dup family:
    MinHash signatures + 60-bit shingle hashes via the SAME JVM
    expressions as the batch path (operators/dedup.py), exploded into
    one row per (doc, band bucket). The per-bucket state operators
    (pairs: :func:`streaming_neardup`; verdicts:
    :func:`streaming_neardup_gate`) share this front end so their
    candidate spaces are identical to each other and to the batch
    family's."""
    from franzoxide_spark.functions.text import HASH60_SPARK
    from franzoxide_spark.operators.dedup import (
        _with_tokens,
        minhash_signatures,
    )
    from pyspark.sql import functions as F

    rows = num_hashes // bands
    src = _with_tokens(docs, text_col)
    extra: tuple[str, ...] = ()
    if ts_col is not None:
        # true-UTC epoch seconds engine-side (the sessionizer's r11 tz
        # lesson) + the raw timestamp for the watermark; null event
        # times can't place a doc on the bucket clock — filter like
        # every other event-time operator here
        src = src.filter(F.col(ts_col).isNotNull()).withColumn(
            "es", F.unix_timestamp(F.col(ts_col))
        )
        extra = (ts_col, "es")
    sig = minhash_signatures(
        src, text_col, id_col, num_hashes, shingle_k, extra_cols=extra
    ).withColumn(
        "sh60",
        # the shared cross-engine hash contract (functions/text.py) — the
        # batch dedup family computes the same expression, so the
        # streaming verifier can never silently desync from it
        F.expr(f"transform(shingle_set, s -> {HASH60_SPARK.format(s='s')})"),
    )
    return sig.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in extra],
        F.col("sh60").alias("sh"),
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}),"
                f" b -> concat_ws(':', b, concat_ws(',',"
                f" slice(sig, b * {rows} + 1, {rows}))))"
            )
        ).alias("bucket"),
    )


def streaming_neardup(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Streaming MinHash-LSH near-duplicate detection: the incremental
    counterpart of operators/dedup.py:minhash_near_duplicates. Signatures
    and banding are the SAME JVM expressions as the batch path (so the
    candidate space is identical); the per-bucket state then holds every
    resident's 60-bit shingle-hash set and each arriving doc verifies
    exact Jaccard against them in one Arrow batch.

    Emission contract: a qualifying pair emits when its later doc
    arrives, once per shared band bucket — consumers dedupe on
    (id_a, id_b) downstream (streaming dropDuplicates or the sink's
    merge). Verification is on 60-bit shingle hashes rather than the
    batch path's shingle strings — identical up to md5-collision odds
    (~n²/2⁶⁰), the standard trade for compact state.

    State is bounded by bucket residency (near-dup cluster density per
    band), not stream length in the adversarial-free case; for cold-
    bucket expiry see :func:`streaming_neardup_gate`'s ``bucket_ttl_s``
    (event-time timeout eviction, r15) — the same option applies here if
    a deployment needs it.
    """
    banded = _banded_sh60(docs, id_col, text_col, num_hashes, bands, shingle_k)
    return banded.groupBy("bucket").applyInPandasWithState(
        make_neardup_update(threshold),
        outputStructType=NEARDUP_OUTPUT_SCHEMA,
        stateStructType=NEARDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# streaming near-dup GATE: per-doc admit/flag verdicts (r15 unfreeze #1b)
# --------------------------------------------------------------------------

NEARDUP_GATE_OUTPUT_SCHEMA = "doc_id long, dup_of long, jaccard double"
# TTL mode persists the bucket's event-time frontier so a LATE doc can
# never rewind the eviction deadline (r15 review) — distinct schema from
# the NoTimeout mode, which shares NEARDUP_STATE_SCHEMA with the pairs op
NEARDUP_GATE_TTL_STATE_SCHEMA = (
    "ids array<long>, shs array<array<long>>, last_s long"
)


def make_neardup_gate_update(threshold: float, ttl_s: int | None = None):
    """applyInPandasWithState update fn for one LSH band bucket of the
    near-dup GATE: state is the same resident ledger as the pairs
    operator, but each arriving doc emits at most ONE row per bucket —
    its verdict against the bucket's residents: (doc_id, dup_of =
    smallest-id resident it verifies >= threshold against, that pair's
    jaccard). No emission means the bucket admits the doc. Every doc
    becomes a resident regardless of its verdict (the gate flags against
    ALL earlier docs, not only admitted ones — decision chains would
    otherwise need cross-bucket coordination no per-key state can do).

    ``ttl_s`` (with an event-time feed, see streaming_neardup_gate):
    a bucket idle past its last doc's event time + ttl is EVICTED by the
    event-time timeout — residents are forgotten and a later near-dup of
    a forgotten doc is admitted (recall trades for bounded state, the
    stateful_dedup_ttl contract applied to buckets)."""

    def _update(key, pdf_iter, state):
        import pandas as pd

        cols = ["doc_id", "dup_of", "jaccard"]
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=cols)
            return
        if state.exists:
            st = state.get
            ids, shs = list(st[0]), [set(x) for x in st[1]]
            last = st[2] if ttl_s is not None else None
        else:
            ids, shs, last = [], [], None
        known = set(ids)
        # sort by doc_id so same-batch bucket-mates resolve in id order —
        # the batch face's "earlier = smaller id" contract; unsorted
        # pandas delivery could invert which doc gets admitted (r15
        # review)
        rows: list[tuple[int, object, int | None]] = []
        for pdf in pdf_iter:
            es_col = pdf["es"] if ttl_s is not None else None
            for i, (doc_id, sh) in enumerate(zip(pdf["doc_id"], pdf["sh"])):
                es = None
                if es_col is not None and not pd.isna(es_col.iloc[i]):
                    es = int(es_col.iloc[i])
                rows.append((int(doc_id), sh, es))
        rows.sort(key=lambda r: r[0])
        out: list[tuple[int, int, float]] = []
        for doc_id, sh, es in rows:
            if es is not None:
                # frontier only moves FORWARD: a late doc must not
                # rewind the eviction deadline (r15 review)
                last = es if last is None else max(last, es)
            if doc_id in known:  # replayed doc: already a resident
                continue
            sh_set = set(int(x) for x in sh)
            best: tuple[int, float] | None = None
            for pid, psh in zip(ids, shs):
                union = len(sh_set | psh)
                if not union:
                    continue
                j = round(len(sh_set & psh) / union, 6)
                if j >= threshold and (best is None or pid < best[0]):
                    best = (pid, j)
            if best is not None:
                out.append((doc_id, best[0], best[1]))
            ids.append(doc_id)
            shs.append(sh_set)
            known.add(doc_id)
        sh_lists = [sorted(s) for s in shs]
        if ttl_s is not None:
            state.update((ids, sh_lists, last))
            if last is not None:
                state.setTimeoutTimestamp(
                    max((last + ttl_s) * 1000,
                        state.getCurrentWatermarkMs() + 1)
                )
        else:
            state.update((ids, sh_lists))
        yield pd.DataFrame(out, columns=cols)

    return _update


def streaming_neardup_gate(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
    bucket_ttl_s: int | None = None,
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming MinHash-band near-duplicate GATE: the online curation
    filter — each arriving doc is checked against every earlier doc it
    shares an LSH band bucket with, and a verified match (exact Jaccard
    on the 60-bit shingle hashes >= threshold) emits a flag row
    (doc_id, dup_of, jaccard). Silence means admitted. A doc flagged in
    several buckets emits one row per flagging bucket; consumers take
    the min dup_of per doc (streaming dropDuplicates / the sink's merge)
    — the batch face folds that min in already.

    Batch face: operators/dedup.py:neardup_gate (oracle-checked as
    q178); parity locked in tests/test_streaming.py for id-ordered
    arrival (out-of-order arrival degrades gracefully: the gate is
    arrival-order-first, it never flags an already-arrived doc
    retroactively — append mode can't retract an admission).

    Same candidate space and state shape as :func:`streaming_neardup`
    (shared :func:`_banded_sh60` front end, same state schema), so the
    100 TB posture is identical: state bounded by bucket residency, one
    bucket-key shuffle.

    ``bucket_ttl_s`` + ``ts_col`` (given together): bucket residents are
    EVICTED once the event-time watermark passes the bucket's last doc +
    ttl — the bounded-state production mode at 100 TB stream scale,
    trading recall beyond the ttl horizon for O(active buckets) state
    (and replacing the docstring handoff the pairs operator still
    carries). ``watermark`` applies to ``ts_col`` and only matters in
    that mode."""
    if (bucket_ttl_s is None) != (ts_col is None):
        raise ValueError(
            "bucket_ttl_s and ts_col must be given together (the TTL is"
            " event-time-driven)"
        )
    banded = _banded_sh60(
        docs, id_col, text_col, num_hashes, bands, shingle_k, ts_col=ts_col
    )
    if bucket_ttl_s is None:
        return banded.groupBy("bucket").applyInPandasWithState(
            make_neardup_gate_update(threshold),
            outputStructType=NEARDUP_GATE_OUTPUT_SCHEMA,
            stateStructType=NEARDUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    return (
        banded.withWatermark(ts_col, watermark)
        .groupBy("bucket")
        .applyInPandasWithState(
            make_neardup_gate_update(threshold, ttl_s=bucket_ttl_s),
            outputStructType=NEARDUP_GATE_OUTPUT_SCHEMA,
            stateStructType=NEARDUP_GATE_TTL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# --------------------------------------------------------------------------
# streaming sessionization: gap-closed sessions with event-time timeout
# --------------------------------------------------------------------------

SESSION_OUTPUT_SCHEMA = "key string, start_s long, end_s long, n_events bigint"
SESSION_STATE_SCHEMA = "start_s long, last_s long, n bigint"


def make_session_update(gap_s: int):
    """applyInPandasWithState update fn for gap sessionization: per-key
    state is the OPEN session (start, last-event, count). New events
    extend it or close it (gap exceeded inside the batch — the closed
    session emits immediately); the event-time timeout closes idle
    sessions once the watermark passes last_event + gap, so every
    session emits EXACTLY once, in append mode, without waiting for the
    key's next event (the flaw of purely event-driven closure)."""

    def _update(key, pdf_iter, state: GroupState):
        import pandas as pd

        cols = ["key", "start_s", "end_s", "n_events"]
        if state.hasTimedOut:
            st, lt, n = state.get
            state.remove()
            yield pd.DataFrame([(key[0], st, lt, n)], columns=cols)
            return
        # epoch seconds come PRE-COMPUTED from Spark (unix_timestamp in
        # streaming_sessionize): pandas delivers event-time columns
        # localized to spark.sql.session.timeZone then stripped of tz, so
        # deriving epoch here via Timestamp.timestamp() is off by the
        # session-tz offset in any non-UTC session — which desyncs the
        # timeout against getCurrentWatermarkMs() (true UTC) and shifts
        # every emitted start_s/end_s (r11 review). Null event times are
        # skipped: one poison row must not crash-loop the query on
        # checkpoint replay.
        ev: list[int] = []
        for pdf in pdf_iter:
            # pd.isna covers every null face Arrow may deliver for a
            # nullable bigint (None, float NaN, pd.NA — the latter makes
            # a bare `s == s` guard raise on ambiguous truth value)
            ev.extend(int(s) for s in pdf["es"] if not pd.isna(s))
        ev.sort()
        st, lt, n = state.get if state.exists else (None, None, 0)
        closed: list[tuple] = []
        for t in ev:
            if st is None:
                st, lt, n = t, t, 1
            elif t <= lt:
                # LATE event (within the watermark, behind the open
                # session's frontier — cross-batch reordering). Never
                # regress lt: that would let a 1h-late event "extend"
                # the session backwards (end < start) and pull the
                # timeout earlier than the real frontier. Fold it into
                # the open session when it touches [st - gap, lt];
                # otherwise it belongs to an already-closed span —
                # emit it as its own singleton session.
                if t >= st - gap_s:
                    st, n = min(st, t), n + 1
                else:
                    closed.append((key[0], t, t, 1))
            elif t - lt <= gap_s:
                lt, n = t, n + 1
            else:
                closed.append((key[0], st, lt, n))
                st, lt, n = t, t, 1
        if st is not None:
            # (st is None only when every row in the batch had a null
            # event time and no session was open — nothing to track)
            state.update((st, lt, n))
            # the timeout must sit strictly past the current watermark or
            # Spark rejects it — clamp for sessions already older than the
            # watermark (they then time out on the very next batch)
            state.setTimeoutTimestamp(
                max((lt + gap_s) * 1000, state.getCurrentWatermarkMs() + 1)
            )
        yield pd.DataFrame(closed, columns=cols)

    return _update


def streaming_sessionize(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    gap_s: int = 1800,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming counterpart of q74's batch sessionization: closed
    sessions (key, start_s, end_s, n_events) emit exactly once — either
    when a same-key event arrives past the gap, or when the event-time
    watermark passes the open session's last event + gap (idle close).

    Spark's native ``session_window`` aggregation covers count/sum
    rollups; this stateful form is the extension point for session
    payloads the built-in can't express (ordered event paths, per-
    session dedup sets — the q74 family) while keeping the same
    exactly-once, watermark-governed emission contract.

    Scale shape: state is ONE open session per active key (three
    numbers), dropped at timeout — memory is bounded by concurrently
    active keys, not stream history; the shuffle is the standard per-key
    state partitioning.
    """
    keyed = (
        events
        # a null event time can neither extend nor open a session, and a
        # NaT reaching the state fn would fail the batch and crash-loop
        # on checkpoint replay (r11 review)
        .filter(F.col(ts_col).isNotNull())
        .select(
            F.col(ts_col).alias("ts"),
            # true-UTC epoch seconds, computed ENGINE-side: the pandas
            # face of a timestamp is session-tz-localized, so epoch math
            # inside the state fn would shift by the tz offset in any
            # non-UTC session (see make_session_update)
            F.unix_timestamp(F.col(ts_col)).alias("es"),
            F.col(key_col).cast("string").alias("key"),
        )
        .withWatermark("ts", watermark)
    )
    return keyed.groupBy("key").applyInPandasWithState(
        make_session_update(gap_s),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# --------------------------------------------------------------------------
# streaming heavy hitters: sharded SpaceSaving with bounded state
# --------------------------------------------------------------------------

HH_OUTPUT_SCHEMA = "shard int, item string, count_min bigint, count_max bigint"
HH_STATE_SCHEMA = "items array<string>, counts array<long>, errs array<long>"


def make_spacesaving_update(capacity: int):
    """applyInPandasWithState update fn for one SpaceSaving shard
    (Metwally et al. 2005): state is at most ``capacity`` (item, count,
    err) entries. A tracked item increments; an untracked one evicts the
    current minimum, inheriting its count as the overestimation bound
    (err). Guarantees: count_max ≥ true ≥ count_max − err = count_min,
    and any item with true count > N/capacity is tracked — the same
    never-undercount contract as q72's CMS, in O(capacity) state."""
    if capacity < 1:
        # fail on the driver, not as min()-of-empty inside the executor's
        # first eviction (r11 review; same pattern as make_quantile_update)
        raise ValueError(f"capacity must be >= 1, got {capacity}")

    def _update(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.exists:
            items, counts, errs = (
                list(state.get[0]),
                list(state.get[1]),
                list(state.get[2]),
            )
        else:
            items, counts, errs = [], [], []
        idx = {it: i for i, it in enumerate(items)}
        for pdf in pdf_iter:
            for it in pdf["item"]:
                i = idx.get(it)
                if i is not None:
                    counts[i] += 1
                elif len(items) < capacity:
                    idx[it] = len(items)
                    items.append(it)
                    counts.append(1)
                    errs.append(0)
                else:
                    m = min(range(len(counts)), key=counts.__getitem__)
                    del idx[items[m]]
                    idx[it] = m
                    items[m] = it
                    errs[m] = counts[m]
                    counts[m] += 1
        state.update((items, counts, errs))
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(items),
                "item": items,
                "count_min": [c - e for c, e in zip(counts, errs)],
                "count_max": counts,
            }
        )

    return _update


def streaming_heavy_hitters(
    events: DataFrame, item_col: str, capacity: int = 64, shards: int = 8
) -> DataFrame:
    """Streaming heavy hitters with BOUNDED state: items hash into
    ``shards`` SpaceSaving summaries of ``capacity`` entries each. The
    hash routing sends EVERY occurrence of an item to the same shard, so
    per-shard guarantees are global guarantees (a cross-shard merge
    would need error addition; routing avoids it) — the streaming twin
    of q72's relational CMS, fulfilling the swap-the-accumulator shape
    of :func:`running_counts`. Output mode 'update': each shard re-emits
    its current summary per batch it sees data in; consumers take the
    latest per (shard, item) and rank by count_max.

    State: shards × capacity entries TOTAL, independent of stream
    length or item cardinality. More shards = more parallelism AND a
    finer per-shard error bound (err ≤ N_shard/capacity, and N_shard ≈
    N/shards under hash balance)."""
    keyed = events.select(
        F.pmod(F.xxhash64(F.col(item_col).cast("string")), F.lit(shards))
        .cast("int")
        .alias("shard"),
        F.col(item_col).cast("string").alias("item"),
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        make_spacesaving_update(capacity),
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# streaming quantiles: deterministic bottom-k sample per key
# --------------------------------------------------------------------------

QUANTILE_OUTPUT_SCHEMA = (
    "key string, n_seen bigint, sample_n int,"
    " p25 double, p50 double, p75 double"
)
QUANTILE_STATE_SCHEMA = "n bigint, hashes array<bigint>, vals array<double>"


def _det_hash(ids) -> "list[int]":
    """60-bit md5-derived hash of the row id — the same deterministic
    hash family the batch engine uses (functions/text.py), computed
    Python-side here because it runs inside the state update."""
    import hashlib

    return [
        int(hashlib.md5(str(int(i)).encode()).hexdigest()[:15], 16)
        for i in ids
    ]


def make_quantile_update(capacity: int, qs=(0.25, 0.5, 0.75)):
    """Build the applyInPandasWithState update fn for streaming
    quantiles. State = the ``capacity`` rows with the SMALLEST
    deterministic id-hashes seen so far (a bottom-k sketch): a uniform
    sample without replacement that is ORDER- and BATCHING-INDEPENDENT —
    any permutation of the stream leaves the state identical, so the
    stream result equals the batch twin exactly (tested). Quantiles are
    linear-interpolated over the sorted sample; error is the sampling
    error O(1/sqrt(capacity)), not data-dependent drift."""
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    if len(qs) != 3:
        # the output schema is fixed at p25/p50/p75 — a shorter qs would
        # IndexError in the executor on the first non-empty batch and a
        # longer one would silently drop entries (r11 review)
        raise ValueError(
            f"qs must have exactly 3 entries (output schema is fixed at"
            f" p25/p50/p75), got {len(qs)}"
        )

    def _update(key, pdf_iter, state: GroupState):
        import numpy as np
        import pandas as pd

        if state.exists:
            n, hashes, vals = state.get
            hashes, vals = list(hashes), list(vals)
        else:
            n, hashes, vals = 0, [], []
        for pdf in pdf_iter:
            n += len(pdf)
            hashes.extend(_det_hash(pdf["rid"]))
            vals.extend(float(x) for x in pdf["value"])
        if len(hashes) > capacity:
            order = np.argsort(np.array(hashes, dtype=np.uint64), kind="stable")[
                :capacity
            ]
            hashes = [hashes[i] for i in order]
            vals = [vals[i] for i in order]
        state.update((n, hashes, vals))
        s = np.sort(np.array(vals, dtype=np.float64))
        est = [float(np.quantile(s, q)) for q in qs] if len(s) else [None] * 3
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_seen": [n],
                "sample_n": [len(vals)],
                "p25": [est[0]],
                "p50": [est[1]],
                "p75": [est[2]],
            }
        )

    return _update


def streaming_quantiles(
    events: DataFrame,
    key_col: str,
    id_col: str,
    value_col: str,
    capacity: int = 256,
) -> DataFrame:
    """Per-key streaming quantile estimates over a bottom-k sample of
    ``capacity`` rows (state bounded by construction; update-mode output
    refreshes a key's row each batch it appears in)."""
    keyed = events.selectExpr(
        f"cast({key_col} as string) as key",
        f"cast({id_col} as bigint) as rid",
        f"cast({value_col} as double) as value",
        # a null rid makes Arrow deliver the bigint column as float64
        # (int(nan) crash-loops the query) and a null value would poison
        # np.quantile with NaN permanently once sampled; drop both —
        # mirrored in batch_bottomk_quantiles so the parity oracle sees
        # the same relation (r11 review)
    ).filter("rid IS NOT NULL AND value IS NOT NULL")
    return keyed.groupBy("key").applyInPandasWithState(
        make_quantile_update(capacity),
        outputStructType=QUANTILE_OUTPUT_SCHEMA,
        stateStructType=QUANTILE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_bottomk_quantiles(
    events: DataFrame,
    key_col: str,
    id_col: str,
    value_col: str,
    capacity: int = 256,
) -> DataFrame:
    """Batch twin of streaming_quantiles: the same bottom-k-by-id-hash
    sample expressed as a rank window, same interpolated quantiles —
    the parity oracle proving the streaming state is order-independent."""
    from franzoxide_spark.functions.text import hash60

    from pyspark.sql import Window

    keyed = (
        events.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(id_col).cast("bigint").alias("rid"),
            F.col(value_col).cast("double").alias("value"),
        )
        # same null policy as the streaming face (see streaming_quantiles)
        .filter(F.col("rid").isNotNull() & F.col("value").isNotNull())
        .withColumn("__h", hash60(F.col("rid").cast("string")))
    )
    # One exchange total (r17): the rank window establishes the per-key
    # partitioning, and the groupBy("key") right after it reuses that
    # partitioning, so totals/sample/quantiles all come out of the SAME
    # aggregation — the old shape paid a second full-data aggregation
    # for n_seen plus a key-table join to glue the two halves together.
    # percentile() skips nulls, so masking values past the capacity rank
    # inside the aggregate is exactly the old filter(__rk <= capacity).
    w = Window.partitionBy("key").orderBy("__h", "rid")
    in_cap = F.col("__rk") <= capacity
    sampled_value = F.when(in_cap, F.col("value"))
    return (
        keyed.withColumn("__rk", F.row_number().over(w))
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_seen"),
            F.sum(in_cap.cast("int")).cast("int").alias("sample_n"),
            F.percentile(sampled_value, F.lit(0.25)).alias("p25"),
            F.percentile(sampled_value, F.lit(0.5)).alias("p50"),
            F.percentile(sampled_value, F.lit(0.75)).alias("p75"),
        )
        .select("key", "n_seen", "sample_n", "p25", "p50", "p75")
    )
