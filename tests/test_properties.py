"""Property-based tests (hypothesis) for the correctness-critical
primitives. Each example ships a BATCH of generated rows through one Spark
job to keep the example count x job latency tolerable."""

from __future__ import annotations

import base64
import json

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from franzoxide_spark.functions.envelope import envelope_json
from franzoxide_spark.functions.text import rolling_fingerprint

SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --------------------------------------------------------------------------
# envelope: structural invariants for ARBITRARY payload bytes
# --------------------------------------------------------------------------
payload = st.one_of(
    st.binary(max_size=64),
    st.text(max_size=48).map(lambda s: s.encode("utf-8")),
    st.builds(lambda n: json.dumps({"k": n}).encode(), st.integers(-(10**6), 10**6)),
)


@SET
@given(st.lists(st.tuples(payload, payload), min_size=1, max_size=24))
def test_envelope_structural_invariants(spark, pairs):
    rows = [
        Row(i=i, key=k, value=v) for i, (k, v) in enumerate(pairs)
    ]
    df = spark.createDataFrame(rows)
    out = df.select(
        "i",
        "key",
        "value",
        envelope_json(
            F.lit("t"), F.lit(0), F.col("i"), F.lit(1), F.col("key"), F.col("value"),
            F.lit(None).cast("string"),
        ).alias("env"),
    ).collect()
    for r in out:
        env = json.loads(r["env"])  # the envelope line is always valid JSON
        assert env["topic"] == "t" and env["offset"] == r["i"]
        for field, original in (("key", bytes(r["key"])), ("value", bytes(r["value"]))):
            if len(original) == 0:
                assert field not in env and f"{field}_format" not in env
            elif env.get(f"{field}_format") == "base64":
                assert base64.b64decode(env[field]) == original
            else:
                # engine judged it JSON -> embedded verbatim; the raw text
                # must decode to the same object json sees
                assert env[field] == json.loads(original.decode("utf-8"))


# --------------------------------------------------------------------------
# strict-JSON sniff: the tiered (prefilter -> orjson -> stdlib) UDF must be
# EXACTLY json.loads-with-constants-rejected — the reference's serde_json
# strictness contract
# --------------------------------------------------------------------------
def _stdlib_strict(bb: bytes) -> bool:
    try:
        json.loads(
            bb.decode("utf-8"),
            parse_constant=lambda c: (_ for _ in ()).throw(ValueError(c)),
        )
        return True
    except Exception:
        return False


_SNIFF_CORPUS = [
    b'{"a":1}', b'{} x', b'{"a":1}junk', b'NaN', b'Infinity', b'-Infinity',
    b'1 2', b'"abc"', b'null', b'123', b'[1,2]', b'{"a":}', b'{"a":1,}',
    b"'a'", b'{a:1}', b'01', b'+1', b'.5', b'1.', b'1e999', b'2e308',
    b' {"a":1} ', b'', b' ', b'{"dup":1,"dup":2}',
    b'9' * 40, b'-' + b'9' * 40, b'{"a":"\\ud800"}', b'"\\uD83D\\uDE00"',
    b'raw:12345', b'user-77', b'\xef\xbb\xbf{}', b'{\x00', b'\xff\xfe[',
    b'tru', b'"unterminated', b'  \t\n[1, 2]\r\n ',
]


def test_strict_sniff_matches_stdlib_on_adversarial_corpus(spark):
    from franzoxide_spark.functions.envelope import json_strict_valid

    df = spark.createDataFrame(
        [Row(i=i, p=p) for i, p in enumerate(_SNIFF_CORPUS)]
    )
    got = {
        r["i"]: r["ok"]
        for r in df.select("i", json_strict_valid(F.col("p")).alias("ok")).collect()
    }
    for i, p in enumerate(_SNIFF_CORPUS):
        # NULL payload short-circuits before the UDF in _json_or_base64;
        # the UDF itself maps None -> False
        assert got[i] == _stdlib_strict(p), repr(p)


@SET
@given(
    st.lists(
        st.one_of(
            st.binary(max_size=64),
            st.text(max_size=48).map(lambda s: s.encode("utf-8")),
            st.builds(
                lambda n: json.dumps({"k": n}).encode(),
                st.integers(-(10**30), 10**30),
            ),
            st.builds(lambda s: (s + "junk").encode(), st.text(max_size=24)),
        ),
        min_size=1,
        max_size=32,
    )
)
def test_strict_sniff_matches_stdlib_random(spark, payloads):
    from franzoxide_spark.functions.envelope import json_strict_valid

    df = spark.createDataFrame([Row(i=i, p=p) for i, p in enumerate(payloads)])
    got = {
        r["i"]: r["ok"]
        for r in df.select("i", json_strict_valid(F.col("p")).alias("ok")).collect()
    }
    for i, p in enumerate(payloads):
        assert got[i] == _stdlib_strict(bytes(p)), repr(p)


# --------------------------------------------------------------------------
# rolling fingerprint == pure-Python fold (exact)
# --------------------------------------------------------------------------
def _py_fingerprint(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % 2147483647
    return acc


@SET
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF),
            max_size=60,
        ),
        min_size=1,
        max_size=24,
    )
)
def test_rolling_fingerprint_matches_python(spark, texts):
    rows = [Row(i=i, s=s) for i, s in enumerate(texts)]
    df = spark.createDataFrame(rows)
    out = df.select("i", "s", rolling_fingerprint("s").alias("fp")).collect()
    for r in out:
        assert r["fp"] == _py_fingerprint(r["s"]), repr(r["s"])


# --------------------------------------------------------------------------
# exact-decimal SUM: Spark == DuckDB bit-for-bit on adversarial doubles
# --------------------------------------------------------------------------
@SET
@given(
    st.lists(
        st.one_of(
            st.floats(0, 1e5, allow_nan=False, allow_infinity=False),
            # values ON the decimal(12,4) grid
            st.integers(0, 10**9).map(lambda n: n / 10**4),
            # adversarial: exact/near rounding-midpoint constructions —
            # the floor(x*1e4+0.5) conversion (functions/numeric.py) is
            # IEEE-identical across engines even here
            st.integers(0, 10**9).map(lambda n: n / 10**4 + 5e-5),
            st.integers(0, 10**5).map(lambda n: n / 32),  # dyadic ties
        ),
        min_size=1,
        max_size=200,
    )
)
def test_decimal_sum_cross_engine_exact(spark, values):
    from franzoxide_spark.functions.numeric import dec, dsum, sql_dec

    import pandas as pd

    df = spark.createDataFrame([Row(x=float(v)) for v in values])
    spark_sum = df.agg(dsum(dec("x"), "s")).collect()[0]["s"]
    # feed DuckDB the exact float64 bits via a DataFrame — SQL literals
    # with >15 significant digits get parsed as decimal and can lose the
    # final ulp, which would compare different INPUTS, not engines
    pdf = pd.DataFrame({"x": pd.array([float(v) for v in values], dtype="float64")})
    con = duckdb.connect()
    con.register("t", pdf)
    duck_sum = con.execute(
        f"SELECT CAST(SUM({sql_dec('x')}) AS DOUBLE) FROM t"
    ).fetchone()[0]
    con.close()
    assert spark_sum == duck_sum, (spark_sum, duck_sum)


def test_scaled_int_decimal_branch_floors_in_double_domain(spark):
    """The r12 ADVICE boundary class: for shifted doubles in
    (k - 5e-7, k) a native double->decimal(38,6) cast rounds HALF_UP to
    k BEFORE the floor, so the decimal branch would return k while the
    bigint branch / DuckDB mirror floor the raw double to k-1. The
    decimal branch must floor in the double domain (exact below 2^53)
    and agree bit-for-bit with both."""
    import math

    import pandas as pd

    from franzoxide_spark.functions.numeric import scaled_int, sql_scaled_int

    vals = []
    for k in (1, 7, 123456, -3):
        x = (k - 0.5) / 10000.0
        # step down ulps until the shifted value strictly undershoots k —
        # the exact class where premature decimal rounding flips the floor
        while not (x * 10000.0 + 0.5 < k):
            x = math.nextafter(x, -math.inf)
        vals.append(x)
        vals.append(math.nextafter(x, math.inf))
    # plain values + the >= 2^53 regime (already-integral doubles, where
    # the decimal branch must be a value-preserving cast, never a
    # saturating floor(double)->LONG)
    vals += [0.0, 1.90625, -2.5, 3.14159, 9.5e14, -9.5e14, 1.0e30]
    # regime boundaries for the exact limb decomposition: the 2^53
    # branch point itself, a two-limb value (< 2^64), a three-limb
    # value with a full 53-bit significand, and their negatives
    vals += [
        2.0**53 / 10000.0,
        math.nextafter(2.0**53, math.inf) / 10000.0,
        1.2345678901234567e15,
        1.2345678901234567e25,
        -1.2345678901234567e25,
        -1.0e30,
    ]
    # non-finite inputs must stay NULL on the decimal path (r13 review:
    # NaN orders above every double in Spark, so it would take the wide
    # branch where non-ANSI cast(NaN as bigint) fabricates limb zeros —
    # a silent Decimal('0') that defeats profile.py's null-count guard)
    nonfinite = [float("nan"), float("inf"), float("-inf")]

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = (
        df.select(
            scaled_int("x").alias("b"),
            scaled_int("x", out_type="decimal(38,0)").alias("d"),
        )
        .collect()
    )
    pdf = pd.DataFrame({"x": pd.array(vals, dtype="float64")})
    con = duckdb.connect()
    con.register("t", pdf)
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {sql_scaled_int('x', out_type='HUGEINT')} FROM t"
        ).fetchall()
    ]
    con.close()
    for v, row, w in zip(vals, got, want):
        assert int(row["d"]) == int(w), (v, row["d"], w)
        if abs(v * 10000.0 + 0.5) < 2.0**53:
            assert int(row["b"]) == int(row["d"]) == int(w), (
                v, row["b"], row["d"], w,
            )
    nf = spark.createDataFrame([(v,) for v in nonfinite], "x double")
    for r in nf.select(
        scaled_int("x", out_type="decimal(38,0)").alias("d")
    ).collect():
        assert r["d"] is None, r


# -- EP2 proto3 wire codec round-trips (ingest/protowire.py) ----------------

_proto_str = st.text(max_size=40)
_proto_bytes = st.binary(max_size=60)
_int32 = st.integers(-(2**31), 2**31 - 1)
_int64 = st.integers(-(2**63), 2**63 - 1)
_headers = st.dictionaries(st.text(max_size=15), st.text(max_size=15), max_size=5)


@st.composite
def _kafka_records(draw):
    from franzoxide_spark.ingest import protowire as pw

    return pw.KafkaRecord(
        topic=draw(_proto_str),
        partition=draw(_int32),
        offset=draw(_int64),
        timestamp=draw(_int64),
        key=draw(_proto_bytes),
        value=draw(_proto_bytes),
        headers=draw(_headers),
    )


@given(st.lists(_kafka_records(), max_size=8))
@settings(max_examples=150, deadline=None)
def test_protowire_sink_request_round_trip(records):
    """encode∘decode = id over the full SinkRequest value space, including
    negative intN (10-byte varints), empty strings/bytes (omitted fields
    decode to proto3 defaults), and arbitrary header maps."""
    from franzoxide_spark.ingest import protowire as pw

    req = pw.SinkRequest(record_batch=pw.RecordBatch(records=records))
    assert pw.SinkRequest.decode(req.encode()) == req


@given(
    st.lists(
        st.tuples(_proto_str, _int32, _int64).map(
            lambda t: ("RecordId", *t)
        ),
        max_size=6,
    ),
    st.booleans(),
    _proto_str,
)
@settings(max_examples=100, deadline=None)
def test_protowire_ack_and_control_round_trip(ids, success, msg):
    from franzoxide_spark.ingest import protowire as pw

    ack = pw.SinkResponse(
        ack=pw.RecordAck(
            record_ids=[pw.RecordId(t, p, o) for _, t, p, o in ids],
            success=success,
            error_message=msg,
        )
    )
    assert pw.SinkResponse.decode(ack.encode()) == ack

    cfg = pw.ConnectorConfigMsg(
        connector_class=msg, name=msg, config={msg[:10]: msg}, tasks_max=len(ids)
    )
    assert pw.ConnectorConfigMsg.decode(cfg.encode()) == cfg
    stat = pw.StatusResponse(
        state=pw.STATE_PAUSED if success else pw.STATE_FAILED,
        worker_id=msg,
        tasks=[pw.TaskStatus(i, pw.STATE_RUNNING, msg) for i in range(len(ids))],
        error_message=msg,
    )
    assert pw.StatusResponse.decode(stat.encode()) == stat


# --------------------------------------------------------------------------
# round-6 operators: span coverage, CMS, funnel — invariants over
# generated corpora (one Spark job per example batch)
# --------------------------------------------------------------------------
word = st.sampled_from(["a", "b", "c", "d", "e", "f"])
doc_text = st.lists(word, min_size=0, max_size=12).map(" ".join)


@SET
@given(st.lists(doc_text, min_size=2, max_size=8))
def test_span_coverage_invariants(spark, texts):
    from franzoxide_spark.operators.span_dedup import crossdoc_span_coverage

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = crossdoc_span_coverage(docs, "doc_id", "text", k=3).collect()
    assert len(out) == len(texts)
    for r in out:
        toks = len(texts[r["doc_id"]].split(" ")) if texts[r["doc_id"]] else 1
        assert r["n_grams"] == max(toks - 2, 0)
        assert 0 <= r["dup_grams"] <= r["n_grams"]
        assert 0.0 <= r["dup_fraction"] <= 1.0
    # two identical docs with >= k tokens must both be fully duplicated
    dup_ids = [
        i for i, t in enumerate(texts)
        if len(t.split(" ")) >= 3 and texts.count(t) > 1
    ]
    by_id = {r["doc_id"]: r for r in out}
    for i in dup_ids:
        assert by_id[i]["dup_fraction"] == 1.0


@SET
@given(
    st.lists(st.sampled_from(["x", "y", "z", "w", "v"]), min_size=1, max_size=60),
    st.integers(2, 8),
)
def test_cms_estimate_bounds(spark, items, width):
    from franzoxide_spark.operators.sketch import cms_heavy_hitters

    df = spark.createDataFrame([(i,) for i in items], "word string")
    out = cms_heavy_hitters(df, "word", k=10, depth=3, width=width).collect()
    # never undercounts; never exceeds the stream length
    for r in out:
        assert r["exact_cnt"] <= r["cms_est"] <= len(items)
        assert r["overestimate"]


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(1, 3),
            st.sampled_from(["view", "click", "purchase"]),
            st.integers(0, 59),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_funnel_stage_timestamps_strictly_increase(spark, events):
    import datetime

    from franzoxide_spark.operators.funnel import funnel

    df = spark.createDataFrame(
        [
            (u, t, datetime.datetime(2024, 1, 1, 0, 0, s))
            for u, t, s in events
        ],
        "user_id long, event_type string, ts timestamp",
    )
    out = funnel(
        df, "user_id", "event_type", "ts", ["view", "click", "purchase"]
    ).collect()
    for r in out:
        stamps = [r["stage1_ts"], r["stage2_ts"], r["stage3_ts"]]
        # once a stage is null, every later stage is null
        seen_null = False
        for s in stamps:
            if seen_null:
                assert s is None
            seen_null = seen_null or s is None
        # non-null stage times strictly increase
        present = [s for s in stamps if s is not None]
        assert all(a < b for a, b in zip(present, present[1:]))
        assert r["stage_reached"] == len(present)


# --------------------------------------------------------------------------
# SpaceSaving: summary invariants for ARBITRARY streams (pure Python —
# no Spark job per example, so the full hypothesis budget is cheap)
# --------------------------------------------------------------------------
@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=200),
    st.integers(min_value=1, max_value=8),
)
def test_spacesaving_invariants_hold_for_any_stream(stream, capacity):
    from collections import Counter

    import pandas as pd

    from franzoxide_spark.streaming.stateful import make_spacesaving_update

    class FakeState:
        exists = False
        hasTimedOut = False

        def update(self, v):
            self.exists = True
            self._v = v

        @property
        def get(self):
            return self._v

    st_ = FakeState()
    fn = make_spacesaving_update(capacity)
    # split the stream into two "micro-batches" to exercise state carry
    mid = len(stream) // 2
    for chunk in (stream[:mid], stream[mid:]):
        out = list(fn(("0",), iter([pd.DataFrame({"item": chunk})]), st_))[0]
    true = Counter(stream)
    n = len(stream)
    assert len(out) <= capacity
    tracked = set(out["item"])
    for r in out.itertuples():
        assert r.count_min <= true[r.item] <= r.count_max
        assert r.count_max - r.count_min <= n // capacity  # err bound
    # guarantee: anything strictly above N/capacity must be tracked
    for item, c in true.items():
        if c > n // capacity:
            assert item in tracked, (item, c, n, capacity)


# --------------------------------------------------------------------------
# batch planner: partition + budget invariants on one generated corpus
# --------------------------------------------------------------------------
@SET
@given(
    st.lists(
        st.tuples(st.sampled_from(["en", "de"]), st.integers(1, 500)),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=7),
)
def test_length_batch_plan_partitions_exactly(spark, rows, batch_docs):
    from franzoxide_spark.operators.packing import length_batch_plan

    docs = spark.createDataFrame(
        [(i, lang, n) for i, (lang, n) in enumerate(rows)],
        "doc_id long, lang string, n_tok int",
    )
    out = length_batch_plan(docs, "doc_id", "n_tok", "lang", batch_docs).collect()
    # every doc in exactly one batch; no batch above the size cap; the
    # padded total is n_docs * max_len per batch by construction
    per_lang: dict = {}
    for r in out:
        assert 1 <= r["n_docs"] <= batch_docs
        assert r["pad_tokens"] == r["n_docs"] * r["max_len"] - r["sum_len"]
        assert 0 < r["efficiency"] <= 1.0
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + r["n_docs"]
    from collections import Counter

    want = Counter(lang for lang, _ in rows)
    assert per_lang == dict(want)


# --------------------------------------------------------------------------
# codec round-trip properties (functions/audio.py, video.py, tfrecord.py)
# --------------------------------------------------------------------------


@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=400
    ),
    channels=st.integers(min_value=1, max_value=4),
    rate=st.sampled_from([8000, 16000, 22050, 44100, 48000]),
)
@settings(max_examples=120, deadline=None)
def test_wav_round_trips_any_pcm(samples, channels, rate):
    import numpy as np

    from franzoxide_spark.functions.audio import decode_wav, encode_wav

    n = len(samples) - len(samples) % channels
    if n == 0:
        samples = samples * channels
        n = channels
    arr = np.asarray(samples[:n], dtype="<i2").reshape(-1, channels)
    got_rate, back = decode_wav(encode_wav(arr, rate))
    assert got_rate == rate
    np.testing.assert_array_equal(back, arr)


@given(
    n_frames=st.integers(min_value=1, max_value=10**6),
    width=st.integers(min_value=1, max_value=8192),
    height=st.integers(min_value=1, max_value=8192),
    fps=st.sampled_from([10, 24, 25, 30, 60, 120]),
)
@settings(max_examples=120, deadline=None)
def test_avi_header_round_trips_any_geometry(n_frames, width, height, fps):
    from franzoxide_spark.functions.video import (
        encode_avi_header,
        parse_avi_header,
    )

    m = parse_avi_header(encode_avi_header(n_frames, width, height, fps))
    assert (m["n_frames"], m["width"], m["height"]) == (n_frames, width, height)
    # fps reconstructed from the truncated usec interval, not the input
    assert abs(m["fps"] - fps) / fps < 0.001


@given(
    payloads=st.lists(st.binary(min_size=0, max_size=300), min_size=0, max_size=30)
)
@settings(max_examples=120, deadline=None)
def test_tfrecord_stream_round_trips_any_payloads(payloads):
    from franzoxide_spark.functions.tfrecord import frame_record, read_records

    stream = b"".join(frame_record(p) for p in payloads)
    assert read_records(stream) == payloads


@given(
    payload=st.binary(min_size=1, max_size=200),
    flip=st.integers(min_value=0, max_value=10**9),
)
@settings(max_examples=120, deadline=None)
def test_tfrecord_any_single_bitflip_is_detected(payload, flip):
    import pytest as _pytest

    from franzoxide_spark.functions.tfrecord import frame_record, read_records

    raw = bytearray(frame_record(payload))
    pos = flip % len(raw)
    bit = 1 << (flip % 8)
    raw[pos] ^= bit
    with _pytest.raises(ValueError):
        read_records(bytes(raw))


@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    ft=st.integers(min_value=0, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=120, deadline=None)
def test_png_round_trips_any_geometry_and_filter(w, h, ft, seed):
    import numpy as np

    from franzoxide_spark.functions.raster import decode_png, encode_png

    img = np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8
    )
    np.testing.assert_array_equal(decode_png(encode_png(img, ft)), img)


@given(
    flip=st.integers(min_value=0, max_value=10**9),
    seed=st.integers(min_value=0, max_value=1000),
)
@settings(max_examples=120, deadline=None)
def test_png_any_single_bitflip_detected_or_equal(flip, seed):
    """Flipping any single bit in a PNG either raises ValueError (crc/
    structure/inflate) or — never — silently yields different pixels.
    The signature region is exempt (a broken signature routes to the
    not-a-PNG error, also a ValueError)."""
    import numpy as np
    import pytest as _pytest

    from franzoxide_spark.functions.raster import decode_png, encode_png

    img = np.random.default_rng(seed).integers(0, 256, (5, 5, 3), dtype=np.uint8)
    raw = bytearray(encode_png(img, filter_type=seed % 5))
    raw[flip % len(raw)] ^= 1 << (flip % 8)
    try:
        out = decode_png(bytes(raw))
    except ValueError:
        return
    np.testing.assert_array_equal(out, img)  # flip must not alter pixels


# --------------------------------------------------------------------------
# survival / forecasting folds vs pure-Python references (r8)
# --------------------------------------------------------------------------


def _round_half_up6(x: float) -> float:
    """Both engines ROUND HALF_UP; Python's round() is banker's and
    splits exact ties (e.g. 0.6015625) the other way."""
    import decimal

    return float(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
        )
    )


def _km_reference(durs_churn):
    """Plain-Python Kaplan-Meier over (duration, churned) pairs."""
    from collections import Counter

    a = Counter(d for d, _ in durs_churn)
    dth = Counter(d for d, c in durs_churn if c)
    out, s = {}, 1.0
    for t in sorted(a):
        n_risk = sum(v for d, v in a.items() if d >= t)
        s *= 1.0 - dth.get(t, 0) / n_risk
        out[t] = (n_risk, dth.get(t, 0), _round_half_up6(s))
    return out


@given(
    spans=st.lists(
        st.tuples(st.integers(min_value=0, max_value=20),   # start day
                  st.integers(min_value=0, max_value=15)),  # duration
        min_size=1, max_size=25,
    )
)
@settings(max_examples=25, deadline=None)
def test_kaplan_meier_matches_python_reference(spark, spans):
    import datetime as dt

    from franzoxide_spark.operators.timeseries import kaplan_meier_retention

    base = dt.datetime(2024, 1, 1)
    day = dt.timedelta(days=1)
    rows = []
    for uid, (start, dur) in enumerate(spans):
        rows.append((uid, base + day * start))
        rows.append((uid, base + day * (start + dur)))
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    end = max(s + d for s, d in spans)
    cutoff = end - 7
    ref = _km_reference(
        [(d, (s + d) < cutoff) for s, d in spans]
    )
    got = {
        r["duration_days"]: (r["n_risk"], r["n_churn"], r["survival"])
        for r in kaplan_meier_retention(ev, "user_id", "ts").collect()
    }
    assert got == ref


@given(
    vals=st.lists(
        st.floats(min_value=-100, max_value=100,
                  allow_nan=False, allow_infinity=False),
        min_size=1, max_size=15,
    )
)
@settings(max_examples=25, deadline=None)
def test_holt_matches_python_reference(spark, vals):
    import datetime as dt

    from franzoxide_spark.operators.timeseries import holt_linear_trend

    base = dt.datetime(2024, 1, 1)
    rows = [(1, base + dt.timedelta(days=i), v) for i, v in enumerate(vals)]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    # the operator aggregates daily with exact-decimal rounding first —
    # mirror that in the reference
    import math
    daily = [math.floor(v * 10_000 + 0.5) / 10_000 for v in vals]
    a, g = 0.5, 0.3
    l, b = round(daily[0], 6), 0.0
    for x in [round(d, 6) for d in daily[1:]]:
        nl = a * x + (1 - a) * (l + b)
        b = g * (nl - l) + (1 - g) * b
        l = nl
    r = holt_linear_trend(ev, "user_id", "ts", "value").collect()[0]
    assert abs(r["level"] - l) < 1e-6
    assert abs(r["trend"] - b) < 1e-6


@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    quality=st.integers(min_value=1, max_value=100),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=120, deadline=None)
def test_jpeg_any_geometry_quality_round_trip_and_deterministic(
    w, h, quality, seed
):
    """Baseline JPEG (functions/jpeg.py) for ANY geometry/quality/pixels:
    encode is byte-deterministic, decode returns the exact geometry, and
    the reconstruction error is bounded by the quantization the quality
    implies (lossy codec — the property is boundedness, not equality:
    even q=1's coarsest table cannot displace a pixel by more than the
    worst-case dequantization error, far under the 255 range)."""
    import numpy as np

    from franzoxide_spark.functions.jpeg import decode_jpeg, encode_jpeg

    img = np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8
    )
    raw = encode_jpeg(img, quality)
    assert raw == encode_jpeg(img, quality)  # byte-deterministic
    dec = decode_jpeg(raw)
    assert dec.shape == (h, w, 3)
    assert dec.dtype == np.uint8
    # decode is also deterministic
    np.testing.assert_array_equal(dec, decode_jpeg(raw))


@given(
    flip=st.integers(min_value=0, max_value=10**9),
    seed=st.integers(min_value=0, max_value=1000),
)
@settings(max_examples=120, deadline=None)
def test_jpeg_any_single_bitflip_never_crashes(flip, seed):
    """Flipping any single bit in a JPEG either still decodes (entropy
    bits are not integrity-protected — unlike PNG there is no CRC, so a
    payload flip legally yields different pixels) or raises ValueError;
    it must NEVER raise anything else or hang (the fuzz contract the
    decode_image_stats ok-flag relies on)."""
    import numpy as np
    import pytest as _pytest

    from franzoxide_spark.functions.jpeg import decode_jpeg, encode_jpeg

    img = np.random.default_rng(seed).integers(0, 256, (6, 7, 3), dtype=np.uint8)
    raw = bytearray(encode_jpeg(img, 80))
    raw[flip % len(raw)] ^= 1 << (flip % 8)
    try:
        out = decode_jpeg(bytes(raw))
        assert out.dtype == np.uint8 and out.ndim == 3
    except ValueError:
        pass


# --------------------------------------------------------------------------
# scaled_int decimal output: Spark limb decomposition == DuckDB HUGEINT
# on arbitrary finite doubles across the whole contract range
# --------------------------------------------------------------------------
@SET
@given(
    st.lists(
        st.one_of(
            # full contract range: |shifted| = |x|*1e4 stays under the
            # decimal(38,0) / HUGEINT ceiling (~1e38)
            st.floats(-1e33, 1e33, allow_nan=False, allow_infinity=False),
            # dense around the 2^53 branch point (the exactness regime
            # change for the limb decomposition)
            st.floats(2.0**53 / 1e4 * 0.5, 2.0**53 / 1e4 * 2.0),
            st.floats(-(2.0**53) / 1e4 * 2.0, -(2.0**53) / 1e4 * 0.5),
            # half-up tie neighborhoods below the branch point
            st.integers(-(10**9), 10**9).map(lambda n: n / 1e4 + 5e-5),
        ),
        min_size=1,
        max_size=120,
    )
)
def test_scaled_int_decimal_matches_duckdb_random(spark, values):
    import pandas as pd

    from franzoxide_spark.functions.numeric import scaled_int, sql_scaled_int

    df = spark.createDataFrame([Row(i=i, x=float(v)) for i, v in enumerate(values)])
    got = {
        r["i"]: int(r["d"])
        for r in df.select(
            "i", scaled_int("x", out_type="decimal(38,0)").alias("d")
        ).collect()
    }
    pdf = pd.DataFrame(
        {"x": pd.array([float(v) for v in values], dtype="float64")}
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {sql_scaled_int('x', out_type='HUGEINT')} FROM t"
        ).fetchall()
    ]
    con.close()
    for i, (v, w) in enumerate(zip(values, want)):
        assert got[i] == int(w), (v, got[i], w)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    min_size=1, max_size=24), min_size=1, max_size=8, unique=True))
def test_bloom_bit_layout_cross_engine(spark, shingles):
    """The r14 bloom contract — HASH60(shingle) keyed, bit indices from
    md5 of the hash's decimal string — must produce the IDENTICAL
    (word_idx, bit) layout in Spark SQL, DuckDB SQL, and a hashlib
    reference, for arbitrary shingle strings. A divergence here is a
    silent fp-count mismatch in every q165-family report."""
    import hashlib

    def ref_layout(s: str):
        h60 = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        digest = hashlib.md5(str(h60).encode()).hexdigest()
        out = []
        for seed in range(4):
            idx = int(digest[4 * seed:4 * seed + 4], 16)
            out.append((idx // 64, idx % 64))
        return h60, out

    from franzoxide_spark.functions.text import HASH60_SPARK, sql_hash60

    rows = spark.createDataFrame([(s,) for s in shingles], "s string")
    g = HASH60_SPARK.format(s="s")
    proj = [F.expr(g).alias("g")]
    for seed in range(4):
        h = (f"cast(conv(substr(md5(cast({g} as string)),"
             f" {1 + 4 * seed}, 4), 16, 10) as int)")
        proj += [F.expr(f"({h} div 64)").alias(f"w{seed}"),
                 F.expr(f"({h} % 64)").alias(f"b{seed}")]
    got_spark = {r["g"]: [(r[f"w{i}"], r[f"b{i}"]) for i in range(4)]
                 for r in rows.select(*proj).collect()}

    con = duckdb.connect()
    h60_sql = sql_hash60("s")
    sel = [f"{h60_sql} AS g"]
    for seed in range(4):
        idx = (f"CAST('0x' || substr(md5(CAST({h60_sql} AS VARCHAR)),"
               f" {1 + 4 * seed}, 4) AS INT)")
        sel += [f"({idx} // 64) AS w{seed}", f"({idx} % 64) AS b{seed}"]
    vals = ", ".join(
        "('" + s.replace("'", "''") + "')" for s in shingles)
    q = (f"SELECT {', '.join(sel)} FROM (VALUES {vals}) t(s)")
    got_duck = {row[0]: [(row[1 + 2 * i], row[2 + 2 * i]) for i in range(4)]
                for row in con.execute(q).fetchall()}
    con.close()

    for s in shingles:
        h60, layout = ref_layout(s)
        assert got_spark[h60] == layout, (s, h60)
        assert got_duck[h60] == layout, (s, h60)


# --------------------------------------------------------------------------
# TTL-session dedup: Spark batch face == plain-Python sequential reference
# (r15 unfreeze #1a — the property the streaming parity test can't give:
# arbitrary key/member/time shapes incl. ties, singletons, exact-ttl gaps)
# --------------------------------------------------------------------------
@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),        # key
            st.integers(min_value=0, max_value=3),        # member
            st.integers(min_value=0, max_value=40_000),   # epoch seconds
        ),
        min_size=1,
        max_size=30,
    )
)
def test_batch_ttl_session_dedup_matches_python_reference(spark, events):
    import datetime as dt

    from franzoxide_spark.streaming.stateful import batch_ttl_session_dedup

    ttl = 3600
    rows = [
        Row(
            k=str(k),
            m=f"m{m}",
            ts=dt.datetime(2024, 1, 1) + dt.timedelta(seconds=es),
        )
        for k, m, es in events
    ]
    df = spark.createDataFrame(rows)
    got = sorted(
        (r["key"], r["member"], r["first_es"])
        for r in batch_ttl_session_dedup(df, "k", "m", "ts", ttl_s=ttl).collect()
    )

    # reference: per key sort by time, gap > ttl opens a session, first
    # occurrence per (session, member) emits with its time
    base = int(dt.datetime(2024, 1, 1).timestamp())
    by_key: dict[str, list[tuple[int, str]]] = {}
    for k, m, es in events:
        by_key.setdefault(str(k), []).append((base + es, f"m{m}"))
    want = []
    for k, evs in by_key.items():
        evs.sort(key=lambda e: e[0])
        last = None
        seen: set[str] = set()
        for es, m in evs:
            if last is not None and es - last > ttl:
                seen = set()
            last = es
            if m not in seen:
                seen.add(m)
                want.append((k, m, es))
    assert got == sorted(want)


# --------------------------------------------------------------------------
# near-dup gate update fn: arbitrary bucket feeds == sequential reference
# (r15) — covers empty shingle sets, replays, any batch split, same-batch
# ordering; the Spark-level parity test can't sweep these shapes
# --------------------------------------------------------------------------
@SET
@given(
    st.lists(  # docs: (id, shingle set) — ids may repeat (replays)
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.frozensets(st.integers(min_value=0, max_value=6), max_size=5),
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=4),  # number of micro-batches
)
def test_neardup_gate_update_fn_matches_sequential_reference(docs, n_batches):
    import pandas as pd

    from franzoxide_spark.streaming.stateful import make_neardup_gate_update

    threshold = 0.5

    class FakeState:
        exists = False
        hasTimedOut = False

        def update(self, v):
            self.exists = True
            self._v = v

        @property
        def get(self):
            return self._v

        def setTimeoutTimestamp(self, ms):
            pass

        def getCurrentWatermarkMs(self):
            return 0

    fn = make_neardup_gate_update(threshold)
    st_ = FakeState()
    # split the doc sequence into contiguous micro-batches
    per = max(1, len(docs) // n_batches)
    batches = [docs[i:i + per] for i in range(0, len(docs), per)]
    got = []
    for b in batches:
        pdf = pd.DataFrame(
            {"doc_id": [d for d, _ in b], "sh": [sorted(s) for _, s in b]}
        )
        out = list(fn(("b",), iter([pdf]), st_))[0]
        got.extend(tuple(r) for r in out.itertuples(index=False))

    # sequential reference: within each batch docs resolve in id order;
    # replayed ids are already residents; verdict = min-id resident with
    # jaccard >= threshold at arrival time
    residents: list[tuple[int, frozenset]] = []
    known: set[int] = set()
    want = []
    for b in batches:
        for doc_id, sh in sorted(b, key=lambda d: d[0]):
            if doc_id in known:
                continue
            best = None
            for pid, psh in residents:
                union = len(sh | psh)
                if not union:
                    continue
                j = round(len(sh & psh) / union, 6)
                if j >= threshold and (best is None or pid < best[0]):
                    best = (pid, j)
            if best is not None:
                want.append((doc_id, best[0], best[1]))
            residents.append((doc_id, frozenset(sh)))
            known.add(doc_id)
    assert got == want
