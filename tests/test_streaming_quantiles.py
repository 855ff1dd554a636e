"""Streaming bottom-k quantiles (streaming/stateful.py): bounded state,
order/batching independence, stream == batch-twin parity."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from franzoxide_spark.streaming.stateful import (
    batch_bottomk_quantiles,
    make_quantile_update,
    streaming_quantiles,
)


class _FakeState:
    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)
        self.exists = True


def _drive(update, batches):
    import pandas as pd

    st = _FakeState()
    out = None
    for rows in batches:
        pdf = pd.DataFrame(rows, columns=["rid", "value"])
        out = list(update(("k",), iter([pdf]), st))[-1]
    return st, out


def test_state_is_order_and_batching_independent():
    """The property the design buys: ANY permutation and ANY re-batching
    of the same rows leaves the state identical (bottom-k by a
    deterministic id hash has no order dependence)."""
    rows = [(i, float((i * 37) % 100)) for i in range(500)]
    update = make_quantile_update(capacity=64)
    st_a, _ = _drive(update, [rows[:100], rows[100:350], rows[350:]])
    st_b, _ = _drive(update, [list(reversed(rows))])
    st_c, _ = _drive(update, [rows[250:], rows[:250]])
    def canon(st):
        n, hashes, vals = st._v
        return n, sorted(zip(hashes, vals))
    assert canon(st_a) == canon(st_b) == canon(st_c)


def test_state_bounded_by_capacity():
    rows = [(i, float(i)) for i in range(10_000)]
    update = make_quantile_update(capacity=32)
    st, out = _drive(update, [rows])
    n, hashes, vals = st._v
    assert n == 10_000
    assert len(hashes) == 32 and len(vals) == 32
    assert out["n_seen"].iloc[0] == 10_000 and out["sample_n"].iloc[0] == 32


def test_quantiles_within_sampling_tolerance():
    """On 10k uniform values with capacity 512 the sampled quartiles sit
    within a few percent of the exact ones (sampling error ~1/sqrt(512))."""
    rows = [(i, float(i % 1000)) for i in range(10_000)]
    update = make_quantile_update(capacity=512)
    _, out = _drive(update, [rows])
    assert abs(out["p50"].iloc[0] - 499.5) < 75
    assert abs(out["p25"].iloc[0] - 249.75) < 75
    assert abs(out["p75"].iloc[0] - 749.25) < 75


def test_capacity_must_be_positive():
    with pytest.raises(ValueError, match="capacity"):
        make_quantile_update(0)


def test_stream_matches_batch_twin(spark, sf_dir, tmp_path):
    """End-to-end: the streaming result over incrementally-arriving
    files equals batch_bottomk_quantiles over the union — the
    order-independence property at the query level."""
    from franzoxide_spark.tables import table

    ev = table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for i in range(2):
        stage = str(tmp_path / f"b{i}")
        ev.filter(F.col("event_id") % 2 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        for f in glob.glob(stage + "/*.parquet"):
            os.link(f, os.path.join(in_dir, f"b{i}.parquet"))
    stream = (
        spark.readStream.schema("event_id long, event_type string, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    q = (
        streaming_quantiles(stream, "event_type", "event_id", "value", 128)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("sq_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update mode: the LAST row per key is the final state
    import pandas as pd

    got = (
        spark.sql("SELECT * FROM sq_out").toPandas()
        .groupby("key").last().reset_index()
    )
    exp = batch_bottomk_quantiles(
        ev, "event_type", "event_id", "value", 128
    ).toPandas()
    merged = got.merge(exp, on="key", suffixes=("_s", "_b"))
    assert len(merged) == len(exp) == 5
    for _, r in merged.iterrows():
        assert r["n_seen_s"] == r["n_seen_b"]
        assert r["sample_n_s"] == r["sample_n_b"]
        for c in ("p25", "p50", "p75"):
            assert round(r[c + "_s"], 6) == round(r[c + "_b"], 6), (r["key"], c)
