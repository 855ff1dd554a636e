"""Semantic + plan-shape tests for operators/funnel.py (q71) and
operators/sketch.py (q72). Oracle parity for the fixture-bound queries
runs in test_oracle_queries.py; these pin ordering semantics (funnel
stages must advance in time), the CMS never-undercount guarantee under
forced collisions, and the bounded-state / single-shuffle plan shapes.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from franzoxide_spark.operators.funnel import funnel
from franzoxide_spark.operators.sketch import (
    cms_build,
    cms_heavy_hitters,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, datetime.datetime(2024, 1, 1, 0, 0, s)) for u, t, s in rows],
        "user_id long, event_type string, ts timestamp",
    )


# --------------------------------------------------------------------------
# funnel
# --------------------------------------------------------------------------


def test_funnel_requires_stages_in_time_order(spark):
    rows = [
        # user 1: view(1) -> click(2) -> purchase(3): full funnel
        (1, "view", 1), (1, "click", 2), (1, "purchase", 3),
        # user 2: purchase BEFORE click: chain breaks at stage 3
        (2, "view", 1), (2, "purchase", 2), (2, "click", 4),
        # user 3: click only, never viewed: stage 1 never opens
        (3, "click", 1), (3, "purchase", 2),
    ]
    out = {
        r["user_id"]: r
        for r in funnel(
            _ev(spark, rows), "user_id", "event_type", "ts",
            ["view", "click", "purchase"],
        ).collect()
    }
    assert out[1]["stage_reached"] == 3
    assert out[2]["stage_reached"] == 2 and out[2]["stage3_ts"] is None
    assert out[3]["stage_reached"] == 0 and out[3]["stage1_ts"] is None


def test_funnel_picks_first_qualifying_timestamp_per_stage(spark):
    # two clicks after the view: stage 2 is the EARLIER one (second 3),
    # which then admits the purchase at second 4
    rows = [(1, "view", 2), (1, "click", 5), (1, "click", 3), (1, "purchase", 4)]
    out = funnel(
        _ev(spark, rows), "user_id", "event_type", "ts",
        ["view", "click", "purchase"],
    ).collect()[0]
    assert out["stage2_ts"].second == 3
    assert out["stage_reached"] == 3


def test_funnel_same_timestamp_does_not_advance(spark):
    # strict ordering: click at the same instant as the view doesn't count
    rows = [(1, "view", 1), (1, "click", 1)]
    out = funnel(
        _ev(spark, rows), "user_id", "event_type", "ts", ["view", "click"]
    ).collect()[0]
    assert out["stage_reached"] == 1 and out["stage2_ts"] is None


def test_funnel_plan_is_single_shuffle_no_joins(spark):
    df = funnel(
        _ev(spark, [(1, "view", 1)]), "user_id", "event_type", "ts",
        ["view", "click", "purchase"],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # one Exchange for the user partitioning; the final aggregate is
    # co-partitioned on the same key, so no second full shuffle of data
    assert plan.count("Exchange hashpartitioning") <= 2


# --------------------------------------------------------------------------
# count-min sketch
# --------------------------------------------------------------------------


def test_cms_never_undercounts_even_with_forced_collisions(spark):
    # width=2 forces heavy collisions; the CMS guarantee (est >= exact)
    # must still hold for every item
    rows = [(f"item{i % 7}",) for i in range(200)]
    df = spark.createDataFrame(rows, "word string")
    out = cms_heavy_hitters(df, "word", k=7, depth=3, width=2).collect()
    assert len(out) == 7
    assert all(r["overestimate"] for r in out)
    assert all(r["cms_est"] >= r["exact_cnt"] for r in out)


def test_cms_sketch_size_is_bounded_by_depth_times_width(spark):
    rows = [(f"w{i}",) for i in range(500)]
    df = spark.createDataFrame(rows, "word string")
    sketch = cms_build(df, "word", depth=4, width=16)
    assert sketch.count() <= 4 * 16


def test_cms_recovers_the_true_heavy_hitter(spark):
    rows = [("whale",)] * 100 + [(f"minnow{i}",) for i in range(50)]
    df = spark.createDataFrame(rows, "word string")
    top = cms_heavy_hitters(df, "word", k=1, depth=4, width=64).collect()
    assert top[0]["word"] == "whale"
    assert top[0]["exact_cnt"] == 100


def test_cms_probe_broadcasts_the_sketch(spark):
    rows = [(f"w{i % 9}",) for i in range(100)]
    df = spark.createDataFrame(rows, "word string")
    plan = (
        cms_heavy_hitters(df, "word", k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
