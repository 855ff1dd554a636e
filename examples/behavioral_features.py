"""End-to-end behavioral training set: the event-log side of the engine
composed the way a user-action-model pipeline runs it.

    raw events
      → skew check       (q90: is user_id safe to shuffle on?)
      → rolling features (q89: trailing 7d/1h counts + exact sums per event)
      → sessionization   (q74: 30-min-gap sessions, ordered type paths)
      → transition prior (q98: the Markov matrix of those paths)
      → next-action set  (per event: the features + the label = the next
                          event type in the same session)
      → batch plan       (q95's planner over per-user sequence lengths)
      → write            (parquet partitioned by the label)

Every stage is the registry operator (the same code the DuckDB oracle
checks); this script chains them, prints stage counts, asserts the
pipeline invariants (feature/label alignment, no cross-session labels,
batch budgets), and writes the training table.

Plan shapes are the 100 TB ones: a single user-key shuffle carries the
rolling frames, the sessionization, AND the label derivation (all three
are windows over the same key); the skew report and transition matrix
aggregate into bounded grids; the batch planner shuffles once on its
group key. Nothing collects the corpus to the driver.

Usage: python examples/behavioral_features.py
       [env: SPARK_GRAFT_SF_DIR (/root/testdata/sf0.01), OUT_DIR]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from franzoxide_spark.operators.packing import length_batch_plan  # noqa: E402
from franzoxide_spark.operators.skew import join_skew_report  # noqa: E402
from franzoxide_spark.operators.timeseries import (  # noqa: E402
    rolling_time_features,
    with_session_index,
)
from franzoxide_spark.queries.corpus import _Q74_GAP_MIN, q74, q98  # noqa: E402
from franzoxide_spark.session import get_spark  # noqa: E402
from franzoxide_spark.tables import table  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.environ.get("OUT_DIR") or os.path.join(
        tempfile.mkdtemp(prefix="behavioral_"), "train"
    )
    spark = get_spark(app_name="behavioral_features", driver_memory="8g")

    ev = table(spark, sf_dir, "events")
    n_events = ev.count()

    # 1. skew check — the number that says whether the user_id shuffle
    #    every stage below rides is safe, or needs q66's salting
    skew = join_skew_report(ev, "user_id").collect()[0]
    print(
        f"events={n_events} users={skew['n_keys']} "
        f"max_share={skew['max_share']} gini={skew['gini']}"
    )
    assert skew["max_share"] < 0.05, "hot user — salt the key first"

    # 2. per-event trailing features (one user-key shuffle)
    feats = rolling_time_features(ev, "event_id", "user_id", "ts", "value")

    # 3. label: the NEXT event type within the same 30-min session —
    #    q74's sessionization via the SHARED helper (one implementation,
    #    so the example's labels can't drift from the oracle-checked op)
    sess = with_session_index(
        ev, "user_id", "ts", "event_id", gap_s=_Q74_GAP_MIN * 60
    )
    ws = Window.partitionBy("user_id", "session_idx").orderBy(
        F.col("ts").cast("long"), "event_id"
    )
    labeled = sess.select(
        "event_id",
        "user_id",
        "event_type",
        F.lead("event_type").over(ws).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())

    train = labeled.join(feats, ["event_id", "user_id"])
    n_train = train.count()
    print(f"training rows={n_train} (events with an in-session successor)")
    assert 0 < n_train < n_events

    # feature/label alignment: every training row keeps its event's
    # trailing counts; spot-check the join lost nothing it shouldn't
    assert train.filter(F.col("n_7d").isNull()).count() == 0

    # 4. the transition prior the model is calibrated against
    prior = q98(spark, sf_dir)
    cells = prior.collect()
    by_from: dict = {}
    for r in cells:
        by_from.setdefault(r["from_type"], 0.0)
        by_from[r["from_type"]] += r["p"]
    for k, tot in by_from.items():
        assert abs(tot - 1.0) < 1e-4, (k, tot)  # rows are distributions
    print(f"transition grid: {len(cells)} cells, rows normalize to 1")

    # 5. batch plan over per-user sequence lengths (q95's planner)
    seqs = q74(spark, sf_dir).select(
        F.concat_ws("#", "user_id", "session_idx").alias("seq_id"),
        F.lit("all").alias("grp"),
        F.col("n_events").alias("n_tok"),
    )
    plan = length_batch_plan(seqs, "seq_id", "n_tok", "grp", batch_docs=32)
    waste = plan.agg(
        F.sum("pad_tokens").alias("pad"), F.sum("sum_len").alias("toks")
    ).collect()[0]
    print(f"batch plan: pad={waste['pad']} real={waste['toks']}")

    # 6. write, partitioned by the label (the training loader's split key)
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    train.write.partitionBy("next_type").parquet(out_dir)
    written = spark.read.parquet(out_dir).count()
    assert written == n_train
    print(f"wrote {written} rows -> {out_dir}")


if __name__ == "__main__":
    main()
