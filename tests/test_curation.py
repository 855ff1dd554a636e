"""Curation operators: benchmark decontamination + deterministic splits.

These are the two corpus-curation steps a training-data pipeline runs
after dedup/quality filtering (operators/curation.py); q54 composes them
into the oracle-checked pipeline, these tests pin the operator semantics
and the 100 TB plan shape in isolation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from franzoxide_spark.operators.curation import (
    decontaminate,
    decontaminate_stream,
    eval_shingle_hashes,
    split_assign,
    sql_split_assign,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


class TestDecontaminate:
    def test_drops_only_overlapping_docs(self, spark):
        eval_docs = _docs(spark, [(100, "alpha beta gamma delta epsilon", "en")])
        pool = _docs(
            spark,
            [
                # shares the 4-gram "alpha beta gamma delta" -> contaminated
                (1, "zero alpha beta gamma delta more words here", "en"),
                # shares only a 3-gram ("beta gamma delta" overlaps but no
                # 4 consecutive tokens in common) -> clean
                (2, "x beta gamma delta y z w v", "en"),
                # no overlap at all -> clean
                (3, "completely different text with no overlap at all", "en"),
            ],
        )
        out = decontaminate(pool, eval_docs, k=4)
        assert sorted(r["doc_id"] for r in out.collect()) == [2, 3]

    def test_passthrough_columns_and_short_docs(self, spark):
        # docs shorter than k have no shingles -> never contaminated;
        # all input columns survive unchanged
        eval_docs = _docs(spark, [(100, "a b c d", "en")])
        pool = _docs(spark, [(1, "a b c", "en"), (2, "a b c d", "de")])
        out = decontaminate(pool, eval_docs, k=4)
        rows = {r["doc_id"]: r for r in out.collect()}
        assert set(rows) == {1}
        assert rows[1]["text"] == "a b c" and rows[1]["lang"] == "en"
        assert out.columns == pool.columns

    def test_probe_superset_gives_identical_result(self, spark):
        """Probing contamination on a cheap upstream superset (q54 passes
        the raw pool while filtering the gated frame) must not change the
        outcome: probe-only ids can't survive the anti-join."""
        eval_docs = _docs(spark, [(100, "alpha beta gamma delta epsilon", "en")])
        pool = _docs(
            spark,
            [
                (1, "zero alpha beta gamma delta more words here", "en"),
                (2, "x beta gamma delta y z w v", "en"),
                (3, "completely different text with no overlap at all", "en"),
                # present only in the probe frame, not in docs
                (4, "alpha beta gamma delta tail", "en"),
            ],
        )
        docs = pool.filter(F.col("doc_id") < 4)
        via_probe = decontaminate(docs, eval_docs, k=4, probe=pool)
        direct = decontaminate(docs, eval_docs, k=4)
        assert sorted(r["doc_id"] for r in via_probe.collect()) == [2, 3]
        assert sorted(r["doc_id"] for r in direct.collect()) == [2, 3]

    def test_plan_broadcasts_both_small_sides(self, spark):
        """The corpus side must never shuffle: the eval shingle set and the
        contaminated-id set both broadcast (the decontam contract at scale
        — eval suites are tiny, corpora are not)."""
        eval_docs = _docs(spark, [(100, "alpha beta gamma delta epsilon", "en")])
        pool = _docs(spark, [(1, "zero alpha beta gamma delta more", "en")])
        plan = decontaminate(pool, eval_docs, k=4)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("BroadcastHashJoin") >= 2, plan
        assert "SortMergeJoin" not in plan, plan


class TestDecontaminateStream:
    def test_single_pass_variant_matches_join_path(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        ev = docs.filter(F.col("doc_id") % 97 == 0)
        pool = docs.filter(F.col("doc_id") % 97 != 0)
        ev_hs = eval_shingle_hashes(ev, k=4)
        join_ids = {r["doc_id"] for r in decontaminate(pool, ev, k=4).select("doc_id").collect()}
        udf_ids = {r["doc_id"] for r in decontaminate_stream(pool, ev_hs, k=4).select("doc_id").collect()}
        assert join_ids == udf_ids
        # a sparkContext.broadcast of the set works identically
        bc = spark.sparkContext.broadcast(ev_hs)
        bc_ids = {r["doc_id"] for r in decontaminate_stream(pool, bc, k=4).select("doc_id").collect()}
        assert bc_ids == join_ids

    def test_bloom_prefilter_opt_in_is_result_identical(self, spark, sf_dir):
        """r16: the opt-in JVM Bloom pre-filter (bloom_k > 0) only
        narrows what crosses Arrow — the exact probe resolves its false
        positives and the bitmap (built FROM the eval set) can have no
        false negatives, so the kept set is identical at every bloom_k,
        including a deliberately tiny bitmap (high-fpp stress) and the
        broadcast-set calling convention."""
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        ev = docs.filter(F.col("doc_id") % 97 == 0)
        pool = docs.filter(F.col("doc_id") % 97 != 0)
        ev_hs = eval_shingle_hashes(ev, k=4)
        base = {r["doc_id"] for r in decontaminate_stream(
            pool, ev_hs, k=4).select("doc_id").collect()}
        for kwargs in (
            {"bloom_k": 1},
            {"bloom_k": 3},
            {"bloom_k": 3, "bloom_bits": 1 << 10},  # fpp-stress bitmap
        ):
            got = {r["doc_id"] for r in decontaminate_stream(
                pool, ev_hs, k=4, **kwargs).select("doc_id").collect()}
            assert got == base, kwargs
        bc = spark.sparkContext.broadcast(ev_hs)
        got_bc = {r["doc_id"] for r in decontaminate_stream(
            pool, bc, k=4, bloom_k=3).select("doc_id").collect()}
        assert got_bc == base

    def test_works_on_a_streaming_source(self, spark, sf_dir, tmp_path):
        """Curation at ingest time: decontam + split on readStream, result
        identical to the batch pipeline (the join-based batch path is a
        two-pass plan Structured Streaming rejects)."""
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        ev = docs.filter(F.col("doc_id") % 97 == 0)
        pool = docs.filter(F.col("doc_id") % 97 != 0)
        pool.write.parquet(str(tmp_path / "in"))
        stream = spark.readStream.schema(docs.schema).parquet(str(tmp_path / "in"))
        clean = split_assign(decontaminate_stream(stream, eval_shingle_hashes(ev, k=4), k=4))
        q = (
            clean.writeStream.format("memory").queryName("curation_stream")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            (r["doc_id"], r["split"])
            for r in spark.sql("select doc_id, split from curation_stream").collect()
        }
        want = {
            (r["doc_id"], r["split"])
            for r in split_assign(decontaminate(pool, ev, k=4)).select("doc_id", "split").collect()
        }
        assert got == want


class TestSplitAssign:
    def test_deterministic_and_exhaustive(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        a = split_assign(docs).select("doc_id", "split")
        b = split_assign(docs.repartition(7)).select("doc_id", "split")
        # same assignment regardless of partitioning; no row unassigned
        assert a.filter(F.col("split").isNull()).count() == 0
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    def test_proportions_roughly_match_weights(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = docs.count()
        counts = dict(
            split_assign(docs).groupBy("split").count().rdd.map(tuple).collect()
        )
        assert set(counts) <= {"train", "val", "test"}
        # md5 buckets: train ~90% with generous slack for small fixtures
        assert counts["train"] / n > 0.8
        assert counts.get("val", 0) / n < 0.15
        assert counts.get("test", 0) / n < 0.15

    def test_duckdb_mirror_is_identical(self, spark, sf_dir):
        import duckdb

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        sp = dict(
            split_assign(docs).select("doc_id", "split").rdd.map(tuple).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM"
            f" read_parquet('{sf_dir}/documents.parquet')"
        )
        du = dict(
            con.execute(
                f"SELECT doc_id, {sql_split_assign('doc_id')} FROM documents"
            ).fetchall()
        )
        assert sp == du

    def test_seed_changes_assignment_weights_validated(self, spark):
        df = _docs(spark, [(i, "t", "en") for i in range(200)])
        a = split_assign(df, seed="split").select("doc_id", "split")
        b = split_assign(df, seed="other").select("doc_id", "split")
        assert a.exceptAll(b).count() > 0  # a different seed reshuffles
        with pytest.raises(ValueError, match="sum to 100"):
            split_assign(df, weights=(80, 10), names=("a", "b"))
        with pytest.raises(ValueError, match="align"):
            split_assign(df, weights=(90, 5, 5), names=("a", "b"))


def test_stratified_sample_matches_duckdb_oracle(spark, sf_dir):
    """q59 registers past the driver's 50-record correctness window, so
    its cross-engine proof lives here: exact relation match against the
    registered DuckDB oracle."""
    import duckdb

    from franzoxide_spark.queries.llm import _q59_sql, q59

    got = sorted(map(tuple, q59(spark, sf_dir).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        (int(r[0]), str(r[1]), int(r[2]))
        for r in con.execute(_q59_sql()).fetchall()
    )
    con.close()
    assert got == want


def test_stratified_sample_deterministic_and_bounded(spark, sf_dir):
    """Same result under different input partitionings (the rank depends
    only on (seed, id), never on physical layout), and never more than k
    rows per stratum."""
    from franzoxide_spark.operators.curation import stratified_sample
    from franzoxide_spark.tables import table as t

    docs = t(spark, sf_dir, "documents")
    a = stratified_sample(docs, "lang", "doc_id", k=7)
    b = stratified_sample(docs.repartition(13, "doc_id"), "lang", "doc_id", k=7)
    rows_a = sorted((r.lang, r.doc_id, r.sample_rank) for r in a.collect())
    rows_b = sorted((r.lang, r.doc_id, r.sample_rank) for r in b.collect())
    assert rows_a == rows_b
    per = {}
    for lang, _, rank in rows_a:
        per[lang] = max(per.get(lang, 0), rank)
    assert per and all(v <= 7 for v in per.values())


# --------------------------------------------------------------------------
# compression-ratio gate (q69)
# --------------------------------------------------------------------------


def test_compression_ratio_matches_direct_zlib(spark):
    import zlib

    from franzoxide_spark.operators.curation import compression_ratio_gate

    rows = [
        (1, "a a a a a a a a a a a a a a a a a a a a"),  # repetitive
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "x"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in compression_ratio_gate(docs).collect()}
    for doc_id, text in rows:
        raw = text.encode("utf-8")
        z = len(zlib.compress(raw, 6))
        assert out[doc_id]["n_bytes"] == len(raw)
        assert out[doc_id]["z_bytes"] == z
        assert out[doc_id]["ratio"] == round(z / max(len(raw), 1), 6)


def test_compression_ratio_gate_flags_repetitive_text(spark):
    from franzoxide_spark.operators.curation import compression_ratio_gate

    varied = " ".join(f"tok{i * 7919 % 5077}" for i in range(80))
    docs = spark.createDataFrame(
        [(1, "spam " * 400), (2, varied)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in compression_ratio_gate(docs).collect()}
    # 2000 bytes of "spam " deflates to almost nothing -> below the band
    assert out[1]["ratio"] < 0.25 and out[1]["keep"] is False
    # ~450 bytes of non-repeating tokens sits inside [0.25, 0.95]
    assert out[2]["keep"] is True


def test_compression_ratio_plan_is_map_only(spark):
    from franzoxide_spark.operators.curation import compression_ratio_gate

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        compression_ratio_gate(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # no shuffle: one Arrow-batched map pass


def test_cluster_safe_split_never_splits_a_pair(spark, sf_dir):
    """The leakage invariant q115 exists for: every near-dup pair lands in
    the SAME split, and singleton docs follow plain split_assign keyed on
    their own id."""
    from franzoxide_spark.operators.curation import (
        cluster_safe_split,
        split_assign,
    )
    from franzoxide_spark.queries.llm import q33
    from franzoxide_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    pairs = q33(spark, sf_dir)
    out = cluster_safe_split(docs, pairs, id_col="doc_id")
    split_of = {r["doc_id"]: r["split"] for r in out.collect()}
    pair_rows = pairs.collect()
    assert pair_rows, "fixture should contain near-dup pairs"
    for p in pair_rows:
        assert split_of[p["id_a"]] == split_of[p["id_b"]], (
            p["id_a"], p["id_b"])
    # singletons: split == plain id-keyed assignment
    clustered = {p["id_a"] for p in pair_rows} | {p["id_b"] for p in pair_rows}
    plain = {
        r["doc_id"]: r["split"]
        for r in split_assign(docs.select("doc_id")).collect()
    }
    singles = [d for d in split_of if d not in clustered]
    assert singles
    assert all(split_of[d] == plain[d] for d in singles)
    # every document got exactly one row
    assert set(split_of) == {r["doc_id"] for r in docs.select("doc_id").collect()}


def test_snapshot_diff_classifies_all_three_kinds(spark):
    from franzoxide_spark.operators.snapshot import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "c", None)],
        "id long, v string, w string",
    )
    new = spark.createDataFrame(
        [(1, "a", "x"), (2, "B", "y"), (4, "d", "z")],
        "id long, v string, w string",
    )
    got = {r["id"]: r["change"] for r in snapshot_diff(old, new, "id", ["v", "w"]).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}  # id 1 unchanged -> absent


def test_snapshot_diff_null_vs_sentinel_and_empty(spark):
    """NULL and the literal '<null>' string fingerprint differently from
    each other? No — they canonicalize identically BY DESIGN (documented
    sentinel); what matters is NULL == NULL compares as unchanged, not as
    changed (the raw SQL '=' would say rows with NULLs always differ)."""
    from franzoxide_spark.operators.snapshot import snapshot_diff

    old = spark.createDataFrame([(1, None), (2, "p")], "id long, v string")
    new = spark.createDataFrame([(1, None), (2, None)], "id long, v string")
    got = {r["id"]: r["change"] for r in snapshot_diff(old, new, "id", ["v"]).collect()}
    assert got == {2: "changed"}  # NULL==NULL rows are unchanged
    with pytest.raises(ValueError, match="non-empty"):
        snapshot_diff(old, new, "id", [])


def test_scd2_merge_version_semantics(spark):
    """Closed-form SCD2 check: unchanged keeps one current version;
    changed closes the old and opens a new; removed closes; added opens."""
    from franzoxide_spark.operators.snapshot import scd2_merge

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "id long, v string"
    )
    rows = scd2_merge(old, new, "id", ["v"], "t1", "t2").collect()
    by = {}
    for r in rows:
        by.setdefault(r["id"], []).append(
            (r["valid_from"], r["valid_to"], r["is_current"])
        )
    assert by[1] == [("t1", None, True)]  # unchanged: one open version
    assert sorted(by[2]) == [("t1", "t2", False), ("t2", None, True)]  # changed
    assert by[3] == [("t1", "t2", False)]  # removed: closed, no current
    assert by[4] == [("t2", None, True)]  # added: new current


def test_cdc_apply_semantics_and_idempotence(spark):
    from franzoxide_spark.operators.cdc import cdc_apply

    log = spark.createDataFrame(
        [
            (1, "I", 1, "a"),
            (1, "U", 2, "a2"),      # survives as a2
            (2, "I", 1, "b"),
            (2, "D", 2, None),      # deleted
            (3, "I", 1, "c"),
            (3, "U", 2, "c2"),
            (3, "D", 2, None),      # co-sequenced D beats U
            (4, "D", 1, None),      # delete-only key: absent
        ],
        "id long, op string, seq int, v string",
    )
    got = {r["id"]: r["v"] for r in cdc_apply(log, "id", "seq").collect()}
    assert got == {1: "a2"}
    # idempotence: replaying the log twice yields the same state
    replay = log.unionByName(log)
    got2 = {r["id"]: r["v"] for r in cdc_apply(replay, "id", "seq").collect()}
    assert got2 == got


def test_weighted_sample_bias_and_determinism(spark):
    """Heavier rows appear more often across seed variations, sampling is
    partition-independent, and k caps the output."""
    from franzoxide_spark.operators.curation import weighted_sample

    rows = [(i, 100.0 if i < 50 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, w double")
    picks = []
    for s in range(8):
        got = {r["id"] for r in
               weighted_sample(df, "id", "w", k=50, seed=f"s{s}").collect()}
        assert len(got) == 50
        picks.append(got)
    heavy_rate = sum(len([i for i in p if i < 50]) for p in picks) / (8 * 50)
    # 50 heavy rows hold 5000/5950 of the mass; the ES sample is without
    # replacement so heavy share < mass share, but must dwarf the 5%
    # population share
    assert heavy_rate > 0.5, heavy_rate
    # determinism + partition independence
    a = weighted_sample(df, "id", "w", 50).collect()
    b = weighted_sample(df.repartition(13), "id", "w", 50).collect()
    assert sorted(r["id"] for r in a) == sorted(r["id"] for r in b)
    # non-positive weights are excluded, k validated
    z = spark.createDataFrame([(1, 0.0), (2, -1.0), (3, 5.0)], "id long, w double")
    assert [r["id"] for r in weighted_sample(z, "id", "w", 10).collect()] == [3]
    with pytest.raises(ValueError, match="k must"):
        weighted_sample(df, "id", "w", 0)


def test_pit_join_drops_dimension_side_key(spark):
    """pit_join output keeps only the fact-side key even when the caller
    renames the dim key to the fact key name (q154's shape) — keeping
    both made later name-based references AMBIGUOUS_REFERENCE (ADVICE r7)."""
    from pyspark.sql import functions as F

    from franzoxide_spark.operators.snapshot import pit_join

    facts = spark.createDataFrame(
        [(1, "2020-06-01"), (2, "2020-06-01")], "k int, ts string"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    dim = spark.createDataFrame(
        [
            (1, "a", "2020-01-01", "2020-07-01"),
            (1, "b", "2020-07-01", "9999-01-01"),
            (2, "c", "2020-01-01", "9999-01-01"),
        ],
        "k int, seg string, valid_from string, valid_to string",
    ).select(
        "k",
        "seg",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    j = pit_join(facts, dim, "k", "ts")
    assert j.columns.count("k") == 1
    # name-based select on the key works post-join (the AMBIGUOUS repro)
    got = {(r["k"], r["seg"]) for r in j.select("k", "seg").collect()}
    assert got == {(1, "a"), (2, "c")}


def test_stream_decontaminate_and_gate_tolerate_null_text(spark):
    """One NULL-text row must neither crash the Arrow batch (the
    streaming stall the operators exist to avoid) nor be silently
    contaminated: no shingles -> keep, matching the batch path; the
    compression gate yields NULL bytes/ratio and a definite keep=False
    (r13 review)."""
    from franzoxide_spark.operators.curation import (
        compression_ratio_gate,
        decontaminate_stream,
        eval_shingle_hashes,
    )

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, None),
         (3, "completely unrelated text with different words here")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    hashes = eval_shingle_hashes(ev, "text", k=4)
    kept = {r["doc_id"] for r in
            decontaminate_stream(docs, hashes, "text", k=4).collect()}
    assert kept == {2, 3}  # 1 contaminated; NULL doc kept, no crash
    rows = {r["doc_id"]: r for r in
            compression_ratio_gate(docs, "doc_id", "text").collect()}
    assert rows[2]["z_bytes"] is None and rows[2]["keep"] is False
    assert rows[1]["keep"] in (True, False)


def test_cdc_null_op_keeps_last_valid_state(spark):
    """A malformed (NULL or unknown op) changelog event is a no-op, not
    an eraser: previously a NULL-op row won the rank at the highest seq
    and then failed `op != 'D'` as NULL, silently deleting the key AND
    its earlier valid state (r13 review)."""
    from franzoxide_spark.operators.cdc import cdc_apply

    log = spark.createDataFrame(
        [(1, "I", 1, "v1"), (1, None, 2, "junk"),
         (2, "I", 1, "a"), (2, "X", 2, "b"),
         (3, "I", 1, "x"), (3, "D", 2, "x")],
        "k long, op string, seq long, payload string",
    )
    got = {r["k"]: r["payload"] for r in cdc_apply(log, "k", "seq").collect()}
    assert got == {1: "v1", 2: "a"}  # 3 deleted; malformed rows ignored
