"""Scale-slope evidence for the dedup/ANN family + envelope throughput.

The 100 TB claims in COVERAGE/VERDICT rest on plan shape (bucketed, never
all-pairs); this script adds measured data points:

1. **Slope**: build a 10x replica of the sf0.1 ``documents``/``embeddings``
   fixtures (realistic growth mode — replicas are disjoint in shingle space
   / block space, so data growth adds shards and blocks rather than
   inflating near-dup clusters, which is what a bigger corpus does), then
   time q29/q33/q34/q35/q36/q37 at both scales and report sec ratios.
   Near-linear ratios (~10x work for 10x data, modulo the fixed scheduling
   floor) are the pass criterion; quadratic blowup would show as >>10x.

   Replica construction:
   - documents: every token gets a per-replica suffix (JVM ``transform``),
     so no shingle ever matches across replicas; doc_id shifted by
     1e6 * replica. Within-replica near-dup structure is exactly sf0.1's.
   - embeddings: vectors copied verbatim; vec_id shifted by 1e6 * replica,
     ``label`` (q36's blocking key) shifted by 100 * replica so replicas
     are distinct blocks.

2. **Envelope throughput** (A18): rows/s of the envelope_json encode path
   over KafkaRecord rows derived from events, with the strict Python sniff
   (production path, functions/envelope.py:json_strict_valid) vs a
   JVM-only lenient proxy (try_parse_json IS NOT NULL) — quantifying the
   cost of the one justified Python step in the streaming hot path.

Usage: python examples/scale_slope.py  [env: SPARK_GRAFT_SCALE_R (10),
SPARK_GRAFT_SF_DIR (/root/testdata/sf0.1), SPARK_GRAFT_BENCH_RUNS (2)]
Prints one JSON document; results are recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from franzoxide_spark import queries as q  # noqa: E402
from franzoxide_spark.session import get_spark  # noqa: E402
from franzoxide_spark.tables import table  # noqa: E402

SLOPE_QUERIES = (
    "q29_exact_dedup",
    "q33_minhash_lsh_neardup",
    "q34_simhash_neardup",
    "q35_ngram_jaccard_pairs",
    # opt-in prefix-filter twin (same oracle): measured here so the
    # jaccard_pairs_prefix docstring's which-variant-when guidance carries
    # a slope number, not just the sf0.1 point
    "q35b_ngram_jaccard_prefix",
    "q36_embedding_neardup_blocked",
    "q37_lsh_ann_topk",
    # full curation chain incl. decontamination: per-replica token suffixes
    # keep shingle space disjoint across replicas, so the eval overlap
    # structure grows by sharding exactly as a real corpus would
    "q54_curation_pipeline",
    # cross-doc span coverage: replica token suffixes keep gram space
    # disjoint, so each replica's duplicated-gram structure is exactly
    # sf0.1's — growth adds shards, the honest corpus-growth mode
    "q67_crossdoc_span_coverage",
    # hashed linear classifier: feature hashing is map-side; slope should
    # be flat-to-linear (broadcast weight table is constant-size)
    "q68_hashed_linear_score",
    # events family (replicas = disjoint user populations): all three are
    # one user-key shuffle + windows/aggs, so the slope should be linear
    # in events with no pair/join blowup
    "q71_funnel_stages",
    "q73_retention_cohorts",
    "q74_session_sequences",
    # block-dedup rewrite: replica token suffixes keep block space
    # disjoint, so per-replica duplication structure is exactly sf0.1's;
    # expected ~linear (one hash-window shuffle + one doc reassembly)
    "q82_block_dedup_rewrite",
    # kNN label propagation: pool AND query side both grow 10x, so the
    # scored stream grows 100x in principle — but the broadcast query
    # side is what bounds it; measured here to document where the
    # exact path stops and the ANN candidate generator must take over
    "q83_knn_label_propagation",
    # deterministic shuffle: map + one shard exchange; expected ~linear
    # with a flat floor
    "q84_deterministic_shuffle",
    # rolling time-range features: one user-key shuffle, three frames on
    # one sort; replicas = disjoint user populations -> expected linear
    "q89_rolling_time_features",
    # skew report: corpus shuffles once into per-key counts; everything
    # after is count-domain -> expected linear with a flat tail
    "q90_join_skew_report",
    # centroid outliers: (label,pos) partial-sum shuffle grows with the
    # label count (10x here), corpus scan linear, rank per label
    "q92_centroid_outliers",
    # incremental dedup: batch x corpus banding; replicas disjoint in
    # shingle space so candidates stay per-replica -> expected linear
    "q93_incremental_dedup",
    # vocab encode: TakeOrdered vocab + broadcast join + doc reassembly;
    # token suffixes mean each replica contributes its own vocab slice
    "q94_vocab_encode",
    # batch planner: one lang-key shuffle; expected linear
    "q95_length_batch_plan",
    # rolling WAU: (user,day) dedup + bounded x7 explode; linear
    "q102_rolling_wau",
    # PII density: map-side regexp counts, |sources| agg; linear scan
    "q103_pii_density_report",
    # BM25: per-replica token suffixes make query terms match ONLY
    # replica 0 (the worst case is flat posting lists), so the slope
    # isolates the posting-list-build pass — expected linear in corpus
    "q137_bm25_topk",
    # frequent pairs: replicas = disjoint user populations, so basket
    # count grows 10x while the item vocabulary is fixed -> linear
    "q141_frequent_pairs",
    # session concurrency: disjoint users, hour spans unchanged; the
    # hour aggregation key space is constant -> linear
    "q149_session_concurrency",
    # MinHash accuracy audit: same band-bucket candidate shape as q33
    # (replicas disjoint in shingle space) -> expected ~q33's slope
    "q150_minhash_accuracy",
    # EWMA: one (user, day) agg + per-user fold; series length constant,
    # users 10x -> linear
    "q152_ewma_level",
    # fact-fact join family (r8: first measured slope — previously
    # plan-shape-only per BASELINE r7). Replicas are disjoint orderkey/
    # custkey/suppkey/partkey populations, so the joins replicate their
    # per-replica structure and growth adds key population:
    # q108: two partial aggs + key-cardinality count join -> linear
    "q108_join_size_estimate",
    # q139: edge build = lineitem×orders one shuffle pair; edges 10x,
    # nodes 10x (rank broadcast threshold still holds at 10x) -> linear
    "q139_pagerank_topk",
    # q147: Q5 shape — fact shuffle pair 10x, dims broadcast (customer/
    # supplier grow 10x; still far under the broadcast bar) -> linear
    "q147_tpch_local_volume",
    # q148: Q17 shape — per-part avg agg + fact join share the partkey
    # exchange; parts 10x -> linear
    "q148_tpch_avg_quantity_gate",
    # r8 additions. q163: outer interval join = q114's plan + null
    # padding (disjoint-user replicas) -> linear
    "q163_interval_join_outer_conversion",
    # r9's one addition. q176: full-outer face of the same join — same
    # single user-key shuffle pair; outer padding adds no exchange
    "q176_interval_join_full_reconcile",
    # q164/q167: one token-count shuffle each; replica token suffixes
    # mean each replica contributes its own term slice, rank/fold work
    # is group-bounded -> linear
    "q164_zipf_fit",
    "q167_heaps_fit",
    # q165: one shingle shuffle + 8 KiB broadcast probe; replicas
    # disjoint in shingle space -> ~q33's family slope
    "q165_bloom_decontam_prefilter",
    # q101 (r15 hash-gram rewrite): three per-k branch scans + one
    # broadcast semi-join on 8-byte keys; eval side grows with replicas
    # but stays far under the broadcast bar -> expected linear scan-
    # dominated slope with the sf0.1 point being mostly stage floor
    "q101_decontam_k_sweep",
    # q56 (r15 reshape): map-side JVM gram-hash build + Arrow probe, no
    # shuffle/state -> expected linear in corpus bytes (rows-only query;
    # the slope times fn+count like the bench does)
    "q56_stream_decontaminate",
    # r15 unfreeze entries. q177: one user-key shuffle, window + group
    # work key-bounded (disjoint-user replicas) -> linear
    "q177_ttl_session_dedup",
    # q178: q33's banded pair join + one id_b agg + id-spine left join;
    # replicas disjoint in shingle space -> the q33 family slope
    "q178_neardup_gate",
    # q179: interval-join family plan (one shuffle per side on user_id,
    # range residual incl. the dynamic conjunct) -> q114/q163's slope
    "q179_dynamic_interval_join",
    # r9: the two remaining >1.4x data-dominated queries get their
    # second decade here (r8 verdict item #6).
    # q61: char-trigram LM scoring — map-side trigram explode + one
    # trigram-count shuffle; replica token suffixes give each replica
    # its own trigram slice -> linear
    "q61_trigram_lm_quality",
    # q119: containment pairs — the q35-family shingle equi-join;
    # replicas disjoint in gram space so candidate pairs stay
    # per-replica -> the family's measured sub-linear slope
    "q119_containment_pairs",
    # q166: one distinct-unit shuffle, group-cardinality chi2 -> linear
    "q166_ab_srm_check",
    # q168: dynamic-gap sessions — one user-key shuffle (disjoint-user
    # replicas), per-user session merge bounded by series length
    "q168_dynamic_session_window",
    # q170/q171: user-key shuffle + span-bounded folds -> linear
    "q170_kaplan_meier_retention",
    "q171_holt_trend_forecast",
)


def build_scaled(spark, src: str, out: str, r: int) -> None:
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    docs = table(spark, src, "documents")
    emb = table(spark, src, "embeddings")
    reps = spark.range(r).withColumnRenamed("id", "__rep")
    (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("__rep") * 1_000_000).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split("text", " "),
                    lambda t: F.concat(t, F.lit("_"), F.col("__rep").cast("string")),
                ),
                " ",
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .write.parquet(os.path.join(out, "documents.parquet"))
    )
    (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("__rep") * 1_000_000).alias("vec_id"),
            "embedding",
            (F.col("label") + (F.col("__rep") * 100).cast("int")).alias("label"),
        )
        .write.parquet(os.path.join(out, "embeddings.parquet"))
    )
    # events: replicas are disjoint user populations (user_id shifted), so
    # per-user funnel / session / cohort structure is exactly sf0.1's and
    # growth adds users — how an event stream actually grows
    ev = table(spark, src, "events")
    (
        ev.crossJoin(reps)
        .select(
            (F.col("event_id") + F.col("__rep") * 100_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("__rep") * 1_000_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .write.parquet(os.path.join(out, "events.parquet"))
    )
    # TPC-H fact + growing-dim replication (the slope input the fact-fact
    # join family q139/q147/q148/q108 was missing): lineitem/orders/
    # customer/supplier/part all grow r× with DISJOINT key populations
    # (orderkey/custkey/suppkey/partkey shifted per replica), which is
    # exactly TPC-H's own SF growth law — per-replica join structure is
    # sf0.1's, growth adds key population, never join fan-out. customer's
    # shift matches events' user shift (1e6) so q108's events×customer
    # key overlap replicates too. nation/region stay fixed (as in TPC-H),
    # and c_nationkey/s_nationkey are NOT shifted so dim broadcasts and
    # the q147 nation residual keep their real selectivity.
    shift = {
        "order": 100_000_000,
        "cust": 1_000_000,
        "supp": 1_000_000,
        "part": 10_000_000,
    }

    def rep_shift(col: str, kind: str):
        return (F.col(col) + F.col("__rep") * shift[kind]).alias(col)

    li = table(spark, src, "lineitem")
    (
        li.crossJoin(reps)
        .select(
            rep_shift("l_orderkey", "order"),
            rep_shift("l_partkey", "part"),
            rep_shift("l_suppkey", "supp"),
            *[c for c in li.columns if not c.startswith("l_order")
              and c not in ("l_partkey", "l_suppkey")],
        )
        .write.parquet(os.path.join(out, "lineitem.parquet"))
    )
    o = table(spark, src, "orders")
    (
        o.crossJoin(reps)
        .select(
            rep_shift("o_orderkey", "order"),
            rep_shift("o_custkey", "cust"),
            *[c for c in o.columns if c not in ("o_orderkey", "o_custkey")],
        )
        .write.parquet(os.path.join(out, "orders.parquet"))
    )
    c = table(spark, src, "customer")
    (
        c.crossJoin(reps)
        .select(
            rep_shift("c_custkey", "cust"),
            *[x for x in c.columns if x != "c_custkey"],
        )
        .write.parquet(os.path.join(out, "customer.parquet"))
    )
    s = table(spark, src, "supplier")
    (
        s.crossJoin(reps)
        .select(
            rep_shift("s_suppkey", "supp"),
            *[x for x in s.columns if x != "s_suppkey"],
        )
        .write.parquet(os.path.join(out, "supplier.parquet"))
    )
    p = table(spark, src, "part")
    (
        p.crossJoin(reps)
        .select(
            rep_shift("p_partkey", "part"),
            *[x for x in p.columns if x != "p_partkey"],
        )
        .write.parquet(os.path.join(out, "part.parquet"))
    )
    for dim in ("nation", "region"):
        table(spark, src, dim).write.parquet(
            os.path.join(out, f"{dim}.parquet")
        )


def time_query(spark, name: str, sf_dir: str, runs: int) -> float:
    fn = q.QUERIES[name]
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).toPandas()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def envelope_throughput(spark, sf_dir: str, r: int, runs: int) -> dict:
    """rows/s of the A18 envelope encode, strict sniff vs JVM-only proxy."""
    from franzoxide_spark.functions.envelope import (
        _json_or_base64,
        envelope_json,
    )
    from franzoxide_spark.queries.envelope import kafka_records_from_events

    rec = kafka_records_from_events(spark, sf_dir)
    reps = spark.range(r).withColumnRenamed("id", "__rep")
    big = (
        rec.crossJoin(reps)
        .withColumn("offset", F.col("offset") + F.col("__rep") * 10_000_000)
        .drop("__rep")
        .persist()
    )
    n = big.count()

    strict = big.select(
        envelope_json(
            F.col("topic"), F.col("partition"), F.col("offset"),
            F.col("timestamp"), F.col("key"), F.col("value"),
            F.col("headers_json"),
        ).alias("line")
    )

    def lenient_member(fname: str, payload):
        txt = payload.cast("string")
        return (
            F.when(
                payload.isNull() | (F.length(payload) == 0),
                F.lit(None).cast("string"),
            )
            .when(
                F.expr(f"try_parse_json(cast({fname} as string)) is not null"),
                F.concat(F.lit(f'"{fname}":'), txt),
            )
            .otherwise(
                F.concat(
                    F.lit(f'"{fname}":"'),
                    F.regexp_replace(F.base64(payload), "[\\r\\n]", ""),
                    F.lit(f'","{fname}_format":"base64"'),
                )
            )
        )

    jvm_only = big.select(
        F.concat(
            F.concat_ws(
                ",",
                F.concat(
                    F.lit('{"topic":"'), F.col("topic"),
                    F.lit('","partition":'), F.col("partition").cast("string"),
                    F.lit(',"offset":'), F.col("offset").cast("string"),
                    F.lit(',"timestamp":'), F.col("timestamp").cast("string"),
                ),
                lenient_member("key", F.col("key")),
                lenient_member("value", F.col("value")),
                F.concat(F.lit('"headers":'), F.col("headers_json")),
            ),
            F.lit("}"),
        ).alias("line")
    )

    out = {"rows": n}
    for label, df in (("strict_sniff", strict), ("jvm_lenient", jvm_only)):
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            df.selectExpr("sum(length(line)) as total_bytes").collect()
            best = min(best, time.perf_counter() - t0)
        out[label] = {"sec": round(best, 3), "rows_per_s": round(n / best)}
    big.unpersist()
    return out


def main() -> None:
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    r = int(os.environ.get("SPARK_GRAFT_SCALE_R", "10"))
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale", f"x{r}",
    )
    q.load_all()

    # optional subset (comma-separated names) for quick single-family runs;
    # validated up front — a typo must fail BEFORE the minutes-long replica
    # build, not mid-run in time_query
    only = os.environ.get("SPARK_GRAFT_SLOPE_QUERIES")
    slope_queries = (
        tuple(s.strip() for s in only.split(",") if s.strip())
        if only
        else SLOPE_QUERIES
    )
    unknown = [n for n in slope_queries if n not in q.QUERIES]
    if unknown:
        raise SystemExit(f"unknown SPARK_GRAFT_SLOPE_QUERIES entries: {unknown}")

    spark = get_spark(app_name="franzoxide_scale_slope")
    build_scaled(spark, src, out_dir, r)

    result: dict = {"replication": r, "base": src, "queries": {}}
    for name in slope_queries:
        base = time_query(spark, name, src, runs)
        scaled = time_query(spark, name, out_dir, runs)
        result["queries"][name] = {
            "base_sec": base,
            "scaled_sec": scaled,
            "ratio": round(scaled / base, 2),
        }
    # subset runs at high replication (e.g. the 30x second-decade pass)
    # don't need the envelope section re-measured each time
    if not os.environ.get("SPARK_GRAFT_SLOPE_SKIP_ENVELOPE"):
        result["envelope_throughput"] = envelope_throughput(spark, src, r, runs)
    print(json.dumps(result, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
