"""End-to-end corpus curation: the full pipeline a training-data run
executes, composed from the engine's operators and verified at the end.

    raw documents
      → quality gates   (Gopher repetition rules + zlib compression band)
      → exact dedup     (sha-256 content key, min-id survivor)
      → near dedup      (MinHash-LSH pairs → connected components)
      → decontaminate   (k-gram overlap vs a held-out eval suite)
      → split           (deterministic 90/5/5 by seeded hash)
      → mixture-sample  (temperature rates per (lang, source), executed)
      → pack            (token-budget bins for the training loader)
      → write           (parquet partitioned by split)

Every stage is the registry operator (same code the oracle checks); this
script chains them in ONE composed plan per phase, prints stage counts,
asserts the pipeline invariants (no eval contamination, split fractions,
bin budgets), and writes the curated corpus.

The plan shapes are the 100 TB ones: gates and sampling are map-side,
dedup shuffles on content/band keys only, decontamination and rates are
broadcast joins, packing folds inside bounded id-chunks. Nothing here
collects the corpus to the driver.

Usage: python examples/curate_corpus.py
       [env: SPARK_GRAFT_SF_DIR (/root/testdata/sf0.01), OUT_DIR]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from franzoxide_spark.operators.curation import (  # noqa: E402
    compression_ratio_gate,
    decontaminate,
    split_assign,
)
from franzoxide_spark.operators.dedup import (  # noqa: E402
    exact_dedup,
    minhash_near_duplicates,
)
from franzoxide_spark.operators.packing import pack_sequences  # noqa: E402
from franzoxide_spark.queries.corpus import q64  # noqa: E402
from franzoxide_spark.functions.text import hash60  # noqa: E402
from franzoxide_spark.session import get_spark  # noqa: E402
from franzoxide_spark.tables import table  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.environ.get("OUT_DIR") or os.path.join(
        tempfile.gettempdir(), "curated_corpus"
    )
    spark = get_spark(driver_memory="8g")
    docs = table(spark, sf_dir, "documents")
    n0 = docs.count()
    print(f"raw: {n0} docs")

    # held-out eval suite (the benchmark we must not train on)
    eval_docs = docs.filter(F.col("doc_id") % 97 == 0)
    pool = docs.filter(F.col("doc_id") % 97 != 0)

    # 1. quality gates — map-side only
    gated = (
        compression_ratio_gate(pool, "doc_id", "text")
        .filter("keep")
        .select("doc_id")
        .join(pool, "doc_id")
    )
    n1 = gated.count()
    print(f"after compression gate: {n1}")

    # 2. exact dedup — one shuffle on the content hash
    survivors = exact_dedup(gated, "text", "doc_id").select("doc_id")
    exact_kept = gated.join(survivors, "doc_id")
    n2 = exact_kept.count()
    print(f"after exact dedup: {n2}")

    # 3. near dedup — LSH pairs, drop the larger id of each verified pair
    pairs = minhash_near_duplicates(exact_kept, "text", "doc_id", threshold=0.8)
    # pair ids come out ordered (id_a < id_b): drop the larger of each pair
    near_kept = exact_kept.join(
        pairs.select(F.col("id_b").alias("doc_id")).distinct(),
        "doc_id",
        "left_anti",
    )
    n3 = near_kept.count()
    print(f"after near dedup: {n3}")

    # 4. decontaminate vs the eval suite — broadcast k-gram semi-join
    clean = decontaminate(near_kept, eval_docs, "doc_id", "text", k=4)
    n4 = clean.count()
    print(f"after decontamination: {n4}")

    # 5. deterministic split
    split = split_assign(clean, "doc_id")

    # 6. mixture sampling — execute the temperature plan (one epoch cap
    #    applied inside q64's rates; fractional part by seeded hash)
    rates = q64(spark, sf_dir).select("lang", "source", "sampling_rate")
    u = (
        F.pmod(
            hash60(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))),
            F.lit(1_000_000),
        )
        / 1_000_000.0
    )
    copies = (
        F.floor("sampling_rate")
        + F.when(
            u < F.col("sampling_rate") - F.floor("sampling_rate"), 1
        ).otherwise(0)
    ).cast("int")
    sampled = (
        split.join(F.broadcast(rates), ["lang", "source"])
        .withColumn("__copies", copies)
        .filter(F.col("__copies") > 0)
        .withColumn("epoch", F.explode(F.expr("sequence(1, __copies)")))
        .drop("__copies", "sampling_rate")
    )
    n5 = sampled.count()
    print(f"after mixture sampling: {n5} (with epoch replicas)")

    # 7. pack into token-budget bins for the loader
    with_tokens = sampled.withColumn(
        "n_tokens", F.size(F.split("text", " "))
    ).withColumn(
        # replicas need distinct pack ids; epoch is a small integer
        "pack_id", F.col("doc_id") * 8 + F.col("epoch")
    )
    packed = pack_sequences(
        with_tokens, id_col="pack_id", tokens_col="n_tokens", budget=512,
        chunk_size=1000,
    )

    # 8. write partitioned by split
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    packed.write.partitionBy("split").parquet(out_dir)
    print(f"wrote curated corpus to {out_dir}")

    # ---- invariants ----
    back = spark.read.parquet(out_dir)
    # (a) no eval contamination: zero shared 4-gram shingles
    recheck = decontaminate(
        back.select("doc_id", "text").distinct(), eval_docs, "doc_id", "text", k=4
    ).count()
    assert recheck == back.select("doc_id", "text").distinct().count(), (
        "contaminated rows survived"
    )
    # (b) split fractions near 90/5/5 on UNIQUE docs
    fr = {
        r["split"]: r["n"]
        for r in back.select("doc_id", "split").distinct()
        .groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    tot = sum(fr.values())
    assert 0.80 <= fr.get("train", 0) / tot <= 0.97, fr
    # (c) no bin exceeds the budget unless it is a single oversize doc
    over = (
        back.groupBy("bin_id")
        .agg(F.sum("n_tokens").alias("t"), F.count("*").alias("n"))
        .filter((F.col("t") > 512) & (F.col("n") > 1))
        .count()
    )
    assert over == 0, f"{over} bins exceed the budget with multiple docs"
    print("invariants hold: decontaminated, split fractions, bin budgets")
    spark.stop()


if __name__ == "__main__":
    main()
