#!/usr/bin/env python3
"""Runnable end-to-end STREAMING curation flow: the continuous
counterpart of run_training_pipeline.py, composed from the streaming
operators (each individually stream==batch-tested; this script shows
they chain with exactly-once semantics end to end).

    python3 examples/run_streaming_curation.py [sf_dir]

Flow (every stage is a foreachBatch sink with per-batch dynamic
partition overwrite — a replayed trigger rewrites its own output):

  benchmark docs ──> continuous Bloom filter (per-batch partials,
                     exact bit_or merge-on-read)
  corpus stream ───> decontamination gate (probe against the filter;
                     clean / quarantine partition split)
  clean docs ──────> incremental near-dup dedup (LSH band keys vs
                     static index + earlier admits + intra-batch)
  events stream ───> continuous rollup (re-mergeable partials)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_db_setup_spark.session import get_spark
from vector_db_setup_spark.sources.registry import load_table
from vector_db_setup_spark.streaming.events import (
    benchmark_filter_stream,
    continuous_rollup_stream,
    decontamination_gate_stream,
    incremental_dedup_stream,
    read_benchmark_filter,
    read_rollup,
    stream_documents,
    stream_events,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="streaming-curation")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="stream_curation_")
    m, k = 1 << 22, 5

    print("== 1. continuous benchmark Bloom filter ==")
    bloom_path = os.path.join(work, "bloom")
    bench = stream_documents(spark, sf_dir).filter(F.col("doc_id") < 20)
    benchmark_filter_stream(bench, bloom_path, num_bits=m, k=k).awaitTermination()
    words = read_benchmark_filter(spark, bloom_path).persist()
    print(f"   filter words: {words.count()}")

    print("== 2. decontamination gate over the corpus stream ==")
    gate_path = os.path.join(work, "gate")
    corpus = stream_documents(spark, sf_dir).filter(F.col("doc_id") >= 20)
    decontamination_gate_stream(
        corpus, words, gate_path, num_bits=m, k=k
    ).awaitTermination()
    gated = spark.read.parquet(gate_path)
    n_clean = gated.filter("_clean = 'true' or _clean = true").count()
    print(f"   {gated.count()} docs gated -> {n_clean} clean")

    print("== 3. incremental near-dup dedup of the clean stream ==")
    clean_dir = os.path.join(work, "clean_docs")
    (
        gated.filter("_clean = 'true' or _clean = true")
        .select("doc_id", "text", "source")
        .write.mode("overwrite")
        .parquet(clean_dir)
    )
    clean_schema = spark.read.parquet(clean_dir).schema
    clean_stream = spark.readStream.schema(clean_schema).parquet(clean_dir)
    admitted_path = os.path.join(work, "admitted")
    # static index: the benchmark docs play the already-curated corpus
    static_corpus = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 20
    )
    incremental_dedup_stream(
        clean_stream, static_corpus, admitted_path
    ).awaitTermination()
    print(
        f"   {n_clean} clean -> "
        f"{spark.read.parquet(admitted_path).count()} admitted"
    )

    print("== 3b. perplexity gate against a MAINTAINED LM ==")
    from vector_db_setup_spark.operators.ngram_lm import (
        perplexity_against_lm,
    )
    from vector_db_setup_spark.sources.snapshot_table import (
        read_snapshot,
        write_snapshot,
    )
    from vector_db_setup_spark.streaming.commit_log import (
        maintain_lm_from_commits,
    )

    lm_src = os.path.join(work, "lm_src")
    lm_state = os.path.join(work, "lm_state")
    write_snapshot(static_corpus.select("doc_id", "text"), lm_src)
    maintain_lm_from_commits(
        spark, lm_src, lm_state, os.path.join(work, "ck_lm"),
        text_col="text", key_col="doc_id",
    )
    lm_df = read_snapshot(spark, lm_state).persist()
    scored_path = os.path.join(work, "scored")
    adm_schema = spark.read.parquet(admitted_path).schema
    adm_stream = spark.readStream.schema(adm_schema).parquet(admitted_path)

    def _score(batch_df, batch_id):
        # same replay contract as every stage here: the batch owns its
        # partition, so a replayed trigger rewrites its own output
        (
            perplexity_against_lm(
                batch_df.select("doc_id", "text"), lm_df
            )
            .withColumn("_b", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_b")
            .parquet(scored_path)
        )

    (
        adm_stream.writeStream.foreachBatch(_score)
        .option("checkpointLocation", os.path.join(work, "ck_score"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    scored = spark.read.parquet(scored_path)
    med = scored.approxQuantile("ppl", [0.5], 0.01)[0]
    print(
        f"   {scored.count()} admitted docs scored against the "
        f"maintained LM (median ppl {med:.2f})"
    )
    lm_df.unpersist()

    print("== 4. continuous rollup over the events stream ==")
    rollup_path = os.path.join(work, "rollup")
    continuous_rollup_stream(
        stream_events(spark, sf_dir), rollup_path
    ).awaitTermination()
    top = (
        read_rollup(spark, rollup_path)
        .orderBy(F.col("n").desc())
        .limit(3)
        .collect()
    )
    print("   top rollup rows:", [tuple(r) for r in top])

    print("== 5. land admitted docs as audited training shards ==")
    from vector_db_setup_spark.sources.shards import (
        land_snapshot,
        verify_shards,
    )

    shards_path = os.path.join(work, "shards")
    admitted = spark.read.parquet(admitted_path).select("doc_id", "text")
    land_snapshot(admitted, shards_path, n_shards=4, seed=1)
    # a later landing of the SAME admitted set must rewrite nothing —
    # the incremental contract a re-triggered pipeline relies on
    relanded = {
        r["status"]
        for r in land_snapshot(
            admitted, shards_path, n_shards=4, seed=1
        ).collect()
    }
    audit_ok = all(r["ok"] for r in verify_shards(spark, shards_path).collect())
    print(f"   re-landing statuses: {sorted(relanded)}; audit "
          f"{'OK' if audit_ok else 'FAILED'}")
    if relanded != {"unchanged"} or not audit_ok:
        raise SystemExit("shard landing not idempotent or audit failed")

    words.unpersist()
    print("OK — all six streaming stages, exactly-once, composed.")


if __name__ == "__main__":
    main()
