#!/usr/bin/env python3
"""Runnable end-to-end INCREMENTAL-LAKEHOUSE loop for the r8 surfaces:
continuous exactly-once landing into the pointer-committed snapshot
table, keyed reads with marker-stats file skipping, the CDC feed
maintaining a decontamination Bloom filter, and incremental IVF index
appends with drift-scheduled rebuilds — the day-2 loop of a corpus
that only ever grows.

    python3 examples/run_lakehouse_loop.py [sf_dir]

Flow:

  documents ────> staged as 3 files ─> readStream(maxFilesPerTrigger=1)
  stream ───────> snapshot_sink: each micro-batch = one APPEND commit,
                  idempotency_key = producer:batch_id (a replayed
                  batch short-circuits — proven by restarting the
                  stream from the same checkpoint: zero new commits)
  head ─────────> compact_snapshot: absorbs the append chain, INHERITS
                  the stats columns and re-clusters — the keyed read
                  then prunes files from the marker's min/max BEFORE
                  any executor IO
  _commits dir ──> maintain_bloom_from_commits: the commit log IS a
                  streaming source — the decontamination filter
                  SUBSCRIBES, its state rides its own snapshot table,
                  and a schema-evolving (merge_schema) batch flows
                  through the key-presence CDC feed; the filter equals
                  a from-scratch rebuild bit-for-bit
  embeddings ───> build_ivf_index v1 ─> append_to_ivf_index (assign
                  ONLY the new batch with the HEAD marker's centroids;
                  drift_ratio in the marker meta) ─> pinned v1 search
                  unchanged through the append ─> compact_ivf_index

Every stage prints what it verified; the final marker line is the
success contract tests/test_examples.py asserts on.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from vector_db_setup_spark.operators.ann_index import (
    append_to_ivf_index,
    build_ivf_index,
    compact_ivf_index,
    search_ivf_index,
)
from vector_db_setup_spark.operators.bloom import bloom_build
from vector_db_setup_spark.session import get_spark
from vector_db_setup_spark.sources.registry import load_table
from vector_db_setup_spark.sources.snapshot_table import (
    committed_versions,
    compact_snapshot,
    current_version,
    read_snapshot,
    snapshot_info,
)
from vector_db_setup_spark.streaming.snapshot_sink import snapshot_sink


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="lakehouse-loop", master="local[4]",
                      shuffle_partitions=8)
    work = tempfile.mkdtemp(prefix="lakehouse_loop_")
    table = f"{work}/docs_table"
    ckpt = f"{work}/ckpt"
    stage = f"{work}/incoming"

    # ---- stage the fixture as 3 arrival files (3 micro-batches)
    docs = load_table(spark, sf_dir, "documents")
    docs.repartitionByRange(3, "doc_id").write.parquet(stage)
    n_docs = docs.count()

    # ---- 1. continuous exactly-once landing
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    snapshot_sink(
        stream, table, ckpt, producer_id="docs",
        stats_cols=["doc_id"], cluster_by=["doc_id"],
    ).awaitTermination(300)
    vs = committed_versions(spark, table)
    head_rows = read_snapshot(spark, table).count()
    assert head_rows == n_docs, (head_rows, n_docs)
    print(f"[land] {len(vs)} append commits -> {head_rows} docs "
          f"(versions {vs})")

    # ---- 2. restart from the SAME checkpoint: nothing re-lands
    stream2 = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    snapshot_sink(
        stream2, table, ckpt, producer_id="docs",
        stats_cols=["doc_id"], cluster_by=["doc_id"],
    ).awaitTermination(300)
    assert committed_versions(spark, table) == vs
    print("[land] restart from checkpoint: 0 new commits (exactly-once)")

    # ---- 3. compact: absorb the chain, inherit stats, keyed read prunes
    # small target so the demo yields MULTIPLE files to prune across,
    # but never one-file-per-row (a byte-sized target at a bigger sf
    # would write thousands of single-row files)
    v_compact = compact_snapshot(spark, table, target_file_bytes=64 << 10,
                                 min_files=6)
    lo, hi = n_docs // 3, n_docs // 3 + max(n_docs // 10, 1)
    pruned = read_snapshot(spark, table, key_between=("doc_id", lo, hi))
    full = read_snapshot(spark, table)
    n_p, n_f = len(pruned.inputFiles()), len(full.inputFiles())
    want = full.filter(F.col("doc_id").between(lo, hi)).count()
    assert pruned.count() == want
    assert n_p < n_f, (n_p, n_f)
    print(f"[compact] v{v_compact}: keyed read doc_id∈[{lo},{hi}] touched "
          f"{n_p}/{n_f} files, {want} rows exact")

    # ---- 4. CDC as a SUBSCRIPTION: the _commits dir is itself a
    # streaming source; the Bloom maintainer's state is a snapshot
    # table whose marker meta carries its consumed-through cursor
    from vector_db_setup_spark.sources.snapshot_table import (
        append_snapshot,
    )
    from vector_db_setup_spark.streaming.commit_log import (
        maintain_bloom_from_commits,
    )

    state = f"{work}/bloom_state"
    ck_bloom = f"{work}/ck_bloom"
    maintain_bloom_from_commits(
        spark, table, "doc_id", state, ck_bloom, num_bits=1 << 16, k=5
    )
    thru = snapshot_info(spark, state, current_version(spark, state))[
        "meta"
    ]["through_version"]
    assert thru == current_version(spark, table)
    print(f"[cdc] commit-log subscription bootstrapped the bloom state "
          f"through v{thru} (exactly-once via stream checkpoint + "
          "idempotent state commits)")

    # ---- 5. schema evolution: a tagged batch lands with a NEW column,
    # old rows null-fill; the re-drained subscription ingests only the
    # increment (key-presence CDC is evolution-proof)
    tagged = (
        docs.select("doc_id", "text")
        .withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
        .withColumn("ingest_tag", F.lit("wave-2"))
        .limit(25)
    )
    v_evo = append_snapshot(
        tagged, table, merge_schema=True, stats_cols=["doc_id"],
        cluster_by=["doc_id"],
    )
    head_df = read_snapshot(spark, table)
    assert "ingest_tag" in head_df.columns
    assert head_df.filter(F.col("ingest_tag").isNull()).count() == n_docs
    maintain_bloom_from_commits(
        spark, table, "doc_id", state, ck_bloom, num_bits=1 << 16, k=5
    )
    maintained = read_snapshot(spark, state)
    rebuilt = bloom_build(
        read_snapshot(spark, table).select("doc_id"),
        "doc_id", num_bits=1 << 16, k=5,
    )
    rows = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert rows(maintained) == rows(rebuilt)
    print(f"[evolve] v{v_evo}: +25 tagged docs (merge_schema; "
          f"{n_docs} old rows null-fill); re-drained subscription == "
          "from-scratch rebuild (bit-for-bit)")

    # ---- 6. incremental IVF: append with head centroids, drift metric
    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.first()["embedding"])
    idx = f"{work}/ivf"
    v1 = build_ivf_index(emb, idx, k=4, seed=7)
    q = [0.1] * dim
    pinned_before = rows(
        search_ivf_index(spark, idx, q, topk=5, nprobe=4, version=v1)
    )
    rng = np.random.default_rng(3)
    batch = spark.createDataFrame(
        [(int(10_000 + i), rng.standard_normal(dim).tolist())
         for i in range(50)],
        "vec_id long, embedding array<double>",
        # cast to the index's element type: append_snapshot's type
        # guard (rightly) refuses landing double vectors into a float
        # index — mixed-type dirs would poison the lineage's reads
    ).select(
        "vec_id",
        F.col("embedding").cast(
            emb.schema["embedding"].dataType
        ).alias("embedding"),
        *[
        F.lit(None).cast(f.dataType).alias(f.name)
        for f in emb.schema.fields
        if f.name not in ("vec_id", "embedding")
    ])
    v2 = append_to_ivf_index(batch, idx)
    meta = snapshot_info(spark, idx, v2)["meta"]
    assert rows(
        search_ivf_index(spark, idx, q, topk=5, nprobe=4, version=v1)
    ) == pinned_before
    v3 = compact_ivf_index(spark, idx)
    assert current_version(spark, idx) == v3
    print(f"[ivf] append v{v2}: +50 vectors with v1 centroids, "
          f"drift_ratio={meta['drift_ratio']:.2f} "
          f"rebuild_recommended={meta['rebuild_recommended']}; pinned v1 "
          f"search unchanged; compacted to v{v3}")

    # ---- 7. row-level delete (merge-on-read) + audit trail
    from vector_db_setup_spark.sources.snapshot_table import (
        delete_from_snapshot,
        snapshot_history,
    )

    drop_ids = spark.createDataFrame(
        [(i,) for i in range(3)], "doc_id long"
    )
    v_del = delete_from_snapshot(drop_ids, table, "doc_id")
    assert read_snapshot(spark, table).count() == n_docs + 25 - 3
    hist = snapshot_history(spark, table)
    last = hist.orderBy(F.col("version").desc()).first()
    assert last["version"] == v_del and last["n_delete_entries"] == 1
    print(f"[delete] v{v_del}: 3 docs tombstoned (dirs untouched); "
          f"history shows {hist.count()} versions")

    # ---- 8. provenance tag + retention: the tag pins the exact
    # corpus a training run consumed; GC protects it through any
    # keep policy until the tag is deleted
    from vector_db_setup_spark.sources.snapshot_table import (
        list_tags,
        tag_snapshot,
    )

    v_tag = tag_snapshot(spark, table, "train-run-001", version=v_evo)
    # gc_with_retention_policy is the day-2 entry point: it reads the
    # bloom subscriber's consumed-through cursor from its own state
    # table and WIDENS keep so a lagging consumer's catch-up range
    # survives — the slowest-consumer contract enforced by code, not
    # by remembering to size keep by hand
    from vector_db_setup_spark.sources.snapshot_table import (
        gc_with_retention_policy,
    )

    report = gc_with_retention_policy(
        spark, table, keep=2, subscriber_states=[state],
        orphan_min_age_s=0,
    )
    removed = report["removed"]
    assert v_tag not in removed
    assert read_snapshot(spark, table, tag="train-run-001").count() == (
        n_docs + 25
    )
    assert read_snapshot(spark, table).count() == n_docs + 25 - 3
    print(f"[gc] retention policy reclaimed versions {removed} "
          f"(effective_keep={report['effective_keep']}, subscriber "
          f"cursors {report['subscriber_cursors']}); tag "
          f"{list_tags(spark, table)} pinned v{v_tag} through it; "
          "head intact")

    shutil.rmtree(work, ignore_errors=True)
    print("OK — lakehouse loop (land/replay/compact/cdc/ivf/delete/gc)")


if __name__ == "__main__":
    main()
