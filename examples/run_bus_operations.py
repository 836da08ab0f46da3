#!/usr/bin/env python3
"""Runnable end-to-end OPERATIONS story for the r6 surfaces: the
config-driven stream source factory feeding a partial sink, then the
storage-maintenance pass over it through the pluggable FS layer — the
day-2 loop a deployment actually runs (ingest → accumulate partials →
compact → audit), composed from individually-tested pieces.

    python3 examples/run_bus_operations.py [sf_dir]

Flow:

  source config ──> open_event_stream({"format": "file", ...})
                    (the SAME call takes a kafka config in production;
                    the file transport is the fixture-backed stand-in)
  event stream ───> continuous rollup partial sink (per-batch
                    re-mergeable partials, replay-idempotent)
  partial sink ───> compact_rollup through the FS contract — here
                    exercised BOTH on LocalFS and via the Hadoop
                    FileSystem API (file:// — the same code path an
                    HDFS/S3A deployment runs)
  landed corpus ──> training-shard export + manifest audit
                    (seed-stable placement, checksummed read-back)

Every stage prints what it verified; the final marker line is the
success contract the test suite asserts on.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_db_setup_spark.session import get_spark
from vector_db_setup_spark.sources.fs import HadoopFS, get_fs
from vector_db_setup_spark.sources.registry import load_table
from vector_db_setup_spark.sources.shards import (
    verify_shards,
    write_training_shards,
)
from vector_db_setup_spark.streaming.events import (
    compact_rollup,
    continuous_rollup_stream,
    read_rollup,
)
from vector_db_setup_spark.streaming.sources import open_event_stream


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="bus-operations")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="bus_ops_")

    # 1. config-driven source: one dict, transport-agnostic schema.
    #    In production this dict says format=kafka with bootstrap
    #    servers + subscribe; the downstream stages don't change.
    events = open_event_stream(
        spark, {"format": "file", "options": {"path": sf_dir}}
    )
    print(f"[1] source factory: streaming={events.isStreaming} "
          f"schema={events.columns}")

    # 2. continuous rollup into a per-batch partial sink
    rollup_path = os.path.join(work, "rollup")
    q = continuous_rollup_stream(events, rollup_path)
    q.awaitTermination()
    merged_before = read_rollup(spark, rollup_path)
    want_n = merged_before.agg(F.sum("n")).collect()[0][0]
    batches = sorted(
        d for d in os.listdir(rollup_path) if d.startswith("_batch=")
    )
    print(f"[2] rollup partials: {len(batches)} batch partitions, "
          f"merged n={want_n}")

    # 3a. compaction through the DEFAULT (scheme-resolved local) FS
    compact_rollup(spark, rollup_path)
    got_n = read_rollup(spark, rollup_path).agg(F.sum("n")).collect()[0][0]
    assert got_n == want_n, (got_n, want_n)
    print(f"[3a] compact via {type(get_fs(spark, rollup_path)).__name__}: "
          f"merged view preserved (n={got_n})")

    # 3b. the same maintenance pass through the Hadoop FileSystem API —
    #     the exact code path an HDFS/S3A deployment runs (file:// here)
    compact_rollup(spark, rollup_path, fs=HadoopFS(spark, rollup_path))
    got_n2 = read_rollup(spark, rollup_path).agg(F.sum("n")).collect()[0][0]
    assert got_n2 == want_n, (got_n2, want_n)
    print(f"[3b] compact via HadoopFS (Hadoop FileSystem API): "
          f"merged view preserved (n={got_n2})")

    # 4. land the corpus as training shards + audit the landing
    docs = load_table(spark, sf_dir, "documents")
    shards_path = os.path.join(work, "shards")
    write_training_shards(docs, shards_path, n_shards=4)
    report = verify_shards(spark, shards_path)
    bad = report.filter(~F.col("ok")).count()
    assert bad == 0, f"{bad} shards failed audit"
    print(f"[4] shard export: {report.count()} shards audited, 0 bad")

    # 5. versioned landing with the pointer-committed snapshot table:
    #    windowless compaction under a pinned reader + exactly-once
    #    replay via the idempotency key
    from vector_db_setup_spark.sources.snapshot_table import (
        committed_versions,
        compact_snapshot,
        read_snapshot,
        write_snapshot,
    )

    tbl = os.path.join(work, "docs_table")
    v1 = write_snapshot(docs.repartition(13), tbl, idempotency_key="load-1")
    pinned = read_snapshot(spark, tbl)  # resolved BEFORE compaction
    n_before = pinned.count()
    v2 = compact_snapshot(spark, tbl)
    replay = write_snapshot(docs, tbl, idempotency_key="load-1")
    assert replay == v1, "replayed load must return the original version"
    assert pinned.count() == n_before, "pinned reader must survive compaction"
    print(
        f"[5] snapshot table: v{v1} landed, compacted to v{v2} with a live "
        f"pinned reader, replay returned v{replay} (exactly-once); "
        f"versions={committed_versions(spark, tbl)}"
    )

    print("OK — bus operations loop (source→partials→compact→audit)")


if __name__ == "__main__":
    main()
