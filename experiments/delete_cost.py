"""Merge-on-read vs copy-on-write deletes measured (r8): where does
`delete_from_snapshot` (tombstone commit) beat `upsert_snapshot` with
a delete column (full rewrite), and what does the stacked-tombstone
read tax actually cost before compaction?

Setup: 200k-row table (same scale as the MERGE-vs-dirty-shard
experiment), delete 1k random keys, then:
  tombstone   delete_from_snapshot — commit cost, then head-read cost
              with 1 and with 8 stacked delete commits
  rewrite     upsert_snapshot(delete_col=) — commit cost (rewrites
              the table), head-read cost (no tax)
  compact     compact_snapshot after the 8-stack — materialization
              cost, post-compaction read cost

Run:  python experiments/delete_cost.py
(~2 min on local[32]; deterministic.) Results recorded in
SCALE_EXPERIMENTS.md "Delete cost: merge-on-read vs copy-on-write".
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from vector_db_setup_spark.session import get_spark
from vector_db_setup_spark.sources.snapshot_table import (
    compact_snapshot,
    delete_from_snapshot,
    read_snapshot,
    upsert_snapshot,
    write_snapshot,
)

N = 200_000
DEL = 1_000


def _t(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def main():
    spark = get_spark(
        app_name="delete-cost",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    work = "/tmp/delete_cost_exp"
    shutil.rmtree(work, ignore_errors=True)
    df = spark.range(N).select(
        "id", F.md5(F.col("id").cast("string")).alias("payload")
    )

    def keys(seed, n=DEL):
        return (
            spark.range(N)
            .select("id")
            .orderBy(F.xxhash64("id", F.lit(seed)))
            .limit(n)
        )

    # --- tombstone path
    tomb = f"{work}/tomb"
    write_snapshot(df, tomb, cluster_by=["id"], cluster_files=16)
    t_del1, _ = _t(lambda: delete_from_snapshot(keys(1), tomb, "id"))
    t_read1, n1 = _t(lambda: read_snapshot(spark, tomb).count())
    for s in range(2, 9):
        delete_from_snapshot(keys(s), tomb, "id")
    t_read8, n8 = _t(lambda: read_snapshot(spark, tomb).count())
    t_compact, _ = _t(
        lambda: compact_snapshot(spark, tomb, target_file_bytes=10**9)
    )
    t_read_c, nc = _t(lambda: read_snapshot(spark, tomb).count())
    assert n8 == nc

    # --- rewrite path
    rew = f"{work}/rew"
    write_snapshot(df, rew, cluster_by=["id"], cluster_files=16)
    del_updates = keys(1).join(df, "id").withColumn("_dead", F.lit(True))
    t_up, _ = _t(
        lambda: upsert_snapshot(del_updates, rew, "id", delete_col="_dead")
    )
    t_read_u, nu = _t(lambda: read_snapshot(spark, rew).count())
    assert nu == n1

    print(
        f"tombstone: commit {t_del1:.2f}s | read(1 stack) {t_read1:.2f}s "
        f"({n1} rows) | read(8 stacks) {t_read8:.2f}s | compact "
        f"{t_compact:.2f}s -> read {t_read_c:.2f}s"
    )
    print(
        f"rewrite (upsert delete_col): commit {t_up:.2f}s | read "
        f"{t_read_u:.2f}s ({nu} rows)"
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
