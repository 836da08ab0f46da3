"""MERGE cost: merge-on-read (merge_snapshot, r9) vs copy-on-write
(upsert_snapshot) — the same trade r8 measured for deletes, now for
the upsert path. A fixed 2k-row update batch against a growing corpus:
CoW rewrites the table per merge (O(table)); MoR lands one batch dir +
one scoped tombstone (O(batch)) and pays at READ time (one anti-join
per stacked merge) until compaction.

Also measured: the read tax of a stacked MoR table (N merges deep) vs
its compacted form — the number compact_if's thresholds are tuned by.

Run:  python experiments/merge_cost.py   (~3 min on local[32]).
Results recorded in SCALE_EXPERIMENTS.md "Merge cost: merge-on-read
vs copy-on-write".
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from vector_db_setup_spark.session import get_spark
from vector_db_setup_spark.sources.snapshot_table import (
    compact_snapshot,
    merge_snapshot,
    read_snapshot,
    upsert_snapshot,
    write_snapshot,
)

BATCH = 2_000


def _docs(spark, lo, hi, tag="w"):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(tag), F.md5(F.col("id").cast("string"))).alias(
            "body"
        ),
    )


def commit_cost(spark, root):
    from vector_db_setup_spark.sources.fs import LocalFS

    fs = LocalFS()
    print(
        "corpus_rows   merge_MB  cow_MB   merge_s  cow_s   "
        "(2k-row update batch; MB = parquet bytes the commit wrote)"
    )
    for corpus in (100_000, 400_000, 1_600_000):
        mor = f"{root}/mor{corpus}"
        cow = f"{root}/cow{corpus}"
        for b in (mor, cow):
            write_snapshot(_docs(spark, 0, corpus), b)
        m_times, c_times, m_mb, c_mb = [], [], [], []
        for i in range(3):
            upd = _docs(
                spark, i * BATCH, (i + 1) * BATCH, tag=f"u{i}"
            )
            pre = fs.du_suffix(mor, ".parquet")[0]
            t0 = time.perf_counter()
            merge_snapshot(upd, mor, key_col="doc_id")
            m_times.append(time.perf_counter() - t0)
            m_mb.append((fs.du_suffix(mor, ".parquet")[0] - pre) / 1e6)
            pre = fs.du_suffix(cow, ".parquet")[0]
            t0 = time.perf_counter()
            upsert_snapshot(upd, cow, key_col="doc_id")
            c_times.append(time.perf_counter() - t0)
            c_mb.append((fs.du_suffix(cow, ".parquet")[0] - pre) / 1e6)
        # both lineages must agree exactly
        a = {tuple(r) for r in read_snapshot(spark, mor).collect()}
        b = {tuple(r) for r in read_snapshot(spark, cow).collect()}
        assert a == b, f"MoR != CoW at corpus {corpus}"
        print(
            f"{corpus:>11,}  {statistics.median(m_mb):>8.2f} "
            f"{statistics.median(c_mb):>7.2f}  "
            f"{statistics.median(m_times):>7.3f} "
            f"{statistics.median(c_times):>6.3f}"
        )


def read_tax(spark, root):
    base = f"{root}/stack"
    write_snapshot(_docs(spark, 0, 400_000), base)
    for i in range(10):
        merge_snapshot(
            _docs(spark, i * BATCH, (i + 1) * BATCH, tag=f"m{i}"),
            base,
            key_col="doc_id",
        )

    def _scan():
        t0 = time.perf_counter()
        read_snapshot(spark, base).agg(
            F.count(F.lit(1)), F.sum(F.length("body"))
        ).collect()
        return time.perf_counter() - t0

    _scan()
    stacked = statistics.median(_scan() for _ in range(3))
    compact_snapshot(spark, base)
    _scan()
    compacted = statistics.median(_scan() for _ in range(3))
    print(
        f"read tax, 400k rows: 10-merge stack {stacked:.3f}s vs "
        f"compacted {compacted:.3f}s"
    )


def main():
    spark = get_spark(
        app_name="merge-cost",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    root = "/tmp/merge_cost"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    commit_cost(spark, root)
    read_tax(spark, root)
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
