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


class _ReadMeter:
    """Monkeypatch-wraps st.read_snapshot to record the parquet bytes
    each table read's PLAN references (inputFiles sizes — the counter
    that survives the page cache) while a commit runs. Captures the
    commit's read SIDE: r9's merge_cost measured bytes written only,
    which hid the unpruned visible-rows probe VERDICT r9 flagged."""

    def __init__(self, base):
        import vector_db_setup_spark.sources.snapshot_table as st

        self.st, self.base, self.bytes = st, base, 0
        self.real = st.read_snapshot

    def __enter__(self):
        meter = self

        def wrapped(spark_, base_, **kw):
            df = meter.real(spark_, base_, **kw)
            if base_ == meter.base:
                meter.bytes += sum(
                    os.path.getsize(f.replace("file:", ""))
                    for f in df.inputFiles()
                )
            return df

        self.st.read_snapshot = wrapped
        return self

    def __exit__(self, *exc):
        self.st.read_snapshot = self.real


def commit_cost(spark, root):
    from vector_db_setup_spark.sources.fs import LocalFS

    fs = LocalFS()
    print(
        "corpus_rows   merge_wMB  cow_wMB  merge_rMB  cow_rMB  "
        "merge_s  cow_s   (2k-row update batch; wMB = parquet bytes "
        "written, rMB = table bytes the commit's own reads reference)"
    )
    for corpus in (100_000, 400_000, 1_600_000):
        mor = f"{root}/mor{corpus}"
        cow = f"{root}/cow{corpus}"
        for b in (mor, cow):
            # clustered + stats: the shape a real deployment lands so
            # the commit bookkeeping's key_between probe can prune.
            # FILE SIZE stays ~constant (file COUNT grows with the
            # corpus, as any real landing does) — that is what makes
            # "files the probe touches" the honest constant
            write_snapshot(
                _docs(spark, 0, corpus), b,
                stats_cols=["doc_id"], cluster_by=["doc_id"],
                cluster_files=max(16, corpus // 6_250),
            )
        m_times, c_times, m_mb, c_mb, m_rd, c_rd = [], [], [], [], [], []
        for i in range(3):
            upd = _docs(
                spark, i * BATCH, (i + 1) * BATCH, tag=f"u{i}"
            )
            pre = fs.du_suffix(mor, ".parquet")[0]
            t0 = time.perf_counter()
            with _ReadMeter(mor) as rm:
                merge_snapshot(upd, mor, key_col="doc_id")
            m_times.append(time.perf_counter() - t0)
            m_mb.append((fs.du_suffix(mor, ".parquet")[0] - pre) / 1e6)
            m_rd.append(rm.bytes / 1e6)
            pre = fs.du_suffix(cow, ".parquet")[0]
            t0 = time.perf_counter()
            with _ReadMeter(cow) as rm:
                upsert_snapshot(upd, cow, key_col="doc_id")
            c_times.append(time.perf_counter() - t0)
            c_mb.append((fs.du_suffix(cow, ".parquet")[0] - pre) / 1e6)
            c_rd.append(rm.bytes / 1e6)
        # both lineages must agree exactly
        a = {tuple(r) for r in read_snapshot(spark, mor).collect()}
        b = {tuple(r) for r in read_snapshot(spark, cow).collect()}
        assert a == b, f"MoR != CoW at corpus {corpus}"
        print(
            f"{corpus:>11,}  {statistics.median(m_mb):>9.2f} "
            f"{statistics.median(c_mb):>8.2f} "
            f"{statistics.median(m_rd):>9.2f} "
            f"{statistics.median(c_rd):>8.2f}  "
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
