"""Append-chain read tax measured (r8): a multi-dir version unions N
per-dir reads — what does the head read cost as the chain grows, and
what does compaction buy back? Also pins that APPEND COMMIT cost stays
~flat as the table grows (batch-proportional, the whole point).

Setup: 100k-row base write, then 32 appends of 3k rows each;
head-read wall at chain lengths 1/8/16/32; append-commit wall for the
1st vs the 32nd append; compact at 32 and re-read.

Run:  python experiments/append_chain_tax.py
(~3 min on local[32]; deterministic.) Results recorded in
SCALE_EXPERIMENTS.md "Append-chain read tax".
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
    append_snapshot,
    compact_snapshot,
    read_snapshot,
    write_snapshot,
)


def _t(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def main():
    spark = get_spark(
        app_name="append-chain",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    base = "/tmp/append_chain_exp/t"
    shutil.rmtree("/tmp/append_chain_exp", ignore_errors=True)

    def batch(lo, hi, parts=4):
        return spark.range(lo, hi).select(
            "id", F.md5(F.col("id").cast("string")).alias("payload")
        ).repartition(parts)

    write_snapshot(batch(0, 100_000, parts=16), base)
    reads = {}
    t_first = t_last = None
    n = 100_000
    for i in range(32):
        ta, _ = _t(
            lambda: append_snapshot(batch(n, n + 3_000), base)
        )
        if i == 0:
            t_first = ta
        if i == 31:
            t_last = ta
        n += 3_000
        chain = i + 2  # dirs in the head version
        if chain in (2, 8, 16, 32, 33):
            tr, cnt = _t(lambda: read_snapshot(spark, base).count())
            reads[chain] = tr
            assert cnt == n
    t_compact, _ = _t(
        lambda: compact_snapshot(spark, base, target_file_bytes=10**9)
    )
    t_rc, cnt = _t(lambda: read_snapshot(spark, base).count())
    assert cnt == n
    print(
        "append commit: first %.2fs (table 100k) vs 32nd %.2fs "
        "(table 193k) — batch-proportional" % (t_first, t_last)
    )
    print(
        "head read by chain length: "
        + " | ".join(f"{k} dirs {v:.2f}s" for k, v in sorted(reads.items()))
    )
    print(f"compact {t_compact:.2f}s -> read {t_rc:.2f}s (1 dir)")
    shutil.rmtree("/tmp/append_chain_exp", ignore_errors=True)


if __name__ == "__main__":
    main()
