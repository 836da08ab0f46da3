"""Fast CDC attribution measured (r8): what does
snapshot_changes(fast=True) buy per append step over the full-outer
value-hash diff as the TABLE grows while the BATCH stays fixed?

The claim under test: the slow path is O(table) per step (full-outer
join + xxhash64 of every column on both sides), the fast path is
O(batch + one column-pruned key semi-join) — so the gap should WIDEN
with table size at fixed batch size. Also pins that both paths return
identical feeds at every size.

Setup: wide-ish rows (id + 3 payload cols), base writes of 100k / 400k
/ 1.6M rows, one 5k append on each; per-step feed wall fast vs slow,
5 runs warm, median.

Run:  python experiments/cdc_fast_cost.py
(~3 min on local[32]; deterministic.) Results recorded in
SCALE_EXPERIMENTS.md "Fast CDC attribution".
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
    append_snapshot,
    snapshot_changes,
    write_snapshot,
)


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        "id",
        F.md5(F.col("id").cast("string")).alias("p1"),
        F.sha2(F.col("id").cast("string"), 256).alias("p2"),
        (F.col("id") * 17 % 1000).alias("p3"),
    )


def _median_wall(fn, n=5):
    walls = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    return statistics.median(walls)


def main():
    spark = get_spark(
        app_name="cdc-fast-cost",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    root = "/tmp/cdc_fast_exp"
    shutil.rmtree(root, ignore_errors=True)
    batch = 5_000
    print(
        "table_rows  batch  layout      slow_s  fast_s  speedup  "
        "feeds_equal"
    )
    for n in (100_000, 400_000, 1_600_000):
      for layout in ("shuffled", "clustered"):
        base = f"{root}/t{n}_{layout}"
        kw = (
            {"stats_cols": ["id"], "cluster_by": ["id"],
             "cluster_files": 16}
            if layout == "clustered"
            else {}
        )
        write_snapshot(_rows(spark, 0, n).repartition(16), base, **kw)
        append_snapshot(_rows(spark, n, n + batch), base, **kw)

        def run(fast):
            return set(
                map(
                    tuple,
                    snapshot_changes(
                        spark, base, "id", from_version=1, fast=fast
                    ).collect(),
                )
            )

        equal = run(True) == run(False)  # also warms both paths
        slow = _median_wall(lambda: run(False))
        fast = _median_wall(lambda: run(True))
        print(
            f"{n:>10}  {batch:>5}  {layout:<10}  {slow:6.3f}  "
            f"{fast:6.3f}  {slow / fast:6.2f}×  {equal}"
        )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
