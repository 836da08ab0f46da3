"""Commit-log subscription overhead measured (r8): what does riding
Structured Streaming's file source cost per maintenance drain over
calling the CDC functions directly?

Three numbers per drain shape, warm median of 5:
  - empty drain (no new commits): pure stream machinery — list the
    commits dir, read the checkpoint, decide nothing to do
  - one-commit drain via maintain_bloom_from_commits: machinery +
    the incremental filter update + one state commit
  - the same increment applied DIRECTLY (bloom_update_from_changes +
    write_snapshot, cursor handled by hand): the subscription's
    machinery premium is the difference

Run:  python experiments/subscription_overhead.py
(~2 min on local[32]; deterministic.) Results recorded in
SCALE_EXPERIMENTS.md "Commit-log subscription overhead".
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

from vector_db_setup_spark.operators.bloom import (
    bloom_update_from_changes,
)
from vector_db_setup_spark.session import get_spark
from vector_db_setup_spark.sources.snapshot_table import (
    append_snapshot,
    current_version,
    read_snapshot,
    snapshot_info,
    write_snapshot,
)
from vector_db_setup_spark.streaming.commit_log import (
    maintain_bloom_from_commits,
)

NB, K = 1 << 20, 5


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        "id", F.md5(F.col("id").cast("string")).alias("payload")
    )


def main():
    spark = get_spark(
        app_name="subscription-overhead",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    root = "/tmp/subscription_overhead_exp"
    shutil.rmtree(root, ignore_errors=True)
    base, state, ckpt = f"{root}/t", f"{root}/bloom", f"{root}/ck"
    write_snapshot(_rows(spark, 0, 100_000).repartition(8), base)
    maintain_bloom_from_commits(
        spark, base, "id", state, ckpt, num_bits=NB, k=K
    )  # bootstrap outside the measurement

    def timed(fn, n=5):
        walls = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            walls.append(time.perf_counter() - t0)
        return statistics.median(walls)

    empty = timed(
        lambda: maintain_bloom_from_commits(
            spark, base, "id", state, ckpt, num_bits=NB, k=K
        )
    )

    nxt = [100_000]

    def one_commit_drain():
        append_snapshot(_rows(spark, nxt[0], nxt[0] + 2_000), base)
        nxt[0] += 2_000
        maintain_bloom_from_commits(
            spark, base, "id", state, ckpt, num_bits=NB, k=K
        )

    via_stream = timed(one_commit_drain)

    def one_commit_direct():
        append_snapshot(_rows(spark, nxt[0], nxt[0] + 2_000), base)
        nxt[0] += 2_000
        head_v = current_version(spark, state)
        last = snapshot_info(spark, state, head_v)["meta"][
            "through_version"
        ]
        to_v = current_version(spark, base)
        words = bloom_update_from_changes(
            spark,
            base,
            "id",
            read_snapshot(spark, state, version=head_v),
            from_version=last,
            to_version=to_v,
            num_bits=NB,
            k=K,
        )
        write_snapshot(
            words,
            state,
            idempotency_key=f"through:{to_v}",
            meta={
                "through_version": to_v,
                "num_bits": NB,
                "k": K,
                "source": base,
                "key_col": "id",
            },
        )

    direct = timed(one_commit_direct)

    print(f"empty_drain_s          {empty:6.3f}   (stream machinery only)")
    print(f"one_commit_via_stream  {via_stream:6.3f}   (incl. the append itself)")
    print(f"one_commit_direct      {direct:6.3f}   (same work, no stream)")
    print(f"machinery_premium_s    {via_stream - direct:6.3f}")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
