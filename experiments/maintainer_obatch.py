"""O(batch) maintainer drains + checkpointed marker walks (r9).

Two measurements for VERDICT r8's #1 and #2. Local wall-clock hides
IO asymptotics (page cache + a 32-core scheduler floor), so each
measurement reports the SCALE-HONEST counter first — files/reads
touched, which at 100 TB translate directly to bytes scanned and
object-store round trips — with warm times as corroboration.

1. ADDED-DELTA SHAPE (the IVF/agg maintainer kernel): materialize a
   fixed 2k-row append's rows INCLUDING a wide value column, as the
   corpus grows 100k → 400k → 1.6M rows.
     r8 shape: read_snapshot(head).join(added_keys, left_semi) — the
       corpus-wide scan the r8 maintainers did per drain.
     r9 shape: snapshot_changes(carry_columns=[...]) — batch dirs only.
   Counter: inputFiles() of each frame. Claim: r9 is constant in
   corpus size; r8 grows with it (and its TIME grows once the wide
   column dominates).

2. CHECKPOINTED MARKER WALK: snapshot_history + an idempotency MISS
   over a 400-commit table, with and without a commit-log checkpoint.
   Counter: marker read_file calls (CountingFS). At 10-50 ms per
   object-store GET, 400 reads is 4-20 s of pure control-plane
   latency per walk; the checkpoint makes it one read + the tail.

Run:  python experiments/maintainer_obatch.py
(~4 min on local[32]; deterministic.) Results recorded in
SCALE_EXPERIMENTS.md "O(batch) maintainers + checkpointed walks".
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

import vector_db_setup_spark.sources.snapshot_table as st
from vector_db_setup_spark.session import get_spark
from vector_db_setup_spark.sources.fs import LocalFS
from vector_db_setup_spark.sources.snapshot_table import (
    append_snapshot,
    current_version,
    read_snapshot,
    snapshot_changes,
    snapshot_history,
    write_commit_checkpoint,
    write_snapshot,
)

BATCH = 2_000


def _docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5).cast("string").alias("lang"),
        # ~512B payload: the "embedding column" stand-in — what makes
        # a per-drain head scan hurt at corpus scale
        F.repeat(F.md5(F.col("id").cast("string")), 16).alias("body"),
    )


def added_delta_shape(spark, root):
    print(
        "corpus_rows    r9_MB    r8_MB   r9_s    r8_s   "
        "(fixed 2k append, wide column materialized)"
    )
    for corpus in (100_000, 400_000, 1_600_000):
        src = f"{root}/src{corpus}"
        write_snapshot(
            _docs(spark, 0, corpus),
            src,
            stats_cols=["doc_id"],
            cluster_by=["doc_id"],
            cluster_files=16,
        )
        last = current_version(spark, src)
        append_snapshot(
            _docs(spark, corpus, corpus + BATCH), src,
            stats_cols=["doc_id"],
        )

        def r9_frame():
            return (
                snapshot_changes(
                    spark, src, "doc_id", from_version=last,
                    columns=[], carry_columns=["lang", "body"],
                )
                .filter(F.col("status") == "added")
                .select("doc_id", "lang", "body")
            )

        def r8_frame():
            added = (
                snapshot_changes(
                    spark, src, "doc_id", from_version=last, columns=[]
                )
                .filter(F.col("status") == "added")
                .select("doc_id")
            )
            return read_snapshot(spark, src).join(
                added, "doc_id", "left_semi"
            ).select("doc_id", "lang", "body")

        def _materialize(df):
            t0 = time.perf_counter()
            df.agg(
                F.count(F.lit(1)), F.sum(F.length("body"))
            ).collect()
            return time.perf_counter() - t0

        def _mb(df):
            return sum(
                os.path.getsize(f.replace("file:", ""))
                for f in df.inputFiles()
            ) / 1e6

        mb9, mb8 = _mb(r9_frame()), _mb(r8_frame())
        _materialize(r9_frame())  # warm both paths once
        _materialize(r8_frame())
        t9 = statistics.median(_materialize(r9_frame()) for _ in range(3))
        t8 = statistics.median(_materialize(r8_frame()) for _ in range(3))
        print(
            f"{corpus:>11,}  {mb9:>8.1f} {mb8:>8.1f}  {t9:>6.3f}  {t8:>6.3f}"
        )


def merge_delta_shape(spark, root):
    """r10: the MERGE-drain kernel — a fixed 2k-row merge_snapshot
    (1k overwrites + 1k inserts) consumed through the pair-encoded
    carry feed, as the corpus grows. The feed reads the merge's batch
    dir plus ONE range-pruned pre-image probe; the counter (inputFiles
    MB of the feed's plan) must stay ~constant while the corpus grows
    16×, or the maintainers' merge consumption is not O(batch)."""
    print(
        "corpus_rows   feed_MB  feed_s   "
        "(fixed 2k merge: 1k overwrites + 1k inserts, pair-encoded "
        "carry feed)"
    )
    from vector_db_setup_spark.sources.snapshot_table import merge_snapshot

    for corpus in (100_000, 400_000, 1_600_000):
        src = f"{root}/msrc{corpus}"
        # constant file size, growing file count (the real landing
        # shape) — the pre-image probe's pruned file set is then a
        # corpus-independent constant
        write_snapshot(
            _docs(spark, 0, corpus),
            src,
            stats_cols=["doc_id"],
            cluster_by=["doc_id"],
            cluster_files=max(16, corpus // 6_250),
        )
        last = current_version(spark, src)
        upd = _docs(spark, 0, BATCH // 2).withColumn(
            "body", F.repeat(F.lit("Z"), 512)
        ).union(_docs(spark, corpus, corpus + BATCH // 2))
        merge_snapshot(upd, src, key_col="doc_id")

        def feed():
            return snapshot_changes(
                spark, src, "doc_id", from_version=last,
                columns=["lang", "body"],
                carry_columns=["lang", "body"],
                change_encoding="pair",
            )

        def _materialize():
            t0 = time.perf_counter()
            feed().agg(
                F.count(F.lit(1)), F.sum(F.length("body"))
            ).collect()
            return time.perf_counter() - t0

        mb = sum(
            os.path.getsize(f.replace("file:", ""))
            for f in feed().inputFiles()
        ) / 1e6
        _materialize()
        t = statistics.median(_materialize() for _ in range(3))
        print(f"{corpus:>11,}  {mb:>7.2f} {t:>7.3f}")


class CountingFS(LocalFS):
    def __init__(self):
        self.read_files = 0

    def read_file(self, path):
        self.read_files += 1
        return super().read_file(path)


def checkpoint_walk(spark, root):
    base = f"{root}/walk"
    fs = LocalFS()
    for v in range(1, 401):
        body = {
            "version": v,
            "created_utc": 1000.0 + v,
            "op": "append",
            "data": [f"d-{i:03d}" for i in range(1, min(v, 8) + 1)],
            "rows": v,
        }
        fs.create_new(
            f"{base}/{st.COMMITS_DIR}/{st._vname(v)}",
            json.dumps(body).encode(),
        )

    def _walk():
        cfs = CountingFS()
        t0 = time.perf_counter()
        assert snapshot_history(spark, base, fs=cfs).count() == 400
        st._find_idempotent(spark, base, cfs, "absent-key")
        return time.perf_counter() - t0, cfs.read_files

    no_t, no_reads = min(_walk() for _ in range(5))
    write_commit_checkpoint(spark, base)
    ck_t, ck_reads = min(_walk() for _ in range(5))
    print(
        f"400-commit walk (history + idempotency miss): "
        f"no_ckpt {no_reads} reads / {no_t:.3f}s   "
        f"with_ckpt {ck_reads} reads / {ck_t:.3f}s"
    )


def main():
    spark = get_spark(
        app_name="maintainer-obatch",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    root = "/tmp/maintainer_obatch"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    added_delta_shape(spark, root)
    merge_delta_shape(spark, root)
    checkpoint_walk(spark, root)
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
