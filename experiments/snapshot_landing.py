"""Incremental snapshot landing: rewrite cost must track the DIRTY
fraction, not the corpus size — the claim `sources/shards.land_snapshot`
stands on for the daily-100 TB-snapshot pattern.

Setup: a 200k-doc corpus (same seeded generator family as
throughput_sf10.py), landed once as 64 shards. Then three v2 variants
re-land:

  0%-dirty    identical corpus (pure no-op path: two manifest
              aggregations + zero writes)
  1%-dirty    2,000 docs edited (expected: ≤ min(64, ~2000) shards
              rewritten — at 2000 edits over 64 shards essentially all
              shards are hit, so also measure 0.05% = 100 edits to see
              partial rewrite)
  100%-dirty  every doc edited (upper bound = full rewrite + diff
              overhead)

The cost model: every landing pays one aggregation scan of the NEW
corpus (unavoidable — the checksum must cover every row) plus a write
of only the dirty shards. So time(0%) ≈ scan, time(100%) ≈ scan +
full write, and the dirty-fraction sweep interpolates on the WRITE
component only.

Run:  python experiments/snapshot_landing.py   (~3 min on local[32])
Results recorded in SCALE_EXPERIMENTS.md "Incremental snapshot
landing".
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from vector_db_setup_spark.session import get_spark
from vector_db_setup_spark.sources.shards import land_snapshot

N_DOCS = 200_000
N_SHARDS = 64


def corpus(spark):
    # seeded synthetic corpus: 100-token docs over a 20k vocab
    return (
        spark.range(N_DOCS)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(100)),
                    lambda i: F.concat(
                        F.lit("w"),
                        (F.xxhash64(F.col("id"), i) % 20000).cast("string"),
                    ),
                ),
            ).alias("text"),
        )
    )


def edited(base, frac: float):
    """Edit (append a marker token to) a deterministic `frac` of docs."""
    n = int(N_DOCS * frac)
    return base.withColumn(
        "text",
        F.when(
            F.col("doc_id") < n, F.concat(F.col("text"), F.lit(" EDITED"))
        ).otherwise(F.col("text")),
    )


def main() -> None:
    spark = get_spark(app_name="snapshot-landing-exp")
    spark.sparkContext.setLogLevel("ERROR")
    base = corpus(spark).persist()
    print(f"corpus: {base.count()} docs, {N_SHARDS} shards")

    work = tempfile.mkdtemp(prefix="snap_exp_")
    dest = os.path.join(work, "shards")

    t = time.time()
    land_snapshot(base, dest, N_SHARDS, seed=1)
    print(f"initial landing: {time.time()-t:.2f}s (all {N_SHARDS} new)")

    for label, frac in (
        ("0%-dirty", 0.0),
        ("0.05%-dirty", 0.0005),
        ("1%-dirty", 0.01),
        ("100%-dirty", 1.0),
    ):
        v2 = edited(base, frac)
        t = time.time()
        report = land_snapshot(v2, dest, N_SHARDS, seed=1)
        el = time.time() - t
        from collections import Counter

        c = Counter(r["status"] for r in report.collect())
        print(f"{label:>12}: {el:.2f}s  statuses={dict(c)}")
        # restore v1 so each variant diffs against the same baseline
        if frac:
            land_snapshot(base, dest, N_SHARDS, seed=1)

    # Granularity: the SAME 100-doc edit against a finer sharding —
    # rewrite fraction is ~1-exp(-edits/shards) (balls in bins), so
    # incremental landing only pays off when shards ≫ daily edits.
    for n_shards in (64, 512):
        dest2 = os.path.join(work, f"g{n_shards}")
        land_snapshot(base, dest2, n_shards, seed=1)
        v2 = edited(base, 0.0005)
        t = time.time()
        report = land_snapshot(v2, dest2, n_shards, seed=1)
        el = time.time() - t
        dirty = report.filter("status != 'unchanged'").count()
        print(
            f"granularity {n_shards:>4} shards: 100 edits -> "
            f"{dirty}/{n_shards} rewritten "
            f"({100*dirty/n_shards:.0f}% of bytes), {el:.2f}s"
        )

    base.unpersist()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
