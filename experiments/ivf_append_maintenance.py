"""Incremental IVF maintenance measured (VERDICT r7 item 1 "done"
criteria): append-vs-rebuild WALL cost and RECALL, plus the drift
metric's behavior, at 100k + 10k x 64-d.

Questions answered:
1. What does a nightly 10k-vector batch cost as an APPEND
   (assign-with-marker-centroids + append commit) vs as the full
   rebuild (retrain KMeans + rewrite 110k vectors) that was the only
   refresh path before r8?
2. What recall does the appended index give vs the retrained one, at
   the same nprobe, (a) when the batch is in-distribution and (b)
   when it drifted (+2.0 shift on every component — new-topic
   embeddings)?
3. Does the marker's drift_ratio separate the two regimes (the signal
   an operator schedules full rebuilds on)?

Recall protocol: 20 query vectors (10 from the base distribution, 10
from the batch distribution), recall@10 = overlap of
search_ivf_index(nprobe=4, k=32 clusters) with exact knn_topk over
the SAME pinned version's vectors.

Run:  python experiments/ivf_append_maintenance.py
(~4 min on local[32]; deterministic.) Results recorded in
SCALE_EXPERIMENTS.md "IVF append vs rebuild".
"""

from __future__ import annotations

import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from vector_db_setup_spark.operators.ann_index import (
    append_to_ivf_index,
    build_ivf_index,
    search_ivf_index,
)
from vector_db_setup_spark.operators.knn import knn_topk
from vector_db_setup_spark.session import get_spark
from vector_db_setup_spark.sources.snapshot_table import (
    read_snapshot,
    snapshot_info,
)

SEED = 11
DIM = 64
N_BASE = 100_000
N_BATCH = 10_000
K = 32
NPROBE = 4
TOPK = 10
N_QUERIES = 20


def _vectors(spark, lo, hi, shift=0.0, seed=SEED):
    rng = np.random.default_rng(seed + lo)
    mat = rng.standard_normal((hi - lo, DIM)) + shift
    rows = [(int(lo + i), mat[i].tolist()) for i in range(hi - lo)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(32)


def _recall(spark, base_dir, version, queries) -> float:
    pinned = read_snapshot(spark, base_dir, version=version).select(
        "vec_id", "embedding"
    ).persist()
    pinned.count()
    hits = 0
    for qv in queries:
        exact = {
            r["vec_id"]
            for r in knn_topk(
                pinned, "embedding", qv, k=TOPK, id_col="vec_id"
            ).collect()
        }
        approx = {
            r["vec_id"]
            for r in search_ivf_index(
                spark, base_dir, qv, topk=TOPK, nprobe=NPROBE,
                version=version,
            ).collect()
        }
        hits += len(exact & approx)
    pinned.unpersist()
    return hits / (TOPK * N_QUERIES)


def run_regime(spark, tag: str, shift: float) -> None:
    base_dir = f"/tmp/ivf_append_exp/{tag}"
    shutil.rmtree(base_dir, ignore_errors=True)
    base = _vectors(spark, 0, N_BASE).persist()
    base.count()
    batch = _vectors(spark, N_BASE, N_BASE + N_BATCH, shift=shift).persist()
    batch.count()

    t0 = time.perf_counter()
    v1 = build_ivf_index(base, base_dir, k=K, seed=SEED)
    t_build = time.perf_counter() - t0

    t0 = time.perf_counter()
    v2 = append_to_ivf_index(batch, base_dir)
    t_append = time.perf_counter() - t0

    t0 = time.perf_counter()
    v3 = build_ivf_index(
        base.unionByName(batch), base_dir, k=K, seed=SEED
    )
    t_rebuild = time.perf_counter() - t0

    rng = np.random.default_rng(99)
    queries = [
        (rng.standard_normal(DIM)).tolist() for _ in range(N_QUERIES // 2)
    ] + [
        (rng.standard_normal(DIM) + shift).tolist()
        for _ in range(N_QUERIES - N_QUERIES // 2)
    ]
    r_append = _recall(spark, base_dir, v2, queries)
    r_rebuild = _recall(spark, base_dir, v3, queries)
    meta = snapshot_info(spark, base_dir, v2)["meta"]
    print(
        f"[{tag}] build(100k) {t_build:.1f}s | append(10k) "
        f"{t_append:.1f}s | rebuild(110k) {t_rebuild:.1f}s | "
        f"recall@10 nprobe={NPROBE}: append {r_append:.3f} vs rebuild "
        f"{r_rebuild:.3f} | drift_ratio {meta['drift_ratio']:.3f} "
        f"rebuild_recommended={meta['rebuild_recommended']}"
    )
    base.unpersist()
    batch.unpersist()


def main():
    spark = get_spark(
        app_name="ivf-append",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    run_regime(spark, "in_distribution", shift=0.0)
    run_regime(spark, "drifted", shift=2.0)


if __name__ == "__main__":
    main()
