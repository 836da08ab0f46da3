"""Pin the native-vs-Arrow L2 kernel crossover by dimension (VERDICT r4
item 8: the r4 measurement bracketed it loosely at 64-d vs 768-d; this
sweeps 64..768 to justify knn_topk's WIDE_DIM dispatch with data).

Method identical to SCALE_EXPERIMENTS.md "Native distance expression at
reference width": 100k random vectors, single-query exact L2 top-5,
localCheckpoint'd input (no IO in the timing), warm = min of 3 runs,
and a both-paths-agree check on ids at every width.

Run: python experiments/kernel_crossover.py
"""

from __future__ import annotations

import time

import numpy as np
from pyspark.sql import functions as F

from vector_db_setup_spark.operators.knn import knn_topk
from vector_db_setup_spark.session import get_spark

N = 100_000
DIMS = (64, 128, 192, 256, 384, 768)


def main():
    spark = get_spark(app_name="kernel-crossover")
    rng = np.random.default_rng(5)
    print("| dim | native s | arrow s | winner |")
    print("|---|---|---|---|")
    for dim in DIMS:
        mat = rng.standard_normal((N, dim)).astype(np.float64)
        q = rng.standard_normal(dim).tolist()
        pdf = __import__("pandas").DataFrame(
            {"vec_id": np.arange(N), "embedding": list(map(list, mat))}
        )
        df = (
            spark.createDataFrame(pdf)
            .repartition(32)
            .localCheckpoint(eager=True)
        )
        timings = {}
        ids = {}
        for label, force in (("native", False), ("arrow", True)):
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                rows = knn_topk(
                    df,
                    "embedding",
                    q,
                    k=5,
                    id_col="vec_id",
                    use_arrow_kernel=force,
                ).collect()
                best = min(best, time.time() - t0)
            timings[label] = best
            ids[label] = [r["vec_id"] for r in rows]
        assert ids["native"] == ids["arrow"], (dim, ids)
        win = "native" if timings["native"] <= timings["arrow"] else "arrow"
        print(
            f"| {dim} | {timings['native']:.2f} | {timings['arrow']:.2f} "
            f"| {win} |",
            flush=True,
        )
        df.unpersist()


if __name__ == "__main__":
    main()
