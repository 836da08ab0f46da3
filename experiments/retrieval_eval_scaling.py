"""Retrieval-eval at 100x the fixture corpus: the metric algebra is
scorer-independent, so the 100 TB path is swapping the exact
crossJoin+window scorer for the blocked-GEMM one — this experiment
pins (a) that the swap changes NOTHING in the metric outputs and
(b) what it buys in wall clock as Q×N grows.

Corpus: 200,000 x 64-d float32 (seeded normal), 10 balanced labels;
64 held-out query vectors (same generator, ids disjoint from the
corpus so self-exclusion is moot). k=10.

Paths timed (corpus persisted first; timings exclude generation):
  window   exact L2 via crossJoin(broadcast queries) + row_number
           window top-k (the retrieval_eval default plan)
  gemm     operators/similarity.batch_knn_blocked (per-partition
           numpy GEMM top-k + global rank) feeding the IDENTICAL
           metric expressions

Run:  python experiments/retrieval_eval_scaling.py
Results recorded in SCALE_EXPERIMENTS.md "Retrieval-eval scorer swap".
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import Window
from pyspark.sql import functions as F

from vector_db_setup_spark.functions.vector import l2_distance
from vector_db_setup_spark.session import get_spark

N, D, K, CLASSES = 200_000, 64, 10, 10
Q = int(os.environ.get("RETEVAL_Q", "64"))


def make_corpus(spark, seed=0):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(N, D)).astype(np.float32)
    rows = [
        (i, vecs[i].tolist(), int(i % CLASSES)) for i in range(N)
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).repartition(32)


def make_queries(spark, seed=1):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(Q, D)).astype(np.float32)
    rows = [
        (N + i, vecs[i].tolist(), int(i % CLASSES)) for i in range(Q)
    ]
    return spark.createDataFrame(
        rows, "query_id bigint, qvec array<float>, qlabel int"
    )


def metrics_from_topk(topk, totals):
    """The PRODUCTION metric algebra, imported — the experiment's whole
    claim is that this exact code is scorer-independent, so it must
    exercise the shared implementation, not a copy that could drift."""
    from vector_db_setup_spark.queries import _retrieval_metrics

    return _retrieval_metrics(topk, totals, K)


def main():
    spark = get_spark(app_name="retrieval-eval-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = make_corpus(spark).persist()
    corpus.count()
    qs = make_queries(spark)
    labels = qs.select("query_id", "qlabel")
    totals = (
        labels.alias("q")
        .join(corpus.alias("e"), F.col("e.label") == F.col("q.qlabel"))
        .groupBy("q.query_id")
        .agg(F.count(F.lit(1)).alias("total_rel"))
    ).persist()
    totals.count()

    # path A: exact crossJoin + window (retrieval_eval default)
    t0 = time.perf_counter()
    pairs = corpus.crossJoin(F.broadcast(qs))
    scored = pairs.withColumn(
        "dist", l2_distance(F.col("embedding"), F.col("qvec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("vec_id").asc()
    )
    topk_a = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= K
    ).select("query_id", "rn", "label", "qlabel")
    a = sorted(tuple(r) for r in metrics_from_topk(topk_a, totals).collect())
    t_window = time.perf_counter() - t0

    # path B: blocked GEMM scorer feeding the SAME metric algebra
    from vector_db_setup_spark.operators.similarity import batch_knn_blocked

    t0 = time.perf_counter()
    knn = batch_knn_blocked(
        qs.select("query_id", "qvec"), corpus, k=K
    )  # (query_id, vec_id, dist)
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("vec_id").asc()
    )
    topk_b = (
        knn.withColumn("rn", F.row_number().over(w2))
        .join(corpus.select("vec_id", "label"), "vec_id")
        .join(labels, "query_id")
        .select("query_id", "rn", "label", "qlabel")
    )
    b = sorted(tuple(r) for r in metrics_from_topk(topk_b, totals).collect())
    t_gemm = time.perf_counter() - t0

    print(f"N={N} D={D} Q={Q} K={K}")
    print(f"window scorer: {t_window:.2f}s")
    print(f"gemm scorer:   {t_gemm:.2f}s  ({t_window / t_gemm:.2f}x)")
    print(f"metrics identical: {a == b} ({len(a)} queries)")


if __name__ == "__main__":
    main()
