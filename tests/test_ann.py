"""ANN index builds: determinism and recall against exact KNN (the
reference is exact-only; ANN is the mandated batch-build extension, so
the quality bar is recall vs the exact result, not an oracle)."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_SMOKE
from vector_db_setup_spark.operators.ann import (
    ivf_assign,
    ivf_search,
    kmeans_centroids,
    lsh_bucket,
    random_hyperplanes,
)
from vector_db_setup_spark.operators.knn import knn_topk
from vector_db_setup_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings").cache()


@pytest.fixture(scope="module")
def centroids(spark, emb):
    return kmeans_centroids(emb, k=8)


def test_ivf_assignment_covers_all(spark, emb, centroids):
    assigned = ivf_assign(emb, centroids)
    assert assigned.count() == emb.count()
    ids = [r[0] for r in assigned.select("cluster_id").distinct().collect()]
    assert all(0 <= i < 8 for i in ids)


def test_ivf_recall_vs_exact(spark, emb, centroids):
    q = emb.filter("vec_id = 7").select("embedding").first()[0]
    exact = {
        r["vec_id"]
        for r in knn_topk(emb, "embedding", q, k=10).select("vec_id").collect()
    }
    assigned = ivf_assign(emb, centroids)
    approx = {
        r["vec_id"]
        for r in ivf_search(assigned, centroids, q, k=10, nprobe=4)
        .select("vec_id")
        .collect()
    }
    # probing half the clusters must recover most of the exact top-10
    assert len(exact & approx) >= 6


def test_lsh_same_bucket_for_identical_vectors(spark, emb):
    planes = random_hyperplanes(64, n_planes=8)
    b = lsh_bucket(emb, planes)
    one = b.filter("vec_id = 3").select("bucket_id").first()[0]
    again = lsh_bucket(emb.filter("vec_id = 3"), planes).first()["bucket_id"]
    assert one == again
    n_buckets = b.select("bucket_id").distinct().count()
    assert 1 < n_buckets <= 256


def test_ivf_partitioned_write_prunes(spark, emb, centroids, tmp_path):
    from vector_db_setup_spark.operators.ann import ivf_write

    path = str(tmp_path / "ivf")
    ivf_write(ivf_assign(emb, centroids), path)
    idx = spark.read.parquet(path)
    one_cluster = idx.filter("cluster_id = 0")
    plan = one_cluster._jdf.queryExecution().executedPlan().toString()
    # partition filter must reach the scan (pruned read, not post-filter)
    assert "PartitionFilters: [isnotnull(cluster_id" in plan
    total = sum(
        r["n"] for r in idx.groupBy("cluster_id").count().withColumnRenamed(
            "count", "n"
        ).collect()
    )
    assert total == emb.count()


def test_brp_join_recall_and_precision(spark, emb):
    from vector_db_setup_spark.operators.ann import brp_similarity_join

    threshold = 1.15
    rows = emb.select("vec_id", "embedding").collect()
    E = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    ids = sorted(E)
    exact = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if float(np.linalg.norm(E[a] - E[b])) < threshold
    }
    assert exact, "fixture has no near pairs below the threshold"

    got_rows = brp_similarity_join(
        emb, threshold=threshold, bucket_length=4.0, num_hash_tables=5
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in got_rows}
    # precision is exact by construction (true L2 re-computed per pair)
    assert got <= exact
    # OR-amplified buckets must recover nearly all true pairs
    assert len(got & exact) / len(exact) >= 0.9


def test_ivf_search_batch_exact_when_probing_all(spark, emb, centroids):
    """With nprobe = #clusters the batch IVF search IS exact: it must
    reproduce batch_knn_join's (query, neighbor, distance) rows."""
    from pyspark.sql import functions as F

    from vector_db_setup_spark.operators.ann import ivf_search_batch
    from vector_db_setup_spark.operators.knn import batch_knn_join

    queries = (
        emb.filter("vec_id < 5")
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    assigned = ivf_assign(emb, centroids)
    got = {
        (r["query_id"], r["vec_id"], round(r["distance"], 6))
        for r in ivf_search_batch(
            queries, assigned, centroids, k=3, nprobe=len(centroids)
        ).collect()
    }
    want = {
        (r["query_id"], r["vec_id"], round(r["distance"], 6))
        for r in batch_knn_join(queries, emb, k=3).collect()
    }
    assert got == want


def test_ivf_search_batch_recall_at_nprobe(spark, emb, centroids):
    """Partial probing trades recall for |Q|*nprobe*cluster work; at
    nprobe=4 of 8 clusters, batch recall@10 must stay high (same bar
    as the single-query ivf_search test)."""
    from pyspark.sql import functions as F

    from vector_db_setup_spark.operators.ann import ivf_search_batch
    from vector_db_setup_spark.operators.knn import batch_knn_join

    queries = (
        emb.filter("vec_id < 20")
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    assigned = ivf_assign(emb, centroids)
    exact = {}
    for r in batch_knn_join(queries, emb, k=10).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx = {}
    for r in ivf_search_batch(
        queries, assigned, centroids, k=10, nprobe=4
    ).collect():
        approx.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.6, sum(recalls) / len(recalls)
