"""SemDeDup operator (operators/semdedup.py): constructed-geometry
semantics — keep-farthest-from-centroid, deterministic ties, cluster
scoping — plus the hashed-BoW embedding's exactness property. The SQL
oracle value check runs in test_oracle_parity (semdedup_doc_keepers)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from vector_db_setup_spark.functions.text import hashed_bow_vector
from vector_db_setup_spark.operators.semdedup import semdedup_keepers
from vector_db_setup_spark.sources.registry import load_table

CENTS = np.array([[1.0, 0.0], [0.0, 1.0]])


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(a), float(b)]) for i, a, b in rows],
        "vec_id long, embedding array<double>",
    )


def _ids(df):
    return sorted(r["vec_id"] for r in df.collect())


def test_keep_farthest_from_centroid(spark):
    # both in cluster 0; cosine ≈ 1; id 3 sits farther → id 3 survives
    emb = _emb(spark, [(2, 5.0, 0.1), (3, 6.0, 0.1)])
    out = semdedup_keepers(emb, CENTS, tau=0.95)
    assert _ids(out) == [3]


def test_exact_duplicates_tie_keeps_lowest_id(spark):
    emb = _emb(spark, [(0, 10.0, 0.0), (1, 10.0, 0.0), (2, 10.0, 0.0)])
    out = semdedup_keepers(emb, CENTS, tau=0.95)
    assert _ids(out) == [0]


def test_cross_cluster_pairs_not_compared(spark):
    # nearly identical directions but assigned to DIFFERENT centroids:
    # SemDeDup's scoping keeps both (the paper's accepted recall trade).
    emb = _emb(spark, [(4, 1.01, 1.0), (5, 1.0, 1.01)])
    asg = semdedup_keepers(emb, CENTS, tau=0.9)
    rows = {r["vec_id"]: r["cluster_id"] for r in asg.collect()}
    assert rows == {4: 0, 5: 1}


def test_below_tau_everything_survives(spark):
    emb = _emb(spark, [(6, 5.0, 0.0), (7, 4.0, 1.0)])  # cosine ≈ 0.970
    assert _ids(semdedup_keepers(emb, CENTS, tau=0.99)) == [6, 7]
    # at tau=0.95 they pair up; id 6 (dist 4.0) beats id 7 (dist ~3.16)
    assert _ids(semdedup_keepers(emb, CENTS, tau=0.95)) == [6]


def test_centroid_dist_is_rounded_l2(spark):
    emb = _emb(spark, [(8, 4.0, 0.0)])
    row = semdedup_keepers(emb, CENTS, tau=0.99).collect()[0]
    assert row["cluster_id"] == 0
    assert row["centroid_dist"] == 3.0


def test_max_cluster_rows_cap_suppresses_pairs(spark):
    emb = _emb(spark, [(0, 10.0, 0.0), (1, 10.0, 0.0), (2, 10.0, 0.0)])
    out = semdedup_keepers(emb, CENTS, tau=0.95, max_cluster_rows=2)
    assert _ids(out) == [0, 1, 2]  # capped cluster emits no pairs


def test_hashed_bow_exact_integer_counts(spark):
    d = load_table(spark, SF_ORACLE, "documents").filter("doc_id < 30")
    rows = d.select(
        "doc_id", "text", hashed_bow_vector("text", 64).alias("vec")
    ).collect()
    import hashlib

    for r in rows:
        toks = r["text"].lower().split(" ")
        want = [0.0] * 64
        for t in toks:
            want[int(hashlib.md5(t.encode()).hexdigest()[:4], 16) % 64] += 1
        assert r["vec"] == want
        assert sum(r["vec"]) == len(toks)


def test_fixture_run_removes_and_is_idempotent(spark):
    d = load_table(spark, SF_ORACLE, "documents")
    vecs = d.select("doc_id", hashed_bow_vector("text", 64).alias("vec"))
    seeds = vecs.filter(F.col("doc_id") < 4).orderBy("doc_id").collect()
    cents = np.array([r["vec"] for r in seeds], dtype=np.float64)
    first = semdedup_keepers(
        vecs, cents, tau=0.95, vec_col="vec", id_col="doc_id"
    )
    kept1 = sorted(r["doc_id"] for r in first.collect())
    assert 0 < len(kept1) < 500  # non-trivial removal on the fixture
    # idempotence: running the pass over the survivors removes nothing
    survivors = vecs.join(
        first.select(F.col("doc_id").alias("k")),
        vecs.doc_id == F.col("k"),
        "left_semi",
    )
    second = semdedup_keepers(
        survivors, cents, tau=0.95, vec_col="vec", id_col="doc_id"
    )
    kept2 = sorted(r["doc_id"] for r in second.collect())
    assert kept2 == kept1


def test_gemm_assignment_equals_expression_form(spark):
    """ivf_assign_gemm (the large-k scale path) must produce the SAME
    cluster ids and 6-dp distances as the native-expression argmin —
    on real float embeddings AND on the integer-count BoW vectors the
    oracle relies on."""
    from vector_db_setup_spark.operators.ann import (
        ivf_assign,
        ivf_assign_gemm,
        kmeans_centroids,
    )

    emb = load_table(spark, SF_ORACLE, "embeddings")
    cents = kmeans_centroids(emb, k=24, seed=7, max_iter=5)
    a = {
        (r["vec_id"], r["cluster_id"], round(r["d"], 6))
        for r in ivf_assign(emb, cents, dist_col="d").collect()
    }
    b = {
        (r["vec_id"], r["cluster_id"], round(r["d"], 6))
        for r in ivf_assign_gemm(emb, cents, dist_col="d").collect()
    }
    assert a == b

    d = load_table(spark, SF_ORACLE, "documents").limit(200)
    vecs = d.select("doc_id", hashed_bow_vector("text", 64).alias("v"))
    seeds = np.array(
        [r["v"] for r in vecs.filter("doc_id < 6").orderBy("doc_id").collect()]
    )
    a2 = {
        (r["doc_id"], r["cluster_id"], r["dd"])
        for r in ivf_assign(vecs, seeds, vec_col="v", dist_col="dd").collect()
    }
    b2 = {
        (r["doc_id"], r["cluster_id"], r["dd"])
        for r in ivf_assign_gemm(
            vecs, seeds, vec_col="v", dist_col="dd"
        ).collect()
    }
    assert a2 == b2  # exact, unrounded — integer vectors


def test_semdedup_assign_modes_agree(spark):
    d = load_table(spark, SF_ORACLE, "documents")
    vecs = d.select("doc_id", hashed_bow_vector("text", 64).alias("vec"))
    seeds = vecs.filter(F.col("doc_id") < 20).orderBy("doc_id").collect()
    cents = np.array([r["vec"] for r in seeds], dtype=np.float64)  # k=20
    expr = sorted(
        tuple(r)
        for r in semdedup_keepers(
            vecs, cents, tau=0.95, vec_col="vec", id_col="doc_id",
            assign="expr",
        ).collect()
    )
    gemm = sorted(
        tuple(r)
        for r in semdedup_keepers(
            vecs, cents, tau=0.95, vec_col="vec", id_col="doc_id",
            assign="gemm",
        ).collect()
    )
    assert expr == gemm and len(expr) < 500
