"""Blocked all-pairs cosine similarity — distributed GEMM.

The naive formulation (crossJoin + per-pair zip_with/aggregate) evaluates
interpreted higher-order functions per array element: O(N²·d) *interpreted*
ops. This operator instead:

1. broadcasts the L2-normalized corpus matrix B (N×d float64) to every
   executor (vectors are small relative to the pair count: 1M×64d ≈ 512 MB,
   still broadcastable; beyond that, bucket first — see below);
2. `mapInPandas` over row chunks: each chunk computes `chunk @ B.T` as one
   BLAS call and emits only its local top-k pairs (i < j);
3. a final global top-k over (chunks × k) candidate rows.

Executor work is real matrix multiply (numpy/BLAS); the driver sees only
k rows per chunk. At 100 TB scale the same kernel runs *per LSH/IVF
bucket* (operators/ann.py assigns buckets; this verifies within them) —
all-pairs over the full corpus is never the plan.

Result parity: cosine = dot of double-normalized vectors; differs from a
sequential fold only in summation order (≪ 1e-12), rounded to 6 decimals
at the query layer like every derived float.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_PAIR_SCHEMA = StructType(
    [
        StructField("id_a", LongType()),
        StructField("id_b", LongType()),
        StructField("cosine", DoubleType()),
    ]
)


def cosine_topk_pairs_blocked(
    emb: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Global top-k most-similar pairs (id_a < id_b) by cosine.

    The corpus is collected once into a broadcast (ids + normalized
    matrix); per-partition chunks then do one GEMM each and emit their
    local top-k, so the global orderBy sees ≤ partitions × k rows.
    """
    spark = emb.sparkSession
    rows = emb.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    nmat = mat / norms
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(nmat)

    def _chunk_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids = b_ids.value
        all_mat = b_mat.value
        order = {v: i for i, v in enumerate(all_ids)}
        # sub-block rows so temporaries stay ~blk×N, never m×N: flat
        # repeat/tile id arrays at m=10k, N=100k would be GBs per batch
        blk = max(1, int(4_000_000 // max(len(all_ids), 1)) or 1)
        for pdf in batches:
            idx = pdf[id_col].map(order).to_numpy()
            s_acc, ia_acc, jb_acc = [], [], []
            for lo in range(0, len(idx), blk):
                sub = idx[lo : lo + blk]
                sims = all_mat[sub] @ all_mat.T       # blk×N GEMM
                keep = all_ids[sub][:, None] < all_ids[None, :]
                s = sims[keep]
                ii, jj = np.nonzero(keep)
                ia, jb = all_ids[sub][ii], all_ids[jj]
                if len(s) > k:
                    top = np.argpartition(-s, k)[:k]
                    s, ia, jb = s[top], ia[top], jb[top]
                s_acc.append(s); ia_acc.append(ia); jb_acc.append(jb)
            s = np.concatenate(s_acc) if s_acc else np.array([])
            ia = np.concatenate(ia_acc) if ia_acc else np.array([], dtype=np.int64)
            jb = np.concatenate(jb_acc) if jb_acc else np.array([], dtype=np.int64)
            if len(s) > k:
                top = np.argpartition(-s, k)[:k]
                s, ia, jb = s[top], ia[top], jb[top]
            yield pd.DataFrame({"id_a": ia, "id_b": jb, "cosine": s})

    local = emb.select(id_col).mapInPandas(_chunk_topk, schema=_PAIR_SCHEMA)
    return local.orderBy(
        F.col("cosine").desc(), F.col("id_a").asc(), F.col("id_b").asc()
    ).limit(k)


def batch_knn_blocked(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    query_vec_col: str = "qvec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch KNN, two-phase: each corpus partition computes distances to
    ALL queries in one GEMM (|a-b|^2 = |a|^2+|b|^2-2a.b) and emits only
    its local top-k per query; a final per-query rank sees just
    partitions x Q x k candidate rows instead of N x Q scored rows.

    This is the crossJoin+window formulation's scale path: the shuffle
    shrinks from the full scored product to the candidate set. Queries
    must be small enough to broadcast (they are, by definition of batch
    KNN against a huge corpus)."""
    from pyspark.sql import Window

    spark = corpus.sparkSession
    qrows = queries.select(query_id_col, query_vec_col).collect()
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    q_mat = np.array([r[1] for r in qrows], dtype=np.float64)
    b_qids = spark.sparkContext.broadcast(q_ids)
    b_qmat = spark.sparkContext.broadcast(q_mat)

    schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField(id_col, LongType()),
            StructField("dist", DoubleType()),
        ]
    )

    def _chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qm = b_qmat.value
        qi = b_qids.value
        q_norm2 = (qm**2).sum(axis=1)
        for pdf in batches:
            cm = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            ids = pdf[id_col].to_numpy()
            c_norm2 = (cm**2).sum(axis=1)
            # m×Q squared distances via GEMM
            d2 = c_norm2[:, None] + q_norm2[None, :] - 2.0 * (cm @ qm.T)
            np.maximum(d2, 0.0, out=d2)
            out_q, out_id, out_d = [], [], []
            for j in range(len(qi)):
                col = d2[:, j]
                top = (
                    np.argpartition(col, k)[:k] if len(col) > k else np.arange(len(col))
                )
                out_q.extend([qi[j]] * len(top))
                out_id.extend(ids[top])
                out_d.extend(np.sqrt(col[top]))
            yield pd.DataFrame(
                {"query_id": out_q, id_col: out_id, "dist": out_d}
            )

    local = corpus.select(id_col, vec_col).mapInPandas(_chunk, schema=schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col(id_col).asc()
    )
    return (
        local.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
