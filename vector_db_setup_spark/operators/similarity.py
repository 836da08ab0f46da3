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
        for pdf in batches:
            idx = pdf[id_col].map(order).to_numpy()
            chunk = all_mat[idx]                      # m×d
            sims = chunk @ all_mat.T                  # m×N GEMM
            rows_i = np.repeat(all_ids[idx], sims.shape[1])
            cols_j = np.tile(all_ids, sims.shape[0])
            keep = rows_i < cols_j                    # upper triangle only
            s = sims.ravel()[keep]
            ia, jb = rows_i[keep], cols_j[keep]
            if len(s) > k:
                top = np.argpartition(-s, k)[:k]
                s, ia, jb = s[top], ia[top], jb[top]
            yield pd.DataFrame({"id_a": ia, "id_b": jb, "cosine": s})

    local = emb.select(id_col).mapInPandas(_chunk_topk, schema=_PAIR_SCHEMA)
    return local.orderBy(
        F.col("cosine").desc(), F.col("id_a").asc(), F.col("id_b").asc()
    ).limit(k)
