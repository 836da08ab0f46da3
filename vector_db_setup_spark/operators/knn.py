"""Exact K-nearest-neighbor search — the reference's flagship query.

Reference semantics (fever_multi_agent.py:67-75):

    SELECT id, content, embedding <-> %s::vector AS distance
    FROM fever_documents ORDER BY distance LIMIT %s

i.e. brute-force exact scan + top-k heap (the repo creates no ANN index —
zero DDL anywhere, SURVEY.md §2.9 V2).

Spark physical story:
- Single-query KNN: per-row distance + ``orderBy().limit(k)`` compiles to
  ``TakeOrderedAndProject`` — each partition keeps a k-element heap, the
  driver merges P heaps. NO full shuffle, NO global sort. This is exactly
  the plan that survives 100 TB / 1000 executors: cost is one scan plus
  O(P·k) merge.
- Batch KNN (Q queries × N docs): broadcast the *queries* side (small) so
  the big corpus never shuffles; rank per query with a window. At scale,
  prune candidates first with LSH/IVF (see operators/ann.py) to avoid the
  Q×N product.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_db_setup_spark.functions.vector import (
    cosine_distance,
    dot_product,
    l2_distance,
    vector_literal,
)

_METRICS = {
    "l2": l2_distance,
    "cosine": cosine_distance,
    # max inner product: negate so "smaller distance = better" uniformly
    "dot": lambda a, b: -dot_product(a, b),
}


def distance_expr(metric: str, a, b) -> Column:
    try:
        return _METRICS[metric](a, b)
    except KeyError:
        raise ValueError(f"unknown metric {metric!r}; one of {sorted(_METRICS)}")


def knn_topk(
    df: DataFrame,
    vec_col: str,
    query_vec: Sequence[float],
    k: int = 5,
    metric: str = "l2",
    dist_col: str = "distance",
    id_col: str | None = None,
    use_arrow_kernel: bool | None = None,
) -> DataFrame:
    """Exact top-k nearest rows to a literal query vector.

    Mirrors the reference's ORDER BY <-> LIMIT k (k=5 default,
    fever_multi_agent.py:58). Physical plan: TakeOrderedAndProject —
    verify with ``.explain()``; there must be no Exchange before the
    top-k.

    Pass ``id_col`` to total-order the cut: ties at the k-th distance
    (duplicate vectors) are then broken deterministically on the id, the
    same order every DuckDB oracle uses, instead of arbitrarily.

    Width dispatch (SURVEY §7 risk, measured r4 in SCALE_EXPERIMENTS.md
    "Native distance expression at reference width"): the native
    zip_with/aggregate expression wins below ~256 dims (0.35 s vs
    0.68 s warm at 64-d×100k) but per-element codegen overhead crosses
    over at the reference's 768-d, where the Arrow-batched numpy UDF is
    ~15 % faster (0.68 s vs 0.80 s). L2 queries at ≥ ``WIDE_DIM``
    therefore route through the pandas UDF automatically; the fixture
    paths (64-d) and every DuckDB-oracle comparison keep the native
    expression. Override with ``use_arrow_kernel`` (True forces the
    numpy kernel, False forces the native expression, None = the
    width-based auto dispatch).

    PARITY CAVEAT (ADVICE r4): the numpy kernel sums squared diffs in a
    different order than the native left-fold ``aggregate`` expression,
    so the two paths can differ in the LAST ULP of the distance. That
    never changes values after the queries' 6-dp rounding, but at an
    EXACTLY tied k-th boundary it could in principle swap which of two
    near-equal rows makes the cut when no ``id_col`` total-orders the
    tie. If strict cross-path/oracle parity at wide dims matters, pass
    ``use_arrow_kernel=False`` or round the distance before the k-cut
    (and always pass ``id_col``).
    """
    # nulls LAST: a NULL/wrong-width vector yields a NULL distance,
    # and Spark's default asc() is NULLS FIRST — which would rank every
    # malformed row AHEAD of all real neighbors and fill the top-k.
    # DuckDB's ASC is nulls-last, so this is also the oracle's order.
    order = [F.col(dist_col).asc_nulls_last()]
    if id_col is not None:
        order.append(F.col(id_col).asc())
    wide = (
        use_arrow_kernel
        if use_arrow_kernel is not None
        else len(query_vec) >= WIDE_DIM
    )
    if use_arrow_kernel and metric != "l2":
        raise ValueError(
            f"use_arrow_kernel=True is only implemented for metric='l2' "
            f"(got {metric!r}); the native expression is the only "
            "cosine/dot path"
        )
    if metric == "l2" and wide:
        dist = _pandas_l2_to_query(query_vec)(F.col(vec_col))
    else:
        q = vector_literal(query_vec)
        dist = distance_expr(metric, F.col(vec_col), q)
    return df.withColumn(dist_col, dist).orderBy(*order).limit(k)


# Crossover between native zip_with/aggregate codegen and the
# Arrow-batched numpy kernel. r5 sweep (100k vectors, min of 5 warm
# runs, SCALE_EXPERIMENTS.md "Kernel crossover by dimension"):
#   dim    128   192   256   384   768
#   native 0.30  0.31  0.52  0.55  0.86 s
#   arrow  0.41  0.35  0.68  0.53  0.71 s
# Native wins through 256, ties at 384, loses only at 768 — and the
# Arrow path's first-run cost (Python-worker + Arrow channel warm-up)
# is 5-20x its warm time, so the tie goes to native. Threshold 512:
# above it the ~20% warm win at 768-d is real and repeatable.
WIDE_DIM = 512


def _pandas_l2_to_query(query_vec: Sequence[float]):
    """Arrow-vectorized L2-to-a-fixed-query kernel for wide vectors.

    The query vector is captured as a numpy closure (shipped once per
    executor in the serialized UDF, not per row as a literal array
    column)."""
    from pyspark.sql.functions import pandas_udf

    qarr = np.asarray(list(query_vec), dtype="float64")

    @pandas_udf("double")
    def _l2(a: pd.Series) -> pd.Series:
        # null-safe like the native zip_with/aggregate expression it
        # replaces: a NULL or wrong-width vector yields a null distance,
        # not a failed Arrow batch
        vals = a.to_numpy()
        ok = np.array(
            [v is not None and len(v) == qarr.shape[0] for v in vals]
        )
        out = np.full(len(vals), np.nan)
        if ok.any():
            am = np.stack(vals[ok])
            out[ok] = np.sqrt(((am - qarr) ** 2).sum(axis=1))
        return pd.Series(out).where(pd.Series(ok), None)

    return _l2


def batch_knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    query_vec_col: str = "embedding",
    corpus_vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
    metric: str = "l2",
    dist_col: str = "distance",
    corpus_id_col: str | None = None,
) -> DataFrame:
    """Top-k corpus neighbors for EVERY query row (SURVEY.md §2.3 J2).

    queries (Q rows, small) is broadcast against corpus (N rows, huge):
    the corpus never moves. Ranking shuffles only Q×N candidate rows
    keyed by query_id — at real scale, feed a pruned candidate set (ANN
    pre-bucketing) instead of the full cross product.

    Pass ``corpus_id_col`` to break distance ties deterministically on
    the corpus id — required for result-equivalence with the GEMM path
    (``similarity.batch_knn_blocked``), which always tie-breaks on id.
    """
    # __rn included: withColumn would silently overwrite it and the
    # tail drop() would remove the caller's column from the result
    # (r13 review pass — bloom_probe's clash class)
    clash = {query_id_col, "__qvec", "__rn"} & set(corpus.columns)
    if clash:
        raise ValueError(
            f"corpus already has column(s) {sorted(clash)}; rename them "
            "or pass a different query_id_col (the crossJoin would make "
            "the window partition key ambiguous)"
        )
    q = queries.select(
        F.col(query_id_col),
        F.col(query_vec_col).alias("__qvec"),
    )
    pairs = corpus.crossJoin(F.broadcast(q))
    scored = pairs.withColumn(
        dist_col, distance_expr(metric, F.col(corpus_vec_col), F.col("__qvec"))
    ).drop("__qvec")
    # nulls LAST (same reasoning as knn_topk): a malformed corpus row's
    # NULL distance must not occupy rank 1 in EVERY query's window
    order = [F.col(dist_col).asc_nulls_last()]
    if corpus_id_col is not None:
        order.append(F.col(corpus_id_col).asc())
    w = Window.partitionBy(query_id_col).orderBy(*order)
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
