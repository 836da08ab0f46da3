"""Versioned ANN index: IVF builds landed as snapshot-table commits —
zero-downtime index refresh.

The missing operational piece between `operators/ann.py` (IVF math +
cluster-partitioned layout) and a production retrieval service is the
REFRESH story: embeddings change nightly, the index must rebuild, and
in-flight searches must never see a half-built or half-deleted layout.
The pointer-committed snapshot table already gives exactly that for
data; here the INDEX is the data:

- a build lands the cluster-assigned vectors as a hive-partitioned
  snapshot version (partition pruning on `cluster_id=` works INSIDE
  the pinned version dir), with the trained centroids and build
  parameters stored in the commit marker's ``meta`` — the index
  version is fully self-describing (no side file can drift from the
  data it indexes);
- a search resolves one marker (driver-side small-file read), routes
  the query to its nprobe nearest centroids FROM THAT MARKER, and
  scans only those partitions of that pinned dir — a concurrent
  rebuild landing a new version is invisible to it;
- rollback is `version=` time travel; reclamation is `gc_snapshots`'s
  reader-grace contract.

Citations: ivf math in operators/ann.py (recall-tested,
plan-asserted); commit protocol in sources/snapshot_table.py.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_db_setup_spark.operators.ann import ivf_assign, kmeans_centroids
from vector_db_setup_spark.sources.snapshot_table import (
    read_snapshot,
    snapshot_info,
    write_snapshot,
)


def build_ivf_index(
    emb: DataFrame,
    base: str,
    k: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    fs=None,
    idempotency_key: str | None = None,
) -> int:
    """Train + assign + land one index version; returns its number.

    Offline batch shape: seeded KMeans (deterministic per data+seed),
    map-stage assignment, one partitioned write, one commit. The
    centroids travel in the marker meta (k×d doubles — KBs), so a
    search needs no artifact beyond the table itself."""
    cents = kmeans_centroids(
        emb.select(F.col(vec_col).alias("embedding")), k=k, seed=seed
    )
    assigned = ivf_assign(emb, cents, vec_col=vec_col)
    return write_snapshot(
        assigned,
        base,
        note=f"ivf k={k} seed={seed}",
        fs=fs,
        idempotency_key=idempotency_key,
        partition_by=["cluster_id"],
        meta={
            "kind": "ivf",
            "k": int(k),
            "seed": int(seed),
            "vec_col": vec_col,
            "centroids": [[float(x) for x in c] for c in np.asarray(cents)],
        },
    )


def search_ivf_index(
    spark: SparkSession,
    base: str,
    query_vec,
    topk: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    version: int | None = None,
    fs=None,
) -> DataFrame:
    """Exact KNN over the nprobe nearest clusters of a PINNED index
    version. Reads: one marker file (driver), then only the probed
    `cluster_id=` partitions of that version's dir (partition pruning
    — plan-asserted in tests). nprobe == k degenerates to exact
    search over the full version, which is the value-check the tests
    pin against `knn_topk`."""
    from vector_db_setup_spark.operators.knn import knn_topk

    from vector_db_setup_spark.sources.snapshot_table import current_version

    v = version if version is not None else current_version(spark, base, fs)
    info = snapshot_info(spark, base, v, fs)
    meta = info.get("meta") or {}
    if meta.get("kind") != "ivf":
        # generic snapshot commits (compact_snapshot, upsert_snapshot)
        # carry no index meta and no cluster partitioning — an index
        # table is maintained by RE-BUILDING (build_ivf_index lands the
        # refreshed index as the next version), never by generic
        # maintenance ops, and a mixed table must fail loudly here
        # rather than scan unpruned with stale centroids
        raise ValueError(
            f"version {v} at {base} is not an IVF index commit "
            f"(marker meta: {sorted(meta) or 'none'}); index tables are "
            "refreshed with build_ivf_index, not generic snapshot ops"
        )
    cents = np.asarray(meta["centroids"], dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    probe = [int(i) for i in np.argsort(((cents - q) ** 2).sum(axis=1))[:nprobe]]
    scan = read_snapshot(spark, base, version=v, fs=fs).filter(
        F.col("cluster_id").isin(probe)
    )
    return knn_topk(
        scan, meta["vec_col"], query_vec, k=topk, id_col=id_col
    )
