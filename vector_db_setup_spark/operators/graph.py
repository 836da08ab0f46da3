"""Connected components via iterative min-label propagation.

The missing piece between near-duplicate *pair* generation
(operators/dedup.py, operators/ann.py) and actual corpus dedup: LSH
emits candidate edges; the duplicate *clusters* are the connected
components of that graph, and the canonical document per cluster is the
min id. The reference has no graph ops (SURVEY.md §2 — none), but any
at-scale dedup pipeline needs this closure step.

Spark-first formulation: a driver-side loop over distributed joins —
each iteration every node takes the min label among itself and its
neighbors; converged when no label changes. Iteration count is bounded
by the graph diameter (near-dup graphs are shallow: duplicate clusters
are near-cliques, so a handful of rounds). Each round is one shuffle on
node id; `localCheckpoint` truncates the lineage so plans don't grow
with iterations. At 100 TB this is the textbook pattern (GraphX/GraphFrames
use the same loop); for pathological long-chain graphs switch to the
large-star/small-star variant, which converges in O(log² n) rounds.

DuckDB oracle: WITH RECURSIVE transitive reachability + min() — exact
same semantics, so the whole iterative operator is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (id, component) where component = min node id reachable.

    `nodes` must contain every vertex (isolated vertices keep their own
    id as component). Edges are treated as undirected.
    """
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .distinct()
    )
    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("comp"))
    sym = sym.localCheckpoint(eager=True)
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iter):
        # min label among each node's neighbors
        nbr_min = (
            sym.join(labels, sym.a == labels.id)
            .groupBy(F.col("b").alias("id2"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, labels.id == nbr_min.id2, "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("id", F.col("comp").alias("component"))
