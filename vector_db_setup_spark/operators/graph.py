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


class NonConvergenceError(RuntimeError):
    """The iterative closure hit its round budget without converging —
    a dedicated type so connected_components_auto's star-fallback
    catches ONLY this signal, not arbitrary RuntimeErrors from a broken
    environment (which must propagate)."""


def _count_capped(df: DataFrame, cap: int) -> int:
    """Row count that stops once cap is exceeded (limit pushdown) — the
    size guard every driver-side collect in operators/ must sit behind
    (tripwire: tests/test_similarity.py
    test_no_unguarded_full_corpus_collect)."""
    return df.limit(cap + 1).count()


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
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("comp"))
    sym = sym.localCheckpoint(eager=True)
    labels = labels.localCheckpoint(eager=True)

    # edge-free graph: identity labels ARE the components — return before
    # the loop so max_iter=0 on a trivial graph doesn't read as timeout
    if sym.isEmpty():
        return labels.select("id", F.col("comp").alias("component"))

    if max_iter <= 0:
        raise NonConvergenceError(
            f"connected_components did not converge in {max_iter} "
            "iterations (no iteration ran (max_iter <= 0) on a "
            "non-empty edge set) — raise max_iter, or use "
            "connected_components_star"
        )
    changed = -1
    # max_iter + 1: a graph whose LAST label change lands exactly in
    # round max_iter still needs one confirming changed==0 round —
    # without it, converged labels raised a spurious
    # NonConvergenceError and the auto path discarded the whole run.
    # The documented contract (max_iter >= graph diameter) now holds.
    for _ in range(max_iter + 1):
        # min label among each node's neighbors
        nbr_min = (
            sym.join(labels, sym.a == labels.id)
            .groupBy(F.col("b").alias("id2"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        # ONE action per iteration: the convergence signal rides the
        # label job as a chg flag (new comp < old comp — least() can
        # only lower a label), the checkpoint is LAZY, and the sum(chg)
        # aggregate both materializes the checkpoint blocks and returns
        # the change count. The former shape paid a second full
        # join-and-count job per iteration purely to compare new vs old
        # labels (guide §7: driver round trips; 2 jobs x diameter).
        flagged = (
            labels.join(nbr_min, labels.id == nbr_min.id2, "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
                (
                    F.coalesce(F.col("nbr_comp"), F.col("comp"))
                    < F.col("comp")
                )
                .cast("long")
                .alias("chg"),
            )
            .localCheckpoint(eager=False)
        )
        changed = flagged.agg(F.sum("chg")).first()[0] or 0
        labels = flagged.select("id", "comp")
        if changed == 0:
            break
    if changed != 0:
        detail = (
            f"{changed} labels still changing"
            if changed >= 0
            else "no iteration ran (max_iter <= 0) on a non-empty edge set"
        )
        raise NonConvergenceError(
            f"connected_components did not converge in {max_iter} "
            f"iterations ({detail}) — the graph "
            "diameter exceeds max_iter; raise it, or use "
            "connected_components_star (O(log² n) rounds on long chains)"
        )
    return labels.select("id", F.col("comp").alias("component"))


def connected_components_auto(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
    star_max_iter: int = 50,
    max_driver_edges: int | None = 100_000,
) -> DataFrame:
    """Connected components with automatic strategy selection — the
    entry point the dedup pipelines (dedup_keepers, corpus curation)
    use.

    Precondition (same as ``connected_components``): ``nodes`` must
    contain every vertex referenced by ``edges``. An edge endpoint
    absent from ``nodes`` is a no-op for the distributed loop but would
    bridge components in the union-find, so the two strategies only
    agree under the stated contract.

    1. The edge set is localCheckpoint'd once and counted. Dedup edge
       sets are typically FAR smaller than the corpus (duplicate pairs
       only — e.g. 645 edges for 5 000 documents at sf0.1), so when
       |E| ≤ ``max_driver_edges`` the components of the edge-touched
       subgraph are solved with a path-compressed union-find on the
       driver (milliseconds, zero iterative jobs) and broadcast-joined
       back; the NODE set never leaves the cluster — isolated nodes
       keep their own id via coalesce, exactly like the distributed
       path. This is the same size-guarded driver-kernel pattern as the
       similarity GEMM kernels. DRIVER MEMORY: the default cap of
       100k edges bounds the pull at two Arrow columns of ≤100k values
       (a few MB even for string ids — the edges move as a columnar
       Arrow batch, not per-row Row objects); callers on the dedup
       paths (dedup_keepers, corpus curation, semantic dedup) inherit
       this default and can pass ``max_driver_edges=None`` to force
       the always-distributed path.
    2. Above the guard: distributed min-label propagation, with
       AUTOMATIC retry via large-star/small-star on non-convergence so
       a pathological long-chain graph degrades to the O(log² n)
       algorithm instead of failing.
    """
    e = (
        edges.select(
            # canonicalize ORIENTATION before the distinct: a symmetric
            # pair list ((x,y) AND (y,x) — similarity joins emit both)
            # would otherwise count every undirected edge twice against
            # the driver cap and push a small graph onto the iterative
            # path for no reason; union-find is orientation-blind
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        # distinct BEFORE the driver-path cap: multi-band LSH stages
        # emit the same pair many times, and raw row count would push a
        # small graph onto the iterative distributed path
        .distinct()
        .localCheckpoint(eager=True)
    )
    if (
        max_driver_edges is not None
        and _count_capped(e, max_driver_edges) <= max_driver_edges
    ):
        # narrow columnar pull: two Arrow columns -> native Python
        # lists, ~10x lighter on driver memory than collect()'s Rows
        pdf = e.toPandas()
        pairs = zip(pdf["a"].tolist(), pdf["b"].tolist())
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for a, b in pairs:
            if a not in parent:
                parent[a] = a
            if b not in parent:
                parent[b] = b
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        labels = [(x, find(x)) for x in parent]
        if not labels:
            return nodes.select(
                F.col(id_col).alias("id"), F.col(id_col).alias("component")
            )
        spark = nodes.sparkSession
        id_type = dict(nodes.select(F.col(id_col).alias("id")).dtypes)["id"]
        lmap = spark.createDataFrame(
            labels, schema=f"id {id_type}, __comp {id_type}"
        )
        return (
            nodes.select(F.col(id_col).alias("id"))
            .join(F.broadcast(lmap), "id", "left")
            .select(
                "id", F.coalesce("__comp", F.col("id")).alias("component")
            )
        )
    src2, dst2 = "a", "b"
    try:
        return connected_components(nodes, e, id_col, src2, dst2, max_iter)
    except NonConvergenceError:
        return connected_components_star(
            nodes, e, id_col, src2, dst2, star_max_iter
        )


def connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components via alternating large-star/small-star — the
    O(log² n)-round formulation for graphs whose diameter makes plain
    min-label propagation (O(diameter) rounds) infeasible, e.g. long
    duplicate chains. Same contract as ``connected_components``:
    (id, component) with component = min reachable node id.

    Each round:
    - large-star: every node u points its LARGER neighbors at
      m = min(Γ(u) ∪ {u});
    - small-star: every node u (as the larger endpoint of its oriented
      edges) points its smaller neighbors — and itself — at the minimum
      of them.
    Both are one groupBy + one join over the edge set (shuffle keyed on
    node id); the edge set never grows beyond the input size, and at
    convergence every edge is (node, component-min). Converged when a
    full round leaves the canonical edge set unchanged (two exceptAll
    counts on localCheckpoint'd sets). Raises on non-convergence rather
    than returning partial labels.
    """
    e = (
        edges.select(
            F.greatest(F.col(src_col), F.col(dst_col)).alias("hi"),
            F.least(F.col(src_col), F.col(dst_col)).alias("lo"),
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    converged = e.isEmpty()
    for _ in range(max_iter):
        if converged:
            break
        # large-star: sym neighborhoods; larger neighbors -> group min
        sym = e.select(F.col("hi").alias("u"), F.col("lo").alias("v")).union(
            e.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        m = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        # materialize ls ONCE per round: it feeds mn AND joined, and
        # joined appears twice in the union — without this the round's
        # plan carries four copies of the large-star join subtree and
        # correctness of the cost rests on exchange reuse firing
        ls = (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .filter(F.col("hi") != F.col("lo"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # small-star: edges already oriented hi > lo; point all smaller
        # neighbors (and hi itself) at the per-hi minimum
        mn = ls.groupBy("hi").agg(F.min("lo").alias("m"))
        joined = ls.join(mn, "hi")
        new_e = (
            joined.select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
            .union(joined.select(F.col("hi"), F.col("m").alias("lo")))
            .filter(F.col("hi") != F.col("lo"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # both sides are DISTINCT checkpointed sets: equal counts plus
        # one empty difference proves set equality — one shuffle job
        # per round instead of two full exceptAlls
        converged = (
            new_e.count() == e.count() and new_e.exceptAll(e).isEmpty()
        )
        e = new_e
    if not converged:
        raise NonConvergenceError(
            f"connected_components_star did not converge in {max_iter} rounds"
        )
    roots = e.groupBy("hi").agg(F.min("lo").alias("component"))
    return (
        nodes.select(F.col(id_col).alias("id"))
        .join(roots.withColumnRenamed("hi", "id"), "id", "left")
        .select(
            "id", F.coalesce("component", F.col("id")).alias("component")
        )
    )
