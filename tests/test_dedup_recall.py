"""Dedup quality on planted near-duplicates: the fixture corpus has no
true near-dups, so these tests synthesize a corpus with known duplicate
pairs and measure recall/precision of each dedup family."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from vector_db_setup_spark.operators import dedup as dd

VOCAB = (
    "the quick brown fox jumps over lazy dog table scan merge sort hash "
    "join filter group window vector query batch stream spark row column"
).split()


@pytest.fixture(scope="module")
def planted(spark):
    """600 base docs (~40 tokens) + 100 near-dup copies (2 token edits)
    + 50 exact copies. Returns (df, near_pairs, exact_pairs, family_of):
    near/exact are the directly-planted (base, copy) pairs; family_of
    maps every doc to its base so derived pairs (two copies of one base)
    can be recognized as true duplicates too."""
    rng = random.Random(42)
    rows, near, exact = [], set(), set()
    family_of = {}
    for i in range(600):
        rows.append((i, " ".join(rng.choice(VOCAB) for _ in range(40))))
        family_of[i] = i
    nid = 1000
    for i in range(100):
        base_id = rng.randrange(600)
        toks = rows[base_id][1].split()
        for _ in range(2):
            toks[rng.randrange(len(toks))] = rng.choice(VOCAB)
        rows.append((nid, " ".join(toks)))
        near.add((base_id, nid))
        family_of[nid] = base_id
        nid += 1
    for i in range(50):
        base_id = rng.randrange(600)
        rows.append((nid, rows[base_id][1]))
        exact.add((base_id, nid))
        family_of[nid] = base_id
        nid += 1
    df = spark.createDataFrame(rows, "doc_id long, text string").cache()
    df.count()
    return df, near, exact, family_of


def _pairs(df, cols=("id_a", "id_b")):
    return {(r[cols[0]], r[cols[1]]) for r in df.collect()}


def test_minhash_lsh_recall_on_planted(spark, planted):
    df, near, exact, _family = planted
    cands = _pairs(dd.minhash_lsh_candidates(df))
    # exact copies share every band -> must ALL be candidates
    assert exact <= cands, f"missed {len(exact - cands)} exact dups"
    # 2-of-40-token edits => shingle jaccard ~0.85 => band (2 minhashes)
    # collision prob ~1-(1-j^2)^4 ~ 0.99; allow a small miss rate
    recall = len(near & cands) / len(near)
    assert recall >= 0.9, f"near-dup recall {recall}"


def test_jaccard_separates_planted_from_random(spark, planted):
    df, near, exact, family_of = planted
    scored = dd.ngram_jaccard_pairs(df)
    j = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in scored.filter(F.col("jaccard") >= 0.5).collect()
    }
    hits = set(j)
    assert exact <= hits
    recall = len(near & hits) / len(near)
    assert recall >= 0.95, f"jaccard>=0.5 recall {recall}"
    # precision: everything above 0.5 must belong to one duplicate
    # family (directly planted OR two copies of the same base)
    same_family = {
        (a, b) for (a, b) in hits if family_of[a] == family_of[b]
    }
    precision = len(same_family) / max(len(hits), 1)
    assert precision >= 0.95, f"precision {precision}"


def test_exact_fingerprint_dedup_on_planted(spark, planted):
    df, near, exact, _family = planted
    from vector_db_setup_spark.functions.text import doc_fingerprint

    fp = df.select("doc_id", doc_fingerprint("text").alias("f"))
    groups = dd.exact_dedup(fp, ["f"], "doc_id")
    n_dup_groups = groups.filter(F.col("group_size") >= 2).count()
    # every exact-copy pair collapses into a shared fingerprint group
    # (some planted bases may coincide; bound below by distinct bases)
    distinct_bases = len({a for a, _ in exact})
    assert n_dup_groups >= distinct_bases * 0.9


def test_simhash_hamming_separates(spark, planted):
    df, near, exact, _family = planted
    sim = dd.simhash(df)
    pairs = dd.simhash_banded_pairs(sim, max_hamming=6)
    found = _pairs(pairs)
    # exact copies have identical simhash (hamming 0) -> all found
    assert exact <= found, f"missed {len(exact - found)} exact dups"


def test_simhash_forms_identical(spark, planted):
    """flat (33-slot aggregate, scale path) and exploded (per-bit rows,
    plan-cheap path) must produce bit-identical signatures — they are
    the same vote algebra in two plan shapes, and queries pick per
    context (simhash_hamming_topk uses exploded; banded uses flat)."""
    df, _near, _exact, _family = planted
    a = sorted(tuple(r) for r in dd.simhash(df, form="flat").collect())
    b = sorted(tuple(r) for r in dd.simhash(df, form="exploded").collect())
    assert a == b


def test_hot_shingle_cap_kills_viral_shingle(spark):
    """Planted skew: every doc shares one viral 3-gram. Uncapped, the
    inverted-index join materializes a pair for every doc combination
    through that single shingle key (the 100 TB skew bomb); with
    max_df below the viral shingle's document frequency the pairs whose
    only overlap is the hot shingle disappear, and the surviving
    Jaccards match a brute force over the capped shingle universe."""
    rng = random.Random(7)
    hot = "click here now"
    rows = []
    for i in range(40):
        body = " ".join(rng.choice(VOCAB) for _ in range(12))
        rows.append((i, f"{hot} {body}"))
    # two real near-dups sharing most of their text
    rows.append((100, rows[0][1]))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = dd.ngram_jaccard_pairs(df)
    capped = dd.ngram_jaccard_pairs(df, max_df=10)
    n_unc, n_cap = uncapped.count(), capped.count()
    # uncapped: >= C(41,2) pairs purely via the hot shingle
    assert n_unc >= 40 * 41 // 2
    assert n_cap < n_unc

    # brute-force the capped universe in Python and compare exactly
    def shingles(text):
        t = text.lower().split()
        return {tuple(t[i : i + 3]) for i in range(len(t) - 2)}

    sets = {i: shingles(t) for i, t in rows}
    from collections import Counter

    df_count = Counter(s for ss in sets.values() for s in ss)
    sets = {
        i: {s for s in ss if df_count[s] <= 10} for i, ss in sets.items()
    }
    want = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            if inter:
                want[(a, b)] = (inter, inter / len(sets[a] | sets[b]))
    got = {
        (r["id_a"], r["id_b"]): (r["n_inter"], r["jaccard"])
        for r in capped.collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-9


def test_hot_band_planted_10k_identical_docs(spark):
    """VERDICT r2 #1: a 10k-copy boilerplate cluster (identical
    signatures → identical band keys in every band) must NOT produce
    ~10⁸ candidate rows. Exact-dedup-first edge generation
    (lsh_dedup_edges) admits one representative into the band join and
    attaches the other 9,999 copies by member edges — linear, not
    quadratic — while the closure still collapses every copy onto
    keeper 0."""
    from vector_db_setup_spark.operators.graph import connected_components_star

    rng = random.Random(3)
    boiler = " ".join(rng.choice(VOCAB) for _ in range(30))
    rows = [(i, boiler) for i in range(10_000)]
    for i in range(100):
        rows.append((20_000 + i, " ".join(rng.choice(VOCAB) for _ in range(30))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    edges = dd.lsh_dedup_edges(df)
    n = edges.count()
    assert n <= 9_999 + 600, f"edge blowup: {n} rows"
    cc = connected_components_star(
        df.select(F.col("doc_id").alias("id")),
        edges,
        id_col="id",
        src_col="id_a",
        dst_col="id_b",
    )
    comp = {r["id"]: r["component"] for r in cc.collect()}
    assert all(comp[i] == 0 for i in range(10_000))


def test_max_band_df_cap_drops_hot_band(spark):
    """The band-key document-frequency cap (max_band_df) must drop every
    pair whose only route is a hot band key, and leave all other pairs
    untouched."""
    rng = random.Random(5)
    boiler = " ".join(rng.choice(VOCAB) for _ in range(30))
    rows = [(i, boiler) for i in range(50)]
    rows += [
        (100 + i, " ".join(rng.choice(VOCAB) for _ in range(30)))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = _pairs(dd.minhash_lsh_candidates(df))
    capped = _pairs(dd.minhash_lsh_candidates(df, max_band_df=10))
    hot = {(a, b) for a in range(50) for b in range(a + 1, 50)}
    assert hot <= uncapped  # the planted cluster IS the m² blowup
    assert not (capped & hot)  # cap removes it entirely
    assert capped == uncapped - hot  # and nothing else


def test_lsh_dedup_edges_components_match_uncapped(spark, planted):
    """Representative routing is component-preserving: CC over
    lsh_dedup_edges equals CC over the plain uncapped candidate pairs —
    the invariant that keeps dedup_keepers oracle-green."""
    from vector_db_setup_spark.operators.graph import connected_components

    df, _near, _exact, _family = planted
    nodes = df.select(F.col("doc_id").alias("id"))

    def comps(edges):
        cc = connected_components(
            nodes, edges, id_col="id", src_col="id_a", dst_col="id_b"
        )
        return {r["id"]: r["component"] for r in cc.collect()}

    assert comps(dd.minhash_lsh_candidates(df)) == comps(
        dd.lsh_dedup_edges(df)
    )


def test_lsh_edges_from_banded_components_match(spark, planted):
    """Band-key-SET representative routing (r13: the dedup graph now
    derives from the memoized banded view instead of re-hashing text)
    is component-preserving: CC over lsh_edges_from_banded equals CC
    over the plain uncapped candidate pairs AND over the text-routed
    lsh_dedup_edges — the invariant that keeps dedup_keepers /
    leakage_safe_split / dedup_keepers_by_quality oracle-green."""
    from vector_db_setup_spark.operators.graph import connected_components

    df, _near, _exact, _family = planted
    nodes = df.select(F.col("doc_id").alias("id"))

    def comps(edges):
        cc = connected_components(
            nodes, edges, id_col="id", src_col="id_a", dst_col="id_b"
        )
        return {r["id"]: r["component"] for r in cc.collect()}

    banded_comps = comps(dd.lsh_edges_from_banded(dd.minhash_band_keys(df)))
    assert banded_comps == comps(dd.minhash_lsh_candidates(df))
    assert banded_comps == comps(dd.lsh_dedup_edges(df))


def test_lsh_edges_from_banded_shingleless_stay_isolated(spark):
    """Shingle-less docs have no banded rows, so the banded-derived
    edge form must leave them isolated — same semantics as
    lsh_dedup_edges (plain LSH + CC)."""
    rows = [
        (1, "hi there"),
        (2, "hi there"),
        (3, " ".join(VOCAB[:10])),
        (4, " ".join(VOCAB[:10])),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    edges = _pairs(dd.lsh_edges_from_banded(dd.minhash_band_keys(df)))
    assert (1, 2) not in edges  # shingle-less: no banded rows at all
    assert (3, 4) in edges  # exact dups: joined via member edge


def test_lsh_dedup_edges_shingleless_exact_dups_stay_isolated(spark):
    """Docs with < shingle_n tokens never enter banding; identical
    shingle-less docs must stay isolated (plain LSH semantics), not get
    joined by the exact-text member edges."""
    rows = [
        (1, "hi there"),
        (2, "hi there"),
        (3, " ".join(VOCAB[:10])),
        (4, " ".join(VOCAB[:10])),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    edges = _pairs(dd.lsh_dedup_edges(df))
    assert (1, 2) not in edges  # shingle-less: isolated
    assert (3, 4) in edges  # normal exact dups: joined via member edge


def test_connected_components_planted_chain(spark):
    from vector_db_setup_spark.operators.graph import connected_components

    # chain 0-1-2-3-4 (diameter 4 → needs >1 iteration), pair 10-11,
    # isolated 20
    nodes = spark.createDataFrame([(i,) for i in [0, 1, 2, 3, 4, 10, 11, 20]], "id long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    got = {r["id"]: r["component"] for r in connected_components(nodes, edges).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 10: 10, 11: 10, 20: 20}


def test_min_label_raises_on_nonconvergence(spark):
    import pytest

    from vector_db_setup_spark.operators.graph import connected_components

    # path of 12 nodes needs ~11 rounds; cap at 3 -> must raise, not
    # silently return partial labels
    nodes = spark.createDataFrame([(i,) for i in range(12)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, edges, max_iter=3)


def test_cc_edge_free_graph_converged_even_with_zero_iter(spark):
    """max_iter=0 on an edge-free (or self-loop-only) graph is already
    converged — identity labels, no spurious timeout raise (ADVICE r2)."""
    from vector_db_setup_spark.operators.graph import connected_components

    nodes = spark.createDataFrame([(i,) for i in [3, 7, 9]], "id long")
    no_edges = spark.createDataFrame([], "src long, dst long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(nodes, no_edges, max_iter=0).collect()
    }
    assert got == {3: 3, 7: 7, 9: 9}
    self_loops = spark.createDataFrame([(3, 3), (9, 9)], "src long, dst long")
    got2 = {
        r["id"]: r["component"]
        for r in connected_components(nodes, self_loops, max_iter=0).collect()
    }
    assert got2 == got


def test_cc_zero_iter_with_real_edges_raises(spark):
    import pytest

    from vector_db_setup_spark.operators.graph import connected_components

    nodes = spark.createDataFrame([(0,), (1,)], "id long")
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(RuntimeError, match="no iteration ran"):
        connected_components(nodes, edges, max_iter=0)


def test_star_cc_matches_min_label_on_random_graph(spark):
    from vector_db_setup_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(11)
    n = 200
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(120)]
    nodes_df = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges_df = spark.createDataFrame(edges, "src long, dst long")
    a = {r["id"]: r["component"] for r in connected_components(nodes_df, edges_df).collect()}
    b = {
        r["id"]: r["component"]
        for r in connected_components_star(nodes_df, edges_df).collect()
    }
    assert a == b


def test_star_cc_long_chain_converges_in_log_rounds(spark):
    """Planted pathological graph: a 10k-node path (diameter 10k). Plain
    min-label propagation needs ~10k rounds; large-star/small-star must
    close it within O(log² n) — max_iter=20 would fail otherwise."""
    from vector_db_setup_spark.operators.graph import connected_components_star

    n = 10_000
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    got = connected_components_star(nodes, edges, max_iter=20)
    comps = got.select("component").distinct().collect()
    assert [r["component"] for r in comps] == [0]
    assert got.count() == n


def test_cc_auto_unionfind_matches_distributed(spark):
    """connected_components_auto's size-guarded driver union-find kernel
    must label exactly like the distributed min-label loop — including
    isolated nodes (own id) and nodes only on the edge list's right
    side."""
    from vector_db_setup_spark.operators.graph import (
        connected_components,
        connected_components_auto,
    )

    rng = random.Random(17)
    n = 300
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    nodes_df = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges_df = spark.createDataFrame(edges, "src long, dst long")
    want = {
        r["id"]: r["component"]
        for r in connected_components(nodes_df, edges_df).collect()
    }
    got_uf = {
        r["id"]: r["component"]
        for r in connected_components_auto(nodes_df, edges_df).collect()
    }
    assert got_uf == want
    # guard at 0 forces the distributed path — same labels
    got_dist = {
        r["id"]: r["component"]
        for r in connected_components_auto(
            nodes_df, edges_df, max_driver_edges=0
        ).collect()
    }
    assert got_dist == want


def test_cc_auto_long_chain_star_fallback_through_pipeline(spark):
    """Above the driver guard, a long chain must still resolve via the
    automatic large-star/small-star retry (min-label alone would hit
    max_iter)."""
    from vector_db_setup_spark.operators.graph import connected_components_auto

    n = 2_000
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    got = connected_components_auto(
        nodes, edges, max_iter=5, max_driver_edges=0
    )
    comps = got.select("component").distinct().collect()
    assert [r["component"] for r in comps] == [0]
    assert got.count() == n


def test_cc_auto_empty_edges(spark):
    from vector_db_setup_spark.operators.graph import connected_components_auto

    nodes = spark.createDataFrame([(i,) for i in [2, 5]], "id long")
    edges = spark.createDataFrame([], "src long, dst long")
    got = {
        r["id"]: r["component"]
        for r in connected_components_auto(nodes, edges).collect()
    }
    assert got == {2: 2, 5: 5}


def test_simhash_hot_band_cap_drops_only_hot_pairs(spark):
    """SimHash band cap: a planted cluster of identical docs floods its
    band keys; max_band_df must drop exactly the pairs whose only route
    is a hot key and keep everything else (the minhash cap's law,
    mirrored on the simhash side)."""
    rng = random.Random(7)
    boiler = " ".join(rng.choice(VOCAB) for _ in range(30))
    rows = [(i, boiler) for i in range(60)]
    rows += [
        (100 + i, " ".join(rng.choice(VOCAB) for _ in range(30)))
        for i in range(25)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sim = dd.simhash(df)
    uncapped = _pairs(dd.simhash_banded_pairs(sim, max_hamming=3))
    capped = _pairs(
        dd.simhash_banded_pairs(sim, max_hamming=3, max_band_df=30)
    )
    hot = {(a, b) for a in range(60) for b in range(a + 1, 60)}
    assert hot <= uncapped  # identical docs: hamming 0, every band shared
    assert not (capped & hot)  # the m² cluster is gone
    assert capped <= uncapped  # the cap only ever removes pairs
    # pairs that share at least one NON-hot band key survive: in this
    # planting, that is every random↔random pair (their keys are held by
    # ≤ 25+60 docs only when they coincide with the boiler key — which
    # also makes them hot-only pairs, dropped by design)
    rand_rand = {p for p in uncapped if p[0] >= 100 and p[1] >= 100}
    kept_rand = {p for p in capped if p[0] >= 100 and p[1] >= 100}
    assert kept_rand == rand_rand


def test_winnowing_guarantee_shared_substring(spark):
    """Winnowing law: two docs sharing a substring of >= shingle_n +
    window - 1 = 6 tokens must share at least one fingerprint; docs
    with no 3-gram in common share none."""
    rng = random.Random(23)
    shared = " ".join(rng.choice(VOCAB) for _ in range(8))
    a = " ".join(rng.choice(VOCAB) for _ in range(20)) + " " + shared
    b = shared + " " + " ".join(rng.choice(VOCAB) for _ in range(20))
    c = " ".join(rng.choice(VOCAB) for _ in range(25))
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    fps = dd.winnowing_fingerprints(df)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared 8-token substring: no shared fp"
    # doc 3 is random 25 tokens — sharing a full 3-gram with a|b is
    # possible but vanishingly unlikely at |VOCAB| size; assert weaker:
    # its fingerprints are not a subset of a's
    assert not by_doc[3] <= by_doc[1]


def test_winnowing_single_shuffle_plan(spark):
    """The token window, rolling min, validity rank and distinct must
    all reuse ONE doc_id hash partitioning."""
    import re

    df = spark.createDataFrame(
        [(1, " ".join(VOCAB[:30]))], "doc_id long, text string"
    )
    plan = (
        dd.winnowing_fingerprints(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_winnowing_short_docs_still_fingerprinted(spark):
    """Docs with shingles but fewer than `window` of them must emit the
    min of the available hashes (one fingerprint), so exact duplicates
    of short docs are still detectable."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "one two")],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: r["fp"] for r in dd.winnowing_fingerprints(df).collect()}
    assert fps.get(1) is not None and fps[1] == fps[2]
    assert 3 not in fps  # < shingle_n tokens: no shingles at all


def test_multiband_cosine_is_superset_and_lifts_recall(spark):
    """cosine_pairs_multiband OR-amplifies single-probe bucketing: its
    candidate set must contain every single-band pair (band 0 is one of
    its bands), and on a planted near-dup fixture whose pairs straddle
    band-0 bucket boundaries the extra bands must recover pairs band 0
    alone misses."""
    import numpy as np

    from vector_db_setup_spark.operators.ann import random_hyperplanes
    from vector_db_setup_spark.operators.similarity import (
        cosine_pairs_bucketed,
        cosine_pairs_multiband,
    )

    rng = np.random.default_rng(3)
    dim = 16
    base = rng.standard_normal((60, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # planted near-dups: tiny perturbations -> cosine ~0.99
    dup = base + 0.08 * rng.standard_normal((60, dim))
    dup /= np.linalg.norm(dup, axis=1, keepdims=True)
    rows = [(i, base[i].tolist()) for i in range(60)] + [
        (100 + i, dup[i].tolist()) for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    planted = {(i, 100 + i) for i in range(60)}

    bands = [random_hyperplanes(dim, 5, seed=s) for s in (21, 22, 23, 24)]
    single = {
        (r["id_a"], r["id_b"])
        for r in cosine_pairs_bucketed(
            emb, bands[0], min_cosine=0.9
        ).collect()
    }
    multi = {
        (r["id_a"], r["id_b"])
        for r in cosine_pairs_multiband(
            emb, bands, min_cosine=0.9
        ).collect()
    }
    assert single <= multi  # OR over bands can only add candidates
    rec1 = len(single & planted) / len(planted)
    rec4 = len(multi & planted) / len(planted)
    assert rec4 > rec1, (rec1, rec4)  # 5-plane single band must miss some
    assert rec4 >= 0.9, rec4  # 1-(1-p)^4 at cos~0.99 is near-total
    # dedup: each pair exactly once despite multi-band re-finds
    from collections import Counter

    pairs = [
        (r["id_a"], r["id_b"])
        for r in cosine_pairs_multiband(emb, bands, min_cosine=0.9).collect()
    ]
    dupes = [p for p, c in Counter(pairs).items() if c > 1]
    assert not dupes, dupes


def test_leakage_safe_split_no_edge_straddles(spark):
    """The split's whole point: no near-dup edge may cross train/eval.
    Recompute the LSH edges and the per-doc assignment at sf0.01 and
    assert every edge's endpoints share a split (and a cluster)."""
    from tests.conftest import SF_ORACLE
    from vector_db_setup_spark.operators.graph import (
        connected_components_auto,
    )
    from vector_db_setup_spark.sources.registry import load_table

    d = load_table(spark, SF_ORACLE, "documents")
    edges = dd.lsh_dedup_edges(d).persist()
    cc = connected_components_auto(
        d.select("doc_id"), edges, id_col="doc_id",
        src_col="id_a", dst_col="id_b",
    )
    h4 = F.conv(
        F.substring(
            F.md5(F.concat(F.col("component").cast("string"),
                           F.lit("-split"))), 1, 4),
        16, 10,
    ).cast("long")
    assigned = cc.select(
        F.col("id").alias("doc_id"),
        F.when(h4 % 10 < 8, F.lit("train")).otherwise(F.lit("eval"))
        .alias("split"),
    )
    a = assigned.withColumnRenamed("doc_id", "id_a").withColumnRenamed(
        "split", "split_a"
    )
    b = assigned.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
        "split", "split_b"
    )
    straddle = (
        edges.join(a, "id_a").join(b, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .count()
    )
    edges.unpersist()
    assert straddle == 0
    # and both splits are actually populated at this sf
    splits = {r["split"] for r in assigned.select("split").distinct().collect()}
    assert splits == {"train", "eval"}


def test_shingle_hashes_equals_shared_scan_lineage(spark):
    """The standalone shingle_hashes and the shared-scan
    token_stream+shingle_stream path duplicate the 20-bit pack
    expressions BY DESIGN (shared-scan pipelines rely on the filtered
    equivalence); this locks the two copies together so an edit to one
    breaks loudly."""
    from tests.conftest import SF_SMOKE
    from vector_db_setup_spark.sources.registry import load_table

    d = load_table(spark, SF_SMOKE, "documents").limit(40)
    a = {
        (r["doc_id"], r["s"])
        for r in dd.shingle_hashes(d, shingle_n=3).collect()
    }
    ts = dd.shingle_stream(dd.token_stream(d), ns=(3,))
    b = {
        (r["doc_id"], r["s3"])
        for r in ts.filter(F.col("s3").isNotNull()).collect()
    }
    assert a == b and len(a) > 0


def test_shingle_and_band_parameter_guards(spark):
    """Misconfigurations must raise, not silently produce zero or
    wrapped results: shingle_n > 3 overflows the 60-bit packing;
    bands not dividing num_hashes empties or skews the banding."""
    import pytest as _pytest

    from tests.conftest import SF_SMOKE
    from vector_db_setup_spark.sources.registry import load_table

    d = load_table(spark, SF_SMOKE, "documents").limit(5)
    with _pytest.raises(ValueError, match="shingle_n"):
        dd.shingle_hashes(d, shingle_n=4)
    sigs = dd.minhash_signature_array(d)
    with _pytest.raises(ValueError, match="bands"):
        dd.band_keys_from_sigs(sigs, bands=16, num_hashes=8)
    with _pytest.raises(ValueError, match="bands"):
        dd.band_keys_from_sigs(sigs, bands=3, num_hashes=8)


def test_cc_loop_runs_one_job_per_iteration(spark):
    """r14 optimization: the min-label loop's convergence signal rides
    the label job (chg flag + lazy localCheckpoint, summed in the same
    action) instead of a second join-and-count job per iteration. One
    ACTION still spawns several Spark jobs under AQE (each broadcast
    exchange build + each runtime re-optimization is its own job), so
    the budget is pinned in jobs: the chain 0-1-2-3-4 needs 4 label
    rounds + 1 confirming round and measured 45 jobs in this form vs
    65 for the two-actions-per-iteration shape it replaced."""
    from vector_db_setup_spark.operators.graph import connected_components

    nodes = spark.createDataFrame(
        [(i,) for i in [0, 1, 2, 3, 4]], "id long"
    )
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    sc = spark.sparkContext
    sc.setJobGroup("cc-job-budget", "cc loop job count")
    try:
        got = {
            r["id"]: r["component"]
            for r in connected_components(nodes, edges).collect()
        }
    finally:
        sc.setJobGroup(None, None)
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0}
    jobs = sc.statusTracker().getJobIdsForGroup("cc-job-budget")
    # measured: 45 with the fused convergence count, 65 with the old
    # separate count-join; 50 is the regression tripwire between them
    assert len(jobs) <= 50, f"{len(jobs)} jobs for a diameter-4 chain"
