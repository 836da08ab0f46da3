"""Round-10: MERGE as a first-class citizen of the maintenance loop.

- ``change_encoding="pair"``: a merge's overwritten keys surface as
  removed(pre-image) + added(post-image), fast == full-diff oracle.
- fast merge attribution REFUSES (falls back to the full diff) when the
  merge key differs from the CDC key — the mismatched-key shape that
  silently lost 'removed' events (ADVICE r9 #1).
- both commit-log maintainers consume merge commits O(batch): the agg
  maintainer subtracts pre / adds post; the IVF maintainer re-assigns
  the rewritten keys through ONE merge_into_ivf_index commit — with the
  no-bare-source-scan spy discipline of test_cdc_carry extended to
  merge drains, and maintained state pinned equal to a rebuild.
- merge_snapshot's visible-rows bookkeeping reads the head PRUNED to
  the batch's key range (VERDICT r9 "What's wrong #1"), as does
  delete_from_snapshot's.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_setup_spark.sources.snapshot_table import (
    DisallowedOpError,
    TombstonedKeyError,
    append_snapshot,
    compact_snapshot,
    delete_from_snapshot,
    merge_snapshot,
    read_snapshot,
    snapshot_changes,
    snapshot_info,
    write_snapshot,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, payload string")


def _feed(spark, base, **kw):
    return {
        tuple(r)
        for r in snapshot_changes(
            spark, base, "id", from_version=1, **kw
        ).collect()
    }


def test_pair_encoding_fast_equals_full_over_merge_chain(spark, tmp_path):
    base = str(tmp_path / "t")
    write_snapshot(_df(spark, [(i, f"v{i}") for i in range(10)]), base)  # v1
    # v2: merge rewrites 3,4 and inserts 10,11
    merge_snapshot(
        _df(spark, [(3, "m3"), (4, "m4"), (10, "m10"), (11, "m11")]),
        base,
        key_col="id",
    )
    append_snapshot(_df(spark, [(20, "a20")]), base)                    # v3
    delete_from_snapshot(
        spark.createDataFrame([(4,)], "id long"), base, key_col="id"
    )                                                                   # v4
    # v5: merge re-lands 3 with IDENTICAL content (must stay silent)
    # and rewrites 5
    merge_snapshot(_df(spark, [(3, "m3"), (5, "m5")]), base, key_col="id")
    for enc in ("changed", "pair"):
        fast = _feed(
            spark, base, carry_columns=["payload"], fast=True,
            change_encoding=enc,
        )
        slow = _feed(
            spark, base, carry_columns=["payload"], fast=False,
            change_encoding=enc,
        )
        assert fast == slow, f"encoding {enc}: fast != full oracle"
    pair = _feed(
        spark, base, carry_columns=["payload"], fast=True,
        change_encoding="pair",
    )
    # overwritten keys: pre-image removed + post-image added, same version
    assert {(3, "v3", "removed", 2), (3, "m3", "added", 2)} <= pair
    assert {(4, "v4", "removed", 2), (4, "m4", "added", 2)} <= pair
    assert {(5, "v5", "removed", 5), (5, "m5", "added", 5)} <= pair
    # inserted keys: plain added; deleted keys: pre-image removed
    assert {(10, "m10", "added", 2), (11, "m11", "added", 2)} <= pair
    assert (4, "m4", "removed", 4) in pair
    # the identical re-land of 3 at v5 contributed NOTHING
    assert not any(r[0] == 3 and r[3] == 5 for r in pair)
    # 'changed' never appears under pair encoding
    assert not any(r[2] == "changed" for r in pair)


def test_merge_fast_falls_back_on_mismatched_cdc_key(spark, tmp_path):
    """ADVICE r9 #1: merge on 'id' rewrites the 'doc' column a feed is
    keyed on — the displaced old doc value must surface as 'removed',
    which only the full diff can attribute; fast must equal it."""
    base = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "id long, doc string"
    )
    write_snapshot(df, base)                                            # v1
    merge_snapshot(
        spark.createDataFrame([(2, "BETA2")], "id long, doc string"),
        base,
        key_col="id",
    )                                                                   # v2
    for enc in ("changed", "pair"):
        fast = {
            tuple(r)
            for r in snapshot_changes(
                spark, base, "doc", from_version=1, fast=True,
                change_encoding=enc,
            ).collect()
        }
        slow = {
            tuple(r)
            for r in snapshot_changes(
                spark, base, "doc", from_version=1, fast=False,
                change_encoding=enc,
            ).collect()
        }
        assert fast == slow
        assert ("beta", "removed", 2) in fast, (
            "displaced CDC key lost its removed event"
        )
        assert ("BETA2", "added", 2) in fast


def test_disallowed_op_is_typed(spark, tmp_path):
    base = str(tmp_path / "t")
    write_snapshot(_df(spark, [(1, "a")]), base)
    merge_snapshot(_df(spark, [(1, "b")]), base, key_col="id")
    with pytest.raises(DisallowedOpError):
        snapshot_changes(
            spark, base, "id", from_version=1,
            allowed_ops=("append", "delete", "compact"),
        )
    # merge in the allowlist passes
    assert (
        snapshot_changes(
            spark, base, "id", from_version=1, columns=[],
            allowed_ops=("append", "delete", "compact", "merge"),
        ).count()
        == 0  # overwrite: presence unchanged, key-presence feed empty
    )


def _spy_on(monkeypatch, st_mod, src):
    real = st_mod.read_snapshot
    bare: list = []

    def spy(spark_, base_, version=None, fs=None, key_between=None,
            key_in=None, tag=None):
        if base_ == src and key_between is None and key_in is None:
            import inspect

            caller = inspect.stack()[1].function
            if caller != "_snapshot_columns":
                bare.append((version, caller))
        return real(
            spark_, base_, version=version, fs=fs,
            key_between=key_between, key_in=key_in, tag=tag,
        )

    monkeypatch.setattr(st_mod, "read_snapshot", spy)
    return bare, real


def test_agg_maintainer_consumes_merges_obatch(spark, tmp_path, monkeypatch):
    """maintained == rebuilt over a merge-bearing chain WITHOUT
    on_rewrite='rebuild', and the drain never bare-scans the source."""
    import vector_db_setup_spark.sources.snapshot_table as st_mod
    from vector_db_setup_spark.streaming.commit_log import (
        maintain_agg_from_commits,
    )

    src = str(tmp_path / "src")
    state = str(tmp_path / "agg")

    def _docs(lo, hi, lang_mod=3):
        return spark.range(lo, hi).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % lang_mod).cast("string").alias("lang"),
            (F.col("id") * 7 % 11).alias("n_tokens"),
        )

    write_snapshot(
        _docs(0, 300), src,
        stats_cols=["doc_id"], cluster_by=["doc_id"], cluster_files=4,
    )
    maintain_agg_from_commits(
        spark, src, state, str(tmp_path / "ck"),
        group_col="lang", key_col="doc_id", sum_col="n_tokens",
    )
    bare, real = _spy_on(monkeypatch, st_mod, src)
    # merge: rewrite 50 docs into a new language + token counts, and
    # insert 20 new ones
    upd = spark.range(0, 50).union(spark.range(300, 320)).select(
        F.col("id").alias("doc_id"),
        F.lit("zz").alias("lang"),
        (F.col("id") % 5 + 100).alias("n_tokens"),
    )
    merge_snapshot(upd, src, key_col="doc_id")
    append_snapshot(_docs(320, 360), src, stats_cols=["doc_id"])
    delete_from_snapshot(
        spark.range(100, 110).select(F.col("id").alias("doc_id")),
        src, key_col="doc_id",
    )
    maintain_agg_from_commits(
        spark, src, state, str(tmp_path / "ck"),
        group_col="lang", key_col="doc_id", sum_col="n_tokens",
    )
    assert bare == [], f"merge drain bare-scanned the source: {bare}"
    monkeypatch.setattr(st_mod, "read_snapshot", real)
    maintained = {
        (r["lang"], r["cnt"], r["total"])
        for r in read_snapshot(spark, state).collect()
    }
    rebuilt = {
        (r["lang"], r["cnt"], r["total"])
        for r in read_snapshot(spark, src)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("n_tokens").alias("total"),
        )
        .collect()
    }
    assert maintained == rebuilt


def _emb(spark, lo, hi, salt=0):
    return spark.range(lo, hi).select(
        F.col("id").alias("vec_id"),
        F.array(
            ((F.col("id") + salt) % 7).cast("float"),
            ((F.col("id") + salt) % 5).cast("float"),
            ((F.col("id") + salt) % 3).cast("float"),
        ).alias("embedding"),
    )


def test_ivf_maintainer_consumes_merges_obatch(spark, tmp_path, monkeypatch):
    """A source merge drains into the index as delete/merge/append
    commits — no on_rewrite rebuild, no bare source scan — and the
    index's visible content equals a from-scratch assignment of the
    source head (same centroids, so same routing)."""
    import vector_db_setup_spark.sources.snapshot_table as st_mod
    from vector_db_setup_spark.operators.ann import ivf_assign
    from vector_db_setup_spark.operators.ann_index import search_ivf_index
    from vector_db_setup_spark.streaming.commit_log import (
        maintain_ivf_from_commits,
    )

    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    write_snapshot(
        _emb(spark, 0, 200), src,
        stats_cols=["vec_id"], cluster_by=["vec_id"], cluster_files=4,
    )
    maintain_ivf_from_commits(
        spark, src, idx, str(tmp_path / "ck"),
        key_col="vec_id", k=4, seed=7,
    )
    bare, real = _spy_on(monkeypatch, st_mod, src)
    # merge: rewrite 30 embeddings (salt shifts every component) and
    # insert 10 new keys; then a plain append and a delete
    merge_snapshot(
        _emb(spark, 0, 30, salt=2).union(_emb(spark, 200, 210, salt=2)),
        src, key_col="vec_id",
    )
    append_snapshot(_emb(spark, 210, 240), src, stats_cols=["vec_id"])
    delete_from_snapshot(
        spark.range(100, 105).select(F.col("id").alias("vec_id")),
        src, key_col="vec_id",
    )
    maintain_ivf_from_commits(
        spark, src, idx, str(tmp_path / "ck"),
        key_col="vec_id", k=4, seed=7,
    )
    assert bare == [], f"IVF merge drain bare-scanned the source: {bare}"
    monkeypatch.setattr(st_mod, "read_snapshot", real)
    # index content == re-assignment of the source head with the same
    # centroids (stale images really retired, new images really in)
    import numpy as np

    meta = snapshot_info(
        spark, idx,
        max(st_mod.committed_versions(spark, idx)),
    )["meta"]
    cents = np.asarray(meta["centroids"], dtype=np.float64)
    got = {
        (r["vec_id"], tuple(r["embedding"]), r["cluster_id"])
        for r in read_snapshot(spark, idx).collect()
    }
    want = {
        (r["vec_id"], tuple(r["embedding"]), r["cluster_id"])
        for r in ivf_assign(
            read_snapshot(spark, src), cents, vec_col="embedding"
        ).collect()
    }
    assert got == want
    # cursor stamped by the last commit; replay drain is a no-op
    assert int(meta["source_appended_through"]) == 4
    assert int(meta["source_deleted_through"]) == 4
    n_before = len(st_mod.committed_versions(spark, idx))
    maintain_ivf_from_commits(
        spark, src, idx, str(tmp_path / "ck2"),
        key_col="vec_id", k=4, seed=7,
    )
    assert len(st_mod.committed_versions(spark, idx)) == n_before
    # every surviving key searchable at full probe width
    hits = search_ivf_index(spark, idx, [5.0, 3.0, 1.0], topk=500, nprobe=4)
    assert hits.count() == 235  # 200 - 5 deleted + 10 inserted + 30 appended


def test_ivf_maintainer_self_heals_resurrected_key(spark, tmp_path):
    """A key deleted in one drain and re-landed (post source-compact)
    in a later one sits under the index's unscoped tombstone: the
    merge/append commit raises TombstonedKeyError and the maintainer
    compacts the index and retries — the key ends up searchable."""
    import vector_db_setup_spark.sources.snapshot_table as st_mod
    from vector_db_setup_spark.streaming.commit_log import (
        maintain_ivf_from_commits,
    )

    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    write_snapshot(_emb(spark, 0, 100), src)
    maintain_ivf_from_commits(
        spark, src, idx, str(tmp_path / "ck"),
        key_col="vec_id", k=4, seed=7,
    )
    delete_from_snapshot(
        spark.range(0, 3).select(F.col("id").alias("vec_id")),
        src, key_col="vec_id",
    )
    maintain_ivf_from_commits(
        spark, src, idx, str(tmp_path / "ck"),
        key_col="vec_id", k=4, seed=7,
    )
    # source compacts (clears ITS tombstones), then re-inserts 0..3
    compact_snapshot(spark, src)
    merge_snapshot(_emb(spark, 0, 3, salt=1), src, key_col="vec_id")
    maintain_ivf_from_commits(
        spark, src, idx, str(tmp_path / "ck"),
        key_col="vec_id", k=4, seed=7,
    )
    vis = {
        r["vec_id"] for r in read_snapshot(spark, idx).collect()
    }
    assert vis == set(range(100))  # 0..2 resurrected, nothing duplicated
    assert read_snapshot(spark, idx).count() == 100


def test_merge_and_delete_bookkeeping_reads_are_pruned(
    spark, tmp_path, monkeypatch
):
    """VERDICT r9 'What's wrong #1': every read_snapshot the merge and
    delete commit paths issue against the table carries key_between —
    the visible-rows bookkeeping no longer scans the corpus — and the
    marker row counts stay exact."""
    import vector_db_setup_spark.sources.snapshot_table as st_mod

    base = str(tmp_path / "t")
    write_snapshot(
        spark.range(0, 1000).select(
            "id", F.md5(F.col("id").cast("string")).alias("payload")
        ),
        base,
        stats_cols=["id"], cluster_by=["id"], cluster_files=8,
    )
    real = st_mod.read_snapshot
    unpruned: list = []

    def spy(spark_, base_, version=None, fs=None, key_between=None,
            key_in=None, tag=None):
        if base_ == base and key_between is None and key_in is None:
            import inspect

            caller = inspect.stack()[1].function
            if caller != "_snapshot_columns":
                unpruned.append(caller)
        return real(
            spark_, base_, version=version, fs=fs,
            key_between=key_between, key_in=key_in, tag=tag,
        )

    monkeypatch.setattr(st_mod, "read_snapshot", spy)
    v2 = merge_snapshot(
        spark.createDataFrame(
            [(3, "m3"), (4, "m4"), (2000, "new")], "id long, payload string"
        ),
        base,
        key_col="id",
    )
    v3 = delete_from_snapshot(
        spark.range(10, 15).select("id"), base, key_col="id"
    )
    monkeypatch.setattr(st_mod, "read_snapshot", real)
    assert unpruned == [], f"commit bookkeeping bare-scanned: {unpruned}"
    assert snapshot_info(spark, base, v2)["rows"] == 1001  # +1 insert
    assert snapshot_info(spark, base, v3)["rows"] == 996   # -5 deleted
    assert read_snapshot(spark, base).count() == 996


def test_tombstoned_key_error_is_typed(spark, tmp_path):
    base = str(tmp_path / "t")
    write_snapshot(_df(spark, [(1, "a"), (2, "b")]), base)
    delete_from_snapshot(
        spark.createDataFrame([(1,)], "id long"), base, key_col="id"
    )
    with pytest.raises(TombstonedKeyError):
        append_snapshot(_df(spark, [(1, "back")]), base)
    with pytest.raises(TombstonedKeyError):
        merge_snapshot(_df(spark, [(1, "back")]), base, key_col="id")


def test_ivf_maintainer_crash_between_commits_replays_exactly(
    spark, tmp_path, monkeypatch
):
    """The 3-commit drain (delete -> merge -> append) stamps cursors
    only in its LAST commit: a crash after the delete commit replays
    the whole classification on the next drain — the re-applied delete
    is effect-idempotent, the merge/append land once, and the index
    ends equal to a from-scratch assignment of the source head."""
    import vector_db_setup_spark.sources.snapshot_table as st_mod
    import vector_db_setup_spark.streaming.commit_log as cl
    from vector_db_setup_spark.operators.ann import ivf_assign

    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    write_snapshot(_emb(spark, 0, 120), src)
    cl.maintain_ivf_from_commits(
        spark, src, idx, str(tmp_path / "ck"),
        key_col="vec_id", k=3, seed=7,
    )
    # one batch with all three shapes
    merge_snapshot(_emb(spark, 0, 10, salt=3), src, key_col="vec_id")
    append_snapshot(_emb(spark, 120, 140), src)
    delete_from_snapshot(
        spark.range(50, 60).select(F.col("id").alias("vec_id")),
        src, key_col="vec_id",
    )
    # crash INSIDE the drain: the merge commit dies after the delete
    # commit already landed
    from vector_db_setup_spark.operators import ann_index as ai

    real_merge = ai.merge_into_ivf_index
    calls = {"n": 0}

    def dying_merge(*a, **kw):
        calls["n"] += 1
        raise RuntimeError("simulated crash before the merge commit")

    monkeypatch.setattr(ai, "merge_into_ivf_index", dying_merge)
    # the crash surfaces wrapped by the streaming machinery
    # (StreamingQueryException around the foreachBatch error)
    with pytest.raises(Exception, match="simulated crash"):
        cl.maintain_ivf_from_commits(
            spark, src, idx, str(tmp_path / "ck2"),
            key_col="vec_id", k=3, seed=7,
        )
    assert calls["n"] == 1
    # the delete commit landed WITHOUT advancing the cursors
    meta = snapshot_info(
        spark, idx, max(st_mod.committed_versions(spark, idx))
    )["meta"]
    assert int(meta["source_appended_through"]) == 1
    assert int(meta["source_deleted_through"]) == 1
    monkeypatch.setattr(ai, "merge_into_ivf_index", real_merge)
    # replay drains the SAME range from the old cursor and completes
    cl.maintain_ivf_from_commits(
        spark, src, idx, str(tmp_path / "ck3"),
        key_col="vec_id", k=3, seed=7,
    )
    import numpy as np

    meta = snapshot_info(
        spark, idx, max(st_mod.committed_versions(spark, idx))
    )["meta"]
    assert int(meta["source_appended_through"]) == 4
    cents = np.asarray(meta["centroids"], dtype=np.float64)
    got = {
        (r["vec_id"], tuple(r["embedding"]), r["cluster_id"])
        for r in read_snapshot(spark, idx).collect()
    }
    want = {
        (r["vec_id"], tuple(r["embedding"]), r["cluster_id"])
        for r in ivf_assign(
            read_snapshot(spark, src), cents, vec_col="embedding"
        ).collect()
    }
    assert got == want  # no lost merge, no duplicated append


def test_key_between_composes_multi_column_pruning(spark, tmp_path):
    """VERDICT r9 Missing #4: a Z-ordered table collects stats on BOTH
    keys, and a 2-D range probe passed as a LIST of (col, lo, hi)
    triples must prune on both — fewer files than either single-column
    probe — while returning exactly the filtered rows."""
    from vector_db_setup_spark.sources.snapshot_table import (
        write_snapshot_zordered,
    )

    base = str(tmp_path / "z")
    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    write_snapshot_zordered(df, base, "x", "y", n_files=16)
    full = read_snapshot(spark, base)
    box = read_snapshot(
        spark, base, key_between=[("x", 5, 12), ("y", 40, 47)]
    )
    oracle = {
        (r["x"], r["y"], r["payload"])
        for r in full.collect()
        if 5 <= r["x"] <= 12 and 40 <= r["y"] <= 47
    }
    got = {(r["x"], r["y"], r["payload"]) for r in box.collect()}
    assert got == oracle and len(got) == 64
    n_full = len(full.inputFiles())
    n_box = len(box.inputFiles())
    n_x = len(
        read_snapshot(spark, base, key_between=("x", 5, 12)).inputFiles()
    )
    n_y = len(
        read_snapshot(spark, base, key_between=[("y", 40, 47)]).inputFiles()
    )
    assert n_box < n_full
    assert n_box <= min(n_x, n_y), (
        f"2-D probe must prune at least as hard as either 1-D: "
        f"box={n_box} x={n_x} y={n_y} full={n_full}"
    )
    # single-triple tuple form unchanged (back-compat)
    one = read_snapshot(spark, base, key_between=("x", 5, 12))
    assert one.count() == 8 * 64


def test_bloom_maintainer_ingests_merge_inserts(spark, tmp_path):
    """The decontamination filter is key-presence: a merge's INSERTED
    keys must enter the filter on the next drain (overwritten keys are
    already set — no change needed, and Bloom has no delete)."""
    from vector_db_setup_spark.operators.bloom import bloom_probe
    from vector_db_setup_spark.streaming.commit_log import (
        maintain_bloom_from_commits,
    )

    src = str(tmp_path / "src")
    state = str(tmp_path / "bloom")
    write_snapshot(_df(spark, [(i, f"v{i}") for i in range(100)]), src)
    maintain_bloom_from_commits(
        spark, src, "id", state, str(tmp_path / "ck"),
        num_bits=1 << 16, k=3,
    )
    merge_snapshot(
        _df(spark, [(5, "m5"), (500, "new500"), (501, "new501")]),
        src, key_col="id",
    )
    maintain_bloom_from_commits(
        spark, src, "id", state, str(tmp_path / "ck"),
        num_bits=1 << 16, k=3,
    )
    words = read_snapshot(spark, state)
    probes = spark.createDataFrame(
        [(5,), (500,), (501,)], "id long"
    )
    hits = bloom_probe(probes, "id", words, num_bits=1 << 16, k=3)
    assert all(r["maybe_member"] for r in hits.collect())


def _corpus(spark, lo, hi, rev=""):
    # deterministic texts with REAL near-dup structure: docs i and
    # i+1000 share a long common prefix (same shingles -> same bands)
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma delta epsilon zeta token "),
            (F.col("id") % 40).cast("string"),
            F.lit(f" tail {rev}"),
        ).alias("text"),
    )


def test_lsh_index_maintainer_tracks_source(spark, tmp_path, monkeypatch):
    """The maintained LSH inverted index equals a from-scratch banding
    of the source head through append+merge+delete drains — and the
    candidate pairs from the index equal minhash_lsh_candidates on the
    head. The drain never bare-scans the source (signatures are
    computed from the feed's carried text)."""
    import vector_db_setup_spark.sources.snapshot_table as st_mod
    from vector_db_setup_spark.operators.dedup import (
        lsh_pairs_from_index,
        minhash_band_keys,
        minhash_lsh_candidates,
    )
    from vector_db_setup_spark.streaming.commit_log import (
        maintain_lsh_index_from_commits,
    )

    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    write_snapshot(
        _corpus(spark, 0, 200), src,
        stats_cols=["doc_id"], cluster_by=["doc_id"], cluster_files=4,
    )
    kw = dict(
        text_col="text", key_col="doc_id",
        bands=4, num_hashes=8, shingle_n=3,
    )
    maintain_lsh_index_from_commits(
        spark, src, idx, str(tmp_path / "ck"), **kw
    )
    bare, real = _spy_on(monkeypatch, st_mod, src)
    # merge: rewrite 30 docs' text, insert 20 with shared structure
    merge_snapshot(
        _corpus(spark, 0, 30, rev="v2").unionByName(
            _corpus(spark, 1000, 1020)
        ),
        src, key_col="doc_id",
    )
    append_snapshot(
        _corpus(spark, 1020, 1060), src, stats_cols=["doc_id"]
    )
    delete_from_snapshot(
        spark.range(100, 110).select(F.col("id").alias("doc_id")),
        src, key_col="doc_id",
    )
    maintain_lsh_index_from_commits(
        spark, src, idx, str(tmp_path / "ck"), **kw
    )
    assert bare == [], f"LSH drain bare-scanned the source: {bare}"
    monkeypatch.setattr(st_mod, "read_snapshot", real)
    # index == from-scratch banding of the head (live, non-inert rows)
    got = {
        (r["doc_id"], r["band"], r["band_key"])
        for r in read_snapshot(spark, idx)
        .filter(F.col("band_key") != "")
        .collect()
    }
    want = {
        (r["doc_id"], r["band"], r["band_key"])
        for r in minhash_band_keys(
            read_snapshot(spark, src), "text", "doc_id",
            bands=4, num_hashes=8, shingle_n=3,
        ).collect()
    }
    assert got == want
    # pairs from the maintained index == the batch operator on the head
    pairs_got = {
        (r["id_a"], r["id_b"])
        for r in lsh_pairs_from_index(read_snapshot(spark, idx)).collect()
    }
    pairs_want = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            read_snapshot(spark, src), "text", "doc_id",
            bands=4, num_hashes=8, shingle_n=3,
        ).collect()
    }
    assert pairs_got == pairs_want and pairs_got
    # replay drain is a no-op; geometry drift refuses
    n_before = len(st_mod.committed_versions(spark, idx))
    maintain_lsh_index_from_commits(
        spark, src, idx, str(tmp_path / "ck2"), **kw
    )
    assert len(st_mod.committed_versions(spark, idx)) == n_before
    # (the refusal surfaces wrapped by the streaming machinery)
    with pytest.raises(Exception, match="geometry"):
        maintain_lsh_index_from_commits(
            spark, src, idx, str(tmp_path / "ck3"),
            text_col="text", key_col="doc_id",
            bands=2, num_hashes=8, shingle_n=3,
        )


def test_lsh_index_maintainer_self_heals_resurrection(spark, tmp_path):
    """delete doc -> drain -> source compacts and re-lands the doc ->
    drain: the merge hits the index's unscoped rk tombstone and the
    maintainer compacts (meta-preserving) and retries."""
    import vector_db_setup_spark.sources.snapshot_table as st_mod
    from vector_db_setup_spark.streaming.commit_log import (
        maintain_lsh_index_from_commits,
    )

    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    write_snapshot(_corpus(spark, 0, 50), src)
    kw = dict(
        text_col="text", key_col="doc_id",
        bands=4, num_hashes=8, shingle_n=3,
    )
    maintain_lsh_index_from_commits(
        spark, src, idx, str(tmp_path / "ck"), **kw
    )
    delete_from_snapshot(
        spark.range(0, 3).select(F.col("id").alias("doc_id")),
        src, key_col="doc_id",
    )
    maintain_lsh_index_from_commits(
        spark, src, idx, str(tmp_path / "ck"), **kw
    )
    compact_snapshot(spark, src)
    merge_snapshot(_corpus(spark, 0, 3, rev="back"), src, key_col="doc_id")
    maintain_lsh_index_from_commits(
        spark, src, idx, str(tmp_path / "ck"), **kw
    )
    live = read_snapshot(spark, idx)
    assert live.count() == 50 * 4  # exactly bands rows per live doc
    assert {r["doc_id"] for r in live.collect()} == set(range(50))
    meta = snapshot_info(
        spark, idx, max(st_mod.committed_versions(spark, idx))
    )["meta"]
    assert meta["kind"] == "lsh_index"  # survived the healing compact
    assert int(meta["through_version"]) == 4


def test_lsh_index_maintainer_refuses_non_integral_key(spark, tmp_path):
    from vector_db_setup_spark.streaming.commit_log import (
        maintain_lsh_index_from_commits,
    )

    src = str(tmp_path / "src")
    write_snapshot(
        spark.createDataFrame(
            [("a", "alpha beta gamma delta")], "doc_id string, text string"
        ),
        src,
    )
    with pytest.raises(Exception, match="integral"):
        maintain_lsh_index_from_commits(
            spark, src, str(tmp_path / "idx"), str(tmp_path / "ck"),
            text_col="text", key_col="doc_id",
        )


# ---- r13: semantic-overlap maintainer (day-2 twin of
# ---- benchmark_semantic_overlap) ----


def _vec_rows(spark, pairs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in pairs],
        "vec_id long, embedding array<float>",
    )


def test_semantic_overlap_maintainer_tracks_source_obatch(
    spark, tmp_path
):
    """Bootstrap + append + merge(vector rewrite) + delete: the
    maintained score table must equal the from-scratch exact recompute
    after every drain, and a replayed drain is an idempotent no-op."""
    import functools

    from vector_db_setup_spark.operators.similarity import (
        max_cosine_against_literal,
    )
    from vector_db_setup_spark.streaming.commit_log import (
        maintain_semantic_overlap_from_commits,
    )

    base = str(tmp_path / "src")
    state = str(tmp_path / "state")
    bench = _vec_rows(
        spark, [(0, [1, 0, 0, 0]), (1, [0, 1, 0, 0]), (2, [0, 0, 1, 0])]
    )
    bench_rows = sorted(
        (r["vec_id"], list(r["embedding"]))
        for r in bench.collect()
    )
    drain = functools.partial(
        maintain_semantic_overlap_from_commits,
        spark, base, state, str(tmp_path / "ck"), bench,
    )

    def expect():
        live = read_snapshot(spark, base).select("vec_id", "embedding")
        return sorted(
            tuple(r)
            for r in max_cosine_against_literal(
                live, bench_rows
            ).collect()
        )

    def got():
        return sorted(
            tuple(r) for r in read_snapshot(spark, state).collect()
        )

    write_snapshot(
        _vec_rows(
            spark,
            [(100, [1, 0, 0, 0]), (101, [0, 2, 0, 0]),
             (102, [1, 1, 0, 0])],
        ),
        base,
    )
    drain()  # bootstrap
    assert got() == expect()

    append_snapshot(
        _vec_rows(spark, [(103, [0, 0, 5, 0]), (104, [1, 0, 1, 0])]),
        base,
    )
    drain()
    assert got() == expect()

    # merge rewrites 101's vector (changed) and inserts 105
    merge_snapshot(
        _vec_rows(spark, [(101, [0, 0, 0, 9]), (105, [0, 1, 1, 0])]),
        base,
        key_col="vec_id",
    )
    drain()
    assert got() == expect()
    # the rewritten key's score moved with its vector
    by_id = {r[0]: r for r in got()}
    assert by_id[101][2] == 0.0  # orthogonal to every benchmark now

    delete_from_snapshot(
        spark.createDataFrame([(100,)], "vec_id long"),
        base,
        key_col="vec_id",
    )
    drain()
    assert got() == expect()
    assert 100 not in {r[0] for r in got()}

    # replayed drain (no new commits): cursor short-circuits, state
    # unchanged
    before = got()
    drain()
    assert got() == before


def test_semantic_overlap_maintainer_heals_resurrected_key(
    spark, tmp_path
):
    """A key deleted from the source then re-landed must merge back
    into the state through the tombstone-heal path (compaction with
    meta kept), not raise TombstonedKeyError."""
    import functools

    from vector_db_setup_spark.streaming.commit_log import (
        maintain_semantic_overlap_from_commits,
    )

    base = str(tmp_path / "src")
    state = str(tmp_path / "state")
    bench = _vec_rows(spark, [(0, [1, 0])])
    drain = functools.partial(
        maintain_semantic_overlap_from_commits,
        spark, base, state, str(tmp_path / "ck"), bench,
    )
    write_snapshot(
        _vec_rows(spark, [(100, [1, 0]), (101, [0, 1])]), base
    )
    drain()
    delete_from_snapshot(
        spark.createDataFrame([(100,)], "vec_id long"),
        base, key_col="vec_id",
    )
    drain()
    assert {r["vec_id"] for r in read_snapshot(spark, state).collect()} == {101}
    # the SOURCE compacts (clearing ITS tombstones) and re-lands the
    # deleted key via merge; the STATE still carries the unscoped
    # tombstone, so the drain's merge exercises the heal path
    compact_snapshot(spark, base)
    merge_snapshot(_vec_rows(spark, [(100, [2, 0])]), base, key_col="vec_id")
    drain()  # re-landed key: heal + merge, not an error
    got = {
        r["vec_id"]: r["max_cosine"]
        for r in read_snapshot(spark, state).collect()
    }
    assert got == {100: 1.0, 101: 0.0}


def test_semantic_overlap_maintainer_refuses_benchmark_swap(
    spark, tmp_path
):
    """A drain under a DIFFERENT benchmark set must refuse loudly —
    mixed-benchmark scores are silently meaningless."""
    import functools

    from vector_db_setup_spark.streaming.commit_log import (
        maintain_semantic_overlap_from_commits,
    )

    base = str(tmp_path / "src")
    state = str(tmp_path / "state")
    write_snapshot(_vec_rows(spark, [(100, [1, 0])]), base)
    maintain_semantic_overlap_from_commits(
        spark, base, state, str(tmp_path / "ck1"),
        _vec_rows(spark, [(0, [1, 0])]),
    )
    append_snapshot(_vec_rows(spark, [(101, [0, 1])]), base)
    # the refusal is raised inside foreachBatch, so it surfaces
    # wrapped in a StreamingQueryException — match the message
    with pytest.raises(Exception, match="different benchmark"):
        maintain_semantic_overlap_from_commits(
            spark, base, state, str(tmp_path / "ck2"),
            _vec_rows(spark, [(0, [0, 1])]),
        )
    # oversized benchmark refused up front
    big = _vec_rows(spark, [(i, [1, 0]) for i in range(5)])
    with pytest.raises(ValueError, match="max_bench"):
        maintain_semantic_overlap_from_commits(
            spark, base, str(tmp_path / "s2"), str(tmp_path / "ck3"),
            big, max_bench=4,
        )
