"""Incremental span-dedup occurrence index
(streaming/commit_log.maintain_span_index_from_commits +
operators/span_dedup.spans_against_index): maintained == from-scratch
through append/merge/delete drains, the no-bare-scan spy discipline,
index-resolved spans == the batch operator, delta-cost querying,
resurrection healing, and the geometry/key contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_setup_spark.sources.snapshot_table import (
    append_snapshot,
    compact_snapshot,
    delete_from_snapshot,
    merge_snapshot,
    read_snapshot,
    snapshot_info,
    write_snapshot,
)


def _corpus(spark, lo, hi, rev=""):
    # 10-token texts; docs sharing id%25 and rev are exact duplicates,
    # so real 8-gram span structure exists across the corpus
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma delta epsilon zeta eta theta token "),
            (F.col("id") % 25).cast("string"),
            F.lit(f" {rev}" if rev else ""),
        ).alias("text"),
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


def _scratch_index(spark, docs, n=8):
    from vector_db_setup_spark.operators.span_dedup import (
        _POS_CAP,
        ngram_occurrences,
    )

    return ngram_occurrences(docs, n=n).select(
        (F.col("id").cast("long") * _POS_CAP + F.col("pos")).alias(
            "occ_key"
        ),
        F.col("id").alias("doc_id"),
        "pos",
        "gram",
    )


def test_span_index_tracks_source(spark, tmp_path, monkeypatch):
    import vector_db_setup_spark.sources.snapshot_table as st_mod
    from vector_db_setup_spark.operators.span_dedup import (
        duplicate_spans,
        spans_against_index,
    )
    from vector_db_setup_spark.streaming.commit_log import (
        maintain_span_index_from_commits,
    )

    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    write_snapshot(
        _corpus(spark, 0, 120), src,
        stats_cols=["doc_id"], cluster_by=["doc_id"], cluster_files=4,
    )
    kw = dict(text_col="text", key_col="doc_id", shingle_n=8)
    maintain_span_index_from_commits(
        spark, src, idx, str(tmp_path / "ck"), **kw
    )
    bare, real = _spy_on(monkeypatch, st_mod, src)
    # merge: rewrite 20 docs' text, insert 10 new near-dups
    merge_snapshot(
        _corpus(spark, 0, 20, rev="v2").unionByName(
            _corpus(spark, 500, 510)
        ),
        src, key_col="doc_id",
    )
    append_snapshot(
        _corpus(spark, 510, 540), src, stats_cols=["doc_id"]
    )
    delete_from_snapshot(
        spark.range(40, 50).select(F.col("id").alias("doc_id")),
        src, key_col="doc_id",
    )
    maintain_span_index_from_commits(
        spark, src, idx, str(tmp_path / "ck"), **kw
    )
    assert bare == [], f"span drain bare-scanned the source: {bare}"
    monkeypatch.setattr(st_mod, "read_snapshot", real)
    head = read_snapshot(spark, src)
    got = {
        tuple(r)
        for r in read_snapshot(spark, idx)
        .select("occ_key", "doc_id", "pos", "gram")
        .collect()
    }
    want = {tuple(r) for r in _scratch_index(spark, head).collect()}
    assert got == want and got
    # index-resolved spans over the whole head == the batch operator
    got_spans = sorted(
        tuple(r)
        for r in spans_against_index(
            head, read_snapshot(spark, idx), n=8
        ).collect()
    )
    want_spans = sorted(
        tuple(r) for r in duplicate_spans(head, n=8).collect()
    )
    assert got_spans == want_spans and got_spans
    # replay drain is a no-op
    import vector_db_setup_spark.sources.snapshot_table as st
    n_before = len(st.committed_versions(spark, idx))
    maintain_span_index_from_commits(
        spark, src, idx, str(tmp_path / "ck2"), **kw
    )
    assert len(st.committed_versions(spark, idx)) == n_before
    # geometry drift refuses
    with pytest.raises(Exception, match="geometry"):
        maintain_span_index_from_commits(
            spark, src, idx, str(tmp_path / "ck3"),
            text_col="text", key_col="doc_id", shingle_n=5,
        )


def test_spans_against_index_delta_cost_semantics(spark, tmp_path):
    """The steady-state query: 'which spans of JUST the new docs
    duplicate anything ever ingested' — without re-shingling."""
    from vector_db_setup_spark.operators.span_dedup import (
        spans_against_index,
    )
    from vector_db_setup_spark.streaming.commit_log import (
        maintain_span_index_from_commits,
    )

    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    base = _corpus(spark, 0, 50)
    write_snapshot(base, src)
    kw = dict(text_col="text", key_col="doc_id", shingle_n=8)
    maintain_span_index_from_commits(
        spark, src, idx, str(tmp_path / "ck"), **kw
    )
    # delta: doc 1000 echoes doc 7's text; doc 1001 is fresh
    delta = spark.createDataFrame(
        [
            (1000, "alpha beta gamma delta epsilon zeta eta theta token 7"),
            (1001, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"),
        ],
        "doc_id long, text string",
    )
    append_snapshot(delta, src)
    maintain_span_index_from_commits(
        spark, src, idx, str(tmp_path / "ck"), **kw
    )
    got = sorted(
        tuple(r)
        for r in spans_against_index(
            delta, read_snapshot(spark, idx), n=8
        ).collect()
    )
    # doc 1000's full 10-token text duplicates doc 7 (an EARLIER
    # occurrence key), doc 1001 is clean
    assert got == [(1000, 1, 10, 10)]


def test_span_index_self_heals_resurrection(spark, tmp_path):
    import vector_db_setup_spark.sources.snapshot_table as st
    from vector_db_setup_spark.streaming.commit_log import (
        maintain_span_index_from_commits,
    )

    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    write_snapshot(_corpus(spark, 0, 30), src)
    kw = dict(text_col="text", key_col="doc_id", shingle_n=8)
    maintain_span_index_from_commits(
        spark, src, idx, str(tmp_path / "ck"), **kw
    )
    delete_from_snapshot(
        spark.range(0, 3).select(F.col("id").alias("doc_id")),
        src, key_col="doc_id",
    )
    maintain_span_index_from_commits(
        spark, src, idx, str(tmp_path / "ck"), **kw
    )
    compact_snapshot(spark, src)
    merge_snapshot(_corpus(spark, 0, 3), src, key_col="doc_id")
    maintain_span_index_from_commits(
        spark, src, idx, str(tmp_path / "ck"), **kw
    )
    live = read_snapshot(spark, idx)
    # 10-token docs, n=8 → 3 occurrence rows per doc
    assert live.count() == 30 * 3
    assert {r["doc_id"] for r in live.select("doc_id").distinct().collect()} \
        == set(range(30))
    meta = snapshot_info(
        spark, idx, max(st.committed_versions(spark, idx))
    )["meta"]
    assert meta["kind"] == "span_index"
    assert int(meta["through_version"]) == 4


def test_span_index_refuses_non_integral_key(spark, tmp_path):
    from vector_db_setup_spark.streaming.commit_log import (
        maintain_span_index_from_commits,
    )

    src = str(tmp_path / "src")
    write_snapshot(
        spark.createDataFrame(
            [("a", "alpha beta gamma delta epsilon zeta eta theta x")],
            "doc_id string, text string",
        ),
        src,
    )
    with pytest.raises(Exception, match="integral"):
        maintain_span_index_from_commits(
            spark, src, str(tmp_path / "idx"), str(tmp_path / "ck"),
            text_col="text", key_col="doc_id", shingle_n=8,
        )


def test_span_index_short_doc_events_are_inert(spark, tmp_path):
    """Docs below shingle_n tokens produce NO index rows — appends,
    rewrites, and deletes of them drain cleanly as no-ops."""
    from vector_db_setup_spark.streaming.commit_log import (
        maintain_span_index_from_commits,
    )

    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    write_snapshot(
        spark.createDataFrame(
            [(0, "a b c"), (1, "alpha beta gamma delta eps zeta eta th x")],
            "doc_id long, text string",
        ),
        src,
    )
    kw = dict(text_col="text", key_col="doc_id", shingle_n=8)
    maintain_span_index_from_commits(
        spark, src, idx, str(tmp_path / "ck"), **kw
    )
    assert read_snapshot(spark, idx).count() == 2  # only doc 1's grams
    append_snapshot(
        spark.createDataFrame([(2, "d e f")], "doc_id long, text string"),
        src,
    )
    delete_from_snapshot(
        spark.range(0, 1).select(F.col("id").alias("doc_id")),
        src, key_col="doc_id",
    )
    maintain_span_index_from_commits(
        spark, src, idx, str(tmp_path / "ck"), **kw
    )
    assert read_snapshot(spark, idx).count() == 2  # unchanged, no errors


def test_compact_if_keep_meta_preserves_maintainer_state(
    spark, tmp_path
):
    """Compacting a maintainer's STATE table through compact_if must
    keep the cursor meta (keep_meta=True), or the next drain refuses
    the state as unmaintained. Pins the passthrough added for the
    index-compaction step of the delta-cost loop."""
    from vector_db_setup_spark.sources.snapshot_table import compact_if
    from vector_db_setup_spark.streaming.commit_log import (
        maintain_span_index_from_commits,
    )

    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    write_snapshot(_corpus(spark, 0, 40), src)
    kw = dict(text_col="text", key_col="doc_id", shingle_n=8)
    maintain_span_index_from_commits(
        spark, src, idx, str(tmp_path / "ck"), **kw
    )
    # stack merge-on-read debt on the INDEX: several drains
    for lo in (100, 200, 300):
        append_snapshot(_corpus(spark, lo, lo + 20), src)
        maintain_span_index_from_commits(
            spark, src, idx, str(tmp_path / "ck"), **kw
        )
    v = compact_if(
        spark, idx, max_data_dirs=2, max_delete_entries=1,
        keep_meta=True,
    )
    assert v is not None  # debt crossed the threshold -> compacted
    meta = snapshot_info(spark, idx, v)["meta"]
    assert meta["kind"] == "span_index" and "through_version" in meta
    # the NEXT drain still works (cursor survived the compaction)
    append_snapshot(_corpus(spark, 400, 410), src)
    maintain_span_index_from_commits(
        spark, src, idx, str(tmp_path / "ck"), **kw
    )
    live = read_snapshot(spark, idx)
    assert {r["doc_id"] for r in live.select("doc_id").distinct().collect()} \
        == set(range(40)) | set(range(100, 120)) | set(range(200, 220)) \
        | set(range(300, 320)) | set(range(400, 410))
