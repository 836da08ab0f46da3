"""Commit-log subscription (streaming/commit_log.py): the snapshot
table's _commits dir consumed as a Structured Streaming file source —
exactly-once delivery of commit rows, the version-from-filename
torn-read contract, and the Bloom maintainer whose state is itself a
snapshot table (maintained == rebuilt, replay no-op, geometry guard)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from vector_db_setup_spark.operators.bloom import bloom_build
from vector_db_setup_spark.sources.snapshot_table import (
    COMMITS_DIR,
    append_snapshot,
    current_version,
    read_snapshot,
    snapshot_info,
    write_snapshot,
)
from vector_db_setup_spark.streaming.commit_log import (
    maintain_bloom_from_commits,
    stream_snapshot_commits,
)

NB, K = 1 << 16, 3


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        "id", F.md5(F.col("id").cast("string")).alias("payload")
    )


def _drain(spark, base, ckpt, **opts):
    rows = []
    q = (
        stream_snapshot_commits(spark, base, **opts)
        .writeStream.foreachBatch(
            lambda df, bid: rows.extend(df.collect())
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return rows


def test_stream_delivers_commit_rows_exactly_once(spark, tmp_path):
    base = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 50), base, note="first")
    append_snapshot(_df(spark, 50, 80), base, note="second")
    ckpt = str(tmp_path / "ck")
    rows = _drain(spark, base, ckpt)
    got = sorted((r["version"], r["note"], r["rows"]) for r in rows)
    assert got == [(1, "first", 50), (2, "second", 80)]
    # marker_json carries the raw marker for richer consumers
    assert all('"version"' in r["marker_json"] for r in rows)
    # same checkpoint, no new commits -> nothing redelivered
    assert _drain(spark, base, ckpt) == []
    # a third commit arrives alone on the next drain
    append_snapshot(_df(spark, 80, 90), base, note="third")
    rows3 = _drain(spark, base, ckpt)
    assert [(r["version"], r["note"]) for r in rows3] == [(3, "third")]


def test_marker_appears_atomically_with_content(spark, tmp_path):
    """Spark file sources DROP zero-byte files without redelivery, so
    a marker that became visible before its bytes would vanish from
    the subscription forever. LocalFS.create_new therefore claims the
    name via temp-write + link: the marker appears fully written or
    not at all, and a crash before the claim leaves only a hidden
    temp that neither the version listing nor the stream can see."""
    from vector_db_setup_spark.sources.fs import LocalFS
    from vector_db_setup_spark.sources.snapshot_table import (
        committed_versions,
    )

    base = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 10), base, note="ok")
    cdir = os.path.join(base, COMMITS_DIR)

    # crash between temp-write and claim: no marker, hidden junk only
    class CrashBeforeLink(LocalFS):
        def create_new(self, path, data=b""):
            d, name = os.path.split(path)
            with open(os.path.join(d, f".{name}.crashed.tmp"), "xb") as f:
                f.write(data)
            raise RuntimeError("died before claiming the name")

    with pytest.raises(RuntimeError, match="died before"):
        CrashBeforeLink().create_new(
            os.path.join(cdir, "v00000002"), b'{"version": 2}'
        )
    assert committed_versions(spark, base) == [1]
    rows = _drain(spark, base, str(tmp_path / "ck"))
    assert [(r["version"], r["note"]) for r in rows] == [(1, "ok")]
    # every delivered marker arrived with its full bytes
    assert all(r["rows"] is not None for r in rows)
    # the real create_new left no temp behind
    assert [n for n in os.listdir(cdir) if n.endswith(".tmp")] == [
        ".v00000002.crashed.tmp"
    ]


def test_bloom_maintainer_matches_full_rebuild(spark, tmp_path):
    base = str(tmp_path / "tbl")
    state = str(tmp_path / "bloom")
    ckpt = str(tmp_path / "ck")
    write_snapshot(_df(spark, 0, 60), base)
    # bootstrap drain: filter over everything visible at first head
    maintain_bloom_from_commits(
        spark, base, "id", state, ckpt, num_bits=NB, k=K
    )
    v1 = current_version(spark, state)
    assert snapshot_info(spark, state, v1)["meta"]["through_version"] == 1
    # two more commits, one drain: increments only
    append_snapshot(_df(spark, 60, 75), base)
    append_snapshot(_df(spark, 75, 90), base)
    maintain_bloom_from_commits(
        spark, base, "id", state, ckpt, num_bits=NB, k=K
    )
    head = current_version(spark, state)
    meta = snapshot_info(spark, state, head)["meta"]
    assert meta["through_version"] == 3
    maintained = {
        (r["idx"], r["word"])
        for r in read_snapshot(spark, state).collect()
    }
    rebuilt = {
        (r["idx"], r["word"])
        for r in bloom_build(
            read_snapshot(spark, base).select("id").distinct(),
            "id",
            NB,
            K,
        ).collect()
    }
    assert maintained == rebuilt


def test_maintainer_replay_is_noop(spark, tmp_path):
    """Losing the stream checkpoint replays every commit; the state
    table's through_version cursor absorbs the replay without a new
    state commit."""
    base = str(tmp_path / "tbl")
    state = str(tmp_path / "bloom")
    ckpt = str(tmp_path / "ck")
    write_snapshot(_df(spark, 0, 30), base)
    append_snapshot(_df(spark, 30, 40), base)
    maintain_bloom_from_commits(
        spark, base, "id", state, ckpt, num_bits=NB, k=K
    )
    head = current_version(spark, state)
    shutil.rmtree(ckpt)
    maintain_bloom_from_commits(
        spark, base, "id", state, ckpt, num_bits=NB, k=K
    )
    assert current_version(spark, state) == head


def test_maintainer_refuses_geometry_change(spark, tmp_path):
    base = str(tmp_path / "tbl")
    state = str(tmp_path / "bloom")
    write_snapshot(_df(spark, 0, 20), base)
    maintain_bloom_from_commits(
        spark, base, "id", state, str(tmp_path / "ck1"), num_bits=NB, k=K
    )
    append_snapshot(_df(spark, 20, 30), base)
    from pyspark.errors.exceptions.base import StreamingQueryException

    with pytest.raises(
        (ValueError, StreamingQueryException), match="geometry"
    ):
        maintain_bloom_from_commits(
            spark,
            base,
            "id",
            state,
            str(tmp_path / "ck2"),
            num_bits=NB,
            k=K + 1,
        )


# ---- IVF index subscription ------------------------------------------

import numpy as np

from vector_db_setup_spark.sources.snapshot_table import (
    committed_versions,
    delete_from_snapshot,
    upsert_snapshot,
)
from vector_db_setup_spark.streaming.commit_log import (
    maintain_ivf_from_commits,
)


def _emb(spark, lo, hi, dim=8):
    rng = np.random.default_rng(100 + lo)
    rows = [
        (int(i), rng.standard_normal(dim).tolist())
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def _ids(spark, base):
    return sorted(
        r["vec_id"] for r in read_snapshot(spark, base).collect()
    )


def test_ivf_subscription_bootstrap_append_delete(spark, tmp_path):
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ck")
    write_snapshot(_emb(spark, 0, 60), src)
    maintain_ivf_from_commits(
        spark, src, idx, ckpt, key_col="vec_id", k=4, seed=7
    )
    meta = snapshot_info(spark, idx, current_version(spark, idx))["meta"]
    assert meta["kind"] == "ivf"
    assert meta["source_appended_through"] == 1
    assert _ids(spark, idx) == list(range(60))

    # two source commits, one drain: appended delta + tombstoned keys
    append_snapshot(_emb(spark, 60, 80), src)
    delete_from_snapshot(
        spark.range(0, 5).select(F.col("id").alias("vec_id")),
        src,
        key_col="vec_id",
    )
    maintain_ivf_from_commits(
        spark, src, idx, ckpt, key_col="vec_id", k=4, seed=7
    )
    assert _ids(spark, idx) == _ids(spark, src) == list(range(5, 80))
    meta2 = snapshot_info(spark, idx, current_version(spark, idx))[
        "meta"
    ]
    assert meta2["source_appended_through"] == 3
    assert meta2["source_deleted_through"] == 3
    # the index's own keys survived the delete commit's meta merge
    assert meta2["kind"] == "ivf" and "centroids" in meta2
    # appended rows were assigned with the BOOTSTRAP centroids
    assert meta2["centroids"] == meta["centroids"]


def test_ivf_subscription_replay_is_noop(spark, tmp_path):
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ck")
    write_snapshot(_emb(spark, 0, 40), src)
    append_snapshot(_emb(spark, 40, 50), src)
    maintain_ivf_from_commits(
        spark, src, idx, ckpt, key_col="vec_id", k=4, seed=7
    )
    head = current_version(spark, idx)
    shutil.rmtree(ckpt)
    maintain_ivf_from_commits(
        spark, src, idx, ckpt, key_col="vec_id", k=4, seed=7
    )
    assert current_version(spark, idx) == head
    assert committed_versions(spark, idx) == list(range(1, head + 1))


def test_ivf_subscription_refuses_rewrite_steps(spark, tmp_path):
    from pyspark.errors.exceptions.base import StreamingQueryException

    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    write_snapshot(_emb(spark, 0, 30), src)
    maintain_ivf_from_commits(
        spark, src, idx, str(tmp_path / "ck1"), key_col="vec_id", k=4
    )
    upsert_snapshot(_emb(spark, 3, 5), src, key_col="vec_id")
    with pytest.raises(
        (ValueError, StreamingQueryException), match="rebuild"
    ):
        maintain_ivf_from_commits(
            spark, src, idx, str(tmp_path / "ck2"), key_col="vec_id",
            k=4,
        )


def test_ivf_cursors_advance_on_one_sided_workloads(spark, tmp_path):
    """Append-only (or delete-only) workloads must advance BOTH
    cursors: a stuck opposite-side cursor would make every drain
    re-scan from bootstrap and kill the subscription once GC reclaims
    any version above it."""
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ck")
    write_snapshot(_emb(spark, 0, 40), src)
    maintain_ivf_from_commits(
        spark, src, idx, ckpt, key_col="vec_id", k=4, seed=7
    )
    # append-only batch
    append_snapshot(_emb(spark, 40, 50), src)
    maintain_ivf_from_commits(
        spark, src, idx, ckpt, key_col="vec_id", k=4, seed=7
    )
    meta = snapshot_info(spark, idx, current_version(spark, idx))["meta"]
    assert meta["source_appended_through"] == 2
    assert meta["source_deleted_through"] == 2
    # delete-only batch
    delete_from_snapshot(
        spark.range(0, 3).select(F.col("id").alias("vec_id")),
        src,
        key_col="vec_id",
    )
    maintain_ivf_from_commits(
        spark, src, idx, ckpt, key_col="vec_id", k=4, seed=7
    )
    meta = snapshot_info(spark, idx, current_version(spark, idx))["meta"]
    assert meta["source_appended_through"] == 3
    assert meta["source_deleted_through"] == 3
    assert _ids(spark, idx) == list(range(3, 50))


def test_bloom_maintainer_refuses_foreign_state_table(spark, tmp_path):
    from pyspark.errors.exceptions.base import StreamingQueryException

    base = str(tmp_path / "tbl")
    state = str(tmp_path / "state")
    write_snapshot(_df(spark, 0, 10), base)
    write_snapshot(_df(spark, 0, 5), state)  # not a maintainer state
    with pytest.raises(
        (ValueError, StreamingQueryException), match="through_version"
    ):
        maintain_bloom_from_commits(
            spark, base, "id", state, str(tmp_path / "ck"),
            num_bits=NB, k=K,
        )


def test_continuous_mode_returns_query_handle(spark, tmp_path):
    base = str(tmp_path / "tbl")
    state = str(tmp_path / "state")
    write_snapshot(_df(spark, 0, 10), base)
    q = maintain_bloom_from_commits(
        spark, base, "id", state, str(tmp_path / "ck"),
        num_bits=NB, k=K, available_now=False,
    )
    try:
        assert q is not None and hasattr(q, "stop")
        q.processAllAvailable()
        assert current_version(spark, state) == 1
    finally:
        q.stop()


def test_gc_sweeps_aged_crashed_marker_temps(spark, tmp_path):
    from vector_db_setup_spark.sources.snapshot_table import gc_snapshots

    base = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 10), base)
    write_snapshot(_df(spark, 0, 12), base)
    write_snapshot(_df(spark, 0, 14), base)
    cdir = os.path.join(base, COMMITS_DIR)
    old = os.path.join(cdir, ".v00000004.dead.tmp")
    young = os.path.join(cdir, ".v00000005.inflight.tmp")
    for p in (old, young):
        with open(p, "wb") as f:
            f.write(b"partial")
    os.utime(old, (1, 1))  # ancient
    gc_snapshots(spark, base, keep=2, orphan_min_age_s=3600)
    names = set(os.listdir(cdir))
    assert ".v00000004.dead.tmp" not in names   # aged junk swept
    assert ".v00000005.inflight.tmp" in names   # grace protects it
    assert current_version(spark, base) == 3


def test_ivf_subscription_survives_source_schema_evolution(
    spark, tmp_path
):
    """A merge_schema-evolved source batch carries columns the index
    never indexed — the maintainer projects appends to the INDEX's
    schema instead of letting the index's append guard refuse them."""
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ck")
    write_snapshot(_emb(spark, 0, 40), src)
    maintain_ivf_from_commits(
        spark, src, idx, ckpt, key_col="vec_id", k=4, seed=7
    )
    evolved = _emb(spark, 40, 55).withColumn("lang", F.lit("en"))
    append_snapshot(evolved, src, merge_schema=True)
    maintain_ivf_from_commits(
        spark, src, idx, ckpt, key_col="vec_id", k=4, seed=7
    )
    assert _ids(spark, idx) == list(range(55))
    # the index schema stayed what the bootstrap indexed
    assert "lang" not in read_snapshot(spark, idx).columns


def test_maintainers_correct_under_one_marker_per_batch(spark, tmp_path):
    """maxFilesPerTrigger=1 chops the catch-up into one-commit batches
    — the dense-version cursor logic must land the same final state as
    a single-batch drain, committing at most one state version per
    batch and never reprocessing."""
    base = str(tmp_path / "tbl")
    state = str(tmp_path / "bloom")
    ckpt = str(tmp_path / "ck")
    write_snapshot(_df(spark, 0, 20), base)
    for i in range(1, 6):
        append_snapshot(_df(spark, 20 * i, 20 * (i + 1)), base)
    maintain_bloom_from_commits(
        spark, base, "id", state, ckpt, num_bits=NB, k=K,
        maxFilesPerTrigger=1,
    )
    metas = [
        snapshot_info(spark, state, v)["meta"]["through_version"]
        for v in committed_versions(spark, state)
    ]
    assert metas == sorted(set(metas))  # monotone, no duplicates
    assert metas[-1] == 6
    maintained = {
        (r["idx"], r["word"])
        for r in read_snapshot(spark, state).collect()
    }
    rebuilt = {
        (r["idx"], r["word"])
        for r in bloom_build(
            read_snapshot(spark, base).select("id").distinct(),
            "id", NB, K,
        ).collect()
    }
    assert maintained == rebuilt


def test_ivf_maintainer_under_one_marker_per_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    write_snapshot(_emb(spark, 0, 30), src)
    append_snapshot(_emb(spark, 30, 40), src)
    delete_from_snapshot(
        spark.range(0, 4).select(F.col("id").alias("vec_id")),
        src,
        key_col="vec_id",
    )
    append_snapshot(_emb(spark, 40, 45), src)
    maintain_ivf_from_commits(
        spark, src, idx, str(tmp_path / "ck"), key_col="vec_id",
        k=4, seed=7, maxFilesPerTrigger=1,
    )
    assert _ids(spark, idx) == _ids(spark, src) == list(range(4, 45))
    meta = snapshot_info(spark, idx, current_version(spark, idx))["meta"]
    assert meta["source_appended_through"] == 4
    assert meta["source_deleted_through"] == 4


def test_subscription_over_hadoop_file_scheme(spark, tmp_path):
    """file:// base routes marker writes through the Hadoop
    FileSystem API (the torn-content window documented there) and the
    stream/maintainer path handling must survive the scheme prefix."""
    base = f"file://{tmp_path}/tbl"
    state = f"file://{tmp_path}/bloom"
    write_snapshot(_df(spark, 0, 25), base)
    append_snapshot(_df(spark, 25, 40), base)
    rows = _drain(spark, base, str(tmp_path / "ck0"))
    # batch-internal row order is not guaranteed (maintainers use the
    # batch max, not the order)
    assert sorted((r["version"], r["rows"]) for r in rows) == [
        (1, 25),
        (2, 40),
    ]
    maintain_bloom_from_commits(
        spark, base, "id", state, str(tmp_path / "ck1"),
        num_bits=NB, k=K,
    )
    maintained = {
        (r["idx"], r["word"])
        for r in read_snapshot(spark, state).collect()
    }
    rebuilt = {
        (r["idx"], r["word"])
        for r in bloom_build(
            read_snapshot(spark, base).select("id").distinct(),
            "id", NB, K,
        ).collect()
    }
    assert maintained == rebuilt


# ---- incremental aggregate (materialized view) subscription -----------

from vector_db_setup_spark.streaming.commit_log import (
    maintain_agg_from_commits,
)


def _docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
        (F.col("id") % 7 + 1).alias("n_tokens"),
    )


def _rebuilt_agg(spark, base):
    return {
        (r["lang"], r["cnt"], r["total"])
        for r in read_snapshot(spark, base)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("n_tokens").alias("total"),
        )
        .collect()
    }


def test_agg_maintainer_matches_rebuild_through_add_and_delete(
    spark, tmp_path
):
    src = str(tmp_path / "src")
    state = str(tmp_path / "agg")
    ckpt = str(tmp_path / "ck")
    write_snapshot(_docs(spark, 0, 60), src)
    maintain_agg_from_commits(
        spark, src, state, ckpt, group_col="lang", key_col="doc_id",
        sum_col="n_tokens",
    )
    append_snapshot(_docs(spark, 60, 90), src)
    delete_from_snapshot(
        spark.range(0, 10).select(F.col("id").alias("doc_id")),
        src,
        key_col="doc_id",
    )
    maintain_agg_from_commits(
        spark, src, state, ckpt, group_col="lang", key_col="doc_id",
        sum_col="n_tokens",
    )
    got = {
        (r["lang"], r["cnt"], r["total"])
        for r in read_snapshot(spark, state).collect()
    }
    assert got == _rebuilt_agg(spark, src)
    meta = snapshot_info(spark, state, current_version(spark, state))[
        "meta"
    ]
    assert meta["through_version"] == 3
    # replay after checkpoint loss: no new state commit
    head = current_version(spark, state)
    shutil.rmtree(ckpt)
    maintain_agg_from_commits(
        spark, src, state, ckpt, group_col="lang", key_col="doc_id",
        sum_col="n_tokens",
    )
    assert current_version(spark, state) == head


def test_agg_maintainer_drops_emptied_groups_and_guards_shape(
    spark, tmp_path
):
    from pyspark.errors.exceptions.base import StreamingQueryException

    src = str(tmp_path / "src")
    state = str(tmp_path / "agg")
    ckpt = str(tmp_path / "ck")
    # only doc_id 0 and 3 are 'en'... make a tiny group and empty it
    write_snapshot(_docs(spark, 0, 6), src)
    maintain_agg_from_commits(
        spark, src, state, ckpt, group_col="lang", key_col="doc_id"
    )
    delete_from_snapshot(
        spark.createDataFrame([(0,), (3,)], "doc_id long"),
        src,
        key_col="doc_id",
    )
    maintain_agg_from_commits(
        spark, src, state, ckpt, group_col="lang", key_col="doc_id"
    )
    langs = {
        r["lang"] for r in read_snapshot(spark, state).collect()
    }
    assert "en" not in langs and langs == {"de", "fr"}
    # shape change refused
    append_snapshot(_docs(spark, 6, 9), src)
    with pytest.raises(
        (ValueError, StreamingQueryException), match="shape"
    ):
        maintain_agg_from_commits(
            spark, src, state, str(tmp_path / "ck2"),
            group_col="lang", key_col="doc_id", sum_col="n_tokens",
        )


def test_agg_maintainer_refuses_rewrite_steps(spark, tmp_path):
    from pyspark.errors.exceptions.base import StreamingQueryException

    src = str(tmp_path / "src")
    state = str(tmp_path / "agg")
    write_snapshot(_docs(spark, 0, 10), src)
    maintain_agg_from_commits(
        spark, src, state, str(tmp_path / "ck"),
        group_col="lang", key_col="doc_id",
    )
    upsert_snapshot(_docs(spark, 2, 4), src, key_col="doc_id")
    with pytest.raises(
        (ValueError, StreamingQueryException), match="rebuild"
    ):
        maintain_agg_from_commits(
            spark, src, state, str(tmp_path / "ck2"),
            group_col="lang", key_col="doc_id",
        )


def test_thread_contention_appends_with_gate_and_tags(spark, tmp_path):
    """Real concurrency over the r8 surface: 4 threads x 3 APPEND
    commits (fresh key ranges, CHECK gate declared at the base write)
    racing the marker create, while the main thread tags mid-storm.
    Every batch must land exactly once under a distinct version, the
    gate must ride every marker, and a catch-up CDC drain must
    attribute every appended key exactly once."""
    import threading

    from vector_db_setup_spark.sources.snapshot_table import (
        list_tags,
        snapshot_changes,
        tag_snapshot,
    )

    base = str(tmp_path / "t")
    write_snapshot(
        _df(spark, 0, 10), base, checks={"id_nonneg": "id >= 0"}
    )
    errors: list[Exception] = []
    lock = threading.Lock()

    def appender(tid: int) -> None:
        try:
            for j in range(3):
                lo = 1000 * (tid + 1) + 100 * j
                append_snapshot(
                    _df(spark, lo, lo + 20),
                    base,
                    note=f"t{tid}-{j}",
                    retries=40,
                )
        except Exception as e:  # pragma: no cover
            with lock:
                errors.append(e)

    threads = [
        threading.Thread(target=appender, args=(i,)) for i in range(4)
    ]
    for t in threads:
        t.start()
    tag_snapshot(spark, base, "mid-storm")  # races the appends
    for t in threads:
        t.join()
    assert not errors, errors
    vs = committed_versions(spark, base)
    assert vs == list(range(1, 14))  # base + 12 appends, all distinct
    head = read_snapshot(spark, base)
    assert head.count() == 10 + 12 * 20
    # the gate rode every marker through the contention
    for v in vs:
        assert snapshot_info(spark, base, v)["checks"] == {
            "id_nonneg": "id >= 0"
        }
    # the tag resolved to SOME committed version and still reads
    (tv,) = list_tags(spark, base).values()
    assert read_snapshot(spark, base, tag="mid-storm").count() >= 10
    # catch-up CDC attributes every appended key exactly once
    feed = snapshot_changes(
        spark, base, "id", from_version=1, columns=[]
    ).collect()
    added = [r["id"] for r in feed if r["status"] == "added"]
    assert len(added) == len(set(added)) == 240


def test_agg_maintainer_on_rewrite_rebuild_self_heals(spark, tmp_path):
    """on_rewrite="rebuild": a content-rewrite step in the range makes
    the maintainer re-aggregate the batch head instead of raising —
    the cursor advances past the rewrite and later drains go back to
    incremental."""
    from vector_db_setup_spark.sources.snapshot_table import (
        upsert_snapshot,
    )

    src = str(tmp_path / "src")
    state = str(tmp_path / "agg")
    ck = str(tmp_path / "ck")
    write_snapshot(_docs(spark, 0, 30), src)
    maintain_agg_from_commits(
        spark, src, state, ck,
        group_col="lang", key_col="doc_id", sum_col="n_tokens",
    )
    upsert_snapshot(
        _docs(spark, 2, 4).withColumn("n_tokens", F.lit(99)),
        src,
        key_col="doc_id",
    )
    append_snapshot(_docs(spark, 30, 45), src)
    maintain_agg_from_commits(
        spark, src, state, ck,
        group_col="lang", key_col="doc_id", sum_col="n_tokens",
        on_rewrite="rebuild",
    )
    def _maintained(b):
        return {
            (r["lang"], r["cnt"], r["total"])
            for r in read_snapshot(spark, b).collect()
        }

    assert _maintained(state) == _rebuilt_agg(spark, src)
    # and the subscription is healthy again: the next append drains
    # incrementally (default on_rewrite raises if it weren't)
    append_snapshot(_docs(spark, 45, 60), src)
    maintain_agg_from_commits(
        spark, src, state, ck,
        group_col="lang", key_col="doc_id", sum_col="n_tokens",
    )
    assert _maintained(state) == _rebuilt_agg(spark, src)


def test_ivf_maintainer_on_rewrite_rebuild_self_heals(spark, tmp_path):
    from vector_db_setup_spark.operators.ann_index import (
        search_ivf_index,
    )
    from vector_db_setup_spark.sources.snapshot_table import (
        snapshot_info as sinfo,
        upsert_snapshot,
    )

    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    ck = str(tmp_path / "ck")
    write_snapshot(_emb(spark, 0, 40), src)
    maintain_ivf_from_commits(
        spark, src, idx, ck, key_col="vec_id", k=4, seed=7
    )
    upsert_snapshot(_emb(spark, 3, 5), src, key_col="vec_id")
    maintain_ivf_from_commits(
        spark, src, idx, ck, key_col="vec_id", k=4, seed=7,
        on_rewrite="rebuild",
    )
    head = current_version(spark, idx)
    meta = sinfo(spark, idx, head)["meta"]
    assert meta["source_appended_through"] == 2
    assert meta["source_deleted_through"] == 2
    # the rebuilt index indexes the REWRITTEN vectors exactly
    idx_rows = {
        (r["vec_id"], tuple(round(x, 9) for x in r["embedding"]))
        for r in read_snapshot(spark, idx)
        .select("vec_id", "embedding")
        .collect()
    }
    src_rows = {
        (r["vec_id"], tuple(round(x, 9) for x in r["embedding"]))
        for r in read_snapshot(spark, src).collect()
    }
    assert idx_rows == src_rows
    # and incremental maintenance resumes on the rebuilt index
    append_snapshot(_emb(spark, 40, 55), src)
    maintain_ivf_from_commits(
        spark, src, idx, ck, key_col="vec_id", k=4, seed=7
    )
    hits = search_ivf_index(
        spark, idx, [0.0] * 8, topk=100, nprobe=4
    )
    assert hits.count() == 55
