"""Commit-log checkpoints (sources/snapshot_table.py): marker walkers
(history, timestamp travel, idempotency misses, CDC info fetches) pay
one checkpoint read + one read per POST-checkpoint marker instead of
one small read per surviving version — asserted with a counting FS
double — while staying value-identical to the uncheckpointed walk.
The checkpoint is a cache: corruption degrades to direct reads, GC
keeps the newest two, and the commit loop rolls one automatically
every CHECKPOINT_EVERY commits."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

import vector_db_setup_spark.sources.snapshot_table as st
from vector_db_setup_spark.sources.fs import LocalFS
from vector_db_setup_spark.sources.snapshot_table import (
    CKPTS_DIR,
    _find_idempotent,
    append_snapshot,
    committed_versions,
    gc_snapshots,
    snapshot_changes,
    snapshot_history,
    version_as_of,
    write_commit_checkpoint,
    write_snapshot,
)


class CountingFS(LocalFS):
    def __init__(self):
        self.read_files = 0

    def read_file(self, path):
        self.read_files += 1
        return super().read_file(path)


def _mk_marker(base, v, key=None):
    body = {
        "version": v,
        "created_utc": 1000.0 + v,
        "op": "append",
        "data": [f"d-{i:03d}" for i in range(1, v + 1)],
        "rows": v,
        "note": f"n{v}",
    }
    if key:
        body["idempotency_key"] = key
    LocalFS().create_new(
        f"{base}/{st.COMMITS_DIR}/{st._vname(v)}",
        json.dumps(body).encode(),
    )


def test_walkers_read_o_new_markers_with_checkpoint(spark, tmp_path):
    base = str(tmp_path / "t")
    for v in range(1, 61):
        _mk_marker(base, v, key="k10" if v == 10 else None)
    assert write_commit_checkpoint(spark, base) == 60
    for v in range(61, 66):
        _mk_marker(base, v)

    # history: 1 checkpoint read + 5 post-checkpoint markers
    cfs = CountingFS()
    hist = snapshot_history(spark, base, fs=cfs)
    assert hist.count() == 65
    assert cfs.read_files <= 10, cfs.read_files

    # idempotency MISS walks the whole window through the checkpoint
    cfs = CountingFS()
    assert _find_idempotent(spark, base, cfs, "absent") is None
    assert cfs.read_files <= 10, cfs.read_files
    # ...and a HIT on a pre-checkpoint key is found from the checkpoint
    cfs = CountingFS()
    assert _find_idempotent(spark, base, cfs, "k10") == 10
    assert cfs.read_files <= 10, cfs.read_files

    # timestamp travel
    cfs = CountingFS()
    assert version_as_of(spark, base, 1030.5, fs=cfs) == 30
    assert cfs.read_files <= 10, cfs.read_files

    # the uncheckpointed walk really was O(versions) — the baseline
    # the checkpoint removes
    LocalFS().delete(f"{base}/{CKPTS_DIR}")
    cfs = CountingFS()
    assert snapshot_history(spark, base, fs=cfs).count() == 65
    assert cfs.read_files >= 65


def test_checkpointed_walk_is_value_identical(spark, tmp_path):
    base = str(tmp_path / "t")
    write_snapshot(
        spark.range(0, 20).select(
            "id", F.md5(F.col("id").cast("string")).alias("payload")
        ),
        base,
    )
    for i in range(1, 4):
        append_snapshot(
            spark.range(20 * i, 20 * (i + 1)).select(
                "id", F.md5(F.col("id").cast("string")).alias("payload")
            ),
            base,
        )
    before_hist = sorted(
        tuple(r) for r in snapshot_history(spark, base).collect()
    )
    before_feed = sorted(
        tuple(r)
        for r in snapshot_changes(
            spark, base, "id", from_version=1
        ).collect()
    )
    assert write_commit_checkpoint(spark, base) == 4
    append_snapshot(
        spark.range(80, 90).select(
            "id", F.md5(F.col("id").cast("string")).alias("payload")
        ),
        base,
    )
    # history/feed spanning the checkpoint boundary == direct walk
    with_ck_hist = sorted(
        tuple(r) for r in snapshot_history(spark, base).collect()
    )
    with_ck_feed = sorted(
        tuple(r)
        for r in snapshot_changes(
            spark, base, "id", from_version=1
        ).collect()
    )
    LocalFS().delete(f"{base}/{CKPTS_DIR}")
    assert with_ck_hist == sorted(
        tuple(r) for r in snapshot_history(spark, base).collect()
    )
    assert with_ck_feed == sorted(
        tuple(r)
        for r in snapshot_changes(
            spark, base, "id", from_version=1
        ).collect()
    )
    assert [t[0] for t in before_hist] == [1, 2, 3, 4]
    assert len(before_feed) == 60  # appends after v1


def test_corrupt_checkpoint_degrades_to_direct_reads(spark, tmp_path):
    base = str(tmp_path / "t")
    for v in range(1, 6):
        _mk_marker(base, v)
    LocalFS().create_new(
        f"{base}/{CKPTS_DIR}/{st._ckpt_name(9)}", b"{not json"
    )
    assert snapshot_history(spark, base).count() == 5
    assert version_as_of(spark, base, 1003.0) == 3


def test_commit_loop_rolls_checkpoints_automatically(
    spark, tmp_path, monkeypatch
):
    monkeypatch.setattr(st, "CHECKPOINT_EVERY", 5)
    base = str(tmp_path / "t")
    df = spark.range(0, 5).select(
        "id", F.md5(F.col("id").cast("string")).alias("payload")
    )
    write_snapshot(df, base)
    for i in range(1, 7):
        append_snapshot(
            spark.range(5 * i, 5 * (i + 1)).select(
                "id", F.md5(F.col("id").cast("string")).alias("payload")
            ),
            base,
        )
    names = LocalFS().listdir(f"{base}/{CKPTS_DIR}")
    assert st._ckpt_name(5) in names
    # and the table still behaves identically through it
    feed = snapshot_changes(spark, base, "id", from_version=1)
    assert feed.count() == 30


def test_gc_keeps_newest_two_checkpoints_and_stays_correct(
    spark, tmp_path
):
    base = str(tmp_path / "t")
    df = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        "id", F.md5(F.col("id").cast("string")).alias("payload")
    )
    write_snapshot(df(0, 10), base)
    for i in range(1, 6):
        append_snapshot(df(10 * i, 10 * (i + 1)), base)
        write_commit_checkpoint(spark, base)
    assert len(LocalFS().listdir(f"{base}/{CKPTS_DIR}")) == 5
    removed = gc_snapshots(
        spark, base, keep=2, orphan_min_age_s=0.0
    )
    assert removed == [1, 2, 3, 4]
    cks = LocalFS().listdir(f"{base}/{CKPTS_DIR}")
    assert sorted(cks) == [st._ckpt_name(5), st._ckpt_name(6)]
    # checkpoints referencing GC'd versions are harmless: walkers
    # intersect with the live marker listing
    assert committed_versions(spark, base) == [5, 6]
    assert [r["version"] for r in
            snapshot_history(spark, base).collect()] == [5, 6]
    from vector_db_setup_spark.sources.snapshot_table import read_snapshot

    assert read_snapshot(spark, base).count() == 60


def test_keep0_reset_discards_old_generation_checkpoints(
    spark, tmp_path
):
    """A keep=0 GC empties the table; the next commit REUSES version
    1 — an old-generation checkpoint would serve a stale marker body
    for the reused number, so GC must discard every checkpoint newer
    than the surviving head (here: all of them)."""
    base = str(tmp_path / "t")
    df = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        "id", F.md5(F.col("id").cast("string")).alias("payload")
    )
    write_snapshot(df(0, 10), base)
    append_snapshot(df(10, 20), base)
    write_commit_checkpoint(spark, base)
    gc_snapshots(spark, base, keep=0, orphan_min_age_s=0.0)
    assert committed_versions(spark, base) == []
    assert LocalFS().listdir(
        f"{base}/{CKPTS_DIR}"
    ) == []  # poison removed
    # the table regrows from v1 with fresh content; walkers must see
    # the NEW generation's bodies
    write_snapshot(df(100, 130), base, note="gen2")
    hist = snapshot_history(spark, base).collect()
    assert [(r["version"], r["note"], r["rows"]) for r in hist] == [
        (1, "gen2", 30)
    ]
    from vector_db_setup_spark.sources.snapshot_table import read_snapshot

    assert read_snapshot(spark, base).count() == 30


def test_crashed_keep0_gc_leaves_no_poison_window(spark, tmp_path):
    """ADVICE r9 #2: a keep=0 GC that crashed AFTER its marker/data
    sweep but BEFORE its checkpoint sweep leaves an old-generation
    checkpoint above the (empty) live head. The rebuilt table reuses
    version numbers; the next GC must NOT build its orphan-protection
    'referenced' set from the stale checkpoint bodies (it would
    reclaim the new generation's live dirs), and walkers holding the
    live listing must ignore the stale entries meanwhile."""
    base = str(tmp_path / "t")
    fs = LocalFS()
    df = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        "id", F.md5(F.col("id").cast("string")).alias("payload")
    )
    write_snapshot(df(0, 10), base)
    append_snapshot(df(10, 20), base)
    append_snapshot(df(20, 30), base)
    write_commit_checkpoint(spark, base)            # ckpt-v3, gen 1
    # simulate the crashed keep=0 GC: markers and data gone, the
    # checkpoint sweep never ran
    for name in list(fs.listdir(f"{base}/{st.COMMITS_DIR}")):
        fs.delete(f"{base}/{st.COMMITS_DIR}/{name}")
    for name in list(fs.listdir(base)):
        if name.startswith(st.DATA_PREFIX):
            fs.delete(f"{base}/{name}")
    assert fs.listdir(f"{base}/{CKPTS_DIR}") == [st._ckpt_name(3)]
    # generation 2 reuses v1/v2
    write_snapshot(df(100, 150), base, note="gen2")
    append_snapshot(df(150, 160), base, note="gen2b")
    # walkers with the live listing ignore the stale gen-1 bodies
    hist = snapshot_history(spark, base).collect()
    assert [(r["version"], r["note"]) for r in hist] == [
        (1, "gen2"), (2, "gen2b")
    ]
    # the next GC sweeps the poison checkpoint FIRST and must not
    # orphan-reclaim gen 2's live dirs
    removed = gc_snapshots(spark, base, keep=2, orphan_min_age_s=0.0)
    assert removed == []
    assert st._ckpt_name(3) not in fs.listdir(f"{base}/{CKPTS_DIR}")
    from vector_db_setup_spark.sources.snapshot_table import read_snapshot

    assert read_snapshot(spark, base).count() == 60  # no data loss
