"""Regression pins for the r10 review-pass findings on the snapshot
table: upsert layout/stats inheritance, pruned-read schema stability
on evolved lineages, the merge fast-CDC duplicate-prior guard, the
tag-vs-GC TOCTOU re-check, null-key refusals distinct from duplicate
refusals, version-format overflow, and the delete-run fallback's
single-probe contract."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

import vector_db_setup_spark.sources.snapshot_table as st
from vector_db_setup_spark.sources.snapshot_table import (
    append_snapshot,
    delete_from_snapshot,
    merge_snapshot,
    read_snapshot,
    snapshot_changes,
    snapshot_diff,
    snapshot_info,
    tag_snapshot,
    upsert_snapshot,
    write_snapshot,
)


def _df(spark, rows, schema="id long, cat string, v string"):
    return spark.createDataFrame(rows, schema)


def test_upsert_inherits_partitioning_and_stats(spark, tmp_path):
    """One upsert must not flatten a hive-partitioned head or drop its
    file-skipping stats: the next partitioned append previously raised
    a layout mismatch and readers silently lost pruning."""
    base = str(tmp_path / "t")
    write_snapshot(
        _df(spark, [(1, "a", "x"), (2, "b", "y")]), base,
        partition_by=["cat"],
    )
    upsert_snapshot(_df(spark, [(2, "b", "y2"), (3, "a", "z")]), base, "id")
    info = snapshot_info(spark, base, 2)
    assert info.get("partition_by") == ["cat"]
    # the pipeline shape that used to break: partitioned append on top
    append_snapshot(
        _df(spark, [(4, "b", "w")]), base, partition_by=["cat"]
    )
    got = {
        (r["id"], r["cat"], r["v"])
        for r in read_snapshot(spark, base).collect()
    }
    assert got == {(1, "a", "x"), (2, "b", "y2"), (3, "a", "z"), (4, "b", "w")}


def test_upsert_inherits_stats_cols(spark, tmp_path):
    base = str(tmp_path / "t")
    write_snapshot(
        spark.range(0, 100).select(
            F.col("id"), F.col("id").cast("string").alias("v")
        ),
        base, stats_cols=["id"], cluster_by=["id"], cluster_files=4,
    )
    upsert_snapshot(
        spark.range(100, 110).select(
            F.col("id"), F.lit("new").alias("v")
        ),
        base, "id",
    )
    stats = snapshot_info(spark, base, 2).get("stats")
    assert stats and stats.get("cols") == ["id"]
    # and the pruned read still skips + returns the right rows
    got = {
        r["id"]
        for r in read_snapshot(
            spark, base, key_between=("id", 100, 109)
        ).collect()
    }
    assert got == set(range(100, 110))


def test_pruned_read_of_evolved_lineage_keeps_union_schema(spark, tmp_path):
    """A key_between probe whose surviving files all predate an evolved
    column must STILL return that column (null-filled) — the schema of
    a version cannot depend on the probe range."""
    base = str(tmp_path / "t")
    write_snapshot(
        spark.range(0, 50).select(F.col("id"), F.lit("x").alias("a")),
        base, stats_cols=["id"], cluster_by=["id"], cluster_files=2,
    )
    append_snapshot(
        spark.range(1000, 1050).select(
            F.col("id"), F.lit("y").alias("a"), F.lit(7).alias("extra")
        ),
        base, merge_schema=True, stats_cols=["id"],
    )
    full = read_snapshot(spark, base)
    pruned = read_snapshot(spark, base, key_between=("id", 0, 49))
    assert sorted(pruned.columns) == sorted(full.columns)
    rows = pruned.collect()
    assert len(rows) == 50 and all(r["extra"] is None for r in rows)
    # the evolved-dir side keeps its values through the same path
    hi = read_snapshot(spark, base, key_between=("id", 1000, 1049))
    assert sorted(hi.columns) == sorted(full.columns)
    assert all(r["extra"] == 7 for r in hi.collect())


def test_merge_fast_cdc_refuses_duplicate_prior_keys(spark, tmp_path):
    """A prior version holding duplicate keys (legal via
    write_snapshot) must not make the fast merge attribution silently
    emit doubled rows: fast falls back to the full diff, which raises
    its canonical duplicate refusal — fast and oracle agree."""
    base = str(tmp_path / "t")
    write_snapshot(
        _df(spark, [(1, "a", "x"), (1, "a", "x2"), (2, "b", "y")]), base
    )
    merge_snapshot(_df(spark, [(1, "a", "x3")]), base, key_col="id")
    for fast in (True, False):
        with pytest.raises(ValueError, match="duplicate"):
            snapshot_changes(
                spark, base, "id", from_version=1, fast=fast,
                columns=["v"],
            ).collect()


def test_tag_snapshot_undoes_pin_when_gc_wins_race(spark, tmp_path):
    """If a concurrent GC reclaims the version between tag_snapshot's
    existence check and its create, the pin is undone and the call
    raises — no permanent tag naming a destroyed version."""
    base = str(tmp_path / "t")
    write_snapshot(_df(spark, [(1, "a", "x")]), base)
    write_snapshot(_df(spark, [(2, "b", "y")]), base)
    fs = st._resolve_fs(spark, base, None)
    real_create = fs.create_new
    marker = f"{base}/{st.COMMITS_DIR}/{st._vname(1)}"

    def racing_create(path, body):
        if st.TAGS_DIR in path:
            fs.delete(marker)  # the GC sneaks in mid-tag
        return real_create(path, body)

    fs.create_new = racing_create
    try:
        with pytest.raises(FileNotFoundError, match="concurrent GC"):
            tag_snapshot(spark, base, "pin1", version=1, fs=fs)
    finally:
        fs.create_new = real_create
    assert not fs.exists(f"{base}/{st.TAGS_DIR}/pin1")


def test_null_key_refused_with_its_own_message(spark, tmp_path):
    base = str(tmp_path / "t")
    write_snapshot(_df(spark, [(1, "a", "x")]), base)
    null_batch = spark.createDataFrame(
        [(None, "a", "z")], "id long, cat string, v string"
    )
    with pytest.raises(ValueError, match="NULL id"):
        upsert_snapshot(null_batch, base, "id")
    with pytest.raises(ValueError, match="NULL id"):
        merge_snapshot(null_batch, base, key_col="id")
    # a table version holding a null key: the diff says NULL, not
    # 'duplicate keys' (countDistinct ignores nulls — the old guard
    # misdiagnosed)
    write_snapshot(
        _df(spark, [(1, "a", "x")]).unionByName(null_batch), base
    )
    with pytest.raises(ValueError, match="NULL id"):
        snapshot_diff(spark, base, 1, 2, "id").collect()


def test_version_format_overflow_refused_loudly(spark):
    with pytest.raises(ValueError, match="digit capacity"):
        st._vname(10**st._V_DIGITS)
    assert st._vname(10**st._V_DIGITS - 1)  # the last valid one formats


def test_delete_run_fallback_probes_once(spark, tmp_path, monkeypatch):
    """When the coalesced delete-run attribution bails, the fallback
    attributes the whole run per-step and jumps past it — the run
    kernel must be invoked ONCE for the storm, not once per remaining
    suffix (O(run²) schema probes)."""
    base = str(tmp_path / "t")
    write_snapshot(
        spark.range(0, 40).select(
            F.col("id"), F.col("id").cast("string").alias("v")
        ),
        base,
    )
    for lo in (0, 5, 10, 15):
        delete_from_snapshot(
            spark.range(lo, lo + 3).select(F.col("id")), base,
            key_col="id",
        )
    calls = []
    real = st._fast_delete_run

    def bailing(*a, **kw):
        calls.append(1)
        return None  # simulate the column-gap bail

    monkeypatch.setattr(st, "_fast_delete_run", bailing)
    feed = snapshot_changes(
        spark, base, "id", from_version=1, columns=["v"]
    )
    got = {(r["id"], r["status"], r["version"]) for r in feed.collect()}
    assert len(calls) == 1, f"run kernel re-probed {len(calls)} times"
    monkeypatch.setattr(st, "_fast_delete_run", real)
    want = {
        (r["id"], r["status"], r["version"])
        for r in snapshot_changes(
            spark, base, "id", from_version=1, columns=["v"], fast=False
        ).collect()
    }
    assert got == want and len(got) == 12
