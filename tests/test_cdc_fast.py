"""Fast CDC attribution (snapshot_changes fast=True): append/delete/
compact steps are attributed from marker structure in O(batch) instead
of a full-outer value-hashing diff — pinned EQUAL to the fast=False
oracle over mixed chains, plan-asserted to skip the hash join, and
refusing the same duplicate-key illegality the full diff refuses."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from vector_db_setup_spark.sources.snapshot_table import (
    COMMITS_DIR,
    append_snapshot,
    compact_snapshot,
    delete_from_snapshot,
    rollback_snapshot,
    snapshot_changes,
    snapshot_info,
    upsert_snapshot,
    write_snapshot,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        "id", F.md5(F.col("id").cast("string")).alias("payload")
    )


def _feed(spark, base, key="id", **kw):
    return {
        (r[key], r["status"], r["version"])
        for r in snapshot_changes(
            spark, base, key, from_version=1, **kw
        ).collect()
    }


def test_fast_equals_full_diff_over_mixed_chain(spark, tmp_path):
    base = str(tmp_path / "t")
    write_snapshot(_df(spark, 0, 20), base)                      # v1
    append_snapshot(_df(spark, 20, 30), base)                    # v2
    delete_from_snapshot(
        spark.range(0, 5).select("id"), base, key_col="id"
    )                                                            # v3
    append_snapshot(_df(spark, 30, 35), base)                    # v4
    upsert_snapshot(
        _df(spark, 10, 12).withColumn("payload", F.lit("x")),
        base,
        key_col="id",
    )                                                            # v5
    compact_snapshot(spark, base)                                # v6
    append_snapshot(_df(spark, 35, 40), base)                    # v7
    assert {
        snapshot_info(spark, base, v)["op"]
        for v in (1, 2, 3, 4, 5, 6, 7)
    } == {"write", "append", "delete", "upsert", "compact"}
    fast = _feed(spark, base, fast=True)
    slow = _feed(spark, base, fast=False)
    assert fast == slow
    # spot semantics: v3 removed 0..4, v5 changed 10,11, v6 silent
    assert {(i, "removed", 3) for i in range(5)} <= fast
    assert {(10, "changed", 5), (11, "changed", 5)} <= fast
    assert not any(v == 6 for _, _, v in fast)


def test_fast_append_step_plan_skips_value_hash_join(spark, tmp_path):
    base = str(tmp_path / "t")
    write_snapshot(_df(spark, 0, 50), base)
    append_snapshot(_df(spark, 50, 60), base)
    fast_plan = (
        snapshot_changes(spark, base, "id", from_version=1, fast=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    slow_plan = (
        snapshot_changes(spark, base, "id", from_version=1, fast=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "xxhash64" not in fast_plan
    assert "FullOuter" not in fast_plan
    assert "xxhash64" in slow_plan  # the cost the fast path removes


def test_fast_refuses_relanded_key_like_the_full_diff(spark, tmp_path):
    base = str(tmp_path / "t")
    write_snapshot(_df(spark, 0, 10), base)
    append_snapshot(_df(spark, 5, 15), base)  # 5..9 re-landed
    with pytest.raises(ValueError, match="re-land"):
        snapshot_changes(
            spark, base, "id", from_version=1, fast=True
        ).collect()
    with pytest.raises(ValueError, match="duplicate"):
        snapshot_changes(
            spark, base, "id", from_version=1, fast=False
        ).collect()


def test_fast_delete_respects_absent_keys_and_foreign_cdc_key(
    spark, tmp_path
):
    base = str(tmp_path / "t")
    write_snapshot(_df(spark, 0, 10), base)
    # tombstone 7..12: only 7,8,9 are present
    delete_from_snapshot(
        spark.range(7, 13).select("id"), base, key_col="id"
    )
    fast = _feed(spark, base, fast=True)
    assert fast == _feed(spark, base, fast=False)
    assert {i for i, s, v in fast if s == "removed"} == {7, 8, 9}
    # CDC keyed on a DIFFERENT column than the tombstone key
    fast_p = _feed(spark, base, key="payload", fast=True)
    assert fast_p == _feed(spark, base, key="payload", fast=False)
    assert len([1 for _, s, _ in fast_p if s == "removed"]) == 3


def test_pre_op_markers_fall_back_to_full_diff(spark, tmp_path):
    base = str(tmp_path / "t")
    write_snapshot(_df(spark, 0, 10), base)
    append_snapshot(_df(spark, 10, 15), base)
    # simulate a marker written before the op field existed
    mp = os.path.join(base, COMMITS_DIR, "v00000002")
    body = json.loads(open(mp).read())
    del body["op"]
    os.remove(mp)
    with open(mp, "w") as f:
        f.write(json.dumps(body))
    fast = _feed(spark, base, fast=True)
    assert fast == {(i, "added", 2) for i in range(10, 15)}
    assert fast == _feed(spark, base, fast=False)


def test_rollback_step_uses_full_diff(spark, tmp_path):
    base = str(tmp_path / "t")
    write_snapshot(_df(spark, 0, 10), base)      # v1
    append_snapshot(_df(spark, 10, 15), base)    # v2
    rollback_snapshot(spark, base, to_version=1)  # v3: 10..14 vanish
    fast = _feed(spark, base, fast=True)
    assert fast == _feed(spark, base, fast=False)
    assert {(i, "removed", 3) for i in range(10, 15)} <= fast


def test_fast_delete_refuses_duplicate_removed_keys(spark, tmp_path):
    """Removing rows that share a CDC key would double-deliver
    'removed' to consumers — the fast path must refuse like the full
    diff does (the full diff refuses ANY duplicate in the pair; the
    fast step guards the rows it emits)."""
    base = str(tmp_path / "t")
    dup = spark.createDataFrame(
        [(7, "a"), (7, "b"), (8, "c")], "id long, payload string"
    )
    write_snapshot(dup, base)
    delete_from_snapshot(
        spark.createDataFrame([(7,)], "id long"), base, key_col="id"
    )
    with pytest.raises(ValueError, match="duplicate"):
        snapshot_changes(
            spark, base, "id", from_version=1, fast=True
        ).collect()
    with pytest.raises(ValueError, match="duplicate"):
        snapshot_changes(
            spark, base, "id", from_version=1, fast=False
        ).collect()


def test_consecutive_append_run_coalesces_with_exact_versions(
    spark, tmp_path
):
    """A catch-up over N consecutive appends is attributed in ONE pass
    — per-version attribution must still be exact, equal to the
    full-diff oracle, and the guards still fire across the run."""
    base = str(tmp_path / "t")
    write_snapshot(_df(spark, 0, 10), base)
    for i in range(1, 6):
        append_snapshot(_df(spark, 10 * i, 10 * (i + 1)), base)
    fast = _feed(spark, base, fast=True)
    assert fast == _feed(spark, base, fast=False)
    assert fast == {
        (k, "added", 1 + k // 10) for k in range(10, 60)
    }
    # a re-landed key anywhere in the run still raises
    append_snapshot(_df(spark, 5, 8), base)  # also an append step
    with pytest.raises(ValueError, match="re-land"):
        snapshot_changes(
            spark, base, "id", from_version=1, fast=True
        ).collect()


def test_fast_cdc_on_partitioned_table(spark, tmp_path):
    """Fast attribution must hold when the table is hive-partitioned —
    batch dirs read back with their partition columns, including when
    the CDC key IS the partition column."""
    base = str(tmp_path / "t")
    part = lambda lo, hi: _df(spark, lo, hi).withColumn(  # noqa: E731
        "bucket", (F.col("id") % 3).cast("int")
    )
    write_snapshot(part(0, 30), base, partition_by=["bucket"])
    append_snapshot(part(30, 45), base, partition_by=["bucket"])
    delete_from_snapshot(
        spark.range(0, 4).select("id"), base, key_col="id"
    )
    fast = _feed(spark, base, fast=True)
    assert fast == _feed(spark, base, fast=False)
    assert {(i, "added", 2) for i in range(30, 45)} <= fast
    # CDC keyed on the PARTITION column: bucket repeats across rows,
    # so the keyed diff is undefined — BOTH paths must refuse
    with pytest.raises(ValueError, match="duplicate|re-land"):
        snapshot_changes(
            spark, base, "bucket", from_version=1, fast=True
        ).collect()
    with pytest.raises(ValueError, match="duplicate"):
        snapshot_changes(
            spark, base, "bucket", from_version=1, fast=False
        ).collect()
