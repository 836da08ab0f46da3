"""Day-2 retention policy (gc_with_retention_policy): the CDC feed's
slowest-consumer contract enforced by code — versions a lagging
commit-log subscriber still needs survive GC (keep widens to
cursor→head), an already-broken subscriber makes retention REFUSE
instead of destroying the evidence, and once the subscriber catches up
the same policy reclaims normally."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_setup_spark.sources.snapshot_table import (
    append_snapshot,
    committed_versions,
    gc_snapshots,
    gc_with_retention_policy,
    subscriber_cursor,
    write_snapshot,
)
from vector_db_setup_spark.streaming.commit_log import (
    maintain_agg_from_commits,
)


def _docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"),
    )


def test_lagging_subscriber_blocks_reclaim_until_caught_up(
    spark, tmp_path
):
    src = str(tmp_path / "src")
    state = str(tmp_path / "agg")
    ck = str(tmp_path / "ck")
    write_snapshot(_docs(spark, 0, 30), src)  # v1
    maintain_agg_from_commits(
        spark, src, state, ck, group_col="lang", key_col="doc_id"
    )  # subscriber cursor -> v1
    for i in range(1, 6):  # v2..v6
        append_snapshot(_docs(spark, 30 * i, 30 * (i + 1)), src)
    report = gc_with_retention_policy(
        spark, src, keep=2, subscriber_states=[state],
        orphan_min_age_s=0.0,
    )
    # the lagging subscriber (v1) pins everything: nothing reclaimed
    assert report["removed"] == []
    assert report["effective_keep"] == 6
    assert report["subscriber_cursors"] == {state: 1}
    assert committed_versions(spark, src) == [1, 2, 3, 4, 5, 6]
    # catch the subscriber up, then the SAME policy reclaims normally
    maintain_agg_from_commits(
        spark, src, state, ck, group_col="lang", key_col="doc_id"
    )
    report2 = gc_with_retention_policy(
        spark, src, keep=2, subscriber_states=[state],
        orphan_min_age_s=0.0,
    )
    assert report2["removed"] == [1, 2, 3, 4]
    assert report2["subscriber_cursors"] == {state: 6}
    # ...and the subscriber keeps working across the reclaim
    append_snapshot(_docs(spark, 180, 200), src)
    maintain_agg_from_commits(
        spark, src, state, ck, group_col="lang", key_col="doc_id"
    )
    from vector_db_setup_spark.sources.snapshot_table import read_snapshot

    maintained = {
        (r["lang"], r["cnt"])
        for r in read_snapshot(spark, state).collect()
    }
    rebuilt = {
        (r["lang"], r["cnt"])
        for r in read_snapshot(spark, src)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert maintained == rebuilt


def test_broken_subscriber_makes_retention_refuse(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "st")
    write_snapshot(_docs(spark, 0, 10), src)  # v1
    # a fabricated maintainer state stuck at v1
    write_snapshot(
        spark.createDataFrame([("a", 1)], "lang string, cnt long"),
        state,
        meta={"through_version": 1},
    )
    for i in range(1, 5):  # v2..v5
        append_snapshot(_docs(spark, 10 * i, 10 * (i + 1)), src)
    # an operator runs PLAIN gc behind the policy's back
    gc_snapshots(spark, src, keep=2, orphan_min_age_s=0.0)
    assert committed_versions(spark, src) == [4, 5]
    with pytest.raises(ValueError, match="resync"):
        gc_with_retention_policy(
            spark, src, keep=2, subscriber_states=[state],
            orphan_min_age_s=0.0,
        )
    # refusal reclaimed nothing
    assert committed_versions(spark, src) == [4, 5]


def test_cursor_forms(spark, tmp_path):
    # IVF-style dual cursor: min of the two halves
    ivf = str(tmp_path / "ivf")
    write_snapshot(
        spark.createDataFrame([(1,)], "vec_id long"),
        ivf,
        meta={
            "source_appended_through": 7,
            "source_deleted_through": 5,
        },
    )
    assert subscriber_cursor(spark, ivf) == 5
    # unbootstrapped state: no constraint
    assert subscriber_cursor(spark, str(tmp_path / "empty")) is None
    # a non-maintainer table refuses loudly
    other = str(tmp_path / "other")
    write_snapshot(spark.createDataFrame([(1,)], "x long"), other)
    with pytest.raises(ValueError, match="cursor"):
        subscriber_cursor(spark, other)


def test_maintenance_cycle_composes_the_day2_loop(spark, tmp_path):
    """maintenance_cycle runs drain → compact_if → checkpoint → GC in
    the contract-required order: cursors advance before the retention
    floor is computed, compaction lands after the drains (the next
    drain sees one free 'compact' step), the checkpoint rolls at the
    post-compaction head, and GC keeps exactly what the subscriber
    still needs."""
    import functools

    from vector_db_setup_spark.sources.fs import LocalFS
    from vector_db_setup_spark.sources.snapshot_table import (
        CKPTS_DIR,
        read_snapshot,
    )
    from vector_db_setup_spark.streaming.commit_log import (
        maintenance_cycle,
    )

    src = str(tmp_path / "src")
    state = str(tmp_path / "agg")
    ck = str(tmp_path / "ck")
    write_snapshot(_docs(spark, 0, 50), src)
    drain = functools.partial(
        maintain_agg_from_commits,
        spark, src, state, ck, group_col="lang", key_col="doc_id",
    )
    drain()  # bootstrap the subscriber
    for i in range(1, 5):  # v2..v5
        append_snapshot(_docs(spark, 50 * i, 50 * (i + 1)), src)
    report = maintenance_cycle(
        spark,
        src,
        drains=[drain],
        subscriber_states=[state],
        compact={"max_data_dirs": 2},
        gc={"keep": 2, "orphan_min_age_s": 0.0},
    )
    assert report["drained"] == 1
    # 5 data dirs > max_data_dirs=2 -> compaction fired as v6
    assert report["compacted_version"] == 6
    assert report["checkpointed_through"] == 6
    # the drain ran BEFORE compaction, so its cursor is v5; the floor
    # keeps v5..v6 and reclaims v1..v4
    assert report["gc"]["removed"] == [1, 2, 3, 4]
    assert report["gc"]["subscriber_cursors"] == {state: 5}
    assert committed_versions(spark, src) == [5, 6]
    assert LocalFS().listdir(f"{src}/{CKPTS_DIR}") != []
    # next cycle: subscriber absorbs the compact step as a free drain
    # and state still equals a from-scratch rebuild
    append_snapshot(_docs(spark, 250, 280), src)
    report2 = maintenance_cycle(
        spark,
        src,
        drains=[drain],
        subscriber_states=[state],
        gc={"keep": 2, "orphan_min_age_s": 0.0},
    )
    assert report2["gc"]["subscriber_cursors"] == {state: 7}
    maintained = {
        (r["lang"], r["cnt"])
        for r in read_snapshot(spark, state).collect()
    }
    rebuilt = {
        (r["lang"], r["cnt"])
        for r in read_snapshot(spark, src)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert maintained == rebuilt
