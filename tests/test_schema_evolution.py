"""Schema evolution on the snapshot table (merge_schema appends):
evolved lineages read with union schemas (absent columns null-fill),
the schema_merged stamp rides every derived marker until compaction
rewrites the layout homogeneous, type changes are refused at commit
time, and the CDC surface offers projected diffs across evolution
boundaries (columns=), which the Bloom maintainer rides."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_setup_spark.sources.snapshot_table import (
    append_snapshot,
    compact_snapshot,
    current_version,
    delete_from_snapshot,
    read_snapshot,
    rollback_snapshot,
    snapshot_changes,
    snapshot_diff,
    snapshot_info,
    write_snapshot,
)


def _v1(spark, lo, hi):
    return spark.range(lo, hi).select(
        "id", F.md5(F.col("id").cast("string")).alias("payload")
    )


def _v2(spark, lo, hi):
    # evolved: adds a lang column
    return _v1(spark, lo, hi).withColumn("lang", F.lit("en"))


def test_plain_append_still_refuses_new_columns(spark, tmp_path):
    base = str(tmp_path / "t")
    write_snapshot(_v1(spark, 0, 10), base)
    with pytest.raises(ValueError, match="merge_schema=True"):
        append_snapshot(_v2(spark, 10, 20), base)


def test_merge_schema_append_null_fills_old_rows(spark, tmp_path):
    base = str(tmp_path / "t")
    write_snapshot(_v1(spark, 0, 10), base)
    v = append_snapshot(_v2(spark, 10, 15), base, merge_schema=True)
    assert snapshot_info(spark, base, v)["schema_merged"] is True
    df = read_snapshot(spark, base)
    assert set(df.columns) == {"id", "payload", "lang"}
    assert df.count() == 15
    assert df.filter(F.col("lang").isNull()).count() == 10
    assert df.filter(F.col("lang") == "en").count() == 5
    # time travel: v1 keeps its original two-column schema
    assert set(read_snapshot(spark, base, version=1).columns) == {
        "id",
        "payload",
    }


def test_merge_schema_append_may_omit_columns(spark, tmp_path):
    base = str(tmp_path / "t")
    write_snapshot(_v2(spark, 0, 10), base)
    append_snapshot(
        _v1(spark, 10, 14).select("id"), base, merge_schema=True
    )
    df = read_snapshot(spark, base)
    assert set(df.columns) == {"id", "payload", "lang"}
    assert df.filter(F.col("payload").isNull()).count() == 4


def test_type_change_refused_even_with_merge_schema(spark, tmp_path):
    base = str(tmp_path / "t")
    write_snapshot(_v1(spark, 0, 10), base)
    retyped = _v1(spark, 10, 20).withColumn(
        "payload", F.col("id").cast("double")
    )
    with pytest.raises(ValueError, match="type"):
        append_snapshot(retyped, base, merge_schema=True)
    with pytest.raises(ValueError, match="type"):
        append_snapshot(retyped, base)  # and without the flag too


def test_stamp_rides_matching_append_delete_rollback(spark, tmp_path):
    base = str(tmp_path / "t")
    write_snapshot(_v1(spark, 0, 10), base)
    append_snapshot(_v2(spark, 10, 15), base, merge_schema=True)
    # a later batch matching the UNION schema joins without the flag,
    # but the lineage stays heterogeneous -> stamp must persist
    v3 = append_snapshot(_v2(spark, 15, 20), base)
    assert snapshot_info(spark, base, v3)["schema_merged"] is True
    keys = spark.range(0, 3).select("id")
    v4 = delete_from_snapshot(keys, base, key_col="id")
    assert snapshot_info(spark, base, v4)["schema_merged"] is True
    assert read_snapshot(spark, base).count() == 17
    v5 = rollback_snapshot(spark, base, to_version=v3)
    assert snapshot_info(spark, base, v5)["schema_merged"] is True
    assert read_snapshot(spark, base).count() == 20


def test_compaction_materializes_union_schema_and_clears_stamp(
    spark, tmp_path
):
    base = str(tmp_path / "t")
    write_snapshot(_v1(spark, 0, 10), base)
    append_snapshot(_v2(spark, 10, 15), base, merge_schema=True)
    before = {
        tuple(r) for r in read_snapshot(spark, base).collect()
    }
    v = compact_snapshot(spark, base)
    info = snapshot_info(spark, base, v)
    assert "schema_merged" not in info
    after_df = read_snapshot(spark, base)
    assert set(after_df.columns) == {"id", "payload", "lang"}
    assert {tuple(r) for r in after_df.collect()} == before


def test_partitioned_evolved_append_reads_with_null_fill(
    spark, tmp_path
):
    base = str(tmp_path / "t")
    part1 = _v1(spark, 0, 10).withColumn(
        "bucket", (F.col("id") % 2).cast("int")
    )
    write_snapshot(part1, base, partition_by=["bucket"])
    part2 = _v2(spark, 10, 16).withColumn(
        "bucket", (F.col("id") % 2).cast("int")
    )
    append_snapshot(
        part2, base, partition_by=["bucket"], merge_schema=True
    )
    df = read_snapshot(spark, base)
    assert df.count() == 16
    assert df.filter(F.col("lang").isNull()).count() == 10
    # partition column survives the per-dir union read
    assert df.filter(F.col("bucket") == 1).count() == 8


def test_stats_pruning_on_evolved_version(spark, tmp_path):
    base = str(tmp_path / "t")
    write_snapshot(
        _v1(spark, 0, 100),
        base,
        stats_cols=["id"],
        cluster_by=["id"],
        cluster_files=4,
    )
    append_snapshot(
        _v2(spark, 100, 200),
        base,
        stats_cols=["id"],
        cluster_by=["id"],
        cluster_files=4,
        merge_schema=True,
    )
    got = read_snapshot(spark, base, key_between=("id", 150, 160))
    assert set(got.columns) == {"id", "payload", "lang"}
    assert sorted(r["id"] for r in got.collect()) == list(
        range(150, 161)
    )
    # the pruned read touched a strict subset of the version's files
    full = read_snapshot(spark, base)
    assert len(got.inputFiles()) < len(full.inputFiles())


def test_diff_refuses_boundary_unless_projected(spark, tmp_path):
    base = str(tmp_path / "t")
    write_snapshot(_v1(spark, 0, 10), base)
    append_snapshot(_v2(spark, 10, 15), base, merge_schema=True)
    with pytest.raises(ValueError, match="columns"):
        snapshot_diff(spark, base, 1, 2, key_col="id")
    got = {
        (r["id"], r["status"])
        for r in snapshot_diff(
            spark, base, 1, 2, key_col="id", columns=["payload"]
        )
        .filter(F.col("status") != "unchanged")
        .collect()
    }
    assert got == {(i, "added") for i in range(10, 15)}
    # key-presence-only projection: columns=[]
    feed = snapshot_changes(
        spark, base, "id", from_version=1, columns=[]
    )
    assert {
        (r["id"], r["status"], r["version"]) for r in feed.collect()
    } == {(i, "added", 2) for i in range(10, 15)}


def test_bloom_maintainer_survives_evolution_boundary(
    spark, tmp_path
):
    from vector_db_setup_spark.operators.bloom import (
        bloom_build,
        bloom_update_from_changes,
    )

    NB, K = 1 << 16, 3
    base = str(tmp_path / "t")
    write_snapshot(_v1(spark, 0, 50), base)
    words = bloom_build(
        read_snapshot(spark, base).select("id"), "id", NB, K
    )
    append_snapshot(_v2(spark, 50, 70), base, merge_schema=True)
    maintained = bloom_update_from_changes(
        spark, base, "id", words, from_version=1, num_bits=NB, k=K
    )
    rebuilt = bloom_build(
        read_snapshot(spark, base).select("id").distinct(), "id", NB, K
    )
    assert {
        (r["idx"], r["word"]) for r in maintained.collect()
    } == {(r["idx"], r["word"]) for r in rebuilt.collect()}


def test_key_in_point_lookup_prunes_files(spark, tmp_path):
    """key_in=(col, values): file skipping for batches of key probes —
    each value is a degenerate range; only files whose [min,max] could
    hold a probed value are read."""
    base = str(tmp_path / "t")
    write_snapshot(
        _v1(spark, 0, 400),
        base,
        stats_cols=["id"],
        cluster_by=["id"],
        cluster_files=8,
    )
    got = read_snapshot(spark, base, key_in=("id", [7, 363]))
    assert sorted(r["id"] for r in got.collect()) == [7, 363]
    full = read_snapshot(spark, base)
    # two probes landing in two distinct files out of 8
    assert len(got.inputFiles()) == 2 < len(full.inputFiles())
    # absent values return empty, exact schema
    none = read_snapshot(spark, base, key_in=("id", [100000]))
    assert none.count() == 0 and none.columns == full.columns
    # without stats: same rows, no pruning, never wrong
    base2 = str(tmp_path / "t2")
    write_snapshot(_v1(spark, 0, 400), base2)
    got2 = read_snapshot(spark, base2, key_in=("id", [7, 363]))
    assert sorted(r["id"] for r in got2.collect()) == [7, 363]
    with pytest.raises(ValueError, match="not both"):
        read_snapshot(
            spark, base, key_between=("id", 0, 5), key_in=("id", [1])
        )


def test_key_in_respects_tombstones(spark, tmp_path):
    base = str(tmp_path / "t")
    write_snapshot(
        _v1(spark, 0, 100),
        base,
        stats_cols=["id"],
        cluster_by=["id"],
        cluster_files=4,
    )
    delete_from_snapshot(
        spark.range(7, 8).select("id"), base, key_col="id"
    )
    got = read_snapshot(spark, base, key_in=("id", [7, 50]))
    assert sorted(r["id"] for r in got.collect()) == [50]


def test_compact_if_fires_only_past_thresholds(spark, tmp_path):
    from vector_db_setup_spark.sources.snapshot_table import compact_if

    base = str(tmp_path / "t")
    write_snapshot(_v1(spark, 0, 20), base)
    append_snapshot(_v1(spark, 20, 30), base)
    # 2 dirs, 0 tombstones: within budget -> no-op
    assert (
        compact_if(spark, base, max_data_dirs=4, max_delete_entries=2)
        is None
    )
    assert current_version(spark, base) == 2
    append_snapshot(_v1(spark, 30, 35), base)
    append_snapshot(_v1(spark, 35, 40), base)
    append_snapshot(_v1(spark, 40, 45), base)
    # 5 dirs > 4: compacts to one dir
    v = compact_if(spark, base, max_data_dirs=4, max_delete_entries=2)
    assert v == 6
    info = snapshot_info(spark, base, v)
    assert isinstance(info["data"], str) or len(info["data"]) == 1
    assert read_snapshot(spark, base).count() == 45
    # tombstone-stack trigger
    for i in range(3):
        delete_from_snapshot(
            spark.range(i, i + 1).select("id"), base, key_col="id"
        )
    assert (
        compact_if(spark, base, max_data_dirs=4, max_delete_entries=4)
        is None
    )
    v2 = compact_if(spark, base, max_data_dirs=4, max_delete_entries=2)
    assert v2 is not None
    assert read_snapshot(spark, base).count() == 42
    assert not snapshot_info(spark, base, v2).get("deletes")


def test_upsert_merge_schema_evolves_by_rewrite(spark, tmp_path):
    from vector_db_setup_spark.sources.snapshot_table import (
        upsert_snapshot,
    )

    base = str(tmp_path / "t")
    write_snapshot(_v1(spark, 0, 10), base)
    # updates carry a NEW column: old rows null-fill, and the rewrite
    # materializes the union schema with NO schema_merged lineage
    v = upsert_snapshot(
        _v2(spark, 5, 12), base, key_col="id", merge_schema=True
    )
    info = snapshot_info(spark, base, v)
    assert "schema_merged" not in info
    df = read_snapshot(spark, base)
    assert set(df.columns) == {"id", "payload", "lang"}
    assert df.count() == 12
    assert df.filter(F.col("lang").isNull()).count() == 5
    # updates OMITTING a column null-fill the other way
    v2 = upsert_snapshot(
        _v1(spark, 0, 2).select("id"),
        base,
        key_col="id",
        merge_schema=True,
    )
    df2 = read_snapshot(spark, base, version=v2)
    assert df2.filter(
        F.col("id").isin([0, 1]) & F.col("payload").isNull()
    ).count() == 2
    # without the flag, mismatched updates still fail
    with pytest.raises(Exception):
        upsert_snapshot(
            _v1(spark, 0, 2).withColumn("extra", F.lit(1)),
            base,
            key_col="id",
        )


def test_partitioned_evolved_stats_key_in_composition(spark, tmp_path):
    """The whole read stack at once: hive partitioning + merge_schema
    evolution + marker stats + key_in point lookups — pruned results
    must equal the unpruned filter, with partition columns and
    null-filled evolved columns intact."""
    base = str(tmp_path / "t")
    p1 = _v1(spark, 0, 120).withColumn(
        "bucket", (F.col("id") % 2).cast("int")
    )
    write_snapshot(
        p1, base, partition_by=["bucket"], stats_cols=["id"],
        cluster_by=["id"], cluster_files=4,
    )
    p2 = _v2(spark, 120, 200).withColumn(
        "bucket", (F.col("id") % 2).cast("int")
    )
    append_snapshot(
        p2, base, partition_by=["bucket"], stats_cols=["id"],
        cluster_by=["id"], cluster_files=4, merge_schema=True,
    )
    full = read_snapshot(spark, base)
    got = read_snapshot(spark, base, key_in=("id", [7, 150, 9999]))
    want = sorted(
        tuple(r) for r in full.filter(F.col("id").isin([7, 150])).collect()
    )
    assert sorted(tuple(r) for r in got.collect()) == want
    assert set(got.columns) == {"id", "payload", "lang", "bucket"}
    # ranged read across the evolution boundary
    got2 = read_snapshot(spark, base, key_between=("id", 100, 140))
    assert got2.count() == 41
    assert got2.filter(F.col("lang").isNull()).count() == 20
    assert len(got2.inputFiles()) < len(full.inputFiles())
