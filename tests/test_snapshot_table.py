"""Pointer-committed snapshot table (sources/snapshot_table.py): the
commit protocol's safety properties — invisibility of uncommitted
data, no-window compaction under a pinned concurrent reader, crash
and race behavior, GC ordering — plus the same protocol through the
Hadoop FileSystem API."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_setup_spark.sources.fs import HadoopFS, LocalFS
from vector_db_setup_spark.sources.snapshot_table import (
    committed_versions,
    compact_snapshot,
    current_version,
    gc_snapshots,
    read_snapshot,
    snapshot_info,
    write_snapshot,
)


def _df(spark, n=500, parts=7):
    return spark.range(n).select(
        "id", F.md5(F.col("id").cast("string")).alias("payload")
    ).repartition(parts)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_write_read_roundtrip_and_versioning(spark, tmp_path):
    base = str(tmp_path / "t")
    v1 = write_snapshot(_df(spark, 100), base, note="first")
    assert v1 == 1 and current_version(spark, base) == 1
    v2 = write_snapshot(_df(spark, 200), base)
    assert v2 == 2 and committed_versions(spark, base) == [1, 2]
    assert read_snapshot(spark, base).count() == 200  # newest
    assert read_snapshot(spark, base, version=1).count() == 100  # time travel
    info = snapshot_info(spark, base, 1)
    assert info["rows"] == 100 and info["note"] == "first"


def test_uncommitted_dir_is_invisible_and_not_reallocated(spark, tmp_path):
    """A writer that died before its marker leaves an orphan: readers
    must not see it, read_snapshot(version=orphan) must refuse, and
    the next writer must NOT collide with the orphan's number."""
    import os

    base = str(tmp_path / "t")
    write_snapshot(_df(spark, 50), base)
    # simulate a crashed writer: data dir for v2 exists, no marker
    _df(spark, 999).write.parquet(f"{base}/v00000002")
    assert committed_versions(spark, base) == [1]
    assert read_snapshot(spark, base).count() == 50
    with pytest.raises(FileNotFoundError, match="not committed"):
        read_snapshot(spark, base, version=2)
    v = write_snapshot(_df(spark, 60), base)
    assert v == 3  # skipped the orphan's number
    assert read_snapshot(spark, base).count() == 60
    assert os.path.isdir(f"{base}/v00000002")  # orphan awaits GC


def test_compaction_has_no_window_for_pinned_reader(spark, tmp_path):
    """The property the directory-swap paths cannot give: a reader
    resolved BEFORE compaction reads its pinned version completely and
    correctly WHILE and AFTER the new compacted version lands."""
    import glob

    base = str(tmp_path / "t")
    write_snapshot(_df(spark, 1000, parts=23), base)
    reader = read_snapshot(spark, base)  # pinned to v1
    before = _rows(reader)
    v2 = compact_snapshot(spark, base, target_file_bytes=10**9)
    assert v2 == 2
    # new head is compacted to one file; pinned reader still exact
    assert len(glob.glob(f"{base}/v00000002/*.parquet")) == 1
    assert _rows(reader) == before
    assert _rows(read_snapshot(spark, base)) == before  # same data, new head
    assert snapshot_info(spark, base, 2)["note"] == "compacted v1"


def test_commit_race_second_writer_retries_to_next_version(spark, tmp_path):
    """Optimistic concurrency: steal version 2's marker before the
    writer commits — its create_new must lose, and the retry must land
    the data as version 3."""
    base = str(tmp_path / "t")
    write_snapshot(_df(spark, 10), base)

    class RacingFS(LocalFS):
        def __init__(self):
            self.stole = False

        def create_new(self, path, data=b""):
            if not self.stole and path.endswith("v00000002"):
                self.stole = True
                super().create_new(path, b'{"version": 2, "rows": 0}')
            super().create_new(path, data)

    v = write_snapshot(_df(spark, 20), base, fs=RacingFS())
    assert v == 3
    assert committed_versions(spark, base) == [1, 2, 3]
    assert read_snapshot(spark, base).count() == 20


def test_commit_race_exhaustion_raises(spark, tmp_path):
    base = str(tmp_path / "t")

    class AlwaysLosesFS(LocalFS):
        def create_new(self, path, data=b""):
            super().create_new(path, b"{}")  # rival always got there
            raise FileExistsError(path)

    with pytest.raises(RuntimeError, match="lost the commit race"):
        write_snapshot(_df(spark, 10), base, fs=AlwaysLosesFS(), retries=1)


def test_gc_keeps_newest_and_reclaims_orphans(spark, tmp_path):
    import os

    base = str(tmp_path / "t")
    for n in (10, 20, 30):
        write_snapshot(_df(spark, n), base)
    _df(spark, 5).write.parquet(f"{base}/v00000009")  # orphan
    # default grace refuses young orphans (could be an in-flight writer)
    assert gc_snapshots(spark, base, keep=2) == [1]
    removed = gc_snapshots(spark, base, keep=2, orphan_min_age_s=0)
    assert removed == [9]
    assert committed_versions(spark, base) == [2, 3]
    assert not os.path.exists(f"{base}/v00000001")
    assert not os.path.exists(f"{base}/v00000009")
    assert read_snapshot(spark, base).count() == 30
    # GC'd version is no longer resolvable
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, base, version=1)


def test_protocol_through_hadoop_fs(spark, tmp_path):
    """The full commit protocol (exclusive marker create included)
    through the Hadoop FileSystem API on file:// — the code path an
    HDFS/S3A deployment runs."""
    base = f"file://{tmp_path}/t"
    fs = HadoopFS(spark, base)
    v1 = write_snapshot(_df(spark, 100), base, fs=fs)
    assert v1 == 1
    assert committed_versions(spark, base, fs=fs) == [1]
    assert read_snapshot(spark, base, fs=fs).count() == 100
    v2 = compact_snapshot(spark, base, target_file_bytes=10**9, fs=fs)
    assert v2 == 2
    assert read_snapshot(spark, base, fs=fs).count() == 100
    # exclusive create refuses an existing marker through Hadoop too
    with pytest.raises(FileExistsError):
        fs.create_new(f"{base}/_commits/v00000001", b"x")
    assert gc_snapshots(spark, base, keep=1, fs=fs) == [1]


def test_data_dir_collision_retries(spark, tmp_path):
    """The COMMON two-writer race loses at the data dir, not the
    marker: a rival's dir for the allocated version makes
    mode('error') fail, and the writer must re-scan and land on the
    next number instead of surfacing the path-exists error."""
    base = str(tmp_path / "t")
    write_snapshot(_df(spark, 10), base)
    # rival occupied v2's data dir (uncommitted — mid-write)
    _df(spark, 999).write.parquet(f"{base}/v00000002")

    class StaleScanFS(LocalFS):
        """Simulates reading a stale listing: the first allocation scan
        doesn't see the rival's v2 dir yet."""
        def __init__(self):
            self.scans = 0

        def listdir(self, path):
            names = super().listdir(path)
            self.scans += 1
            if self.scans <= 2:  # first attempt's two scans miss v2
                names = [n for n in names if n != "v00000002"]
            return names

    v = write_snapshot(_df(spark, 20), base, fs=StaleScanFS())
    assert v == 3
    assert read_snapshot(spark, base).count() == 20


def test_idempotency_key_lands_exactly_once(spark, tmp_path):
    """Replayable producers (streaming foreachBatch) pass their batch
    id: the replay returns the ORIGINAL version and writes nothing."""
    import glob

    base = str(tmp_path / "t")
    v1 = write_snapshot(_df(spark, 100), base, idempotency_key="batch-7")
    files_before = sorted(glob.glob(f"{base}/v*/*.parquet"))
    v2 = write_snapshot(_df(spark, 999), base, idempotency_key="batch-7")
    assert v2 == v1
    assert sorted(glob.glob(f"{base}/v*/*.parquet")) == files_before
    assert read_snapshot(spark, base).count() == 100  # replay landed 0 rows
    # a NEW key lands normally
    v3 = write_snapshot(_df(spark, 50), base, idempotency_key="batch-8")
    assert v3 == v1 + 1
    assert snapshot_info(spark, base, v3)["idempotency_key"] == "batch-8"
