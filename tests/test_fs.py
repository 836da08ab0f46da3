"""The pluggable FS contract under the maintenance/swap paths
(sources/fs.py; VERDICT r5 item 2): the same swap code must run on the
Hadoop FileSystem API (the HDFS/object-store route) and must never
lose the only copy of the data under rename-is-copy object-store
semantics, including with injected mid-swap failures."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from vector_db_setup_spark.sources.fs import (
    HadoopFS,
    LocalFS,
    RenameIsCopyFS,
    get_fs,
)
from vector_db_setup_spark.sources.ingest import compact_parquet
from vector_db_setup_spark.streaming.events import _compact_partials


def _frag(spark, path: str, n: int = 5_000, parts: int = 17) -> list:
    spark.range(n).select(
        "id", F.md5(F.col("id").cast("string")).alias("payload")
    ).repartition(parts).write.parquet(path)
    return sorted(tuple(r) for r in spark.read.parquet(path).collect())


def test_get_fs_scheme_resolution(spark):
    """Bare paths -> LocalFS; scheme:// URIs -> HadoopFS. s3a/gs/abfs
    resolve through the same call but need their connector jar on the
    classpath (absent in this container — a missing connector must
    fail loudly at get_fs time, not mid-swap, which file:// proves by
    succeeding and s3a by raising)."""
    assert isinstance(get_fs(spark, "/tmp/x"), LocalFS)
    assert isinstance(get_fs(spark, "file:///tmp/x"), HadoopFS)
    with pytest.raises(Exception, match="S3AFileSystem not found"):
        get_fs(spark, "s3a://bucket/x")
    # NOT an allowlist: any scheme:// reaches Hadoop's own resolution
    # and fails loudly there if the connector is absent — silently
    # falling back to LocalFS would no-op remote deletes
    with pytest.raises(Exception):
        get_fs(spark, "viewfs://ns/x")


def test_hadoop_delete_false_return_raises(spark, tmp_path):
    """Hadoop FileSystem.delete signals failure by RETURNING false
    (e.g. path absent) — that must surface as an error like LocalFS's
    FileNotFoundError, not a silent success."""
    fs = HadoopFS(spark, f"file://{tmp_path}")
    with pytest.raises(OSError, match="returned false"):
        fs.delete(f"file://{tmp_path}/absent")
    fs.delete(f"file://{tmp_path}/absent", ignore_errors=True)  # no raise


def test_move_refuses_existing_destination(tmp_path):
    """Every implementation must refuse an existing move target —
    shutil nests, Hadoop rename returns false; both are swap bugs."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    os.makedirs(a)
    os.makedirs(b)
    for fs in (LocalFS(), RenameIsCopyFS()):
        with pytest.raises(FileExistsError):
            fs.move(a, b)


def test_hadoop_fs_contract_on_local_paths(spark, tmp_path):
    """HadoopFS through file:// resolves to Hadoop's LocalFileSystem —
    the REAL Hadoop API surface (Path, rename, listStatus, listFiles,
    delete), exercised without a cluster."""
    base = str(tmp_path / "h")
    os.makedirs(f"{base}/d1")
    with open(f"{base}/d1/x.parquet", "w") as f:
        f.write("abc")
    fs = HadoopFS(spark, f"file://{base}")
    assert fs.exists(f"file://{base}/d1")
    assert fs.listdir(f"file://{base}") == ["d1"]
    assert fs.listdir(f"file://{base}/absent") == []
    total, n = fs.du_suffix(f"file://{base}", ".parquet")
    assert (total, n) == (3, 1)
    fs.move(f"file://{base}/d1", f"file://{base}/d2")
    assert not fs.exists(f"file://{base}/d1")
    assert fs.exists(f"file://{base}/d2/x.parquet")
    with pytest.raises(FileExistsError):
        fs.move(f"file://{base}/d2", f"file://{base}/d2")
    fs.delete(f"file://{base}/d2")
    assert not fs.exists(f"file://{base}/d2")
    fs.delete(f"file://{base}/absent", ignore_errors=True)


def test_compact_parquet_via_hadoop_fs(spark, tmp_path):
    """The full compaction swap through the Hadoop FileSystem API."""
    path = str(tmp_path / "frag")
    before = _frag(spark, path)
    n = compact_parquet(
        spark, path, target_file_bytes=10**9, fs=HadoopFS(spark, path)
    )
    assert n == 1
    assert len(glob.glob(f"{path}/*.parquet")) == 1
    assert sorted(tuple(r) for r in spark.read.parquet(path).collect()) == before


def test_compact_parquet_rename_is_copy(spark, tmp_path):
    """Object-store rename semantics (copy+delete): the swap completes
    and the data is byte-identical."""
    path = str(tmp_path / "frag")
    before = _frag(spark, path)
    n = compact_parquet(
        spark, path, target_file_bytes=10**9, fs=RenameIsCopyFS()
    )
    assert n == 1
    assert sorted(tuple(r) for r in spark.read.parquet(path).collect()) == before
    assert not os.path.exists(path + "__compact_old")


def test_compact_parquet_crash_mid_swap_preserves_data(spark, tmp_path):
    """Injected failure between the two swap moves (the worst spot:
    live path absent). The backup-first ordering must leave the FULL
    pre-compaction data at <path>__compact_old — recover, don't
    corrupt."""
    path = str(tmp_path / "frag")
    before = _frag(spark, path)
    fs = RenameIsCopyFS(fail_after_moves=1)  # move 1 = path -> backup
    with pytest.raises(OSError):
        compact_parquet(spark, path, target_file_bytes=10**9, fs=fs)
    back = path + "__compact_old"
    assert os.path.exists(back)
    assert sorted(tuple(r) for r in spark.read.parquet(back).collect()) == before


def _partial_sink(spark, path: str) -> int:
    df = spark.range(300).select(
        (F.col("id") % 7).alias("k"),
        F.lit(1).alias("n"),
        (F.col("id") % 3).alias("_batch"),
    )
    df.write.mode("overwrite").partitionBy("_batch").parquet(path)
    return 300


def test_compact_partials_rename_is_copy(spark, tmp_path):
    """The streaming partial-sink fold + swap under object-store
    rename semantics: merged view identical, partials folded to
    _batch=-1."""
    path = str(tmp_path / "sink")
    want = _partial_sink(spark, path)
    _compact_partials(
        spark,
        path,
        key_cols=["k"],
        agg_exprs=[F.sum("n").alias("n")],
        verify=lambda df: df.agg(F.sum("n")).collect()[0][0],
        keep_batches_from=None,
        what="test",
        fs=RenameIsCopyFS(),
    )
    got = spark.read.parquet(path)
    assert got.agg(F.sum("n")).collect()[0][0] == want
    assert [r["_batch"] for r in got.select("_batch").distinct().collect()] == [-1]


def test_compact_partials_crash_mid_swap_preserves_data(spark, tmp_path):
    """Failure after base->backup but before tmp->base: the sink path
    is absent (documented non-atomic window) but the complete history
    must survive at <base>__old."""
    path = str(tmp_path / "sink")
    want = _partial_sink(spark, path)
    fs = RenameIsCopyFS(fail_after_moves=1)
    with pytest.raises(OSError):
        _compact_partials(
            spark,
            path,
            key_cols=["k"],
            agg_exprs=[F.sum("n").alias("n")],
            verify=lambda df: df.agg(F.sum("n")).collect()[0][0],
            keep_batches_from=None,
            what="test",
            fs=fs,
        )
    back = path + "__old"
    assert os.path.exists(back)
    assert spark.read.parquet(back).agg(F.sum("n")).collect()[0][0] == want
