"""Bulk ingest (SURVEY.md §2.1 S2): the Spark analogue of the
reference's one-time `pg_restore` load (setup.sh:73-77).

A restore-into-engine becomes read-source → write-parquet(-partitioned):
distributed, restartable (overwrite per partition), and the written
layout IS the index (partition pruning + min/max row-group stats).
Actual-database interop for migrating off the reference's live
Postgres lives in `sources/jdbc.py` (partitioned `spark.read.jdbc`
pulls + one-shot parquet landing), exercised end-to-end against
embedded Derby in tests/test_jdbc.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def ingest(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    fmt: str = "json",
    schema=None,
    partition_by: list[str] | None = None,
    repartition: int | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Load `src_path` (json/jsonl, csv, parquet) and land it as parquet.

    `repartition` controls output file count/size — at 100 TB aim for
    ~128 MB-1 GB files (small-file storms kill scan throughput);
    `partition_by` should be the dominant pruning key (date for events,
    cluster_id for IVF-assigned vectors).
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    df = reader.format(fmt).load(src_path)
    out = df.repartition(repartition) if repartition else df
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(dest_path)
    return spark.read.parquet(dest_path)


def upsert_partitions(
    df: DataFrame,
    dest_path: str,
    partition_by: list[str],
    repartition: int | None = None,
) -> None:
    """Incremental load: overwrite ONLY the partitions present in `df`
    (dynamic partition overwrite), leaving all other partitions intact.

    This is the at-scale idempotent ingestion pattern: a daily/hourly
    batch re-lands just its own date partitions, so replays and
    backfills are safe without rewriting the table. Static overwrite
    (the default) would drop every other partition — the config flip is
    scoped to this write and restored afterwards.
    """
    out = df.repartition(repartition) if repartition else df
    (
        out.write.mode("overwrite")
        # per-WRITER option, not the session conf: flipping the session
        # conf raced concurrent writers on the same SparkSession (one
        # thread's finally-restore could land mid-resolution of another
        # thread's write, turning it into a static overwrite that drops
        # every other partition)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(dest_path)
    )


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 1,
    partition_by: list[str] | None = None,
    keep_backup: bool = False,
    fs=None,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_bytes / target_file_bytes) files (floored at min_files).

    Streaming sinks and incremental upserts accumulate small files; at
    100 TB the file count — not the byte count — kills scan planning
    (driver-side listing + one task per tiny file). Compaction is the
    standard maintenance pass: size from the actual footprint, one
    coalesce-write, swap. Returns the ACTUAL parquet file count on disk
    after the rewrite (with partition_by, coalesce(n) bounds files PER
    TASK, not per partition value — the count reports what really
    landed).

    Storage: every directory operation (sizing, swap, delete) routes
    through the ``fs`` contract (``sources/fs.py``) — default resolves
    by path scheme: LocalFS for bare paths, the Hadoop FileSystem API
    for ``hdfs://``/``s3a://``/``gs://``/``file://`` URIs, so the same
    code lands on HDFS and object stores. Object-store caveat: rename
    is copy+delete there — the swap window widens from metadata-op to
    O(bytes); for concurrent-reader compaction on object stores prefer
    a transactional table format (Iceberg rewrite_data_files / Delta
    OPTIMIZE). Hive-partitioned layouts: pass ``partition_by`` so the
    rewrite preserves the partition columns (sizing already walks
    recursively); without it a partitioned input is flattened.

    The swap is NOT atomic — there is a window between the two renames
    where ``path`` is absent; concurrent readers must be fenced
    externally. When readers are concurrent and can't be fenced, use
    the pointer-committed layout instead (`sources/snapshot_table`:
    immutable version dirs + exclusive-create commit markers —
    `compact_snapshot` there has NO window at all). The pre-compaction data is kept at ``<path>__compact_old``
    when ``keep_backup=True`` (verify, then delete); by default it is
    removed only after the new directory is verified readable. A crash
    mid-swap always leaves a complete copy at ``path`` or the backup —
    the ordering (backup first, verify before delete) is pinned by
    tests including a simulated rename-is-copy object store.
    """
    from vector_db_setup_spark.sources.fs import get_fs

    fs = fs or get_fs(spark, path)
    total, _n = fs.du_suffix(path, ".parquet")
    n_out = max(min_files, (total + target_file_bytes - 1) // target_file_bytes)
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compact_tmp"
    writer = df.coalesce(int(n_out)).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    # verify the rewrite BEFORE touching the original (the
    # _compact_partials ordering): a full count() reads every footer +
    # row group (schema resolution alone touched one footer and missed
    # truncated part files), and comparing it against the source count
    # catches a silently LOSSY rewrite — a bare readability check
    # passed one that dropped rows
    want = df.count()
    got = spark.read.parquet(tmp).count()
    if got != want:
        raise RuntimeError(
            f"compact_parquet verification failed: rewrote {got} rows, "
            f"expected {want}; original untouched, attempt left at {tmp}"
        )

    back = path.rstrip("/") + "__compact_old"
    if fs.exists(back):
        # never nest the live dir into a stale backup or silently
        # delete a backup a previous keep_backup=True run asked to keep
        raise FileExistsError(
            f"{back} already exists — verify/remove the previous "
            "compaction backup before re-compacting"
        )
    fs.move(path, back)
    fs.move(tmp, path)
    # re-verify the swapped-in copy before dropping the only remaining
    # one; on failure RESTORE the original rather than leaving a broken
    # directory live at `path` (the sibling _compact_partials contract)
    try:
        if spark.read.parquet(path).count() != want:
            raise RuntimeError(
                "post-swap count mismatch (store moved a partial tree?)"
            )
    except Exception:
        fs.move(path, tmp)
        fs.move(back, path)
        raise
    if not keep_backup:
        fs.delete(back)
    _total, written = fs.du_suffix(path, ".parquet")
    return written
