"""Training-shard export: the last mile of a curation pipeline.

After dedup/filter/pack, a training run consumes the corpus as
fixed-count shards with a manifest it can trust (doc counts, token
totals, content checksum per shard). The reference stops at rows in
Postgres (fever_multi_agent.py reads its corpus back by SELECT); an
at-scale pipeline lands shards instead, because the trainer's data
loader wants uniform, checksummable, independently-readable files.

Spark-first shape:

- shard assignment is a pure column expression (seed-stable md5 mod n)
  — no shuffle beyond the single partitionBy-write exchange;
- the manifest is one map-side-combinable aggregation per shard, with
  an ORDER-INDEPENDENT content checksum (bit_xor of per-row xxhash64
  over EVERY data column), so verification never needs a sort or a
  collect_list — mergeable at any scale;
- `verify_shards` recomputes the same aggregation from the WRITTEN
  files and diffs it against the manifest — a read-back audit that
  catches truncated/lost/duplicated rows per shard without comparing
  row-level data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DIR = "_manifest"

_MISSING_PATH_CONDITIONS = {"PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"}


def _is_missing_path(e) -> bool:
    """True iff an AnalysisException means 'the path holds no readable
    data' (absent dir / nothing to infer a schema from). Prefers the
    structured error condition (Spark 3.4+ ``getCondition``) over
    message-substring matching, which is brittle across Spark message
    format changes; the substring check remains as the fallback for
    builds where the condition is unset."""
    for attr in ("getCondition", "getErrorClass"):
        get = getattr(e, attr, None)
        if get is not None:
            try:
                cond = get()
            except Exception:
                cond = None
            if cond:
                return cond in _MISSING_PATH_CONDITIONS
    msg = str(e)
    return any(c in msg for c in _MISSING_PATH_CONDITIONS)


def assign_shard(df: DataFrame, n_shards: int, id_col: str = "doc_id",
                 seed: int = 0) -> DataFrame:
    """Seed-stable shard id: md5(id ':' seed) mod n_shards (the same
    hash-the-key family as queries.corpus_shard_assignment's shuffle).
    A doc's shard never depends on corpus membership — adding or
    removing other docs never reshuffles survivors.

    NULL ids hash an explicit '<null>' token: concat_ws silently SKIPS
    nulls, so without the coalesce every null-id doc would hash the
    bare seed string and collapse into one shard with identical
    checksum contributions, quietly weakening the audit. With the
    token they still co-locate (all nulls are one key — upstream
    validation should reject them) but the hash input is explicit and
    documented rather than an accident of concat_ws."""
    if n_shards <= 0:
        # h % 0 is NULL in non-ANSI Spark SQL: every row would land
        # under __HIVE_DEFAULT_PARTITION__ with a NULL-keyed manifest
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    if "shard_id" in df.columns:
        # withColumn would silently REPLACE the caller's column; its
        # values would vanish from the written shards and from the
        # checksum (data_cols excludes shard_id) — undetectable loss
        raise ValueError(
            "input already has a shard_id column — rename it first "
            "(assign_shard owns that name)"
        )
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(
                ":",
                F.coalesce(F.col(id_col).cast("string"), F.lit("<null>")),
                F.lit(str(seed)),
            )), 1, 15),
        16, 10,
    ).cast("bigint")
    return df.withColumn("shard_id", (h % n_shards).cast("int"))


def _refuse_unhashable_columns(df: DataFrame) -> None:
    """xxhash64 (the manifest checksum) defines no hash over MapType;
    without this check the failure surfaces in the MANIFEST aggregation
    — i.e. AFTER the shard data already landed, leaving a manifest-less
    destination. Refuse before any write starts; callers with map
    columns should serialize them (to_json) upstream."""
    bad = [c for c, t in df.dtypes if t.startswith("map<")]
    if bad:
        raise ValueError(
            f"columns {bad} are map-typed — the order-independent "
            "manifest checksum (xxhash64) cannot hash maps; serialize "
            "them (e.g. to_json) before sharding"
        )


def _shard_manifest(df: DataFrame, text_col: str | None) -> DataFrame:
    """Per-shard manifest row from an assigned DataFrame. The checksum
    is bit_xor(xxhash64(<every data column, name-sorted>)):
    order-independent and mergeable, so partial aggregates combine
    map-side and the same expression verifies a read-back regardless
    of file/row order. Hashing ALL columns (not just id + text) means
    an edit confined to any column — a fixed `lang` tag, a changed
    score — dirties its shard and fails a corrupted audit."""
    data_cols = sorted(c for c in df.columns if c != "shard_id")
    agg = [
        F.count(F.lit(1)).alias("n_docs"),
        F.bit_xor(
            F.xxhash64(*[F.col(c) for c in data_cols])
        ).alias("checksum"),
    ]
    if text_col is not None:
        agg.append(F.sum(F.length(F.col(text_col))).alias("total_chars"))
    return df.groupBy("shard_id").agg(*agg)


def write_training_shards(
    df: DataFrame,
    dest_path: str,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str | None = "text",
    seed: int = 0,
) -> DataFrame:
    """Land `df` as `n_shards` parquet shards + a manifest.

    Layout: dest/shard_id=K/part-*.parquet (partition pruning gives a
    trainer rank its shard without scanning others) and
    dest/_manifest/ parquet with (shard_id, n_docs, checksum[,
    total_chars]). Returns the manifest DataFrame (read back from the
    written manifest, so the caller sees exactly what landed).

    One data-sized exchange total: the partitionBy write. The manifest
    aggregation reuses the assigned frame and reduces to n_shards rows
    before anything reaches the driver.
    """
    _refuse_unhashable_columns(df)
    assigned = assign_shard(df, n_shards, id_col=id_col, seed=seed)
    if id_col != "doc_id":
        if "doc_id" in assigned.columns:
            # the rename would create two doc_id columns: the manifest
            # aggregation then raises AMBIGUOUS_REFERENCE mid-write
            # (after data already landed) and the checksum would hash
            # the id twice — refuse before any write starts
            raise ValueError(
                f"id_col={id_col!r} renames to 'doc_id' but the input "
                "already has a doc_id column — drop or rename it first"
            )
        assigned = assigned.withColumnRenamed(id_col, "doc_id")
    assigned = assigned.persist()
    try:
        (
            assigned.write.mode("overwrite")
            # pin STATIC overwrite per-writer: a session-wide dynamic
            # setting would overwrite only the partitions present in
            # the data — re-landing with fewer shards would leave the
            # old higher-numbered shard dirs behind, manifest-less
            .option("partitionOverwriteMode", "static")
            .partitionBy("shard_id")
            .parquet(dest_path)
        )
        manifest = _shard_manifest(assigned, text_col)
        (
            manifest.coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{dest_path}/{MANIFEST_DIR}")
        )
    finally:
        assigned.unpersist()
    spark = df.sparkSession
    return spark.read.parquet(f"{dest_path}/{MANIFEST_DIR}")


def land_snapshot(
    df: DataFrame,
    dest_path: str,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str | None = "text",
    seed: int = 0,
    cache_assigned: bool = True,
) -> DataFrame:
    """Incremental corpus snapshot: rewrite ONLY the shards whose
    content changed since the previous landing.

    The daily-snapshot pattern at 100 TB: a new corpus version differs
    from yesterday's in a small fraction of documents, and because
    shard placement is membership-independent (md5 of the doc id), an
    edit/add/remove only dirties the shards it touches. The old and new
    per-shard checksums — two tiny aggregates — decide which shards
    rewrite; everything else is untouched bytes on storage.

    Mechanics: compute the new manifest (one aggregation over the
    incoming frame), anti-diff it against the stored manifest, write
    just the dirty shards via dynamic partition overwrite, then land
    the new manifest. A shard can also DISAPPEAR (every doc in it
    removed): its partition is deleted explicitly since a dynamic
    overwrite of zero rows would leave it behind.

    Returns a report DataFrame (shard_id, status ∈ new | changed |
    unchanged | removed), MATERIALIZED before return (n_shards rows) —
    a lazy report would dangle over the pre-landing manifest this
    function replaces. First landing (no manifest) degrades to
    `write_training_shards` semantics with an all-`new` report.

    ``cache_assigned`` persists the assigned corpus for the manifest
    aggregation + dirty-shard write (avoids re-evaluating the source
    twice) — right when the corpus fits executor storage. At the
    100 TB scale this docstring advertises, pass False: materializing
    the WHOLE corpus to local disks to avoid a second pruned scan is
    the wrong trade (the dirty write re-reads only the dirty shards'
    rows, and the manifest agg is one combinable pass).

    Removed-shard deletion routes through the ``fs`` contract
    (sources/fs.py): LocalFS for bare paths, the Hadoop FileSystem
    connectors for ``scheme://`` URIs — so deleting a ``shard_id=K``
    prefix works the same on HDFS/S3A/GCS as on local disk.
    """
    spark = df.sparkSession
    _refuse_unhashable_columns(df)
    assigned = assign_shard(df, n_shards, id_col=id_col, seed=seed)
    if id_col != "doc_id":
        if "doc_id" in assigned.columns:
            # the rename would create two doc_id columns: the manifest
            # aggregation then raises AMBIGUOUS_REFERENCE mid-write
            # (after data already landed) and the checksum would hash
            # the id twice — refuse before any write starts
            raise ValueError(
                f"id_col={id_col!r} renames to 'doc_id' but the input "
                "already has a doc_id column — drop or rename it first"
            )
        assigned = assigned.withColumnRenamed(id_col, "doc_id")
    if cache_assigned:
        assigned = assigned.persist()
    try:
        new_m = _shard_manifest(assigned, text_col)
        from pyspark.errors import AnalysisException

        try:
            old_m = spark.read.parquet(f"{dest_path}/{MANIFEST_DIR}")
        except AnalysisException as e:
            # ONLY a genuinely absent manifest degrades to the
            # first-landing (full write) path. A corrupt or transiently
            # unreadable manifest must raise: silently treating it as
            # "first landing" would rewrite the entire corpus and mask
            # the fault behind an all-'new' report.
            if not _is_missing_path(e):
                raise
            old_m = None
        if old_m is None:
            (
                assigned.write.mode("overwrite")
                # static overwrite pinned per-writer (see
                # write_training_shards) — the first landing replaces
                # the WHOLE destination
                .option("partitionOverwriteMode", "static")
                .partitionBy("shard_id")
                .parquet(dest_path)
            )
            rows = [
                (r["shard_id"], "new")
                for r in new_m.select("shard_id").collect()
            ]
        else:
            old_keyed = old_m.select(
                "shard_id",
                F.col("n_docs").alias("old_docs"),
                F.col("checksum").alias("old_checksum"),
            )
            cmp = new_m.join(old_keyed, "shard_id", "full_outer")
            status = (
                F.when(F.col("old_docs").isNull(), "new")
                .when(F.col("n_docs").isNull(), "removed")
                .when(
                    (F.col("n_docs") == F.col("old_docs"))
                    & (F.col("checksum") == F.col("old_checksum")),
                    "unchanged",
                )
                .otherwise("changed")
            )
            # materialize NOW (tiny: n_shards rows) — the lineage reads
            # the old manifest, which this function replaces below, so a
            # lazy report would dangle over deleted files
            rows = [
                (r["shard_id"], r["status"])
                for r in cmp.select(
                    "shard_id", status.alias("status")
                ).collect()
            ]
            dirty = [
                sid for sid, s in rows if s in ("new", "changed")
            ]
            removed = [sid for sid, s in rows if s == "removed"]
            if dirty:
                (
                    assigned.filter(F.col("shard_id").isin(dirty))
                    .write.mode("overwrite")
                    # per-WRITER option (not the session conf, which
                    # races concurrent writers on one SparkSession)
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("shard_id")
                    .parquet(dest_path)
                )
            if removed:
                from vector_db_setup_spark.sources.fs import get_fs

                fs = get_fs(spark, dest_path)
                for sid in removed:
                    # STRICT delete, and it runs BEFORE the manifest
                    # commit below: a swallowed failure here followed
                    # by the new manifest (which omits this shard)
                    # would leave a stale partition that NO later
                    # landing revisits — it appears in neither side of
                    # the full-outer diff, so its deleted docs are
                    # served forever. Failing aborts the landing with
                    # the OLD manifest intact; the retry sees the
                    # shard as 'removed' again.
                    #
                    # Path-MISSING counts as success, not failure: a
                    # PARTIAL failure (some deletes landed before one
                    # raised) leaves the old manifest, so the retry
                    # re-sees the already-deleted shards as 'removed';
                    # a strict delete on a now-absent dir would raise
                    # on every retry and wedge all future landings.
                    # Only a store refusing to delete an EXISTING dir
                    # aborts the landing.
                    shard_dir = f"{dest_path}/shard_id={sid}"
                    if fs.exists(shard_dir):
                        fs.delete(shard_dir)
        (
            new_m.coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{dest_path}/{MANIFEST_DIR}")
        )
    finally:
        if cache_assigned:
            assigned.unpersist()
    return spark.createDataFrame(rows, "shard_id int, status string")


def verify_shards(
    spark: SparkSession, dest_path: str, text_col: str | None = "text"
) -> DataFrame:
    """Read-back audit: recompute the manifest aggregation from the
    written shard files and FULL-OUTER diff it against the stored
    manifest. Returns the per-shard comparison with an `ok` flag —
    `ok=false` rows pinpoint truncated, lost, or double-written shards.
    Cost: one scan of the written shards; the diff itself joins two
    n_shards-row aggregates (a FULL OUTER join can't broadcast — both
    sides here are manifest-sized, so the exchange is trivial).

    A destination holding ZERO shards (an empty corpus landed — every
    doc filtered out upstream) has no data files to infer a schema
    from; that degenerates to auditing the manifest alone (all-empty
    manifest ⇒ empty report ⇒ vacuously ok)."""
    got_cols = "shard_id int, got_docs bigint, got_checksum bigint" + (
        ", got_chars bigint" if text_col is not None else ""
    )
    from pyspark.errors import AnalysisException

    try:
        data = spark.read.parquet(dest_path)
    except AnalysisException as e:
        # Only a genuinely ABSENT/EMPTY destination degrades to the
        # zero-shards audit path. Permissions, corrupt footers, and
        # transient FS errors propagate — conflating "shards lost"
        # with "audit could not run" would misdirect triage toward
        # re-landing data that may be perfectly intact.
        if not _is_missing_path(e):
            raise
        got = spark.createDataFrame([], got_cols)
    else:
        got = _shard_manifest(data, text_col).withColumnRenamed(
            "n_docs", "got_docs"
        ).withColumnRenamed("checksum", "got_checksum")
        if text_col is not None:
            got = got.withColumnRenamed("total_chars", "got_chars")
    want = spark.read.parquet(f"{dest_path}/{MANIFEST_DIR}")
    cmp = want.join(got, "shard_id", "full_outer")
    ok = (F.col("n_docs") == F.col("got_docs")) & (
        F.col("checksum") == F.col("got_checksum")
    )
    if text_col is not None:
        # NULL-SAFE: a shard whose docs all have NULL text stores
        # total_chars NULL in both manifests — plain == yields NULL
        # and the coalesce would flag an intact shard as corrupted
        ok = ok & F.col("total_chars").eqNullSafe(F.col("got_chars"))
    return cmp.withColumn("ok", F.coalesce(ok, F.lit(False)))
