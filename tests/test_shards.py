"""Training-shard export: write → manifest → read-back audit."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from vector_db_setup_spark.sources.registry import load_table
from vector_db_setup_spark.sources.shards import (
    assign_shard,
    verify_shards,
    write_training_shards,
)


def test_write_and_verify_roundtrip(spark, tmp_path):
    dest = str(tmp_path / "shards")
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    n = docs.count()

    manifest = write_training_shards(docs, dest, n_shards=4)
    rows = {r["shard_id"]: r for r in manifest.collect()}
    assert set(rows) <= set(range(4)) and sum(
        r["n_docs"] for r in rows.values()
    ) == n
    # every shard is a real partition directory a trainer rank can read
    for sid in rows:
        assert os.path.isdir(os.path.join(dest, f"shard_id={sid}"))

    audit = verify_shards(spark, dest)
    assert all(r["ok"] for r in audit.collect())
    assert audit.count() == len(rows)


def test_assignment_is_seed_stable_and_membership_independent(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    full = {
        r["doc_id"]: r["shard_id"]
        for r in assign_shard(docs, 8, seed=7).collect()
    }
    # removing half the corpus must not move any survivor
    half = {
        r["doc_id"]: r["shard_id"]
        for r in assign_shard(
            docs.filter(F.col("doc_id") % 2 == 0), 8, seed=7
        ).collect()
    }
    assert all(full[k] == v for k, v in half.items())
    # different seed produces a genuinely different placement
    other = {
        r["doc_id"]: r["shard_id"]
        for r in assign_shard(docs, 8, seed=8).collect()
    }
    assert any(full[k] != other[k] for k in full)


def test_assignment_matches_independent_md5(spark):
    """Pin the placement rule against an out-of-engine recompute:
    shard = int(md5(f'{doc_id}:{seed}')[:15 hex], 16) % n."""
    import hashlib

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id").limit(50)
    got = {
        r["doc_id"]: r["shard_id"]
        for r in assign_shard(docs, 8, seed=7).collect()
    }
    for doc_id, sid in got.items():
        want = int(hashlib.md5(f"{doc_id}:7".encode()).hexdigest()[:15], 16) % 8
        assert sid == want, (doc_id, sid, want)


def test_verify_catches_lost_shard(spark, tmp_path):
    import shutil

    dest = str(tmp_path / "shards")
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    write_training_shards(docs, dest, n_shards=4)
    victim = next(
        d for d in os.listdir(dest) if d.startswith("shard_id=")
    )
    shutil.rmtree(os.path.join(dest, victim))
    audit = {r["shard_id"]: r["ok"] for r in verify_shards(spark, dest).collect()}
    lost = int(victim.split("=")[1])
    assert audit[lost] is False
    assert all(ok for sid, ok in audit.items() if sid != lost)


def test_verify_catches_corrupted_shard(spark, tmp_path):
    dest = str(tmp_path / "shards")
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    write_training_shards(docs, dest, n_shards=2)
    # double-write shard 0's rows (duplication, same count per file set:
    # append a copy -> n_docs doubles; checksum xors to 0 for dup pairs
    # but n_docs catches it)
    s0 = spark.read.parquet(os.path.join(dest, "shard_id=0"))
    s0.write.mode("append").parquet(os.path.join(dest, "shard_id=0"))
    audit = {r["shard_id"]: r["ok"] for r in verify_shards(spark, dest).collect()}
    assert audit[0] is False and audit[1] is True


def _files(dest, sid):
    import glob

    return sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(dest, f"shard_id={sid}", "*.parquet"))
    )


def test_land_snapshot_rewrites_only_dirty_shards(spark, tmp_path):
    from vector_db_setup_spark.sources.shards import land_snapshot

    dest = str(tmp_path / "snap")
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")

    r1 = land_snapshot(docs, dest, n_shards=4, seed=3)
    assert {x["status"] for x in r1.collect()} == {"new"}
    before = {sid: _files(dest, sid) for sid in range(4)}

    # v2: edit ONE document -> exactly the shards holding it are dirty
    victim = docs.limit(1).collect()[0]["doc_id"]
    from vector_db_setup_spark.sources.shards import assign_shard

    vshard = {
        r["doc_id"]: r["shard_id"]
        for r in assign_shard(docs, 4, seed=3).collect()
    }[victim]
    v2 = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == victim, F.lit("EDITED")).otherwise(
            F.col("text")
        ),
    )
    r2 = {x["shard_id"]: x["status"] for x in land_snapshot(
        v2, dest, n_shards=4, seed=3
    ).collect()}
    assert r2[vshard] == "changed"
    assert all(s == "unchanged" for sid, s in r2.items() if sid != vshard)

    after = {sid: _files(dest, sid) for sid in range(4)}
    # untouched shards keep their exact files; the dirty one was rewritten
    for sid in range(4):
        if sid == vshard:
            assert after[sid] != before[sid]
        else:
            assert after[sid] == before[sid]

    audit = verify_shards(spark, dest)
    assert all(r["ok"] for r in audit.collect())
    # and the landed content IS v2
    landed = spark.read.parquet(dest).filter(F.col("doc_id") == victim)
    assert landed.collect()[0]["text"] == "EDITED"


def test_land_snapshot_removes_emptied_shard(spark, tmp_path):
    from vector_db_setup_spark.sources.shards import (
        assign_shard,
        land_snapshot,
    )

    dest = str(tmp_path / "snap")
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    land_snapshot(docs, dest, n_shards=4, seed=3)

    # v2 drops EVERY doc of shard 2
    doomed = [
        r["doc_id"]
        for r in assign_shard(docs, 4, seed=3)
        .filter(F.col("shard_id") == 2)
        .collect()
    ]
    assert doomed
    v2 = docs.filter(~F.col("doc_id").isin(doomed))
    r2 = {x["shard_id"]: x["status"] for x in land_snapshot(
        v2, dest, n_shards=4, seed=3
    ).collect()}
    assert r2[2] == "removed"
    assert not os.path.exists(os.path.join(dest, "shard_id=2"))
    audit = verify_shards(spark, dest)
    assert all(r["ok"] for r in audit.collect())
    assert spark.read.parquet(dest).count() == v2.count()


def test_empty_corpus_lands_and_audits_clean(spark, tmp_path):
    """Degenerate but legal: everything filtered out upstream. Landing
    writes an empty manifest; the audit returns an empty (vacuously ok)
    report instead of failing schema inference on a data-less dir."""
    from vector_db_setup_spark.sources.shards import land_snapshot

    empty = spark.createDataFrame([], "doc_id long, text string")
    dest = str(tmp_path / "s")
    m = write_training_shards(empty, dest, n_shards=4)
    assert m.count() == 0
    assert verify_shards(spark, dest).count() == 0
    r = land_snapshot(empty, str(tmp_path / "s2"), 4)
    assert r.count() == 0


def test_checksum_covers_all_columns(spark, tmp_path):
    """An edit confined to a NON-text column must dirty its shard (the
    checksum hashes every data column, not just id + text)."""
    from vector_db_setup_spark.sources.shards import land_snapshot

    dest = str(tmp_path / "s")
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text", "lang"
    )
    land_snapshot(docs, dest, n_shards=4, seed=3)
    victim = docs.limit(1).collect()[0]["doc_id"]
    v2 = docs.withColumn(
        "lang",
        F.when(F.col("doc_id") == victim, F.lit("xx")).otherwise(
            F.col("lang")
        ),
    )
    statuses = {
        r["status"] for r in land_snapshot(v2, dest, 4, seed=3).collect()
    }
    assert "changed" in statuses
    landed = spark.read.parquet(dest).filter(F.col("doc_id") == victim)
    assert landed.collect()[0]["lang"] == "xx"


def test_corrupt_manifest_raises_not_full_rewrite(spark, tmp_path):
    """A corrupt (unreadable-as-parquet) manifest must RAISE — silently
    taking the first-landing path would rewrite the whole corpus and
    mask the fault."""
    import glob

    import pytest as _pytest

    from vector_db_setup_spark.sources.shards import land_snapshot

    dest = str(tmp_path / "s")
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    land_snapshot(docs, dest, n_shards=4)
    for p in glob.glob(os.path.join(dest, "_manifest", "*.parquet")):
        with open(p, "wb") as f:
            f.write(b"not parquet")
    with _pytest.raises(Exception):
        land_snapshot(docs, dest, n_shards=4)


def test_land_snapshot_schema_add_rewrites_everything_consistently(spark, tmp_path):
    """v2 adds a column: every shard's checksum changes (the checksum
    hashes all data columns), so everything rewrites and the landed
    corpus carries the new column uniformly — no mixed-schema shards."""
    from vector_db_setup_spark.sources.shards import land_snapshot

    dest = str(tmp_path / "s")
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    land_snapshot(docs, dest, n_shards=4, seed=1)
    v2 = docs.withColumn("quality", F.length("text") % 100)
    r = {x["status"] for x in land_snapshot(v2, dest, 4, seed=1).collect()}
    assert r == {"changed"}
    back = spark.read.parquet(dest)
    assert "quality" in back.columns
    assert back.filter(F.col("quality").isNull()).count() == 0
    assert all(x["ok"] for x in verify_shards(spark, dest).collect())
