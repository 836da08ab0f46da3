"""Data-quality contracts: one-pass report + land-or-abort gate."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from vector_db_setup_spark.operators.validate import enforce, validate
from vector_db_setup_spark.sources.registry import load_table


RULES = [
    {"rule": "not_null", "col": "doc_id"},
    {"rule": "unique", "col": "doc_id"},
    {"rule": "in_range", "col": "n_chars", "lo": 0, "hi": 10**9},
    {"rule": "matches", "col": "lang", "pattern": "^[a-z]{2}$"},
    {"rule": "in_set", "col": "source", "allowed": ["web", "wiki", "news", "books", "code"]},
    {"rule": "min_rows", "n": 10},
]


def test_clean_fixture_passes_and_counts_match_brute_force(spark):
    d = load_table(spark, SF_ORACLE, "documents")
    rep = {r["rule"]: r for r in validate(d, RULES).collect()}
    n = d.count()
    assert all(r["n_rows"] == n for r in rep.values())
    # brute-force recompute of two rules
    from pyspark.sql import functions as F

    dup = n - d.select("doc_id").distinct().count()
    assert rep["unique(doc_id)"]["violations"] == dup
    bad_lang = d.filter(~F.col("lang").rlike("^[a-z]{2}$") | F.col("lang").isNull()).count()
    assert rep["matches(lang,^[a-z]{2}$)"]["violations"] == bad_lang
    # the fixture's source set may differ from the contract's; just check
    # consistency with brute force rather than assuming pass
    bad_src = d.filter(
        ~F.col("source").isin("web", "wiki", "news", "books", "code")
        | F.col("source").isNull()
    ).count()
    srow = [r for name, r in rep.items() if name.startswith("in_set(source")][0]
    assert srow["violations"] == bad_src


def test_violations_detected_and_enforce_raises(spark):
    from pyspark.sql import functions as F

    d = load_table(spark, SF_ORACLE, "documents").select("doc_id", "lang")
    # plant: one null id, one duplicated id, one bad lang
    bad = d.limit(1).select(
        F.lit(None).cast("long").alias("doc_id"), F.lit("ZZZ").alias("lang")
    )
    dup = d.limit(1)
    planted = d.union(bad).union(dup)
    rep = {r["rule"]: r["violations"] for r in validate(
        planted,
        [
            {"rule": "not_null", "col": "doc_id"},
            {"rule": "unique", "col": "doc_id"},
            {"rule": "matches", "col": "lang", "pattern": "^[a-z]{2}$"},
        ],
    ).collect()}
    assert rep["not_null(doc_id)"] == 1
    # one real duplicate + the null key (not counted by countDistinct)
    assert rep["unique(doc_id)"] == 2
    assert rep["matches(lang,^[a-z]{2}$)"] == 1
    with pytest.raises(ValueError, match="not_null"):
        enforce(planted, [{"rule": "not_null", "col": "doc_id"}])
    # the gate passes clean data through unchanged (chainable)
    assert enforce(d, [{"rule": "not_null", "col": "doc_id"}]) is d


def test_min_rows_gate(spark):
    d = load_table(spark, SF_ORACLE, "documents").limit(3)
    rep = validate(d, [{"rule": "min_rows", "n": 10}]).collect()[0]
    assert rep["violations"] == 7 and not rep["passed"]


def test_quarantine_split_batch_and_stream_agree(spark, tmp_path):
    """Row-level gate: clean+dirty partition the input, dirty rows name
    their violated rules, and the SAME projection run as a streaming
    micro-batch lands identical splits (stateless => stream==batch)."""
    from pyspark.sql import functions as F

    from vector_db_setup_spark.operators.validate import quarantine_split

    rules = [
        {"rule": "not_null", "col": "doc_id"},
        {"rule": "matches", "col": "lang", "pattern": "^[a-z]{2}$"},
    ]
    d = load_table(spark, SF_ORACLE, "documents").select("doc_id", "lang")
    bad = spark.createDataFrame(
        [(None, "en"), (999999, "ZZZ")], "doc_id long, lang string"
    )
    src = d.union(bad)
    clean, dirty = quarantine_split(src, rules)
    assert clean.count() + dirty.count() == src.count()
    flags = {
        tuple(r["_violations"]) for r in dirty.collect()
    }
    assert ("not_null(doc_id)",) in flags
    assert ("matches(lang,^[a-z]{2}$)",) in flags
    assert "_violations" not in clean.columns

    # streaming twin: same rules over a file stream, foreachBatch lands
    # the same clean/dirty row sets
    src_dir, out_clean, out_dirty = (
        str(tmp_path / "src"), str(tmp_path / "clean"), str(tmp_path / "dirty")
    )
    src.write.parquet(src_dir)
    stream = spark.readStream.schema(src.schema).parquet(src_dir)

    def land(batch, _):
        c, q = quarantine_split(batch, rules)
        c.write.mode("append").parquet(out_clean)
        q.drop("_violations").write.mode("append").parquet(out_dirty)

    (
        stream.writeStream.foreachBatch(land)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got_clean = {tuple(r) for r in spark.read.parquet(out_clean).collect()}
    want_clean = {tuple(r) for r in clean.collect()}
    assert got_clean == want_clean
    assert spark.read.parquet(out_dirty).count() == dirty.count()


def test_flag_violations_rejects_aggregate_rules(spark):
    from vector_db_setup_spark.operators.validate import flag_violations

    d = load_table(spark, SF_ORACLE, "documents")
    with pytest.raises(ValueError, match="unique"):
        flag_violations(d, [{"rule": "unique", "col": "doc_id"}])
