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
