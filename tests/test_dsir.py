"""DSIR importance resampling (operators/dsir): weight direction on
constructed corpora, Gumbel top-k determinism, maintained raw-pool
distribution == from-scratch through append/merge/delete drains (no
bare source scan), and weights-from-maintained-state == the oracled
batch query value-for-value."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from vector_db_setup_spark.operators import dsir
from vector_db_setup_spark.sources.registry import load_table
from vector_db_setup_spark.sources.snapshot_table import (
    append_snapshot,
    delete_from_snapshot,
    merge_snapshot,
    read_snapshot,
    write_snapshot,
)
from vector_db_setup_spark.streaming.commit_log import (
    maintain_dsir_from_commits,
)


def _weights(spark, target_rows, raw_rows, n_buckets=64):
    t = spark.createDataFrame(target_rows, "doc_id long, text string")
    r = spark.createDataFrame(raw_rows, "doc_id long, text string")
    tf = dsir.hashed_ngram_counts(t, n_buckets=n_buckets)
    rf = dsir.hashed_ngram_counts(r, n_buckets=n_buckets)
    lr = dsir.bucket_log_ratio(tf, rf, n_buckets=n_buckets)
    return {
        row["doc_id"]: row["logw"]
        for row in dsir.importance_weights(rf, lr).collect()
    }


def test_target_like_doc_outweighs_off_target(spark):
    """A raw doc written in the target's vocabulary must score a
    strictly higher log importance weight than one sharing nothing
    with the target — the defining DSIR property."""
    target = [(i, "solar panels convert sunlight into power") for i in range(4)]
    raw = [
        (100, "solar panels convert sunlight into power"),
        (101, "cheap pills buy now click here win big"),
    ]
    w = _weights(spark, target, raw)
    assert w[100] > w[101]


def test_boilerplate_overrepresented_in_raw_is_discounted(spark):
    """Two docs equally similar to the target, but one made of grams
    the RAW pool repeats everywhere: the raw-side denominator must
    push its weight below the rare doc's."""
    target = [(i, "alpha beta gamma delta") for i in range(4)]
    common = "lorem ipsum dolor sit amet"
    raw = (
        [(100, "alpha beta " + common), (101, "alpha beta rare unique phrase")]
        + [(200 + i, common + " " + common) for i in range(20)]
    )
    w = _weights(spark, target, raw)
    assert w[101] > w[100]


def test_gumbel_key_deterministic_and_finite(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), F.lit(0.0).alias("logw")
    )
    keyed = df.select(
        "doc_id",
        dsir.gumbel_key(F.col("doc_id"), F.col("logw")).alias("g1"),
        dsir.gumbel_key(F.col("doc_id"), F.col("logw")).alias("g2"),
        dsir.gumbel_key(F.col("doc_id"), F.col("logw"), seed="other").alias(
            "g3"
        ),
    ).collect()
    assert all(r["g1"] == r["g2"] for r in keyed)
    assert all(math.isfinite(r["g1"]) for r in keyed)
    # a different seed is a different draw (some key must differ)
    assert any(r["g1"] != r["g3"] for r in keyed)
    # Gumbel(0,1): median is -ln(ln 2) ~ 0.3665; crude sanity band
    med = sorted(r["g1"] for r in keyed)[500]
    assert 0.1 < med < 0.7


def test_resample_respects_k_and_is_stable(spark):
    d = load_table(spark, SF_ORACLE, "documents")
    raw = d.filter("doc_id >= 100")
    tgt = d.filter("doc_id < 100")
    a = dsir.dsir_resample(raw, tgt, k=25).collect()
    b = dsir.dsir_resample(raw, tgt, k=25).collect()
    assert len(a) == 25
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    # keys are sorted descending in the returned frame
    keys = [r["gkey"] for r in a]
    assert keys == sorted(keys, reverse=True)


def test_log_ratio_rows_bounded_by_buckets(spark):
    d = load_table(spark, SF_ORACLE, "documents")
    tf = dsir.hashed_ngram_counts(d.filter("doc_id < 100"), n_buckets=32)
    rf = dsir.hashed_ngram_counts(d.filter("doc_id >= 100"), n_buckets=32)
    lr = dsir.bucket_log_ratio(tf, rf, n_buckets=32)
    assert lr.count() <= 32


def test_candidate_with_unseen_buckets_gets_smoothed_ratio(spark):
    """Scoring a CANDIDATE document against (target, raw) totals when
    some of its grams hash to buckets neither distribution has seen:
    every occurrence must contribute the smoothed constant
    ln((rt+aB)/(tt+aB)) — not silently drop (the log-ratio table is
    total over the bucket domain), and n_grams must count ALL grams."""
    import hashlib
    import math as m

    B = 8

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B

    target = spark.createDataFrame([(0, "aa bb")], "doc_id long, text string")
    raw = spark.createDataFrame([(1, "cc dd")], "doc_id long, text string")
    cand = spark.createDataFrame(
        [(9, "zz qq ww xx yy vv uu tt")], "doc_id long, text string"
    )
    lr = dsir.log_ratio_from_totals(
        dsir.bucket_totals(target, n_buckets=B),
        dsir.bucket_totals(raw, n_buckets=B),
        n_buckets=B,
    )
    assert lr.count() == B  # total over the domain
    cf = dsir.hashed_ngram_counts(cand, n_buckets=B)
    got = dsir.importance_weights(cf, lr).collect()[0]

    # brute-force reference over the SAME gram multiset
    def grams(text):
        toks = text.split(" ")
        return toks + [f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)]

    tb, rb = {}, {}
    for g in grams("aa bb"):
        tb[bucket(g)] = tb.get(bucket(g), 0) + 1
    for g in grams("cc dd"):
        rb[bucket(g)] = rb.get(bucket(g), 0) + 1
    tt, rt = sum(tb.values()), sum(rb.values())
    want = sum(
        m.log((tb.get(bucket(g), 0) + 1.0) / (tt + B))
        - m.log((rb.get(bucket(g), 0) + 1.0) / (rt + B))
        for g in grams("zz qq ww xx yy vv uu tt")
    )
    assert got["n_grams"] == len(grams("zz qq ww xx yy vv uu tt"))
    assert got["logw"] == pytest.approx(round(want, 6), abs=2e-6)


def _corpus(spark, lo, hi, rev=""):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("solar beta gamma token "),
            (F.col("id") % 7).cast("string"),
            F.lit(f" {rev}" if rev else ""),
        ).alias("text"),
    )


def _totals(df):
    return {r["bucket"]: r["n"] for r in df.collect()}


def test_dsir_maintained_equals_scratch(spark, tmp_path, monkeypatch):
    import vector_db_setup_spark.sources.snapshot_table as st_mod
    from tests.test_span_index import _spy_on

    src = str(tmp_path / "src")
    stt = str(tmp_path / "dsir")
    write_snapshot(
        _corpus(spark, 0, 150), src,
        stats_cols=["doc_id"], cluster_by=["doc_id"], cluster_files=4,
    )
    kw = dict(text_col="text", key_col="doc_id", n_buckets=64)
    maintain_dsir_from_commits(spark, src, stt, str(tmp_path / "ck"), **kw)
    bare, real = _spy_on(monkeypatch, st_mod, src)
    merge_snapshot(
        _corpus(spark, 0, 30, rev="v2").unionByName(
            _corpus(spark, 500, 520)
        ),
        src, key_col="doc_id",
    )
    append_snapshot(_corpus(spark, 520, 560), src, stats_cols=["doc_id"])
    delete_from_snapshot(
        spark.range(50, 70).select(F.col("id").alias("doc_id")),
        src, key_col="doc_id",
    )
    maintain_dsir_from_commits(spark, src, stt, str(tmp_path / "ck"), **kw)
    assert bare == [], f"DSIR drain bare-scanned the source: {bare}"
    monkeypatch.setattr(st_mod, "read_snapshot", real)
    got = _totals(read_snapshot(spark, stt))
    want = _totals(
        dsir.bucket_totals(read_snapshot(spark, src), n_buckets=64)
    )
    assert got == want and got
    # replay no-op
    import vector_db_setup_spark.sources.snapshot_table as st
    n = len(st.committed_versions(spark, stt))
    maintain_dsir_from_commits(spark, src, stt, str(tmp_path / "ck2"), **kw)
    assert len(st.committed_versions(spark, stt)) == n
    # parameter drift refuses
    with pytest.raises(Exception, match="different parameters"):
        maintain_dsir_from_commits(
            spark, src, stt, str(tmp_path / "ck3"),
            text_col="text", key_col="doc_id", n_buckets=32,
        )


def test_dsir_rewrite_refuses_then_rebuilds(spark, tmp_path):
    """A full rewrite (write_snapshot over the same base) violates the
    incremental op contract: the drain must raise DisallowedOpError by
    default, and with on_rewrite="rebuild" must self-heal to exactly
    the from-scratch totals."""
    src = str(tmp_path / "src")
    stt = str(tmp_path / "dsir")
    kw = dict(text_col="text", key_col="doc_id", n_buckets=64)
    write_snapshot(_corpus(spark, 0, 100), src)
    maintain_dsir_from_commits(spark, src, stt, str(tmp_path / "ck"), **kw)
    write_snapshot(_corpus(spark, 0, 80, rev="rewritten"), src)
    # the typed DisallowedOpError surfaces wrapped by the streaming
    # machinery — assert on its distinctive message
    with pytest.raises(Exception, match="allowed_ops"):
        maintain_dsir_from_commits(
            spark, src, stt, str(tmp_path / "ck"), **kw
        )
    maintain_dsir_from_commits(
        spark, src, stt, str(tmp_path / "ck2"), on_rewrite="rebuild", **kw
    )
    got = _totals(read_snapshot(spark, stt))
    want = _totals(
        dsir.bucket_totals(read_snapshot(spark, src), n_buckets=64)
    )
    assert got == want and got


def test_weights_from_maintained_state_match_batch_query(spark, tmp_path):
    """Bootstrap the maintained raw-pool distribution from the
    fixture's raw slice and compute weights through
    log_ratio_from_totals: must equal the oracled dsir_doc_weights
    query value-for-value."""
    from vector_db_setup_spark import queries as q

    d = load_table(spark, SF_ORACLE, "documents")
    src = str(tmp_path / "raw")
    stt = str(tmp_path / "dsir")
    write_snapshot(d.filter("doc_id >= 100").select("doc_id", "text"), src)
    maintain_dsir_from_commits(
        spark, src, stt, str(tmp_path / "ck"),
        text_col="text", key_col="doc_id", n_buckets=256,
    )
    lr = dsir.log_ratio_from_totals(
        dsir.bucket_totals(d.filter("doc_id < 100"), n_buckets=256),
        read_snapshot(spark, stt),
        n_buckets=256,
    )
    rf = dsir.hashed_ngram_counts(d.filter("doc_id >= 100"), n_buckets=256)
    got = {
        r["doc_id"]: (r["n_grams"], r["logw"])
        for r in dsir.importance_weights(rf, lr).collect()
    }
    want = {
        r["doc_id"]: (r["n_grams"], r["logw"])
        for r in q.dsir_doc_weights(spark, SF_ORACLE).collect()
    }
    assert got == want and len(got) == 400
