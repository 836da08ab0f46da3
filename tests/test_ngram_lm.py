"""Maintained bigram LM (streaming/commit_log.maintain_lm_from_commits
+ operators/ngram_lm): maintained counts == from-scratch counts through
append/merge/delete drains (no bare source scan), scoring against the
maintained state equals the batch query's perplexities, replay no-op,
drift refusal."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from vector_db_setup_spark.operators.ngram_lm import (
    lm_counts,
    perplexity_against_lm,
)
from vector_db_setup_spark.sources.registry import load_table
from vector_db_setup_spark.sources.snapshot_table import (
    append_snapshot,
    delete_from_snapshot,
    merge_snapshot,
    read_snapshot,
    write_snapshot,
)
from vector_db_setup_spark.streaming.commit_log import (
    maintain_lm_from_commits,
)


def _corpus(spark, lo, hi, rev=""):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma token "),
            (F.col("id") % 7).cast("string"),
            F.lit(f" {rev}" if rev else ""),
        ).alias("text"),
    )


def _counts(df):
    return {
        (r["kind"], r["w1"], r["w2"]): r["n"] for r in df.collect()
    }


def test_lm_maintained_equals_scratch(spark, tmp_path, monkeypatch):
    import vector_db_setup_spark.sources.snapshot_table as st_mod
    from tests.test_span_index import _spy_on

    src = str(tmp_path / "src")
    lm = str(tmp_path / "lm")
    write_snapshot(
        _corpus(spark, 0, 150), src,
        stats_cols=["doc_id"], cluster_by=["doc_id"], cluster_files=4,
    )
    kw = dict(text_col="text", key_col="doc_id")
    maintain_lm_from_commits(spark, src, lm, str(tmp_path / "ck"), **kw)
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
    maintain_lm_from_commits(spark, src, lm, str(tmp_path / "ck"), **kw)
    assert bare == [], f"LM drain bare-scanned the source: {bare}"
    monkeypatch.setattr(st_mod, "read_snapshot", real)
    got = _counts(read_snapshot(spark, lm))
    want = _counts(lm_counts(read_snapshot(spark, src)))
    assert got == want and got
    # replay no-op
    import vector_db_setup_spark.sources.snapshot_table as st
    n = len(st.committed_versions(spark, lm))
    maintain_lm_from_commits(spark, src, lm, str(tmp_path / "ck2"), **kw)
    assert len(st.committed_versions(spark, lm)) == n
    # column drift refuses
    with pytest.raises(Exception, match="different columns"):
        maintain_lm_from_commits(
            spark, src, lm, str(tmp_path / "ck3"),
            text_col="doc_id", key_col="doc_id",
        )


def test_scoring_against_maintained_lm_matches_batch_query(
    spark, tmp_path
):
    """Bootstrap the LM state from the fixture's reference slice (docs
    0-99) and score the rest: perplexities must equal the oracled
    lm_perplexity_buckets query's, value for value."""
    from vector_db_setup_spark import queries as q

    d = load_table(spark, SF_ORACLE, "documents")
    src = str(tmp_path / "ref")
    lm = str(tmp_path / "lm")
    write_snapshot(
        d.filter("doc_id < 100").select("doc_id", "text"), src
    )
    maintain_lm_from_commits(
        spark, src, lm, str(tmp_path / "ck"),
        text_col="text", key_col="doc_id",
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["ppl"])
        for r in perplexity_against_lm(
            d.filter("doc_id >= 100"), read_snapshot(spark, lm)
        ).collect()
    }
    want = {
        r["doc_id"]: (r["n_bigrams"], r["ppl"])
        for r in q.lm_perplexity_buckets(spark, SF_ORACLE).collect()
    }
    assert got == want and len(got) == 400


def test_lm_counts_shape(spark):
    df = spark.createDataFrame(
        [(0, "a b a"), (1, "b a")], "doc_id long, text string"
    )
    got = _counts(lm_counts(df))
    assert got == {
        ("uni", "a", ""): 3,
        ("uni", "b", ""): 2,
        ("bi", "a", "b"): 1,
        ("bi", "b", "a"): 2,
    }


def test_ppl_quantile_buckets_threshold_semantics(spark):
    """Cut points split by VALUE (ties share a bucket), labels cover
    probs+1 bands, and the approx default agrees with exact on a
    separated distribution."""
    from vector_db_setup_spark.operators.ngram_lm import (
        ppl_quantile_buckets,
    )

    per = spark.createDataFrame(
        [(i, 1, float(v)) for i, v in enumerate(
            [1, 1, 1, 5, 5, 5, 9, 9, 9]
        )],
        "doc_id long, n_bigrams long, ppl double",
    )
    got = {
        r["doc_id"]: r["bucket"]
        for r in ppl_quantile_buckets(per, exact=True).collect()
    }
    # p33 lands inside the 1s..5s span, p67 inside 5s..9s: each value
    # class is one bucket, ties never split
    assert {got[i] for i in (0, 1, 2)} == {"head"}
    assert {got[i] for i in (3, 4, 5)} == {"middle"}
    assert {got[i] for i in (6, 7, 8)} == {"tail"}
    approx = {
        r["doc_id"]: r["bucket"]
        for r in ppl_quantile_buckets(per, exact=False).collect()
    }
    assert approx == got
    import pytest as _pytest

    with _pytest.raises(ValueError, match="labels"):
        ppl_quantile_buckets(per, probs=(0.5,), labels=("a", "b", "c"))


# ---- maintained perplexity histogram (r11) ----


def _hist_rows(df):
    return sorted((int(r["bin"]), int(r["n"])) for r in df.collect())


def test_ppl_histogram_maintained_equals_from_scratch(spark, tmp_path):
    """Bootstrap + append/delete/merge drains == one from-scratch
    histogram of the head, bin for bin (exact cancellation: a doc's
    text scores the same ppl on its add and its remove under the
    frozen LM)."""
    from vector_db_setup_spark.operators.ngram_lm import ppl_histogram
    from vector_db_setup_spark.streaming.commit_log import (
        maintain_ppl_histogram_from_commits,
    )

    src = str(tmp_path / "src")
    lm = str(tmp_path / "lm")
    hist = str(tmp_path / "hist")
    ck = str(tmp_path / "ck")
    # frozen reference LM from a static slice
    ref = _corpus(spark, 0, 30)
    write_snapshot(lm_counts(ref), lm, meta={"kind": "bigram_lm"})
    geo = dict(lo=0.0, hi=100.0, n_bins=64)

    write_snapshot(_corpus(spark, 100, 160), src)
    drain = lambda: maintain_ppl_histogram_from_commits(  # noqa: E731
        spark, src, lm, hist, ck, **geo,
        text_col="text", key_col="doc_id",
    )
    drain()
    append_snapshot(_corpus(spark, 160, 190, rev="r1"), src)
    delete_from_snapshot(
        spark.range(100, 110).select(F.col("id").alias("doc_id")), src,
        key_col="doc_id",
    )
    merge_snapshot(_corpus(spark, 120, 130, rev="r2"), src, key_col="doc_id")
    drain()

    want = _hist_rows(
        ppl_histogram(
            perplexity_against_lm(
                read_snapshot(spark, src), read_snapshot(spark, lm)
            ),
            **geo,
        )
    )
    got = _hist_rows(read_snapshot(spark, hist))
    assert got == want and got
    # replayed drain is a no-op
    drain()
    assert _hist_rows(read_snapshot(spark, hist)) == got


def test_ppl_histogram_refuses_lm_drift(spark, tmp_path):
    """The frozen-LM contract: once the reference LM advances, the next
    drain must refuse rather than serve stale-binned cut points."""
    from vector_db_setup_spark.streaming.commit_log import (
        maintain_ppl_histogram_from_commits,
    )

    src = str(tmp_path / "src")
    lm = str(tmp_path / "lm")
    hist = str(tmp_path / "hist")
    write_snapshot(lm_counts(_corpus(spark, 0, 30)), lm)
    write_snapshot(_corpus(spark, 100, 140), src)
    maintain_ppl_histogram_from_commits(
        spark, src, lm, hist, str(tmp_path / "ck"),
        lo=0.0, hi=100.0, n_bins=64,
    )
    # the reference churns: its maintainer lands a new LM version
    append_snapshot(lm_counts(_corpus(spark, 30, 35, rev="x")), lm)
    append_snapshot(_corpus(spark, 140, 150), src)
    # the refusal surfaces through the streaming foreachBatch wrapper,
    # so match on the message, not the Python type
    with pytest.raises(Exception, match="frozen-LM"):
        maintain_ppl_histogram_from_commits(
            spark, src, lm, hist, str(tmp_path / "ck"),
            lo=0.0, hi=100.0, n_bins=64,
        )


def test_histogram_quantiles_within_bin_width_and_bucket_map(spark):
    """Cut points from the histogram are within one bin width of the
    exact percentile, and bucket_by_thresholds assigns by literal
    compare (no aggregate/window/join in the plan)."""
    from vector_db_setup_spark.operators.ngram_lm import (
        bucket_by_thresholds,
        ppl_histogram,
        quantiles_from_histogram,
    )
    from vector_db_setup_spark.plans.inspect import executed_plan

    per = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 300).cast("double").alias("ppl"),
    )
    lo, hi, n_bins = 0.0, 300.0, 150  # bin width 2.0
    hist = ppl_histogram(per, lo, hi, n_bins)
    cuts = quantiles_from_histogram(
        hist, (1.0 / 3, 2.0 / 3), lo, hi, n_bins
    )
    exact = per.agg(
        F.percentile("ppl", F.lit(1.0 / 3)),
        F.percentile("ppl", F.lit(2.0 / 3)),
    ).collect()[0]
    width = (hi - lo) / n_bins
    assert abs(cuts[0] - float(exact[0])) <= width
    assert abs(cuts[1] - float(exact[1])) <= width

    bucketed = bucket_by_thresholds(per, cuts)
    plan = executed_plan(bucketed)
    assert "HashAggregate" not in plan
    assert "Window" not in plan
    assert "Join" not in plan
    counts = {
        r["bucket"]: r["count"]
        for r in bucketed.groupBy("bucket").count().collect()
    }
    # thirds within histogram resolution (bin width 2 over step-1 data
    # -> at most 2 docs per unit of cut error, 10 per bin of slack)
    assert set(counts) == {"head", "middle", "tail"}
    for v in counts.values():
        assert abs(v - 1000) <= 2 * width * 10

    import pytest as _p

    with _p.raises(ValueError, match="labels"):
        bucket_by_thresholds(per, [1.0], labels=("a", "b", "c"))
    with _p.raises(ValueError, match="empty histogram"):
        quantiles_from_histogram(
            ppl_histogram(per.filter("ppl < -1"), lo, hi, n_bins),
            (0.5,), lo, hi, n_bins,
        )


def test_ppl_histogram_refuses_wrong_lm_kind(spark, tmp_path):
    """Pointing lm_state_base at some OTHER maintained state must
    refuse loudly — scoring against arbitrary rows silently bins every
    bigram as unseen."""
    from vector_db_setup_spark.streaming.commit_log import (
        maintain_ppl_histogram_from_commits,
    )

    src = str(tmp_path / "src")
    not_lm = str(tmp_path / "not_lm")
    write_snapshot(_corpus(spark, 100, 120), src)
    write_snapshot(
        spark.range(0, 5).select(F.col("id").alias("x")),
        not_lm,
        meta={"kind": "ppl_histogram"},
    )
    with pytest.raises(Exception, match="not a bigram LM"):
        maintain_ppl_histogram_from_commits(
            spark, src, not_lm, str(tmp_path / "hist"),
            str(tmp_path / "ck"), lo=0.0, hi=100.0, n_bins=64,
        )
