"""Span-level exact-substring dedup (operators/span_dedup.py):
constructed-corpus semantics, a brute-force Python oracle over random
corpora, and the detect→strip composition invariants. The SQL-oracle
value check runs in test_oracle_parity (duplicate_spans,
corpus_span_clean)."""

from __future__ import annotations

import random

from vector_db_setup_spark.operators.span_dedup import (
    duplicate_spans,
    ngram_occurrences,
    span_dedup,
    strip_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spans(df):
    return sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_tokens"])
        for r in df.collect()
    )


def _clean(df):
    return {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_removed"])
        for r in df.collect()
    }


PASSAGE = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10"  # 10 tokens


def test_first_occurrence_exempt_second_covered(spark):
    # doc 0 carries the passage first; doc 1 embeds it mid-document.
    d = _docs(
        spark,
        [
            (0, PASSAGE + " tail0 tail1"),
            (1, "head0 head1 head2 " + PASSAGE + " tail2"),
        ],
    )
    got = _spans(duplicate_spans(d, n=8))
    # doc 1 positions 4..13 hold the 10-token passage; its 3 8-gram
    # occurrences (starts 4,5,6) merge into one island covering 4..13.
    assert got == [(1, 4, 13, 10)]
    cleaned = _clean(strip_spans(d, duplicate_spans(d, n=8)))
    assert cleaned[0] == (PASSAGE + " tail0 tail1", 12, 0)
    assert cleaned[1] == ("head0 head1 head2 tail2", 4, 10)


def test_exact_duplicate_doc_fully_stripped(spark):
    d = _docs(spark, [(0, PASSAGE), (1, PASSAGE)])
    got = _spans(duplicate_spans(d, n=8))
    assert got == [(1, 1, 10, 10)]
    cleaned = _clean(span_dedup(d, n=8))
    assert cleaned[0] == (PASSAGE, 10, 0)
    assert cleaned[1] == ("", 0, 10)


def test_intra_document_repetition(spark):
    d = _docs(spark, [(7, PASSAGE + " mid " + PASSAGE)])
    got = _spans(duplicate_spans(d, n=8))
    # second copy sits at positions 12..21
    assert got == [(7, 12, 21, 10)]


def test_short_docs_and_unique_corpus_untouched(spark):
    d = _docs(
        spark,
        [
            (0, "a b c d e f g"),  # 7 tokens < n
            (1, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),
            (2, "v1 v2 v3 v4 v5 v6 v7 v8 v9"),
        ],
    )
    assert duplicate_spans(d, n=8).count() == 0
    cleaned = _clean(span_dedup(d, n=8))
    assert cleaned[0] == ("a b c d e f g", 7, 0)
    assert cleaned[1][2] == 0 and cleaned[2][2] == 0


def test_min_span_tokens_and_cap(spark):
    d = _docs(
        spark,
        [
            (0, PASSAGE + " x0 x1"),
            (1, PASSAGE + " y0 y1"),
        ],
    )
    # merged span is 10 tokens; a 12-token floor drops it
    assert duplicate_spans(d, n=8, min_span_tokens=12).count() == 0
    assert duplicate_spans(d, n=8, min_span_tokens=10).count() == 1
    # every repeated key here occurs exactly twice; cap=1 excludes all
    assert duplicate_spans(d, n=8, max_key_occurrences=1).count() == 0


def test_case_insensitive_keys_original_case_rebuild(spark):
    d = _docs(spark, [(0, PASSAGE.upper()), (1, "z0 " + PASSAGE)])
    got = _spans(duplicate_spans(d, n=8))
    assert got == [(1, 2, 11, 10)]
    cleaned = _clean(strip_spans(d, duplicate_spans(d, n=8)))
    assert cleaned[0][0] == PASSAGE.upper()  # original case preserved
    assert cleaned[1][0] == "z0"


def _py_oracle_spans(rows, n):
    """Brute-force reference: same semantics, plain Python."""
    occ = []  # (doc_id, pos, gram)
    toks = {i: t.lower().split(" ") for i, t in rows}
    for i, _ in rows:
        w = toks[i]
        for p in range(1, len(w) - n + 2):
            occ.append((i, p, " ".join(w[p - 1 : p - 1 + n])))
    from collections import defaultdict

    by_key = defaultdict(list)
    for i, p, g in occ:
        by_key[g].append((i, p))
    covered = defaultdict(set)
    for g, occs in by_key.items():
        if len(occs) < 2:
            continue
        first = min(occs)
        for i, p in occs:
            if (i, p) != first:
                covered[i].update(range(p, p + n))
    spans = []
    for i, pos_set in covered.items():
        ps = sorted(pos_set)
        start = prev = ps[0]
        for p in ps[1:]:
            if p == prev + 1:
                prev = p
                continue
            spans.append((i, start, prev, prev - start + 1))
            start = prev = p
        spans.append((i, start, prev, prev - start + 1))
    return sorted(spans)


def test_random_corpus_matches_python_oracle(spark):
    rng = random.Random(1234)
    vocab = [f"w{k}" for k in range(12)]  # tiny vocab → many collisions
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40))))
        for i in range(40)
    ]
    for n in (3, 5):
        d = _docs(spark, rows)
        assert _spans(duplicate_spans(d, n=n)) == _py_oracle_spans(rows, n)


def test_strip_counts_consistent_on_fixture_sample(spark):
    from tests.conftest import SF_ORACLE
    from vector_db_setup_spark.sources.registry import load_table

    d = load_table(spark, SF_ORACLE, "documents")
    out = span_dedup(d, n=8).collect()
    assert len(out) == 500
    for r in out:
        n_clean = len(r["clean_text"].split(" ")) if r["clean_text"] else 0
        assert n_clean == r["n_kept"]
        assert r["n_kept"] + r["n_removed"] >= r["n_kept"]
        assert r["n_removed"] >= 0
    assert any(r["n_removed"] > 0 for r in out)  # fixture has dups


def test_occurrences_positions_one_based(spark):
    d = _docs(spark, [(3, "a b c d e f g h i")])  # 9 tokens, n=8 → 2 grams
    occ = ngram_occurrences(d, n=8).collect()
    assert sorted((r["id"], r["pos"]) for r in occ) == [(3, 1), (3, 2)]


def test_contaminated_spans_no_first_occurrence_exemption(spark):
    from vector_db_setup_spark.operators.span_dedup import (
        contaminated_spans,
    )

    probes = _docs(spark, [(0, "q1 q2 q3 q4 q5")])
    corpus = _docs(
        spark,
        [
            (10, "a0 a1 q1 q2 q3 q4 q5 a2"),  # embeds the probe
            (11, "b0 b1 b2 b3 b4 b5"),  # clean
        ],
    )
    got = _spans(contaminated_spans(corpus, probes, n=5))
    # the ONLY copy in the corpus is still flagged (unlike duplicate_spans)
    assert got == [(10, 3, 7, 5)]


def test_contaminated_spans_strip_removes_all_probe_grams(spark):
    from vector_db_setup_spark.operators.span_dedup import (
        contaminated_spans,
        ngram_occurrences,
    )

    probes = _docs(spark, [(0, PASSAGE)])
    corpus = _docs(
        spark,
        [
            (10, "h0 h1 " + PASSAGE + " t0"),
            (11, PASSAGE + " " + PASSAGE),
            (12, "c0 c1 c2 c3 c4 c5 c6 c7 c8"),
        ],
    )
    spans = contaminated_spans(corpus, probes, n=5)
    cleaned = strip_spans(corpus, spans)
    # re-scan the cleaned corpus: zero probe n-grams survive
    cdocs = cleaned.selectExpr("doc_id", "clean_text as text")
    probe_keys = ngram_occurrences(probes, n=5).select("gram").distinct()
    left = ngram_occurrences(cdocs, n=5).join(probe_keys, "gram")
    assert left.count() == 0
    got = _clean(cleaned)
    assert got[12][2] == 0  # clean doc untouched
    assert got[11][0] == ""  # pure-probe doc fully stripped


def test_contaminated_spans_disjoint_corpora_empty(spark):
    from vector_db_setup_spark.operators.span_dedup import (
        contaminated_spans,
    )

    probes = _docs(spark, [(0, "x1 x2 x3 x4 x5 x6")])
    corpus = _docs(spark, [(10, "y1 y2 y3 y4 y5 y6")])
    assert contaminated_spans(corpus, probes, n=5).count() == 0


def test_property_random_corpora_match_python_oracle(spark):
    """Hypothesis-driven: arbitrary small corpora (tiny vocab → dense
    collision structure, variable doc lengths incl. sub-n docs) always
    match the brute-force Python oracle, for two shingle widths."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    vocab = st.integers(min_value=0, max_value=7).map(lambda k: f"w{k}")
    doc = st.lists(vocab, min_size=1, max_size=24).map(" ".join)
    corpus = st.lists(doc, min_size=1, max_size=12)

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(corpus=corpus, n=st.sampled_from([2, 3]))
    def check(corpus, n):
        rows = list(enumerate(corpus))
        d = _docs(spark, rows)
        assert _spans(duplicate_spans(d, n=n)) == _py_oracle_spans(rows, n)

    check()
