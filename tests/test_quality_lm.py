"""lm_perplexity_buckets: independent plain-Python recomputation of
the smoothed-bigram perplexity for sample documents (the DuckDB
oracle is a second SQL engine; this is a third, non-SQL witness), and
the filter's separation property on constructed text."""

from __future__ import annotations

import math
from collections import Counter

from tests.conftest import SF_ORACLE
from vector_db_setup_spark import queries as q
from vector_db_setup_spark.sources.registry import load_table


def _py_ppl(ref_texts, text, alpha=0.5):
    c12, c1, vocab = Counter(), Counter(), set()
    for t in ref_texts:
        w = t.lower().split(" ")
        vocab.update(w)
        for a, b in zip(w, w[1:]):
            c12[(a, b)] += 1
            c1[a] += 1
    v = len(vocab)
    w = text.lower().split(" ")
    nll = [
        -math.log2((c12[(a, b)] + alpha) / (c1[a] + alpha * v))
        for a, b in zip(w, w[1:])
    ]
    return 2 ** (sum(nll) / len(nll))


def test_ppl_matches_python_witness(spark):
    d = load_table(spark, SF_ORACLE, "documents")
    rows = {r["doc_id"]: r["text"] for r in d.collect()}
    ref = [rows[i] for i in range(100)]
    got = {
        r["doc_id"]: r["ppl"]
        for r in q.lm_perplexity_buckets(spark, SF_ORACLE).collect()
    }
    assert len(got) == 400
    for doc_id in (100, 237, 499):
        assert abs(got[doc_id] - _py_ppl(ref, rows[doc_id])) < 1e-5


def test_reference_like_text_beats_word_salad(spark):
    """A doc stitched from reference bigrams must score (much) lower
    perplexity than one of never-seen tokens — the separation the
    CCNet filter exists for."""
    d = load_table(spark, SF_ORACLE, "documents")
    rows = {r["doc_id"]: r["text"] for r in d.collect()}
    ref = [rows[i] for i in range(100)]
    in_domain = " ".join(rows[0].split(" ")[:20])
    salad = " ".join(f"zz{i}" for i in range(20))
    # the fixture's ~30-word uniform vocabulary makes its LM nearly
    # uniform (every unseen bigram backs off to ~1/V), so separation
    # is strict but not dramatic here; real language widens it
    assert _py_ppl(ref, in_domain) < _py_ppl(ref, salad)
    got = {
        r["doc_id"]: (r["ppl"], r["bucket"])
        for r in q.lm_perplexity_buckets(spark, SF_ORACLE).collect()
    }
    # tercile sanity: 400 scored docs split ~134/133/133, and the
    # bucket boundaries are monotone in ppl
    buckets = {"head": [], "middle": [], "tail": []}
    for ppl, b in got.values():
        buckets[b].append(ppl)
    assert sum(len(v) for v in buckets.values()) == 400
    assert max(buckets["head"]) <= min(buckets["middle"])
    assert max(buckets["middle"]) <= min(buckets["tail"])
