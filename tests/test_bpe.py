"""Distributed BPE trainer vs an independent pure-Python reference:
the learned merge SEQUENCE must match exactly (same data, same
deterministic tie-break), and encode must replay the merges
identically."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from vector_db_setup_spark.operators.bpe import (
    END,
    _encode_word,
    bpe_encode,
    bpe_train,
    bpe_vocab,
    word_freq_table,
)
from vector_db_setup_spark.sources.registry import load_table


def _py_bpe_train(word_freqs: dict[str, int], n_merges: int):
    """Independent reference: Sennrich-style BPE on a word-freq dict,
    greedy left-to-right merge, ties broken (count desc, (a,b) asc)."""
    vocab = {tuple(list(w) + [END]): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        a, b = best
        merges.append(best)
        new_vocab = {}
        for syms, f in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


@pytest.fixture(scope="module")
def wf(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(60)
    t = word_freq_table(docs).persist()
    t.count()
    yield t
    t.unpersist()


def test_merge_sequence_matches_python_reference(spark, wf):
    freqs = {r["w"]: r["freq"] for r in wf.collect()}
    want = _py_bpe_train(freqs, 25)
    got = bpe_train(wf, 25)
    assert got == want
    assert len(got) == 25  # corpus is big enough to sustain 25 merges
    assert bpe_vocab(got) == [a + b for a, b in want]


def test_train_stops_when_pairs_exhausted(spark):
    tiny = spark.createDataFrame([("ab", 3)], "w string, freq long")
    merges = bpe_train(tiny, 10)
    # "a b </w>" supports exactly 2 merges, then single symbols remain
    assert len(merges) == 2
    enc = _encode_word("ab", {p: i for i, p in enumerate(merges)})
    assert enc == ["ab" + END]


def test_encode_matches_reference_and_roundtrips(spark, wf):
    merges = bpe_train(wf, 20)
    ranks = {p: i for i, p in enumerate(merges)}
    docs = load_table(spark, SF_SMOKE, "documents").limit(10)
    out = bpe_encode(docs, merges).select("doc_id", "text", "bpe_tokens")
    for r in out.collect():
        want = []
        for w in r["text"].lower().split():
            want.extend(_encode_word(w, ranks))
        assert r["bpe_tokens"] == want
        # lossless: concatenating tokens minus END markers rebuilds text
        rebuilt = "".join(t for t in r["bpe_tokens"]).replace(END, " ")
        assert rebuilt.rstrip() == " ".join(r["text"].lower().split())


def test_merges_compress_token_count(spark, wf):
    """Sanity: 25 merges must strictly reduce the total symbol count on
    the training corpus (else the argmax picked a zero-gain pair)."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(60)
    merges = bpe_train(wf, 25)
    n0 = docs.select(
        F.sum(F.length(F.regexp_replace(F.lower("text"), r"\s+", "")))
    ).collect()[0][0]
    n1 = (
        bpe_encode(docs, merges)
        .select(F.sum(F.size("bpe_tokens")))
        .collect()[0][0]
    )
    # n0 counts characters (pre-BPE symbols minus END markers)
    assert n1 < n0


def _py_bpe_train_batched(word_freqs: dict[str, int], n_merges: int, k: int):
    """Independent reference for the batched mode: per round, rank all
    pairs (count desc, pair asc), keep the symbol-disjoint prefix of up
    to k (also excluding pairs referencing an accepted pair's merged
    string), and apply them in one greedy left-to-right pass."""
    vocab = {tuple(list(w) + [END]): f for w, f in word_freqs.items()}
    merges = []
    while len(merges) < n_merges:
        counts: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        want = min(k, n_merges - len(merges))
        # the candidate cap is part of the defined batched rule
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            : max(4 * want, 16)
        ]
        used: set = set()
        batch = []
        for (a, b), _ in ranked:
            if len(batch) >= want:
                break
            if a in used or b in used or a + b in used:
                continue
            batch.append((a, b))
            used.update((a, b, a + b))
        if not batch:
            break
        merges.extend(batch)
        lookup = {(a, b): a + b for a, b in batch}
        new_vocab = {}
        for syms, f in vocab.items():
            out = []
            for s in syms:
                if out and (out[-1], s) in lookup:
                    out[-1] = lookup[(out[-1], s)]
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_batched_merges_match_batched_reference(spark, wf):
    freqs = {r["w"]: r["freq"] for r in wf.collect()}
    for k in (4, 8):
        want = _py_bpe_train_batched(freqs, 24, k)
        got = bpe_train(wf, 24, merges_per_round=k)
        assert got == want, (k, got[:5], want[:5])
        assert len(got) == 24


def test_batched_k1_equals_sequential(spark, wf):
    assert bpe_train(wf, 15, merges_per_round=1) == bpe_train(wf, 15)


def test_disjoint_prefix_blocks_merge_string_cascade():
    """Review-found case: a candidate whose MERGED string equals a
    symbol an accepted pair reads must be rejected — else the one-pass
    fold creates the string mid-pass and cascades a second merge onto
    it in the same round. ('abc','d') accepted => ('ab','c') (merging
    to 'abc') must NOT join the batch; and two candidates merging to
    the same string must not both enter."""
    from vector_db_setup_spark.operators.bpe import _disjoint_prefix

    out = _disjoint_prefix([("abc", "d"), ("ab", "c"), ("x", "y")], 3)
    assert out == [("abc", "d"), ("x", "y")]
    out2 = _disjoint_prefix([("a", "bc"), ("ab", "c")], 2)
    assert out2 == [("a", "bc")]


def test_merge_table_persists_and_encodes_identically(spark, wf, tmp_path):
    """train -> save -> load -> encode must equal encoding with the
    in-memory table (incl. non-ASCII symbols through the JSON round
    trip)."""
    from vector_db_setup_spark.operators.bpe import load_merges, save_merges

    merges = bpe_train(wf, 12) + [("é", "è")]  # force a non-ASCII entry
    p = str(tmp_path / "merges.json")
    save_merges(merges, p)
    assert load_merges(p) == merges
    docs = load_table(spark, SF_SMOKE, "documents").limit(5)
    a = [r["bpe_tokens"] for r in bpe_encode(docs, merges).collect()]
    b = [r["bpe_tokens"] for r in bpe_encode(docs, load_merges(p)).collect()]
    assert a == b


def test_non_bmp_train_encode_parity(spark):
    """Astral-plane text (emoji = surrogate pairs in UTF-16): the
    trained alphabet must be code POINTS, not code units, or the
    learned merges are dead at encode time (ADVICE r5). Train on an
    emoji-heavy corpus, check the merge sequence against the pure-
    Python code-point reference, and check encode replays every merge
    (no lone-surrogate symbols anywhere)."""
    freqs = {"\U0001F600\U0001F600ha": 9, "ha\U0001F680": 5, "haha": 3}
    tiny = spark.createDataFrame(
        [(w, f) for w, f in freqs.items()], "w string, freq long"
    )
    merges = bpe_train(tiny, 6)
    assert merges == _py_bpe_train(freqs, 6)
    # no symbol on either side of any merge may contain a lone surrogate
    for a, b in merges:
        for s in (a, b):
            assert not any(0xD800 <= ord(ch) <= 0xDFFF for ch in s), s
    docs = spark.createDataFrame(
        [(1, "\U0001F600\U0001F600ha ha\U0001F680")], "doc_id long, text string"
    )
    ranks = {p: i for i, p in enumerate(merges)}
    (row,) = bpe_encode(docs, merges).collect()
    want = []
    for w in "\U0001F600\U0001F600ha ha\U0001F680".split():
        want.extend(_encode_word(w, ranks))
    assert row["bpe_tokens"] == want
    rebuilt = "".join(row["bpe_tokens"]).replace(END, " ").rstrip()
    assert rebuilt == "\U0001F600\U0001F600ha ha\U0001F680"
