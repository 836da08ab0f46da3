"""Text-analysis column expressions (north-star extension: language-ID,
quality scoring, token counting, fingerprinting — BASELINE.json).

Everything here is a *native* column expression (split/transform/
aggregate/md5) — no Python UDFs — so the whole text pipeline stays in
whole-stage codegen and is byte-for-byte reproducible in the DuckDB
oracle. Portability rules used throughout:

- tokens: lowercase, split on a single space (fixture text is
  space-separated word soup).
- hashes: md5 hex (identical in Spark/DuckDB); never engine-native
  hash() (murmur seeds differ between engines).
- n-gram index arithmetic is guarded for < n tokens (Spark's
  ``sequence(1, 0)`` counts *down*, DuckDB's returns empty).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny function-word lists for the language-ID heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "und", "das", "ist"),
    "es": ("el", "la", "los", "que", "de"),
    "fr": ("le", "la", "les", "et", "est"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),  # romanized placeholders
}

STOPWORDS = ("a", "the", "of", "and", "to", "in", "is")


def tokens(text: Column | str) -> Column:
    """Lowercased whitespace tokens."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(c), " ")


def token_count(text: Column | str) -> Column:
    """Whitespace token count (the 'length in tokens' a training-data
    pipeline budgets by)."""
    return F.size(tokens(text))


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Array of n-word shingles (the MinHash/Jaccard unit).

    Guarded so < n tokens yields an empty array — Spark's ``sequence``
    would otherwise generate a *descending* index range.
    """
    toks = tokens(text)
    sz = F.size(toks)
    idx = F.when(sz >= n, F.sequence(F.lit(1), sz - F.lit(n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )


def doc_fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 over the sorted distinct
    token set (reference has no fingerprinting; mandated text-analysis
    extension). Equal fingerprints ⇔ equal token sets — an
    order-insensitive exact-dedup key."""
    t = F.array_sort(F.array_distinct(tokens(text)))
    return F.md5(F.encode(F.array_join(t, " "), "UTF-8"))


def stopword_ratio(text: Column | str) -> Column:
    toks = tokens(text)
    stop = F.filter(toks, lambda w: w.isin(*STOPWORDS))
    return F.when(F.size(toks) > 0, F.size(stop) / F.size(toks))


def avg_token_len(text: Column | str) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        toks, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    return F.when(F.size(toks) > 0, total / F.size(toks))


def quality_score(text: Column | str) -> Column:
    """Composite quality score in [0, 1]: favors mid-length docs with a
    moderate stopword ratio and plausible word lengths — the shape of a
    C4/Gopher-style quality filter, deterministic and SQL-expressible."""
    c = F.col(text) if isinstance(text, str) else text
    n_tok = token_count(c).cast("double")
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    stop = F.coalesce(stopword_ratio(c), F.lit(0.0))
    stop_score = F.lit(1.0) - F.abs(stop - F.lit(0.1)) / F.lit(0.9)
    wl = F.coalesce(avg_token_len(c), F.lit(0.0))
    wl_score = F.when((wl >= 3.0) & (wl <= 8.0), 1.0).otherwise(0.5)
    return (len_score + stop_score + wl_score) / F.lit(3.0)


def lang_id(text: Column | str) -> Column:
    """N-gram/function-word language-ID heuristic: count marker-word hits
    per language over the token set; highest count wins (ties broken by
    language code order); no hits → 'und' (undetermined)."""
    toks = tokens(text)

    def _marker_filter(markers: tuple[str, ...]):
        # closure factory: a plain 1-arg lambda (a 2-arg lambda would make
        # F.filter pass the element *index* as the second argument)
        return lambda w: w.isin(*markers)

    scores = [
        (lang, F.size(F.filter(toks, _marker_filter(markers))))
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    best = F.greatest(*[s for _, s in scores])
    result = F.lit("und")
    # reversed so earlier language codes win ties
    for lang, score in reversed(scores):
        result = F.when((score == best) & (best > 0), F.lit(lang)).otherwise(result)
    return result


def char_ngrams(text: Column | str, n: int = 4) -> Column:
    """Character n-grams over the lowercased text (SimHash features)."""
    c = F.lower(F.col(text) if isinstance(text, str) else text)
    ln = F.length(c)
    idx = F.when(ln >= n, F.sequence(F.lit(1), ln - F.lit(n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: c.substr(i, F.lit(n)))


def hashed_bow_vector(text: Column | str, dim: int = 64) -> Column:
    """DENSE hashing-trick bag-of-words vector (array<double>, length
    ``dim``): slot j counts the tokens whose md5-derived bucket is j —
    the dense form of the sparse `hashed_bow` featurization, giving
    every document a fixed-width embedding with NO vocabulary pass.
    Integer counts cast to double, so two engines computing it agree
    EXACTLY (the property the SemDeDup oracle leans on). Pure codegen,
    no explode, no shuffle, no UDF — built as ONE functional fold:
    tokens map to an int bucket array (md5 once per token), then
    `aggregate` folds the histogram in a single pass. The fold
    GUARANTEES single evaluation of the bucket array; the obvious
    per-slot form (dim x size(filter(...))) re-inlines the bucket
    expression into every slot lambda — higher-order lambdas get no
    common-subexpression elimination — and measured 3.4x slower at
    dim=64 even after hoisting the md5."""
    toks = tokens(text)
    buckets = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast(
            "bigint"
        )
        % dim,
    )
    return F.aggregate(
        buckets,
        F.array_repeat(F.lit(0.0), dim),
        lambda acc, b: F.transform(
            acc,
            lambda x, i: x
            + F.when(i.cast("bigint") == b, F.lit(1.0)).otherwise(
                F.lit(0.0)
            ),
        ),
    )


# GPT-2-style pre-tokenizer approximation, restricted to constructs that
# behave IDENTICALLY under Java regex (Spark, leftmost-first) and RE2
# (DuckDB, leftmost-longest): the three alternatives start on disjoint
# character classes (letter / digit / other, each with an optional
# leading space), so both matching disciplines produce the same token
# stream. Runs of unmatched whitespace are skipped — they are not
# tokens.
BPE_TOKEN_RE = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"


def bpe_token_count(text: Column | str) -> Column:
    """Sub-word-ish token count via the BPE pre-tokenizer regex — the
    'how many tokens will the model actually see' estimate a training
    pipeline budgets with (whitespace undercounts punctuation-heavy and
    number-heavy text). Pure codegen regexp_count; no UDF."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(BPE_TOKEN_RE))
