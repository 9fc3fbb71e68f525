"""Text-analysis column functions for the training-data pipeline surface.

All pure ``pyspark.sql.functions`` compositions (JVM-side, codegen'd,
no Python in the hot path), designed to run over a 100 TB ``documents``
table: everything is per-row/narrow except where a caller aggregates.

The reference has no text operators (its only string work is concat +
md5 in the producer, ``dags/producer/kafka_streaming_service.py:
142-156``); these are the driver-mandated extensions (BASELINE.json
north star), built on split/lower/regexp/explode per SURVEY.md §2f.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "canonical_key",
    "tokens",
    "token_count",
    "word_shingles",
    "word_shingles_from_tokens",
    "char_shingles",
    "quality_features",
    "language_scores",
    "detect_language",
    "fingerprint",
    "repetition_features",
    "mask_pii",
]

# Marker stopwords per language for the n-gram/stopword language-ID
# heuristic. Tiny on purpose: broadcastable as literals into codegen.
LANG_MARKERS: Mapping[str, Sequence[str]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr": ("le", "la", "les", "et", "est", "une", "que"),
    "es": ("el", "la", "los", "y", "es", "una", "que"),
    "zh": ("的", "是", "了", "在", "和", "有", "我"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization -> array<string>; empty tokens removed so
    leading/trailing/duplicate whitespace doesn't fabricate tokens."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Cheap LLM-token estimate: letter runs, digit runs, and single
    punctuation marks each count as one token (a BPE-ish lexer as one
    ``regexp_extract_all`` — JVM-side, portable RE2-safe pattern)."""
    return F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)))


def word_shingles(text: Column, n: int = 3) -> Column:
    """Word n-grams as array<string>: the unit set for MinHash/Jaccard
    dedup. See :func:`word_shingles_from_tokens` for the construction
    notes; this is the text-column convenience form."""
    return word_shingles_from_tokens(tokens(text), n)


def word_shingles_from_tokens(toks: Column, n: int) -> Column:
    """Word n-grams from an already-tokenized array<string>. Built as
    n-1 ``zip_with`` passes over shifted slices of the token array —
    no explode, no shuffle, and (crucially) no outer capture inside a
    HOF lambda: a transform-over-sequence lambda that referenced the
    token subtree would INLINE it per index and go quadratic per
    document (NOTES.md). The zip inputs are plain arguments, each
    evaluated once per row. Callers that already hold the token array
    (one tokenization, several consumers) use this form to avoid
    re-splitting the text per consumer."""
    length = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    out = F.slice(toks, 1, length)
    for k in range(1, n):
        out = F.zip_with(
            out,
            F.slice(toks, 1 + k, length),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return out


def char_shingles(text: Column, n: int = 5) -> Column:
    """Character n-grams (SimHash/near-dup unit for CJK-ish text)."""
    norm = F.lower(text)
    count = F.length(norm) - F.lit(n - 1)
    idx = F.when(count >= 1, F.sequence(F.lit(1), count)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.substring(norm, i, n))


def quality_features(text: Column) -> Mapping[str, Column]:
    """Deterministic quality-scoring features: length, token stats,
    punctuation / digit / uppercase / whitespace ratios, stopword ratio.
    Callers combine into a score or filter; each is one codegen'd expr."""
    toks = tokens(text)
    n_char = F.length(text).cast("double")
    n_tok = F.size(toks).cast("double")
    safe_char = F.greatest(n_char, F.lit(1.0))
    safe_tok = F.greatest(n_tok, F.lit(1.0))
    stop = F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])
    return {
        "n_chars": n_char,
        "n_tokens": n_tok,
        "mean_token_len": F.length(F.array_join(toks, "")).cast("double") / safe_tok,
        "punct_ratio": F.length(F.regexp_replace(text, r"[^\p{Punct}]", "")).cast("double") / safe_char,
        "digit_ratio": F.length(F.regexp_replace(text, r"[^0-9]", "")).cast("double") / safe_char,
        "upper_ratio": F.length(F.regexp_replace(text, r"[^A-Z]", "")).cast("double") / safe_char,
        "stopword_ratio": F.size(F.filter(toks, lambda t: F.array_contains(stop, F.lower(t)))).cast("double") / safe_tok,
    }


def language_scores(text: Column) -> Mapping[str, Column]:
    """Per-language marker-hit counts over the token set."""
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    out = {}
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))
    return out


def detect_language(text: Column) -> Column:
    """Argmax over :func:`language_scores`; ties and zero-hits -> 'und'.

    Deterministic: languages compete in fixed iteration order and a
    strictly-greater comparison keeps the earlier winner on ties.
    """
    scores = language_scores(text)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang, score in scores.items():
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


def repetition_features(text: Column) -> Mapping[str, Column]:
    """Gopher-style repetition signals (Rae et al. 2021, public
    literature), token-level because the corpus is single-line:

    - ``n_tokens`` / ``n_distinct_tokens`` (+ their ratio implied),
    - ``top_token_count``: multiplicity of the most frequent token,
    - ``dup_bigram_frac``: 1 - distinct/total word bigrams.

    Every signal is row-local — zero shuffle over a 100 TB corpus. The
    top-token count is a single ``aggregate`` fold over the SORTED
    token array (longest equal-run), not a nested filter-per-distinct
    lambda: nested HOF lambdas inline the outer array subtree and go
    quadratic (see NOTES.md), a fold stays linear.
    """
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    n_tok = F.size(toks).cast("long")
    sorted_toks = F.array_sort(toks)
    run_state = F.struct(
        F.lit("").alias("prev"), F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )
    top_count = F.aggregate(
        sorted_toks,
        run_state,
        lambda st, t: F.struct(
            t.alias("prev"),
            F.when(t == st.prev, st.run + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.greatest(
                st.best,
                F.when(t == st.prev, st.run + 1).otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
        lambda st: st.best,
    )
    bigrams = word_shingles(F.lower(text), 2)
    n_bi = F.size(bigrams).cast("long")
    n_bi_distinct = F.size(F.array_distinct(bigrams)).cast("long")
    return {
        "n_tokens": n_tok,
        "n_distinct_tokens": F.size(F.array_distinct(toks)).cast("long"),
        "top_token_count": top_count,
        # exact-integer ratios: single double division, never rounded
        # (bit-identical across engines — NOTES.md float recipe)
        "dup_bigram_frac": F.when(
            n_bi > 0,
            F.lit(1.0) - n_bi_distinct.cast("double") / n_bi.cast("double"),
        ),
    }


# Portable (Java regex AND RE2) patterns: no lookbehind, no \p classes.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_LONG_NUM_RE = r"[0-9]{4,}"


def mask_pii(text: Column) -> Column:
    """Training-data PII scrub: replace email addresses with
    ``<EMAIL>`` and 4+-digit runs (phones, SSN-ish ids, card
    fragments) with ``<NUM>``. Order matters — emails first, so their
    digit runs don't get half-masked into non-emails. Pure
    ``regexp_replace`` chain: JVM-side, codegen'd, no Python."""
    no_email = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(no_email, PII_LONG_NUM_RE, "<NUM>")


def canonical_key(text: Column) -> Column:
    """Canonicalized exact-dedup key: md5 over the text with case
    folded, punctuation replaced by spaces, and whitespace runs
    collapsed — the cheap first-line dedup key every production
    pipeline computes BEFORE near-dup LSH (a re-crawled page that
    differs only in casing, spacing, or trailing punctuation must
    collapse without paying shingles). Row-local in the scan
    projection, so only 16-byte digests reach the dedup shuffle.
    Distinct from :func:`fingerprint` (order/count-insensitive token
    SET): canonical_key preserves token order and multiplicity.
    Both regex classes are ASCII-only in Spark's Java regex AND
    DuckDB's RE2, so the oracle twin is byte-identical (DuckDB needs
    the 'g' flag — its regexp_replace is first-match by default,
    Spark's is global)."""
    canon = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(text), r"[^a-z0-9\s]", " "),
            r"\s+",
            " ",
        )
    )
    return F.md5(canon)


def fingerprint(text: Column) -> Column:
    """Order/count-insensitive document fingerprint: md5 over the sorted
    distinct lowercase token set. Two docs with the same bag of words
    (any order/multiplicity) collide — the classic "fingerprint dedup"
    key, computable without any shuffle."""
    norm = F.array_sort(F.array_distinct(F.transform(tokens(text), lambda t: F.lower(t))))
    return F.md5(F.array_join(norm, " "))
