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
    "tokens",
    "token_count",
    "word_shingles",
    "char_shingles",
    "quality_features",
    "language_scores",
    "detect_language",
    "fingerprint",
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
    dedup. Sliding window over the token array via transform+slice —
    no explode, no shuffle."""
    toks = tokens(text)
    count = F.size(toks) - F.lit(n - 1)
    # sequence(1, 0) would DESCEND ([1, 0]); short docs need an empty array
    idx = F.when(count >= 1, F.sequence(F.lit(1), count)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))


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


def fingerprint(text: Column) -> Column:
    """Order/count-insensitive document fingerprint: md5 over the sorted
    distinct lowercase token set. Two docs with the same bag of words
    (any order/multiplicity) collide — the classic "fingerprint dedup"
    key, computable without any shuffle."""
    norm = F.array_sort(F.array_distinct(F.transform(tokens(text), lambda t: F.lower(t))))
    return F.md5(F.array_join(norm, " "))
