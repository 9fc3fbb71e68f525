"""Positional phrase-search contracts: adjacency semantics including
the overlapping-occurrence case regex counting gets wrong, multi-term
chains, and postings construction."""

import pytest
from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.operators.retrieval import (
    phrase_occurrences,
    phrase_search,
    positional_postings,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_postings_positions_are_one_based_occurrences(spark):
    rows = positional_postings(_docs(spark, ["a b a"])).collect()
    got = sorted((r.token, r.pos) for r in rows)
    assert got == [("a", 1), ("a", 3), ("b", 2)]


def test_phrase_counts_overlapping_occurrences(spark):
    """'a a a' contains the phrase 'a a' TWICE (positions 1 and 2) —
    token-adjacency semantics; non-overlapping regex would say 1."""
    out = {
        r.doc_id: r.n_occurrences
        for r in phrase_search(_docs(spark, ["a a a", "a a", "a b a"]), ["a", "a"]).collect()
    }
    assert out == {0: 2, 1: 1}


def test_three_term_phrase_chain(spark):
    texts = [
        "x quick brown fox y",
        "quick brown cat quick brown fox",
        "brown fox quick",
    ]
    out = {
        r.doc_id: r.n_occurrences
        for r in phrase_search(_docs(spark, texts), ["quick", "brown", "fox"]).collect()
    }
    assert out == {0: 1, 1: 1}


def test_single_term_phrase_equals_term_frequency(spark):
    out = {
        r.doc_id: r.n_occurrences
        for r in phrase_search(_docs(spark, ["q w q", "w w"]), ["q"]).collect()
    }
    assert out == {0: 2}


def test_empty_phrase_raises(spark):
    postings = positional_postings(_docs(spark, ["a b"]))
    with pytest.raises(ValueError, match="non-empty"):
        phrase_occurrences(postings, [])


def test_no_match_returns_empty(spark):
    assert phrase_search(_docs(spark, ["a b c"]), ["c", "a"]).count() == 0
