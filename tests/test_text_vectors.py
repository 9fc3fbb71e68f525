"""Text-analysis and vector-math function tests against independently
computed expected values (plain Python / numpy)."""

import math

import numpy as np
from pyspark.sql import Row
from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.functions import text as TX
from api_kakfa_spark_airflow_s3_athena_spark.functions.vectors import cosine, dot, l2_norm, normalize


def _one(spark, text):
    return spark.createDataFrame([Row(t=text)])


def test_tokens_ignore_extra_whitespace(spark):
    got = _one(spark, "  a  b\tc \n d ").select(TX.tokens(F.col("t")).alias("x")).collect()[0].x
    assert got == ["a", "b", "c", "d"]


def test_word_shingles(spark):
    got = (
        _one(spark, "the quick brown fox")
        .select(TX.word_shingles(F.col("t"), 2).alias("x"))
        .collect()[0]
        .x
    )
    assert got == ["the quick", "quick brown", "brown fox"]


def test_word_shingles_short_doc_empty(spark):
    got = _one(spark, "hi").select(TX.word_shingles(F.col("t"), 3).alias("x")).collect()[0].x
    assert got == []


def test_detect_language(spark):
    rows = spark.createDataFrame(
        [
            Row(t="the cat sat on the mat and the dog is in a box"),
            Row(t="der hund ist nicht ein katze und die maus"),
            Row(t="le chat est une merveille et les chiens"),
            Row(t="xyzzy qwerty plugh"),
        ]
    )
    got = [r.lang for r in rows.select(TX.detect_language(F.col("t")).alias("lang")).collect()]
    assert got == ["en", "de", "fr", "und"]


def test_fingerprint_order_and_multiplicity_invariant(spark):
    df = spark.createDataFrame(
        [
            Row(t="alpha beta gamma"),
            Row(t="gamma beta alpha alpha"),  # same token set
            Row(t="alpha beta delta"),  # different set
        ]
    )
    fps = [r.fp for r in df.select(TX.fingerprint(F.col("t")).alias("fp")).collect()]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_quality_features(spark):
    feats = TX.quality_features(F.col("t"))
    row = (
        _one(spark, "The quick brown fox, it JUMPED! Over 42 dogs.")
        .select(*[c.alias(k) for k, c in feats.items()])
        .collect()[0]
    )
    assert row.n_tokens == 9.0
    assert row.n_chars == float(len("The quick brown fox, it JUMPED! Over 42 dogs."))
    assert 0 < row.punct_ratio < 0.2
    assert 0 < row.digit_ratio < 0.1
    assert row.stopword_ratio > 0  # 'The'/'it'/'Over' contains 'the'


def test_vector_math_matches_numpy(spark):
    a = [1.0, 2.0, 3.0]
    b = [-1.0, 0.5, 2.0]
    df = spark.createDataFrame([Row(a=a, b=b)])
    row = df.select(
        dot(F.col("a"), F.col("b")).alias("dot"),
        l2_norm(F.col("a")).alias("na"),
        cosine(F.col("a"), F.col("b")).alias("cos"),
        normalize(F.col("a")).alias("unit"),
    ).collect()[0]
    npa, npb = np.array(a), np.array(b)
    assert row.dot == float(npa @ npb)
    assert math.isclose(row.na, float(np.linalg.norm(npa)), rel_tol=1e-12)
    expected_cos = float(npa @ npb / (np.linalg.norm(npa) * np.linalg.norm(npb)))
    assert math.isclose(row.cos, expected_cos, rel_tol=1e-12)
    assert math.isclose(float(np.linalg.norm(row.unit)), 1.0, rel_tol=1e-12)


def test_cosine_zero_vector_is_null(spark):
    df = spark.createDataFrame([Row(a=[0.0, 0.0], b=[1.0, 2.0])])
    assert df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()[0].c is None


def test_repetition_features_known_values(spark):
    # "a b a b a": tokens=5, distinct=2, top(a)=3
    # bigrams: "a b","b a","a b","b a" -> 4 total, 2 distinct -> dup 0.5
    feats = TX.repetition_features(F.col("t"))
    row = _one(spark, "a b a b a").select(
        *[c.alias(k) for k, c in feats.items()]
    ).collect()[0]
    assert row.n_tokens == 5
    assert row.n_distinct_tokens == 2
    assert row.top_token_count == 3
    assert row.dup_bigram_frac == 0.5


def test_repetition_features_case_insensitive_and_edge(spark):
    feats = TX.repetition_features(F.col("t"))
    row = _one(spark, "The THE the").select(
        *[c.alias(k) for k, c in feats.items()]
    ).collect()[0]
    assert (row.n_distinct_tokens, row.top_token_count) == (1, 3)
    single = _one(spark, "solo").select(
        *[c.alias(k) for k, c in feats.items()]
    ).collect()[0]
    assert single.n_tokens == 1 and single.top_token_count == 1
    assert single.dup_bigram_frac is None  # no bigrams -> undefined


def test_mask_pii(spark):
    got = _one(
        spark, "mail bob.smith+x@corp.example.org or call 0123456789 ext 123"
    ).select(TX.mask_pii(F.col("t")).alias("x")).collect()[0].x
    assert got == "mail <EMAIL> or call <NUM> ext 123"  # 3-digit run untouched


def test_canonical_key_collapses_variants_only(spark):
    """Case / extra-whitespace / punctuation variants collide on the
    canonical key; a genuinely different text does not; the key is
    insensitive to leading/trailing noise."""
    from api_kakfa_spark_airflow_s3_athena_spark.functions.text import canonical_key

    rows = [
        Row(i=0, t="Hello, World!  How are you?"),
        Row(i=1, t="hello world how are you"),
        Row(i=2, t="HELLO   WORLD -- how ARE you???"),
        Row(i=3, t="  hello world how are you  "),
        Row(i=4, t="hello world how are we"),        # different content
        Row(i=5, t="helloworld how are you"),        # spacing changes tokens
    ]
    df = spark.createDataFrame(rows)
    keys = {r.i: r.k for r in df.select("i", canonical_key(F.col("t")).alias("k")).collect()}
    assert keys[0] == keys[1] == keys[2] == keys[3]
    assert keys[4] != keys[0]
    assert keys[5] != keys[0]
