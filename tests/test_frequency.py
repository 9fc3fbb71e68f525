"""Heavy-hitters operator: exactness vs the naive histogram on skewed
corpora, and the bounded-memory candidate guarantee."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.functions.text import tokens
from api_kakfa_spark_airflow_s3_athena_spark.operators.frequency import (
    _mg_candidates,
    heavy_hitters,
)


def _skewed_docs(spark):
    """80 docs; 'common' appears in every doc 5x, 'rare' once total;
    mid-frequency fillers vary per doc — a power-law-ish stream."""
    rows = []
    for i in range(80):
        words = ["common"] * 5 + [f"mid{i % 7}"] * 3 + [f"tail{i}", "filler"]
        if i == 0:
            words.append("rare")
        rows.append(Row(doc_id=i, text=" ".join(words)))
    return spark.createDataFrame(rows).repartition(8)


def _naive(spark, docs, num_counters):
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("token"))
    n = tok.count()
    return {
        (r.token, r.freq)
        for r in tok.groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .filter(F.col("freq") * num_counters > F.lit(n))
        .collect()
    }


@pytest.mark.parametrize("num_counters", [3, 10, 50])
def test_heavy_hitters_exact_vs_naive(spark, num_counters):
    docs = _skewed_docs(spark)
    got = {(r.token, r.freq) for r in heavy_hitters(docs, num_counters=num_counters).collect()}
    assert got == _naive(spark, docs, num_counters)


def test_heavy_hitters_finds_the_dominant_token(spark):
    docs = _skewed_docs(spark)
    got = dict(
        (r.token, r.freq) for r in heavy_hitters(docs, num_counters=5).collect()
    )
    assert got.get("common") == 400  # 80 docs x 5 — exact count, not estimate
    assert "rare" not in got


def test_candidate_phase_is_bounded(spark):
    """Each partition emits at most num_counters candidate tokens —
    the memory bound that makes the first phase safe at any scale."""
    docs = _skewed_docs(spark)
    per_part = (
        docs.select("text")
        .mapInPandas(_mg_candidates(4, "text"), schema="token string")
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert per_part and all(r.n <= 4 for r in per_part)


def test_heavy_hitters_mixed_whitespace_matches_jvm_tokenizer(spark):
    """Tab/newline/CR split like Java \\s+; NBSP (Unicode whitespace,
    NOT in Java's ASCII \\s) must NOT split — the candidate pass and
    the JVM recount have to agree on every one of these or a true
    heavy hitter silently never enters the candidate set."""
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="a\ta\na  a\ra"),
            Row(doc_id=1, text="a a a a"),
            Row(doc_id=2, text="b b b b"),  # NBSP-glued token
        ]
    )
    got = {(r.token, r.freq) for r in heavy_hitters(docs, num_counters=2).collect()}
    assert got == _naive(spark, docs, 2)
    assert ("a", 9) in got


def test_heavy_hitters_empty_and_null_texts(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=0, text=""), Row(doc_id=1, text=None), Row(doc_id=2, text="a a a")]
    )
    got = {(r.token, r.freq) for r in heavy_hitters(docs, num_counters=2).collect()}
    assert got == {("a", 3)}
