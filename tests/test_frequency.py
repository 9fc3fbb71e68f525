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


# ---------------------------------------------------------------------
# Per-key heavy hitters
# ---------------------------------------------------------------------

def _keyed_units(spark, parts=8):
    """Two keys with DIFFERENT distributions: key 'a' dominated by
    'hot' (60%), key 'b' near-uniform over 12 units — per-key
    thresholds must separate them where a global one cannot."""
    rows = []
    for i in range(300):
        rows.append(Row(k="a", unit="hot" if i % 5 < 3 else f"a{i % 9}"))
        rows.append(Row(k="b", unit=f"b{i % 12}"))
    return spark.createDataFrame(rows).repartition(parts)


def _naive_by_key(units, num_counters):
    tot = {r.k: r.n for r in units.groupBy("k").count().withColumnRenamed("count", "n").collect()}
    return {
        (r.k, r.unit, r.freq)
        for r in units.groupBy("k", "unit")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .collect()
        if r.freq * num_counters > tot[r.k]
    }


@pytest.mark.parametrize("num_counters", [2, 5, 20])
def test_heavy_hitters_by_key_exact_vs_naive(spark, num_counters):
    from api_kakfa_spark_airflow_s3_athena_spark.operators.frequency import (
        heavy_hitters_by_key,
    )

    units = _keyed_units(spark)
    got = {
        (r.k, r.unit, r.freq)
        for r in heavy_hitters_by_key(
            units, ["k"], "unit", num_counters=num_counters
        ).collect()
    }
    assert got == _naive_by_key(units, num_counters)


def test_heavy_hitters_by_key_thresholds_are_per_key(spark):
    """'hot' (60% of key a) qualifies at num_counters=2 for ITS key;
    nothing in near-uniform key b does — a global threshold over the
    concatenated stream could not produce this split."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.frequency import (
        heavy_hitters_by_key,
    )

    res = heavy_hitters_by_key(
        _keyed_units(spark), ["k"], "unit", num_counters=2
    ).collect()
    assert {(r.k, r.unit) for r in res} == {("a", "hot")}
    assert all(r.n_units == 300 for r in res)


def test_heavy_hitters_by_key_partition_invariant_and_shuffled_join(spark):
    from api_kakfa_spark_airflow_s3_athena_spark.operators.frequency import (
        heavy_hitters_by_key,
    )

    expect = _naive_by_key(_keyed_units(spark), 5)
    for parts in (1, 13):
        for bc in (True, False):
            got = {
                (r.k, r.unit, r.freq)
                for r in heavy_hitters_by_key(
                    _keyed_units(spark, parts=parts),
                    ["k"],
                    "unit",
                    num_counters=5,
                    broadcast_candidates=bc,
                ).collect()
            }
            assert got == expect, (parts, bc)


def test_heavy_hitters_by_key_null_units_ignored(spark):
    from api_kakfa_spark_airflow_s3_athena_spark.operators.frequency import (
        heavy_hitters_by_key,
    )

    units = spark.createDataFrame(
        [Row(k="a", unit="x"), Row(k="a", unit=None), Row(k="a", unit="x")]
    )
    res = heavy_hitters_by_key(units, ["k"], "unit", num_counters=3).collect()
    # NULL occurrences are not units: they neither count toward totals
    # nor appear as candidates
    assert {(r.k, r.unit, r.freq, r.n_units) for r in res} == {("a", "x", 2, 2)}
