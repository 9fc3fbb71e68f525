"""Operator-level pins for the round-13 staged restock
(fuzzy_join_edit1_fastss, trend_ols_by_nation, ht_sampled_total_audit).

The dual-run pins their end-to-end values against DuckDB; these tests
pin the properties the aggregate contracts can't see directly:
FastSS blocking completeness vs brute force, the closed-form OLS
arithmetic against a hand-solvable series, and the HT sample's
mergeability/determinism.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _fastss_pairs(spark, names):
    """Run the staged query's FastSS shape over an in-memory name set
    and return the verified pair-id set."""
    df = spark.createDataFrame(list(enumerate(names)), ["id", "name"])
    variants = df.select(
        "id",
        "name",
        F.explode(
            F.expr(
                "array_union(array(name), transform("
                "sequence(1, length(name)), i -> concat("
                "substring(name, 1, i - 1), "
                "substring(name, i + 1, length(name)))))"
            )
        ).alias("v"),
    )
    a = variants.select(
        F.col("id").alias("id_a"), F.col("name").alias("name_a"), "v"
    )
    b = variants.select(
        F.col("id").alias("id_b"), F.col("name").alias("name_b"), "v"
    )
    cand = (
        a.join(b, "v")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "name_a", "id_b", "name_b")
        .distinct()
    )
    got = (
        cand.where(F.levenshtein("name_a", "name_b") <= 1)
        .select("id_a", "id_b")
        .collect()
    )
    return {(r.id_a, r.id_b) for r in got}


def test_fastss_matches_brute_force(spark):
    """FastSS deletion-neighborhood blocking recovers EXACTLY the
    brute-force edit-distance<=1 pair set — the completeness theorem
    (two strings within ed 1 share a deletion variant) made a pin."""
    names = (
        [f"user{i:03d}" for i in range(40)]  # digit-substitution pairs
        + ["spark", "spars", "sparks", "shark", "stark", "spa"]
        + ["a", "ab", "abc", "abd", "bc", ""]
    )
    df = spark.createDataFrame(list(enumerate(names)), ["id", "name"])
    brute = (
        df.alias("x")
        .crossJoin(df.alias("y"))
        .where(F.col("x.id") < F.col("y.id"))
        .where(F.levenshtein(F.col("x.name"), F.col("y.name")) <= 1)
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .collect()
    )
    want = {(r.id_a, r.id_b) for r in brute}
    assert _fastss_pairs(spark, names) == want
    assert want, "fixture must contain true pairs"


def test_fastss_no_false_positives_after_verify(spark):
    """Distance-2 strings may share a candidate key but never survive
    the levenshtein verify."""
    pairs = _fastss_pairs(spark, ["abcd", "abef", "xyz", "xqr"])
    assert pairs == set()


def test_ols_closed_form_on_exact_line(spark):
    """Points ON a line y = 3x + 7 recover slope 3, intercept 7
    exactly (integer numerators, one IEEE division)."""
    rows = [(x, 3 * x + 7) for x in (0, 2, 5, 9, 14)]
    df = spark.createDataFrame(rows, ["x", "y"])
    sums = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0))").alias("sx"),
        F.expr("CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0))").alias("sy"),
        F.expr(
            "CAST(sum(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))"
            " AS DECIMAL(38,0))"
        ).alias("sxy"),
        F.expr(
            "CAST(sum(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))"
            " AS DECIMAL(38,0))"
        ).alias("sxx"),
    )
    row = sums.select(
        F.expr(
            "CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)"
            " / CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)"
        ).alias("slope"),
        F.expr(
            "CAST(sy * sxx - sx * sxy AS DOUBLE)"
            " / CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)"
        ).alias("intercept"),
    ).collect()[0]
    assert row.slope == pytest.approx(3.0, abs=0)
    assert row.intercept == pytest.approx(7.0, abs=0)


def test_ht_sample_is_deterministic_and_mergeable(spark):
    """The hash-coin Bernoulli sample is a pure function of the key:
    re-running selects the same rows, and sampling a union equals the
    union of the samples (the property that lets scan-level sampling
    run independently per 100 TB partition)."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.quantiles import (
        COIN_SPAN,
        bernoulli_sample,
    )

    df = spark.range(0, 4000).select(F.col("id"))
    a = df.where(F.col("id") < 2000)
    b = df.where(F.col("id") >= 2000)
    pick = lambda d: {
        r.id
        for r in bernoulli_sample(
            d, F.col("id"), ":ht-test", COIN_SPAN // 16
        ).collect()
    }
    whole, again = pick(df), pick(df)
    assert whole == again
    assert whole == pick(a) | pick(b)
    # ~1/16 of 4000 with generous slack — a degenerate coin would
    # select everything or nothing
    assert 100 < len(whole) < 500


def test_ht_estimator_exact_arithmetic(spark):
    """HT estimate = 16 * sampled sum exactly, and equals the true
    total when the value column is constant per sampled row count —
    pins the integer estimator arithmetic the staged oracle rounds."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.quantiles import (
        COIN_SPAN,
        hash_coin,
    )

    df = spark.range(0, 5000).select(
        F.col("id"), (F.col("id") % 97 + 1).alias("cents")
    )
    coin = hash_coin(F.col("id"), ":ht-test2")
    sampled = (coin < COIN_SPAN // 16).cast("long")
    row = df.agg(
        F.sum("cents").cast("long").alias("exact"),
        (F.sum(F.col("cents") * sampled) * 16).cast("long").alias("est"),
        F.sum(F.col("cents") * sampled).cast("long").alias("ssum"),
    ).collect()[0]
    assert row.est == 16 * row.ssum
    assert row.est > 0
