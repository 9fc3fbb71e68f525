"""Sampled-quantile and robust-stats contracts: the discrete rank rule
against a Python reference, sample mergeability (the streaming
property), rank-check falsifiability, and partition invariance."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.operators.quantiles import (
    bernoulli_sample,
    discrete_quantiles,
    quantile_rank_check,
    robust_stats,
    sampled_quantiles,
)


def _coin(i, salt=":s") -> int:
    return int(hashlib.md5(f"{i}{salt}".encode()).hexdigest()[:5], 16)


def _frame(spark, values, parts=4):
    return spark.createDataFrame(
        [("g", i, float(v)) for i, v in enumerate(values)],
        ["grp", "id", "value"],
    ).repartition(parts)


def _ref_discrete(values, q):
    s = sorted(values)
    return s[max(1, math.ceil(q * len(s))) - 1]


def test_discrete_quantiles_match_python_reference(spark):
    values = [((i * 37) % 101) * 0.5 for i in range(101)]
    got = {
        r.q: r.value
        for r in discrete_quantiles(
            _frame(spark, values), ["grp"], "value", "id", [0.25, 0.5, 0.9, 1.0]
        ).collect()
    }
    for q in (0.25, 0.5, 0.9, 1.0):
        assert got[q] == _ref_discrete(values, q), q


def test_discrete_quantiles_partition_invariant(spark):
    values = [float((i * 13) % 47) for i in range(200)]
    results = []
    for parts in (1, 9):
        rows = discrete_quantiles(
            _frame(spark, values, parts=parts), ["grp"], "value", "id", [0.5, 0.99]
        ).collect()
        results.append({(r.q): (r.value, r.n) for r in rows})
    assert results[0] == results[1]


def test_bernoulli_sample_matches_reference_and_merges(spark):
    """The sample is the deterministic coin filter — and therefore
    mergeable: sample(A ∪ B) == sample(A) ∪ sample(B)."""
    ids = list(range(500))
    df = spark.createDataFrame([(i,) for i in ids], ["id"])
    got = {
        r.id
        for r in bernoulli_sample(df, F.col("id"), ":s", 131072).collect()
    }
    expected = {i for i in ids if _coin(i) < 131072}
    assert got == expected
    a = {i for i in ids[:250] if _coin(i) < 131072}
    b = {i for i in ids[250:] if _coin(i) < 131072}
    assert got == a | b


def test_rank_check_accepts_good_and_rejects_bad_estimates(spark):
    values = [float(i) for i in range(1000)]
    df = _frame(spark, values, parts=6)
    est = sampled_quantiles(df, ["grp"], "value", "id", [0.5], rate_num=262144)
    ok = quantile_rank_check(est, df, ["grp"], "value", eps=0.10).collect()[0]
    assert ok.rank_err_ok, (ok.n_lt, ok.n_le, ok.n_full)
    # a deliberately wrong estimate (the max) must FAIL the q=0.5 check
    bad = spark.createDataFrame(
        [("g", 0.5, 999.0, 1)], ["grp", "q", "est_value", "sample_n"]
    )
    bad_row = quantile_rank_check(bad, df, ["grp"], "value", eps=0.10).collect()[0]
    assert not bad_row.rank_err_ok


def test_rank_check_tie_interval_semantics(spark):
    """Heavy ties: the true-rank INTERVAL [n_lt+1, n_le] must be used —
    a point-rank check would wrongly reject a constant column."""
    df = _frame(spark, [5.0] * 100, parts=3)
    est = spark.createDataFrame(
        [("g", 0.5, 5.0, 10)], ["grp", "q", "est_value", "sample_n"]
    )
    row = quantile_rank_check(est, df, ["grp"], "value", eps=0.01).collect()[0]
    assert row.n_lt == 0 and row.n_le == 100 and row.rank_err_ok


def test_robust_stats_matches_python_reference(spark):
    values = [1.0, 2.0, 2.0, 3.0, 4.0, 100.0]  # one gross outlier
    rows = robust_stats(
        _frame(spark, values, parts=2), ["grp"], "value", "id"
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    med = _ref_discrete(values, 0.5)
    mad = _ref_discrete([abs(v - med) for v in values], 0.5)
    assert r.median == med and r.mad == mad
    n_out = sum(1 for v in values if abs(v - med) > 3.0 * 1.4826 * mad)
    assert r.n_outliers == n_out == 1 and r.n == 6


def test_robust_stats_zero_mad_degenerate(spark):
    """Constant group: MAD 0 ⇒ every unequal value is an outlier, equal
    values are not (strict >)."""
    rows = robust_stats(
        _frame(spark, [7.0] * 50, parts=2), ["grp"], "value", "id"
    ).collect()[0]
    assert rows.mad == 0.0 and rows.n_outliers == 0


def _ref_weighted(pairs, num, den):
    """pairs = [(value, weight, id)]; smallest v with cumweight*den >= num*W."""
    s = sorted(pairs, key=lambda p: (p[0], p[2]))
    W = sum(p[1] for p in s)
    cum = 0
    for v, w, _ in s:
        cum += w
        if cum * den >= num * W:
            return v
    return s[-1][0]


def test_weighted_quantiles_match_python_reference(spark):
    from api_kakfa_spark_airflow_s3_athena_spark.operators.quantiles import (
        weighted_discrete_quantiles,
    )

    pairs = [(((i * 31) % 23), (i % 7) + 1, i) for i in range(150)]
    df = spark.createDataFrame(
        [("g", v, w, i) for v, w, i in pairs], ["grp", "v", "w", "id"]
    ).repartition(5)
    got = {
        (r.q_num, r.q_den): (r.value, r.total_weight)
        for r in weighted_discrete_quantiles(
            df, ["grp"], "v", "w", "id", [(1, 4), (1, 2), (9, 10)]
        ).collect()
    }
    W = sum(w for _, w, _ in pairs)
    for num, den in ((1, 4), (1, 2), (9, 10)):
        assert got[(num, den)] == (_ref_weighted(pairs, num, den), W)


def test_weighted_quantiles_drop_nonpositive_weights_and_heavy_row_dominates(spark):
    from api_kakfa_spark_airflow_s3_athena_spark.operators.quantiles import (
        weighted_discrete_quantiles,
    )

    rows = [("g", 1, 1, 0), ("g", 5, 100, 1), ("g", 9, 1, 2), ("g", 7, 0, 3)]
    df = spark.createDataFrame(rows, ["grp", "v", "w", "id"])
    got = {
        (r.q_num, r.q_den): r.value
        for r in weighted_discrete_quantiles(
            df, ["grp"], "v", "w", "id", [(1, 2), (9, 10)]
        ).collect()
    }
    # the weight-100 row holds ranks 2..101 of 102: both quantiles hit it
    assert got[(1, 2)] == 5 and got[(9, 10)] == 5


def test_quantile_drift_identical_samples_zero_displacement(spark):
    # distinct values: with ties, n_le counts the whole tie group and
    # legitimately exceeds the rank (rank-displacement is a CDF
    # statistic; ties inflate it by the tie mass)
    df = spark.createDataFrame(
        [(i, ((i * 37) % 100) + 0.5) for i in range(100)], ["id", "v"]
    )
    from api_kakfa_spark_airflow_s3_athena_spark.operators.quantiles import (
        quantile_drift,
    )

    rows = quantile_drift(df, df, "v", "id", [0.25, 0.5, 0.9]).collect()
    assert len(rows) == 3
    for r in rows:
        # A's q-quantile element sits at rank ceil(q*n) in A itself, so
        # against an identical B the displacement is the ceil rounding
        # only: |ceil(q*n)/n - q| < 1/n
        assert r.displacement < 1.0 / r.n_b + 1e-9


def test_quantile_drift_detects_shift(spark):
    from api_kakfa_spark_airflow_s3_athena_spark.operators.quantiles import (
        quantile_drift,
    )

    a = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], ["id", "v"]
    )
    b = spark.createDataFrame(
        [(i, float(i) + 50.0) for i in range(100)], ["id", "v"]
    )
    rows = {r.q: r for r in quantile_drift(a, b, "v", "id", [0.5]).collect()}
    # A's median (49.0) sits below every B value except none -> rank 0,
    # displacement |0/100 - 0.5| = 0.5
    assert rows[0.5].displacement == 0.5
    # reverse direction: A's median in the left-shifted frame ranks high
    rows_rev = {
        r.q: r for r in quantile_drift(b, a, "v", "id", [0.5]).collect()
    }
    assert rows_rev[0.5].displacement == 0.5
