"""binned_interval_join must be output-identical to the naive BETWEEN
join (brute force), while planning as an EQUI-join — no
BroadcastNestedLoopJoin anywhere, which is the operator's entire
reason to exist."""

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.operators.intervals import (
    binned_interval_join,
)


def _fixture(spark, seed=3, n_points=400, n_intervals=60):
    rng = random.Random(seed)
    pts = [Row(pid=i, p=float(rng.randint(-50, 350))) for i in range(n_points)]
    ivs = []
    for j in range(n_intervals):
        lo = float(rng.randint(-60, 320))
        ivs.append(Row(tag=j, lo=lo, hi=lo + rng.choice([0.0, 1.0, 7.0, 30.0])))
    # degenerate lo > hi rows must match nothing (and not make
    # F.sequence descend)
    ivs.append(Row(tag=900, lo=10.0, hi=5.0))
    return spark.createDataFrame(pts), spark.createDataFrame(ivs), pts, ivs


def _brute(pts, ivs, closed):
    out = set()
    for p in pts:
        for iv in ivs:
            hit = (
                iv.lo <= p.p <= iv.hi
                if closed == "both"
                else iv.lo <= p.p < iv.hi
            )
            if hit:
                out.add((p.pid, iv.tag))
    return out


@pytest.mark.parametrize("closed", ["both", "left"])
@pytest.mark.parametrize("width", [None, 7, 1.5])
def test_binned_interval_join_equals_brute_force(spark, closed, width):
    fact, intervals, pts, ivs = _fixture(spark)
    got = {
        (r.pid, r.tag)
        for r in binned_interval_join(
            fact, intervals, "p", closed=closed, bin_width=width
        ).collect()
    }
    assert got == _brute(pts, ivs, closed), (closed, width)


def test_binned_interval_join_subunit_domain_spreads_bins(spark):
    """Round-7 review regression: the derived width must follow the
    domain scale. On a [0,1) score domain a width clamped to >= 1
    would put EVERY point and interval into bin 0 — exact output but
    the quadratic plan the operator exists to avoid. With the mean
    valid length (~0.01) the exploded interval side must occupy many
    distinct bins, and output still equals brute force."""
    rng = random.Random(11)
    pts = [Row(pid=i, p=rng.random()) for i in range(200)]
    ivs = [Row(tag=j, lo=(lo := rng.random() * 0.99), hi=lo + 0.01) for j in range(50)]
    fact, intervals = spark.createDataFrame(pts), spark.createDataFrame(ivs)
    out = binned_interval_join(fact, intervals, "p")
    got = {(r.pid, r.tag) for r in out.collect()}
    assert got == _brute(pts, ivs, "both")
    binned_iv = intervals.filter(F.col("lo") <= F.col("hi")).withColumn(
        "__probe_bin", F.floor(F.col("lo") / F.lit(0.0101)).cast("long")
    )
    # the operator's own bin column is internal; probe the same width
    # class: >= 10 distinct bins proves no bin-0 collapse
    assert binned_iv.select("__probe_bin").distinct().count() >= 10


def test_binned_interval_join_sentinels_do_not_skew_width(spark):
    """Round-7 review regression: lo > hi sentinel rows are excluded
    BEFORE the width/guard statistics. A majority of negative-length
    sentinels must neither produce a degenerate width for the real
    intervals nor trip the max_bins_per_interval guard."""
    pts = [Row(pid=i, p=float(i)) for i in range(300)]
    ivs = [Row(tag=j, lo=float(j * 10), hi=float(j * 10 + 100)) for j in range(20)]
    sentinels = [Row(tag=800 + j, lo=0.0, hi=-1.0) for j in range(200)]
    fact = spark.createDataFrame(pts)
    intervals = spark.createDataFrame(ivs + sentinels)
    # guard sized so the TRUE mean length (100 -> ~2 bins) passes but a
    # sentinel-skewed width (clamped 1.0 -> 102 bins) would raise
    out = binned_interval_join(fact, intervals, "p", max_bins_per_interval=16)
    got = {(r.pid, r.tag) for r in out.collect()}
    assert got == _brute(pts, ivs + sentinels, "both")


def test_binned_interval_join_rejects_bin_column_collision(spark):
    fact, intervals, _, _ = _fixture(spark)
    with pytest.raises(ValueError, match="__bin"):
        binned_interval_join(fact.withColumn("__bin", F.lit(1)), intervals, "p")
    with pytest.raises(ValueError, match="__bin"):
        binned_interval_join(fact, intervals.withColumn("__bin", F.lit(1)), "p")


def test_binned_interval_join_validates_inputs(spark):
    fact, intervals, _, _ = _fixture(spark)
    with pytest.raises(ValueError, match="closed"):
        binned_interval_join(fact, intervals, "p", closed="right")
    with pytest.raises(ValueError, match="positive"):
        binned_interval_join(fact, intervals, "p", bin_width=0)
    # a width far below the longest interval would explode the
    # interval side — must raise loudly, never run silently slow
    with pytest.raises(ValueError, match="max_bins_per_interval"):
        binned_interval_join(
            fact, intervals, "p", bin_width=0.001, max_bins_per_interval=64
        )


def test_binned_interval_join_empty_sides(spark):
    fact, intervals, _, _ = _fixture(spark)
    no_iv = spark.createDataFrame([], "tag int, lo double, hi double")
    no_pt = spark.createDataFrame([], "pid int, p double")
    assert binned_interval_join(fact, no_iv, "p").count() == 0
    assert binned_interval_join(no_pt, intervals, "p").count() == 0


def test_binned_interval_join_plans_equi_join_not_nested_loop(spark):
    """The naive range join plans a BroadcastNestedLoopJoin (every
    fact row scans every interval); the binned rewrite must plan a
    hash/sort-merge EQUI-join on the bin key — the property that makes
    a million-interval table joinable at all."""
    fact, intervals, _, _ = _fixture(spark)
    naive = fact.join(
        intervals, (fact.p >= intervals.lo) & (fact.p <= intervals.hi)
    )
    naive_plan = naive._jdf.queryExecution().executedPlan().toString()
    # per-row interval scan, under either of Spark's two spellings
    assert (
        "BroadcastNestedLoopJoin" in naive_plan
        or "CartesianProduct" in naive_plan
    )

    binned = binned_interval_join(fact, intervals, "p")
    plan = binned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert any(
        k in plan
        for k in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
    )
