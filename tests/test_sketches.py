"""Approximate-aggregate error contracts (sketches): measure the real
relative errors behind the booleans approx_sketch_contract asserts,
and pin sketch mergeability — the property that lets 100 TB be
sketched once per partition and combined without a re-scan."""

from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.plans.queries import (
    approx_sketch_contract,
)
from api_kakfa_spark_airflow_s3_athena_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_sketch_contract_booleans_hold(spark):
    rows = approx_sketch_contract(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.hll_within_5pct, r
        assert r.union_within_5pct, r
        assert r.hpp_within_10pct, r
        assert r.p50_within_1pct, r


def test_hll_relative_error_within_design_bound(spark):
    """Default lgConfigK=12 -> 4096 registers -> RSE ~1.6%; assert the
    observed error stays under 3 sigma on a genuinely approximate
    cardinality (distinct event_id)."""
    ev = load_table(spark, SF, "events")
    r = ev.agg(
        F.countDistinct("event_id").alias("exact"),
        F.hll_sketch_estimate(F.hll_sketch_agg("event_id")).alias("est"),
    ).collect()[0]
    assert abs(r.est - r.exact) / r.exact < 0.05


def test_hll_union_is_merge_grouping_stable(spark):
    """Merging per-day sketches must not meaningfully depend on merge
    grouping: union(all) vs union(union(first half), union(second
    half)) may differ by sparse->dense promotion points (measured:
    they are NOT always bit-identical) but both must estimate the same
    cardinality to well under the sketch's own error bound."""
    ev = load_table(spark, SF, "events").withColumn("d", F.dayofmonth("ts"))
    daily = ev.groupBy("d").agg(F.hll_sketch_agg("event_id").alias("sk"))
    flat = daily.agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))).collect()[0][0]
    two_level = (
        daily.withColumn("half", (F.col("d") > 15).cast("int"))
        .groupBy("half")
        .agg(F.hll_union_agg("sk").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")))
        .collect()[0][0]
    )
    assert abs(flat - two_level) / max(flat, two_level) < 0.02


def test_approx_percentile_accuracy_scales_with_parameter(spark):
    """Higher accuracy parameter must not be worse; at accuracy=10000
    the t-digest median sits within 1% of exact."""
    ev = load_table(spark, SF, "events")
    r = ev.agg(
        F.percentile("value", F.lit(0.5)).alias("exact"),
        F.percentile_approx("value", F.lit(0.5), F.lit(100)).alias("rough"),
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("fine"),
    ).collect()[0]
    assert abs(r.fine - r.exact) / r.exact <= 0.01
    assert abs(r.fine - r.exact) <= abs(r.rough - r.exact) + 1e-9
