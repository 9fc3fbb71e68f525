"""HyperLogLog contracts: register bit-parity with an independent
Python reference, the max-merge law, estimator accuracy in both the
raw and linear-counting regimes, and exact-integer harmonic sums."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.operators.sketches import (
    HLL_M,
    HLL_P,
    HLL_SCALED_NUM,
    hll_estimate,
    hll_merge,
    hll_registers,
)

_Q = 60 - HLL_P


def _ref_registers(values):
    regs = {}
    for v in set(values):
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        idx = h >> _Q
        rest = h & ((1 << _Q) - 1)
        rho = (_Q + 1) if rest == 0 else (_Q + 1 - rest.bit_length())
        regs[idx] = max(regs.get(idx, 0), rho)
    return regs


def _ref_estimate(regs):
    n_hit = len(regs)
    harmonic = sum(1 << (_Q + 1 - r) for r in regs.values()) + (
        HLL_M - n_hit
    ) * (1 << (_Q + 1))
    raw = HLL_SCALED_NUM / float(harmonic)
    zeros = HLL_M - n_hit
    if raw <= 2.5 * HLL_M and zeros > 0:
        return round(HLL_M * math.log(HLL_M / float(zeros)), 4)
    return round(raw, 4)


def _frame(spark, values, parts=4):
    return spark.createDataFrame(
        [("g", str(v)) for v in values], ["grp", "val"]
    ).repartition(parts)


def test_registers_match_python_reference(spark):
    values = [f"item{i}" for i in range(300)] + ["item7"] * 50
    got = {
        r.idx: r.rho
        for r in hll_registers(_frame(spark, values), ["grp"], F.col("val")).collect()
    }
    assert got == _ref_registers(values)


def test_estimate_components_bit_identical_to_reference(spark):
    values = [f"v{i}" for i in range(1000)]
    regs = hll_registers(_frame(spark, values, parts=7), ["grp"], F.col("val"))
    row = hll_estimate(regs, ["grp"]).collect()[0]
    ref = _ref_registers(values)
    harmonic = sum(1 << (_Q + 1 - r) for r in ref.values()) + (
        HLL_M - len(ref)
    ) * (1 << (_Q + 1))
    assert row.n_hit == len(ref)
    assert row.harmonic_scaled == harmonic
    assert row.est_distinct == _ref_estimate(ref)


def test_estimate_accuracy_both_regimes(spark):
    # raw regime: n >> m — standard error 1.04/sqrt(256) ~ 6.5%
    big = [f"x{i}" for i in range(20000)]
    est = (
        hll_estimate(
            hll_registers(_frame(spark, big, parts=8), ["grp"], F.col("val")),
            ["grp"],
        )
        .collect()[0]
        .est_distinct
    )
    assert abs(est - 20000) / 20000 < 0.25, est
    # linear-counting regime: n << m — near-exact
    small = [f"s{i}" for i in range(40)]
    est2 = (
        hll_estimate(
            hll_registers(_frame(spark, small), ["grp"], F.col("val")), ["grp"]
        )
        .collect()[0]
        .est_distinct
    )
    assert abs(est2 - 40) < 4, est2


def test_merge_max_law_equals_direct_build(spark):
    """Registers built per shard and max-merged == registers built
    directly over the union — the property sharded/streaming
    maintenance relies on."""
    a = [f"a{i}" for i in range(500)]
    b = [f"b{i}" for i in range(400)] + a[:100]
    df = spark.createDataFrame(
        [("g", "s1", v) for v in a] + [("g", "s2", v) for v in b],
        ["grp", "shard", "val"],
    ).repartition(5)
    sharded = hll_merge(
        hll_registers(df, ["grp", "shard"], F.col("val")), ["grp"]
    )
    direct = hll_registers(df, ["grp"], F.col("val"))
    got = {(r.grp, r.idx): r.rho for r in sharded.collect()}
    want = {(r.grp, r.idx): r.rho for r in direct.collect()}
    assert got == want


def test_duplicates_do_not_move_registers(spark):
    once = hll_registers(
        _frame(spark, [f"d{i}" for i in range(100)]), ["grp"], F.col("val")
    )
    dup = hll_registers(
        _frame(spark, [f"d{i}" for i in range(100)] * 10, parts=9),
        ["grp"],
        F.col("val"),
    )
    assert {(r.idx, r.rho) for r in once.collect()} == {
        (r.idx, r.rho) for r in dup.collect()
    }


def _run_hll_stream(spark, base, files):
    from api_kakfa_spark_airflow_s3_athena_spark.streaming.sketches import (
        hll_sketch_sink,
    )

    src = f"{base}/src"
    for b, rows in enumerate(files):
        spark.createDataFrame(rows, ["grp", "val"]).coalesce(1).write.mode(
            "append" if b else "overwrite"
        ).parquet(src)
    stream = (
        spark.readStream.schema("grp string, val string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = hll_sketch_sink(
        stream,
        ["grp"],
        "val",
        store_path=f"{base}/store",
        checkpoint=f"{base}/ckpt",
        available_now=True,
    )
    q.awaitTermination()


def test_streaming_registers_equal_batch(spark, tmp_path):
    base = str(tmp_path / "run")
    files = [
        [("g1", f"a{i}") for i in range(200)],
        [("g1", f"b{i}") for i in range(150)] + [("g2", "solo")],
        [("g1", f"a{i}") for i in range(80)],  # duplicate-only slice
    ]
    _run_hll_stream(spark, base, files)
    final = {
        (r.grp, r.idx): r.rho
        for r in spark.read.parquet(f"{base}/store/epoch=2").collect()
    }
    direct = {
        (r.grp, r.idx): r.rho
        for r in hll_registers(
            spark.createDataFrame(sum(files, []), ["grp", "val"]),
            ["grp"],
            F.col("val"),
        ).collect()
    }
    assert final == direct
    # register mass is monotone across epochs (max-merge only grows)
    store = spark.read.parquet(f"{base}/store")
    mass = {
        r.epoch: r.m
        for r in store.filter("grp = 'g1'")
        .groupBy("epoch")
        .agg(F.sum("rho").alias("m"))
        .collect()
    }
    assert mass[0] <= mass[1] == mass[2]
