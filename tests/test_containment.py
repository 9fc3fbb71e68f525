"""Exact containment join (operators/dedup.containment_join):
row-for-row equality with brute force, the integer-boundary ceil trap,
prefix completeness under unique-token prefixes, and degenerate
inputs."""

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.operators.dedup import containment_join


def _frame(spark, rows, id_name):
    return spark.createDataFrame(
        [Row(**{id_name: i, "units": u}) for i, u in rows],
        f"{id_name} long, units array<string>",
    )


def _brute(spark, ev_rows, tr_rows, t):
    out = set()
    for ea, ua in ev_rows:
        sa = set(ua)
        if not sa:
            continue
        for tb, ub in tr_rows:
            o = len(sa & set(ub))
            c = o / len(sa)
            if c >= t:
                out.add((ea, tb, c))
    return out


def _run(spark, ev_rows, tr_rows, t):
    got = containment_join(
        _frame(spark, ev_rows, "eval_id"), _frame(spark, tr_rows, "train_id"), t
    ).collect()
    return {(r.eval_id, r.train_id, r.containment) for r in got}


def test_containment_join_equals_brute_force_constructed(spark):
    ev = [
        (0, ["a", "b", "c", "d"]),          # fully inside train 10
        (1, ["a", "b", "x", "y"]),          # 0.5 vs train 10
        (2, ["zz"]),                        # absent from train entirely
        (3, []),                            # empty -> dropped
    ]
    tr = [
        (10, ["a", "b", "c", "d", "e", "f"]),
        (11, ["x", "y", "q"]),
    ]
    for t in (0.5, 0.75, 1.0):
        assert _run(spark, ev, tr, t) == _brute(spark, ev, tr, t), t


def test_containment_boundary_exact_ratio_included(spark):
    """|A| = 20, overlap exactly 14, t = 0.7: naive ceil(0.7*20) =
    ceil(14.000000000000002) = 15 would exclude the pair at the
    candidate stage — the slacked o_min and the single-division filter
    must both keep it."""
    a = [f"u{i}" for i in range(20)]
    ev = [(0, a)]
    tr = [(10, a[:14] + [f"t{i}" for i in range(6)])]
    got = _run(spark, ev, tr, 0.7)
    assert got == {(0, 10, 14 / 20)}


def test_prefix_completeness_with_unique_token_prefix(spark):
    """An eval doc whose RAREST tokens are all train-absent (they fill
    the prefix) must still match: pigeonhole guarantees a shared token
    inside the prefix whenever overlap >= o_min."""
    shared = [f"s{i}" for i in range(8)]
    unique = [f"uniq{i}" for i in range(2)]
    ev = [(0, shared + unique)]  # |A|=10, t=0.8 -> o_min=8, prefix=3
    tr = [(10, shared + ["other"])]  # overlap 8 -> containment 0.8
    assert _run(spark, ev, tr, 0.8) == {(0, 10, 0.8)}


def test_containment_join_fuzz_vs_brute_force(spark):
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(30)]
    for trial in range(6):
        ev = [
            (i, rng.sample(vocab, rng.randint(1, 12)))
            for i in range(8)
        ]
        tr = [
            (100 + j, rng.sample(vocab, rng.randint(1, 20)))
            for j in range(15)
        ]
        t = rng.choice([0.3, 0.5, 0.7, 0.9])
        assert _run(spark, ev, tr, t) == _brute(spark, ev, tr, t), (trial, t)


def test_duplicate_units_are_collapsed(spark):
    ev = [(0, ["a", "a", "b"])]  # set {a,b}
    tr = [(10, ["a", "c", "c"])]  # set {a,c}; overlap 1 of 2
    assert _run(spark, ev, tr, 0.5) == {(0, 10, 0.5)}
    assert _run(spark, ev, tr, 0.75) == set()
