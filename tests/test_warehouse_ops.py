"""Python-reference pins for the round-13 warehouse/sequence staged
entries added in round 12: largest-remainder proration, gaps-and-
islands, sweep-line peak concurrency, ABC classification boundaries,
and the bigram-PMI formula — each checked against an independent
brute-force model on small synthetic frames (the engine sides are
oracle-pinned at 3 SFs; these pin the MATH)."""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F


# ------------------------------------------------ largest remainder


def _prorate_py(total, weights):
    """Textbook Hamilton apportionment: floor shares by weight, then
    one extra unit each to the largest remainders (ties by index)."""
    sw = sum(weights)
    base = [total * w // sw for w in weights]
    rem = [(total * w % sw, -i) for i, w in enumerate(weights)]
    extra = total - sum(base)
    winners = sorted(range(len(weights)), key=lambda i: rem[i], reverse=True)[
        :extra
    ]
    for i in winners:
        base[i] += 1
    return base


def _prorate_spark(spark, total, weights):
    rows = [(1, i + 1, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, ["k", "ln", "w"]).withColumn(
        "t", F.lit(total).cast("long")
    )
    ow = Window.partitionBy("k")
    j = df.withColumn("sw", F.sum("w").over(ow))
    prod = F.col("t") * F.col("w")
    base = j.select(
        "k",
        "ln",
        "t",
        F.expr("(t * w) div sw").alias("alloc0"),
        F.row_number()
        .over(ow.orderBy(F.desc(prod % F.col("sw")), "ln"))
        .alias("rnk"),
    )
    out = base.select(
        "ln",
        (
            F.col("alloc0")
            + F.when(
                F.col("rnk") <= F.col("t") - F.sum("alloc0").over(ow),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias("alloc"),
    )
    return [r.alloc for r in out.orderBy("ln").collect()]


def test_proration_equals_hamilton_and_is_exact(spark):
    cases = [
        (1000, [1, 1, 1]),       # even split with remainder
        (101, [3, 3, 3]),        # all-equal weights, 2 extra cents
        (999, [1, 2, 3, 4]),
        (7, [100, 1, 1]),        # total smaller than weights
        (123457, [9999, 1, 50, 50]),
    ]
    for total, weights in cases:
        got = _prorate_spark(spark, total, weights)
        expect = _prorate_py(total, weights)
        assert got == expect, (total, weights, got, expect)
        assert sum(got) == total  # the invariant the query pins


# ------------------------------------------------- gaps and islands


def _islands_py(days):
    days = sorted(set(days))
    islands, cur = [], 1
    gaps = []
    for a, b in zip(days, days[1:]):
        if b - a == 1:
            cur += 1
        else:
            gaps.append(b - a - 1)
            islands.append(cur)
            cur = 1
    islands.append(cur)
    return len(days), len(islands), max(islands), max(gaps, default=0)


def test_islands_key_matches_bruteforce(spark):
    import datetime

    day0 = datetime.date(2024, 1, 1)
    cases = [
        [0, 1, 2, 5, 6, 10],
        [0],
        [0, 2, 4, 6],
        [3, 4, 5, 6, 7],
        [0, 1, 1, 2, 9, 9],  # duplicate days collapse
    ]
    rows = [
        (u, day0 + datetime.timedelta(days=d))
        for u, ds in enumerate(cases)
        for d in ds
    ]
    df = spark.createDataFrame(rows, ["user_id", "day"]).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    keyed = df.select(
        "user_id",
        "day",
        (
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
            - F.row_number().over(w)
        ).alias("isl"),
        F.datediff(F.col("day"), F.lag("day").over(w)).alias("step"),
    )
    islands = keyed.groupBy("user_id", "isl").agg(
        F.count(F.lit(1)).alias("run")
    )
    got = {
        r.user_id: (r.nd, r.ni, r.li, r.mg)
        for r in keyed.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("nd"),
            F.coalesce(F.max("step") - 1, F.lit(0)).alias("mg"),
        )
        .join(
            islands.groupBy("user_id").agg(
                F.count(F.lit(1)).alias("ni"), F.max("run").alias("li")
            ),
            "user_id",
        )
        .collect()
    }
    for u, ds in enumerate(cases):
        assert got[u] == _islands_py(ds), (u, ds, got[u])


# --------------------------------------------- sweep-line concurrency


def _peak_py(intervals):
    """Brute force: evaluate concurrency at every endpoint with
    closed [s, e] semantics (touching intervals overlap)."""
    points = sorted({t for s, e in intervals for t in (s, e)})
    return max(sum(1 for s, e in intervals if s <= t <= e) for t in points)


def test_sweepline_peak_matches_bruteforce(spark):
    cases = [
        [(0, 10), (5, 15), (20, 30)],
        [(0, 10), (10, 20)],            # touching => concurrent
        [(5, 5), (5, 5), (5, 5)],       # zero-length stacks
        [(0, 100), (1, 2), (3, 4), (5, 6)],
        [(0, 1), (2, 3), (4, 5)],       # disjoint
    ]
    for intervals in cases:
        rows = [(i, s, e) for i, (s, e) in enumerate(intervals)]
        iv = spark.createDataFrame(rows, ["uid", "s", "e"])
        pts = iv.select(
            "uid", F.col("s").alias("t"), F.lit(1).alias("d")
        ).unionByName(
            iv.select("uid", F.col("e").alias("t"), F.lit(-1).alias("d"))
        )
        w = Window.orderBy(F.col("t"), F.desc("d"), F.col("uid")).rowsBetween(
            Window.unboundedPreceding, 0
        )
        got = (
            pts.select(F.sum("d").over(w).alias("run"))
            .agg(F.max("run"))
            .collect()[0][0]
        )
        assert got == _peak_py(intervals), (intervals, got)


# ----------------------------------------------------- ABC boundaries


def test_abc_class_boundaries_integer_rule(spark):
    """cum*10 <= tot*7 -> A, <= tot*9 -> B, else C: the integer
    cross-multiplication must agree with the exact-fraction rule at
    the boundaries (a part landing exactly on 70% is still A)."""
    revs = [70, 15, 10, 5]  # cum shares: 70, 85, 95, 100 (%)
    df = spark.createDataFrame(
        [(i, r) for i, r in enumerate(revs)], ["pk", "r"]
    )
    wcum = Window.orderBy(F.desc("r"), "pk").rowsBetween(
        Window.unboundedPreceding, 0
    )
    classed = df.select(
        "pk",
        F.when(
            F.sum("r").over(wcum) * 10
            <= F.sum("r").over(Window.partitionBy()) * 7,
            F.lit("A"),
        )
        .when(
            F.sum("r").over(wcum) * 10
            <= F.sum("r").over(Window.partitionBy()) * 9,
            F.lit("B"),
        )
        .otherwise(F.lit("C"))
        .alias("cls"),
    )
    got = {r.pk: r.cls for r in classed.collect()}
    assert got == {0: "A", 1: "B", 2: "C", 3: "C"}


# ------------------------------------------------------------- PMI


def test_bigram_pmi_formula(spark):
    """PMI from the bigram table's own marginals equals the
    independent math.log computation on the same counts."""
    toks = ["a b a b c a b".split(), "b c b c".split()]
    bigrams = [
        (l[i], l[i + 1]) for l in toks for i in range(len(l) - 1)
    ]
    from collections import Counter

    n_xy = Counter(bigrams)
    n_x = Counter(x for x, _ in bigrams)
    n_y = Counter(y for _, y in bigrams)
    N = len(bigrams)
    expect = {
        (x, y): round(math.log(c * N / (n_x[x] * n_y[y])), 4)
        for (x, y), c in n_xy.items()
    }
    df = spark.createDataFrame(
        [(x, y) for x, y in bigrams], ["x", "y"]
    )
    big = df.groupBy("x", "y").agg(F.count(F.lit(1)).alias("n_xy"))
    fx = big.groupBy("x").agg(F.sum("n_xy").alias("n_x"))
    fy = big.groupBy("y").agg(F.sum("n_xy").alias("n_y"))
    tot = big.agg(F.sum("n_xy").alias("n"))
    got = {
        (r.x, r.y): r.pmi
        for r in big.join(fx, "x")
        .join(fy, "y")
        .crossJoin(F.broadcast(tot))
        .select(
            "x",
            "y",
            F.round(
                F.log(
                    (F.col("n_xy") * F.col("n")).cast("double")
                    / (F.col("n_x") * F.col("n_y")).cast("double")
                ),
                4,
            ).alias("pmi"),
        )
        .collect()
    }
    assert got == expect


def test_proration_property_random(spark):
    """Hypothesis-style property sweep (deterministic seed): for any
    positive weights and total, the Spark largest-remainder
    expression equals Hamilton apportionment and sums exactly."""
    import random

    rng = random.Random(0xC0FFEE)
    for _ in range(12):
        n = rng.randint(1, 9)
        weights = [rng.randint(1, 10_000) for _ in range(n)]
        total = rng.randint(1, 10_000_000)
        got = _prorate_spark(spark, total, weights)
        assert got == _prorate_py(total, weights)
        assert sum(got) == total


# ------------------------------------------------- distributed rank


def test_distributed_rank_equals_serial_window(spark):
    """distributed_rank must reproduce the single-partition window's
    row_number EXACTLY under a total order — duplicates in the value
    column broken by id, data spread over many input partitions."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.quantiles import (
        distributed_rank,
    )

    rows = [(i, (i * 37) % 11) for i in range(2000)]  # heavy value ties
    df = spark.createDataFrame(rows, ["id", "v"]).repartition(13)
    got = {
        r.id: r.rk
        for r in distributed_rank(df, ["v", "id"], "rk", partitions=7).collect()
    }
    serial = {
        r.id: r.rk
        for r in df.select(
            "id", F.row_number().over(Window.orderBy("v", "id")).alias("rk")
        ).collect()
    }
    assert got == serial
    assert sorted(got.values()) == list(range(1, 2001))  # a permutation


def test_distributed_rank_empty_and_single_row(spark):
    from api_kakfa_spark_airflow_s3_athena_spark.operators.quantiles import (
        distributed_rank,
    )

    empty = spark.createDataFrame([], "id long, v long")
    assert distributed_rank(empty, ["v", "id"]).count() == 0
    one = spark.createDataFrame([(1, 5)], ["id", "v"])
    assert distributed_rank(one, ["v", "id"], "rk").collect()[0].rk == 1


def test_distributed_rank_consistent_under_fanout(spark):
    """Regression for the RangePartitioner seed hazard: when the
    ranked output fans out to SEVERAL consumers (here: the rank rows
    joined against an aggregate over the same input), the partition
    counts must describe the SAME partitioning as the ranks — without
    the operator's internal materialization, a re-executed range
    exchange can sample different bounds and the offsets corrupt
    (observed live as a phantom 11th decile). The pin: ranks are a
    permutation of 1..n even through the fan-out."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.quantiles import (
        distributed_rank,
    )

    df = spark.createDataFrame(
        [(i, (i * 131) % 997) for i in range(10_000)], ["id", "v"]
    ).repartition(17)
    ranked = distributed_rank(df, ["v", "id"], "rk", partitions=11)
    n1 = df.agg(F.count(F.lit(1)).alias("n_all"))
    out = ranked.crossJoin(F.broadcast(n1)).select("rk", "n_all")
    rows = out.collect()
    assert sorted(r.rk for r in rows) == list(range(1, 10_001))
    assert all(r.n_all == 10_000 for r in rows)


def test_distributed_cumsum_equals_serial_window(spark):
    """Inclusive running sum (desc order with tie-break, NEGATIVE
    values included) must equal the serial global window's."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.quantiles import (
        distributed_cumsum,
    )

    rows = [(i, ((i * 37) % 11) - 5) for i in range(3000)]  # negatives + ties
    df = spark.createDataFrame(rows, ["id", "x"]).repartition(9)
    got = {
        r.id: r.cum
        for r in distributed_cumsum(
            df, [F.desc("x"), "id"], "x", "cum", partitions=7
        ).collect()
    }
    w = Window.orderBy(F.desc("x"), "id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    serial = {
        r.id: r.cum
        for r in df.select("id", F.sum("x").over(w).alias("cum")).collect()
    }
    assert got == serial
    # the LAST row in the total order carries the exact global sum
    order = sorted(rows, key=lambda r: (-r[1], r[0]))
    assert got[order[-1][0]] == sum(x for _, x in rows)


def test_distributed_cumsum_of_ones_is_rank(spark):
    from api_kakfa_spark_airflow_s3_athena_spark.operators.quantiles import (
        distributed_cumsum,
    )

    df = spark.createDataFrame(
        [(i, 1) for i in range(500)], ["id", "one"]
    ).repartition(5)
    got = sorted(
        r.cum
        for r in distributed_cumsum(df, ["id"], "one", partitions=6).collect()
    )
    assert got == list(range(1, 501))


def test_ntile_from_rank_matches_builtin(spark):
    """ntile_from_rank(row_number, n, k) must equal F.ntile(k) under
    the same total order for every (n, k) shape: n divisible by k,
    n < k, and ragged remainders."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.quantiles import (
        ntile_from_rank,
    )

    for n, k in [(20, 5), (23, 5), (3, 5), (1, 4), (100, 7), (9, 3)]:
        df = spark.createDataFrame([(i,) for i in range(n)], ["id"])
        w = Window.orderBy("id")
        both = df.select(
            "id",
            F.ntile(k).over(w).cast("long").alias("builtin"),
            ntile_from_rank(
                F.row_number().over(w), F.count(F.lit(1)).over(
                    Window.partitionBy()
                ), k
            ).alias("formula"),
        ).collect()
        assert all(r.builtin == r.formula for r in both), (n, k)


def test_grouped_distributed_cumsum_equals_serial_window(spark):
    """Per-group inclusive running sum (ties on the bucketing column,
    desc tie-breaker, negative values, a single-value group, and a
    NULL leading value) must equal the serial per-group window's."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.quantiles import (
        grouped_distributed_cumsum,
    )

    rows = [
        (f"g{i % 3}", i, (i * 13) % 7, ((i * 37) % 11) - 5)
        for i in range(3000)
    ]
    rows += [("g3", 90001, 5, 2)]  # single-row group (span 0)
    rows += [("g0", 90002, None, 3)]  # NULL leading value -> bucket 0
    df = spark.createDataFrame(rows, ["g", "id", "t", "x"]).repartition(9)
    got = {
        r.id: r.cum
        for r in grouped_distributed_cumsum(
            df, ["g"], ["t", F.desc("x"), "id"], "x", "cum", partitions=7
        ).collect()
    }
    w = (
        Window.partitionBy("g")
        .orderBy("t", F.desc("x"), "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    serial = {
        r.id: r.cum
        for r in df.select("id", F.sum("x").over(w).alias("cum")).collect()
    }
    assert got == serial


def test_grouped_distributed_cumsum_guards(spark):
    import pytest

    from api_kakfa_spark_airflow_s3_athena_spark.operators.quantiles import (
        grouped_distributed_cumsum,
    )

    df = spark.createDataFrame([("a", 1, 1)], ["g", "t", "x"])
    with pytest.raises(TypeError):  # leading order col must be a name
        grouped_distributed_cumsum(df, ["g"], [F.desc("t"), "g"], "x")
    with pytest.raises(ValueError):  # output-column collision
        grouped_distributed_cumsum(df, ["g"], ["t"], "x", cumsum_col="x")
