"""Python-reference pins for the round-12 sequence-analytics staged
entries: the CUSUM closed form, the sorted-series Gini identity, and
deterministic ntile bucketing — each checked against a brute-force
pure-Python model on small synthetic frames (the engine side is
oracle-pinned at 3 SFs; these pin the MATH against an independent
implementation)."""

from pyspark.sql import Window
from pyspark.sql import functions as F


def _cusum_py(xs, ref):
    """Textbook recursive one-sided CUSUM."""
    s, out = 0, []
    for x in xs:
        s = max(0, s + x - ref)
        out.append(s)
    return out


def _closed_form_spark(spark, xs, ref):
    """The exact expression the staged query uses:
    s_n = S_n - least(0, min_{j<=n} S_j) — the least(0, ...) supplies
    the virtual S_0 = 0 prefix of the recursion."""
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], ["day", "x"]
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    got = (
        df.select(
            "day", (F.sum(F.col("x") - F.lit(ref)).over(w)).alias("S")
        )
        .select(
            "day",
            (
                F.col("S")
                - F.least(F.lit(0).cast("long"), F.min("S").over(w))
            ).alias("s"),
        )
        .orderBy("day")
        .collect()
    )
    return [r.s for r in got]


def test_cusum_closed_form_equals_recursion(spark):
    """s_n = S_n - least(0, min_{j<=n} S_j) (the closed form the
    staged query uses) must equal the textbook max(0, s+x-ref)
    recursion for any series — including ones that touch zero
    repeatedly."""
    xs = [5, 1, 9, 0, 0, 14, 2, 2, 30, 1, 50, 50, 3]
    ref = 7
    assert _closed_form_spark(spark, xs, ref) == _cusum_py(xs, ref)


def test_cusum_closed_form_all_positive_prefix(spark):
    """Regression for the virtual-S_0 term: when EVERY prefix sum is
    positive (first value already above ref), min_{j<=n} S_j > 0 and
    the naive S - min(S) form understates the statistic; the
    least(0, ...) form must still match the recursion exactly."""
    xs = [20, 15, 30, 9, 8, 40, 12]  # all x >= ref+1 -> S never dips
    ref = 7
    got = _closed_form_spark(spark, xs, ref)
    expect = _cusum_py(xs, ref)
    assert got == expect
    # and prove the fixture actually exercises the case: the naive
    # form (no virtual zero) disagrees on the very first row
    assert got[0] == xs[0] - ref != 0


def test_gini_identity_matches_definition(spark):
    """G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) on the sorted
    series equals the mean-absolute-difference definition
    G = sum_ij |x_i - x_j| / (2 n^2 mean)."""
    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]
    n = len(xs)
    srt = sorted(xs)
    ident = (2 * sum((i + 1) * x for i, x in enumerate(srt)) - (n + 1) * sum(srt)) / (
        n * sum(srt)
    )
    mad = sum(abs(a - b) for a in xs for b in xs) / (2 * n * n * (sum(xs) / n))
    assert abs(ident - mad) < 1e-12

    df = spark.createDataFrame([(i, float(x)) for i, x in enumerate(xs)], ["id", "x"])
    w = Window.orderBy("x", "id")
    ranked = df.select(
        "x",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        F.sum("x").over(Window.partitionBy()).alias("tot"),
    )
    got = ranked.agg(
        (
            (2.0 * F.sum(F.col("rn") * F.col("x")) - (F.max("n") + 1) * F.max("tot"))
            / (F.max("n") * F.max("tot"))
        ).alias("g")
    ).collect()[0].g
    assert abs(got - ident) < 1e-12


def test_ntile_deterministic_under_total_order(spark):
    """ntile(5) under a TOTAL order (value, id) is a pure function of
    rank: bucket sizes differ by at most 1, earlier buckets take the
    extras — the property the RFM quintiles rely on for cross-engine
    equality."""
    rows = [(i, (i * 13) % 7) for i in range(23)]  # ties in value
    df = spark.createDataFrame(rows, ["id", "v"])
    got = df.select(
        "id", F.ntile(5).over(Window.orderBy("v", "id")).alias("t")
    ).collect()
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    n = len(order)
    expect = {}
    # earlier tiles get the extras: sizes = ceil then floor
    sizes = [(n + 5 - 1 - i) // 5 for i in range(5)]
    idx = 0
    for tile, size in enumerate(sizes, start=1):
        for _ in range(size):
            expect[order[idx][0]] = tile
            idx += 1
    assert {r.id: r.t for r in got} == expect


def test_transition_matrix_counts_match_python(spark):
    events = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"),
        (2, 1, "b"), (2, 2, "b"),
        (3, 5, "c"),
    ]
    df = spark.createDataFrame(events, ["user_id", "ts", "event_type"])
    w = Window.partitionBy("user_id").orderBy("ts")
    pairs = (
        df.select(
            "event_type", F.lag("event_type").over(w).alias("prev")
        )
        .filter(F.col("prev").isNotNull())
        .groupBy("prev", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    got = {(r.prev, r.event_type): r.n for r in pairs}
    assert got == {("a", "b"): 1, ("b", "a"): 1, ("b", "b"): 1}
