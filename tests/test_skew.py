"""Salted aggregation must be bit-identical to the plain aggregate,
AND the hot key must actually spread across salt buckets — a salt
derived from the group key alone satisfies the first property while
being a skew no-op (caught in round 1)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.operators.skew import salted_agg, salted_partials


def test_salted_agg_equals_plain(spark):
    rows = [Row(k="hot", v=float(i)) for i in range(500)] + [
        Row(k=f"cold{i}", v=float(i)) for i in range(50)
    ]
    df = spark.createDataFrame(rows)
    plain = {
        (r.k): (r.n, r.total)
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .collect()
    }
    salted = {
        (r.k): (r.n, r.total)
        for r in salted_agg(
            df,
            ["k"],
            [
                (F.count(F.lit(1)), F.sum("n"), "n"),
                (F.sum("v"), F.sum("total"), "total"),
            ],
            salt_buckets=8,
        ).collect()
    }
    assert salted == plain


def test_hot_key_spreads_over_salt_buckets(spark):
    # 5000 rows of one hot key, spread over several input partitions
    # (as at scale): the partial stage must see >1 salt bucket for it.
    df = spark.range(5000).repartition(8).select(
        F.lit("hot").alias("k"), F.col("id").cast("double").alias("v")
    )
    partial = salted_partials(
        df, ["k"], [(F.count(F.lit(1)), F.sum("n"), "n")], salt_buckets=16
    )
    spread = (
        partial.groupBy("k")
        .agg(F.countDistinct("__salt").alias("n_salts"))
        .collect()[0]
        .n_salts
    )
    assert spread >= 2, f"hot key landed in {spread} salt bucket(s) — salting is a no-op"


def test_aqe_skew_join_split_fires(spark):
    """AQE's OptimizeSkewedJoin capability pin — the runtime mitigation
    a 100 TB join relies on when a key is hot. Rounds 1-2 could not
    provoke it; round 5 isolated BOTH preconditions the failed probes
    violated, and they are exactly what a production job must know:

    1. both join children must be BARE shuffle stages — an aggregate
       between the right side's exchange and the join made AQE skip
       the rule entirely (it cannot replicate a non-bare stage), so
       the right side here is materialized to parquet first;
    2. a skewed partition splits only at MAPPER boundaries — a
       single-file scan gives one mapper and nothing to split, so the
       map side is spread over 32 mappers (at scale this is free:
       every real fact table has thousands of mappers).
    """
    import tempfile

    from api_kakfa_spark_airflow_s3_athena_spark.sources.tables import load_table

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        docs = load_table(spark, "/root/testdata/sf0.01", "documents").repartition(32)
        skewed = docs.withColumn(
            "k",
            F.when(F.pmod(F.xxhash64("doc_id"), F.lit(10)) < 9, F.lit("hot")).otherwise(
                F.concat(F.lit("cold"), (F.col("doc_id") % 50).cast("string"))
            ),
        )
        rd = tempfile.mkdtemp(prefix="skew_right_")
        skewed.groupBy("k").agg(F.count(F.lit(1)).alias("n")).write.mode(
            "overwrite"
        ).parquet(rd)
        right = spark.read.parquet(rd)
        j = skewed.join(right, "k").select(F.sum(F.length("text")).alias("s"))
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "OptimizeSkewedJoin did not fire"
        assert "skewed" in plan  # AQEShuffleRead ... skewed
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_equals_plain_inner_and_left(spark):
    from api_kakfa_spark_airflow_s3_athena_spark.operators.skew import salted_join

    # hot key 7 (400 rows), cold keys, plus keys 900+ with no dim match
    rows = (
        [Row(k=7, v=i) for i in range(400)]
        + [Row(k=i % 50, v=i) for i in range(200)]
        + [Row(k=900 + i, v=i) for i in range(5)]
    )
    left = spark.createDataFrame(rows).repartition(8)
    right = spark.createDataFrame(
        [Row(k=i, label=f"dim{i}") for i in range(60)]
    )

    def multiset(df):
        out = {}
        for r in df.collect():
            key = tuple(sorted(r.asDict().items()))
            out[key] = out.get(key, 0) + 1
        return out

    for how in ("inner", "left"):
        plain = multiset(left.join(right, ["k"], how))
        salted = multiset(salted_join(left, right, ["k"], 8, how))
        assert salted == plain, how


def test_salted_join_rejects_outer_hows(spark):
    import pytest

    from api_kakfa_spark_airflow_s3_athena_spark.operators.skew import salted_join

    df = spark.createDataFrame([Row(k=1)])
    with pytest.raises(ValueError):
        salted_join(df, df, ["k"], how="full")


def test_salted_join_hot_key_spreads(spark):
    """The hot key's probe rows must occupy >1 (key, salt) group —
    otherwise the replicated join degraded to the plain single-reducer
    layout (the key-derived-salt failure mode)."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [Row(k=7, v=i) for i in range(2000)]
    ).repartition(8)
    right = spark.createDataFrame([Row(k=7, label="hot")])
    joined = salted_join(left, right, ["k"], salt_buckets=8)
    assert joined.count() == 2000
    # reconstruct the salt the operator applies: per-row, id-hashed
    salt = F.pmod(
        F.xxhash64(F.monotonically_increasing_id(), F.lit(0x5A17)), F.lit(8)
    )
    n_buckets = (
        left.withColumn("__salt", salt).select("__salt").distinct().count()
    )
    assert n_buckets > 1


def test_salted_join_preserves_caller_salt_column(spark):
    """ADVICE-r10 clobber class: a caller's own __salt column must
    survive salted_join untouched (collision-checked scratch name)."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(1, 111), (2, 222)], ["k", "__salt"]
    )
    right = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "v"])
    got = sorted(
        (r.k, r["__salt"], r.v)
        for r in salted_join(left, right, on=["k"], salt_buckets=4).collect()
    )
    assert got == [(1, 111, "x"), (2, 222, "y")]


def test_salted_partials_conflicts_loudly_on_salt_column(spark):
    import pytest
    from pyspark.sql import functions as F

    from api_kakfa_spark_airflow_s3_athena_spark.operators.skew import salted_partials

    df = spark.createDataFrame([(1, 2, 3)], ["k", "__salt", "v"])
    with pytest.raises(ValueError, match="__salt"):
        salted_partials(df, ["k"], [(F.sum("v"), F.sum("v"), "s")])
