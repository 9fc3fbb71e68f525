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
