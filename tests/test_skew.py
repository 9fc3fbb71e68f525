"""Salted aggregation must be bit-identical to the plain aggregate."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.operators.skew import salted_agg


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
