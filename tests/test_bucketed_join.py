"""Bucketed tables: joins on the bucket key must not shuffle either
side — the pre-partitioning that turns every future join on that key
into a local zip at 100 TB."""

import pytest
from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    # managed tables land in ./spark-warehouse (gitignored); the
    # warehouse dir is a static conf and cannot move at runtime
    spark.sql("CREATE DATABASE IF NOT EXISTS buck")
    load_table(spark, sf_dir, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable("buck.orders_b")
    load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    ).write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(
        "buck.lineitem_b"
    )
    yield
    spark.sql("DROP TABLE IF EXISTS buck.orders_b")
    spark.sql("DROP TABLE IF EXISTS buck.lineitem_b")
    spark.sql("DROP DATABASE IF EXISTS buck")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    o = spark.table("buck.orders_b")
    li = spark.table("buck.lineitem_b")
    joined = li.join(o, "o_orderkey").groupBy("o_orderstatus").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the join itself must read co-located buckets: no Exchange below it
    join_seg = plan.split("SortMergeJoin")[-1]
    assert "Exchange" not in join_seg.split("HashAggregate")[0]
    # and the result matches the unbucketed join
    expected = (
        load_table(spark, "/root/testdata/sf0.001", "lineitem")
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .join(load_table(spark, "/root/testdata/sf0.001", "orders"), "o_orderkey")
        .groupBy("o_orderstatus")
        .count()
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, expected.collect()))
