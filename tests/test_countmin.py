"""Count-min sketch contracts: bit-parity of the counter table with an
independent Python reference, the never-undercount guarantee under
forced collisions, exact linear merge, and the streaming sink's
stream==batch equality."""

import hashlib

import pytest
from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.operators.frequency import (
    cms_lookup,
    cms_merge,
    count_min_counters,
)


def _bucket(unit: str, j: int, width: int) -> int:
    return int(hashlib.md5(f"{j}:{unit}".encode()).hexdigest()[:15], 16) % width


def _ref_counters(units, width, depth):
    cells = {}
    for u in units:
        for j in range(depth):
            key = (j, _bucket(u, j, width))
            cells[key] = cells.get(key, 0) + 1
    return cells


def _frame(spark, units, parts=4):
    return spark.createDataFrame([(u,) for u in units], ["unit"]).repartition(parts)


def test_counters_match_python_reference(spark):
    units = [f"tok{i % 30}" for i in range(500)]
    width, depth = 16, 3
    got = {
        (r.row, r.bucket): r.cnt
        for r in count_min_counters(_frame(spark, units), "unit", width, depth).collect()
    }
    assert got == _ref_counters(units, width, depth)


def test_lookup_never_undercounts_under_forced_collisions(spark):
    """width 4 forces heavy collisions: estimates must always be
    >= the exact count, and equal the reference min-over-rows."""
    units = [f"u{i % 50}" for i in range(1000)]
    width, depth = 4, 3
    counters = count_min_counters(_frame(spark, units), "unit", width, depth)
    queries = _frame(spark, [f"u{i}" for i in range(50)], parts=1)
    got = {
        r.unit: r.cms_est
        for r in cms_lookup(counters, queries, "unit", width, depth).collect()
    }
    ref = _ref_counters(units, width, depth)
    exact = {u: units.count(u) for u in set(units)}
    for u, est in got.items():
        assert est >= exact[u], u
        assert est == min(ref[(j, _bucket(u, j, width))] for j in range(depth)), u


def test_lookup_unseen_unit_estimates_from_collisions_only(spark):
    """A never-seen unit's estimate is the min of whatever collided
    into its cells — with an empty sketch that is 0 (coalesce path)."""
    width, depth = 8, 2
    counters = count_min_counters(_frame(spark, ["a"] * 5), "unit", width, depth)
    q = _frame(spark, ["zzz-never-seen"], parts=1)
    est = cms_lookup(counters, q, "unit", width, depth).collect()[0].cms_est
    ref = _ref_counters(["a"] * 5, width, depth)
    expected = min(
        ref.get((j, _bucket("zzz-never-seen", j, width)), 0) for j in range(depth)
    )
    assert est == expected


def test_merge_equals_counters_of_multiset_union(spark):
    width, depth = 16, 3
    a = [f"x{i % 10}" for i in range(200)]
    b = [f"y{i % 7}" for i in range(150)] + ["x0"] * 9
    ca = count_min_counters(_frame(spark, a), "unit", width, depth)
    cb = count_min_counters(_frame(spark, b), "unit", width, depth)
    merged = {
        (r.row, r.bucket): r.cnt for r in cms_merge(ca, cb).collect()
    }
    direct = {
        (r.row, r.bucket): r.cnt
        for r in count_min_counters(_frame(spark, a + b), "unit", width, depth).collect()
    }
    assert merged == direct


def test_counters_partition_invariant(spark):
    units = [f"t{i % 25}" for i in range(400)]
    frames = []
    for parts in (1, 11):
        frames.append(
            {
                (r.row, r.bucket): r.cnt
                for r in count_min_counters(
                    _frame(spark, units, parts=parts), "unit", 32, 4
                ).collect()
            }
        )
    assert frames[0] == frames[1]


def _run_cms_stream(spark, base, files, width=16, depth=3):
    from api_kakfa_spark_airflow_s3_athena_spark.streaming.sketches import (
        cms_sketch_sink,
    )

    src = f"{base}/src"
    for b, rows in enumerate(files):
        if rows is None:  # placeholder for a file written by an earlier run
            continue
        spark.createDataFrame([(u,) for u in rows], ["unit"]).coalesce(1).write.mode(
            "append" if b else "overwrite"
        ).parquet(src)
    stream = (
        spark.readStream.schema("unit string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = cms_sketch_sink(
        stream,
        "unit",
        width=width,
        depth=depth,
        store_path=f"{base}/store",
        checkpoint=f"{base}/ckpt",
        available_now=True,
    )
    q.awaitTermination()


def test_streaming_counters_equal_batch(spark, tmp_path):
    base = str(tmp_path / "run")
    files = [
        [f"a{i % 5}" for i in range(100)],
        [f"b{i % 3}" for i in range(60)],
        [f"a{i % 5}" for i in range(40)],  # repeats add, not dedupe
    ]
    _run_cms_stream(spark, base, files)
    final = {
        (r.row, r.bucket): r.cnt
        for r in spark.read.parquet(f"{base}/store/epoch=2").collect()
    }
    direct = {
        (r.row, r.bucket): r.cnt
        for r in count_min_counters(
            spark.createDataFrame([(u,) for u in sum(files, [])], ["unit"]),
            "unit",
            16,
            3,
        ).collect()
    }
    assert final == direct
    # cell mass is monotone across epochs (counters only add)
    store = spark.read.parquet(f"{base}/store")
    mass = {
        r.epoch: r.m
        for r in store.groupBy("epoch").agg(F.sum("cnt").alias("m")).collect()
    }
    assert mass[0] <= mass[1] <= mass[2]


def test_streaming_resume_across_restart_equals_batch(spark, tmp_path):
    """Exactly-once across a RESTART with new data: process two epoch
    files, stop (availableNow drains and terminates), append a third
    file, restart against the same checkpoint — the resumed stream
    must process ONLY the new file (offsets tracked, fold continues
    from the stored epoch), and the final counter table must equal a
    one-shot batch sketch of everything ever streamed."""
    from pyspark.sql import functions as F

    from api_kakfa_spark_airflow_s3_athena_spark.operators.frequency import (
        count_min_counters,
    )

    base = str(tmp_path / "run")
    f0 = [f"a{i % 7}" for i in range(50)]
    f1 = [f"b{i % 5}" for i in range(30)]
    f2 = [f"a{i % 3}" for i in range(20)]
    _run_cms_stream(spark, base, [f0, f1])
    epochs_before = {
        r.epoch for r in spark.read.parquet(f"{base}/store").select("epoch").distinct().collect()
    }
    assert epochs_before == {0, 1}
    # restart with one NEW file appended: resumes at epoch 2
    _run_cms_stream(spark, base, [None, None, f2])
    store = spark.read.parquet(f"{base}/store")
    epochs_after = {r.epoch for r in store.select("epoch").distinct().collect()}
    assert epochs_after == {0, 1, 2}
    final = {
        (r.row, r.bucket): r.cnt
        for r in store.filter(F.col("epoch") == 2).collect()
    }
    batch = {
        (r.row, r.bucket): r.cnt
        for r in count_min_counters(
            spark.createDataFrame([(u,) for u in f0 + f1 + f2], ["unit"]),
            "unit",
            16,
            3,
        ).collect()
    }
    assert final == batch
