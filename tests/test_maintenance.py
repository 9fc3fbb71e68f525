"""Compaction: fragmented partitions get stitched to the byte target,
already-compact partitions are never touched (file identity preserved)."""

import os

from pyspark.sql import Row

from api_kakfa_spark_airflow_s3_athena_spark.operators.maintenance import (
    compact_parquet,
    plan_compaction,
)


def _files(d):
    return sorted(
        f for f in os.listdir(d) if not f.startswith(("_", ".")) and f.endswith(".parquet")
    )


def test_compact_unpartitioned_to_single_file(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([Row(i=i, s=f"v{i}") for i in range(1000)])
    df.repartition(20).write.parquet(path)
    assert len(_files(path)) == 20

    stats = compact_parquet(spark, path, target_bytes=1 << 30)
    assert stats["partitions_rewritten"] == 1
    assert stats["files_before"] == 20 and stats["files_after"] == 1
    assert len(_files(path)) == 1
    got = sorted((r.i, r.s) for r in spark.read.parquet(path).collect())
    assert got == [(i, f"v{i}") for i in range(1000)]


def test_compact_respects_byte_target(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.createDataFrame([Row(i=i) for i in range(5000)]).repartition(16).write.parquet(path)
    total = sum(e["bytes"] for e in plan_compaction(spark, path, 1))
    # target of ~1/3 the table -> 3 output files
    stats = compact_parquet(spark, path, target_bytes=total // 3 + 1)
    assert stats["files_after"] == 3
    assert spark.read.parquet(path).count() == 5000


def test_partitioned_compact_skips_compact_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    frag = spark.createDataFrame([Row(dt="a", i=i) for i in range(200)])
    frag.repartition(8).write.partitionBy("dt").parquet(path)
    compact = spark.createDataFrame([Row(dt="b", i=i) for i in range(200)])
    compact.coalesce(1).write.mode("append").partitionBy("dt").parquet(path)

    b_dir = os.path.join(path, "dt=b")
    before = {f: os.path.getmtime(os.path.join(b_dir, f)) for f in _files(b_dir)}
    assert len(before) == 1

    stats = compact_parquet(spark, path, target_bytes=1 << 30)
    assert stats["partitions_seen"] == 2
    assert stats["partitions_rewritten"] == 1  # only dt=a
    assert len(_files(os.path.join(path, "dt=a"))) == 1
    after = {f: os.path.getmtime(os.path.join(b_dir, f)) for f in _files(b_dir)}
    assert after == before, "already-compact partition was rewritten"

    # partition column survives the dir swap
    got = spark.read.parquet(path).groupBy("dt").count().collect()
    assert sorted((r.dt, r["count"]) for r in got) == [("a", 200), ("b", 200)]


def test_snapshot_diff_statuses_and_null_sentinels(spark):
    """All four outcomes on one constructed pair, including the digest
    traps: (a) NULL vs empty-string content must read as CHANGED (the
    concat sentinel keeps them distinct), (b) a multi-column content
    change in either column is caught, (c) NULL -> NULL is unchanged,
    (d) column-boundary shifts ("ab","c") vs ("a","bc") are distinct."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.maintenance import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [
            Row(id=1, a="x", b="y"),      # unchanged
            Row(id=2, a="x", b="y"),      # removed
            Row(id=4, a="x", b=None),     # NULL -> "" must be changed
            Row(id=5, a=None, b="y"),     # NULL -> NULL unchanged
            Row(id=6, a="ab", b="c"),     # boundary shift -> changed
            Row(id=7, a="x", b="y"),      # second column changed
        ]
    )
    new = spark.createDataFrame(
        [
            Row(id=1, a="x", b="y"),
            Row(id=3, a="x", b="y"),      # added
            Row(id=4, a="x", b=""),
            Row(id=5, a=None, b="y"),
            Row(id=6, a="a", b="bc"),
            Row(id=7, a="x", b="z"),
        ]
    )
    got = {
        (r.id, r.status)
        for r in snapshot_diff(old, new, "id", ("a", "b")).collect()
    }
    assert got == {
        (2, "removed"),
        (3, "added"),
        (4, "changed"),
        (6, "changed"),
        (7, "changed"),
    }


def test_snapshot_diff_digest_injective_under_separator_injection(spark):
    """Round-7 review regression: content containing the old scheme's
    separator byte must not alias across column boundaries — old
    ("x\\x1fy", "z") vs new ("x", "y\\x1fz") concatenated identically
    under sentinel-joining and was reported unchanged. The JSON
    encoding keeps them distinct; likewise a literal "\\x00null"
    string vs an actual NULL."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.maintenance import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [Row(id=1, a="x\x1fy", b="z"), Row(id=2, a="\x00null", b="q")]
    )
    new = spark.createDataFrame(
        [Row(id=1, a="x", b="y\x1fz"), Row(id=2, a=None, b="q")]
    )
    got = {(r.id, r.status) for r in snapshot_diff(old, new, "id", ("a", "b")).collect()}
    assert got == {(1, "changed"), (2, "changed")}


def test_snapshot_diff_digest_injective_for_nested_types(spark):
    """Round-8 ADVICE regression: a ``cast("string")`` pre-pass before
    ``to_json`` rendered complex types WITHOUT quoting, so
    ``['a, b']`` vs ``['a', 'b']`` both became the string "[a, b]"
    and a NULL array element aliased the string 'null' — two
    different contents digested equal and were silently reported
    unchanged. The raw-column ``to_json`` encoding keeps them
    distinct; equal nested contents must still digest equal."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.maintenance import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [
            Row(id=1, tags=["a, b"], title="t"),
            Row(id=2, tags=[None, "x"], title="t"),
            Row(id=3, tags=["same"], title="keep"),
        ]
    )
    new = spark.createDataFrame(
        [
            Row(id=1, tags=["a", "b"], title="t"),
            Row(id=2, tags=["null", "x"], title="t"),
            Row(id=3, tags=["same"], title="keep"),
        ]
    )
    got = {
        (r.id, r.status)
        for r in snapshot_diff(old, new, "id", ("tags", "title")).collect()
    }
    assert got == {(1, "changed"), (2, "changed")}


def test_snapshot_diff_struct_content_column(spark):
    """Struct-typed content columns: field-boundary shifts must be
    detected (the unquoted cast rendering '{x, y}' aliased them)."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.maintenance import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [Row(id=1, meta=Row(a="x, y", b="z")), Row(id=2, meta=Row(a="p", b="q"))]
    )
    new = spark.createDataFrame(
        [Row(id=1, meta=Row(a="x", b="y, z")), Row(id=2, meta=Row(a="p", b="q"))]
    )
    got = {
        (r.id, r.status)
        for r in snapshot_diff(old, new, "id", ("meta",)).collect()
    }
    assert got == {(1, "changed")}


def test_snapshot_diff_map_content_entry_order_canonicalized(spark):
    """Round-8 ADVICE regression: MapType renders in physical storage
    order under ``to_json``, so two semantically equal maps built in
    different entry orders digested differently and reported a
    spurious 'changed'. snapshot_diff now canonicalizes top-level map
    columns (map_entries sorted by key) — equal maps must digest
    equal regardless of construction order, while a genuine value
    change must still be detected."""
    from pyspark.sql import functions as F

    from api_kakfa_spark_airflow_s3_athena_spark.operators.maintenance import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "k1", "v1", "k2", "v2"), (2, "a", "1", "b", "2")],
        "id int, ka string, va string, kb string, vb string",
    ).select(
        "id", F.create_map("ka", "va", "kb", "vb").alias("props")
    )
    # same maps, entries constructed in the OPPOSITE order; id=2 also
    # genuinely changes one value
    new = spark.createDataFrame(
        [(1, "k2", "v2", "k1", "v1"), (2, "b", "2", "a", "CHANGED")],
        "id int, ka string, va string, kb string, vb string",
    ).select(
        "id", F.create_map("ka", "va", "kb", "vb").alias("props")
    )
    got = {
        (r.id, r.status)
        for r in snapshot_diff(old, new, "id", ("props",)).collect()
    }
    assert got == {(2, "changed")}


def test_snapshot_diff_map_of_map_content_column(spark):
    """Round-9 review regression: canonicalization must not require
    ORDERING the map VALUES — a map<string, map<string,int>> column
    fails analysis under sort_array(map_entries(...)) because the
    entry struct embeds an unorderable value type. Keys-only sorting
    handles it: equal nested maps digest equal (whatever entry order
    they were built in), different nested values digest different."""
    from pyspark.sql import functions as F

    from api_kakfa_spark_airflow_s3_athena_spark.operators.maintenance import (
        snapshot_diff,
    )

    def frame(outer_order_swapped, inner_val):
        inner = F.create_map(F.lit("x"), F.lit(inner_val))
        other = F.create_map(F.lit("y"), F.lit(9))
        pairs = (
            [F.lit("b"), other, F.lit("a"), inner]
            if outer_order_swapped
            else [F.lit("a"), inner, F.lit("b"), other]
        )
        return spark.range(1).select(
            F.col("id"), F.create_map(*pairs).alias("m")
        )

    same = snapshot_diff(frame(False, 1), frame(True, 1), "id", ("m",))
    assert same.count() == 0  # equal content, opposite build order
    diff = snapshot_diff(frame(False, 1), frame(False, 2), "id", ("m",))
    assert [r.status for r in diff.collect()] == ["changed"]
