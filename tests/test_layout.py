"""Z-order layout (operators/layout.py): bit-interleave correctness,
content preservation, and the actual point — min/max file skipping on
EVERY clustered dimension, measured from the written parquet footers
the way any stats-based reader (Spark row-group pruning, Athena,
Iceberg/Delta) would."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.operators.layout import (
    zorder_value,
    zorder_write,
)


def _file_ranges(path, col):
    """[(min, max)] of ``col`` per data file, from parquet footers."""
    import os

    out = []
    for f in sorted(os.listdir(path)):
        if f.startswith(("_", ".")) or not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        lo = min(
            md.row_group(i).column(
                [md.schema.column(j).name for j in range(md.num_columns)].index(col)
            ).statistics.min
            for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(
                [md.schema.column(j).name for j in range(md.num_columns)].index(col)
            ).statistics.max
            for i in range(md.num_row_groups)
        )
        out.append((lo, hi))
    return out


def _overlapping(ranges, lo, hi):
    return sum(1 for a, b in ranges if not (b < lo or a > hi))


def test_zorder_value_interleaves_bits(spark):
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (1, 1), (3, 5)], "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn(
            "z", zorder_value([F.col("x"), F.col("y")], bits=3)
        ).collect()
    }
    # x owns the higher bit of each pair: z = interleave(x2x1x0, y2y1y0)
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 2  # x bit 0 -> position 1
    assert got[(0, 1)] == 1  # y bit 0 -> position 0
    assert got[(1, 1)] == 3
    # x=3 (011), y=5 (101) -> pairs (x2=0,y2=1),(x1=1,y1=0),(x0=1,y0=1)
    # z = 0b011011 = 27
    assert got[(3, 5)] == 27


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("zorder")
    n = 200_000
    df = (
        spark.range(n)
        .select(
            (F.col("id") % 1000).cast("double").alias("x"),
            ((F.col("id") * 7919) % 1000).cast("double").alias("y"),
        )
    )
    linear = str(base / "linear")
    zordered = str(base / "zordered")
    # linear layout: the single-column clustering a date-partitioned
    # table gives you — sorted by x only
    df.repartitionByRange(32, "x").sortWithinPartitions("x").write.mode(
        "overwrite"
    ).parquet(linear)
    zorder_write(
        df, ["x", "y"], zordered, n_files=32, bits=10,
        bounds={"x": (0.0, 1000.0), "y": (0.0, 1000.0)},
    )
    return df, linear, zordered


def test_zorder_preserves_content(spark, layouts):
    df, _linear, zordered = layouts
    back = spark.read.parquet(zordered)
    assert back.count() == df.count()
    want = df.agg(F.sum(F.col("x") + F.col("y") * 2)).collect()[0][0]
    got = back.agg(F.sum(F.col("x") + F.col("y") * 2)).collect()[0][0]
    assert got == want
    assert set(back.columns) == {"x", "y"}  # synthetic columns dropped


def test_zorder_skips_files_on_second_dimension(layouts):
    _df, linear, zordered = layouts
    # 5% selectivity band on y — the dimension the linear layout
    # cannot cluster
    y_lin = _overlapping(_file_ranges(linear, "y"), 100.0, 150.0)
    y_z = _overlapping(_file_ranges(zordered, "y"), 100.0, 150.0)
    n_lin = len(_file_ranges(linear, "y"))
    n_z = len(_file_ranges(zordered, "y"))
    assert y_lin == n_lin  # every x-sorted file spans the whole y range
    assert y_z <= n_z // 2  # z-order: most files skipped on y alone

    # and x-pruning is retained (coarser than pure-x sort, still real)
    x_z = _overlapping(_file_ranges(zordered, "x"), 100.0, 150.0)
    assert x_z <= n_z // 2


def test_sharded_export_is_deterministic_and_balanced(spark, tmp_path):
    """The export shuffle's three contract properties: (1) every row
    lands in the md5-coin shard, (2) rewriting the export reproduces
    byte-identical per-shard row orders (resume/retry safety), (3) a
    16-bit coin keeps shards balanced."""
    import os

    from api_kakfa_spark_airflow_s3_athena_spark.operators.layout import (
        export_shard,
        sharded_export,
    )

    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )
    p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    sharded_export(df, p1, n_shards=8)
    sharded_export(df, p2, n_shards=8)

    back = spark.read.parquet(p1)
    assert back.count() == 4000
    # (1) shard assignment matches the coin
    mism = back.filter(
        F.col("__shard") != export_shard(F.col("doc_id"), 8)
    ).count()
    assert mism == 0
    # (2) per-shard file order identical across the two runs
    def shard_orders(path):
        out = {}
        for d in sorted(os.listdir(path)):
            if not d.startswith("__shard="):
                continue
            rows = (
                spark.read.parquet(os.path.join(path, d))
                .select("doc_id")
                .collect()
            )
            out[d] = [r.doc_id for r in rows]
        return out

    o1, o2 = shard_orders(p1), shard_orders(p2)
    assert o1 == o2 and len(o1) == 8
    # within a shard, order follows the md5 key
    any_shard = next(iter(o1.values()))
    import hashlib

    keys = [hashlib.md5(str(i).encode()).hexdigest() for i in any_shard]
    assert keys == sorted(keys)
    # (3) balance: no shard over 2x the mean
    sizes = [len(v) for v in o1.values()]
    assert max(sizes) <= 2 * (sum(sizes) / len(sizes))


def test_zorder_write_preserves_caller_scratch_columns(spark, tmp_path):
    """A caller's own __z / __z_code_0 columns must survive the layout
    write (collision-checked scratch names)."""
    df = spark.createDataFrame(
        [(i, float(i), float(i * 2), 7, 8) for i in range(20)],
        ["id", "x", "y", "__z", "__z_code_0"],
    )
    from api_kakfa_spark_airflow_s3_athena_spark.operators.layout import zorder_write

    path = str(tmp_path / "zl")
    zorder_write(df, ["x", "y"], path, n_files=2, bits=4)
    out = spark.read.parquet(path)
    assert {"id", "x", "y", "__z", "__z_code_0"} <= set(out.columns)
    assert {(r["__z"], r["__z_code_0"]) for r in out.collect()} == {(7, 8)}


def test_sharded_export_conflicts_loudly_on_shard_column(spark, tmp_path):
    import pytest

    from api_kakfa_spark_airflow_s3_athena_spark.operators.layout import (
        sharded_export,
    )

    df = spark.createDataFrame([(1, 5)], ["doc_id", "__shard"])
    with pytest.raises(ValueError, match="__shard"):
        sharded_export(df, str(tmp_path / "se"))
