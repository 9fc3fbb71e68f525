"""Multi-dimensional data layout: z-order clustering for min/max
file and row-group skipping.

The reference's read-side scale story is Hive-style partition pruning
on a single date column (``docs/athena-integrity-check.md`` §
partition advice). One column is all directory partitioning can
cluster; queries that filter OTHER dimensions still scan everything.
Z-ordering solves the multi-dimension case: map each clustering
column to a bounded integer, interleave the bits into one z-value,
and range-partition + sort the table by it. Rows close in ANY
clustered dimension land in few files, so every min/max-stats reader
(Spark's parquet row-group pruning, Athena, Iceberg/Delta file skip)
prunes on every clustered column at once — without directories.

Scale design:

- The z-value is a pure JVM expression (aggregate fold over bit
  positions — shifts and masks, no UDF), so clustering a 100 TB table
  is one repartitionByRange (range exchange with sampled bounds) plus
  an in-partition sort: exactly the cost of a global ORDER BY.
- Column normalization is ``width_bucket`` over caller-supplied or
  approxQuantile-derived bounds: the quantile probe is a tiny
  driver-side list (never a collect of data), and quantile bounds
  keep skewed columns from collapsing into few codes.
- The z column is dropped before write; pruning runs off the parquet
  min/max of the ORIGINAL columns, so readers need no knowledge that
  the table is z-ordered.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame

from ._util import require_absent, scratch_name
from pyspark.sql import functions as F

__all__ = ["export_shard", "sharded_export", "zorder_value", "zorder_write"]


def zorder_value(codes: Sequence[Column], bits: int = 10) -> Column:
    """Interleave ``bits`` low bits of each integer code column into a
    single z-value. codes[0] owns the most significant bit at each
    level. All-JVM: an aggregate fold over bit positions emitting
    shift/mask arithmetic — whole-stage-codegen friendly.
    """
    n = len(codes)
    if n == 0:
        raise ValueError("zorder_value needs at least one code column")
    longs = [c.cast("long") for c in codes]

    z = F.lit(0).cast("long")
    # bit i of column j lands at output position i*n + (n-1-j)
    for i in range(bits):
        for j, c in enumerate(longs):
            z = z + F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + (n - 1 - j)
            )
    return z


def _quantile_bounds(
    df: DataFrame, col: str, bits: int, relative_error: float
) -> Tuple[float, float]:
    lo, hi = df.stat.approxQuantile(col, [0.005, 0.995], relative_error)
    if lo == hi:
        hi = lo + 1.0
    return lo, hi


def zorder_write(
    df: DataFrame,
    cols: Sequence[str],
    path: str,
    n_files: int = 32,
    bits: int = 10,
    bounds: Optional[Dict[str, Tuple[float, float]]] = None,
    relative_error: float = 0.01,
) -> List[str]:
    """Write ``df`` to ``path`` clustered by the z-order of ``cols``.

    Each clustering column is normalized to ``[1, 2^bits]`` integer
    codes with ``width_bucket`` over ``bounds`` (caller-supplied, or
    approxQuantile 0.5%/99.5% — outliers clamp to the edge codes,
    which only costs those rows' skipping precision). The frame is
    range-partitioned into ``n_files`` z-ranges and sorted by z within
    each, then the synthetic columns are dropped and the data lands as
    one sorted file per range.

    Returns the clustering columns' resolved bounds as strings for
    observability.
    """
    n_codes = 1 << bits
    resolved: List[str] = []
    code_cols = []
    out = df
    for i, c in enumerate(cols):
        if bounds and c in bounds:
            lo, hi = bounds[c]
        else:
            lo, hi = _quantile_bounds(df, c, bits, relative_error)
        resolved.append(f"{c}:[{lo},{hi}]")
        code = F.width_bucket(
            F.col(c).cast("double"), F.lit(float(lo)), F.lit(float(hi)), F.lit(n_codes)
        )
        # width_bucket: 0 below lo, n+1 above hi -> clamp into [1, n]
        code = F.least(F.greatest(code, F.lit(1)), F.lit(n_codes)) - F.lit(1)
        name = scratch_name(f"__z_code_{i}", df)
        out = out.withColumn(name, code)
        code_cols.append(name)

    z_col = scratch_name("__z", df)
    out = out.withColumn(z_col, zorder_value([F.col(c) for c in code_cols], bits))
    (
        out.repartitionByRange(n_files, F.col(z_col))
        .sortWithinPartitions(z_col)
        .drop(z_col, *code_cols)
        .write.mode("overwrite")
        .parquet(path)
    )
    return resolved


def export_shard(id_col: Column, n_shards: int) -> Column:
    """Deterministic shard assignment for training-data export: the
    16-bit hex prefix of ``md5(id)`` mod ``n_shards``. Same coin
    family as `plans/queries.deterministic_sample` — reproducible
    across engines, runs, partitionings, and retries, with no seed
    plumbing; a uniform 16-bit coin keeps shards balanced to ~1/256
    for any n_shards well under 65536."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 4), 16, 10)
        .cast("long")
        % n_shards
    ).cast("int")


def sharded_export(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_shards: int = 64,
) -> None:
    """The deterministic global shuffle a training export needs: every
    row goes to shard ``md5(id) % n_shards`` (`export_shard`) and is
    ordered INSIDE its shard by the full md5 key — a pseudo-random
    interleave of the whole corpus that any engine can reproduce and
    any failed run can resume (shards are independent; rewriting one
    is idempotent). ``rand()``-based shuffles have none of those
    properties.

    Layout: ``path/shard=<k>/`` via ``partitionBy`` after one
    repartition ON the shard column, so each task writes exactly one
    shard file and the exchange carries each row once. Readers that
    stream shards in shard order then rows in file order see a stable
    global permutation. At 100 TB pick ``n_shards`` so a shard is a
    few GB (the unit of retry and of reader parallelism).
    """
    # "__shard" is the on-disk partition column — part of the layout
    # contract readers depend on, so an input collision must be loud
    require_absent(df, "__shard", "sharded_export")
    key_col = scratch_name("__key", df)
    out = (
        df.withColumn("__shard", export_shard(F.col(id_col), n_shards))
        .withColumn(key_col, F.md5(F.col(id_col).cast("string")))
        .repartition(n_shards, F.col("__shard"))
        .sortWithinPartitions("__shard", key_col)
        .drop(key_col)
    )
    (
        out.write.mode("overwrite")
        .partitionBy("__shard")
        .parquet(path)
    )
