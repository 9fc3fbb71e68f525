"""Interval (range) join via bin bucketization.

Spark has no native range-join optimization: a bare
``fact.join(intervals, point BETWEEN lo AND hi)`` plans as a
BroadcastNestedLoopJoin — every fact row scans every interval, O(n·m)
work that is only survivable while the interval side fits in one
broadcast and stays tiny. The classic scale rewrite (documented for
years in the Spark/Databricks range-join literature) turns the range
predicate into an EQUI-join: slice the number line into fixed-width
bins, explode each interval into the bins it overlaps, map each fact
point to its single bin, hash-join on the bin id, then re-check the
exact predicate. Each fact row owns exactly one bin and an interval's
bin list is distinct, so a qualifying (row, interval) pair meets in
exactly one bin — no dedup pass needed, output is exactly the
BETWEEN-join's.

Scale shape: the fact side exchanges (at most once) on an 8-byte bin
key — or not at all when the exploded interval side still broadcasts —
instead of nested-loop scanning; interval-side explode volume is
``len/width + 1`` rows per interval, kept ~2 by deriving the width
from the mean interval length. Hot bins (many co-located points) are
ordinary equi-join skew, which AQE's OptimizeSkewedJoin can split —
impossible for a nested loop.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["binned_interval_join"]


def binned_interval_join(
    fact: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bin_width: Optional[float] = None,
    closed: str = "both",
    max_bins_per_interval: int = 4096,
) -> DataFrame:
    """Join each ``fact`` row to every interval containing its point.

    ``point_col``, ``lo_col``, ``hi_col`` are numeric (callers convert
    dates/timestamps to day/epoch numbers); column names must be
    disjoint across the two frames and neither may contain ``__bin``
    (the internal join key). NULL points and NULL bounds match
    nothing, same as SQL BETWEEN. ``closed``: ``"both"`` keeps
    ``lo <= p <= hi`` (SQL BETWEEN), ``"left"`` keeps ``lo <= p < hi``.
    Degenerate intervals with ``lo > hi`` match nothing and are
    dropped (also keeps ``F.sequence`` from descending — it does, see
    NOTES).

    ``bin_width=None`` derives the width from the mean VALID interval
    length (sentinel ``lo > hi`` rows are filtered first), targeting
    ~2 bins per interval on any domain scale — sub-unit domains get
    sub-unit widths. The same aggregate guards
    ``max_bins_per_interval``: a width far below the longest interval
    would silently explode the interval side, so it raises instead
    (the ``max_queries`` discipline — loud, not slow). Data-dependent
    plan, data-independent answer. The filtered interval side is
    materialized once (eager ``localCheckpoint``), shared by the
    stats aggregate and the join — the operator is therefore eager
    and the interval-side plan never executes twice.
    """
    if closed not in ("both", "left"):
        raise ValueError(f"closed must be 'both' or 'left', got {closed!r}")
    if bin_width is not None and float(bin_width) <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width!r}")
    for frame, side in ((fact, "fact"), (intervals, "intervals")):
        if "__bin" in frame.columns:
            raise ValueError(
                f"the {side} frame already has a '__bin' column — it is "
                "this operator's internal join key; rename it first"
            )
    # Valid intervals only, BEFORE deriving the width: sentinel rows
    # (lo > hi, the common 'invalid' encoding) must not skew the mean
    # length or trip the explode guard (round-7 review). Materialized
    # once (eager localCheckpoint) so the interval-side plan —
    # arbitrarily expensive upstream, e.g. a top-k over a fact table —
    # runs ONE time for the stats aggregate and the join together;
    # checkpoint blocks are ContextCleaner-released on GC, unlike a
    # cache, which would outlive the operator (NOTES: stranded-cache
    # bench flattery). The interval side is the small side by design,
    # and this makes the operator eager, like the prefix join.
    intervals = intervals.filter(F.col(lo_col) <= F.col(hi_col)).localCheckpoint(
        eager=True
    )
    length = F.col(hi_col) - F.col(lo_col)
    stats = intervals.agg(
        F.avg(length).alias("avg_len"), F.max(length).alias("max_len")
    ).collect()[0]
    if bin_width is not None:
        w = float(bin_width)
    elif stats["avg_len"] is None or float(stats["avg_len"]) <= 0:
        # empty side, or all zero-length (point) intervals: no length
        # scale to learn from — every choice is exact; point intervals
        # on sub-unit domains should pass bin_width to spread bins
        w = 1.0
    else:
        # the mean length itself, NOT clamped to >= 1: a sub-unit
        # domain (scores in [0,1)) needs a sub-unit width, or every
        # row lands in bin 0 and the equi-join silently degenerates
        # into the quadratic it exists to avoid (round-7 review)
        w = float(stats["avg_len"])
    if (
        stats["max_len"] is not None
        and float(stats["max_len"]) / w + 2 > max_bins_per_interval
    ):
        raise ValueError(
            f"longest interval ({stats['max_len']}) spans more than "
            f"max_bins_per_interval={max_bins_per_interval} bins at "
            f"width {w}; pass a larger bin_width"
        )
    bins = F.sequence(
        F.floor(F.col(lo_col) / F.lit(w)).cast("long"),
        F.floor(F.col(hi_col) / F.lit(w)).cast("long"),
    )
    iv = intervals.withColumn("__bin", F.explode(bins))
    fk = fact.withColumn(
        "__bin", F.floor(F.col(point_col) / F.lit(w)).cast("long")
    )
    upper = (
        F.col(point_col) <= F.col(hi_col)
        if closed == "both"
        else F.col(point_col) < F.col(hi_col)
    )
    return (
        fk.join(iv, "__bin")
        .where((F.col(point_col) >= F.col(lo_col)) & upper)
        .drop("__bin")
    )
