"""Distributed quantile estimation: deterministic hash-sampled rank
quantiles with an exact-rank verification contract, and robust
(median/MAD) per-group statistics.

Driver-mandated training-pipeline extension (SURVEY.md §2f family):
percentile monitoring — latency/quality/value distributions per key —
is the dashboard primitive every corpus pipeline needs, and the naive
form (full sort per group, or ``percentile()`` over the raw stream)
shuffles the ENTIRE value column. Two scale disciplines live here:

* **Hash-sampled quantiles** (:func:`sampled_quantiles`): estimate
  rank quantiles from a Bernoulli sample drawn by a deterministic
  md5 coin on the row id (the repo's engine-reproducibility recipe —
  ``weighted_sample_aes`` / ``deterministic_sample`` use the same
  trick). The sample is a SCAN-LEVEL FILTER: at 100 TB the exchange
  carries only the p-fraction, and the per-group sort that ranks the
  sample touches p·n rows instead of n. Classical guarantee
  (Hoeffding on the empirical CDF): with sample size s per group, the
  estimated q-quantile's true rank is within ``eps`` of q with
  probability ≥ 1 − 2e^(−2·s·eps²) — the contract column makes that
  bound FALSIFIABLE per group by computing the estimate's exact rank
  interval against the full data (one conditional aggregate, no sort).

* **Discrete (type-1) quantiles** everywhere: the estimate is an
  ELEMENT of the data (rank ``max(1, ceil(q·n))`` under
  ``(value, id)`` order), never an interpolation — integer rank
  arithmetic and element selection are bit-identical across engines,
  where interpolated quantiles (Spark ``percentile`` vs DuckDB
  ``quantile_cont``) differ in FP association. The same rule at both
  the sample and full-data level keeps every emitted value exactly
  representable input data.

* **Robust stats** (:func:`robust_stats`): per-group median, MAD
  (median absolute deviation) and outlier counts under the
  ``|x − med| > c·MAD`` rule — the heavy-tail-safe alternative to
  mean/stddev z-scores (``event_value_anomalies``). Exact two-pass
  form here (two per-group sorts of the value column); the 100 TB
  path swaps each sort for :func:`sampled_quantiles` — same rule,
  sample-sized exchanges (cross-ref in the staged query docstring).

Mergeability: a Bernoulli hash sample is trivially mergeable — the
sample of a union is the union of samples (same coin, same
threshold) — which is what the streaming arm
(``streaming/sketches.sample_sink``) relies on: per-epoch sample
union IS the batch sample of everything streamed, bit-exactly.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_coin",
    "bernoulli_sample",
    "discrete_quantiles",
    "sampled_quantiles",
    "quantile_rank_check",
    "robust_stats",
    "weighted_discrete_quantiles",
    "quantile_drift",
    "distributed_rank",
    "distributed_cumsum",
    "ntile_from_rank",
]

COIN_BITS = 20
COIN_SPAN = 1 << COIN_BITS  # 1048576


def hash_coin(id_col: Column, salt: str) -> Column:
    """Deterministic uniform coin on [0, 2^20): the first 5 hex chars
    of ``md5(id || salt)`` — bit-identical in Spark
    (``conv(substr(md5(x),1,5),16,10)``) and DuckDB
    (``CAST('0x'||substr(md5(x),1,5) AS BIGINT)``)."""
    return F.conv(
        F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(salt))), 1, 5),
        16,
        10,
    ).cast("long")


def bernoulli_sample(
    df: DataFrame, id_col: Column, salt: str, rate_num: int, rate_den: int = COIN_SPAN
) -> DataFrame:
    """Keep rows whose coin < rate_num/rate_den — a deterministic
    Bernoulli sample that is run/retry/engine-stable and MERGEABLE
    (sample(A ∪ B) = sample(A) ∪ sample(B)). The predicate is a plain
    scan filter: no shuffle, no state, prunes before any exchange."""
    threshold = (rate_num * COIN_SPAN) // rate_den
    return df.where(hash_coin(id_col, salt) < threshold)


def discrete_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    id_col: str,
    qs: Sequence[float],
) -> DataFrame:
    """Per-group type-1 (discrete) quantiles: the element at rank
    ``max(1, ceil(q·n))`` under ``(value, id)`` order, one row per
    (group, q). One per-group sort (window row_number + count), then a
    broadcast join against the tiny q-list — the quantile value is
    always an actual data element, so no interpolation arithmetic can
    diverge between engines."""
    gcols = list(group_cols)
    w = Window.partitionBy(*gcols).orderBy(F.col(value_col), F.col(id_col))
    ranked = df.select(*gcols, value_col, id_col).withColumn(
        "__rn", F.row_number().over(w)
    ).withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy(*gcols)))
    qrows = df.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    target = F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("__n")).cast("int"))
    return (
        ranked.crossJoin(F.broadcast(qrows))
        .where(F.col("__rn") == target)
        .select(
            *gcols,
            "q",
            F.col(value_col).alias("value"),
            F.col("__n").cast("long").alias("n"),
        )
    )


def sampled_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    id_col: str,
    qs: Sequence[float],
    rate_num: int,
    salt: str = ":qs",
) -> DataFrame:
    """Quantile ESTIMATES from the deterministic Bernoulli sample:
    :func:`discrete_quantiles` over :func:`bernoulli_sample`. Output
    per (group, q): ``est_value`` (an element of the sample),
    ``sample_n``. The only sorted/shuffled rows are the sample's."""
    sample = bernoulli_sample(df, F.col(id_col), salt, rate_num)
    out = discrete_quantiles(sample, group_cols, value_col, id_col, qs)
    return out.select(
        *group_cols, "q", F.col("value").alias("est_value"),
        F.col("n").alias("sample_n"),
    )


def quantile_rank_check(
    estimates: DataFrame,
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    eps: float,
) -> DataFrame:
    """Exact-rank verification of quantile estimates WITHOUT sorting
    the full data: join the (tiny, broadcast) estimate rows to the
    full frame on the group key and count, per (group, q),
    ``n_lt = #{x < est}`` and ``n_le = #{x ≤ est}`` in one conditional
    aggregate. The estimate's true rank occupies ``[n_lt+1, n_le]``
    (the tie interval); the check passes iff that interval intersects
    ``[(q−eps)·n, (q+eps)·n]``.

    The verification costs ONE scan + one group-sized exchange per
    call — this is the production pattern for auditing a sketch
    against ground truth on a sampled day, not something run on every
    query."""
    gcols = list(group_cols)
    est = estimates.select(
        *gcols, "q", "est_value", "sample_n"
    )
    joined = df.select(*gcols, value_col).join(
        F.broadcast(est), on=gcols, how="inner"
    )
    per = joined.groupBy(*gcols, "q", "est_value", "sample_n").agg(
        F.count(F.lit(1)).cast("long").alias("n_full"),
        F.sum((F.col(value_col) < F.col("est_value")).cast("long"))
        .cast("long")
        .alias("n_lt"),
        F.sum((F.col(value_col) <= F.col("est_value")).cast("long"))
        .cast("long")
        .alias("n_le"),
    )
    lo_bound = (F.col("q") - F.lit(eps)) * F.col("n_full")
    hi_bound = (F.col("q") + F.lit(eps)) * F.col("n_full")
    ok = ((F.col("n_lt") + F.lit(1)).cast("double") <= hi_bound) & (
        F.col("n_le").cast("double") >= lo_bound
    )
    return per.select(
        *gcols,
        "q",
        "est_value",
        "sample_n",
        "n_full",
        "n_lt",
        "n_le",
        ok.alias("rank_err_ok"),
    )


def robust_stats(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    id_col: str,
    c: float = 3.0,
    scale: float = 1.4826,
) -> DataFrame:
    """Per-group robust location/spread: discrete median, MAD (the
    discrete median of ``|x − med|``, deviation ties broken by id),
    and the count/rate of outliers under ``|x − med| > c·scale·MAD``
    (1.4826 makes MAD consistent for a normal σ — public constant).

    Exact two-pass form: one per-group sort for the median, one for
    the MAD (the deviation rank), one final aggregate. The outlier
    rule's arithmetic is subtraction + one multiply of
    engine-identical inputs, deterministic per the float recipe."""
    gcols = list(group_cols)
    # median is referenced by BOTH the MAD chain and the final
    # aggregate; materializing the one-row-per-group frame (round-13)
    # keeps the full-data median sort single-execution
    from ._util import materialize_once

    med = materialize_once(
        discrete_quantiles(df, gcols, value_col, id_col, [0.5]).select(
            *gcols, F.col("value").alias("median"),
        )
    )
    with_med = df.select(*gcols, value_col, id_col).join(
        F.broadcast(med), on=gcols, how="inner"
    )
    dev = with_med.select(
        *gcols,
        id_col,
        F.abs(F.col(value_col) - F.col("median")).alias("__dev"),
    )
    mad = discrete_quantiles(dev, gcols, "__dev", id_col, [0.5]).select(
        *gcols, F.col("value").alias("mad"),
    )
    cutoff = F.lit(float(c) * float(scale)) * F.col("mad")
    return (
        with_med.join(F.broadcast(mad), on=gcols, how="inner")
        .groupBy(*gcols, "median", "mad")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                (F.abs(F.col(value_col) - F.col("median")) > cutoff).cast("long")
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .select(
            *gcols,
            "n",
            "median",
            "mad",
            "n_outliers",
            F.round(F.col("n_outliers") / F.col("n"), 6).alias("outlier_rate"),
        )
    )


def quantile_drift(
    sample_a: DataFrame,
    sample_b: DataFrame,
    value_col: str,
    id_col: str,
    qs: Sequence[float],
) -> DataFrame:
    """Max-rank-displacement drift between two BOUNDED samples (the
    adaptive sampler's per-epoch states — the distribution-shift
    alarm primitive for streaming ingest): for each ``q``, take A's
    discrete q-quantile ELEMENT ``value_a`` (:func:`discrete_quantiles`
    — always actual data, no interpolation), locate it in B by exact
    rank counting ``n_le_b = #{x ≤ value_a}``, and emit the rank
    displacement ``|n_le_b/n_b − q|``. If B is distributed like A,
    the element that sat at rank-fraction q in A still sits near q in
    B (displacement ≈ sampling noise, Dvoretzky–Kiefer–Wolfowitz:
    ≤ √(ln(2/δ)/2s) w.p. 1−δ); under a shift the upper quantiles'
    displacement approaches the shifted mass fraction. Output per q:
    ``(q, value_a, n_le_b, n_b, displacement)`` — the caller maxes
    displacement into the alarm.

    Cost shape: both inputs are cap-bounded samples (kilobytes), so
    the quantile sort and the crossJoin-count are driver-trivial at
    any corpus size — the 100 TB cost lives in the adaptive sampler
    that MAINTAINS the samples, which is one scan-level filter per
    epoch."""
    a = sample_a.select(value_col, id_col).withColumn("__g", F.lit(1))
    qa = discrete_quantiles(a, ["__g"], value_col, id_col, qs).select(
        "q", F.col("value").alias("value_a")
    )
    b = sample_b.select(F.col(value_col).alias("__v"))
    return (
        b.crossJoin(F.broadcast(qa))
        .groupBy("q", "value_a")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_b"),
            F.sum((F.col("__v") <= F.col("value_a")).cast("long"))
            .cast("long")
            .alias("n_le_b"),
        )
        .select(
            "q",
            "value_a",
            "n_le_b",
            "n_b",
            F.round(
                F.abs(F.col("n_le_b") / F.col("n_b") - F.col("q")), 6
            ).alias("displacement"),
        )
    )


def weighted_discrete_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    weight_col: str,
    id_col: str,
    qs: Sequence[tuple],
) -> DataFrame:
    """Per-group WEIGHTED discrete quantiles with all-integer rank
    arithmetic: the q-quantile is the value at the first row (under
    ``(value, id)`` order) whose cumulative weight reaches q of the
    group's total — i.e. the smallest v such that
    ``weight{x ≤ v} ≥ q·W``.

    ``qs`` are exact rationals as ``(num, den)`` pairs — the reach
    test is ``cum·den ≥ num·W``, integer multiplication on integer
    weights, so there is NO floating-point anywhere in the selection
    (the unweighted :func:`discrete_quantiles` needs one FP
    ceil(q·n); the weighted form dodges even that). Zero/negative
    weights are dropped (they cannot move a weighted rank and would
    make the cumulative sum non-strict).

    One per-group sort (window cumulative sum), one broadcast join
    against the tiny q-list, one min-aggregate. The 100 TB shape is
    the same as the unweighted path: swap the full sort for the
    hash-sampled variant when the exchange matters (sampling rows
    proportionally to weight — A-ES keys — gives the weighted
    analogue)."""
    gcols = list(group_cols)
    pos = df.select(*gcols, value_col, id_col, F.col(weight_col).cast("long").alias("__w")).where(
        F.col("__w") > 0
    )
    w_ord = Window.partitionBy(*gcols).orderBy(F.col(value_col), F.col(id_col))
    cum = pos.withColumn("__cum", F.sum("__w").over(w_ord)).withColumn(
        "__tot", F.sum("__w").over(Window.partitionBy(*gcols))
    )
    qrows = df.sparkSession.createDataFrame(
        [(int(n), int(d)) for n, d in qs], "q_num long, q_den long"
    )
    reach = cum.crossJoin(F.broadcast(qrows)).where(
        F.col("__cum") * F.col("q_den") >= F.col("q_num") * F.col("__tot")
    )
    first = reach.groupBy(*gcols, "q_num", "q_den").agg(
        F.min("__cum").alias("__mcum")
    )
    return (
        reach.join(first, [*gcols, "q_num", "q_den"])
        .where(F.col("__cum") == F.col("__mcum"))
        .select(
            *gcols,
            "q_num",
            "q_den",
            F.col(value_col).alias("value"),
            F.col("__tot").alias("total_weight"),
        )
    )


def _shuffle_partitions(spark, df: DataFrame) -> int:
    """Default partition count for the range exchange: the session's
    ``spark.sql.shuffle.partitions`` when it parses as an integer;
    on deployments where the conf is symbolic (e.g. ``auto`` under
    some AQE-managed runtimes) fall back to the input frame's
    current partition count rather than raising."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return max(1, df.rdd.getNumPartitions())


def distributed_rank(
    df: DataFrame,
    order_cols: Sequence[str],
    rank_col: str = "rank",
    partitions: int | None = None,
) -> DataFrame:
    """Exact global row_number under a TOTAL order WITHOUT the
    single-partition window (``Window.orderBy`` with no partitionBy
    serializes the whole sort through one task — the bottleneck the
    round-12 scale sweep measured at 14.5× on a 10M-row ntile).
    Two-phase distributed rank with DRIVER-FROZEN range bounds
    (round-13 redesign): one approxQuantile pass over the first order
    column freezes P−1 boundary values as a literal array, every row
    gets a bucket id by counting bounds ≤ value, then (a) one
    sort-free counts pass per bucket and (b) one per-bucket
    row_number window, joined on the broadcast cumulative offsets.
    Ranks are IDENTICAL to the serial window's because the bucket
    assignment is monotone in the first order column and the order
    is total within buckets.

    Freezing the bounds on the driver removes BOTH problems of the
    round-12 ``repartitionByRange`` + eager-localCheckpoint shape at
    the root: the RangePartitioner re-execution hazard (its bounds
    sampler is seeded by rdd id, so a fan-out could silently re-plan
    a DIFFERENT partitioning — frozen literals make every execution
    identical, no materialization needed), and the checkpoint's
    executor-local non-replayable blocks (this plan is pure lineage —
    executor loss just recomputes; measured at 60M rows the
    checkpoint's ~35 s storage toll disappears and the counts pass
    skips the sort entirely).

    ``order_cols`` MUST form a total order (include an id
    tie-breaker) and the FIRST order column must be a numeric column
    name (the approxQuantile target). All rows sharing one value of
    the first column land in one bucket, so a column where one value
    dominates degenerates toward a single-bucket sort — the same tie
    caveat as any range exchange; pick a high-cardinality leading
    column.

    100 TB shape: one GK-sketch aggregate (approxQuantile), one
    cheap bucket-count aggregate, one P-way parallel sort; driver
    state is P−1 doubles + the P-row offset frame (broadcast)."""
    from ._util import require_absent, scratch_name

    require_absent(df, rank_col, "distributed_rank")
    spark = df.sparkSession
    if partitions is None:
        partitions = _shuffle_partitions(spark, df)
    pid = scratch_name("__dr_pid", df)
    lrk = scratch_name("__dr_lrank", df)
    cnt = scratch_name("__dr_cnt", df)
    off = scratch_name("__dr_off", df)
    first = order_cols[0]
    # P-1 frozen bounds; rel-err only skews bucket BALANCE, never
    # correctness (ranks come from counts + local sort, not bounds)
    qs = [i / partitions for i in range(1, partitions)]
    bounds = sorted(
        set(
            df.select(F.col(first).cast("double").alias("__q")).stat.approxQuantile(
                "__q", qs, 0.001
            )
        )
    )
    if bounds:
        # branchless Σ (x >= bound) — stays inside whole-stage codegen
        # (a higher-order array filter here ran interpreted and showed
        # up as ~2x on the 60M-row sweep); NULL first-col values make
        # every term NULL -> coalesce sends them to bucket 0, matching
        # the serial window's NULLS FIRST
        x = F.col(first).cast("double")
        total = None
        for b in bounds:
            term = (x >= F.lit(float(b))).cast("int")
            total = term if total is None else total + term
        bucket = F.coalesce(total, F.lit(0))
    else:
        bucket = F.lit(0)  # empty input (or all-null first column)
    cols = [F.col(c) for c in order_cols]
    keyed = df.withColumn(pid, bucket)
    # pass 1: bucket census — a plain aggregate, NO sort
    counts = keyed.groupBy(pid).agg(F.count(F.lit(1)).alias(cnt))
    woff = Window.orderBy(pid).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        pid, F.coalesce(F.sum(cnt).over(woff), F.lit(0)).alias(off)
    )
    # pass 2: per-bucket local rank (hash exchange on pid + in-bucket
    # sort, planned by the window itself); both passes re-derive pid
    # from the SAME literal bounds, so re-execution is harmless
    wlocal = Window.partitionBy(pid).orderBy(*cols)
    return (
        keyed.withColumn(lrk, F.row_number().over(wlocal))
        .join(F.broadcast(offsets), pid)
        .withColumn(rank_col, (F.col(lrk) + F.col(off)).cast("long"))
        .drop(pid, lrk, off)
    )


def distributed_cumsum(
    df: DataFrame,
    order_cols: Sequence,
    value_col: str,
    cumsum_col: str = "cum",
    partitions: int | None = None,
) -> DataFrame:
    """Exact INCLUSIVE running sum of ``value_col`` under a total
    order, distributed — the companion to :func:`distributed_rank`
    for the other global-window staple (Lorenz curves, cumulative
    shares, watermarks). Same two-phase shape: range exchange on the
    order columns, per-partition local cumulative sum, broadcast of
    the ≤P-row cumulative PARTITION TOTALS as offsets. For EXACT
    value types (integer/decimal — how every in-repo caller uses it)
    the result is identical to the serial
    ``Window.orderBy(...).rowsBetween(unboundedPreceding, 0)``
    because the range partitioner is order-preserving and exact
    addition is associative; for DOUBLE values the broadcast
    partition-total offsets change float summation order, so
    last-ulp divergence from the serial window is possible.

    ``order_cols`` may mix column names and Column sort expressions
    (e.g. ``F.desc("r")``) and MUST form a total order. Same
    materialization discipline as distributed_rank: the local-cumsum
    frame is eager-checkpointed so the offsets describe the SAME
    sampled partitioning as the rows (the RangePartitioner seed
    hazard — :func:`distributed_rank` eliminated it by freezing
    driver-side bounds, a redesign that applies here too when the
    leading order expression is a plain ascending numeric column;
    this operator keeps the checkpoint shape because callers pass
    arbitrary sort EXPRESSIONS, e.g. ``F.desc``). Resilience caveat:
    the eager ``localCheckpoint`` stores executor-local,
    non-replayable blocks — on a long-lived cluster with dynamic
    allocation or executor loss, reliably ``checkpoint()`` the input
    if the job must survive executor churn."""
    from ._util import require_absent, scratch_name

    require_absent(df, cumsum_col, "distributed_cumsum")
    spark = df.sparkSession
    if partitions is None:
        partitions = _shuffle_partitions(spark, df)
    pid = scratch_name("__dc_pid", df)
    lcs = scratch_name("__dc_lcum", df)
    tot = scratch_name("__dc_tot", df)
    off = scratch_name("__dc_off", df)
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = df.repartitionByRange(partitions, *cols).withColumn(
        pid, F.spark_partition_id()
    )
    wlocal = (
        Window.partitionBy(pid)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = ranged.withColumn(
        lcs, F.sum(value_col).over(wlocal)
    ).localCheckpoint(eager=True)
    totals = local.groupBy(pid).agg(F.sum(value_col).alias(tot))
    woff = Window.orderBy(pid).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        pid, F.coalesce(F.sum(tot).over(woff), F.lit(0)).alias(off)
    )
    return (
        local.join(F.broadcast(offsets), pid)
        .withColumn(cumsum_col, F.col(lcs) + F.col(off))
        .drop(pid, lcs, off)
    )


def grouped_distributed_cumsum(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence,
    value_col: str,
    cumsum_col: str = "cum",
    partitions: int | None = None,
) -> DataFrame:
    """Exact per-group inclusive running sum where the GROUP count is
    small — the sweep-line shape (`peak_concurrent_activity`: 5 event
    types over 2x-intervals endpoint rows). A plain
    ``Window.partitionBy(group).orderBy(...)`` gives only
    #groups-way parallelism — every group's whole series sorts
    through ONE task; this operator splits each group into
    ``partitions`` sub-buckets by EQUAL-WIDTH ranges of the leading
    numeric order column (per-group min/max aggregate — fully
    deterministic, NO sampling, so unlike ``repartitionByRange``
    every re-execution derives the identical bucketing and nothing
    needs materializing), computes per-(group, bucket) local cumsums
    in parallel, and adds broadcast exclusive bucket offsets.

    Identical to the serial per-group window for exact value types
    (integer/decimal) because bucketing is monotone in the leading
    column (ties share a bucket) and exact addition is associative.

    ``order_cols[0]`` must be a NUMERIC COLUMN NAME (the bucketing
    target; NULLs land in bucket 0 = NULLS FIRST); the rest may be
    names or sort expressions (``F.desc(...)``) and must complete a
    total order within each group. ``group_cols`` must be LOW
    cardinality (the per-group bounds and the group x partitions
    offset frame are broadcast); for high-cardinality groups the
    plain window is already parallel — use that.

    Equal-width (not equi-depth) buckets only skew BALANCE, never
    correctness; a clustered leading column degrades toward the
    serial window's parallelism in the worst case.

    100 TB shape: one per-group min/max aggregate, one per-bucket
    totals aggregate, one (group x partitions)-parallel window;
    driver state is the broadcast bounds + offsets frames
    (O(groups x partitions) rows)."""
    from ._util import require_absent, scratch_name

    require_absent(df, cumsum_col, "grouped_distributed_cumsum")
    spark = df.sparkSession
    if partitions is None:
        partitions = _shuffle_partitions(spark, df)
    first = order_cols[0]
    if not isinstance(first, str):
        raise TypeError(
            "grouped_distributed_cumsum: order_cols[0] must be a numeric "
            "column name (the equal-width bucketing target)"
        )
    gcols = list(group_cols)
    pid = scratch_name("__gc_pid", df)
    lcs = scratch_name("__gc_lcum", df)
    tot = scratch_name("__gc_tot", df)
    off = scratch_name("__gc_off", df)
    mn = scratch_name("__gc_mn", df)
    mx = scratch_name("__gc_mx", df)
    bounds = df.groupBy(*gcols).agg(
        F.min(F.col(first).cast("double")).alias(mn),
        F.max(F.col(first).cast("double")).alias(mx),
    )
    x = F.col(first).cast("double")
    span = F.col(mx) - F.col(mn)
    bucket = (
        F.when(F.col(first).isNull() | (span <= 0), F.lit(0))
        .otherwise(
            F.least(
                F.lit(partitions - 1),
                F.floor((x - F.col(mn)) / (span + F.lit(1.0)) * partitions),
            )
        )
        .cast("int")
    )
    keyed = (
        df.join(F.broadcast(bounds), gcols)
        .withColumn(pid, bucket)
        .drop(mn, mx)
    )
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    wlocal = (
        Window.partitionBy(*gcols, pid)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    totals = keyed.groupBy(*gcols, pid).agg(F.sum(value_col).alias(tot))
    woff = (
        Window.partitionBy(*gcols)
        .orderBy(pid)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *gcols, pid, F.coalesce(F.sum(tot).over(woff), F.lit(0)).alias(off)
    )
    return (
        keyed.withColumn(lcs, F.sum(value_col).over(wlocal))
        .join(F.broadcast(offsets), [*gcols, pid])
        .withColumn(cumsum_col, F.col(lcs) + F.col(off))
        .drop(pid, lcs, off)
    )


def ntile_from_rank(rank_col: Column, n_col: Column, k: int) -> Column:
    """SQL ``ntile(k)`` as a pure integer function of
    ``(row_number, n)`` — so a DISTRIBUTED rank
    (:func:`distributed_rank`) can reproduce the serial window's
    ntile bit-for-bit: with ``n = q·k + rem``, the first ``rem``
    buckets hold ``q+1`` rows, the rest ``q``. Divisions only ever
    see an exactly-divisible numerator (x − x mod d), so the
    double-division path is exact below 2^53 rows; the
    ``greatest(q, 1)`` guard keeps the unused else-branch division
    legal when ``n < k`` (every row then lands in the first
    branch)."""

    def exact_div(num: Column, den: Column) -> Column:
        # num is always a multiple of den here; the double division of
        # an exactly-divisible pair is exact below 2^53
        return (num.cast("double") / den.cast("double")).cast("long")

    n = n_col.cast("long")
    rn = rank_col.cast("long")
    qq = exact_div(n - (n % k), F.lit(k))
    rem = (n % k).cast("long")
    cut = rem * (qq + 1)
    bucket_first = exact_div((rn - 1) - ((rn - 1) % (qq + 1)), qq + 1) + 1
    g = F.greatest(qq, F.lit(1))
    off = rn - cut - 1
    bucket_rest = rem + exact_div(off - (off % g), g) + 1
    return (
        F.when(rn <= cut, bucket_first).otherwise(bucket_rest).cast("long")
    )
