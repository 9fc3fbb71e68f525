"""Staging area for not-yet-registered round queries.

THE ROUND-13 PROMOTION BATCH (12 entries, promote per the playbook,
pins 236 -> 248): scd2_user_state_intervals,
histogram_selectivity_audit, join_cardinality_bounds,
funnel_time_to_convert, weekday_seasonality_index,
user_journey_paths, user_activity_entropy (the seven r12-era
pre-builds) + order_line_proration, user_activity_islands,
peak_concurrent_activity, pareto_abc_parts, bigram_pmi_topk (the
five round-12 warehouse/sequence entries). The remaining nine
entries (stratified split, attribution, WOE, basket rules, canonical
selection, record linkage, percentile parity, forecast backtest,
incremental cube) are ROUND-14 pre-builds and wait one more round.
Round 14 also executes the retire-or-merge plan (PARITY.md):
promotion +12 and merge −5 land in the same commit, 248 -> 255.

Promotion playbook (NOTES.md): move each ``@register_staged`` block
into ``plans/queries.py`` as ``@register`` (specs are identical
QuerySpec fields), bump the PARITY/README count pins +
``tests/test_verification_ledger.py`` in the same commit, keep total
new registrations per round <= 12 so the stale cohort still fits the
driver's 50-row prefix.

Every entry here is dual-run verified locally (tools/oracle_check.py
--staged) and covered by tests; staged != stubbed.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators import quantiles as QT
from .queries import QueryFn, QuerySpec, _t

STAGED: Dict[str, QuerySpec] = {}


def register_staged(
    name: str,
    oracle: Optional[str] = None,
    tags: Tuple[str, ...] = (),
    bench_fn: Optional[QueryFn] = None,
):
    def deco(fn: QueryFn) -> QueryFn:
        STAGED[name] = QuerySpec(name, fn, oracle, tags, bench_fn)
        return fn

    return deco


# =====================================================================
# Pre-built for round 13 (the r12 batch above fills this round's
# 12-slot promotion cap; these wait their turn, fully verified)
# =====================================================================


@register_staged(
    "scd2_user_state_intervals",
    oracle="""
        WITH log AS (
            SELECT user_id, event_type AS state, ts, event_id
            FROM events
        ),
        changes AS (
            -- collapse consecutive repeats: a row opens an interval
            -- only when the state differs from the previous state
            SELECT user_id, state, ts, event_id,
                   lag(state) OVER w AS prev_state
            FROM log
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        opens AS (
            SELECT user_id, state, ts AS valid_from, event_id,
                   lead(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS valid_to
            FROM changes
            WHERE prev_state IS NULL OR prev_state <> state
        )
        SELECT user_id, state,
               CAST(count(*) AS BIGINT) AS n_intervals,
               CAST(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_open,
               CAST(sum(CASE WHEN valid_to IS NOT NULL THEN
                        epoch_us(valid_to) - epoch_us(valid_from)
                        ELSE 0 END) AS BIGINT) AS closed_us
        FROM opens
        GROUP BY 1, 2
    """,
    tags=("analytics", "window", "incremental"),
)
def scd2_user_state_intervals(spark, sf_dir):
    """SCD-type-2 interval build from a change log (the dimension-
    history primitive of every warehouse): per user, consecutive
    duplicate states collapse, each state change opens a validity
    interval [valid_from, valid_to) closed by the NEXT change (lead
    window; the current state stays open). Emitted as per-(user,
    state) interval counts, open-interval counts, and total closed
    dwell milliseconds — integer crossing values that pin both the
    run-length collapse and the interval boundary arithmetic.

    Scale shape: two windows partitioned by the natural user key (no
    global sort), one bounded groupBy; 100 TB cost is one shuffle of
    the change log by user."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    log = _t(spark, sf_dir, "events").select(
        "user_id", F.col("event_type").alias("state"), "ts", "event_id"
    )
    changes = log.withColumn("prev_state", F.lag("state").over(w)).filter(
        F.col("prev_state").isNull() | (F.col("prev_state") != F.col("state"))
    )
    opens = changes.withColumn("valid_to", F.lead("ts").over(w)).select(
        "user_id", "state", F.col("ts").alias("valid_from"), "valid_to"
    )
    us = F.unix_micros(F.col("valid_to")) - F.unix_micros(F.col("valid_from"))
    return opens.groupBy("user_id", "state").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum(F.col("valid_to").isNull().cast("long"))
        .cast("long")
        .alias("n_open"),
        F.sum(F.when(F.col("valid_to").isNotNull(), us).otherwise(F.lit(0)))
        .cast("long")
        .alias("closed_us"),
    )


# =====================================================================
# Equi-depth histogram selectivity (optimizer-statistics contract)
# =====================================================================

_HIST_K = 20
_HIST_PREDS = (5000.0, 20000.0, 35000.0, 50000.0, 80000.0)


@register_staged(
    "histogram_selectivity_audit",
    oracle=f"""
        WITH v AS (
            SELECT l_extendedprice AS x,
                   row_number() OVER (
                       ORDER BY l_extendedprice, l_orderkey, l_linenumber
                   ) AS rn,
                   count(*) OVER () AS n
            FROM lineitem
        ),
        b AS (
            SELECT i,
                   (SELECT x FROM v
                    WHERE rn = greatest(1, CAST(ceil(CAST(i AS DOUBLE)
                                   * n / {_HIST_K}) AS BIGINT))
                    LIMIT 1) AS bv
            FROM (SELECT unnest(range(1, {_HIST_K} + 1)) AS i),
                 (SELECT max(n) AS n FROM v)
        ),
        preds AS (
            SELECT CAST(unnest([{", ".join(repr(p) for p in _HIST_PREDS)}])
                   AS DOUBLE) AS t
        ),
        res AS (
            SELECT t,
                   (SELECT CAST(count(*) AS BIGINT) FROM v WHERE x <= t)
                       AS exact_count,
                   (SELECT CAST(count(*) AS BIGINT) FROM b WHERE bv <= t)
                       AS j,
                   (SELECT CAST(max(n) AS BIGINT) FROM v) AS n
            FROM preds
        )
        SELECT t AS threshold, n, j AS buckets_below,
               CAST((j * n) // {_HIST_K} AS BIGINT) AS est_count,
               exact_count,
               CAST(abs(exact_count - (j * n) // {_HIST_K}) AS BIGINT)
                   AS abs_err,
               abs(exact_count - (j * n) // {_HIST_K})
                   <= n // {_HIST_K} + 1 AS err_within_one_bucket
        FROM res
    """,
    tags=("analytics", "approx", "quantile"),
)
def histogram_selectivity_audit(spark, sf_dir):
    """Equi-depth histogram cardinality estimation with a FALSIFIABLE
    error bound — the optimizer-statistics primitive (Spark CBO /
    every warehouse keeps equi-depth column histograms): K=20 discrete
    boundary elements (rank ceil(i·n/K) under a total order), then for
    each range predicate ``x <= t`` the estimate ``⌊j·n/K⌋`` (j =
    boundaries below t) against the EXACT count. Equi-depth theory:
    the estimate is off by at most one bucket — ``err_within_one_
    bucket`` pins ``|est − exact| ≤ n/K + 1`` in both engines (holds
    with slack at every SF; the worst measured predicate sits exactly
    one bucket off because it falls below the first boundary).

    Scale posture: this contract query uses the exact global rank to
    match the oracle bit-for-bit; the 100 TB path swaps boundary
    selection to ``sampled_quantiles`` (scan-level Bernoulli filter,
    same discrete-rank rule — quantiles.py), which changes the bound
    only by the sampling eps. Estimates and errors are all integer
    crossing values."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").cast("double").alias("x"),
        "l_orderkey",
        "l_linenumber",
    )
    w = Window.orderBy("x", "l_orderkey", "l_linenumber")
    ranked = (
        li.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy()))
    )
    idx = ranked.sparkSession.range(1, _HIST_K + 1).select(
        F.col("id").cast("int").alias("i")
    )
    bounds = (
        ranked.crossJoin(F.broadcast(idx))
        .where(
            F.col("rn")
            == F.greatest(
                F.lit(1),
                F.ceil(F.col("i").cast("double") * F.col("n") / _HIST_K),
            )
        )
        .select("i", F.col("x").alias("bv"))
    )
    preds = ranked.sparkSession.createDataFrame(
        [(float(p),) for p in _HIST_PREDS], "t double"
    )
    exact = (
        li.crossJoin(F.broadcast(preds))
        .groupBy("t")
        .agg(F.sum((F.col("x") <= F.col("t")).cast("long")).alias("exact_count"))
    )
    jcount = (
        bounds.crossJoin(F.broadcast(preds))
        .groupBy("t")
        .agg(F.sum((F.col("bv") <= F.col("t")).cast("long")).alias("j"))
    )
    n1 = ranked.agg(F.max("n").cast("long").alias("n"))
    return (
        exact.join(jcount, "t")
        .crossJoin(F.broadcast(n1))
        .select(
            F.col("t").alias("threshold"),
            "n",
            F.col("j").alias("buckets_below"),
            F.expr(f"(j * n) div {_HIST_K}").cast("long").alias("est_count"),
            "exact_count",
            F.abs(
                F.col("exact_count") - F.expr(f"(j * n) div {_HIST_K}")
            )
            .cast("long")
            .alias("abs_err"),
            (
                F.abs(
                    F.col("exact_count") - F.expr(f"(j * n) div {_HIST_K}")
                )
                <= F.expr(f"n div {_HIST_K}") + 1
            ).alias("err_within_one_bucket"),
        )
    )


# =====================================================================
# Join-cardinality estimation bounds (optimizer-statistics contract)
# =====================================================================


@register_staged(
    "join_cardinality_bounds",
    oracle="""
        WITH fa AS (
            SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS f
            FROM orders GROUP BY 1
        ),
        fb AS (
            SELECT c_custkey AS k, CAST(count(*) AS BIGINT) AS f
            FROM customer GROUP BY 1
        ),
        stats AS (
            SELECT (SELECT CAST(sum(f) AS BIGINT) FROM fa) AS n_a,
                   (SELECT CAST(sum(f) AS BIGINT) FROM fb) AS n_b,
                   (SELECT CAST(max(f) AS BIGINT) FROM fa) AS maxf_a,
                   (SELECT CAST(max(f) AS BIGINT) FROM fb) AS maxf_b,
                   (SELECT CAST(count(*) AS BIGINT) FROM fa) AS d_a,
                   (SELECT CAST(count(*) AS BIGINT) FROM fb) AS d_b,
                   (SELECT CAST(sum(fa.f * fb.f) AS BIGINT)
                    FROM fa JOIN fb USING (k)) AS exact_join
        )
        SELECT n_a, n_b, d_a, d_b, maxf_a, maxf_b, exact_join,
               CAST(least(n_a * maxf_b, n_b * maxf_a) AS BIGINT)
                   AS freq_bound,
               CAST(least(d_a, d_b) * maxf_a * maxf_b AS BIGINT)
                   AS distinct_bound,
               exact_join <= least(n_a * maxf_b, n_b * maxf_a)
                   AS freq_bound_holds,
               exact_join <= least(d_a, d_b) * maxf_a * maxf_b
                   AS distinct_bound_holds
        FROM stats
    """,
    tags=("analytics", "join", "approx"),
)
def join_cardinality_bounds(spark, sf_dir):
    """Join-size estimation bounds from per-side key statistics — the
    cardinality-estimation arithmetic a cost-based optimizer runs
    before picking a join strategy: the exact identity
    ``|A⋈B| = Σ_k f_A(k)·f_B(k)`` computed from the two frequency
    tables (itself a crossing value), checked against TWO classical
    upper bounds — the frequency bound ``min(|A|·maxf_B, |B|·maxf_A)``
    and the distinct-count bound ``min(d_A,d_B)·maxf_A·maxf_B`` —
    both pinned as falsifiable booleans in both engines. All-integer
    arithmetic throughout.

    Scale shape: two key-only groupBys (map-side combinable) and a
    join of the FREQUENCY tables (≤ distinct-keys rows), never the
    fact rows — exactly why optimizers estimate from statistics
    instead of running the join."""
    fa = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    fb = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_custkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    sa = fa.agg(
        F.sum("f").cast("long").alias("n_a"),
        F.max("f").cast("long").alias("maxf_a"),
        F.count(F.lit(1)).cast("long").alias("d_a"),
    )
    sb = fb.agg(
        F.sum("f").cast("long").alias("n_b"),
        F.max("f").cast("long").alias("maxf_b"),
        F.count(F.lit(1)).cast("long").alias("d_b"),
    )
    ex = (
        fa.join(fb.withColumnRenamed("f", "fb_f"), "k")
        .agg(F.sum(F.col("f") * F.col("fb_f")).cast("long").alias("exact_join"))
    )
    freq_bound = F.least(
        F.col("n_a") * F.col("maxf_b"), F.col("n_b") * F.col("maxf_a")
    ).cast("long")
    dist_bound = (
        F.least(F.col("d_a"), F.col("d_b"))
        * F.col("maxf_a")
        * F.col("maxf_b")
    ).cast("long")
    return (
        sa.crossJoin(sb)
        .crossJoin(ex)
        .select(
            "n_a",
            "n_b",
            "d_a",
            "d_b",
            "maxf_a",
            "maxf_b",
            "exact_join",
            freq_bound.alias("freq_bound"),
            dist_bound.alias("distinct_bound"),
            (F.col("exact_join") <= freq_bound).alias("freq_bound_holds"),
            (F.col("exact_join") <= dist_bound).alias("distinct_bound_holds"),
        )
    )


# =====================================================================
# Time-to-convert funnel analysis (event-time deltas, discrete ranks)
# =====================================================================

_TTC_QS = (0.25, 0.5, 0.75, 0.9)


@register_staged(
    "funnel_time_to_convert",
    oracle=f"""
        WITH signup AS (
            SELECT user_id, min(ts) AS t0 FROM events
            WHERE event_type = 'signup' GROUP BY 1
        ),
        conv AS (
            SELECT s.user_id,
                   epoch_us(min(e.ts)) - epoch_us(s.t0) AS delta_us
            FROM signup s JOIN events e USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > s.t0
            GROUP BY s.user_id, s.t0
        ),
        ranked AS (
            SELECT delta_us,
                   row_number() OVER (ORDER BY delta_us, user_id) AS rn,
                   count(*) OVER () AS n
            FROM conv
        ),
        qs AS (SELECT CAST(unnest([{", ".join(repr(q) for q in _TTC_QS)}])
                      AS DOUBLE) AS q),
        stats AS (
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM signup)
                       AS n_signup,
                   (SELECT CAST(count(*) AS BIGINT) FROM conv)
                       AS n_converted
        )
        SELECT q.q,
               CAST(r.delta_us AS BIGINT) AS delta_us_at_q,
               s.n_signup, s.n_converted,
               round(s.n_converted / s.n_signup, 6) AS conversion_rate
        FROM qs q
        JOIN ranked r
          ON r.rn = greatest(1, CAST(ceil(q.q * r.n) AS BIGINT))
        CROSS JOIN stats s
    """,
    tags=("analytics", "sessionization", "quantile"),
)
def funnel_time_to_convert(spark, sf_dir):
    """Time-to-convert distribution (the funnel question after the
    conversion RATE: how long does signup → first purchase take):
    per user, the exact microsecond delta from first signup to the
    first STRICTLY-LATER purchase, summarized as discrete rank
    quantiles (elements of the data — the repo's no-interpolation
    rule) plus the conversion share. Every output is an integer
    element, a count, or one rounded division.

    Scale shape: two per-user min-aggregates and one join on the user
    key; the quantile window runs over the CONVERTED-USERS frame
    (user-dimension-sized, not event-sized)."""
    ev = _t(spark, sf_dir, "events")
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(signup, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id", "t0")
        .agg(
            (F.unix_micros(F.min("ts")) - F.unix_micros(F.col("t0"))).alias(
                "delta_us"
            )
        )
    )
    w = Window.orderBy("delta_us", "user_id")
    ranked = conv.select(
        "delta_us",
        "user_id",
    ).withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy())
    )
    qrows = ev.sparkSession.createDataFrame(
        [(float(q),) for q in _TTC_QS], "q double"
    )
    stats = signup.agg(
        F.count(F.lit(1)).cast("long").alias("n_signup")
    ).crossJoin(conv.agg(F.count(F.lit(1)).cast("long").alias("n_converted")))
    return (
        ranked.crossJoin(F.broadcast(qrows))
        .where(
            F.col("rn")
            == F.greatest(
                F.lit(1), F.ceil(F.col("q") * F.col("n")).cast("long")
            )
        )
        .crossJoin(F.broadcast(stats))
        .select(
            "q",
            F.col("delta_us").cast("long").alias("delta_us_at_q"),
            "n_signup",
            "n_converted",
            F.round(F.col("n_converted") / F.col("n_signup"), 6).alias(
                "conversion_rate"
            ),
        )
    )


# =====================================================================
# Weekday seasonality index (integer basis-point arithmetic)
# =====================================================================


@register_staged(
    "weekday_seasonality_index",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2)))
                        * 100, 0) AS BIGINT) AS cents
            FROM orders GROUP BY 1
        ),
        tagged AS (
            -- weekday as integer days-since-a-known-Monday mod 7:
            -- engine-independent (dayofweek() numbering differs
            -- between engines/locales; date arithmetic does not)
            SELECT day, cents,
                   CAST(date_diff('day', DATE '1990-01-01', day) % 7
                        AS BIGINT) AS weekday
            FROM daily
        ),
        per AS (
            SELECT weekday,
                   CAST(count(*) AS BIGINT) AS n_days,
                   CAST(sum(cents) AS BIGINT) AS total_cents,
                   CAST(sum(cents) // count(*) AS BIGINT) AS mean_cents
            FROM tagged GROUP BY 1
        ),
        overall AS (
            SELECT CAST(sum(cents) // count(*) AS BIGINT) AS mu
            FROM tagged
        )
        SELECT p.weekday, p.n_days, p.total_cents, p.mean_cents,
               CAST(p.mean_cents * 10000 // o.mu AS BIGINT)
                   AS seasonality_bp
        FROM per p CROSS JOIN overall o
    """,
    tags=("analytics", "agg", "date"),
)
def weekday_seasonality_index(spark, sf_dir):
    """Weekday seasonality decomposition of daily revenue (the
    time-series profile behind staffing/capacity dashboards): per
    weekday, the mean daily revenue and its index against the overall
    daily mean in integer BASIS POINTS (mean·10000 // μ — no FP
    anywhere: exact DECIMAL cents and integer division). Weekday is
    days-since-a-known-Monday mod 7 — pure date arithmetic, because
    ``dayofweek()`` NUMBERING differs between engines (Spark 1=Sunday,
    DuckDB 0=Sunday) and is exactly the kind of silent divergence the
    dual-run exists to catch.

    Scale shape: one groupBy(day) partial aggregate at the scan, then
    7-row arithmetic."""
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(12,2)")) * 100, 0
            )
            .cast("long")
            .alias("cents")
        )
    )
    tagged = daily.select(
        "cents",
        F.pmod(
            F.datediff(F.col("day"), F.lit("1990-01-01").cast("date")), F.lit(7)
        )
        .cast("long")
        .alias("weekday"),
    )
    per = tagged.groupBy("weekday").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.expr("sum(cents) div count(*)").cast("long").alias("mean_cents"),
    )
    overall = tagged.agg(
        F.expr("sum(cents) div count(*)").cast("long").alias("mu")
    )
    return per.crossJoin(F.broadcast(overall)).select(
        "weekday",
        "n_days",
        "total_cents",
        "mean_cents",
        F.expr("(mean_cents * 10000) div mu").cast("long").alias(
            "seasonality_bp"
        ),
    )


# =====================================================================
# Top user-journey paths (sequence mining, bounded output)
# =====================================================================


@register_staged(
    "user_journey_paths",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS step
            FROM events
        ),
        paths AS (
            SELECT user_id,
                   string_agg(event_type, ' > ' ORDER BY step) AS path
            FROM seq WHERE step <= 3
            GROUP BY 1
        ),
        counted AS (
            SELECT path, CAST(count(*) AS BIGINT) AS n_users,
                   (SELECT count(*) FROM paths) AS total
            FROM paths GROUP BY 1
        )
        SELECT path, n_users,
               round(n_users / total, 6) AS share
        FROM counted
        ORDER BY n_users DESC, path
        LIMIT 20
    """,
    tags=("analytics", "sessionization", "topk"),
)
def user_journey_paths(spark, sf_dir):
    """Top user journeys (the sequence-mining complement to the
    transition matrix): each user's FIRST THREE events under the
    deterministic (ts, event_id) order concatenated into a path
    string, counted and ranked — the "how do users actually start"
    question. Counts exact, one rounded share division, top-20 with
    a total (n_users desc, path) order so the LIMIT is deterministic.

    Scale shape: one user-partitioned window (row_number, early-
    filtered to step ≤ 3), one concat-aggregate per user, one bounded
    path groupBy + top-k."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .withColumn("step", F.row_number().over(w))
        .filter(F.col("step") <= 3)
    )
    paths = seq.groupBy("user_id").agg(
        F.concat_ws(
            " > ", F.array_sort(F.collect_list(F.struct("step", "event_type")))
            .getField("event_type")
        ).alias("path")
    )
    total = paths.agg(F.count(F.lit(1)).alias("total"))
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .crossJoin(F.broadcast(total))
        .select(
            "path",
            "n_users",
            F.round(F.col("n_users") / F.col("total"), 6).alias("share"),
        )
        .orderBy(F.desc("n_users"), "path")
        .limit(20)
    )


# =====================================================================
# Per-user behavioral entropy (diversity of the event-type mix)
# =====================================================================


@register_staged(
    "user_activity_entropy",
    oracle="""
        WITH per AS (
            SELECT user_id, event_type,
                   CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        tot AS (
            SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS n_types
            FROM per GROUP BY 1
        )
        SELECT p.user_id,
               t.n AS n_events,
               t.n_types,
               round(-sum((p.c / t.n) * ln(p.c / t.n)), 6)
                   AS entropy_nats
        FROM per p JOIN tot t USING (user_id)
        GROUP BY 1, 2, 3
    """,
    tags=("analytics", "quality", "agg"),
)
def user_activity_entropy(spark, sf_dir):
    """Shannon entropy of each user's event-type mix (the behavioral-
    diversity feature of engagement models; also the standard
    feature-health check before one-hot-ing a categorical): per user,
    ``H = −Σ p·ln p`` over the type distribution, with counts exact
    and the transcendental part following the repo's bm25/ngram-LM
    discipline (ln on engine-identical operands, one rounded sum —
    round(6) absorbs the ulp divergence).

    Scale shape: two bounded groupBys (user × type, then user) and a
    |types|-wide sum per user — no windows, no joins beyond the
    per-user stats broadcast."""
    per = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    tot = per.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    p = F.col("c") / F.col("n_events")
    return (
        per.join(tot, "user_id")
        .groupBy("user_id", "n_events", "n_types")
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("entropy_nats"))
    )


# =====================================================================
# Largest-remainder exact proration (warehouse money-allocation staple)
# =====================================================================


@register_staged(
    "order_line_proration",
    oracle="""
        WITH w AS (
            SELECT l_orderkey, l_linenumber,
                   CAST(round(CAST(l_extendedprice AS DECIMAL(12,2)) * 100, 0)
                        AS BIGINT) AS w
            FROM lineitem
        ),
        t AS (
            SELECT o_orderkey, o_orderpriority,
                   CAST(round(CAST(o_totalprice AS DECIMAL(12,2)) * 100, 0)
                        AS BIGINT) AS t_cents
            FROM orders
        ),
        j AS (
            SELECT t.o_orderkey, t.o_orderpriority, t.t_cents,
                   w.l_linenumber, w.w,
                   sum(w.w) OVER (PARTITION BY t.o_orderkey) AS sw
            FROM t JOIN w ON w.l_orderkey = t.o_orderkey
        ),
        base AS (
            SELECT *,
                   (t_cents * w) // sw AS alloc0,
                   (t_cents * w) % sw AS rem,
                   row_number() OVER (
                       PARTITION BY o_orderkey
                       ORDER BY (t_cents * w) % sw DESC, l_linenumber
                   ) AS rnk
            FROM j
        ),
        lines AS (
            SELECT o_orderkey, o_orderpriority, t_cents,
                   alloc0 + CASE WHEN rnk <=
                       t_cents - sum(alloc0) OVER (PARTITION BY o_orderkey)
                       THEN 1 ELSE 0 END AS alloc
            FROM base
        ),
        per_order AS (
            SELECT o_orderkey, o_orderpriority,
                   max(t_cents) AS t_cents,
                   CAST(count(*) AS BIGINT) AS n_lines,
                   sum(alloc) AS alloc_cents
            FROM lines GROUP BY 1, 2
        )
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(n_lines) AS BIGINT) AS n_lines,
               CAST(sum(t_cents) AS BIGINT) AS total_cents,
               CAST(sum(alloc_cents) AS BIGINT) AS alloc_cents,
               min(alloc_cents = t_cents) AS all_orders_exact_ok
        FROM per_order GROUP BY 1
    """,
    tags=("analytics", "window", "money"),
)
def order_line_proration(spark, sf_dir):
    """Largest-remainder (Hamilton) proration of each order's total
    across its line items, weighted by line price — the exact-money
    allocation every billing/revenue-recognition warehouse job needs:
    floor shares ``(T·w_i) div ΣW`` first, then the leftover
    ``T − Σfloor`` cents go one each to the lines with the largest
    integer remainders (ties by line number). ALL-INTEGER: weights
    and totals are exact DECIMAL cents, shares are integer div/mod —
    no FP anywhere, so the per-order invariant ``Σalloc == T`` is a
    falsifiable boolean (min over orders) in both engines, not an
    epsilon test.

    Scale shape: two windows partitioned by the natural order key (no
    global sort) over the lineitem shuffle, then a 5-row groupBy; at
    100 TB this is one hash exchange of lineitem by orderkey — the
    same co-partitioning every order-grain job reuses."""
    w = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice").cast("decimal(12,2)") * 100, 0)
        .cast("long")
        .alias("w"),
    )
    t = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice").cast("decimal(12,2)") * 100, 0)
        .cast("long")
        .alias("t_cents"),
    )
    ow = Window.partitionBy("o_orderkey")
    j = t.join(w, t.o_orderkey == w.l_orderkey).select(
        "o_orderkey",
        "o_orderpriority",
        "t_cents",
        "l_linenumber",
        "w",
        F.sum("w").over(ow).alias("sw"),
    )
    prod = F.col("t_cents") * F.col("w")
    base = j.select(
        "o_orderkey",
        "o_orderpriority",
        "t_cents",
        "l_linenumber",
        F.expr("(t_cents * w) div sw").alias("alloc0"),
        (prod % F.col("sw")).alias("rem"),
        F.row_number()
        .over(ow.orderBy(F.desc((prod % F.col("sw"))), "l_linenumber"))
        .alias("rnk"),
    )
    lines = base.select(
        "o_orderkey",
        "o_orderpriority",
        "t_cents",
        (
            F.col("alloc0")
            + F.when(
                F.col("rnk") <= F.col("t_cents") - F.sum("alloc0").over(ow),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias("alloc"),
    )
    per_order = lines.groupBy("o_orderkey", "o_orderpriority").agg(
        F.max("t_cents").alias("t_cents"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("alloc").alias("alloc_cents"),
    )
    return per_order.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("n_lines").cast("long").alias("n_lines"),
        F.sum("t_cents").cast("long").alias("total_cents"),
        F.sum("alloc_cents").cast("long").alias("alloc_cents"),
        F.min(F.col("alloc_cents") == F.col("t_cents")).alias(
            "all_orders_exact_ok"
        ),
    )


# =====================================================================
# Gaps-and-islands: per-user contiguous activity-day runs
# =====================================================================


@register_staged(
    "user_activity_islands",
    oracle="""
        WITH days AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ),
        keyed AS (
            SELECT user_id, day,
                   date_diff('day', DATE '1970-01-01', day)
                       - row_number() OVER (
                           PARTITION BY user_id ORDER BY day) AS isl,
                   date_diff('day',
                             lag(day) OVER (
                                 PARTITION BY user_id ORDER BY day),
                             day) AS step
            FROM days
        ),
        islands AS (
            SELECT user_id, isl, CAST(count(*) AS BIGINT) AS run_days
            FROM keyed GROUP BY 1, 2
        )
        SELECT k.user_id,
               CAST(count(*) AS BIGINT) AS n_active_days,
               (SELECT CAST(count(*) AS BIGINT) FROM islands i
                WHERE i.user_id = k.user_id) AS n_islands,
               (SELECT CAST(max(run_days) AS BIGINT) FROM islands i
                WHERE i.user_id = k.user_id) AS longest_island_days,
               CAST(coalesce(max(step) - 1, 0) AS BIGINT) AS max_gap_days
        FROM keyed k GROUP BY 1
    """,
    tags=("analytics", "window", "sessionization"),
)
def user_activity_islands(spark, sf_dir):
    """Gaps-and-islands over each user's active DAYS (the classic
    warehouse run-length problem): distinct activity dates, island
    key = epoch-day − row_number (constant within a contiguous run),
    then per-user island count, longest streak, and the widest gap
    between consecutive active days. Every output is an integer day
    count — no timestamps cross the compare.

    Scale shape: the distinct-day reduction happens at the scan
    (groupBy user, day partial agg), then two windows partitioned by
    user over a ≤ users×days frame; no global sort, one exchange."""
    days = (
        _t(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    keyed = days.select(
        "user_id",
        "day",
        (
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
            - F.row_number().over(w)
        ).alias("isl"),
        F.datediff(F.col("day"), F.lag("day").over(w)).alias("step"),
    )
    islands = keyed.groupBy("user_id", "isl").agg(
        F.count(F.lit(1)).cast("long").alias("run_days")
    )
    per_user = keyed.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_active_days"),
        F.coalesce(F.max("step") - 1, F.lit(0)).cast("long").alias(
            "max_gap_days"
        ),
    )
    isl_stats = islands.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.max("run_days").cast("long").alias("longest_island_days"),
    )
    return per_user.join(isl_stats, "user_id").select(
        "user_id",
        "n_active_days",
        "n_islands",
        "longest_island_days",
        "max_gap_days",
    )


# =====================================================================
# Sweep-line peak concurrency over per-user activity intervals
# =====================================================================


@register_staged(
    "peak_concurrent_activity",
    oracle="""
        WITH iv AS (
            SELECT event_type, user_id,
                   min(epoch_us(ts)) AS s, max(epoch_us(ts)) AS e
            FROM events GROUP BY 1, 2
        ),
        pts AS (
            SELECT event_type, user_id, s AS t, 1 AS d FROM iv
            UNION ALL
            SELECT event_type, user_id, e AS t, -1 AS d FROM iv
        ),
        sweep AS (
            SELECT event_type, t, d,
                   sum(d) OVER (
                       PARTITION BY event_type
                       ORDER BY t, d DESC, user_id
                       ROWS UNBOUNDED PRECEDING) AS running
            FROM pts
        ),
        peak AS (
            SELECT event_type, CAST(max(running) AS BIGINT) AS peak
            FROM sweep GROUP BY 1
        )
        SELECT p.event_type,
               (SELECT CAST(count(*) AS BIGINT) FROM iv
                WHERE iv.event_type = p.event_type) AS n_intervals,
               p.peak AS peak_concurrency,
               (SELECT CAST(min(t) AS BIGINT) FROM sweep s
                WHERE s.event_type = p.event_type
                  AND s.running = p.peak) AS first_peak_us
        FROM peak p
    """,
    tags=("analytics", "window", "sessionization"),
)
def peak_concurrent_activity(spark, sf_dir):
    """Sweep-line maximum concurrency (the classic interval-overlap
    reduction — 'peak simultaneous sessions'): each (event_type,
    user) pair contributes the activity interval [first ts, last ts];
    the sweep explodes ±1 endpoint deltas and takes a running sum
    under the TOTAL order (t, starts-before-ends, user) — touching
    intervals count as concurrent, and the order makes the running
    series engine-identical. Peak and its first-reached time are
    exact integers (µs).

    Scale shape: the interval build is one partial-agg groupBy at the
    scan; the sweep window partitions by event_type over 2×intervals
    rows — never the raw event stream. At 100 TB a single global
    sweep would serialize one partition; the per-type partitioning is
    the parallelism, and a finer sweep (per day) composes the same
    way."""
    # eager checkpoint: iv feeds three branches (starts, ends, counts)
    # — without it each branch re-scans the raw event stream; with it
    # the corpus is read ONCE and the bounded users×types interval
    # table is what fans out (the repo's localCheckpoint discipline)
    iv = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(
            F.min(F.unix_micros("ts")).alias("s"),
            F.max(F.unix_micros("ts")).alias("e"),
        )
        .localCheckpoint(eager=True)
    )
    pts = iv.select(
        "event_type", "user_id", F.col("s").alias("t"), F.lit(1).alias("d")
    ).unionByName(
        iv.select(
            "event_type",
            "user_id",
            F.col("e").alias("t"),
            F.lit(-1).alias("d"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("t"), F.desc("d"), F.col("user_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wmax = Window.partitionBy("event_type")
    sweep = pts.select(
        "event_type", "t", "d", F.sum("d").over(w).alias("running")
    ).withColumn("peak", F.max("running").over(wmax))
    n_iv = iv.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals")
    )
    stats = (
        sweep.filter(F.col("running") == F.col("peak"))
        .groupBy("event_type")
        .agg(
            F.max("peak").cast("long").alias("peak_concurrency"),
            F.min("t").cast("long").alias("first_peak_us"),
        )
    )
    return n_iv.join(stats, "event_type").select(
        "event_type", "n_intervals", "peak_concurrency", "first_peak_us"
    )


# =====================================================================
# Pareto / ABC inventory classification by cumulative revenue share
# =====================================================================


@register_staged(
    "pareto_abc_parts",
    oracle="""
        WITH rev AS (
            SELECT l_partkey,
                   CAST(sum(CAST(round(
                       CAST(l_extendedprice AS DECIMAL(12,2))
                       * CAST(1 - l_discount AS DECIMAL(4,2)) * 10000, 0)
                       AS BIGINT)) AS BIGINT) AS r
            FROM lineitem GROUP BY 1
        ),
        ranked AS (
            SELECT l_partkey, r,
                   sum(r) OVER (ORDER BY r DESC, l_partkey) AS cum,
                   sum(r) OVER () AS tot
            FROM rev
        ),
        classed AS (
            SELECT *,
                   CASE WHEN cum * 10 <= tot * 7 THEN 'A'
                        WHEN cum * 10 <= tot * 9 THEN 'B'
                        ELSE 'C' END AS cls
            FROM ranked
        )
        SELECT cls,
               CAST(count(*) AS BIGINT) AS n_parts,
               CAST(sum(r) AS BIGINT) AS class_rev,
               CAST((sum(r) * 10000) // max(tot) AS BIGINT) AS share_bp,
               CAST(max(cum) AS BIGINT) AS cum_at_class_end
        FROM classed GROUP BY 1
    """,
    tags=("analytics", "window", "money"),
)
def pareto_abc_parts(spark, sf_dir):
    """ABC (Pareto) classification of parts by cumulative revenue
    share — the inventory-management staple: parts ranked by exact
    discounted revenue, class A = the head up to 70% of total
    revenue, B to 90%, C the tail. Revenue is EXACT integer
    DECIMAL(12,2)×DECIMAL(4,2) arithmetic at 1e-4 scale, the class
    boundaries are integer cross-multiplications (cum·10 ≤ tot·7) —
    no division, no FP, so class membership is bit-identical across
    engines. Share in integer basis points.

    Scale shape: the per-part revenue is a partial-agg groupBy; the
    running share is ``quantiles.distributed_cumsum`` over the PART
    domain — range exchange + per-partition cumulative sums +
    broadcast partition-total offsets, NOT the single-partition
    global window (the first cut measured 5.8x on the sf1->sf10
    decade). The oracle's serial window computes the identical
    inclusive running sum."""
    # eager checkpoint: rev feeds the global total AND the cumsum —
    # one lineitem scan, the bounded part-domain table fans out
    rev = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice").cast("decimal(12,2)")
                    * (F.lit(1) - F.col("l_discount")).cast("decimal(4,2)")
                    * 10000,
                    0,
                ).cast("long")
            )
            .cast("long")
            .alias("r")
        )
        .localCheckpoint(eager=True)
    )
    # distributed running share: the first cut used the single-
    # partition global window (measured 5.8x on the sf1->sf10 decade);
    # distributed_cumsum range-exchanges the PART domain instead
    tot1 = rev.agg(F.sum("r").cast("long").alias("tot"))
    ranked = QT.distributed_cumsum(
        rev, [F.desc("r"), "l_partkey"], "r", "cum"
    ).crossJoin(F.broadcast(tot1))
    # DECIMAL(38,0) for the cross-multiplications: cum·10 / tot·7 and
    # sum(r)·10000 overflow BIGINT once total 1e-4-scale revenue
    # passes ~9.2e14 (the sf1 relational fixture tripped ANSI
    # overflow — caught by scale_check, round 12). DuckDB's BIGINT
    # sums are HUGEINT so the oracle was already exact.
    d38 = lambda c: F.col(c).cast("decimal(38,0)")
    classed = ranked.select(
        "r",
        "cum",
        "tot",
        F.when(d38("cum") * 10 <= d38("tot") * 7, F.lit("A"))
        .when(d38("cum") * 10 <= d38("tot") * 9, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("cls"),
    )
    return classed.groupBy("cls").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("r").cast("long").alias("class_rev"),
        F.expr(
            "CAST((CAST(sum(r) AS DECIMAL(38,0)) * 10000)"
            " div CAST(max(tot) AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("share_bp"),
        F.max("cum").cast("long").alias("cum_at_class_end"),
    )


# =====================================================================
# Bigram PMI (collocation mining over the corpus token stream)
# =====================================================================

_PMI_MIN_COUNT = 5
_PMI_TOPK = 20


@register_staged(
    "bigram_pmi_topk",
    oracle=f"""
        WITH toks AS (
            SELECT list_filter(string_split(text, ' '), x -> x <> '') AS l
            FROM documents
        ),
        pairs AS (
            SELECT unnest(list_transform(range(1, len(l)),
                                         i -> l[i])) AS x,
                   unnest(list_transform(range(1, len(l)),
                                         i -> l[i + 1])) AS y
            FROM toks WHERE len(l) >= 2
        ),
        big AS (
            SELECT x, y, CAST(count(*) AS BIGINT) AS n_xy
            FROM pairs GROUP BY 1, 2
        ),
        firsts AS (SELECT x, sum(n_xy) AS n_x FROM big GROUP BY 1),
        seconds AS (SELECT y, sum(n_xy) AS n_y FROM big GROUP BY 1),
        tot AS (SELECT sum(n_xy) AS n FROM big),
        scored AS (
            SELECT b.x || ' ' || b.y AS pair, b.n_xy,
                   CAST(f.n_x AS BIGINT) AS n_x,
                   CAST(s.n_y AS BIGINT) AS n_y,
                   round(ln(CAST(b.n_xy * t.n AS DOUBLE)
                            / CAST(f.n_x * s.n_y AS DOUBLE)), 4) AS pmi
            FROM big b, tot t
            JOIN firsts f ON f.x = b.x
            JOIN seconds s ON s.y = b.y
            WHERE b.n_xy >= {_PMI_MIN_COUNT}
        )
        SELECT pair, n_xy, n_x, n_y, pmi
        FROM scored
        ORDER BY pmi DESC, pair LIMIT {_PMI_TOPK}
    """,
    tags=("text", "llm-pipeline", "topk"),
)
def bigram_pmi_topk(spark, sf_dir):
    """Pointwise mutual information of adjacent token pairs — the
    collocation-mining pass an LLM-corpus pipeline runs to find
    multi-word expressions worth protecting from tokenizer splits.
    Probabilities come from the bigram table itself (p(x·), p(·y),
    p(xy) over N bigram positions), so every PMI input is an exact
    integer count; the single transcendental ln rounds to 4 dp before
    ranking with pair-text tie-breaks (the bm25 discipline). The
    ≥{mc}-count floor keeps one-off juxtapositions out.

    Scale shape: pairs are built row-locally (two shifted slices
    zipped — the bpe_pair_stats shape, no posexplode blowup); the
    marginals are two groupBys OVER THE BIGRAM TABLE (vocab² bound,
    not corpus bound) re-joined on the bigram keys; the cut is
    TakeOrderedAndProject.""".format(mc=_PMI_MIN_COUNT)
    d = _t(spark, sf_dir, "documents")
    toked = d.select(
        F.filter(F.split("text", " "), lambda x: x != "").alias("l")
    )
    length = F.greatest(F.size("l") - F.lit(1), F.lit(0))
    pairs = toked.select(
        F.explode(
            F.arrays_zip(
                F.slice("l", 1, length).alias("x"),
                F.slice(F.col("l"), 2, length).alias("y"),
            )
        ).alias("p")
    ).select(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
    # eager checkpoint: the bigram table feeds four branches (both
    # marginals, the total, and the scored join) — without it each
    # branch re-scans the corpus and re-explodes the pairs; with it
    # the corpus is tokenized ONCE and the vocab²-bounded count table
    # is what fans out
    big = (
        pairs.groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("n_xy"))
        .localCheckpoint(eager=True)
    )
    firsts = big.groupBy("x").agg(F.sum("n_xy").alias("n_x"))
    seconds = big.groupBy("y").agg(F.sum("n_xy").alias("n_y"))
    tot = big.agg(F.sum("n_xy").alias("n"))
    scored = (
        big.filter(F.col("n_xy") >= _PMI_MIN_COUNT)
        .join(firsts, "x")
        .join(seconds, "y")
        .crossJoin(F.broadcast(tot))
        .select(
            F.concat_ws(" ", "x", "y").alias("pair"),
            "n_xy",
            F.col("n_x").cast("long").alias("n_x"),
            F.col("n_y").cast("long").alias("n_y"),
            F.round(
                F.log(
                    (F.col("n_xy") * F.col("n")).cast("double")
                    / (F.col("n_x") * F.col("n_y")).cast("double")
                ),
                4,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "pair").limit(_PMI_TOPK)


# =====================================================================
# Round-14 pre-builds (the r13 batch above fills the next promotion
# window; these wait their turn, fully verified at build time)
# =====================================================================

from ..operators.quantiles import hash_coin  # noqa: E402


@register_staged(
    "stratified_split_exact",
    oracle="""
        WITH n_by AS (
            SELECT lang, CAST(count(*) AS BIGINT) AS n
            FROM documents GROUP BY 1
        ),
        splits AS (
            SELECT * FROM (VALUES ('train', 1, 8), ('val', 2, 1),
                                  ('test', 3, 1)) s(split, sid, w)
        ),
        alloc0 AS (
            SELECT lang, n, split, sid, w,
                   (n * w) // 10 AS base, (n * w) % 10 AS rem
            FROM n_by CROSS JOIN splits
        ),
        alloc AS (
            SELECT *,
                   base + CASE WHEN row_number() OVER (
                       PARTITION BY lang ORDER BY rem DESC, sid)
                       <= n - sum(base) OVER (PARTITION BY lang)
                       THEN 1 ELSE 0 END AS n_target
            FROM alloc0
        ),
        bounds AS (
            SELECT lang, split, n_target,
                   sum(n_target) OVER (
                       PARTITION BY lang ORDER BY sid
                       ROWS UNBOUNDED PRECEDING) AS cum
            FROM alloc
        ),
        ranked AS (
            SELECT lang, doc_id,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY CAST('0x' || substr(md5(
                           CAST(doc_id AS VARCHAR) || ':split'), 1, 5)
                           AS BIGINT), doc_id) AS rk
            FROM documents
        )
        SELECT b.lang, b.split, b.n_target,
               CAST(count(r.doc_id) AS BIGINT) AS n_docs,
               CAST(coalesce(sum(r.doc_id), 0) AS BIGINT) AS docid_sum,
               CAST(count(r.doc_id) AS BIGINT) = b.n_target
                   AS exact_count_ok
        FROM bounds b LEFT JOIN ranked r
          ON r.lang = b.lang
         AND r.rk > b.cum - b.n_target AND r.rk <= b.cum
        GROUP BY 1, 2, 3, b.cum
    """,
    tags=("llm-pipeline", "sampling", "window"),
)
def stratified_split_exact(spark, sf_dir):
    """Stratified 80/10/10 train/val/test split with EXACT per-stratum
    counts: per language the Hamilton (largest-remainder) targets are
    computed over the (split × weight) frame with the same integer
    div/mod/rank shape as order_line_proration, then documents are
    ranked by a deterministic md5 coin and sliced at the cumulative
    boundaries. Unlike rand()-seeded splits, MEMBERSHIP is a pure
    function of doc_id — the per-(lang, split) doc_id SUM crosses the
    engine compare, pinning the exact assignment, not just the
    counts; exact_count_ok pins the Hamilton targets.

    Scale shape: one rank window per stratum partition + a broadcast
    of the 3-row split table; the slice is a range predicate on the
    rank — one shuffle of (lang, coin) pairs at any corpus size."""
    docs = _t(spark, sf_dir, "documents").select("lang", "doc_id")
    n_by = docs.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n"))
    splits = spark.createDataFrame(
        [("train", 1, 8), ("val", 2, 1), ("test", 3, 1)],
        ["split", "sid", "w"],
    )
    lw = Window.partitionBy("lang")
    alloc0 = n_by.crossJoin(F.broadcast(splits)).select(
        "lang",
        "n",
        "split",
        "sid",
        "w",
        F.expr("(n * w) div 10").alias("base"),
        ((F.col("n") * F.col("w")) % 10).alias("rem"),
    )
    alloc = alloc0.select(
        "lang",
        "split",
        "sid",
        (
            F.col("base")
            + F.when(
                F.row_number().over(lw.orderBy(F.desc("rem"), "sid"))
                <= F.col("n") - F.sum("base").over(lw),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias("n_target"),
    )
    bounds = alloc.select(
        "lang",
        "split",
        "n_target",
        F.sum("n_target")
        .over(lw.orderBy("sid").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    ranked = docs.select(
        "lang",
        "doc_id",
        F.row_number()
        .over(lw.orderBy(hash_coin(F.col("doc_id"), ":split"), "doc_id"))
        .alias("rk"),
    )
    joined = bounds.alias("bd").join(
        ranked.alias("r"),
        (F.col("r.lang") == F.col("bd.lang"))
        & (F.col("r.rk") > F.col("bd.cum") - F.col("bd.n_target"))
        & (F.col("r.rk") <= F.col("bd.cum")),
        "left",
    )
    return (
        joined.groupBy(
            F.col("bd.lang").alias("lang"),
            F.col("bd.split").alias("split"),
            F.col("bd.n_target").alias("n_target"),
            F.col("bd.cum"),
        )
        .agg(
            F.count(F.col("r.doc_id")).cast("long").alias("n_docs"),
            F.coalesce(F.sum(F.col("r.doc_id")), F.lit(0))
            .cast("long")
            .alias("docid_sum"),
            (
                F.count(F.col("r.doc_id")).cast("long")
                == F.max(F.col("bd.n_target"))
            ).alias("exact_count_ok"),
        )
        .drop("cum")
    )


# =====================================================================
# Last-touch attribution (marketing-analytics staple)
# =====================================================================


@register_staged(
    "attribution_last_touch",
    oracle="""
        WITH attributed AS (
            SELECT coalesce(
                       last_value(CASE WHEN event_type <> 'purchase'
                                       THEN event_type END IGNORE NULLS)
                           OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING),
                       '(none)') AS channel,
                   event_type
            FROM events
        ),
        p AS (SELECT channel FROM attributed
              WHERE event_type = 'purchase'),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM p)
        SELECT channel,
               CAST(count(*) AS BIGINT) AS n_purchases,
               CAST((count(*) * 10000) // max(t.n) AS BIGINT) AS share_bp,
               max(t.n) AS total_purchases
        FROM p, tot t GROUP BY 1
    """,
    tags=("analytics", "window", "sessionization"),
)
def attribution_last_touch(spark, sf_dir):
    """Last-touch channel attribution: each purchase is credited to
    the user's most recent PRECEDING non-purchase event type (the
    classic marketing-attribution rule), '(none)' when the purchase
    is the user's first event. The window is last_value IGNORE NULLS
    over rows strictly before the current one under the total
    (ts, event_id) order — engine-identical. Outputs are exact
    counts + integer-basis-point shares.

    Scale shape: one window partitioned by the natural user key over
    the event stream, then a ≤|event types|-row groupBy — one
    exchange, no self-joins."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    attributed = _t(spark, sf_dir, "events").select(
        "event_type",
        F.coalesce(
            F.last(
                F.when(
                    F.col("event_type") != "purchase", F.col("event_type")
                ),
                ignorenulls=True,
            ).over(w),
            F.lit("(none)"),
        ).alias("channel"),
    )
    p = attributed.filter(F.col("event_type") == "purchase").select("channel")
    tot = p.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        p.groupBy("channel")
        .agg(F.count(F.lit(1)).cast("long").alias("n_purchases"))
        .crossJoin(F.broadcast(tot))
        .select(
            "channel",
            "n_purchases",
            F.expr("(n_purchases * 10000) div n").cast("long").alias(
                "share_bp"
            ),
            F.col("n").alias("total_purchases"),
        )
    )


# =====================================================================
# WOE / IV feature audit over value deciles (feature-engineering)
# =====================================================================


@register_staged(
    "woe_iv_value_deciles",
    oracle="""
        WITH lab AS (
            SELECT CAST(value AS DOUBLE) AS v, event_id,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS pos
            FROM events
        ),
        dec AS (
            -- floor-rank deciles (the gini discipline), NOT ntile:
            -- the engine computes the rank DISTRIBUTED (range
            -- exchange + partition offsets) and the floor formula is
            -- a pure function of (rank, n) both engines share
            SELECT pos,
                   ((row_number() OVER (ORDER BY v, event_id) - 1) * 10)
                       // (count(*) OVER ()) + 1 AS decile
            FROM lab
        ),
        per AS (
            SELECT decile,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(pos) AS BIGINT) AS n_pos,
                   CAST(count(*) - sum(pos) AS BIGINT) AS n_neg
            FROM dec GROUP BY 1
        ),
        tot AS (
            SELECT CAST(sum(n_pos) AS BIGINT) AS p,
                   CAST(sum(n_neg) AS BIGINT) AS q
            FROM per
        )
        SELECT CAST(decile AS BIGINT) AS decile, n, n_pos, n_neg,
               CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                   round(ln(CAST(n_pos * t.q AS DOUBLE)
                            / CAST(n_neg * t.p AS DOUBLE)), 4)
               END AS woe
        FROM per, tot t
    """,
    tags=("analytics", "quantile", "llm-pipeline"),
)
def woe_iv_value_deciles(spark, sf_dir):
    """Weight-of-evidence audit of the event value against the
    purchase label over exact deciles — the credit-scoring /
    feature-engineering primitive: floor-rank deciles under the total
    (value, event_id) order, exact positive/negative counts per
    decile, WOE = ln(n_pos·N / n_neg·P) on pure-integer inputs with
    one transcendental rounded to 4 dp (the bm25 discipline).
    Zero-count deciles yield NULL woe rather than ±inf (DuckDB's
    ln(0) raises; the guard is the contract).

    Scale shape: the rank is ``quantiles.distributed_rank`` — a range
    exchange + per-partition row_number + broadcast partition offsets
    — NOT the single-partition global window (the first cut used
    ntile and measured 14.5× on the sf1→sf10 decade; this shape
    re-measured 2.0×). The oracle's serial row_number produces the
    identical total-order rank."""
    lab = _t(spark, sf_dir, "events").select(
        F.col("value").cast("double").alias("v"),
        "event_id",
        (F.col("event_type") == "purchase").cast("int").alias("pos"),
    )
    n1 = lab.agg(F.count(F.lit(1)).alias("n_all"))
    dec = (
        QT.distributed_rank(lab, ["v", "event_id"], "rk")
        .crossJoin(F.broadcast(n1))
        .select(
            "pos",
            (
                F.expr("((rk - 1) * 10) div n_all") + 1
            ).alias("decile"),
        )
    )
    per = dec.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pos").cast("long").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("pos")).cast("long").alias("n_neg"),
    )
    tot = per.agg(
        F.sum("n_pos").cast("long").alias("p"),
        F.sum("n_neg").cast("long").alias("q"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        F.col("decile").cast("long").alias("decile"),
        "n",
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(
                F.log(
                    (F.col("n_pos") * F.col("q")).cast("double")
                    / (F.col("n_neg") * F.col("p")).cast("double")
                ),
                4,
            ),
        ).alias("woe"),
    )


# =====================================================================
# Market-basket association rules (co-purchase support/confidence/lift)
# =====================================================================

_MBA_MIN_SUPPORT = 3
_MBA_TOPK = 20


@register_staged(
    "basket_association_rules",
    oracle=f"""
        WITH items AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS item
            FROM lineitem
        ),
        n_baskets AS (
            SELECT CAST(count(DISTINCT ok) AS BIGINT) AS nb FROM items
        ),
        pairs AS (
            SELECT a.item AS x, b.item AS y,
                   CAST(count(*) AS BIGINT) AS n_xy
            FROM items a JOIN items b
              ON a.ok = b.ok AND a.item < b.item
            GROUP BY 1, 2 HAVING count(*) >= {_MBA_MIN_SUPPORT}
        ),
        freq AS (
            SELECT item, CAST(count(*) AS BIGINT) AS nf FROM items
            GROUP BY 1
        )
        SELECT p.x, p.y, p.n_xy,
               fx.nf AS n_x, fy.nf AS n_y,
               CAST((p.n_xy * 10000) // b.nb AS BIGINT) AS support_bp,
               CAST((p.n_xy * 10000) // fx.nf AS BIGINT) AS conf_x_bp,
               round(CAST(p.n_xy * b.nb AS DOUBLE)
                     / CAST(fx.nf * fy.nf AS DOUBLE), 4) AS lift
        FROM pairs p
        JOIN freq fx ON fx.item = p.x
        JOIN freq fy ON fy.item = p.y
        CROSS JOIN n_baskets b
        ORDER BY lift DESC, x, y LIMIT {_MBA_TOPK}
    """,
    tags=("analytics", "topk", "join"),
)
def basket_association_rules(spark, sf_dir):
    """Association-rule mining over co-purchase baskets (the retail
    analytics classic): per part pair in the same order, support /
    confidence in integer basis points and lift = n_xy·N / (n_x·n_y)
    — integer products, ONE IEEE division (bit-stable), rounded 4 dp
    before the (lift, x, y) rank. The ≥{ms}-basket support floor
    prunes noise pairs before the marginal joins.

    Scale shape: the pair generation is a SELF-JOIN CO-PARTITIONED on
    the basket key (one shuffle of the item list; within-basket
    expansion is bounded by basket size², ≤ ~21 rows per TPC-H
    order); marginals group over the item domain; the cut is
    TakeOrderedAndProject.""".format(ms=_MBA_MIN_SUPPORT)
    items = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("item"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nb = items.agg(F.count_distinct("ok").cast("long").alias("nb"))
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.ok") == F.col("b.ok"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("x"), F.col("b.item").alias("y"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_xy"))
        .filter(F.col("n_xy") >= _MBA_MIN_SUPPORT)
    )
    freq = items.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("nf")
    )
    fx = freq.select(F.col("item").alias("x"), F.col("nf").alias("n_x"))
    fy = freq.select(F.col("item").alias("y"), F.col("nf").alias("n_y"))
    out = (
        pairs.join(fx, "x")
        .join(fy, "y")
        .crossJoin(F.broadcast(nb))
        .select(
            "x",
            "y",
            "n_xy",
            "n_x",
            "n_y",
            F.expr("(n_xy * 10000) div nb").cast("long").alias("support_bp"),
            F.expr("(n_xy * 10000) div n_x").cast("long").alias("conf_x_bp"),
            F.round(
                (F.col("n_xy") * F.col("nb")).cast("double")
                / (F.col("n_x") * F.col("n_y")).cast("double"),
                4,
            ).alias("lift"),
        )
    )
    return out.orderBy(F.desc("lift"), "x", "y").limit(_MBA_TOPK)


# =====================================================================
# Canonical selection inside exact-duplicate clusters (dedup keep-rule)
# =====================================================================

_CANON_PLANT_OFFSET = 100_000_000


@register_staged(
    "dedup_canonical_selection",
    oracle=f"""
        WITH corpus AS (
            SELECT doc_id, lang, text, n_chars FROM documents
            UNION ALL
            SELECT doc_id + {_CANON_PLANT_OFFSET}, lang, text, n_chars
            FROM documents WHERE doc_id % 17 = 0
        ),
        hashed AS (
            SELECT doc_id, lang, n_chars, md5(text) AS digest FROM corpus
        ),
        clusters AS (
            SELECT digest FROM hashed GROUP BY 1 HAVING count(*) > 1
        ),
        members AS (
            SELECT h.* FROM hashed h JOIN clusters c USING (digest)
        ),
        keep AS (
            SELECT digest, lang, doc_id, n_chars,
                   row_number() OVER (
                       PARTITION BY digest
                       ORDER BY n_chars DESC, doc_id) AS rk
            FROM members
        )
        SELECT lang,
               CAST(count(DISTINCT digest) AS BIGINT) AS n_clusters,
               CAST(count(*) AS BIGINT) AS n_cluster_docs,
               CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_kept,
               CAST(sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dropped,
               min(CASE WHEN rk = 1
                        THEN doc_id < {_CANON_PLANT_OFFSET} END)
                   AS all_kept_are_originals
        FROM keep GROUP BY 1
    """,
    tags=("dedup", "text", "llm-pipeline"),
)
def dedup_canonical_selection(spark, sf_dir):
    """The KEEP-rule half of exact dedup — which document survives a
    duplicate cluster: every 17th doc is re-planted with a shifted id
    (same text), clusters form on the md5 digest, and the canonical
    member is the (longest, then lowest-id) row. Falsifiable: the
    planted copy can never win (same length, higher id), so
    all_kept_are_originals must hold in both engines; cluster /
    member / kept / dropped counts per language cross the compare.

    Scale shape: digest groupBy (the dedup_exact shape) + one window
    partitioned by digest over CLUSTER MEMBERS only — the keep-rule
    never touches unique documents."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", "n_chars"
    )
    planted = d.filter(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + _CANON_PLANT_OFFSET).alias("doc_id"),
        "lang",
        "text",
        "n_chars",
    )
    hashed = (
        d.unionByName(planted)
        .select("doc_id", "lang", "n_chars", F.md5("text").alias("digest"))
    )
    clusters = (
        hashed.groupBy("digest")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .select("digest")
    )
    members = hashed.join(clusters, "digest")
    keep = members.select(
        "digest",
        "lang",
        "doc_id",
        F.row_number()
        .over(
            Window.partitionBy("digest").orderBy(F.desc("n_chars"), "doc_id")
        )
        .alias("rk"),
    )
    return keep.groupBy("lang").agg(
        F.count_distinct("digest").cast("long").alias("n_clusters"),
        F.count(F.lit(1)).cast("long").alias("n_cluster_docs"),
        F.sum((F.col("rk") == 1).cast("long")).cast("long").alias("n_kept"),
        F.sum((F.col("rk") > 1).cast("long")).cast("long").alias("n_dropped"),
        F.min(
            F.when(
                F.col("rk") == 1, F.col("doc_id") < _CANON_PLANT_OFFSET
            )
        ).alias("all_kept_are_originals"),
    )


# =====================================================================
# Record linkage: blocked fuzzy match with planted typos
# =====================================================================

_RL_OFFSET = 1_000_000


@register_staged(
    "record_linkage_fuzzy_parts",
    oracle=f"""
        WITH names AS (
            SELECT p_name AS name, min(p_partkey) AS id
            FROM part GROUP BY 1
        ),
        dirty AS (
            -- deterministic typo: drop the 3rd character
            SELECT substr(name, 1, 2) || substr(name, 4) AS name,
                   id + {_RL_OFFSET} AS id, id AS src_id
            FROM names WHERE id % 7 = 0 AND length(name) >= 5
        ),
        cand AS (
            SELECT d.id AS dirty_id, d.src_id, n.id AS clean_id,
                   levenshtein(d.name, n.name) AS dist
            FROM dirty d JOIN names n
              ON substr(d.name, 1, 2) = substr(n.name, 1, 2)
        ),
        matches AS (SELECT * FROM cand WHERE dist <= 2)
        SELECT
            (SELECT CAST(count(*) AS BIGINT) FROM dirty) AS n_planted,
            (SELECT CAST(count(*) AS BIGINT) FROM names) AS n_clean,
            (SELECT CAST(count(*) AS BIGINT) FROM cand)
                AS n_candidate_pairs,
            (SELECT CAST(count(*) AS BIGINT) FROM matches) AS n_matches,
            (SELECT CAST(count(*) AS BIGINT) FROM matches
             WHERE clean_id = src_id) AS n_source_hits,
            (SELECT count(*) FROM matches WHERE clean_id = src_id)
                = (SELECT count(*) FROM dirty) AS recall_ok
    """,
    tags=("dedup", "join", "text"),
)
def record_linkage_fuzzy_parts(spark, sf_dir):
    """Record linkage / entity resolution over a dirty dimension: a
    deterministic typo (3rd character dropped) is planted into every
    7th distinct part name, then blocked fuzzy matching recovers the
    source — block on the first two characters (invariant under the
    deletion), candidate pairs scored with Levenshtein (classic DP,
    integer-identical across engines), match at distance ≤ 2.
    Falsifiable: a 1-deletion typo has distance exactly 1 to its
    source and shares its block, so recall_ok (every planted row
    links back) must hold; candidate/match/natural-near-pair counts
    cross the compare.

    Scale shape: entity DICTIONARIES are small (64 distinct names
    here; dictionaries stay ≪ fact tables at any SF) — the design
    that scales is the block-key equi-join bounding the quadratic
    verify to within-block pairs, exactly the MinHash-band shape for
    strings too short to shingle."""
    names = (
        _t(spark, sf_dir, "part")
        .groupBy(F.col("p_name").alias("name"))
        .agg(F.min("p_partkey").alias("id"))
        .localCheckpoint(eager=True)
    )
    dirty = names.filter(
        (F.col("id") % 7 == 0) & (F.length("name") >= 5)
    ).select(
        F.concat(
            F.substring("name", 1, 2), F.expr("substr(name, 4)")
        ).alias("name"),
        (F.col("id") + _RL_OFFSET).alias("id"),
        F.col("id").alias("src_id"),
    )
    cand = dirty.alias("d").join(
        names.alias("n"),
        F.substring(F.col("d.name"), 1, 2)
        == F.substring(F.col("n.name"), 1, 2),
    ).select(
        F.col("d.id").alias("dirty_id"),
        F.col("d.src_id").alias("src_id"),
        F.col("n.id").alias("clean_id"),
        F.levenshtein(F.col("d.name"), F.col("n.name")).alias("dist"),
    )
    matches = cand.filter(F.col("dist") <= 2)
    n_planted = dirty.agg(F.count(F.lit(1)).cast("long").alias("n_planted"))
    n_clean = names.agg(F.count(F.lit(1)).cast("long").alias("n_clean"))
    n_cand = cand.agg(
        F.count(F.lit(1)).cast("long").alias("n_candidate_pairs")
    )
    m = matches.agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.sum((F.col("clean_id") == F.col("src_id")).cast("long"))
        .cast("long")
        .alias("n_source_hits"),
    )
    return (
        n_planted.crossJoin(n_clean)
        .crossJoin(n_cand)
        .crossJoin(m)
        .select(
            "n_planted",
            "n_clean",
            "n_candidate_pairs",
            "n_matches",
            "n_source_hits",
            (F.col("n_source_hits") == F.col("n_planted")).alias(
                "recall_ok"
            ),
        )
    )


# =====================================================================
# Interpolated-percentile parity (built-in aggregate cross-engine)
# =====================================================================


@register_staged(
    "percentile_cont_quartiles",
    oracle="""
        WITH q AS (
            SELECT l_returnflag,
                   CAST(count(*) AS BIGINT) AS n,
                   quantile_cont(CAST(l_quantity AS DOUBLE),
                                 [0.25, 0.5, 0.75]) AS qs
            FROM lineitem GROUP BY 1
        )
        SELECT l_returnflag, n,
               qs[1] AS q25, qs[2] AS q50, qs[3] AS q75
        FROM q
    """,
    tags=("quantile", "analytics"),
)
def percentile_cont_quartiles(spark, sf_dir):
    """Linear-interpolated quartiles of an integer-valued measure per
    group, via the BUILT-IN exact percentile aggregate on both
    engines (Spark ``percentile`` == DuckDB ``quantile_cont``, both
    defined as rank h = (n−1)·q with linear interpolation). On an
    integer-valued DOUBLE column with q ∈ {{¼, ½, ¾}} every
    interpolation is exact binary arithmetic — the values cross the
    hash compare UNROUNDED, pinning that the two engines implement
    the same estimator definition bit-for-bit.

    Scale note: the exact percentile sorts within each group — the
    calibration arm. At 100 TB the production path is
    approx_percentile / the sampled_quantiles operator; this entry
    pins the definition they converge to."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(
            "percentile(CAST(l_quantity AS DOUBLE), array(0.25D, 0.5D, 0.75D))"
        ).alias("qs"),
    ).select(
        "l_returnflag",
        "n",
        F.col("qs")[0].alias("q25"),
        F.col("qs")[1].alias("q50"),
        F.col("qs")[2].alias("q75"),
    )


# =====================================================================
# Seasonal-naive forecast backtest (planted weekly seasonality)
# =====================================================================

_SNB_ANCHOR = "1995-01-02"  # a Monday; weekday = days-since mod 7


@register_staged(
    "seasonal_naive_backtest",
    oracle=f"""
        WITH daily0 AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2)))
                        * 100, 0) AS BIGINT) AS cents
            FROM orders GROUP BY 1
        ),
        daily AS (
            -- plant weekly seasonality: weekend days x2 (the signal
            -- the lag-7 forecaster must exploit and lag-1 must not)
            SELECT day,
                   CASE WHEN date_diff('day', DATE '{_SNB_ANCHOR}', day)
                             % 7 >= 5
                        THEN cents * 2 ELSE cents END AS cents
            FROM daily0
            WHERE day >= DATE '{_SNB_ANCHOR}'
        ),
        lagged AS (
            SELECT day, cents,
                   lag(cents, 7) OVER (ORDER BY day) AS pred7,
                   lag(cents, 1) OVER (ORDER BY day) AS pred1
            FROM daily
        ),
        scored AS (SELECT * FROM lagged
                   WHERE pred7 IS NOT NULL AND pred1 IS NOT NULL)
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(abs(cents - pred7)) // count(*) AS BIGINT)
                   AS mae7_cents,
               CAST(sum(abs(cents - pred1)) // count(*) AS BIGINT)
                   AS mae1_cents,
               sum(abs(cents - pred7)) < sum(abs(cents - pred1))
                   AS seasonal_beats_naive_ok,
               CAST((sum(abs(cents - pred7)) * 10000)
                    // sum(abs(cents - pred1)) AS BIGINT)
                   AS mae_ratio_bp
        FROM scored
    """,
    tags=("analytics", "window", "monitoring"),
)
def seasonal_naive_backtest(spark, sf_dir):
    """Forecast-model backtesting in ALL-INTEGER cents: weekly
    seasonality is PLANTED into the daily revenue series (weekend
    days ×2 — the generator's hash-uniform dates carry no natural
    weekday signal, so the contract is constructed, the CUSUM
    pattern), then the seasonal-naive forecaster (lag 7) is scored
    against the last-value baseline (lag 1) by exact integer MAE.
    Falsifiable: lag-7 sees through the planted weekly pattern while
    lag-1 keeps paying the weekend jumps, so
    seasonal_beats_naive_ok must hold and the MAE ratio (integer
    basis points) crosses the compare.

    Scale shape: the heavy work is the daily partial-agg groupBy at
    the scan; both lags run in ONE window pass over the bounded
    daily series (≤ ~2,400 rows at any SF)."""
    anchor = F.lit(_SNB_ANCHOR).cast("date")
    daily0 = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(12,2)")) * 100, 0
            )
            .cast("long")
            .alias("cents")
        )
        .filter(F.col("day") >= anchor)
    )
    daily = daily0.select(
        "day",
        F.when(
            F.pmod(F.datediff(F.col("day"), anchor), F.lit(7)) >= 5,
            F.col("cents") * 2,
        )
        .otherwise(F.col("cents"))
        .alias("cents"),
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "cents",
        F.lag("cents", 7).over(w).alias("pred7"),
        F.lag("cents", 1).over(w).alias("pred1"),
    ).filter(F.col("pred7").isNotNull() & F.col("pred1").isNotNull())
    e7 = F.sum(F.abs(F.col("cents") - F.col("pred7")))
    e1 = F.sum(F.abs(F.col("cents") - F.col("pred1")))
    return lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.expr(
            "sum(abs(cents - pred7)) div count(*)"
        ).cast("long").alias("mae7_cents"),
        F.expr(
            "sum(abs(cents - pred1)) div count(*)"
        ).cast("long").alias("mae1_cents"),
        (e7 < e1).alias("seasonal_beats_naive_ok"),
        F.expr(
            "(sum(abs(cents - pred7)) * 10000)"
            " div sum(abs(cents - pred1))"
        ).cast("long").alias("mae_ratio_bp"),
    )


# =====================================================================
# Incremental materialized-view maintenance (delta == recompute)
# =====================================================================

_IMV_CUT = "2000-06-01"


@register_staged(
    "incremental_cube_maintenance",
    oracle=f"""
        WITH full_cube AS (
            SELECT o_orderpriority,
                   date_trunc('month', CAST(o_orderdate AS DATE)) AS mo,
                   CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2)))
                        * 100, 0) AS BIGINT) AS cents,
                   CAST(count(*) AS BIGINT) AS n
            FROM orders GROUP BY 1, 2
        ),
        base AS (
            SELECT o_orderpriority,
                   date_trunc('month', CAST(o_orderdate AS DATE)) AS mo,
                   CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2)))
                        * 100, 0) AS BIGINT) AS cents,
                   CAST(count(*) AS BIGINT) AS n
            FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '{_IMV_CUT}'
            GROUP BY 1, 2
        ),
        delta AS (
            SELECT o_orderpriority,
                   date_trunc('month', CAST(o_orderdate AS DATE)) AS mo,
                   CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2)))
                        * 100, 0) AS BIGINT) AS cents,
                   CAST(count(*) AS BIGINT) AS n
            FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '{_IMV_CUT}'
            GROUP BY 1, 2
        ),
        merged AS (
            SELECT o_orderpriority, mo,
                   CAST(sum(cents) AS BIGINT) AS cents,
                   CAST(sum(n) AS BIGINT) AS n
            FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
            GROUP BY 1, 2
        ),
        cmp AS (
            SELECT coalesce(m.cents = f.cents AND m.n = f.n, FALSE) AS eq
            FROM merged m FULL JOIN full_cube f
              ON m.o_orderpriority = f.o_orderpriority AND m.mo = f.mo
        )
        SELECT
            (SELECT CAST(count(*) AS BIGINT) FROM full_cube) AS n_cells,
            (SELECT CAST(count(*) AS BIGINT) FROM base) AS n_base_cells,
            (SELECT CAST(count(*) AS BIGINT) FROM delta) AS n_delta_cells,
            (SELECT CAST(count(*) AS BIGINT) FROM merged) AS n_merged_cells,
            (SELECT coalesce(min(eq), FALSE) FROM cmp)
                AS merge_equals_recompute_ok
    """,
    tags=("analytics", "incremental", "money"),
)
def incremental_cube_maintenance(spark, sf_dir):
    """Incremental materialized-view maintenance, the warehouse
    refresh primitive: a (priority × month) revenue cube built from
    the pre-cutoff base plus a delta partial re-aggregated on top
    must equal the from-scratch recompute CELL FOR CELL — additive
    aggregates (exact DECIMAL-cents sums, counts) are the class for
    which delta maintenance is lossless, and the full-outer compare
    (empty ⇒ FALSE, the _tables_equal discipline) makes the equality
    falsifiable in both engines.

    Scale shape: at 100 TB this is the partition-overwrite pattern —
    the delta groupBy touches only new files, the merge re-aggregates
    partials (map-side combined), and the full recompute here is the
    CALIBRATION arm, not the production path."""
    cut = F.lit(_IMV_CUT).cast("date")

    def cube(df):
        return df.groupBy(
            "o_orderpriority",
            F.date_trunc("month", F.col("o_orderdate").cast("date")).alias(
                "mo"
            ),
        ).agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(12,2)")) * 100, 0
            )
            .cast("long")
            .alias("cents"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )

    # eager checkpoints: each cube is a bounded cell table that fans
    # out to both the count row and the full-outer compare — without
    # them every branch re-scans orders (6 scans, 26 shuffles in the
    # plan audit; 3 scans / 11 shuffles with)
    orders = _t(spark, sf_dir, "orders")
    full_cube = cube(orders).localCheckpoint(eager=True)
    base = cube(
        orders.filter(F.col("o_orderdate").cast("date") < cut)
    ).localCheckpoint(eager=True)
    delta = cube(
        orders.filter(F.col("o_orderdate").cast("date") >= cut)
    ).localCheckpoint(eager=True)
    merged = (
        base.unionByName(delta)
        .groupBy("o_orderpriority", "mo")
        .agg(
            F.sum("cents").cast("long").alias("cents"),
            F.sum("n").cast("long").alias("n"),
        )
    )
    eq = (
        merged.alias("m")
        .join(
            full_cube.alias("f"),
            (F.col("m.o_orderpriority") == F.col("f.o_orderpriority"))
            & (F.col("m.mo") == F.col("f.mo")),
            "full",
        )
        .agg(
            F.coalesce(
                F.min(
                    F.coalesce(
                        (F.col("m.cents") == F.col("f.cents"))
                        & (F.col("m.n") == F.col("f.n")),
                        F.lit(False),
                    )
                ),
                F.lit(False),
            ).alias("merge_equals_recompute_ok")
        )
    )
    counts = (
        full_cube.agg(F.count(F.lit(1)).cast("long").alias("n_cells"))
        .crossJoin(
            base.agg(F.count(F.lit(1)).cast("long").alias("n_base_cells"))
        )
        .crossJoin(
            delta.agg(F.count(F.lit(1)).cast("long").alias("n_delta_cells"))
        )
        .crossJoin(
            merged.agg(
                F.count(F.lit(1)).cast("long").alias("n_merged_cells")
            )
        )
    )
    return counts.crossJoin(F.broadcast(eq))
