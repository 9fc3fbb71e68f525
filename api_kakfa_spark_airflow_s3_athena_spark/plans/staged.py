"""Staging area for not-yet-registered round queries.

Round-13 pre-builds (the round-12 batch was promoted into
``plans/queries.py``; these wait for the next 12-slot promotion
window, fully verified): SCD2 interval builds, the equi-depth
histogram selectivity audit, sort-merge-join cardinality bounds,
funnel time-to-convert quantiles, weekday seasonality indices,
top user-journey paths, and per-user behavioral entropy.

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
