"""Distributed frequent-items (heavy hitters) over token streams.

Driver-mandated training-pipeline extension (SURVEY.md §2f family):
finding the tokens/n-grams that dominate a corpus — boilerplate
detection, stop-list induction, contamination tracing — without ever
materializing the full token histogram.

The operator is the classic two-phase Misra-Gries construction
(public literature: Misra & Gries 1982; the "MG summary" merge
guarantee from Agarwal et al., PODS 2012):

1. *Candidate phase*: each partition maintains a bounded Misra-Gries
   summary of ``num_counters`` counters over its local token stream
   (an Arrow-batched ``mapInPandas`` pass — the only Python step,
   vectorized: pandas value_counts per batch + MG summary merge, so
   interpreted-Python cost is O(distinct-per-batch)). MG guarantees any
   item with local frequency > n_p/num_counters survives locally; by
   pigeonhole, any item with GLOBAL frequency > N/num_counters
   exceeds that bound in at least one partition, so the union of
   per-partition candidates contains every global heavy hitter.
2. *Exact recount*: the (tiny, <= num_counters x partitions) candidate
   set is broadcast against a JVM-side token explode and counted
   exactly; only candidate tokens ever enter the shuffle.

The result is therefore EXACT — identical to the naive full-histogram
query restricted to tokens above threshold — while the shuffle carries
O(candidates) rows instead of O(distinct tokens). At 100 TB that is
the difference between shuffling a trillion-row token histogram and a
few thousand candidate counts.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

__all__ = [
    "heavy_hitters",
    "heavy_hitters_by_key",
    "cms_bucket",
    "count_min_counters",
    "cms_merge",
    "cms_lookup",
]


# The ONE tokenization, used by all three sides of the contract:
# Java's non-Unicode \s is exactly [ \t\n\x0B\f\r], so this Python/RE2
# class matches functions.text.tokens (JVM split on \s+) and the
# DuckDB oracle (regexp_split_to_array on the same class) character
# for character. A bare Python str.split() would additionally split on
# Unicode whitespace (NBSP etc.) and silently diverge.
WS_CLASS = r"[ \t\n\x0b\f\r]+"


def _mg_candidates(num_counters: int, text_col: str):
    """Per-partition Misra-Gries candidate pass (mapInPandas),
    vectorized: each Arrow batch is tokenized and counted with pandas
    ``split/explode/value_counts`` (C-level), and the batch histogram is
    merged into the running MG summary with the Agarwal et al. (PODS
    2012) summary merge — sum counts, then subtract the (k+1)-th
    largest count and drop non-positive counters. A batch histogram is
    itself an error-free MG summary, so the merge keeps the standard
    guarantee: any token with partition frequency > n_p/num_counters
    survives the pass. Python cost is O(distinct-per-batch), not
    O(tokens)."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        counters = pd.Series(dtype="int64")
        for pdf in batches:
            toks = (
                pdf[text_col]
                .dropna()
                .str.split(WS_CLASS, regex=True)
                .explode()
            )
            toks = toks[toks.notna() & (toks != "")]
            if toks.empty:
                continue
            vc = toks.value_counts()
            counters = (
                vc if counters.empty
                else counters.add(vc, fill_value=0).astype("int64")
            )
            if len(counters) > num_counters:
                # MG merge reduction: subtract the (k+1)-th largest
                # count from everything, keep strictly-positive
                thresh = counters.nlargest(num_counters + 1).iloc[-1]
                counters = counters[counters > thresh] - thresh
        if len(counters):
            yield pd.DataFrame({"token": counters.index.astype(str)})

    return gen


def _mg_candidates_by_key(key_cols, unit_col: str, num_counters: int):
    """Per-partition, PER-KEY Misra-Gries candidate pass over an
    already-exploded unit stream (mapInPandas). Each key's counter set
    is an independent MG summary, so the guarantee is per key: any
    unit with partition-local in-key frequency > n_{p,key}/num_counters
    survives; by pigeonhole over that key's partition slices, every
    global per-key heavy hitter survives in at least one partition.

    All work is vectorized pandas: per batch one groupby-size, one
    concat-merge, and (only when a key overflows) a sorted cumcount
    threshold subtraction — the per-group ``transform`` lambda runs
    once per KEY, not per row, and the number of keys is the grouping
    cardinality (languages/domains), not the unit vocabulary."""
    import pandas as pd

    gcols = list(key_cols)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        state: "pd.DataFrame | None" = None
        for pdf in batches:
            pdf = pdf.dropna(subset=[unit_col])
            if pdf.empty:
                continue
            bc = (
                pdf.groupby(gcols + [unit_col], sort=False)
                .size()
                .rename("cnt")
                .reset_index()
            )
            merged = bc if state is None else (
                pd.concat([state, bc], ignore_index=True)
                .groupby(gcols + [unit_col], sort=False)["cnt"]
                .sum()
                .reset_index()
            )
            # MG summary-merge reduction per key (Agarwal et al. 2012):
            # subtract each overflowing key's (k+1)-th largest count,
            # drop non-positive counters.
            merged = merged.sort_values("cnt", ascending=False, kind="mergesort")
            thr = merged.groupby(gcols, sort=False)["cnt"].transform(
                lambda s: s.iloc[num_counters] if len(s) > num_counters else 0
            )
            merged = merged.assign(cnt=merged["cnt"] - thr)
            state = merged[merged["cnt"] > 0]
        if state is not None and not state.empty:
            yield state[gcols + [unit_col]]

    return gen


def heavy_hitters_by_key(
    units: DataFrame,
    key_cols,
    unit_col: str = "unit",
    num_counters: int = 200,
    broadcast_candidates: bool = True,
) -> DataFrame:
    """Exact PER-KEY heavy hitters over an exploded unit stream: every
    (key, unit) whose in-key frequency ``freq`` satisfies
    ``freq * num_counters > n_units(key)``, with its exact count —
    per-domain/per-language token or n-gram heads, the curation ask
    the global :func:`heavy_hitters` cannot answer.

    ``units`` carries one row per unit OCCURRENCE (key cols + unit
    col). Callers explode upstream (``F.explode(tokens(...))`` or a
    shingle array) — explode is a narrow op, so the stream flows into
    the candidate pass without a shuffle.

    Scale shape (the two-phase discipline of the global operator):
    the candidate pass emits ≤ num_counters·keys rows per partition;
    the exact recount semi-joins the stream against the candidate set
    BEFORE its shuffle, so only candidate-unit occurrences enter the
    exchange, map-side combined to ≤ |candidates| rows per partition.
    With ``broadcast_candidates=True`` (default — right whenever
    num_counters·keys·partitions is broadcast-sized) the semi-join is
    shuffle-free on the fact side; pass False at extreme key
    cardinality to fall back to a shuffled semi-join, still exact.

    Returns ``(key_cols…, unit_col, freq, n_units)``.
    """
    gcols = list(key_cols)
    # NULL occurrences are not units: exclude them EVERYWHERE —
    # candidates and the recount semi-join drop them implicitly (null
    # keys never match), so the per-key totals must drop them too or
    # thresholds would be measured against a larger denominator.
    units = units.where(F.col(unit_col).isNotNull())
    cands = (
        units.select(*gcols, unit_col)
        .mapInPandas(
            _mg_candidates_by_key(gcols, unit_col, num_counters),
            schema=units.select(*gcols, unit_col).schema,
        )
        .distinct()
    )
    if broadcast_candidates:
        cands = F.broadcast(cands)
    totals = units.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n_units")
    )
    counted = (
        units.join(cands, on=gcols + [unit_col], how="leftsemi")
        .groupBy(*gcols, unit_col)
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    return (
        counted.join(F.broadcast(totals), on=gcols)
        .filter(F.col("freq") * num_counters > F.col("n_units"))
        .select(*gcols, unit_col, "freq", "n_units")
    )


def heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    num_counters: int = 200,
) -> DataFrame:
    """Exact global heavy hitters: every token whose corpus frequency
    ``freq`` satisfies ``freq * num_counters > total_tokens``, with its
    exact count — computed with a bounded-memory candidate phase and a
    candidates-only exact recount (see module docstring).

    Returns ``(token, freq)``. Exactness (== the naive full histogram
    filtered to the same threshold) is pinned by
    tests/test_frequency.py and the ``heavy_hitter_tokens`` oracle.
    """
    cands = (
        df.select(F.col(text_col))
        .mapInPandas(_mg_candidates(num_counters, text_col), schema="token string")
        .distinct()
    )
    exploded = df.select(
        F.explode(tokens(F.col(text_col))).alias("token")
    )
    totals = exploded.agg(F.count(F.lit(1)).cast("long").alias("n_tokens"))
    counted = (
        exploded.join(F.broadcast(cands), "token", "leftsemi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    return (
        counted.crossJoin(F.broadcast(totals))
        .filter(F.col("freq") * num_counters > F.col("n_tokens"))
        .select("token", "freq")
    )


# =====================================================================
# Count-min sketch: fixed-size frequency counters (Cormode &
# Muthukrishnan, J. Algorithms 2005 — public literature)
# =====================================================================
#
# The Misra-Gries path above answers "which items are frequent";
# count-min answers the complementary point query — "how often does
# THIS item occur" — in d·w counters TOTAL, independent of the
# distinct-item domain. Guarantees: estimates never undercount
# (est ≥ true), and overcount ≤ e·N/w with probability ≥ 1 − e^(−d)
# per query. The sketch is LINEAR (counters of A ∪ B = counters(A) +
# counters(B) cell-wise), which makes the streaming arm exact-merge
# trivial and distributed construction a plain partial-aggregating
# groupBy: the (row, bucket) domain is bounded by d·w, so map-side
# combine collapses every partition to ≤ d·w rows before the exchange
# — at 100 TB the shuffle stays a few thousand rows while an exact
# token histogram shuffles the unbounded distinct domain.
#
# Determinism/oracle-ability: bucket = 60-bit md5 of "j:" + unit,
# mod width — the repo's engine-identical hash (sketches.kmv_hash
# recipe), so a DuckDB twin builds the IDENTICAL counter table and
# the IDENTICAL estimates; the error bound becomes a falsifiable
# value-level contract instead of a probabilistic claim.


def cms_bucket(unit, row: int, width: int):
    """Row-j bucket of a unit: 60-bit md5 prefix of ``"j:" || unit``
    (independent hash per row via the salt), mod width. Bit-identical
    in Spark and DuckDB (the shared sketches.salted_hash60 layout)."""
    from .sketches import salted_hash60

    return F.pmod(salted_hash60(unit, f"{row}:"), F.lit(width)).cast("int")


def count_min_counters(
    units: DataFrame, unit_col: str, width: int, depth: int
) -> DataFrame:
    """Build the d×w counter table over a unit stream (one row per
    occurrence): ``(row, bucket, cnt)``. One posexplode of the d
    per-unit buckets + one bounded-domain groupBy — partial aggregation
    collapses each partition to ≤ d·w rows before the exchange."""
    buckets = F.array(
        *[cms_bucket(F.col(unit_col), j, width) for j in range(depth)]
    )
    return (
        units.select(F.posexplode(buckets).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two counter tables — EXACT: count-min is a
    linear sketch, so ``merge(counters(A), counters(B)) ==
    counters(A ⊎ B)`` (multiset union), the property the streaming
    epoch-fold relies on. A ≤ d·w-row operation at any corpus size."""
    return (
        a.select("row", "bucket", "cnt")
        .unionByName(b.select("row", "bucket", "cnt"))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def cms_lookup(
    counters: DataFrame, queries: DataFrame, unit_col: str, width: int, depth: int
) -> DataFrame:
    """Point-query estimates: for each query unit, the MIN over the d
    rows of its counter cells. The counter table (≤ d·w rows) is
    broadcast; the query side never shuffles. Returns the input
    columns plus ``cms_est``.

    Estimates are computed once per DISTINCT unit and joined back, so
    duplicate query rows keep their multiplicity and pre-existing
    query columns (even ones named ``row``/``bucket``/``cnt``) pass
    through untouched."""
    units = queries.select(F.col(unit_col).alias("__unit")).distinct()
    withb = units.select(
        "__unit",
        F.posexplode(
            F.array(*[cms_bucket(F.col("__unit"), j, width) for j in range(depth)])
        ).alias("__row", "__bucket"),
    )
    cells = counters.select(
        F.col("row").alias("__row"),
        F.col("bucket").alias("__bucket"),
        F.col("cnt").alias("__cnt"),
    )
    joined = withb.join(F.broadcast(cells), ["__row", "__bucket"], "left")
    per_unit = joined.groupBy("__unit").agg(
        F.min(F.coalesce(F.col("__cnt"), F.lit(0))).cast("long").alias("cms_est")
    )
    out = queries.join(
        F.broadcast(per_unit), queries[unit_col] == per_unit["__unit"], "left"
    )
    # NULL units never match any cell — estimate 0, as before
    return out.withColumn(
        "cms_est", F.coalesce(F.col("cms_est"), F.lit(0)).cast("long")
    ).drop("__unit")
