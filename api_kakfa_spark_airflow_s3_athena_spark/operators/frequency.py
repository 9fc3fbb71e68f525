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

__all__ = ["heavy_hitters"]


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
