"""Deterministic bounded sampling helpers.

The engine's sampled trainers (PQ codebooks, the BPE merge table) all
pick their training slice the same way: order by a seeded id-hash,
take the first ``n``, collect. One implementation keeps the rule from
drifting between call sites (round-9 review: the recipe existed in
four copies) — the properties every caller relies on:

- DETERMINISTIC: same seed + same ids => same sample, any day.
- PARTITION-INVARIANT: the order is a pure function of the id column,
  not of file layout or task scheduling.
- BOUNDED: one ``limit(n)`` collect, never corpus-sized.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def seeded_sample_rows(
    df: DataFrame,
    cols: Sequence[str],
    n: int,
    seed: int,
    id_col: str,
):
    """Collect a deterministic ``n``-row sample of ``cols``: rows in
    seeded-xxhash64(id) order, ties broken by the id itself. Returns
    the collected Row list; each row carries ``cols`` in order."""
    return (
        df.select(
            *[F.col(c) for c in cols],
            F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1_000_003)).alias(
                "__h"
            ),
            F.col(id_col).alias("__id"),
        )
        .orderBy("__h", "__id")
        .limit(n)
        .collect()
    )
