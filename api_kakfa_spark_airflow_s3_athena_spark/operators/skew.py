"""Skew-mitigation operators: salted two-stage aggregation.

Zipf-distributed keys (hot tokens, hot users) overload the one reducer
that owns the hot key. Salting splits each key into ``salt_buckets``
sub-keys for a partial aggregate, then combines the partials — the hot
key's work spreads over ``salt_buckets`` tasks and the second shuffle
carries one row per (key, salt).

The salt MUST come from a per-row source, never from the group key:
a key-derived salt maps every row of the hot key to the same bucket
and the operator degrades to a more expensive identity. Here the salt
hashes ``monotonically_increasing_id()`` — unique per row, stable
within a job, no RNG state — so each key's rows spread across all
buckets.

AQE's skew handling covers *joins*; skewed *aggregation* keys are
already mitigated by partial aggregation, but when the per-key partial
state itself is heavy (collect_list, large HLL sketches, long strings)
explicit salting is still the tool. Result is bit-identical to the
unsalted aggregate for any associative-commutative measure.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "salted_join", "salted_partials"]


def salted_partials(
    df: DataFrame,
    keys: Sequence[str],
    measures: Sequence[Tuple[Column, Column, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """First (salted) stage only: per-(key, __salt) partial aggregates.

    Exposed separately so tests and diagnostics can assert the spread —
    a hot key must occupy >1 distinct ``__salt`` value, which is the
    entire point of the operator.
    """
    # Per-row salt: hash of the row id, NOT of the key columns.
    salt = F.pmod(
        F.xxhash64(F.monotonically_increasing_id(), F.lit(0x5A17)),
        F.lit(salt_buckets),
    )
    from ._util import require_absent

    # "__salt" is part of this function's OUTPUT contract (tests assert
    # the spread over it), so it cannot be renamed away — conflict loudly
    require_absent(df, "__salt", "salted_partials")
    return (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[p.alias(name) for p, _, name in measures])
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    measures: Sequence[Tuple[Column, Column, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``measures``: (partial_agg_expr, final_agg_expr, name) triples —
    e.g. ``(F.count(F.lit(1)), F.sum("name"), "freq")`` computes a
    count as per-salt partial counts summed in the final stage.
    """
    partial = salted_partials(df, keys, measures, salt_buckets)
    return partial.groupBy(*keys).agg(*[f.alias(name) for _, f, name in measures])


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Salted equi-join for skewed keys: the (big, skewed) ``left``
    side gets a per-row salt, the ``right`` side is replicated once
    per salt value, and the join runs on ``(*on, __salt)`` — so a hot
    key's probe rows spread over ``salt_buckets`` reducers instead of
    serializing on one. Result is row-identical to the plain join.

    When to use instead of AQE's OptimizeSkewedJoin (which is the
    first choice): AQE can only split a *bare shuffle stage* at
    *mapper boundaries* (tests/test_skew.py pins both preconditions),
    so a skewed join whose child is an unmaterialized aggregate, or
    whose hot key sits inside one mapper, still serializes. Salting is
    the plan-level fix that works unconditionally.

    Cost model at 100 TB: the right side is shuffled ``salt_buckets``
    times over — so use this when right is far smaller than left (but
    too big or too dynamic to broadcast) and left's key histogram is
    Zipf. The salt hashes ``monotonically_increasing_id()`` — per-row,
    never key-derived (a key-derived salt sends every hot-key row to
    the same bucket and the operator degrades to an expensive
    identity).

    ``how``: "inner" or "left". Left rows carry exactly one salt and
    match only the one replica with that salt, so left-outer semantics
    (unmatched rows survive once, with NULLs) are preserved exactly.
    Right/full-outer would see every unmatched right row
    ``salt_buckets`` times — not supported.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    from ._util import scratch_name

    salt = F.pmod(
        F.xxhash64(F.monotonically_increasing_id(), F.lit(0x5A17)),
        F.lit(salt_buckets),
    ).cast("int")
    # collision-checked scratch name: a caller's own "__salt" column
    # must survive the join untouched (the bloom_candidates discipline)
    salt_col = scratch_name("__salt", left, right)
    salted_left = left.withColumn(salt_col, salt)
    replicated_right = right.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_left.join(
        replicated_right, [*on, salt_col], how
    ).drop(salt_col)
