"""KMV (k-minimum-values) distinct sketches with SET OPERATIONS.

Driver-mandated training-pipeline extension (SURVEY.md §2f family):
cross-corpus overlap estimation — "how much of corpus B's vocabulary /
shingle set / URL set is already in corpus A?" is the contamination and
mixture-design question HyperLogLog union cannot answer, because HLL
supports union only; KMV supports union, intersection, and Jaccard
(Beyer, Haas, Reinwald, Sismanis, Gemulla: "On synopses for
distinct-value estimation under multiset operations", SIGMOD 2007).

Why KMV here instead of Spark's built-in HLL sketch functions:

* **Set operations.** The k smallest hash values of ``A ∪ B`` are a
  subset of (k-smallest of A) ∪ (k-smallest of B), so two KMV
  synopses merge into the EXACT synopsis of the union with plain
  bounded array arithmetic, and the overlap fraction inside the merged
  synopsis is an unbiased Jaccard estimator. Intersections fall out as
  ``ρ · est(A ∪ B)`` — no inclusion-exclusion error stacking.
* **Determinism / oracle-ability.** The sketch is a deterministic
  function of the input value SET (k smallest of a fixed hash — no
  RNG, no register randomness), so a DuckDB twin can compute the
  IDENTICAL sketch and the IDENTICAL estimate, giving a full
  value-level correctness oracle instead of a tolerance contract.

Hash: the first 15 hex chars of md5 parsed as a 60-bit integer —
bit-identical in Spark (``conv(substr(md5(x),1,15),16,10)``) and
DuckDB (``CAST('0x'||substr(md5(x),1,15) AS BIGINT)``); 60 bits keeps
``conv``'s 64-bit saturation and BIGINT's sign out of play. Collisions
(~n²/2⁶¹) are both negligible and ENGINE-CONSISTENT, so they can never
produce an oracle mismatch.

Scale design (the Misra-Gries two-phase discipline from
``operators/frequency.py``):

1. *Partial phase*: one Arrow-batched ``mapInPandas`` pass keeps, per
   partition and group, the k smallest DISTINCT hashes (vectorized
   ``sort_values`` + ``groupby.head`` per batch against the bounded
   carry state). Each partition emits ≤ k rows per group.
2. *Merge phase*: ``collect_set`` over the ≤ k·P candidate rows per
   group, ``array_sort`` + ``slice`` to the global k smallest. Only
   candidates enter the shuffle — O(k·P) rows per group instead of the
   full distinct-value stream. At 100 TB the sketch shuffle is
   kilobytes per group while an exact ``countDistinct`` shuffles the
   entire distinct domain.

Estimator: with hashes uniform on [0, 2⁶⁰), ``est = (k-1)·2⁶⁰ / h_(k)``
(the unbiased basic estimator, Beyer et al. §3). A sketch holding
fewer than k hashes saw its whole domain — the estimate is EXACT
(``size(hashes)``). Every emitted estimate is a SINGLE IEEE division
of exactly-representable operands ((k-1)·2⁶⁰ is a small-int × power of
two, exact in double), so engine results are bit-identical per the
float-parity recipe in NOTES.md.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "kmv_hash",
    "salted_hash60",
    "kmv_sketch",
    "kmv_merge",
    "kmv_estimate",
    "kmv_set_estimates",
    "kmv_pairwise_matrix",
    "kmv_containment_screen",
    "hll_registers",
    "hll_merge",
    "hll_estimate",
]

HASH_BITS = 60
_HASH_SPAN = float(2**HASH_BITS)  # exact double (power of two)


def kmv_hash(value: Column) -> Column:
    """60-bit md5 prefix as a non-negative long — the one hash both
    engines compute bit-identically (see module docstring)."""
    return F.conv(F.substring(F.md5(value.cast("string")), 1, 15), 16, 10).cast("long")


def salted_hash60(value: Column, salt: str) -> Column:
    """The SALTED form of :func:`kmv_hash` — 60-bit md5 prefix of
    ``salt || value`` — shared by every sketch that needs a family of
    independent hash functions (count-min rows, bloom hash rows).
    ONE definition so the engine-identical bit layout
    (``CAST('0x'||substr(md5(salt||x),1,15) AS BIGINT)`` in DuckDB)
    can never drift between sketch families."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), value.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")


def _partial_kmin(group_cols: Sequence[str], k: int):
    """Per-partition k-smallest-distinct-per-group pass (mapInPandas).

    Carries ≤ k rows per group across Arrow batches; per batch the
    work is one vectorized concat + drop_duplicates + sort + head —
    O(batch + carry) C-level pandas, no per-row Python.
    """
    import pandas as pd

    gcols = list(group_cols)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        state: "pd.DataFrame | None" = None
        for pdf in batches:
            pdf = pdf.dropna(subset=["__h"])
            if pdf.empty:
                continue
            combined = pdf if state is None else pd.concat([state, pdf], ignore_index=True)
            combined = combined.drop_duplicates(subset=gcols + ["__h"])
            state = combined.sort_values("__h", kind="mergesort").groupby(gcols, sort=False).head(k)
        if state is not None and not state.empty:
            yield state

    return gen


def kmv_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: Column,
    k: int = 256,
) -> DataFrame:
    """Build one KMV synopsis per group: ``group_cols…, kmv_hashes``
    (sorted array<long>, length ≤ k; length < k ⇒ the group's distinct
    domain fit entirely and estimates are exact).

    ``value_col`` is any Column; NULL values are ignored (SQL distinct
    semantics for sketches: NULL is not a value).
    """
    gcols = list(group_cols)
    return kmv_sketch_from_hashes(
        df.select(*gcols, kmv_hash(value_col).alias("__h")), gcols, "__h", k
    )


def kmv_sketch_from_hashes(
    df: DataFrame,
    group_cols: Sequence[str],
    hash_col: str = "__h",
    k: int = 256,
) -> DataFrame:
    """:func:`kmv_sketch` over ALREADY-HASHED values (a ``kmv_hash``
    column) — round-13 optimization seam: callers that also need the
    raw hash stream (containment screens, exact verifies) materialize
    it once and sketch from it, instead of re-running the
    tokenize+shingle+md5 pass a second time inside the sketch.
    Identical output to :func:`kmv_sketch` on the same values
    (duplicate hash rows are dropped by the k-min pass either way)."""
    gcols = list(group_cols)
    hashed = df.select(*gcols, F.col(hash_col).alias("__h")).where(
        F.col("__h").isNotNull()
    )
    partial = hashed.mapInPandas(_partial_kmin(gcols, k), schema=hashed.schema)
    # Merge phase: per group ≤ k·P candidate rows — collect_set is
    # bounded by construction; the global k smallest of the union of
    # local k-smallest sets is exactly the global sketch.
    return partial.groupBy(*gcols).agg(
        F.slice(F.array_sort(F.collect_set("__h")), 1, k).alias("kmv_hashes")
    )


def kmv_merge(
    a: DataFrame,
    b: DataFrame,
    join_cols: Sequence[str],
    k: int,
) -> DataFrame:
    """Merge two synopsis frames (SAME k) into the synopsis of the
    union of their underlying value sets — EXACT, not approximate:
    the k smallest hashes of ``A ∪ B`` are always contained in
    (k-smallest of A) ∪ (k-smallest of B), so the merged synopsis is
    identical to sketching the concatenated inputs (test-pinned; the
    property incremental/streaming maintenance relies on). Groups
    present on one side pass through unchanged (full-outer join). A
    kilobyte-per-group operation at any corpus size."""
    jc = list(join_cols)
    fa = a.select(*jc, F.col("kmv_hashes").alias("__ha"))
    fb = b.select(*jc, F.col("kmv_hashes").alias("__hb"))
    empty = F.array().cast("array<long>")
    return (
        fa.join(fb, on=jc, how="full_outer")
        .select(
            *jc,
            F.slice(
                F.array_sort(
                    F.array_union(
                        F.coalesce(F.col("__ha"), empty),
                        F.coalesce(F.col("__hb"), empty),
                    )
                ),
                1,
                k,
            ).alias("kmv_hashes"),
        )
    )


def kmv_estimate(hashes: Column, k: int) -> Column:
    """Distinct-count estimate from a synopsis array (Beyer et al. §3):
    exact size when the sketch is unsaturated, else
    ``(k-1)·2⁶⁰ / h_(k)`` — one IEEE division of exact operands, so the
    value is bit-identical across engines."""
    n = F.size(hashes)
    kth = F.element_at(hashes, k).cast("double")
    return F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1) * _HASH_SPAN) / kth
    )


def kmv_set_estimates(
    a: DataFrame,
    b: DataFrame,
    join_cols: Sequence[str],
    k: int,
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> DataFrame:
    """Union / intersection / Jaccard estimates from two synopsis
    frames (each as produced by :func:`kmv_sketch`, SAME k), joined on
    ``join_cols`` (inner: a group absent from either side has no
    overlap question to answer).

    Output per group:

    * ``est{sa}``, ``est{sb}`` — per-side distinct estimates,
    * ``k_union`` — size of the merged synopsis L = k-smallest(A∪B),
    * ``union_kth`` — max(L) (the estimator's denominator, exact int),
    * ``est_union`` — distinct estimate of A ∪ B from L,
    * ``overlap`` — |L ∩ A ∩ B| (exact int),
    * ``jaccard_est`` — overlap / k_union (the Beyer et al. ρ; one
      exact-int division, bit-stable).

    The intersection estimate is ``jaccard_est · est_union`` — a
    multi-op double chain that is NOT bit-stable across engines (FMA
    contraction; NOTES.md float recipe), so this function emits its
    exact-integer / single-division COMPONENTS and leaves the final
    multiply to the caller's display layer.

    All arithmetic is plain JVM array functions over ≤ k-length
    arrays — the join moves two kilobyte-scale synopses per group, so
    the set-operation cost is independent of corpus size.
    """
    sa, sb = suffixes
    jc = list(join_cols)
    fa = a.select(*jc, F.col("kmv_hashes").alias("__ha"))
    fb = b.select(*jc, F.col("kmv_hashes").alias("__hb"))
    merged = fa.join(fb, on=jc, how="inner")
    return merged.select(
        *jc,
        kmv_estimate(F.col("__ha"), k).alias(f"est{sa}"),
        kmv_estimate(F.col("__hb"), k).alias(f"est{sb}"),
        *_pair_estimate_cols(F.col("__ha"), F.col("__hb"), k),
    )


def _pair_estimate_cols(ha: Column, hb: Column, k: int) -> list:
    """The Beyer et al. pair arithmetic over two synopsis arrays:
    ``k_union, union_kth, est_union, overlap, jaccard_est`` — shared
    by the keyed-join (:func:`kmv_set_estimates`) and all-pairs
    (:func:`kmv_pairwise_matrix`) shapes."""
    L = F.slice(F.array_sort(F.array_union(ha, hb)), 1, k)
    overlap = F.size(F.array_intersect(F.array_intersect(L, ha), hb))
    return [
        F.size(L).alias("k_union"),
        F.element_at(L, -1).alias("union_kth"),
        kmv_estimate(L, k).alias("est_union"),
        overlap.alias("overlap"),
        (overlap.cast("double") / F.size(L).cast("double")).alias("jaccard_est"),
    ]


def kmv_containment_screen(
    eval_units: DataFrame,
    synopses: DataFrame,
    eval_id_col: str,
    value_col: Column,
    key_col: str,
    k: int,
    threshold_num: int = 4,
    threshold_den: int = 5,
    values_prehashed: bool = False,
    assume_distinct: bool = False,
) -> DataFrame:
    """Containment SCREEN at synopsis cost (the decontamination
    direction of Beyer et al. 2007 §5): estimate, for every
    (eval document, corpus key) pair, what fraction of the document's
    unit set is contained in that key's full unit set — reading ONLY
    the key's KMV synopsis, never its corpus.

    Estimator: a key's synopsis is its k smallest distinct unit
    hashes, i.e. a uniform hash-space sample of the key's set below
    its k-th smallest hash. For an eval unit with ``h <= kth(key)``,
    membership in the key's SET is decidable from the synopsis alone
    (if the unit were in the set, its hash would be among the k
    smallest). So over the document's units that land in the sampled
    region, ``found / in_region`` is an unbiased estimate of the true
    containment ``|A ∩ B| / |A|``. An UNSATURATED synopsis (< k
    hashes) is the key's complete hashed set, making the estimate
    exact. The screen decision is pure integer arithmetic
    (``den·found >= num·in_region``) — bit-stable across engines by
    construction, so an oracle can replicate the surviving-pair set
    row for row.

    A pair with ``in_region = 0`` (no eval unit in the sampled
    region) carries no evidence and PASSES the screen — a screen must
    fail open, never silently drop a candidate it knows nothing
    about; the exact phase the caller runs on survivors settles it.

    ``eval_units`` carries one row per (eval doc, unit) occurrence;
    units are hashed and deduplicated here (NULL units dropped — SQL
    distinct semantics, matching :func:`kmv_sketch`). Returns one row
    per (eval_id, key) for eval docs with >= 1 non-null unit:
    ``eval_id, key, n_eval_units, n_in_region, n_found, screen_est
    (null when n_in_region = 0), screen_pass``.

    Scale shape: the synopsis frame is keys × kilobytes (broadcast);
    the screen is one narrow pass over the EVAL side only — eval sets
    are small by nature (the same asymmetry ``dedup.containment_join``
    exploits), and the corpus is never touched. The exact phase then
    pays corpus cost only for surviving pairs.
    """
    # ``values_prehashed``: value_col already carries kmv_hash output
    # (round-13: callers that materialize the hash stream once — for
    # the exact phase — pass it straight through instead of paying the
    # shingle+md5 pass again here). ``assume_distinct``: the caller
    # vouches the (eval_id, value) stream is already distinct (the
    # materialized hash streams are, by construction) — skips a full
    # re-dedup shuffle of the eval stream that is a no-op on such
    # input (round-14, guide §2.4 "a distinct on data that is already
    # unique").
    hashed = eval_units.select(
        F.col(eval_id_col).alias("eval_id"),
        (value_col if values_prehashed else kmv_hash(value_col)).alias("__h"),
    ).where(F.col("__h").isNotNull())
    if not assume_distinct:
        hashed = hashed.distinct()
    syn = synopses.select(
        F.col(key_col).alias("key"),
        F.col("kmv_hashes"),
        (F.size("kmv_hashes") == k).alias("__saturated"),
        F.element_at("kmv_hashes", -1).alias("__kth"),
    )
    joined = hashed.crossJoin(F.broadcast(syn))
    in_region = ~F.col("__saturated") | (F.col("__h") <= F.col("__kth"))
    found = in_region & F.array_contains(F.col("kmv_hashes"), F.col("__h"))
    per_pair = joined.groupBy("eval_id", "key").agg(
        F.count(F.lit(1)).cast("long").alias("n_eval_units"),
        F.sum(in_region.cast("long")).cast("long").alias("n_in_region"),
        F.sum(found.cast("long")).cast("long").alias("n_found"),
    )
    passes = (F.col("n_in_region") == 0) | (
        F.col("n_found") * threshold_den >= F.col("n_in_region") * threshold_num
    )
    return per_pair.select(
        "eval_id",
        "key",
        "n_eval_units",
        "n_in_region",
        "n_found",
        F.when(
            F.col("n_in_region") > 0,
            F.col("n_found").cast("double") / F.col("n_in_region").cast("double"),
        ).alias("screen_est"),
        passes.alias("screen_pass"),
    )


def kmv_pairwise_matrix(
    sketches: DataFrame,
    key_col: str,
    k: int,
) -> DataFrame:
    """All-pairs overlap matrix over a synopsis frame (one row per
    group from :func:`kmv_sketch`): for every unordered pair of keys
    ``(a < b)``, the union / overlap / Jaccard estimates — the
    mixture-planning and cross-source-contamination view ("which of
    my N corpus sources duplicate each other, and how much?").

    This is where sketching pays off hardest at 100 TB: the exact
    answer is N² corpus-sized distinct-joins, while the synopsis
    matrix joins N kilobyte rows against themselves — C(N,2) pairs of
    ≤ k-length array arithmetic, independent of corpus size. The
    self-join is deliberately a non-equi (`a < b`) broadcast
    nested-loop over the TINY synopsis frame; its cost is C(N,2)
    rows, and the key count N is the grouping cardinality (sources,
    languages), not data volume."""
    a = sketches.select(
        F.col(key_col).alias("key_a"), F.col("kmv_hashes").alias("__ha")
    )
    b = sketches.select(
        F.col(key_col).alias("key_b"), F.col("kmv_hashes").alias("__hb")
    )
    pairs = a.join(b, F.col("key_a") < F.col("key_b"))
    return pairs.select(
        "key_a",
        "key_b",
        kmv_estimate(F.col("__ha"), k).alias("est_a"),
        kmv_estimate(F.col("__hb"), k).alias("est_b"),
        *_pair_estimate_cols(F.col("__ha"), F.col("__hb"), k),
    )


# =====================================================================
# HyperLogLog: fixed-register distinct counting (Flajolet, Fusy,
# Gandouet, Meunier, AofA 2007 — public literature)
# =====================================================================
#
# The KMV synopsis above is the repo's set-operation sketch (union /
# intersection / containment need the hash VALUES). HLL is the
# complementary fixed-memory point: m = 2^p registers per group —
# 256 single-byte ranks at p=8 — REGARDLESS of k-scale accuracy
# targets, mergeable by element-wise MAX (so union across corpus
# shards / streaming epochs is one bounded groupBy-max), at standard
# error 1.04/√m. Where KMV's synopsis is k·8 bytes and supports set
# algebra, HLL is the cheapest possible union-only cardinality
# monitor: the exchange for a distinct-count over any corpus size is
# ≤ m rows per group, map-side combined (the (group, register) domain
# is bounded), and register rows are (int, int) pairs.
#
# Determinism/oracle-ability: registers derive from the same 60-bit
# md5 hash as KMV — idx = top p bits, rho = leading-zero rank of the
# remaining 60-p bits via integer bin-length arithmetic, harmonic sum
# as an EXACT BIGINT (Σ 2^(Q+1-rho) — FP summation of mixed-magnitude
# powers of two is order-dependent and engine-divergent; integer
# summation is not). The one division and the log of the
# linear-counting branch follow the NOTES float recipe (single ops of
# identical inputs + 4 dp rounding).


HLL_P = 8  # m = 256 registers
HLL_M = 1 << HLL_P
_HLL_Q = HASH_BITS - HLL_P  # value bits per register (52 at p=8)
# alpha_m for m >= 128 (Flajolet et al. §4); the SCALED numerator
# alpha·m²·2^(Q+1) is computed HERE once and embedded as the same
# literal in engine code and oracle SQL, so the estimate is a single
# division of bit-identical operands in both engines.
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
HLL_SCALED_NUM = HLL_ALPHA * HLL_M * HLL_M * float(1 << (_HLL_Q + 1))


def hll_registers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: Column,
) -> DataFrame:
    """Per-group HLL register table ``(group…, idx, rho)`` — only HIT
    registers appear (missing idx ⇒ rho 0). idx = top p bits of the
    60-bit hash; rho = position of the highest set bit of the
    remaining Q bits counted from the MSB (1-based), Q+1 when they are
    all zero — pure integer arithmetic (``bin``-length), engine-
    identical. One bounded-domain groupBy-max: ≤ m rows per group
    enter the exchange at any corpus size."""
    gcols = list(group_cols)
    h = kmv_hash(value_col)
    rest = h.bitwiseAND(F.lit((1 << _HLL_Q) - 1))
    rho = F.when(rest == 0, F.lit(_HLL_Q + 1)).otherwise(
        F.lit(_HLL_Q + 1) - F.length(F.bin(rest))
    )
    return (
        df.select(
            *gcols,
            F.shiftright(h, _HLL_Q).cast("int").alias("idx"),
            rho.cast("int").alias("rho"),
        )
        .where(F.col("idx").isNotNull())
        .groupBy(*gcols, "idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(parts: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Union of register tables whose finer grouping is being folded
    away (shard/source/epoch → group): element-wise register MAX —
    EXACT: max-of-max per (group, idx) is the register table of the
    unioned value sets, the linearity the streaming/sharded arms rely
    on. Bounded: ≤ m rows per group."""
    gcols = list(group_cols)
    return parts.groupBy(*gcols, "idx").agg(F.max("rho").alias("rho"))


def hll_estimate(regs: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Cardinality estimate per group from a register table.

    Emits the exact-integer components plus the estimate:

    * ``n_hit`` — registers with at least one value,
    * ``harmonic_scaled`` — Σ 2^(Q+1−rho) over all m registers
      (missing ⇒ rho 0 ⇒ 2^(Q+1)) as an exact BIGINT (max m·2^53 <
      2^63),
    * ``est_distinct`` — round(raw, 4) where raw = αm²·2^(Q+1) /
      harmonic_scaled (one IEEE division of engine-identical
      operands), replaced by the linear-counting branch
      m·ln(m/V) when raw ≤ 2.5m and V = m − n_hit > 0 (Flajolet
      et al. §4 small-range correction; ln rounds within the 4 dp
      recipe)."""
    gcols = list(group_cols)
    per = regs.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n_hit"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_Q + 1} - rho)"))
        .cast("long")
        .alias("hit_scaled"),
    )
    zeros = F.lit(HLL_M) - F.col("n_hit")
    harmonic = (
        F.col("hit_scaled")
        + zeros * F.lit(1 << (_HLL_Q + 1)).cast("long")
    ).cast("long")
    raw = F.lit(HLL_SCALED_NUM) / harmonic.cast("double")
    lin = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double"))
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (zeros > 0), lin
    ).otherwise(raw)
    return per.select(
        *gcols,
        "n_hit",
        harmonic.alias("harmonic_scaled"),
        F.round(est, 4).alias("est_distinct"),
    )
