"""Bloom-filter join pruning: broadcast a fixed-size bit set built
from the dimension side's join keys and prune the fact scan BEFORE
the join shuffle (Bloom 1970; the runtime-filter technique in every
warehouse engine — Spark's own ``spark.sql.optimizer.runtimeFilter.
bloomFilter.enabled`` does this implicitly for eligible shapes; this
module is the EXPLICIT, composable form with an engine-independent
bit layout so the driver's DuckDB twin can replicate the filter
bit-for-bit).

Why not just broadcast the dim keys? Because the bloom set is
``m`` BITS regardless of how many keys the dimension has: at 100 TB a
selective-but-large dim side (10⁸ surviving keys) can't broadcast as
a hash set, but its bloom image is still kilobytes. The price is
false positives — rate ≈ (1 − e^(−k·n/m))^k — which the composition
removes with an exact join ON THE CANDIDATES ONLY: output equals the
plain join exactly; the bloom pass just keeps non-matching fact rows
out of the exchange.

Bit layout (engine-identical, deterministic): position_j(key) =
(60-bit md5 of ``"j:" || key``) mod m — the repo's cross-engine hash
(sketches.kmv_hash recipe). The filter is materialized SPARSELY as
the distinct set of SET bit positions (≤ min(k·n, m) ints) rather
than packed words: the membership test is then k broadcast-hash
semi-joins, which whole-stage codegen chains into the scan pipeline —
no shuffle touches the fact side until only candidates remain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_position", "bloom_bits", "bloom_candidates", "bloom_merge"]


def bloom_position(key: Column, row: int, m: int) -> Column:
    """Bit position of ``key`` under hash row ``j`` (salted md5, mod
    m) — bit-identical in Spark and DuckDB (the shared
    sketches.salted_hash60 layout)."""
    from .sketches import salted_hash60

    return F.pmod(salted_hash60(key, f"{row}:"), F.lit(m)).cast("int")


def bloom_bits(dim: DataFrame, key_col: str, m: int, n_hashes: int) -> DataFrame:
    """The filter: distinct set bit positions over all dim keys and
    all k hash rows — ``(bit int)``, ≤ min(k·n, m) rows. Bounded
    domain ⇒ map-side combine collapses each partition to ≤ m rows
    before the (tiny) exchange."""
    pos = F.explode(
        F.array(*[bloom_position(F.col(key_col), j, m) for j in range(n_hashes)])
    )
    return dim.select(pos.alias("bit")).distinct()


def bloom_candidates(
    fact: DataFrame, key_col: str, bits: DataFrame, m: int, n_hashes: int
) -> DataFrame:
    """Fact rows whose key passes the bloom membership test (all k bit
    positions set). k chained broadcast semi-joins — scan-pipelined,
    shuffle-free; supersets the true match set (no false negatives:
    a real match's bits were all inserted)."""
    # Collision-checked scratch name (the cms_lookup discipline): a
    # caller's own "__bit" column must survive the membership test
    # untouched, so probe for a free name instead of clobbering.
    from ._util import scratch_name

    tmp = scratch_name("__bloom_bit", fact)
    out = fact
    for j in range(n_hashes):
        out = out.withColumn(tmp, bloom_position(F.col(key_col), j, m)).join(
            F.broadcast(bits.withColumnRenamed("bit", tmp)),
            tmp,
            "leftsemi",
        )
    return out.drop(tmp)


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union of two filters over the same (m, k) layout — EXACT:
    a bloom filter is the bit-OR of its insertions, so the distinct
    union of two sparse bit-position sets IS the filter of the
    unioned key sets (the linearity the streaming epoch-fold relies
    on). A ≤ m-row operation at any key count."""
    return a.select("bit").unionByName(b.select("bit")).distinct()
