"""Iterative graph operators: connected components for dedup clusters.

Near-dup *pairs* (MinHash/SimHash/embedding) must become *clusters*
(keep one doc per component) — that's a connected-components problem,
the canonical iterative, non-SQL-expressible step of an LLM dedup
pipeline.

Algorithm: min-label propagation (a.k.a. "hash-to-min" simplified) —
every node repeatedly adopts the smallest id among itself and its
neighbors until a fixpoint. Each iteration is one join + one
aggregate (two shuffles on skinny (node, label) pairs); iterations
needed = graph diameter, which for dedup clusters is tiny (near-dup
components are dense and shallow). ``localCheckpoint`` truncates the
lineage each round so plans don't grow exponentially across
iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "dedup_survivors"]


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Label every node of the pair graph with its component's min id.

    Returns (node, component). Deterministic for any edge order.
    Converges in O(diameter) rounds; raises if ``max_iter`` rounds
    don't reach the fixpoint (pathological chain — raise the budget).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # undirected: both directions, plus self-loops to keep isolated ids
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )

    for it in range(max_iter):
        # each node adopts min(own label, neighbors' labels)
        neighbor_labels = (
            sym.join(labels, sym.b == labels.node)
            .select(F.col("a").alias("node"), F.col("component"))
        )
        new_labels = (
            labels.union(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)  # truncate lineage per round
        )
        if it == 0 and max_iter > 1:
            # round 1 almost always changes labels; skip the
            # convergence-check job (the it=1 check still certifies
            # the fixpoint before returning)
            labels = new_labels
            continue
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")


def dedup_survivors(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Drop every near-duplicate except its component's min-id survivor.

    ``pairs`` is any (id_a, id_b) near-dup relation. Docs absent from
    the pair graph survive untouched — the anti-join removes only
    labeled non-survivors, so the full corpus is never shuffled beyond
    one skinny join.
    """
    comps = connected_components(pairs)
    losers = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
