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

__all__ = [
    "connected_components",
    "connected_components_two_phase",
    "cooccurrence_edges",
    "dedup_survivors",
    "degree_distribution",
    "kcore",
    "label_propagation",
    "pagerank",
    "triangle_count",
    "wedge_census",
]


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 22,
) -> DataFrame:
    """Label every node of the pair graph with its component's min id.

    Returns (node, component). Deterministic for any edge order.
    Converges in O(diameter) rounds; raises if ``max_iter`` rounds
    don't reach the fixpoint (pathological chain — raise the budget).
    The default budget carries +2 headroom over the round-2 value of
    20: the every-other-round convergence probe below can detect a
    fixpoint up to 2 rounds after it happens, and the budget must not
    silently tighten what a graph that needed exactly 20 rounds could
    do before the probe cadence changed.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # undirected: both directions, plus self-loops to keep isolated ids
    sym = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        # lazy: the baseline label_sum probe below materializes it;
        # every round then joins the checkpointed blocks
        .localCheckpoint(eager=False)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )

    # Convergence check: per-node labels only ever DECREASE, so the
    # exact sum of labels is strictly monotone until the fixpoint —
    # comparing sums (one tiny shuffle-free aggregate on the
    # checkpointed labels) detects it. DECIMAL(38,0) keeps the sum
    # exact for any bigint ids. Checking every round costs one action
    # per round; near-dup graphs converge in 2-3 rounds, so instead
    # the sum is probed every OTHER round (a missed fixpoint round is
    # one extra cheap no-change iteration, and the doubled round stays
    # a single narrow-lineage plan — fewer driver round-trips overall).
    # localCheckpoint lands on the same cadence, truncating lineage to
    # at most two iterations of growth.
    def label_sum(lb) -> object:
        return lb.agg(F.sum(F.col("component").cast("decimal(38,0)"))).first()[0]

    # baseline: sum over the identity initialization, so the first
    # probe (after rounds 0-1) can already detect an a-priori fixpoint
    prev_sum = label_sum(labels)
    for it in range(max_iter):
        # each node adopts min(own label, neighbors' labels)
        neighbor_labels = (
            sym.join(labels, sym.b == labels.node)
            .select(F.col("a").alias("node"), F.col("component"))
        )
        labels = (
            labels.union(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # probe on odd iterations (it = 1, 3, ...) and on the final
        # budgeted round: equal sums across a probe interval imply
        # every intervening round was a no-op (labels are monotone
        # non-increasing), i.e. the fixpoint was reached.
        if it % 2 == 1 or it == max_iter - 1:
            # lazy checkpoint + probe = ONE job per probe round: the
            # sum aggregate materializes the checkpoint blocks
            labels = labels.localCheckpoint(eager=False)
            cur_sum = label_sum(labels)
            if cur_sum == prev_sum:
                return labels
            prev_sum = cur_sum
    raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")


def connected_components_two_phase(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Large-star/small-star connected components (the alternating-star
    algorithm of Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC 2014 — public literature).

    Same (node, component=min id) contract as
    :func:`connected_components`, but converges in O(log² n) rounds
    regardless of graph DIAMETER, where min-label propagation needs
    O(diameter) rounds — the 100 TB upgrade path for chain-shaped or
    high-diameter graphs (e.g. transitive near-dup chains), at the cost
    of slightly heavier rounds (two grouped joins instead of one).

    Each round:
    - *large-star*: every node connects its strictly-larger neighbors
      to the minimum of its neighborhood (including itself);
    - *small-star*: every node connects its smaller-or-equal neighbors
      (and itself) to that minimum.
    At the fixpoint every edge points directly at its component's
    min-id root (a star forest).
    """
    e0 = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    all_nodes = (
        e0.select(F.col("u").alias("node"))
        .union(e0.select(F.col("v").alias("node")))
        .distinct()
    )
    # orient descending (u > v), drop self-loops (isolated nodes are
    # re-attached from all_nodes at the end)
    e = (
        e0.filter(F.col("u") != F.col("v"))
        .select(
            F.greatest(F.col("u"), F.col("v")).alias("u"),
            F.least(F.col("u"), F.col("v")).alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    for it in range(max_iter):
        # ---- large-star ----
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(
            F.min(F.least(F.col("v"), F.col("u"))).alias("m")
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # ---- small-star (edges already oriented u > v) ----
        mn = large.groupBy("u").agg(F.min("v").alias("mn"))
        joined = large.join(mn, "u")
        new_e = (
            joined.filter(F.col("v") != F.col("mn"))
            .select(F.col("v").alias("u"), F.col("mn").alias("v"))
            .union(mn.select(F.col("u"), F.col("mn").alias("v")))
            .distinct()
            # LAZY checkpoint: the exceptAll probe below is the round's
            # one and only job — it materializes the checkpoint blocks
            # as a side effect, so the next round (and the final
            # labels) read truncated lineage without a separate eager
            # materialization job. Halves driver jobs per round vs
            # eager-checkpoint-then-probe.
            .localCheckpoint(eager=False)
        )
        changed = new_e.exceptAll(e).limit(1).count()
        e = new_e
        if changed == 0:
            labels = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
            roots_and_isolated = all_nodes.join(labels, "node", "left_anti").withColumn(
                "component", F.col("node")
            )
            return labels.union(roots_and_isolated)
    raise RuntimeError(
        f"connected_components_two_phase did not converge in {max_iter} iterations"
    )


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


def cooccurrence_edges(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_support: int = 1,
    max_basket: int = 1024,
) -> DataFrame:
    """Undirected co-occurrence graph from a (group, item) relation:
    an edge ``(u, v, w)`` with ``u < v`` for every item pair sharing a
    group, ``w`` = number of shared groups, kept when
    ``w >= min_support`` (support pruning is what turns a
    near-complete raw co-occurrence graph into an informative one).

    Scale shape: pairs are generated per group from one aggregation
    (collect_set + ordered-pair explode — the :func:`_pairs_from_bands`
    recipe, never a self-join of the full relation on the group key),
    so a group of k items costs k²/2 rows ONCE, map-side. Groups over
    ``max_basket`` items are dropped with the same justification as
    LSH's max_bucket: a degenerate mega-basket (one "order" holding
    the whole catalog) would contribute quadratic, low-information
    edges; real co-occurrence signal lives in small baskets. The
    weight aggregation shuffles skinny (u, v) pairs only.
    """
    grouped = (
        df.select(F.col(group_col).alias("__g"), F.col(item_col).alias("__i"))
        # no .distinct() pre-pass: collect_set already deduplicates
        # per group, and a distinct here would be a second full
        # shuffle of the relation (round-8 review finding)
        .groupBy("__g")
        .agg(F.array_sort(F.collect_set("__i")).alias("items"))
        .filter((F.size("items") > 1) & (F.size("items") <= max_basket))
    )
    pairs = F.flatten(
        F.transform(
            F.col("items"),
            lambda a: F.transform(
                F.filter(F.col("items"), lambda b: b > a),
                lambda b: F.struct(a.alias("u"), b.alias("v")),
            ),
        )
    )
    return (
        grouped.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= min_support)
    )


def degree_distribution(
    edges: DataFrame, u: str = "u", v: str = "v"
) -> DataFrame:
    """Degree histogram ``(degree, n_nodes)`` of an undirected edge
    list (assumed distinct, ``u < v``): two skinny aggregations —
    per-node degree, then the histogram. Both shuffle only (node) /
    (degree) longs; no width ever crosses an exchange."""
    deg = (
        edges.select(F.col(u).alias("n"))
        .unionAll(edges.select(F.col(v).alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


def kcore(
    edges: DataFrame,
    k: int = 2,
    u: str = "u",
    v: str = "v",
    max_iter: int = 30,
) -> DataFrame:
    """The k-core of an undirected graph (edges distinct, ``u < v``):
    the unique maximal subgraph in which every node has degree >= k
    (Seidman 1983, "Network structure and minimum degree") — the
    standard graph-curation filter: peripheral/spammy nodes peel off,
    the dense collaborative core remains. Returns ``(node,
    core_degree)`` — each surviving node with its degree INSIDE the
    core.

    Algorithm: iterative peeling. Each round computes degrees over
    the surviving edge set (two skinny aggregations), drops nodes
    under ``k``, and semi-joins the edge list down to survivors —
    edges shrink monotonically, so each round is cheaper than the
    last, and every shuffle carries only (node) / (u, v) longs. The
    surviving-node count is monotone non-increasing and the node set
    only ever shrinks, so an unchanged count between rounds IS the
    fixpoint (equal counts of nested sets imply equal sets — the
    label-sum probe trick from :func:`connected_components` in count
    form). Each round's edge frame is eagerly localCheckpointed: the
    lineage would otherwise stack one join per round, and the blocks
    are ContextCleaner-released. Rounds needed = peeling depth of the
    degree hierarchy, typically O(log n) in practice on heavy-tailed
    graphs; raises past ``max_iter`` (pathological chains — raise the
    budget).
    """
    cur = (
        edges.select(F.col(u).alias("a"), F.col(v).alias("b"))
        .localCheckpoint(eager=True)
    )
    prev_nodes = None
    for _ in range(max_iter):
        deg = (
            cur.select(F.col("a").alias("n"))
            .unionAll(cur.select(F.col("b").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        # materialize the surviving-node frame once per round: the
        # count probe AND the semi-join broadcast both read it, and
        # lazily each re-ran the round's full degree aggregation
        # (round-14, guide §1.2)
        keep = deg.filter(F.col("d") >= k).localCheckpoint(eager=True)
        n_keep = keep.count()
        if n_keep == 0:
            return keep.select(
                F.col("n").alias("node"), F.col("d").alias("core_degree")
            )
        if n_keep == prev_nodes:
            return keep.select(
                F.col("n").alias("node"), F.col("d").alias("core_degree")
            )
        prev_nodes = n_keep
        kn = keep.select("n")
        cur = (
            cur.join(kn.withColumnRenamed("n", "a"), "a", "semi")
            .join(kn.withColumnRenamed("n", "b"), "b", "semi")
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(f"kcore did not converge in {max_iter} iterations")


def label_propagation(
    edges: DataFrame,
    rounds: int = 4,
    u: str = "u",
    v: str = "v",
) -> DataFrame:
    """Community detection by SYNCHRONOUS label propagation (Raghavan
    et al. 2007, "Near linear time algorithm to detect community
    structures"), made fully deterministic: every node starts labeled
    with its own id; each round EVERY node simultaneously adopts the
    label most frequent among its neighbors, ties broken by the
    SMALLEST label. Returns ``(node, community)`` after exactly
    ``rounds`` rounds. Input edges distinct with ``u < v`` (the
    :func:`cooccurrence_edges` contract, same as :func:`kcore` and
    :func:`triangle_count`) — duplicate edges would double-count
    votes.

    Fixed-round semantics by design, not convergence: synchronous
    LPA can 2-cycle on bipartite-ish regions (the classic oscillation
    ), so "the labeling after R rounds" is the well-defined
    deterministic contract — identical on any engine that applies the
    same vote/tie rule, which is what makes a value-level SQL twin
    possible (the kcore/PageRank unroll trick). Asynchronous LPA
    converges faster but is order-dependent — useless as a contract.

    Scale shape: each round is one join of the (2m)-row adjacency
    against the n-row label frame on the neighbor key + one
    (node, label) count + one argmax window over nodes — all shuffles
    carry longs. The adjacency is localCheckpointed ONCE and reused
    every round; labels are localCheckpointed per round to keep the
    lineage flat (the :func:`kcore` discipline). Hub nodes are safe:
    votes aggregate BEFORE the argmax, so a hub contributes one row
    per distinct neighbor label, not per edge."""
    adj = (
        edges.select(F.col(u).alias("n"), F.col(v).alias("nbr"))
        .unionAll(edges.select(F.col(v).alias("n"), F.col(u).alias("nbr")))
        .localCheckpoint(eager=True)
    )
    labels = adj.select("n").distinct().select("n", F.col("n").alias("lbl"))
    for _ in range(rounds):
        votes = (
            adj.join(labels.withColumnRenamed("n", "nbr"), "nbr")
            .groupBy("n", "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # argmax by (c desc, lbl asc) as ONE aggregation: max of the
        # (c, -lbl) struct — identical winner to the former
        # row_number window, without the per-round exchange+SORT
        # (round-14, guide §2.4; labels are non-negative node ids, so
        # the negation is a safe order-reversal)
        labels = (
            votes.groupBy("n")
            .agg(
                F.max(
                    F.struct(
                        F.col("c"), (-F.col("lbl")).alias("neg"),
                    )
                ).alias("m")
            )
            .select("n", (-F.col("m.neg")).alias("lbl"))
            .localCheckpoint(eager=True)
        )
    return labels.select(F.col("n").alias("node"), F.col("lbl").alias("community"))


def _degree_oriented(e: DataFrame) -> DataFrame:
    """Orient each undirected edge ``(a, b)`` from its
    lower-(degree, id) endpoint: returns ``(s, t, tk)`` where ``tk``
    is the target's (degree, id) struct key. Shared by
    :func:`triangle_count` (the wedge join) and
    :func:`wedge_census` (its work estimator) so the two always
    describe the same orientation."""
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    withdeg = (
        e.join(deg.select(F.col("n").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("n").alias("b"), F.col("d").alias("db")), "b")
    )
    ka = F.struct(F.col("da").alias("d"), F.col("a").alias("n"))
    kb = F.struct(F.col("db").alias("d"), F.col("b").alias("n"))
    return withdeg.select(
        F.when(ka < kb, F.col("a")).otherwise(F.col("b")).alias("s"),
        F.when(ka < kb, F.col("b")).otherwise(F.col("a")).alias("t"),
        F.when(ka < kb, kb).otherwise(ka).alias("tk"),
    )


def wedge_census(edges: DataFrame, u: str = "u", v: str = "v") -> DataFrame:
    """Pre-flight work estimator for :func:`triangle_count`: one row
    ``(n_nodes, n_edges, n_wedges, max_outdeg)`` where ``n_wedges`` =
    Σ C(outdeg, 2) under the degree orientation — EXACTLY the row
    count of the wedge join triangle counting launches, so wall time
    is near-proportional to it (measured 0.37-0.49 µs/wedge at
    0.5M-5.6M edges, NOTES round 9).

    Why it exists: edge count is NOT the scaling predictor on
    densifying graphs — the round-9 Zipf-degree measurement found
    wedge volume (and the triangle count itself) growing 19x for a
    10x edge step because the Zipf head compacts into a near-clique.
    This census is two skinny aggregations (degree, then per-source
    out-degree) — the ``join_key_skew_report`` discipline applied to
    graphs: census first, launch the quadratic-capable join knowingly.
    """
    e = edges.select(F.col(u).alias("a"), F.col(v).alias("b"))
    oriented = _degree_oriented(e)
    out = oriented.groupBy("s").agg(F.count(F.lit(1)).alias("od"))
    # pure LONG arithmetic end to end: od*(od-1) is always even, so
    # the shiftright halving is exact (Spark's / is DOUBLE division
    # even on longs) — the double-division form lost integer
    # exactness past 2^53, i.e. at exactly the hub sizes the census
    # exists to measure (round-9 review finding)
    wedges = out.agg(
        F.coalesce(
            F.shiftright(
                F.sum((F.col("od") * (F.col("od") - 1)).cast("long")), 1
            ),
            F.lit(0),
        ).alias("n_wedges"),
        F.coalesce(F.max("od"), F.lit(0)).alias("max_outdeg"),
    )
    counts = e.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .agg(F.count_distinct("n").alias("n_nodes"))
    )
    return counts.crossJoin(wedges).select(
        "n_nodes", "n_edges", "n_wedges", "max_outdeg"
    )


def triangle_count(
    edges: DataFrame, u: str = "u", v: str = "v", max_wedges: int = 0
) -> DataFrame:
    """Global triangle count of an undirected graph via DEGREE-ORDERED
    orientation (the compact-forward / node-iterator algorithm,
    Latapy 2008 — what Spark lacks as a builtin): orient every edge
    from its lower-(degree, id) endpoint to the higher, turning the
    graph into a DAG whose max out-degree is O(sqrt(m)); then count
    wedges sharing a source and close them against the oriented edge
    set. Each triangle {x,y,z} (deg-ordered x<y<z) is found EXACTLY
    once as the wedge (x→y, x→z) closed by y→z.

    Why this survives 100x scale where the naive 3-way self-join
    dies: wedge volume is Σ C(outdeg, 2) with outdeg bounded by
    O(sqrt(m)) under degree orientation — on a skewed graph the naive
    plan explodes on the hub (a degree-10⁶ node yields 10¹² wedges;
    oriented, a hub is almost always a wedge DESTINATION, not source).
    Joins are equi-joins on node ids, AQE-splittable.

    Input edges must be distinct with ``u < v``. Returns a single row
    ``(n_nodes, n_edges, n_triangles)``.

    ``max_wedges > 0`` runs :func:`wedge_census` FIRST and raises
    ``ValueError`` when Σ C(outdeg, 2) exceeds it — wedge volume is
    the join's actual row count and can grow superlinearly on
    densifying graphs (19x for 10x edges on the round-9 Zipf-degree
    fixture), so a budgeted caller censuses before launching (the
    ``max_queries`` / ``max_bins_per_interval`` discipline). The
    census costs two skinny aggregations and one extra scan of the
    edge frame; the default 0 skips it.
    """
    if max_wedges:
        w = wedge_census(edges, u, v).collect()[0]
        if w.n_wedges > max_wedges:
            raise ValueError(
                f"triangle_count: wedge census {w.n_wedges} exceeds "
                f"max_wedges={max_wedges} (max outdeg {w.max_outdeg}); "
                "the graph's degree head is too dense for this budget — "
                "raise the budget, or prune low-support edges first "
                "(cooccurrence_edges min_support)"
            )
    e = edges.select(F.col(u).alias("a"), F.col(v).alias("b"))
    oriented = _degree_oriented(e)
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.s") == F.col("e2.s")) & (F.col("e1.tk") < F.col("e2.tk")),
    ).select(F.col("e1.t").alias("x"), F.col("e2.t").alias("y"))
    closing = oriented.select(F.col("s").alias("x"), F.col("t").alias("y"))
    tri = wedges.join(closing, ["x", "y"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    counts = edges.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .agg(F.count_distinct("n").alias("n_nodes"))
    )
    return counts.crossJoin(tri).select("n_nodes", "n_edges", "n_triangles")


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Weighted PageRank by unrolled power iteration over a weighted
    edge list — the standard distributed formulation (Page et al.
    1999; Spark's own GraphX implements the same join-aggregate loop):

        rank'(v) = (1 - d) + d * sum_{u->v} rank(u) * w(u,v) / outw(u)

    Per iteration exactly TWO shuffles on skinny rows: contributions
    join ranks to edges on ``src`` (edges are re-used every round —
    at scale, write them bucketed by ``src`` so this join co-locates
    and only the tiny (node, rank) side moves), then aggregate on
    ``dst``. Nothing document-sized ever shuffles, and the rank frame
    is 2 columns however big the graph is. Fixed ``iters`` keeps the
    plan finite and SQL-expressible (the oracle unrolls the same
    three CTE steps); for convergence-driven runs, loop with
    ``localCheckpoint`` like :func:`connected_components`.

    Dangling nodes (no out-edges) simply contribute nothing — their
    rank mass is dropped, matching the oracle's formulation; nodes
    with no IN-edges keep the (1 - d) floor via the left join.

    Returns ``(node, rank)`` (double, unrounded).
    """
    e = edges.select(
        F.col(src).alias("__s"), F.col(dst).alias("__d"), F.col(weight).alias("__w")
    )
    outw = e.groupBy("__s").agg(F.sum("__w").alias("__ow"))
    # edge with precomputed transition probability w/outw — built once,
    # reused every iteration. cache(), deliberately NOT localCheckpoint:
    # checkpointing to a LogicalRDD erases stats, every iteration's
    # ranks-vs-edges join degrades from broadcast to sort-merge, and
    # warm runs go 3.0 -> 6.8 s (measured, order-line trade graph at
    # sf0.1). The price of cache is analysis lineage: the first call
    # pays ~5 s analysis + ~12 s codegen/cache-fill before settling at
    # ~3 s warm — acceptable for 3 fixed iterations; convergence-driven
    # loops should checkpoint the RANKS (see docstring), not the edges.
    # At 100 TB this is a persisted table bucketed by __s instead.
    trans = e.join(outw, "__s").select(
        "__s", "__d", (F.col("__w") / F.col("__ow")).alias("__p")
    ).cache()
    nodes = (
        e.select(F.col("__s").alias("node"))
        .union(e.select(F.col("__d").alias("node")))
        .distinct()
        .cache()
    )
    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    for _ in range(iters):
        contribs = (
            trans.join(ranks.withColumnRenamed("node", "__s"), "__s")
            .groupBy(F.col("__d").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("__p")).alias("__m"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (F.lit(1.0 - damping) + F.lit(damping) * F.coalesce("__m", F.lit(0.0))).alias(
                "rank"
            ),
        )
    # materialize the final ranks, then RELEASE the iteration caches —
    # without this every invocation strands two cached frames in
    # executor storage until LRU eviction (operator is therefore
    # eager, like connected_components). The checkpointed result is a
    # skinny (node, rank) frame.
    out = ranks.localCheckpoint(eager=True)
    trans.unpersist()
    nodes.unpersist()
    return out


def pagerank_edge_index(
    edges: DataFrame,
    table: str,
    buckets: int = 8,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> None:
    """Persist the PageRank TRANSITION table (``__s``, ``__d``,
    ``__p`` = w/outw(src)) as a managed table bucketed (and sorted) by
    ``__s`` — the write-once artifact :func:`pagerank_from_index`
    iterates against.

    This is the 100 TB swap the inline :func:`pagerank` docstring
    names: the per-iteration ranks-to-edges join on ``__s`` hits a
    bucketed, pre-sorted scan, so the edge table NEVER shuffles (only
    the skinny (node, rank) side is exchanged to match the buckets) and
    nothing is pinned in executor memory between runs. Build cost is
    one shuffle of the edge list, paid once per graph snapshot instead
    of per query.
    """
    from ..sources.tables import save_bucketed

    e = edges.select(
        F.col(src).alias("__s"), F.col(dst).alias("__d"), F.col(weight).alias("__w")
    )
    outw = e.groupBy("__s").agg(F.sum("__w").alias("__ow"))
    trans = e.join(outw, "__s").select(
        "__s", "__d", (F.col("__w") / F.col("__ow")).alias("__p")
    )
    save_bucketed(trans, table, ["__s"], buckets)


def pagerank_from_index(
    spark,
    table: str,
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank power iteration against a PERSISTED transition table
    (built by :func:`pagerank_edge_index`) — the warm-iteration path:
    no per-call cache fill, no unrolled-edge-lineage analysis, and the
    bucketed-by-``__s`` layout means each iteration exchanges only the
    skinny (node, rank) frame while the edge scan stays in place.
    Rank arithmetic is identical to :func:`pagerank` (equality pinned
    in tests/test_graph_approx.py at the oracle's 6-dp rounding).

    Returns ``(node, rank)`` (double, unrounded).
    """
    trans = spark.table(table)
    nodes = (
        trans.select(F.col("__s").alias("node"))
        .union(trans.select(F.col("__d").alias("node")))
        .distinct()
        # small (one row per node id), released by the ContextCleaner
        # when the frame goes out of scope — no cache() stranding
        .localCheckpoint(eager=True)
    )
    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    for _ in range(iters):
        contribs = (
            trans.join(ranks.withColumnRenamed("node", "__s"), "__s")
            .groupBy(F.col("__d").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("__p")).alias("__m"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (F.lit(1.0 - damping) + F.lit(damping) * F.coalesce("__m", F.lit(0.0))).alias(
                "rank"
            ),
        )
    return ranks
