"""Connected components / dedup survivors on known graphs; sketch
accuracy bounds vs exact."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.operators.graph import (
    connected_components,
    connected_components_two_phase,
    dedup_survivors,
)


def test_connected_components_known_graph(spark):
    # components: {1,2,3,4} (chain), {10,11}, {20} isolated via self-pair
    edges = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=2, id_b=3), Row(id_a=3, id_b=4),
         Row(id_a=10, id_b=11), Row(id_a=20, id_b=20)]
    )
    got = {r.node: r.component for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_connected_components_diameter_guard(spark):
    # a long chain must still converge within the budget (diameter 6)
    edges = spark.createDataFrame([Row(id_a=i, id_b=i + 1) for i in range(6)])
    got = {r.node: r.component for r in connected_components(edges, max_iter=10).collect()}
    assert set(got.values()) == {0}

    with pytest.raises(RuntimeError, match="converge"):
        connected_components(edges, max_iter=1)


def test_two_phase_known_graph(spark):
    edges = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=2, id_b=3), Row(id_a=3, id_b=4),
         Row(id_a=10, id_b=11), Row(id_a=20, id_b=20)]
    )
    got = {r.node: r.component for r in connected_components_two_phase(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_two_phase_beats_diameter_bound(spark):
    # chain of diameter 40: label propagation needs ~40 rounds, the
    # alternating-star algorithm must finish in O(log^2 n) — give it 10
    edges = spark.createDataFrame([Row(id_a=i, id_b=i + 1) for i in range(40)])
    got = {
        r.node: r.component
        for r in connected_components_two_phase(edges, max_iter=10).collect()
    }
    assert set(got.values()) == {0}
    assert len(got) == 41


def test_two_phase_equals_label_propagation_on_random_graphs(spark):
    import random

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        n_nodes, n_edges = 60, 45  # sparse -> several nontrivial components
        edges = spark.createDataFrame(
            [
                Row(id_a=rng.randrange(n_nodes), id_b=rng.randrange(n_nodes))
                for _ in range(n_edges)
            ]
        )
        lp = {r.node: r.component for r in connected_components(edges, max_iter=30).collect()}
        tp = {r.node: r.component for r in connected_components_two_phase(edges).collect()}
        assert tp == lp, f"seed {seed}: algorithms disagree"


def test_dedup_survivors_keeps_min_and_untouched(spark):
    docs = spark.createDataFrame([Row(doc_id=i, text=f"t{i}") for i in range(6)])
    pairs = spark.createDataFrame([Row(id_a=1, id_b=3), Row(id_a=3, id_b=5)])
    kept = sorted(r.doc_id for r in dedup_survivors(docs, pairs).collect())
    # cluster {1,3,5} -> survivor 1; docs 0,2,4 untouched
    assert kept == [0, 1, 2, 4]


def test_sketches_within_tolerance(spark, sf_dir):
    from api_kakfa_spark_airflow_s3_athena_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_partkey").alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
        F.percentile_approx("l_extendedprice", 0.5).alias("amed"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("emed"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05  # HLL++ default rsd
    assert abs(row.amed - row.emed) / row.emed < 0.05


def test_pagerank_matches_transparent_reimplementation(spark):
    """Operator ranks on a small weighted digraph must equal a plain
    Python power-iteration with the same formulation (1-d floor,
    weighted out-normalization, dangling mass dropped)."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.graph import pagerank

    raw = [(1, 2, 3.0), (1, 3, 1.0), (2, 3, 2.0), (3, 1, 1.0), (4, 1, 5.0)]
    edges = spark.createDataFrame(
        [Row(src=s, dst=d, w=w) for s, d, w in raw]
    )
    iters, d = 4, 0.85
    got = {r.node: r.rank for r in pagerank(edges, iters=iters, damping=d).collect()}

    nodes = {s for s, _, _ in raw} | {t for _, t, _ in raw}
    outw = {}
    for s, _, w in raw:
        outw[s] = outw.get(s, 0.0) + w
    ranks = {n: 1.0 for n in nodes}
    for _ in range(iters):
        contrib = {n: 0.0 for n in nodes}
        for s, t, w in raw:
            contrib[t] += ranks[s] * w / outw[s]
        ranks = {n: (1 - d) + d * contrib[n] for n in nodes}
    assert got.keys() == ranks.keys()
    for n in nodes:
        assert got[n] == pytest.approx(ranks[n], abs=1e-12), n
    # node 4 has no in-edges: floor only
    assert got[4] == pytest.approx(1 - d)


def test_pagerank_uniform_on_symmetric_regular_graph(spark):
    """On a symmetric uniform-weight cycle every node keeps rank 1.0
    at every iteration — a closed-form fixpoint check."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.graph import pagerank

    n = 6
    rows = []
    for i in range(n):
        rows.append(Row(src=i, dst=(i + 1) % n, w=1.0))
        rows.append(Row(src=(i + 1) % n, dst=i, w=1.0))
    got = pagerank(spark.createDataFrame(rows), iters=3).collect()
    assert len(got) == n
    for r in got:
        assert r.rank == pytest.approx(1.0, abs=1e-12)

def test_pagerank_from_index_equals_inline(spark):
    """The persisted-bucketed-edge path (pagerank_edge_index +
    pagerank_from_index) must produce the same ranks as the inline
    operator — same arithmetic, different physical layout. Compared at
    1e-9: both paths sum the same per-node contribution sets, but
    partial-sum ORDER differs with the layout, so bit-equality is not
    guaranteed (the registered query rounds to 6 dp for the same
    reason)."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.graph import (
        pagerank,
        pagerank_edge_index,
        pagerank_from_index,
    )
    from api_kakfa_spark_airflow_s3_athena_spark.sources.tables import (
        ensure_database,
    )

    raw = [(1, 2, 3.0), (1, 3, 1.0), (2, 3, 2.0), (3, 1, 1.0), (4, 1, 5.0),
           (2, 4, 0.5), (4, 3, 2.5)]
    edges = spark.createDataFrame([Row(src=s, dst=d, w=w) for s, d, w in raw])
    ensure_database(spark, "pr_test")
    spark.sql("DROP TABLE IF EXISTS pr_test.trans")
    pagerank_edge_index(edges, "pr_test.trans", buckets=4)

    inline = {r.node: r.rank for r in pagerank(edges, iters=4).collect()}
    indexed = {
        r.node: r.rank
        for r in pagerank_from_index(spark, "pr_test.trans", iters=4).collect()
    }
    assert inline.keys() == indexed.keys()
    for n, v in inline.items():
        assert indexed[n] == pytest.approx(v, abs=1e-9), n
    spark.sql("DROP TABLE IF EXISTS pr_test.trans")


def test_pagerank_index_scan_has_no_edge_exchange(spark):
    """The 100 TB claim, pinned on the PLAN: iterating against the
    bucketed transition table must not exchange the edge side — the
    only shuffles are the skinny rank/contribution frames. We assert
    no Exchange sits between the table scan and its first join."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.graph import (
        pagerank_edge_index,
        pagerank_from_index,
    )
    from api_kakfa_spark_airflow_s3_athena_spark.sources.tables import (
        ensure_database,
    )

    rows = [Row(src=i % 7, dst=(i * 3) % 11, w=1.0 + i % 3) for i in range(200)]
    ensure_database(spark, "pr_test")
    spark.sql("DROP TABLE IF EXISTS pr_test.trans_plan")
    pagerank_edge_index(spark.createDataFrame(rows), "pr_test.trans_plan", buckets=4)
    ranks = pagerank_from_index(spark, "pr_test.trans_plan", iters=1)
    plan = ranks._jdf.queryExecution().executedPlan().toString()
    # the bucketed scan must appear with its bucket count...
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan
    # ...AND have no Exchange between it and its join (round-6 review:
    # asserting only bucketedness lets a regression reintroduce an
    # edge-side shuffle above a still-bucketed scan). Walk the plan
    # tree text from the bucketed FileScan line upward through its
    # ancestors (each ancestor is the nearest line above with smaller
    # tree-prefix depth) and require a join before any Exchange.
    lines = plan.splitlines()

    def depth(s):
        for i, ch in enumerate(s):
            if ch not in " :+-*(0123456789)":
                return i
        return len(s)

    scan_idx = next(
        i for i, l in enumerate(lines) if "SelectedBucketsCount" in l
    )
    d = depth(lines[scan_idx])
    hit_join = False
    for i in range(scan_idx - 1, -1, -1):
        di = depth(lines[i])
        if di < d:
            d = di
            node = lines[i]
            assert "Exchange" not in node, (
                f"Exchange above the bucketed edge scan:\n{plan}"
            )
            if "Join" in node:
                hit_join = True
                break
    assert hit_join, f"no join found above the bucketed scan:\n{plan}"
    spark.sql("DROP TABLE IF EXISTS pr_test.trans_plan")


def test_triangle_count_known_graphs(spark):
    """K4 has 4 triangles; a path has 0; K4 plus a pendant vertex
    still has 4; counts pin nodes and edges too."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.graph import (
        triangle_count,
    )

    def tc(pairs):
        df = spark.createDataFrame([Row(u=a, v=b) for a, b in pairs])
        return triangle_count(df).collect()[0]

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    r = tc(k4)
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 6, 4)

    path = [(1, 2), (2, 3), (3, 4)]
    r = tc(path)
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 3, 0)

    pendant = k4 + [(4, 5)]
    r = tc(pendant)
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (5, 7, 4)

    # two triangles sharing an edge: {1,2,3} and {2,3,4}
    bowtie = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    r = tc(bowtie)
    assert r.n_triangles == 2


def test_triangle_count_hub_graph_matches_naive(spark):
    """A star hub plus random chords — the degree-orientation result
    must equal a driver-side brute-force count."""
    import itertools
    import random

    from api_kakfa_spark_airflow_s3_athena_spark.operators.graph import (
        triangle_count,
    )

    rng = random.Random(13)
    edges = {(0, i) for i in range(1, 30)}  # hub 0
    while len(edges) < 80:
        a, b = rng.sample(range(1, 30), 2)
        edges.add((min(a, b), max(a, b)))
    eset = set(edges)
    naive = sum(
        1
        for x, y, z in itertools.combinations(range(30), 3)
        if (x, y) in eset and (y, z) in eset and (x, z) in eset
    )
    df = spark.createDataFrame([Row(u=a, v=b) for a, b in sorted(edges)])
    r = triangle_count(df).collect()[0]
    assert r.n_triangles == naive and naive > 0


def test_degree_distribution_and_cooccurrence(spark):
    """cooccurrence_edges: weights = shared groups, min_support
    prunes, max_basket drops mega-groups; degree_distribution
    histogram on a known graph."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.graph import (
        cooccurrence_edges,
        degree_distribution,
    )

    rows = [
        # basket 1: items 1,2,3 ; basket 2: items 1,2 ; basket 3: 1,2
        *[Row(g=1, i=x) for x in (1, 2, 3)],
        *[Row(g=2, i=x) for x in (1, 2)],
        *[Row(g=3, i=x) for x in (1, 2)],
        # duplicate (g,i) rows must not inflate weights
        Row(g=1, i=1),
        # mega-basket dropped by max_basket=3
        *[Row(g=9, i=x) for x in range(100, 104)],
    ]
    df = spark.createDataFrame(rows)
    e = {
        (r.u, r.v): r.w
        for r in cooccurrence_edges(df, "g", "i", min_support=1, max_basket=3).collect()
    }
    assert e == {(1, 2): 3, (1, 3): 1, (2, 3): 1}
    e2 = {
        (r.u, r.v): r.w
        for r in cooccurrence_edges(df, "g", "i", min_support=2, max_basket=3).collect()
    }
    assert e2 == {(1, 2): 3}

    tri = spark.createDataFrame(
        [Row(u=1, v=2), Row(u=1, v=3), Row(u=2, v=3), Row(u=3, v=4)]
    )
    hist = {r.degree: r.n_nodes for r in degree_distribution(tri).collect()}
    assert hist == {1: 1, 2: 2, 3: 1}


def test_wedge_census_matches_join_volume_and_guard(spark):
    """Round-9: wedge_census must equal the exact oriented wedge
    volume (K4 oriented by (deg, id): out-degrees 3,2,1,0 => C(3,2)
    + C(2,2) = 4 wedges), and triangle_count's max_wedges guard must
    refuse over-budget graphs while passing under-budget ones with
    the identical result."""
    import pytest

    from api_kakfa_spark_airflow_s3_athena_spark.operators.graph import (
        triangle_count,
        wedge_census,
    )

    k4 = spark.createDataFrame(
        [Row(u=a, v=b) for a, b in [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]]
    )
    w = wedge_census(k4).collect()[0]
    assert (w.n_nodes, w.n_edges, w.n_wedges, w.max_outdeg) == (4, 6, 4, 3)

    # star: hub is always the HIGHER-degree endpoint => every leaf
    # orients INTO the hub, zero wedges, zero triangles possible
    star = spark.createDataFrame([Row(u=0, v=i) for i in range(1, 9)])
    ws = wedge_census(star).collect()[0]
    assert (ws.n_wedges, ws.max_outdeg) == (0, 1)

    with pytest.raises(ValueError, match="wedge census"):
        triangle_count(k4, max_wedges=3)
    r = triangle_count(k4, max_wedges=4).collect()[0]
    assert r.n_triangles == 4


def test_kcore_known_graphs(spark):
    """K4 plus a pendant chain: the 3-core is exactly K4 (every K4
    node keeps degree 3); the 2-core of a triangle with a tail is the
    triangle; a pure path has an empty 2-core; peeling CASCADES (the
    tail peels one node per round)."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.graph import kcore

    def kc(pairs, k):
        df = spark.createDataFrame([Row(u=a, v=b) for a, b in pairs])
        return {(r.node, r.core_degree) for r in kcore(df, k=k).collect()}

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    # pendant chain 4-5-6: dropping 6 drops 5 drops nothing else
    assert kc(k4 + [(4, 5), (5, 6)], 3) == {(1, 3), (2, 3), (3, 3), (4, 3)}
    tri_tail = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
    assert kc(tri_tail, 2) == {(1, 2), (2, 2), (3, 2)}
    assert kc([(1, 2), (2, 3), (3, 4)], 2) == set()


def test_label_propagation_two_triangles_and_star_oscillation(spark):
    """Two triangles bridged by one edge resolve to two communities
    rooted at each triangle's min label (hand-computed 4-round
    synchronous trace with min tie-break); a star 2-cycles under
    synchronous updates (the classic bipartite oscillation), which the
    fixed-round contract makes a well-defined, testable output."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.graph import (
        label_propagation,
    )

    def lp(pairs, rounds):
        df = spark.createDataFrame([Row(u=a, v=b) for a, b in pairs])
        return {
            (r.node, r.community)
            for r in label_propagation(df, rounds=rounds).collect()
        }

    two_tri = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (4, 6), (5, 6)]
    assert lp(two_tri, 4) == {
        (1, 1), (2, 1), (3, 1), (4, 3), (5, 3), (6, 3),
    }

    star = [(0, 1), (0, 2), (0, 3), (0, 4)]
    # r1: center adopts min leaf id 1, leaves adopt 0; r2 swaps back
    assert lp(star, 1) == {(0, 1), (1, 0), (2, 0), (3, 0), (4, 0)}
    assert lp(star, 2) == {(0, 0), (1, 1), (2, 1), (3, 1), (4, 1)}
