"""Staging area for not-yet-registered round queries.

THE ROUND-14 PROMOTION BATCH (promote per the playbook): the nine
entries below — stratified_split_exact, attribution_last_touch,
woe_iv_value_deciles-family, basket rules, canonical selection,
record linkage, percentile parity, forecast backtest, incremental
cube — staged during round 12, plus any round-13 restock additions.
The round-13 batch of 12 was promoted (pins 236 -> 248) and the
first retire-or-merge wave (PARITY.md, 5 pairs) executed in the same
round per VERDICT r12 #3, leaving the registry at 243 with headroom
for the r14 promotion (243 + 12 = 255 < 260 cap).

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

from ..operators import quantiles as QT
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
# Round-14 pre-builds (the r13 batch above fills the next promotion
# window; these wait their turn, fully verified at build time)
# =====================================================================

from ..operators.quantiles import hash_coin  # noqa: E402


@register_staged(
    "stratified_split_exact",
    oracle="""
        WITH n_by AS (
            SELECT lang, CAST(count(*) AS BIGINT) AS n
            FROM documents GROUP BY 1
        ),
        splits AS (
            SELECT * FROM (VALUES ('train', 1, 8), ('val', 2, 1),
                                  ('test', 3, 1)) s(split, sid, w)
        ),
        alloc0 AS (
            SELECT lang, n, split, sid, w,
                   (n * w) // 10 AS base, (n * w) % 10 AS rem
            FROM n_by CROSS JOIN splits
        ),
        alloc AS (
            SELECT *,
                   base + CASE WHEN row_number() OVER (
                       PARTITION BY lang ORDER BY rem DESC, sid)
                       <= n - sum(base) OVER (PARTITION BY lang)
                       THEN 1 ELSE 0 END AS n_target
            FROM alloc0
        ),
        bounds AS (
            SELECT lang, split, n_target,
                   sum(n_target) OVER (
                       PARTITION BY lang ORDER BY sid
                       ROWS UNBOUNDED PRECEDING) AS cum
            FROM alloc
        ),
        ranked AS (
            SELECT lang, doc_id,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY CAST('0x' || substr(md5(
                           CAST(doc_id AS VARCHAR) || ':split'), 1, 5)
                           AS BIGINT), doc_id) AS rk
            FROM documents
        )
        SELECT b.lang, b.split, b.n_target,
               CAST(count(r.doc_id) AS BIGINT) AS n_docs,
               CAST(coalesce(sum(r.doc_id), 0) AS BIGINT) AS docid_sum,
               CAST(count(r.doc_id) AS BIGINT) = b.n_target
                   AS exact_count_ok
        FROM bounds b LEFT JOIN ranked r
          ON r.lang = b.lang
         AND r.rk > b.cum - b.n_target AND r.rk <= b.cum
        GROUP BY 1, 2, 3, b.cum
    """,
    tags=("llm-pipeline", "sampling", "window"),
)
def stratified_split_exact(spark, sf_dir):
    """Stratified 80/10/10 train/val/test split with EXACT per-stratum
    counts: per language the Hamilton (largest-remainder) targets are
    computed over the (split × weight) frame with the same integer
    div/mod/rank shape as order_line_proration, then documents are
    ranked by a deterministic md5 coin and sliced at the cumulative
    boundaries. Unlike rand()-seeded splits, MEMBERSHIP is a pure
    function of doc_id — the per-(lang, split) doc_id SUM crosses the
    engine compare, pinning the exact assignment, not just the
    counts; exact_count_ok pins the Hamilton targets.

    Scale shape: one rank window per stratum partition + a broadcast
    of the 3-row split table; the slice is a range predicate on the
    rank — one shuffle of (lang, coin) pairs at any corpus size."""
    docs = _t(spark, sf_dir, "documents").select("lang", "doc_id")
    n_by = docs.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n"))
    splits = spark.createDataFrame(
        [("train", 1, 8), ("val", 2, 1), ("test", 3, 1)],
        ["split", "sid", "w"],
    )
    lw = Window.partitionBy("lang")
    alloc0 = n_by.crossJoin(F.broadcast(splits)).select(
        "lang",
        "n",
        "split",
        "sid",
        "w",
        F.expr("(n * w) div 10").alias("base"),
        ((F.col("n") * F.col("w")) % 10).alias("rem"),
    )
    alloc = alloc0.select(
        "lang",
        "split",
        "sid",
        (
            F.col("base")
            + F.when(
                F.row_number().over(lw.orderBy(F.desc("rem"), "sid"))
                <= F.col("n") - F.sum("base").over(lw),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias("n_target"),
    )
    bounds = alloc.select(
        "lang",
        "split",
        "n_target",
        F.sum("n_target")
        .over(lw.orderBy("sid").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    ranked = docs.select(
        "lang",
        "doc_id",
        F.row_number()
        .over(lw.orderBy(hash_coin(F.col("doc_id"), ":split"), "doc_id"))
        .alias("rk"),
    )
    joined = bounds.alias("bd").join(
        ranked.alias("r"),
        (F.col("r.lang") == F.col("bd.lang"))
        & (F.col("r.rk") > F.col("bd.cum") - F.col("bd.n_target"))
        & (F.col("r.rk") <= F.col("bd.cum")),
        "left",
    )
    return (
        joined.groupBy(
            F.col("bd.lang").alias("lang"),
            F.col("bd.split").alias("split"),
            F.col("bd.n_target").alias("n_target"),
            F.col("bd.cum"),
        )
        .agg(
            F.count(F.col("r.doc_id")).cast("long").alias("n_docs"),
            F.coalesce(F.sum(F.col("r.doc_id")), F.lit(0))
            .cast("long")
            .alias("docid_sum"),
            (
                F.count(F.col("r.doc_id")).cast("long")
                == F.max(F.col("bd.n_target"))
            ).alias("exact_count_ok"),
        )
        .drop("cum")
    )


# =====================================================================
# Last-touch attribution (marketing-analytics staple)
# =====================================================================


@register_staged(
    "attribution_last_touch",
    oracle="""
        WITH attributed AS (
            SELECT coalesce(
                       last_value(CASE WHEN event_type <> 'purchase'
                                       THEN event_type END IGNORE NULLS)
                           OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING),
                       '(none)') AS channel,
                   event_type
            FROM events
        ),
        p AS (SELECT channel FROM attributed
              WHERE event_type = 'purchase'),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM p)
        SELECT channel,
               CAST(count(*) AS BIGINT) AS n_purchases,
               CAST((count(*) * 10000) // max(t.n) AS BIGINT) AS share_bp,
               max(t.n) AS total_purchases
        FROM p, tot t GROUP BY 1
    """,
    tags=("analytics", "window", "sessionization"),
)
def attribution_last_touch(spark, sf_dir):
    """Last-touch channel attribution: each purchase is credited to
    the user's most recent PRECEDING non-purchase event type (the
    classic marketing-attribution rule), '(none)' when the purchase
    is the user's first event. The window is last_value IGNORE NULLS
    over rows strictly before the current one under the total
    (ts, event_id) order — engine-identical. Outputs are exact
    counts + integer-basis-point shares.

    Scale shape: one window partitioned by the natural user key over
    the event stream, then a ≤|event types|-row groupBy — one
    exchange, no self-joins."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    attributed = _t(spark, sf_dir, "events").select(
        "event_type",
        F.coalesce(
            F.last(
                F.when(
                    F.col("event_type") != "purchase", F.col("event_type")
                ),
                ignorenulls=True,
            ).over(w),
            F.lit("(none)"),
        ).alias("channel"),
    )
    p = attributed.filter(F.col("event_type") == "purchase").select("channel")
    tot = p.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        p.groupBy("channel")
        .agg(F.count(F.lit(1)).cast("long").alias("n_purchases"))
        .crossJoin(F.broadcast(tot))
        .select(
            "channel",
            "n_purchases",
            F.expr("(n_purchases * 10000) div n").cast("long").alias(
                "share_bp"
            ),
            F.col("n").alias("total_purchases"),
        )
    )


# =====================================================================
# WOE / IV feature audit over value deciles (feature-engineering)
# =====================================================================


@register_staged(
    "woe_iv_value_deciles",
    oracle="""
        WITH lab AS (
            SELECT CAST(value AS DOUBLE) AS v, event_id,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS pos
            FROM events
        ),
        dec AS (
            -- floor-rank deciles (the gini discipline), NOT ntile:
            -- the engine computes the rank DISTRIBUTED (range
            -- exchange + partition offsets) and the floor formula is
            -- a pure function of (rank, n) both engines share
            SELECT pos,
                   ((row_number() OVER (ORDER BY v, event_id) - 1) * 10)
                       // (count(*) OVER ()) + 1 AS decile
            FROM lab
        ),
        per AS (
            SELECT decile,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(pos) AS BIGINT) AS n_pos,
                   CAST(count(*) - sum(pos) AS BIGINT) AS n_neg
            FROM dec GROUP BY 1
        ),
        tot AS (
            SELECT CAST(sum(n_pos) AS BIGINT) AS p,
                   CAST(sum(n_neg) AS BIGINT) AS q
            FROM per
        )
        SELECT CAST(decile AS BIGINT) AS decile, n, n_pos, n_neg,
               CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                   round(ln(CAST(n_pos * t.q AS DOUBLE)
                            / CAST(n_neg * t.p AS DOUBLE)), 4)
               END AS woe
        FROM per, tot t
    """,
    tags=("analytics", "quantile", "llm-pipeline"),
)
def woe_iv_value_deciles(spark, sf_dir):
    """Weight-of-evidence audit of the event value against the
    purchase label over exact deciles — the credit-scoring /
    feature-engineering primitive: floor-rank deciles under the total
    (value, event_id) order, exact positive/negative counts per
    decile, WOE = ln(n_pos·N / n_neg·P) on pure-integer inputs with
    one transcendental rounded to 4 dp (the bm25 discipline).
    Zero-count deciles yield NULL woe rather than ±inf (DuckDB's
    ln(0) raises; the guard is the contract).

    Scale shape: the rank is ``quantiles.distributed_rank`` — a range
    exchange + per-partition row_number + broadcast partition offsets
    — NOT the single-partition global window (the first cut used
    ntile and measured 14.5× on the sf1→sf10 decade; this shape
    re-measured 2.0×). The oracle's serial row_number produces the
    identical total-order rank."""
    lab = _t(spark, sf_dir, "events").select(
        F.col("value").cast("double").alias("v"),
        "event_id",
        (F.col("event_type") == "purchase").cast("int").alias("pos"),
    )
    n1 = lab.agg(F.count(F.lit(1)).alias("n_all"))
    dec = (
        QT.distributed_rank(lab, ["v", "event_id"], "rk")
        .crossJoin(F.broadcast(n1))
        .select(
            "pos",
            (
                F.expr("((rk - 1) * 10) div n_all") + 1
            ).alias("decile"),
        )
    )
    per = (
        dec.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("pos").cast("long").alias("n_pos"),
            (F.count(F.lit(1)) - F.sum("pos")).cast("long").alias("n_neg"),
        )
        # 10 rows; materialize so the tot fan-out below reads this
        # frame instead of re-executing the whole rank lineage (the
        # gini fan-out discipline — one rank execution per query)
        .localCheckpoint(eager=True)
    )
    tot = per.agg(
        F.sum("n_pos").cast("long").alias("p"),
        F.sum("n_neg").cast("long").alias("q"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        F.col("decile").cast("long").alias("decile"),
        "n",
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(
                F.log(
                    (F.col("n_pos") * F.col("q")).cast("double")
                    / (F.col("n_neg") * F.col("p")).cast("double")
                ),
                4,
            ),
        ).alias("woe"),
    )


# =====================================================================
# Market-basket association rules (co-purchase support/confidence/lift)
# =====================================================================

_MBA_MIN_SUPPORT = 3
_MBA_TOPK = 20


@register_staged(
    "basket_association_rules",
    oracle=f"""
        WITH items AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS item
            FROM lineitem
        ),
        n_baskets AS (
            SELECT CAST(count(DISTINCT ok) AS BIGINT) AS nb FROM items
        ),
        pairs AS (
            SELECT a.item AS x, b.item AS y,
                   CAST(count(*) AS BIGINT) AS n_xy
            FROM items a JOIN items b
              ON a.ok = b.ok AND a.item < b.item
            GROUP BY 1, 2 HAVING count(*) >= {_MBA_MIN_SUPPORT}
        ),
        freq AS (
            SELECT item, CAST(count(*) AS BIGINT) AS nf FROM items
            GROUP BY 1
        )
        SELECT p.x, p.y, p.n_xy,
               fx.nf AS n_x, fy.nf AS n_y,
               CAST((p.n_xy * 10000) // b.nb AS BIGINT) AS support_bp,
               CAST((p.n_xy * 10000) // fx.nf AS BIGINT) AS conf_x_bp,
               round(CAST(p.n_xy * b.nb AS DOUBLE)
                     / CAST(fx.nf * fy.nf AS DOUBLE), 4) AS lift
        FROM pairs p
        JOIN freq fx ON fx.item = p.x
        JOIN freq fy ON fy.item = p.y
        CROSS JOIN n_baskets b
        ORDER BY lift DESC, x, y LIMIT {_MBA_TOPK}
    """,
    tags=("analytics", "topk", "join"),
)
def basket_association_rules(spark, sf_dir):
    """Association-rule mining over co-purchase baskets (the retail
    analytics classic): per part pair in the same order, support /
    confidence in integer basis points and lift = n_xy·N / (n_x·n_y)
    — integer products, ONE IEEE division (bit-stable), rounded 4 dp
    before the (lift, x, y) rank. The ≥{ms}-basket support floor
    prunes noise pairs before the marginal joins.

    Scale shape: the pair generation is a SELF-JOIN CO-PARTITIONED on
    the basket key (one shuffle of the item list; within-basket
    expansion is bounded by basket size², ≤ ~21 rows per TPC-H
    order); marginals group over the item domain; the cut is
    TakeOrderedAndProject.""".format(ms=_MBA_MIN_SUPPORT)
    items = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("item"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nb = items.agg(F.count_distinct("ok").cast("long").alias("nb"))
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.ok") == F.col("b.ok"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("x"), F.col("b.item").alias("y"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_xy"))
        .filter(F.col("n_xy") >= _MBA_MIN_SUPPORT)
    )
    freq = items.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("nf")
    )
    fx = freq.select(F.col("item").alias("x"), F.col("nf").alias("n_x"))
    fy = freq.select(F.col("item").alias("y"), F.col("nf").alias("n_y"))
    out = (
        pairs.join(fx, "x")
        .join(fy, "y")
        .crossJoin(F.broadcast(nb))
        .select(
            "x",
            "y",
            "n_xy",
            "n_x",
            "n_y",
            F.expr("(n_xy * 10000) div nb").cast("long").alias("support_bp"),
            F.expr("(n_xy * 10000) div n_x").cast("long").alias("conf_x_bp"),
            F.round(
                (F.col("n_xy") * F.col("nb")).cast("double")
                / (F.col("n_x") * F.col("n_y")).cast("double"),
                4,
            ).alias("lift"),
        )
    )
    return out.orderBy(F.desc("lift"), "x", "y").limit(_MBA_TOPK)


# =====================================================================
# Canonical selection inside exact-duplicate clusters (dedup keep-rule)
# =====================================================================

_CANON_PLANT_OFFSET = 100_000_000


@register_staged(
    "dedup_canonical_selection",
    oracle=f"""
        WITH corpus AS (
            SELECT doc_id, lang, text, n_chars FROM documents
            UNION ALL
            SELECT doc_id + {_CANON_PLANT_OFFSET}, lang, text, n_chars
            FROM documents WHERE doc_id % 17 = 0
        ),
        hashed AS (
            SELECT doc_id, lang, n_chars, md5(text) AS digest FROM corpus
        ),
        clusters AS (
            SELECT digest FROM hashed GROUP BY 1 HAVING count(*) > 1
        ),
        members AS (
            SELECT h.* FROM hashed h JOIN clusters c USING (digest)
        ),
        keep AS (
            SELECT digest, lang, doc_id, n_chars,
                   row_number() OVER (
                       PARTITION BY digest
                       ORDER BY n_chars DESC, doc_id) AS rk
            FROM members
        )
        SELECT lang,
               CAST(count(DISTINCT digest) AS BIGINT) AS n_clusters,
               CAST(count(*) AS BIGINT) AS n_cluster_docs,
               CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_kept,
               CAST(sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dropped,
               min(CASE WHEN rk = 1
                        THEN doc_id < {_CANON_PLANT_OFFSET} END)
                   AS all_kept_are_originals
        FROM keep GROUP BY 1
    """,
    tags=("dedup", "text", "llm-pipeline"),
)
def dedup_canonical_selection(spark, sf_dir):
    """The KEEP-rule half of exact dedup — which document survives a
    duplicate cluster: every 17th doc is re-planted with a shifted id
    (same text), clusters form on the md5 digest, and the canonical
    member is the (longest, then lowest-id) row. Falsifiable: the
    planted copy can never win (same length, higher id), so
    all_kept_are_originals must hold in both engines; cluster /
    member / kept / dropped counts per language cross the compare.

    Scale shape: digest groupBy (the dedup_exact shape) + one window
    partitioned by digest over CLUSTER MEMBERS only — the keep-rule
    never touches unique documents."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", "n_chars"
    )
    planted = d.filter(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + _CANON_PLANT_OFFSET).alias("doc_id"),
        "lang",
        "text",
        "n_chars",
    )
    hashed = (
        d.unionByName(planted)
        .select("doc_id", "lang", "n_chars", F.md5("text").alias("digest"))
    )
    clusters = (
        hashed.groupBy("digest")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .select("digest")
    )
    members = hashed.join(clusters, "digest")
    keep = members.select(
        "digest",
        "lang",
        "doc_id",
        F.row_number()
        .over(
            Window.partitionBy("digest").orderBy(F.desc("n_chars"), "doc_id")
        )
        .alias("rk"),
    )
    return keep.groupBy("lang").agg(
        F.count_distinct("digest").cast("long").alias("n_clusters"),
        F.count(F.lit(1)).cast("long").alias("n_cluster_docs"),
        F.sum((F.col("rk") == 1).cast("long")).cast("long").alias("n_kept"),
        F.sum((F.col("rk") > 1).cast("long")).cast("long").alias("n_dropped"),
        F.min(
            F.when(
                F.col("rk") == 1, F.col("doc_id") < _CANON_PLANT_OFFSET
            )
        ).alias("all_kept_are_originals"),
    )


# =====================================================================
# Record linkage: blocked fuzzy match with planted typos
# =====================================================================

_RL_OFFSET = 1_000_000


@register_staged(
    "record_linkage_fuzzy_parts",
    oracle=f"""
        WITH names AS (
            SELECT p_name AS name, min(p_partkey) AS id
            FROM part GROUP BY 1
        ),
        dirty AS (
            -- deterministic typo: drop the 3rd character
            SELECT substr(name, 1, 2) || substr(name, 4) AS name,
                   id + {_RL_OFFSET} AS id, id AS src_id
            FROM names WHERE id % 7 = 0 AND length(name) >= 5
        ),
        cand AS (
            SELECT d.id AS dirty_id, d.src_id, n.id AS clean_id,
                   levenshtein(d.name, n.name) AS dist
            FROM dirty d JOIN names n
              ON substr(d.name, 1, 2) = substr(n.name, 1, 2)
        ),
        matches AS (SELECT * FROM cand WHERE dist <= 2)
        SELECT
            (SELECT CAST(count(*) AS BIGINT) FROM dirty) AS n_planted,
            (SELECT CAST(count(*) AS BIGINT) FROM names) AS n_clean,
            (SELECT CAST(count(*) AS BIGINT) FROM cand)
                AS n_candidate_pairs,
            (SELECT CAST(count(*) AS BIGINT) FROM matches) AS n_matches,
            (SELECT CAST(count(*) AS BIGINT) FROM matches
             WHERE clean_id = src_id) AS n_source_hits,
            (SELECT count(*) FROM matches WHERE clean_id = src_id)
                = (SELECT count(*) FROM dirty) AS recall_ok
    """,
    tags=("dedup", "join", "text"),
)
def record_linkage_fuzzy_parts(spark, sf_dir):
    """Record linkage / entity resolution over a dirty dimension: a
    deterministic typo (3rd character dropped) is planted into every
    7th distinct part name, then blocked fuzzy matching recovers the
    source — block on the first two characters (invariant under the
    deletion), candidate pairs scored with Levenshtein (classic DP,
    integer-identical across engines), match at distance ≤ 2.
    Falsifiable: a 1-deletion typo has distance exactly 1 to its
    source and shares its block, so recall_ok (every planted row
    links back) must hold; candidate/match/natural-near-pair counts
    cross the compare.

    Scale shape: entity DICTIONARIES are small (64 distinct names
    here; dictionaries stay ≪ fact tables at any SF) — the design
    that scales is the block-key equi-join bounding the quadratic
    verify to within-block pairs, exactly the MinHash-band shape for
    strings too short to shingle."""
    names = (
        _t(spark, sf_dir, "part")
        .groupBy(F.col("p_name").alias("name"))
        .agg(F.min("p_partkey").alias("id"))
        .localCheckpoint(eager=True)
    )
    dirty = names.filter(
        (F.col("id") % 7 == 0) & (F.length("name") >= 5)
    ).select(
        F.concat(
            F.substring("name", 1, 2), F.expr("substr(name, 4)")
        ).alias("name"),
        (F.col("id") + _RL_OFFSET).alias("id"),
        F.col("id").alias("src_id"),
    )
    cand = dirty.alias("d").join(
        names.alias("n"),
        F.substring(F.col("d.name"), 1, 2)
        == F.substring(F.col("n.name"), 1, 2),
    ).select(
        F.col("d.id").alias("dirty_id"),
        F.col("d.src_id").alias("src_id"),
        F.col("n.id").alias("clean_id"),
        F.levenshtein(F.col("d.name"), F.col("n.name")).alias("dist"),
    )
    matches = cand.filter(F.col("dist") <= 2)
    n_planted = dirty.agg(F.count(F.lit(1)).cast("long").alias("n_planted"))
    n_clean = names.agg(F.count(F.lit(1)).cast("long").alias("n_clean"))
    n_cand = cand.agg(
        F.count(F.lit(1)).cast("long").alias("n_candidate_pairs")
    )
    m = matches.agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.sum((F.col("clean_id") == F.col("src_id")).cast("long"))
        .cast("long")
        .alias("n_source_hits"),
    )
    return (
        n_planted.crossJoin(n_clean)
        .crossJoin(n_cand)
        .crossJoin(m)
        .select(
            "n_planted",
            "n_clean",
            "n_candidate_pairs",
            "n_matches",
            "n_source_hits",
            (F.col("n_source_hits") == F.col("n_planted")).alias(
                "recall_ok"
            ),
        )
    )


# =====================================================================
# Interpolated-percentile parity (built-in aggregate cross-engine)
# =====================================================================


@register_staged(
    "percentile_cont_quartiles",
    oracle="""
        WITH q AS (
            SELECT l_returnflag,
                   CAST(count(*) AS BIGINT) AS n,
                   quantile_cont(CAST(l_quantity AS DOUBLE),
                                 [0.25, 0.5, 0.75]) AS qs
            FROM lineitem GROUP BY 1
        )
        SELECT l_returnflag, n,
               qs[1] AS q25, qs[2] AS q50, qs[3] AS q75
        FROM q
    """,
    tags=("quantile", "analytics"),
)
def percentile_cont_quartiles(spark, sf_dir):
    """Linear-interpolated quartiles of an integer-valued measure per
    group, via the BUILT-IN exact percentile aggregate on both
    engines (Spark ``percentile`` == DuckDB ``quantile_cont``, both
    defined as rank h = (n−1)·q with linear interpolation). On an
    integer-valued DOUBLE column with q ∈ {{¼, ½, ¾}} every
    interpolation is exact binary arithmetic — the values cross the
    hash compare UNROUNDED, pinning that the two engines implement
    the same estimator definition bit-for-bit.

    Scale note: the exact percentile sorts within each group — the
    calibration arm. At 100 TB the production path is
    approx_percentile / the sampled_quantiles operator; this entry
    pins the definition they converge to."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(
            "percentile(CAST(l_quantity AS DOUBLE), array(0.25D, 0.5D, 0.75D))"
        ).alias("qs"),
    ).select(
        "l_returnflag",
        "n",
        F.col("qs")[0].alias("q25"),
        F.col("qs")[1].alias("q50"),
        F.col("qs")[2].alias("q75"),
    )


# =====================================================================
# Seasonal-naive forecast backtest (planted weekly seasonality)
# =====================================================================

_SNB_ANCHOR = "1995-01-02"  # a Monday; weekday = days-since mod 7


@register_staged(
    "seasonal_naive_backtest",
    oracle=f"""
        WITH daily0 AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2)))
                        * 100, 0) AS BIGINT) AS cents
            FROM orders GROUP BY 1
        ),
        daily AS (
            -- plant weekly seasonality: weekend days x2 (the signal
            -- the lag-7 forecaster must exploit and lag-1 must not)
            SELECT day,
                   CASE WHEN date_diff('day', DATE '{_SNB_ANCHOR}', day)
                             % 7 >= 5
                        THEN cents * 2 ELSE cents END AS cents
            FROM daily0
            WHERE day >= DATE '{_SNB_ANCHOR}'
        ),
        lagged AS (
            SELECT day, cents,
                   lag(cents, 7) OVER (ORDER BY day) AS pred7,
                   lag(cents, 1) OVER (ORDER BY day) AS pred1
            FROM daily
        ),
        scored AS (SELECT * FROM lagged
                   WHERE pred7 IS NOT NULL AND pred1 IS NOT NULL)
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(abs(cents - pred7)) // count(*) AS BIGINT)
                   AS mae7_cents,
               CAST(sum(abs(cents - pred1)) // count(*) AS BIGINT)
                   AS mae1_cents,
               sum(abs(cents - pred7)) < sum(abs(cents - pred1))
                   AS seasonal_beats_naive_ok,
               CAST((sum(abs(cents - pred7)) * 10000)
                    // sum(abs(cents - pred1)) AS BIGINT)
                   AS mae_ratio_bp
        FROM scored
    """,
    tags=("analytics", "window", "monitoring"),
)
def seasonal_naive_backtest(spark, sf_dir):
    """Forecast-model backtesting in ALL-INTEGER cents: weekly
    seasonality is PLANTED into the daily revenue series (weekend
    days ×2 — the generator's hash-uniform dates carry no natural
    weekday signal, so the contract is constructed, the CUSUM
    pattern), then the seasonal-naive forecaster (lag 7) is scored
    against the last-value baseline (lag 1) by exact integer MAE.
    Falsifiable: lag-7 sees through the planted weekly pattern while
    lag-1 keeps paying the weekend jumps, so
    seasonal_beats_naive_ok must hold and the MAE ratio (integer
    basis points) crosses the compare.

    Scale shape: the heavy work is the daily partial-agg groupBy at
    the scan; both lags run in ONE window pass over the bounded
    daily series (≤ ~2,400 rows at any SF)."""
    anchor = F.lit(_SNB_ANCHOR).cast("date")
    daily0 = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(12,2)")) * 100, 0
            )
            .cast("long")
            .alias("cents")
        )
        .filter(F.col("day") >= anchor)
    )
    daily = daily0.select(
        "day",
        F.when(
            F.pmod(F.datediff(F.col("day"), anchor), F.lit(7)) >= 5,
            F.col("cents") * 2,
        )
        .otherwise(F.col("cents"))
        .alias("cents"),
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "cents",
        F.lag("cents", 7).over(w).alias("pred7"),
        F.lag("cents", 1).over(w).alias("pred1"),
    ).filter(F.col("pred7").isNotNull() & F.col("pred1").isNotNull())
    e7 = F.sum(F.abs(F.col("cents") - F.col("pred7")))
    e1 = F.sum(F.abs(F.col("cents") - F.col("pred1")))
    return lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.expr(
            "sum(abs(cents - pred7)) div count(*)"
        ).cast("long").alias("mae7_cents"),
        F.expr(
            "sum(abs(cents - pred1)) div count(*)"
        ).cast("long").alias("mae1_cents"),
        (e7 < e1).alias("seasonal_beats_naive_ok"),
        F.expr(
            "(sum(abs(cents - pred7)) * 10000)"
            " div sum(abs(cents - pred1))"
        ).cast("long").alias("mae_ratio_bp"),
    )


# =====================================================================
# Incremental materialized-view maintenance (delta == recompute)
# =====================================================================

_IMV_CUT = "2000-06-01"


@register_staged(
    "incremental_cube_maintenance",
    oracle=f"""
        WITH full_cube AS (
            SELECT o_orderpriority,
                   date_trunc('month', CAST(o_orderdate AS DATE)) AS mo,
                   CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2)))
                        * 100, 0) AS BIGINT) AS cents,
                   CAST(count(*) AS BIGINT) AS n
            FROM orders GROUP BY 1, 2
        ),
        base AS (
            SELECT o_orderpriority,
                   date_trunc('month', CAST(o_orderdate AS DATE)) AS mo,
                   CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2)))
                        * 100, 0) AS BIGINT) AS cents,
                   CAST(count(*) AS BIGINT) AS n
            FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '{_IMV_CUT}'
            GROUP BY 1, 2
        ),
        delta AS (
            SELECT o_orderpriority,
                   date_trunc('month', CAST(o_orderdate AS DATE)) AS mo,
                   CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2)))
                        * 100, 0) AS BIGINT) AS cents,
                   CAST(count(*) AS BIGINT) AS n
            FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '{_IMV_CUT}'
            GROUP BY 1, 2
        ),
        merged AS (
            SELECT o_orderpriority, mo,
                   CAST(sum(cents) AS BIGINT) AS cents,
                   CAST(sum(n) AS BIGINT) AS n
            FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
            GROUP BY 1, 2
        ),
        cmp AS (
            SELECT coalesce(m.cents = f.cents AND m.n = f.n, FALSE) AS eq
            FROM merged m FULL JOIN full_cube f
              ON m.o_orderpriority = f.o_orderpriority AND m.mo = f.mo
        )
        SELECT
            (SELECT CAST(count(*) AS BIGINT) FROM full_cube) AS n_cells,
            (SELECT CAST(count(*) AS BIGINT) FROM base) AS n_base_cells,
            (SELECT CAST(count(*) AS BIGINT) FROM delta) AS n_delta_cells,
            (SELECT CAST(count(*) AS BIGINT) FROM merged) AS n_merged_cells,
            (SELECT coalesce(min(eq), FALSE) FROM cmp)
                AS merge_equals_recompute_ok
    """,
    tags=("analytics", "incremental", "money"),
)
def incremental_cube_maintenance(spark, sf_dir):
    """Incremental materialized-view maintenance, the warehouse
    refresh primitive: a (priority × month) revenue cube built from
    the pre-cutoff base plus a delta partial re-aggregated on top
    must equal the from-scratch recompute CELL FOR CELL — additive
    aggregates (exact DECIMAL-cents sums, counts) are the class for
    which delta maintenance is lossless, and the full-outer compare
    (empty ⇒ FALSE, the _tables_equal discipline) makes the equality
    falsifiable in both engines.

    Scale shape: at 100 TB this is the partition-overwrite pattern —
    the delta groupBy touches only new files, the merge re-aggregates
    partials (map-side combined), and the full recompute here is the
    CALIBRATION arm, not the production path."""
    cut = F.lit(_IMV_CUT).cast("date")

    def cube(df):
        return df.groupBy(
            "o_orderpriority",
            F.date_trunc("month", F.col("o_orderdate").cast("date")).alias(
                "mo"
            ),
        ).agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(12,2)")) * 100, 0
            )
            .cast("long")
            .alias("cents"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )

    # eager checkpoints: each cube is a bounded cell table that fans
    # out to both the count row and the full-outer compare — without
    # them every branch re-scans orders (6 scans, 26 shuffles in the
    # plan audit; 3 scans / 11 shuffles with)
    orders = _t(spark, sf_dir, "orders")
    full_cube = cube(orders).localCheckpoint(eager=True)
    base = cube(
        orders.filter(F.col("o_orderdate").cast("date") < cut)
    ).localCheckpoint(eager=True)
    delta = cube(
        orders.filter(F.col("o_orderdate").cast("date") >= cut)
    ).localCheckpoint(eager=True)
    merged = (
        base.unionByName(delta)
        .groupBy("o_orderpriority", "mo")
        .agg(
            F.sum("cents").cast("long").alias("cents"),
            F.sum("n").cast("long").alias("n"),
        )
    )
    eq = (
        merged.alias("m")
        .join(
            full_cube.alias("f"),
            (F.col("m.o_orderpriority") == F.col("f.o_orderpriority"))
            & (F.col("m.mo") == F.col("f.mo")),
            "full",
        )
        .agg(
            F.coalesce(
                F.min(
                    F.coalesce(
                        (F.col("m.cents") == F.col("f.cents"))
                        & (F.col("m.n") == F.col("f.n")),
                        F.lit(False),
                    )
                ),
                F.lit(False),
            ).alias("merge_equals_recompute_ok")
        )
    )
    counts = (
        full_cube.agg(F.count(F.lit(1)).cast("long").alias("n_cells"))
        .crossJoin(
            base.agg(F.count(F.lit(1)).cast("long").alias("n_base_cells"))
        )
        .crossJoin(
            delta.agg(F.count(F.lit(1)).cast("long").alias("n_delta_cells"))
        )
        .crossJoin(
            merged.agg(
                F.count(F.lit(1)).cast("long").alias("n_merged_cells")
            )
        )
    )
    return counts.crossJoin(F.broadcast(eq))


# =====================================================================
# Round-14 restock (added round 13: the promotion took the staged
# count 21 -> 9; these three return it to 12, keeping two rounds of
# promotion headroom stocked)
# =====================================================================


@register_staged(
    "fuzzy_join_edit1_fastss",
    oracle="""
        WITH v AS (
            SELECT c_custkey, c_name,
                   unnest(list_append(
                       list_transform(
                           range(1, length(c_name) + 1),
                           i -> substr(c_name, 1, i - 1) || substr(c_name, i + 1)
                       ),
                       c_name)) AS v
            FROM customer
        ),
        cand AS (
            SELECT DISTINCT a.c_custkey AS id_a, a.c_name AS name_a,
                            b.c_custkey AS id_b, b.c_name AS name_b
            FROM v a JOIN v b ON a.v = b.v AND a.c_custkey < b.c_custkey
        ),
        verified AS (
            SELECT id_a, id_b, levenshtein(name_a, name_b) AS dist
            FROM cand
            WHERE levenshtein(name_a, name_b) <= 1
        )
        SELECT CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(coalesce(sum(id_a + id_b), 0) AS BIGINT) AS key_sum,
               coalesce(min(dist) = 1 AND max(dist) = 1, true)
                   AS all_distance_1
        FROM verified
    """,
    tags=("dedup", "fuzzy", "join", "llm-pipeline"),
)
def fuzzy_join_edit1_fastss(spark, sf_dir):
    """Edit-distance<=1 fuzzy self-join via FastSS deletion
    neighborhoods (Bocek et al. 2007 — the all-pairs fuzzy-match shape
    record linkage and query-log canonicalization run at scale): two
    strings are within edit distance 1 iff their deletion
    neighborhoods U(s) = {s} + one-char deletions intersect, so
    blocking = explode each name into |s|+1 short keys, equi-join on
    the key, then verify the surviving candidates with the exact
    levenshtein kernel. NEVER an all-pairs compare: candidates are
    bounded by the neighborhood-key collision count (near-match pairs
    + same-variant ties), and the verify runs only on candidates.
    The customer names ("Customer#000000042") make the contract dense
    — every pair of ids differing in one decimal digit is a true
    match, so the pair COUNT, the id-sum checksum, and the
    all-distance-1 invariant all cross the engine compare.
    Completeness vs brute force is pinned by
    tests/test_staged_round14.py (FastSS recovers exactly the
    brute-force pair set on a sampled frame).

    100 TB shape: the explode is a row-local map (x|s|+1 rows of
    SKINNY (id, key) rows — the name never rides the wide shuffle),
    candidate pairs come from ONE groupBy(variant)-collect-explode
    pass (the MinHash ``_pairs_from_bands`` shape — no self-join, so
    the variant table is shuffled once, not twice), the distinct runs
    on bare int pairs, and names re-attach by id only for the
    bounded candidate set's levenshtein verify. The only quadratic
    term is per-variant group size — bounded here by how many strings
    share a deletion variant (a skew census on the variant key is the
    guard at open-vocabulary scale, same recipe as the MinHash
    hot-bucket census; unlike MinHash a hot variant cannot simply be
    DROPPED — edit-1 completeness has no redundant band — so the
    guard routes hot keys to a per-key self-join instead). The first
    cut joined (id, name, v) against itself and distinct-ed 4-string
    rows: sf1→sf10 decade 17.9× (wide shuffle + double scan); this
    shape measures 10.3× on the same step — linear in rows — and
    3.3× faster in absolute time at sf10, identical output."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    variants = cust.select(
        "c_custkey",
        F.explode(
            F.expr(
                "array_union(array(c_name), transform("
                "sequence(1, length(c_name)), i -> concat("
                "substring(c_name, 1, i - 1), "
                "substring(c_name, i + 1, length(c_name)))))"
            )
        ).alias("v"),
    )
    grouped = (
        variants.groupBy("v")
        .agg(F.array_sort(F.collect_list("c_custkey")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda a: F.transform(
                F.filter(F.col("ids"), lambda b: b > a),
                lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
            ),
        )
    )
    cand = (
        grouped.select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    named = cand.join(
        cust.select(
            F.col("c_custkey").alias("id_a"), F.col("c_name").alias("name_a")
        ),
        "id_a",
    ).join(
        cust.select(
            F.col("c_custkey").alias("id_b"), F.col("c_name").alias("name_b")
        ),
        "id_b",
    )
    verified = named.select(
        "id_a",
        "id_b",
        F.levenshtein("name_a", "name_b").alias("dist"),
    ).where(F.col("dist") <= 1)
    return verified.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.coalesce(F.sum(F.col("id_a") + F.col("id_b")), F.lit(0))
        .cast("long")
        .alias("key_sum"),
        F.coalesce(
            (F.min("dist") == 1) & (F.max("dist") == 1), F.lit(True)
        ).alias("all_distance_1"),
    )


@register_staged(
    "trend_ols_by_nation",
    oracle="""
        WITH daily AS (
            SELECT n.n_name,
                   date_diff('day', DATE '1992-01-01',
                             CAST(o.o_orderdate AS DATE)) AS x,
                   CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(12,2)))
                              * 100) AS BIGINT) AS y
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            GROUP BY 1, 2
        ),
        sums AS (
            SELECT n_name,
                   CAST(count(*) AS BIGINT) AS n_days,
                   CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
                   CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
                   CAST(sum(CAST(x AS DECIMAL(38,0))
                            * CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0))
                       AS sxy,
                   CAST(sum(CAST(x AS DECIMAL(38,0))
                            * CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0))
                       AS sxx
            FROM daily GROUP BY 1
        )
        SELECT n_name, n_days,
               round(CAST(CAST(n_days AS DECIMAL(38,0)) * sxy - sx * sy
                          AS DOUBLE)
                     / CAST(CAST(n_days AS DECIMAL(38,0)) * sxx - sx * sx
                            AS DOUBLE), 6) AS slope_cents_per_day,
               round(CAST(sy * sxx - sx * sxy AS DOUBLE)
                     / CAST(CAST(n_days AS DECIMAL(38,0)) * sxx - sx * sx
                            AS DOUBLE), 6) AS intercept_cents
        FROM sums
    """,
    tags=("analytics", "timeseries", "agg"),
)
def trend_ols_by_nation(spark, sf_dir):
    """Per-nation revenue trend via closed-form OLS over the daily
    series — the grouped-regression staple (is revenue growing, and
    how fast, per segment) computed WITHOUT any iterative solver:
    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) and the matching
    exact-numerator intercept = (Sy*Sxx - Sx*Sxy) / (n*Sxx - Sx^2),
    where x = days since 1992-01-01 and y = the day's revenue in
    integer cents. All five sufficient statistics accumulate in
    DECIMAL(38,0) (the gini/pareto headroom discipline: n*Sxy at
    sf100 daily-cents scale exceeds BIGINT, and DuckDB's HUGEINT
    would mask the overflow from small-SF dual-runs), then each
    output is ONE IEEE division of exact integers, rounded 6 —
    bit-identical in both engines.

    100 TB shape: one groupBy to the (nation, day) grain, one
    groupBy to nations — both map-side combinable; no window, no
    sort, no driver state. The regression never sees row-level data,
    only per-group sums — the classic sufficient-statistics
    pushdown."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("day"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    daily = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.datediff("day", F.lit("1992-01-01")).alias("x"))
        .agg(F.expr("CAST(round(sum(price) * 100) AS BIGINT)").alias("y"))
    )
    sums = daily.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.expr("CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0))").alias("sx"),
        F.expr("CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0))").alias("sy"),
        F.expr(
            "CAST(sum(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))"
            " AS DECIMAL(38,0))"
        ).alias("sxy"),
        F.expr(
            "CAST(sum(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))"
            " AS DECIMAL(38,0))"
        ).alias("sxx"),
    )
    return sums.select(
        "n_name",
        "n_days",
        F.round(
            F.expr(
                "CAST(CAST(n_days AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)"
                " / CAST(CAST(n_days AS DECIMAL(38,0)) * sxx - sx * sx"
                " AS DOUBLE)"
            ),
            6,
        ).alias("slope_cents_per_day"),
        F.round(
            F.expr(
                "CAST(sy * sxx - sx * sxy AS DOUBLE)"
                " / CAST(CAST(n_days AS DECIMAL(38,0)) * sxx - sx * sx"
                " AS DOUBLE)"
            ),
            6,
        ).alias("intercept_cents"),
    )


@register_staged(
    "ht_sampled_total_audit",
    oracle="""
        WITH li AS (
            SELECT l_returnflag,
                   CAST(round(CAST(l_extendedprice AS DECIMAL(12,2)) * 100)
                        AS BIGINT) AS cents,
                   CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)
                        || ':' || CAST(l_linenumber AS VARCHAR)
                        || ':ht'), 1, 5) AS BIGINT) AS coin
            FROM lineitem
        )
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN coin < 65536 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_sampled,
               CAST(sum(cents) AS BIGINT) AS exact_cents,
               CAST(sum(CASE WHEN coin < 65536 THEN cents ELSE 0 END) * 16
                    AS BIGINT) AS ht_est_cents,
               round(abs(sum(CASE WHEN coin < 65536 THEN cents ELSE 0 END)
                         * 16 - sum(cents))
                     / CAST(sum(cents) AS DOUBLE), 6) AS rel_err
        FROM li GROUP BY 1
    """,
    tags=("sampling", "approx", "agg"),
)
def ht_sampled_total_audit(spark, sf_dir):
    """Horvitz-Thompson total estimation from a deterministic
    scan-level Bernoulli sample, audited against the exact total —
    the estimate-before-you-scan primitive (BlinkDB-style approximate
    aggregation): rows whose md5 coin lands under p = 1/16 of the
    coin span are the sample; the HT estimator sum(y)/p = 16 * the
    sampled cents is an EXACT integer in both engines because the
    sample membership is a pure function of the key (the repo's
    hash_coin recipe — run/retry/engine-stable, and MERGEABLE:
    sample(A u B) = sample(A) u sample(B)). Per returnflag the exact
    total, the estimate, and the realized relative error (one IEEE
    division, rounded 6) all cross the compare — the estimator
    arithmetic is value-pinned, not just bounded.

    100 TB shape: the sample predicate is a plain scan filter (no
    shuffle, no state, prunes before any exchange), so the estimator
    touches ~6% of the data; the audit's exact branch exists for the
    contract and is exactly what the production path SKIPS."""
    from ..operators.quantiles import COIN_SPAN, hash_coin

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.expr(
            "CAST(round(CAST(l_extendedprice AS DECIMAL(12,2)) * 100)"
            " AS BIGINT)"
        ).alias("cents"),
        hash_coin(
            F.concat_ws(
                ":",
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
            ),
            ":ht",
        ).alias("coin"),
    )
    thresh = COIN_SPAN // 16
    sampled = (F.col("coin") < thresh).cast("long")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(sampled).cast("long").alias("n_sampled"),
            F.sum("cents").cast("long").alias("exact_cents"),
            (F.sum(F.col("cents") * sampled) * 16)
            .cast("long")
            .alias("ht_est_cents"),
            F.round(
                F.abs(
                    F.sum(F.col("cents") * sampled) * 16 - F.sum("cents")
                )
                / F.sum("cents").cast("double"),
                6,
            ).alias("rel_err"),
        )
    )
