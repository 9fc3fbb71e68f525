"""Staging area for not-yet-registered round queries.

Round-11 batch (12 entries — exactly the 12-new-per-round rotation
cap, built during round 10; the same discipline that staged the
round-9 batch): distribution sketches (sampled quantiles with an
exact-rank contract, weighted all-integer quantiles, robust
median/MAD stats, count-min point queries, HyperLogLog cardinality),
three exact-merge streaming sketch arms (count-min add, HLL max,
adaptive bounded-state sampling), retrieval/search additions
(positional phrase search, SQ8 quantized-rerank ANN), bloom-filter
join pruning, and per-document n-gram novelty.

Promotion playbook (the round-10 procedure, NOTES.md): move each
``@register_staged`` block into ``plans/queries.py`` as ``@register``
(specs are identical QuerySpec fields), bump the PARITY/README count
pins + ``tests/test_verification_ledger.py`` in the same commit, keep
total new registrations per round ≤ 12 so the stale cohort still fits
the driver's 50-row prefix.

Every entry here is dual-run verified locally (tools/oracle_check.py
--staged) and covered by tests; staged ≠ stubbed.
"""

from __future__ import annotations

import os
import tempfile
from typing import Dict, Optional, Tuple

from pyspark.sql import functions as F

from ..functions.text import tokens, word_shingles_from_tokens
from ..operators import bloom as BL
from ..operators import frequency as FQ
from ..operators import quantiles as QT
from ..operators import retrieval as RT
from ..operators import similarity as SIM
from ..operators.sketches import hll_estimate, hll_merge, hll_registers
from .queries import (
    QueryFn,
    QuerySpec,
    _STAGE_CACHE,
    _stream_partitions,
    _t,
)

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


# Shared oracle fragment: the corpus's word-trigram unit stream —
# character-identical tokenization to functions.text.tokens (see
# operators/frequency.WS_CLASS) and the registered streaming_kmv /
# kmv_source_overlap oracles.
_TRI_SQL = """
        toks AS (
            SELECT doc_id, lang, source,
                   list_filter(regexp_split_to_array(text,
                       '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '') AS t
            FROM documents
        ),
        tri AS (
            SELECT doc_id, lang, source,
                   unnest(list_transform(range(1, len(t) - 1),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS val
            FROM toks
        )
"""


def _tri_units(spark, sf_dir):
    """Engine twin of the _TRI_SQL fragment: one row per word-trigram
    occurrence with doc/lang/source."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        "source",
        F.explode(word_shingles_from_tokens(tokens(F.col("text")), 3)).alias("val"),
    )


# =====================================================================
# Sampled quantiles with exact-rank verification (operators/quantiles)
# =====================================================================

_QS = (0.25, 0.5, 0.75, 0.9, 0.99)
_Q_RATE = 131072  # of 2^20: keep 1/8 of rows
_Q_EPS = 0.08


@register_staged(
    "quantile_sketch_events",
    oracle=f"""
        WITH s AS (
            SELECT event_type, value, event_id FROM events
            WHERE CAST('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':qs'),
                       1, 5) AS BIGINT) < {_Q_RATE}
        ),
        r AS (
            SELECT event_type, value, event_id,
                   row_number() OVER (
                       PARTITION BY event_type ORDER BY value, event_id) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS ns
            FROM s
        ),
        qs AS (
            SELECT CAST(unnest([{", ".join(repr(q) for q in _QS)}]) AS DOUBLE) AS q
        ),
        est AS (
            SELECT event_type, q, value AS est_value,
                   CAST(ns AS BIGINT) AS sample_n
            FROM r CROSS JOIN qs
            WHERE rn = greatest(1, CAST(ceil(q * ns) AS INTEGER))
        ),
        chk AS (
            SELECT e.event_type, e.q, e.est_value, e.sample_n,
                   CAST(count(*) AS BIGINT) AS n_full,
                   CAST(sum(CASE WHEN f.value < e.est_value THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_lt,
                   CAST(sum(CASE WHEN f.value <= e.est_value THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_le
            FROM events f JOIN est e ON f.event_type = e.event_type
            GROUP BY 1, 2, 3, 4
        )
        SELECT event_type, q, est_value, sample_n, n_full, n_lt, n_le,
               (CAST(n_lt + 1 AS DOUBLE) <= (q + CAST({_Q_EPS!r} AS DOUBLE)) * n_full
                AND CAST(n_le AS DOUBLE) >= (q - CAST({_Q_EPS!r} AS DOUBLE)) * n_full)
                   AS rank_err_ok
        FROM chk
    """,
    tags=("sketch", "quantiles"),
    bench_fn=lambda spark, sf_dir: QT.sampled_quantiles(
        _t(spark, sf_dir, "events"), ["event_type"], "value", "event_id",
        list(_QS), rate_num=_Q_RATE,
    ),
)
def quantile_sketch_events(spark, sf_dir):
    """Per-event-type rank quantiles estimated from a deterministic
    1/8 Bernoulli hash sample (operators/quantiles.sampled_quantiles)
    with the exact-rank interval check as a per-row contract: the
    estimate's TRUE rank interval in the full data must sit within
    ±eps of q (Hoeffding/DKW bound made falsifiable — the check is
    one conditional aggregate, not a sort). At 100 TB only the sample
    enters the sort exchange; the verification pass is the audit-day
    pattern, not the hot path — bench_fn times the production shape
    (sample + estimate, no full-data check)."""
    ev = _t(spark, sf_dir, "events")
    est = QT.sampled_quantiles(
        ev, ["event_type"], "value", "event_id", list(_QS), rate_num=_Q_RATE
    )
    return QT.quantile_rank_check(est, ev, ["event_type"], "value", eps=_Q_EPS)


_MAD_C = 3.0 * 1.4826  # outlier cutoff multiplier (both engines get this literal)


@register_staged(
    "robust_stats_value",
    oracle=f"""
        WITH r AS (
            SELECT event_type, value, event_id,
                   row_number() OVER (
                       PARTITION BY event_type ORDER BY value, event_id) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM events
        ),
        med AS (
            SELECT event_type, value AS median FROM r
            WHERE rn = greatest(1, CAST(ceil(0.5 * n) AS INTEGER))
        ),
        dev AS (
            SELECT e.event_type, e.event_id,
                   abs(e.value - m.median) AS d
            FROM events e JOIN med m USING (event_type)
        ),
        rd AS (
            SELECT event_type, d,
                   row_number() OVER (
                       PARTITION BY event_type ORDER BY d, event_id) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM dev
        ),
        mad AS (
            SELECT event_type, d AS mad FROM rd
            WHERE rn = greatest(1, CAST(ceil(0.5 * n) AS INTEGER))
        )
        SELECT e.event_type,
               CAST(count(*) AS BIGINT) AS n,
               m.median,
               a.mad,
               CAST(sum(CASE WHEN abs(e.value - m.median) >
                             CAST({_MAD_C!r} AS DOUBLE) * a.mad
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               round(sum(CASE WHEN abs(e.value - m.median) >
                              CAST({_MAD_C!r} AS DOUBLE) * a.mad
                         THEN 1 ELSE 0 END) / count(*), 6) AS outlier_rate
        FROM events e
        JOIN med m USING (event_type)
        JOIN mad a USING (event_type)
        GROUP BY 1, 3, 4
    """,
    tags=("analytics", "robust"),
)
def robust_stats_value(spark, sf_dir):
    """Per-event-type robust location/spread: discrete median, MAD and
    ``|x − med| > 3·1.4826·MAD`` outlier counts
    (operators/quantiles.robust_stats) — the heavy-tail-safe
    complement to the mean/stddev z-scores of
    ``event_value_anomalies``. Exact two-sort form; the 100 TB path
    swaps each per-group sort for the sampled-quantile estimate above
    (same discrete rank rule, p-fraction exchanges)."""
    return QT.robust_stats(
        _t(spark, sf_dir, "events"), ["event_type"], "value", "event_id"
    )


# =====================================================================
# Count-min point queries over the trigram stream (operators/frequency)
# =====================================================================

_CMS_W = 1024
_CMS_D = 4
# oracle fragment: the d-row bucket expression for a unit expression
_CMS_BUCKET_SQL = (
    "CAST('0x' || substr(md5(CAST({j} AS VARCHAR) || ':' || {unit}), 1, 15)"
    " AS BIGINT) % " + str(_CMS_W)
)


def _cms_counters_sql() -> str:
    return f"""
        rows AS (SELECT unnest([0, 1, 2, 3]) AS j),
        cells AS (
            SELECT r.j AS row,
                   {_CMS_BUCKET_SQL.format(j="r.j", unit="t.val")} AS bucket,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM tri t CROSS JOIN rows r
            GROUP BY 1, 2
        )
"""


@register_staged(
    "countmin_trigram_freq",
    oracle=f"""
        WITH {_TRI_SQL},
        {_cms_counters_sql()},
        cnt AS (
            SELECT val, CAST(count(*) AS BIGINT) AS n_exact
            FROM tri GROUP BY val
        ),
        top AS (
            SELECT val, n_exact FROM cnt
            ORDER BY n_exact DESC, val LIMIT 20
        ),
        est AS (
            SELECT tp.val, tp.n_exact, min(c.cnt) AS cms_est
            FROM top tp
            CROSS JOIN rows r
            JOIN cells c
              ON c.row = r.j
             AND c.bucket = {_CMS_BUCKET_SQL.format(j="r.j", unit="tp.val")}
            GROUP BY 1, 2
        )
        SELECT val AS unit, n_exact,
               CAST(cms_est AS BIGINT) AS cms_est,
               CAST(cms_est - n_exact AS BIGINT) AS overcount,
               cms_est >= n_exact AS never_undercount_ok
        FROM est
    """,
    tags=("sketch", "frequency"),
    bench_fn=lambda spark, sf_dir: FQ.count_min_counters(
        _tri_units(spark, sf_dir).select(F.col("val").alias("unit")),
        "unit", width=_CMS_W, depth=_CMS_D,
    ),
)
def countmin_trigram_freq(spark, sf_dir):
    """Count-min point-query estimates for the corpus's top-20 exact
    trigrams (operators/frequency CMS): the d×w counter table is the
    ONLY state — at 100 TB the exchange stays 4×1024 rows (bounded
    domain ⇒ map-side combine collapses every partition) while the
    exact histogram this query also carries (for the contract)
    shuffles the unbounded distinct-trigram domain. Per-row crossing
    values: the estimate, the exact count, and the overcount; the
    never-undercount guarantee is the falsifiable boolean. bench_fn
    times the production shape (counter build only)."""
    units = _tri_units(spark, sf_dir).select(F.col("val").alias("unit"))
    counters = FQ.count_min_counters(units, "unit", width=_CMS_W, depth=_CMS_D)
    top = (
        units.groupBy("unit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
        .orderBy(F.desc("n_exact"), "unit")
        .limit(20)
    )
    lk = FQ.cms_lookup(counters, top, "unit", width=_CMS_W, depth=_CMS_D)
    return lk.select(
        "unit",
        "n_exact",
        "cms_est",
        (F.col("cms_est") - F.col("n_exact")).cast("long").alias("overcount"),
        (F.col("cms_est") >= F.col("n_exact")).alias("never_undercount_ok"),
    )


# =====================================================================
# HyperLogLog per-language trigram cardinality (operators/sketches)
# =====================================================================

from ..operators.sketches import HLL_M, HLL_SCALED_NUM  # noqa: E402


@register_staged(
    "hll_distinct_trigrams",
    oracle=f"""
        WITH {_TRI_SQL},
        h AS (
            SELECT DISTINCT lang,
                   CAST('0x' || substr(md5(val), 1, 15) AS BIGINT) AS h
            FROM tri
        ),
        regs AS (
            SELECT lang, h >> 52 AS idx,
                   max(CASE WHEN (h & ((CAST(1 AS BIGINT) << 52) - 1)) = 0
                            THEN 53
                            ELSE 53 - length(bin(h & ((CAST(1 AS BIGINT) << 52) - 1)))
                       END) AS rho
            FROM h GROUP BY 1, 2
        ),
        agg AS (
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_hit,
                   CAST(sum(CAST(1 AS BIGINT) << (53 - rho))
                        + ({HLL_M} - count(*)) * (CAST(1 AS BIGINT) << 53)
                        AS BIGINT) AS harmonic_scaled
            FROM regs GROUP BY 1
        ),
        est AS (
            SELECT lang, n_hit, harmonic_scaled,
                   CAST({HLL_SCALED_NUM!r} AS DOUBLE)
                       / CAST(harmonic_scaled AS DOUBLE) AS raw,
                   CAST({HLL_M} - n_hit AS DOUBLE) AS zeros
            FROM agg
        ),
        fin AS (
            SELECT lang, n_hit, harmonic_scaled,
                   round(CASE WHEN raw <= {2.5 * HLL_M!r} AND zeros > 0
                              THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / zeros)
                              ELSE raw END, 4) AS est_distinct
            FROM est
        ),
        ex AS (
            SELECT lang, CAST(count(DISTINCT val) AS BIGINT) AS exact_distinct
            FROM tri GROUP BY 1
        )
        SELECT f.lang, f.n_hit, f.harmonic_scaled, f.est_distinct,
               x.exact_distinct,
               round(abs(f.est_distinct - x.exact_distinct)
                     / x.exact_distinct, 6) AS rel_err,
               round(abs(f.est_distinct - x.exact_distinct)
                     / x.exact_distinct, 6) <= 0.2 AS rel_err_ok,
               true AS union_merge_ok
        FROM fin f JOIN ex x USING (lang)
    """,
    tags=("sketch", "cardinality"),
    bench_fn=lambda spark, sf_dir: hll_estimate(
        hll_registers(_tri_units(spark, sf_dir), ["lang"], F.col("val")),
        ["lang"],
    ),
)
def hll_distinct_trigrams(spark, sf_dir):
    """Per-language distinct-trigram cardinality via HyperLogLog
    (operators/sketches.hll_*): 256 registers per group, mergeable by
    element-wise MAX — the exchange for any corpus size is ≤ 256
    (int, int) rows per group, vs the full distinct domain for exact
    countDistinct (the measured 660× KMV gap applies identically).
    Crossing values: hit-register count, the exact-integer harmonic
    sum, the 4-dp estimate, the exact distinct count and the relative
    error. ``union_merge_ok`` pins the merge law ENGINE-SIDE: registers
    built per (lang, source) and folded with hll_merge must equal the
    directly-built per-lang registers (trivially true in the SQL twin;
    genuinely falsifiable against the engine's two code paths).
    bench_fn times the production shape (registers + estimate, no
    exact-distinct verification)."""
    units = _tri_units(spark, sf_dir)
    regs = hll_registers(units, ["lang"], F.col("val"))
    est = hll_estimate(regs, ["lang"])
    exact = units.groupBy("lang").agg(
        F.count_distinct("val").cast("long").alias("exact_distinct")
    )
    regs2 = hll_merge(
        hll_registers(units, ["lang", "source"], F.col("val")), ["lang"]
    )
    merged_eq = (
        regs.withColumnRenamed("rho", "r1")
        .join(regs2.withColumnRenamed("rho", "r2"), ["lang", "idx"], "full")
        .agg(
            F.coalesce(
                F.min(
                    F.col("r1").isNotNull()
                    & F.col("r2").isNotNull()
                    & (F.col("r1") == F.col("r2"))
                ),
                F.lit(False),
            ).alias("union_merge_ok")
        )
    )
    rel = F.round(
        F.abs(F.col("est_distinct") - F.col("exact_distinct"))
        / F.col("exact_distinct"),
        6,
    )
    return (
        est.join(exact, "lang")
        .crossJoin(merged_eq)
        .select(
            "lang",
            "n_hit",
            "harmonic_scaled",
            "est_distinct",
            "exact_distinct",
            rel.alias("rel_err"),
            (rel <= F.lit(0.2)).alias("rel_err_ok"),
            "union_merge_ok",
        )
    )


# =====================================================================
# Per-document n-gram novelty (corpus-uniqueness signal)
# =====================================================================

@register_staged(
    "ngram_novelty_scores",
    oracle=f"""
        WITH {_TRI_SQL},
        per_doc AS (SELECT DISTINCT doc_id, val FROM tri),
        df AS (
            SELECT val, CAST(count(*) AS BIGINT) AS df
            FROM per_doc GROUP BY val
        )
        SELECT p.doc_id,
               CAST(count(*) AS BIGINT) AS n_units,
               CAST(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_singleton,
               round(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) / count(*), 6)
                   AS novelty
        FROM per_doc p JOIN df d USING (val)
        GROUP BY 1
    """,
    tags=("text", "quality"),
)
def ngram_novelty_scores(spark, sf_dir):
    """Per-document n-gram novelty: the fraction of a doc's DISTINCT
    trigrams that appear in no other document (document frequency 1)
    — the corpus-uniqueness signal that complements
    ``doc_commonness_score`` (which measures the opposite tail) and
    feeds dedup-aware sampling: high-novelty docs are the ones
    near-dup removal must not lose. Two bounded aggregates: trigram →
    df (shuffle on the unit hash, map-side combined), then one
    broadcast-free join back and a per-doc aggregate. No all-pairs
    anything; at 100 TB this is the same shape as the registered
    token_histogram."""
    units = _tri_units(spark, sf_dir).select("doc_id", "val").distinct()
    df = units.groupBy("val").agg(F.count(F.lit(1)).cast("long").alias("df"))
    return (
        units.join(df, "val")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_units"),
            F.sum((F.col("df") == 1).cast("long")).cast("long").alias("n_singleton"),
            F.round(
                F.sum((F.col("df") == 1).cast("long")) / F.count(F.lit(1)), 6
            ).alias("novelty"),
        )
    )


# =====================================================================
# SQ8 quantized-rerank ANN (operators/similarity.sq8_rerank_topk)
# =====================================================================

_SQ8_CANDS = 50


@register_staged(
    "ann_sq8_rerank",
    oracle=f"""
        WITH q0 AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            WHERE vec_id < 8
        ),
        c0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        q1 AS (
            SELECT vec_id, v,
                   CASE WHEN m > 0
                        THEN list_transform(v, x ->
                            CAST(floor(x / (m / 127.0) + 0.5) AS BIGINT))
                        ELSE list_transform(v, x -> CAST(0 AS BIGINT))
                   END AS codes
            FROM (SELECT vec_id, v,
                         list_aggregate(list_transform(v, x -> abs(x)), 'max') AS m
                  FROM q0)
        ),
        c1 AS (
            SELECT vec_id, v, m / 127.0 AS scale,
                   CASE WHEN m > 0
                        THEN list_transform(v, x ->
                            CAST(floor(x / (m / 127.0) + 0.5) AS BIGINT))
                        ELSE list_transform(v, x -> CAST(0 AS BIGINT))
                   END AS codes
            FROM (SELECT vec_id, v,
                         list_aggregate(list_transform(v, x -> abs(x)), 'max') AS m
                  FROM c0)
        ),
        cand AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   q.v AS qv, c.v AS cv,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY CAST(list_sum(list_transform(
                                    range(1, len(q.codes) + 1),
                                    i -> q.codes[i] * c.codes[i])) AS DOUBLE)
                                * c.scale DESC,
                                c.vec_id
                   ) AS crank
            FROM q1 q JOIN c1 c ON c.vec_id <> q.vec_id
            QUALIFY crank <= {_SQ8_CANDS}
        ),
        appr AS (
            SELECT query_id, neighbor_id,
                   round(list_cosine_similarity(qv, cv), 6) AS score,
                   CAST(row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY round(list_cosine_similarity(qv, cv), 6) DESC,
                                neighbor_id
                   ) AS INTEGER) AS rank
            FROM cand
            QUALIFY rank <= 10
        ),
        ex AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
            FROM q0 q JOIN c0 c ON c.vec_id <> q.vec_id
            QUALIFY row_number() OVER (
                PARTITION BY q.vec_id
                ORDER BY round(list_cosine_similarity(q.v, c.v), 6) DESC,
                         c.vec_id) <= 10
        ),
        rec AS (
            SELECT a.query_id, CAST(count(e.neighbor_id) AS BIGINT) AS n_hit
            FROM appr a
            LEFT JOIN ex e ON a.query_id = e.query_id
                          AND a.neighbor_id = e.neighbor_id
            GROUP BY 1
        )
        SELECT a.query_id, a.neighbor_id, a.score, a.rank,
               round(r.n_hit / 10.0, 2) AS recall10
        FROM appr a JOIN rec r USING (query_id)
    """,
    tags=("similarity", "quantization"),
    bench_fn=lambda spark, sf_dir: SIM.sq8_rerank_topk(
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("query_id"), "embedding"),
        _t(spark, sf_dir, "embeddings"),
        k=10,
        candidates=_SQ8_CANDS,
    ),
)
def ann_sq8_rerank(spark, sf_dir):
    """Two-phase SQ8 search (operators/similarity.sq8_rerank_topk):
    phase 1 ranks by the int8-quantized dot product (integer MACs over
    1/4 the bytes — the FAISS-SQ8 memory-bandwidth lever), phase 2
    exact-reranks the 50 candidates per query. The registry entry
    additionally joins the exact brute-force top-10 and emits
    per-query ``recall10`` — a MEASURED recall contract, not a claim
    (int8 rank inversions only occur between near-equal scores, so
    recall is ≈1 even on this noise-dominated corpus). bench_fn times
    the production two-phase shape without the exact-verify join."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    appr = SIM.sq8_rerank_topk(q, emb, k=10, candidates=_SQ8_CANDS)
    exact = SIM.brute_force_topk(q, emb, k=10).select(
        "query_id", F.col("neighbor_id").alias("x_neighbor")
    )
    rec = (
        appr.join(
            exact,
            (appr.query_id == exact.query_id)
            & (appr.neighbor_id == exact.x_neighbor),
            "left",
        )
        .groupBy(appr.query_id)
        .agg(F.count("x_neighbor").cast("long").alias("n_hit"))
        .select(F.col("query_id").alias("r_query"), "n_hit")
    )
    return appr.join(rec, appr.query_id == F.col("r_query")).select(
        "query_id",
        "neighbor_id",
        "score",
        "rank",
        F.round(F.col("n_hit") / F.lit(10.0), 2).alias("recall10"),
    )


# =====================================================================
# Bloom-filter join pruning (operators/bloom)
# =====================================================================

_BLOOM_M = 65536
_BLOOM_K = 3
_BLOOM_BIT_SQL = (
    "CAST('0x' || substr(md5(CAST({j} AS VARCHAR) || ':' ||"
    " CAST({key} AS VARCHAR)), 1, 15) AS BIGINT) % " + str(_BLOOM_M)
)


@register_staged(
    "bloom_semijoin_orders",
    oracle=f"""
        WITH dim AS (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        ),
        hashes AS (SELECT unnest([0, 1, 2]) AS j),
        bits AS (
            SELECT DISTINCT {_BLOOM_BIT_SQL.format(j="h.j", key="d.c_custkey")}
                       AS bit
            FROM dim d CROSS JOIN hashes h
        ),
        cand AS (
            SELECT o.* FROM orders o
            WHERE {_BLOOM_BIT_SQL.format(j="0", key="o.o_custkey")}
                      IN (SELECT bit FROM bits)
              AND {_BLOOM_BIT_SQL.format(j="1", key="o.o_custkey")}
                      IN (SELECT bit FROM bits)
              AND {_BLOOM_BIT_SQL.format(j="2", key="o.o_custkey")}
                      IN (SELECT bit FROM bits)
        ),
        exact AS (
            SELECT c.* FROM cand c
            WHERE c.o_custkey IN (SELECT c_custkey FROM dim)
        ),
        stats AS (
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_fact,
                   (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
                   (SELECT CAST(count(*) AS BIGINT) FROM exact) AS n_exact
        )
        SELECT e.o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(round(sum(CAST(e.o_totalprice AS DECIMAL(12,2))), 2)
                    AS DOUBLE) AS total_value,
               s.n_fact,
               s.n_candidates,
               CAST(s.n_candidates - s.n_exact AS BIGINT) AS n_false_positive,
               (s.n_candidates - s.n_exact) * 20 <= s.n_fact - s.n_exact
                   AS fp_rate_under_5pct
        FROM exact e CROSS JOIN stats s
        GROUP BY 1, 4, 5, 6, 7
    """,
    tags=("join", "bloom", "pruning"),
    bench_fn=lambda spark, sf_dir: BL.bloom_candidates(
        _t(spark, sf_dir, "orders"),
        "o_custkey",
        BL.bloom_bits(
            _t(spark, sf_dir, "customer").filter(
                F.col("c_mktsegment") == "BUILDING"
            ),
            "c_custkey",
            m=_BLOOM_M,
            n_hashes=_BLOOM_K,
        ),
        m=_BLOOM_M,
        n_hashes=_BLOOM_K,
    ),
)
def bloom_semijoin_orders(spark, sf_dir):
    """Bloom-pruned semi-join (operators/bloom): the BUILDING-segment
    customer keys are imaged into a 65,536-bit filter (broadcast
    kilobytes REGARDLESS of how many keys the dim side has — the
    regime where broadcasting the key set itself stops working), the
    orders scan is pruned by k=3 chained broadcast semi-joins before
    any exchange, and an exact semi-join on the surviving candidates
    removes bloom false positives — output equals the plain semi-join
    EXACTLY. Crossing values pin the pruning arithmetic in both
    engines: candidate count, false-positive count, and an
    integer-only fp-rate bound; the per-priority revenue rows are the
    business result computed from candidates only. bench_fn times the
    bloom build + prune (the production scan shape)."""
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders")
    bits = BL.bloom_bits(cust, "c_custkey", m=_BLOOM_M, n_hashes=_BLOOM_K)
    cand = BL.bloom_candidates(
        orders, "o_custkey", bits, m=_BLOOM_M, n_hashes=_BLOOM_K
    )
    exact = cand.join(
        cust.select(F.col("c_custkey").alias("o_custkey")).distinct(),
        "o_custkey",
        "leftsemi",
    )
    stats = (
        orders.agg(F.count(F.lit(1)).cast("long").alias("n_fact"))
        .crossJoin(cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates")))
        .crossJoin(exact.agg(F.count(F.lit(1)).cast("long").alias("n_exact")))
    )
    money = F.round(F.sum(F.col("o_totalprice").cast("decimal(12,2)")), 2).cast(
        "double"
    )
    per = exact.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        money.alias("total_value"),
    )
    return per.crossJoin(F.broadcast(stats)).select(
        "o_orderpriority",
        "n_orders",
        "total_value",
        "n_fact",
        "n_candidates",
        (F.col("n_candidates") - F.col("n_exact")).cast("long")
        .alias("n_false_positive"),
        (
            (F.col("n_candidates") - F.col("n_exact")) * 20
            <= F.col("n_fact") - F.col("n_exact")
        ).alias("fp_rate_under_5pct"),
    )


# =====================================================================
# Positional phrase search (operators/retrieval.positional_postings)
# =====================================================================

@register_staged(
    "phrase_top_bigram",
    oracle="""
        WITH toks AS (
            SELECT doc_id, lang,
                   list_filter(regexp_split_to_array(text,
                       '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '') AS t
            FROM documents
        ),
        bg AS (
            SELECT unnest(list_transform(range(1, len(t)),
                       i -> t[i] || ' ' || t[i+1])) AS bg
            FROM toks
        ),
        top1 AS (
            SELECT string_split(bg, ' ')[1] AS w1,
                   string_split(bg, ' ')[2] AS w2
            FROM (SELECT bg, count(*) AS c FROM bg GROUP BY bg
                  ORDER BY c DESC, bg LIMIT 1)
        )
        SELECT d.doc_id, d.lang, top1.w1, top1.w2,
               CAST(len(list_filter(range(1, len(d.t)),
                        i -> d.t[i] = top1.w1 AND d.t[i+1] = top1.w2))
                    AS BIGINT) AS n_occurrences
        FROM toks d CROSS JOIN top1
        WHERE len(list_filter(range(1, len(d.t)),
                  i -> d.t[i] = top1.w1 AND d.t[i+1] = top1.w2)) > 0
    """,
    tags=("retrieval", "phrase", "positional"),
)
def phrase_top_bigram(spark, sf_dir):
    """Positional phrase search: find every document containing the
    corpus's most frequent word BIGRAM as an exact ADJACENT phrase,
    with per-doc occurrence counts. The engine side is the real IR
    structure — a positional postings table (one (doc, token, pos) row
    per occurrence, built shuffle-free by posexplode) and an
    adjacency equi-join on (doc_id, pos) between the two terms'
    postings slices (operators/retrieval.phrase_occurrences); only
    the two terms' postings ever enter an exchange. The oracle twin
    deliberately uses a DIFFERENT recipe (per-doc list scan over
    token arrays), so the contract crosses two independent
    implementations of phrase semantics — including the overlapping-
    occurrence case ("a a a" contains "a a" twice) that regex-based
    counting gets wrong."""
    docs = _t(spark, sf_dir, "documents")
    bigrams = docs.select(
        F.explode(word_shingles_from_tokens(tokens(F.col("text")), 2)).alias("bg")
    )
    top1 = (
        bigrams.groupBy("bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "bg")
        .limit(1)
        .select(
            F.split("bg", " ").getItem(0).alias("w1"),
            F.split("bg", " ").getItem(1).alias("w2"),
        )
    )
    postings = RT.positional_postings(docs)
    p1 = postings.join(
        F.broadcast(top1), postings.token == F.col("w1"), "inner"
    ).select("doc_id", "pos", "w1", "w2")
    p2 = postings.join(
        F.broadcast(top1.select(F.col("w2").alias("w2b"))),
        postings.token == F.col("w2b"),
        "inner",
    ).select("doc_id", (F.col("pos") - 1).alias("pos"))
    occ = p1.join(p2, ["doc_id", "pos"], "inner")
    counts = occ.groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
    return counts.join(docs.select("doc_id", "lang"), "doc_id").select(
        "doc_id", "lang", "w1", "w2", "n_occurrences"
    )


# =====================================================================
# Streaming count-min maintenance (streaming/sketches.cms_sketch_sink)
# =====================================================================

def _read_store(spark, base):
    """Partition-discovered read of an epoch store: epochs arrive as a
    column, so a run that produced an unexpected epoch count degrades
    into the queries' falsifiable ``n_epochs != 3`` marker instead of
    a PATH_NOT_FOUND error on a hard-coded epoch directory."""
    path = os.path.join(base, "store")
    return spark.read.option("basePath", path).parquet(path)


def _final_epoch(store):
    """Rows of the latest epoch (the live state)."""
    return store.join(
        F.broadcast(store.agg(F.max("epoch").alias("epoch"))), "epoch"
    ).drop("epoch")


def _n_epochs_col(store):
    """1-row frame: distinct epoch count (the n_epochs contract)."""
    return store.agg(F.count_distinct("epoch").alias("n_ep"))


def _tables_equal(a, b, keys, val, out_col):
    """1-row frame: TRUE iff frames a and b are identical as
    (keys -> val) tables — NULL-safe full-outer compare, empty ⇒
    FALSE (a vacuous equality must fail loudly, the review-finding
    class the streaming_ann contract fixed in round 9)."""
    fa = a.select(*keys, F.col(val).alias("__va"))
    fb = b.select(*keys, F.col(val).alias("__vb"))
    return fa.join(fb, list(keys), "full").agg(
        F.coalesce(
            F.min(
                F.col("__va").isNotNull()
                & F.col("__vb").isNotNull()
                & (F.col("__va") == F.col("__vb"))
            ),
            F.lit(False),
        ).alias(out_col)
    )


def _run_stream_cms(spark, sf_dir, base, epoch_times=None):
    """Stage the corpus trigram stream as three epoch files (split by
    doc_id % 3 — the streaming_kmv staging recipe) and run the counter
    sink to completion."""
    from ..streaming.sketches import cms_sketch_sink

    units = _tri_units(spark, sf_dir)
    src = os.path.join(base, "src")
    for i, r in enumerate((0, 1, 2)):
        units.filter(F.col("doc_id") % 3 == r).select("val").coalesce(
            1
        ).write.mode("append" if i else "overwrite").parquet(src)
    stream = (
        spark.readStream.schema("val string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    with _stream_partitions(spark):
        q = cms_sketch_sink(
            stream,
            "val",
            width=_CMS_W,
            depth=_CMS_D,
            store_path=os.path.join(base, "store"),
            checkpoint=os.path.join(base, "ckpt"),
            available_now=True,
            epoch_times=epoch_times,
        )
        q.awaitTermination()


# per-epoch wall seconds of the most recent bench run
LAST_STREAM_CMS_EPOCH_SEC: list = []


def _stream_cms_bench(spark, sf_dir):
    base = tempfile.mkdtemp(prefix="stream_cms_bench_")
    epoch_times: dict = {}
    _run_stream_cms(spark, sf_dir, base, epoch_times=epoch_times)
    LAST_STREAM_CMS_EPOCH_SEC.append(
        [round(epoch_times[kk], 3) for kk in sorted(epoch_times)]
    )
    return spark.read.parquet(os.path.join(base, "store"))


@register_staged(
    "streaming_countmin",
    oracle=f"""
        WITH {_TRI_SQL},
        {_cms_counters_sql()},
        cnt AS (
            SELECT val, CAST(count(*) AS BIGINT) AS n_exact
            FROM tri GROUP BY val
        ),
        top AS (
            SELECT val, n_exact FROM cnt
            ORDER BY n_exact DESC, val LIMIT 10
        ),
        est AS (
            SELECT tp.val, tp.n_exact, min(c.cnt) AS cms_est
            FROM top tp
            CROSS JOIN rows r
            JOIN cells c
              ON c.row = r.j
             AND c.bucket = {_CMS_BUCKET_SQL.format(j="r.j", unit="tp.val")}
            GROUP BY 1, 2
        )
        SELECT val AS unit, n_exact, CAST(cms_est AS BIGINT) AS cms_est,
               cms_est >= n_exact AS never_undercount_ok,
               true AS stream_equals_batch,
               CAST(3 AS BIGINT) AS n_epochs
        FROM est
    """,
    tags=("streaming", "sketch", "incremental"),
    bench_fn=_stream_cms_bench,
)
def streaming_countmin(spark, sf_dir):
    """Streaming count-min maintenance (streaming/sketches.
    cms_sketch_sink): the trigram stream ingests in three
    micro-batches; each epoch adds its batch counters cell-wise into
    the strictly-earlier epoch's stored table. Count-min is LINEAR,
    so the final stored counters are bit-identical to a one-shot
    batch sketch of everything streamed — ``stream_equals_batch``
    pins exact (row, bucket, cnt) equality engine-side, and the
    estimate/exact columns for the top-10 trigrams are full crossing
    values against the SQL twin's replicated counter arithmetic.
    State is ≤ d·w cells forever; each epoch pays one bounded-domain
    groupBy over its batch plus a ≤ d·w-row merge."""
    key = f"{spark.sparkContext.applicationId}:{sf_dir}:stream_cms"
    base = _STAGE_CACHE.get(key)
    if base is None:
        base = tempfile.mkdtemp(prefix="stream_cms_")
        _run_stream_cms(spark, sf_dir, base)
        _STAGE_CACHE[key] = base
    store = _read_store(spark, base)
    final = _final_epoch(store)
    units = _tri_units(spark, sf_dir).select(F.col("val").alias("unit"))
    batch = FQ.count_min_counters(units, "unit", width=_CMS_W, depth=_CMS_D)
    eq = _tables_equal(final, batch, ["row", "bucket"], "cnt", "stream_equals_batch")
    n_ep = _n_epochs_col(store)
    top = (
        units.groupBy("unit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
        .orderBy(F.desc("n_exact"), "unit")
        .limit(10)
    )
    lk = FQ.cms_lookup(final, top, "unit", width=_CMS_W, depth=_CMS_D)
    return (
        lk.crossJoin(eq)
        .crossJoin(n_ep)
        .select(
            "unit",
            "n_exact",
            "cms_est",
            (F.col("cms_est") >= F.col("n_exact")).alias("never_undercount_ok"),
            "stream_equals_batch",
            F.when(F.col("n_ep") == 3, F.lit(3))
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("n_epochs"),
        )
    )


# =====================================================================
# Streaming HyperLogLog maintenance (streaming/sketches.hll_sketch_sink)
# =====================================================================

def _run_stream_hll(spark, sf_dir, base, epoch_times=None):
    """Stage the (lang, trigram) unit stream as three epoch files and
    run the register sink to completion (the streaming_kmv recipe)."""
    from ..streaming.sketches import hll_sketch_sink

    units = _tri_units(spark, sf_dir)
    src = os.path.join(base, "src")
    for i, r in enumerate((0, 1, 2)):
        units.filter(F.col("doc_id") % 3 == r).select("lang", "val").coalesce(
            1
        ).write.mode("append" if i else "overwrite").parquet(src)
    stream = (
        spark.readStream.schema("lang string, val string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    with _stream_partitions(spark):
        q = hll_sketch_sink(
            stream,
            ["lang"],
            "val",
            store_path=os.path.join(base, "store"),
            checkpoint=os.path.join(base, "ckpt"),
            available_now=True,
            epoch_times=epoch_times,
        )
        q.awaitTermination()


LAST_STREAM_HLL_EPOCH_SEC: list = []


def _stream_hll_bench(spark, sf_dir):
    base = tempfile.mkdtemp(prefix="stream_hll_bench_")
    epoch_times: dict = {}
    _run_stream_hll(spark, sf_dir, base, epoch_times=epoch_times)
    LAST_STREAM_HLL_EPOCH_SEC.append(
        [round(epoch_times[kk], 3) for kk in sorted(epoch_times)]
    )
    return spark.read.parquet(os.path.join(base, "store"))


@register_staged(
    "streaming_hll_distinct",
    oracle=f"""
        WITH {_TRI_SQL},
        h AS (
            SELECT DISTINCT lang,
                   CAST('0x' || substr(md5(val), 1, 15) AS BIGINT) AS h
            FROM tri
        ),
        regs AS (
            SELECT lang, h >> 52 AS idx,
                   max(CASE WHEN (h & ((CAST(1 AS BIGINT) << 52) - 1)) = 0
                            THEN 53
                            ELSE 53 - length(bin(h & ((CAST(1 AS BIGINT) << 52) - 1)))
                       END) AS rho
            FROM h GROUP BY 1, 2
        ),
        agg AS (
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_hit,
                   CAST(sum(CAST(1 AS BIGINT) << (53 - rho))
                        + ({HLL_M} - count(*)) * (CAST(1 AS BIGINT) << 53)
                        AS BIGINT) AS harmonic_scaled
            FROM regs GROUP BY 1
        ),
        est AS (
            SELECT lang, n_hit, harmonic_scaled,
                   CAST({HLL_SCALED_NUM!r} AS DOUBLE)
                       / CAST(harmonic_scaled AS DOUBLE) AS raw,
                   CAST({HLL_M} - n_hit AS DOUBLE) AS zeros
            FROM agg
        )
        SELECT lang, n_hit, harmonic_scaled,
               round(CASE WHEN raw <= {2.5 * HLL_M!r} AND zeros > 0
                          THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / zeros)
                          ELSE raw END, 4) AS est_distinct,
               true AS stream_equals_batch,
               CAST(3 AS BIGINT) AS n_epochs
        FROM est
    """,
    tags=("streaming", "sketch", "incremental"),
    bench_fn=_stream_hll_bench,
)
def streaming_hll_distinct(spark, sf_dir):
    """Streaming HLL register maintenance (streaming/sketches.
    hll_sketch_sink): the per-language trigram stream ingests in three
    micro-batches; each epoch max-merges its batch registers into the
    strictly-earlier store. Register max-merge is exact, so the final
    stored table is bit-identical to a one-shot hll_registers over
    everything streamed — ``stream_equals_batch`` pins (lang, idx,
    rho) equality engine-side, and (n_hit, harmonic_scaled,
    est_distinct) are full crossing values against the SQL twin's
    replicated register arithmetic. State ≤ 256 rows per lang forever.
    Completes the sketch-family symmetry: KMV (set algebra), CMS
    (point frequency), HLL (cheapest union-only cardinality) each
    have a batch operator AND an exact-merge streaming arm."""
    from ..operators.sketches import hll_registers

    key = f"{spark.sparkContext.applicationId}:{sf_dir}:stream_hll"
    base = _STAGE_CACHE.get(key)
    if base is None:
        base = tempfile.mkdtemp(prefix="stream_hll_")
        _run_stream_hll(spark, sf_dir, base)
        _STAGE_CACHE[key] = base
    store = _read_store(spark, base)
    final = _final_epoch(store)
    batch = hll_registers(_tri_units(spark, sf_dir), ["lang"], F.col("val"))
    eq = _tables_equal(final, batch, ["lang", "idx"], "rho", "stream_equals_batch")
    n_ep = _n_epochs_col(store)
    est = hll_estimate(final, ["lang"])
    return (
        est.crossJoin(eq)
        .crossJoin(n_ep)
        .select(
            "lang",
            "n_hit",
            "harmonic_scaled",
            "est_distinct",
            "stream_equals_batch",
            F.when(F.col("n_ep") == 3, F.lit(3))
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("n_epochs"),
        )
    )


# =====================================================================
# Adaptive-threshold streaming sample (bounded-state uniform sample)
# =====================================================================

_AS_CAP = 64


def _run_stream_adaptive(spark, sf_dir, base, epoch_times=None):
    """Stage the (doc_id, lang) row stream as three epoch files and
    run the bounded-sample sink to completion."""
    from ..streaming.sketches import adaptive_sample_sink

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    src = os.path.join(base, "src")
    for i, r in enumerate((0, 1, 2)):
        d.filter(F.col("doc_id") % 3 == r).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, lang string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    with _stream_partitions(spark):
        q = adaptive_sample_sink(
            stream,
            "doc_id",
            ["doc_id", "lang"],
            cap=_AS_CAP,
            store_path=os.path.join(base, "store"),
            checkpoint=os.path.join(base, "ckpt"),
            available_now=True,
            epoch_times=epoch_times,
        )
        q.awaitTermination()


LAST_STREAM_AS_EPOCH_SEC: list = []


def _stream_adaptive_bench(spark, sf_dir):
    base = tempfile.mkdtemp(prefix="stream_as_bench_")
    epoch_times: dict = {}
    _run_stream_adaptive(spark, sf_dir, base, epoch_times=epoch_times)
    LAST_STREAM_AS_EPOCH_SEC.append(
        [round(epoch_times[kk], 3) for kk in sorted(epoch_times)]
    )
    return spark.read.parquet(os.path.join(base, "store"))


@register_staged(
    "streaming_adaptive_sample",
    oracle=f"""
        WITH coins AS (
            SELECT doc_id, lang,
                   CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':as'),
                        1, 5) AS BIGINT) AS c
            FROM documents
        ),
        js AS (SELECT unnest(range(0, 21)) AS j),
        sizes AS (
            SELECT j.j,
                   (SELECT count(*) FROM coins WHERE c < (1048576 >> j.j)) AS n
            FROM js j
        ),
        jf AS (
            SELECT CAST(min(j) AS BIGINT) AS jf FROM sizes WHERE n <= {_AS_CAP}
        ),
        samp AS (
            SELECT coins.lang FROM coins, jf WHERE c < (1048576 >> jf)
        ),
        ex AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs_exact
               FROM documents GROUP BY 1)
        SELECT s.lang,
               CAST(count(*) AS BIGINT) AS n_sample,
               jf.jf AS threshold_exp,
               CAST(count(*) * (CAST(1 AS BIGINT) << jf.jf) AS BIGINT)
                   AS est_docs,
               x.n_docs_exact,
               true AS stream_equals_batch,
               true AS bounded_ok,
               jf.jf > 0 AS threshold_tightened,
               CAST(3 AS BIGINT) AS n_epochs
        FROM samp s CROSS JOIN jf JOIN ex x ON s.lang = x.lang
        GROUP BY 1, 3, 5
    """,
    tags=("streaming", "sampling", "incremental"),
    bench_fn=_stream_adaptive_bench,
)
def streaming_adaptive_sample(spark, sf_dir):
    """Bounded-state uniform sampling over a stream (streaming/
    sketches.adaptive_sample_sink — the Gibbons-Matias backing-sample
    / theta-family scheme): the stored sample is {rows: coin <
    2^20 >> j} with j tightened whenever the store exceeds cap=64, so
    state is ≤ cap rows FOREVER while a plain Bernoulli sample grows
    with the stream. The scheme's algebraic identity — stored state ==
    batch filter of the FULL stream at the final threshold, and the
    streaming-final threshold == the batch-computed smallest fitting
    threshold — makes every output column a crossing value:
    per-language sample counts, the threshold exponent, and the
    integer inverse-probability estimate ``n_sample · 2^j`` against
    the exact per-language count. ``threshold_tightened`` proves the
    adaptive branch actually ran at every SF (j ≥ 3 at 500 docs)."""
    from ..operators.quantiles import COIN_SPAN, hash_coin

    key = f"{spark.sparkContext.applicationId}:{sf_dir}:stream_as"
    base = _STAGE_CACHE.get(key)
    if base is None:
        base = tempfile.mkdtemp(prefix="stream_as_")
        _run_stream_adaptive(spark, sf_dir, base)
        _STAGE_CACHE[key] = base
    store = _final_epoch(_read_store(spark, base))
    d = _t(spark, sf_dir, "documents")
    # batch twin at the STORED threshold: stored rows == coin-filtered
    # full stream, exactly
    jrow = store.agg(F.max("j").alias("j"), F.count(F.lit(1)).alias("n_tot"))
    batch = (
        d.select("doc_id", hash_coin(F.col("doc_id"), ":as").alias("c"))
        .crossJoin(F.broadcast(jrow.select("j")))
        # SQL shiftright accepts a column bit count (the DataFrame-API
        # binding takes a literal int only)
        .where(F.col("c") < F.expr(f"shiftright({COIN_SPAN}, CAST(j AS INT))"))
        .select("doc_id")
    )
    eq = (
        store.select("doc_id")
        .withColumn("s", F.lit(1))
        .join(batch.withColumn("b", F.lit(1)), "doc_id", "full")
        .agg(
            F.coalesce(
                F.min(F.col("s").isNotNull() & F.col("b").isNotNull()),
                F.lit(False),
            ).alias("stream_equals_batch")
        )
    )
    n_ep = _n_epochs_col(_read_store(spark, base))
    ex = d.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n_docs_exact"))
    per = store.groupBy("lang", "j").agg(
        F.count(F.lit(1)).cast("long").alias("n_sample")
    )
    return (
        per.join(ex, "lang")
        .crossJoin(F.broadcast(jrow.select(F.col("n_tot"))))
        .crossJoin(eq)
        .crossJoin(n_ep)
        .select(
            "lang",
            "n_sample",
            F.col("j").cast("long").alias("threshold_exp"),
            F.expr("shiftleft(CAST(n_sample AS BIGINT), CAST(j AS INT))")
            .cast("long")
            .alias("est_docs"),
            "n_docs_exact",
            "stream_equals_batch",
            (F.col("n_tot") <= F.lit(_AS_CAP)).alias("bounded_ok"),
            (F.col("j") > 0).alias("threshold_tightened"),
            F.when(F.col("n_ep") == 3, F.lit(3))
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("n_epochs"),
        )
    )


# =====================================================================
# Weighted discrete quantiles (operators/quantiles.weighted_discrete_quantiles)
# =====================================================================

@register_staged(
    "weighted_quantiles_doclen",
    oracle="""
        WITH toks AS (
            SELECT doc_id, lang,
                   len(list_filter(regexp_split_to_array(text,
                       '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '')) AS n_tok
            FROM documents
        ),
        pos AS (SELECT * FROM toks WHERE n_tok > 0),
        cum AS (
            SELECT lang, doc_id, n_tok,
                   sum(n_tok) OVER (PARTITION BY lang
                                    ORDER BY n_tok, doc_id) AS cum,
                   sum(n_tok) OVER (PARTITION BY lang) AS tot
            FROM pos
        ),
        qs AS (SELECT * FROM (VALUES (1, 4), (1, 2), (9, 10)) t(q_num, q_den)),
        reach AS (
            SELECT c.lang, c.n_tok, c.cum, c.tot, q.q_num, q.q_den
            FROM cum c CROSS JOIN qs q
            WHERE c.cum * q.q_den >= q.q_num * c.tot
        ),
        first AS (
            SELECT lang, q_num, q_den, min(cum) AS mcum
            FROM reach GROUP BY 1, 2, 3
        )
        SELECT r.lang,
               CAST(r.q_num AS BIGINT) AS q_num,
               CAST(r.q_den AS BIGINT) AS q_den,
               CAST(r.n_tok AS BIGINT) AS value,
               CAST(r.tot AS BIGINT) AS total_weight
        FROM reach r
        JOIN first f ON r.lang = f.lang AND r.q_num = f.q_num
                    AND r.q_den = f.q_den AND r.cum = f.mcum
    """,
    tags=("quantiles", "weighted"),
)
def weighted_quantiles_doclen(spark, sf_dir):
    """TOKEN-MASS-weighted document-length quantiles per language
    (operators/quantiles.weighted_discrete_quantiles): "how long is
    the document the median TOKEN lives in" — the packing/truncation
    planning stat a plain per-doc median gets wrong (long docs hold
    most of the mass). The rank rule is ALL-integer: quantiles are
    exact rationals (num, den) and the reach test ``cum·den ≥ num·W``
    is integer multiplication on integer weights — no FP exists
    anywhere in the selection, the strongest oracle form available.
    One per-group running-sum window over (length, id) order."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tok"),
    ).where(F.col("n_tok") > 0)
    from ..operators.quantiles import weighted_discrete_quantiles

    out = weighted_discrete_quantiles(
        toks, ["lang"], "n_tok", "n_tok", "doc_id",
        [(1, 4), (1, 2), (9, 10)],
    )
    return out.select(
        "lang",
        "q_num",
        "q_den",
        F.col("value").cast("long").alias("value"),
        F.col("total_weight").cast("long").alias("total_weight"),
    )
