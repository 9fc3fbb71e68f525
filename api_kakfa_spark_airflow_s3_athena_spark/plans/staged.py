"""Round-10 STAGED registry queries — implemented, tested, and
oracle-verified this round, but NOT registered in ``queries()`` yet.

Why staged: the driver verifies a 50-query prefix per round, ordered
newest-first, and round 9's prefix budget is exactly consumed (12 new
registrations + all 38 r05-stale rows — the VERDICT r08 rotation
target). Registering more queries THIS round would push stale rows out
of the prefix and break the freshness-rotation arithmetic, so these
entries wait in this module; round 10 promotes them by moving the
``@register_staged`` decorators into ``plans/queries.py`` verbatim
(the specs are full ``QuerySpec`` objects — same fields, same
contract). Verify locally with::

    python tools/oracle_check.py --staged [sf_dir] [query ...]

Keep the r10 cap in mind when promoting: 12 new registrations max so
the r06-stale cohort fits the prefix (NOTES.md rotation note).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

from pyspark.sql import functions as F

from ..functions.text import tokens, word_shingles, word_shingles_from_tokens
from ..operators.frequency import heavy_hitters_by_key
from ..operators.sketches import kmv_set_estimates, kmv_sketch
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
# KMV cross-corpus overlap (operators/sketches.py)
# =====================================================================

_KMV_K = 256
# (k-1)·2⁶⁰ precomputed as the exact double both engines fold to: the
# product of a small integer and a power of two is exactly
# representable, so the estimator below is ONE IEEE division of exact
# operands — bit-identical cross-engine (NOTES.md float recipe).
_KMV_NUM = float(_KMV_K - 1) * float(2**60)

# Corpus halves for the overlap question: sources src0-src9 vs the
# rest. substr(source, 4) is the numeric suffix; the predicate is
# sargable on both engines and stable across SFs (every SF ships
# src0..src19).
_SIDE_A = [f"src{i}" for i in range(10)]

_KMV_ORACLE = f"""
WITH toks AS (
    SELECT lang,
           source IN ({", ".join("'" + s + "'" for s in _SIDE_A)}) AS is_a,
           list_filter(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+'),
                       x -> x <> '') AS t
    FROM documents
),
units AS (
    SELECT lang, is_a, 'token' AS unit, unnest(t) AS val FROM toks
    UNION ALL
    SELECT lang, is_a, 'shingle5' AS unit,
           unnest(list_transform(range(1, len(t) - 3),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                    t[i+3] || ' ' || t[i+4])) AS val
    FROM toks
),
side AS (
    SELECT DISTINCT lang, unit, is_a,
           CAST(('0x' || substr(md5(val), 1, 15)) AS BIGINT) AS h,
           val
    FROM units
),
ex AS (  -- exact union / overlap per group (calibration columns)
    SELECT lang, unit,
           COUNT(*) AS exact_union,
           COUNT(*) FILTER (has_a AND has_b) AS exact_overlap
    FROM (
        SELECT lang, unit, val, bool_or(is_a) AS has_a,
               bool_or(NOT is_a) AS has_b
        FROM side GROUP BY lang, unit, val
    )
    GROUP BY lang, unit
),
ka AS (
    SELECT lang, unit, h,
           row_number() OVER (PARTITION BY lang, unit ORDER BY h) AS rn
    FROM (SELECT DISTINCT lang, unit, h FROM side WHERE is_a)
),
kb AS (
    SELECT lang, unit, h,
           row_number() OVER (PARTITION BY lang, unit ORDER BY h) AS rn
    FROM (SELECT DISTINCT lang, unit, h FROM side WHERE NOT is_a)
),
ska AS (SELECT lang, unit, h FROM ka WHERE rn <= {_KMV_K}),
skb AS (SELECT lang, unit, h FROM kb WHERE rn <= {_KMV_K}),
sa AS (SELECT lang, unit, COUNT(*) AS n, MAX(h) AS kth FROM ska GROUP BY lang, unit),
sb AS (SELECT lang, unit, COUNT(*) AS n, MAX(h) AS kth FROM skb GROUP BY lang, unit),
lu AS (
    SELECT lang, unit, h,
           row_number() OVER (PARTITION BY lang, unit ORDER BY h) AS rn
    FROM (SELECT lang, unit, h FROM ska UNION SELECT lang, unit, h FROM skb)
),
L AS (SELECT lang, unit, h FROM lu WHERE rn <= {_KMV_K}),
lstat AS (SELECT lang, unit, COUNT(*) AS k_union, MAX(h) AS union_kth
          FROM L GROUP BY lang, unit),
ov AS (
    SELECT L.lang, L.unit, COUNT(*) AS overlap
    FROM L
    JOIN ska ON ska.lang = L.lang AND ska.unit = L.unit AND ska.h = L.h
    JOIN skb ON skb.lang = L.lang AND skb.unit = L.unit AND skb.h = L.h
    GROUP BY L.lang, L.unit
)
SELECT sa.lang, sa.unit,
       CASE WHEN sa.n < {_KMV_K} THEN CAST(sa.n AS DOUBLE)
            ELSE {_KMV_NUM!r} / CAST(sa.kth AS DOUBLE) END AS est_a,
       CASE WHEN sb.n < {_KMV_K} THEN CAST(sb.n AS DOUBLE)
            ELSE {_KMV_NUM!r} / CAST(sb.kth AS DOUBLE) END AS est_b,
       lstat.k_union,
       lstat.union_kth,
       CASE WHEN lstat.k_union < {_KMV_K} THEN CAST(lstat.k_union AS DOUBLE)
            ELSE {_KMV_NUM!r} / CAST(lstat.union_kth AS DOUBLE) END AS est_union,
       COALESCE(ov.overlap, 0) AS overlap,
       CAST(COALESCE(ov.overlap, 0) AS DOUBLE) / CAST(lstat.k_union AS DOUBLE)
           AS jaccard_est,
       ex.exact_union,
       ex.exact_overlap
FROM sa
JOIN sb ON sb.lang = sa.lang AND sb.unit = sa.unit
JOIN lstat ON lstat.lang = sa.lang AND lstat.unit = sa.unit
JOIN ex ON ex.lang = sa.lang AND ex.unit = sa.unit
LEFT JOIN ov ON ov.lang = sa.lang AND ov.unit = sa.unit
"""


def _kmv_overlap_frames(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "lang",
        F.col("source").isin(_SIDE_A).alias("is_a"),
        tokens(F.col("text")).alias("t"),
    )
    # Two unit streams per group: raw tokens (tiny driver vocabulary —
    # exercises the unsaturated/exact estimator branch at every SF) and
    # 5-gram shingles (combinatorial cardinality — saturates k and
    # exercises the (k-1)·2⁶⁰/h_(k) branch at every SF).
    units = base.select(
        "lang", "is_a", F.lit("token").alias("unit"), F.explode("t").alias("val")
    ).unionByName(
        base.select(
            "lang",
            "is_a",
            F.lit("shingle5").alias("unit"),
            F.explode(word_shingles_from_tokens(F.col("t"), 5)).alias("val"),
        )
    )
    a = kmv_sketch(units.where("is_a"), ["lang", "unit"], F.col("val"), k=_KMV_K)
    b = kmv_sketch(units.where("NOT is_a"), ["lang", "unit"], F.col("val"), k=_KMV_K)
    return units, a, b


def kmv_overlap_bench(spark, sf_dir):
    """Bare production shape: sketch both corpus halves, set-estimate.
    No exact-distinct calibration pass — at 100 TB the sketches are
    the point; this is what bench.py times."""
    _, a, b = _kmv_overlap_frames(spark, sf_dir)
    return kmv_set_estimates(a, b, ["lang", "unit"], _KMV_K)


@register_staged(
    "kmv_source_overlap",
    oracle=_KMV_ORACLE,
    tags=("sketch", "dedup", "contamination"),
    bench_fn=kmv_overlap_bench,
)
def kmv_source_overlap(spark, sf_dir):
    """Cross-corpus vocabulary overlap via KMV synopses (Beyer et al.
    SIGMOD 2007): per language, the distinct-token union, intersection
    fraction, and Jaccard between the src0-9 and src10-19 corpus
    halves — the contamination/mixture question HLL union cannot
    answer. The oracle computes the IDENTICAL sketch in SQL (same
    md5-60bit hash, same k smallest, same single-division estimator),
    making every column value-level comparable; exact_union /
    exact_overlap calibration columns ride along so estimator quality
    is visible in the artifact itself.

    Scale: the sketch pass shuffles ≤ k rows per (partition, lang) —
    kilobytes per group at any corpus size; the set-operation join
    moves two k-length arrays per lang. The exact calibration columns
    are the only corpus-sized aggregation and exist for the oracle
    contract; ``bench_fn`` times the bare sketch path.
    """
    units, a, b = _kmv_overlap_frames(spark, sf_dir)
    est = kmv_set_estimates(a, b, ["lang", "unit"], _KMV_K)
    exact = (
        units.groupBy("lang", "unit", "val")
        .agg(F.max("is_a").alias("has_a"), F.max(~F.col("is_a")).alias("has_b"))
        .groupBy("lang", "unit")
        .agg(
            F.count(F.lit(1)).alias("exact_union"),
            F.count_if(F.col("has_a") & F.col("has_b")).alias("exact_overlap"),
        )
    )
    return est.join(exact, ["lang", "unit"])


# =====================================================================
# Per-key heavy hitters (operators/frequency.heavy_hitters_by_key)
# =====================================================================

_HH_COUNTERS = 700  # bigrams: ~900 distinct per lang, near-uniform, so
# the threshold must sit just above the uniform frequency to split the
# upper tail NON-trivially at every SF (measured: 1153/1149/127 hitters
# of ~4500 (lang,bigram) pairs at sf0.001/0.01/0.1; 500 went empty at
# sf0.1 as the distribution flattens with corpus size)


@register_staged(
    "heavy_hitters_per_lang",
    oracle=f"""
        WITH toks AS (
            SELECT lang,
                   list_filter(regexp_split_to_array(text,
                       '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '') AS t
            FROM documents
        ),
        big AS (
            SELECT lang,
                   unnest(list_transform(range(1, len(t)),
                       i -> t[i] || ' ' || t[i+1])) AS unit
            FROM toks
        ),
        f AS (SELECT lang, unit, CAST(count(*) AS BIGINT) AS freq
              FROM big GROUP BY lang, unit),
        n AS (SELECT lang, CAST(sum(freq) AS BIGINT) AS n_units
              FROM f GROUP BY lang)
        SELECT f.lang, f.unit, f.freq, n.n_units
        FROM f JOIN n ON n.lang = f.lang
        WHERE f.freq * {_HH_COUNTERS} > n.n_units
    """,
    tags=("llm-pipeline", "text", "approx", "per-key"),
)
def heavy_hitters_per_lang(spark, sf_dir):
    """Per-language bigram heavy hitters: every word bigram whose
    in-language frequency exceeds n_lang/700, with exact counts — the
    per-domain/per-language token-head question (stop-list induction,
    boilerplate tracing PER SUBCORPUS) the global heavy_hitter_tokens
    cannot answer. Runs the per-key two-phase Misra-Gries operator
    (operators/frequency.heavy_hitters_by_key): bounded per-key
    candidate summaries per partition, then an exact
    candidates-only recount — the oracle is the naive per-key full
    histogram at the same threshold, so a single lost true hitter
    fails the hash."""
    docs = _t(spark, sf_dir, "documents")
    units = docs.select(
        "lang", F.explode(word_shingles(F.col("text"), 2)).alias("unit")
    )
    return heavy_hitters_by_key(
        units, ["lang"], "unit", num_counters=_HH_COUNTERS
    )


# =====================================================================
# Three-arm hybrid retrieval (operators/retrieval.rrf_fuse / prior_topk)
# =====================================================================

@register_staged(
    "hybrid_search_rrf3",
    oracle="""
        WITH base AS (
            SELECT doc_id,
                   list_filter(string_split(lower(text), ' '), x -> x <> '')
                       AS toks
            FROM documents
        ),
        lens AS (SELECT doc_id, len(toks) AS dl FROM base),
        stats AS (
            SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl
            FROM lens
        ),
        tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM (SELECT doc_id, unnest(toks) AS term FROM base)
            WHERE term IN ('spark', 'customer', 'slow')
            GROUP BY doc_id, term
        ),
        dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        parts AS (
            SELECT t.doc_id,
                   ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                   * (t.tf * 2.2)
                   / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl
                      / (CAST(s.sum_dl AS DOUBLE) / s.n_docs))) AS part
            FROM tf t
            JOIN dft d USING (term)
            JOIN lens l USING (doc_id), stats s
        ),
        sscore AS (
            SELECT doc_id, round(sum(part), 4) AS score
            FROM parts GROUP BY doc_id
        ),
        sparse AS (
            SELECT doc_id AS id,
                   row_number() OVER (ORDER BY score DESC, doc_id)
                       AS rnk_sparse
            FROM (SELECT doc_id, score FROM sscore
                  ORDER BY score DESC, doc_id LIMIT 20)
        ),
        dense AS (
            SELECT c.vec_id AS id,
                   row_number() OVER (ORDER BY
                       round(list_cosine_similarity(q.embedding::DOUBLE[],
                                                    c.embedding::DOUBLE[]), 6)
                           DESC, c.vec_id) AS rnk_dense
            FROM embeddings c JOIN embeddings q
              ON q.vec_id = 7 AND c.vec_id <> 7
            QUALIFY rnk_dense <= 20
        ),
        prior AS (
            SELECT doc_id AS id,
                   row_number() OVER (ORDER BY n_chars DESC, doc_id)
                       AS rnk_prior
            FROM (SELECT doc_id, n_chars FROM documents
                  ORDER BY n_chars DESC, doc_id LIMIT 20)
        ),
        fused AS (
            SELECT COALESCE(s.id, d.id, p.id) AS doc_id,
                   s.rnk_sparse IS NOT NULL AS in_sparse,
                   d.rnk_dense IS NOT NULL AS in_dense,
                   p.rnk_prior IS NOT NULL AS in_prior,
                   COALESCE(CAST(1 AS DOUBLE) / (60 + s.rnk_sparse), 0)
                   + COALESCE(CAST(1 AS DOUBLE) / (60 + d.rnk_dense), 0)
                   + COALESCE(CAST(1 AS DOUBLE) / (60 + p.rnk_prior), 0)
                       AS rrf_score
            FROM sparse s
            FULL OUTER JOIN dense d ON s.id = d.id
            FULL OUTER JOIN prior p ON COALESCE(s.id, d.id) = p.id
        )
        SELECT doc_id, in_sparse, in_dense, in_prior, rrf_score,
               CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id)
                    AS INTEGER) AS rnk
        FROM (SELECT * FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 10)
    """,
    tags=("text", "retrieval", "similarity", "llm-pipeline", "topk"),
)
def hybrid_search_rrf3(spark, sf_dir):
    """Three-arm hybrid retrieval: the registered two-arm RRF fusion
    (hybrid_search_rrf) plus a per-document PRIOR arm — here the
    stored n_chars length prior; production plugs a recency stamp or
    the quality classifier's quantized score — fused by the N-arm
    operators/retrieval.rrf_fuse. Rank-only fusion makes the third arm
    free: no weight tuning, no score calibration, each arm keeps its
    bounded top-n shape (TakeOrderedAndProject), and the fusion join
    chain touches <= 60 rows. The fused score folds 0.0 + three single
    exact-integer divisions (left-assoc in both engines — bit-stable,
    unrounded per the float recipe). Full value-level SQL twin."""
    from ..operators import retrieval as RET

    d = _t(spark, sf_dir, "documents")
    e = _t(spark, sf_dir, "embeddings")
    return RET.hybrid_rrf3_topk(
        d, e, ["spark", "customer", "slow"], query_vec_id=7, k=10, n_arm=20
    )


# =====================================================================
# Streaming ANN index maintenance (streaming/ann.py)
# =====================================================================

_ANN_OFFSET = 10_000_000


def _stream_ann_delta(emb):
    corpus = emb.filter(F.col("vec_id") % 5 != 0).select("vec_id", "embedding")
    plants = corpus.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + _ANN_OFFSET).alias("vec_id"), "embedding"
    )
    delta = (
        emb.filter(F.col("vec_id") % 5 == 0)
        .select("vec_id", "embedding")
        .unionByName(plants)
    )
    return corpus, plants, delta


def _run_stream_ann(spark, sf_dir, base, epoch_times=None):
    """Build + persist the IVF-PQ artifacts and base index on the
    corpus slice, record the build-time drift baseline, stage the
    delta as a 3-file stream (plants ride the last epoch), and run
    the maintenance sink to completion (availableNow)."""
    import os

    from ..operators import similarity as SIM
    from ..streaming.ann import ann_index_sink
    from .queries import _stream_partitions, _t as _load

    emb = _load(spark, sf_dir, "embeddings")
    corpus, plants, _ = _stream_ann_delta(emb)
    centroids, books, enc = SIM.ivfpq_index(
        corpus, n_centroids=16, m=8, ksub=16, iters=3
    )
    centroids.write.mode("overwrite").parquet(os.path.join(base, "centroids"))
    SIM.pq_save_books(spark, books, os.path.join(base, "books"))
    enc.write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(base, "index", "epoch=-1")
    )
    SIM.pq_quantization_error(corpus, books).write.mode("overwrite").parquet(
        os.path.join(base, "baseline")
    )
    src = os.path.join(base, "src")
    new = emb.filter(F.col("vec_id") % 5 == 0).select("vec_id", "embedding")
    epochs = [
        new.filter(F.col("vec_id") % 15 == 0),
        new.filter(F.col("vec_id") % 15 == 5),
        new.filter(F.col("vec_id") % 15 == 10).unionByName(plants),
    ]
    for i, e in enumerate(epochs):
        e.coalesce(1).write.mode("append" if i else "overwrite").parquet(src)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    with _stream_partitions(spark):
        q = ann_index_sink(
            stream,
            centroids_path=os.path.join(base, "centroids"),
            books_path=os.path.join(base, "books"),
            index_path=os.path.join(base, "index"),
            metrics_path=os.path.join(base, "metrics"),
            checkpoint=os.path.join(base, "ckpt"),
            available_now=True,
            epoch_times=epoch_times,
        )
        q.awaitTermination()


# per-epoch wall seconds of the most recent bench run — promoted to
# bench.py's marginal-cost convention with the r10 registration
LAST_STREAM_ANN_EPOCH_SEC: list = []


def _stream_ann_bench(spark, sf_dir):
    import os
    import tempfile

    base = tempfile.mkdtemp(prefix="stream_ann_bench_")
    epoch_times: dict = {}
    _run_stream_ann(spark, sf_dir, base, epoch_times=epoch_times)
    LAST_STREAM_ANN_EPOCH_SEC.append(
        [round(epoch_times[k], 3) for k in sorted(epoch_times)]
    )
    return spark.read.parquet(os.path.join(base, "index")).select(
        "vec_id", "cell", "epoch"
    )


@register_staged(
    "streaming_ann_ingest",
    oracle="""
        SELECT CAST(SUM(CASE WHEN vec_id % 5 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_corpus,
               CAST(SUM(CASE WHEN vec_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_delta_new,
               CAST(SUM(CASE WHEN vec_id % 7 = 0 AND vec_id % 5 <> 0
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_planted,
               CAST(3 AS BIGINT) AS n_epochs,
               true AS index_rows_ok,
               true AS stream_equals_batch_ok,
               true AS exactly_once_ok,
               true AS planted_rank1_ok,
               true AS drift_untripped_ok
        FROM embeddings
    """,
    tags=("streaming", "similarity", "ivf", "pq", "incremental"),
    bench_fn=_stream_ann_bench,
)
def streaming_ann_ingest(spark, sf_dir):
    """Streaming arm of the ANN index lifecycle (the streaming/dedup +
    streaming/scoring pattern applied to the IVF-PQ index): the index
    is built and persisted on the vec_id%5 != 0 corpus slice, and the
    held-out slice streams in three micro-batches through
    ``streaming/ann.ann_index_sink`` — each epoch encodes against the
    RELOADED frozen codebooks, assigns against the RELOADED frozen
    centroids, writes an epoch-overwrite cell-partitioned directory,
    and records the per-epoch quantization-drift observable. Contract:

    - index_rows_ok: the stored tree (base + epochs) holds exactly
      corpus+delta rows;
    - stream_equals_batch_ok: streamed epochs are (id, cell, codes)-
      identical to the BATCH delta path (ivfpq_index_append) under the
      same reloaded artifacts — append-equals-rebuild THROUGH the sink
      (NULL-safe full join);
    - exactly_once_ok: no vector indexed in two epochs;
    - planted_rank1_ok: corpus %7 rows re-ingested at +10M inside the
      last epoch retrieve their ORIGINAL at rank 1 through ivfpq_topk
      ON the stored epoch-partitioned tree under nprobe=1 (identical
      vector => same cell + same codes => tied adist, id tie-break);
    - drift_untripped_ok: every epoch's PQ reconstruction error stays
      within 1.5x the build-time baseline (same-distribution data —
      the pq_index_append drift band, measured per epoch by the sink).
    Counts cross the engine compare."""
    import os
    import tempfile

    from ..operators import similarity as SIM
    from .queries import _STAGE_CACHE

    emb = _t(spark, sf_dir, "embeddings")
    corpus, plants, delta = _stream_ann_delta(emb)
    key = f"{spark.sparkContext.applicationId}:{sf_dir}:stream_ann"
    base = _STAGE_CACHE.get(key)
    if base is None:
        base = tempfile.mkdtemp(prefix="stream_ann_")
        _run_stream_ann(spark, sf_dir, base)
        _STAGE_CACHE[key] = base
    stored = spark.read.parquet(os.path.join(base, "index"))
    centroids = spark.read.parquet(os.path.join(base, "centroids"))
    books = SIM.pq_load_books(spark, os.path.join(base, "books"))

    expected = corpus.count() + delta.count()
    rows_ok = stored.agg(
        (F.count(F.lit(1)) == F.lit(expected)).alias("index_rows_ok"),
        (F.count(F.lit(1)) == F.count_distinct("vec_id")).alias("exactly_once_ok"),
    )
    batch_rows = SIM.ivfpq_index_append(delta, centroids, books).select(
        F.col("vec_id").alias("b_id"),
        F.col("cell").alias("b_cell"),
        F.col("codes").alias("b_codes"),
    )
    equiv = (
        stored.filter("epoch >= 0")
        .select("vec_id", "cell", "codes")
        .join(batch_rows, F.col("vec_id") == F.col("b_id"), "full")
        .agg(
            # default FALSE on an empty compare (review finding: a
            # vacuously-empty full-outer join must fail the equality
            # contract loudly, like every sibling check — the delta
            # slice is non-empty by fixture, so an empty join here
            # means the sink or the batch path produced nothing)
            F.coalesce(
                F.min(
                    F.col("cell").isNotNull()
                    & F.col("b_cell").isNotNull()
                    & (F.col("cell") == F.col("b_cell"))
                    & (F.col("codes") == F.col("b_codes"))
                ),
                F.lit(False),
            ).alias("stream_equals_batch_ok")
        )
    )
    plant_q = delta.filter(F.col("vec_id") >= _ANN_OFFSET).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    hits = SIM.ivfpq_topk(
        plant_q, centroids, books, stored.select("vec_id", "codes", "cell"),
        k=2, nprobe=1,
    )
    recall = (
        hits.groupBy("query_id")
        .agg(
            F.max(
                ((F.col("neighbor_id") + _ANN_OFFSET) == F.col("query_id"))
                & (F.col("rnk") == 1)
            ).alias("found")
        )
        .agg(F.coalesce(F.min("found"), F.lit(False)).alias("planted_rank1_ok"))
    )
    baseline = spark.read.parquet(os.path.join(base, "baseline")).select(
        F.col("mse").alias("mse0")
    )
    met = spark.read.parquet(os.path.join(base, "metrics"))
    drift = (
        met.crossJoin(F.broadcast(baseline))
        .agg(
            F.coalesce(F.min(F.col("mse") <= 1.5 * F.col("mse0")), F.lit(False))
            .alias("drift_untripped_ok"),
            F.count_distinct("epoch").alias("n_ep"),
        )
    )
    counts = emb.agg(
        F.sum((F.col("vec_id") % 5 != 0).cast("long")).alias("n_corpus"),
        F.sum((F.col("vec_id") % 5 == 0).cast("long")).alias("n_delta_new"),
        F.sum(
            ((F.col("vec_id") % 7 == 0) & (F.col("vec_id") % 5 != 0)).cast("long")
        ).alias("n_planted"),
    )
    return (
        counts.crossJoin(rows_ok)
        .crossJoin(equiv)
        .crossJoin(recall)
        .crossJoin(drift)
        .select(
            "n_corpus",
            "n_delta_new",
            "n_planted",
            F.when(F.col("n_ep") == 3, F.lit(3)).otherwise(F.lit(-1))
            .cast("long")
            .alias("n_epochs"),
            "index_rows_ok",
            "stream_equals_batch_ok",
            "exactly_once_ok",
            "planted_rank1_ok",
            "drift_untripped_ok",
        )
    )


# =====================================================================
# Residual IVF-PQ (operators/similarity.ivfpq_residual_*)
# =====================================================================

def _ivfpq_residual_bench(spark, sf_dir):
    """Bare residual IVFADC chain: build (cells + residual books +
    residual codes), answer top-10 for 16 queries at nprobe=4."""
    from ..operators import similarity as SIM

    emb = _t(spark, sf_dir, "embeddings")
    centroids, books, enc = SIM.ivfpq_residual_index(
        emb, n_centroids=16, m=8, ksub=16, iters=3
    )
    q = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.ivfpq_residual_topk(q, centroids, books, enc, k=10, nprobe=4)


@register_staged(
    "ann_cosine_topk_ivfpq_residual",
    oracle="""
        SELECT CAST(sum(CASE WHEN vec_id % 7 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_plants,
               CAST(16 AS BIGINT) AS n_recall_queries,
               true AS plants_rank1_ok,
               true AS self_rank1_ok,
               true AS recall_floor_ok,
               true AS within_k
        FROM embeddings
    """,
    tags=("similarity", "llm-pipeline", "arrow", "ivf", "pq"),
    bench_fn=_ivfpq_residual_bench,
)
def ann_cosine_topk_ivfpq_residual(spark, sf_dir):
    """RESIDUAL-encoding IVF-PQ ANN (the full IVFADC of Jegou 2011
    §IV — codes quantize vec - centroid[cell]; the registered
    ann_cosine_topk_ivfpq keeps the non-residual variant and documents
    this trade). Same byte budget, tighter codes where the corpus
    clusters: measured 2.6x recall@10 over non-residual on clustered
    vectors at equal storage, a wash on this deliberately near-uniform
    fixture (NOTES round 9) — the knob is data-dependent and both
    variants share artifacts discipline. Contract (the ivfpq recipe):

    (a) planted exact duplicates (vec_id%7 re-ingested at +10M)
        retrieve their ORIGINAL at rank 1 under nprobe=1 — identical
        vector => same cell => identical residual => identical codes
        => tied minimum adist, id tie-break;
    (b) self-retrieval: with self-exclusion off each recall query's
        rank-1 is itself (measured 48/48 across the three SFs — for
        residual coding this is empirical, not the plain-PQ theorem,
        because cross-cell reconstructions are not bounded by the own
        quantization error);
    (c) mean recall@10 vs exact brute-force cosine over 16 queries at
        nprobe=4 >= 0.08 — measured 0.163-0.225 across the three SFs
        (>= 2x clearance);
    (d) exactly k rows per query, contiguous ranks.
    Counts cross the engine compare."""
    from ..operators import similarity as SIM

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    offset = 10_000_000
    plants = emb.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + offset).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(plants)
    centroids, books, enc = SIM.ivfpq_residual_index(
        corpus, n_centroids=16, m=8, ksub=16, iters=3
    )
    enc = enc.cache()

    plant_q = plants.select(F.col("vec_id").alias("query_id"), "embedding")
    p_hits = SIM.ivfpq_residual_topk(
        plant_q, centroids, books, enc, k=2, nprobe=1
    )
    plants_ok = (
        p_hits.groupBy("query_id")
        .agg(
            F.max(
                ((F.col("neighbor_id") + offset) == F.col("query_id"))
                & (F.col("rnk") == 1)
            ).alias("ok")
        )
        .agg(
            F.coalesce(F.min("ok"), F.lit(False)).alias("plants_rank1_ok"),
            F.count(F.lit(1)).cast("long").alias("n_plants"),
        )
    )

    enc_plain = enc.filter(F.col("vec_id") < offset)
    qrec = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    r10 = SIM.ivfpq_residual_topk(
        qrec, centroids, books, enc_plain, k=10, nprobe=4
    ).cache()
    exact10 = SIM.brute_force_topk(qrec, emb, k=10, exclude_self=False)
    overlap = (
        exact10.select("query_id", F.col("neighbor_id").alias("n"))
        .join(r10.select("query_id", F.col("neighbor_id").alias("n")), ["query_id", "n"])
        .groupBy("query_id")
        .agg((F.count(F.lit(1)) / F.lit(10.0)).alias("recall"))
    )
    recall_ok = overlap.agg(
        (F.avg("recall") >= 0.08).alias("recall_floor_ok"),
        F.count(F.lit(1)).cast("long").alias("n_recall_queries"),
    )
    self_ok = r10.filter(F.col("rnk") == 1).agg(
        F.coalesce(
            F.min(F.col("neighbor_id") == F.col("query_id")), F.lit(False)
        ).alias("self_rank1_ok")
    )
    withink = (
        r10.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("nk"),
            F.count_distinct("rnk").alias("ndr"),
            F.max("rnk").alias("mr"),
        )
        .agg(
            F.coalesce(
                F.min(
                    (F.col("nk") == 10) & (F.col("ndr") == 10) & (F.col("mr") == 10)
                ),
                F.lit(False),
            ).alias("within_k")
        )
    )
    out = (
        plants_ok.crossJoin(recall_ok)
        .crossJoin(self_ok)
        .crossJoin(withink)
        .select(
            "n_plants",
            "n_recall_queries",
            "plants_rank1_ok",
            "self_rank1_ok",
            "recall_floor_ok",
            "within_k",
        )
    )
    row = out.localCheckpoint(eager=True)
    enc.unpersist()
    r10.unpersist()
    return row


# =====================================================================
# Byte-level BPE with special tokens (operators/tokenizer.py)
# =====================================================================

def _bpe_byte_bench(spark, sf_dir):
    from ..operators import tokenizer as TOK

    d = _t(spark, sf_dir, "documents")
    merges = TOK.bpe_learn_merges(d, n_merges=200, byte_level=True)
    marked = d.select(
        "doc_id", F.concat(F.lit("<|doc|> "), F.col("text")).alias("text")
    )
    return TOK.bpe_encode(
        marked, merges, byte_level=True, special_tokens=["<|doc|>"]
    ).agg(F.sum("n_tokens").alias("total_tokens"))


@register_staged(
    "bpe_byte_level_encode",
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(octet_length(encode(
                   regexp_replace(text, '\\s', '', 'g')))) AS BIGINT)
                   AS n_nonspace_utf8_bytes,
               true AS specials_atomic_ok,
               true AS decode_roundtrip_ok,
               true AS compressed
        FROM documents
    """,
    tags=("text", "tokenizer", "llm-pipeline", "arrow"),
    bench_fn=_bpe_byte_bench,
)
def bpe_byte_level_encode(spark, sf_dir):
    """Byte-level BPE with special-token reservation (the GPT-2
    deployment shape — Radford et al. 2019; extends the registered
    bpe_tokenizer_encode, whose trainer contract is untouched): train
    in the closed 256-symbol byte alphabet, inject a ``<|doc|>``
    control marker into every document, and encode with the marker
    reserved. Contract:

    (a) specials_atomic_ok: every document's token stream carries the
        marker EXACTLY once, verbatim — never split to bytes, never
        merged across;
    (b) decode_roundtrip_ok: the byte-space token stream (marker
        excluded) inverts to the whitespace-stripped original for
        EVERY document — checked entirely JVM-side by ``translate``
        over the fixed 256-char bijection against the latin-1 view of
        the text's UTF-8 bytes, so the exactness check costs no
        Python;
    (c) the crossing value ``n_nonspace_utf8_bytes`` is derived from
        TOKEN LENGTHS on the engine side (one byte-space char == one
        byte) but from ``octet_length`` of the raw text in SQL —
        equality is the reconstruction property in count form at the
        BYTE level, which the char-level twin cannot see;
    (d) compressed: the merge table collapsed something."""
    from ..operators import tokenizer as TOK
    from ..operators.tokenizer import byte_unicode_map

    d = _t(spark, sf_dir, "documents")
    merges = TOK.bpe_learn_merges(d, n_merges=200, byte_level=True)
    marked = d.select(
        "doc_id", F.concat(F.lit("<|doc|> "), F.col("text")).alias("text")
    )
    enc = TOK.bpe_encode(
        marked, merges, byte_level=True, special_tokens=["<|doc|>"]
    )
    m = byte_unicode_map()
    src = "".join(m[b] for b in range(256))
    dst = "".join(chr(b) for b in range(256))
    body = F.filter("tokens", lambda t: t != F.lit("<|doc|>"))
    per_doc = enc.join(d.select("doc_id", "text"), "doc_id").select(
        (F.size("tokens") - F.size(body) == 1).alias("special_once"),
        F.aggregate(
            F.transform(body, lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("token_bytes"),
        F.size(body).cast("long").alias("n_body_tokens"),
        (
            F.translate(F.concat_ws("", body), src, dst)
            == F.decode(
                F.encode(F.regexp_replace("text", r"\s", ""), "utf-8"),
                "iso-8859-1",
            )
        ).alias("rt_ok"),
    )
    return per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("token_bytes").cast("long").alias("n_nonspace_utf8_bytes"),
        F.coalesce(F.min("special_once"), F.lit(False)).alias("specials_atomic_ok"),
        F.coalesce(F.min("rt_ok"), F.lit(False)).alias("decode_roundtrip_ok"),
        (F.sum("n_body_tokens") < F.sum("token_bytes")).alias("compressed"),
    )


# =====================================================================
# Streaming distinct-count synopsis (streaming/sketches.py)
# =====================================================================

def _run_stream_kmv(spark, sf_dir, base, epoch_times=None):
    """Stage the full corpus's (lang, trigram) unit stream as three
    epoch files (split by doc_id % 3) and run the synopsis sink to
    completion."""
    import os

    from ..streaming.sketches import kmv_sketch_sink
    from .queries import _stream_partitions

    units = _kmv_stream_units(spark, sf_dir)
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
        q = kmv_sketch_sink(
            stream,
            ["lang"],
            "val",
            k=_KMV_K,
            store_path=os.path.join(base, "store"),
            checkpoint=os.path.join(base, "ckpt"),
            available_now=True,
            epoch_times=epoch_times,
        )
        q.awaitTermination()


def _kmv_stream_units(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        F.explode(
            word_shingles_from_tokens(tokens(F.col("text")), 3)
        ).alias("val"),
    )


# per-epoch wall seconds of the most recent bench run
LAST_STREAM_KMV_EPOCH_SEC: list = []


def _stream_kmv_bench(spark, sf_dir):
    import os
    import tempfile

    base = tempfile.mkdtemp(prefix="stream_kmv_bench_")
    epoch_times: dict = {}
    _run_stream_kmv(spark, sf_dir, base, epoch_times=epoch_times)
    LAST_STREAM_KMV_EPOCH_SEC.append(
        [round(epoch_times[kk], 3) for kk in sorted(epoch_times)]
    )
    return spark.read.parquet(os.path.join(base, "store")).select(
        "lang", "epoch", F.size("kmv_hashes").alias("n")
    )


@register_staged(
    "streaming_kmv_distinct",
    oracle=f"""
        WITH toks AS (
            SELECT lang,
                   list_filter(regexp_split_to_array(text,
                       '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '') AS t
            FROM documents
        ),
        tri AS (
            SELECT lang,
                   unnest(list_transform(range(1, len(t) - 1),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS val
            FROM toks
        ),
        h AS (
            SELECT DISTINCT lang,
                   CAST(('0x' || substr(md5(val), 1, 15)) AS BIGINT) AS h
            FROM tri
        ),
        r AS (
            SELECT lang, h,
                   row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
            FROM h
        ),
        sk AS (
            SELECT lang, COUNT(*) AS n_synopsis, MAX(h) AS kth_hash
            FROM r WHERE rn <= {_KMV_K} GROUP BY lang
        )
        SELECT lang,
               n_synopsis,
               kth_hash,
               CASE WHEN n_synopsis < {_KMV_K}
                    THEN CAST(n_synopsis AS DOUBLE)
                    ELSE {_KMV_NUM!r} / CAST(kth_hash AS DOUBLE) END
                   AS est_distinct,
               true AS stream_equals_batch,
               true AS estimates_monotone,
               CAST(3 AS BIGINT) AS n_epochs
        FROM sk
    """,
    tags=("streaming", "sketch", "incremental"),
    bench_fn=_stream_kmv_bench,
)
def streaming_kmv_distinct(spark, sf_dir):
    """Streaming distinct-count synopsis maintenance (streaming/
    sketches.py): the corpus's per-language trigram stream ingests in
    three micro-batches; each epoch folds its batch sketch into the
    strictly-earlier epoch's stored synopsis (kmv_merge) and
    overwrites its own epoch directory. Because the KMV merge is
    EXACT on synopses, the final stored state is bit-identical to a
    one-shot batch sketch of everything streamed — and therefore to
    the SQL twin's k-smallest-per-lang over the raw corpus, making
    (n_synopsis, kth_hash, est_distinct) FULL value-level crossing
    columns, not constants. Booleans pin:

    - stream_equals_batch: final stored synopsis arrays == batch
      kmv_sketch of the staged unit stream (exact array equality);
    - estimates_monotone: per lang, the per-epoch stored estimate
      series never decreases (synopses only grow) — the
      cardinality-growth time series the epoch store doubles as."""
    import os
    import tempfile

    from ..operators.sketches import kmv_estimate
    from .queries import _STAGE_CACHE

    key = f"{spark.sparkContext.applicationId}:{sf_dir}:stream_kmv"
    base = _STAGE_CACHE.get(key)
    if base is None:
        base = tempfile.mkdtemp(prefix="stream_kmv_")
        _run_stream_kmv(spark, sf_dir, base)
        _STAGE_CACHE[key] = base
    store = spark.read.parquet(os.path.join(base, "store"))
    final = store.filter(F.col("epoch") == 2).select("lang", "kmv_hashes")
    batch = kmv_sketch(
        _kmv_stream_units(spark, sf_dir), ["lang"], F.col("val"), k=_KMV_K
    ).select("lang", F.col("kmv_hashes").alias("b_hashes"))
    eq = (
        final.join(batch, "lang", "full")
        .agg(
            F.coalesce(
                F.min(
                    F.col("kmv_hashes").isNotNull()
                    & F.col("b_hashes").isNotNull()
                    & (F.col("kmv_hashes") == F.col("b_hashes"))
                ),
                F.lit(False),
            ).alias("stream_equals_batch")
        )
    )
    ests = store.select(
        "lang", "epoch", kmv_estimate(F.col("kmv_hashes"), _KMV_K).alias("est")
    )
    from pyspark.sql import Window as W

    lagged = ests.withColumn(
        "prev",
        F.lag("est").over(W.partitionBy("lang").orderBy("epoch")),
    )
    mono = lagged.agg(
        F.coalesce(
            F.min(F.col("prev").isNull() | (F.col("est") >= F.col("prev"))),
            F.lit(False),
        ).alias("estimates_monotone"),
        F.count_distinct("epoch").alias("n_ep"),
    )
    out = final.select(
        "lang",
        F.size("kmv_hashes").cast("long").alias("n_synopsis"),
        F.element_at("kmv_hashes", -1).alias("kth_hash"),
        kmv_estimate(F.col("kmv_hashes"), _KMV_K).alias("est_distinct"),
    )
    return (
        out.crossJoin(eq)
        .crossJoin(mono)
        .select(
            "lang",
            "n_synopsis",
            "kth_hash",
            "est_distinct",
            "stream_equals_batch",
            "estimates_monotone",
            F.when(F.col("n_ep") == 3, F.lit(3)).otherwise(F.lit(-1))
            .cast("long")
            .alias("n_epochs"),
        )
    )


# =====================================================================
# All-pairs source overlap matrix (operators/sketches.kmv_pairwise_matrix)
# =====================================================================

def _kmv_matrix_bench(spark, sf_dir):
    from ..operators.sketches import kmv_pairwise_matrix

    docs = _t(spark, sf_dir, "documents")
    units = docs.select(
        "source",
        F.explode(
            word_shingles_from_tokens(tokens(F.col("text")), 3)
        ).alias("val"),
    )
    sk = kmv_sketch(units, ["source"], F.col("val"), k=_KMV_K)
    return kmv_pairwise_matrix(sk, "source", _KMV_K)


@register_staged(
    "kmv_overlap_matrix",
    oracle=f"""
        WITH toks AS (
            SELECT source,
                   list_filter(regexp_split_to_array(text,
                       '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '') AS t
            FROM documents
        ),
        tri AS (
            SELECT source,
                   unnest(list_transform(range(1, len(t) - 1),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS val
            FROM toks
        ),
        h AS (
            SELECT DISTINCT source,
                   CAST(('0x' || substr(md5(val), 1, 15)) AS BIGINT) AS h
            FROM tri
        ),
        r AS (
            SELECT source, h,
                   row_number() OVER (PARTITION BY source ORDER BY h) AS rn
            FROM h
        ),
        ska AS (SELECT source, h FROM r WHERE rn <= {_KMV_K}),
        sk AS (SELECT source, COUNT(*) AS n, MAX(h) AS kth
               FROM ska GROUP BY source),
        prs AS (
            SELECT a.source AS key_a, b.source AS key_b
            FROM sk a JOIN sk b ON a.source < b.source
        ),
        dh AS (
            SELECT DISTINCT p.key_a, p.key_b, s.h
            FROM prs p
            JOIN ska s ON s.source = p.key_a OR s.source = p.key_b
        ),
        rl AS (
            SELECT key_a, key_b, h,
                   row_number() OVER (PARTITION BY key_a, key_b
                                      ORDER BY h) AS rn
            FROM dh
        ),
        L AS (SELECT key_a, key_b, h FROM rl WHERE rn <= {_KMV_K}),
        lst AS (SELECT key_a, key_b, COUNT(*) AS k_union, MAX(h) AS union_kth
                FROM L GROUP BY key_a, key_b),
        ov AS (
            SELECT L.key_a, L.key_b, COUNT(*) AS overlap
            FROM L
            JOIN ska x ON x.source = L.key_a AND x.h = L.h
            JOIN ska y ON y.source = L.key_b AND y.h = L.h
            GROUP BY L.key_a, L.key_b
        )
        SELECT p.key_a, p.key_b,
               CASE WHEN sa.n < {_KMV_K} THEN CAST(sa.n AS DOUBLE)
                    ELSE {_KMV_NUM!r} / CAST(sa.kth AS DOUBLE) END AS est_a,
               CASE WHEN sb.n < {_KMV_K} THEN CAST(sb.n AS DOUBLE)
                    ELSE {_KMV_NUM!r} / CAST(sb.kth AS DOUBLE) END AS est_b,
               lst.k_union,
               lst.union_kth,
               CASE WHEN lst.k_union < {_KMV_K}
                    THEN CAST(lst.k_union AS DOUBLE)
                    ELSE {_KMV_NUM!r} / CAST(lst.union_kth AS DOUBLE) END
                   AS est_union,
               COALESCE(ov.overlap, 0) AS overlap,
               CAST(COALESCE(ov.overlap, 0) AS DOUBLE)
                   / CAST(lst.k_union AS DOUBLE) AS jaccard_est
        FROM prs p
        JOIN sk sa ON sa.source = p.key_a
        JOIN sk sb ON sb.source = p.key_b
        JOIN lst ON lst.key_a = p.key_a AND lst.key_b = p.key_b
        LEFT JOIN ov ON ov.key_a = p.key_a AND ov.key_b = p.key_b
    """,
    tags=("sketch", "dedup", "contamination", "matrix"),
    bench_fn=_kmv_matrix_bench,
)
def kmv_overlap_matrix(spark, sf_dir):
    """All-pairs cross-source overlap matrix on KMV synopses: for
    every unordered pair of the 20 sources, the trigram-set union /
    overlap / Jaccard estimates — the mixture-planning view ("which
    sources duplicate each other?") that motivates sketching in the
    first place: the exact answer is C(20,2)=190 corpus-sized
    distinct-joins, the synopsis answer is one bounded sketch pass +
    190 pairs of kilobyte array arithmetic, independent of corpus
    size. The oracle computes the IDENTICAL matrix in SQL (same
    hash, same k-smallest, same single-division estimators), so every
    one of the 190 rows crosses the compare at full value level."""
    return _kmv_matrix_bench(spark, sf_dir)


# =====================================================================
# Exact per-pair decontamination (operators/dedup.containment_join)
# =====================================================================

@register_staged(
    "containment_decontamination",
    oracle="""
        WITH toks AS (
            SELECT doc_id, source,
                   list_filter(regexp_split_to_array(text,
                       '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '') AS t
            FROM documents
        ),
        tri AS (
            SELECT doc_id, source,
                   list_distinct(list_transform(range(1, len(t) - 1),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
            FROM toks
        ),
        ev AS (SELECT doc_id, g FROM tri WHERE source = 'src0'),
        tr AS (SELECT doc_id, g FROM tri WHERE source <> 'src0')
        SELECT eval_id, train_id, containment
        FROM (
            SELECT e.doc_id AS eval_id, t.doc_id AS train_id,
                   CAST(len(list_intersect(e.g, t.g)) AS DOUBLE)
                       / len(e.g) AS containment
            FROM ev e, tr t
            WHERE len(e.g) > 0
        )
        WHERE containment >= 0.7
    """,
    tags=("dedup", "contamination", "exact", "llm-pipeline"),
)
def containment_decontamination(spark, sf_dir):
    """Exact per-PAIR decontamination (operators/dedup.
    containment_join): every (eval, train) document pair where >= 70%
    of the eval doc's trigram set is contained in ONE training doc —
    the "which training document contains this eval document"
    question the set-level contamination_check cannot answer. The
    engine runs prefix filtering in containment form (eval-side
    prefix over the train-df-ascending unit order with the slacked
    o_min bound; train postings collapse against the broadcast
    eval-prefix vocabulary before any shuffle); the oracle is the
    full O(|eval| x |train|) brute force, so the compare is
    row-for-row — a single lost candidate fails the hash. Driver
    corpus carries real cross-source plants: 7/2/27 qualifying pairs
    at sf0.001/0.01/0.1."""
    from ..operators.dedup import containment_join

    docs = _t(spark, sf_dir, "documents")
    tri = docs.select(
        "doc_id",
        "source",
        F.array_distinct(
            word_shingles_from_tokens(tokens(F.col("text")), 3)
        ).alias("units"),
    )
    ev = tri.where(F.col("source") == "src0").select(
        F.col("doc_id").alias("eval_id"), "units"
    )
    tr = tri.where(F.col("source") != "src0").select(
        F.col("doc_id").alias("train_id"), "units"
    )
    return containment_join(ev, tr, threshold=0.7)
