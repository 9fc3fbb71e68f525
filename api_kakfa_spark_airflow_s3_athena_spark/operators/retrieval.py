"""Keyword retrieval over the corpus: BM25 scoring and top-k search.

The reference has no text-retrieval surface (SURVEY.md §2 — its
queries are Athena SQL over pipeline output); this extends the
LLM-pipeline family: corpus search is how a training-data pipeline
audits coverage ("show me the top docs for this topic") and builds
targeted eval slices.

Spark-first shape: the query-term set is a tiny literal array, so the
token stream is FILTERED to query terms before anything aggregates —
the shuffle carries only (doc_id, term, tf) rows for matching terms,
never the full token stream. Document lengths and corpus stats come
from one scan-level aggregate each; per-term document frequencies are
a handful of rows broadcast into the scoring join. Scoring is
row-local arithmetic; the only wide operation after the tf aggregate
is the final top-k (rank on rounded score with id tie-break — the
NOTES.md float-parity recipe: ln() is a transcendental, so scores are
rounded before ranking/output on both engines).
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as TX


def bm25_scores(
    docs: DataFrame,
    terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_dp: int = 4,
) -> DataFrame:
    """Per-document BM25 score for a bag of query terms.

    ``score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``
    with the Robertson/Sparck-Jones idf ``ln(1 + (N - df + 0.5)/(df + 0.5))``.

    Returns ``(id, n_match_terms, score)`` for documents matching at
    least one term; ``score`` is rounded to ``round_dp`` decimals (the
    chain multiplies transcendentals — bit-stability across engines
    requires rounding, NOTES.md)."""
    lower_terms = [t.lower() for t in terms]
    base = docs.select(
        F.col(id_col).alias("id"), TX.tokens(F.lower(F.col(text_col))).alias("toks")
    )
    stats = base.select(F.size("toks").alias("dl")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    # term frequencies, query terms only: the explode is corpus-wide
    # but the filter collapses it before the shuffle. Round-13 shape:
    # ``dl`` rides through the explode as a grouping key (functionally
    # dependent on the id — identical groups), which deletes the former
    # corpus-wide (id, dl) SortMergeJoin; the tf frame is materialized
    # once (bounded by the matching-docs working set) so the df census
    # and the scoring pass don't each re-run tokenize+explode.
    from ._util import materialize_once

    tf = materialize_once(
        base.select("id", F.size("toks").alias("dl"), F.explode("toks").alias("term"))
        .filter(F.col("term").isin(lower_terms))
        .groupBy("id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    scored = tf.join(F.broadcast(df_t), "term").crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_norm = (
        F.col("tf").cast("double")
        * (k1 + 1.0)
        / (F.col("tf").cast("double") + k1 * (1.0 - b + b * F.col("dl") / avgdl))
    )
    return (
        scored.withColumn("part", idf * tf_norm)
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_match_terms"),
            F.round(F.sum("part"), round_dp).alias("score"),
        )
    )


def keyword_topk(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25, deterministic: rank on the rounded
    score descending with id ascending as tie-break.

    The cut is ``orderBy().limit(k)`` — Spark plans it as
    TakeOrderedAndProject (per-partition partial top-k, then a k-row
    merge on the driver side of the exchange), NOT a global sort: the
    matching-doc set can be millions of rows at corpus scale. Only the
    k survivors see the row_number window (single tiny partition by
    construction)."""
    scored = bm25_scores(docs, terms, text_col=text_col, id_col=id_col)
    top = scored.orderBy(F.col("score").desc(), F.col("id").asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    return top.withColumn("rnk", F.row_number().over(w)).select(
        F.col("id").alias(id_col), "n_match_terms", "score", "rnk"
    )


def prior_topk(
    docs: DataFrame,
    prior_col: Column,
    n: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-n documents by a per-document PRIOR column (recency,
    quality-classifier score, popularity …), as an RRF arm: returns
    ``(id, rnk)`` ranked prior-desc with id tie-break. The cut is
    ``orderBy().limit(n)`` — TakeOrderedAndProject, no global sort —
    and only the n survivors see the row_number window. Rank
    determinism is the caller's contract: pass an integer prior or a
    pre-rounded score (the arm consumes only the resulting RANKS, so
    any deterministic ordering works)."""
    top = (
        docs.select(F.col(id_col).alias("id"), prior_col.alias("__p"))
        .orderBy(F.col("__p").desc(), F.col("id").asc())
        .limit(n)
    )
    w = Window.orderBy(F.col("__p").desc(), F.col("id").asc())
    return top.withColumn("rnk", F.row_number().over(w)).select("id", "rnk")


def rrf_fuse(
    arms: Mapping[str, DataFrame],
    k: int = 10,
    rrf_k: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """N-arm Reciprocal Rank Fusion (Cormack, Clarke & Buettcher,
    SIGIR 2009): ``rrf(d) = sum_arms 1/(rrf_k + rank_arm(d))`` over
    each arm's entries; a document missing from an arm contributes 0
    there. ``arms`` maps arm name -> ``(id, rnk)`` frame (insertion
    order fixes the summation order, so results are deterministic);
    output carries one ``in_<name>`` flag per arm.

    Rank-only fusion is what makes adding arms trivial: no score
    calibration crosses arms, so any deterministic ranker — sparse,
    dense, a recency or quality prior — composes by contributing its
    rank column. Each arm is already a bounded top-n, so the fusion
    join chain touches ≤ sum(n_arm) rows — free at any corpus size.

    Float parity: the fused score folds from 0.0 over single IEEE
    divisions of exact integers; adding 0.0 to a non-negative double
    is exact, so the fold is bit-identical to the plain left-to-right
    sum an SQL twin writes (NOTES.md float recipe — never round
    exact-ratio arithmetic)."""
    # Round-13 shape: the former full-outer JOIN chain is not
    # broadcastable (FullOuter has no BHJ), so N arms cost 2N sorted
    # exchanges however tiny the frames; a tagged UNION + one pivot
    # aggregate produces the identical (id, rnk_<arm>...) rows with a
    # single exchange. Arm ids are unique per arm (each arm is a
    # ranked top-n), so max(when) recovers exactly the joined rank.
    tagged: Optional[DataFrame] = None
    for name, arm in arms.items():
        a = arm.select(F.col("id"), F.lit(name).alias("__arm"), F.col("rnk"))
        tagged = a if tagged is None else tagged.unionByName(a)
    joined = tagged.groupBy("id").agg(
        *[
            F.max(F.when(F.col("__arm") == name, F.col("rnk"))).alias(f"rnk_{name}")
            for name in arms
        ]
    )
    one = F.lit(1).cast("double")
    score = F.lit(0.0)
    flags = []
    for name in arms:
        score = score + F.coalesce(
            one / (F.lit(rrf_k) + F.col(f"rnk_{name}")), F.lit(0.0)
        )
        flags.append(F.col(f"rnk_{name}").isNotNull().alias(f"in_{name}"))
    fused = joined.select(F.col("id").alias(id_col), *flags, score.alias("rrf_score"))
    top = fused.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    return top.withColumn("rnk", F.row_number().over(w))


def hybrid_rrf3_topk(
    docs: DataFrame,
    emb: DataFrame,
    terms: Sequence[str],
    prior_col: Optional[Column] = None,
    query_vec_id: int = 7,
    k: int = 10,
    n_arm: int = 20,
    rrf_k: int = 60,
    text_col: str = "text",
    id_col: str = "doc_id",
    emb_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Three-arm hybrid retrieval: BM25 sparse + exact-cosine dense +
    a per-document PRIOR arm (default: the stored ``n_chars`` length
    prior — substitute any deterministic per-doc score column, e.g.
    the quality classifier's quantized output or a recency stamp),
    fused by :func:`rrf_fuse`. The prior arm is how production RAG
    stacks bias retrieval toward fresh/high-quality documents without
    touching the relevance arms — rank-only fusion needs no weight
    tuning to stay sane, and each arm keeps its own bounded top-n
    scale shape. Returns ``(doc_id, in_sparse, in_dense, in_prior,
    rrf_score, rnk)``."""
    from .similarity import brute_force_topk

    if prior_col is None:
        prior_col = F.col("n_chars")
    sparse = keyword_topk(
        docs, terms, k=n_arm, text_col=text_col, id_col=id_col
    ).select(F.col(id_col).alias("id"), F.col("rnk"))
    q = emb.filter(F.col(emb_id) == query_vec_id).select(
        F.col(emb_id).alias("query_id"), F.col(vec_col)
    )
    dense = brute_force_topk(
        q, emb, k=n_arm, corpus_id=emb_id, vec_col=vec_col
    ).select(F.col("neighbor_id").alias("id"), F.col("rank").alias("rnk"))
    prior = prior_topk(docs, prior_col, n_arm, id_col=id_col)
    return rrf_fuse(
        {"sparse": sparse, "dense": dense, "prior": prior},
        k=k,
        rrf_k=rrf_k,
        id_col=id_col,
    )


def hybrid_rrf_topk(
    docs: DataFrame,
    emb: DataFrame,
    terms: Sequence[str],
    query_vec_id: int = 7,
    k: int = 10,
    n_arm: int = 20,
    rrf_k: int = 60,
    text_col: str = "text",
    id_col: str = "doc_id",
    emb_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid retrieval: BM25 keyword arm + exact-cosine dense arm,
    fused by Reciprocal Rank Fusion (Cormack, Clarke & Buettcher,
    SIGIR 2009): ``rrf(d) = sum_arms 1/(rrf_k + rank_arm(d))`` over
    each arm's top ``n_arm``, missing arm contributes 0. The modern
    RAG retrieval shape — sparse catches exact keyword hits dense
    embeddings smear out, dense catches paraphrases sparse can't see,
    and RRF needs NO score calibration between the arms because it
    only consumes RANKS.

    Scale shape: each arm is already a bounded top-n (BM25 via
    TakeOrderedAndProject, cosine via the broadcast-scored skinny
    rank), so the fusion join touches at most ``2 * n_arm`` rows —
    the fusion stage is free at any corpus size; the cost lives in
    the arms, which keep their own documented scale designs.

    Float parity: each arm ranks on ROUNDED scores (deterministic
    integer ranks), and the fused score is a sum of two single IEEE
    divisions of exact integers — bit-identical across engines, so it
    is deliberately NOT rounded (NOTES.md float recipe: never round
    exact-ratio arithmetic). Returns ``(doc_id, in_sparse, in_dense,
    rrf_score, rnk)``, ranked desc with id tie-break."""
    from .similarity import brute_force_topk

    sparse = keyword_topk(
        docs, terms, k=n_arm, text_col=text_col, id_col=id_col
    ).select(F.col(id_col).alias("id"), F.col("rnk").alias("rnk_sparse"))
    q = emb.filter(F.col(emb_id) == query_vec_id).select(
        F.col(emb_id).alias("query_id"), F.col(vec_col)
    )
    dense = brute_force_topk(
        q, emb, k=n_arm, corpus_id=emb_id, vec_col=vec_col
    ).select(F.col("neighbor_id").alias("id"), F.col("rank").alias("rnk_dense"))
    one = F.lit(1).cast("double")
    # union + pivot aggregate instead of the unbroadcastable FullOuter
    # join (see rrf_fuse) — identical rows, one exchange instead of two
    tagged = sparse.select(
        "id", F.lit("s").alias("__arm"), F.col("rnk_sparse").alias("rnk")
    ).unionByName(
        dense.select("id", F.lit("d").alias("__arm"), F.col("rnk_dense").alias("rnk"))
    )
    fused = (
        tagged.groupBy("id")
        .agg(
            F.max(F.when(F.col("__arm") == "s", F.col("rnk"))).alias("rnk_sparse"),
            F.max(F.when(F.col("__arm") == "d", F.col("rnk"))).alias("rnk_dense"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("rnk_sparse").isNotNull().alias("in_sparse"),
            F.col("rnk_dense").isNotNull().alias("in_dense"),
            (
                F.coalesce(one / (F.lit(rrf_k) + F.col("rnk_sparse")), F.lit(0.0))
                + F.coalesce(one / (F.lit(rrf_k) + F.col("rnk_dense")), F.lit(0.0))
            ).alias("rrf_score"),
        )
    )
    top = fused.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    return top.withColumn("rnk", F.row_number().over(w))


# =====================================================================
# Positional inverted index + phrase search
# =====================================================================


def positional_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The classic IR index structure as a DataFrame: one row per
    token OCCURRENCE with its 1-based position — ``(doc_id, token,
    pos)``. posexplode is a narrow op (no shuffle); persisted/bucketed
    by token at scale, the postings table answers boolean, phrase and
    proximity queries with key-wise joins only. Positions let phrase
    queries verify ADJACENCY, which a bag-of-words postings list
    cannot.

    Tokens are kept CASE-SENSITIVE — deliberately matching the
    trigram/KMV/heavy-hitter unit tokenization (``TX.tokens`` raw)
    rather than the BM25 scorer's lowercased terms: phrase search is
    an exact-surface-form operator (the dedup/decontamination use),
    so "Quick brown" and "quick brown" are distinct phrases here.
    Wrap ``F.lower(text)`` upstream for case-folded search."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(TX.tokens(F.col(text_col))).alias("pos0", "token"),
    ).select("doc_id", "token", (F.col("pos0") + 1).alias("pos"))


def phrase_occurrences(
    postings: DataFrame, phrase_terms: Sequence[str]
) -> DataFrame:
    """All occurrences of an n-term phrase via positional adjacency
    joins: occurrences of term_i at position p survive iff term_{i+1}
    occurs at p+1 in the same doc. The driving side is the FIRST
    term's postings filtered at the scan; each join is an equi-join on
    (doc_id, pos+i) — key-wise shuffles on postings slices of the
    individual terms only, never the corpus. Rarest-first ordering of
    the join chain is the classic optimization; with AQE the
    broadcast/shuffle choice per step is runtime-sized.

    Returns ``(doc_id, pos)`` of each phrase start."""
    if not phrase_terms:
        raise ValueError("phrase_terms must be non-empty")
    cur = postings.where(F.col("token") == phrase_terms[0]).select(
        "doc_id", F.col("pos").alias("pos")
    )
    for i, term in enumerate(phrase_terms[1:], start=1):
        nxt = postings.where(F.col("token") == term).select(
            "doc_id", (F.col("pos") - i).alias("pos")
        )
        cur = cur.join(nxt, ["doc_id", "pos"], "inner")
    return cur


def phrase_search(
    docs: DataFrame,
    phrase_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Documents containing the exact phrase, with occurrence counts:
    ``(doc_id, n_occurrences)``. Composition of
    :func:`positional_postings` + :func:`phrase_occurrences` + one
    per-doc count."""
    hits = phrase_occurrences(
        positional_postings(docs, text_col, id_col), phrase_terms
    )
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
