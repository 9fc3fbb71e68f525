"""Round-5 LLM-pipeline operators: linear classifier inference
(operators/scoring.py), leakage-safe cluster-aware splits, and
boilerplate span coverage — behavior pins independent of the DuckDB
oracle dual-run."""

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.operators.scoring import (
    WEIGHT_SCALE,
    hashed_feature_buckets,
    linear_text_classifier,
    pseudo_weights,
)
from api_kakfa_spark_airflow_s3_athena_spark.plans.queries import (
    boilerplate_span_coverage,
    cluster_aware_split,
)

SF = "/root/testdata/sf0.001"


def _py_bucket(feat: str, n_buckets: int) -> int:
    return int(hashlib.md5(feat.encode()).hexdigest()[:8], 16) % n_buckets


def _py_weight(bucket: int) -> int:
    h = int(hashlib.md5(f"w{bucket}".encode()).hexdigest()[:8], 16)
    return h % (2 * WEIGHT_SCALE + 1) - WEIGHT_SCALE


def test_feature_buckets_match_reference_hash(spark):
    """Spark's conv(md5)-based bucket equals hashlib's — the property
    that lets any engine (oracle, feature store) reproduce features."""
    df = spark.createDataFrame([Row(text="alpha beta gamma")])
    got = df.select(
        hashed_feature_buckets(F.col("text"), 256).alias("b")
    ).collect()[0].b
    feats = ["alpha", "beta", "gamma", "alpha beta", "beta gamma"]
    assert got == [_py_bucket(f, 256) for f in feats]


def test_pseudo_weights_range_and_determinism(spark):
    w = pseudo_weights(spark, 64).collect()
    assert len(w) == 64
    assert all(-WEIGHT_SCALE <= r.w_int <= WEIGHT_SCALE for r in w)
    assert [r.w_int for r in w] == [_py_weight(r.bucket) for r in w]


def test_classifier_score_is_exact_dot_product(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="x y x"), Row(doc_id=2, text="solo")]
    )
    weights = pseudo_weights(spark, 32)
    out = {
        r.doc_id: r
        for r in linear_text_classifier(docs, weights, n_buckets=32).collect()
    }
    # doc 1: unigrams x,y,x + bigrams "x y","y x" -> 5 features
    feats = ["x", "y", "x", "x y", "y x"]
    score_int = sum(_py_weight(_py_bucket(f, 32)) for f in feats)
    assert out[1].n_feats == 5
    assert out[1].score == score_int / (5 * WEIGHT_SCALE)
    assert out[1].keep == (score_int > 0)
    # doc 2: one unigram, no bigram
    assert out[2].n_feats == 1


def test_classifier_empty_text_produces_no_row(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text=""), Row(doc_id=2, text="a")])
    weights = pseudo_weights(spark, 16)
    ids = [r.doc_id for r in linear_text_classifier(docs, weights, n_buckets=16).collect()]
    assert ids == [2]


def test_classifier_plan_broadcasts_weights(spark):
    """The weight table must broadcast — a shuffle join on bucket would
    reshuffle the exploded corpus feature stream at 100 TB."""
    docs = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    plan = linear_text_classifier(
        docs, pseudo_weights(spark, 16), n_buckets=16
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_cluster_aware_split_no_leakage(spark):
    """Every fingerprint cluster lands in exactly one split, and split
    fractions are plausibly 80/10/10."""
    out = cluster_aware_split(spark, SF)
    per_cluster = (
        out.groupBy("cluster_rep").agg(F.count_distinct("split").alias("ns")).collect()
    )
    assert all(r.ns == 1 for r in per_cluster)
    frac = {
        r.split: r.n
        for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = sum(frac.values())
    assert frac.get("train", 0) / total > 0.6
    assert 0 < frac.get("val", 0) / total < 0.25
    assert 0 < frac.get("test", 0) / total < 0.25


def test_cluster_aware_split_duplicates_share_split(spark):
    """Two reordered copies of the same content (same bag-of-words)
    must inherit the same split — the leakage the operator prevents."""
    import tempfile

    d = tempfile.mkdtemp(prefix="split_docs_")
    spark.createDataFrame(
        [
            Row(doc_id=100, text="b a c", lang="en", source="s", n_chars=5),
            Row(doc_id=205, text="c b a", lang="en", source="s", n_chars=5),
            Row(doc_id=1, text="totally different words", lang="en", source="s", n_chars=23),
        ]
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {r.doc_id: (r.cluster_rep, r.split) for r in cluster_aware_split(spark, d).collect()}
    assert out[100] == out[205]
    assert out[100][0] == 100  # min doc_id is the representative


def test_boilerplate_coverage_planted_span(spark):
    """8 identical lead tokens in 3 docs of one source = boilerplate;
    a doc sharing the span in a DIFFERENT source is not flagged."""
    import tempfile

    lead = "w1 w2 w3 w4 w5 w6 w7 w8"
    d = tempfile.mkdtemp(prefix="bp_docs_")
    rows = [
        Row(doc_id=i, text=f"{lead} unique{i} tail{i}", lang="en", source="a", n_chars=1)
        for i in range(3)
    ] + [
        Row(doc_id=10, text=f"{lead} other words", lang="en", source="b", n_chars=1),
        Row(doc_id=11, text="short text", lang="en", source="b", n_chars=1),
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {r.doc_id: r for r in boilerplate_span_coverage(spark, d).collect()}
    for i in range(3):
        assert out[i].n_tokens == 10
        assert out[i].n_covered == 8  # exactly the planted window
        assert abs(out[i].coverage_frac - 0.8) < 1e-12
    assert out[10].n_covered == 0  # same span, different source
    assert out[11].n_covered == 0 and out[11].n_tokens == 2  # sub-window doc survives


def test_boilerplate_hashed_twin_matches_on_planted_span(spark):
    """The round-7 reworked hashed variant (packed xxhash64(source,
    window) key, doc-distinct census, eager-bp branch) must return the
    STRING variant's rows exactly on a corpus where boilerplate EXISTS
    — this drives the non-empty branch (broadcast join + coverage
    rollup), which the driver corpora never reach (their bp census is
    empty at every tested SF, so the dual-run only exercises the
    empty shortcut)."""
    import tempfile

    from api_kakfa_spark_airflow_s3_athena_spark.plans.queries import (
        boilerplate_span_coverage_hashed,
    )

    lead = "w1 w2 w3 w4 w5 w6 w7 w8"
    d = tempfile.mkdtemp(prefix="bp_docs_h_")
    rows = [
        Row(doc_id=i, text=f"{lead} unique{i} tail{i}", lang="en", source="a", n_chars=1)
        for i in range(3)
    ] + [
        Row(doc_id=10, text=f"{lead} other words", lang="en", source="b", n_chars=1),
        # repeated window WITHIN one doc: the doc-distinct census must
        # count it once (nd=1, not 3), so it must NOT become boilerplate
        Row(doc_id=11, text=f"{lead} {lead} {lead}", lang="en", source="b", n_chars=1),
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = sorted(map(tuple, boilerplate_span_coverage_hashed(spark, d).collect()))
    want = sorted(map(tuple, boilerplate_span_coverage(spark, d).collect()))
    assert got == want
    by_id = {t[0]: t for t in got}
    assert by_id[0][2] == 8  # planted window covered
    assert by_id[11][2] == 0  # in-doc repetition alone is not boilerplate


def test_boilerplate_hashed_empty_shortcut(spark):
    """No window reaches 3 distinct docs -> the hashed variant takes
    the no-second-pass branch and still emits every doc with zero
    coverage, identical to the string variant."""
    import tempfile

    from api_kakfa_spark_airflow_s3_athena_spark.plans.queries import (
        boilerplate_span_coverage_hashed,
    )

    d = tempfile.mkdtemp(prefix="bp_docs_e_")
    rows = [
        Row(doc_id=i, text=f"a{i} b{i} c{i} d{i} e{i} f{i} g{i} h{i} i{i}",
            lang="en", source="a", n_chars=1)
        for i in range(4)
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = sorted(map(tuple, boilerplate_span_coverage_hashed(spark, d).collect()))
    want = sorted(map(tuple, boilerplate_span_coverage(spark, d).collect()))
    assert got == want
    assert all(t[2] == 0 and t[3] == 0.0 for t in got)


def test_dup_window_spans_hashed_twin_branches(spark):
    """Round-7 reworked duplicate_window_spans_hashed: both its
    branches must return the string variant's rows exactly — the
    broadcast join branch (a shared window exists) and the row-local
    empty branch (no window crosses two docs; zero shuffles past the
    census)."""
    import tempfile

    from api_kakfa_spark_airflow_s3_athena_spark.plans.queries import (
        duplicate_window_spans,
        duplicate_window_spans_hashed,
    )

    lead = "w1 w2 w3 w4 w5 w6 w7 w8"
    d = tempfile.mkdtemp(prefix="dw_docs_")
    rows = [
        Row(doc_id=1, text=f"{lead} unique1 tail1", lang="en", source="a", n_chars=1),
        Row(doc_id=2, text=f"{lead} unique2 tail2", lang="en", source="b", n_chars=1),
        Row(doc_id=3, text="x1 x2 x3 x4 x5 x6 x7 x8 x9", lang="en", source="a", n_chars=1),
        Row(doc_id=4, text="too short", lang="en", source="a", n_chars=1),
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = sorted(map(tuple, duplicate_window_spans_hashed(spark, d).collect()))
    want = sorted(map(tuple, duplicate_window_spans(spark, d).collect()))
    assert got == want
    by_id = {t[0]: t for t in got}
    assert by_id[1][2] == 1 and by_id[2][2] == 1  # the shared lead window
    assert by_id[3][2] == 0
    assert 4 not in by_id  # <8 tokens -> no windows -> omitted (both variants)

    # empty branch: all windows unique
    d2 = tempfile.mkdtemp(prefix="dw_docs_e_")
    rows2 = [
        Row(doc_id=i, text=f"a{i} b{i} c{i} d{i} e{i} f{i} g{i} h{i} i{i}",
            lang="en", source="a", n_chars=1)
        for i in range(3)
    ]
    spark.createDataFrame(rows2).write.mode("overwrite").parquet(f"{d2}/documents.parquet")
    got2 = sorted(map(tuple, duplicate_window_spans_hashed(spark, d2).collect()))
    want2 = sorted(map(tuple, duplicate_window_spans(spark, d2).collect()))
    assert got2 == want2
    assert all(t[2] == 0 and t[3] == 0.0 for t in got2)
    assert all(t[1] == 2 for t in got2)  # 9 tokens -> 2 distinct windows


def test_bm25_matches_hand_computation(spark):
    """BM25 on a 3-doc corpus against the textbook formula."""
    import math

    from api_kakfa_spark_airflow_s3_athena_spark.operators.retrieval import (
        bm25_scores,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="cat cat dog"),
            Row(doc_id=2, text="dog bird"),
            Row(doc_id=3, text="fish fish fish fish"),
        ]
    )
    out = {r.id: r for r in bm25_scores(docs, ["cat", "dog"]).collect()}
    n, avgdl = 3, 9 / 3
    k1, b = 1.2, 0.75

    def score(tf, df, dl):
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert out[1].n_match_terms == 2
    assert out[1].score == round(score(2, 1, 3) + score(1, 2, 3), 4)
    assert out[2].n_match_terms == 1
    assert out[2].score == round(score(1, 2, 2), 4)
    assert 3 not in out  # no matching term -> no row


def test_keyword_topk_plan_avoids_global_sort(spark):
    """The k-cut must plan as TakeOrderedAndProject, not a full
    Sort+Exchange of the scored set."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.retrieval import (
        keyword_topk,
    )

    docs = spark.createDataFrame([Row(doc_id=i, text="a b") for i in range(20)])
    plan = (
        keyword_topk(docs, ["a"], k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_keyword_topk_rank_is_deterministic(spark):
    from api_kakfa_spark_airflow_s3_athena_spark.operators.retrieval import (
        keyword_topk,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, text="x y z" if i % 2 else "x") for i in range(10)]
    )
    a = [(r.doc_id, r.rnk) for r in keyword_topk(docs, ["x", "y"], k=5).collect()]
    bq = [(r.doc_id, r.rnk) for r in keyword_topk(docs, ["x", "y"], k=5).collect()]
    assert a == bq and len(a) == 5
    assert [r for _, r in a] == [1, 2, 3, 4, 5]


def test_compression_ratio_bounds_ordering_and_nulls(spark):
    """Repetitive text compresses below natural prose, high-entropy
    text above it; empty/NULL text yields NULL ratio; results are
    partition-layout independent (row-local stage)."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.scoring import (
        compression_ratio,
    )

    import hashlib as _h

    noise = "".join(
        _h.sha256(bytes([i])).hexdigest() for i in range(64)
    )  # 4096 hex chars, no structure beyond the 16-char alphabet
    rows = [
        Row(doc_id=0, text="lorem ipsum dolor sit amet " * 200),
        Row(doc_id=2, text=noise),
        Row(doc_id=3, text=""),
        Row(doc_id=4, text=None),
    ]
    df = spark.createDataFrame(rows)
    one = {r.id: (r.n_bytes, r.ratio) for r in compression_ratio(df.coalesce(1)).collect()}
    many = {r.id: (r.n_bytes, r.ratio) for r in compression_ratio(df.repartition(7)).collect()}
    assert one == many
    assert one[3][1] is None and one[4][1] is None
    assert 0 < one[0][1] < 0.1          # loop text compresses away
    assert 0.4 < one[2][1] <= 1.25      # hex noise barely compresses
    assert one[0][1] < one[2][1]


def test_compression_ratio_string_ids(spark):
    """Round-8 ADVICE regression: the output id field must inherit
    id_col's actual type — a hardcoded `id long` schema crashed any
    caller with string doc ids."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.scoring import (
        compression_ratio,
    )

    df = spark.createDataFrame(
        [
            Row(doc_id="u-1", text="aaaa bbbb " * 50),
            Row(doc_id="u-2", text=None),
        ]
    )
    out = compression_ratio(df)
    assert out.schema["id"].dataType.simpleString() == "string"
    got = {r.id: r.ratio for r in out.collect()}
    assert set(got) == {"u-1", "u-2"}
    assert got["u-2"] is None and 0 < got["u-1"] < 1


def test_train_linear_classifier_separable_corpus(spark):
    """Full-batch logistic GD on a separable planted corpus: loss
    decreases, train and holdout accuracy hit 1.0, and the quantized
    weight table drives the PRODUCTION inference path to the same
    decisions (train -> quantize -> linear_text_classifier)."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.scoring import (
        linear_text_classifier,
        quantize_weights,
        train_linear_classifier,
    )

    import numpy as np

    fill = ["alpha bravo charlie delta echo", "golf hotel india juliet kilo",
            "lima mike november oscar papa", "quebec romeo sierra tango"]
    rows = []
    for i in range(120):
        base = fill[i % 4] + f" filler{i % 7} filler{i % 11}"
        if i % 2:
            rows.append(Row(doc_id=i, label=1,
                            text=base + " cleanprose cleanprose wellwritten"))
        else:
            rows.append(Row(doc_id=i, label=0,
                            text=base + " spamspam spamspam clickbait"))
    df = spark.createDataFrame(rows)
    train = df.filter(F.col("doc_id") % 3 != 0)
    test = df.filter(F.col("doc_id") % 3 == 0)

    w, hist = train_linear_classifier(train, n_buckets=4096, iters=8, lr=2.0)
    assert len(hist) == 8 and hist[-1] < hist[0]

    # direct-weight holdout accuracy (numpy twin of the scorer)
    from api_kakfa_spark_airflow_s3_athena_spark.operators.scoring import (
        hashed_feature_buckets,
    )

    feats = {
        r.doc_id: (r.label, r.b)
        for r in test.select(
            "doc_id", "label",
            hashed_feature_buckets(F.col("text"), 4096).alias("b"),
        ).collect()
    }
    acc = np.mean(
        [
            (w[np.asarray(b)].sum() > 0) == bool(y)
            for y, b in feats.values()
        ]
    )
    assert acc == 1.0

    # production path: quantized table through linear_text_classifier
    wt = quantize_weights(spark, w)
    scored = {
        r.doc_id: r.keep
        for r in linear_text_classifier(test, wt, n_buckets=4096).collect()
    }
    assert all(scored[i] == bool(feats[i][0]) for i in scored)
    assert len(scored) == test.count()


def test_train_linear_classifier_empty_and_unlabeled_edges(spark):
    """Empty corpus: no iterations recorded, zero weights returned."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.scoring import (
        train_linear_classifier,
    )

    df = spark.createDataFrame([], "doc_id long, label int, text string")
    w, hist = train_linear_classifier(df, n_buckets=64, iters=3)
    assert hist == [] and (w == 0).all()


def test_train_linear_classifier_warm_start(spark):
    """Warm start (incremental training on a new batch) must continue
    from the given weights: the first recorded loss equals the prior
    model's loss on the new data (not the zero-weight baseline), and
    training keeps improving it; a wrong-shaped init fails loudly."""
    import numpy as np
    import pytest as _pytest

    from api_kakfa_spark_airflow_s3_athena_spark.operators.scoring import (
        train_linear_classifier,
    )

    rows = []
    for i in range(80):
        if i % 2:
            rows.append(Row(doc_id=i, label=1,
                            text=f"filler{i % 5} cleanprose wellwritten"))
        else:
            rows.append(Row(doc_id=i, label=0,
                            text=f"filler{i % 5} spamspam clickbait"))
    df = spark.createDataFrame(rows)
    batch1 = df.filter(F.col("doc_id") < 40)
    batch2 = df.filter(F.col("doc_id") >= 40)

    w1, h1 = train_linear_classifier(batch1, n_buckets=512, iters=4, lr=2.0)
    w2, h2 = train_linear_classifier(
        batch2, n_buckets=512, iters=4, lr=2.0, init_weights=w1
    )
    cold, hc = train_linear_classifier(batch2, n_buckets=512, iters=1, lr=2.0)
    # warm baseline (loss of w1 on batch2) beats the zero-weight
    # baseline: the prior model transfers
    assert h2[0] < hc[0]
    assert h2[-1] < h2[0]  # and continues improving
    with _pytest.raises(ValueError, match="warm start"):
        train_linear_classifier(batch2, n_buckets=256, iters=1, init_weights=w1)


def test_train_linear_classifier_ignores_null_labels(spark):
    """A NULL label must not poison the gradient (NaN survives every
    sum): unlabeled rows are dropped, training still converges on the
    labeled remainder."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.scoring import (
        train_linear_classifier,
    )

    rows = []
    for i in range(60):
        if i % 5 == 0:
            rows.append(Row(doc_id=i, label=None, text="mystery unlabeled row"))
        elif i % 2:
            rows.append(Row(doc_id=i, label=1, text=f"f{i % 3} cleanprose wellwritten"))
        else:
            rows.append(Row(doc_id=i, label=0, text=f"f{i % 3} spamspam clickbait"))
    df = spark.createDataFrame(rows, "doc_id long, label int, text string")
    w, hist = train_linear_classifier(df, n_buckets=256, iters=4, lr=2.0)
    import math

    assert all(math.isfinite(h) for h in hist)
    assert hist[-1] < hist[0]


def test_hybrid_rrf_fuses_arm_ranks_exactly(spark):
    """Round-9 RRF fusion: the fused score must equal
    1/(60+rank_sparse) + 1/(60+rank_dense) computed from the two arms
    run independently, a doc in BOTH arms must outscore the same doc
    in one arm at the same rank, and the output ranks on score desc
    with id tie-break."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.retrieval import (
        hybrid_rrf_topk,
        keyword_topk,
    )
    from api_kakfa_spark_airflow_s3_athena_spark.operators.similarity import (
        brute_force_topk,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="spark spark spark engine"),
            Row(doc_id=1, text="spark customer report"),
            Row(doc_id=2, text="weather news today"),
            Row(doc_id=3, text="slow spark job tuning"),
            Row(doc_id=4, text="customer complaints queue"),
        ]
    )
    emb = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0, 0.0]),
            Row(vec_id=1, embedding=[0.9, 0.1, 0.0]),
            Row(vec_id=2, embedding=[0.0, 1.0, 0.0]),
            Row(vec_id=3, embedding=[0.8, 0.0, 0.2]),
            Row(vec_id=4, embedding=[0.0, 0.0, 1.0]),
        ]
    )
    terms = ["spark", "customer", "slow"]
    out = hybrid_rrf_topk(docs, emb, terms, query_vec_id=0, k=5, n_arm=3).collect()

    rs = {r.doc_id: r.rnk for r in keyword_topk(docs, terms, k=3).collect()}
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    rd = {r.neighbor_id: r.rank for r in brute_force_topk(q, emb, k=3).collect()}

    assert out  # non-empty fusion
    for r in out:
        want = (1.0 / (60 + rs[r.doc_id]) if r.doc_id in rs else 0.0) + (
            1.0 / (60 + rd[r.doc_id]) if r.doc_id in rd else 0.0
        )
        assert r.rrf_score == want
        assert r.in_sparse == (r.doc_id in rs)
        assert r.in_dense == (r.doc_id in rd)
    # ranks follow score desc, id asc
    ordered = sorted(out, key=lambda r: (-r.rrf_score, r.doc_id))
    assert [r.rnk for r in ordered] == list(range(1, len(out) + 1))
    # both-arms doc dominates an equal-rank single-arm doc
    both = [r for r in out if r.in_sparse and r.in_dense]
    single = [r for r in out if r.in_sparse != r.in_dense]
    if both and single:
        assert max(r.rrf_score for r in both) > min(r.rrf_score for r in single)


def test_rrf_fuse_three_arms_and_prior_arm(spark):
    """N-arm fusion (staged round 10): the three-arm fused score must
    equal the sum of 1/(60+rank) over independently-run arms, the
    prior arm ranks by the prior column desc with id tie-break, and
    two-arm rrf_fuse output is row-identical to the registered
    hybrid_rrf_topk (same arithmetic, same ordering contract)."""
    from api_kakfa_spark_airflow_s3_athena_spark.operators.retrieval import (
        hybrid_rrf3_topk,
        hybrid_rrf_topk,
        keyword_topk,
        prior_topk,
        rrf_fuse,
    )
    from api_kakfa_spark_airflow_s3_athena_spark.operators.similarity import (
        brute_force_topk,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="spark spark spark engine", n_chars=24),
            Row(doc_id=1, text="spark customer report", n_chars=21),
            Row(doc_id=2, text="weather news today", n_chars=18),
            Row(doc_id=3, text="slow spark job tuning", n_chars=21),
            Row(doc_id=4, text="customer complaints queue", n_chars=25),
        ]
    )
    emb = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0, 0.0]),
            Row(vec_id=1, embedding=[0.9, 0.1, 0.0]),
            Row(vec_id=2, embedding=[0.0, 1.0, 0.0]),
            Row(vec_id=3, embedding=[0.8, 0.0, 0.2]),
            Row(vec_id=4, embedding=[0.0, 0.0, 1.0]),
        ]
    )
    terms = ["spark", "customer", "slow"]

    # prior arm: n_chars desc, id asc -> 4(25), 0(24), 1(21), 3(21), 2(18)
    pri = prior_topk(docs, F.col("n_chars"), 3)
    assert {(r.id, r.rnk) for r in pri.collect()} == {(4, 1), (0, 2), (1, 3)}

    out = hybrid_rrf3_topk(docs, emb, terms, query_vec_id=0, k=5, n_arm=3).collect()
    rs = {r.doc_id: r.rnk for r in keyword_topk(docs, terms, k=3).collect()}
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    rd = {r.neighbor_id: r.rank for r in brute_force_topk(q, emb, k=3).collect()}
    rp = {r.id: r.rnk for r in pri.collect()}
    assert out
    for r in out:
        want = (
            (1.0 / (60 + rs[r.doc_id]) if r.doc_id in rs else 0.0)
            + (1.0 / (60 + rd[r.doc_id]) if r.doc_id in rd else 0.0)
            + (1.0 / (60 + rp[r.doc_id]) if r.doc_id in rp else 0.0)
        )
        assert r.rrf_score == want
        assert (r.in_sparse, r.in_dense, r.in_prior) == (
            r.doc_id in rs, r.doc_id in rd, r.doc_id in rp
        )

    # two-arm rrf_fuse == the registered hybrid_rrf_topk, row for row
    sparse = keyword_topk(docs, terms, k=3).select(
        F.col("doc_id").alias("id"), F.col("rnk")
    )
    dense = brute_force_topk(q, emb, k=3).select(
        F.col("neighbor_id").alias("id"), F.col("rank").alias("rnk")
    )
    via_fuse = rrf_fuse({"sparse": sparse, "dense": dense}, k=5).collect()
    direct = hybrid_rrf_topk(docs, emb, terms, query_vec_id=0, k=5, n_arm=3).collect()
    assert sorted(map(tuple, via_fuse)) == sorted(map(tuple, direct))
