"""Linear text-classifier inference — the fastText-style quality /
language / toxicity filter every LLM training pipeline runs over the
full corpus before sampling.

The reference has no model-scoring surface (its Python is a thin
Kafka->S3 pipeline, ``spark/app/spark_processing.py``); this is part
of the driver-mandated LLM-pipeline extension.

Spark-first design:

- Features are hashed unigrams + bigrams (the hashing trick,
  Weinberger et al. 2009): no vocabulary file ships to executors and
  the feature space is a fixed ``n_buckets`` regardless of corpus
  size — the property that makes the approach viable at 100 TB.
- The weight vector is a tiny DataFrame ``broadcast()``-joined onto
  the exploded feature stream: the corpus never shuffles, the join is
  map-side, and swapping in a genuinely trained weight table is a
  one-line change.
- The dot product stays in exact BIGINT arithmetic until ONE final
  IEEE division, so the score is bit-reproducible across engines
  (NOTES.md float-parity recipe) and the whole path is JVM
  whole-stage codegen — no UDFs.

The feature hash is md5-based (first 32 bits) rather than xxhash64 so
external engines (the DuckDB oracle, a feature-store consumer) can
reproduce bucket ids exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX

# Integer weights live in [-(WEIGHT_SCALE), +WEIGHT_SCALE]; the final
# score divides by it once. 500001 keeps |score_int| < 2^63 up to
# ~1.8e13 features per document.
WEIGHT_SCALE = 500_001


def _bucket32(col: Column, n_buckets: int) -> Column:
    """First 32 bits of md5 -> [0, n_buckets): engine-portable hash."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % n_buckets


def hashed_feature_buckets(text_col: Column, n_buckets: int) -> Column:
    """array<long> of hashed unigram + bigram bucket ids for one doc."""
    feats = F.concat(TX.tokens(text_col), TX.word_shingles(text_col, 2))
    return F.transform(feats, lambda t: _bucket32(t, n_buckets))


def pseudo_weights(spark: SparkSession, n_buckets: int) -> DataFrame:
    """Deterministic stand-in weight table ``(bucket, w_int)`` with
    integer weights in [-WEIGHT_SCALE, WEIGHT_SCALE]: a trained model
    would load its quantized weights here instead; deriving them from
    md5(bucket) keeps the fixture reproducible in any engine."""
    w = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("w"), F.col("bucket").cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % (2 * WEIGHT_SCALE + 1)
        - WEIGHT_SCALE
    )
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"), w.alias("w_int")
    )


def linear_text_classifier(
    docs: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """Score every document with a linear model over hashed n-gram
    features: ``score = sum(w[feature]) / (n_feats * WEIGHT_SCALE)``,
    ``keep = score > 0``.

    Plan shape: explode features (narrow), broadcast-join the weight
    table (map-side), one key-wise aggregate on ``id_col`` — a single
    shuffle of (id, partial-sum) rows. Documents with no features
    (empty text) produce no row, matching the SQL twin."""
    feats = docs.select(
        id_col,
        F.explode(hashed_feature_buckets(F.col(text_col), n_buckets)).alias(
            "bucket"
        ),
    )
    scored = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum("w_int").alias("score_int"),
        )
    )
    return scored.select(
        id_col,
        "n_feats",
        # exact ints -> ONE division: bit-identical across engines
        (
            F.col("score_int").cast("double")
            / (F.col("n_feats") * WEIGHT_SCALE).cast("double")
        ).alias("score"),
        (F.col("score_int") > 0).alias("keep"),
    )


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio ``compressed/raw bytes`` —
    the classic cheap repetition detector (used alongside the Gopher
    repetition signals in public LLM-pipeline recipes): templated or
    looping text compresses far below natural prose, while
    high-entropy noise barely compresses at all. Returns
    ``(id, n_bytes, ratio)``; empty/NULL text yields ratio NULL.

    Arrow-batched ``mapInPandas`` (zlib has no SQL expression): the
    per-row Python loop only dispatches into zlib's C deflate, and the
    stage is row-local — a map-side scan pass with no shuffle, so it
    composes with quality gates at any corpus size. ``level`` pins the
    deflate setting; ratios are deterministic for a given zlib build
    (so oracle contracts assert STRUCTURAL bounds, not exact bytes).
    The output ``id`` field inherits ``id_col``'s actual type from
    ``df.schema`` (string/int/... ids all work — round-8 ADVICE fix;
    a hardcoded ``id long`` schema broke non-bigint callers).
    """
    id_type = df.schema[id_col].dataType.simpleString()

    def gen(batches):
        import pandas as pd
        import zlib

        for pdf in batches:
            raw = pdf[text_col].fillna("").map(lambda t: t.encode("utf-8"))
            n = raw.map(len)
            ratio = [
                (len(zlib.compress(b, level)) / nb) if nb else None
                for b, nb in zip(raw, n)
            ]
            yield pd.DataFrame(
                {"id": pdf["id"], "n_bytes": n, "ratio": ratio}
            )

    return df.select(F.col(id_col).alias("id"), F.col(text_col)).mapInPandas(
        gen, schema=f"id {id_type}, n_bytes long, ratio double"
    )


def train_linear_classifier(
    df: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    iters: int = 8,
    lr: float = 2.0,
    l2: float = 0.0,
    init_weights=None,
):
    """Distributed full-batch logistic-regression TRAINING over hashed
    n-gram features — the half of the fastText-style quality filter
    the engine lacked (inference: :func:`linear_text_classifier`).
    Features are the SAME md5-bucket unigrams+bigrams the inference
    path scores with, hashed JVM-side once, so a model trained here
    drops straight into the production scorer via
    :func:`quantize_weights`.

    Spark shape per iteration (the :func:`~..similarity.kmeans_refine`
    discipline): the weight vector lives on the DRIVER (n_buckets
    doubles — tiny) and ships to executors inside the Arrow closure;
    one ``mapInPandas`` pass scores each row (numpy gather + sigmoid)
    and accumulates PER-BATCH gradient partials (``np.add.at`` over
    the batch's buckets), emitting k×(partial, count) skinny rows;
    one groupBy(bucket) aggregate + a bounded collect updates the
    weights. So each iteration costs exactly one corpus scan + one
    n_buckets-row shuffle — no corpus-sized join, no feature matrix
    materialization, and the driver only ever receives the k-vector.
    The featurized frame is cached once (arrays of bucket ids; at
    100 TB this is the persisted feature table an iterative trainer
    reads anyway) and released before returning.

    Full-batch gradient descent is deterministic up to float-sum
    ordering across partitions (same caveat as every distributed
    mean); contracts built on it must assert MARGIN properties
    (accuracy on separable plants, loss decrease), not exact weights.

    ``init_weights`` warm-starts from a previous model (the
    incremental-artifact pattern the dedup/ANN indexes use, applied
    to training): a nightly ingest batch CONTINUES the prior run
    instead of re-reading the 100 TB history — fixture-pinned in
    tests to keep improving a partially-trained model.

    Returns ``(weights ndarray[n_buckets], loss_history list)`` where
    loss is mean log-loss per iteration (computed on the PRE-update
    weights, so ``loss_history[0]`` is the baseline of the incoming
    weights — zeros for a cold start). ``loss_history`` is the
    UNPENALIZED data loss: with ``l2 > 0`` the decay is applied to
    the weights but ``0.5*l2*||w||²`` is NOT added to the recorded
    loss, so only the regularized objective — not this history — is
    guaranteed to decrease; the "loss decreases" contract the
    registry queries pin holds at the default ``l2=0`` (round-8
    ADVICE finding).
    """
    import numpy as np
    import pandas as pd

    base = df.select(
        F.col(label_col).cast("double").alias("__y"),
        hashed_feature_buckets(F.col(text_col), n_buckets).alias("__b"),
    ).filter(F.size("__b") > 0)
    # a NULL label would poison the whole gradient (NaN loss / NaN
    # partials survive every sum) — unlabeled rows contribute nothing
    # to supervised training, drop them at the scan
    base = base.filter(F.col("__y").isNotNull())
    base = base.localCheckpoint(eager=True)

    if init_weights is None:
        w = np.zeros(n_buckets, dtype=np.float64)
    else:
        w = np.asarray(init_weights, dtype=np.float64).copy()
        if w.shape != (n_buckets,):
            raise ValueError(
                f"init_weights shape {w.shape} != ({n_buckets},) — warm "
                "start requires the same feature space"
            )
    history = []
    try:
        for _ in range(iters):
            w_cur = w  # bind per iteration for the closure

            def grad_partials(batches):
                for pdf in batches:
                    if not len(pdf):
                        continue
                    g = np.zeros(n_buckets, dtype=np.float64)
                    # Whole-batch vectorization (no per-row Python):
                    # flatten every doc's bucket list, reduceat for
                    # per-doc sums, one sigmoid/log over the batch,
                    # one scatter-add for the gradient.
                    blists = pdf["__b"].tolist()
                    lens = np.fromiter(
                        (len(b) for b in blists), dtype=np.int64, count=len(blists)
                    )
                    flat = np.concatenate(
                        [np.asarray(b, dtype=np.int64) for b in blists]
                    )
                    starts = np.zeros(len(lens), dtype=np.int64)
                    np.cumsum(lens[:-1], out=starts[1:])
                    y = pdf["__y"].to_numpy(dtype=np.float64)
                    # fastText-style feature AVERAGING: the score is
                    # mean(w[b]), so its scale is independent of
                    # document length (a 200-token doc and a 10-token
                    # doc see the same lr dynamics; raw sums diverged
                    # on long real docs). Sign of the mean == sign of
                    # the sum, so decisions stay consistent with the
                    # production scorer (which sums and thresholds
                    # at 0).
                    sums = np.add.reduceat(w_cur[flat], starts)
                    p = 1.0 / (1.0 + np.exp(-(sums / lens)))
                    eps = 1e-12
                    loss = float(
                        -(
                            y * np.log(p + eps)
                            + (1.0 - y) * np.log(1.0 - p + eps)
                        ).sum()
                    )
                    n = len(y)
                    np.add.at(g, flat, np.repeat((p - y) / lens, lens))
                    nz = np.nonzero(g)[0]
                    out = pd.DataFrame(
                        {"bucket": nz, "g": g[nz], "n": 0.0, "loss": 0.0}
                    )
                    meta = pd.DataFrame(
                        {"bucket": [-1], "g": [0.0], "n": [float(n)],
                         "loss": [loss]}
                    )
                    yield pd.concat([out, meta], ignore_index=True)

            upd = (
                base.mapInPandas(
                    grad_partials,
                    schema="bucket long, g double, n double, loss double",
                )
                .groupBy("bucket")
                .agg(
                    F.sum("g").alias("g"),
                    F.sum("n").alias("n"),
                    F.sum("loss").alias("loss"),
                )
                .collect()
            )
            n_total = sum(r.n for r in upd if r.bucket == -1)
            loss_total = sum(r.loss for r in upd if r.bucket == -1)
            if not n_total:
                break
            history.append(loss_total / n_total)
            new_w = w * (1.0 - lr * l2)
            for r in upd:
                if r.bucket >= 0:
                    new_w[r.bucket] -= lr * r.g / n_total
            w = new_w
    finally:
        base.unpersist()
    return w, history


def quantize_weights(spark: SparkSession, weights) -> DataFrame:
    """Trained float weights -> the integer ``(bucket, w_int)`` table
    :func:`linear_text_classifier` scores with: symmetric scaling to
    [-WEIGHT_SCALE, WEIGHT_SCALE] (max-|w| calibration, the int8-style
    recipe from embedding_quantization), half-up rounding via floor of
    an identical double expression so re-quantization is reproducible
    in any engine. Sign is preserved exactly for |w| above one
    quantization step — the margin contract a trained filter needs."""
    import numpy as np

    w = np.asarray(weights, dtype=np.float64)
    scale = float(np.abs(w).max()) or 1.0
    w_int = np.floor(w * WEIGHT_SCALE / scale + 0.5).astype(np.int64)
    rows = [(int(b), int(v)) for b, v in enumerate(w_int)]
    return spark.createDataFrame(rows, "bucket long, w_int long")
