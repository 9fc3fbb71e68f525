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
