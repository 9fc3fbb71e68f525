"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` payload columns with a typed metadata
struct, processed by Arrow-batched ``mapInPandas`` stages. The Spark
side — schemas, batching, partition sizing, UDF signatures — is real
and tested; the actual codec work is stubbed (this container ships no
image/audio libraries) behind :func:`register_decoder` /
``DeterministicFakeDecoder`` so the pipeline runs end-to-end with
reproducible fake features.

Scale notes: media rows are fat (MBs), so the operators (a) never
shuffle payload bytes — feature extraction happens before any wide op
and drops the payload; (b) cap Arrow batch sizes via
``spark.sql.execution.arrow.maxRecordsPerBatch`` rather than per-row
Python; (c) keep metadata in a separate skinny struct column so
catalog-only queries never touch payloads (parquet column pruning).
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_META",
    "attach_media_meta",
    "extract_features",
    "resize_media",
    "sample_frames",
    "DecoderNotAvailable",
    "register_decoder",
]

# Typed metadata for an opaque media payload.
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("format", T.StringType(), True),      # jpeg|wav|mp4|...
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


class DecoderNotAvailable(NotImplementedError):
    """Raised when a real codec is requested but no library is present."""


def _fake_decode(payload: bytes, frame_idx: int = 0) -> np.ndarray:
    """Deterministic stand-in for a real decoder: hash-seeded pseudo
    pixels, distinct per frame index. STUB — replace via
    :func:`register_decoder` when a codec library
    (Pillow/torchaudio/decord) is available on the cluster."""
    import hashlib

    # hashlib, not hash(): bytes-hash randomization (PYTHONHASHSEED)
    # varies across executor processes — stub features must not vary
    # with which executor happens to decode a payload
    h = int.from_bytes(hashlib.sha1(payload).digest()[:4], "big") & 0x7FFFFFFF
    rng = np.random.RandomState((h + frame_idx) % (2**31))
    return rng.rand(8, 8).astype(np.float32)


_DECODER: Callable[[bytes, int], np.ndarray] = _fake_decode


def register_decoder(fn: Callable[[bytes, int], np.ndarray]) -> None:
    """Install a real decode function.

    Contract: ``fn(payload_bytes, frame_idx) -> ndarray``. For still
    images/audio ``frame_idx`` is always 0; for video it is the frame
    offset to seek to (``every_n * i`` from :func:`sample_frames`) —
    a real video decoder must honor it to return distinct frames.
    """
    global _DECODER
    _DECODER = fn


def attach_media_meta(
    df: DataFrame, payload_col: str = "payload", media_type: str = "image", fmt: str = "raw"
) -> DataFrame:
    """Add the typed metadata struct. Cheap JVM-side exprs only; width/
    height/duration stay NULL until a decode stage fills them."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.octet_length(F.col(payload_col)).cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    feature_dim: int = 64,
) -> DataFrame:
    """Decode + featurize each payload -> ``array<float>`` embedding.

    ``mapInPandas``: one Arrow batch in, one out; payload column is
    dropped on output so downstream wide ops shuffle only skinny
    feature rows. With the stub decoder the features are deterministic
    functions of the payload bytes.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("feature", T.ArrayType(T.FloatType())),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                arr = _DECODER(bytes(payload), 0)
                flat = arr.ravel()
                vec = np.resize(flat, feature_dim).astype(np.float32)
                feats.append(vec.tolist())
            yield pd.DataFrame({id_col: pdf[id_col].values, "feature": feats})

    return df.select(id_col, payload_col).mapInPandas(gen, out_schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n: int = 10,
    max_frames: int = 4,
) -> DataFrame:
    """Video frame sampling plumbing: payload -> (id, frame_idx, frame).

    Every decoder — stub or real — receives the frame offset
    ``every_n * frame_idx``, so a real video decoder seeks to distinct
    frames. The Spark contract (explode-shaped fan-out inside
    mapInPandas, payload dropped after) must survive a decoder swap.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.ArrayType(T.FloatType())),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                for fi in range(max_frames):
                    arr = _DECODER(bytes(payload), fi * every_n)
                    ids.append(rid)
                    idxs.append(fi)
                    frames.append(arr.ravel()[:16].astype(np.float32).tolist())
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, payload_col).mapInPandas(gen, out_schema)


def resize_media(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    out_h: int = 4,
    out_w: int = 4,
) -> DataFrame:
    """Decode + resize each payload to ``out_h x out_w`` -> flattened
    ``array<float>`` plus the realized dimensions — the
    normalize-before-training stage of an image pipeline.

    The resize itself is area-averaging over an integer grid (numpy
    reshape/mean when the source divides evenly, strided index
    sampling otherwise) — deterministic, codec-free, and exactly what
    a real decoder's output would flow through; swapping the stub for
    Pillow via :func:`register_decoder` changes pixel VALUES only,
    never the Spark contract (schema, batch shape, payload dropped on
    output).
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("pixels", T.ArrayType(T.FloatType())),
        ]
    )

    def _resize(arr: np.ndarray) -> np.ndarray:
        h, w = arr.shape
        if h % out_h == 0 and w % out_w == 0:
            return arr.reshape(out_h, h // out_h, out_w, w // out_w).mean(axis=(1, 3))
        ri = (np.arange(out_h) * h) // out_h
        ci = (np.arange(out_w) * w) // out_w
        return arr[np.ix_(ri, ci)]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pix = []
            for payload in pdf[payload_col]:
                arr = _DECODER(bytes(payload), 0)
                pix.append(_resize(arr).ravel().astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "height": out_h,
                    "width": out_w,
                    "pixels": pix,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(gen, out_schema)
