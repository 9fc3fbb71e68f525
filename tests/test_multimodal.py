"""Multimodal plumbing tests: the Spark-side contracts (schemas, batch
shapes, determinism) around the stubbed decoders."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.operators.multimodal import (
    MEDIA_META,
    attach_media_meta,
    extract_features,
    sample_frames,
)


def _media(spark, n=6):
    return spark.createDataFrame(
        [Row(doc_id=i, payload=bytes([i] * (10 + i))) for i in range(n)]
    )


def test_attach_media_meta_schema_and_bytes(spark):
    df = attach_media_meta(_media(spark), media_type="image", fmt="jpeg")
    got = df.schema["meta"].dataType
    # same field names and types (nullability differs for literals)
    assert [(f.name, f.dataType) for f in got.fields] == [
        (f.name, f.dataType) for f in MEDIA_META.fields
    ]
    rows = df.select("doc_id", "meta.n_bytes", "meta.media_type").collect()
    for r in rows:
        assert r.n_bytes == 10 + r.doc_id
        assert r.media_type == "image"


def test_extract_features_shape_and_determinism(spark):
    feats1 = extract_features(_media(spark), feature_dim=32).collect()
    feats2 = extract_features(_media(spark), feature_dim=32).collect()
    assert len(feats1) == 6
    for r in feats1:
        assert len(r.feature) == 32
    assert sorted(map(str, feats1)) == sorted(map(str, feats2))  # stub is deterministic


def test_extract_features_drops_payload(spark):
    out = extract_features(_media(spark))
    assert "payload" not in out.columns  # fat column never leaves the stage


def test_sample_frames_fanout(spark):
    frames = sample_frames(_media(spark, 3), max_frames=4)
    rows = frames.collect()
    assert len(rows) == 12  # 3 docs x 4 frames
    assert {r.frame_idx for r in rows} == {0, 1, 2, 3}
    assert all(len(r.frame) == 16 for r in rows)
    # the stub decoder honors the frame offset: frames differ per index
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add(tuple(r.frame))
    assert all(len(v) == 4 for v in by_doc.values()), "identical frames per index"


def test_registered_decoder_receives_frame_offsets(spark):
    from api_kakfa_spark_airflow_s3_athena_spark.operators import multimodal as MM

    def offset_decoder(payload, frame_idx):
        import numpy as np

        # encode the received offset into the output so the test can
        # observe what the executor-side decoder was asked for
        return np.full((4, 4), float(frame_idx), dtype=np.float32)

    MM.register_decoder(offset_decoder)
    try:
        rows = sample_frames(_media(spark, 1), every_n=10, max_frames=3).collect()
        got = sorted({r.frame[0] for r in rows})
        assert got == [0.0, 10.0, 20.0]  # every_n * frame_idx reached the decoder
    finally:
        MM.register_decoder(MM._fake_decode)


def test_resize_media_area_average_exact(spark):
    """4x4 output of the 8x8 stub source: each output pixel is the mean
    of a disjoint 2x2 block — verified against a local decode."""
    import numpy as np
    from pyspark.sql import Row

    from api_kakfa_spark_airflow_s3_athena_spark.operators.multimodal import (
        _fake_decode,
        resize_media,
    )

    df = spark.createDataFrame([Row(doc_id=1, payload=bytearray(b"pix"))])
    got = resize_media(df, out_h=4, out_w=4).collect()[0]
    src = _fake_decode(b"pix", 0)
    expect = src.reshape(4, 2, 4, 2).mean(axis=(1, 3)).ravel()
    assert got.height == 4 and got.width == 4
    assert np.allclose(got.pixels, expect, atol=1e-6)


def test_resize_media_strided_fallback(spark):
    """Non-divisible target (3x5 from 8x8) falls back to strided index
    sampling: output pixels are exact source pixels at grid indices."""
    import numpy as np
    from pyspark.sql import Row

    from api_kakfa_spark_airflow_s3_athena_spark.operators.multimodal import (
        _fake_decode,
        resize_media,
    )

    df = spark.createDataFrame([Row(doc_id=1, payload=bytearray(b"pix"))])
    got = resize_media(df, out_h=3, out_w=5).collect()[0]
    src = _fake_decode(b"pix", 0)
    ri = (np.arange(3) * 8) // 3
    ci = (np.arange(5) * 8) // 5
    expect = src[np.ix_(ri, ci)].ravel()
    assert len(got.pixels) == 15
    assert np.allclose(got.pixels, expect, atol=1e-6)
