"""Property-based tests (hypothesis) for the transform/text/dedup
kernels: invariants that must hold for ANY input, driven through Spark
on small generated batches."""

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.functions.text import fingerprint, tokens
from api_kakfa_spark_airflow_s3_athena_spark.functions.transforms import (
    parse_kafka_value,
    pseudonymize_zip_py,
)
from api_kakfa_spark_airflow_s3_athena_spark.operators.dedup import jaccard, simhash

SLOW = settings(
    max_examples=8,  # each example is a Spark job; keep the budget sane
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

words = st.lists(st.text(alphabet="abcdefg", min_size=1, max_size=6), min_size=0, max_size=30)


@SLOW
@given(ws=words)
def test_fingerprint_invariant_under_permutation_and_dup(spark, ws):
    doc = " ".join(ws)
    doc_rev = " ".join(list(reversed(ws)) + ws[:1])  # permuted + a duplicated token
    df = spark.createDataFrame([Row(t=doc), Row(t=doc_rev)])
    fps = [r.fp for r in df.select(fingerprint(F.col("t")).alias("fp")).collect()]
    assert fps[0] == fps[1]


@SLOW
@given(a=words, b=words)
def test_jaccard_bounds_and_identity(spark, a, b):
    df = spark.createDataFrame(
        [(a, b, a)], schema="a array<string>, b array<string>, c array<string>"
    )
    row = df.select(
        jaccard(F.col("a"), F.col("b")).alias("ab"),
        jaccard(F.col("a"), F.col("c")).alias("aa"),
    ).collect()[0]
    assert 0.0 <= row.ab <= 1.0
    if a:
        assert row.aa == 1.0  # self-similarity
    else:
        assert row.aa == 0.0  # defined-zero for empty sets


@SLOW
@given(ws=st.lists(st.text(alphabet="abc", min_size=1, max_size=4), min_size=4, max_size=20))
def test_simhash_deterministic_and_stable(spark, ws):
    doc = " ".join(ws)
    df = spark.createDataFrame([Row(t=doc), Row(t=doc)])
    sigs = [r.s for r in df.select(simhash(F.col("t")).alias("s")).collect()]
    assert sigs[0] == sigs[1]


@SLOW
@given(
    name=st.one_of(st.none(), st.text(max_size=20)),
    lat=st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False, width=32)),
)
def test_kafka_json_roundtrip_any_payload(spark, name, lat):
    payload = {"name": name, "latitude": lat}
    df = spark.createDataFrame([Row(value=json.dumps(payload).encode())])
    row = parse_kafka_value(df).collect()[0]
    assert row.name == name
    if lat is None:
        assert row.latitude is None
    else:
        assert abs(row.latitude - lat) < 1e-6 * max(1.0, abs(lat))
    assert row.email is None  # absent field -> NULL


@given(z=st.text(max_size=30))
@settings(max_examples=50, deadline=None)
def test_zip_pseudonym_is_md5_int(z):
    import hashlib

    assert pseudonymize_zip_py(z) == str(int(hashlib.md5(str(z).encode()).hexdigest(), 16))
