"""Transform-library parity tests: each DataFrame transform is checked
against an independently-computed expected value (hashlib / plain
Python), mirroring the reference producer's row logic
(dags/producer/kafka_streaming_service.py:134-174)."""

import hashlib
import json

from pyspark.sql import Row
from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.functions.transforms import (
    flatten_user_payload,
    parse_kafka_value,
    pseudonymize_zip_py,
    synthetic_users,
    to_kafka_value,
)
from api_kakfa_spark_airflow_s3_athena_spark.schemas import NAMES_STREAM, USER_API_PAYLOAD


def _payload(postcode="NW1 6XE", lat="51.5237", lon="-0.1585"):
    return {
        "gender": "female",
        "name": {"title": "Dr", "first": "Ava", "last": "Patel"},
        "location": {
            "street": {"number": 221, "name": "Baker Street"},
            "city": "London",
            "country": "United Kingdom",
            "postcode": postcode,
            "coordinates": {"latitude": lat, "longitude": lon},
        },
        "email": "ava.patel42@example.com",
        "login": {"uuid": "offline-x"},
    }


def test_flatten_matches_reference_row_logic(spark):
    df = spark.createDataFrame([_payload()], schema=USER_API_PAYLOAD)
    row = flatten_user_payload(df).collect()[0]
    assert row.name == "Dr. Ava Patel"
    assert row.address == "221, Baker Street"
    assert row.city == "London"
    assert row.nation == "United Kingdom"
    # 128-bit md5 pseudonym, decimal-rendered — bit-exact vs hashlib
    assert row.zip == str(int(hashlib.md5(b"NW1 6XE").hexdigest(), 16))
    assert row.latitude == 51.5237
    assert row.longitude == -0.1585
    assert row.email == "ava.patel42@example.com"


def test_flatten_bad_coordinates_null_not_error(spark):
    df = spark.createDataFrame(
        [_payload(lat="not-a-number", lon="")], schema=USER_API_PAYLOAD
    )
    row = flatten_user_payload(df).collect()[0]
    assert row.latitude is None
    assert row.longitude is None


def test_pseudonymize_zip_py_twin():
    assert pseudonymize_zip_py("10117") == str(int(hashlib.md5(b"10117").hexdigest(), 16))


def test_parse_kafka_value_happy_and_malformed(spark):
    good = json.dumps(
        {
            "name": "Mr. Noah Liu",
            "gender": "male",
            "address": "1, George Street",
            "city": "Sydney",
            "nation": "Australia",
            "zip": "42",
            "latitude": -33.8675,
            "longitude": 151.207,
            "email": "noah.liu10@example.com",
        }
    )
    missing_fields = json.dumps({"name": "Ms. Emma Garcia"})
    malformed = "{not json"
    df = spark.createDataFrame(
        [Row(value=v.encode("utf-8")) for v in (good, missing_fields, malformed)]
    )
    rows = parse_kafka_value(df).collect()
    assert len(rows) == 3  # permissive: malformed -> all-NULL row, not dropped
    by_name = {r.name: r for r in rows}
    assert by_name["Mr. Noah Liu"].latitude == -33.8675
    assert by_name["Ms. Emma Garcia"].email is None  # missing field -> NULL
    assert None in by_name  # malformed line

    parsed = parse_kafka_value(df)
    assert [f.name for f in parsed.schema.fields] == [f.name for f in NAMES_STREAM.fields]


def test_kafka_roundtrip_preserves_rows(spark):
    users = synthetic_users(spark, 50, seed=7)
    back = parse_kafka_value(to_kafka_value(users))
    assert back.count() == 50
    assert sorted(back.columns) == sorted(users.columns)
    # every row survives serialization bit-identically (multiset compare)
    a = sorted(map(str, users.collect()))
    b = sorted(map(str, back.select(*users.columns).collect()))
    assert a == b


def test_synthetic_users_deterministic(spark):
    a = synthetic_users(spark, 20, seed=42).collect()
    b = synthetic_users(spark, 20, seed=42).collect()
    assert a == b
    c = synthetic_users(spark, 20, seed=43).collect()
    assert a != c
    for row in a:
        assert row.gender in ("male", "female")
        assert "@example.com" in row.email
        assert row.zip.isdigit()
