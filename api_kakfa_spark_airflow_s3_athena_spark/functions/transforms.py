"""Reference-parity record transforms, DataFrame-native.

The reference splits its record logic between the Spark job (P1-P3:
cast/parse/flatten, ``spark/app/spark_processing.py:145-147``) and the
Kafka producer's plain-Python flatten (P4-P9,
``dags/producer/kafka_streaming_service.py:134-174``). Here the entire
surface is Spark column expressions so it runs distributed, vectorized,
and identically in batch and streaming.

Every function documents the reference behavior it reproduces
(file:line into /root/reference).
"""

from __future__ import annotations

import hashlib
from typing import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import NAMES_STREAM

__all__ = [
    "parse_kafka_value",
    "to_kafka_value",
    "full_name",
    "street_address",
    "safe_double",
    "pseudonymize_zip",
    "pseudonymize_zip_py",
    "flatten_user_payload",
    "synthetic_users",
]


# --- P1-P3: Kafka value -> typed columns ------------------------------------

def parse_kafka_value(df: DataFrame, schema: T.StructType = NAMES_STREAM) -> DataFrame:
    """Binary Kafka ``value`` -> typed top-level columns.

    Parity: CAST(value AS STRING) -> from_json(declared schema) ->
    star-expand (``spark_processing.py:145-147``). ``from_json`` is
    permissive: malformed payloads yield an all-NULL row, missing fields
    yield NULL columns — same as the reference.

    Works on batch and streaming DataFrames alike; the projection chain
    collapses into a single whole-stage-codegen'd Project.
    """
    return (
        df.select(F.col("value").cast("string").alias("json_str"))
        .select(F.from_json("json_str", schema).alias("data"))
        .select("data.*")
    )


def to_kafka_value(df: DataFrame) -> DataFrame:
    """All columns -> one JSON-string ``value`` column (P8 parity:
    ``json.dumps(data).encode()``, ``kafka_streaming_service.py:205``)."""
    return df.select(F.to_json(F.struct(*df.columns)).alias("value"))


# --- P4-P7: flatten transforms ----------------------------------------------

def full_name(title: Column, first: Column, last: Column) -> Column:
    """``"{title}. {first} {last}"`` (``kafka_streaming_service.py:150-154``)."""
    return F.format_string("%s. %s %s", title, first, last)


def street_address(number: Column, street: Column) -> Column:
    """``"{number}, {street}"`` (``kafka_streaming_service.py:156``)."""
    return F.format_string("%s, %s", number.cast("string"), street)


def safe_double(c: Column) -> Column:
    """``float(x)`` or None (``kafka_streaming_service.py:134-139``) —
    Spark's try_cast has identical null-on-failure semantics."""
    return c.cast("string").try_cast("double")


@F.pandas_udf(T.StringType())
def pseudonymize_zip(zip_code: pd.Series) -> pd.Series:
    """Deterministic postcode pseudonym: ``str(int(md5(str(z)).hexdigest(), 16))``.

    Parity: ``encrypt_zip`` (``kafka_streaming_service.py:142-146``) —
    a 128-bit integer rendered as a decimal string. Spark's
    ``conv(md5(x), 16, 10)`` saturates at 64 bits, so bit-exact parity
    needs Python; this is an Arrow-vectorized pandas UDF, not a
    row-at-a-time UDF, and it's off the hot path (one short string per
    record).
    """
    return zip_code.map(
        lambda z: None
        if z is None
        else str(int(hashlib.md5(str(z).encode("utf-8")).hexdigest(), 16))
    )


def pseudonymize_zip_py(zip_code: object) -> str:
    """Driver-side single-value twin of :func:`pseudonymize_zip` for tests."""
    return str(int(hashlib.md5(str(zip_code).encode("utf-8")).hexdigest(), 16))


def flatten_user_payload(df: DataFrame) -> DataFrame:
    """Nested API payload -> flat 9-column ``names_stream`` record.

    DataFrame-native equivalent of the producer's ``transform_user_data``
    (``kafka_streaming_service.py:149-174``): nested-field projection,
    string concat, md5 pseudonym, null-safe coordinate cast, optional
    fields passing through as NULL when absent.
    """
    return df.select(
        full_name(F.col("name.title"), F.col("name.first"), F.col("name.last")).alias("name"),
        F.col("gender"),
        street_address(F.col("location.street.number"), F.col("location.street.name")).alias(
            "address"
        ),
        F.col("location.city").alias("city"),
        F.col("location.country").alias("nation"),
        pseudonymize_zip(F.col("location.postcode")).alias("zip"),
        safe_double(F.col("location.coordinates.latitude")).alias("latitude"),
        safe_double(F.col("location.coordinates.longitude")).alias("longitude"),
        F.col("email"),
    )


# --- P9: synthetic record generator -----------------------------------------

_GENDERS = ("male", "female")
_TITLED_FIRST = {
    "male": (("Mr", "Noah"), ("Mr", "Liam"), ("Dr", "Elijah"), ("Mr", "Mateo")),
    "female": (("Ms", "Olivia"), ("Ms", "Emma"), ("Dr", "Ava"), ("Ms", "Sophia")),
}
_LAST = ("Anderson", "Patel", "Kowalski", "Garcia", "Okafor", "Liu")
_PLACES = (
    ("London", "United Kingdom", "Baker Street", "NW1 6XE", 51.5237, -0.1585),
    ("Berlin", "Germany", "Unter den Linden", "10117", 52.5163, 13.3777),
    ("Madrid", "Spain", "Gran Vía", "28013", 40.4203, -3.7058),
    ("Toronto", "Canada", "Queen Street West", "M5V", 43.6470, -79.3948),
    ("Sydney", "Australia", "George Street", "2000", -33.8675, 151.2070),
)


def synthetic_users(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Distributed fake-user generator, ``names_stream``-shaped.

    DataFrame-native rethink of the producer's fallback generator
    (``kafka_streaming_service.py:37-59``): same value pools, but built
    from ``spark.range`` + deterministic hashing so it scales to any n
    with no driver loop and is reproducible given (n, seed).
    """
    df = spark.range(n).withColumnRenamed("id", "row_id")

    def pick(pool_size: int, salt: int) -> Column:
        # Deterministic pseudo-random index into a small literal pool.
        return F.pmod(F.xxhash64(F.col("row_id"), F.lit(seed), F.lit(salt)), F.lit(pool_size))

    gender_idx = pick(2, 1)
    name_idx = pick(4, 2)
    last_idx = pick(len(_LAST), 3)
    place_idx = pick(len(_PLACES), 4)
    street_no = F.pmod(F.xxhash64("row_id", F.lit(seed), F.lit(5)), F.lit(999)) + 1
    email_no = F.pmod(F.xxhash64("row_id", F.lit(seed), F.lit(6)), F.lit(90)) + 10

    def from_pool(values: Sequence, idx: Column) -> Column:
        return F.element_at(F.array(*[F.lit(v) for v in values]), (idx + 1).cast("int"))

    gender = from_pool(_GENDERS, gender_idx)
    title = F.when(gender == "male", from_pool([t for t, _ in _TITLED_FIRST["male"]], name_idx)).otherwise(
        from_pool([t for t, _ in _TITLED_FIRST["female"]], name_idx)
    )
    first = F.when(gender == "male", from_pool([f for _, f in _TITLED_FIRST["male"]], name_idx)).otherwise(
        from_pool([f for _, f in _TITLED_FIRST["female"]], name_idx)
    )
    last = from_pool(_LAST, last_idx)
    city = from_pool([p[0] for p in _PLACES], place_idx)
    country = from_pool([p[1] for p in _PLACES], place_idx)
    street = from_pool([p[2] for p in _PLACES], place_idx)
    postcode = from_pool([p[3] for p in _PLACES], place_idx)
    lat = from_pool([p[4] for p in _PLACES], place_idx)
    lon = from_pool([p[5] for p in _PLACES], place_idx)

    return df.select(
        full_name(title, first, last).alias("name"),
        gender.alias("gender"),
        street_address(street_no, street).alias("address"),
        city.alias("city"),
        country.alias("nation"),
        pseudonymize_zip(postcode).alias("zip"),
        lat.cast("double").alias("latitude"),
        lon.cast("double").alias("longitude"),
        F.format_string(
            "%s.%s%s@example.com", F.lower(first), F.lower(last), email_no.cast("string")
        ).alias("email"),
    )
