"""Single source of truth for every schema the engine touches.

Parity schemas (reference file:line):
- ``NAMES_STREAM``: the 9-column typed record the reference's streaming
  job declares (``spark/app/spark_processing.py:133-143``) and Athena
  mirrors (``docs/athena-integrity-check.md:26-39``). Only strings and
  doubles; ``zip`` deliberately stays a string.
- ``USER_API_PAYLOAD``: the nested HTTP payload the producer consumes
  and flattens in Python (``dags/producer/kafka_streaming_service.py:
  37-59,113-130``). Coordinates are *strings* upstream — the safe-cast
  to double happens in the flatten step.
- ``KAFKA_ENVELOPE``: what a Spark Kafka source yields before any
  transform (consumed at ``spark_processing.py:145``).

Testdata schemas: the driver's TPC-H-ish star schema plus events /
documents / embeddings extension tables (see /root/repo/FIXTURES.md).
Parquet is self-describing so loaders don't need these, but streaming
file sources and JSON readers do.
"""

from __future__ import annotations

from pyspark.sql import types as T

__all__ = [
    "NAMES_STREAM",
    "USER_API_PAYLOAD",
    "KAFKA_ENVELOPE",
    "EVENTS",
    "DOCUMENTS",
    "EMBEDDINGS",
    "TESTDATA_TABLES",
]


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


# --- reference parity -------------------------------------------------------

NAMES_STREAM = T.StructType(
    [
        _f("name", T.StringType()),
        _f("gender", T.StringType()),
        _f("address", T.StringType()),
        _f("city", T.StringType()),
        _f("nation", T.StringType()),
        _f("zip", T.StringType()),  # 128-bit md5 pseudonym rendered as decimal string
        _f("latitude", T.DoubleType()),
        _f("longitude", T.DoubleType()),
        _f("email", T.StringType()),
    ]
)

USER_API_PAYLOAD = T.StructType(
    [
        _f("gender", T.StringType()),
        _f(
            "name",
            T.StructType(
                [_f("title", T.StringType()), _f("first", T.StringType()), _f("last", T.StringType())]
            ),
        ),
        _f(
            "location",
            T.StructType(
                [
                    _f(
                        "street",
                        T.StructType([_f("number", T.LongType()), _f("name", T.StringType())]),
                    ),
                    _f("city", T.StringType()),
                    _f("country", T.StringType()),
                    _f("postcode", T.StringType()),
                    _f(
                        "coordinates",
                        # strings on the wire; cast-to-double may fail -> NULL
                        T.StructType(
                            [_f("latitude", T.StringType()), _f("longitude", T.StringType())]
                        ),
                    ),
                ]
            ),
        ),
        _f("email", T.StringType()),
        _f("login", T.StructType([_f("uuid", T.StringType())])),
    ]
)

# Columns a Spark Kafka source produces (subset we rely on).
KAFKA_ENVELOPE = T.StructType(
    [
        _f("key", T.BinaryType()),
        _f("value", T.BinaryType()),
        _f("topic", T.StringType()),
        _f("partition", T.IntegerType()),
        _f("offset", T.LongType()),
        _f("timestamp", T.TimestampType()),
        _f("timestampType", T.IntegerType()),
    ]
)

# --- driver testdata --------------------------------------------------------

EVENTS = T.StructType(
    [
        _f("event_id", T.LongType()),
        _f("ts", T.TimestampType()),
        _f("user_id", T.LongType()),
        _f("event_type", T.StringType()),
        _f("value", T.DoubleType()),
        _f("props", T.StringType()),  # JSON string, e.g. {"k": 42}
    ]
)

DOCUMENTS = T.StructType(
    [
        _f("doc_id", T.LongType()),
        _f("text", T.StringType()),
        _f("lang", T.StringType()),
        _f("source", T.StringType()),
        _f("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        _f("vec_id", T.LongType()),
        _f("embedding", T.ArrayType(T.FloatType())),
        _f("label", T.IntegerType()),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
