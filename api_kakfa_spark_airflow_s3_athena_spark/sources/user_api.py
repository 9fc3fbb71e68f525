"""`user_api` — a Spark 4 Python DataSource for the reference's user
feed (S4 parity, Spark-native).

The reference ingests users with a driver-side HTTP loop + synthetic
fallback (``dags/producer/kafka_streaming_service.py:113-130,37-59``)
OUTSIDE Spark. Spark 4's Python DataSource API lets the engine own
that source: ``spark.read.format("user_api")`` (batch) and
``spark.readStream.format("user_api")`` (unbounded, offset-tracked,
replayable) both yield the nested API-payload shape that
``flatten_user_payload`` consumes.

Offline-deterministic by default: records come from the same value
pools as the reference's fallback generator, keyed by row index (and
seed), so any offset range replays identically — which is what makes
the streaming source checkpoint-safe. A real HTTP fetch would slot
into :meth:`_record` behind the ``endpoint`` option (kept offline here;
no network in this environment).

Options: ``rows`` (batch row count, default 100), ``seed``,
``partitions`` (batch parallelism), ``rowsPerBatch`` (streaming
micro-batch size).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql import types as T

__all__ = ["UserApiDataSource", "register"]

_LAST = ("Anderson", "Patel", "Kowalski", "Garcia", "Okafor", "Liu")
_TITLED = {
    "male": (("Mr", "Noah"), ("Mr", "Liam"), ("Dr", "Elijah"), ("Mr", "Mateo")),
    "female": (("Ms", "Olivia"), ("Ms", "Emma"), ("Dr", "Ava"), ("Ms", "Sophia")),
}
_PLACES = (
    ("London", "United Kingdom", "Baker Street", "NW1 6XE", "51.5237", "-0.1585"),
    ("Berlin", "Germany", "Unter den Linden", "10117", "52.5163", "13.3777"),
    ("Madrid", "Spain", "Gran Vía", "28013", "40.4203", "-3.7058"),
    ("Toronto", "Canada", "Queen Street West", "M5V", "43.6470", "-79.3948"),
    ("Sydney", "Australia", "George Street", "2000", "-33.8675", "151.2070"),
)

# Nested schema matching schemas.USER_API_PAYLOAD, built
# programmatically (StructType.fromDDL would need an active session at
# import time).
_SCHEMA = T.StructType(
    [
        T.StructField("gender", T.StringType()),
        T.StructField(
            "name",
            T.StructType(
                [
                    T.StructField("title", T.StringType()),
                    T.StructField("first", T.StringType()),
                    T.StructField("last", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "location",
            T.StructType(
                [
                    T.StructField(
                        "street",
                        T.StructType(
                            [
                                T.StructField("number", T.LongType()),
                                T.StructField("name", T.StringType()),
                            ]
                        ),
                    ),
                    T.StructField("city", T.StringType()),
                    T.StructField("country", T.StringType()),
                    T.StructField("postcode", T.StringType()),
                    T.StructField(
                        "coordinates",
                        T.StructType(
                            [
                                T.StructField("latitude", T.StringType()),
                                T.StructField("longitude", T.StringType()),
                            ]
                        ),
                    ),
                ]
            ),
        ),
        T.StructField("email", T.StringType()),
        T.StructField("login", T.StructType([T.StructField("uuid", T.StringType())])),
    ]
)


def _pick(pool, idx: int, salt: int, seed: int):
    h = int.from_bytes(
        hashlib.md5(f"{seed}:{salt}:{idx}".encode()).digest()[:8], "big"
    )
    return pool[h % len(pool)]


def _record(idx: int, seed: int) -> tuple:
    gender = _pick(("male", "female"), idx, 1, seed)
    title, first = _pick(_TITLED[gender], idx, 2, seed)
    last = _pick(_LAST, idx, 3, seed)
    city, country, street, postcode, lat, lon = _pick(_PLACES, idx, 4, seed)
    number = 1 + int.from_bytes(hashlib.md5(f"{seed}:5:{idx}".encode()).digest()[:4], "big") % 999
    suffix = 10 + int.from_bytes(hashlib.md5(f"{seed}:6:{idx}".encode()).digest()[:4], "big") % 90
    return (
        gender,
        (title, first, last),
        ((number, street), city, country, postcode, (lat, lon)),
        f"{first.lower()}.{last.lower()}{suffix}@example.com",
        (f"offline-{seed}-{idx}",),
    )


class _Range(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 100))
        self.seed = int(options.get("seed", 42))
        self.n_partitions = int(options.get("partitions", 4))

    def partitions(self):
        if self.rows <= 0:
            # Spark requires >= 1 partition; serve an empty range
            return [_Range(0, 0, self.seed)]
        step = max(1, self.rows // self.n_partitions)
        return [
            _Range(lo, min(lo + step, self.rows), self.seed)
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _Range) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _record(i, partition.seed)


class _StreamReader(SimpleDataSourceStreamReader):
    """Offset = next row index; any [start, end) range replays
    identically, so restarts are exactly-once."""

    def __init__(self, options):
        self.seed = int(options.get("seed", 42))
        self.per_batch = int(options.get("rowsPerBatch", 10))

    def initialOffset(self):
        return {"index": 0}

    def read(self, start):
        lo = start["index"]
        hi = lo + self.per_batch
        return iter([_record(i, self.seed) for i in range(lo, hi)]), {"index": hi}

    def readBetweenOffsets(self, start, end):
        return iter([_record(i, self.seed) for i in range(start["index"], end["index"])])


class UserApiDataSource(DataSource):
    @classmethod
    def name(cls):
        return "user_api"

    def schema(self):
        return _SCHEMA

    def reader(self, schema):
        return _BatchReader(self.options)

    def simpleStreamReader(self, schema):
        return _StreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(UserApiDataSource)
