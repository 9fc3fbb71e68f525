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
the streaming source checkpoint-safe.

Retry contract (reference ``kafka_streaming_service.py:113-130``):
when an ``endpoint`` is configured, each record is fetched with up to
``retries`` attempts (default 3) of ``timeoutS`` seconds each
(default 10); if every attempt fails the synthetic fallback record is
emitted instead — ingestion never stalls on a flaky upstream, exactly
like the reference's fallback generator. The fetch function is
injectable via the ``fetcher`` option as an importable
``"module:function"`` spec (resolved executor-side, so it survives
serialization); it defaults to a stdlib urllib GET returning the
JSON payload dict.

Options: ``rows`` (batch row count, default 100), ``seed``,
``partitions`` (batch parallelism), ``rowsPerBatch`` (streaming
micro-batch size), ``endpoint`` (HTTP URL; unset = pure offline
generator), ``retries``, ``timeoutS``, ``fetcher``
(``module:function`` returning the nested payload dict).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql import types as T

__all__ = ["UserApiDataSource", "register", "fetch_record_with_retry"]

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


def _http_fetch(endpoint: str, timeout_s: float) -> dict:
    """Default fetcher: stdlib GET, JSON payload dict (the reference's
    ``requests.get(url, timeout=...)`` shape with the first result
    unwrapped). Used only when an ``endpoint`` option is set."""
    import json
    import urllib.request

    with urllib.request.urlopen(endpoint, timeout=timeout_s) as resp:
        payload = json.loads(resp.read().decode("utf-8"))
    results = payload.get("results") if isinstance(payload, dict) else None
    return results[0] if results else payload


def _payload_to_row(d: dict) -> tuple:
    """Nested payload dict -> row tuple in ``_SCHEMA`` order. Missing
    fields become None (P7 optional-field defaulting)."""
    name = d.get("name") or {}
    loc = d.get("location") or {}
    street = loc.get("street") or {}
    coords = loc.get("coordinates") or {}
    login = d.get("login") or {}
    number = street.get("number")
    return (
        d.get("gender"),
        (name.get("title"), name.get("first"), name.get("last")),
        (
            (int(number) if number is not None else None, street.get("name")),
            loc.get("city"),
            loc.get("country"),
            str(loc.get("postcode")) if loc.get("postcode") is not None else None,
            (coords.get("latitude"), coords.get("longitude")),
        ),
        d.get("email"),
        (login.get("uuid"),),
    )


def _resolve_fetcher(spec: Optional[str]) -> Callable[[str, float], dict]:
    """Resolve a ``"module:function"`` fetcher spec (executor-side
    import — works across serialization boundaries, unlike a driver
    global)."""
    if not spec:
        return _http_fetch
    mod, _, name = spec.partition(":")
    import importlib

    return getattr(importlib.import_module(mod), name)


def fetch_record_with_retry(
    idx: int,
    seed: int,
    endpoint: Optional[str],
    fetcher: Callable[[str, float], dict],
    retries: int = 3,
    timeout_s: float = 10.0,
) -> tuple:
    """One record via the reference's retry contract: up to ``retries``
    fetch attempts of ``timeout_s`` each, then the deterministic
    synthetic fallback (``kafka_streaming_service.py:113-130``)."""
    if endpoint:
        for _ in range(max(1, retries)):
            try:
                return _payload_to_row(fetcher(endpoint, timeout_s))
            except Exception:
                continue
    return _record(idx, seed)


def demo_static_fetch(endpoint: str, timeout_s: float) -> dict:
    """Deterministic stand-in fetcher (tests/demos; importable on
    executors via ``fetcher="...user_api:demo_static_fetch"``)."""
    return {
        "gender": "female",
        "name": {"title": "Dr", "first": "Ada", "last": "Lovelace"},
        "location": {
            "street": {"number": 12, "name": "Analytical Way"},
            "city": "London",
            "country": "United Kingdom",
            "postcode": "NW1 6XE",
            "coordinates": {"latitude": "51.5237", "longitude": "-0.1585"},
        },
        "email": "ada.lovelace@example.com",
        "login": {"uuid": "demo-uuid-1"},
    }


def demo_failing_fetch(endpoint: str, timeout_s: float) -> dict:
    """Always-failing fetcher: exercises the retry + fallback path."""
    raise ConnectionError("demo: upstream unavailable")


class _Range(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class _FetchConfig:
    """Shared endpoint/retry option parsing for both readers."""

    def _init_fetch(self, options):
        # NOTE: Spark lowercases DataSource option keys before they
        # reach Python — always .get() the lowercase form.
        self.endpoint = options.get("endpoint")
        self.retries = int(options.get("retries", 3))
        self.timeout_s = float(options.get("timeouts", 10.0))  # "timeoutS"
        self.fetcher_spec = options.get("fetcher")

    def _records(self, lo: int, hi: int, seed: int) -> Iterator[tuple]:
        if self.endpoint:
            fetcher = _resolve_fetcher(self.fetcher_spec)  # once per partition
            for i in range(lo, hi):
                yield fetch_record_with_retry(
                    i, seed, self.endpoint, fetcher, self.retries, self.timeout_s
                )
        else:
            for i in range(lo, hi):
                yield _record(i, seed)


class _BatchReader(DataSourceReader, _FetchConfig):
    def __init__(self, options):
        self.rows = int(options.get("rows", 100))
        self.seed = int(options.get("seed", 42))
        self.n_partitions = int(options.get("partitions", 4))
        self._init_fetch(options)

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
        return self._records(partition.start, partition.end, partition.seed)


class _StreamReader(SimpleDataSourceStreamReader, _FetchConfig):
    """Offset = next row index; any [start, end) range replays
    identically, so restarts are exactly-once."""

    def __init__(self, options):
        self.seed = int(options.get("seed", 42))
        # option keys arrive lowercased ("rowsPerBatch" -> "rowsperbatch")
        self.per_batch = int(options.get("rowsperbatch", 10))
        self._init_fetch(options)

    def initialOffset(self):
        return {"index": 0}

    def read(self, start):
        lo = start["index"]
        hi = lo + self.per_batch
        # list, not generator: the prefetch cache copies these iterators
        return iter(list(self._records(lo, hi, self.seed))), {"index": hi}

    def readBetweenOffsets(self, start, end):
        return iter(list(self._records(start["index"], end["index"], self.seed)))


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
