"""SparkSession construction and object-store (S3A) configuration.

Behavioral parity target: the session/credential/endpoint logic of the
reference streaming job (``spark/app/spark_processing.py:17-114`` in
``/root/reference``), with the same user-facing contracts:

- endpoint normalization accepts ``host[:port]`` or an http(s) URL and
  rejects anything carrying a path/query/fragment or a non-http scheme
  (contract pinned by the reference's
  ``tests/test_s3_endpoint_normalization.py``);
- static-credential sessions pick ``SimpleAWSCredentialsProvider`` vs
  ``TemporaryAWSCredentialsProvider`` depending on whether a session
  token is present, else fall back to the default provider chain;
- path-style access defaults to "on" for non-AWS endpoints.

Unlike the reference, the builder here also bakes in scale-oriented
Spark SQL defaults (AQE, skew-join handling, Arrow, UTC) so every
operator in this package runs under the same optimizer posture locally
and on a real cluster, and it works with no AWS at all (local
filesystem paths) so the whole engine is testable offline.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Mapping, Optional, Tuple
from urllib.parse import urlparse

from pyspark.sql import SparkSession

__all__ = [
    "ObjectStoreConfig",
    "normalize_object_store_endpoint",
    "SessionConfig",
    "build_session",
]

_TRUTHY = {"1", "true", "yes", "on"}


def normalize_object_store_endpoint(raw: Optional[str]) -> Tuple[str, Optional[bool]]:
    """Validate and split an object-store endpoint into ``(host[:port], ssl?)``.

    ``ssl`` is True/False when a scheme decides it, None when the input
    was a bare host (caller keeps its own default). Raises ``ValueError``
    for empty/None input, non-http(s) schemes, missing hostname, or any
    path/params/query/fragment — the same fail-fast contract as the
    reference (``spark/app/spark_processing.py:39-65``).
    """
    if raw is None:
        raise ValueError("object-store endpoint is required")
    trimmed = raw.strip()
    if not trimmed:
        raise ValueError("object-store endpoint must be non-empty")

    if "://" not in trimmed:
        # Bare host[:port]; no URL parts allowed.
        if any(c in trimmed for c in "/?#"):
            raise ValueError(
                "schemeless endpoint must be a bare host[:port] "
                f"(got {trimmed!r})"
            )
        return trimmed, None

    url = urlparse(trimmed)
    if url.scheme not in ("http", "https"):
        raise ValueError(f"endpoint scheme must be http or https, got {url.scheme!r}")
    if not url.hostname:
        raise ValueError("endpoint URL has no hostname")
    if url.path:
        raise ValueError(f"endpoint must not carry a path (got {url.path!r})")
    if url.params or url.query or url.fragment:
        raise ValueError("endpoint must not carry params/query/fragment")
    return url.netloc, url.scheme == "https"


@dataclass
class ObjectStoreConfig:
    """S3A client settings, resolvable from the environment.

    Mirrors the reference's env surface (``spark_processing.py:165-197``):
    S3_REGION/AWS_REGION, AWS_ACCESS_KEY_ID/SECRET/SESSION_TOKEN,
    S3_ENDPOINT, S3_PATH_STYLE_ACCESS.
    """

    region: str = "eu-west-2"
    access_key: Optional[str] = None
    secret_key: Optional[str] = None
    session_token: Optional[str] = None
    endpoint: Optional[str] = None  # host[:port], already normalized
    path_style: Optional[bool] = None
    ssl_enabled: Optional[bool] = None

    @classmethod
    def from_env(cls, env: Optional[Mapping[str, str]] = None) -> "ObjectStoreConfig":
        e = os.environ if env is None else env
        endpoint = None
        ssl_enabled = None
        raw_endpoint = e.get("S3_ENDPOINT")
        if raw_endpoint:
            endpoint, ssl_enabled = normalize_object_store_endpoint(raw_endpoint)
        path_style = None
        raw_ps = e.get("S3_PATH_STYLE_ACCESS")
        if raw_ps is not None:
            path_style = raw_ps.strip().lower() in _TRUTHY
        return cls(
            region=e.get("S3_REGION") or e.get("AWS_REGION") or "eu-west-2",
            access_key=e.get("AWS_ACCESS_KEY_ID"),
            secret_key=e.get("AWS_SECRET_ACCESS_KEY"),
            session_token=e.get("AWS_SESSION_TOKEN"),
            endpoint=endpoint,
            path_style=path_style,
            ssl_enabled=ssl_enabled,
        )

    def spark_conf(self) -> dict:
        """Render to ``spark.hadoop.fs.s3a.*`` entries."""
        conf: dict = {}
        if self.access_key and self.secret_key:
            provider = (
                "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"
                if self.session_token
                else "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider"
            )
            conf["spark.hadoop.fs.s3a.aws.credentials.provider"] = provider
            conf["spark.hadoop.fs.s3a.access.key"] = self.access_key
            conf["spark.hadoop.fs.s3a.secret.key"] = self.secret_key
            if self.session_token:
                conf["spark.hadoop.fs.s3a.session.token"] = self.session_token
        else:
            conf["spark.hadoop.fs.s3a.aws.credentials.provider"] = (
                "com.amazonaws.auth.DefaultAWSCredentialsProviderChain"
            )
        conf["spark.hadoop.fs.s3a.region"] = self.region

        path_style = self.path_style
        if self.endpoint:
            conf["spark.hadoop.fs.s3a.endpoint"] = self.endpoint
            if path_style is None:
                # Non-AWS endpoints (MinIO etc.) generally need path-style.
                path_style = "amazonaws.com" not in self.endpoint.lower()
        if path_style is not None:
            conf["spark.hadoop.fs.s3a.path.style.access"] = str(bool(path_style)).lower()
        if self.ssl_enabled is not None:
            conf["spark.hadoop.fs.s3a.connection.ssl.enabled"] = (
                "true" if self.ssl_enabled else "false"
            )
        return conf


@dataclass
class SessionConfig:
    """Engine-wide Spark settings.

    ``shuffle_partitions`` should track cluster parallelism: ~2-3x total
    executor cores on a real cluster; on local[N] we default to N. AQE
    re-coalesces at runtime, so erring high is safe at 100 TB scale
    (where a fixed count would otherwise be the first bottleneck).
    """

    app_name: str = "api-kakfa-spark-airflow-s3-athena-spark"
    master: Optional[str] = None  # None = whatever spark-submit/env provides
    shuffle_partitions: Optional[int] = None
    object_store: Optional[ObjectStoreConfig] = None
    extra: Mapping[str, str] = field(default_factory=dict)

    def _default_shuffle_partitions(self) -> int:
        if self.shuffle_partitions:
            return self.shuffle_partitions
        cpus = os.cpu_count() or 8
        env = os.environ.get("SPARK_GRAFT_CPUS")
        if env and env.isdigit():
            cpus = int(env)
        return max(cpus, 8)


def build_session(config: Optional[SessionConfig] = None) -> SparkSession:
    """Create (or get) a SparkSession with the engine's defaults applied.

    Defaults chosen for correctness-at-scale:
    - AQE + partition coalescing + skew-join splitting: runtime re-plan
      keeps the small-SF plans and the 100 TB plans the same code.
    - UTC session timezone: deterministic timestamps vs external oracles.
    - Arrow execution: vectorized pandas-UDF/createDataFrame transfer.
    - Parquet as the default columnar source (pushdown + pruning).
    """
    config = config or SessionConfig()
    builder = SparkSession.builder.appName(config.app_name)
    if config.master:
        builder = builder.master(config.master)

    defaults = {
        "spark.sql.shuffle.partitions": str(config._default_shuffle_partitions()),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.parquet.filterPushdown": "true",
        # Parquet TIMESTAMP(NANOS) columns (unsupported natively) read as
        # long; sources/tables.py converts to micros timestamps on load.
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        # Files: split generously so a 100 TB scan parallelizes; AQE
        # coalesces post-shuffle partitions back down.
        "spark.sql.files.maxPartitionBytes": "128m",
        "spark.sql.autoBroadcastJoinThreshold": "64m",
        # Joins: allow shuffled-hash when its size conditions are met
        # (guide §9 baseline) — SMJ pays two sorts that SHJ skips, and
        # AQE can additionally convert a planned SMJ whose post-shuffle
        # partitions fit under the local-map threshold. Measured on the
        # sf0.1 bench (A/B, interleaved sessions): 3-12% on join-heavy
        # rows, no regressions. Parameterized: a deployment whose build
        # sides can exceed executor memory per partition (SHJ builds
        # in memory; SMJ spills more gracefully) sets
        # SPARK_GRAFT_PREFER_SMJ=true / SPARK_GRAFT_SHJ_LOCALMAP=0.
        "spark.sql.join.preferSortMergeJoin": os.environ.get(
            "SPARK_GRAFT_PREFER_SMJ", "false"
        ),
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": os.environ.get(
            "SPARK_GRAFT_SHJ_LOCALMAP", "64m"
        ),
        # Spill-merge reads can hang forever in ReadAheadInputStream's
        # lost-wakeup race (task parked in waitForAsyncReadComplete
        # while every read-ahead pool thread idles — observed live on
        # a 150M-row hash-aggregate spill merge during the sf100 scale
        # sweep: rchar frozen for minutes, one task pinned at 31+1/32).
        # Plain buffered spill reads cost a little sequential-read
        # overlap and buy the hang away — the right trade for any
        # long-running job that is allowed to spill.
        "spark.unsafe.sorter.spill.read.ahead.enabled": "false",
    }
    if config.object_store:
        defaults.update(config.object_store.spark_conf())
    defaults.update(config.extra)
    for k, v in defaults.items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def local_test_session(app_name: str = "engine-tests", cores: Optional[int] = None) -> SparkSession:
    """A local[...] session sized for unit tests and the bench harness."""
    n = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 4)
    cfg = SessionConfig(
        app_name=app_name,
        master=f"local[{n}]",
        shuffle_partitions=n,
        extra={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        },
    )
    return build_session(cfg)
