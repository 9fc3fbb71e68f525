"""Config-layer contracts: endpoint normalization (same ValueError
contract as the reference's tests/test_s3_endpoint_normalization.py)
and S3A credential-provider selection (reference
spark/app/spark_processing.py:17-36,83-106 semantics)."""

import pytest

from api_kakfa_spark_airflow_s3_athena_spark.session import (
    ObjectStoreConfig,
    normalize_object_store_endpoint,
)


@pytest.mark.parametrize(
    "raw,host,ssl",
    [
        ("https://s3.us-east-1.amazonaws.com", "s3.us-east-1.amazonaws.com", True),
        ("http://s3.us-west-2.amazonaws.com", "s3.us-west-2.amazonaws.com", False),
        ("s3.eu-west-2.amazonaws.com", "s3.eu-west-2.amazonaws.com", None),
        ("S3.CUSTOM-ENDPOINT.EXAMPLE.COM", "S3.CUSTOM-ENDPOINT.EXAMPLE.COM", None),
        ("https://objects.example.com:8443", "objects.example.com:8443", True),
        ("minio:9000", "minio:9000", None),
    ],
)
def test_endpoint_valid(raw, host, ssl):
    got_host, got_ssl = normalize_object_store_endpoint(raw)
    assert got_host == host
    assert got_ssl is ssl


@pytest.mark.parametrize(
    "raw",
    [
        "",
        "   ",
        None,
        "http://",
        "https://s3.us-east-1.amazonaws.com/bucket",
        "http://s3.us-east-1.amazonaws.com/",
        "s3.us-east-1.amazonaws.com/",
        "s3.us-east-1.amazonaws.com/extra",
        "http://s3.us-east-1.amazonaws.com?foo=bar",
        "ftp://s3.example.com",
        "https://s3.example.com#frag",
    ],
)
def test_endpoint_invalid(raw):
    with pytest.raises(ValueError):
        normalize_object_store_endpoint(raw)


def test_static_credentials_select_simple_provider():
    conf = ObjectStoreConfig(access_key="AK", secret_key="SK").spark_conf()
    assert conf["spark.hadoop.fs.s3a.aws.credentials.provider"].endswith(
        "SimpleAWSCredentialsProvider"
    )
    assert "spark.hadoop.fs.s3a.session.token" not in conf


def test_session_token_selects_temporary_provider():
    conf = ObjectStoreConfig(access_key="AK", secret_key="SK", session_token="TOK").spark_conf()
    assert conf["spark.hadoop.fs.s3a.aws.credentials.provider"].endswith(
        "TemporaryAWSCredentialsProvider"
    )
    assert conf["spark.hadoop.fs.s3a.session.token"] == "TOK"


def test_no_credentials_uses_default_chain():
    conf = ObjectStoreConfig().spark_conf()
    assert conf["spark.hadoop.fs.s3a.aws.credentials.provider"].endswith(
        "DefaultAWSCredentialsProviderChain"
    )


def test_non_aws_endpoint_defaults_to_path_style():
    conf = ObjectStoreConfig(endpoint="minio:9000").spark_conf()
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"
    aws = ObjectStoreConfig(endpoint="s3.eu-west-2.amazonaws.com").spark_conf()
    assert aws["spark.hadoop.fs.s3a.path.style.access"] == "false"


def test_from_env(monkeypatch):
    env = {
        "S3_ENDPOINT": "https://objects.example.com:8443",
        "AWS_ACCESS_KEY_ID": "AK",
        "AWS_SECRET_ACCESS_KEY": "SK",
        "S3_REGION": "us-east-1",
        "S3_PATH_STYLE_ACCESS": "yes",
    }
    cfg = ObjectStoreConfig.from_env(env)
    assert cfg.endpoint == "objects.example.com:8443"
    assert cfg.ssl_enabled is True
    assert cfg.path_style is True
    assert cfg.region == "us-east-1"
