import pytest

from api_kakfa_spark_airflow_s3_athena_spark.session import local_test_session

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = local_test_session("engine-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the testdata views the driver registers."""
    import duckdb

    con = duckdb.connect()
    from api_kakfa_spark_airflow_s3_athena_spark.schemas import TESTDATA_TABLES

    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield con
    con.close()
