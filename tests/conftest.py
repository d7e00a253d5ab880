import json
import os
from pathlib import Path

import pytest

FIXTURES = Path(__file__).parent / "fixtures"
TESTDATA = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def load_fixture(name: str) -> dict:
    with open(FIXTURES / name) as fh:
        return json.load(fh)


@pytest.fixture(scope="session")
def users_current():
    from iceberg_evolve_spark.schema import Schema

    return Schema.from_file(str(FIXTURES / "users_current.iceberg.json"))


@pytest.fixture(scope="session")
def users_new():
    from iceberg_evolve_spark.schema import Schema

    return Schema.from_file(str(FIXTURES / "users_new.iceberg.json"))


@pytest.fixture(scope="session")
def spark():
    """Session-scoped local Spark. Config mirrors the driver's bench environment."""
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "4")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("iceberg-evolve-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return TESTDATA
