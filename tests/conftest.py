"""Shared pytest fixtures (modeled on reference tests/conftest.py:8-17 but
with engine session defaults and the driver-generated parquet fixtures)."""

from __future__ import annotations

import os

import pytest

# Python workers spawned by Spark must be able to unpickle classes defined in
# test modules; pytest puts tests/ on the driver's sys.path only, so export it.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ["PYTHONPATH"] = ":".join(
    p for p in (_REPO, os.path.join(_REPO, "tests"), os.environ.get("PYTHONPATH")) if p
)

from ml_hadoop_experiment_spark.common.session import get_session  # noqa: E402

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    warehouse = str(tmp_path_factory.mktemp("warehouse"))
    spark = get_session(
        app_name="mlhe-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "4g",
            # bucketed-table tests saveAsTable here, not into the repo
            "spark.sql.warehouse.dir": warehouse,
        },
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


@pytest.fixture(scope="session")
def documents(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="session")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")
