"""Shared test fixtures: one local SparkSession + deterministic crawl fixtures."""

from __future__ import annotations

import pytest

from csxj_crawler_spark.fixtures import generator
from csxj_crawler_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app="csxj-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra={"spark.sql.warehouse.dir": "/tmp/csxj-test-warehouse"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fix_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("fixtures")
    generator.generate(str(d), n_pages=250, seed=42)
    return str(d)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
