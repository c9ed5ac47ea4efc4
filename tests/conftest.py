from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from dbtwiz_spark.session import get_spark

    s = get_spark("dbtwiz_spark-tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def catalog(spark):
    from dbtwiz_spark.catalog import Catalog

    return Catalog(spark, SF_DIR)
