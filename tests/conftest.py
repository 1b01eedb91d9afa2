from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simtradedata_spark.session import get_spark
from simtradedata_spark.sources.synthetic import SyntheticMarket
from simtradedata_spark.sources.tables import Warehouse, build_warehouse


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def market(spark) -> SyntheticMarket:
    return SyntheticMarket(spark)


@pytest.fixture(scope="session")
def warehouse(spark, market, tmp_path_factory) -> Warehouse:
    root = str(tmp_path_factory.mktemp("warehouse"))
    return build_warehouse(spark, root, market)


@pytest.fixture(scope="session")
def api(warehouse):
    from simtradedata_spark.api.ptrade import PTradeDataAPI

    return PTradeDataAPI(warehouse)
