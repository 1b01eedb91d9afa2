from simtradedata_spark.sources.synthetic import SyntheticMarket  # noqa: F401
from simtradedata_spark.sources.tables import Warehouse  # noqa: F401
