from simtradedata_spark.api.ptrade import PTradeDataAPI  # noqa: F401
