from simtradedata_spark.streaming.incremental import (  # noqa: F401
    incremental_merge,
    incremental_refresh,
)
