from simtradedata_spark.functions.codes import (  # noqa: F401
    to_ptrade_code,
    from_ptrade_code,
)
from simtradedata_spark.functions.cleaning import (  # noqa: F401
    parse_percent,
    yyyymmdd_int,
)
