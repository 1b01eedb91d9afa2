"""Continuous aggregate: incremental refresh == full recompute."""

from pyspark.sql import functions as F

from simtradedata_spark.catalog import load_table
from simtradedata_spark.operators.hypertable import (
    refresh_rollup,
    rollup_read,
    time_rollup,
)


def test_incremental_refresh_equals_full(spark):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    cutoff = ev.selectExpr("percentile(unix_micros(ts), 0.8)").first()[0]
    old = ev.filter(F.unix_micros("ts") <= cutoff)
    new = ev.filter(F.unix_micros("ts") > cutoff)
    assert new.count() > 0 and old.count() > 0

    base = time_rollup(old, ["event_type"], "ts", "value", "hour")
    refreshed = refresh_rollup(base, new, ["event_type"], "ts", "value", "hour")
    full = time_rollup(ev, ["event_type"], "ts", "value", "hour")

    a = rollup_read(refreshed).orderBy("event_type", "bucket").toPandas()
    b = rollup_read(full).orderBy("event_type", "bucket").toPandas()
    assert len(a) == len(b)
    for col in ("total", "n", "avg", "low", "high"):
        assert (abs(a[col] - b[col]) < 1e-9).all(), col
