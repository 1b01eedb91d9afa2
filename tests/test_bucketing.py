"""BucketedWarehouse: symbol-bucketed facts join without a shuffle."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    from simtradedata_spark.sources.synthetic import SyntheticMarket
    from simtradedata_spark.sources.tables import BucketedWarehouse

    root = str(tmp_path_factory.mktemp("bucketed_wh"))
    m = SyntheticMarket(spark, n_symbols=8, start="2022-01-03", end="2022-06-30")
    wh = BucketedWarehouse(spark, root, n_buckets=4)
    wh.write("bars", m.bars().drop("sym_idx", "day_idx", "n_days"))
    wh.write("valuation", m.valuation())
    yield wh
    for t in ("bucketed_bars", "bucketed_valuation"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_superset_key_join_has_no_shuffle(spark, bucketed):
    """Join on (symbol, trade_date) with buckets on symbol only: hash
    partitioning on a SUBSET of the join keys still clusters matching rows
    together, and Spark's planner (SPARK-35703) uses it — no exchange."""
    bars = bucketed.read("bars")
    val = bucketed.read("valuation")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # the auto-bucketed-scan heuristic only keeps the bucketed layout when it
    # sees an exact-key bucketed op; for subset-of-join-keys plans it must be
    # pinned off so the scan keeps its symbol clustering
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    # default-true since 3.3: co-partition only on EXACT join-key match;
    # relaxing it lets symbol-bucketing serve any join keyed on a superset
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try:
        joined = bars.join(val.select("symbol", "trade_date", "pe_ttm"),
                           ["symbol", "trade_date"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
        spark.conf.unset("spark.sql.requireAllClusterKeysForCoPartition")
    assert "Exchange" not in plan


def test_bucketed_groupby_symbol_has_no_shuffle(spark, bucketed):
    bars = bucketed.read("bars")
    agg = bars.groupBy("symbol").agg(F.sum("volume").alias("v"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bucketed_symbol_join_has_no_shuffle(spark, bucketed):
    bars = bucketed.read("bars")
    val = bucketed.read("valuation")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = bars.groupBy("symbol").agg(F.sum("volume").alias("vol"))
        b = val.groupBy("symbol").agg(F.avg("pe_ttm").alias("pe"))
        plan = a.join(b, "symbol")._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "Exchange" not in plan


def test_bucketed_read_roundtrip(spark, bucketed):
    bars = bucketed.read("bars")
    assert bars.count() > 0
    assert bars.select("symbol").distinct().count() == 8
