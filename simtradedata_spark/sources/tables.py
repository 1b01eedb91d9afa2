"""Warehouse: tall partitioned parquet tables replacing the reference's
per-symbol HDF5 keys (``h5_writer.py`` K1-K6, SURVEY §2.2).

Layout decisions (designed for 100 TB, exercised locally):
  - ``bars``/``valuation``/``adjust_factor``/``stock_status`` are partitioned
    by ``trade_year`` (derived) — date-range queries prune whole directories;
    within a partition, files are written sorted by (symbol, trade_date) so
    min/max parquet stats make symbol predicates effective too.
  - dimension tables (metadata, calendar, exrights, fundamentals,
    constituents) are single unpartitioned tables — they are broadcast-sized
    at any realistic scale.
  - ``compression`` inherits the session's zstd default (K1's blosc-9 analog).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITIONED = {"bars", "valuation", "adjust_factor", "stock_status", "ticks"}
DIMENSION = {
    "trade_calendar",
    "exrights",
    "fundamentals",
    "stock_metadata",
    "index_constituents",
    "benchmark",
}


class Warehouse:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def write(self, table: str, df: DataFrame, mode: str = "overwrite") -> None:
        """K1-K5 sink: partitioned fact tables get a derived trade_year
        partition column + in-file sort; dims are written as-is."""
        if table in PARTITIONED and "trade_date" in df.columns:
            (
                df.withColumn("trade_year", F.year("trade_date"))
                .repartition("trade_year")
                .sortWithinPartitions("symbol", "trade_date")
                .write.mode(mode)
                .partitionBy("trade_year")
                .parquet(self.path(table))
            )
        else:
            df.write.mode(mode).parquet(self.path(table))

    def read(self, table: str) -> DataFrame:
        df = self.spark.read.parquet(self.path(table))
        return df.drop("trade_year") if "trade_year" in df.columns else df

    def read_range(
        self,
        table: str,
        start: str | None = None,
        end: str | None = None,
        date_col: str = "trade_date",
    ) -> DataFrame:
        """Date-bounded read that actually PRUNES partitions: a predicate on
        ``date_col`` alone never prunes a ``trade_year``-partitioned table
        (pruning needs partition-column predicates), so the year bounds are
        derived here before the partition column is dropped. At 100 TB this
        is the difference between scanning one year's directory and all of
        them for a backtest-day slice."""
        df = self.spark.read.parquet(self.path(table))
        pruned = "trade_year" in df.columns
        if start:
            df = df.filter(F.col(date_col) >= start)
            if pruned:
                df = df.filter(F.col("trade_year") >= int(start[:4]))
        if end:
            df = df.filter(F.col(date_col) <= end)
            if pruned:
                df = df.filter(F.col("trade_year") <= int(end[:4]))
        return df.drop("trade_year") if pruned else df

    def exists(self, table: str) -> bool:
        """K6 integrity: the parquet footer read doubles as an openability
        check (h5_writer.py:511-537 analog)."""
        try:
            self.spark.read.parquet(self.path(table)).schema
            return True
        except Exception:
            return False

    def tables(self) -> list[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d))
        )


def build_warehouse(
    spark: SparkSession, root: str, market=None, warehouse: Warehouse | None = None
) -> Warehouse:
    """Generate the full synthetic market and persist every table — the
    engine-side replacement for scripts/download_efficient.py (§3.1).
    Pass a ``warehouse`` instance (e.g. BucketedWarehouse) to control layout."""
    from simtradedata_spark.sources.synthetic import SyntheticMarket

    market = market or SyntheticMarket(spark)
    wh = warehouse or Warehouse(spark, root)
    bars = market.bars().drop("sym_idx", "day_idx")
    bench = market.benchmark().drop("sym_idx", "day_idx")
    wh.write("bars", bars.unionByName(bench))
    wh.write("trade_calendar", market.trade_calendar())
    wh.write("valuation", market.valuation())
    wh.write("adjust_factor", market.adjust_factor())
    wh.write("exrights", market.exrights().drop("sym_idx", "day_idx"))
    wh.write("fundamentals", market.fundamentals().drop("sym_idx"))
    wh.write("stock_metadata", market.stock_metadata().drop("sym_idx"))
    wh.write("index_constituents", market.index_constituents())
    wh.write("stock_status", market.stock_status())
    wh.write("etf_metadata", market.etf_metadata())
    wh.write("cb_metadata", market.cb_metadata())
    wh.write("ticks", market.ticks())
    return wh


class BucketedWarehouse(Warehouse):
    """Warehouse variant whose fact tables are bucketed by symbol — the §6
    checklist item realized. Bucketing pre-shuffles data ONCE at write time:
    two tables bucketed by the same column into the same N join/aggregate on
    that column with NO exchange at query time (verified by plan assertion in
    tests). This is what turns the bars ⋈ adjust_factor / bars ⋈ valuation
    hot joins into exchange-free sort-merge joins at 100 TB.

    Bucketed writes go through ``saveAsTable`` (bucket metadata lives in the
    metastore, which Spark requires for bucket-aware planning); the path
    layout under ``spark.sql.warehouse.dir`` is ordinary parquet.
    """

    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 8):
        super().__init__(spark, root)
        self.n_buckets = n_buckets

    def _qualified(self, table: str) -> str:
        return f"bucketed_{table}"

    def write(self, table: str, df: DataFrame, mode: str = "overwrite") -> None:
        if table in PARTITIONED and "symbol" in df.columns:
            sort_cols = (
                ["symbol", "trade_date"] if "trade_date" in df.columns else ["symbol"]
            )
            (
                df.repartition(self.n_buckets, "symbol")
                .write.mode(mode)
                .bucketBy(self.n_buckets, "symbol")
                .sortBy(*sort_cols)
                .option("path", self.path(table))
                .saveAsTable(self._qualified(table))
            )
        else:
            super().write(table, df, mode)

    def read(self, table: str) -> DataFrame:
        if self.spark.catalog.tableExists(self._qualified(table)):
            return self.spark.table(self._qualified(table))
        return super().read(table)


def materialize_adjusted(wh: Warehouse) -> None:
    """Persist pre/post-adjusted bars as first-class tables — the engine-side
    analog of the reference's pre-adjusted HDF5 cache
    (``utils/paths.py:46`` ADJ_PRE_CACHE_PATH). ``PTradeDataAPI`` uses these
    transparently when present, turning every ``get_price(fq=...)`` from a
    bars ⋈ adjust_factor join into a pruned scan. Refresh by re-running after
    new exrights land (adjustment factors rewrite history by design, so the
    materialization is a full rewrite of affected symbols, not an append)."""
    from simtradedata_spark.operators.adjust import adjust_bars

    bars = wh.read("bars")
    af = wh.read("adjust_factor")
    for fq in ("pre", "post"):
        wh.write(f"bars_{fq}", adjust_bars(bars, af, fq))
