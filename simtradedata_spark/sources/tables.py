"""Warehouse: tall partitioned parquet tables replacing the reference's
per-symbol HDF5 keys (``h5_writer.py`` K1-K6, SURVEY §2.2).

Layout decisions (designed for 100 TB, exercised locally):
  - ``bars``/``valuation``/``adjust_factor``/``stock_status`` are partitioned
    by ``trade_year`` (derived) — date-range queries prune whole directories;
    within a partition, files are written sorted by (symbol, trade_date) so
    min/max parquet stats make symbol predicates effective too.
  - ``ticks``/``minute_bars`` are partitioned by ``trade_month`` (derived
    int yyyymm): intraday tables are ~2 orders of magnitude denser per day
    than the dailies, and the incremental ingest rebuilds whole partitions —
    at year grain a one-day tick batch rewrote ~365 days of minute bars
    (~365× write amplification at 100 TB); at month grain the dynamic
    overwrite touches only the batch's own months (≤31× worst case, 1-day
    granularity costs a 12× deeper dir tree for no extra pruning win).
  - dimension tables (metadata, calendar, exrights, fundamentals,
    constituents) are single unpartitioned tables — they are broadcast-sized
    at any realistic scale.
  - ``compression`` inherits the session's zstd default (K1's blosc-9 analog).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITIONED = {
    "bars",
    "valuation",
    "adjust_factor",
    "stock_status",
    "ticks",
    "minute_bars",
}
# intraday subset of PARTITIONED: month-grain (int yyyymm) partition column
MONTH_GRAIN = {"ticks", "minute_bars"}
_PART_COLS = ("trade_year", "trade_month")
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

    def write(
        self,
        table: str,
        df: DataFrame,
        mode: str = "overwrite",
        dynamic: bool = False,
    ) -> None:
        """K1-K5 sink: partitioned fact tables get a derived trade_year
        (daily) or trade_month (intraday) partition column + in-file sort;
        dims are written as-is. ``dynamic=True`` switches the partitioned
        branch to dynamic partition overwrite (only the partitions present
        in ``df`` are replaced) — one copy of the layout logic for both
        writers."""
        if dynamic and mode != "overwrite":
            # dynamic overwrite IS an overwrite of the touched partitions;
            # silently coercing e.g. mode="append" would hand the caller
            # partition replaces where they asked for appends.
            raise ValueError(
                f"dynamic=True requires mode='overwrite' (got mode={mode!r})"
            )
        if table in PARTITIONED and "trade_date" in df.columns:
            if table in MONTH_GRAIN:
                part_col = "trade_month"
                part_val = F.year("trade_date") * 100 + F.month("trade_date")
            else:
                part_col = "trade_year"
                part_val = F.year("trade_date")
            if mode == "append" or dynamic:
                # a full overwrite replaces the table dir wholesale, but an
                # append/dynamic write LANDS BESIDE existing partition dirs
                # — mixing grains there breaks partition discovery on the
                # next read ("Conflicting partition column names")
                self._check_grain(table, part_col)
            w = (
                df.withColumn(part_col, part_val)
                .repartition(part_col)
                .sortWithinPartitions("symbol", "trade_date")
                .write.mode(mode)
            )
            if dynamic:
                w = w.option("partitionOverwriteMode", "dynamic")
            w.partitionBy(part_col).parquet(self.path(table))
        else:
            df.write.mode(mode).parquet(self.path(table))

    def write_partitions_dynamic(self, table: str, df: DataFrame) -> None:
        """Overwrite ONLY the partitions present in ``df`` (trade_month for
        intraday tables, trade_year for dailies), leaving every other
        partition's files untouched. The incremental-ingest write: a daily
        tick batch touches one month of minute bars, so the rebuild rewrites
        one partition, not the table. Always uses the base path-layout
        writer (bucketed/z-order subclasses route their own full writes
        through saveAsTable, which has no dynamic mode)."""
        Warehouse.write(self, table, df, dynamic=True)

    def _on_disk_part_col(self, table: str) -> str | None:
        """The partition column actually present on disk (None for a
        missing or unpartitioned table)."""
        root = self.path(table)
        if not os.path.isdir(root):
            return None
        for d in os.listdir(root):
            if "=" in d and os.path.isdir(os.path.join(root, d)):
                name = d.split("=", 1)[0]
                if name in _PART_COLS:
                    return name
        return None

    def _check_grain(self, table: str, part_col: str) -> None:
        on_disk = self._on_disk_part_col(table)
        if on_disk and on_disk != part_col:
            raise ValueError(
                f"{table} at {self.path(table)} is partitioned by "
                f"{on_disk}= on disk but this writer lands {part_col}= "
                f"dirs; migrate first: python -m simtradedata_spark "
                f"maintain --root {self.root} --regrain {table}"
            )

    def regrain(self, table: str) -> dict:
        """Migrate a table whose on-disk partition grain predates the
        current layout (e.g. a minute_bars written under trade_year=
        before intraday tables moved to month grain) by rewriting it at
        the grain ``write`` uses today. Staged like ``compact``: the
        replacement is fully written beside the live dir, then swapped —
        a crash leaves either the old table or a finished staging dir,
        never a mixed-grain table. No-op (regrained=False) when the grain
        already matches, the table is unpartitioned, or it is absent."""
        import shutil

        live = self.path(table)
        tmp_root = os.path.join(self.root, f".{table}.regrain-tmp")
        trash = os.path.join(self.root, f".{table}.regrain-trash")
        # sweep a previous crashed run: a stranded trash dir is a
        # superseded original (drop it); a stranded staging table with no
        # live dir is a finished rewrite whose swap never happened
        if os.path.isdir(trash):
            shutil.rmtree(trash)
        staged = os.path.join(tmp_root, table)
        if os.path.isdir(staged) and not os.path.isdir(live):
            os.rename(staged, live)
        if os.path.isdir(tmp_root):
            shutil.rmtree(tmp_root)

        want = "trade_month" if table in MONTH_GRAIN else "trade_year"
        on_disk = self._on_disk_part_col(table)
        if table not in PARTITIONED or on_disk in (None, want):
            return {"table": table, "regrained": False, "grain": on_disk}
        # plain-Warehouse staging layout: grain is what regrain fixes;
        # clustered layouts (bucketed/z-order) are restored by their own
        # writers afterwards if wanted
        Warehouse(self.spark, tmp_root).write(table, self.read(table))
        os.rename(live, trash)
        os.rename(staged, live)
        shutil.rmtree(trash)
        os.rmdir(tmp_root)
        return {"table": table, "regrained": True, "grain": want}

    def read(self, table: str, merge_schema: bool = False) -> DataFrame:
        """``merge_schema=True`` unions the footers of every file so a
        column added by a later ingest batch is visible table-wide (older
        files yield nulls) — parquet-level schema evolution, the additive
        half of what a metastore would track. Off by default: footer-union
        costs one extra listing pass, and the common read wants the latest
        writer's schema."""
        reader = self.spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        df = reader.parquet(self.path(table))
        return df.drop(*[c for c in _PART_COLS if c in df.columns])

    def read_range(
        self,
        table: str,
        start: str | None = None,
        end: str | None = None,
        date_col: str = "trade_date",
    ) -> DataFrame:
        """Date-bounded read that actually PRUNES partitions: a predicate on
        ``date_col`` alone never prunes a partitioned table (pruning needs
        partition-column predicates), so the year/month bounds are derived
        here before the partition column is dropped. At 100 TB this is the
        difference between scanning one month's directory and all of them
        for a backtest-day slice."""
        df = self.spark.read.parquet(self.path(table))
        part = next((c for c in _PART_COLS if c in df.columns), None)

        def _bound(d: str) -> int:  # 'yyyy-mm-dd' -> partition value
            return int(d[:4]) if part == "trade_year" else int(d[:7].replace("-", ""))

        if start:
            df = df.filter(F.col(date_col) >= start)
            if part:
                df = df.filter(F.col(part) >= _bound(start))
        if end:
            df = df.filter(F.col(date_col) <= end)
            if part:
                df = df.filter(F.col(part) <= _bound(end))
        return df.drop(part) if part else df

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
            and not d.startswith((".", "_"))
        )

    def compact(self, table: str, target_file_bytes: int = 128 << 20) -> dict:
        """Small-file compaction — the operational fix for incremental
        ingest's 100 TB killer: every append/merge batch leaves files far
        below row-group-efficient size, and scans then pay a per-file
        open + footer + task cost that dwarfs the data read. Each partition
        directory is rewritten into ``ceil(bytes / target_file_bytes)``
        files, preserving the (symbol, trade_date) in-file sort so parquet
        min/max stats keep pruning symbol predicates. Partitions already at
        or below the target file count are left untouched (idempotent; a
        scheduled run costs nothing once the table is compact). The rewrite
        is per-partition dir-swap — the same non-transactional replace
        semantics as ``write(mode="overwrite")``; pair with table-level
        locking or a metastore for concurrent readers.
        """
        import math
        import shutil

        root = self.path(table)
        # Sweep leftovers from a previous crashed run first: a stranded
        # .compact-tmp is a fully-written replacement whose swap never
        # happened (finish the swap if the live dir is gone), and a
        # stranded .compact-trash is a superseded original (safe to drop).
        # Partition-level staging lives inside the table dir; table-level
        # staging (unpartitioned case) lives beside it in the warehouse
        # root — check both.
        candidates = [
            (parent, d)
            for parent, dirs, _files in (
                os.walk(root) if os.path.isdir(root) else []
            )
            for d in dirs
            if d.endswith((".compact-tmp", ".compact-trash"))
        ] + [
            (self.root, d)
            for d in os.listdir(self.root)
            if d.startswith(f".{table}.compact-")
        ]
        for parent, d in candidates:
            p = os.path.join(parent, d)
            if not os.path.isdir(p):
                continue
            if d.endswith(".compact-trash"):
                shutil.rmtree(p)
            elif d.endswith(".compact-tmp"):
                live = os.path.join(parent, d[1:][: -len(".compact-tmp")])
                if not os.path.isdir(live):
                    os.rename(p, live)  # finish the interrupted swap
                else:
                    shutil.rmtree(p)
        # Recurse to LEAF partition dirs: a table partitioned by
        # (exchange, year) nests key=value dirs two deep, and scanning only
        # the first level would find zero parquet files and silently report
        # the table as already compact.
        def _leaves(base: str) -> list[str]:
            subs = sorted(
                d
                for d in os.listdir(base)
                if "=" in d and os.path.isdir(os.path.join(base, d))
            )
            if not subs:
                return [base]
            out: list[str] = []
            for d in subs:
                out.extend(_leaves(os.path.join(base, d)))
            return out

        part_dirs = _leaves(root)
        stats = {"files_before": 0, "files_after": 0, "partitions_rewritten": 0}
        sort_cols = [
            c for c in ("symbol", "trade_date")
            if c in self.spark.read.parquet(root).columns
        ]
        for pdir in part_dirs:
            files = [
                f for f in os.listdir(pdir) if f.endswith(".parquet")
            ]
            nbytes = sum(os.path.getsize(os.path.join(pdir, f)) for f in files)
            n_target = max(1, math.ceil(nbytes / target_file_bytes))
            stats["files_before"] += len(files)
            if n_target >= len(files):
                stats["files_after"] += len(files)
                continue
            # mergeSchema: a partition whose files straddle a schema
            # evolution must keep the union schema, not one random footer.
            df = self.spark.read.option("mergeSchema", "true").parquet(pdir)
            # dot-prefixed staging: hidden to Spark's file listing, so a
            # concurrent reader never parses a half-written sibling as a
            # bogus partition value.
            staging = os.path.join(
                os.path.dirname(pdir), "." + os.path.basename(pdir) + ".compact-tmp"
            )
            w = df.repartition(n_target)
            if sort_cols:
                w = w.sortWithinPartitions(*sort_cols)
            w.write.mode("overwrite").parquet(staging)
            # Rename-aside swap: never a moment where the partition is
            # simply GONE. A crash between the renames leaves the new data
            # in .compact-tmp with no live dir — the sweep above finishes
            # that swap on the next run; a crash after leaves only
            # .compact-trash, which the sweep drops.
            trash = os.path.join(
                os.path.dirname(pdir),
                "." + os.path.basename(pdir) + ".compact-trash",
            )
            os.rename(pdir, trash)
            os.rename(staging, pdir)
            shutil.rmtree(trash)
            stats["files_after"] += sum(
                1 for f in os.listdir(pdir) if f.endswith(".parquet")
            )
            stats["partitions_rewritten"] += 1
        return stats


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
    ticks = market.ticks()
    wh.write("ticks", ticks)
    # Materialized finest-level intraday rollup: get_price(frequency='1m')
    # reads this directly; coarser minute frequencies fold from it
    # (rebucket_minute_bars) without re-reading ticks — the hypertable
    # continuous-aggregate layout applied to the bar store. Written WITH
    # the decomposable state (open_ord/close_ord/money_e4) so (a) folds
    # stay integer-exact at any width and (b) refresh_time_bars can merge
    # later tick batches without re-reading history.
    from simtradedata_spark.operators.resample import time_bars_from_ticks

    wh.write("minute_bars", time_bars_from_ticks(ticks, minutes=1, with_state=True))
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


def zorder_value(a: F.Column, b: F.Column, bits: int = 16) -> F.Column:
    """Interleave the low ``bits`` bits of two non-negative int columns into
    one Z-value (Morton code). Rows sorted by the Z-value cluster into
    rectangle-ish regions of the (a, b) plane, so EVERY file's min/max
    footer stats are narrow in BOTH dimensions — the data-skipping property
    a single-column sort only gives you for its leading column. Pure
    shift/or expressions: whole-stage codegen, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        )
    return z


class ZOrderWarehouse(Warehouse):
    """Warehouse variant whose fact-table FILES are Z-order clustered on
    (symbol, trade_date) — the SURVEY §7 phase-5 lakehouse layout, done with
    plain parquet instead of Delta OPTIMIZE ZORDER.

    The default layout sorts (symbol, trade_date) inside each year
    partition: symbol predicates skip row groups via footer min/max, but a
    date predicate inside the year must read every row group (date min/max
    spans the whole partition in every file). Z-ordering makes BOTH
    predicates skip: symbol's coordinate is a stable 16-bit hash, date's is
    days-since-epoch, files cover Z-ranges ≈ rectangles. At 100 TB this is
    the difference between a backtest-day slice reading ~1/√F of a year and
    reading all of it. Verified by reading parquet footers in
    tests/test_zorder.py, not by assertion on faith."""

    def __init__(self, spark: SparkSession, root: str, files_per_partition: int = 16):
        super().__init__(spark, root)
        self.files = files_per_partition

    def write(self, table: str, df: DataFrame, mode: str = "overwrite") -> None:
        if table in PARTITIONED and {"symbol", "trade_date"} <= set(df.columns):
            # Coordinates must be MONOTONE in each column's natural order —
            # parquet footer min/max are on the raw columns, so a hashed
            # coordinate would cluster by hash while the stats span the
            # whole alphabet (measured: hash coords prune almost nothing).
            # Symbol → dense lexicographic rank via a broadcast dictionary
            # (the symbol dim is bounded — ~5k A-shares — at any scale);
            # date → days offset. Both scaled to the SAME bit width so the
            # interleave is balanced.
            syms = sorted(
                r[0] for r in df.select("symbol").distinct().collect()
            )
            bits = max(2, (max(len(syms), 2) - 1).bit_length())
            sym_dim = df.sparkSession.createDataFrame(
                [(s, i * (1 << bits) // len(syms)) for i, s in enumerate(syms)],
                ["symbol", "__sx"],
            )
            bounds = df.agg(
                F.min("trade_date").alias("d0"), F.max("trade_date").alias("d1")
            ).first()
            span = max((bounds["d1"] - bounds["d0"]).days + 1, 1)
            dx = (
                F.datediff("trade_date", F.lit(str(bounds["d0"])))
                * (1 << bits)
                / span
            ).cast("long")
            z = zorder_value(F.col("__sx").cast("long"), dx, bits=bits)
            # Same partition grain as the base writer (trade_month for
            # intraday tables, trade_year for dailies): a z-ordered build
            # and a later plain-Warehouse ingest must land the same layout,
            # or partition discovery fails on the mixed directory names.
            if table in MONTH_GRAIN:
                part_col = "trade_month"
                part_val = F.year("trade_date") * 100 + F.month("trade_date")
            else:
                part_col = "trade_year"
                part_val = F.year("trade_date")
            if mode == "append":
                self._check_grain(table, part_col)
            staged = (
                df.join(F.broadcast(sym_dim), "symbol")
                .withColumn(part_col, part_val)
                .withColumn("__z", z)
                .repartitionByRange(self.files, part_col, "__z")
                .sortWithinPartitions(part_col, "__z")
                .drop("__z", "__sx")
            )
            staged.write.mode(mode).partitionBy(part_col).parquet(
                self.path(table)
            )
        else:
            super().write(table, df, mode)


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
