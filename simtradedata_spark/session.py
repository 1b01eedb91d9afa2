"""SparkSession bootstrap.

Tuned for the local[32] test harness but with cluster-safe settings: AQE on
(runtime coalesce + skew-join handling), shuffle partitions sized to cores
locally (on a real cluster AQE coalesces from a higher initial number), Arrow
enabled for the few pandas-UDF operators, UTC session timezone so results are
comparable against the DuckDB oracle (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "simtradedata_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Settings rationale (each matters at 100 TB, not just locally):
      - AQE enabled: runtime shuffle-partition coalescing and skew-join
        splitting replace hand-tuned partition counts.
      - ``spark.sql.shuffle.partitions``: initial value only — AQE adjusts.
        Locally = cores; on a cluster set ~2-3x total cores via extra_conf.
      - Arrow: vectorizes the pandas-UDF slow path (indicators, as-of fallback).
      - UTC timezone: parquet timestamps are naive; pinning UTC makes Spark
        and DuckDB read identical wall-clock values.
    """
    n = cpus or DEFAULT_CPUS
    # AQE COALESCES shuffle partitions downward from the initial value but
    # never splits above it (skew-join splitting aside) — so the initial
    # count is the ceiling on shuffle parallelism/granularity. Locally =
    # cores is right for the certification scale; at 10-100x data the
    # per-partition working set grows past executor memory and spills
    # (measured: the sf10 gram families). SPARK_GRAFT_SHUFFLE_PARTITIONS
    # raises the ceiling for big-replica runs the way a cluster job sets
    # 2-3x total cores; AQE still coalesces small stages back down.
    shuffle_parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(n))
    b = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # Split small files across cores: the sf0.1 fact tables are ~10 MB,
        # so the default 128 MB split reads them in ONE task and the other 31
        # cores idle (measured 2-3x on the TPC-H-shape scans). On a real
        # cluster with TB-scale tables raise this back toward 128 MB via
        # SPARK_GRAFT_MAX_PARTITION_BYTES — more splits there just add
        # scheduling overhead.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(8 * 1024 * 1024)),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # The oracle harness collects full results for value comparison; at
        # the 30x scale replica a 54M-row frame tops Spark's 1 GB default.
        # Local-harness knob only — production code never collects results.
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # The driver's events table stores TIMESTAMP(NANOS); Spark has no nanos
        # timestamp — read as long and convert in the catalog (micros trunc,
        # matching DuckDB's internal micros precision).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Python Data Source connectors (sources/pyds.py) push symbol/date
        # predicates into the provider scan.
        .config("spark.sql.python.filterPushdown.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
