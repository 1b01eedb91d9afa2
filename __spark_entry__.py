"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship multi-join aggregation at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 (plus the
LLM-pipeline extensions) as (spark, sf_dir) callables; ``oracle_sql()`` gives
the DuckDB-equivalent SQL for each SQL-expressible query. Implementations
live in ``simtradedata_spark/queries.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from simtradedata_spark.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = QUERIES["region_revenue"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
