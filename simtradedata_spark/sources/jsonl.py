"""JSONL corpus interchange — the lingua franca of LLM training-data
pipelines (every public corpus release and curation tool speaks
newline-delimited JSON, usually gzip/zstd-compressed and sharded).

Spark-native end to end: ``spark.read.json`` / ``DataFrameWriter.json``
with an ENFORCED schema — never schema inference, which (a) runs an extra
full scan of a 100 TB corpus and (b) silently widens types per-shard (a
doc_id that happens to look numeric in one shard and not another must not
produce mixed types). Unknown keys in an otherwise-valid record are
IGNORED (standard permissive-mode projection onto the enforced schema);
only malformed or blank lines reach ``_corrupt_record``, so ingest
failures are rows you can quarantine (operators/quality.py), not
exceptions.

Scale notes:
  - gzip is NOT splittable — one task per shard regardless of size. zstd
    (Spark 4 codec) is the right default for write; on read, many medium
    shards beat few huge ones. ``write_jsonl`` therefore shards by
    ``repartition(n_shards)``.
  - ``lines=True`` semantics are the default in Spark's json source; a
    whole-file JSON array would be one record — never do that at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The canonical document schema (mirrors documents.parquet plus the fields
# public corpus dumps carry). Extra keys in the input are ignored by the
# reader; missing keys arrive as nulls — both are data-quality signals the
# profiler/quality pass picks up downstream.
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
) -> DataFrame:
    """Read a JSONL corpus with the schema ENFORCED (no inference scan).

    Implemented as ``read.text`` + ``from_json`` rather than the json file
    source: same Jackson parser and splittability, but the corrupt-line
    column is an ordinary column — the json source forbids plans that
    reference only ``_corrupt_record`` (QUERY_ONLY_CORRUPT_RECORD_COLUMN),
    which is exactly what a quarantine count does. Malformed lines (bad
    JSON or schema-violating field types) arrive with the raw line in
    ``_corrupt_record`` and null parsed fields."""
    s = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    raw = spark.read.text(path)
    parsed = raw.select(
        F.col("value").alias("__raw"),
        F.from_json(
            F.col("value"),
            s,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("__j"),
    )
    # A blank/whitespace line parses to a NULL struct with no corrupt
    # record — without this coalesce it would surface as an all-null CLEAN
    # row (phantom document). Route it to quarantine with the raw line.
    corrupt = F.coalesce(
        F.col("__j._corrupt_record"),
        F.when(F.col("__j").isNull(), F.col("__raw")),
    )
    return parsed.select(
        *[F.col(f"__j.{f.name}").alias(f.name) for f in schema.fields],
        corrupt.alias("_corrupt_record"),
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): rows whose raw line failed to parse — including
    blank/whitespace lines — go to the quarantine side with the original
    line intact; the same split contract as operators/quality.py."""
    if "_corrupt_record" not in df.columns:
        return df, df.limit(0)
    clean = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select(
        "_corrupt_record"
    )
    return clean, bad


def write_jsonl(
    df: DataFrame,
    path: str,
    n_shards: int | None = None,
    compression: str = "gzip",
    mode: str = "overwrite",
) -> None:
    """Write a corpus as compressed JSONL shards. ``n_shards`` controls the
    shard count (default: the frame's partitioning); pick shards of a few
    hundred MB compressed — gzip shards are the interchange default but are
    not splittable on re-read, so favor more, smaller shards."""
    w = df.repartition(n_shards) if n_shards else df
    w.write.mode(mode).option("compression", compression).json(path)
