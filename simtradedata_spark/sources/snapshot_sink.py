"""Spark 4 Python Data Source SINK: pointer-committed snapshot writer.

``df.write.format("simtrade_snapshot").mode(...).save(path)`` — the K-sink
side of the connector story (SURVEY §2.2), packaging the same commit shape
``streaming/incremental.py::upsert_batch`` uses (version directory +
atomic ``_CURRENT`` pointer) behind the engine's writer-commit protocol:

  executors  — ``write(iterator)`` streams Arrow-batched rows into ONE
               uniquely-named parquet part file inside a staging dir and
               reports the file in its ``WriterCommitMessage``;
  driver     — ``commit(messages)`` publishes a NEW version directory
               containing exactly the files of SUCCESSFUL tasks (plus, in
               append mode, links to the previous version's files), then
               atomically repoints ``_CURRENT``; ``abort()`` discards the
               staging dir.

Readers resolve the pointer first (``read_current``), so they never see a
half-written snapshot; a failed job leaves the table untouched; duplicate
part files from retried tasks are invisible because commit only moves the
files named in the success messages — the core of every exactly-once file
sink (Delta/Iceberg do the same with a manifest instead of a directory).

Local-filesystem implementation (os.link/rename); on HDFS/S3 the same
protocol maps onto the cloud committer APIs.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _PartFile(WriterCommitMessage):
    filename: str
    rows: int


class SnapshotWriter(DataSourceWriter):
    def __init__(self, path: str, schema, overwrite: bool):
        if not path:
            raise ValueError("simtrade_snapshot requires a save path")
        self.path = path
        self.schema = schema
        self.overwrite = overwrite
        self.staging = os.path.join(path, f"_staging-{uuid.uuid4().hex}")
        os.makedirs(self.staging, exist_ok=True)

    # -- executor side -----------------------------------------------------
    def write(self, iterator: Iterator) -> _PartFile:
        import itertools

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(self.schema)
        cols = [f.name for f in self.schema.fields]
        name = f"part-{uuid.uuid4().hex}.parquet"
        # Stream bounded Arrow batches through a ParquetWriter instead of
        # buffering the whole task partition as Python dicts — peak memory
        # is one batch, not one partition (the property the exactly-once
        # framing promises at scale).
        rows_written = 0
        writer = None
        try:
            while True:
                chunk = list(itertools.islice(iterator, 65536))
                if not chunk and writer is not None:
                    break
                pdf = pd.DataFrame([r.asDict() for r in chunk], columns=cols)
                batch = pa.RecordBatch.from_pandas(
                    pdf, schema=arrow_schema, preserve_index=False
                )
                if writer is None:
                    writer = pq.ParquetWriter(
                        os.path.join(self.staging, name), arrow_schema
                    )
                writer.write_batch(batch)
                rows_written += len(chunk)
                if len(chunk) < 65536:
                    break
        finally:
            if writer is not None:
                writer.close()
        return _PartFile(filename=name, rows=rows_written)

    # -- driver side -------------------------------------------------------
    def _current_version(self) -> str | None:
        ptr = os.path.join(self.path, "_CURRENT")
        if not os.path.exists(ptr):
            return None
        with open(ptr) as fh:
            return fh.read().strip()

    def commit(self, messages) -> None:
        version = f"v{uuid.uuid4().hex[:12]}"
        final = os.path.join(self.path, version)
        os.makedirs(final)
        # only files from SUCCESSFUL tasks — retried-task orphans stay in
        # staging and are deleted with it.
        for m in messages:
            os.rename(
                os.path.join(self.staging, m.filename),
                os.path.join(final, m.filename),
            )
        if not self.overwrite:
            prev = self._current_version()
            if prev is not None:
                prev_dir = os.path.join(self.path, prev)
                for f in os.listdir(prev_dir):
                    os.link(
                        os.path.join(prev_dir, f), os.path.join(final, f"prev-{f}")
                    )
        ptr = os.path.join(self.path, "_CURRENT")
        tmp = ptr + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(version)
        os.replace(tmp, ptr)  # atomic repoint = the commit
        shutil.rmtree(self.staging, ignore_errors=True)

    def abort(self, messages) -> None:
        shutil.rmtree(self.staging, ignore_errors=True)


class SnapshotDataSource(DataSource):
    """Registry: ``spark.dataSource.register(SnapshotDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "simtrade_snapshot"

    def writer(self, schema, overwrite: bool) -> SnapshotWriter:
        return SnapshotWriter(self.options.get("path"), schema, overwrite)
