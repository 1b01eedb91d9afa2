"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata (LLM-pipeline extension, BASELINE.json north star).

Design: media payloads live in a ``binary`` column next to a metadata struct
(format/width/height/duration). Decode / feature-extraction / resize /
frame-sampling run as Arrow-batched ``mapInPandas`` operators — one pandas
batch of blobs in, one batch of features out, so the Python boundary is
crossed per-batch, never per-row, and the operator parallelizes per
partition like any other scan-shaped op.

The actual codec step is STUBBED (no image/audio libraries in this
environment): ``decode_media`` raises ``NotImplementedError`` for real
codecs, while ``fake_decode_features`` computes a deterministic 16-bin byte
histogram so the Spark-side plumbing — schema, batch shape, partitioning,
UDF signature — is real and testable end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "struct<format:string,width:int,height:int,duration_ms:int>"
)


def attach_blob_from_text(
    df: DataFrame, id_col: str, text_col: str, blob_col: str = "blob"
) -> DataFrame:
    """Test fixture builder: deterministic pseudo-media bytes derived from the
    text column (utf-8), plus a metadata struct. Stands in for a real
    binary-file ingest (spark.read.format('binaryFile'))."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias(blob_col),
        F.struct(
            F.lit("fake/raw").alias("format"),
            (F.length(text_col) % 640).cast("int").alias("width"),
            (F.length(text_col) % 480).cast("int").alias("height"),
            F.lit(0).cast("int").alias("duration_ms"),
        ).alias("media_meta"),
    )


def decode_media(fmt: str):
    """Real codec entry point — intentionally unimplemented here.

    In production this dispatches to PIL/libav via mapInPandas exactly like
    ``extract_features`` below; the container image has no media libraries,
    so any real format raises."""
    raise NotImplementedError(
        f"no codec for {fmt!r} in this environment; use fake_decode_features "
        "for the deterministic test path"
    )


def fake_decode_features(blob: bytes, bins: int = 16) -> np.ndarray:
    """Deterministic stand-in decoder: L1-normalized byte histogram."""
    if blob is None or len(blob) == 0:
        return np.zeros(bins, dtype="float32")
    arr = np.frombuffer(blob, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=bins).astype("float64")
    return (hist / hist.sum()).astype("float32")


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    bins: int = 16,
    batch_format: str = "fake/raw",
) -> DataFrame:
    """blob → fixed-dim feature vector via Arrow-batched mapInPandas.

    Output: (id, feature array<float>, n_bytes int). Real formats route to
    ``decode_media`` (→ NotImplementedError) so misuse fails loudly."""
    schema = f"{id_col} long, feature array<float>, n_bytes int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts = pdf["__fmt"].unique()
            for f in fmts:
                if f != "fake/raw":
                    decode_media(f)
            feats = [fake_decode_features(b, bins) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "feature": [f.tolist() for f in feats],
                    "n_bytes": [
                        0 if b is None else len(b) for b in pdf[blob_col]
                    ],
                }
            )

    return df.select(
        id_col, blob_col, F.col("media_meta.format").alias("__fmt")
    ).mapInPandas(run, schema)


def resize_media(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize operator — stub (needs a codec)."""
    raise NotImplementedError("resize requires a codec; see decode_media")


def sample_frames(df: DataFrame, every_ms: int) -> DataFrame:
    """Video frame-sampling operator — stub (needs a codec)."""
    raise NotImplementedError("frame sampling requires a codec; see decode_media")
