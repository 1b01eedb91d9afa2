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
codecs, while the deterministic fakes (``fake_decode_features`` byte
histogram, ``fake_decode_image`` bytes→gray-plane) make the Spark-side
plumbing — schema, batch shape, row expansion, partitioning, UDF
signature — real and testable end-to-end. ``resize_media`` runs REAL
nearest-neighbor resampling and ``sample_frames`` REAL frame slicing;
only bytes→pixels is faked.
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


def fake_decode_image(blob: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in image decoder: bytes → (height, width) uint8
    gray plane, truncating/cyclic-padding the payload — ONLY the
    bytes→pixels step a real codec would do; everything downstream of it
    (resampling, frame slicing) is real math."""
    need = width * height
    if need == 0:
        return np.zeros((0, 0), dtype=np.uint8)
    arr = np.frombuffer(blob or b"\0", dtype=np.uint8)
    reps = -(-need // max(len(arr), 1))
    return np.tile(arr, reps)[:need].reshape(height, width)


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    batch_format: str = "fake/raw",
) -> DataFrame:
    """Image resize as Arrow-batched mapInPandas: decode (fake codec) →
    REAL nearest-neighbor resample in numpy → re-encode bytes + updated
    metadata. Real formats route to decode_media (→ NotImplementedError)
    so misuse fails loudly; the Spark plumbing — schema, per-batch
    boundary, metadata rewrite — is the production shape."""
    schema = f"{id_col} long, {blob_col} binary, media_meta {MEDIA_META_SCHEMA}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for f in pdf["__fmt"].unique():
                if f != batch_format:
                    decode_media(f)
            out_blobs = []
            for blob, w, h in zip(pdf[blob_col], pdf["__w"], pdf["__h"]):
                # NULL metadata arrives as NaN through pandas — treat like 0
                w_i = width if (pd.isna(w) or int(w) == 0) else int(w)
                h_i = height if (pd.isna(h) or int(h) == 0) else int(h)
                img = fake_decode_image(blob, w_i, h_i)
                if img.size == 0:
                    out_blobs.append(b"")
                    continue
                # nearest-neighbor index map — the actual resampling math
                ys = (np.arange(height) * img.shape[0] // height).clip(
                    0, img.shape[0] - 1
                )
                xs = (np.arange(width) * img.shape[1] // width).clip(
                    0, img.shape[1] - 1
                )
                out_blobs.append(img[np.ix_(ys, xs)].tobytes())
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    blob_col: out_blobs,
                    "media_meta": [
                        {
                            "format": batch_format,
                            "width": width,
                            "height": height,
                            "duration_ms": 0,
                        }
                    ]
                    * len(pdf),
                }
            )

    return df.select(
        id_col,
        blob_col,
        F.col("media_meta.format").alias("__fmt"),
        F.col("media_meta.width").alias("__w"),
        F.col("media_meta.height").alias("__h"),
    ).mapInPandas(run, schema)


def sample_frames(
    df: DataFrame,
    every_ms: int,
    frame_ms: int = 40,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    batch_format: str = "fake/raw",
) -> DataFrame:
    """Video frame sampling as a ROW-EXPANDING mapInPandas: the blob is a
    concatenation of width×height frames at ``frame_ms`` per frame; emit
    one row per sampled frame (every ``every_ms``) with its timestamp and
    frame payload. The output-rows ≠ input-rows contract is the part a
    generator-style media operator actually needs from Spark; the frame
    slicing is real byte math, only bytes→pixels stays faked."""
    schema = (
        f"{id_col} long, frame_idx int, ts_ms int, frame binary"
    )
    stride = max(1, every_ms // frame_ms)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for f in pdf["__fmt"].unique():
                if f != batch_format:
                    decode_media(f)
            ids, idxs, tss, frames = [], [], [], []
            for rid, blob, w, h in zip(
                pdf[id_col], pdf[blob_col], pdf["__w"], pdf["__h"]
            ):
                if pd.isna(w) or pd.isna(h):
                    continue  # NULL metadata: no frame geometry, skip row
                fsize = int(w) * int(h)
                if not blob or fsize == 0:
                    continue
                n_frames = len(blob) // fsize
                for k in range(0, n_frames, stride):
                    ids.append(rid)
                    idxs.append(k)
                    tss.append(k * frame_ms)
                    frames.append(bytes(blob[k * fsize:(k + 1) * fsize]))
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "ts_ms": tss, "frame": frames}
            )

    return df.select(
        id_col,
        blob_col,
        F.col("media_meta.format").alias("__fmt"),
        F.col("media_meta.width").alias("__w"),
        F.col("media_meta.height").alias("__h"),
    ).mapInPandas(run, schema)
