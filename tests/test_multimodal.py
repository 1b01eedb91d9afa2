"""Multimodal binary-column plumbing (decode stubbed, pipeline real)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from simtradedata_spark.catalog import load_table
from simtradedata_spark.operators.multimodal import (
    attach_blob_from_text,
    extract_features,
    fake_decode_features,
    resize_media,
)


def test_feature_extraction_schema_and_determinism(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    blobs = attach_blob_from_text(docs, "doc_id", "text")
    feats = extract_features(blobs)
    assert feats.schema.simpleString() == (
        "struct<doc_id:bigint,feature:array<float>,n_bytes:int>"
    )
    a = feats.orderBy("doc_id").limit(5).toPandas()
    b = extract_features(blobs.repartition(7)).orderBy("doc_id").limit(5).toPandas()
    for x, y in zip(a.feature, b.feature):
        assert np.allclose(x, y)
    assert (a.n_bytes > 0).all()
    # features are L1-normalized histograms
    for x in a.feature:
        assert abs(sum(x) - 1.0) < 1e-5


def test_feature_matches_local_oracle(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(3)
    pdf = docs.toPandas()
    blobs = attach_blob_from_text(docs, "doc_id", "text")
    got = {r["doc_id"]: r["feature"] for r in extract_features(blobs).collect()}
    for _, row in pdf.iterrows():
        expect = fake_decode_features(row.text.encode("utf-8"))
        assert np.allclose(got[row.doc_id], expect)


def test_real_codec_raises(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(2)
    blobs = attach_blob_from_text(docs, "doc_id", "text").withColumn(
        "media_meta",
        F.struct(
            F.lit("image/png").alias("format"),
            F.lit(1).alias("width"),
            F.lit(1).alias("height"),
            F.lit(0).alias("duration_ms"),
        ),
    )
    with pytest.raises(Exception, match="no codec"):
        extract_features(blobs).collect()
    # resize is now implemented (fake decode + real resampling); a real
    # format must still fail loudly AT EXECUTION, inside the batch
    with pytest.raises(Exception, match="no codec"):
        resize_media(blobs, 64, 64).collect()


def test_resize_media_nearest_neighbor(spark):
    """Resize runs real nearest-neighbor math on the fake-decoded plane:
    a 4x4 gradient downsampled to 2x2 picks the exact source pixels."""
    import numpy as np

    from simtradedata_spark.operators.multimodal import resize_media

    src = np.arange(16, dtype=np.uint8).reshape(4, 4)
    df = spark.createDataFrame(
        [(1, bytearray(src.tobytes()), ("fake/raw", 4, 4, 0))],
        "doc_id long, blob binary, media_meta struct<format:string,width:int,height:int,duration_ms:int>",
    )
    out = resize_media(df, width=2, height=2).collect()
    assert len(out) == 1
    got = np.frombuffer(bytes(out[0]["blob"]), dtype=np.uint8).reshape(2, 2)
    # nearest-neighbor with floor mapping: rows 0,2 cols 0,2
    assert got.tolist() == [[0, 2], [8, 10]]
    meta = out[0]["media_meta"]
    assert (meta["width"], meta["height"]) == (2, 2)


def test_sample_frames_row_expansion(spark):
    """Frame sampling expands rows: a 6-frame 2x2 'video' sampled every
    other frame yields frames 0, 2, 4 with correct timestamps and exact
    payload slices; a real format fails loudly."""
    import numpy as np
    import pytest

    from simtradedata_spark.operators.multimodal import sample_frames

    frames = [np.full((2, 2), k, dtype=np.uint8) for k in range(6)]
    blob = b"".join(f.tobytes() for f in frames)
    df = spark.createDataFrame(
        [(7, bytearray(blob), ("fake/raw", 2, 2, 240))],
        "doc_id long, blob binary, media_meta struct<format:string,width:int,height:int,duration_ms:int>",
    )
    got = {
        r["frame_idx"]: r
        for r in sample_frames(df, every_ms=80, frame_ms=40).collect()
    }
    assert set(got) == {0, 2, 4}
    assert got[2]["ts_ms"] == 80
    assert bytes(got[4]["frame"]) == frames[4].tobytes()

    real = df.withColumn(
        "media_meta",
        F.struct(
            F.lit("video/mp4").alias("format"),
            F.lit(2).alias("width"),
            F.lit(2).alias("height"),
            F.lit(240).alias("duration_ms"),
        ),
    )
    with pytest.raises(Exception, match="no codec"):
        sample_frames(real, every_ms=80).collect()
