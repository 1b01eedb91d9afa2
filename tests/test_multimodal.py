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
    with pytest.raises(NotImplementedError):
        resize_media(blobs, 64, 64)
