"""Multimodal plumbing: binary schema, Arrow mapInPandas decode,
deterministic fake decoder, resize metadata, stubbed real decoder."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flechasdb_spark.operators.multimodal import (
    FEATURE_DIM,
    attach_payload,
    decode_image,
    resize_meta,
    sample_frames,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return attach_payload(docs).cache()


def test_payload_schema_is_binary(media):
    field = dict(zip(media.schema.names, media.schema.fields))["payload"]
    assert field.dataType.simpleString() == "binary"
    meta = dict(zip(media.schema.names, media.schema.fields))["media_meta"]
    assert meta.dataType.simpleString() == "struct<n_bytes:bigint,format:string>"


def test_decode_image_shape_and_determinism(media):
    d1 = decode_image(media).toPandas().sort_values("doc_id").reset_index(drop=True)
    d2 = decode_image(media).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert d1.equals(d2)  # deterministic
    assert len(d1) == media.count()
    assert all(len(f) == FEATURE_DIM for f in d1["features"])
    assert ((d1["width"] >= 32) & (d1["width"] < 256)).all()
    assert ((d1["height"] >= 32) & (d1["height"] < 256)).all()


def test_real_decoder_is_stubbed(media):
    with pytest.raises(NotImplementedError):
        decode_image(media, fake=False)


def test_resize_meta(media):
    decoded = decode_image(media)
    out = resize_meta(decoded, 224, 224).toPandas()
    assert (out["out_width"] == 224).all()
    assert (out["scale_x"] > 0).all()


def test_sample_frames_stride(media):
    out = sample_frames(media, every_k=8).toPandas()
    # every sampled index is a multiple of the stride and < n_frames
    assert (out["frame_idx"] % 8 == 0).all()
    assert (out["frame_idx"] < out["n_frames"]).all()
    assert (out["frame_pos"] == out["frame_idx"] // 8).all()
