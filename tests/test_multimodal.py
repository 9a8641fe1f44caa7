"""Multimodal column convention tests: payload metadata, stubbed decode
via mapInPandas, frame sampling."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
import pytest

from polars_gdal_spark.functions.multimodal import (
    attach_payload_meta,
    decode_image,
    frame_sample,
)


@pytest.fixture(scope="module")
def payloads(spark):
    rows = [(i, bytes([i % 256]) * (100 + i)) for i in range(20)]
    return spark.createDataFrame(rows, "doc_id bigint, payload binary")


def test_attach_payload_meta(spark, payloads):
    df = attach_payload_meta(payloads, "payload", "image")
    row = df.where("doc_id = 3").first()
    meta = row["payload_meta"]
    assert meta["media_type"] == "image"
    assert meta["n_bytes"] == 103
    assert meta["sha256"] == hashlib.sha256(bytes([3]) * 103).hexdigest()


def test_decode_image_stub(spark, payloads):
    out = decode_image(payloads, "doc_id", "payload", codec="stub")
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        assert 16 <= r["width"] < 80 and 16 <= r["height"] < 80
        assert len(bytes(r["pixels"])) == r["width"] * r["height"]
    # deterministic: same payload → same decode
    again = {r["doc_id"]: (r["width"], r["height"]) for r in out.collect()}
    assert again == {r["doc_id"]: (r["width"], r["height"]) for r in rows}


def test_decode_image_real_codec_raises(spark, payloads):
    with pytest.raises(NotImplementedError):
        decode_image(payloads, codec="jpeg")


def test_frame_sample(spark):
    rows = [(1, b"x" * 640)]  # 10 pseudo-frames of 64 bytes
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = frame_sample(df, "doc_id", "payload", every_n=4).collect()
    assert [r["frame_no"] for r in out] == [0, 4, 8]
