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


def test_resize_and_extract_features(spark):
    """resize: exact nearest-neighbour dims + bytes; features: L1-normed
    byte histogram feeds straight into the similarity operators."""
    import pyspark.sql.functions as F

    from polars_gdal_spark.functions import similarity as S
    from polars_gdal_spark.functions.multimodal import (
        decode_image,
        extract_features,
        resize_image,
    )

    df = spark.createDataFrame(
        [(i, bytes([i * 7 % 251]) * (100 + i)) for i in range(6)],
        "doc_id bigint, payload binary",
    )
    decoded = decode_image(df)
    resized = resize_image(decoded, 8, 8)
    rows = resized.collect()
    assert all(r["width"] == 8 and r["height"] == 8 for r in rows)
    assert all(len(bytes(r["pixels"])) == 64 for r in rows)

    feats = extract_features(decoded)
    got = feats.collect()
    assert all(len(r["embedding"]) == 8 for r in got)
    assert all(abs(sum(r["embedding"]) - 1.0) < 1e-6 for r in got)

    # features plug into the similarity surface unchanged
    pairs = S.pairwise_cosine(
        feats.withColumn("label", F.lit(1)),
        id_col="doc_id",
        group_col="label",
        threshold=-1.0,
    )
    assert pairs.count() == 15  # 6 choose 2


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_decode_image_pil_raises_cleanly_without_pillow(spark, payloads):
    if _pil_available():
        pytest.skip("Pillow installed: the raise-path doesn't apply")
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_image(payloads, codec="pil")


@pytest.mark.skipif(not _pil_available(), reason="Pillow not installed")
def test_decode_image_pil_real_png(spark):
    """Real codec path: decode a generated PNG through codec='pil' and
    check exact dimensions + raw RGB bytes."""
    import io

    from PIL import Image

    img = Image.new("RGB", (5, 3), (10, 20, 30))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, buf.getvalue())], "doc_id bigint, payload binary"
    )
    out = decode_image(df, codec="pil").collect()[0]
    assert (out["width"], out["height"]) == (5, 3)
    assert bytes(out["pixels"]) == bytes([10, 20, 30]) * 15
