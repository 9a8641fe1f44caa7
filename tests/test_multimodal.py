"""Multimodal column convention tests: payload metadata, stubbed decode
via mapInPandas, frame sampling."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
import pytest

from polars_gdal_spark.functions.multimodal import (
    attach_payload_meta,
    decode_image,
    extract_features,
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


def test_png_codec_roundtrip_unit():
    """Vendored PNG codec: encode->decode round-trips RGB and RGBA pixel
    buffers byte-exactly (pure unit test, no Spark)."""
    from polars_gdal_spark.functions.png import decode_png, encode_png

    w, h = 7, 5
    rgb = bytes((x * 13 + y * 7 + c * 31) % 256
                for y in range(h) for x in range(w) for c in range(3))
    out = decode_png(encode_png(w, h, rgb, channels=3))
    assert out == (w, h, 3, rgb)

    rgba = bytes((x + y + c) % 256
                 for y in range(h) for x in range(w) for c in range(4))
    assert decode_png(encode_png(w, h, rgba, channels=4)) == (w, h, 4, rgba)


def test_png_codec_decodes_filtered_scanlines():
    """Decode must handle all five PNG scanline filters: re-compress the
    raw stream with each filter type applied and check identical pixels."""
    import struct
    import zlib

    from polars_gdal_spark.functions.png import decode_png, encode_png

    w, h = 6, 5
    rgb = bytes((x * 29 + y * 17 + c * 11) % 256
                for y in range(h) for x in range(w) for c in range(3))
    stride = w * 3

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    for ftype in (0, 1, 2, 3, 4):
        rows = []
        prev = bytes(stride)
        for y in range(h):
            line = rgb[y * stride:(y + 1) * stride]
            enc = bytearray(line)
            for i in range(stride):
                a = line[i - 3] if i >= 3 else 0
                b = prev[i]
                c = prev[i - 3] if i >= 3 else 0
                if ftype == 1:
                    enc[i] = (line[i] - a) & 0xFF
                elif ftype == 2:
                    enc[i] = (line[i] - b) & 0xFF
                elif ftype == 3:
                    enc[i] = (line[i] - ((a + b) >> 1)) & 0xFF
                elif ftype == 4:
                    enc[i] = (line[i] - paeth(a, b, c)) & 0xFF
            rows.append(bytes([ftype]) + bytes(enc))
            prev = line
        base = encode_png(w, h, rgb)
        sig, ihdr = base[:8], base[8:8 + 25]
        idat_body = zlib.compress(b"".join(rows))
        idat = (struct.pack(">I", len(idat_body)) + b"IDAT" + idat_body
                + struct.pack(">I", zlib.crc32(b"IDAT" + idat_body)))
        iend = struct.pack(">I", 0) + b"IEND" + struct.pack(
            ">I", zlib.crc32(b"IEND"))
        assert decode_png(sig + ihdr + idat + iend) == (w, h, 3, rgb), ftype


def test_decode_image_png_real_bytes(spark):
    """REAL image bytes through the public decode_image API — runs in
    every environment (vendored codec, no Pillow needed). RGBA input
    checks the alpha-drop -> RGB normalization too."""
    from polars_gdal_spark.functions.png import encode_png

    rgb = bytes([10, 20, 30]) * 15          # 5x3 solid
    rgba = bytes([1, 2, 3, 255]) * 8        # 4x2 solid + alpha
    df = spark.createDataFrame(
        [(1, encode_png(5, 3, rgb)), (2, encode_png(4, 2, rgba, channels=4))],
        "doc_id bigint, payload binary",
    )
    rows = {r["doc_id"]: r for r in decode_image(df, codec="png").collect()}
    assert (rows[1]["width"], rows[1]["height"]) == (5, 3)
    assert bytes(rows[1]["pixels"]) == rgb
    assert (rows[2]["width"], rows[2]["height"]) == (4, 2)
    assert bytes(rows[2]["pixels"]) == bytes([1, 2, 3]) * 8


def test_decode_image_png_feeds_feature_extraction(spark):
    """End-to-end multimodal hot path on real bytes: PNG decode ->
    byte-histogram features, all executor-side."""
    from polars_gdal_spark.functions.png import encode_png

    px = bytes(range(0, 240))  # 80 RGB pixels, uniform 0..239
    df = spark.createDataFrame(
        [(7, encode_png(8, 10, px))], "doc_id bigint, payload binary"
    )
    feats = extract_features(decode_image(df, codec="png"), bins=8).collect()
    assert len(feats) == 1
    vec = feats[0]["embedding"]
    assert len(vec) == 8
    assert abs(sum(vec) - 1.0) < 1e-6
    # bytes 0..239 hit bins 0..7 with 32 bytes each except bin 7 (16)
    assert all(abs(v - 32 / 240) < 1e-6 for v in vec[:7])


def test_wav_codec_roundtrip_unit():
    from polars_gdal_spark.functions.multimodal import encode_wav

    import io
    import wave

    samples = bytes(range(200))
    wav = encode_wav(samples, sample_rate=8000)
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    with wave.open(io.BytesIO(wav), "rb") as w:
        assert (w.getnchannels(), w.getsampwidth(), w.getframerate()) == (
            1, 1, 8000,
        )
        assert w.readframes(w.getnframes()) == samples


def test_decode_audio_real_wav(spark):
    from polars_gdal_spark.functions.multimodal import decode_audio, encode_wav

    samples = bytes((i * 7) % 256 for i in range(300))
    df = spark.createDataFrame(
        [(5, encode_wav(samples, 16000))], "doc_id bigint, payload binary"
    )
    row = decode_audio(df).collect()[0]
    assert row["sample_rate"] == 16000
    assert row["n_samples"] == 300
    assert bytes(row["samples"]) == samples


def test_decode_audio_unknown_codec_raises(spark):
    from polars_gdal_spark.functions.multimodal import decode_audio

    df = spark.createDataFrame([(1, b"x")], "doc_id bigint, payload binary")
    with pytest.raises(NotImplementedError, match="wav"):
        decode_audio(df, codec="mp3")


def test_avi_codec_roundtrip_unit():
    from polars_gdal_spark.functions.avi import decode_avi_frames, encode_avi

    frames = [bytes([i]) * (10 + i) for i in range(5)]  # odd+even sizes
    avi = encode_avi(frames, width=8, height=10, fps=5)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    assert decode_avi_frames(avi) == frames


def test_avi_rejects_garbage():
    import pytest as _pytest

    from polars_gdal_spark.functions.avi import decode_avi_frames

    with _pytest.raises(ValueError, match="RIFF"):
        decode_avi_frames(b"not an avi at all")


def test_decode_video_frames_real_container_to_real_pixels(spark):
    """Full video pipeline on real bytes: PNG frames inside a real AVI
    container -> distributed demux (every 2nd frame) -> PNG decode ->
    exact pixels."""
    from polars_gdal_spark.functions.avi import encode_avi
    from polars_gdal_spark.functions.multimodal import decode_video_frames
    from polars_gdal_spark.functions.png import encode_png

    pix = [bytes([30 * k % 256] * (4 * 2 * 3)) for k in range(5)]
    frames = [encode_png(4, 2, p) for p in pix]
    df = spark.createDataFrame(
        [(9, encode_avi(frames, 4, 2))], "doc_id bigint, payload binary"
    )
    demuxed = decode_video_frames(df, every_n=2)
    rows = {r["frame_no"]: bytes(r["frame"]) for r in demuxed.collect()}
    assert sorted(rows) == [0, 2, 4]
    assert rows[2] == frames[2]
    # decode the sampled frames through the image path
    sampled = demuxed.select(
        F.col("frame_no").cast("bigint").alias("doc_id"),
        F.col("frame").alias("payload"),
    )
    decoded = {
        r["doc_id"]: bytes(r["pixels"])
        for r in decode_image(sampled, codec="png").collect()
    }
    assert decoded == {0: pix[0], 2: pix[2], 4: pix[4]}


def test_audio_features_frames(spark):
    """Frame energy + zero crossings over a decoded real WAV: square wave
    -> known exact energy and crossing count per frame."""
    from polars_gdal_spark.functions.multimodal import (
        audio_features,
        decode_audio,
        encode_wav,
    )

    # 1000 samples alternating 128+50 / 128-50 every 10 samples
    samples = bytes(
        (128 + 50) if (i // 10) % 2 == 0 else (128 - 50)
        for i in range(1000)
    )
    df = spark.createDataFrame(
        [(1, encode_wav(samples))], "doc_id bigint, payload binary"
    )
    feats = audio_features(decode_audio(df), frame_size=400).collect()
    by_frame = {r["frame_no"]: r for r in feats}
    assert sorted(by_frame) == [0, 1, 2]
    assert by_frame[0]["n"] == 400 and by_frame[2]["n"] == 200
    # every sample is +/-50 -> energy = n * 2500 exactly
    assert by_frame[0]["energy"] == 400 * 2500
    assert by_frame[2]["energy"] == 200 * 2500
    # sign flips every 10 samples -> 39 crossings in 400, 19 in 200
    assert by_frame[0]["zero_crossings"] == 39
    assert by_frame[2]["zero_crossings"] == 19


def test_png_codec_rejects_corrupt_chunks():
    """A flipped byte inside a chunk must fail the CRC check loudly,
    never decode to garbage pixels."""
    from polars_gdal_spark.functions.png import decode_png, encode_png

    good = encode_png(6, 4, bytes(range(6 * 4 * 3)))
    assert decode_png(good)[3] == bytes(range(72))  # sanity
    for flip_at in (20, len(good) // 2, len(good) - 20):
        bad = bytearray(good)
        bad[flip_at] ^= 0xFF
        with pytest.raises(ValueError, match="CRC|truncated|PNG"):
            decode_png(bytes(bad))


def test_audio_features_16bit(spark):
    """16-bit WAVs must produce correct (not silently-garbage) features:
    sample_width rides along from decode_audio and selects the signed
    little-endian int16 interpretation."""
    import io
    import wave

    import numpy as np

    from polars_gdal_spark.functions.multimodal import (
        audio_features,
        decode_audio,
    )

    # square wave +/-1000 every 10 samples, 16-bit signed LE
    sig = np.where((np.arange(1000) // 10) % 2 == 0, 1000, -1000).astype(
        "<i2"
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(sig.tobytes())
    df = spark.createDataFrame(
        [(7, buf.getvalue())], "doc_id bigint, payload binary"
    )
    decoded = decode_audio(df)
    assert [r["sample_width"] for r in decoded.select("sample_width").collect()] == [2]
    feats = {r["frame_no"]: r for r in audio_features(decoded, frame_size=400).collect()}
    assert feats[0]["energy"] == 400 * 1000 * 1000
    assert feats[0]["zero_crossings"] == 39
    assert feats[2]["n"] == 200 and feats[2]["energy"] == 200 * 1000 * 1000


def test_scene_cuts_non_ascii_text_matches_oracle(spark, tmp_path):
    """Non-ASCII document text must not desync the Spark byte slicing
    from the oracle's per-character arithmetic: both sides sanitize to
    '?' first, so multi-byte codepoints can't shift frame content."""
    import os
    import shutil

    import duckdb

    from polars_gdal_spark.queries import QUERIES, TABLE_NAMES

    src = "/root/testdata/sf0.001"
    for t in TABLE_NAMES:
        if t == "documents":
            continue
        p = f"{src}/{t}.parquet"
        if os.path.isdir(p):
            shutil.copytree(p, tmp_path / f"{t}.parquet")
        else:
            shutil.copy(p, tmp_path / f"{t}.parquet")
    docs = spark.createDataFrame(
        [
            (1, "héllo wörld " * 30),       # 2-byte codepoints
            (2, "日本語のテキスト " * 20),   # 3-byte codepoints
            (3, "plain ascii text " * 30),
        ],
        "doc_id bigint, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))

    spec = QUERIES["multimodal_scene_cuts"]
    got = {
        (r["doc"], r["frame_no"]): (r["l1_delta"], r["is_cut"])
        for r in spec.func(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    want = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(spec.oracle).fetchall()
    }
    assert got == want and len(got) == 6
