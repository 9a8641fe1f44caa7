"""Multimodal column conventions: image/audio/video as opaque binary.

The convention generalizes the engine's geometry-as-WKB design (reference
``src/lib.rs:390-393``): a modality is a ``binary`` payload column plus a
typed metadata struct — schema-first, so Catalyst can prune/pushdown
around payloads it never decodes.

Decode/resize/frame-sample run as Arrow-batched functions over
``mapInPandas`` so the payload bytes never pass through row-at-a-time
Python. Real-codec paths that need no external library: ``decode_image``
(``codec='png'`` — vendored pure-stdlib PNG, :mod:`.png`) and
``decode_audio`` (``codec='wav'`` — stdlib RIFF/PCM). Optional-library
paths (``codec='pil'``) probe their import on the driver and fail fast
with NotImplementedError when absent; the deterministic ``stub`` codec
remains for plumbing tests.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Metadata struct carried next to every payload column.
MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),  # image/audio/video
        StructField("codec", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
    ]
)


def attach_payload_meta(
    df: DataFrame, payload_col: str, media_type: str, codec: str = "raw"
) -> DataFrame:
    """Append the metadata struct computed JVM-side (no Python in the path:
    length + sha2 are built-ins)."""
    p = F.col(payload_col)
    return df.withColumn(
        f"{payload_col}_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(codec).alias("codec"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(p).cast("bigint").alias("n_bytes"),
            F.lower(F.sha2(p, 256)).alias("sha256"),
        ),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, bytes]:
    """Deterministic fake image decode: 'dimensions' and 'pixels' derived
    from the payload digest — stands in for PIL until codecs exist."""
    d = hashlib.sha256(payload).digest()
    w, h = 16 + d[0] % 64, 16 + d[1] % 64
    return w, h, (d * ((w * h) // len(d) + 1))[: w * h]


DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("pixels", BinaryType()),
    ]
)


def decode_image(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    codec: str = "stub",
) -> DataFrame:
    """Distributed image decode via mapInPandas (Arrow batches).

    ``codec='stub'`` uses the deterministic fake. ``codec='png'``
    decodes real PNG bytes (8-bit RGB/RGBA) through the vendored
    pure-stdlib codec in :mod:`polars_gdal_spark.functions.png` — no
    external library, so the real-bytes path runs everywhere.
    ``codec='pil'`` decodes any format Pillow handles when it is
    importable — the import is probed on the driver so a missing
    library fails fast with a clear NotImplementedError instead of
    per-task executor errors; the decode itself runs executor-side per
    Arrow batch. Output pixels are raw RGB bytes (width*height*3). The
    Spark-side contract (schema, batch iteration, no driver collect) is
    identical for all codecs, so pipelines built on the stub run
    unchanged where real codecs exist.
    """
    if codec == "pil":
        try:
            import PIL  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "image codec 'pil' requires Pillow, which is not "
                "installed in this environment; use codec='png' for "
                "real PNG bytes or 'stub' for the deterministic fake"
            ) from e
    elif codec not in ("stub", "png"):
        raise NotImplementedError(
            f"image codec {codec!r} is not supported; use 'pil' "
            "(requires Pillow), 'png' (vendored pure-Python PNG "
            "decode), or 'stub' (deterministic fake)"
        )

    def decode_one(payload: bytes) -> tuple[int, int, bytes]:
        if codec == "pil":
            import io

            from PIL import Image

            img = Image.open(io.BytesIO(payload)).convert("RGB")
            return img.width, img.height, img.tobytes()
        if codec == "png":
            from polars_gdal_spark.functions.png import decode_png

            w, h, ch, px = decode_png(payload)
            if ch == 4:  # drop alpha -> RGB, matching the pil path
                import numpy as np

                px = (
                    np.frombuffer(px, np.uint8)
                    .reshape(-1, 4)[:, :3]
                    .tobytes()
                )
            return w, h, px
        return _fake_decode(payload)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "width": [], "height": [], "pixels": []}
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, px = decode_one(bytes(payload))
                out["doc_id"].append(i)
                out["width"].append(w)
                out["height"].append(h)
                out["pixels"].append(px)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(batches, DECODED_SCHEMA)


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n: int = 16,
) -> DataFrame:
    """'Video' frame sampling over the stub codec: chunk the payload into
    fixed-size pseudo-frames and keep every ``every_n``-th — exercises the
    explode-to-frames shape (one row per sampled frame) with zero Python
    (pure JVM expressions). For REAL containers use
    :func:`decode_video_frames`, which demuxes AVI payloads."""
    frames = F.filter(
        F.transform(
            F.sequence(
                F.lit(0), F.greatest(F.ceil(F.length(payload_col) / 64) - 1, F.lit(0))
            ),
            lambda i: F.struct(
                i.alias("frame_no"),
                F.substring(
                    F.col(payload_col).cast("string"), (i * 64 + 1).cast("int"), 64
                ).alias("frame"),
            ),
        ),
        lambda s: s["frame_no"] % every_n == 0,
    )
    return df.select(
        F.col(id_col), F.explode(frames).alias("f")
    ).select(id_col, F.col("f.frame_no").alias("frame_no"), F.col("f.frame").alias("frame"))


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("pixels", BinaryType()),
    ]
)


def resize_image(
    decoded: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Nearest-neighbour resize over decoded pixel buffers (the stub
    codec's w×h byte raster) via mapInPandas — same batch shape a real
    PIL/torchvision resize would use. Deterministic: output pixel (x,y)
    samples input (x*w//out_w, y*h//out_h)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "width": [], "height": [], "pixels": []}
            for i, w, h, px in zip(
                pdf[id_col], pdf["width"], pdf["height"], pdf["pixels"]
            ):
                px = bytes(px)
                resized = bytes(
                    px[(y * h // out_h) * w + (x * w // out_w)]
                    for y in range(out_h)
                    for x in range(out_w)
                )
                out["doc_id"].append(i)
                out["width"].append(out_w)
                out["height"].append(out_h)
                out["pixels"].append(resized)
            yield pd.DataFrame(out)

    return decoded.mapInPandas(batches, RESIZED_SCHEMA)


def extract_features(
    decoded: DataFrame, bins: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Byte-histogram feature vector (``bins`` buckets, L1-normalized)
    per decoded image — the feature-extraction stage shape: Arrow batch
    in, fixed-width embedding out, ready for the similarity operators
    (knn_join / pairwise_cosine take its output directly)."""
    import numpy as np

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, vecs = [], []
            for i, px in zip(pdf[id_col], pdf["pixels"]):
                arr = np.frombuffer(bytes(px), dtype=np.uint8)
                hist = np.bincount(arr // (256 // bins), minlength=bins)
                vecs.append(
                    (hist / max(1, len(arr))).astype(np.float32).tolist()
                )
                ids.append(i)
            yield pd.DataFrame({"doc_id": ids, "embedding": vecs})

    return decoded.select(id_col, "pixels").mapInPandas(batches, schema)


DECODED_AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("sample_width", IntegerType()),  # bytes per sample
        StructField("n_samples", LongType()),
        StructField("samples", BinaryType()),
    ]
)


def encode_wav(samples: bytes, sample_rate: int = 8000) -> bytes:
    """8-bit unsigned mono PCM -> RIFF/WAVE bytes (stdlib ``wave``)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(sample_rate)
        w.writeframes(samples)
    return buf.getvalue()


def decode_audio(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    codec: str = "wav",
) -> DataFrame:
    """Distributed audio decode via mapInPandas (Arrow batches) — the
    audio twin of :func:`decode_image`. ``codec='wav'`` parses real
    RIFF/WAVE containers with the stdlib ``wave`` module (8/16-bit PCM;
    no external library, runs everywhere). Output rows carry the PCM
    payload (``samples``) plus typed metadata; feature extractors
    (energy, zero-crossings, framing) consume them batch-wise without
    any driver collect."""
    if codec != "wav":
        raise NotImplementedError(
            f"audio codec {codec!r} is not supported; 'wav' (stdlib "
            "RIFF/PCM) is the built-in real-codec path"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        for pdf in it:
            out = {
                "doc_id": [], "sample_rate": [], "sample_width": [],
                "n_samples": [], "samples": [],
            }
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    out["doc_id"].append(i)
                    out["sample_rate"].append(w.getframerate())
                    out["sample_width"].append(w.getsampwidth())
                    out["n_samples"].append(w.getnframes())
                    out["samples"].append(w.readframes(w.getnframes()))
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        batches, DECODED_AUDIO_SCHEMA
    )


VIDEO_FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def decode_video_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n: int = 1,
) -> DataFrame:
    """Distributed video-container demux via mapInPandas: parse each
    real AVI (RIFF) payload into one row per kept frame —
    ``(doc_id, frame_no, frame)`` with the frame payload opaque bytes
    (PNG/JPEG as stored; chain :func:`decode_image` to decode them).
    ``every_n`` keeps every n-th frame (frame sampling happens during
    demux so dropped frames never cross the Arrow boundary). The video
    twin of :func:`decode_image`/:func:`decode_audio` — stdlib-only
    container parsing (:mod:`polars_gdal_spark.functions.avi`)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from polars_gdal_spark.functions.avi import decode_avi_frames

        for pdf in it:
            out = {"doc_id": [], "frame_no": [], "frame": []}
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                for n, fr in enumerate(decode_avi_frames(bytes(payload))):
                    if n % every_n:
                        continue
                    out["doc_id"].append(i)
                    out["frame_no"].append(n)
                    out["frame"].append(fr)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        batches, VIDEO_FRAMES_SCHEMA
    )


def audio_features(
    decoded: DataFrame,
    frame_size: int = 400,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame-level audio features over decoded PCM
    (:func:`decode_audio` output): per non-overlapping frame of
    ``frame_size`` samples, the signal energy Σs² of the zero-centered
    samples and the zero-crossing count (sign changes, skipping exact
    zeros) — the classic cheap speech/music/silence discriminators.
    Sample width comes from the decoded rows (``sample_width``):
    1 → unsigned 8-bit, centered by −128; 2 → signed little-endian
    16-bit (already centered); anything else raises loudly rather than
    producing garbage features. Integer-exact (no transcendentals),
    vectorized numpy per Arrow batch, one output row per frame; the
    trailing partial frame is kept with its actual length."""
    import numpy as np

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_no", IntegerType()),
            StructField("n", IntegerType()),
            StructField("energy", LongType()),
            StructField("zero_crossings", IntegerType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "frame_no": [], "n": [],
                "energy": [], "zero_crossings": [],
            }
            for i, raw, width in zip(
                pdf[id_col], pdf["samples"], pdf["sample_width"]
            ):
                if width == 1:
                    arr = np.frombuffer(bytes(raw), np.uint8).astype(
                        np.int64
                    ) - 128
                elif width == 2:
                    arr = np.frombuffer(
                        bytes(raw), np.dtype("<i2")
                    ).astype(np.int64)
                else:
                    raise NotImplementedError(
                        f"audio_features supports 8/16-bit PCM, got "
                        f"sample_width={width} for doc_id={i}"
                    )
                for fno in range(0, max(1, len(arr)), frame_size):
                    fr = arr[fno : fno + frame_size]
                    if not len(fr):
                        break
                    sgn = np.sign(fr[fr != 0])
                    out["doc_id"].append(i)
                    out["frame_no"].append(fno // frame_size)
                    out["n"].append(len(fr))
                    out["energy"].append(int((fr * fr).sum()))
                    out["zero_crossings"].append(
                        int((np.diff(sgn) != 0).sum()) if len(sgn) else 0
                    )
            yield pd.DataFrame(out)

    return decoded.select(id_col, "samples", "sample_width").mapInPandas(
        batches, schema
    )


def image_ahash(
    decoded: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint of decoded images —
    the image twin of text MinHash: per pixel, integer grayscale
    (r+g+b)//3; bit_i = 1 iff gray_i·n_px > Σgray (the exact-integer
    form of "above the mean", no float division); bits pack into two
    BIGINTs (lo = pixels 0..31, hi = 32..63 for an 8×8 input) so the
    hash is engine-reproducible and join-able — equal hashes = visually
    identical images regardless of byte-level encoding differences.

    Runs as one vectorized mapInPandas over the decoded pixel batches
    (no shuffle); dedup is then a plain groupBy on (hash_hi, hash_lo).
    Input is :func:`decode_image` output (doc_id, width, height,
    pixels)."""
    import numpy as np

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            lo = np.zeros(len(pdf), dtype=np.int64)
            hi = np.zeros(len(pdf), dtype=np.int64)
            for r, px in enumerate(pdf["pixels"]):
                a = np.frombuffer(bytes(px), dtype=np.uint8).astype(np.int64)
                gray = a.reshape(-1, 3).sum(axis=1) // 3
                n = len(gray)
                if n > 64:
                    # two BIGINTs hold exactly 64 bits; beyond that the
                    # %32 shifts wrap and distinct images silently
                    # collide (false dedup merges). Fail loudly instead
                    # (the audio_features sample-width idiom).
                    raise ValueError(
                        f"image_ahash: image has {n} pixels; the 64-bit "
                        "hash requires <= 64 (resize to 8x8 with "
                        "resize_image first)"
                    )
                bits = (gray * n > gray.sum()).astype(np.int64)
                w = np.left_shift(bits, np.arange(n) % 32)
                lo[r] = int(w[np.arange(n) < 32].sum())
                hi[r] = int(w[np.arange(n) >= 32].sum())
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "hash_lo": lo,
                    "hash_hi": hi,
                }
            )

    schema = f"{id_col} {dict(decoded.dtypes)[id_col]}, " \
             "hash_lo bigint, hash_hi bigint"
    return decoded.select(id_col, "pixels").mapInPandas(kernel, schema)
