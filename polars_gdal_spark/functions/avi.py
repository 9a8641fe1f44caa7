"""Minimal pure-stdlib AVI (RIFF) container codec.

Exists so the multimodal VIDEO path can exercise a real container
format end-to-end without ffmpeg: ``encode_avi`` wraps a list of
already-encoded frame payloads (e.g. PNG or JPEG bytes) into a
spec-shaped RIFF-AVI (``hdrl`` with ``avih``/``strh``/``strf``, a
``movi`` LIST of ``00dc`` compressed-frame chunks, and an ``idx1``
index), and ``decode_avi_frames`` walks the chunk structure back into
the ordered frame payloads. Frame CONTENTS stay opaque bytes — pair
with :mod:`polars_gdal_spark.functions.png` to decode them.

Layout per the public AVI RIFF specification (Microsoft "AVI RIFF File
Reference"): every chunk is <fourcc><uint32 size><data, even-padded>.
Not a general player: single video stream, no interleaved audio, no
OpenDML extensions — unsupported structure raises ValueError.
"""

from __future__ import annotations

import struct


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 10,
    codec: bytes = b"MPNG",
) -> bytes:
    """Wrap encoded frame payloads into a single-stream AVI container."""
    if not frames:
        raise ValueError("encode_avi needs at least one frame")
    max_bytes = max(len(f) for f in frames)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # dwMicroSecPerFrame
        0,                 # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x10,              # dwFlags: AVIF_HASINDEX
        len(frames),       # dwTotalFrames
        0,                 # dwInitialFrames
        1,                 # dwStreams
        max_bytes,         # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,        # dwReserved
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids",
        codec,
        0, 0, 0, 0,        # flags, priority, language, initial frames
        1,                 # dwScale
        fps,               # dwRate
        0,                 # dwStart
        len(frames),       # dwLength
        max_bytes,         # dwSuggestedBufferSize
        0xFFFFFFFF,        # dwQuality (-1 default)
        0,                 # dwSampleSize (0 = varying)
        0, 0, width, height,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, codec, width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_chunks = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_chunks)
    # idx1: one entry per frame, offsets relative to the movi list type
    idx_entries = []
    off = 4  # past the 'movi' fourcc
    for f in frames:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_frames(data: bytes) -> list[bytes]:
    """AVI bytes -> ordered list of frame payloads (``00dc``/``00db``)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI: bad RIFF header")
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            fourcc = data[pos : pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body_start = pos + 8
            if body_start + size > len(data):
                raise ValueError("truncated AVI chunk")
            if fourcc == b"LIST":
                walk(body_start + 4, body_start + size)
            elif fourcc in (b"00dc", b"00db"):
                frames.append(data[body_start : body_start + size])
            pos = body_start + size + (size % 2)

    walk(12, len(data))
    if not frames:
        raise ValueError("AVI contains no video frame chunks")
    return frames
