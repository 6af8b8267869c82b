"""MJPEG-in-AVI codec: a RIFF container walk that makes VIDEO FRAME
decode real for one format, using only codecs this engine already owns.

The mp4 story is honest but partial: ``multimodal.parse_mp4_metadata``
parses the ISO-BMFF container for real, while FRAME decode stays a
declared stub (H.264 entropy decoding is out of scope for a from-
scratch tier). Motion-JPEG AVI is the format where the boundary can be
closed completely with no new math: the container is RIFF (little-
endian chunk walk, public spec: Microsoft AVI RIFF form), and every
frame payload is a standalone baseline JPEG — which ``functions/
jpeg.py`` already decodes from scratch. Legacy camera uploads and
scientific capture rigs still emit this on the open web.

* ``parse_avi_metadata`` — 'avih' main header (dims, frame count,
  microseconds/frame) + stream-list count; pure struct, no ffmpeg;
* ``decode_avi_frames`` — walks 'movi' for ``..db``/``..dc`` chunks
  (uncompressed/compressed video frame payloads) and yields decoded
  RGB arrays via the engine's own JPEG codec;
* ``encode_avi_mjpeg`` — fixture writer: wraps per-frame
  ``encode_jpeg`` payloads in a minimal-but-conformant RIFF tree
  (hdrl/avih/strl/strh/strf + movi), so the decoder is testable
  without external tools, same posture as the gif/jpeg/png codecs.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np

_US = 1_000_000


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(listtype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", listtype + body)


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """uint8 (h, w, 3) frames → MJPEG AVI bytes (all frames same size)."""
    from .jpeg import encode_jpeg

    if not frames:
        raise ValueError("avi encoder: no frames")
    h, w = frames[0].shape[:2]
    payloads = []
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("avi encoder: frame size mismatch")
        payloads.append(encode_jpeg(f))
    avih = struct.pack(
        "<14I",
        _US // fps,          # microseconds per frame
        0, 0, 0x10,          # max bytes/sec, padding, flags (HASINDEX off)
        len(payloads), 0, 1, 0,  # total frames, initial, streams, bufsize
        w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sI2H8I4h",
        b"vids", b"MJPG", 0, 0, 0,
        0, 1, fps,           # initial frames, scale, rate → fps
        0, len(payloads), 0, 0xFFFFFFFF, 0,
        0, 0, w & 0x7FFF, h & 0x7FFF,
    )
    strf = struct.pack(
        "<I2i2H2I2i2I",
        40, w, h, 1, 24, 0x47504A4D,  # BITMAPINFOHEADER, biCompression 'MJPG'
        w * h * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", p) for p in payloads))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk(buf: bytes, lo: int, hi: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (fourcc, body_lo, body_hi) for chunks in [lo, hi)."""
    pos = lo
    while pos + 8 <= hi:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body_lo = pos + 8
        body_hi = body_lo + size
        if body_hi > hi:
            raise ValueError("avi: chunk overruns container")
        yield fourcc, body_lo, body_hi
        pos = body_hi + (size & 1)


def parse_avi_metadata(payload: bytes) -> dict:
    """AVI bytes → {duration_ms, width, height, n_streams, n_frames}."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("avi: bad RIFF/AVI signature")
    meta: dict = {}
    for fourcc, lo, hi in _walk(payload, 12, len(payload)):
        if fourcc == b"LIST" and payload[lo : lo + 4] == b"hdrl":
            for c2, l2, h2 in _walk(payload, lo + 4, hi):
                if c2 == b"avih":
                    (
                        us_per_frame, _mbs, _pad, _flags, n_frames,
                        _init, n_streams, _buf, w, h,
                    ) = struct.unpack_from("<10I", payload, l2)
                    meta = {
                        "duration_ms": us_per_frame * n_frames // 1000,
                        "width": w,
                        "height": h,
                        "n_streams": n_streams,
                        "n_frames": n_frames,
                    }
    if not meta:
        raise ValueError("avi: no avih header")
    return meta


def decode_avi_frames(payload: bytes) -> Iterator[np.ndarray]:
    """Yield uint8 (h, w, 3) RGB frames from the 'movi' list (MJPEG)."""
    from .jpeg import decode_jpeg

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("avi: bad RIFF/AVI signature")
    seen_movi = False
    for fourcc, lo, hi in _walk(payload, 12, len(payload)):
        if fourcc == b"LIST" and payload[lo : lo + 4] == b"movi":
            seen_movi = True
            for c2, l2, h2 in _walk(payload, lo + 4, hi):
                # '..dc'/'..db': compressed/uncompressed video frame data
                if c2[2:4] in (b"dc", b"db"):
                    frame = payload[l2:h2]
                    if frame[:3] != b"\xff\xd8\xff":
                        raise ValueError(
                            "avi: non-JPEG frame payload (not MJPEG)"
                        )
                    yield decode_jpeg(frame)
    if not seen_movi:
        raise ValueError("avi: no movi list")
