"""Multimodal columns: opaque binary payloads + typed metadata + decode.

A 100 TB training-data lakehouse carries image/audio/video as ``binary``
columns next to text. Decode here is REAL for the four formats that need
no external codec library — 16-bit PCM WAV (RIFF chunk walk +
``np.frombuffer``), 24-bpp uncompressed BMP (header parse + padded-row
reshape), 8-bit PNG (full chunk walk + CRC check + stdlib-zlib
inflate + all-five-filter unfiltering in ``decode_png``), and JPEG —
both baseline/multi-scan sequential AND progressive (from-scratch
ITU-T T.81 codec in ``functions/jpeg.py``: Annex K tables, canonical
Huffman, matrix DCT, spectral selection + successive approximation;
4:4:4, 4:2:2, 4:2:0 + grayscale; DRI/RSTn restart intervals) — plus a
nearest-neighbor ``resize`` kernel.
Remaining variants (arithmetic / 16-bit jpeg,
sub-byte-depth PNG) decode through the PLUGGABLE registry: if
the optional public Pillow dependency is importable on the executors,
``decode_image`` prefers it; otherwise unsupported variants raise a
clearly-marked ``NotImplementedError`` (feature extraction falls back to
the deterministic stub). Video: ISO-BMFF (mp4) and RIFF/AVI container
METADATA — duration, dimensions, stream count — parse for REAL via pure
struct walks (``parse_mp4_metadata``, ``functions/avi.py``); frame
DECODE is REAL for MJPEG-AVI (per-frame built-in JPEG) and animated GIF
(``video_frame_features``), and stays a declared stub only for
entropy-coded codecs (H.264/mp4) — ffmpeg is out of scope. The dispatch, schema, Arrow batch shape, ``mapInPandas``
iterator signatures, and metadata projection are identical either way, so
a production deployment only adds the codec libs to its executor image.

Reference analog: the html ``binary`` column of ``pages`` and its
extraction UDF (``extract.py``); the reference's own batched tensor kernels
(``sapbert/model/model_wrapper.py:169-233``) are the vectorized-UDF shape
reused here.
"""

from __future__ import annotations

import struct
import zlib
from hashlib import blake2b
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

MEDIA_SCHEMA = (
    "media_id long, url string, kind string, payload binary, "
    "width int, height int, duration_ms int"
)


# ---------------------------------------------------------------------------
# real codecs: PCM16 WAV + 24bpp BMP (pure struct/numpy, no external libs)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples → canonical RIFF/WAVE PCM16 bytes (fixture
    encoder; also documents the exact layout ``decode_wav`` parses)."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 → (sample_rate, float64 mono waveform in [-1, 1]).

    Real decode: RIFF chunk walk (word-aligned), fmt/data extraction,
    ``np.frombuffer`` sample view, channel mean for multi-channel.
    Non-PCM16 raises ``NotImplementedError`` (compressed WAV needs a codec
    library)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        sz = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_ch, rate, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"WAV format {audio_format}/{bits}bit needs an external codec"
        )
    samples = np.frombuffer(data[: len(data) - len(data) % (2 * n_ch)], "<i2")
    wave = samples.astype(np.float64) / 32768.0
    if n_ch > 1:
        wave = wave.reshape(-1, n_ch).mean(axis=1)
    return rate, wave


def encode_bmp(rgb: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB → 24bpp bottom-up BMP bytes with 4-byte row
    padding (fixture encoder)."""
    h, w, _ = rgb.shape
    row_size = (w * 3 + 3) & ~3
    px = np.zeros((h, row_size), dtype=np.uint8)
    px[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = px.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    return header + info + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """24bpp uncompressed BMP → uint8 (h, w, 3) RGB array.

    Real decode: header parse, padded bottom-up (or top-down, negative
    height) row layout, BGR→RGB. Other bit depths / compressions raise
    ``NotImplementedError``."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack("<I", payload[10:14])[0]
    w, h_raw = struct.unpack("<ii", payload[18:26])
    bpp = struct.unpack("<H", payload[28:30])[0]
    compression = struct.unpack("<I", payload[30:34])[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"BMP bpp={bpp} compression={compression} needs an external codec"
        )
    h = abs(h_raw)
    row_size = (w * 3 + 3) & ~3
    raw = np.frombuffer(
        payload[data_offset : data_offset + row_size * h], dtype=np.uint8
    ).reshape(h, row_size)
    img = raw[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    if h_raw > 0:
        img = img[::-1]  # bottom-up storage
    return img


# ---------------------------------------------------------------------------
# real compressed-image codec: PNG (stdlib zlib + numpy, no external libs)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color_type → samples/px


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)


# Adam7 interlace pass grid: (x0, y0, dx, dy) per pass (PNG spec §8.2)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _filter_image_bytes(
    rows: np.ndarray, bpp: int, filter_type: int
) -> bytearray:
    """Filter a (n_rows, stride)-byte image per PNG §9: one filter-type
    byte then the filtered row. ``bpp`` = bytes per pixel (filters always
    operate on BYTES — the same code serves 8- and 16-bit depths)."""
    n, stride = rows.shape
    raw = rows.astype(np.int16)
    prior = np.zeros(stride, dtype=np.int16)
    out = bytearray()
    for y in range(n):
        cur = raw[y]
        left = np.zeros(stride, dtype=np.int16)
        left[bpp:] = cur[:-bpp]
        up_left = np.zeros(stride, dtype=np.int16)
        up_left[bpp:] = prior[:-bpp]
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            filt = cur - left
        elif filter_type == 2:
            filt = cur - prior
        elif filter_type == 3:
            filt = cur - (left + prior) // 2
        elif filter_type == 4:
            filt = cur - _paeth(left, prior, up_left)
        else:
            raise ValueError(f"bad filter type {filter_type}")
        out.append(filter_type)
        out += (filt & 0xFF).astype(np.uint8).tobytes()
        prior = cur
    return out


def encode_png(
    img: np.ndarray,
    filter_type: int = 0,
    depth: int = 8,
    interlace: bool = False,
) -> bytes:
    """uint8 image → PNG bytes (fixture encoder; also documents the layout
    ``decode_png`` parses). Shape (h, w) → grayscale, (h, w, 3) → RGB,
    (h, w, 4) → RGBA. ``filter_type`` (0..4) is applied to EVERY row so
    round-trip tests exercise each unfilter branch of the decoder;
    ``depth=16`` scales samples by 257 (v*257 keeps the high byte == v, so
    the 8-bit readback is exact); ``interlace=True`` emits Adam7 passes."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type, ch = 0, 1
        px = img[:, :, None]
    elif img.shape[2] == 3:
        color_type, ch = 2, 3
        px = img
    elif img.shape[2] == 4:
        color_type, ch = 6, 4
        px = img
    else:
        raise ValueError(f"unsupported channel count {img.shape[2]}")
    h, w = img.shape[:2]
    if depth == 8:
        data = px
        bps = 1
    elif depth == 16:
        wide = (px.astype(np.uint16) * 257).astype(">u2")
        data = wide.view(np.uint8).reshape(h, w, ch * 2)
        bps = 2
    else:
        raise ValueError(f"fixture encoder supports depth 8/16, not {depth}")
    bpp = ch * bps
    out = bytearray()
    if not interlace:
        out += _filter_image_bytes(data.reshape(h, w * bpp), bpp, filter_type)
    else:
        for x0, y0, dx, dy in _ADAM7:
            sub = data[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            ph, pw = sub.shape[:2]
            out += _filter_image_bytes(
                sub.reshape(ph, pw * bpp), bpp, filter_type
            )
    ihdr = struct.pack(
        ">IIBBBBB", w, h, depth, color_type, 0, 0, 1 if interlace else 0
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(left: np.ndarray, up: np.ndarray, up_left: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec §9.4) over int16 arrays."""
    p = left + up - up_left
    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - up_left)
    return np.where(
        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, up_left)
    )


def _unfilter_rows(raw: np.ndarray, bpp: int) -> np.ndarray:
    """Unfilter (n_rows, stride+1) PNG-filtered bytes into (n_rows,
    stride) reconstructed bytes. ``bpp`` = bytes per pixel; the
    Sub/Average/Paeth recurrences run per-pixel, vectorized across the
    pixel's bytes (the same code serves 8- and 16-bit depths and every
    Adam7 pass)."""
    n, stride1 = raw.shape
    stride = stride1 - 1
    recon = np.zeros((n, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(n):
        ftype = raw[y, 0]
        cur = raw[y, 1:].astype(np.int32)
        if ftype == 0:
            line = cur
        elif ftype == 2:
            line = (cur + prior) & 0xFF
        elif ftype in (1, 3, 4):
            line = cur  # in-place recurrence along x, vectorized over bpp
            for x in range(0, stride, bpp):
                left = line[x - bpp : x] if x else np.zeros(bpp, dtype=np.int32)
                up = prior[x : x + bpp]
                if ftype == 1:
                    line[x : x + bpp] = (line[x : x + bpp] + left) & 0xFF
                elif ftype == 3:
                    line[x : x + bpp] = (
                        line[x : x + bpp] + (left + up) // 2
                    ) & 0xFF
                else:
                    up_left = (
                        prior[x - bpp : x]
                        if x
                        else np.zeros(bpp, dtype=np.int32)
                    )
                    line[x : x + bpp] = (
                        line[x : x + bpp] + _paeth(left, up, up_left)
                    ) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        recon[y] = line
        prior = line.astype(np.int32)
    return recon


def decode_png(payload: bytes) -> np.ndarray:
    """REAL PNG decode → uint8 (h, w, 3) RGB, pure stdlib-zlib + numpy.

    Full chunk walk with CRC verification, multi-IDAT concatenation, zlib
    inflate, and per-row unfiltering (all five filter types — None/Sub/Up/
    Average/Paeth — with the sequential Sub/Average/Paeth recurrences run
    per-pixel but vectorized across the pixel's bytes). Supported: 8- AND
    16-bit depths (16-bit keeps the big-endian high byte, Pillow
    ``convert("RGB")`` semantics), Adam7 INTERLACED and non-interlaced
    layouts (seven independently-filtered sub-images scattered back),
    color types 0 (gray), 2 (RGB), 3 (palette via PLTE), 4 (gray+alpha),
    6 (RGBA); alpha is dropped, gray broadcast to 3 channels. Sub-byte
    depths (1/2/4-bit) raise ``NotImplementedError`` (the pluggable
    Pillow path picks those up when present)."""
    if len(payload) < 8 or payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 12 <= len(payload):
        (clen,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", payload[pos + 8 + clen : pos + 12 + clen])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, color_type, compression, filter_method, interlace = ihdr
    if color_type not in _PNG_CHANNELS or compression != 0 or filter_method != 0:
        raise ValueError(f"bad PNG header (color_type={color_type})")
    if depth not in (8, 16) or interlace not in (0, 1):
        raise NotImplementedError(
            f"PNG depth={depth} interlace={interlace} needs the optional "
            "Pillow codec (8/16-bit, interlace 0/1 decode built-in)"
        )
    if depth == 16 and color_type == 3:
        raise ValueError("palette PNG cannot be 16-bit")
    ch = _PNG_CHANNELS[color_type]
    bps = depth // 8
    bpp = ch * bps
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    if interlace == 0:
        stride = w * bpp
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG pixel data length mismatch")
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
        recon = _unfilter_rows(rows, bpp)
    else:  # Adam7: 7 independently-filtered sub-images, scattered back
        recon = np.zeros((h, w * bpp), dtype=np.uint8)
        recon3 = recon.reshape(h, w, bpp)
        pos2 = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = max(0, -(-(w - x0) // dx))
            ph = max(0, -(-(h - y0) // dy))
            if pw == 0 or ph == 0:
                continue
            stride = pw * bpp
            need = ph * (stride + 1)
            if pos2 + need > len(raw):
                raise ValueError("PNG pixel data length mismatch")
            rows = np.frombuffer(
                raw[pos2 : pos2 + need], dtype=np.uint8
            ).reshape(ph, stride + 1)
            recon3[y0::dy, x0::dx] = _unfilter_rows(rows, bpp).reshape(
                ph, pw, bpp
            )
            pos2 += need
        if pos2 != len(raw):
            raise ValueError("PNG pixel data length mismatch")
    if depth == 16:
        # big-endian 16-bit samples: keep the high byte (Pillow semantics)
        recon = np.ascontiguousarray(recon.reshape(h, w * ch, 2)[:, :, 0])
    px = recon.reshape(h, w, ch)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        return plte[px[:, :, 0]]
    if color_type == 0:
        return np.repeat(px, 3, axis=2)
    if color_type == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]  # RGB / RGBA (alpha dropped)


# ---------------------------------------------------------------------------
# pluggable compressed-image codec (optional public dependency: Pillow)
# ---------------------------------------------------------------------------

_PIL_UNSET = object()
_PIL_CACHE = _PIL_UNSET


def _pil():
    """Import-try Pillow once per process (executors each do their own).
    Returns ``PIL.Image`` or None — the registry key for whether jpeg/png
    decode is real or the declared stub in this deployment."""
    global _PIL_CACHE
    if _PIL_CACHE is _PIL_UNSET:
        try:
            from PIL import Image  # optional public dependency

            _PIL_CACHE = Image
        except ImportError:
            _PIL_CACHE = None
    return _PIL_CACHE


def sniff_image_format(payload: bytes) -> str | None:
    """Magic-byte sniff: 'bmp' | 'jpeg' | 'png' | 'gif' | None."""
    if payload is None or len(payload) < 8:
        return None
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    return None


def decode_image(payload: bytes) -> np.ndarray:
    """Image decode dispatch → uint8 (h, w, 3) RGB.

    BMP, PNG (8/16-bit, Adam7 interlaced or not), GIF (87a/89a LZW,
    global/local palettes, interlace, animation first frame —
    ``functions/gif.py``) and jpeg
    (baseline/multi-scan/progressive; 4:4:4, 4:2:0, 4:2:2, grayscale;
    restart intervals — ``functions/jpeg.py``) decode with the built-in
    pure-numpy codecs — no external dependency. The residual variants
    (sub-byte-depth PNG, arithmetic / 16-bit jpeg)
    decode for REAL when Pillow is importable (optional public
    dependency — the core never requires it); without it they raise
    ``NotImplementedError`` with an actionable message, exactly the
    declared-stub boundary."""
    kind = sniff_image_format(payload)
    if kind == "bmp":
        return decode_bmp(payload)
    if kind == "gif":
        try:
            # built-in real codec (functions/gif.py): LZW, global/local
            # palettes, interlace, animation-first-frame
            from ..functions.gif import decode_gif

            return decode_gif(payload)
        except ValueError:
            if _pil() is None:
                raise
            import io

            image_mod = _pil()
            with image_mod.open(io.BytesIO(payload)) as im:
                return np.asarray(im.convert("RGB"))
    if kind == "png":
        try:
            return decode_png(payload)  # built-in real codec, no deps
        except (NotImplementedError, ValueError):
            if _pil() is None:
                raise
            # sub-byte-depth variants — and corrupt-looking files
            # (CRC mismatch etc.) that a battle-tested decoder may still
            # salvage — fall through to Pillow
    if kind in ("jpeg", "png"):
        image_mod = _pil()
        if image_mod is not None:
            # Pillow when present: covers subsampled/progressive jpeg and
            # the exotic PNG variants
            import io

            with image_mod.open(io.BytesIO(payload)) as im:
                return np.asarray(im.convert("RGB"))
        if kind == "jpeg":
            # built-in from-scratch codec (ITU T.81: sequential +
            # progressive; 4:4:4, 4:2:2, 4:2:0 or grayscale; restart
            # intervals); arithmetic / 16-bit variants raise with an
            # actionable message
            from ..functions.jpeg import decode_jpeg

            return decode_jpeg(payload)
        raise NotImplementedError(
            f"{kind} decode variant needs the optional Pillow dependency "
            "(pip install pillow on the executor image) — or "
            "pre-transcode payloads to PNG/24bpp-BMP for the built-in codecs"
        )
    raise ValueError("unrecognized image payload (not BMP/JPEG/PNG)")


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via index arithmetic (the resize kernel of
    the brief — pure numpy, exact and deterministic)."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return img[rows[:, None], cols[None, :]]


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table: REAL payloads for audio (PCM16 WAV sine +
    noise) and image (alternating 24bpp BMP — widths chosen to exercise row
    padding — and zlib-compressed PNG cycling through all five row
    filters); video carries a REAL ISO-BMFF skeleton whose container
    metadata parses for real — only frame decode is the declared
    stub."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "audio":
            rate = 8000
            dur_ms = 1000 * (1 + i % 30)
            t = np.arange(int(rate * dur_ms / 1000))
            freq = 100 + (i % 5) * 50
            wave = 0.5 * np.sin(2 * np.pi * freq * t / rate)
            wave += 0.01 * rng.standard_normal(len(t))
            payload = encode_wav(
                np.clip(wave * 32767, -32768, 32767).astype(np.int16), rate
            )
            width = height = None
        elif kind == "image":
            # odd widths exercise the 4-byte BMP row padding
            width, height = 5 + (i % 4), 4 + (i % 3)
            rgb = rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)
            style = (i // 3) % 3
            if style == 0:
                payload = encode_bmp(rgb)
            elif style == 1:  # PNG cycles through every row-filter type
                payload = encode_png(rgb, filter_type=(i // 9) % 5)
            else:  # real baseline JPEG (built-in T.81 codec)
                from ..functions.jpeg import encode_jpeg

                payload = encode_jpeg(rgb)
            dur_ms = None
        else:
            # REAL ISO-BMFF skeleton: container metadata parses for real
            # (parse_mp4_metadata); frame decode stays the declared stub
            width, height = 320 + 16 * (i % 4), 240 + 16 * (i % 3)
            dur_ms = 1000 * (1 + i % 30)
            payload = encode_mp4_skeleton(dur_ms, width, height)
            width = height = None  # metadata columns mirror a raw crawl
        rows.append(
            (
                i,
                f"https://cdn.example.com/{kind}/{i}",
                kind,
                payload,
                width,
                height,
                dur_ms,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# real container parser: mp4 / ISO-BMFF metadata (pure struct, no ffmpeg)
# ---------------------------------------------------------------------------


def encode_mp4_skeleton(
    duration_ms: int, width: int | None = None, height: int | None = None
) -> bytes:
    """Minimal valid ISO-BMFF skeleton (ftyp + moov(mvhd [+ trak(tkhd)]))
    — fixture encoder; also documents the exact box layout
    ``parse_mp4_metadata`` walks. No mdat: frame DECODE stays the
    declared ffmpeg-needing stub; container METADATA is real."""

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    timescale = 1000
    mvhd = box(
        b"mvhd",
        struct.pack(">B3x", 0)  # version 0
        + struct.pack(">IIII", 0, 0, timescale, duration_ms)
        + struct.pack(">iH2x", 0x00010000, 0x0100)  # rate, volume
        + b"\x00" * 8
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next_track_id
    )
    traks = b""
    if width is not None and height is not None:
        tkhd = box(
            b"tkhd",
            struct.pack(">B3x", 0)
            + struct.pack(">IIIII", 0, 0, 1, 0, duration_ms)
            + b"\x00" * 8
            + struct.pack(">HHH2x", 0, 0, 0)  # layer, group, volume
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", width << 16, height << 16),  # 16.16 fixed
        )
        traks = box(b"trak", tkhd)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    return ftyp + box(b"moov", mvhd + traks)


def parse_mp4_metadata(payload: bytes) -> dict:
    """ISO-BMFF box walk → {duration_ms, width, height, n_tracks}.

    Real container parsing (size/type headers, 64-bit largesize,
    version-0/1 mvhd and tkhd, nested moov/trak traversal) — the
    metadata a crawl pipeline filters and shards on BEFORE any frame
    ever needs decoding. Not an mp4 decoder: sample tables and codec
    payloads are untouched (frame decode remains the declared stub).
    Raises ``ValueError`` for non-BMFF bytes or a missing moov."""
    if payload is None or len(payload) < 8:
        raise ValueError("mp4: not an ISO-BMFF payload")

    def walk(lo: int, hi: int):
        pos = lo
        while pos + 8 <= hi:
            size = struct.unpack(">I", payload[pos : pos + 4])[0]
            btype = payload[pos + 4 : pos + 8]
            body = pos + 8
            if size == 1:  # 64-bit largesize
                if pos + 16 > hi:
                    raise ValueError("mp4: truncated largesize box")
                size = struct.unpack(">Q", payload[pos + 8 : pos + 16])[0]
                body = pos + 16
            elif size == 0:  # box extends to end of enclosing container
                size = hi - pos
            if size < 8 or pos + size > hi:
                raise ValueError("mp4: bad box size")
            yield btype, body, pos + size
            pos += size

    top = {btype: (body, end) for btype, body, end in walk(0, len(payload))}
    if b"ftyp" not in top or b"moov" not in top:
        raise ValueError("mp4: missing ftyp/moov")
    meta = {"duration_ms": None, "width": None, "height": None, "n_tracks": 0}
    moov_body, moov_end = top[b"moov"]
    for btype, body, end in walk(moov_body, moov_end):
        if btype == b"mvhd":
            version = payload[body]
            if version == 1:
                timescale = struct.unpack(">I", payload[body + 20 : body + 24])[0]
                duration = struct.unpack(">Q", payload[body + 24 : body + 32])[0]
            else:
                timescale, duration = struct.unpack(
                    ">II", payload[body + 12 : body + 20]
                )
            if timescale:
                meta["duration_ms"] = int(duration * 1000 // timescale)
        elif btype == b"trak":
            meta["n_tracks"] += 1
            for t2, b2, _e2 in walk(body, end):
                if t2 == b"tkhd":
                    off = b2 + (32 if payload[b2] == 0 else 44)
                    # layer..volume (8) + matrix (36) precede width/height
                    wh = off + 8 + 36
                    w16, h16 = struct.unpack(">II", payload[wh : wh + 8])
                    if w16 and h16:
                        meta["width"] = w16 >> 16
                        meta["height"] = h16 >> 16
    return meta


def video_metadata(media: DataFrame) -> DataFrame:
    """Per-video container metadata via the REAL container parsers —
    ISO-BMFF (mp4) or RIFF (AVI, ``functions/avi.py``), dispatched by
    magic bytes — Arrow batches through ``mapInPandas`` (same vectorized
    shape as ``image_features``); unparseable payloads yield a typed
    null row, never a crash."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.avi import parse_avi_metadata

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    if payload[:4] == b"RIFF":
                        a = parse_avi_metadata(payload)
                        m = {
                            "duration_ms": a["duration_ms"],
                            "width": a["width"],
                            "height": a["height"],
                            "n_tracks": a["n_streams"],
                        }
                    else:
                        m = parse_mp4_metadata(payload)
                    out.append(
                        (
                            int(mid),
                            m["duration_ms"],
                            m["width"],
                            m["height"],
                            m["n_tracks"],
                        )
                    )
                except (ValueError, struct.error, TypeError):
                    out.append((int(mid), None, None, None, None))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "duration_ms",
                    "width",
                    "height",
                    "n_tracks",
                ],
            )

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(
            run,
            "media_id long, duration_ms long, width int, height int, "
            "n_tracks int",
        )
    )


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """STUB for codecs that need external libraries (jpeg/mp4...): a
    deterministic FEATURE_DIM-float vector derived from the payload bytes.
    A production deployment replaces this body with ffmpeg/PIL decode + a
    feature head; the signature (bytes, kind) -> float32[FEATURE_DIM] is
    the contract. WAV and BMP payloads never reach it — they decode for
    real (see ``_decode_features`` dispatch)."""
    if payload is None:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    digest = blake2b(payload, digest_size=8).digest()
    rng = np.random.RandomState(int.from_bytes(digest[:4], "big"))
    return rng.standard_normal(FEATURE_DIM).astype(np.float32)


def _wav_feature_vec(payload: bytes) -> np.ndarray:
    rate, wave = decode_wav(payload)
    n = len(wave)
    out = np.zeros(FEATURE_DIM, dtype=np.float32)
    if n == 0:
        return out
    zc = int(np.count_nonzero(np.diff(np.signbit(wave))))
    out[:6] = (
        n / rate,                       # duration seconds
        float(np.sqrt(np.mean(wave**2))),  # rms
        zc / n,                         # zero-crossing rate
        float(np.max(np.abs(wave))),    # peak
        float(np.mean(wave)),           # dc offset
        float(np.std(wave)),
    )
    # 8 coarse energy bands over time (frame-sampled envelope)
    bands = np.array_split(wave, 8)
    out[6:14] = [float(np.sqrt(np.mean(b**2))) if len(b) else 0.0 for b in bands]
    return out


def _image_feature_vec(payload: bytes) -> np.ndarray:
    img = decode_image(payload)
    out = np.zeros(FEATURE_DIM, dtype=np.float32)
    scaled = img.astype(np.float64) / 255.0
    out[:2] = (img.shape[1], img.shape[0])  # w, h
    out[2:5] = scaled.mean(axis=(0, 1))     # channel means
    out[5:8] = scaled.std(axis=(0, 1))      # channel stds
    # 2x4 nearest-neighbor thumbnail, grayscale — the resize op in-flow
    thumb = resize_nearest(scaled.mean(axis=2), 2, 4)
    out[8:16] = thumb.reshape(-1)
    return out


def _decode_features(payload: bytes, kind: str) -> np.ndarray:
    """Decode dispatch: real WAV decode by magic sniff; images (BMP/PNG
    always via the built-in codecs, jpeg when Pillow is present) through
    ``decode_image``; everything unimplemented in this deployment falls
    back to the declared stub."""
    if payload is None:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _wav_feature_vec(payload)
    if sniff_image_format(payload) is not None:
        try:
            return _image_feature_vec(payload)
        except (NotImplementedError, ValueError, TypeError):
            # codec absent here, or a corrupt payload — at crawl scale
            # corrupt bytes are routine; never crash the feature job
            return _decode_stub(payload, kind)
    return _decode_stub(payload, kind)


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """payload binary → feature array<float>, via mapInPandas.

    The iterator form keeps per-partition state (a real decoder would hold
    its codec context here) and streams Arrow batches — payloads never
    materialize as one big driver-side list."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                [float(x) for x in _decode_features(p, k)]
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "payload_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(
        run,
        "media_id long, kind string, feature array<float>, payload_bytes long",
    )


def audio_features(media: DataFrame) -> DataFrame:
    """REAL audio decode operator: WAV payloads → typed waveform stats
    (sample_rate, n_samples, duration_ms, rms, zero-crossing rate, peak)
    via ``mapInPandas``. Payloads that are not PCM16 WAV yield a null row
    (logged by count, never a crash mid-job)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    rate, wave = decode_wav(p)
                except (ValueError, NotImplementedError, TypeError):
                    rows.append((int(mid), None, None, None, None, None, None))
                    continue
                n = len(wave)
                zc = int(np.count_nonzero(np.diff(np.signbit(wave)))) if n else 0
                rows.append(
                    (
                        int(mid),
                        int(rate),
                        n,
                        int(round(1000 * n / rate)),
                        float(np.sqrt(np.mean(wave**2))) if n else 0.0,
                        zc / n if n else 0.0,
                        float(np.max(np.abs(wave))) if n else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "n_samples", "duration_ms",
                    "rms", "zcr", "peak",
                ],
            )

    return media.filter(F.col("kind") == "audio").select(
        "media_id", "payload"
    ).mapInPandas(
        run,
        "media_id long, sample_rate int, n_samples long, duration_ms long, "
        "rms double, zcr double, peak double",
    )


def image_features(media: DataFrame, thumb_h: int = 2, thumb_w: int = 4) -> DataFrame:
    """REAL image decode operator: BMP + 8-bit PNG (built-in codecs) and —
    when the optional Pillow dependency is on the executors — jpeg payloads →
    (width, height, channel means) plus a nearest-neighbor-resized
    grayscale thumbnail (the resize/feature-extract step of the brief),
    via ``mapInPandas``. Undecodable payloads yield a null row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    img = decode_image(p)
                except (ValueError, NotImplementedError, TypeError):
                    rows.append((int(mid), None, None, None, None, None, None))
                    continue
                scaled = img.astype(np.float64) / 255.0
                means = scaled.mean(axis=(0, 1))
                thumb = resize_nearest(scaled.mean(axis=2), thumb_h, thumb_w)
                rows.append(
                    (
                        int(mid),
                        img.shape[1],
                        img.shape[0],
                        float(means[0]),
                        float(means[1]),
                        float(means[2]),
                        [float(x) for x in thumb.reshape(-1)],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height",
                    "mean_r", "mean_g", "mean_b", "thumb",
                ],
            )

    return media.filter(F.col("kind") == "image").select(
        "media_id", "payload"
    ).mapInPandas(
        run,
        "media_id long, width int, height int, mean_r double, "
        "mean_g double, mean_b double, thumb array<double>",
    )


def video_frame_features(media: DataFrame, max_frames: int = 8) -> DataFrame:
    """REAL per-frame video decode where the engine owns the codec chain:
    MJPEG-AVI (RIFF walk → per-frame built-in JPEG decode,
    ``functions/avi.py``) and animated GIF (``functions/gif.py``) emit
    one row per decoded frame (frame_idx, dims, channel means); mp4
    payloads — whose frame entropy coding stays the declared stub —
    yield a single typed null row per video, same contract as
    ``image_features`` for undecodable images.

    Scale shape: frames of one video decode inside one task (the Arrow
    batch holds the payload once); fan-out beyond ``max_frames`` is the
    ``frame_sample_plan`` explode + an explicit repartition, exactly as
    that operator documents."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.avi import decode_avi_frames
        from ..functions.gif import decode_gif_frames

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames = None
                try:
                    if payload[:4] == b"RIFF":
                        frames = decode_avi_frames(payload)
                    elif payload[:6] in (b"GIF87a", b"GIF89a"):
                        frames = (f for _, _, f in decode_gif_frames(payload))
                except (ValueError, struct.error, TypeError):
                    frames = None
                if frames is None:
                    rows.append((int(mid), None, None, None, None, None, None))
                    continue
                emitted = False
                try:
                    for i, fr in enumerate(frames):
                        if i >= max_frames:
                            break
                        m = fr.astype(np.float64).mean(axis=(0, 1)) / 255.0
                        rows.append(
                            (int(mid), i, fr.shape[0], fr.shape[1],
                             float(m[0]), float(m[1]), float(m[2]))
                        )
                        emitted = True
                except ValueError:
                    pass
                if not emitted:
                    rows.append((int(mid), None, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "height", "width",
                         "mean_r", "mean_g", "mean_b"],
            )

    return media.filter(F.col("kind") == "video").select(
        "media_id", "payload"
    ).mapInPandas(
        run,
        "media_id long, frame_idx int, height int, width int, "
        "mean_r double, mean_g double, mean_b double",
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms) —
    pure Catalyst sequence/explode; the actual frame decode is the stub
    above. Demonstrates the explode-then-decode partitioning shape: frames
    of one video stay in one partition until an explicit repartition."""
    vids = media.filter(F.col("kind") == "video").filter(
        F.col("duration_ms").isNotNull()
    )
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Typed-metadata projection + aggregation (no payload read: Catalyst
    prunes the binary column out of the scan — verify via explain())."""
    return (
        media.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.avg("duration_ms").alias("avg_duration_ms"),
            F.max("width").alias("max_width"),
        )
        .orderBy("kind")
    )


def media_bytes_stats(spark, sf_dir: str) -> DataFrame:
    """Oracle-checked multimodal-column query: treat each document's utf-8
    bytes as an opaque binary payload (the media analog over real testdata),
    tag a deterministic kind, and aggregate typed metadata per kind —
    count, total/max payload bytes. The binary column itself is only
    length-inspected (metadata-style scan); the decode path stays in
    ``extract_features``/``_decode_stub``."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    payload = F.encode(F.col("text"), "UTF-8")
    return (
        docs.select(kind.alias("kind"), F.octet_length(payload).alias("nbytes"))
        .groupBy("kind")
        .agg(
            F.count("*").alias("n_media"),
            F.sum("nbytes").alias("total_bytes"),
            F.max("nbytes").alias("max_bytes"),
        )
        .orderBy("kind")
    )


MEDIA_BYTES_STATS_SQL = """
SELECT kind,
       count(*) AS n_media,
       CAST(sum(nbytes) AS BIGINT) AS total_bytes,
       max(nbytes) AS max_bytes
FROM (
  SELECT (['image', 'audio', 'video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
         octet_length(encode(text)) AS nbytes
  FROM documents
)
GROUP BY kind
ORDER BY kind
"""
