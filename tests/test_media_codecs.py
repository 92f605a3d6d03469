"""Stdlib media codecs: byte-level roundtrips and the Spark decode
operator. The sf-scale value check is oracle 'media_decode'
(encode→decode roundtrip predicted arithmetically by DuckDB)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from swarm_spark.operators.media_codecs import (
    PNG_SIG,
    decode_meta,
    png_decode,
    png_encode,
    real_feature_kernel,
    sniff,
    wav_decode,
    wav_encode,
)


class TestPng:
    def test_roundtrip_gray(self):
        px = (np.arange(7 * 5) % 256).astype(np.uint8).reshape(5, 7)
        w, h, c, out = png_decode(png_encode(px))
        assert (w, h, c) == (7, 5, 1)
        assert np.array_equal(out[:, :, 0], px)

    def test_roundtrip_rgb_and_rgba(self):
        rgb = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(3, 4, 3)
        w, h, c, out = png_decode(png_encode(rgb))
        assert (w, h, c) == (4, 3, 3) and np.array_equal(out, rgb)
        rgba = np.arange(2 * 2 * 4, dtype=np.uint8).reshape(2, 2, 4)
        assert np.array_equal(png_decode(png_encode(rgba))[3], rgba)

    def _encode_with_filters(self, px: np.ndarray, ftypes: list[int]) -> bytes:
        """Re-encode applying a per-row filter type — exercises the
        decoder's un-filtering against rows OUR encoder never emits."""
        h, w = px.shape
        raw = bytearray()
        for y in range(h):
            ft = ftypes[y % len(ftypes)]
            raw.append(ft)
            for x in range(w):
                cur = int(px[y, x])
                left = int(px[y, x - 1]) if x > 0 else 0
                up = int(px[y - 1, x]) if y > 0 else 0
                ul = int(px[y - 1, x - 1]) if (x > 0 and y > 0) else 0
                if ft == 0:
                    v = cur
                elif ft == 1:
                    v = cur - left
                elif ft == 2:
                    v = cur - up
                elif ft == 3:
                    v = cur - (left + up) // 2
                else:  # paeth
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                    v = cur - pred
                raw.append(v & 0xFF)

        def chunk(tag, body):
            crc = zlib.crc32(tag + body) & 0xFFFFFFFF
            return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        return (PNG_SIG + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))

    def test_decodes_all_filter_types(self):
        rng = np.random.default_rng(7)
        px = rng.integers(0, 256, size=(8, 6), dtype=np.uint8)
        data = self._encode_with_filters(px, [0, 1, 2, 3, 4])
        w, h, c, out = png_decode(data)
        assert np.array_equal(out[:, :, 0], px)

    def test_unsupported_depth_raises(self):
        data = bytearray(png_encode(np.zeros((2, 2), np.uint8)))
        # IHDR body starts at sig(8)+len(4)+tag(4); depth is byte 8 of body
        data[8 + 8 + 8] = 16
        # crc now wrong but IHDR parses first; depth gate fires
        with pytest.raises(NotImplementedError, match="depth=16"):
            png_decode(bytes(data))


class TestWav:
    def test_roundtrip_mono_and_stereo(self):
        s = (np.arange(100) * 3 % 200 - 100).astype(np.int16)
        fr, ch, out = wav_decode(wav_encode(s, framerate=8000))
        assert (fr, ch) == (8000, 1) and np.array_equal(out[:, 0], s)
        st = np.stack([s, -s], axis=1).astype(np.int16)
        fr, ch, out = wav_decode(wav_encode(st, framerate=16000))
        assert (fr, ch) == (16000, 2) and np.array_equal(out, st)


class TestDispatch:
    def test_sniff(self):
        assert sniff(png_encode(np.zeros((1, 1), np.uint8))) == "png"
        assert sniff(wav_encode(np.zeros(4, np.int16))) == "wav"
        assert sniff(b"\xff\xd8\xff\xe0junk") == "jpeg"
        assert sniff(b"\x00\x00\x00\x18ftypmp42") == "mp4"
        assert sniff(b"plain text") == "unknown"

    def test_decode_meta_values(self):
        px = np.array([[0, 10], [20, 30]], np.uint8)
        m = decode_meta(png_encode(px))
        assert (m["width"], m["height"], m["n_channels"]) == (2, 2, 1)
        assert m["value_mean"] == 15.0 and m["value_max"] == 30
        s = np.array([100, -100, 50, -50], np.int16)
        m = decode_meta(wav_encode(s, framerate=4000))
        assert m["n_samples"] == 4 and m["duration_ms"] == 1
        assert m["value_mean"] == 0.0 and m["value_min"] == -100

    def test_codec_formats_raise(self):
        with pytest.raises(NotImplementedError, match="jpeg"):
            decode_meta(b"\xff\xd8\xff\xe0")
        with pytest.raises(NotImplementedError):
            real_feature_kernel(b"\x00\x00\x00\x18ftypmp42", 16)

    def test_real_feature_kernel_shape_and_content(self):
        f = real_feature_kernel(png_encode(np.full((3, 4), 9, np.uint8)), 16)
        assert f.shape == (16,) and f.dtype == np.float32
        assert f[0] == 1.0 and f[1] == 4.0 and f[2] == 3.0 and f[4] == 9.0
        f = real_feature_kernel(wav_encode(np.zeros(8, np.int16), 8000), 6)
        assert f.shape == (6,) and f[0] == 2.0 and f[1] == 8000.0


class TestSparkOperators:
    def test_decode_media_real(self, spark):
        from swarm_spark.operators.multimodal import decode_media

        rows = [("p1", bytearray(png_encode(np.full((2, 3), 5, np.uint8)))),
                ("w1", bytearray(wav_encode(np.full(16, 7, np.int16), 8000)))]
        df = spark.createDataFrame(rows, "media_id string, payload binary")
        out = {r.media_id: r for r in decode_media(df).collect()}
        assert out["p1"].width == 3 and out["p1"].value_mean == 5.0
        assert out["w1"].n_samples == 16 and out["w1"].value_mean == 7.0

    def test_decode_media_on_error_null(self, spark):
        from swarm_spark.operators.multimodal import decode_media

        df = spark.createDataFrame(
            [("j1", bytearray(b"\xff\xd8\xff\xe0"))],
            "media_id string, payload binary")
        r = decode_media(df, on_error="null").collect()[0]
        assert r.fmt == "jpeg" and r.width is None and r.value_mean is None

    def test_extract_features_real_decoder(self, spark):
        from swarm_spark.operators.multimodal import MEDIA_SCHEMA, extract_features

        payload = bytearray(png_encode(np.full((4, 4), 3, np.uint8)))
        df = spark.createDataFrame(
            [("m1", "image", "image/png", 4, 4, None, payload)], MEDIA_SCHEMA)
        r = extract_features(df, decoder="real", feature_dim=8).collect()[0]
        assert r.media_id == "m1" and len(r.feature) == 8
        assert r.feature[0] == 1.0 and r.feature[4] == 3.0  # kind flag, mean


class TestResizeImages:
    def _media(self, spark, arrs):
        from swarm_spark.operators.media_codecs import png_encode

        rows = [(f"m{i}", bytearray(png_encode(a))) for i, a in enumerate(arrs)]
        return spark.createDataFrame(rows, "media_id string, payload binary")

    def test_downscale_matches_numpy_reference(self, spark):
        import numpy as np

        from swarm_spark.operators.media_codecs import png_decode
        from swarm_spark.operators.multimodal import resize_images

        rng = np.random.RandomState(3)
        src = rng.randint(0, 256, (8, 12, 3), dtype=np.uint8)
        out = resize_images(self._media(spark, [src]), width=6, height=4).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["width"], r["height"], r["n_channels"]) == (6, 4, 3)
        assert (r["src_width"], r["src_height"]) == (12, 8)
        w, h, c, px = png_decode(bytes(r["payload"]))
        ys = (np.arange(4) * 8) // 4
        xs = (np.arange(6) * 12) // 6
        assert (w, h, c) == (6, 4, 3)
        assert np.array_equal(px, src[ys][:, xs])

    def test_upscale_gray(self, spark):
        import numpy as np

        from swarm_spark.operators.media_codecs import png_decode
        from swarm_spark.operators.multimodal import resize_images

        src = np.arange(6, dtype=np.uint8).reshape(2, 3)
        out = resize_images(self._media(spark, [src]), width=6, height=4).collect()
        w, h, c, px = png_decode(bytes(out[0]["payload"]))
        assert (w, h, c) == (6, 4, 1)
        # every source pixel replicated 2x2
        assert px[0, 0, 0] == 0 and px[3, 5, 0] == 5

    def test_non_png_raise_and_null_modes(self, spark):
        import pytest as _pytest

        from swarm_spark.operators.multimodal import resize_images

        bad = spark.createDataFrame(
            [("x", bytearray(b"RIFFxxxxWAVE"))], "media_id string, payload binary")
        with _pytest.raises(Exception, match="codec-library|NotImplemented"):
            resize_images(bad, 4, 4).collect()
        rows = resize_images(bad, 4, 4, on_error="null").collect()
        assert rows[0]["payload"] is None and rows[0]["src_width"] is None
