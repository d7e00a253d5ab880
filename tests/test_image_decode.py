"""Tests for the real BMP image decode path (functions/image.py)."""

from __future__ import annotations

import struct

import pytest

from iceberg_evolve_spark.functions.image import (
    _bmp_bytes,
    decode_one_bmp,
    synth_decode_features,
    synth_params,
)


def _closed_forms(doc_id: int) -> dict:
    w, h, (r1, g1, b1), (r2, g2, b2) = synth_params(doc_id)
    half = w // 2
    stride = (3 * w + 3) // 4 * 4

    def s(c1: int, c2: int) -> int:
        return sum(((c1 + y) % 256) * half + ((c2 + y) % 256) * (w - half) for y in range(h))

    return {
        "width": w,
        "height": h,
        "byte_len": 54 + h * stride,
        "sum_r": s(r1, r2),
        "sum_g": s(g1, g2),
        "sum_b": s(b1, b2),
        "first_px_r": r1,
        "first_px_g": g1,
        "first_px_b": b1,
    }


class TestBmpCodec:
    def test_header_is_canonical_bmp(self):
        payload = _bmp_bytes(*synth_params(7))
        assert payload[:2] == b"BM"
        file_size, _, _, offset = struct.unpack_from("<IHHI", payload, 2)
        assert file_size == len(payload)
        assert offset == 54
        hdr, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
        assert (hdr, planes, bpp, comp) == (40, 1, 24, 0)

    @pytest.mark.parametrize("doc_id", [0, 1, 5, 8, 17, 255, 256, 9999])
    def test_decode_matches_closed_forms(self, doc_id):
        feats = decode_one_bmp(_bmp_bytes(*synth_params(doc_id)))
        assert feats == _closed_forms(doc_id)

    def test_bottom_up_row_order_is_honored(self):
        # Rows differ per y; a decoder ignoring bottom-up storage would report
        # image row h-1's colors as the top-left pixel.
        w, h, left, right = synth_params(3)
        assert h > 1
        feats = decode_one_bmp(_bmp_bytes(w, h, left, right))
        assert feats["first_px_r"] == left[0]  # not (left[0] + h - 1) % 256
        assert feats["first_px_r"] != (left[0] + h - 1) % 256

    def test_decode_rejects_garbage(self):
        with pytest.raises(ValueError):
            decode_one_bmp(b"NOTABMP" + b"\x00" * 64)

    def test_padding_every_phase(self):
        # widths 8..16 cover all four (3w % 4) padding phases
        strides = set()
        for doc_id in range(9):
            w, h, left, right = synth_params(doc_id)
            strides.add(((3 * w + 3) // 4 * 4) - 3 * w)
            assert decode_one_bmp(_bmp_bytes(w, h, left, right))["width"] == w
        assert strides == {0, 1, 2, 3}

    def test_spark_pipeline(self, spark):
        df = spark.range(0, 64).withColumnRenamed("id", "doc_id")
        rows = {r["doc_id"]: r.asDict() for r in synth_decode_features(df).collect()}
        assert len(rows) == 64
        for doc_id in (0, 13, 63):
            expect = _closed_forms(doc_id)
            got = {k: v for k, v in rows[doc_id].items() if k != "doc_id"}
            assert got == expect


class TestDecodePayloadRouting:
    def test_image_and_audio_route_to_real_decoders(self):
        from iceberg_evolve_spark.functions.multimodal import decode_payload

        img = decode_payload(_bmp_bytes(*synth_params(5)), {"media_type": "image"})
        assert img["width"] == synth_params(5)[0]

        from iceberg_evolve_spark.functions.audio import _wav_bytes
        from iceberg_evolve_spark.functions.audio import synth_params as wav_params

        aud = decode_payload(_wav_bytes(*wav_params(5)), {"media_type": "audio"})
        assert aud["sample_rate"] == 8000

    def test_video_mp4_routes_to_demuxer(self):
        # ftyp-sniffed payloads now route to the real ISO BMFF demuxer
        # (functions/mp4.py): a truncated header fails LOUDLY there rather
        # than reaching the old blanket stub. Interframe-codec stubbing is
        # covered in test_video_decode.py (avc1 samples raise
        # NotImplementedError with the layout already demuxed).
        from iceberg_evolve_spark.functions.multimodal import decode_payload

        with pytest.raises(ValueError):
            decode_payload(b"\x00\x00\x00\x18ftypmp42", {"media_type": "video"})


class TestTwoStagePipeline:
    def test_two_stage_matches_fused(self, spark):
        # decode_bmp_features is the documented real-ingest path (payload
        # column already exists); it must agree with the fused harness path
        from iceberg_evolve_spark.functions.image import (
            decode_bmp_features,
            synth_bmp_payload,
            synth_decode_features,
        )

        df = spark.range(0, 16).withColumnRenamed("id", "doc_id")
        fused = {r["doc_id"]: r.asDict() for r in synth_decode_features(df).collect()}
        two = {
            r["doc_id"]: r.asDict()
            for r in decode_bmp_features(synth_bmp_payload(df)).collect()
        }
        assert fused == two


class TestRouterDiagnosis:
    def test_unknown_media_type_is_a_value_error(self):
        # a metadata problem must not read as a missing-ffmpeg problem
        from iceberg_evolve_spark.functions.multimodal import decode_payload

        with pytest.raises(ValueError, match="unknown media_type"):
            decode_payload(b"\x00\x01", {"media_type": "text"})
        with pytest.raises(ValueError, match="unknown media_type"):
            decode_payload(b"\x00\x01", {})
        with pytest.raises(ValueError, match="unknown media_type"):
            decode_payload(b"\x00\x01", None)


class TestPngDecode:
    def test_roundtrip_all_filters_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from iceberg_evolve_spark.functions.png import (
            _pixel,
            decode_one_png,
            synth_params,
            synth_png_payload,
        )

        @settings(max_examples=80, deadline=None)
        @given(st.integers(min_value=0, max_value=10**12))
        def check(doc_id):
            w, h, _, _ = synth_params(doc_id)
            feats = decode_one_png(synth_png_payload(doc_id))
            assert (feats["width"], feats["height"]) == (w, h)
            assert feats["sum_r"] == sum(
                _pixel(doc_id, x, y, w)[0] for y in range(h) for x in range(w)
            )
            assert feats["last_px_b"] == _pixel(doc_id, w - 1, h - 1, w)[2]

        check()

    def test_crc_corruption_detected(self):
        from iceberg_evolve_spark.functions.png import decode_one_png, synth_png_payload

        p = bytearray(synth_png_payload(3))
        i = p.find(b"IDAT") + 6
        p[i] ^= 0xFF
        with pytest.raises(ValueError, match="CRC"):
            decode_one_png(bytes(p))

    def test_unsupported_variants_fail_loudly(self):
        import struct as _s

        from iceberg_evolve_spark.functions.png import decode_one_png, synth_png_payload

        import zlib as _z

        p = bytearray(synth_png_payload(4))
        i = p.find(b"IHDR")
        body = bytearray(p[i + 4 : i + 4 + 13])
        body[9] = 3  # palette color type
        crc = _s.pack(">I", _z.crc32(b"IHDR" + bytes(body)) & 0xFFFFFFFF)
        p[i + 4 : i + 4 + 13] = body
        p[i + 4 + 13 : i + 4 + 17] = crc
        with pytest.raises(ValueError, match="truecolor"):
            decode_one_png(bytes(p))

    def test_payload_routing(self):
        from iceberg_evolve_spark.functions.multimodal import decode_payload
        from iceberg_evolve_spark.functions.png import synth_png_payload, synth_params

        feats = decode_payload(synth_png_payload(6), {"media_type": "image"})
        assert feats["width"] == synth_params(6)[0]

    def test_fused_spark_stage(self, spark):
        from iceberg_evolve_spark.functions.png import (
            synth_decode_features,
            synth_params,
            _pixel,
        )

        rows = synth_decode_features(spark.range(0, 10), id_col="id").collect()
        assert len(rows) == 10
        r7 = next(r for r in rows if r["doc_id"] == 7)
        w, h, _, _ = synth_params(7)
        assert r7["sum_g"] == sum(
            _pixel(7, x, y, w)[1] for y in range(h) for x in range(w)
        )
