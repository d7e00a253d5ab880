"""Tests for the real AVI video decode path (functions/video.py)."""

from __future__ import annotations

import struct

import pytest

from iceberg_evolve_spark.functions.video import (
    USEC_PER_FRAME,
    _avi_bytes,
    _row_bytes,
    decode_one_avi,
    frame_colors,
    synth_decode_features,
    synth_params,
)


def _closed_forms(doc_id: int) -> dict:
    w, h, n = synth_params(doc_id)
    d = _row_bytes(w) * h
    b0, g0, r0 = frame_colors(doc_id, 0)
    bl, gl, rl = frame_colors(doc_id, n - 1)
    return {
        "byte_len": 232 + n * (24 + d),
        "width": w,
        "height": h,
        "n_frames": n,
        "usec_per_frame": USEC_PER_FRAME,
        "topleft_b": (b0 + 128) % 256,
        "topleft_g": (g0 + 128) % 256,
        "topleft_r": (r0 + 128) % 256,
        "sum_b_first": w * ((h - 1) * b0 + (b0 + 128) % 256),
        "sum_b_last": w * ((h - 1) * bl + (bl + 128) % 256),
        "motion": abs(bl - b0) + abs(gl - g0) + abs(rl - r0),
    }


class TestAviCodec:
    def test_container_is_canonical_riff_avi(self):
        payload = _avi_bytes(7, *synth_params(7))
        assert payload[:4] == b"RIFF"
        (riff_size,) = struct.unpack_from("<I", payload, 4)
        assert riff_size == len(payload) - 8  # RIFF size excludes its own header
        assert payload[8:12] == b"AVI "
        # first LIST is hdrl and its first chunk is a 56-byte avih
        assert payload[12:16] == b"LIST" and payload[20:24] == b"hdrl"
        assert payload[24:28] == b"avih"
        (avih_size,) = struct.unpack_from("<I", payload, 28)
        assert avih_size == 56

    @pytest.mark.parametrize("doc_id", [0, 1, 5, 8, 17, 255, 256, 9999])
    def test_decode_matches_closed_forms(self, doc_id):
        feats = decode_one_avi(_avi_bytes(doc_id, *synth_params(doc_id)))
        assert feats == _closed_forms(doc_id)

    def test_bottom_up_row_order_is_honored(self):
        # The top image row is stored LAST (bottom-up DIB); a top-down parser
        # would report the body color, not the +128-shifted witness row.
        doc_id = 3
        feats = decode_one_avi(_avi_bytes(doc_id, *synth_params(doc_id)))
        b0, _, _ = frame_colors(doc_id, 0)
        assert feats["topleft_b"] == (b0 + 128) % 256
        assert feats["topleft_b"] != b0

    def test_frame_sampling_uses_first_and_last(self):
        # motion is defined on frame 0 vs frame n-1 body colors; for n >= 3
        # the middle frames must not affect it.
        doc_id = 16  # n = 2 + 16 % 6 = 6 frames
        _, _, n = synth_params(doc_id)
        assert n >= 3
        feats = decode_one_avi(_avi_bytes(doc_id, *synth_params(doc_id)))
        b0, g0, r0 = frame_colors(doc_id, 0)
        bl, gl, rl = frame_colors(doc_id, n - 1)
        assert feats["motion"] == abs(bl - b0) + abs(gl - g0) + abs(rl - r0)

    def test_decode_rejects_garbage(self):
        with pytest.raises(ValueError):
            decode_one_avi(b"NOTANAVI" + b"\x00" * 64)
        # RIFF but not AVI (a WAVE) must be rejected too
        from iceberg_evolve_spark.functions.audio import _wav_bytes

        with pytest.raises(ValueError):
            decode_one_avi(_wav_bytes(100, 1000, 5))

    def test_decode_rejects_frame_count_mismatch(self):
        payload = bytearray(_avi_bytes(7, *synth_params(7)))
        # corrupt avih dwTotalFrames (5th field, offset 24+8 header + 16)
        struct.pack_into("<I", payload, 24 + 8 + 16, 99)
        with pytest.raises(ValueError):
            decode_one_avi(bytes(payload))

    def test_codec_compressed_stream_raises_not_implemented(self):
        # A real-world MJPEG/DivX AVI passes the RIFF magic; the strf
        # biCompression gate must surface it as the documented stub, not a
        # reshape crash. strf payload starts after hdrl(12) + avih chunk(64) +
        # strl LIST hdr(12) + strh chunk(64) + strf chunk hdr(8); biCompression
        # is the 6th field (offset 16 within BITMAPINFOHEADER).
        payload = bytearray(_avi_bytes(7, *synth_params(7)))
        strf_payload = 12 + 12 + 64 + 12 + 64 + 8
        assert payload[strf_payload - 8 : strf_payload - 4] == b"strf"
        struct.pack_into("<I", payload, strf_payload + 16, 0x47504A4D)  # 'MJPG'
        with pytest.raises(NotImplementedError):
            decode_one_avi(bytes(payload))

    def test_strf_geometry_is_authoritative(self):
        # Real muxers often leave avih dwWidth/dwHeight as 0; the decoder must
        # take geometry from strf. avih payload starts at 32; dwWidth/dwHeight
        # are fields 9 and 10 (offsets 32 and 36 within the payload).
        doc_id = 7
        payload = bytearray(_avi_bytes(doc_id, *synth_params(doc_id)))
        struct.pack_into("<II", payload, 32 + 32, 0, 0)
        feats = decode_one_avi(bytes(payload))
        assert feats == _closed_forms(doc_id)

    def test_truncated_frame_raises_clean_error(self):
        # shrink the LAST frame chunk's declared size (the first would desync
        # the chunk walk and trip the frame-count check instead): the decoder
        # must raise a clean ValueError, not a numpy reshape traceback
        doc_id = 7
        w, h, n = synth_params(doc_id)
        payload = bytearray(_avi_bytes(doc_id, w, h, n))
        last_chunk = payload.rfind(b"00db", 0, payload.find(b"idx1"))
        (size,) = struct.unpack_from("<I", payload, last_chunk + 4)
        struct.pack_into("<I", payload, last_chunk + 4, size - 4)
        with pytest.raises(ValueError, match="bytes, expected"):
            decode_one_avi(bytes(payload))

    def test_padding_every_phase(self):
        # widths 8,10,...,22 cover both (3w % 4) phases for even widths
        strides = set()
        for doc_id in range(8):
            w, h, n = synth_params(doc_id)
            strides.add(_row_bytes(w) - 3 * w)
            assert decode_one_avi(_avi_bytes(doc_id, w, h, n))["width"] == w
        assert strides == {0, 2}

    def test_spark_pipeline(self, spark):
        df = spark.range(0, 64).withColumnRenamed("id", "doc_id")
        rows = {r["doc_id"]: r.asDict() for r in synth_decode_features(df).collect()}
        assert len(rows) == 64
        for doc_id in (0, 13, 63):
            expect = _closed_forms(doc_id)
            got = {k: v for k, v in rows[doc_id].items() if k != "doc_id"}
            assert got == expect

    def test_two_stage_pipeline_matches_fused(self, spark):
        from iceberg_evolve_spark.functions.video import (
            decode_avi_features,
            synth_avi_payload,
        )

        df = spark.range(0, 16).withColumnRenamed("id", "doc_id")
        fused = {r["doc_id"]: r.asDict() for r in synth_decode_features(df).collect()}
        two = {
            r["doc_id"]: r.asDict()
            for r in decode_avi_features(synth_avi_payload(df)).collect()
        }
        assert fused == two


class TestDecodePayloadRouting:
    def test_avi_routes_to_real_decoder(self):
        from iceberg_evolve_spark.functions.multimodal import decode_payload

        feats = decode_payload(
            _avi_bytes(5, *synth_params(5)), {"media_type": "video"}
        )
        assert feats["width"] == synth_params(5)[0]

    def test_mp4_routes_to_real_demuxer(self):
        from iceberg_evolve_spark.functions.mp4 import mp4_bytes
        from iceberg_evolve_spark.functions.multimodal import decode_payload

        feats = decode_payload(mp4_bytes(5), {"media_type": "video"})
        assert feats[0]["frame"] == 0 and feats[0]["width"] == 8

    def test_interframe_codec_video_still_stubbed(self):
        from iceberg_evolve_spark.functions.mp4 import mp4_bytes
        from iceberg_evolve_spark.functions.multimodal import decode_payload

        # an mp4 whose samples are H.264: demux succeeds, decode refuses
        q = bytearray(mp4_bytes(3))
        idx = q.find(b"jpeg", q.find(b"stsd"))
        q[idx : idx + 4] = b"avc1"
        with pytest.raises(NotImplementedError):
            decode_payload(bytes(q), {"media_type": "video"})
        # non-ISO-BMFF codec containers stay the loud stub
        with pytest.raises(NotImplementedError):
            decode_payload(b"\x1a\x45\xdf\xa3matroska....", {"media_type": "video"})


class TestAviProperties:
    """Property tests: the encoder/decoder pair honors the closed forms for
    ARBITRARY ids (not just the sampled battery), and the decoder is total
    over the whole synthesis domain."""

    def test_roundtrip_over_id_range(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=200, deadline=None)
        @given(st.integers(min_value=0, max_value=10**12))
        def check(doc_id):
            feats = decode_one_avi(_avi_bytes(doc_id, *synth_params(doc_id)))
            assert feats == _closed_forms(doc_id)

        check()

    def test_arbitrary_geometry_roundtrip(self):
        # decouple geometry from the id-derived synthesis: any (w even, h, n)
        # in the supported envelope must round-trip
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=100, deadline=None)
        @given(
            st.integers(min_value=0, max_value=10**6),
            st.integers(min_value=1, max_value=16).map(lambda x: 2 * x),
            st.integers(min_value=2, max_value=20),
            st.integers(min_value=1, max_value=12),
        )
        def check(doc_id, w, h, n):
            feats = decode_one_avi(_avi_bytes(doc_id, w, h, n))
            assert (feats["width"], feats["height"], feats["n_frames"]) == (w, h, n)
            assert feats["byte_len"] == 232 + n * (24 + _row_bytes(w) * h)
            b0 = (doc_id * 7) % 256
            assert feats["topleft_b"] == (b0 + 128) % 256
            assert feats["sum_b_first"] == w * ((h - 1) * b0 + (b0 + 128) % 256)

        check()


class TestMjpegAvi:
    """MJPEG-in-AVI (r6): codec video decoded by composition — AVI demux +
    per-frame baseline JPEG decode, sharing no code with the muxer."""

    def _closed(self, doc_id, f):
        import math

        from iceberg_evolve_spark.functions.jpeg import (
            FIX_B_CB,
            FIX_G_CB,
            FIX_G_CR,
            FIX_R_CR,
            block_ycc,
        )
        from iceberg_evolve_spark.functions.video import (
            MJPEG_FRAME_SEED_STEP,
            synth_mjpeg_params,
        )

        wb, hb, _ = synth_mjpeg_params(doc_id)
        seed = doc_id + MJPEG_FRAME_SEED_STEP * f
        sr = sg = sb = 0
        first = None
        for by in range(hb):
            for bx in range(wb):
                y, cb, cr = block_ycc(seed, bx, by)
                r = y + math.floor((FIX_R_CR * (cr - 128) + 32768) / 65536)
                g = y - math.floor(
                    (FIX_G_CB * (cb - 128) + FIX_G_CR * (cr - 128) + 32768) / 65536
                )
                b = y + math.floor((FIX_B_CB * (cb - 128) + 32768) / 65536)
                sr += 64 * r
                sg += 64 * g
                sb += 64 * b
                if bx == 0 and by == 0:
                    first = (r, g, b)
        return sr, sg, sb, first

    def test_every_frame_decodes_to_closed_forms(self):
        from iceberg_evolve_spark.functions.video import (
            _mjpeg_avi_bytes,
            decode_avi_mjpeg,
            synth_mjpeg_params,
        )

        for doc_id in (0, 1, 2, 7, 11, 123, 10**9 + 7):
            wb, hb, nf = synth_mjpeg_params(doc_id)
            frames = decode_avi_mjpeg(_mjpeg_avi_bytes(doc_id))
            assert len(frames) == nf
            for f, feat in enumerate(frames):
                assert (feat["width"], feat["height"]) == (wb * 8, hb * 8)
                sr, sg, sb, first = self._closed(doc_id, f)
                assert (feat["sum_r"], feat["sum_g"], feat["sum_b"]) == (sr, sg, sb)
                assert (
                    feat["first_px_r"],
                    feat["first_px_g"],
                    feat["first_px_b"],
                ) == first

    def test_compression_probe_and_routing(self):
        from iceberg_evolve_spark.functions.multimodal import decode_payload
        from iceberg_evolve_spark.functions.video import (
            MJPG_FOURCC,
            _mjpeg_avi_bytes,
            avi_compression,
            synth_mjpeg_params,
        )

        p = _mjpeg_avi_bytes(9)
        assert avi_compression(p) == MJPG_FOURCC
        # DIB AVIs probe as 0
        assert avi_compression(_avi_bytes(9, *synth_params(9))) == 0
        feats = decode_payload(p, {"media_type": "video"})
        assert isinstance(feats, list)
        assert len(feats) == synth_mjpeg_params(9)[2]

    def test_dib_decoder_still_refuses_mjpeg(self):
        from iceberg_evolve_spark.functions.video import _mjpeg_avi_bytes

        with pytest.raises(NotImplementedError):
            decode_one_avi(_mjpeg_avi_bytes(3))

    def test_mjpeg_decoder_refuses_interframe_codec(self):
        from iceberg_evolve_spark.functions.video import (
            MJPG_FOURCC,
            _mjpeg_avi_bytes,
            decode_avi_mjpeg,
        )

        p = bytearray(_mjpeg_avi_bytes(3))
        # strf biCompression lives 16 bytes into the strf payload (the
        # first 'MJPG' in the file is strh's fccHandler — not this field)
        i = p.find(b"strf")
        assert p[i + 8 + 16 : i + 8 + 20] == struct.pack("<I", MJPG_FOURCC)
        p[i + 8 + 16 : i + 8 + 20] = b"H264"
        with pytest.raises(NotImplementedError):
            decode_avi_mjpeg(bytes(p))

    def test_header_frame_size_cross_check(self):
        from iceberg_evolve_spark.functions.video import (
            _mjpeg_avi_bytes,
            decode_avi_mjpeg,
        )

        # corrupt the strf width so frame JPEGs disagree with the header
        p = bytearray(_mjpeg_avi_bytes(4))
        i = p.find(b"strf")
        struct.pack_into("<i", p, i + 8 + 4, 999)
        with pytest.raises(ValueError):
            decode_avi_mjpeg(bytes(p))

    def test_fused_spark_stage(self, spark):
        from iceberg_evolve_spark.functions.video import (
            synth_mjpeg_features,
            synth_mjpeg_params,
        )

        df = spark.range(0, 12)
        rows = synth_mjpeg_features(df, id_col="id").collect()
        assert len(rows) == sum(synth_mjpeg_params(d)[2] for d in range(12))
        by_key = {(r["doc_id"], r["frame"]): r for r in rows}
        sr, sg, sb, first = self._closed(7, 2)
        got = by_key[(7, 2)]
        assert (got["sum_r"], got["sum_g"], got["sum_b"]) == (sr, sg, sb)

    def test_mjpeg_property_roundtrip(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from iceberg_evolve_spark.functions.video import (
            _mjpeg_avi_bytes,
            decode_avi_mjpeg,
            synth_mjpeg_params,
        )

        @settings(max_examples=60, deadline=None)
        @given(st.integers(min_value=0, max_value=10**12))
        def check(doc_id):
            frames = decode_avi_mjpeg(_mjpeg_avi_bytes(doc_id))
            assert len(frames) == synth_mjpeg_params(doc_id)[2]
            for f, feat in enumerate(frames):
                sr, sg, sb, first = self._closed(doc_id, f)
                assert (feat["sum_r"], feat["sum_g"], feat["sum_b"]) == (sr, sg, sb)

        check()


class TestMp4:
    """ISO BMFF demux + intra-frame decode (`functions/mp4.py`)."""

    def _closed_form(self, doc_id):
        from iceberg_evolve_spark.functions.jpeg import (
            FIX_B_CB, FIX_G_CB, FIX_G_CR, FIX_R_CR, block_ycc,
        )
        from iceberg_evolve_spark.functions.mp4 import (
            MP4_FRAME_SEED_STEP, synth_mp4_params,
        )

        wb, hb, nf = synth_mp4_params(doc_id)
        rows = []
        for f in range(nf):
            seed = doc_id + MP4_FRAME_SEED_STEP * f
            sr = sg = sb = 0
            first = None
            for by in range(hb):
                for bx in range(wb):
                    y, cb, cr = block_ycc(seed, bx, by)
                    r = y + ((FIX_R_CR * (cr - 128) + 32768) >> 16)
                    g = y - ((FIX_G_CB * (cb - 128) + FIX_G_CR * (cr - 128) + 32768) >> 16)
                    b = y + ((FIX_B_CB * (cb - 128) + 32768) >> 16)
                    sr += 64 * r
                    sg += 64 * g
                    sb += 64 * b
                    if bx == 0 and by == 0:
                        first = (r, g, b)
            rows.append((f, wb * 8, hb * 8, sr, sg, sb) + first)
        return rows

    def test_every_sample_decodes_to_closed_forms(self):
        from iceberg_evolve_spark.functions.mp4 import decode_mp4_mjpeg, mp4_bytes

        for d in (0, 1, 2, 3, 7, 12, 99, 1000):
            for chunked in (False, True):
                got = [
                    (x["frame"], x["width"], x["height"], x["sum_r"], x["sum_g"],
                     x["sum_b"], x["first_px_r"], x["first_px_g"], x["first_px_b"])
                    for x in decode_mp4_mjpeg(mp4_bytes(d, chunked=chunked))
                ]
                assert got == self._closed_form(d), (d, chunked)

    def test_stsc_runs_change_layout_not_samples(self):
        # chunked=True splits samples over two chunks with different
        # samples-per-chunk; the demux must yield identical sample bytes
        from iceberg_evolve_spark.functions.mp4 import mp4_bytes, mp4_sample_table

        p1, p2 = mp4_bytes(5), mp4_bytes(5, chunked=True)
        t1, t2 = mp4_sample_table(p1), mp4_sample_table(p2)
        assert [p1[o : o + s] for o, s in t1["samples"]] == [
            p2[o : o + s] for o, s in t2["samples"]
        ]

    def test_interframe_codec_rejected_loudly(self):
        from iceberg_evolve_spark.functions.mp4 import decode_mp4_mjpeg, mp4_bytes

        q = bytearray(mp4_bytes(3))
        idx = q.find(b"jpeg", q.find(b"stsd"))
        q[idx : idx + 4] = b"avc1"
        with pytest.raises(NotImplementedError, match="avc1"):
            decode_mp4_mjpeg(bytes(q))

    def test_corrupt_inputs_fail_loudly(self):
        from iceberg_evolve_spark.functions.mp4 import decode_mp4_mjpeg, mp4_bytes

        p = mp4_bytes(4)
        with pytest.raises(ValueError, match="ftyp"):
            decode_mp4_mjpeg(p[:4] + b"XXXX" + p[8:])  # wrong leading box type
        with pytest.raises(ValueError, match="overruns"):
            decode_mp4_mjpeg(p[: len(p) // 2])  # truncated mid-box
        # stsz count inflated beyond the laid-out samples
        import struct

        q = bytearray(p)
        off = q.find(b"stsz")
        n = struct.unpack_from(">I", q, off + 12)[0]
        struct.pack_into(">I", q, off + 12, n + 3)
        with pytest.raises(ValueError):
            decode_mp4_mjpeg(bytes(q))

    def test_header_dimension_cross_check(self):
        # stsd width/height disagreeing with the coded JPEG must raise
        import struct

        from iceberg_evolve_spark.functions.mp4 import decode_mp4_mjpeg, mp4_bytes

        q = bytearray(mp4_bytes(6))
        idx = q.find(b"jpeg", q.find(b"stsd")) + 28  # width field in the entry
        struct.pack_into(">H", q, idx, 640)
        with pytest.raises(ValueError, match="stsd says"):
            decode_mp4_mjpeg(bytes(q))

    def test_fused_spark_stage(self, spark):
        from iceberg_evolve_spark.functions.mp4 import synth_mp4_features

        ids = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
        rows = synth_mp4_features(ids).orderBy("doc_id", "frame").collect()
        want = [
            (d,) + r for d in range(6) for r in self._closed_form(d)
        ]
        assert [tuple(r) for r in rows] == want
