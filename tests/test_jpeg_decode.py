"""Baseline-JPEG decode (`functions/jpeg.py`): encoder/decoder round-trip
under hypothesis against an INDEPENDENT double-loop IDCT reference (so a
mirrored encoder/decoder bug cannot cancel out), closed-form fixture
witnesses, cropping, colour-transform hand cases, and loud-failure guards
for every non-baseline feature."""

import math
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_evolve_spark.functions.jpeg import (
    ZIGZAG,
    _jpeg_bytes,
    block_ycc,
    decode_jpeg_planes,
    decode_one_jpeg,
    synth_jpeg_payload,
    synth_params,
    ycc_to_rgb,
)


def _ref_idct_block(coeffs):
    """Independent IDCT: textbook double loop, shares no code with the
    decoder's basis-matrix product."""
    out = [[0] * 8 for _ in range(8)]
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = math.sqrt((1 if u == 0 else 2) / 8)
                    cv = math.sqrt((1 if v == 0 else 2) / 8)
                    s += (
                        cu * cv * coeffs[u][v]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[x][y] = min(255, max(0, math.floor(s + 0.5) + 128))
    return out


class TestSpecConstants:
    def test_zigzag_prefix_matches_spec(self):
        # the canonical T.81 scan starts (0,0),(0,1),(1,0),(2,0),(1,1),(0,2),
        # (0,3),(1,2),(2,1),(3,0)
        assert ZIGZAG[:10] == [
            (0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
            (0, 2), (0, 3), (1, 2), (2, 1), (3, 0),
        ]
        assert len(ZIGZAG) == 64 and len(set(ZIGZAG)) == 64
        assert ZIGZAG[-1] == (7, 7)


sparse_block = st.lists(
    st.tuples(st.integers(0, 63), st.integers(-100, 100)),
    min_size=0,
    max_size=16,
).map(
    lambda pairs: [
        dict(pairs).get(i, 0) for i in range(64)
    ]
)


class TestRoundTrip:
    @given(st.lists(sparse_block, min_size=1, max_size=4))
    @settings(max_examples=30, deadline=None)
    def test_gray_blocks_match_independent_idct(self, blocks):
        """Arbitrary quantized blocks survive Huffman encode → decode →
        dequant → IDCT, equal to the independent reference per pixel."""
        w = 8 * len(blocks)
        width, height, planes = decode_jpeg_planes(_jpeg_bytes(w, 8, [blocks]))
        assert (width, height) == (w, 8)
        for m, blk in enumerate(blocks):
            deq = [[blk[r * 8 + c] * 8 for c in range(8)] for r in range(8)]
            got = planes[0][0:8, m * 8 : m * 8 + 8]
            assert got.tolist() == _ref_idct_block(deq)

    def test_dc_only_blocks_are_exact_constants(self):
        blk = [0] * 64
        blk[0] = -37
        _, _, planes = decode_jpeg_planes(_jpeg_bytes(8, 8, [[blk]]))
        assert (planes[0] == -37 + 128).all()

    def test_crop_to_non_multiple_dims(self):
        blocks = []
        for m in range(4):
            b = [0] * 64
            b[0] = 10 * m
            blocks.append(b)
        w, h, planes = decode_jpeg_planes(_jpeg_bytes(12, 10, [blocks]))
        assert (w, h) == (12, 10)
        assert planes[0].shape == (10, 12)
        # top-left block constant 128+0, second MCU (cols 8..11) 128+10
        assert planes[0][0, 0] == 128 and planes[0][0, 11] == 138

    @given(st.lists(sparse_block, min_size=2, max_size=6), st.integers(1, 3))
    @settings(max_examples=15, deadline=None)
    def test_restart_intervals_round_trip(self, blocks, interval):
        """DRI + RSTm markers: byte-aligned segments with DC-prediction
        resets decode identically to the unrestarted stream."""
        w = 8 * len(blocks)
        plain = decode_jpeg_planes(_jpeg_bytes(w, 8, [blocks]))
        restarted = decode_jpeg_planes(
            _jpeg_bytes(w, 8, [blocks], restart_interval=interval)
        )
        assert (plain[2][0] == restarted[2][0]).all()

    def test_restart_markers_present_in_stream(self):
        blocks = [[0] * 64 for _ in range(5)]
        p = _jpeg_bytes(40, 8, [blocks], restart_interval=2)
        assert b"\xff\xd0" in p and b"\xff\xd1" in p  # two restarts for 5 MCUs
        assert struct.pack(">BBHH", 0xFF, 0xDD, 4, 2) in p  # DRI segment

    def test_dc_prediction_chains_across_blocks(self):
        """DC is coded differentially; three blocks with distinct levels
        decode to their absolute values."""
        levels = [5, -90, 60]
        blocks = []
        for lv in levels:
            b = [0] * 64
            b[0] = lv
            blocks.append(b)
        _, _, planes = decode_jpeg_planes(_jpeg_bytes(24, 8, [blocks]))
        for m, lv in enumerate(levels):
            assert (planes[0][0:8, m * 8 : m * 8 + 8] == lv + 128).all()


class TestColour:
    def test_neutral_chroma_is_gray(self):
        assert ycc_to_rgb(100, 128, 128) == (100, 100, 100)

    def test_fixed_point_hand_case(self):
        # Cr=160: R = 100 + floor((91881*32+32768)/65536) = 100 + 45
        assert ycc_to_rgb(100, 128, 160)[0] == 145
        # Cb=96: B = 100 + floor((116130*-32+32768)/65536) = 100 - 57
        assert ycc_to_rgb(100, 96, 128)[2] == 43

    def test_clamping(self):
        r, g, b = ycc_to_rgb(250, 128, 255)
        assert r == 255  # clamped
        r, g, b = ycc_to_rgb(5, 128, 0)
        assert r == 0


class TestFixtures:
    @pytest.mark.parametrize("doc_id", [0, 1, 2, 7, 41, 123456])
    def test_features_match_closed_forms(self, doc_id):
        feats = decode_one_jpeg(synth_jpeg_payload(doc_id))
        wb, hb = synth_params(doc_id)
        assert (feats["width"], feats["height"]) == (wb * 8, hb * 8)
        assert feats["n_components"] == 3
        sums = [0, 0, 0]
        for by in range(hb):
            for bx in range(wb):
                rgb = ycc_to_rgb(*block_ycc(doc_id, bx, by))
                for i in range(3):
                    sums[i] += 64 * rgb[i]
        assert (feats["sum_r"], feats["sum_g"], feats["sum_b"]) == tuple(sums)
        first = ycc_to_rgb(*block_ycc(doc_id, 0, 0))
        assert (
            feats["first_px_r"], feats["first_px_g"], feats["first_px_b"]
        ) == first

    def test_fixture_rgb_never_needs_clamp(self):
        """The closed forms assume no clamping; verify the synth ranges."""
        for doc_id in range(200):
            wb, hb = synth_params(doc_id)
            for by in range(hb):
                for bx in range(wb):
                    y, cb, cr = block_ycc(doc_id, bx, by)
                    r = y + ((91881 * (cr - 128) + 32768) >> 16)
                    g = y - ((22554 * (cb - 128) + 46802 * (cr - 128) + 32768) >> 16)
                    b = y + ((116130 * (cb - 128) + 32768) >> 16)
                    assert 0 <= r <= 255 and 0 <= g <= 255 and 0 <= b <= 255


def _mutate_marker(payload: bytes, old: int, new: int) -> bytes:
    i = payload.index(bytes([0xFF, old]))
    return payload[:i + 1] + bytes([new]) + payload[i + 2:]


class TestGuards:
    def test_rejects_non_jpeg(self):
        with pytest.raises(ValueError, match="SOI"):
            decode_one_jpeg(b"BM123456")

    def test_rejects_progressive(self):
        p = _mutate_marker(synth_jpeg_payload(3), 0xC0, 0xC2)
        with pytest.raises(ValueError, match="baseline"):
            decode_one_jpeg(p)

    def test_rejects_16bit_quant_tables(self):
        p = synth_jpeg_payload(3)
        i = p.index(bytes([0xFF, 0xDB]))
        # DQT body starts at i+4: set Pq (high nibble) to 1
        p = p[: i + 4] + bytes([p[i + 4] | 0x10]) + p[i + 5 :]
        with pytest.raises(ValueError, match="16-bit"):
            decode_one_jpeg(p)

    def test_rejects_subsampling(self):
        p = bytearray(synth_jpeg_payload(3))
        i = p.index(bytes([0xFF, 0xC0]))
        p[i + 4 + 6 + 1] = 0x22  # component 0 sampling 2x2
        with pytest.raises(ValueError, match="subsampling"):
            decode_one_jpeg(bytes(p))

    def test_rejects_rst_without_dri(self):
        # an RST marker appearing in the scan of a DRI-less file is corrupt
        p = synth_jpeg_payload(3)
        i = p.index(b"\xff\xd9")
        with pytest.raises(ValueError, match="without a DRI"):
            decode_one_jpeg(p[:i] + b"\xff\xd0" + p[i:])

    def test_rejects_rst_sequence_error(self):
        blocks = [[0] * 64 for _ in range(4)]
        p = bytearray(_jpeg_bytes(32, 8, [blocks], restart_interval=1))
        i = p.index(b"\xff\xd1")  # second restart marker (sequence 1)
        p[i + 1] = 0xD5  # wrong sequence number
        with pytest.raises(ValueError, match="RST sequence"):
            decode_one_jpeg(bytes(p))

    def test_rejects_truncated_scan(self):
        p = synth_jpeg_payload(3)
        with pytest.raises(ValueError):
            decode_one_jpeg(p[:-4])


class TestRouter:
    def test_decode_payload_routes_jpeg(self):
        from iceberg_evolve_spark.functions.multimodal import decode_payload

        feats = decode_payload(
            synth_jpeg_payload(9), {"media_type": "image"}
        )
        wb, hb = synth_params(9)
        assert feats["width"] == wb * 8 and feats["n_components"] == 3


class TestSparkStage:
    def test_synth_decode_features(self, spark):
        from iceberg_evolve_spark.functions.jpeg import synth_decode_features

        df = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
        rows = {r["doc_id"]: r for r in synth_decode_features(df).collect()}
        assert len(rows) == 12
        for did, r in rows.items():
            wb, hb = synth_params(did)
            assert (r["width"], r["height"]) == (wb * 8, hb * 8)
            assert r["n_pixels"] == wb * hb * 64


class TestCanonicalHuffmanGenerality:
    """The DHT machinery must handle ANY spec-legal canonical table, not
    just the two tables our encoder writes: build random Kraft-valid
    BITS/HUFFVAL tables, encode random symbol streams with the encoder-side
    code map, and decode them back with the decoder-side
    mincode/maxcode/valptr structure."""

    @given(st.data())
    @settings(max_examples=40, deadline=None)
    def test_random_tables_round_trip(self, data):
        from iceberg_evolve_spark.functions.jpeg import (
            _BitReader,
            _BitWriter,
            _canonical_codes,
            _HuffTable,
        )

        # build a random Kraft-valid BITS vector greedily
        n_symbols = data.draw(st.integers(1, 40))
        bits = [0] * 16
        budget = 1.0
        placed = 0
        for length in range(1, 17):
            if placed >= n_symbols:
                break
            max_here = min(
                n_symbols - placed, int(budget * (1 << length)) - (1 if length < 16 else 0)
            )
            if max_here <= 0:
                continue
            take = data.draw(st.integers(0, max_here)) if length < 16 else max_here
            bits[length - 1] = take
            budget -= take / (1 << length)
            placed += take
        if placed < n_symbols:
            n_symbols = placed
        if n_symbols == 0:
            return
        vals = data.draw(
            st.lists(
                st.integers(0, 255), min_size=n_symbols, max_size=n_symbols, unique=True
            )
        )
        codes = _canonical_codes(bits, vals)
        stream = data.draw(st.lists(st.sampled_from(vals), min_size=1, max_size=64))
        w = _BitWriter()
        for s in stream:
            code, ln = codes[s]
            w.put(code, ln)
        payload = w.flush()
        # un-stuff (the writer stuffs 0xFF with 0x00, as in a real scan)
        unstuffed = bytearray()
        i = 0
        while i < len(payload):
            unstuffed.append(payload[i])
            if payload[i] == 0xFF:
                assert payload[i + 1] == 0x00
                i += 1
            i += 1
        table = _HuffTable(bits, vals)
        r = _BitReader(bytes(unstuffed))
        assert [table.decode(r) for _ in range(len(stream))] == stream
