"""Baseline-JPEG decode over binary media columns — no external libraries.

Extends the compressed-codec family past dictionary coding (GIF/LZW,
:mod:`.gif`) to a DCT-class codec: baseline sequential JFIF (ITU-T T.81),
the format every real image pipeline meets first. The payload's pixels are
recovered through the full baseline pipeline — marker walk, DQT/DHT parse,
canonical-Huffman entropy decode (DC prediction + magnitude EXTEND, AC
run/size with ZRL and EOB), zigzag → dequantize → 8×8 inverse DCT →
level shift → clamp, and fixed-point YCbCr→RGB for 3-component scans.

- :func:`_jpeg_bytes` hand-packs REAL ``.jpg`` bytes: SOI, JFIF APP0, DQT,
  SOF0, DHT, SOS, the byte-stuffed entropy-coded segment, EOI — assembled
  from the public T.81 spec, with the caller choosing the QUANTIZED
  coefficients per block (the encoder needs no forward DCT).
- :func:`decode_one_jpeg` parses those bytes with an independent reader:
  its Huffman decoder rebuilds mincode/maxcode/valptr tables from the DHT
  BITS/HUFFVAL bytes (T.81 Annex C/F algorithm — a different structure from
  the encoder's symbol→code dict), and its IDCT is the orthonormal basis
  product. Restart intervals (DRI + byte-aligned RSTm markers with DC
  prediction reset and sequence-number validation) are supported — they are
  part of baseline and what real encoders emit for error resilience.
  Non-baseline features fail loudly (progressive SOF2, 16-bit quant
  tables, chroma subsampling), mirroring the interlaced-GIF guard.

Exactness: the synthesized fixtures are DC-only blocks with a uniform
quant table of 8 — the dequantized DC passes through the IDCT as an exact
constant block (F(0,0)/8 is a power-of-two division, exact in binary
floating point), and the colour transform is defined in fixed-point
integer arithmetic (16.16, floor rounding), so every decoded pixel — and
therefore every feature — is an integer closed form of the id that the
DuckDB oracle replays without implementing JPEG. The general path (any
coefficients, any tables, cropping) is pinned by round-trip tests against
an independent double-loop IDCT reference.

Rounding conventions (deliberate, engine-portable): sample reconstruction
uses floor(x + 0.5) (round-half-up, not banker's), and the colour
transform is ``R = Y + (91881·(Cr−128) + 32768) >> 16`` etc. — Python's
arithmetic shift is floor division by 2^16, replayed in SQL as
``floor((…)/65536.0)`` (exact: the divisor is a power of two).

Scale notes: identical to gif.py — per-row Arrow decode inside
``mapInPandas``, no shuffle, batch-size-bounded memory.
"""

from __future__ import annotations

import math
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Spec constants (generated, not typed, to avoid transcription errors)
# --------------------------------------------------------------------------

#: Zigzag scan: position i in the coded stream -> (row, col) in the block.
ZIGZAG: list[tuple[int, int]] = []
for _d in range(15):
    _rng = range(max(0, _d - 7), min(_d, 7) + 1)
    for _r in _rng if _d % 2 == 1 else reversed(_rng):
        ZIGZAG.append((_r, _d - _r))

#: Orthonormal 8-point DCT basis, C[u, x] — IDCT is block = C.T @ F @ C.
_BASIS = np.array(
    [
        [
            math.sqrt((1.0 if u == 0 else 2.0) / 8.0)
            * math.cos((2 * x + 1) * u * math.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

#: 16.16 fixed-point YCbCr->RGB factors (JFIF matrix, rounded to 16 bits).
FIX_R_CR = 91881  # round(1.402  * 65536)
FIX_G_CB = 22554  # round(0.344136 * 65536)
FIX_G_CR = 46802  # round(0.714136 * 65536)
FIX_B_CB = 116130  # round(1.772 * 65536)

#: Custom spec-legal canonical Huffman tables (documented as custom — NOT
#: the Annex K examples): DC covers categories 0..11 over varied code
#: lengths (exercises multi-length canonical decode); AC gives EOB a short
#: code, ZRL the next, and every remaining (run,size) byte a 10-bit code so
#: the encoder can code ARBITRARY quantized blocks.
DC_BITS = [0, 2, 3, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 1, 1, 0, 0, 0, 0, 0, 0, 254, 0, 0, 0, 0, 0, 0]
AC_VALS = [0x00, 0xF0] + [
    b for b in range(256) if b not in (0x00, 0xF0)
]

#: Uniform quantization tables: DC step 8 makes the flat-block fixture
#: exact (dequant -> F00 = 8·level, IDCT -> level).
QT_LUMA = [8] * 64
QT_CHROMA = [8] * 64


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Encoder-side canonical code assignment: symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# --------------------------------------------------------------------------
# Hand-packed encoder (fixture side)
# --------------------------------------------------------------------------


class _BitWriter:
    """MSB-first bit packer with JPEG byte stuffing (0xFF -> 0xFF 0x00)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            pad = self.acc << (8 - self.n) | ((1 << (8 - self.n)) - 1)
            self.out.append(pad)
            if pad == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def _category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


def _encode_block(
    w: _BitWriter,
    coeffs: list[int],
    dc_pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    """Entropy-code one quantized block (natural order); returns its DC."""
    zz = [coeffs[r * 8 + c] for r, c in ZIGZAG]
    diff = zz[0] - dc_pred
    cat = _category(diff)
    code, length = dc_codes[cat]
    w.put(code, length)
    if cat:
        bits = diff if diff >= 0 else diff + (1 << cat) - 1
        w.put(bits, cat)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            w.put(c, ln)
            run -= 16
        s = _category(v)
        c, ln = ac_codes[(run << 4) | s]
        w.put(c, ln)
        bits = v if v >= 0 else v + (1 << s) - 1
        w.put(bits, s)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]  # EOB
        w.put(c, ln)
    return zz[0]


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _jpeg_bytes(
    width: int,
    height: int,
    comp_blocks: list[list[list[int]]],
    qts: tuple[list[int], ...] = (QT_LUMA, QT_CHROMA),
    restart_interval: int | None = None,
) -> bytes:
    """Assemble a real baseline JFIF file. ``comp_blocks[c]`` is that
    component's quantized 8×8 blocks (64 ints each, natural order) in MCU
    scan order (row-major over ceil(h/8) × ceil(w/8)); 1 component = gray,
    3 = YCbCr 4:4:4. Component 0 quantizes with table 0, others table 1.
    ``restart_interval`` emits a DRI segment and an RSTm marker (byte-
    aligned, DC predictors reset) after every ``restart_interval`` MCUs."""
    ncomp = len(comp_blocks)
    if ncomp not in (1, 3):
        raise ValueError("1 (gray) or 3 (YCbCr) components")
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, qt in enumerate(qts[: (2 if ncomp == 3 else 1)]):
        zz = bytes(qt[r * 8 + c] for r, c in ZIGZAG)
        out += _seg(0xDB, bytes([tq]) + zz)
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])  # 1×1 sampling
    out += _seg(0xC0, sof)
    dht = bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
    dht += bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
    out += _seg(0xC4, dht)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00])  # DC table 0, AC table 0 for all
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    w = _BitWriter()
    preds = [0] * ncomp
    n_mcus = len(comp_blocks[0])
    rst = 0
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            out += w.flush()
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            w = _BitWriter()
            preds = [0] * ncomp
        for c in range(ncomp):
            preds[c] = _encode_block(w, comp_blocks[c][m], preds[c], dc_codes, ac_codes)
    out += w.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Independent decoder
# --------------------------------------------------------------------------


class _BitReader:
    """MSB-first reader over the unstuffed entropy-coded segment."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy-coded segment")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


class _HuffTable:
    """T.81 Annex C/F canonical decode tables (mincode/maxcode/valptr) —
    rebuilt from the DHT BITS/HUFFVAL bytes, independent of the encoder's
    symbol→code dictionary."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1

    def decode(self, r: _BitReader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | r.bit()
            if self.maxcode[ln] >= code >= self.mincode[ln]:
                return self.vals[self.valptr[ln] + code - self.mincode[ln]]
        raise ValueError("invalid Huffman code")


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    return bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1


def _idct_block(coeffs: np.ndarray) -> np.ndarray:
    """Orthonormal 2-D IDCT + level shift + clamp; round-half-up."""
    f = _BASIS.T @ coeffs @ _BASIS
    return np.clip(np.floor(f + 0.5) + 128, 0, 255).astype(np.int64)


def ycc_to_rgb(y: int, cb: int, cr: int) -> tuple[int, int, int]:
    """Defined fixed-point (16.16, floor) JFIF colour transform — shared by
    the decoder, the synth closed forms, and the tests."""
    r = y + ((FIX_R_CR * (cr - 128) + 32768) >> 16)
    g = y - ((FIX_G_CB * (cb - 128) + FIX_G_CR * (cr - 128) + 32768) >> 16)
    b = y + ((FIX_B_CB * (cb - 128) + 32768) >> 16)
    clamp = lambda v: 0 if v < 0 else (255 if v > 255 else v)  # noqa: E731
    return clamp(r), clamp(g), clamp(b)


def decode_jpeg_planes(payload: bytes) -> tuple[int, int, list[np.ndarray]]:
    """Full baseline decode to per-component pixel planes (cropped to the
    SOF dimensions). Raises loudly on every non-baseline feature."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qts: dict[int, list[int]] = {}
    dc_tabs: dict[int, _HuffTable] = {}
    ac_tabs: dict[int, _HuffTable] = {}
    width = height = 0
    comps: list[tuple[int, int]] = []  # (component id, quant table id)
    scan: list[bytes] | None = None  # restart segments (one if no DRI)
    scan_tabs: list[tuple[int, int]] = []
    restart_interval = 0
    while scan is None:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}, got {payload[pos]:#x}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:
            raise ValueError("EOI before SOS")
        (seglen,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + seglen]
        pos += seglen
        if 0xE0 <= marker <= 0xEF or marker == 0xFE:
            continue  # APPn / COM
        if marker == 0xDB:
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 15
                if pq != 0:
                    raise ValueError("16-bit quantization tables not supported")
                zz = body[b + 1 : b + 65]
                nat = [0] * 64
                for i, (r, c) in enumerate(ZIGZAG):
                    nat[r * 8 + c] = zz[i]
                qts[tq] = nat
                b += 65
        elif marker == 0xC4:
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 15
                bits = list(body[b + 1 : b + 17])
                nv = sum(bits)
                vals = list(body[b + 17 : b + 17 + nv])
                (ac_tabs if tc else dc_tabs)[th] = _HuffTable(bits, vals)
                b += 17 + nv
        elif marker == 0xC0:
            _prec, height, width, nc = struct.unpack_from(">BHHB", body, 0)
            if _prec != 8:
                raise ValueError("only 8-bit precision supported")
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise ValueError(
                        "chroma subsampling not supported (4:4:4 only)"
                    )
                comps.append((cid, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential DCT (SOF0) supported")
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            ns = body[0]
            if ns != len(comps):
                raise ValueError("partial scans not supported")
            for c in range(ns):
                # Table selectors are read positionally, so the scan's
                # component order MUST equal SOF order — a spec-legal file
                # listing them differently would silently pair the wrong
                # quant/Huffman tables. Fail loudly instead (module policy).
                if body[1 + 2 * c] != comps[c][0]:
                    raise ValueError(
                        "SOS component order differs from SOF order"
                    )
                scan_tabs.append((body[2 + 2 * c] >> 4, body[2 + 2 * c] & 15))
            # unstuff the entropy-coded data up to EOI; RSTm markers split it
            # into byte-aligned restart segments (DC prediction resets there)
            segments: list[bytes] = []
            data = bytearray()
            while True:
                if pos + 1 >= len(payload):
                    raise ValueError("truncated scan: no EOI marker")
                byte = payload[pos]
                pos += 1
                if byte != 0xFF:
                    data.append(byte)
                    continue
                nxt = payload[pos]
                pos += 1
                if nxt == 0x00:
                    data.append(0xFF)
                elif nxt == 0xD9:
                    segments.append(bytes(data))
                    scan = segments
                    break
                elif 0xD0 <= nxt <= 0xD7:
                    if not restart_interval:
                        raise ValueError("RST marker without a DRI interval")
                    if nxt - 0xD0 != len(segments) % 8:
                        raise ValueError(
                            f"RST sequence error: got {nxt - 0xD0}, "
                            f"expected {len(segments) % 8}"
                        )
                    segments.append(bytes(data))
                    data = bytearray()
                else:
                    raise ValueError(f"unexpected marker in scan: {nxt:#x}")
        else:
            raise ValueError(f"unsupported marker {marker:#x}")
    if not comps or not width or not height:
        raise ValueError("missing SOF0 before SOS")
    wb, hb = (width + 7) // 8, (height + 7) // 8
    n_mcus = wb * hb
    if restart_interval:
        expect = -(-n_mcus // restart_interval)
        if len(scan) != expect:
            raise ValueError(
                f"DRI={restart_interval}: {len(scan)} restart segments for "
                f"{n_mcus} MCUs (expected {expect})"
            )
    elif len(scan) != 1:
        raise ValueError("restart segments present without DRI")
    planes = [np.zeros((hb * 8, wb * 8), dtype=np.int64) for _ in comps]
    reader = _BitReader(scan[0])
    preds = [0] * len(comps)
    mcu = 0
    for by in range(hb):
        for bx in range(wb):
            if restart_interval and mcu and mcu % restart_interval == 0:
                # byte-aligned restart: fresh segment, DC prediction resets
                reader = _BitReader(scan[mcu // restart_interval])
                preds = [0] * len(comps)
            mcu += 1
            for ci, (_cid, tq) in enumerate(comps):
                dct, act = scan_tabs[ci]
                sym = dc_tabs[dct].decode(reader)
                diff = _extend(reader.bits(sym), sym)
                preds[ci] += diff
                zz = [0] * 64
                zz[0] = preds[ci]
                k = 1
                while k < 64:
                    rs = ac_tabs[act].decode(reader)
                    if rs == 0x00:
                        break
                    if rs == 0xF0:
                        k += 16
                        continue
                    k += rs >> 4
                    if k > 63:
                        raise ValueError("AC run past end of block")
                    zz[k] = _extend(reader.bits(rs & 15), rs & 15)
                    k += 1
                q = qts[tq]
                coeffs = np.zeros((8, 8))
                for i, (r, c) in enumerate(ZIGZAG):
                    coeffs[r, c] = zz[i] * q[r * 8 + c]
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = _idct_block(
                    coeffs
                )
    return width, height, [p[:height, :width] for p in planes]


def decode_one_jpeg(payload: bytes) -> dict:
    """Decode + featurize: dimensions, per-channel sums over the decoded
    RGB pixels (gray ⇒ R=G=B=Y), first pixel. Exact integers throughout."""
    width, height, planes = decode_jpeg_planes(payload)
    if len(planes) == 1:
        y = planes[0]
        rgb = (y, y, y)
        first = (int(y[0, 0]),) * 3
    else:
        yp, cbp, crp = (p.astype(np.int64) for p in planes)
        r = yp + (FIX_R_CR * (crp - 128) + 32768 >> 16)
        g = yp - (FIX_G_CB * (cbp - 128) + FIX_G_CR * (crp - 128) + 32768 >> 16)
        b = yp + (FIX_B_CB * (cbp - 128) + 32768 >> 16)
        rgb = tuple(np.clip(p, 0, 255) for p in (r, g, b))
        first = tuple(int(p[0, 0]) for p in rgb)
    return {
        "width": width,
        "height": height,
        "n_pixels": width * height,
        "n_components": len(planes),
        "sum_r": int(rgb[0].sum()),
        "sum_g": int(rgb[1].sum()),
        "sum_b": int(rgb[2].sum()),
        "first_px_r": first[0],
        "first_px_g": first[1],
        "first_px_b": first[2],
    }


# --------------------------------------------------------------------------
# Deterministic fixtures (shared closed forms with the oracle)
# --------------------------------------------------------------------------


def synth_params(doc_id: int) -> tuple[int, int]:
    """(blocks across, blocks down) — dims are multiples of 8 so the sums
    have block-exact closed forms (the decoder itself handles cropping)."""
    return 1 + doc_id % 3, 1 + doc_id % 2


def block_ycc(doc_id: int, bx: int, by: int) -> tuple[int, int, int]:
    """Per-block flat YCbCr levels; ranges keep every RGB channel inside
    [0, 255] so the closed forms need no clamp branches."""
    y = 64 + ((doc_id * 7 + bx * 13 + by * 29) % 128)
    cb = 96 + ((doc_id * 3 + bx * 5 + by * 11) % 64)
    cr = 96 + ((doc_id * 5 + bx * 7 + by * 3) % 64)
    return y, cb, cr


def synth_jpeg_payload(doc_id: int) -> bytes:
    """A real 3-component baseline JFIF whose blocks are flat colours: the
    quantized DC level is (value − 128) with quant step 8, so the decoded
    plane value equals the chosen level exactly."""
    wb, hb = synth_params(doc_id)
    comp: list[list[list[int]]] = [[], [], []]
    for by in range(hb):
        for bx in range(wb):
            y, cb, cr = block_ycc(doc_id, bx, by)
            for ci, lvl in enumerate((y, cb, cr)):
                blk = [0] * 64
                blk[0] = lvl - 128
                comp[ci].append(blk)
    return _jpeg_bytes(wb * 8, hb * 8, comp)


JPEG_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("n_components", T.IntegerType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
        T.StructField("first_px_r", T.IntegerType()),
        T.StructField("first_px_g", T.IntegerType()),
        T.StructField("first_px_b", T.IntegerType()),
    ]
)


def synth_decode_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fused synth→encode→decode→features in ONE Arrow stage (the pattern
    of audio/image/video/gif: no intermediate payload materialization)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"].astype("int64"):
                d = int(d)
                feats = decode_one_jpeg(synth_jpeg_payload(d))
                feats["doc_id"] = d
                rows.append(feats)
            yield pd.DataFrame(rows)[[f.name for f in JPEG_FEATURE_SCHEMA.fields]]

    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(
        run, schema=JPEG_FEATURE_SCHEMA
    )
