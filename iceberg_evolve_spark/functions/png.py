"""Real PNG decode over binary media columns — stdlib only.

Completes the still-image codec matrix: BMP (uncompressed, ``image.py``),
GIF (dictionary/LZW, ``gif.py``), JPEG (transform/DCT, ``jpeg.py``), and
now PNG — the *prediction + DEFLATE* compression class. The container walk
(length/type/CRC chunks, IHDR geometry, concatenated IDAT) and the
scanline un-filtering (None/Sub/Up/Average/Paeth, per the PNG spec §9) are
implemented from scratch; the DEFLATE stream itself goes through stdlib
``zlib`` — a from-scratch inflate would re-prove what the GIF LZW decoder
already proves (bitstream dictionary decoding) without adding a new
algorithmic class.

Fixtures: the encoder packs REAL ``.png`` bytes (chunk CRCs included) with
the row filter type CYCLING through all five filters (``y % 5``), so the
decoder's Sub/Up/Average/Paeth arithmetic is exercised on every image, not
vacuously. Pixels follow the BMP fixture pattern (two columns, per-row
channel shift) so every decoded feature has the same exact integer closed
forms the oracle replays.

Scale shape: per-row decode in one fused Arrow stage, no shuffle; Arrow
batch size bounds memory (``multimodal.py`` discipline).
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def synth_params(doc_id: int) -> tuple[int, int, tuple[int, int, int], tuple[int, int, int]]:
    """(width, height, left RGB, right RGB) — multipliers differ from the
    BMP fixture so the two entries cannot accidentally validate each
    other's bytes."""
    w = 8 + (doc_id % 7)
    h = 5 + (doc_id % 5)  # >= 5 rows: every filter type 0..4 appears
    left = ((doc_id * 5) % 256, (doc_id * 9) % 256, (doc_id * 2) % 256)
    right = ((doc_id * 19) % 256, (doc_id * 23) % 256, (doc_id * 29) % 256)
    return w, h, left, right


def _pixel(doc_id: int, x: int, y: int, w: int) -> tuple[int, int, int]:
    _, _, left, right = synth_params(doc_id)
    base = left if x < w // 2 else right
    return tuple((c + y) % 256 for c in base)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def synth_png_payload(doc_id: int) -> bytes:
    """A real 8-bit RGB PNG whose scanline filters cycle 0..4 by row."""
    w, h, _, _ = synth_params(doc_id)
    bpp = 3
    raw_rows = [
        b"".join(bytes(_pixel(doc_id, x, y, w)) for x in range(w))
        for y in range(h)
    ]
    out = bytearray()
    prev = bytes(bpp * w)
    for y, row in enumerate(raw_rows):
        ft = y % 5
        out.append(ft)
        if ft == 0:
            out += row
        elif ft == 1:  # Sub
            out += bytes(
                (row[i] - (row[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(len(row))
            )
        elif ft == 2:  # Up
            out += bytes((row[i] - prev[i]) & 0xFF for i in range(len(row)))
        elif ft == 3:  # Average
            out += bytes(
                (row[i] - (((row[i - bpp] if i >= bpp else 0) + prev[i]) >> 1)) & 0xFF
                for i in range(len(row))
            )
        else:  # Paeth
            out += bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - bpp] if i >= bpp else 0,
                        prev[i],
                        prev[i - bpp] if i >= bpp else 0,
                    )
                )
                & 0xFF
                for i in range(len(row))
            )
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, truecolor
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out)))
        + _chunk(b"IEND", b"")
    )


def decode_one_png(payload: bytes) -> dict:
    """Independent parser: chunk walk with CRC validation, IHDR checks,
    IDAT concatenation, zlib inflate, and generic un-filtering. Only the
    fixture class (8-bit truecolor, no interlace) decodes; everything else
    raises loudly (palette/alpha/16-bit/Adam7 name themselves)."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, ctype_, comp, filt, interlace = ihdr
    if depth != 8 or ctype_ != 2:
        raise ValueError(
            f"only 8-bit truecolor decodes here (depth={depth}, color={ctype_})"
        )
    if comp != 0 or filt != 0:
        raise ValueError("unknown compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7 interlace not supported")
    raw = zlib.decompress(bytes(idat))
    bpp = 3
    stride = bpp * w
    if len(raw) != h * (1 + stride):
        raise ValueError("decompressed length mismatch")
    rows: list[bytes] = []
    prev = bytes(stride)
    for y in range(h):
        ft = raw[y * (1 + stride)]
        line = bytearray(raw[y * (1 + stride) + 1 : (y + 1) * (1 + stride)])
        if ft == 1:
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown filter type {ft}")
        rows.append(bytes(line))
        prev = bytes(line)
    sum_r = sum(r[0::3][i] for r in rows for i in range(w))
    sum_g = sum(r[1::3][i] for r in rows for i in range(w))
    sum_b = sum(r[2::3][i] for r in rows for i in range(w))
    return {
        "width": w,
        "height": h,
        "byte_len": len(payload),
        "sum_r": sum_r,
        "sum_g": sum_g,
        "sum_b": sum_b,
        "first_px_r": rows[0][0],
        "first_px_g": rows[0][1],
        "first_px_b": rows[0][2],
        "last_px_b": rows[h - 1][stride - 1],
    }


PNG_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
        T.StructField("first_px_r", T.IntegerType()),
        T.StructField("first_px_g", T.IntegerType()),
        T.StructField("first_px_b", T.IntegerType()),
        T.StructField("last_px_b", T.IntegerType()),
    ]
)


def synth_decode_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fused synth→encode→decode→features in ONE Arrow stage."""

    cols = [f.name for f in PNG_FEATURE_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"].astype("int64"):
                d = int(d)
                feats = decode_one_png(synth_png_payload(d))
                feats["doc_id"] = d
                del feats["byte_len"]
                rows.append(feats)
            yield pd.DataFrame(rows)[cols]

    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(
        run, schema=PNG_FEATURE_SCHEMA
    )
