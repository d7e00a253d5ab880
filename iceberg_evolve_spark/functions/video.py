"""Real video decode over binary media columns — no external libraries.

Completes the multimodal decode trilogy (audio: ``functions/audio.py``
RIFF/WAVE; image: ``functions/image.py`` BMP; video: this module). The
container is uncompressed RIFF/AVI with raw 24-bit DIB frames — a documented
public format that needs no codec, so the decode is *real* (header walk,
stream metadata, bottom-up padded BGR frame planes) while staying
stdlib+numpy-only. The reference repo has no media operators at all; this
belongs to the 100 TB training-data mandate (frame sampling / feature
extraction over opaque binary columns).

Design mirrors the audio module exactly:

- :func:`synth_avi_payload` hand-packs genuine ``.avi`` bytes with
  ``struct.pack`` (RIFF → LIST hdrl [avih, LIST strl [strh, strf]] →
  LIST movi [``00db`` raw frames] → idx1). Deliberately NOT written through
  any AVI library, so the decoder shares no code with the encoder.
- :func:`decode_avi_features` walks the RIFF chunk tree with an independent
  generic parser, validates the headers, reassembles each frame's bottom-up
  padded BGR rows with numpy, and samples the FIRST and LAST frames (frame
  sampling — decoding every frame of real video is the anti-pattern; samplers
  touch keyframes).

Every synthesized parameter is an integer function of the row id and every
frame is a solid body color with a distinct top row, so all decoded features
have exact integer closed forms — the DuckDB oracle checks the decode
bit-for-bit, including the bottom-up row order (the top-left pixel lives in
the LAST stored row; a top-down parser returns the body color instead).

Scale notes: per-row decode, no shuffle; Arrow batch size
(``spark.sql.execution.arrow.maxRecordsPerBatch``) is the only memory knob
when payloads are MB-scale. Real codec formats (H.264 etc.) would slot into
the same ``mapInPandas`` shape with a library import behind the same schema.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Fixed stream timing: rate/scale = 5 fps → 200_000 µs per frame.
USEC_PER_FRAME = 200_000
FPS_RATE = 5
FPS_SCALE = 1


def synth_params(doc_id: int) -> tuple[int, int, int]:
    """(width, height, n_frames) for a given id — one definition shared by
    tests and the oracle SQL."""
    width = 8 + (doc_id % 8) * 2
    height = 4 + (doc_id % 6) * 2
    n_frames = 2 + doc_id % 6
    return width, height, n_frames


def frame_colors(doc_id: int, f: int) -> tuple[int, int, int]:
    """Solid body color (B, G, R) of frame ``f``; the top image row uses
    ``(c + 128) % 256`` per channel as a row-order witness."""
    return (
        (doc_id * 7 + f * 31) % 256,
        (doc_id * 13 + f * 17) % 256,
        (doc_id * 3 + f * 5) % 256,
    )


def _row_bytes(width: int) -> int:
    return ((3 * width + 3) // 4) * 4  # DIB rows pad to 4-byte boundaries


def _frame_bytes(doc_id: int, f: int, width: int, height: int) -> bytes:
    """Bottom-up padded BGR plane: body color everywhere except the top image
    row (stored LAST in bottom-up order), which is shifted by +128 per
    channel."""
    rb = _row_bytes(width)
    b, g, r = frame_colors(doc_id, f)
    body = np.zeros((height, rb), dtype=np.uint8)
    body[:, 0 : 3 * width : 3] = b
    body[:, 1 : 3 * width : 3] = g
    body[:, 2 : 3 * width : 3] = r
    # top image row = last stored row (bottom-up)
    body[height - 1, 0 : 3 * width : 3] = (b + 128) % 256
    body[height - 1, 1 : 3 * width : 3] = (g + 128) % 256
    body[height - 1, 2 : 3 * width : 3] = (r + 128) % 256
    return body.tobytes()


def _avi_bytes(doc_id: int, width: int, height: int, n_frames: int) -> bytes:
    """Hand-assembled uncompressed AVI per the public RIFF/AVI spec."""
    d = _row_bytes(width) * height  # bytes per frame (already 4-aligned)

    avih = struct.pack(
        "<14I",
        USEC_PER_FRAME,
        d * FPS_RATE,        # max bytes/sec
        0,                   # padding granularity
        0x10,                # AVIF_HASINDEX
        n_frames,
        0,                   # initial frames
        1,                   # streams
        d,                   # suggested buffer size
        width,
        height,
        0, 0, 0, 0,          # reserved
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4h",
        b"vids",
        b"DIB ",
        0,                   # flags
        0,                   # priority
        0,                   # language
        0,                   # initial frames
        FPS_SCALE,
        FPS_RATE,            # rate/scale = fps
        0,                   # start
        n_frames,            # length (in frames)
        d,                   # suggested buffer size
        0,                   # quality
        0,                   # sample size (0 = varies)
        0, 0, width, height, # rcFrame left, top, right, bottom
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, 0, d, 0, 0, 0, 0,
    )

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(payload)) + payload

    def list_chunk(kind: bytes, payload: bytes) -> bytes:
        return b"LIST" + struct.pack("<I", 4 + len(payload)) + kind + payload

    strl = list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = list_chunk(b"hdrl", chunk(b"avih", avih) + strl)

    frames = [
        chunk(b"00db", _frame_bytes(doc_id, f, width, height))
        for f in range(n_frames)
    ]
    movi = list_chunk(b"movi", b"".join(frames))

    idx_entries = []
    offset = 4  # idx1 offsets are relative to the 'movi' fourcc
    for f in range(n_frames):
        idx_entries.append(struct.pack("<4sIII", b"00db", 0x10, offset, d))
        offset += 8 + d
    idx1 = chunk(b"idx1", b"".join(idx_entries))

    body = hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


# ---------------------------------------------------------------------------
# Independent decoder: generic RIFF chunk walker + numpy frame reassembly
# ---------------------------------------------------------------------------


def _walk(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, size) for each chunk in [start, end)."""
    pos = start
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def decode_one_avi(payload: bytes) -> dict:
    """Decode one AVI binary: header metadata + first/last frame sampling.

    Geometry comes from the stream format header (``strf`` /
    BITMAPINFOHEADER) — the authoritative source; real-world muxers often
    leave ``avih`` dwWidth/dwHeight as 0 — with ``avih`` kept for the timing
    metadata and total-frame cross-check. Codec-compressed streams
    (``biCompression != 0`` or a non-24bpp layout) raise
    ``NotImplementedError`` so they surface as the documented stub, not a
    reshape crash deep in a task."""
    if payload[0:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    avih = None
    strf = None
    frames: list[tuple[int, int]] = []
    for fourcc, off, size in _walk(payload, 12, len(payload)):
        if fourcc != b"LIST":
            continue
        kind = payload[off : off + 4]
        if kind == b"hdrl":
            for fc2, off2, size2 in _walk(payload, off + 4, off + size):
                if fc2 == b"avih":
                    avih = struct.unpack_from("<14I", payload, off2)
                elif fc2 == b"LIST" and payload[off2 : off2 + 4] == b"strl":
                    for fc3, off3, _sz3 in _walk(payload, off2 + 4, off2 + size2):
                        if fc3 == b"strf" and strf is None:
                            strf = struct.unpack_from("<IiiHHI", payload, off3)
        elif kind == b"movi":
            frames = [
                (o, s)
                for fc2, o, s in _walk(payload, off + 4, off + size)
                if fc2[2:4] in (b"db", b"dc")
            ]
    if avih is None:
        raise ValueError("missing avih header")
    if strf is None:
        raise ValueError("missing strf (BITMAPINFOHEADER) stream format")
    usec, _, _, _, n_frames = avih[:5]
    _, width, height, _planes, bitcount, compression = strf
    if compression != 0 or bitcount != 24:
        raise NotImplementedError(
            f"codec-compressed AVI (biCompression={compression}, "
            f"biBitCount={bitcount}) needs a real codec; only uncompressed "
            "24-bit DIB streams decode here"
        )
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid strf geometry {width}x{height}")
    if len(frames) != n_frames:
        raise ValueError(f"frame count mismatch: {len(frames)} != {n_frames}")

    rb = _row_bytes(width)

    def plane(i: int) -> np.ndarray:
        off, size = frames[i]
        if size != rb * height:
            raise ValueError(
                f"frame {i} is {size} bytes, expected {rb * height} for "
                f"{width}x{height}@24bpp"
            )
        raw = np.frombuffer(payload, dtype=np.uint8, count=size, offset=off)
        rows = raw.reshape(height, rb)[:, : 3 * width]
        # bottom-up: last stored row is the top image row
        img = rows.reshape(height, width, 3)[::-1]
        return img.astype(np.int64)

    first, last = plane(0), plane(n_frames - 1)
    return {
        "byte_len": len(payload),
        "width": int(width),
        "height": int(height),
        "n_frames": int(n_frames),
        "usec_per_frame": int(usec),
        "topleft_b": int(first[0, 0, 0]),
        "topleft_g": int(first[0, 0, 1]),
        "topleft_r": int(first[0, 0, 2]),
        "sum_b_first": int(first[:, :, 0].sum()),
        "sum_b_last": int(last[:, :, 0].sum()),
        "motion": int(
            np.abs(last[height - 1, 0] - first[height - 1, 0]).sum()
        ),
    }


MOTION_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame", T.IntegerType()),
        T.StructField("abs_diff", T.LongType()),
    ]
)


def decode_avi_motion(payload: bytes) -> list[dict]:
    """Per-frame MOTION PROFILE — the scene-change primitive the first/last
    sample of :func:`decode_one_avi` approximates: decode EVERY frame and
    report, for each consecutive pair, the exact integer total absolute
    per-channel pixel difference. Same chunk walk and DIB handling; every
    value is an integer so the profile hash-gates."""
    if payload[0:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    strf = None
    frames: list[tuple[int, int]] = []
    for fourcc, off, size in _walk(payload, 12, len(payload)):
        if fourcc != b"LIST":
            continue
        kind = payload[off : off + 4]
        if kind == b"hdrl":
            for fc2, off2, size2 in _walk(payload, off + 4, off + size):
                if fc2 == b"LIST" and payload[off2 : off2 + 4] == b"strl":
                    for fc3, off3, _sz3 in _walk(payload, off2 + 4, off2 + size2):
                        if fc3 == b"strf" and strf is None:
                            strf = struct.unpack_from("<IiiHHI", payload, off3)
        elif kind == b"movi":
            frames = [
                (o, s)
                for fc2, o, s in _walk(payload, off + 4, off + size)
                if fc2[2:4] in (b"db", b"dc")
            ]
    if strf is None:
        raise ValueError("missing strf (BITMAPINFOHEADER) stream format")
    _, width, height, _planes, bitcount, compression = strf
    if compression != 0 or bitcount != 24:
        raise NotImplementedError("only uncompressed 24-bit DIB streams decode")
    rb = _row_bytes(width)

    def plane(i: int) -> np.ndarray:
        off, size = frames[i]
        raw = np.frombuffer(payload, dtype=np.uint8, count=size, offset=off)
        return raw.reshape(height, rb)[:, : 3 * width].astype(np.int64)

    out = []
    prev = plane(0)
    for f in range(1, len(frames)):
        cur = plane(f)
        out.append({"frame": f, "abs_diff": int(np.abs(cur - prev).sum())})
        prev = cur
    return out


def synth_motion_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fused synth→encode→full-frame decode→motion rows in ONE Arrow stage;
    one output row per consecutive frame pair."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf[id_col].astype("int64"):
                d = int(d)
                w, h, nf = synth_params(d)
                payload = _avi_bytes(d, w, h, nf)
                for feat in decode_avi_motion(payload):
                    feat["doc_id"] = d
                    rows.append(feat)
            yield pd.DataFrame(rows)[[f.name for f in MOTION_SCHEMA.fields]]

    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(
        run, schema=MOTION_SCHEMA
    )


VIDEO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("usec_per_frame", T.LongType()),
        T.StructField("topleft_b", T.IntegerType()),
        T.StructField("topleft_g", T.IntegerType()),
        T.StructField("topleft_r", T.IntegerType()),
        T.StructField("sum_b_first", T.LongType()),
        T.StructField("sum_b_last", T.LongType()),
        T.StructField("motion", T.LongType()),
    ]
)

_FEATURE_DTYPES = {
    "doc_id": "int64",
    "byte_len": "int64",
    "width": "int32",
    "height": "int32",
    "n_frames": "int32",
    "usec_per_frame": "int64",
    "topleft_b": "int32",
    "topleft_g": "int32",
    "topleft_r": "int32",
    "sum_b_first": "int64",
    "sum_b_last": "int64",
    "motion": "int64",
}

AVI_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def synth_avi_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id) -> (id, payload) with a real AVI binary per row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [
                        _avi_bytes(int(d), *synth_params(int(d))) for d in ids
                    ],
                }
            )

    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(run, schema=AVI_SCHEMA)


def decode_avi_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched AVI decode: (id, payload) -> video feature row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_one_avi(p) for p in pdf[payload_col]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf[id_col].astype("int64").values)
            yield out.astype(_FEATURE_DTYPES)

    return df.select(id_col, payload_col).mapInPandas(run, schema=VIDEO_FEATURE_SCHEMA)


def synth_decode_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fused synth→decode in ONE Arrow stage (harness/bench path; bytes are
    still really encoded and really parsed per row — they just don't
    round-trip JVM→Python→JVM between two stages). Real ingest uses
    :func:`decode_avi_features` on an existing binary column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            feats = [
                decode_one_avi(_avi_bytes(int(d), *synth_params(int(d))))
                for d in ids
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", ids.values)
            yield out.astype(_FEATURE_DTYPES)

    return df.select(id_col).mapInPandas(run, schema=VIDEO_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# MJPEG-in-AVI: codec-compressed video from already-proven parts (r6)
# ---------------------------------------------------------------------------
# Motion-JPEG is the one mainstream *codec* video format that decomposes
# exactly into components this package already decodes from scratch: an AVI
# chunk walk (above) whose ``00dc`` frames are each a complete baseline JFIF
# (functions/jpeg.py — Huffman + dequant + IDCT + fixed-point YCbCr→RGB).
# biCompression = 'MJPG' marks the stream; inter-frame codecs (H.264/mp4)
# still raise the documented NotImplementedError.

#: 'MJPG' as the little-endian BITMAPINFOHEADER biCompression value.
MJPG_FOURCC = struct.unpack("<I", b"MJPG")[0]


def synth_mjpeg_params(doc_id: int) -> tuple[int, int, int]:
    """(blocks across, blocks down, n_frames) — frame geometry reuses the
    JPEG fixture grid (multiples of 8), frame count varies per id."""
    return 1 + doc_id % 3, 1 + doc_id % 2, 2 + doc_id % 4


#: Per-frame JPEG fixtures reuse jpeg.block_ycc keyed by this shifted seed,
#: so frame f of doc d decodes like a standalone JPEG of id d + 977·f —
#: one closed form shared by the Spark decoder, the oracle, and the tests.
MJPEG_FRAME_SEED_STEP = 977


def _mjpeg_frame_jpeg(doc_id: int, f: int, wb: int, hb: int) -> bytes:
    """One frame = a real DC-only baseline JFIF (quant step 8, flat blocks),
    encoded by the jpeg module's writer."""
    from iceberg_evolve_spark.functions.jpeg import _jpeg_bytes, block_ycc

    seed = doc_id + MJPEG_FRAME_SEED_STEP * f
    comp: list[list[list[int]]] = [[], [], []]
    for by in range(hb):
        for bx in range(wb):
            y, cb, cr = block_ycc(seed, bx, by)
            for ci, lvl in enumerate((y, cb, cr)):
                blk = [0] * 64
                blk[0] = lvl - 128
                comp[ci].append(blk)
    return _jpeg_bytes(wb * 8, hb * 8, comp)


def _mjpeg_avi_bytes(doc_id: int) -> bytes:
    """Hand-assembled MJPEG AVI: same RIFF skeleton as :func:`_avi_bytes`
    but fccHandler/biCompression = 'MJPG' and ``00dc`` (compressed) frame
    chunks of varying size."""
    wb, hb, n_frames = synth_mjpeg_params(doc_id)
    width, height = wb * 8, hb * 8
    jpegs = [_mjpeg_frame_jpeg(doc_id, f, wb, hb) for f in range(n_frames)]
    bufsz = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<14I",
        USEC_PER_FRAME, bufsz * FPS_RATE, 0, 0x10, n_frames, 0, 1,
        bufsz, width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4h",
        b"vids", b"MJPG", 0, 0, 0, 0,
        FPS_SCALE, FPS_RATE, 0, n_frames, bufsz, 0, 0,
        0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, MJPG_FOURCC, bufsz, 0, 0, 0, 0,
    )

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def list_chunk(kind: bytes, payload: bytes) -> bytes:
        return b"LIST" + struct.pack("<I", 4 + len(payload)) + kind + payload

    strl = list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = list_chunk(b"hdrl", chunk(b"avih", avih) + strl)
    movi = list_chunk(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    body = hdrl + movi
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


def avi_compression(payload: bytes) -> int:
    """biCompression of the first video stream (0 = uncompressed DIB,
    'MJPG' = Motion-JPEG, anything else = a real inter-frame codec)."""
    if payload[0:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    for fourcc, off, size in _walk(payload, 12, len(payload)):
        if fourcc == b"LIST" and payload[off : off + 4] == b"hdrl":
            for fc2, off2, size2 in _walk(payload, off + 4, off + size):
                if fc2 == b"LIST" and payload[off2 : off2 + 4] == b"strl":
                    for fc3, off3, _sz3 in _walk(payload, off2 + 4, off2 + size2):
                        if fc3 == b"strf":
                            return struct.unpack_from("<IiiHHI", payload, off3)[5]
    raise ValueError("missing strf (BITMAPINFOHEADER) stream format")


def decode_avi_mjpeg(payload: bytes) -> list[dict]:
    """Decode EVERY frame of an MJPEG AVI through the from-scratch JPEG
    decoder; one dict per frame with exact-integer features (the same
    surface as ``jpeg.decode_one_jpeg``, plus the frame index).

    Raises ``NotImplementedError`` for non-MJPG compression — inter-frame
    codecs genuinely need a codec library; Motion-JPEG does not, because
    every frame is self-contained."""
    from iceberg_evolve_spark.functions.jpeg import decode_one_jpeg

    if payload[0:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    strf = None
    frames: list[tuple[int, int]] = []
    for fourcc, off, size in _walk(payload, 12, len(payload)):
        if fourcc != b"LIST":
            continue
        kind = payload[off : off + 4]
        if kind == b"hdrl":
            for fc2, off2, size2 in _walk(payload, off + 4, off + size):
                if fc2 == b"LIST" and payload[off2 : off2 + 4] == b"strl":
                    for fc3, off3, _sz3 in _walk(payload, off2 + 4, off2 + size2):
                        if fc3 == b"strf" and strf is None:
                            strf = struct.unpack_from("<IiiHHI", payload, off3)
        elif kind == b"movi":
            frames = [
                (o, s)
                for fc2, o, s in _walk(payload, off + 4, off + size)
                if fc2[2:4] in (b"db", b"dc")
            ]
    if strf is None:
        raise ValueError("missing strf (BITMAPINFOHEADER) stream format")
    _, width, height, _planes, _bitcount, compression = strf
    if compression != MJPG_FOURCC:
        raise NotImplementedError(
            f"biCompression={compression:#x} needs an inter-frame codec; "
            "only MJPG (per-frame JPEG) decodes here"
        )
    out = []
    for f, (off, size) in enumerate(frames):
        feats = decode_one_jpeg(payload[off : off + size])
        if feats["width"] != width or feats["height"] != height:
            raise ValueError(
                f"frame {f} is {feats['width']}x{feats['height']}, "
                f"stream header says {width}x{height}"
            )
        feats["frame"] = f
        out.append(feats)
    return out


MJPEG_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
        T.StructField("first_px_r", T.IntegerType()),
        T.StructField("first_px_g", T.IntegerType()),
        T.StructField("first_px_b", T.IntegerType()),
    ]
)


def synth_mjpeg_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fused synth→mux→demux→per-frame JPEG decode in ONE Arrow stage; one
    output row per frame. The AVI bytes are really assembled and really
    re-parsed per row (encoder and decoder share no code)."""

    cols = [f.name for f in MJPEG_FEATURE_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"].astype("int64"):
                d = int(d)
                for feat in decode_avi_mjpeg(_mjpeg_avi_bytes(d)):
                    feat["doc_id"] = d
                    rows.append(feat)
            yield pd.DataFrame(rows)[cols]

    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(
        run, schema=MJPEG_FEATURE_SCHEMA
    )
