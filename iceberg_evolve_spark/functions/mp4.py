"""From-scratch MP4 (ISO BMFF) demux for intra-frame video payloads.

The round-6 MJPEG/AVI work proved the *codec* half of video decode (every
frame a self-contained baseline JFIF through the from-scratch JPEG decoder);
this module proves the *container* half for the format modern pipelines
actually ship: the ISO Base Media File Format (MP4, ISO/IEC 14496-12).

Implemented from the public spec, no codec/container libraries:

- **box walk** — size(4, big-endian) + type(4) headers, 64-bit ``largesize``
  and size-0 (= to end) forms both handled;
- **sample-table demux** — ``moov/trak/mdia`` traversal selecting the
  ``hdlr = 'vide'`` track, then the ``stbl`` sample tables: ``stsd`` (sample
  description + coded dimensions), ``stsz`` (sizes, fixed or per-sample),
  ``stsc`` (sample→chunk runs), ``stco``/``co64`` (chunk offsets) — composed
  into absolute (offset, size) per sample exactly as a player does;
- **intra-frame decode** — ``'jpeg'``/``'mjpa'`` sample entries (QuickTime
  Motion-JPEG in MP4) decode per-sample through
  :func:`iceberg_evolve_spark.functions.jpeg.decode_one_jpeg`.

Inter-frame codecs (``avc1``/H.264, ``hev1``/HEVC, ``mp4v``) raise a loud
``NotImplementedError`` — entropy decoding those genuinely needs a codec
library; the container demux above still yields their sample layout.

Scale shape: one fused Arrow ``mapInPandas`` stage, no shuffle; per-row work
is bounded by the payload size, and the demux reads only box headers + sample
tables before touching sample bytes (metadata-proportional, the same
discipline as the parquet footer-stats reader).

The reference system (anatol-ju/iceberg-evolve) has no multimodal layer
(SURVEY.md §2.2); this is north-star extension work.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Frame f of doc d encodes the JPEG closed-form fixture seeded
#: ``d + MP4_FRAME_SEED_STEP·f`` — a different constant from the AVI/MJPEG
#: fixtures (977) so the two container entries cannot mask each other.
MP4_FRAME_SEED_STEP = 1193

_INTRA_FOURCCS = (b"jpeg", b"mjpa")


# --------------------------------------------------------------------------
# box walk
# --------------------------------------------------------------------------


def walk_boxes(buf: bytes, start: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield ``(type, payload_offset, payload_size)`` for each box in
    ``buf[start:end]``, handling the 64-bit ``largesize`` and size-0
    (extends to end) forms. Malformed sizes fail loudly with the offset."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError(f"truncated box header at offset {pos}")
        size = struct.unpack_from(">I", buf, pos)[0]
        btype = bytes(buf[pos + 4 : pos + 8])
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError(f"truncated largesize header at offset {pos}")
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"box {btype!r} at offset {pos} overruns the file")
        yield btype, pos + hdr, size - hdr
        pos += size


def _find(buf: bytes, start: int, end: int, btype: bytes) -> tuple[int, int] | None:
    for t, off, size in walk_boxes(buf, start, end):
        if t == btype:
            return off, size
    return None


# --------------------------------------------------------------------------
# sample-table demux
# --------------------------------------------------------------------------


def mp4_sample_table(payload: bytes) -> dict:
    """Demux the first video track → ``{"fourcc", "width", "height",
    "samples": [(abs_offset, size), ...]}`` by composing the stbl tables.
    Works for ANY codec — the sample layout is container-level."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF file (missing leading ftyp box)")
    moov = _find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("missing moov box")
    for t, t_off, t_size in walk_boxes(payload, moov[0], moov[0] + moov[1]):
        if t != b"trak":
            continue
        mdia = _find(payload, t_off, t_off + t_size, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(payload, mdia[0], mdia[0] + mdia[1], b"hdlr")
        if hdlr is None or payload[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        minf = _find(payload, mdia[0], mdia[0] + mdia[1], b"minf")
        stbl = minf and _find(payload, minf[0], minf[0] + minf[1], b"stbl")
        if not stbl:
            raise ValueError("video trak without minf/stbl")
        return _parse_stbl(payload, stbl[0], stbl[0] + stbl[1])
    raise ValueError("no video (hdlr='vide') track in moov")


def _parse_stbl(payload: bytes, start: int, end: int) -> dict:
    boxes = {t: (off, size) for t, off, size in walk_boxes(payload, start, end)}
    for required in (b"stsd", b"stsz", b"stsc"):
        if required not in boxes:
            raise ValueError(f"stbl missing required {required!r} table")
    if b"stco" not in boxes and b"co64" not in boxes:
        raise ValueError("stbl missing chunk-offset table (stco/co64)")

    # stsd: full box → entry_count, then the first (visual) sample entry
    off = boxes[b"stsd"][0]
    n_desc = struct.unpack_from(">I", payload, off + 4)[0]
    if n_desc < 1:
        raise ValueError("empty stsd sample-description table")
    e0 = off + 8
    fourcc = bytes(payload[e0 + 4 : e0 + 8])
    # VisualSampleEntry: 6 reserved + 2 data_ref_index + 2+2+12 pre/reserved,
    # then width(2), height(2)
    width, height = struct.unpack_from(">HH", payload, e0 + 32)

    # stsz: fixed sample_size or a per-sample list
    off = boxes[b"stsz"][0]
    fixed, n_samples = struct.unpack_from(">II", payload, off + 4)
    if fixed:
        sizes = [fixed] * n_samples
    else:
        sizes = list(struct.unpack_from(f">{n_samples}I", payload, off + 12))

    # stco / co64: chunk offsets (absolute file offsets)
    if b"stco" in boxes:
        off = boxes[b"stco"][0]
        n_chunks = struct.unpack_from(">I", payload, off + 4)[0]
        chunk_offsets = list(struct.unpack_from(f">{n_chunks}I", payload, off + 8))
    else:
        off = boxes[b"co64"][0]
        n_chunks = struct.unpack_from(">I", payload, off + 4)[0]
        chunk_offsets = list(struct.unpack_from(f">{n_chunks}Q", payload, off + 8))

    # stsc: (first_chunk, samples_per_chunk, desc_idx) runs — a run covers
    # chunks [first_chunk, next run's first_chunk)
    off = boxes[b"stsc"][0]
    n_runs = struct.unpack_from(">I", payload, off + 4)[0]
    runs = [
        struct.unpack_from(">III", payload, off + 8 + 12 * i) for i in range(n_runs)
    ]
    if not runs or runs[0][0] != 1:
        raise ValueError("stsc must start at first_chunk=1")

    samples: list[tuple[int, int]] = []
    si = 0
    for ci, base in enumerate(chunk_offsets, start=1):
        spc = next(
            run[1] for run in reversed(runs) if run[0] <= ci
        )  # largest first_chunk ≤ ci
        pos = base
        for _ in range(spc):
            if si >= n_samples:
                break
            samples.append((pos, sizes[si]))
            pos += sizes[si]
            si += 1
    if si != n_samples:
        raise ValueError(
            f"sample tables inconsistent: {si} samples laid out, stsz says {n_samples}"
        )
    for s_off, s_size in samples:
        if s_off + s_size > len(payload):
            raise ValueError("sample extends past end of file — corrupt tables")
    return {"fourcc": fourcc, "width": width, "height": height, "samples": samples}


def decode_mp4_mjpeg(payload: bytes) -> list[dict]:
    """Decode every sample of an intra-frame (Motion-JPEG) MP4 through the
    from-scratch JPEG decoder; one dict per frame, same feature surface as
    :func:`video.decode_avi_mjpeg`. Inter-frame codecs raise loudly."""
    from iceberg_evolve_spark.functions.jpeg import decode_one_jpeg

    table = mp4_sample_table(payload)
    if table["fourcc"] not in _INTRA_FOURCCS:
        raise NotImplementedError(
            f"sample entry {table['fourcc']!r} needs an inter-frame codec "
            "(H.264/HEVC entropy decode); only intra-frame "
            f"{_INTRA_FOURCCS} decode here — the demux above still "
            "yielded its sample layout"
        )
    out = []
    for f, (off, size) in enumerate(table["samples"]):
        feats = decode_one_jpeg(payload[off : off + size])
        if feats["width"] != table["width"] or feats["height"] != table["height"]:
            raise ValueError(
                f"sample {f} is {feats['width']}x{feats['height']}, "
                f"stsd says {table['width']}x{table['height']}"
            )
        feats["frame"] = f
        out.append(feats)
    return out


# --------------------------------------------------------------------------
# fixture muxer (shares NO code with the demuxer above)
# --------------------------------------------------------------------------


def synth_mp4_params(doc_id: int) -> tuple[int, int, int]:
    """(blocks across, blocks down, n_frames) — same grid family as the
    MJPEG/AVI fixtures but phase-shifted so the two entries differ."""
    return 1 + (doc_id + 1) % 3, 1 + (doc_id + 1) % 2, 2 + (doc_id + 2) % 4


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, payload: bytes, version: int = 0, flags: int = 0) -> bytes:
    return _box(btype, struct.pack(">I", (version << 24) | flags) + payload)


_UNITY_MATRIX = struct.pack(
    ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def mp4_bytes(doc_id: int, chunked: bool = False) -> bytes:
    """Hand-assembled intra-frame MP4: ftyp + mdat (concatenated per-frame
    DC-only JFIFs from the jpeg fixture writer, seeded
    ``doc_id + 1193·frame``) + a complete moov with real sample tables.
    ``chunked=True`` splits samples across two chunks with different
    samples-per-chunk so the stsc run logic is genuinely exercised."""
    from iceberg_evolve_spark.functions.jpeg import _jpeg_bytes, block_ycc

    wb, hb, n_frames = synth_mp4_params(doc_id)
    width, height = wb * 8, hb * 8
    jpegs = []
    for f in range(n_frames):
        seed = doc_id + MP4_FRAME_SEED_STEP * f
        comp: list[list[list[int]]] = [[], [], []]
        for by in range(hb):
            for bx in range(wb):
                y, cb, cr = block_ycc(seed, bx, by)
                for ci, lvl in enumerate((y, cb, cr)):
                    blk = [0] * 64
                    blk[0] = lvl - 128
                    comp[ci].append(blk)
        jpegs.append(_jpeg_bytes(width, height, comp))

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom" + b"iso2")
    mdat = _box(b"mdat", b"".join(jpegs))
    first_sample_off = len(ftyp) + 8  # mdat payload start

    if chunked and n_frames >= 2:
        # chunk 1 carries one sample, chunk 2 the rest (two stsc runs)
        chunk_offsets = [first_sample_off, first_sample_off + len(jpegs[0])]
        stsc_runs = [(1, 1, 1), (2, n_frames - 1, 1)]
    else:
        chunk_offsets = [first_sample_off]
        stsc_runs = [(1, n_frames, 1)]

    timescale, duration = 1000, n_frames * 40

    sample_entry = (
        struct.pack(">I", 86)
        + b"jpeg"
        + b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
    )
    stsd = _full(b"stsd", struct.pack(">I", 1) + sample_entry)
    stts = _full(b"stts", struct.pack(">III", 1, n_frames, 40))
    stsc = _full(
        b"stsc",
        struct.pack(">I", len(stsc_runs))
        + b"".join(struct.pack(">III", *r) for r in stsc_runs),
    )
    stsz = _full(
        b"stsz",
        struct.pack(">II", 0, n_frames)
        + b"".join(struct.pack(">I", len(j)) for j in jpegs),
    )
    stco = _full(
        b"stco",
        struct.pack(">I", len(chunk_offsets))
        + b"".join(struct.pack(">I", o) for o in chunk_offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    url = _full(b"url ", b"", flags=1)  # self-contained
    dref = _full(b"dref", struct.pack(">I", 1) + url)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), flags=1)
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(
        b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00"
    )
    mdhd = _full(
        b"mdhd", struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0)
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd",
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + _UNITY_MATRIX
        + struct.pack(">II", width << 16, height << 16),
        flags=7,
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd",
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + _UNITY_MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# --------------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------------

MP4_FEATURE_SCHEMA = T.StructType(
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


def synth_mp4_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fused synth→mux→demux→per-sample JPEG decode in ONE Arrow stage; one
    output row per frame. The MP4 bytes are really assembled and really
    re-parsed per row (muxer and demuxer share no code)."""
    cols = [f.name for f in MP4_FEATURE_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"].astype("int64"):
                d = int(d)
                for feat in decode_mp4_mjpeg(mp4_bytes(d)):
                    feat["doc_id"] = d
                    rows.append(feat)
            yield pd.DataFrame(rows)[cols]

    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(
        run, schema=MP4_FEATURE_SCHEMA
    )
