"""Real audio decode over binary media columns — no external libraries.

Round 1 left media decoding stubbed (``multimodal.decode_payload``) because no
imaging/audio package ships in this environment. Audio, however, needs none:
RIFF/WAVE PCM is a documented public format and the Python standard library
carries a real parser (``wave``). This module therefore provides the genuine
decode path for the audio branch of the multimodal mandate:

- :func:`synth_wav_payload` writes REAL ``.wav`` bytes (RIFF header built by
  hand with ``struct.pack`` — deliberately NOT via the ``wave`` writer, so the
  encoder and decoder share no code) containing a deterministic square wave
  whose parameters derive from the row id.
- :func:`decode_wav_features` parses those bytes with the stdlib ``wave``
  reader + ``numpy`` frame analysis inside ``mapInPandas`` Arrow batches.

Because the synthesized signal is a square wave, every acoustic feature has an
exact closed form (peak = rms = amplitude; zero crossings = (n-1) // half
period), so the driver's DuckDB oracle can verify the decoded output
bit-for-bit — this is decode *with* a hard correctness signal, not plumbing.

Scale notes (same as multimodal.py): payload rows are large and skewed; Arrow
batch size is governed by ``spark.sql.execution.arrow.maxRecordsPerBatch`` —
cap it when payloads are MB-scale. The decode is embarrassingly parallel
(per-row, no shuffle); at 100 TB the only knobs that matter are input split
size and batch memory.
"""

from __future__ import annotations

import io
import struct
import wave
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Synthesis parameters — all integer-exact functions of the row id.
SAMPLE_RATE = 8000


def synth_params(doc_id: int) -> tuple[int, int, int]:
    """(n_samples, amplitude, half_period) for a given id. Kept in one place so
    tests and the oracle SQL share the definition."""
    n_samples = 400 + (doc_id % 400)
    amplitude = 1000 + (doc_id % 20000)
    half_period = 2 + (doc_id % 30)
    return n_samples, amplitude, half_period


def _wav_bytes(n_samples: int, amplitude: int, half_period: int) -> bytes:
    """Hand-assembled canonical 44-byte RIFF/WAVE header + PCM16LE mono frames.

    Layout per the public WAVE spec (fmt chunk 16 bytes, PCM=1). Written with
    ``struct.pack`` so the stdlib ``wave`` reader acts as an independent
    decoder of these bytes.
    """
    i = np.arange(n_samples, dtype=np.int64)
    # Square wave: +A for the first half-period, -A for the next, repeating.
    samples = np.where((i // half_period) % 2 == 0, amplitude, -amplitude).astype("<i2")
    data = samples.tobytes()
    header = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + len(data),      # RIFF chunk size
        b"WAVE",
        b"fmt ",
        16,                  # fmt chunk size (PCM)
        1,                   # audio format = PCM
        1,                   # channels
        SAMPLE_RATE,
        SAMPLE_RATE * 2,     # byte rate = sr * block align
        2,                   # block align = channels * 2
        16,                  # bits per sample
        b"data",
        len(data),
    )
    return header + data


WAV_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def synth_wav_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id) -> (id, payload) with a real WAV binary per row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [_wav_bytes(*synth_params(int(d))) for d in ids],
                }
            )

    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(run, schema=WAV_SCHEMA)


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_us", T.LongType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def decode_one_wav(payload: bytes) -> dict:
    """Decode a single WAV binary via the stdlib parser + numpy analysis.

    This is the REAL decode the round-1 stub promised: ``wave`` walks the RIFF
    chunks, validates the fmt header, and exposes raw PCM frames.
    """
    with wave.open(io.BytesIO(payload), "rb") as w:
        n_channels = w.getnchannels()
        sample_rate = w.getframerate()
        n_samples = w.getnframes()
        frames = w.readframes(n_samples)
    pcm = np.frombuffer(frames, dtype="<i2").astype(np.int64)
    signs = np.sign(pcm)
    flips = int(np.count_nonzero(signs[1:] != signs[:-1])) if len(pcm) > 1 else 0
    return {
        "byte_len": len(payload),
        "n_channels": n_channels,
        "sample_rate": sample_rate,
        "n_samples": n_samples,
        "duration_us": n_samples * 1_000_000 // sample_rate,
        "peak": int(np.max(np.abs(pcm))) if len(pcm) else 0,
        "rms": float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2))) if len(pcm) else 0.0,
        "zero_crossings": flips,
    }


def decode_wav_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched WAV decode: (id, payload) -> acoustic feature row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_one_wav(p) for p in pdf[payload_col]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf[id_col].astype("int64").values)
            yield out.astype(
                {
                    "doc_id": "int64",
                    "byte_len": "int64",
                    "n_channels": "int32",
                    "sample_rate": "int32",
                    "n_samples": "int64",
                    "duration_us": "int64",
                    "peak": "int32",
                    "rms": "float64",
                    "zero_crossings": "int64",
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


def synth_decode_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fused synth→decode in ONE Arrow stage (for harness/bench paths where
    the payload is synthesized anyway): the WAV bytes are still really encoded
    and really parsed per row, but they never round-trip JVM→Python→JVM
    between two separate ``mapInPandas`` stages. Real ingest pipelines — where
    the binary column already exists — use :func:`decode_wav_features`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            feats = [
                decode_one_wav(_wav_bytes(*synth_params(int(d)))) for d in ids
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", ids.values)
            yield out.astype(
                {
                    "doc_id": "int64",
                    "byte_len": "int64",
                    "n_channels": "int32",
                    "sample_rate": "int32",
                    "n_samples": "int64",
                    "duration_us": "int64",
                    "peak": "int32",
                    "rms": "float64",
                    "zero_crossings": "int64",
                }
            )

    return df.select(id_col).mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Windowed energy / voice-activity detection (r5)
# ---------------------------------------------------------------------------

#: Fixed analysis-window count for the VAD feature rows.
VAD_WINDOWS = 4


def synth_params_gated(doc_id: int) -> tuple[int, int, int]:
    """(n_samples, amplitude, gate) for the BURST/SILENCE fixture: sample i
    is ``amplitude`` when ``(i // gate) % 2 == 0`` and 0 otherwise —
    alternating speech bursts and silence of ``gate`` samples each, so
    windowed energy actually varies (the plain square-wave fixture has
    constant per-sample energy and would make a VAD vacuous)."""
    n_samples = 400 + (doc_id % 400)
    amplitude = 500 + (doc_id % 1000)
    gate = 16 + (doc_id % 48)
    return n_samples, amplitude, gate


def _wav_bytes_gated(n_samples: int, amplitude: int, gate: int) -> bytes:
    i = np.arange(n_samples, dtype=np.int64)
    samples = np.where((i // gate) % 2 == 0, amplitude, 0).astype("<i2")
    data = samples.tobytes()
    header = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + len(data),
        b"WAVE",
        b"fmt ",
        16,
        1,          # PCM
        1,          # mono
        16000,
        16000 * 2,
        2,
        16,
        b"data",
        len(data),
    )
    return header + data


VAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("win", T.IntegerType()),
        T.StructField("n_in_window", T.LongType()),
        T.StructField("energy", T.LongType()),
        T.StructField("active", T.BooleanType()),
    ]
)


def decode_wav_energy_windows(payload: bytes, n_windows: int = VAD_WINDOWS) -> list[dict]:
    """REAL windowed-energy analysis over decoded PCM — the frame-energy /
    voice-activity primitive of an audio pipeline: split the decoded sample
    stream into ``n_windows`` near-equal windows (window w covers
    ``[w·n div W, (w+1)·n div W)``) and report each window's EXACT integer
    energy ``Σ s²`` plus the activity flag. Integer energies make the
    report hash-gatable — no float RMS accumulation order to drift."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        n = w.getnframes()
        frames = w.readframes(n)
    pcm = np.frombuffer(frames, dtype="<i2").astype(np.int64)
    out = []
    for wi in range(n_windows):
        lo, hi = wi * n // n_windows, (wi + 1) * n // n_windows
        seg = pcm[lo:hi]
        energy = int((seg * seg).sum())
        out.append(
            {
                "win": wi,
                "n_in_window": hi - lo,
                "energy": energy,
                "active": energy > 0,
            }
        )
    return out


def synth_vad_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fused synth(gated)→encode→decode→windowed-energy in ONE Arrow stage,
    one output row per (doc, window)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"].astype("int64"):
                d = int(d)
                payload = _wav_bytes_gated(*synth_params_gated(d))
                for feat in decode_wav_energy_windows(payload):
                    feat["doc_id"] = d
                    rows.append(feat)
            yield pd.DataFrame(rows)[[f.name for f in VAD_SCHEMA.fields]]

    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(run, schema=VAD_SCHEMA)
