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
