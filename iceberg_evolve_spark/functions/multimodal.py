"""Multimodal column plumbing: images/audio/video as opaque ``binary`` payloads
with typed metadata, processed in Arrow batches.

The decode step itself (image/audio libraries) is NOT available in this
environment — it is stubbed behind :func:`decode_payload` (raises
``NotImplementedError``) with a deterministic fake
(:func:`fake_decode_features`) so the Spark-side plumbing — schema, batch
iteration, partition sizing — is real and tested end-to-end.

Scale notes: binary payloads make row sizes wildly skewed; ``mapInPandas``
processes Arrow batches whose size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch`` — cap it (e.g. 256) when
payloads are MB-scale so a batch never exceeds executor memory. Repartitioning
by a hash of the id (not by size) spreads hot files.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried alongside every payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image | audio | video
        T.StructField("format", T.StringType()),       # png, wav, mp4, ...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("head_byte", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
    ]
)


def attach_fake_payload(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Test harness: synthesize a deterministic binary payload (UTF-8 of the text)
    plus metadata, producing the schema a real ingest would."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("format"),
            (F.length(F.col(text_col)) % 1024).cast("int").alias("width"),
            (F.length(F.col(text_col)) % 768).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("media_meta"),
    )


def decode_payload(payload: bytes, media_meta: dict) -> "object":
    """Real decode entry point — image/audio libs are not present in this
    container, so this is an explicit stub (SURVEY.md extension mandate)."""
    raise NotImplementedError(
        "media decoding requires imaging/audio libraries not present in this "
        "environment; wire Pillow/torchaudio/ffmpeg here in production"
    )


def fake_decode_features(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode+featurize: (byte length, first byte,
    sum-of-bytes checksum mod 2^31)."""
    if payload is None or len(payload) == 0:
        return 0, -1, 0
    return len(payload), payload[0], sum(payload) % (1 << 31)


def extract_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via ``mapInPandas``.

    The pandas path exists because real decoders are C libraries operating on
    whole byte buffers — this is the documented slow path, batched through Arrow
    (not per-row Python). The fake featurizer keeps it deterministic here.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf[payload_col].map(fake_decode_features)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": feats.map(lambda t: t[0]).astype("int64"),
                    "head_byte": feats.map(lambda t: t[1]).astype("int32"),
                    "checksum": feats.map(lambda t: t[2]).astype("int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=FEATURE_SCHEMA)


def extract_features_sql_equivalent(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """The same features as pure column expressions (for oracle cross-checks:
    byte_len/head_byte are SQL-expressible; checksum via aggregate over bytes is
    not portable, so the oracle checks the first two)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.length(F.col(payload_col)).cast("long").alias("byte_len"),
    )
