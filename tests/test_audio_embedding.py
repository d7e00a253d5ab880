"""Unit tests: real WAV decode (functions/audio.py) and int8 quantization
(functions/embedding.py)."""

import io
import struct
import wave as wave_mod

import pytest
from pyspark.sql import functions as F

from iceberg_evolve_spark.functions.audio import (
    SAMPLE_RATE,
    _wav_bytes,
    decode_one_wav,
    decode_wav_features,
    synth_params,
    synth_wav_payload,
)
from iceberg_evolve_spark.functions.embedding import (
    dequantize,
    quantize_int8,
    quantize_int8_exploded,
)


class TestWavCodec:
    def test_header_is_canonical_riff(self):
        b = _wav_bytes(100, 5000, 3)
        assert b[:4] == b"RIFF" and b[8:12] == b"WAVE" and b[12:16] == b"fmt "
        assert len(b) == 44 + 200
        # RIFF size field covers everything after the first 8 bytes.
        assert struct.unpack("<I", b[4:8])[0] == len(b) - 8

    def test_stdlib_reader_accepts_handmade_bytes(self):
        """The encoder is hand-packed; the stdlib parser is the independent
        decoder. It must accept the bytes and agree on every header field."""
        b = _wav_bytes(250, 1234, 5)
        with wave_mod.open(io.BytesIO(b), "rb") as w:
            assert w.getnchannels() == 1
            assert w.getsampwidth() == 2
            assert w.getframerate() == SAMPLE_RATE
            assert w.getnframes() == 250

    def test_decode_matches_closed_forms(self):
        for doc_id in [0, 1, 17, 399, 400, 12345]:
            n, a, h = synth_params(doc_id)
            f = decode_one_wav(_wav_bytes(n, a, h))
            assert f["n_samples"] == n
            assert f["peak"] == a
            assert f["rms"] == float(a)  # square wave: every |sample| == a
            assert f["zero_crossings"] == (n - 1) // h
            assert f["byte_len"] == 44 + 2 * n

    def test_decode_rejects_garbage(self):
        with pytest.raises(Exception):
            decode_one_wav(b"not a wav file at all........")

    def test_spark_pipeline(self, spark):
        df = spark.range(0, 40).select(F.col("id").alias("doc_id"))
        out = decode_wav_features(synth_wav_payload(df)).collect()
        assert len(out) == 40
        by_id = {r["doc_id"]: r for r in out}
        n, a, h = synth_params(7)
        assert by_id[7]["peak"] == a and by_id[7]["n_samples"] == n


class TestQuantizeInt8:
    def test_error_bound_on_real_vectors(self, spark, sf_dir):
        """Reconstruction error ≤ scale/2 per component — the defining
        guarantee of symmetric scalar quantization."""
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
        packed = dequantize(quantize_int8(emb, "vec_id", "embedding"))
        joined = packed.join(emb, "vec_id").select("vec_id", "scale", "v_hat", "embedding")
        bad = joined.select(
            F.exists(
                F.zip_with(
                    "v_hat",
                    "embedding",
                    lambda a, b: F.abs(a - b.cast("double")) > F.col("scale") / 2 + F.lit(1e-12),
                ),
                lambda x: x,
            ).alias("violated")
        ).filter("violated").count()
        assert bad == 0

    def test_range_and_zero_vector(self, spark):
        df = spark.createDataFrame(
            [(1, [0.0] * 4), (2, [1.0, -2.0, 0.5, 2.0])],
            "vec_id long, embedding array<float>",
        )
        rows = quantize_int8_exploded(df, "vec_id", "embedding").collect()
        zeros = [r for r in rows if r["vec_id"] == 1]
        assert all(r["q"] == 0 and r["scale"] == 0.0 for r in zeros)
        vals = {r["dim_idx"]: r for r in rows if r["vec_id"] == 2}
        assert vals[3]["q"] == 127  # the abs-max component maps to full scale
        assert vals[1]["q"] == -127
        assert all(-127 <= r["q"] <= 127 for r in rows)

    def test_packed_equals_exploded(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(20)
        packed = quantize_int8(emb, "vec_id", "embedding").select(
            "vec_id", F.posexplode("q").alias("dim_idx", "qp")
        )
        exploded = quantize_int8_exploded(emb, "vec_id", "embedding")
        diff = (
            packed.join(exploded, ["vec_id", "dim_idx"])
            .filter(F.col("qp").cast("int") != F.col("q"))
            .count()
        )
        assert diff == 0


class TestRandomProjection:
    def test_matches_numpy_and_partitioning_invariant(self, spark, sf_dir):
        import numpy as np

        from iceberg_evolve_spark.functions.embedding import (
            projection_component,
            random_projection,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(10)
        rows = emb.collect()
        out = {
            r["vec_id"]: r["y"]
            for r in random_projection(emb, in_dims=64, out_dims=4).collect()
        }
        R = np.array(
            [[projection_component("rp", j, i) for i in range(64)] for j in range(4)]
        )
        for r in rows:
            v = np.array(r["embedding"], dtype=np.float64)
            want = R @ v
            got = np.array(out[r["vec_id"]])
            assert np.allclose(got, want, atol=1e-9)
        again = {
            r["vec_id"]: r["y"]
            for r in random_projection(
                emb.repartition(7), in_dims=64, out_dims=4
            ).collect()
        }
        assert again == out


class TestWavCodecProperties:
    def test_roundtrip_closed_forms_hold_for_all_params(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=200, deadline=None)
        @given(
            n=st.integers(min_value=1, max_value=4000),
            a=st.integers(min_value=1, max_value=32767),
            h=st.integers(min_value=1, max_value=500),
        )
        def check(n, a, h):
            f = decode_one_wav(_wav_bytes(n, a, h))
            assert f["n_samples"] == n
            assert f["peak"] == a
            assert f["rms"] == float(a)
            assert f["zero_crossings"] == (n - 1) // h
            assert f["byte_len"] == 44 + 2 * n
            assert f["duration_us"] == n * 1_000_000 // SAMPLE_RATE

        check()
