"""Tests for the deterministic Bloom-filter join pre-filter (functions/bloom.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_evolve_spark.functions.bloom import (
    WORD_BITS,
    bloom_build,
    bloom_might_contain,
    bloom_words,
)

M = 1 << 12
K = 5


class TestBloomFilter:
    def test_no_false_negatives(self, spark):
        keys = spark.range(0, 300).withColumnRenamed("id", "k")
        words = bloom_words(keys, "k", M, K, seed="t")
        hits = (
            keys.select(bloom_might_contain(F.col("k"), words, K, seed="t").alias("h"))
            .agg(F.sum(F.col("h").cast("int")))
            .first()[0]
        )
        assert hits == 300  # every inserted key MUST pass

    def test_false_positive_rate_bounded(self, spark):
        keys = spark.range(0, 300).withColumnRenamed("id", "k")
        words = bloom_words(keys, "k", M, K, seed="t")
        # probe disjoint keys; theoretical fp ~ (1 - e^(-kn/m))^k ≈ 2.4%
        probe = spark.range(1_000_000, 1_003_000).withColumnRenamed("id", "k")
        fp = (
            probe.select(bloom_might_contain(F.col("k"), words, K, seed="t").alias("h"))
            .agg(F.sum(F.col("h").cast("int")))
            .first()[0]
        )
        assert fp / 3000 < 0.10  # generous bound over the ~2.4% expectation

    def test_build_is_partitioning_invariant(self, spark):
        keys = spark.range(0, 200).withColumnRenamed("id", "k")
        a = sorted(tuple(r) for r in bloom_build(keys, "k", M, K, "t").collect())
        b = sorted(
            tuple(r)
            for r in bloom_build(keys.repartition(13), "k", M, K, "t").collect()
        )
        assert a == b  # bit_or is order/partitioning independent

    def test_words_fit_32_bits(self, spark):
        keys = spark.range(0, 500).withColumnRenamed("id", "k")
        words = bloom_words(keys, "k", M, K, "t")
        assert len(words) == M // WORD_BITS
        assert all(0 <= w < (1 << 32) for w in words)

    def test_probe_plan_is_pure_projection(self, spark):
        keys = spark.range(0, 100).withColumnRenamed("id", "k")
        words = bloom_words(keys, "k", M, K, "t")
        probe = spark.range(0, 1000).withColumnRenamed("id", "k")
        out = probe.filter(bloom_might_contain(F.col("k"), words, K, "t"))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # membership test never shuffles
        assert "BatchEvalPython" not in plan

    def test_matches_duckdb_replay(self, spark):
        import duckdb

        from iceberg_evolve_spark.functions.bloom import bloom_positions_sql

        keys = spark.range(0, 64).withColumnRenamed("id", "k")
        words = bloom_words(keys, "k", M, K, "t")
        pos = bloom_positions_sql("CAST(t.i AS VARCHAR)", "t", K, M)
        bits = " UNION ALL ".join(
            f"SELECT {p} AS pos FROM range(64) t(i)" for p in pos
        )
        got = duckdb.sql(
            f"""
            SELECT CAST(pos // {WORD_BITS} AS INT) AS w,
                   bit_or(CAST(1 AS BIGINT) << CAST(pos % {WORD_BITS} AS INT)) AS word
            FROM ({bits}) GROUP BY 1
            """
        ).fetchall()
        replay = [0] * (M // WORD_BITS)
        for w, word in got:
            replay[w] = word
        assert replay == words  # identical filter bytes in both engines
