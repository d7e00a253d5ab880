"""Deterministic Bloom filter as a join pre-filter — the shuffle-avoidance
tool for selective joins at 100 TB.

The classic deployment: a big fact table joins a dimension subset that keeps
only a few percent of fact rows. A semi-join still shuffles (or broadcasts)
and touches every fact row's join machinery; a Bloom filter built over the
dimension keys turns the fact side into a PURE PROJECTION FILTER — no
shuffle, no join, pushdown-adjacent — that passes all true matches plus a
bounded false-positive fraction, which a (now much smaller) exact semi-join
mops up. Spark's own runtime row-group bloom pruning does this inside the
scan; this operator is the explicit, cross-stage version whose filter is
reusable index *metadata* (like the IVF centroid matrix).

Determinism: bit positions come from the portable 60-bit md5 hash
(:mod:`.hashing`), so DuckDB can rebuild the identical filter words and
replay every membership test — the whole path is hash-verifiable, unlike
Spark's built-in ``BloomFilterAggregate`` (xxhash-based, not portable).

Build: per row, k bit positions ``hash60(key |#| bloom<seed> |#| i) % m``;
explode to (word, mask) pairs and ``bit_or``-aggregate into ``m/32`` words —
one shuffle whose size is the FILTER's size (m/32 rows), not the data's.
Probe: the words collect to the driver (m/32 ints — KB-scale metadata, the
same class as LSH hyperplanes or IVF centroids) and become a literal array in
the plan: membership = all k masked words non-zero, whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iceberg_evolve_spark.functions.hashing import SEP, hash60, hash60_sql

# 32-bit words inside BIGINT storage: masks stay <= 2^31, so neither engine's
# signed-shift overflow check trips (DuckDB rejects 1::BIGINT << 63).
WORD_BITS = 32


def _positions(key: Column, seed: str, k: int, m_bits: int) -> list[Column]:
    """The k deterministic bit positions of ``key`` — non-negative because
    hash60 is 60-bit (fits signed), and engine-portable."""
    return [
        F.pmod(hash60(F.concat(key, F.lit(f"{SEP}bloom{seed}{SEP}{i}"))), F.lit(m_bits))
        for i in range(k)
    ]


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 14,
    k: int = 5,
    seed: str = "0",
) -> DataFrame:
    """Distributed build: ``(word_idx, word)`` rows, ``word`` the bit_or of all
    masks landing in that 32-bit word. Output has at most ``m_bits/32`` rows
    regardless of input size (map-side combined — the shuffle carries filter
    words, not keys)."""
    key = F.col(key_col).cast("string")
    pos = F.explode(F.array(*_positions(key, seed, k, m_bits))).alias("pos")
    exploded = df.select(pos)
    return (
        exploded.select(
            (F.col("pos") / WORD_BITS).cast("int").alias("word_idx"),
            # pow is exact here: the exponent is < 32, far inside double
            # precision (F.shiftleft needs a literal shift amount, not a col)
            F.pow(F.lit(2.0), (F.col("pos") % WORD_BITS).cast("int")).cast("bigint").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_words(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 14,
    k: int = 5,
    seed: str = "0",
) -> list[int]:
    """Materialize the filter as a dense ``m_bits/32``-word list (driver
    metadata, KB-scale — the collect is filter-sized, never data-sized)."""
    n_words = m_bits // WORD_BITS
    words = [0] * n_words
    for r in bloom_build(df, key_col, m_bits, k, seed).collect():
        words[r["word_idx"]] = r["word"]
    return words


def bloom_might_contain(
    key: Column,
    words: list[int],
    k: int = 5,
    seed: str = "0",
) -> Column:
    """Membership test as a pure Catalyst projection over the LITERAL word
    array: true iff every one of the key's k bits is set. No join, no
    shuffle — the 100 TB fact scan shape."""
    m_bits = len(words) * WORD_BITS
    # one Literal array node (constant-folded), not a per-row CreateArray
    arr = F.lit([int(w) for w in words]).cast("array<bigint>")
    cond = F.lit(True)
    for p in _positions(key.cast("string"), seed, k, m_bits):
        word = F.element_at(arr, (p / WORD_BITS).cast("int") + 1)
        mask = F.pow(F.lit(2.0), (p % WORD_BITS).cast("int")).cast("bigint")
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond


def bloom_positions_sql(expr: str, seed: str, k: int, m_bits: int) -> list[str]:
    """DuckDB SQL for the identical k bit positions of ``expr``."""
    out = []
    for i in range(k):
        salted = f"{expr} || '{SEP}bloom{seed}{SEP}{i}'"
        out.append(f"({hash60_sql(salted)} % {m_bits} + {m_bits}) % {m_bits}")
    return out
