"""Property-based tests (hypothesis) for the round-4 operator math.

The HLL properties run WITHOUT Spark: the register definition (low-b-bits
index, leading-zero rho over the portable 60-bit md5 hash) is pinned by an
independent pure-Python mirror and cross-checked against the DuckDB replay —
the same two-implementations discipline the oracle entries use, at
hypothesis speed. Spark-level equality to the same definition is covered by
tests/test_sketch_sampling_graph.py's oracle bit-exactness test.
"""

import hashlib

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _registers(values, b):
    m, n_bits = 1 << b, 60 - b
    regs = {}
    for v in values:
        h = _h60(v)
        j, w = h % m, h >> b
        rho = n_bits - w.bit_length() + 1
        regs[j] = max(regs.get(j, 0), rho)
    return regs


texts = st.lists(st.text(alphabet="abcdefghij0123456789", min_size=0, max_size=12), max_size=60)


class TestHLLDefinition:
    @given(texts, st.integers(4, 9))
    @settings(max_examples=40, deadline=None)
    def test_register_bounds_and_duplication_invariance(self, vals, b):
        m, n_bits = 1 << b, 60 - b
        regs = _registers(vals, b)
        assert len(regs) <= min(m, len(set(vals)))
        assert all(0 <= j < m and 1 <= rho <= n_bits + 1 for j, rho in regs.items())
        # duplicates never change the sketch
        assert _registers(vals + vals, b) == regs

    @given(texts, texts, st.integers(4, 8))
    @settings(max_examples=30, deadline=None)
    def test_merge_algebra(self, a, bvals, b):
        """max-merge is commutative, associative via dict-max, idempotent, and
        equals the sketch of the concatenation."""
        ra, rb = _registers(a, b), _registers(bvals, b)
        merged = {j: max(ra.get(j, 0), rb.get(j, 0)) for j in {*ra, *rb}}
        assert merged == _registers(a + bvals, b) == _registers(bvals + a, b)
        assert {j: max(ra.get(j, 0), ra.get(j, 0)) for j in ra} == ra

    @given(st.lists(st.integers(0, 10**6), min_size=1, max_size=40, unique=True), st.integers(5, 8))
    @settings(max_examples=25, deadline=None)
    def test_duckdb_replay_matches_definition(self, ints, b):
        """The oracle SQL builder computes the identical registers for
        arbitrary inputs — not just for the corpus the entries happen to
        hash."""
        from iceberg_evolve_spark.functions.hashing import hash60_sql
        from iceberg_evolve_spark.functions.sketch import hll_estimate_sql

        vals = [str(i) for i in ints]
        want = _registers(vals, b)
        m, n_bits = 1 << b, 60 - b
        s_present = sum(1 << (n_bits + 1 - rho) for rho in want.values())
        sum_scaled = s_present + (m - len(want)) * (1 << (n_bits + 1))
        con = duckdb.connect()
        con.execute("CREATE TABLE t (v VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
        row = con.execute(hll_estimate_sql("t", hash60_sql("v"), b=b)).fetchone()
        assert row[1] == len(want) and row[3] == sum_scaled


class TestPQCodebooks:
    @given(
        st.integers(1, 8).flatmap(
            lambda ns: st.tuples(
                st.just(ns),
                st.lists(
                    st.lists(st.floats(-1, 1, allow_nan=False), min_size=ns * 2, max_size=ns * 2),
                    min_size=1, max_size=6,
                ),
            )
        )
    )
    @settings(max_examples=30, deadline=None)
    def test_subcodebooks_partition_the_sample(self, arg):
        """Concatenating each sampled vector's per-subspace slices rebuilds the
        vector exactly — the codebooks are a partition, no overlap, no gap."""
        from iceberg_evolve_spark.functions.similarity import pq_subcodebooks

        n_sub, sample = arg
        books = pq_subcodebooks(sample, n_sub)
        assert len(books) == n_sub
        for ci, vec in enumerate(sample):
            rebuilt = [x for m in range(n_sub) for x in books[m][ci]]
            assert rebuilt == vec

    def test_indivisible_dim_rejected(self):
        from iceberg_evolve_spark.functions.similarity import pq_subcodebooks

        with pytest.raises(ValueError, match="not divisible"):
            pq_subcodebooks([[1.0, 2.0, 3.0]], 2)
