"""Property-based tests (hypothesis) for the late-round-4 operator math:
fixed-point PageRank, exact-substring duplication, and BPE training.

Same discipline as test_sketch_properties.py: an independent pure-Python
mirror of each definition is cross-checked against the DuckDB oracle SQL at
hypothesis speed (no Spark in the loop — Spark-level equality to the same
definitions is pinned by the oracle bit-exactness tests and the unit tests in
test_sketch_sampling_graph.py)."""

import hashlib
from collections import Counter

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_evolve_spark.functions.graph import pagerank_unrolled_sql
from iceberg_evolve_spark.functions.text import bpe_unrolled_sql


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------

def _pagerank_ref(edges, iterations=3, damping=85, scale=10**10):
    out = {}
    for s, t in edges:
        if s != t:
            out.setdefault(s, set()).add(t)
    nodes = {n for s, t in edges if s != t for n in (s, t)}
    r = {n: scale for n in nodes}
    base = (100 - damping) * scale // 100
    for _ in range(iterations):
        contrib = {n: 0 for n in nodes}
        for s, ts in out.items():
            for t in ts:
                contrib[t] += r[s] // len(ts)
        r = {n: base + damping * contrib[n] // 100 for n in nodes}
    return r


edge_lists = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=40
).filter(lambda es: any(s != t for s, t in es))


class TestPageRankFixedPoint:
    @given(edge_lists, st.integers(1, 4))
    @settings(max_examples=25, deadline=None)
    def test_duckdb_unrolled_sql_matches_reference(self, edges, iters):
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE edges_t AS SELECT * FROM (VALUES "
            + ",".join(f"({s},{t})" for s, t in edges)
            + ") v(s, d)"
        )
        got = dict(
            con.execute(
                pagerank_unrolled_sql("SELECT s, d FROM edges_t", iterations=iters)
            ).fetchall()
        )
        assert got == _pagerank_ref(edges, iterations=iters)

    @given(edge_lists, st.integers(1, 5))
    @settings(max_examples=40, deadline=None)
    def test_mass_bound_and_floor(self, edges, iters):
        """Total rank never exceeds n*scale (floor division only loses mass)
        and every node keeps at least the teleport floor."""
        scale = 10**10
        r = _pagerank_ref(edges, iterations=iters, scale=scale)
        n = len(r)
        base = 15 * scale // 100
        assert sum(r.values()) <= n * scale
        assert all(v >= base for v in r.values())

    @given(st.integers(2, 10), st.integers(1, 4))
    @settings(max_examples=15, deadline=None)
    def test_symmetric_complete_graph_is_uniform(self, n, iters):
        """On K_n every node is equivalent — ranks must tie exactly."""
        edges = [(i, j) for i in range(n) for j in range(n) if i != j]
        r = _pagerank_ref(edges, iterations=iters)
        assert len(set(r.values())) == 1


# ---------------------------------------------------------------------------
# Exact substring duplication
# ---------------------------------------------------------------------------

def _substr_ref(docs, k):
    """Pure-Python mirror of exact_substring_shared: per doc, window count and
    how many window OCCURRENCES have their gram in >= 2 distinct docs."""
    wins = {}
    for i, text in docs:
        toks = [t for t in text.lower().strip().split() if t]
        wins[i] = [" ".join(toks[j:j + k]) for j in range(len(toks) - k + 1)]
    docfreq = Counter()
    for i, ws in wins.items():
        for g in set(ws):
            docfreq[g] += 1
    return {
        i: (len(ws), sum(1 for g in ws if docfreq[g] >= 2))
        for i, ws in wins.items()
        if ws
    }


corpora = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=24), min_size=1, max_size=8
).map(lambda ts: list(enumerate(ts)))


class TestExactSubstring:
    @given(corpora, st.integers(1, 3))
    @settings(max_examples=40, deadline=None)
    def test_invariants(self, docs, k):
        res = _substr_ref(docs, k)
        for i, (nw, ns) in res.items():
            assert 0 <= ns <= nw
        # duplicating the whole corpus under shifted ids makes EVERY window
        # with >= 1 occurrence shared
        shifted = [(i + 1000, t) for i, t in docs]
        res2 = _substr_ref(docs + shifted, k)
        for i, (nw, ns) in res2.items():
            assert ns == nw

    @given(corpora, st.integers(1, 3))
    @settings(max_examples=25, deadline=None)
    def test_duckdb_replay_matches_reference(self, docs, k):
        con = duckdb.connect()
        con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO d VALUES (?, ?)", docs)
        toks = "list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')"
        rows = con.execute(f"""
WITH tokarr AS (SELECT doc_id, {toks} AS ts FROM d),
wins AS (
  SELECT doc_id, w FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(ts) - {k} + 2),
                                 i -> array_to_string(ts[i:i+{k - 1}], ' '))) AS w
    FROM tokarr WHERE len(ts) >= {k})
),
docfreq AS (SELECT w, COUNT(DISTINCT doc_id) AS nd FROM wins GROUP BY w)
SELECT wi.doc_id, COUNT(*) AS nw,
       CAST(SUM(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS ns
FROM wins wi JOIN docfreq f USING (w) GROUP BY wi.doc_id
""").fetchall()
        assert {i: (nw, ns) for i, nw, ns in rows} == _substr_ref(docs, k)


# ---------------------------------------------------------------------------
# BPE training
# ---------------------------------------------------------------------------

def _bpe_ref(texts, rounds):
    vocab = Counter(w for t in texts for w in t.lower().strip().split() if w)
    state = [(f" {' '.join(w)} ", c) for w, c in vocab.items()]
    merges = []
    for r in range(1, rounds + 1):
        pc = Counter()
        for s, c in state:
            sy = s.split()
            for i in range(len(sy) - 1):
                pc[(sy[i], sy[i + 1])] += c
        if not pc:
            break
        (a, b), w = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, a, b, a + b, w))
        state = [(s.replace(f" {a} {b} ", f" {a}{b} "), c) for s, c in state]
    return merges


word_corpora = st.lists(
    st.text(alphabet="abc ", min_size=2, max_size=20).filter(lambda t: t.strip()),
    min_size=1,
    max_size=6,
)


class TestBPETraining:
    @given(word_corpora, st.integers(1, 3))
    @settings(max_examples=25, deadline=None)
    def test_duckdb_replay_matches_reference(self, texts, rounds):
        ref = _bpe_ref(texts, rounds)
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?)", [(t,) for t in texts])
        rows = con.execute(bpe_unrolled_sql(rounds=rounds)).fetchall()
        got = [(r, a, b, m, w) for r, a, b, m, w in rows]
        # DuckDB emits a row per unrolled round even after pair exhaustion
        # (top-1 of an empty relation -> row of NULLs filtered here)
        got = [r for r in got if r[1] is not None]
        assert got == ref

    @given(word_corpora)
    @settings(max_examples=25, deadline=None)
    def test_merge_weights_never_increase_support_of_reapplied_pair(self, texts):
        """After merging (a,b), the pair (a,b) can only lose support — the
        merged occurrences are gone."""
        m1 = _bpe_ref(texts, 1)
        if not m1:
            return
        r, a, b, merged, w = m1[0]
        vocab = Counter(x for t in texts for x in t.lower().strip().split() if x)
        state = [(f" {' '.join(word)} ".replace(f" {a} {b} ", f" {merged} "), c)
                 for word, c in vocab.items()]
        pc = Counter()
        for s, c in state:
            sy = s.split()
            for i in range(len(sy) - 1):
                pc[(sy[i], sy[i + 1])] += c
        assert pc.get((a, b), 0) < w


# ---------------------------------------------------------------------------
# BPE encoding (applying a trained merge table)
# ---------------------------------------------------------------------------

def _encode_ref(word: str, merges) -> list[str]:
    """Independent reference encoder: same chained leftmost-non-overlapping
    space-sentinel replaces as the engines."""
    s = f" {' '.join(word)} "
    for _r, a, b, *_ in merges:
        s = s.replace(f" {a} {b} ", f" {a}{b} ")
    return s.split()


class TestBPEEncode:
    def test_spark_encode_hand_case(self, spark):
        from iceberg_evolve_spark.functions.text import (
            bpe_apply_merges,
            bpe_train_merges,
        )

        texts = ["the cat the hat", "the bat the cat", "rat cat the"]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        merges = bpe_train_merges(df, "text", rounds=3)
        ref = _bpe_ref(texts, 3)
        assert [(r, a, b, w) for r, a, b, w in merges] == [
            (r, a, b, w) for r, a, b, _m, w in ref
        ]
        vocab = sorted({w for t in texts for w in t.split()})
        wdf = spark.createDataFrame([(w,) for w in vocab], "w string")
        got = {
            r["w"]: list(r["toks"])
            for r in bpe_apply_merges(wdf, merges).collect()
        }
        for w in vocab:
            assert got[w] == _encode_ref(w, merges), w
            assert "".join(got[w]) == w  # lossless: symbols re-concatenate

    def test_encode_no_merges_is_characters(self, spark):
        from iceberg_evolve_spark.functions.text import bpe_apply_merges

        wdf = spark.createDataFrame([("abc",), ("x",)], "w string")
        got = {r["w"]: list(r["toks"]) for r in bpe_apply_merges(wdf, []).collect()}
        assert got == {"abc": ["a", "b", "c"], "x": ["x"]}

    def test_encode_matches_reference_on_random_corpora(self, spark):
        """Train on random corpora, encode the vocabulary, compare every
        word's token sequence to the independent reference encoder (pure
        Python, shares no code). Non-hypothesis loop: Spark per-example is
        too slow for @given, so iterate a fixed seed battery."""
        import random

        from iceberg_evolve_spark.functions.text import (
            bpe_apply_merges,
            bpe_train_merges,
        )

        rng = random.Random(11)
        for trial in range(3):
            texts = [
                " ".join(
                    "".join(rng.choice("abcd") for _ in range(rng.randint(1, 6)))
                    for _ in range(rng.randint(1, 8))
                )
                for _ in range(5)
            ]
            df = spark.createDataFrame([(t,) for t in texts], "text string")
            merges = bpe_train_merges(df, "text", rounds=3)
            vocab = sorted({w for t in texts for w in t.split()})
            wdf = spark.createDataFrame([(w,) for w in vocab], "w string")
            got = {
                r["w"]: list(r["toks"])
                for r in bpe_apply_merges(wdf, merges).collect()
            }
            for w in vocab:
                assert got[w] == _encode_ref(w, merges), (trial, w, merges)
                assert "".join(got[w]) == w
