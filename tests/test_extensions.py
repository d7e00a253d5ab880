"""Extension-operator behavior tests (Spark, sf0.001)."""

import pytest
from pyspark.sql import functions as F

from iceberg_evolve_spark.functions.dedup import (
    embedding_near_dups,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dups,
    word_shingles,
)
from iceberg_evolve_spark.functions.similarity import (
    topk_brute_force,
    topk_ivf,
    topk_lsh,
)
from iceberg_evolve_spark.functions.text import (
    add_text_stats,
    document_fingerprint,
    language_id,
)
from iceberg_evolve_spark.functions.multimodal import attach_fake_payload, extract_features
from iceberg_evolve_spark.sources import load_table
from iceberg_evolve_spark.streaming.sessionize import (
    session_stats,
    session_window_stats,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


class TestDedup:
    def test_exact_dedup_keeps_min_id(self, spark):
        df = spark.createDataFrame(
            [(5, "a b"), (3, "A  b"), (9, "c")], "doc_id long, text string"
        )
        kept = sorted(
            r.doc_id for r in exact_dedup(df, "doc_id", normalize_col="text").collect()
        )
        assert kept == [3, 9]

    def test_short_text_has_no_shingles(self, spark):
        df = spark.createDataFrame([(1, "just two")], "doc_id long, text string")
        assert df.select(F.size(word_shingles("text", 3)).alias("n")).collect()[0].n == 0

    def test_jaccard_pairs_symmetric_bounded(self, docs):
        pairs = ngram_jaccard_pairs(docs, "doc_id", threshold=0.2).collect()
        assert pairs, "synthetic corpus contains near-dup pairs at 0.2"
        for p in pairs:
            assert p.id_a < p.id_b
            assert 0.2 <= p.jaccard <= 1.0

    def test_minhash_lsh_finds_true_near_dups(self, docs):
        """LSH candidates (est >= .5) must cover the exact-Jaccard >= .7 pairs."""
        exact = {
            (p.id_a, p.id_b)
            for p in ngram_jaccard_pairs(docs, "doc_id", threshold=0.7).collect()
        }
        approx = {
            (p.id_a, p.id_b)
            for p in minhash_lsh_pairs(
                docs, "doc_id", num_hashes=16, bands=8, threshold=0.5
            ).collect()
        }
        assert exact, "expect some high-sim pairs in corpus"
        assert exact <= approx

    def test_simhash_identical_texts_same_fingerprint(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta epsilon zeta")],
            "doc_id long, text string",
        )
        fps = {r.doc_id: r.simhash for r in simhash(df, "doc_id").collect()}
        assert fps[1] == fps[2]
        assert fps[1] != fps[3]
        pairs = simhash_near_dups(df, "doc_id", max_hamming=3).collect()
        assert {(p.id_a, p.id_b) for p in pairs} >= {(1, 2)}

    def test_unpersist_intermediates_releases_cache(self, docs):
        """The near-dup builders pin their shared subtree in the cache; the
        helper must release exactly those entries after materialization."""
        from iceberg_evolve_spark.functions.dedup import (
            minhash_lsh_pairs,
            unpersist_intermediates,
        )

        out = minhash_lsh_pairs(docs, "doc_id", num_hashes=8, bands=4)
        out.count()  # materialize (intermediates now cached)
        handles = out._persisted_intermediates
        assert all(h.storageLevel.useMemory or h.storageLevel.useDisk for h in handles)
        assert unpersist_intermediates(out) == len(handles) > 0
        assert all(
            not (h.storageLevel.useMemory or h.storageLevel.useDisk) for h in handles
        )
        # plain DataFrames are a no-op
        assert unpersist_intermediates(docs) == 0

    def test_embedding_near_dups_self_consistency(self, emb):
        pairs = embedding_near_dups(emb, "vec_id", threshold=0.3).collect()
        for p in pairs:
            assert p.id_a < p.id_b
            assert p.cosine >= 0.3

    def test_embedding_tiled_equals_broadcast(self, emb):
        """The blocked exact strategy must agree pair-for-pair with the
        broadcast fast path (same kernel, different distribution)."""
        tiled = embedding_near_dups(emb, "vec_id", threshold=0.3, blocks=5)
        bcast = embedding_near_dups(emb, "vec_id", threshold=0.3, strategy="broadcast")
        t = {(p.id_a, p.id_b): round(p.cosine, 9) for p in tiled.collect()}
        b = {(p.id_a, p.id_b): round(p.cosine, 9) for p in bcast.collect()}
        assert t == b and t

    def test_embedding_tiled_no_driver_materialization(self, emb, monkeypatch):
        """Building the tiled plan must never collect the corpus to the driver
        (the round-1 scale-killer)."""
        from pyspark.sql import DataFrame as _DF

        def boom(self, *a, **k):
            raise AssertionError("driver-side collect during plan construction")

        monkeypatch.setattr(_DF, "collect", boom)
        monkeypatch.setattr(_DF, "toPandas", boom, raising=False)
        df = embedding_near_dups(emb, "vec_id", threshold=0.3)
        plan = df._jdf.queryExecution().toString()
        assert "FlatMapGroupsInPandas" in plan

    def test_embedding_broadcast_refuses_oversized_corpus(self, emb):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="broadcast_limit"):
            embedding_near_dups(
                emb, "vec_id", threshold=0.3, strategy="broadcast", broadcast_limit=3
            ).collect()

    def test_embedding_lsh_recall_and_precision(self, emb):
        """LSH candidates are a subset of the exact pairs (same verify kernel)
        with usable recall at multi-table settings."""
        from iceberg_evolve_spark.functions.dedup import embedding_near_dups_lsh

        exact = {
            (p.id_a, p.id_b)
            for p in embedding_near_dups(emb, "vec_id", threshold=0.3).collect()
        }
        approx = {
            (p.id_a, p.id_b)
            for p in embedding_near_dups_lsh(
                emb, "vec_id", threshold=0.3, n_planes=3, n_tables=6
            ).collect()
        }
        assert approx <= exact
        assert exact and len(approx) / len(exact) >= 0.5


class TestSimilarity:
    def test_brute_force_self_is_top1(self, emb):
        q = emb.filter("vec_id = 3").select("embedding").collect()[0][0]
        top = topk_brute_force(emb, list(q), k=5).collect()
        assert top[0].vec_id == 3
        assert abs(top[0].cosine - 1.0) < 1e-6
        sims = [t.cosine for t in top]
        assert sims == sorted(sims, reverse=True)

    def test_ivf_index_build_probe(self, emb, tmp_path):
        """Offline build + online probe: the probe plan must be a
        partition-pruned scan of the _cell-partitioned store with no KMeans
        stage, and results must match the one-shot topk_ivf at the same
        settings (same quantizer seed)."""
        from iceberg_evolve_spark.functions.similarity import (
            build_ivf_index,
            load_ivf_index,
        )

        q = emb.filter("vec_id = 3").select("embedding").collect()[0][0]
        path = str(tmp_path / "ivf")
        index = build_ivf_index(emb, path, "vec_id", "embedding", n_centroids=8)

        probe_df = index.probe(list(q), k=10, n_probe=4)
        plan = probe_df._jdf.queryExecution().toString()
        assert "KMeans" not in plan  # fit happened offline, not in the query
        physical = probe_df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in physical and "_cell" in physical

        oneshot = topk_ivf(emb, list(q), k=10, n_centroids=8, n_probe=4)
        assert [(r.vec_id, r.cosine) for r in probe_df.collect()] == [
            (r.vec_id, r.cosine) for r in oneshot.collect()
        ]

        # Reopen without refit: same centroids, same answer.
        reopened = load_ivf_index(emb.sparkSession, path)
        assert [(r.vec_id, r.cosine) for r in reopened.probe(list(q), k=10, n_probe=4).collect()] == [
            (r.vec_id, r.cosine) for r in probe_df.collect()
        ]

    def test_ivf_index_probe_all_cells_is_exact(self, emb, tmp_path):
        from iceberg_evolve_spark.functions.similarity import build_ivf_index

        q = emb.filter("vec_id = 3").select("embedding").collect()[0][0]
        index = build_ivf_index(
            emb, str(tmp_path / "ivf"), "vec_id", "embedding", n_centroids=8
        )
        exact = [r.vec_id for r in topk_brute_force(emb, list(q), k=10).collect()]
        full = [r.vec_id for r in index.probe(list(q), k=10, n_probe=8).collect()]
        assert full == exact

    def test_quantized_probe_matches_exact_probe(self, emb, tmp_path):
        """probe_quantized = narrow int8 scan + exact float re-rank: with a
        generous rerank depth the final top-k must equal the float probe's
        (the re-rank recomputes exact cosines, so the only way to differ is a
        true top-k candidate falling out of the approx top-rerank — impossible
        here with rerank covering a fifth of the corpus)."""
        from iceberg_evolve_spark.functions.similarity import build_ivf_index

        q = emb.filter("vec_id = 3").select("embedding").collect()[0][0]
        index = build_ivf_index(
            emb, str(tmp_path / "ivfq"), "vec_id", "embedding",
            n_centroids=8, quantize=True,
        )
        exact = [
            (r.vec_id, r.cosine)
            for r in index.probe(list(q), k=10, n_probe=4).collect()
        ]
        quant = [
            (r.vec_id, r.cosine)
            for r in index.probe_quantized(
                list(q), k=10, n_probe=4, rerank=100
            ).collect()
        ]
        assert quant == exact
        # Stage-1 plan reads only the quantized columns (column pruning), and
        # the store scan stays partition-pruned on _cell.
        plan = (
            index.probe_quantized(list(q), k=10, n_probe=4)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "_cell" in plan and "KMeans" not in plan

    def test_ivf_recall(self, emb):
        q = emb.filter("vec_id = 3").select("embedding").collect()[0][0]
        exact = [r.vec_id for r in topk_brute_force(emb, list(q), k=10).collect()]
        approx = [
            r.vec_id
            for r in topk_ivf(emb, list(q), k=10, n_centroids=8, n_probe=4).collect()
        ]
        assert len(set(exact) & set(approx)) >= 5

    def test_lsh_returns_query_bucket(self, emb):
        q = emb.filter("vec_id = 3").select("embedding").collect()[0][0]
        got = topk_lsh(emb, list(q), k=5, n_planes=4).collect()
        assert got and got[0].vec_id == 3


class TestText:
    def test_quality_bounds(self, docs):
        rows = add_text_stats(docs).select("quality_score").collect()
        assert all(0.0 <= r.quality_score <= 1.0 for r in rows)

    def test_ngram_repetition_scores(self, spark):
        from iceberg_evolve_spark.functions.text import ngram_repetition

        df = spark.createDataFrame(
            [
                (1, "a b c a b c a b c"),  # heavy 3-gram repetition
                (2, "one two three four five"),  # all distinct
                (3, "xy"),  # shorter than k: zero n-grams
            ],
            "id long, text string",
        )
        got = {r.id: (r.n_ngrams, round(r.dup_ngram_frac, 6)) for r in
               ngram_repetition(df, "text", k=3).collect()}
        # doc 1: 7 grams, 3 distinct ("a b c","b c a","c a b") → 4/7 repeats
        assert got[1] == (7, round(1 - 3 / 7, 6))
        assert got[2] == (3, 0.0)
        assert got[3] == (0, 0.0)

    def test_pack_token_sequences_budget(self, spark):
        from iceberg_evolve_spark.functions.text import pack_token_sequences

        df = spark.createDataFrame(
            [(i, "g", 40) for i in range(10)] + [(100, "h", 250), (101, "h", 100)],
            "id long, grp string, toks int",
        )
        got = {r.id: (r.seq_offset, r.seq_id) for r in
               pack_token_sequences(df, "id", "grp", "toks", budget=100).collect()}
        # group g: offsets 0,40,80,120,... → seq ids 0,0,0,1,1,2,2,2,3,3
        assert [got[i][1] for i in range(10)] == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]
        # group h packs independently
        assert got[100] == (0, 0) and got[101] == (250, 2)

    def test_redact_pii_counts_and_replaces(self, spark):
        from iceberg_evolve_spark.functions.text import redact_pii

        df = spark.createDataFrame(
            [
                (1, "mail a.b+c@x-corp.co.uk or call 555-1234 now"),
                (2, "two mails: p@q.io and r@s.org"),
                (3, "nothing sensitive here"),
            ],
            "id long, text string",
        )
        got = {r.id: (r.n_redactions, r.redacted) for r in redact_pii(df).collect()}
        assert got[1] == (2, "mail [PII] or call [PII] now")
        assert got[2] == (2, "two mails: [PII] and [PII]")
        assert got[3] == (0, "nothing sensitive here")

    def test_lang_id_markers(self, spark):
        df = spark.createDataFrame(
            [
                (1, "the cat and the dog of it"),
                (2, "der hund und die katze ist"),
                (3, "le chat et la maison est"),
                (4, "el perro y la casa es una"),
                (5, "你好 世界"),
                (6, "zzz qqq"),
            ],
            "doc_id long, text string",
        )
        got = {r.doc_id: r.pred_lang for r in language_id(df).collect()}
        assert got == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "zh", 6: "und"}

    def test_fingerprint_whitespace_invariant(self, spark):
        df = spark.createDataFrame(
            [(1, "a  b\tc"), (2, "A B C")], "doc_id long, text string"
        )
        fps = [r.fingerprint for r in document_fingerprint(df).collect()]
        assert fps[0] == fps[1]


class TestSessionize:
    def test_two_formulations_agree(self, events):
        a = session_stats(events, gap_minutes=30)
        b = session_window_stats(events, gap_minutes=30)
        assert a.count() == b.count()
        ta = sorted(
            (r.user_id, r.n_events, r.total_value) for r in a.collect()
        )
        tb = sorted(
            (r.user_id, r.n_events, r.total_value) for r in b.collect()
        )
        assert ta == tb

    def test_gap_splits_sessions(self, spark):
        df = spark.createDataFrame(
            [
                (1, 7, "2024-01-01 00:00:00", "click", 1.0, "{}"),
                (2, 7, "2024-01-01 00:10:00", "click", 1.0, "{}"),
                (3, 7, "2024-01-01 02:00:00", "click", 1.0, "{}"),
            ],
            "event_id long, user_id long, ts string, event_type string, value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = session_stats(df, gap_minutes=30).collect()
        assert len(out) == 2
        assert sorted(r.n_events for r in out) == [1, 2]


class TestMultimodal:
    def test_feature_extraction_roundtrip(self, docs):
        feats = extract_features(attach_fake_payload(docs))
        joined = feats.join(docs, "doc_id").select(
            "doc_id", "byte_len", F.length("text").alias("n")
        )
        bad = joined.filter(F.col("byte_len") != F.col("n")).count()
        assert bad == 0  # corpus is pure ASCII → byte_len == char count


class TestUdxf:
    def test_sentence_split_udtf(self, spark):
        from iceberg_evolve_spark.functions.udxf import split_sentences

        docs = spark.createDataFrame(
            [(1, "Hello there. How are you? Fine!"), (2, "One.. Two"), (3, None), (4, "...")],
            "doc_id long, text string",
        )
        got = sorted(
            (r.doc_id, r.sentence_idx, r.sentence) for r in split_sentences(docs).collect()
        )
        # raw-split indices survive dropped empties; None/only-punct docs emit nothing
        assert got == [
            (1, 1, "Hello there"),
            (1, 2, "How are you"),
            (1, 3, "Fine"),
            (2, 1, "One"),
            (2, 2, "Two"),
        ]

    def test_token_chunks_disjoint_and_tail(self, spark):
        from iceberg_evolve_spark.functions.udxf import chunk_tokens

        docs = spark.createDataFrame(
            [(1, "a b c d e"), (2, "x"), (3, "")], "doc_id long, text string"
        )
        got = sorted(
            (r.doc_id, r.chunk_idx, r.chunk_text, r.n_tokens)
            for r in chunk_tokens(docs, 2).collect()
        )
        assert got == [
            (1, 1, "a b", 2),
            (1, 2, "c d", 2),
            (1, 3, "e", 1),
            (2, 1, "x", 1),
        ]

    def test_geometric_mean_udaf(self, spark):
        from iceberg_evolve_spark.functions.udxf import geometric_mean

        df = spark.createDataFrame(
            [("A", 2.0), ("A", 8.0), ("B", 5.0), ("C", -1.0)], "k string, v double"
        )
        import math

        got = {
            r.k: r.g
            for r in df.groupBy("k").agg(geometric_mean("v").alias("g")).collect()
        }
        assert abs(got["A"] - 4.0) < 1e-9
        assert abs(got["B"] - 5.0) < 1e-9
        # no positive values → NaN, surfaced as SQL NULL through Arrow
        assert got["C"] is None or math.isnan(got["C"])


class TestMultimodalPlumbing:
    def test_resize_and_frame_sample(self, spark):
        from iceberg_evolve_spark.functions.multimodal import (
            attach_fake_payload,
            resize_images,
            sample_frames,
        )

        docs = spark.createDataFrame(
            [(0, "abcdefgh"), (1, "0123456789abcdef"), (2, "xy")],
            "doc_id long, text string",
        )
        media = attach_fake_payload(docs)
        metas = {r.doc_id: r.media_meta.asDict() for r in media.collect()}
        # media type cycles by id; time-based rows get a duration
        assert metas[0]["media_type"] == "image" and metas[0]["duration_ms"] is None
        assert metas[1]["media_type"] == "audio" and metas[1]["duration_ms"] == 160
        assert metas[2]["media_type"] == "video" and metas[2]["duration_ms"] == 20

        rz = {r.doc_id: r for r in resize_images(media, 64, 32).collect()}
        assert rz[0].width == 64 and rz[0].height == 32
        assert rz[0].scale_x == 64 / 8 and rz[0].scale_y == 32 / 8
        assert bytes(rz[1].payload) == b"0123456789abcdef"

        fr = sample_frames(media, every_ms=100).collect()
        by_doc = {}
        for r in fr:
            by_doc.setdefault(r.doc_id, []).append(r)
        assert 0 not in by_doc  # images produce no frames
        # audio doc 1: duration 160ms → frames at 0 and 100
        assert [r.t_ms for r in sorted(by_doc[1], key=lambda r: r.frame_idx)] == [0, 100]
        # video doc 2: duration 20ms → one frame at t=0, bytes from offset 0
        assert [(r.t_ms, bytes(r.frame)) for r in by_doc[2]] == [(0, b"xy")]


class TestSemanticDedup:
    def test_lowest_id_always_kept_and_verdicts_consistent(self, spark):
        """Within a near-dup set sharing a cell, the lowest id survives and
        every later duplicate is dropped with its trigger similarity."""
        from iceberg_evolve_spark.functions.dedup import semantic_dedup

        # Two tight direction groups + one far-off singleton, 4-dim.
        rows = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.999, 0.01, 0.0, 0.0]),   # dup of 0
            (2, [0.0, 1.0, 0.0, 0.0]),
            (3, [0.01, 0.999, 0.0, 0.0]),   # dup of 2
            (4, [0.0, 0.0, 1.0, 0.0]),      # singleton
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = {
            r.vec_id: r
            for r in semantic_dedup(
                df, "vec_id", threshold=0.95, n_centroids=2, seed="t"
            ).collect()
        }
        assert len(out) == 5
        # per-cell lowest ids carry the -1 sentinel and are kept
        sentinels = [r.vec_id for r in out.values() if r.max_sim_prior == -1.0]
        assert all(out[i].keep for i in sentinels)
        # a duplicate sharing its partner's cell must be dropped
        for lo, hi in [(0, 1), (2, 3)]:
            if out[lo].cell == out[hi].cell:
                assert not out[hi].keep and out[hi].max_sim_prior >= 0.95
                assert out[lo].keep or out[lo].max_sim_prior >= 0.95
        # the orthogonal singleton always survives
        assert out[4].keep

    def test_partition_invariance_and_plan_shape(self, emb):
        from iceberg_evolve_spark.functions.dedup import semantic_dedup

        a = semantic_dedup(emb.repartition(3), "vec_id", threshold=0.3)
        b = semantic_dedup(emb.repartition(11), "vec_id", threshold=0.3)
        ra = sorted(tuple(r) for r in a.collect())
        rb = sorted(tuple(r) for r in b.collect())
        assert ra == rb and ra
        plan = a._jdf.queryExecution().toString()
        assert "FlatMapGroupsInPandas" in plan  # Arrow kernel, not BatchEvalPython

    def test_semantic_is_subset_of_exact_within_corpus(self, emb):
        """Every doc SemDeDup drops has a genuine exact near-dup with a lower
        id (soundness); exact dedup may drop more (cross-cell pairs missed —
        the documented approximation)."""
        from iceberg_evolve_spark.functions.dedup import embedding_near_dups, semantic_dedup

        sem = semantic_dedup(emb, "vec_id", threshold=0.3)
        dropped = {r.vec_id for r in sem.filter(~F.col("keep")).collect()}
        exact_pairs = embedding_near_dups(emb, "vec_id", threshold=0.3).collect()
        exact_dropped = {p.id_b for p in exact_pairs}
        assert dropped <= exact_dropped


class TestIVFPQ:
    def test_pq_probe_matches_exact_probe_with_deep_rerank(self, emb, tmp_path):
        """The ADC stage only selects candidates; the rerank recomputes exact
        cosines, so with rerank covering a large slice of the probed cells the
        PQ top-k must equal the float probe's."""
        from iceberg_evolve_spark.functions.similarity import (
            build_ivf_index,
            load_ivf_index,
        )

        q = emb.filter("vec_id = 3").select("embedding").collect()[0][0]
        index = build_ivf_index(
            emb, str(tmp_path / "ivfpq"), "vec_id", "embedding",
            n_centroids=8, pq=True, pq_m=8, pq_k=8,
        )
        exact = [
            (r.vec_id, r.cosine)
            for r in index.probe(list(q), k=10, n_probe=4).collect()
        ]
        pq = [
            (r.vec_id, r.cosine)
            for r in index.probe_pq(list(q), k=10, n_probe=4, rerank=500).collect()
        ]
        assert pq == exact
        # Reopened index carries the PQ metadata and reproduces the answer.
        reopened = load_ivf_index(emb.sparkSession, str(tmp_path / "ivfpq"))
        assert [
            (r.vec_id, r.cosine)
            for r in reopened.probe_pq(list(q), k=10, n_probe=4, rerank=500).collect()
        ] == pq
        # Probe plan: partition-pruned, no model stage, ADC in codegen (no
        # Python eval).
        plan = (
            index.probe_pq(list(q), k=10, n_probe=4)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "_cell" in plan and "BatchEvalPython" not in plan

    def test_pq_codes_shape_and_determinism(self, emb, tmp_path):
        from iceberg_evolve_spark.functions.similarity import build_ivf_index

        index = build_ivf_index(
            emb, str(tmp_path / "ivfpq2"), "vec_id", "embedding",
            n_centroids=4, pq=True, pq_m=4, pq_k=8,
        )
        rows = index.assigned.select("vec_id", "pq_codes").collect()
        assert rows
        for r in rows:
            assert len(r.pq_codes) == 4
            assert all(0 <= c < 8 for c in r.pq_codes)
        # deterministic: a rebuild at another path yields identical codes
        index2 = build_ivf_index(
            emb, str(tmp_path / "ivfpq3"), "vec_id", "embedding",
            n_centroids=4, pq=True, pq_m=4, pq_k=8,
        )
        a = {r.vec_id: list(r.pq_codes) for r in rows}
        b = {r.vec_id: list(r.pq_codes) for r in index2.assigned.select("vec_id", "pq_codes").collect()}
        assert a == b

    def test_probe_pq_requires_pq_build(self, emb, tmp_path):
        from iceberg_evolve_spark.functions.similarity import build_ivf_index

        index = build_ivf_index(
            emb, str(tmp_path / "nopq"), "vec_id", "embedding", n_centroids=4
        )
        q = emb.filter("vec_id = 3").select("embedding").collect()[0][0]
        with pytest.raises(ValueError, match="pq=True"):
            index.probe_pq(list(q), k=5)

    def test_pq_recall_reasonable_at_shallow_rerank(self, emb, tmp_path):
        """With rerank = 4k the coarse ADC ordering must still surface most
        of the true top-k — the quality property PQ is used for. (Random
        near-orthogonal vectors are PQ's worst case; half recall at 4k-deep
        rerank on 16-code books is the measured floor.)"""
        from iceberg_evolve_spark.functions.similarity import build_ivf_index

        q = emb.filter("vec_id = 3").select("embedding").collect()[0][0]
        index = build_ivf_index(
            emb, str(tmp_path / "ivfpq4"), "vec_id", "embedding",
            n_centroids=4, pq=True, pq_m=8, pq_k=16,
        )
        exact = [r.vec_id for r in index.probe(list(q), k=10, n_probe=4).collect()]
        pq = [r.vec_id for r in index.probe_pq(list(q), k=10, n_probe=4, rerank=40).collect()]
        assert len(set(pq) & set(exact)) >= 5


class TestIVFAppend:
    def test_append_equals_full_rebuild(self, emb, tmp_path):
        """Appending a batch with saved centroids must give probes the same
        answers as building the index over the union in one shot (centroids
        are sampled from the initial corpus in both cases)."""
        from iceberg_evolve_spark.functions.similarity import build_ivf_index

        first = emb.filter("vec_id < 400")
        rest = emb.filter("vec_id >= 400")
        q = emb.filter("vec_id = 3").select("embedding").collect()[0][0]

        index = build_ivf_index(
            first, str(tmp_path / "inc"), "vec_id", "embedding",
            n_centroids=8, quantize=True, pq=True, pq_m=8, pq_k=8,
        )
        index.append(rest)
        # full rebuild with the SAME centroid sample source (first corpus)
        # is emulated by assigning the union against the saved centroids:
        got = [(r.vec_id, r.cosine) for r in index.probe(list(q), k=10, n_probe=8).collect()]
        # probing ALL cells == exact search over the union
        from iceberg_evolve_spark.functions.similarity import topk_brute_force
        want = [(r.vec_id, r.cosine) for r in topk_brute_force(emb, list(q), k=10).collect()]
        assert got == want
        # quantized + pq probes serve the appended rows too
        sq8 = [r.vec_id for r in index.probe_quantized(list(q), k=10, n_probe=8, rerank=500).collect()]
        pq = [r.vec_id for r in index.probe_pq(list(q), k=10, n_probe=8, rerank=500).collect()]
        assert sq8 == [v for v, _ in want] and pq == [v for v, _ in want]

    def test_append_rejects_incomplete_batch(self, emb, tmp_path):
        from iceberg_evolve_spark.functions.similarity import build_ivf_index

        index = build_ivf_index(
            emb, str(tmp_path / "inc2"), "vec_id", "embedding",
            n_centroids=4, quantize=True,
        )
        bad = emb.select("vec_id", "embedding")  # drops 'label' carried by the store
        with pytest.raises(ValueError, match="lacks index columns"):
            index.append(bad)


class TestIVFBatchProbe:
    def test_batch_matches_single_probes(self, emb, tmp_path):
        """Each query's batch rows must equal its single-query probe at the
        same settings — probe-cell selection, rounding, and tie-breaks
        included."""
        from pyspark.sql import functions as F2

        from iceberg_evolve_spark.functions.similarity import build_ivf_index

        index = build_ivf_index(
            emb, str(tmp_path / "ivfb"), "vec_id", "embedding", n_centroids=8
        )
        queries = emb.filter("vec_id < 4").select(
            F2.col("vec_id").alias("query_id"), F2.col("embedding").alias("qv")
        )
        batch = index.probe_batch(queries, k=10, n_probe=4)
        got = {}
        for r in batch.collect():
            got.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.cosine))
        for q in emb.filter("vec_id < 4").collect():
            single = [
                (i + 1, r.vec_id, r.cosine)
                for i, r in enumerate(index.probe(list(q.embedding), k=10, n_probe=4).collect())
            ]
            assert sorted(got[q.vec_id]) == single, f"query {q.vec_id}"

    def test_batch_plan_broadcasts_queries(self, emb, tmp_path):
        from pyspark.sql import functions as F2

        from iceberg_evolve_spark.functions.similarity import build_ivf_index

        index = build_ivf_index(
            emb, str(tmp_path / "ivfb2"), "vec_id", "embedding", n_centroids=4
        )
        queries = emb.filter("vec_id < 3").select(
            F2.col("vec_id").alias("query_id"), F2.col("embedding").alias("qv")
        )
        plan = (
            index.probe_batch(queries, k=5, n_probe=2)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan


class TestUnrolledFoldEquivalence:
    """The codegen-friendly unrolled expressions must be BIT-identical to
    the higher-order-function folds they replace (same left-assoc order;
    IEEE 0.0 + x == x) — the property that let the hot similarity paths
    switch without invalidating a single oracle hash."""

    def test_cosine_bitwise_equal(self, spark, sf_dir):
        from iceberg_evolve_spark.functions.similarity import (
            cosine_sim,
            cosine_sim_unrolled,
            dot,
            dot_unrolled,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
        dims = len(emb.first()["embedding"])
        centroid = [((i * 37) % 200 - 100) / 100.0 for i in range(dims)]
        q = F.array(*[F.lit(float(x)) for x in centroid])
        rows = emb.select(
            dot_unrolled(F.col("embedding"), q, dims).alias("du"),
            dot(F.col("embedding"), q).alias("df"),
            cosine_sim_unrolled(F.col("embedding"), q, dims).alias("cu"),
            cosine_sim(F.col("embedding"), q).alias("cf"),
        ).collect()
        assert rows
        for r in rows:
            assert r["du"] == r["df"]  # exact, not approx
            assert r["cu"] == r["cf"]


class TestRealBmpResize:
    def test_resize_pipeline_decodes_to_target(self, spark):
        """synth BMP → REAL nearest-neighbor resize → independent decode of
        the RESIZED bytes: geometry, scale factors, and the first pixel (a
        row-order + NN-mapping witness) must match the closed forms."""
        from iceberg_evolve_spark.functions.image import (
            decode_bmp_features,
            synth_bmp_payload,
            synth_params,
        )
        from iceberg_evolve_spark.functions.multimodal import resize_images

        ids = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
        media = synth_bmp_payload(ids).withColumn(
            "media_meta",
            F.struct(
                F.lit("image").alias("media_type"),
                F.lit("bmp").alias("format"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("long").alias("duration_ms"),
            ),
        )
        rz = resize_images(media, 8, 6)
        feats = {
            r["doc_id"]: r for r in decode_bmp_features(rz).collect()
        }
        scales = {r["doc_id"]: (r["scale_x"], r["scale_y"]) for r in rz.collect()}
        for did in range(10):
            w, h, left, right = synth_params(did)
            f = feats[did]
            assert (f["width"], f["height"]) == (8, 6)
            assert scales[did] == (8 / w, 6 / h)
            # first target pixel samples source (0,0) -> left colors, row 0
            assert (
                f["first_px_r"], f["first_px_g"], f["first_px_b"]
            ) == left

    def test_non_bmp_payload_passes_through(self, spark):
        from iceberg_evolve_spark.functions.multimodal import resize_images

        media = spark.createDataFrame(
            [(1, bytearray(b"\xff\xd8notreallyajpeg"))],
            "doc_id long, payload binary",
        ).withColumn(
            "media_meta",
            F.struct(
                F.lit("image").alias("media_type"),
                F.lit("jpeg").alias("format"),
                F.lit(100).alias("width"),
                F.lit(50).alias("height"),
                F.lit(None).cast("long").alias("duration_ms"),
            ),
        )
        (row,) = resize_images(media, 10, 5).collect()
        assert bytes(row["payload"]) == b"\xff\xd8notreallyajpeg"
        assert row["scale_x"] == 0.1 and row["scale_y"] == 0.1
