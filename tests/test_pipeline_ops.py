"""Behavioral tests for the round-2 training-pipeline operators: boilerplate
segment removal, domain-mixture sampling, shard layout, containment dedup."""

from pyspark.sql import functions as F

from iceberg_evolve_spark.functions.dedup import (
    ngram_containment_pairs,
    ngram_jaccard_pairs,
)
from iceberg_evolve_spark.functions.sampling import (
    domain_mixture_sample,
    shard_assignments,
)
from iceberg_evolve_spark.functions.text import remove_repeated_segments

BOILER = "all rights reserved contact us"  # exactly 5 tokens


class TestBoilerplateRemoval:
    def _df(self, spark):
        rows = [
            (1, f"{BOILER} alpha beta gamma delta epsilon"),
            (2, f"{BOILER} zeta eta theta iota kappa"),
            (3, f"{BOILER} lam mu nu xi omicron"),
            (4, "pi rho sigma tau upsilon phi chi psi omega one"),
            (5, BOILER),  # pure boilerplate
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_shared_segment_removed_unique_kept(self, spark):
        out = {
            r["doc_id"]: r
            for r in remove_repeated_segments(self._df(spark), k=5, min_docs=3).collect()
        }
        assert out[1]["clean_text"] == "alpha beta gamma delta epsilon"
        assert out[1]["n_segments"] == 2 and out[1]["n_removed"] == 1
        # doc 4 shares nothing: untouched
        assert out[4]["n_removed"] == 0
        assert out[4]["clean_text"].startswith("pi rho sigma tau upsilon")
        # doc 5 is pure boilerplate: survives with empty text
        assert out[5]["clean_text"] == "" and out[5]["n_removed"] == 1

    def test_order_preserved(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d e " + BOILER + " f g h i j")], "doc_id long, text string"
        )
        # boilerplate segment sits in the middle; neighbors must rejoin in order
        other = spark.createDataFrame(
            [(2, BOILER + " x1 x2 x3 x4 x5"), (3, BOILER + " y1 y2 y3 y4 y5")],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r["clean_text"]
            for r in remove_repeated_segments(df.union(other), k=5, min_docs=3).collect()
        }
        assert out[1] == "a b c d e f g h i j"


class TestDomainMixture:
    def _docs(self, spark):
        rows = [(i, "big" if i < 300 else ("small" if i < 360 else "drop")) for i in range(400)]
        return spark.createDataFrame(rows, "doc_id long, lang string")

    def test_binding_domain_kept_whole_and_unlisted_dropped(self, spark):
        out = domain_mixture_sample(
            self._docs(spark), "lang", "doc_id", {"big": 0.5, "small": 0.5}
        )
        counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        # small binds (60/0.5=120 < 300/0.5=600): all 60 rows kept
        assert counts["small"] == 60
        # big is hash-downsampled toward 60 expected rows
        assert 30 <= counts["big"] <= 90
        assert "drop" not in counts

    def test_partitioning_invariance(self, spark):
        docs = self._docs(spark)
        a = sorted(
            r["doc_id"]
            for r in domain_mixture_sample(docs, "lang", "doc_id", {"big": 0.7, "small": 0.3}).collect()
        )
        b = sorted(
            r["doc_id"]
            for r in domain_mixture_sample(
                docs.repartition(13), "lang", "doc_id", {"big": 0.7, "small": 0.3}
            ).collect()
        )
        assert a == b


class TestShardAssignments:
    def test_dense_positions_and_determinism(self, spark):
        df = spark.range(0, 500).select(F.col("id").alias("doc_id"))
        out = shard_assignments(df, "doc_id", n_shards=8)
        rows = out.collect()
        assert all(0 <= r["shard"] < 8 for r in rows)
        by_shard: dict[int, list[int]] = {}
        for r in rows:
            by_shard.setdefault(r["shard"], []).append(r["pos_in_shard"])
        for positions in by_shard.values():
            assert sorted(positions) == list(range(1, len(positions) + 1))
        again = sorted(
            (r["doc_id"], r["shard"], r["pos_in_shard"])
            for r in shard_assignments(df.repartition(17), "doc_id", n_shards=8).collect()
        )
        assert again == sorted((r["doc_id"], r["shard"], r["pos_in_shard"]) for r in rows)


class TestContainment:
    def test_subset_caught_by_containment_not_jaccard(self, spark):
        short = "one two three four five six"
        long = short + " seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen"
        df = spark.createDataFrame(
            [(1, short), (2, long)], "doc_id long, text string"
        )
        cont = ngram_containment_pairs(df, "doc_id", k=3, threshold=0.9).collect()
        directed = {(r["src_id"], r["dst_id"]): r["containment"] for r in cont}
        assert directed[(1, 2)] == 1.0  # short fully contained in long
        assert (2, 1) not in directed  # long is not contained in short
        jac = ngram_jaccard_pairs(df, "doc_id", k=3, threshold=0.5).collect()
        assert jac == []  # symmetric measure misses the subset pair


class TestQualityPercentilePrune:
    def test_ties_travel_together_and_singletons_survive(self, spark):
        from iceberg_evolve_spark.functions.text import quality_percentile_prune

        # 10 docs in lang A: 4 identical low-quality (short), 6 high-quality.
        low = "tiny text"
        high = ("the quick brown fox jumps over the lazy dog and keeps running " * 8).strip()
        rows = [(i, low, "A") for i in range(4)] + [(i, high, "A") for i in range(4, 10)]
        rows.append((99, high, "B"))  # singleton stratum must survive
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        kept = {
            r["doc_id"]
            for r in quality_percentile_prune(df, stratum="lang", drop_frac=0.2).collect()
        }
        # drop_frac 0.2 of 10 = 2 docs, but the 4 low-quality docs tie on the
        # cutoff score: the cutoff rule drops score<=cut groups wholly, and
        # cum(4) <= 2 is false, so NO score group qualifies -> all kept... or
        # with cut at a lower bucket nothing drops. Assert invariants instead:
        # singletons survive, and no kept doc scores below a dropped one.
        assert 99 in kept
        dropped = {r[0] for r in rows} - kept
        if dropped:
            from iceberg_evolve_spark.functions.text import add_text_stats

            scored = {
                r["doc_id"]: round(r["quality_score"], 6)
                for r in add_text_stats(df).collect()
            }
            assert max(scored[d] for d in dropped) <= min(scored[k] for k in kept)

    def test_drop_fraction_bounded(self, spark, sf_dir):
        from iceberg_evolve_spark.functions.text import quality_percentile_prune

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        total = docs.count()
        kept = quality_percentile_prune(docs, stratum="lang", drop_frac=0.2).count()
        # cutoff rule never drops more than drop_frac (cum <= frac*n)
        assert kept >= total * 0.8 - 1
        assert kept < total  # and it does drop something on real data


class TestCrossOperatorProperties:
    """Relationships that must hold between the dedup measures."""

    def test_containment_dominates_jaccard(self, spark, sf_dir):
        """For any pair, max-direction containment >= Jaccard (the union is at
        least as large as either side), and both derive from the same
        intersection counts."""
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        jac = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(docs, "doc_id", k=3, threshold=0.3).collect()
        }
        cont = {}
        for r in ngram_containment_pairs(docs, "doc_id", k=3, threshold=0.0).collect():
            key = (min(r["src_id"], r["dst_id"]), max(r["src_id"], r["dst_id"]))
            cont[key] = max(cont.get(key, 0.0), r["containment"])
        for pair, j in jac.items():
            assert pair in cont
            assert cont[pair] >= j - 1e-9

    def test_novelty_of_first_document_is_total(self, spark):
        from iceberg_evolve_spark.functions.text import ngram_novelty

        df = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon zeta"),
                (2, "alpha beta gamma delta epsilon zeta"),  # verbatim copy
                (3, "totally different words appear here now"),
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in ngram_novelty(df, k=3).collect()}
        assert out[1]["novelty"] == 1.0  # first occurrence owns every gram
        assert out[2]["novelty"] == 0.0  # the copy contributes nothing
        assert out[3]["novelty"] == 1.0

    def test_mixture_then_shards_compose(self, spark, sf_dir):
        """The pipeline shape a training run uses: mixture-resample, then lay
        out shards — shard balance must hold on the sampled subset."""
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        mixed = domain_mixture_sample(
            docs, "lang", "doc_id", {"en": 0.5, "de": 0.25, "fr": 0.25}
        )
        sharded = shard_assignments(mixed, "doc_id", n_shards=4)
        sizes = [
            r["n"]
            for r in sharded.groupBy("shard").agg(F.count("*").alias("n")).collect()
        ]
        assert len(sizes) == 4
        assert max(sizes) <= 2 * min(sizes)  # hash balance at this scale


class TestCurriculumShards:
    def test_order_by_controls_within_shard_order(self, spark, sf_dir):
        from iceberg_evolve_spark.functions.text import add_text_stats

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        scored = add_text_stats(docs).select(
            "doc_id", F.round("quality_score", 6).alias("q")
        )
        sharded = shard_assignments(
            scored, "doc_id", n_shards=4, order_by=[F.col("q").desc()]
        ).collect()
        by_shard: dict[int, list] = {}
        for r in sharded:
            by_shard.setdefault(r["shard"], []).append((r["pos_in_shard"], r["q"]))
        for rows in by_shard.values():
            qs = [q for _, q in sorted(rows)]
            assert qs == sorted(qs, reverse=True)  # cleanest docs first


class TestGopherSignals:
    def test_rule_battery_on_crafted_docs(self, spark):
        from iceberg_evolve_spark.functions.text import gopher_signals

        good = " ".join(f"alpha{i} beta{i}" for i in range(30))  # 60 distinct tokens
        loop = " ".join(["spam spam"] * 40)  # one 2-gram covers everything
        nums = " ".join(["1234 5678"] * 30)  # no alphabetic words
        short = "tiny document"
        df = spark.createDataFrame(
            [(0, good), (1, loop), (2, nums), (3, short)], "doc_id long, text string"
        )
        out = {r.doc_id: r for r in gopher_signals(df).collect()}
        assert out[0].gopher_pass
        assert not out[1].gopher_pass and out[1].top_2gram_char_frac > 0.2
        assert not out[2].gopher_pass and out[2].frac_alpha_words == 0.0
        assert not out[3].gopher_pass and out[3].n_tokens == 2

    def test_tie_break_is_deterministic(self, spark):
        """Two 2-grams with equal max count → the lexicographically greatest
        gram is charged, in any row order."""
        from iceberg_evolve_spark.functions.text import gopher_signals

        text = "aa bb aa bb zz yy zz yy"  # "aa bb" x2... and "zz yy" x2
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        r = gopher_signals(df).first()
        # winning gram is "zz yy" (len 5); count 2; text length 23
        assert r.top_2gram_char_frac == round(2 * 5 / 23, 6)

    def test_zero_shuffle_plan(self, spark, sf_dir):
        from iceberg_evolve_spark.functions.text import gopher_signals
        from iceberg_evolve_spark.sources import load_table

        df = gopher_signals(load_table(spark, sf_dir, "documents"))
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the only allowed Exchange is ensure_parallelism's round-robin
        # repartition — no computation shuffle, no Python fallback
        assert "hashpartitioning" not in plan.lower()
        assert "BatchEvalPython" not in plan


class TestFeatureHashing:
    def test_weights_match_portable_hash_definition(self, spark):
        """Buckets/signs follow the md5 definition exactly (collisions
        included) — expected weights computed from an independent mirror."""
        import hashlib

        from iceberg_evolve_spark.functions.hashing import SEP
        from iceberg_evolve_spark.functions.text import feature_hashing

        def h60(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

        docs = {0: "alpha alpha beta", 1: "alpha"}
        expected = {}
        for d, text in docs.items():
            for t in text.split():
                b = h60(t) % 16
                s = h60(f"{t}{SEP}1") % 2 * 2 - 1
                expected[(d, b)] = expected.get((d, b), 0) + s
        df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
        got = {(r.doc_id, r.bucket): r.weight for r in feature_hashing(df, dim=16).collect()}
        assert got == expected

    def test_partition_invariance(self, spark, sf_dir):
        from iceberg_evolve_spark.functions.text import feature_hashing
        from iceberg_evolve_spark.sources import load_table

        docs = load_table(spark, sf_dir, "documents")
        a = sorted(tuple(r) for r in feature_hashing(docs.repartition(3)).collect())
        b = sorted(tuple(r) for r in feature_hashing(docs.repartition(17)).collect())
        assert a == b and a
