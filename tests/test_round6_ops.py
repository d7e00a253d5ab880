"""Round-6 operators: interval-overlap join, delta-join view maintenance,
temperature mixing, integer surprisal, perceptual image hashing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestIntervalOverlapJoin:
    def _brute(self, left, right, key=None):
        out = set()
        for l in left:
            for r in right:
                if key is not None and l[0] != r[0]:
                    continue
                ls, le = l[-2], l[-1]
                rs, re_ = r[-2], r[-1]
                if ls <= re_ and rs <= le:
                    out.add((l, r))
        return out

    def test_matches_brute_force_and_exactly_once(self, spark):
        from iceberg_evolve_spark.functions.range_join import interval_overlap_join

        # spans chosen to cross MANY buckets (width 10) so the exactly-once
        # rule is actually load-bearing, plus touching/disjoint edge cases
        left = [(1, 0, 35), (4, 40, 41), (2, 5, 95), (3, 7, 8)]
        right = [(101, 30, 80), (102, 41, 44), (103, 0, 4), (104, 96, 99)]
        ldf = spark.createDataFrame(left, "lid long, s long, e long")
        rdf = spark.createDataFrame(
            right, "rid long, rs long, re long"
        )
        got = {
            (r["lid"], r["rid"])
            for r in interval_overlap_join(
                ldf, rdf, on=[], left_start="s", left_end="e",
                right_start="rs", right_end="re", bucket_seconds=10,
            ).collect()
        }
        want = {
            (l[0], r[0]) for l, r in self._brute(left, right)
        }
        assert got == want
        # exactly-once: collect() with duplicates would differ from the set
        rows = interval_overlap_join(
            ldf, rdf, on=[], left_start="s", left_end="e",
            right_start="rs", right_end="re", bucket_seconds=10,
        ).collect()
        assert len(rows) == len(want)

    def test_keyed_join_restricts_pairs(self, spark):
        from iceberg_evolve_spark.functions.range_join import interval_overlap_join

        ldf = spark.createDataFrame(
            [("a", 1, 0, 100), ("b", 2, 0, 100)], "k string, lid long, s long, e long"
        )
        rdf = spark.createDataFrame(
            [("a", 11, 50, 60), ("b", 12, 200, 300)],
            "k string, rid long, rs long, re long",
        )
        rows = interval_overlap_join(
            ldf, rdf, on=["k"], left_start="s", left_end="e",
            right_start="rs", right_end="re", bucket_seconds=7,
        ).collect()
        assert [(r["k"], r["lid"], r["rid"]) for r in rows] == [("a", 1, 11)]

    def test_property_random_intervals(self, spark):
        import random

        from iceberg_evolve_spark.functions.range_join import interval_overlap_join

        rnd = random.Random(6)
        left = []
        right = []
        for i in range(60):
            s = rnd.randrange(0, 500)
            left.append((i, s, s + rnd.randrange(0, 80)))
            s2 = rnd.randrange(0, 500)
            right.append((1000 + i, s2, s2 + rnd.randrange(0, 80)))
        ldf = spark.createDataFrame(left, "lid long, s long, e long")
        rdf = spark.createDataFrame(right, "rid long, rs long, re long")
        for w in (13, 100, 1000):
            got = sorted(
                (r["lid"], r["rid"])
                for r in interval_overlap_join(
                    ldf, rdf, on=[], left_start="s", left_end="e",
                    right_start="rs", right_end="re", bucket_seconds=w,
                ).collect()
            )
            want = sorted((l[0], r[0]) for l, r in self._brute(left, right))
            assert got == want, f"bucket={w}"

    def test_property_negative_epochs(self, spark):
        # Pre-1970 intervals: with the old truncate-toward-zero bucket index
        # a pair straddling zero could compute its exactly-once bucket as one
        # neither side replicated to (truncation ≠ floor below zero) and be
        # silently dropped. F.floor keeps one bucket convention everywhere.
        import random

        from iceberg_evolve_spark.functions.range_join import interval_overlap_join

        rnd = random.Random(7)
        left = []
        right = []
        for i in range(60):
            s = rnd.randrange(-250, 250)
            left.append((i, s, s + rnd.randrange(0, 80)))
            s2 = rnd.randrange(-250, 250)
            right.append((1000 + i, s2, s2 + rnd.randrange(0, 80)))
        ldf = spark.createDataFrame(left, "lid long, s long, e long")
        rdf = spark.createDataFrame(right, "rid long, rs long, re long")
        for w in (13, 100, 1000):
            got = sorted(
                (r["lid"], r["rid"])
                for r in interval_overlap_join(
                    ldf, rdf, on=[], left_start="s", left_end="e",
                    right_start="rs", right_end="re", bucket_seconds=w,
                ).collect()
            )
            want = sorted((l[0], r[0]) for l, r in self._brute(left, right))
            assert got == want, f"bucket={w}"


class TestDeltaJoinRows:
    def test_merge_equals_full_recompute(self, spark):
        from iceberg_evolve_spark.operators.incremental import delta_join_rows

        cust = spark.createDataFrame(
            [(1, "A"), (2, "B"), (3, "A"), (4, "C")], "ck long, seg string"
        )
        orders = spark.createDataFrame(
            [(1, 10), (1, 11), (2, 20), (3, 30), (4, 40), (4, 41)],
            "ck long, amt long",
        )
        base_c = cust.filter("ck <= 2")
        delta_c = cust.filter("ck > 2")
        base_o = orders.filter("amt % 2 = 0")
        delta_o = orders.filter("amt % 2 = 1")
        view = base_c.join(base_o, "ck")
        merged = view.unionByName(
            delta_join_rows(base_c, base_o, delta_c, delta_o, ["ck"])
        )
        full = cust.join(orders, "ck")
        key = lambda df: sorted(tuple(r) for r in df.collect())
        assert key(merged) == key(full)

    def test_no_base_by_base_rejoin(self, spark):
        """The delta terms never join base_left × base_right: poisoning the
        pair (base_c', base_o') with mismatched copies must not change the
        delta rows — only the three delta terms are computed."""
        from iceberg_evolve_spark.operators.incremental import delta_join_rows

        base_c = spark.createDataFrame([(1, "A")], "ck long, seg string")
        base_o = spark.createDataFrame([(1, 10)], "ck long, amt long")
        empty_c = base_c.filter(F.lit(False))
        empty_o = base_o.filter(F.lit(False))
        # no deltas → no new rows, regardless of base contents
        assert delta_join_rows(base_c, base_o, empty_c, empty_o, ["ck"]).count() == 0


class TestTemperatureMixture:
    def test_pow_halves_matches_float_pow(self, spark):
        from iceberg_evolve_spark.functions.sampling import _pow_halves

        df = spark.createDataFrame(
            [(float(x),) for x in (1, 2, 10, 100, 12345)], "x double"
        )
        for alpha in (0.5, 0.25, 0.75, 1.0, 0.0625):
            got = [
                r["y"] for r in df.select(_pow_halves(F.col("x"), alpha).alias("y")).collect()
            ]
            want = [x ** alpha for x in (1, 2, 10, 100, 12345)]
            for g, w in zip(got, want):
                assert g == pytest.approx(w, rel=1e-12)

    def test_pow_halves_rejects_non_dyadic(self):
        from iceberg_evolve_spark.functions.sampling import _pow_halves

        with pytest.raises(ValueError):
            _pow_halves(F.lit(2.0), 0.3)
        with pytest.raises(ValueError):
            _pow_halves(F.lit(2.0), 1.5)

    def test_rebalances_toward_alpha_shares(self, spark):
        from iceberg_evolve_spark.functions.sampling import temperature_mixture_sample

        rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
        df = spark.createDataFrame(rows, "id long, dom string")
        kept = temperature_mixture_sample(
            df, "dom", F.col("id").cast("string"), alpha=0.5
        )
        by = {r["dom"]: r["n"] for r in kept.groupBy("dom").agg(F.count(F.lit(1)).alias("n")).collect()}
        # binding domain (small: n/w = sqrt(n) is smallest) keeps everything
        assert by["small"] == 100
        # big is downsampled toward sqrt(900)/sqrt(100) = 3x small's share
        assert 200 < by["big"] < 400
        # determinism: re-running selects the identical row set
        ids1 = sorted(r["id"] for r in kept.collect())
        ids2 = sorted(
            r["id"]
            for r in temperature_mixture_sample(
                df, "dom", F.col("id").cast("string"), alpha=0.5
            ).collect()
        )
        assert ids1 == ids2

    def test_alpha_one_keeps_everything(self, spark):
        from iceberg_evolve_spark.functions.sampling import temperature_mixture_sample

        df = spark.createDataFrame(
            [(i, "a" if i % 3 else "b") for i in range(300)], "id long, dom string"
        )
        kept = temperature_mixture_sample(df, "dom", F.col("id").cast("string"), alpha=1.0)
        # alpha=1: w = n, every domain binds equally (n/w = 1) → keep all
        assert kept.count() == 300


class TestUnigramSurprisal:
    def test_hand_computed_corpus(self, spark):
        from iceberg_evolve_spark.functions.text import unigram_surprisal

        df = spark.createDataFrame(
            [(1, "the the the rare"), (2, "the the common common")],
            "doc_id long, text string",
        )
        # freqs: the=5, common=2, rare=1; total=8
        # surprisal: the -> bit_length(8//5=1)=1; common -> bit_length(4)=3;
        # rare -> bit_length(8)=4
        got = {r["doc_id"]: (r["n_words"], r["sum_surprisal"]) for r in unigram_surprisal(df).collect()}
        assert got[1] == (4, 1 + 1 + 1 + 4)
        assert got[2] == (4, 1 + 1 + 3 + 3)


class TestAverageHash:
    def test_brute_force_equivalence(self):
        from iceberg_evolve_spark.functions.image import (
            AHASH_GRID,
            _bmp_bytes,
            _decode_pixels,
            average_hash_one,
            synth_params,
        )

        for d in (0, 3, 17, 44, 123):
            p = _bmp_bytes(*synth_params(d))
            feats = average_hash_one(p)
            w, h, rows = _decode_pixels(p)
            total = sum(sum(px) for row in rows for px in row)
            want = 0
            for gy in range(AHASH_GRID):
                for gx in range(AHASH_GRID):
                    cs = cn = 0
                    for y in range(h):
                        if y * AHASH_GRID // h != gy:
                            continue
                        for x in range(w):
                            if x * AHASH_GRID // w != gx:
                                continue
                            cs += sum(rows[y][x])
                            cn += 1
                    if cs * (w * h) > total * cn:
                        want |= 1 << (gy * AHASH_GRID + gx)
            assert feats["ahash"] == want
            assert feats["gray_total"] == total

    def test_identical_params_collide(self):
        from iceberg_evolve_spark.functions.image import (
            _bmp_bytes,
            average_hash_one,
            synth_params,
        )

        # synth params are periodic: find two ids with identical params
        a, b = 0, 0
        for cand in range(1, 200000):
            if synth_params(cand) == synth_params(0):
                a, b = 0, cand
                break
        assert b, "no param collision found"
        ha = average_hash_one(_bmp_bytes(*synth_params(a)))["ahash"]
        hb = average_hash_one(_bmp_bytes(*synth_params(b)))["ahash"]
        assert ha == hb

    def test_brightness_inversion_flips_bits(self):
        from iceberg_evolve_spark.functions.image import (
            AHASH_GRID,
            _bmp_bytes,
            average_hash_one,
        )

        dark = (10, 10, 10)
        bright = (200, 200, 200)
        h1 = average_hash_one(_bmp_bytes(8, 8, dark, bright))["ahash"]
        h2 = average_hash_one(_bmp_bytes(8, 8, bright, dark))["ahash"]
        mask = (1 << (AHASH_GRID * AHASH_GRID)) - 1
        assert h1 == (~h2) & mask


class TestLabelPropagation:
    def test_two_cliques_with_bridge(self, spark):
        from iceberg_evolve_spark.functions.graph import label_propagation

        # two triangles joined by one bridge edge: LPA must find 2
        # communities (bridge is outvoted), labeled by each clique's min id
        edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["label"] for r in label_propagation(df, rounds=4).collect()}
        assert got[1] == got[2] == got[3] == 1
        assert got[10] == got[11] == got[12]
        assert got[10] != got[1]

    def test_matches_unrolled_sql(self, spark):
        import duckdb

        from iceberg_evolve_spark.functions.graph import (
            label_propagation,
            label_propagation_unrolled_sql,
        )

        import random

        rnd = random.Random(66)
        edges = list({(rnd.randrange(0, 40), rnd.randrange(0, 40)) for _ in range(90)})
        df = spark.createDataFrame(edges, "src long, dst long")
        got = sorted(
            (r["node"], r["label"]) for r in label_propagation(df, rounds=3).collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE lp_in (s BIGINT, d BIGINT)")
        con.executemany("INSERT INTO lp_in VALUES (?, ?)", edges)
        sql = (
            "WITH "
            + label_propagation_unrolled_sql(
                "SELECT s, d FROM lp_in", rounds=3
            ).split("\n-- final labels")[0]
            + "\nSELECT node, label FROM lp_l3 ORDER BY node"
        )
        want = sorted(tuple(r) for r in con.execute(sql).fetchall())
        assert got == want

    def test_determinism_across_partitionings(self, spark):
        from iceberg_evolve_spark.functions.graph import label_propagation

        edges = [(i, i + 1) for i in range(0, 30, 2)] + [(0, 28), (1, 17)]
        a = spark.createDataFrame(edges, "src long, dst long").repartition(1)
        b = spark.createDataFrame(edges, "src long, dst long").repartition(13)
        ra = sorted(tuple(r) for r in label_propagation(a, rounds=4).collect())
        rb = sorted(tuple(r) for r in label_propagation(b, rounds=4).collect())
        assert ra == rb


class TestCdc:
    def _setup(self, spark):
        from pyspark.sql import types as T

        snap = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "k long, v string, p double",
        )
        schema = T.StructType(
            [
                T.StructField("k", T.LongType()),
                T.StructField("v", T.StringType()),
                T.StructField("p", T.DoubleType()),
            ]
        )
        return snap, schema

    def test_parse_and_apply_all_ops(self, spark):
        import json

        from iceberg_evolve_spark.operators.cdc import apply_cdc, parse_cdc_envelopes

        snap, schema = self._setup(spark)
        envs = [
            json.dumps({"op": "u", "ts_ms": 5, "after": {"k": 1, "v": "a2", "p": 11.0}}),
            json.dumps({"op": "d", "ts_ms": 5, "before": {"k": 2, "v": "b", "p": 20.0}}),
            json.dumps({"op": "c", "ts_ms": 5, "after": {"k": 9, "v": "new", "p": 90.0}}),
        ]
        raw = spark.createDataFrame([(e,) for e in envs], "envelope string")
        out = apply_cdc(
            snap, parse_cdc_envelopes(raw, "envelope", schema), "k"
        )
        got = {r["k"]: (r["v"], r["p"]) for r in out.collect()}
        assert got == {1: ("a2", 11.0), 3: ("c", 30.0), 9: ("new", 90.0)}

    def test_last_writer_wins_and_delete_breaks_ties(self, spark):
        import json

        from iceberg_evolve_spark.operators.cdc import apply_cdc, parse_cdc_envelopes

        snap, schema = self._setup(spark)
        envs = [
            json.dumps({"op": "u", "ts_ms": 1, "after": {"k": 1, "v": "x", "p": 1.0}}),
            json.dumps({"op": "u", "ts_ms": 9, "after": {"k": 1, "v": "y", "p": 2.0}}),
            # same ts as the 'u' below: delete wins the tie
            json.dumps({"op": "u", "ts_ms": 4, "after": {"k": 2, "v": "z", "p": 3.0}}),
            json.dumps({"op": "d", "ts_ms": 4, "before": {"k": 2, "v": "b", "p": 20.0}}),
        ]
        raw = spark.createDataFrame([(e,) for e in envs], "envelope string")
        out = apply_cdc(snap, parse_cdc_envelopes(raw, "envelope", schema), "k")
        got = {r["k"]: r["v"] for r in out.collect()}
        assert got == {1: "y", 3: "c"}

    def test_malformed_envelope_yields_null_op(self, spark):
        from iceberg_evolve_spark.operators.cdc import parse_cdc_envelopes

        _, schema = self._setup(spark)
        raw = spark.createDataFrame([("not json",)], "envelope string")
        rows = parse_cdc_envelopes(raw, "envelope", schema).collect()
        assert rows[0]["op"] is None  # dead-letter-routable, no task crash


class TestSlidingHll:
    def test_estimate_tracks_exact_on_shifting_stream(self, spark):
        from iceberg_evolve_spark.functions.sketch import hll_sliding_distinct

        # bucket t holds users [100t, 100t+50): trailing-3 exact = 150
        # once 3 buckets accumulate (memberships are disjoint per bucket)
        rows = [(t, f"u{100 * t + i}") for t in range(6) for i in range(50)]
        df = spark.createDataFrame(rows, "b long, u string")
        from pyspark.sql import functions as F

        est = {
            r["out_bucket"]: r["est_distinct"]
            for r in hll_sliding_distinct(df, F.col("u"), "b", window_n=3, b=8).collect()
        }
        assert set(est) == set(range(6))
        for t in range(2, 6):
            assert abs(est[t] - 150) / 150 < 0.25  # HLL accuracy band at m=256
        assert abs(est[0] - 50) / 50 < 0.25  # partial window: only bucket 0

    def test_output_restricted_to_present_buckets(self, spark):
        from pyspark.sql import functions as F

        from iceberg_evolve_spark.functions.sketch import hll_sliding_distinct

        df = spark.createDataFrame([(10, "a"), (14, "b")], "b long, u string")
        out = sorted(
            r["out_bucket"]
            for r in hll_sliding_distinct(df, F.col("u"), "b", window_n=5, b=6).collect()
        )
        assert out == [10, 14]  # buckets 11-13 have no data rows → no output


class TestGroupedSplit:
    def test_no_group_straddles_splits(self, spark):
        from iceberg_evolve_spark.functions.sampling import grouped_split

        rows = [(i, f"g{i % 37}") for i in range(2000)]
        df = spark.createDataFrame(rows, "id long, grp string")
        s = grouped_split(df, "grp")
        from pyspark.sql import functions as F

        per_group = s.groupBy("grp").agg(F.countDistinct("split").alias("n"))
        assert per_group.filter("n > 1").count() == 0
        # all three splits appear over enough groups
        assert s.select("split").distinct().count() >= 2

    def test_deterministic_and_weight_sensitive(self, spark):
        from iceberg_evolve_spark.functions.sampling import grouped_split

        rows = [(i, f"g{i}") for i in range(3000)]
        df = spark.createDataFrame(rows, "id long, grp string")
        a = grouped_split(df, "grp", {"train": 0.5, "test": 0.5})
        b = grouped_split(df, "grp", {"train": 0.5, "test": 0.5})
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
        frac = a.filter("split = 'train'").count() / 3000
        assert 0.45 < frac < 0.55

    def test_rejects_nonpositive_weights(self, spark):
        from iceberg_evolve_spark.functions.sampling import grouped_split

        df = spark.createDataFrame([(1, "g")], "id long, grp string")
        with pytest.raises(ValueError):
            grouped_split(df, "grp", {"train": 0.0, "test": 0.0})


class TestBinaryQuantization:
    def test_codes_match_python_reference(self, spark):
        import random

        from iceberg_evolve_spark.functions.embedding import binary_quantize

        rnd = random.Random(9)
        rows = [
            (i, [rnd.uniform(-1, 1) for _ in range(64)]) for i in range(50)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = {
            r["vec_id"]: (r["bq_lo"], r["bq_hi"])
            for r in binary_quantize(df).collect()
        }
        for vid, vec in rows:
            lo = sum(1 << i for i in range(32) if vec[i] >= 0)
            hi = sum(1 << i for i in range(32) if vec[32 + i] >= 0)
            assert got[vid] == (lo, hi), vid
        # boundary: exact zero counts as a set bit (>= 0)
        zdf = spark.createDataFrame(
            [(1, [0.0] * 64)], "vec_id long, embedding array<double>"
        )
        r = binary_quantize(zdf).first()
        assert (r["bq_lo"], r["bq_hi"]) == ((1 << 32) - 1, (1 << 32) - 1)

    def test_hamming_topk_matches_brute_force(self, spark):
        import random

        from iceberg_evolve_spark.functions.embedding import (
            binary_quantize,
            hamming_topk,
        )

        rnd = random.Random(10)
        rows = [(i, [rnd.uniform(-1, 1) for _ in range(64)]) for i in range(200)]
        df = binary_quantize(
            spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        )
        q = rows[3][1]
        q_lo = sum(1 << i for i in range(32) if q[i] >= 0)
        q_hi = sum(1 << i for i in range(32) if q[32 + i] >= 0)
        got = [
            (r["vec_id"], r["hamming"])
            for r in hamming_topk(df, q_lo, q_hi, k=7).collect()
        ]
        def ham(vec):
            lo = sum(1 << i for i in range(32) if vec[i] >= 0)
            hi = sum(1 << i for i in range(32) if vec[32 + i] >= 0)
            return bin(lo ^ q_lo).count("1") + bin(hi ^ q_hi).count("1")
        want = sorted(((ham(v), i) for i, v in rows))[:7]
        assert got == [(i, h) for h, i in want]

    def test_rejects_wide_vectors(self):
        from iceberg_evolve_spark.functions.embedding import binary_quantize

        with pytest.raises(ValueError):
            binary_quantize(None, dim=128)
