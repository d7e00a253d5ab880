"""Unit tests for SCD2 interval building and point-in-time lookup."""

from datetime import datetime

from pyspark.sql import functions as F

from iceberg_evolve_spark.operators.scd import as_of_lookup, scd2_intervals


def _events(spark):
    rows = [
        # key 1: A at t1-t2, B at t3, back to A at t4 (A≠merged: non-adjacent)
        (1, "A", datetime(2020, 1, 1), 101),
        (1, "A", datetime(2020, 2, 1), 102),
        (1, "B", datetime(2020, 3, 1), 103),
        (1, "A", datetime(2020, 4, 1), 104),
        # key 2: single observation
        (2, "X", datetime(2020, 1, 15), 201),
    ]
    return spark.createDataFrame(rows, "k long, attr string, ts timestamp, seq long")


def test_scd2_runs_and_intervals(spark):
    out = scd2_intervals(_events(spark), "k", ["attr"], "ts", tiebreak="seq")
    rows = {(r.k, r.version): r for r in out.collect()}
    assert len(rows) == 4  # 3 runs for key 1, 1 for key 2
    r1 = rows[(1, 1)]
    assert r1.attr == "A" and r1.valid_from == datetime(2020, 1, 1)
    assert r1.valid_to == datetime(2020, 3, 1)  # closed by the B run
    r2 = rows[(1, 2)]
    assert r2.attr == "B" and r2.valid_to == datetime(2020, 4, 1)
    r3 = rows[(1, 3)]
    assert r3.attr == "A" and r3.valid_to is None  # current
    assert rows[(2, 1)].valid_to is None


def test_scd2_same_ts_tiebreak_deterministic(spark):
    rows = [
        (1, "A", datetime(2020, 1, 1), 2),
        (1, "B", datetime(2020, 1, 1), 1),  # same ts — seq orders B first
    ]
    df = spark.createDataFrame(rows, "k long, attr string, ts timestamp, seq long")
    out = scd2_intervals(df, "k", ["attr"], "ts", tiebreak="seq").orderBy("version")
    got = [(r.attr, r.version) for r in out.collect()]
    assert got == [("B", 1), ("A", 2)]


def test_scd2_null_attr_run(spark):
    """NULL attribute values form runs too (eqNullSafe semantics)."""
    rows = [
        (1, None, datetime(2020, 1, 1), 1),
        (1, None, datetime(2020, 2, 1), 2),
        (1, "A", datetime(2020, 3, 1), 3),
    ]
    df = spark.createDataFrame(rows, "k long, attr string, ts timestamp, seq long")
    out = scd2_intervals(df, "k", ["attr"], "ts", tiebreak="seq").orderBy("version")
    got = [(r.attr, r.version) for r in out.collect()]
    assert got == [(None, 1), ("A", 2)]


def test_as_of_lookup(spark):
    dim = scd2_intervals(_events(spark), "k", ["attr"], "ts", tiebreak="seq")
    facts = spark.createDataFrame(
        [
            (1, datetime(2020, 1, 20)),  # inside run A v1
            (1, datetime(2020, 3, 15)),  # inside run B
            (1, datetime(2021, 1, 1)),   # open-ended current run A v3
            (1, datetime(2019, 1, 1)),   # before any interval → null
            (2, datetime(2020, 6, 1)),   # key 2 current
        ],
        "k long, fts timestamp",
    )
    out = as_of_lookup(dim, facts, "k", "fts")
    got = {(r.k, r.fts): r.attr for r in out.collect()}
    assert got[(1, datetime(2020, 1, 20))] == "A"
    assert got[(1, datetime(2020, 3, 15))] == "B"
    assert got[(1, datetime(2021, 1, 1))] == "A"
    assert got[(1, datetime(2019, 1, 1))] is None
    assert got[(2, datetime(2020, 6, 1))] == "X"


def test_as_of_lookup_version_matches_interval_count(spark):
    """Every fact inside some interval gets exactly one dimension row."""
    dim = scd2_intervals(_events(spark), "k", ["attr"], "ts", tiebreak="seq")
    facts = spark.createDataFrame(
        [(1, datetime(2020, 2, 15))], "k long, fts timestamp"
    )
    assert as_of_lookup(dim, facts, "k", "fts").count() == 1


class TestScd2Properties:
    """Property-based invariants over randomized event streams."""

    def test_intervals_partition_the_timeline(self, spark):
        from hypothesis import given, settings, strategies as st

        @st.composite
        def event_stream(draw):
            n = draw(st.integers(min_value=1, max_value=30))
            rows = []
            for i in range(n):
                key = draw(st.integers(min_value=1, max_value=3))
                day = draw(st.integers(min_value=0, max_value=60))
                attr = draw(st.sampled_from(["A", "B", "C"]))
                rows.append((key, attr, day, i))
            return rows

        @settings(max_examples=15, deadline=None)
        @given(event_stream())
        def check(rows):
            from datetime import datetime, timedelta

            base = datetime(2024, 1, 1)
            df = spark.createDataFrame(
                [(k, a, base + timedelta(days=d), s) for k, a, d, s in rows],
                "k long, attr string, ts timestamp, seq long",
            )
            iv = scd2_intervals(df, "k", ["attr"], "ts", tiebreak="seq").collect()
            by_key = {}
            for r in iv:
                by_key.setdefault(r.k, []).append(r)
            all_ts = {}
            for k, a, d, s in rows:
                all_ts.setdefault(k, set()).add(base + timedelta(days=d))
            for k, ivs in by_key.items():
                ivs.sort(key=lambda r: r.version)
                # versions are 1..n dense
                assert [r.version for r in ivs] == list(range(1, len(ivs) + 1))
                # first interval starts at the key's first event
                assert ivs[0].valid_from == min(all_ts[k])
                # contiguous: valid_to == next valid_from; last is open
                for a_iv, b_iv in zip(ivs, ivs[1:]):
                    assert a_iv.valid_to == b_iv.valid_from
                assert ivs[-1].valid_to is None
                # adjacent runs always differ in attr (maximal runs)
                for a_iv, b_iv in zip(ivs, ivs[1:]):
                    assert a_iv.attr != b_iv.attr

        check()


class TestScd2ApplyChanges:
    """Incremental CDC apply == full rebuild, plus the edge cases that make
    MERGE-into-SCD2 subtle: leading no-op changes, brand-new keys, multi-run
    batches, untouched keys."""

    def _build(self, spark, rows):
        return spark.createDataFrame(
            rows, "k long, a string, ts timestamp"
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    def test_apply_equals_rebuild(self, spark):
        from iceberg_evolve_spark.operators.scd import (
            scd2_apply_changes,
            scd2_intervals,
        )

        old = [
            (1, "x", "2024-01-01"), (1, "x", "2024-01-05"), (1, "y", "2024-02-01"),
            (2, "p", "2024-01-03"),
            (3, "m", "2024-01-02"),
        ]
        new = [
            (1, "y", "2024-03-01"),   # leading no-op for key 1 (still y)
            (1, "z", "2024-03-10"),   # then a real change
            (2, "q", "2024-03-02"), (2, "r", "2024-03-20"),  # two runs
            (4, "n", "2024-03-05"),   # brand-new key
            # key 3 untouched
        ]
        mk = lambda rows: spark.createDataFrame(
            [(k, a, t) for k, a, t in rows], "k long, a string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        dim = scd2_intervals(mk(old), "k", ["a"], "ts")
        applied = scd2_apply_changes(dim, mk(new), "k", ["a"], "ts")
        rebuilt = scd2_intervals(mk(old + new), "k", ["a"], "ts")
        key = lambda df: sorted(
            (r["k"], r["a"], r["valid_from"], r["valid_to"], r["version"])
            for r in df.collect()
        )
        assert key(applied) == key(rebuilt)
        got = {(r["k"], r["version"]): (r["a"], r["valid_to"]) for r in applied.collect()}
        assert got[(1, 2)][0] == "y"          # no-op did NOT open version 3
        assert got[(1, 3)][0] == "z"          # the real change did
        assert got[(3, 1)][1] is None         # untouched key stays open
        assert got[(4, 1)][0] == "n"          # new key starts at version 1

    def test_noop_only_batch_changes_nothing(self, spark):
        from iceberg_evolve_spark.operators.scd import (
            scd2_apply_changes,
            scd2_intervals,
        )

        mk = lambda rows: spark.createDataFrame(
            rows, "k long, a string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        dim = scd2_intervals(mk([(1, "x", "2024-01-01")]), "k", ["a"], "ts")
        applied = scd2_apply_changes(
            dim, mk([(1, "x", "2024-02-01")]), "k", ["a"], "ts"
        )
        rows = applied.collect()
        assert len(rows) == 1
        assert rows[0]["valid_to"] is None and rows[0]["version"] == 1
