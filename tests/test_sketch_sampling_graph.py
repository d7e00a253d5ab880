"""Unit tests for the pipeline-scale ops: KMV sketch, deterministic sampling,
connected components, TF-IDF."""

import pytest
from pyspark.sql import functions as F

from iceberg_evolve_spark.functions.graph import assign_components, connected_components
from iceberg_evolve_spark.functions.sampling import (
    hash_sample,
    smallest_k_sample,
    stratified_hash_sample,
)
from iceberg_evolve_spark.functions.sketch import kmv_distinct_estimate, kmv_minima
from iceberg_evolve_spark.functions.text import tf_idf_top_terms


# ---------------------------------------------------------------------------
# KMV sketch
# ---------------------------------------------------------------------------


def test_kmv_exact_below_k(spark):
    """Fewer than k distinct values → the sketch IS the distinct set."""
    df = spark.range(0, 1000).select((F.col("id") % 37).cast("string").alias("v"))
    row = kmv_distinct_estimate(df, F.col("v"), k=256).first()
    assert row.n_mins == 37
    assert row.est_distinct == 37.0


def test_kmv_estimate_within_tolerance(spark):
    """10k distinct values, k=256 → standard error ~1/sqrt(k) ≈ 6%."""
    df = spark.range(0, 10_000).select(F.col("id").cast("string").alias("v"))
    row = kmv_distinct_estimate(df, F.col("v"), k=256).first()
    assert row.n_mins == 256
    assert 10_000 * 0.8 < row.est_distinct < 10_000 * 1.2


def test_kmv_duplicate_heavy_input(spark):
    """Duplicates must not crowd out the k distinct minima (the failure mode of
    naive TakeOrdered over raw hashes)."""
    # 50 distinct values, each repeated 200x, badly partitioned.
    df = (
        spark.range(0, 10_000)
        .repartition(16)
        .select((F.col("id") % 50).cast("string").alias("v"))
    )
    mins = kmv_minima(df, F.col("v"), k=256)
    vals = [r.h for r in mins.collect()]
    assert len(vals) == 50 == len(set(vals))


def test_kmv_partition_invariance(spark):
    df = spark.range(0, 5_000).select(F.col("id").cast("string").alias("v"))
    a = kmv_distinct_estimate(df.repartition(2), F.col("v"), k=64).first()
    b = kmv_distinct_estimate(df.repartition(17), F.col("v"), k=64).first()
    assert a.kth_hash == b.kth_hash and a.est_distinct == b.est_distinct


# ---------------------------------------------------------------------------
# HyperLogLog sketch
# ---------------------------------------------------------------------------


def test_hll_estimate_within_tolerance(spark):
    """20k distinct, m=256 registers → standard error 1.04/sqrt(m) ≈ 6.5%;
    assert within 3 sigma."""
    from iceberg_evolve_spark.functions.sketch import hll_distinct_estimate

    df = spark.range(0, 20_000).select(F.col("id").cast("string").alias("v"))
    row = hll_distinct_estimate(df, F.col("v"), b=8).first()
    assert row.m == 256 and row.n_zero_registers == 0
    assert 20_000 * 0.8 < row.est_distinct < 20_000 * 1.2


def test_hll_small_range_linear_counting(spark):
    """Cardinality well below m takes the linear-counting branch and stays
    accurate (raw HLL would overshoot badly there)."""
    from iceberg_evolve_spark.functions.sketch import hll_distinct_estimate

    df = spark.range(0, 5_000).select((F.col("id") % 40).cast("string").alias("v"))
    row = hll_distinct_estimate(df, F.col("v"), b=8).first()
    assert row.n_zero_registers > 0
    assert 40 * 0.85 < row.est_distinct < 40 * 1.15


def test_hll_partition_invariance(spark):
    """Register sums are exact integers — no float-addition-order dependence."""
    from iceberg_evolve_spark.functions.sketch import hll_distinct_estimate

    df = spark.range(0, 8_000).select(F.col("id").cast("string").alias("v"))
    a = hll_distinct_estimate(df.repartition(2), F.col("v"), b=6).first()
    b = hll_distinct_estimate(df.repartition(17), F.col("v"), b=6).first()
    assert a.sum_scaled == b.sum_scaled and a.est_distinct == b.est_distinct


def test_hll_merge_equals_whole(spark):
    """Sketch(A ∪ B) == merge(sketch(A), sketch(B)) — bit-identical registers,
    the property that lets per-day/per-partition sketches combine at scale."""
    from iceberg_evolve_spark.functions.sketch import (
        hll_estimate_from_registers,
        hll_merge,
        hll_registers,
    )

    df = spark.range(0, 6_000).select("id", F.col("id").cast("string").alias("v"))
    whole = hll_registers(df, F.col("v"), b=8)
    a = hll_registers(df.filter(F.col("id") % 2 == 0), F.col("v"), b=8)
    b = hll_registers(df.filter(F.col("id") % 2 == 1), F.col("v"), b=8)
    merged = hll_merge(a, b)
    w = hll_estimate_from_registers(whole, b=8).first()
    m = hll_estimate_from_registers(merged, b=8).first()
    assert w.sum_scaled == m.sum_scaled and w.est_distinct == m.est_distinct


def test_hll_oracle_bit_exact(spark):
    """DuckDB rebuilds identical registers and estimate from the same rows."""
    import duckdb

    from iceberg_evolve_spark.functions.hashing import hash60_sql
    from iceberg_evolve_spark.functions.sketch import hll_distinct_estimate, hll_estimate_sql

    df = spark.range(0, 3_000).select(F.col("id").cast("string").alias("v"))
    got = [tuple(r) for r in hll_distinct_estimate(df, F.col("v"), b=7).collect()]
    con = duckdb.connect()
    con.sql("CREATE VIEW t AS SELECT CAST(range AS VARCHAR) AS v FROM range(0, 3000)")
    want = con.sql(hll_estimate_sql("t", hash60_sql("v"), b=7)).fetchall()
    assert got == want


# ---------------------------------------------------------------------------
# Deterministic sampling
# ---------------------------------------------------------------------------


def test_hash_sample_deterministic_and_partition_invariant(spark):
    df = spark.range(0, 20_000).select(F.col("id"))
    s1 = {r.id for r in hash_sample(df.repartition(3), "id", 0.1).collect()}
    s2 = {r.id for r in hash_sample(df.repartition(31), "id", 0.1).collect()}
    assert s1 == s2
    # binomial(20000, 0.1): ±5 sigma ≈ ±212
    assert 1_700 < len(s1) < 2_300


def test_hash_sample_nested_subset(spark):
    """Smaller fraction is a strict subset of a larger one (same key, same
    salt) — the property that makes holdout splits stable under growth."""
    df = spark.range(0, 5_000)
    small = {r.id for r in hash_sample(df, "id", 0.05).collect()}
    big = {r.id for r in hash_sample(df, "id", 0.2).collect()}
    assert small <= big


def test_hash_sample_salt_independence(spark):
    df = spark.range(0, 20_000)
    a = {r.id for r in hash_sample(df, "id", 0.1, salt="train").collect()}
    b = {r.id for r in hash_sample(df, "id", 0.1, salt="val").collect()}
    # overlap of two independent 10% samples ≈ 1% of rows, not 10%
    assert len(a & b) < 0.03 * 20_000


def test_stratified_fractions(spark):
    df = spark.range(0, 30_000).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("s")
    )
    out = stratified_hash_sample(df, "s", "id", {"0": 0.5, "1": 0.01}, 0.1)
    counts = {r.s: r.n for r in out.groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert 4_500 < counts["0"] < 5_500
    assert counts["1"] < 300
    assert 700 < counts["2"] < 1_300


def test_smallest_k_sample(spark):
    df = spark.range(0, 10_000)
    out1 = sorted(r.id for r in smallest_k_sample(df.repartition(4), "id", 100).collect())
    out2 = sorted(r.id for r in smallest_k_sample(df.repartition(13), "id", 100).collect())
    assert out1 == out2 and len(out1) == 100


def test_bad_fraction_raises(spark):
    df = spark.range(10)
    with pytest.raises(ValueError):
        hash_sample(df, "id", 1.5)


# ---------------------------------------------------------------------------
# Connected components
# ---------------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_components_two_chains(spark):
    # chain 1-2-3-4, chain 10-11, singleton edge 20-20 (self-loop)
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (10, 11), (20, 20)])
    got = {r.node: r.component for r in connected_components(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_components_long_chain_converges(spark):
    """A 30-node path needs multiple propagation rounds (diameter ≈ 30, halved
    per round pair) — exercises the iteration + lineage-cut path."""
    e = _edges(spark, [(i, i + 1) for i in range(30)])
    got = {r.node: r.component for r in connected_components(e).collect()}
    assert set(got.values()) == {0} and len(got) == 31


def test_components_edge_direction_irrelevant(spark):
    a = connected_components(_edges(spark, [(5, 9)])).collect()
    b = connected_components(_edges(spark, [(9, 5)])).collect()
    assert {(r.node, r.component) for r in a} == {(r.node, r.component) for r in b}


def test_assign_components_singletons(spark):
    nodes = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    e = _edges(spark, [(0, 1), (1, 2)])
    out = {r.doc_id: (r.cluster_id, r.is_representative) for r in
           assign_components(nodes, "doc_id", e).collect()}
    assert out[0] == (0, True) and out[1] == (0, False) and out[2] == (0, False)
    # untouched nodes are their own singleton clusters
    assert out[3] == (3, True) and out[5] == (5, True)


def test_star_matches_minlabel_on_shapes(spark):
    """Large-star/small-star must agree with min-label propagation on chains,
    cliques, self-loops, and direction-flipped edges."""
    from iceberg_evolve_spark.functions.graph import connected_components_star

    cases = [
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 20)],
        [(i, i + 1) for i in range(30)],  # long chain: the adversarial case
        [(a, b) for a in range(5) for b in range(5) if a < b],  # clique
        [(9, 5), (5, 9), (7, 7)],
    ]
    for pairs in cases:
        e = _edges(spark, pairs)
        ml = {(r.node, r.component) for r in connected_components(e).collect()}
        st = {(r.node, r.component) for r in connected_components_star(e).collect()}
        assert st == ml, pairs


def test_star_matches_minlabel_on_random_graphs(spark):
    """Property check: on random sparse graphs the two algorithms produce the
    identical (node → component-min) mapping."""
    import random

    from iceberg_evolve_spark.functions.graph import connected_components_star

    rng = random.Random(42)
    for trial in range(5):
        n = rng.randint(10, 60)
        m = rng.randint(5, 2 * n)
        pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        e = _edges(spark, pairs)
        ml = {(r.node, r.component) for r in connected_components(e).collect()}
        st = {(r.node, r.component) for r in connected_components_star(e).collect()}
        assert st == ml, (trial, pairs)


def test_assign_components_star_algorithm(spark):
    nodes = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    e = _edges(spark, [(0, 1), (1, 2)])
    out = {
        r.doc_id: r.cluster_id
        for r in assign_components(nodes, "doc_id", e, algorithm="star").collect()
    }
    assert out == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4}


# ---------------------------------------------------------------------------
# TF-IDF
# ---------------------------------------------------------------------------


def test_tfidf_ranks_distinguishing_terms(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple banana common"),
            (2, "cherry cherry common"),
            (3, "banana banana common"),
        ],
        "doc_id long, text string",
    )
    out = tf_idf_top_terms(docs, "doc_id", "text", top_k=1).collect()
    top = {r.doc_id: r.term for r in out}
    # 'common' appears in all docs → low idf; unique terms win.
    assert top == {1: "apple", 2: "cherry", 3: "banana"}


def test_tfidf_deterministic_tiebreak(spark):
    docs = spark.createDataFrame([(1, "zebra alpha")], "doc_id long, text string")
    out = tf_idf_top_terms(docs, "doc_id", "text", top_k=2).orderBy("rank").collect()
    # equal scores → term asc
    assert [r.term for r in out] == ["alpha", "zebra"]


# ---------------------------------------------------------------------------
# Count-Min Sketch
# ---------------------------------------------------------------------------


def test_cms_never_undercounts(spark):
    from iceberg_evolve_spark.functions.sketch import cms_counters, cms_estimate

    # 1000 keys, zipf-ish: key k appears (k % 50) + 1 times
    df = spark.range(0, 1000).selectExpr(
        "explode(sequence(1, CAST(id % 50 AS INT) + 1)) AS rep",
        "CAST(id AS STRING) AS k",
    ).select("k")
    counters = cms_counters(df, "k", depth=4, width=64)  # deliberately tiny width
    exact = df.groupBy("k").count().withColumnRenamed("count", "exact_n")
    est = cms_estimate(exact, counters, "k", depth=4, width=64)
    rows = est.collect()
    assert len(rows) == 1000
    assert all(r.cms_est >= r.exact_n for r in rows)  # CMS property
    # and with a tiny width there must be SOME collisions (test is meaningful)
    assert any(r.cms_est > r.exact_n for r in rows)


def test_cms_exact_with_wide_sketch(spark):
    from iceberg_evolve_spark.functions.sketch import cms_counters, cms_estimate

    df = spark.range(0, 100).select(F.col("id").cast("string").alias("k"))
    counters = cms_counters(df, "k", depth=4, width=4096)
    exact = df.groupBy("k").count().withColumnRenamed("count", "exact_n")
    est = cms_estimate(exact, counters, "k", depth=4, width=4096)
    # 100 distinct keys in 4×4096 buckets: min-over-depth collision odds ~0
    assert all(r.cms_est == r.exact_n for r in est.collect())


def test_cms_counters_mergeable(spark):
    """Counters from two halves of the data sum to the full-data counters —
    the property that lets sketches build incrementally per partition/day."""
    from iceberg_evolve_spark.functions.sketch import cms_counters

    df = spark.range(0, 2000).select((F.col("id") % 97).cast("string").alias("k"))
    a = cms_counters(df.filter(F.col("id") < 1000), "k", depth=2, width=32)
    b = cms_counters(df.filter(F.col("id") >= 1000), "k", depth=2, width=32)
    full = cms_counters(df, "k", depth=2, width=32)
    merged = (
        a.union(b)
        .groupBy("seed", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    diff = merged.join(full, ["seed", "bucket"], "full").filter(
        ~merged.cnt.eqNullSafe(full.cnt)
    )
    assert diff.count() == 0


def test_cms_weighted_equals_raw(spark):
    """Weighted counters over the per-key rollup are bit-identical to raw-row
    counters (linearity)."""
    from iceberg_evolve_spark.functions.sketch import cms_counters, cms_counters_weighted

    df = spark.range(0, 3000).select((F.col("id") % 40).cast("string").alias("k"))
    raw = cms_counters(df, "k", depth=3, width=64)
    rollup = df.groupBy("k").count()
    weighted = cms_counters_weighted(rollup, "k", "count", depth=3, width=64)
    diff = raw.join(weighted, ["seed", "bucket"], "full").filter(
        ~raw.cnt.eqNullSafe(weighted.cnt)
    )
    assert diff.count() == 0


def test_hll_grouped_registers_and_merge_by_group(spark):
    """Grouped sketches (the per-day/per-source layout): the group-wise merged
    registers equal the whole-input registers, and each group's register set
    equals a standalone sketch of that group."""
    from iceberg_evolve_spark.functions.sketch import (
        hll_estimate_from_registers,
        hll_registers,
    )

    df = spark.range(0, 4_000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        # overlapping values across groups: merge must dedup via register max
        (F.col("id") % 1500).cast("string").alias("v"),
    )
    grouped = hll_registers(df, F.col("v"), b=7, group_cols=["g"])
    est = hll_estimate_from_registers(grouped, b=7, group_cols=["g"])
    assert est.count() == 3 and set(est.columns) == {
        "g", "m", "n_filled", "n_zero_registers", "sum_scaled", "est_distinct"
    }
    merged = grouped.groupBy("j").agg(F.max("rho").alias("rho"))
    whole = hll_registers(df, F.col("v"), b=7)
    a = hll_estimate_from_registers(merged, b=7).first()
    b = hll_estimate_from_registers(whole, b=7).first()
    assert a.sum_scaled == b.sum_scaled and a.est_distinct == b.est_distinct
    # each group's rows match a standalone sketch of the filtered input
    g0 = hll_registers(df.filter(F.col("g") == "0"), F.col("v"), b=7)
    got = sorted((r.j, r.rho) for r in grouped.filter(F.col("g") == "0").select("j", "rho").collect())
    want = sorted((r.j, r.rho) for r in g0.collect())
    assert got == want


def test_hll_merge_grouped_keeps_groups(spark):
    """hll_merge(group_cols=...) merges each group with its counterpart —
    groups must not collapse into one sketch (and with group_cols=None the
    collapse is the deliberate per-day → all-time path)."""
    from iceberg_evolve_spark.functions.sketch import (
        hll_estimate_from_registers,
        hll_merge,
        hll_registers,
    )

    df = spark.range(0, 4_000).select(
        "id",
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") % 900).cast("string").alias("v"),
    )
    day1 = hll_registers(df.filter("id < 2000"), F.col("v"), b=7, group_cols=["g"])
    day2 = hll_registers(df.filter("id >= 2000"), F.col("v"), b=7, group_cols=["g"])
    merged = hll_merge(day1, day2, group_cols=["g"])
    whole = hll_registers(df, F.col("v"), b=7, group_cols=["g"])
    got = {(r.g, r.sum_scaled) for r in hll_estimate_from_registers(merged, b=7, group_cols=["g"]).collect()}
    want = {(r.g, r.sum_scaled) for r in hll_estimate_from_registers(whole, b=7, group_cols=["g"]).collect()}
    assert got == want and len(got) == 2
    # deliberate collapse: group_cols omitted folds everything into one sketch
    collapsed = hll_merge(whole)
    one = hll_estimate_from_registers(collapsed, b=7).first()
    direct = hll_estimate_from_registers(hll_registers(df, F.col("v"), b=7), b=7).first()
    assert one.sum_scaled == direct.sum_scaled


def test_priority_sample_dlt_estimator(spark):
    """Priority sampling: partition invariance of the sample, heavy rows
    always included, and the DLT estimator lands near the true total."""
    from iceberg_evolve_spark.functions.sampling import priority_sample

    # 1000 light rows (w=1) + 5 heavy rows (w=1000)
    df = spark.range(0, 1005).select(
        F.col("id"),
        F.when(F.col("id") < 5, F.lit(1000.0)).otherwise(F.lit(1.0)).alias("w"),
    )
    k = 50
    a = priority_sample(df.repartition(3), "id", "w", k)
    b = priority_sample(df.repartition(17), "id", "w", k)
    ra = [(r.id, r._priority) for r in a.collect()]
    rb = [(r.id, r._priority) for r in b.collect()]
    assert ra == rb and len(ra) == k + 1
    ids = {i for i, _ in ra[:k]}
    assert set(range(5)) <= ids  # heavy rows always make the sample
    tau = ra[k][1]
    est = sum(max(w, tau) for i, _ in ra[:k] for w in [1000.0 if i < 5 else 1.0])
    true = 5 * 1000.0 + 1000 * 1.0
    assert abs(est - true) / true < 0.25  # unbiased estimator, single draw


# ---------------------------------------------------------------------------
# PageRank (exact fixed-point)
# ---------------------------------------------------------------------------


def test_pagerank_matches_python_reference(spark):
    """Every rank equals an independent pure-Python fixed-point replay."""
    from iceberg_evolve_spark.functions.graph import pagerank

    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (4, 1), (1, 4)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.r for r in pagerank(df, iterations=3, scale=10**10).collect()}

    # reference: same integer arithmetic, plain dicts
    scale, d = 10**10, 85
    out = {}
    for s, t in edges:
        out.setdefault(s, set()).add(t)
    nodes = {n for e in edges for n in e}
    r = {n: scale for n in nodes}
    base = (100 - d) * scale // 100
    for _ in range(3):
        contrib = {n: 0 for n in nodes}
        for s, ts in out.items():
            for t in ts:
                contrib[t] += r[s] // len(ts)
        r = {n: base + d * contrib[n] // 100 for n in nodes}
    assert got == r


def test_pagerank_mass_and_order(spark):
    """On a symmetric star the hub outranks every leaf, and total mass stays
    within the floor-division loss bound of n*scale."""
    from iceberg_evolve_spark.functions.graph import pagerank

    star = [(0, i) for i in range(1, 9)] + [(i, 0) for i in range(1, 9)]
    df = spark.createDataFrame(star, ["src", "dst"])
    rows = {r.node: r.r for r in pagerank(df, iterations=4, scale=10**10).collect()}
    assert all(rows[0] > rows[i] for i in range(1, 9))
    n, scale = 9, 10**10
    total = sum(rows.values())
    # each round loses < 1 unit/node to each of the two floor divisions
    assert n * scale >= total > n * scale - n * 1000
    leaf_ranks = {rows[i] for i in range(1, 9)}
    assert len(leaf_ranks) == 1  # symmetric leaves tie exactly


def test_pagerank_sql_twin_matches(spark):
    """The unrolled DuckDB oracle reproduces pagerank() bit-for-bit."""
    import duckdb

    from iceberg_evolve_spark.functions.graph import pagerank, pagerank_unrolled_sql

    edges = [(i, (i * 3 + 1) % 23) for i in range(23)] + [(5, 7), (7, 5), (0, 11)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = sorted((r.node, r.r) for r in pagerank(df, iterations=3).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE e AS SELECT * FROM (VALUES " +
                ",".join(f"({s},{t})" for s, t in edges) + ") t(s, d)")
    want = sorted(con.execute(
        pagerank_unrolled_sql("SELECT s, d FROM e", iterations=3)
    ).fetchall())
    assert got == want


# ---------------------------------------------------------------------------
# Exact substring duplication
# ---------------------------------------------------------------------------


def test_exact_substring_shared_semantics(spark):
    """Cross-doc verbatim spans count; self-repetition and short docs don't."""
    from iceberg_evolve_spark.functions.dedup import exact_substring_shared

    hand = spark.createDataFrame(
        [(1, "a b c d"), (2, "z a b c"), (3, "p q r s"),
         (4, "x y z x y z"), (5, "t u")],
        ["doc_id", "text"])
    got = {r.doc_id: (r.n_windows, r.n_shared)
           for r in exact_substring_shared(hand, "doc_id", k=3).collect()}
    # doc4's repeated "x y z" lives only in doc4 -> not duplication;
    # doc5 has no 3-window at all.
    assert got == {1: (2, 1), 2: (2, 1), 3: (2, 0), 4: (4, 0)}


def test_word_windows_is_a_bag(spark):
    """word_windows keeps every occurrence (unlike word_shingles' set)."""
    from iceberg_evolve_spark.functions.dedup import word_shingles, word_windows

    df = spark.createDataFrame([("x y x y x",)], ["text"])
    row = df.select(
        word_windows(F.col("text"), 2).alias("w"),
        word_shingles(F.col("text"), 2).alias("s"),
    ).first()
    assert row.w == ["x y", "y x", "x y", "y x"]
    assert sorted(row.s) == ["x y", "y x"]


# ---------------------------------------------------------------------------
# Blocked record linkage
# ---------------------------------------------------------------------------


def test_blocked_pairs_cap_drops_oversized_blocks(spark):
    from iceberg_evolve_spark.functions.linkage import blocked_candidate_pairs

    df = spark.createDataFrame(
        [(i, "big", "x") for i in range(10)] + [(100, "ok", "y"), (101, "ok", "z")],
        ["id", "blk", "nm"])
    capped = blocked_candidate_pairs(df, "id", ["blk"], ["nm"], max_block_size=5)
    rows = capped.collect()
    assert {r.blk for r in rows} == {"ok"} and len(rows) == 1
    uncapped = blocked_candidate_pairs(df, "id", ["blk"], ["nm"])
    assert uncapped.count() == 45 + 1  # C(10,2) + C(2,2)


def test_fuzzy_match_pairs_distance_boundary(spark):
    from iceberg_evolve_spark.functions.linkage import fuzzy_match_pairs

    df = spark.createDataFrame(
        [(1, "b", "abc"), (2, "b", "abd"), (3, "b", "zzz"), (4, "c", "abc")],
        ["id", "blk", "nm"])
    m = fuzzy_match_pairs(df, "id", "nm", ["blk"], max_distance=1)
    got = {(r.id_a, r.id_b, r.dist) for r in m.collect()}
    assert got == {(1, 2, 1)}  # cross-block (1,4) never considered


# ---------------------------------------------------------------------------
# Incremental LSH probe
# ---------------------------------------------------------------------------


def test_minhash_probe_equals_full_pairs_restriction(spark):
    """Probe(batch, corpus) == the batch-corpus restriction of full LSH pairs
    over the union — the incremental path finds exactly what a full rebuild
    would, at batch cost."""
    from iceberg_evolve_spark.functions.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_probe,
        minhash_signatures,
    )

    texts = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again today"),
        (3, "completely different content about spark query planning at scale"),
        (11, "the quick brown fox jumps over the lazy dog again and again"),
        (12, "completely different content about spark query planning at scale"),
        (13, "unrelated third text that matches nothing else in this corpus"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    sig = minhash_signatures(df, "doc_id", num_hashes=16, k=3)
    probe = minhash_lsh_probe(
        sig.filter(F.col("doc_id") >= 10), sig.filter(F.col("doc_id") < 10),
        "doc_id", num_hashes=16, bands=8, threshold=0.5)
    got = {(r.new_id, r.corpus_id, r.est_jaccard) for r in probe.collect()}
    full = minhash_lsh_pairs(df, "doc_id", num_hashes=16, bands=8, k=3, threshold=0.5)
    want = {(r.id_a, r.id_b, r.est_jaccard) for r in full.collect()
            if r.id_a < 10 <= r.id_b}
    assert got == want and any(n == 1 and c == 11 for n, c, _ in got)
