"""Custom Python DataSource: registration, partition planning, determinism."""

import pytest
from pyspark.sql import functions as F

from iceberg_evolve_spark.sources.synthetic import (
    SyntheticDocsDataSource,
    make_doc,
)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(SyntheticDocsDataSource)
    return spark


def _load(spark, **opts):
    r = spark.read.format("synthetic_docs")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


class TestSyntheticSource:
    def test_row_count_and_schema(self, registered):
        df = _load(registered, rows=1234, partitions=7)
        assert df.count() == 1234
        assert [f.name for f in df.schema.fields] == [
            "doc_id", "text", "lang", "source", "n_chars"
        ]

    def test_parallelism_matches_partition_plan(self, registered):
        df = _load(registered, rows=1000, partitions=5)
        assert df.rdd.getNumPartitions() == 5

    def test_deterministic_across_parallelism(self, registered):
        a = _load(registered, rows=500, partitions=2).collect()
        b = _load(registered, rows=500, partitions=13).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_rows_match_pure_function(self, registered):
        rows = {r.doc_id: tuple(r) for r in _load(registered, rows=50, seed=7).collect()}
        for i in (0, 17, 49):
            assert rows[i] == make_doc(7, i)

    def test_seed_changes_corpus(self, registered):
        a = _load(registered, rows=100, seed=1).agg(F.sum("n_chars")).first()[0]
        b = _load(registered, rows=100, seed=2).agg(F.sum("n_chars")).first()[0]
        assert a != b

    def test_composes_with_engine_ops(self, registered):
        """The custom source is a first-class relation: dedup + quality scoring
        run on it unchanged."""
        from iceberg_evolve_spark.functions.dedup import exact_dedup
        from iceberg_evolve_spark.functions.text import add_text_stats

        df = _load(registered, rows=300, partitions=4)
        deduped = exact_dedup(df, "doc_id", key_cols=["text"])
        assert 0 < deduped.count() <= 300
        scored = add_text_stats(df)
        assert scored.filter(F.col("quality_score").isNull()).count() == 0


class TestSyntheticStreamSource:
    def test_streaming_reader_emits_full_corpus(self, registered):
        import time

        df = (
            registered.readStream.format("synthetic_docs")
            .option("rows", 250)
            .option("batch_rows", 100)
            .option("seed", 5)
            .load()
        )
        q = (
            df.writeStream.format("memory")
            .queryName("synth_stream")
            .outputMode("append")
            .trigger(processingTime="500 milliseconds")
            .start()
        )
        try:
            deadline = time.time() + 60
            while time.time() < deadline:
                if registered.sql("SELECT count(*) n FROM synth_stream").first().n >= 250:
                    break
                time.sleep(0.5)
            got = registered.sql("SELECT * FROM synth_stream").collect()
        finally:
            q.stop()
        assert len(got) == 250
        # identical rows to the batch flavor / pure function (replayable log)
        want = {make_doc(5, i) for i in range(250)}
        assert {tuple(r) for r in got} == want
