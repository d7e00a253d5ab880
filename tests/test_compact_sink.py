import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from iceberg_evolve_spark.sources.compact import compact, dir_stats
from iceberg_evolve_spark.sources.tables import load_table
from iceberg_evolve_spark.streaming.sink import run_upsert_stream


class TestCompact:
    def test_compaction_reduces_files_preserves_rows(self, spark, sf_dir, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("frag")) + "/t"
        li = load_table(spark, sf_dir, "lineitem")
        li.repartition(37).write.parquet(d)  # fragmented layout
        n0, _ = dir_stats(d)
        assert n0 == 37
        rows_before = spark.read.parquet(d).count()
        n1 = compact(spark, d, target_mb=128, sort_cols=["l_orderkey"])
        assert n1 < n0
        after = spark.read.parquet(d)
        assert after.count() == rows_before
        assert sorted(after.columns) == sorted(li.columns)


class TestUpsertSink:
    def test_stream_upserts_by_key(self, spark, tmp_path_factory):
        base = str(tmp_path_factory.mktemp("sink"))
        src, tgt, ckpt = f"{base}/src", f"{base}/tgt", f"{base}/ckpt"
        os.makedirs(src)

        def feed(rows, name):
            df = spark.createDataFrame(rows, "k long, v string")
            stage = f"{base}/_stage"
            df.coalesce(1).write.mode("overwrite").parquet(stage)
            shutil.copy(glob.glob(f"{stage}/part-*.parquet")[0], f"{src}/{name}.parquet")

        feed([(1, "a"), (2, "b")], "b1")
        stream = spark.readStream.schema("k long, v string").option(
            "maxFilesPerTrigger", "1"
        ).parquet(src)
        q = run_upsert_stream(stream, tgt, key="k", checkpoint=ckpt)
        try:
            q.processAllAvailable()
            feed([(2, "b2"), (3, "c")], "b2")  # update k=2, insert k=3
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted(tuple(r) for r in spark.read.parquet(tgt).collect())
        assert got == [(1, "a"), (2, "b2"), (3, "c")]
