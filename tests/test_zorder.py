"""Z-order clustered writes: correctness + measured data-skipping locality."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from iceberg_evolve_spark.sources.tables import load_table
from iceberg_evolve_spark.sources.zorder import write_zordered, zorder_column


def _file_spans(path, col):
    """Per output file: (min, max) of col from parquet footer statistics."""
    spans = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            spans.append((lo, hi))
    return spans


class TestZorder:
    def test_zorder_preserves_rows(self, spark, sf_dir, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("z"))
        orders = load_table(spark, sf_dir, "orders")
        write_zordered(orders, d, "o_custkey", "o_totalprice", num_files=8)
        back = spark.read.parquet(d)
        assert back.count() == orders.count()
        assert "_z" not in back.columns
        assert back.agg(F.sum("o_orderkey")).first()[0] == orders.agg(
            F.sum("o_orderkey")
        ).first()[0]

    def test_zorder_tightens_both_columns(self, spark, sf_dir, tmp_path_factory):
        """Against a random layout, z-ordering must shrink the average
        per-file min/max span on BOTH clustered columns — the footer stats a
        scan uses for skipping."""
        orders = load_table(spark, sf_dir, "orders")
        zdir = str(tmp_path_factory.mktemp("zo"))
        rdir = str(tmp_path_factory.mktemp("rand"))
        write_zordered(orders, zdir, "o_custkey", "o_totalprice", num_files=8)
        orders.repartition(8).write.mode("overwrite").parquet(rdir)

        for col in ("o_custkey", "o_totalprice"):
            z = _file_spans(zdir, col)
            r = _file_spans(rdir, col)
            avg = lambda spans: sum(hi - lo for lo, hi in spans) / len(spans)
            # random layout: every file spans ~the full range; z-order: a fraction
            assert avg(z) < 0.8 * avg(r), (col, avg(z), avg(r))

    def test_morton_code_locality(self, spark):
        """Nearby (x, y) points get nearby codes: the code of (k, k) is
        monotone-ish — specifically, quadrant ordering holds: all points in the
        low-low quadrant sort before any in the high-high quadrant."""
        df = spark.createDataFrame(
            [(x, y) for x in range(16) for y in range(16)], "x int, y int"
        )
        z = zorder_column(df, "x", "y", bits=4)
        rows = z.collect()
        lo = max(r._z for r in rows if r.x < 8 and r.y < 8)
        hi = min(r._z for r in rows if r.x >= 8 and r.y >= 8)
        assert lo < hi
