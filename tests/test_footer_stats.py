"""Footer-statistics scan elision (`sources/footer_stats.py`): metadata-only
COUNT/MIN/MAX must equal full-scan answers across files, row groups, nulls,
and timestamps; absent statistics must raise, never guess."""

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_evolve_spark.sources.footer_stats import (
    table_stats_from_footers,
)


@pytest.fixture()
def multi_file_dir(tmp_path):
    d = tmp_path / "tbl"
    d.mkdir()
    t1 = pa.table({"k": [3, 1, None, 7], "v": [1.5, -2.0, 0.5, None]})
    t2 = pa.table({"k": [10, None, 2], "v": [9.25, 3.0, None]})
    pq.write_table(t1, d / "a.parquet", row_group_size=2)
    pq.write_table(t2, d / "b.parquet", row_group_size=2)
    return str(d)


class TestFooterStats:
    def test_multi_file_multi_rowgroup_with_nulls(self, multi_file_dir):
        st = table_stats_from_footers(multi_file_dir, ["k", "v"])
        assert (st["k"].n_values, st["k"].min_value, st["k"].max_value) == (5, 1, 10)
        assert (st["v"].n_values, st["v"].min_value, st["v"].max_value) == (
            5, -2.0, 9.25,
        )

    def test_timestamps_as_epoch_micros(self, tmp_path):
        ts = [
            datetime.datetime(2024, 1, 1, 12, 0, 0, 250),
            datetime.datetime(1969, 12, 31, 23, 59, 59),  # pre-epoch
        ]
        f = str(tmp_path / "t.parquet")
        pq.write_table(pa.table({"ts": pa.array(ts, pa.timestamp("us"))}), f)
        s = table_stats_from_footers(f, ["ts"])["ts"]
        assert s.min_value == -1_000_000  # 1969-12-31T23:59:59 in micros
        epoch = datetime.datetime(1970, 1, 1)
        assert s.max_value == int((ts[0] - epoch).total_seconds()) * 1_000_000 + 250

    def test_missing_stats_raise(self, tmp_path):
        f = str(tmp_path / "nostats.parquet")
        pq.write_table(
            pa.table({"k": [1, 2, 3]}), f, write_statistics=False
        )
        with pytest.raises(ValueError, match="no exact stats"):
            table_stats_from_footers(f, ["k"])

    def test_unknown_column_raises(self, tmp_path):
        f = str(tmp_path / "t.parquet")
        pq.write_table(pa.table({"k": [1]}), f)
        with pytest.raises(ValueError, match="not in"):
            table_stats_from_footers(f, ["missing"])

    def test_matches_full_scan_on_testdata(self, sf_dir):
        import duckdb

        path = os.path.join(sf_dir, "lineitem.parquet")
        st = table_stats_from_footers(path, ["l_orderkey", "l_extendedprice"])
        (n, lo, hi, flo, fhi), = duckdb.sql(
            f"SELECT COUNT(l_orderkey), MIN(l_orderkey), MAX(l_orderkey), "
            f"MIN(l_extendedprice), MAX(l_extendedprice) FROM '{path}'"
        ).fetchall()
        assert (st["l_orderkey"].n_values, st["l_orderkey"].min_value,
                st["l_orderkey"].max_value) == (n, lo, hi)
        assert (st["l_extendedprice"].min_value, st["l_extendedprice"].max_value) == (
            flo, fhi,
        )

    def test_refuses_string_columns(self, tmp_path):
        """BYTE_ARRAY min/max may be writer-truncated with no exactness flag
        — the guard refuses rather than risking a wrong answer."""
        f = str(tmp_path / "s.parquet")
        pq.write_table(pa.table({"s": ["aaa", "zzz"]}), f)
        with pytest.raises(ValueError, match="BYTE_ARRAY"):
            table_stats_from_footers(f, ["s"])
