"""Scan elision from parquet footer statistics — answer COUNT/MIN/MAX
aggregates from file METADATA, never touching a data page.

Parquet row groups carry per-column statistics (min, max, null_count) in the
file footer. For aggregates those statistics are closed under merge, so a
table-level COUNT/MIN/MAX is ``Σ``/``min``/``max`` over row-group stats — a
footer read per file, KB each, regardless of data volume. This is the same
trick engines' aggregate-pushdown rules apply (Spark's own
``spark.sql.parquet.aggregatePushDown`` does it for SELECT MIN(..) queries);
exposed here as a library call so pipelines can serve table profiles without
a cluster job at all: 100 TB of data costs #files footer reads, driver-side.

Correctness boundary (why this is safe ONLY for these aggregates): stats
may be absent (written without statistics), and for BYTE_ARRAY columns
(strings/binary) writers may TRUNCATE min/max — a truncated min is a
prefix and the max an incremented prefix, neither an actual value — and
pyarrow exposes no exactness flag to detect it. ``table_stats_from_footers``
therefore raises on missing stats AND refuses BYTE_ARRAY columns outright
(numeric/temporal stats are always exact), rather than silently answering
wrong. AVG/SUM are NOT served (null_count gives exact COUNT, but sums are
not in the footer).
"""

from __future__ import annotations

import datetime
import os
from dataclasses import dataclass

import pyarrow.parquet as pq

_EPOCH = datetime.datetime(1970, 1, 1)


@dataclass(frozen=True)
class ColumnStats:
    column: str
    n_values: int  # non-null values (num_rows - null_count)
    min_value: object
    max_value: object


def _to_comparable(v: object) -> object:
    """Normalize footer stat values: naive timestamps -> epoch micros (the
    parquet physical representation), everything else passes through."""
    if isinstance(v, datetime.datetime):
        # Aware values must be CONVERTED to UTC, not have their offset
        # stripped: dropping tzinfo from 12:00+02:00 would yield the epoch
        # micros of 12:00Z instead of 10:00Z — wrong min/max by the offset.
        base = (
            v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
            if v.tzinfo
            else v
        )
        td = base - _EPOCH
        return (td.days * 86_400 + td.seconds) * 1_000_000 + td.microseconds
    return v


def _files(path: str) -> list[str]:
    if os.path.isdir(path):
        out = [
            os.path.join(path, f)
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet") and not f.startswith("_")
        ]
        if not out:
            raise ValueError(f"no parquet files under {path}")
        return out
    return [path]


def table_stats_from_footers(path: str, columns: list[str]) -> dict[str, ColumnStats]:
    """COUNT/MIN/MAX per column for a parquet file or directory, computed
    purely from row-group footer statistics. Raises if any row group lacks
    exact statistics for a requested column (never guesses)."""
    acc: dict[str, list] = {c: [0, None, None] for c in columns}
    for fp in _files(path):
        meta = pq.ParquetFile(fp).metadata
        name_to_idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        for c in columns:
            if c not in name_to_idx:
                raise ValueError(f"column {c!r} not in {fp}")
            if meta.schema.column(name_to_idx[c]).physical_type == "BYTE_ARRAY":
                raise ValueError(
                    f"column {c!r} is BYTE_ARRAY: writers may truncate string "
                    "min/max and no exactness flag exists — refusing rather "
                    "than risking a silently wrong answer"
                )
        for rg in range(meta.num_row_groups):
            group = meta.row_group(rg)
            for c in columns:
                col = group.column(name_to_idx[c])
                st = col.statistics
                if st is None or st.null_count is None:
                    raise ValueError(
                        f"row group {rg} of {fp} has no exact stats for {c!r}"
                    )
                if st.null_count == group.num_rows:
                    continue  # all-null chunk: no min/max exists, 0 values
                if not st.has_min_max:
                    raise ValueError(
                        f"row group {rg} of {fp} has no exact stats for {c!r}"
                    )
                lo, hi = _to_comparable(st.min), _to_comparable(st.max)
                slot = acc[c]
                slot[0] += group.num_rows - st.null_count
                slot[1] = lo if slot[1] is None else min(slot[1], lo)
                slot[2] = hi if slot[2] is None else max(slot[2], hi)
    return {
        c: ColumnStats(c, n, lo, hi) for c, (n, lo, hi) in acc.items()
    }
