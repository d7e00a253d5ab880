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
    # recursive: partitioned key=value layouts (sources/partitions.py) nest
    # their part files in subdirs — same walk as SnapshotTable.files_df
    if os.path.isdir(path):
        out = []
        for root, _dirs, names in os.walk(path):
            for fn in names:
                if fn.endswith(".parquet") and not fn.startswith("_"):
                    out.append(os.path.join(root, fn))
        if not out:
            raise ValueError(f"no parquet files under {path}")
        return sorted(out)
    return [path]


def _can_overlap(mn: object, mx: object, clo: object, chi: object) -> bool:
    """True unless [mn, mx] PROVABLY misses [clo, chi]. Incomparable
    operands (e.g. DATE stats against datetime bounds) fall back to True —
    pruning may only skip what it can prove absent, so an unprovable
    comparison keeps the file rather than raising."""
    try:
        return (chi is None or mn <= chi) and (clo is None or mx >= clo)
    except TypeError:
        return True


def _partition_value(path_root: str, fp: str, column: str) -> object | None:
    """Value of ``column`` encoded as a ``column=value`` path segment of
    ``fp`` under ``path_root`` (Hive/Iceberg partitioned layout), or None.
    ``partitionBy`` drops partition keys from the data files, so pruning on
    the partition key — the canonical pruning use — must read the directory
    value instead of the footer."""
    rel = os.path.relpath(fp, path_root)
    for seg in rel.split(os.sep)[:-1]:
        if "=" in seg:
            k, _, v = seg.partition("=")
            if k == column:
                if v == "__HIVE_DEFAULT_PARTITION__":
                    return None
                from urllib.parse import unquote

                return unquote(v)  # Hive escapes specials as %XX
    return None


def _coerce_like(raw: str, bound: object) -> object:
    """Coerce a directory-encoded partition value (always a string) to the
    type of the caller's bound so the overlap test compares like to like;
    an un-coercible value falls back to the raw string (then
    :func:`_can_overlap`'s TypeError fallback keeps the file)."""
    try:
        if isinstance(bound, bool):
            return raw in ("true", "True", "1")
        if isinstance(bound, int):
            return int(raw)
        if isinstance(bound, float):
            return float(raw)
        if isinstance(bound, datetime.datetime):
            return _to_comparable(datetime.datetime.fromisoformat(raw))
        if isinstance(bound, datetime.date):
            return datetime.date.fromisoformat(raw)
    except (ValueError, TypeError):
        pass
    return raw


def prune_files(
    path: str,
    column: str,
    lo: object = None,
    hi: object = None,
    files: list[str] | None = None,
) -> tuple[list[str], int]:
    """Stats-based FILE SKIPPING (Iceberg/Delta scan planning, done from
    parquet footers): return the subset of files that CAN contain rows with
    ``lo <= column <= hi``, plus the total file count. A file is skipped only
    when EVERY row group's [min, max] provably misses the range.

    The correctness discipline is the opposite of
    :func:`table_stats_from_footers`: stats here only need to be BOUNDS, not
    exact values, so missing statistics keep the file (conservative — never
    skips data it can't prove absent) and BYTE_ARRAY columns are fine
    (truncated string stats are still valid bounds: the truncated min is <=
    the true min, the incremented-prefix max >= the true max).

    At 100 TB this is the planning step that makes a sorted/clustered layout
    pay: #files footer reads on the driver (or a manifest, which is this same
    information cached) replace scanning every file for a selective range.

    ``files`` restricts the candidate set to an explicit list (a snapshot's
    manifest-listed files — format-2 ``SnapshotTable`` entries share their
    lineage dir across snapshots, so the dir walk would see files the
    snapshot does not own); ``path`` stays the root that key=value partition
    segments are resolved against."""
    if lo is None and hi is None:
        raise ValueError("provide at least one of lo/hi")
    clo, chi = _to_comparable(lo), _to_comparable(hi)
    if files is None:
        files = _files(path)
    kept = []
    for fp in files:
        meta = pq.ParquetFile(fp).metadata
        name_to_idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        if column not in name_to_idx:
            pv = _partition_value(path, fp, column)
            if pv is None:
                # not in the footer, not a path segment: keep conservatively
                # (pruning may only skip what it can PROVE absent)
                kept.append(fp)
                continue
            ref = lo if lo is not None else hi
            v = _coerce_like(pv, ref)
            if _can_overlap(v, v, clo, chi):
                kept.append(fp)
            continue
        keep = False
        for rg in range(meta.num_row_groups):
            group = meta.row_group(rg)
            st = group.column(name_to_idx[column]).statistics
            if st is None or not st.has_min_max:
                if st is not None and st.null_count == group.num_rows:
                    continue  # provably all-null: cannot match a range
                keep = True  # no usable bounds: must assume it matches
                break
            mn, mx = _to_comparable(st.min), _to_comparable(st.max)
            if _can_overlap(mn, mx, clo, chi):
                keep = True
                break
        if keep:
            kept.append(fp)
    return kept, len(files)


def prune_files_multi(
    path: str,
    ranges: dict[str, tuple[object, object]],
    files: list[str] | None = None,
) -> tuple[list[str], int]:
    """AND-composed file skipping over several columns: a file survives only
    if EVERY column's range can overlap it (real scan plans filter on more
    than one column — e.g. a date range AND a region id). Each column keeps
    :func:`prune_files`'s conservative rule independently, so the
    intersection can still only over-read, never lose rows."""
    if not ranges:
        raise ValueError("provide at least one column range")
    kept: set[str] | None = None
    total = 0
    for column, (lo, hi) in ranges.items():
        col_files, total = prune_files(path, column, lo, hi, files=files)
        kept = set(col_files) if kept is None else kept & set(col_files)
    return sorted(kept or ()), total


def read_pruned(spark, path: str, column: str, lo: object = None, hi: object = None):
    """Read only the files :func:`prune_files` keeps, with the residual range
    filter applied (files are kept on OVERLAP, so in-file rows outside the
    range still need the predicate — which Spark additionally pushes down to
    row-group level inside the kept files)."""
    from pyspark.sql import functions as F

    kept, _total = prune_files(path, column, lo, hi)
    if not kept:
        return spark.read.parquet(path).filter(F.lit(False))
    df = spark.read.parquet(*kept)
    if lo is not None:
        df = df.filter(F.col(column) >= F.lit(lo))
    if hi is not None:
        df = df.filter(F.col(column) <= F.lit(hi))
    return df


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
