"""Declarative data-quality expectations — the Deequ idea (Schelter et al.,
"Automating large-scale data quality verification", VLDB 2018) re-expressed
as plain Catalyst aggregation: a check list compiles into ONE full-scan
aggregation per table — every row-local predicate becomes a conditional-sum
column in the same pass, and each referential check rides the same pass as
a left-joined match-marker sum (the reference key set is distinct, so the
join is row-preserving). No per-check scans, no driver-side row loops —
100 TB costs one scan regardless of how many expectations are attached.

Check vocabulary (all exact integer violation counts):

- ``not_null(col)`` — NULL count.
- ``unique(col)`` — rows carrying a duplicated value (count − distinct
  yields the EXTRA rows; the violation count is rows in >1-size groups,
  computed as ``count − countDistinct`` which equals extras — we report
  extras: 0 ⇔ unique).
- ``in_range(col, lo, hi)`` — rows outside [lo, hi] (NULLs not counted;
  pair with not_null to assert both).
- ``accepted_values(col, values)`` — rows whose value is non-NULL and not
  in the list.
- ``matches(col, regex)`` — non-NULL rows not fully matching the pattern
  (portable Java∩RE2 subset, same discipline as redact_pii).
- ``foreign_key(col, ref_df, ref_col)`` — rows whose non-NULL value has no
  match in the reference column. Folded into the single-pass aggregate via
  a left join against the distinct reference keys (broadcast when the
  reference is dimension-sized).

``run_checks`` returns one row per check: (check, column, n_rows,
n_violations, passed) — exact integers, so the report is hash-gatable.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    kind: str
    column: str
    params: tuple = field(default_factory=tuple)


def not_null(column: str) -> Check:
    return Check("not_null", column)


def unique(column: str) -> Check:
    """0 violations ⇔ no non-NULL value appears twice. NULLs are IGNORED
    (count(col) and countDistinct(col) both skip them — SQL ``DISTINCT``
    semantics), so duplicated NULLs pass; pair with :func:`not_null` for a
    full key check, the same composition Deequ's isPrimaryKey uses."""
    return Check("unique", column)


def in_range(column: str, lo: Any, hi: Any) -> Check:
    return Check("in_range", column, (lo, hi))


def accepted_values(column: str, values: Sequence[Any]) -> Check:
    return Check("accepted_values", column, tuple(values))


def matches(column: str, regex: str) -> Check:
    return Check("matches", column, (regex,))


def foreign_key(column: str, ref_df: DataFrame, ref_col: str) -> Check:
    return Check("foreign_key", column, (ref_df, ref_col))


def _violations(c: Check) -> Column:
    """Row-local violation predicate → conditional sum (one column of the
    shared single-pass aggregate)."""
    col = F.col(c.column)
    if c.kind == "not_null":
        bad = col.isNull()
    elif c.kind == "in_range":
        lo, hi = c.params
        bad = col.isNotNull() & ((col < F.lit(lo)) | (col > F.lit(hi)))
    elif c.kind == "accepted_values":
        bad = col.isNotNull() & ~col.isin(list(c.params))
    elif c.kind == "matches":
        # rlike is substring-search; anchor so the check means FULL match
        # (wrapping an already-anchored pattern is a no-op)
        bad = col.isNotNull() & ~col.rlike(f"^(?:{c.params[0]})$")
    else:  # pragma: no cover - guarded by run_checks dispatch
        raise ValueError(c.kind)
    return F.sum(bad.cast("long"))


def _check_agg_columns(local: Sequence[Check]) -> list[Column]:
    """Aggregate columns for the shared single-pass check aggregate: one
    column per predicate sum, count/countDistinct pairs for uniqueness."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(local):
        if c.kind == "unique":
            aggs.append(F.count(F.col(c.column)).alias(f"_cnt{i}"))
            aggs.append(F.countDistinct(F.col(c.column)).alias(f"_dst{i}"))
        else:
            aggs.append(_violations(c).alias(f"_v{i}"))
    return aggs


def local_check_aggregate(df: DataFrame, local: Sequence[Check]) -> DataFrame:
    """The shared single-pass aggregate for all row-local checks.
    Exposed separately so the one-scan property is plan-assertable."""
    return df.agg(*_check_agg_columns(local))


def run_checks(df: DataFrame, checks: Sequence[Check]) -> list[tuple]:
    """Evaluate every check; returns ``[(check, column, n_rows,
    n_violations, passed), ...]`` driver-side (|checks| rows — bounded).

    One aggregation pass covers all row-local checks, every ``unique``
    (count/countDistinct pairs ride the same pass via multi-distinct), and
    every ``foreign_key`` (a left-joined match marker summed in the same
    pass). The input is scanned ONCE regardless of the check list."""
    local = [c for c in checks if c.kind not in ("foreign_key",)]
    fks = [c for c in checks if c.kind == "foreign_key"]
    # Referential checks fold INTO the single-pass aggregate instead of a
    # separate anti-join count per FK: each reference contributes a distinct
    # key set left-joined as a match marker, and the violation is the
    # conditional sum over (value non-NULL AND no match) — the checked table
    # is scanned ONCE total, not 1 + #fk_checks times. No forced broadcast:
    # the optimizer broadcasts dimension-sized references on its own, and a
    # fact-sized reference falls back to a shuffle join (the distinct key
    # set never multiplies rows, so the left join is row-preserving and the
    # local sums are unchanged).
    probe = df
    fk_aggs: list[Column] = []
    for j, c in enumerate(fks):
        ref_df, ref_col = c.params
        marker = f"_fk_match_{j}"
        probe = probe.join(
            ref_df.select(F.col(ref_col).alias(c.column))
            .distinct()
            .withColumn(marker, F.lit(True)),
            c.column,
            "left",
        )
        fk_aggs.append(
            F.sum(
                (F.col(c.column).isNotNull() & F.col(marker).isNull()).cast(
                    "long"
                )
            ).alias(f"_fkv{j}")
        )
    row = probe.agg(*_check_agg_columns(local), *fk_aggs).first()
    n = int(row["_n"])
    out: list[tuple] = []
    for i, c in enumerate(local):
        if c.kind == "unique":
            v = int(row[f"_cnt{i}"]) - int(row[f"_dst{i}"])
        else:
            v = int(row[f"_v{i}"] or 0)
        out.append((c.kind, c.column, n, v, v == 0))
    for j, c in enumerate(fks):
        v = int(row[f"_fkv{j}"] or 0)
        out.append((c.kind, c.column, n, v, v == 0))
    return out
