"""Tree renderers for diffs and op plans.

Reference surface: ``iceberg_evolve/renderer.py`` (R1–R3) — built there on
``rich``. rich is not available in this environment, so these renderers emit the
same tree structure with stdlib-only box drawing + optional ANSI color
(``use_color`` auto-detects a TTY). Behavior parity points:

* Nested changes whose top-level parent is already listed are suppressed
  (reference ``renderer.py:23-30``).
* The op-plan renderer skips nested (dotted) ops entirely
  (reference ``renderer.py:138``), groups ops by type with blank lines between
  groups (``:149-152``), and appends a warning block when any op is unsupported
  (``:162-174``).
"""

from __future__ import annotations

import sys
from typing import Sequence

from iceberg_evolve_spark.canonical import clean_type_str
from iceberg_evolve_spark.diff import FieldChange, SchemaDiff
from iceberg_evolve_spark.model import (
    DecimalType,
    IcebergType,
    ListType,
    MapType,
    PrimitiveType,
    StructType,
)
from iceberg_evolve_spark.operators.evolution import BaseEvolutionOperation

GREEN = "\x1b[32m"
RED = "\x1b[31m"
YELLOW = "\x1b[33m"
DIM = "\x1b[2m"
RESET = "\x1b[0m"


def _c(text: str, color: str, use_color: bool) -> str:
    return f"{color}{text}{RESET}" if use_color else text


def render_type(t: IcebergType, name: str = "", prefix: str = "") -> list[str]:
    """Recursive plain tree of a type (reference ``render_type``/``type_to_tree``,
    ``utils.py:261-315``). Children render relative to their parent and are
    re-indented with the parent's continuation prefix — the only way the box
    drawing stays aligned for nested list/struct combinations."""
    label = f"{name}: " if name else ""
    if isinstance(t, (PrimitiveType, DecimalType)):
        return [f"{prefix}{label}{t}"]
    if isinstance(t, StructType):
        lines = [f"{prefix}{label}struct"]
        for i, f in enumerate(t.fields):
            last = i == len(t.fields) - 1
            branch = "└─ " if last else "├─ "
            cont = "   " if last else "│  "
            sub = render_type(f.type, f.name, "")
            lines.append(f"{prefix}{branch}{sub[0]}")
            lines.extend(f"{prefix}{cont}{extra}" for extra in sub[1:])
        return lines
    if isinstance(t, ListType):
        sub = render_type(t.element, "element", "")
        return (
            [f"{prefix}{label}list", f"{prefix}└─ {sub[0]}"]
            + [f"{prefix}   {extra}" for extra in sub[1:]]
        )
    if isinstance(t, MapType):
        return (
            [f"{prefix}{label}map"]
            + [f"{prefix}├─ key: {clean_type_str(t.key)}"]
            + [f"{prefix}└─ value: {clean_type_str(t.value)}"]
        )
    raise TypeError(f"not an IcebergType: {t!r}")


def _top_level(path: str) -> str:
    return path.split(".", 1)[0]


class SchemaDiffRenderer:
    """ADDED (green) / REMOVED (red) / CHANGED (yellow) sections."""

    def __init__(self, diff: SchemaDiff, use_color: bool | None = None) -> None:
        self.diff = diff
        self.use_color = sys.stdout.isatty() if use_color is None else use_color

    def lines(self) -> list[str]:
        out: list[str] = []
        uc = self.use_color

        def section(title: str, color: str, changes: Sequence[FieldChange], fmt) -> None:
            if not changes:
                return
            # suppress nested entries whose top-level parent is already listed
            tops = {c.path for c in changes if "." not in c.path}
            kept = [c for c in changes if "." not in c.path or _top_level(c.path) not in tops]
            out.append(_c(title, color, uc))
            for i, ch in enumerate(kept):
                branch = "└─ " if i == len(kept) - 1 else "├─ "
                out.append(branch + fmt(ch))
            out.append("")

        section(
            "ADDED", GREEN, self.diff.added,
            lambda c: f"{c.path}: {clean_type_str(c.new.type)}",
        )
        section(
            "REMOVED", RED, self.diff.removed,
            lambda c: f"{c.path}: {clean_type_str(c.old.type)}",
        )

        def fmt_changed(c: FieldChange) -> str:
            if c.kind == "renamed":
                return f"{c.old.name} renamed to: {c.new.name}"
            if c.kind == "type_changed":
                return (
                    f"{c.path} from: {clean_type_str(c.old.type)} "
                    f"to: {clean_type_str(c.new.type)}"
                )
            if c.kind == "doc_changed":
                return f"{c.path} doc changed"
            if c.kind == "required_changed":
                return f"{c.path} required: {c.old.required} -> {c.new.required}"
            if c.kind == "moved":
                where = "first" if c.move_position == "first" else f"{c.move_position}: {c.move_target}"
                return f"{c.path} moved {where}"
            return c.path

        section("CHANGED", YELLOW, self.diff.changed, fmt_changed)
        return out

    def display(self) -> None:
        print("\n".join(self.lines()))


class EvolutionOperationsRenderer:
    """Op plan grouped by op type; nested (dotted) ops filtered; warning block
    for unsupported ops."""

    def __init__(
        self, ops: Sequence[BaseEvolutionOperation], use_color: bool | None = None
    ) -> None:
        self.ops = list(ops)
        self.use_color = sys.stdout.isatty() if use_color is None else use_color

    def lines(self) -> list[str]:
        out: list[str] = []
        uc = self.use_color
        top_ops = [op for op in self.ops if "." not in op.name]
        prev_type = None
        for op in top_ops:
            if prev_type is not None and type(op) is not prev_type:
                out.append("")
            prev_type = type(op)
            out.append(op.pretty())
        unsupported = [op for op in self.ops if not op.is_supported]
        if unsupported:
            out.append("")
            out.append(_c("WARNING: unsupported operations were planned:", YELLOW, uc))
            for op in unsupported:
                out.append(_c(f"  - {op.pretty()}", YELLOW, uc))
        return out

    def display(self) -> None:
        print("\n".join(self.lines()))
