"""Tree renderers for diffs and op plans.

Reference surface: ``iceberg_evolve/renderer.py`` (R1–R3) — built there on
``rich``. rich is not available in this environment, so these renderers emit the
same tree structure with stdlib-only box drawing + optional ANSI color
(``use_color`` auto-detects a TTY). Where rich IS installed, every renderer
also offers the rich-native objects the reference's users expect —
``SchemaDiffRenderer.rich_tree()``, ``EvolutionOperationsRenderer
.rich_group()``, ``type_to_rich()`` — and ``display(backend='auto')`` picks
rich automatically. Both backends render the SAME precomputed structure
(``_sections()`` / ``_groups()``), so they cannot disagree on suppression,
grouping, or formatting. Behavior parity points:

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


def type_to_rich(t: IcebergType, name: str = ""):
    """:func:`render_type` as a ``rich.tree.Tree`` (same recursion, same
    labels). Raises ImportError where rich is not installed."""
    from rich.tree import Tree

    label = f"{name}: " if name else ""
    if isinstance(t, (PrimitiveType, DecimalType)):
        return Tree(f"{label}{t}")
    if isinstance(t, StructType):
        node = Tree(f"{label}struct")
        for f in t.fields:
            node.children.append(type_to_rich(f.type, f.name))
        return node
    if isinstance(t, ListType):
        node = Tree(f"{label}list")
        node.children.append(type_to_rich(t.element, "element"))
        return node
    if isinstance(t, MapType):
        node = Tree(f"{label}map")
        node.add(f"key: {clean_type_str(t.key)}")
        node.add(f"value: {clean_type_str(t.value)}")
        return node
    raise TypeError(f"not an IcebergType: {t!r}")


def _top_level(path: str) -> str:
    return path.split(".", 1)[0]


class SchemaDiffRenderer:
    """ADDED (green) / REMOVED (red) / CHANGED (yellow) sections."""

    def __init__(self, diff: SchemaDiff, use_color: bool | None = None) -> None:
        self.diff = diff
        self.use_color = sys.stdout.isatty() if use_color is None else use_color

    def _sections(self) -> list[tuple[str, str, list[str]]]:
        """(title, color-name, item labels) triples — the single traversal both
        the stdlib and the optional rich backend render, so the two can never
        disagree on suppression or formatting."""

        def items(changes: Sequence[FieldChange], fmt) -> list[str]:
            # suppress nested entries whose top-level parent is already listed
            tops = {c.path for c in changes if "." not in c.path}
            kept = [c for c in changes if "." not in c.path or _top_level(c.path) not in tops]
            return [fmt(c) for c in kept]

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

        out = []
        for title, color, changes, fmt in (
            ("ADDED", "green", self.diff.added,
             lambda c: f"{c.path}: {clean_type_str(c.new.type)}"),
            ("REMOVED", "red", self.diff.removed,
             lambda c: f"{c.path}: {clean_type_str(c.old.type)}"),
            ("CHANGED", "yellow", self.diff.changed, fmt_changed),
        ):
            if changes:
                out.append((title, color, items(changes, fmt)))
        return out

    def lines(self) -> list[str]:
        out: list[str] = []
        uc = self.use_color
        ansi = {"green": GREEN, "red": RED, "yellow": YELLOW}
        for title, color, labels in self._sections():
            out.append(_c(title, ansi[color], uc))
            for i, lbl in enumerate(labels):
                branch = "└─ " if i == len(labels) - 1 else "├─ "
                out.append(branch + lbl)
            out.append("")
        return out

    def rich_tree(self):
        """The same diff as a ``rich.tree.Tree`` (reference `renderer.py` is
        rich-native). Raises ImportError where rich is not installed."""
        from rich.tree import Tree

        root = Tree("schema diff")
        for title, color, labels in self._sections():
            node = root.add(f"[bold {color}]{title}[/bold {color}]")
            for lbl in labels:
                node.add(lbl)
        return root

    def display(self, backend: str = "auto") -> None:
        """backend='auto' uses rich when importable, else the stdlib lines;
        'rich' requires rich; 'plain' never imports it."""
        if backend in ("auto", "rich"):
            try:
                from rich.console import Console

                Console().print(self.rich_tree())
                return
            except ImportError:
                if backend == "rich":
                    raise
        print("\n".join(self.lines()))


class EvolutionOperationsRenderer:
    """Op plan grouped by op type; nested (dotted) ops filtered; warning block
    for unsupported ops."""

    def __init__(
        self, ops: Sequence[BaseEvolutionOperation], use_color: bool | None = None
    ) -> None:
        self.ops = list(ops)
        self.use_color = sys.stdout.isatty() if use_color is None else use_color

    def _groups(self) -> tuple[list[list[str]], list[str]]:
        """(op groups by type, unsupported warnings) — shared by both
        backends."""
        groups: list[list[str]] = []
        prev_type = None
        for op in (op for op in self.ops if "." not in op.name):
            if prev_type is None or type(op) is not prev_type:
                groups.append([])
            prev_type = type(op)
            groups[-1].append(op.pretty())
        warnings = [op.pretty() for op in self.ops if not op.is_supported]
        return groups, warnings

    def lines(self) -> list[str]:
        out: list[str] = []
        uc = self.use_color
        groups, warnings = self._groups()
        for i, group in enumerate(groups):
            if i:
                out.append("")
            out.extend(group)
        if warnings:
            out.append("")
            out.append(_c("WARNING: unsupported operations were planned:", YELLOW, uc))
            for w in warnings:
                out.append(_c(f"  - {w}", YELLOW, uc))
        return out

    def rich_group(self):
        """The same plan as a rich renderable (Group of op lines + a yellow
        warning panel). Raises ImportError where rich is not installed."""
        from rich.console import Group
        from rich.text import Text

        groups, warnings = self._groups()
        parts: list = []
        for i, group in enumerate(groups):
            if i:
                parts.append(Text(""))
            parts.extend(Text(line) for line in group)
        if warnings:
            parts.append(Text(""))
            parts.append(Text("WARNING: unsupported operations were planned:", style="bold yellow"))
            parts.extend(Text(f"  - {w}", style="yellow") for w in warnings)
        return Group(*parts)

    def display(self, backend: str = "auto") -> None:
        """backend='auto' uses rich when importable, else the stdlib lines;
        'rich' requires rich; 'plain' never imports it."""
        if backend in ("auto", "rich"):
            try:
                from rich.console import Console

                Console().print(self.rich_group())
                return
            except ImportError:
                if backend == "rich":
                    raise
        print("\n".join(self.lines()))
