"""AST lint: report bare numeric literals ("magic numbers") in the package.

Counterpart of the reference's ``tools/find_magic_numbers.py`` (an
ast-walking check close to Ruff PLR2004).  Policy:

- module-level ``UPPER_CASE = <number>`` constants are the sanctioned home
  for tuning values and are never flagged;
- the structurally-meaningless values 0, 1, -1, 2 (and 0.0/1.0/0.5) pass;
- scientific-notation floats (``1e-6`` style) pass — tolerances and
  learning-rate-shaped values read fine inline;
- a trailing ``# noqa: magic`` comment suppresses a line.

Exit status 1 when anything is flagged, so it can run as a CI step::

    python tools/find_magic_numbers.py kobato_eyes_tpu
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

ALLOWED_INTS = {0, 1, -1, 2}
ALLOWED_FLOATS = {0.0, 1.0, 0.5}
SKIP_DIRS = {"__pycache__", "build", "dist", ".git", "tests"}


def _is_scientific(value: float) -> bool:
    text = repr(value).lower()
    return "e" in text


def _module_constant_lines(tree: ast.Module) -> set[int]:
    """Line spans of module-level UPPER_CASE assignments (incl. tuples/dicts)."""
    lines: set[int] = set()
    for node in tree.body:
        targets: list[ast.expr] = []
        if isinstance(node, ast.Assign):
            targets = node.targets
        elif isinstance(node, ast.AnnAssign) and node.value is not None:
            targets = [node.target]
        else:
            continue
        names = [t for t in targets if isinstance(t, ast.Name)]
        if names and all(t.id.isupper() for t in names):
            lines.update(range(node.lineno, (node.end_lineno or node.lineno) + 1))
    return lines


def scan_file(path: Path) -> list[tuple[int, object]]:
    try:
        source = path.read_text(encoding="utf-8")
        tree = ast.parse(source, filename=str(path))
    except (OSError, SyntaxError):
        return []
    suppressed = {
        i
        for i, text in enumerate(source.splitlines(), start=1)
        if "# noqa: magic" in text
    }
    const_lines = _module_constant_lines(tree)
    findings: list[tuple[int, object]] = []
    for node in ast.walk(tree):
        value = None
        if isinstance(node, ast.Constant) and isinstance(node.value, (int, float)):
            if isinstance(node.value, bool):
                continue
            value = node.value
        if value is None:
            continue
        lineno = node.lineno
        if lineno in const_lines or lineno in suppressed:
            continue
        if isinstance(value, int) and value in ALLOWED_INTS:
            continue
        if isinstance(value, float) and (value in ALLOWED_FLOATS or _is_scientific(value)):
            continue
        findings.append((lineno, value))
    return findings


def main() -> int:
    root = Path(sys.argv[1] if len(sys.argv) > 1 else "kobato_eyes_tpu")
    flagged = 0
    for path in sorted(root.rglob("*.py")):
        if any(part in SKIP_DIRS for part in path.parts):
            continue
        for lineno, value in scan_file(path):
            print(f"{path}:{lineno}: magic number {value!r}")
            flagged += 1
    if flagged:
        print(f"{flagged} magic numbers found", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
