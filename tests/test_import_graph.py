"""Layer-boundary enforcement via AST import walk.

Replicates the reference's machine-checked layering
(``tests/test_import_graph.py:1-50``) for this package's layer map:

    utils < ops < {sig, db, models, query, index, dup} < services
          < core < cli

Lower layers must never import higher ones.
"""

from __future__ import annotations

import ast
from pathlib import Path

PKG = Path(__file__).parent.parent / "kobato_eyes_tpu"

# layer rank per top-level subpackage/module
LAYERS: dict[str, int] = {
    "utils": 0,
    "native": 0,
    "ops": 1,
    "parallel": 1,
    "sig": 2,
    "db": 2,
    "models": 2,
    "query": 3,  # query.engine reads db snapshots
    "index": 3,
    "dup": 3,
    "services": 4,
    "core": 5,
    "cli": 6,
}

# module-level import edges that are deliberately allowed despite rank
ALLOWED_EXCEPTIONS: set[tuple[str, str]] = {
    ("db", "models"),  # repository uses TagCategory constants only
    # The write-queue contracts live with the pipeline but are consumed by
    # the writer service — the same sanctioned edge as the reference
    # (SURVEY.md §1: L3 services depends on core.pipeline.contracts).
    ("services", "core"),
}


def _module_layer(parts: list[str]) -> str | None:
    return parts[0] if parts and parts[0] in LAYERS else None


def _imports_of(path: Path) -> set[str]:
    tree = ast.parse(path.read_text(encoding="utf-8"))
    found: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                found.add(alias.name)
        elif isinstance(node, ast.ImportFrom) and node.module:
            found.add(node.module)
    return {m for m in found if m.startswith("kobato_eyes_tpu")}


def test_no_upward_imports():
    violations: list[str] = []
    for py in PKG.rglob("*.py"):
        rel = py.relative_to(PKG)
        src_layer = _module_layer(list(rel.parts)) or ("cli" if rel.stem == "cli" else None)
        if src_layer is None:
            continue
        for imported in _imports_of(py):
            parts = imported.split(".")[1:]  # drop package name
            dst_layer = _module_layer(parts)
            if dst_layer is None:
                continue
            if LAYERS[dst_layer] > LAYERS[src_layer] and (src_layer, dst_layer) not in ALLOWED_EXCEPTIONS:
                violations.append(f"{rel}: {src_layer} -> {imported} ({dst_layer})")
    assert not violations, "layering violations:\n" + "\n".join(violations)


def test_every_module_parses():
    for py in PKG.rglob("*.py"):
        ast.parse(py.read_text(encoding="utf-8"))
