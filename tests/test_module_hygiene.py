"""Module-hygiene guards born from round-10 incidents.

Duplicate top-level definitions: wave 49 added a second
``benford_digit_audit`` to validation.py, silently shadowing the r5
function of the same name — BOTH faces of the shadowed oracle pair
flipped in lock-step, so the hash gate stayed green and only a unit
test caught the behavior change. This scan fails on ANY duplicate
top-level def/class name inside the operator/registry/plan modules, so
the collision is impossible to reintroduce.
"""

import ast
from pathlib import Path

PKG = Path(__file__).resolve().parents[1] / "audience_manager_platform_spark"


def _top_level_names(path: Path):
    tree = ast.parse(path.read_text())
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            yield node.name, node.lineno


def test_no_duplicate_top_level_definitions():
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        seen: dict[str, int] = {}
        for name, lineno in _top_level_names(path):
            if name in seen:
                offenders.append(
                    f"{path.relative_to(PKG.parent)}:{lineno} redefines "
                    f"{name!r} (first at :{seen[name]})"
                )
            else:
                seen[name] = lineno
    assert not offenders, "\n".join(offenders)
