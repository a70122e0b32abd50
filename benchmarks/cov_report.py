#!/usr/bin/env python
"""Per-function coverage gap report from a tests/_covplugin.py dump.

Usage: python benchmarks/cov_report.py /tmp/kcov.json [min_frac]

Lists package functions whose executed-line fraction is below min_frac
(default 0.5), worst first — the candidates for new tests.  Executable
lines come from compiled code objects' co_lines(), so docstrings and
blank lines don't count against a function.
"""

from __future__ import annotations

import ast
import json
import os
import sys


def function_spans(path: str):
    """Yields (qualname, start, end) for every def/async def in path."""
    with open(path) as f:
        tree = ast.parse(f.read(), filename=path)
    stack: list[tuple[ast.AST, str]] = [(tree, "")]
    while stack:
        node, prefix = stack.pop()
        for child in ast.iter_child_nodes(node):
            if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef)):
                name = f"{prefix}{child.name}"
                yield name, child.lineno, child.end_lineno
                stack.append((child, name + "."))
            elif isinstance(child, ast.ClassDef):
                stack.append((child, f"{prefix}{child.name}."))
            else:
                stack.append((child, prefix))


def executable_lines(path: str) -> set[int]:
    with open(path) as f:
        code = compile(f.read(), path, "exec")
    lines: set[int] = set()
    todo = [code]
    while todo:
        c = todo.pop()
        lines.update(l for _, _, l in c.co_lines() if l)
        todo.extend(k for k in c.co_consts if hasattr(k, "co_lines"))
    return lines


def main() -> None:
    dump_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kcov.json"
    min_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    with open(dump_path) as f:
        hits = {fn: set(lines) for fn, lines in json.load(f).items()}

    pkg_root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "kmerset_tpu",
    )
    rows = []
    for dirpath, _dirs, files in os.walk(pkg_root):
        for name in sorted(files):
            if not name.endswith(".py"):
                continue
            path = os.path.join(dirpath, name)
            rel = os.path.relpath(path, os.path.dirname(pkg_root))
            hit = hits.get(path, set())
            exe = executable_lines(path)
            for qual, start, end in function_spans(path):
                span = {l for l in exe if start < l <= end}
                if not span:
                    continue
                done = len(span & hit)
                frac = done / len(span)
                if frac < min_frac:
                    rows.append((frac, rel, qual, start, len(span) - done))
    rows.sort()
    print(f"{'frac':>5}  {'miss':>4}  location")
    for frac, rel, qual, start, missing in rows:
        print(f"{frac:5.0%}  {missing:4d}  {rel}:{start} {qual}")
    if not rows:
        print(f"no functions below {min_frac:.0%} coverage")


if __name__ == "__main__":
    main()
