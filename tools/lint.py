"""Dependency-free lint: the in-image fallback for `make check`.

The reference ships flake8/black/isort/mypy via pre-commit
(/root/reference/setup.cfg:10-19, .pre-commit-config.yaml); this image has
none of them, so this AST-based checker covers the highest-signal subset:

* syntax errors (compile)
* unused imports (module scope and function scope)
* duplicate dict literal keys
* `except:` bare excepts
* trailing whitespace / tabs in indentation

Full ruff/mypy configs live in pyproject.toml and run via `make check` when
those tools are installed.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
TARGETS = ["fastspeech2_lightning_tpu", "tests", "tools", "bench.py",
           "__graft_entry__.py"]

# names whose import is intentional despite no direct use
ALLOW_UNUSED = {"annotations"}


class ImportChecker(ast.NodeVisitor):
    def __init__(self):
        self.imports: dict[str, ast.stmt] = {}
        self.used: set[str] = set()

    def visit_Import(self, node: ast.Import):
        for alias in node.names:
            name = (alias.asname or alias.name).split(".")[0]
            self.imports[name] = node

    def visit_ImportFrom(self, node: ast.ImportFrom):
        for alias in node.names:
            if alias.name == "*":
                continue
            name = alias.asname or alias.name
            if name not in ALLOW_UNUSED:
                self.imports[name] = node

    def visit_Name(self, node: ast.Name):
        self.used.add(node.id)

    def visit_Attribute(self, node: ast.Attribute):
        self.generic_visit(node)


def check_file(path: Path) -> list[str]:
    problems: list[str] = []
    src = path.read_text(encoding="utf8")
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]

    checker = ImportChecker()
    checker.visit(tree)
    # names used in __all__, docstring-only modules, or re-export modules
    reexport = "__init__" in path.name or "__all__" in src
    lines = src.splitlines()
    if not reexport:
        for name, node in checker.imports.items():
            if name not in checker.used and f"{name}." not in src:
                # honor `# noqa` on the import line (e.g. probe imports)
                line = lines[node.lineno - 1] if node.lineno <= len(lines) else ""
                if "noqa" in line:
                    continue
                problems.append(
                    f"{path}:{node.lineno}: unused import '{name}'"
                )

    for node in ast.walk(tree):
        if isinstance(node, ast.Dict):
            keys = [
                ast.literal_eval(k)
                for k in node.keys
                if isinstance(k, ast.Constant)
            ]
            seen = set()
            for k in keys:
                if k in seen:
                    problems.append(
                        f"{path}:{node.lineno}: duplicate dict key {k!r}"
                    )
                seen.add(k)
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            problems.append(f"{path}:{node.lineno}: bare 'except:'")

    for i, line in enumerate(src.splitlines(), 1):
        if line != line.rstrip():
            problems.append(f"{path}:{i}: trailing whitespace")
        stripped = line.lstrip(" ")
        if stripped.startswith("\t"):
            problems.append(f"{path}:{i}: tab in indentation")
    return problems


def main() -> int:
    problems: list[str] = []
    for target in TARGETS:
        p = ROOT / target
        files = [p] if p.suffix == ".py" else sorted(p.rglob("*.py"))
        for f in files:
            problems.extend(check_file(f))
    for msg in problems:
        print(msg)
    print(f"lint: {len(problems)} problem(s)")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
