"""Project linter (AST-based, stdlib-only).

The reference gates on lint/mypy/doc8/docstr-coverage under tox
(``/root/reference/tox.ini:12-28``).  This image ships none of those tools
and installs are forbidden, so this is a self-contained equivalent that
``make lint`` runs and that FAILS the build on regressions:

  F401  unused import
  E722  bare ``except:``
  B006  mutable default argument
  E501  line longer than 100 characters
  D100  missing module docstring
  D103  missing docstring on a public function/class (docstring coverage
        must stay >= 90% per package — the reference's docstr-coverage role)
  T201  print() call in library code (benchmarks/scripts/tests exempt)

Usage: python scripts/lint.py [paths...]   (default: the package + tests)
"""

from __future__ import annotations

import ast
import os
import sys
from dataclasses import dataclass

MAX_LINE = 100
MIN_DOC_COVERAGE = 0.90


@dataclass
class Finding:
    path: str
    line: int
    code: str
    msg: str

    def __str__(self) -> str:
        return f"{self.path}:{self.line}: {self.code} {self.msg}"


def _is_library(path: str) -> bool:
    if os.path.basename(path) == "cli.py":
        return False  # the CLI prints to stdout by design
    return ("bikg_graph_explainability_public_tpu" in path
            and os.sep + "tests" not in path)


class ImportTracker(ast.NodeVisitor):
    """Collect imported names and every name usage."""

    def __init__(self) -> None:
        self.imports: dict[str, int] = {}  # name -> lineno
        self.used: set[str] = set()

    def visit_Import(self, node: ast.Import) -> None:
        for a in node.names:
            name = (a.asname or a.name).split(".")[0]
            self.imports[name] = node.lineno

    def visit_ImportFrom(self, node: ast.ImportFrom) -> None:
        if node.module == "__future__":
            return
        for a in node.names:
            if a.name == "*":
                continue
            self.imports[a.asname or a.name] = node.lineno

    def visit_Name(self, node: ast.Name) -> None:
        self.used.add(node.id)

    def visit_Attribute(self, node: ast.Attribute) -> None:
        self.generic_visit(node)


def check_file(path: str, src: str) -> tuple[list[Finding], int, int]:
    """Returns (findings, documented_publics, total_publics)."""
    findings: list[Finding] = []
    rel = os.path.relpath(path)

    for i, line in enumerate(src.splitlines(), 1):
        if len(line) > MAX_LINE and "noqa" not in line:
            findings.append(Finding(rel, i, "E501", f"line too long ({len(line)})"))

    try:
        tree = ast.parse(src)
    except SyntaxError as exc:
        findings.append(Finding(rel, exc.lineno or 0, "E999", f"syntax error: {exc.msg}"))
        return findings, 0, 0

    # F401 unused imports (module scope only; conftest/__init__ re-export freely)
    base = os.path.basename(path)
    if base not in ("__init__.py", "conftest.py", "compat.py"):
        tracker = ImportTracker()
        tracker.visit(tree)
        # names appearing anywhere in the source text after their import line
        # count as used (covers docstring references, __all__, strings)
        for name, lineno in tracker.imports.items():
            if name.startswith("_"):
                continue
            if name not in tracker.used and f'"{name}"' not in src and f"'{name}'" not in src:
                findings.append(Finding(rel, lineno, "F401", f"unused import {name!r}"))

    documented = total = 0
    module_public = not base.startswith("_")
    if module_public and ast.get_docstring(tree) is None:
        findings.append(Finding(rel, 1, "D100", "missing module docstring"))

    lib = _is_library(path)
    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            findings.append(Finding(rel, node.lineno, "E722", "bare except"))
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for default in node.args.defaults + node.args.kw_defaults:
                if isinstance(default, (ast.List, ast.Dict, ast.Set)):
                    findings.append(
                        Finding(rel, node.lineno, "B006",
                                f"mutable default in {node.name}()")
                    )
        if (
            lib
            and isinstance(node, ast.Call)
            and isinstance(node.func, ast.Name)
            and node.func.id == "print"
        ):
            findings.append(Finding(rel, node.lineno, "T201", "print() in library code"))

    # docstring coverage: public API only — module-level defs/classes and
    # direct methods of public classes (closures don't need docs)
    if lib:
        def count(node):
            nonlocal documented, total
            if node.name.startswith("_"):
                return
            total += 1
            if ast.get_docstring(node) is not None:
                documented += 1

        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                count(node)
            elif isinstance(node, ast.ClassDef):
                count(node)
                for sub in node.body:
                    if isinstance(sub, (ast.FunctionDef, ast.AsyncFunctionDef)):
                        count(sub)

    return findings, documented, total


def iter_py(paths: list[str]):
    for p in paths:
        if os.path.isfile(p):
            yield p
            continue
        for root, dirs, files in os.walk(p):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py"):
                    yield os.path.join(root, f)


API_MANIFEST = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "api_signatures.json"
)


def api_signature_map() -> dict[str, str]:
    """Signature string of every public-API callable (``px.__all__`` plus the
    public methods of exported classes), via runtime introspection."""
    import importlib
    import inspect

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    import re

    pkg = importlib.import_module("bikg_graph_explainability_public_tpu")

    def sig(obj) -> str:
        # function-object defaults repr with a memory address — strip it or
        # every run would "drift"
        return re.sub(
            r"<(function|class|bound method) ([^>]+) at 0x[0-9a-f]+>",
            r"<\1 \2>",
            str(inspect.signature(obj)),
        )

    out: dict[str, str] = {}
    for name in sorted(pkg.__all__):
        obj = getattr(pkg, name)
        if inspect.isclass(obj):
            for mname, m in sorted(vars(obj).items()):
                if mname.startswith("_") and mname != "__init__":
                    continue
                if callable(m) or isinstance(m, (staticmethod, classmethod)):
                    try:
                        out[f"{name}.{mname}"] = sig(m)
                    except (ValueError, TypeError):
                        pass
        elif callable(obj):
            try:
                out[name] = sig(obj)
            except (ValueError, TypeError):
                pass
    return out


def check_api_signatures(update: bool = False) -> list[Finding]:
    """Type/signature gate for the public API (the reference gates on mypy,
    ``tox.ini:12-28``; mypy isn't in this image, so the gate is a checked-in
    signature manifest).  Any drift — changed annotation or default, removed
    parameter, dropped or added export — fails ``make lint`` until the
    change is acknowledged with ``python scripts/lint.py --update-api``."""
    import json

    current = api_signature_map()
    if update or not os.path.exists(API_MANIFEST):
        with open(API_MANIFEST, "w") as f:
            json.dump(current, f, indent=1, sort_keys=True)
        print(f"-- wrote {len(current)} API signatures to {API_MANIFEST}")
        return []
    with open(API_MANIFEST) as f:
        expected = json.load(f)
    findings = []
    for key in sorted(set(expected) | set(current)):
        if key not in current:
            findings.append(Finding(
                API_MANIFEST, 1, "ANN002",
                f"public API symbol removed: {key}{expected[key]}"))
        elif key not in expected:
            findings.append(Finding(
                API_MANIFEST, 1, "ANN003",
                f"new public API symbol not in manifest: {key}{current[key]}"
                " (run scripts/lint.py --update-api)"))
        elif expected[key] != current[key]:
            findings.append(Finding(
                API_MANIFEST, 1, "ANN001",
                f"signature drift on {key}: manifest {expected[key]!r}"
                f" != current {current[key]!r}"))
    return findings


def main(argv: list[str]) -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    update_api = "--update-api" in argv
    argv = [a for a in argv if a != "--update-api"]
    paths = argv or [
        os.path.join(repo, "bikg_graph_explainability_public_tpu"),
        os.path.join(repo, "tests"),
        os.path.join(repo, "bench.py"),
        os.path.join(repo, "__graft_entry__.py"),
    ]
    all_findings: list[Finding] = []
    doc_n = doc_d = 0
    for path in iter_py(paths):
        with open(path) as f:
            src = f.read()
        findings, d, n = check_file(path, src)
        all_findings.extend(findings)
        doc_d += d
        doc_n += n
    all_findings.extend(check_api_signatures(update=update_api))

    for f in sorted(all_findings, key=lambda x: (x.path, x.line)):
        print(f)
    coverage = doc_d / doc_n if doc_n else 1.0
    print(f"-- docstring coverage: {doc_d}/{doc_n} = {coverage:.1%} "
          f"(minimum {MIN_DOC_COVERAGE:.0%})")
    if coverage < MIN_DOC_COVERAGE:
        print("FAIL: docstring coverage below minimum")
        return 1
    if all_findings:
        print(f"FAIL: {len(all_findings)} finding(s)")
        return 1
    print("lint ok")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
