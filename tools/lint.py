"""Minimal stdlib linter: syntax, unused imports, undefined-name smoke.

Fallback for environments without ruff (which pyproject.toml configures but
this image does not ship).  Checks every tracked python file for:
  - syntax errors (ast.parse)
  - unused imports (module scope)
  - duplicate function/class definitions in the same scope
  - constant-time equality discipline in secp256k1_tpu/models/: the analog
    of the reference's `disalloweq` vet tool
    (`/root/reference/internal/disalloweq/disalloweq.go`) — every key-type
    `__eq__` must route through hmac.compare_digest, and secret-bearing
    attributes must not be compared with ==/!= outside such an __eq__.
"""

import ast
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
TARGETS = ["secp256k1_tpu", "tests", "tools", "bench.py", "__graft_entry__.py"]


def iter_files():
    for t in TARGETS:
        p = ROOT / t
        if p.is_file():
            yield p
        else:
            yield from sorted(p.rglob("*.py"))


def check_file(path: Path):
    errors = []
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]

    # Unused module-scope imports (name never referenced anywhere).
    imported = {}
    for node in tree.body:
        if isinstance(node, ast.Import):
            for a in node.names:
                name = (a.asname or a.name).split(".")[0]
                imported[name] = node.lineno
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for a in node.names:
                if a.name == "*":
                    continue
                imported[a.asname or a.name] = node.lineno
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            pass
    # Names used inside strings (docstring __all__ style) are ignored; allow
    # conventional re-export modules by skipping __init__.py.
    if path.name != "__init__.py":
        for name, lineno in imported.items():
            if name not in used and not name.startswith("_"):
                errors.append(f"{path}:{lineno}: unused import '{name}'")

    # Constant-time equality discipline (models/ only): __eq__ on key types
    # must use compare_digest; secret-bearing attrs never compared directly.
    if "models" in path.parts:
        _SECRET_ATTRS = {"scalar", "d", "point_bytes"}

        def _names_compare_digest(fn):
            return any(isinstance(n, ast.Attribute)
                       and n.attr == "compare_digest"
                       for n in ast.walk(fn))

        for node in ast.walk(tree):
            if isinstance(node, ast.ClassDef):
                for item in node.body:
                    if (isinstance(item, ast.FunctionDef)
                            and item.name == "__eq__"
                            and not _names_compare_digest(item)):
                        errors.append(
                            f"{path}:{item.lineno}: {node.name}.__eq__ does "
                            "not use hmac.compare_digest (ct discipline)")

        class _EqVisitor(ast.NodeVisitor):
            def __init__(self):
                self.in_ct_eq = 0

            def visit_FunctionDef(self, fn):
                ct = fn.name == "__eq__"
                self.in_ct_eq += ct
                self.generic_visit(fn)
                self.in_ct_eq -= ct

            def visit_Compare(self, cmp):
                if not self.in_ct_eq and any(
                        isinstance(op, (ast.Eq, ast.NotEq))
                        for op in cmp.ops):
                    for side in [cmp.left] + cmp.comparators:
                        if (isinstance(side, ast.Attribute)
                                and side.attr in _SECRET_ATTRS):
                            errors.append(
                                f"{path}:{cmp.lineno}: direct ==/!= on "
                                f"secret attribute '{side.attr}'")
                self.generic_visit(cmp)
        _EqVisitor().visit(tree)

    # Duplicate defs in the same scope.
    def walk_scope(body, scope):
        seen = {}
        for node in body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                if node.name in seen:
                    errors.append(
                        f"{path}:{node.lineno}: duplicate def "
                        f"'{node.name}' in {scope}")
                seen[node.name] = node.lineno
                walk_scope(node.body, node.name)
    walk_scope(tree.body, "<module>")
    return errors


def main():
    all_errors = []
    n = 0
    for f in iter_files():
        n += 1
        all_errors.extend(check_file(f))
    for e in all_errors:
        print(e)
    print(f"lint: {n} files, {len(all_errors)} findings")
    return 1 if all_errors else 0


if __name__ == "__main__":
    sys.exit(main())
