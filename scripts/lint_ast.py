"""In-repo AST linter — the offline fallback of scripts/check.sh.

The reference CI runs black+mypy on every push
(`/root/reference/.github/workflows/checks.yml`); this image ships neither
ruff nor mypy and installs are forbidden, so this enforces the
highest-signal subset with only the stdlib:

* F401-lite: imports never referenced in the module (re-export files and
  `__all__`/`# noqa: F401` carriers are exempt),
* F811-lite: a def/class redefined in the same scope,
* B006-lite: mutable default arguments (list/dict/set literals),
* E711-lite: comparisons to None/True/False with ==/!=,
* E722: bare `except:`,
* syntax: every file must compile.

Exit 0 = clean. Usage: python scripts/lint_ast.py [paths...]
"""

import ast
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DEFAULT_PATHS = ["cflearn_tpu", "tests", "scripts", "bench.py", "__graft_entry__.py"]
EXCLUDE = {"scripts/_ref_oracle"}


def iter_files(paths):
    for p in paths:
        p = (REPO / p) if not Path(p).is_absolute() else Path(p)
        files = [p] if p.is_file() else sorted(p.rglob("*.py"))
        for f in files:
            rel = f.relative_to(REPO) if f.is_relative_to(REPO) else f
            if not any(str(rel).startswith(e) for e in EXCLUDE):
                yield f


def module_names_used(tree):
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # a.b.c -> root name a
            cur = node
            while isinstance(cur, ast.Attribute):
                cur = cur.value
            if isinstance(cur, ast.Name):
                used.add(cur.id)
    return used


def check_file(path):
    src = path.read_text()
    problems = []
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]
    is_reexport = path.name == "__init__.py" or "__all__" in src
    lines = src.splitlines()

    used = module_names_used(tree)
    # string-annotation references ("TrainerConfig" in quotes) count as used
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            for tok in node.value.replace("[", " ").replace("]", " ").replace(".", " ").split():
                used.add(tok)

    for node in ast.walk(tree):
        if isinstance(node, (ast.Import, ast.ImportFrom)) and not is_reexport:
            line = lines[node.lineno - 1] if node.lineno <= len(lines) else ""
            if "noqa" in line:
                continue
            for alias in node.names:
                if alias.name == "*":
                    continue
                bound = alias.asname or alias.name.split(".")[0]
                if bound not in used:
                    problems.append(f"{path}:{node.lineno}: unused import '{bound}'")
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for default in node.args.defaults + [
                d for d in node.args.kw_defaults if d is not None
            ]:
                if isinstance(default, (ast.List, ast.Dict, ast.Set)):
                    problems.append(
                        f"{path}:{node.lineno}: mutable default argument in '{node.name}'"
                    )
        elif isinstance(node, ast.Compare):
            for op, cmp_ in zip(node.ops, node.comparators):
                if isinstance(op, (ast.Eq, ast.NotEq)) and isinstance(cmp_, ast.Constant):
                    if cmp_.value is None or cmp_.value is True or cmp_.value is False:
                        problems.append(
                            f"{path}:{node.lineno}: use 'is' when comparing to {cmp_.value!r}"
                        )
        elif isinstance(node, ast.ExceptHandler) and node.type is None:
            problems.append(f"{path}:{node.lineno}: bare 'except:'")

    # F811-lite per scope
    def scan_scope(body, where):
        seen = {}
        for stmt in body:
            if isinstance(stmt, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                deco = {getattr(d, "attr", getattr(d, "id", "")) for d in stmt.decorator_list}
                if deco & {"overload", "setter", "getter", "deleter", "register"}:
                    continue
                if stmt.name == "_":  # throwaway defs (pallas kernel bodies)
                    continue
                if stmt.name in seen:
                    problems.append(
                        f"{path}:{stmt.lineno}: '{stmt.name}' redefines line {seen[stmt.name]} in {where}"
                    )
                seen[stmt.name] = stmt.lineno
                scan_scope(stmt.body, f"{where}.{stmt.name}")

    scan_scope(tree.body, path.stem)
    return problems


def main() -> None:
    paths = sys.argv[1:] or DEFAULT_PATHS
    all_problems = []
    n = 0
    for f in iter_files(paths):
        n += 1
        all_problems += check_file(f)
    for p in all_problems:
        print(p)
    print(f"lint_ast: {n} files, {len(all_problems)} problems")
    sys.exit(1 if all_problems else 0)


if __name__ == "__main__":
    main()
