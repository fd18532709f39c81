#!/usr/bin/env bash
# Static checks (reference CI parity: black+mypy,
# /root/reference/.github/workflows/checks.yml). ruff/mypy run when
# installed; this image ships neither, so the committed fallback is the
# in-repo AST linter (scripts/lint_ast.py) + compileall.
set -e
cd "$(dirname "$0")/.."
status=0
if command -v ruff >/dev/null 2>&1; then
  echo "== ruff =="; ruff check . || status=1
  ruff format --check . || status=1
else
  echo "== ruff not installed; running scripts/lint_ast.py fallback =="
  python scripts/lint_ast.py || status=1
fi
if command -v mypy >/dev/null 2>&1; then
  echo "== mypy =="; mypy cflearn_tpu || status=1
else
  echo "== mypy not installed; running compileall fallback =="
  python -m compileall -q cflearn_tpu tests scripts bench.py __graft_entry__.py || status=1
fi
exit $status
