#!/bin/sh
# Static checks — the analog of the reference's golangci run
# (/root/reference/.golangci.yml:1-120). Run from the repo root.
set -e
cd "$(dirname "$0")/.."
if python -m ruff --version >/dev/null 2>&1; then
    python -m ruff check secp256k1_tpu tests tools bench.py __graft_entry__.py
    echo "ruff: OK"
else
    # ruff is configured in pyproject.toml but not shipped in this image;
    # fall back to the stdlib AST linter (syntax/unused-import/dup-def).
    python tools/lint.py
fi
