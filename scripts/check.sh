#!/usr/bin/env bash
# Full local correctness gate: sbt tests + driver-style DuckDB oracle diff.
# Usage: scripts/check.sh [sfDir]  (default /root/testdata/sf0.01)
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.01}"
OUT="$(mktemp -d /tmp/graft_check_XXXX)"

sbt -batch test
sbt -batch "runMain graft.Verify $SF_DIR $OUT"
python3 tools/check_oracle.py "$SF_DIR" "$OUT"
echo "ALL GREEN: tests + oracle diff @ $SF_DIR"
