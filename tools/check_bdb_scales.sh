#!/usr/bin/env bash
# Two-scale gate run for the b31-b64 direct BDB oracles.
#
# The b-series runs the real 23-table query bodies against the
# committed deterministic fixture and hash-compares against DuckDB
# replaying the same files. A single committed scale can hide an
# oracle that silently depends on a fixture PROPERTY rather than the
# query semantics (b59's vocabulary injectivity, the sessionization
# (user,ts) invariant). This script re-runs every b-series gate
# against BOTH committed scales — the floor fixture and the 3x-floor
# fixture (bench/bdb_oracle_x3, BdbOracleDump floorMult=3) — so a
# fixture-property dependence fails here before it ships.
#
# Usage: tools/check_bdb_scales.sh [sfDir]   (default /root/testdata/sf0.01)
set -euo pipefail
cd "$(dirname "$0")/.."
SFDIR="${1:-/root/testdata/sf0.01}"
BS=$(grep -o 'Q("b[0-9]*_[a-z0-9_]*"' src/main/scala/graft/bdb/BdbDirect.scala |
  sed 's/Q("//;s/"//' | sort | paste -sd, -)
echo "[bdb-scales] gates: $BS"
for scale in bdb_oracle bdb_oracle_x3; do
  out="/tmp/verify_${scale}"
  rm -rf "$out"
  echo "[bdb-scales] === $scale ==="
  GRAFT_BDB_ORACLE_DIR="$PWD/bench/$scale" SPARK_GRAFT_ONLY="$BS" \
    sbt -batch "runMain graft.Verify $SFDIR $out" >/tmp/verify_${scale}.log 2>&1 ||
    { tail -30 /tmp/verify_${scale}.log; exit 1; }
  grep -i "\[verify\].*failed" /tmp/verify_${scale}.log && exit 1
  python3 tools/check.py "$SFDIR" "$out"
done
echo "[bdb-scales] both scales green"
