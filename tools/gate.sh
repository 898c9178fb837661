#!/usr/bin/env bash
# Pre-commit correctness gate for one or more named queries:
#   tools/gate.sh q1_pricing,corpus_filter [sfDir]
# Runs a FILTERED graft.Verify dump for exactly those queries, then the
# DuckDB-oracle compare on the same set. Every new or touched oracle
# query goes through this BEFORE its commit (the round-4 lesson: two
# queries shipped red because they were committed unchecked).
set -euo pipefail
cd "$(dirname "$0")/.."

QUERIES="${1:?usage: tools/gate.sh <query[,query...]> [sfDir]}"
SF_DIR="${2:-/root/testdata/sf0.01}"
OUT_DIR="$(mktemp -d /tmp/gate.XXXXXX)"
trap 'rm -rf "$OUT_DIR"' EXIT

sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR $QUERIES" > "$OUT_DIR/verify.log" 2>&1 || {
  echo "Verify FAILED — tail of log:"; tail -20 "$OUT_DIR/verify.log"; exit 1; }
grep -i "\[verify\].*failed" "$OUT_DIR/verify.log" && exit 1

# README's advertised query count must match what SparkEntry actually
# registers (Verify dumps queries.size even on filtered runs) — the
# docs are the contract, and count drift ships silently otherwise
ACTUAL=$(cat "$OUT_DIR/query_count.txt")
WANT=$(grep -oE '[0-9]+ oracle-checked queries' README.md | grep -oE '[0-9]+' | head -1)
if [ "$ACTUAL" != "$WANT" ]; then
  echo "GATE FAIL: README.md advertises $WANT oracle-checked queries, SparkEntry registers $ACTUAL"
  exit 1
fi
# SURVEY.md's coverage-contract count must match too (round-6 lesson:
# README was gated, SURVEY silently drifted 4 queries behind)
SWANT=$(grep -oE '\([0-9]+ oracle queries' SURVEY.md | grep -oE '[0-9]+' | head -1)
if [ -z "$SWANT" ]; then
  # a reworded SURVEY.md must not silently disable this guard
  echo "GATE FAIL: SURVEY.md no longer states its '(N oracle queries' count"
  exit 1
fi
if [ "$ACTUAL" != "$SWANT" ]; then
  echo "GATE FAIL: SURVEY.md advertises $SWANT oracle queries, SparkEntry registers $ACTUAL"
  exit 1
fi

python3 tools/check.py "$SF_DIR" "$OUT_DIR" "$QUERIES"
