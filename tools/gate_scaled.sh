#!/usr/bin/env bash
# Scaled-corpus ORACLE gate: the exact sequence that produced round 7's
# 10x correctness gate (the one that caught the CDC keyspace collision and
# the DuckDB DECIMAL->DOUBLE cast mis-rounding), promoted to a one-command
# runbook so any round (or the driver) can re-run it.
#
#   tools/gate_scaled.sh [copies] [corpusDir]
#
# Defaults: 10 copies under /tmp/sf<copies>x_gate. The corpus is the
# sf0.1 testdata key-shifted <copies> times with DENSE custkeys
# (contiguous key space — required for the d204/d227 referral forest,
# whose parent(c) = md5(c) mod c needs every lower key to exist).
# Steps: MakeScaled -> Verify (full 242-row battery dump) -> DuckDB
# hash-compare of every oracle-checked row. Want: "== 226 ok, 0 fail ==".
#
# NOTE: do not run any other sbt command in this repo while the gate is
# in flight (a concurrent compile can delete target classes under the
# running JVM and contaminates any timing being collected).
set -euo pipefail
COPIES="${1:-10}"
CORPUS="${2:-/tmp/sf${COPIES}x_gate}"
DUMP="${CORPUS}_verify"
cd "$(dirname "$0")/.."
echo "[gate] building ${COPIES}x densekeys corpus at $CORPUS"
sbt -batch "runMain graft.MakeScaled $CORPUS $COPIES densekeys"
echo "[gate] dumping battery at $DUMP"
rm -rf "$DUMP"
sbt -batch "runMain graft.Verify $CORPUS $DUMP"
echo "[gate] DuckDB oracle compare"
python3 tools/compare_oracle.py "$CORPUS" "$DUMP"
