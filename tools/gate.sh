#!/usr/bin/env bash
# Pre-snapshot gate: EVERYTHING the driver will check, one command.
# Run from /root/repo before ANY end-of-round (or milestone) commit:
#
#   bash tools/gate.sh            # full: compile + tests + verify + check + bench smoke
#   bash tools/gate.sh --fast     # skip the test suite (verify+check only)
#   bash tools/gate.sh --worlds   # ALSO run the adversarial-world
#                                 # differentials: null-planted payloads,
#                                 # all-empty, facts-empty,
#                                 # pathological-unicode-text,
#                                 # non-finite-embedding,
#                                 # exact-tie/duplicate, and
#                                 # extreme-numerics fixtures
#                                 # @ sf0.01 -> Verify -> check.py
#                                 # --unordered (unordered because the
#                                 # engines disagree on default null
#                                 # placement under ORDER BY; value
#                                 # equality is what the differential
#                                 # proves). --null = same (legacy alias).
#
# A round must never end on a commit that hasn't passed this script
# (round 2 shipped a non-compiling HEAD; this is the fix for the
# process, not just the brace).
set -euo pipefail
cd "$(dirname "$0")/.."

FAST=${1:-}

echo "== gate: compile (main + test) =="
sbt -batch Test/compile > /tmp/gate_compile.log 2>&1 \
  || { tail -30 /tmp/gate_compile.log; echo "GATE FAIL: compile"; exit 1; }

if [[ "$FAST" != "--fast" ]]; then
  echo "== gate: scalatest =="
  sbt -batch test > /tmp/gate_test.log 2>&1 \
    || { grep -E "\*\*\*|FAILED" /tmp/gate_test.log | head -20; echo "GATE FAIL: tests"; exit 1; }
  grep -E "^\[info\] Tests:" /tmp/gate_test.log | tail -1
fi

echo "== gate: Verify @ sf0.01 + DuckDB differential =="
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/gate_vout" > /tmp/gate_verify.log 2>&1 \
  || { tail -30 /tmp/gate_verify.log; echo "GATE FAIL: Verify run"; exit 1; }
python3 tools/check.py /root/testdata/sf0.01 /tmp/gate_vout | tail -3
python3 tools/check.py /root/testdata/sf0.01 /tmp/gate_vout | tail -1 | grep -q " 0 fail" \
  || { echo "GATE FAIL: oracle mismatch"; exit 1; }

if [[ "$FAST" == "--null" || "$FAST" == "--worlds" ]]; then
  run_world() {  # <label> <src sf dir> <gen main> [gen mode arg]
    local label=$1 sf=$2 main=$3 mode=${4:-}
    echo "== gate: $label-world differential @ $(basename "$sf") =="
    sbt -batch "runMain $main $sf /tmp/gate_${label}world $mode" \
      > "/tmp/gate_${label}gen.log" 2>&1 \
      || { tail -30 "/tmp/gate_${label}gen.log"; echo "GATE FAIL: $label world gen"; exit 1; }
    sbt -batch "runMain graft.Verify /tmp/gate_${label}world /tmp/gate_v$label" \
      > "/tmp/gate_v$label.log" 2>&1 \
      || { tail -30 "/tmp/gate_v$label.log"; echo "GATE FAIL: Verify on $label world"; exit 1; }
    python3 tools/check.py "/tmp/gate_${label}world" "/tmp/gate_v$label" --unordered \
      > "/tmp/gate_check_$label.log"
    tail -2 "/tmp/gate_check_$label.log"
    tail -1 "/tmp/gate_check_$label.log" | grep -q " 0 fail" \
      || { echo "GATE FAIL: $label-world oracle mismatch"; exit 1; }
  }
  run_world null /root/testdata/sf0.01 graft.tools.NullWorld
  run_world empty /root/testdata/sf0.01 graft.tools.EmptyWorld all
  run_world facts /root/testdata/sf0.01 graft.tools.EmptyWorld facts
  run_world unicode /root/testdata/sf0.01 graft.tools.UnicodeWorld
  run_world nonfinite /root/testdata/sf0.01 graft.tools.NonFiniteWorld
  run_world tie /root/testdata/sf0.01 graft.tools.TieWorld
  run_world numerics /root/testdata/sf0.01 graft.tools.NumericsWorld
  # orphan world de-vacuizes join_anti / sql_tpch_q22 (the driver's
  # saturated fixtures make both return 0 rows — a 0=0 hash match
  # proves nothing about the predicates)
  run_world orphan /root/testdata/sf0.01 graft.tools.OrphanWorld
  # skew runs at sf0.1, not sf0.01: the planted boilerplate only crosses
  # the hot-shingle df-cap (50 per source) from sf0.1 upward — below
  # that the cap is latent and the world tests nothing the clean
  # differential doesn't. Slowest world (~12 min: sf0.1 Verify + the
  # DuckDB shingle CTEs at 50k docs).
  run_world skew /root/testdata/sf0.1 graft.tools.SkewWorld

  # layout world is NOT an oracle differential (both engines read the
  # same layout, so engine agreement can't see layout sensitivity) —
  # it's Spark-vs-Spark: same data, 7-file hash-scrambled rewrite, and
  # every query's row multiset must be BIT-EQUAL to the standard
  # /tmp/gate_vout dump (declared merge-order-sensitive sketches are
  # NOTEd, not failed — see tools/layout_check.py SENSITIVE).
  echo "== gate: layout-invariance sweep @ sf0.01 =="
  sbt -batch "runMain graft.tools.LayoutWorld /root/testdata/sf0.01 /tmp/gate_layoutworld" \
    > /tmp/gate_layoutgen.log 2>&1 \
    || { tail -30 /tmp/gate_layoutgen.log; echo "GATE FAIL: layout world gen"; exit 1; }
  sbt -batch "runMain graft.Verify /tmp/gate_layoutworld /tmp/gate_vlayout" \
    > /tmp/gate_vlayout.log 2>&1 \
    || { tail -30 /tmp/gate_vlayout.log; echo "GATE FAIL: Verify on layout world"; exit 1; }
  python3 tools/layout_check.py /tmp/gate_vout /tmp/gate_vlayout \
    > /tmp/gate_check_layout.log \
    || { grep "^FAIL" /tmp/gate_check_layout.log | head -5;
         echo "GATE FAIL: layout sensitivity"; exit 1; }
  tail -2 /tmp/gate_check_layout.log
fi

echo "== gate: Bench contract smoke @ sf0.001 =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 SPARK_GRAFT_BENCH_FILE=/tmp/gate_bench.json \
  sbt -batch "runMain graft.Bench" > /tmp/gate_bench.log 2>&1 \
  || { tail -30 /tmp/gate_bench.log; echo "GATE FAIL: Bench run"; exit 1; }
python3 - <<'EOF'
import json
b = json.load(open("/tmp/gate_bench.json"))
assert b["n_err"] == 0, f"Bench errors: {b['errors']}"
print(f"bench ok: total={b['value']}s, {len(b['queries'])} queries, 0 errors")
EOF

echo "GATE PASS"
