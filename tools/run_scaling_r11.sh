#!/bin/bash
# Round-11 quiet-box scaling measurements (VERDICT r10 items 1+2):
# run with NOTHING else on the box. Three sequential harness runs:
#   1. 10x documents sweep (the full 21-query list incl. r11 adds)
#   2. 100x corpus-proportional family — the deep-scale rows
#   3. 10x events-side sweep (incl. r11 adds)
# Failure handling (r11 review): each sbt run's own exit code is
# checked (a piped grep used to mask failures AND abort the sweep on
# an empty table); full per-run output is kept beside the log.
set -u
cd /root/repo
LOG=${1:-/tmp/scaling_r11.log}
: > "$LOG"

run_sweep() { # name, main, args..., env assignments via `env`
  local name="$1"; shift
  local out="/tmp/scaling_r11_${name}.out"
  echo "=== $name ===" >> "$LOG"
  if "$@" > "$out" 2>&1; then
    grep -E "^\|" "$out" >> "$LOG" || echo "| (no rows emitted) |" >> "$LOG"
  else
    echo "| $name FAILED — see $out |" >> "$LOG"
  fi
}

run_sweep "10x_documents" env \
  sbt -batch "Test/runMain graft.tools.ScaleBench 10 2"

run_sweep "100x_corpus_proportional" env \
  SCALEBENCH_QUERIES="q_bpe_encode,q_bpe_roundtrip,q_train_examples,q_cdc_chunks" \
  sbt -batch "Test/runMain graft.tools.ScaleBench 100 2"

run_sweep "10x_events" env \
  sbt -batch "Test/runMain graft.tools.EventsScaleBench 10 2"

echo "=== done ===" >> "$LOG"
