#!/bin/bash
# Round-4 clean A/B: all lever combinations, idle box, 40-step windows.
# Keep the host OTHERWISE IDLE while this runs — the step is launch-
# bound and a concurrent CPU job depresses results 7-40% (measured).
cd "$(dirname "$0")/.."
export BENCH_STEPS=40 GERRIS_BENCH_3D=0 GERRIS_BENCH_FAST=1
run() { echo "=== $* ==="; env "$@" python bench.py 2>&1 | grep '^{'; }
run GERRIS_NOOP=0
run GERRIS_FOLD_DIV=1
run GERRIS_FOLD_DIV=1 GERRIS_PAIR_ADVECT=1
run GERRIS_FOLD_CORRECT=1 GERRIS_PAIR_ADVECT=1
run GERRIS_FOLD_DIV=1 GERRIS_PAIR_ADVECT=1 GERRIS_DIFF_NRELAX=5
run GERRIS_FOLD_CORRECT=1 GERRIS_PAIR_ADVECT=1 GERRIS_DIFF_NRELAX=5
