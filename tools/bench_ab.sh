#!/bin/bash
# A/B the round-4 launch-fold levers on the real chip (run only when
# the axon tunnel is up).  Each variant is its own slow remote compile
# the first time; the persistent cache makes re-runs fast.
cd "$(dirname "$0")/.."
set -x
# 1. default (cache-hot from round 3): the recorded baseline
python bench.py
# 2. folded MAC divergence (-2 launches/step)
GERRIS_BENCH_FAST=1 GERRIS_FOLD_DIV=1 python bench.py
# 3. paired U+V advection (-1 launch/step)
GERRIS_BENCH_FAST=1 GERRIS_PAIR_ADVECT=1 python bench.py
# 4. both
GERRIS_BENCH_FAST=1 GERRIS_FOLD_DIV=1 GERRIS_PAIR_ADVECT=1 python bench.py
