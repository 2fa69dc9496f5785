#!/bin/bash
# Sequential per-file test runner for the 1-vCPU build box:
# - each file runs in its own process with cache WRITES enabled (the
#   full-suite writer segfault doesn't reproduce in short-lived runs),
# - a crash/timeout in one file doesn't kill the rest,
# - prints a per-file and total summary.
cd "$(dirname "$0")/.."
export JAX_SUITE_CACHE_WRITES=1
pass=0; fail=0; failed=""
for f in tests/test_*.py; do
    t0=$(date +%s)
    if timeout "${PER_FILE_TIMEOUT:-2400}" python -m pytest "$f" -q \
        > /tmp/suite_$(basename "$f" .py).log 2>&1; then
        s=ok
        pass=$((pass+1))
    else
        s=FAIL
        fail=$((fail+1))
        failed="$failed $f"
    fi
    t1=$(date +%s)
    tail=$(grep -E "[0-9]+ (passed|failed)" \
        /tmp/suite_$(basename "$f" .py).log | tail -1)
    echo "$s  $((t1-t0))s  $f  ($tail)"
done
echo "files: $pass ok, $fail failed:$failed"
[ "$fail" -eq 0 ]
