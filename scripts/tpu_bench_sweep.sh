#!/usr/bin/env bash
# Full TPU benchmark matrix — run when the axon tunnel is up.
# Each size recompiles its kernels (~15-25 min cold through the tunnel);
# results append to docs/ as JSON lines.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_results
ts=$(date +%Y%m%d_%H%M%S)

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) ===" >&2
  "$@" > "bench_results/${ts}_${name}.json" 2> "bench_results/${ts}_${name}.log"
  echo "--- $name result:" >&2
  cat "bench_results/${ts}_${name}.json" >&2
}

# validate the round-2 claims-fix gains at the reference sizes first
run u32add_12_13_14 env BENCH_SIZES=12,13,14 BENCH_ITERS=3 timeout 4000 python bench.py
run u32add_16       env BENCH_SIZES=16       BENCH_ITERS=3 timeout 4000 python bench.py
run u32add_18       env BENCH_SIZES=18       BENCH_ITERS=2 timeout 5000 python bench.py
run u32add_20       env BENCH_SIZES=20       BENCH_ITERS=2 timeout 7000 python bench.py
run blake3_4kib     env BENCH_WORKLOAD=blake3 BENCH_MSG_KIB=4 BENCH_ITERS=2 timeout 5000 python bench.py
echo "sweep done: bench_results/${ts}_*" >&2
