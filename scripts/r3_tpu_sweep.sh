#!/usr/bin/env bash
# Round-3 TPU capture sweep (VERDICT #1): u32_add 2^14(cache check)/16/18/20
# + blake3 flagship at 64 KiB (>=1000 compressions, VERDICT #7).
set -u
cd /root/repo
run() {
  local name="$1"; shift
  echo "=== $name start $(date +%H:%M:%S) ===" >&2
  "$@" > "bench_results/r3_${name}.json" 2> "bench_results/r3_${name}.log"
  echo "=== $name done rc=$? $(date +%H:%M:%S) ===" >&2
}
run tpu14b env BENCH_SIZES=14 BENCH_ITERS=2 timeout 4000 python bench.py
run tpu16  env BENCH_SIZES=16 BENCH_ITERS=3 timeout 6000 python bench.py
run tpu18  env BENCH_SIZES=18 BENCH_ITERS=2 timeout 7500 python bench.py
run tpu20  env BENCH_SIZES=20 BENCH_ITERS=2 timeout 9000 python bench.py
run blake3_64k env BENCH_WORKLOAD=blake3 BENCH_MSG_KIB=64 BENCH_ITERS=2 timeout 9000 python bench.py
echo "sweep complete" >&2
