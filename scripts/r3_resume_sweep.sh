#!/usr/bin/env bash
# Remainder of the round-3 TPU capture plan, for when the tunnel recovers:
# 2^20 (split stage-2 kernels), blake3 64 KiB, 2^18 retry, mesh(1) check.
set -u
cd /root/repo
run() {
  local name="$1"; shift
  echo "=== $name start $(date +%H:%M:%S) ===" >&2
  "$@" > "bench_results/r3_${name}.json" 2> "bench_results/r3_${name}.log"
  echo "=== $name done rc=$? $(date +%H:%M:%S) ===" >&2
}
run tpu20  env BENCH_SIZES=20 BENCH_ITERS=2 timeout 9000 python bench.py
run blake3_64k env BENCH_WORKLOAD=blake3 BENCH_MSG_KIB=64 BENCH_ITERS=2 timeout 9000 python bench.py
run tpu18b env BENCH_SIZES=18 BENCH_ITERS=2 timeout 7500 python bench.py
echo "=== mesh1 start $(date +%H:%M:%S) ===" >&2
timeout 7000 python scripts/tpu_mesh1_check.py > bench_results/r3_mesh1.log 2>&1
echo "=== mesh1 done rc=$? $(date +%H:%M:%S) ===" >&2
echo "resume sweep complete" >&2
