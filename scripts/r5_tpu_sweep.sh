#!/bin/bash
# Round-5 TPU capture sweep: one watchdogged bench process per size, then
# the blake3-64KiB flagship.  Each run both CAPTURES (bench_results/r5_*)
# and WARMS the persistent compile cache (/tmp/multistark_jax_cache), so
# the driver's end-of-round BENCH run hits warm compiles for every size —
# cross-process cache hits on the axon backend were verified this round
# (scripts/r4_probe_* lineage; see docs/STATUS.md round 5).
#
# Usage: scripts/r5_tpu_sweep.sh [sizes...]   (default: 14 18 20 blake3)
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_results
SIZES=("${@:-14 18 20 blake3}")
[ $# -eq 0 ] && SIZES=(14 18 20 blake3)

for s in "${SIZES[@]}"; do
  if [ "$s" = "blake3" ]; then
    out=bench_results/r5_blake3_64k.json
    log=bench_results/r5_blake3_64k.log
    echo "=== blake3 64KiB -> $out"
    BENCH_WORKLOAD=blake3 BENCH_MSG_KIB=64 BENCH_ITERS=3 \
      timeout 7000 python bench.py > "$out" 2> "$log"
    rc=$?
  else
    out=bench_results/r5_tpu${s}.json
    log=bench_results/r5_tpu${s}.log
    echo "=== 2^$s -> $out"
    BENCH_SIZES=$s BENCH_SUBPROC=0 BENCH_ITERS=3 \
      timeout 7000 python bench.py > "$out" 2> "$log"
    rc=$?
  fi
  echo "rc=$rc" >> "$log"
  tail -c 300 "$out"; echo
done
