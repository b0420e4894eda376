#!/usr/bin/env bash
# 2^20 OOM diagnosis: texray streams span entries so the last span named
# before the RESOURCE_EXHAUSTED identifies the failing stage; unfiltered
# tracebacks identify the op.
cd /root/repo
MULTISTARK_TEXRAY=stark/ JAX_TRACEBACK_FILTERING=off BENCH_SIZES=20 \
  BENCH_SUBPROC=0 BENCH_ITERS=1 BENCH_VERIFY=0 timeout 7000 python bench.py \
  > bench_results/r3_diag20.json 2> bench_results/r3_diag20.log
echo "diag20 rc=$?"
