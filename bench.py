"""Benchmark harness (reference benches/multi_stark.rs).

Workload: the 2-circuit U32Add + preprocessed ByteTable system, FRI params
log_blowup=2, cap_height=0, 100 queries, max_log_arity=1, PoW 10+10 bits —
exactly the reference bench configuration (benches/multi_stark.rs:244-258).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
prove wall-clock at the benchmark height (warm — jit compile excluded, as
criterion excludes Rust codegen).  Extra diagnostics go to stderr.

Env knobs:
  BENCH_LOG_N   trace height exponent (default 14)
  BENCH_ITERS   measured iterations (default 3)
  BENCH_VERIFY  also time verification (default 1)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/multistark_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from multistark_tpu.config import CommitmentParameters, FriParameters
    from multistark_tpu.configs import GoldilocksBlake3Config
    from multistark_tpu.profiling import reset_spans, span_times
    from multistark_tpu.prover import prove_multiple_claims
    from multistark_tpu.system import System, SystemWitness
    from multistark_tpu.test_circuits import u32_add_system_inputs, u32_add_witness
    from multistark_tpu.verifier import verify_multiple_claims

    # 2^14 = BASELINE.json's primary size; cold axon-backend compile is
    # ~20 min (excluded from the metric via the warmup iteration)
    log_n = int(os.environ.get("BENCH_LOG_N", "14"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    n = 1 << log_n
    log(f"bench: u32_add+byte_table at 2^{log_n} rows on {jax.default_backend()}")

    config = GoldilocksBlake3Config(
        CommitmentParameters(log_blowup=2, cap_height=0),
        FriParameters(
            log_final_poly_len=0,
            max_log_arity=1,
            num_queries=100,
            commit_proof_of_work_bits=10,
            query_proof_of_work_bits=10,
        ),
    )
    system, key = System.new(config, u32_add_system_inputs())

    # deterministic xorshift-style witness (reference benches/multi_stark.rs:171-238)
    rng = np.random.default_rng(0xDEADBEEF)
    xs = rng.integers(0, 1 << 32, n, dtype=np.uint64)
    ys = rng.integers(0, 1 << 32, n, dtype=np.uint64)
    pairs = list(zip(xs.tolist(), ys.tolist()))
    traces, claims = u32_add_witness(pairs, n)

    t0 = time.time()
    witness = SystemWitness.from_stage_1(traces, system, key)
    jax.block_until_ready(witness.traces[0])
    log(f"witness build: {time.time() - t0:.2f}s")

    # warmup (compiles everything)
    t0 = time.time()
    proof = prove_multiple_claims(system, key, witness, claims)
    log(f"prove warmup (incl. compile): {time.time() - t0:.2f}s")

    times = []
    for i in range(iters):
        reset_spans()
        t0 = time.time()
        proof = prove_multiple_claims(system, key, witness, claims)
        dt = time.time() - t0
        times.append(dt)
        log(f"prove[{i}]: {dt:.3f}s  spans: "
            + " ".join(f"{k.split('/')[-1]}={v:.2f}" for k, v in sorted(span_times().items())))

    if os.environ.get("BENCH_VERIFY", "1") != "0":
        t0 = time.time()
        verify_multiple_claims(system, claims, proof)
        log(f"verify: {time.time() - t0:.3f}s")
    log(f"proof size: {len(proof.to_bytes())} bytes")

    best = min(times)
    print(
        json.dumps(
            {
                "metric": f"u32_add_prove_2^{log_n}_wall",
                "value": round(best, 4),
                "unit": "s",
                "vs_baseline": 1.0,
            }
        )
    )


if __name__ == "__main__":
    main()
