"""Validate the FUSED (jit_enabled) shard_map prover bodies on the real TPU
chip via a 1-device mesh: the sharded stage-2 / quotient-sweep / FRI-ro
shard_map kernels and the four-step DIF compile and execute on the actual
target, and the proof bytes match the unsharded TPU prove.

(The 8-way CPU mesh tests validate the collectives semantics eagerly; one
real chip cannot exercise multi-device ICI, but it does exercise the exact
fused bodies the TPU pod path runs.)  Run when the axon tunnel is up:

    python scripts/tpu_mesh1_check.py
"""

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/multistark_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from jax.sharding import Mesh

    from multistark_tpu import parallel as par
    from multistark_tpu.config import CommitmentParameters, FriParameters
    from multistark_tpu.configs import GoldilocksBlake3Config
    from multistark_tpu.system import System, SystemWitness
    from multistark_tpu.test_circuits import u32_add_system_inputs, u32_add_witness
    from multistark_tpu.verifier import verify_multiple_claims

    assert jax.default_backend() == "tpu", jax.default_backend()
    mesh = Mesh(np.array(jax.devices()[:1]), ("rows",))

    config = GoldilocksBlake3Config(
        CommitmentParameters(log_blowup=2, cap_height=0),
        FriParameters(
            log_final_poly_len=0, max_log_arity=1, num_queries=16,
            commit_proof_of_work_bits=4, query_proof_of_work_bits=4,
        ),
    )
    system, key = System.new(config, u32_add_system_inputs())
    n = 1 << 10
    rng = np.random.default_rng(3)
    xs = rng.integers(0, 1 << 32, n, dtype=np.uint64)
    ys = rng.integers(0, 1 << 32, n, dtype=np.uint64)
    traces, claims = u32_add_witness(list(zip(xs.tolist(), ys.tolist())), n)
    witness = SystemWitness.from_stage_1(traces, system, key)

    t0 = time.time()
    proof_ref = system.prove_multiple_claims(key, witness, claims)
    print(f"unsharded TPU prove: {time.time()-t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    with par.use_mesh(mesh):
        proof_mesh = system.prove_multiple_claims(key, witness, claims)
    print(f"mesh(1) TPU prove (incl. shard_map compiles): {time.time()-t0:.1f}s",
          file=sys.stderr)

    verify_multiple_claims(system, claims, proof_mesh)
    a = proof_ref.to_bytes(config)
    b = proof_mesh.to_bytes(config)
    assert a == b, "mesh(1) proof diverged from unsharded TPU proof"
    print(
        "tpu_mesh1_check OK: fused shard_map prover bodies byte-identical "
        f"on TPU ({len(a)} proof bytes, sha256={hashlib.sha256(a).hexdigest()[:16]})"
    )


if __name__ == "__main__":
    main()
