"""The TPU execution path (MULTISTARK_JIT=1: fused stage commits, fused FRI
commit phase, packed transcript scalars) must produce byte-identical proofs
to the eager np-mirror path.  On hardware this is pinned by the examples;
here a subprocess forces jit on the CPU backend at a tiny size so the fused
programs stay covered in CI (SLOW: XLA:CPU compiles the prove pipeline).

Matches the reference's determinism contract (proofs are run-to-run
identical, src/types.rs:31-81 DeterministicPow + deterministic transcript).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import os, sys
os.environ["MULTISTARK_JIT"] = "1"
# jitted-CPU pipeline: opt back into the persistent cache (single-device
# executables; the sharded-write segfault does not apply) or every run
# recompiles for ~minutes
os.environ["MULTISTARK_JAX_CACHE"] = "/tmp/multistark_jax_cache_cpujit"
sys.path.insert(0, "@ROOT@")
import jax
jax.config.update("jax_platforms", "cpu")
# persistent cache config comes from the package import (CPU dirs are
# fingerprinted by host CPU features: mismatched AOT loads can SIGILL)
import numpy as np
from multistark_tpu import expr as ex
from multistark_tpu.config import CommitmentParameters, FriParameters
from multistark_tpu.configs import GoldilocksBlake3Config
from multistark_tpu.fields.host import GOLDILOCKS as F
from multistark_tpu.system import CircuitInputs, System, SystemWitness

config = GoldilocksBlake3Config(
    CommitmentParameters(log_blowup=2, cap_height=0),
    FriParameters(log_final_poly_len=0, max_log_arity=1, num_queries=8,
                  commit_proof_of_work_bits=2, query_proof_of_work_bits=2),
)
inputs = CircuitInputs(
    main_width=3,
    constraints=[ex.main(0) * ex.main(1) - ex.main(2)],
    ext_constraints=[], lookups=[],
)
system, key = System.new(config, [inputs])
rng = np.random.default_rng(7)
n = 64
a = rng.integers(0, 1 << 31, n, dtype=np.uint64)
b = rng.integers(0, 1 << 31, n, dtype=np.uint64)
c = (a.astype(object) * b.astype(object)) % F.p
trace = np.stack([a, b, np.asarray(c, np.uint64)], axis=1)
witness = SystemWitness.from_stage_1([trace], system, key)
proof = system.prove(key, witness)
system.verify(proof)
sys.stdout.write(proof.to_bytes(config).hex())
"""


@pytest.mark.skipif(
    not os.environ.get("MULTISTARK_SLOW"),
    reason="XLA:CPU compile of the jitted prove pipeline (~minutes); set MULTISTARK_SLOW=1",
)
def test_jitted_path_byte_identical_to_eager():
    from multistark_tpu import expr as ex
    from multistark_tpu.config import CommitmentParameters, FriParameters
    from multistark_tpu.configs import GoldilocksBlake3Config
    from multistark_tpu.fields.host import GOLDILOCKS as F
    from multistark_tpu.system import CircuitInputs, System, SystemWitness

    config = GoldilocksBlake3Config(
        CommitmentParameters(log_blowup=2, cap_height=0),
        FriParameters(log_final_poly_len=0, max_log_arity=1, num_queries=8,
                      commit_proof_of_work_bits=2, query_proof_of_work_bits=2),
    )
    inputs = CircuitInputs(
        main_width=3,
        constraints=[ex.main(0) * ex.main(1) - ex.main(2)],
        ext_constraints=[], lookups=[],
    )
    system, key = System.new(config, [inputs])
    rng = np.random.default_rng(7)
    n = 64
    a = rng.integers(0, 1 << 31, n, dtype=np.uint64)
    b = rng.integers(0, 1 << 31, n, dtype=np.uint64)
    c = (a.astype(object) * b.astype(object)) % F.p
    trace = np.stack([a, b, np.asarray(c, np.uint64)], axis=1)
    witness = SystemWitness.from_stage_1([trace], system, key)
    eager_bytes = system.prove(key, witness).to_bytes(config)

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # single-device child: no virtual mesh
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT.replace("@ROOT@", ROOT)],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert bytes.fromhex(out.stdout.strip()) == eager_bytes
