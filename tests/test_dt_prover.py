"""Whole-prove device transcript (dt_prover.py): proof bytes must be
BIT-IDENTICAL to the host-transcript path, on the same jitted platform —
the replay-is-authority contract (same as the FRI-phase device transcript,
tests/test_device_transcript.py).  SLOW: forces MULTISTARK_JIT=1 on the
CPU backend in a subprocess (XLA:CPU compiles the whole prove pipeline,
minutes).  On TPU hardware the same comparison runs in seconds and is part
of the round-5 capture protocol (scripts/r5_tpu_sweep.sh)."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import os, sys
os.environ["MULTISTARK_JIT"] = "1"
# jitted-CPU pipeline: opt back into the persistent cache (single-device
# executables; the sharded-write segfault does not apply) or every run
# recompiles for ~minutes
os.environ["MULTISTARK_JAX_CACHE"] = "/tmp/multistark_jax_cache_cpujit"
sys.path.insert(0, {root!r})
import jax
jax.config.update("jax_platforms", "cpu")
# persistent cache config comes from the package import (CPU dirs are
# fingerprinted by host CPU features: mismatched AOT loads can SIGILL)
import numpy as np
from multistark_tpu.config import CommitmentParameters, FriParameters
from multistark_tpu.configs import GoldilocksBlake3Config
from multistark_tpu.system import System, SystemWitness
from multistark_tpu.test_circuits import u32_add_system_inputs, u32_add_witness
from multistark_tpu import dt_prover
from multistark_tpu.prover import prove_multiple_claims
from multistark_tpu.verifier import verify_multiple_claims

config = GoldilocksBlake3Config(
    CommitmentParameters(log_blowup=2, cap_height=1),
    FriParameters(log_final_poly_len=0, max_log_arity=2, num_queries=4,
                  commit_proof_of_work_bits=1, query_proof_of_work_bits=1),
)
system, key = System.new(config, u32_add_system_inputs())
n = 32
rng = np.random.default_rng(0xD7)
xs = rng.integers(0, 1 << 32, n, dtype=np.uint64)
ys = rng.integers(0, 1 << 32, n, dtype=np.uint64)
traces, claims = u32_add_witness(list(zip(xs.tolist(), ys.tolist())), n)
witness = SystemWitness.from_stage_1(traces, system, key)
assert dt_prover.eligible(config)
p_dt = dt_prover.prove_device_transcript(system, key, witness, claims)
assert p_dt is not None, "DT path fell back"
verify_multiple_claims(system, claims, p_dt)
os.environ["MULTISTARK_WHOLE_DT"] = "0"
p_host = prove_multiple_claims(system, key, witness, claims)
assert p_dt.to_bytes(config) == p_host.to_bytes(config), "proof bytes differ"
print("DT_BYTES_OK")
"""


@pytest.mark.skipif(
    not os.environ.get("MULTISTARK_SLOW"),
    reason="XLA:CPU compile of the jitted prove pipeline (~minutes); set MULTISTARK_SLOW=1",
)
def test_dt_prover_byte_identical_to_host_path():
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(root=ROOT)],
        capture_output=True, text=True, timeout=3600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "DT_BYTES_OK" in out.stdout
