"""REAL multi-process scale-out smoke (VERDICT round-2 #4; SURVEY.md §4
closing note): two OS processes, each with 4 virtual CPU devices, join one
jax.distributed cluster via parallel.init_distributed, build the 8-device
global row mesh, run the SAME sharded prove, and must emit byte-identical
proofs — which also match a single-process reference prove.

This exercises the axis the reference cannot (it is single-host rayon,
src/prover.rs:848-855): cross-process collectives (the four-step all-to-all,
subtree gathers) through jax's coordination service.  SLOW-gated: two
subprocess bring-ups + a distributed prove take ~minutes on CPU."""

import os
import socket
import subprocess
import sys

import pytest

SLOW = os.environ.get("MULTISTARK_SLOW") not in (None, "", "0")

COMMON = """
import hashlib
import numpy as np
import jax
from multistark_tpu import expr as ex
from multistark_tpu import parallel as par
from multistark_tpu.config import CommitmentParameters, FriParameters
from multistark_tpu.configs import GoldilocksBlake3Config
from multistark_tpu.fields.device import GL_OPS
from multistark_tpu.system import CircuitInputs, System, SystemWitness

config = GoldilocksBlake3Config(
    CommitmentParameters(log_blowup=2, cap_height=0),
    FriParameters(log_final_poly_len=0, max_log_arity=1, num_queries=4,
                  commit_proof_of_work_bits=1, query_proof_of_work_bits=1),
)
inputs = CircuitInputs(
    main_width=3,
    constraints=[ex.main(0) * ex.main(1) - ex.main(2)],
    ext_constraints=[],
    lookups=[],
)
system, key = System.new(config, [inputs])
rng = np.random.default_rng(7)
n = 256
a = rng.integers(0, 1 << 31, n, dtype=np.uint64)
b = rng.integers(0, 1 << 31, n, dtype=np.uint64)
c = (a.astype(object) * b.astype(object)) % GL_OPS.host.p
trace = np.stack([a, b, np.asarray(c, np.uint64)], axis=1)
witness = SystemWitness.from_stage_1([trace], system, key)
"""

WORKER = """
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["MULTISTARK_PLATFORM"] = "cpu"
pid, port = int(sys.argv[1]), sys.argv[2]
import jax
jax.config.update("jax_platforms", "cpu")
from multistark_tpu import parallel as par
pm = par.init_distributed(
    coordinator_address="127.0.0.1:" + port, num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
assert pm.n == 8, pm.n
""" + COMMON + """
with par.use_mesh(pm.mesh):
    proof = system.prove(key, witness)
data = proof.to_bytes(config)
print("sha256=" + hashlib.sha256(data).hexdigest(), flush=True)
"""

REFERENCE = """
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ["MULTISTARK_PLATFORM"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
""" + COMMON + """
proof = system.prove(key, witness)
data = proof.to_bytes(config)
print("sha256=" + hashlib.sha256(data).hexdigest(), flush=True)
"""

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _digest(out: str) -> str:
    lines = [l for l in out.splitlines() if l.startswith("sha256=")]
    assert lines, f"no digest in output: {out[-500:]}"
    return lines[-1].split("=", 1)[1].strip()


@pytest.mark.skipif(not SLOW, reason="MULTISTARK_SLOW=1 to enable")
def test_two_process_prove_byte_identical():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(i), port],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=REPO, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=1200)
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append(out)
    digests = {_digest(out) for out in outs}
    assert len(digests) == 1, f"processes disagree: {digests}"

    ref = subprocess.run(
        [sys.executable, "-c", REFERENCE],
        capture_output=True, text=True, timeout=1200, cwd=REPO, env=env,
    )
    assert ref.returncode == 0, ref.stderr[-4000:]
    assert digests == {_digest(ref.stdout)}
