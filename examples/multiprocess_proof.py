"""Multi-PROCESS distributed proving — the multi-host pod recipe, runnable
on one machine (no reference analogue: argumentcomputer/multi-stark is
single-host rayon; this is BASELINE.md's scale-out axis).

Two worker processes each own half the devices (here 4 virtual CPU devices
each; on a TPU pod each process owns one host's chips and the three
``init_distributed`` arguments come from the pod environment).  Both build
the SAME witness, join one ``jax.distributed`` cluster, and run the sharded
prove over the global 8-device row mesh — the four-step all-to-all, the
stage-2 all_gather, and the quotient halo ppermute all cross the process
boundary through jax's coordination service.  Every process emits the same
proof bytes, which also match a single-process prove (asserted in
tests/test_distributed_multiprocess.py).

Run:  python examples/multiprocess_proof.py
"""

import os
import socket
import subprocess
import sys
import time

WORKER = """
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["MULTISTARK_PLATFORM"] = "cpu"
pid, port = int(sys.argv[1]), sys.argv[2]
import jax
jax.config.update("jax_platforms", "cpu")
import hashlib
import numpy as np
from multistark_tpu import expr as ex
from multistark_tpu import parallel as par
from multistark_tpu.config import CommitmentParameters, FriParameters
from multistark_tpu.configs import GoldilocksBlake3Config
from multistark_tpu.fields.device import GL_OPS
from multistark_tpu.system import CircuitInputs, System, SystemWitness

# one cluster, two processes, 8 global devices
pm = par.init_distributed(
    coordinator_address="127.0.0.1:" + port, num_processes=2, process_id=pid
)
print(f"[proc {pid}] joined cluster: {jax.process_count()} processes, "
      f"{len(jax.devices())} global devices, mesh axis {pm.n}", flush=True)

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
rng = np.random.default_rng(17)
n = 256
a = rng.integers(0, 1 << 31, n, dtype=np.uint64)
b = rng.integers(0, 1 << 31, n, dtype=np.uint64)
c = (a.astype(object) * b.astype(object)) % GL_OPS.host.p
trace = np.stack([a, b, np.asarray(c, np.uint64)], axis=1)
witness = SystemWitness.from_stage_1([trace], system, key)

with par.use_mesh(pm.mesh):
    proof = system.prove(key, witness)
system.verify(proof)
data = proof.to_bytes(config)
print(f"[proc {pid}] proof {len(data)} bytes, "
      f"sha256={hashlib.sha256(data).hexdigest()[:16]}", flush=True)
"""


def main():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    t0 = time.time()
    procs = [
        subprocess.Popen([sys.executable, "-c", WORKER, str(i), port],
                         cwd=here, env=env)
        for i in range(2)
    ]
    rcs = [p.wait(timeout=1800) for p in procs]
    assert rcs == [0, 0], rcs
    print(f"2-process distributed prove + verify: {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
