"""Row-sharded proving over a device mesh — the TPU-native scale-out path
(no reference analogue: argumentcomputer/multi-stark is single-host rayon;
this axis is SURVEY.md §7.1 step 10 / BASELINE.md's scale-out target).

Runs on whatever devices are available: real TPU chips, or a virtual CPU
mesh (set XLA_FLAGS=--xla_force_host_platform_device_count=8 before
launching, as done below when only one device is present).  On a multi-host
pod, call ``parallel.init_distributed()`` first and the same code shards
over every chip in the pod.

The sharded prove is BIT-IDENTICAL to the single-device prove: the four-step
NTT + block-sharded Merkle reduction compute the same transcript, so the
proof bytes match — which this example asserts.
"""

import os
import sys
import time

sys.path.insert(0, ".")

if __name__ == "__main__" and "XLA_FLAGS" not in os.environ:
    # single-chip boxes: fall back to a virtual 8-device CPU mesh
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    os.environ.setdefault("MULTISTARK_PLATFORM", "cpu")

import numpy as np

from multistark_tpu import expr as ex
from multistark_tpu import parallel as par
from multistark_tpu.config import CommitmentParameters, FriParameters
from multistark_tpu.configs import GoldilocksBlake3Config
from multistark_tpu.system import CircuitInputs, System, SystemWitness


def main():
    config = GoldilocksBlake3Config(
        CommitmentParameters(log_blowup=2, cap_height=0),
        FriParameters.standard_fast(),
    )
    inputs = CircuitInputs(
        main_width=3,
        constraints=[ex.main(0) * ex.main(1) - ex.main(2)],
        ext_constraints=[],
        lookups=[],
    )
    system, key = System.new(config, [inputs])

    n = 1 << 10
    rng = np.random.default_rng(0)
    p = config.host_field.p
    a = rng.integers(0, 1 << 31, n, dtype=np.uint64)
    b = rng.integers(0, 1 << 31, n, dtype=np.uint64)
    c = (a.astype(object) * b.astype(object)) % p
    trace = np.stack([a, b, np.asarray(c, np.uint64)], axis=1)
    witness = SystemWitness.from_stage_1([trace], system, key)

    pm = par.global_mesh()
    print(f"mesh: {pm.n} devices on axis '{pm.axis}'")

    t0 = time.time()
    proof_single = system.prove(key, witness)
    print(f"single-device prove: {time.time() - t0:.2f}s")

    t0 = time.time()
    with par.use_mesh(pm.mesh):
        proof_sharded = system.prove(key, witness)
    print(f"row-sharded prove ({pm.n} devices): {time.time() - t0:.2f}s")

    system.verify(proof_sharded)
    assert proof_sharded.to_bytes(config) == proof_single.to_bytes(config)
    print("Verified; sharded proof bytes identical to single-device")
    print(f"Proof size: {len(proof_sharded.to_bytes(config))} bytes")


if __name__ == "__main__":
    main()
