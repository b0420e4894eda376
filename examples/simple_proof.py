"""Minimal end-to-end proof: Pythagorean triples a^2 + b^2 = c^2
(reference examples/simple_proof.rs)."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from multistark_tpu import expr as ex
from multistark_tpu.air import Air, AirBuilder, LookupAir
from multistark_tpu.config import CommitmentParameters, FriParameters
from multistark_tpu.configs import GoldilocksBlake3Config
from multistark_tpu.prover import prove_multiple_claims
from multistark_tpu.system import System, SystemWitness
from multistark_tpu.verifier import verify_multiple_claims


class PythagoreanAir(Air):
    width = 3

    def eval(self, builder: AirBuilder) -> None:
        a, b, c = builder.main().row(0)
        builder.assert_eq(a * a + b * b, c * c)


def main():
    config = GoldilocksBlake3Config(
        CommitmentParameters(log_blowup=2, cap_height=0),
        FriParameters.standard_fast(),
    )
    system, key = System.new(config, [LookupAir(PythagoreanAir(), []).to_circuit_inputs()])
    trace = np.asarray(
        [(3, 4, 5), (6, 8, 10), (5, 12, 13), (8, 15, 17)], np.uint64
    )
    witness = SystemWitness.from_stage_1([trace], system, key)

    t0 = time.time()
    proof = prove_multiple_claims(system, key, witness, [])
    print(f"Proved in {time.time() - t0:.2f}s")
    t0 = time.time()
    verify_multiple_claims(system, [], proof)
    print(f"Verified in {time.time() - t0:.2f}s")
    data = proof.to_bytes()
    print(f"Proof size: {len(data)} bytes")


if __name__ == "__main__":
    main()
