"""Prove BLAKE3 hashing of a real message with the 10-circuit family —
the flagship multi-circuit workload (reference src/test_circuits/blake3.rs).

The hasher walks the chunk/parent tree, records every compression as a
claim, and the proof binds them all: chained block compressions, parent
nodes, and the root (whose output words ARE the digest).  Verifying the
proof against the claims therefore verifies the digest."""

import sys
import time

sys.path.insert(0, ".")

from multistark_tpu.config import CommitmentParameters, FriParameters
from multistark_tpu.configs import GoldilocksBlake3Config
from multistark_tpu.hash.blake3 import blake3_hash
from multistark_tpu.prover import prove_multiple_claims
from multistark_tpu.system import System, SystemWitness
from multistark_tpu.test_circuits.blake3_circuit import (
    blake3_hasher_witness,
    blake3_system_inputs,
)
from multistark_tpu.verifier import verify_multiple_claims


def main():
    message = bytes(i % 251 for i in range(4096))  # 4 KiB, 4 chunks

    config = GoldilocksBlake3Config(
        CommitmentParameters(log_blowup=2, cap_height=0),
        FriParameters.standard_fast(),
    )
    t0 = time.time()
    system, key = System.new(config, blake3_system_inputs(limb_bits=8))
    print(f"Setup (10 circuits, 8-bit tables): {time.time() - t0:.1f}s")

    digest, traces, claims = blake3_hasher_witness(message, limb_bits=8)
    assert digest == blake3_hash(message)
    print(f"blake3({len(message)}B message) = {digest.hex()}")
    print(f"{len(claims)} compression claims "
          f"(trace heights {[t.shape[0] for t in traces]})")

    witness = SystemWitness.from_stage_1(traces, system, key)
    t0 = time.time()
    proof = prove_multiple_claims(system, key, witness, claims)
    print(f"Proved in {time.time() - t0:.2f}s")

    t0 = time.time()
    verify_multiple_claims(system, claims, proof)
    print(f"Verified in {time.time() - t0:.2f}s")

    # the digest is bound: tampering the root claim's output must fail
    from multistark_tpu.errors import VerificationError

    bad = [list(c) for c in claims]
    bad[-1][-9] ^= 1  # a digest word of the root compression
    try:
        verify_multiple_claims(system, bad, proof)
        raise AssertionError("tampered digest accepted")
    except VerificationError:
        print("Tampered digest rejected")
    print(f"Proof size: {len(proof.to_bytes(config))} bytes")


if __name__ == "__main__":
    main()
