"""Mutually-recursive Even/Odd parity circuits exchanging push/pull over two
channels; proves the claim is_even(4) = 1.  Demonstrates multiplicity-gated
recursion with inverse-witnessed zero tests
(reference examples/lookup_proof.rs)."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from multistark_tpu import expr as ex
from multistark_tpu.config import CommitmentParameters, FriParameters
from multistark_tpu.configs import GoldilocksBlake3Config
from multistark_tpu.fields.host import GOLDILOCKS as F
from multistark_tpu.prover import prove_multiple_claims
from multistark_tpu.system import CircuitInputs, System, SystemWitness
from multistark_tpu.verifier import verify_multiple_claims

EVEN_CHAN = 0
ODD_CHAN = 1


def parity_circuit(own_chan: int, other_chan: int, base_result: int) -> CircuitInputs:
    """Columns (n, r, active, nz, inv):
      - active rows PULL (own_chan, n, r) — consuming a request
      - if n > 0 (nz = 1) they PUSH (other_chan, n-1, r) — delegating
      - if n == 0 the result is pinned to `base_result`
      - nz is inverse-witnessed: n·inv = nz, (1-nz)·n = 0."""
    n, r, active, nz, inv = (ex.main(i) for i in range(5))
    constraints = [
        active * (active - 1),
        nz * (nz - 1),
        n * inv - nz,
        (1 - nz) * n,
        active * (1 - nz) * (r - base_result),
    ]
    lookups = [
        ex.Lookup.pull(active, [ex.Const(own_chan), n, r]),
        ex.Lookup.push(active * nz, [ex.Const(other_chan), n - 1, r]),
    ]
    return CircuitInputs(
        main_width=5, constraints=constraints, ext_constraints=[], lookups=lookups
    )


def parity_rows(ns_rs, height):
    rows = np.zeros((height, 5), np.uint64)
    for i, (n, r) in enumerate(ns_rs):
        inv = F.inv(n) if n else 0
        rows[i] = (n, r, 1, 1 if n else 0, inv)
    return rows


def main():
    config = GoldilocksBlake3Config(
        CommitmentParameters(log_blowup=2, cap_height=0),
        FriParameters.standard_fast(),
    )
    system, key = System.new(
        config,
        [
            parity_circuit(EVEN_CHAN, ODD_CHAN, base_result=1),
            parity_circuit(ODD_CHAN, EVEN_CHAN, base_result=0),
        ],
    )
    # is_even(4): even sees 4, 2, 0; odd sees 3, 1
    even = parity_rows([(4, 1), (2, 1), (0, 1)], 4)
    odd = parity_rows([(3, 1), (1, 1)], 2)
    witness = SystemWitness.from_stage_1([even, odd], system, key)
    claims = [[EVEN_CHAN, 4, 1]]

    t0 = time.time()
    proof = prove_multiple_claims(system, key, witness, claims)
    print(f"Proved is_even(4) = 1 in {time.time() - t0:.2f}s")
    verify_multiple_claims(system, claims, proof)
    print("Verified")

    # the wrong claim must be rejected
    try:
        verify_multiple_claims(system, [[EVEN_CHAN, 4, 0]], proof)
        raise SystemExit("BUG: wrong claim accepted")
    except Exception:
        print("Wrong claim rejected")
    print(f"Proof size: {len(proof.to_bytes())} bytes")


if __name__ == "__main__":
    main()
