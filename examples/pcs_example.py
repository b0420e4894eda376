"""Raw PCS usage: commit one polynomial batch, open at a point, verify —
with explicit Fiat-Shamir transcript mirroring
(reference examples/pcs_example.rs)."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from multistark_tpu.challenger import SerializingChallenger64
from multistark_tpu.config import CommitmentParameters, FriParameters
from multistark_tpu.configs.goldilocks_blake3 import GoldilocksBlake3Config
from multistark_tpu.fields.host import GOLDILOCKS as F, GOLDILOCKS_EXT2 as E
from multistark_tpu.ntt import get_engine


def main():
    config = GoldilocksBlake3Config(
        CommitmentParameters(log_blowup=2, cap_height=0),
        FriParameters.standard_fast(),
    )
    pcs = config.pcs
    engine = get_engine(config.field)

    rng = np.random.default_rng(0)
    log_n, width = 8, 4
    coeffs = rng.integers(0, F.p, size=(width, 1 << log_n), dtype=np.uint64)
    evals = engine.dft_natural(config.field.from_np(coeffs), log_n)
    domain = pcs.natural_domain_for_degree(1 << log_n)

    t0 = time.time()
    cap, data = pcs.commit([(domain, evals)])
    print(f"Committed {width} polynomials of degree <{1 << log_n} in {time.time() - t0:.2f}s")

    # prover transcript
    ch = config.initialise_challenger()
    ch.observe_commitment(cap)
    zeta = ch.sample_ext()
    t0 = time.time()
    opened, proof = pcs.open([(data, [[zeta]])], ch)
    print(f"Opened at zeta in {time.time() - t0:.2f}s")

    # independent verifier transcript
    vch = config.initialise_challenger()
    vch.observe_commitment(cap)
    zeta_v = vch.sample_ext()
    assert zeta_v == zeta
    rounds = [(cap, [(log_n, width, [(zeta_v, opened[0][0][0])])])]
    t0 = time.time()
    pcs.verify(rounds, proof, vch)
    print(f"Verified in {time.time() - t0:.2f}s")

    # sanity: claimed value matches direct evaluation
    acc = E.zero
    for c in reversed(coeffs[0]):
        acc = E.add(E.mul(acc, zeta), E.from_base(int(c)))
    assert acc == opened[0][0][0][0]
    print("Opened value matches Horner evaluation")


if __name__ == "__main__":
    main()
