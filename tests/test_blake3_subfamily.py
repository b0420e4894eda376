"""Default-suite e2e over blake3-family circuits (no MULTISTARK_SLOW gate):
the limb-xor table + U32Xor circuits from the 10-circuit family prove real
XOR_CHAN claims and reject tampering.  The full 10-circuit multi-compression
prove stays in test_blake3_circuit.py (SLOW) and the TPU bench
(BENCH_WORKLOAD=blake3); this covers the family's channel wiring in the
fast suite (reference blake3.rs:124-158 byte-ops analogue)."""

import numpy as np
import pytest

from multistark_tpu.config import CommitmentParameters, FriParameters
from multistark_tpu.configs import GoldilocksBlake3Config
from multistark_tpu.errors import VerificationError
from multistark_tpu.prover import prove_multiple_claims
from multistark_tpu.system import System, SystemWitness
from multistark_tpu.test_circuits.blake3_circuit import (
    XOR_CHAN,
    _pad_rows,
    limb_xor_table,
    u32_xor_circuit,
)
from multistark_tpu.verifier import verify_multiple_claims

LIMB_BITS = 4
K = 32 // LIMB_BITS
LMASK = (1 << LIMB_BITS) - 1


def xor_witness(pairs):
    """(traces ordered as [limb_xor_table, u32_xor], claims) for x^y words."""
    lxor_mult = np.zeros(1 << (2 * LIMB_BITS), np.uint64)
    rows, claims = [], []
    for x, y in pairs:
        z = x ^ y
        xl = [(x >> (LIMB_BITS * i)) & LMASK for i in range(K)]
        yl = [(y >> (LIMB_BITS * i)) & LMASK for i in range(K)]
        zl = [(z >> (LIMB_BITS * i)) & LMASK for i in range(K)]
        for a, b in zip(xl, yl):
            lxor_mult[(a << LIMB_BITS) | b] += 1
        rows.append(xl + yl + zl + [1])
        claims.append([XOR_CHAN, x, y, z])
    trace = _pad_rows(rows, 3 * K + 1)
    return [lxor_mult.reshape(-1, 1), trace], claims


@pytest.fixture(scope="module")
def proved():
    config = GoldilocksBlake3Config(
        CommitmentParameters(log_blowup=2, cap_height=0),
        FriParameters(0, 1, 4, 1, 1),
    )
    system, key = System.new(
        config, [limb_xor_table(LIMB_BITS), u32_xor_circuit(LIMB_BITS)]
    )
    pairs = [(0x01234567, 0x89ABCDEF), (0xFFFFFFFF, 0x0F0F0F0F), (0xDEADBEEF, 0x13371337)]
    traces, claims = xor_witness(pairs)
    witness = SystemWitness.from_stage_1(traces, system, key)
    proof = prove_multiple_claims(system, key, witness, claims)
    return system, claims, proof


def test_prove_verify(proved):
    system, claims, proof = proved
    verify_multiple_claims(system, claims, proof)


def test_wrong_claim_rejected(proved):
    system, claims, proof = proved
    bad = [list(c) for c in claims]
    bad[0][3] ^= 1  # claim z != x ^ y
    with pytest.raises(VerificationError):
        verify_multiple_claims(system, bad, proof)


def test_dropped_claim_rejected(proved):
    system, claims, proof = proved
    with pytest.raises(VerificationError):
        verify_multiple_claims(system, claims[:-1], proof)
