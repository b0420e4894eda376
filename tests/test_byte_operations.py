"""Byte-operations table e2e (reference byte_operations.rs:124-158; 4-bit
variant keeps CPU runtime sane — same circuit structure)."""

import numpy as np
import pytest

from multistark_tpu.config import CommitmentParameters, FriParameters
from multistark_tpu.configs import GoldilocksBlake3Config
from multistark_tpu.errors import VerificationError
from multistark_tpu.prover import prove_multiple_claims
from multistark_tpu.system import System, SystemWitness
from multistark_tpu.test_circuits.byte_operations import (
    AND_CHAN,
    OR_CHAN,
    RANGE_CHAN,
    XOR_CHAN,
    byte_operations_inputs,
    byte_operations_witness,
)
from multistark_tpu.verifier import verify_multiple_claims


def make_config():
    return GoldilocksBlake3Config(
        CommitmentParameters(log_blowup=2, cap_height=0),
        FriParameters(0, 1, 6, 1, 1),
    )


class TestByteOperations:
    def test_roundtrip(self):
        config = make_config()
        system, key = System.new(config, [byte_operations_inputs(bits=4)])
        claims = [
            [XOR_CHAN, 5, 9, 5 ^ 9],
            [AND_CHAN, 7, 12, 7 & 12],
            [OR_CHAN, 3, 8, 3 | 8],
            [RANGE_CHAN, 15, 0],
            [XOR_CHAN, 5, 9, 5 ^ 9],  # duplicate claim -> multiplicity 2
        ]
        trace = byte_operations_witness(claims, bits=4)
        witness = SystemWitness.from_stage_1([trace], system, key)
        proof = prove_multiple_claims(system, key, witness, claims)
        verify_multiple_claims(system, claims, proof)

        bad = [list(c) for c in claims]
        bad[0][3] = 99
        with pytest.raises(VerificationError):
            verify_multiple_claims(system, bad, proof)

    def test_roundtrip_full_byte_table(self):
        """Reference-parity width: the full 8-bit table (2^16 rows,
        byte_operations.rs:124-158), viable in the default suite since the
        native host core."""
        config = make_config()
        system, key = System.new(config, [byte_operations_inputs(bits=8)])
        claims = [
            [XOR_CHAN, 0xA5, 0x3C, 0xA5 ^ 0x3C],
            [AND_CHAN, 0xF0, 0x1F, 0xF0 & 0x1F],
            [OR_CHAN, 0x80, 0x01, 0x80 | 0x01],
            [RANGE_CHAN, 0xFF, 0],
        ]
        trace = byte_operations_witness(claims, bits=8)
        witness = SystemWitness.from_stage_1([trace], system, key)
        proof = prove_multiple_claims(system, key, witness, claims)
        verify_multiple_claims(system, claims, proof)
