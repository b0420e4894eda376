"""Blake3 circuit family e2e (reference blake3.rs:2216-2340).  The full
prove/verify runs with 4-bit limbs (256-row xor table) to keep CPU runtime
sane; structure is identical at 8-bit."""

import os

import numpy as np
import pytest

from multistark_tpu.config import CommitmentParameters, FriParameters
from multistark_tpu.configs import GoldilocksBlake3Config
from multistark_tpu.errors import VerificationError
from multistark_tpu.hash.blake3 import CHUNK_END, CHUNK_START, IV, ROOT, blake3_hash
from multistark_tpu.prover import prove_multiple_claims
from multistark_tpu.system import System, SystemWitness
from multistark_tpu.test_circuits.blake3_circuit import (
    blake3_system_inputs,
    blake3_witness,
)
from multistark_tpu.verifier import verify_multiple_claims


def make_config():
    return GoldilocksBlake3Config(
        CommitmentParameters(log_blowup=2, cap_height=0),
        FriParameters(0, 1, 4, 1, 1),
    )


def one_block_compression(data: bytes):
    """The single compression of blake3(data) for len(data) <= 64."""
    words = [int.from_bytes(data.ljust(64, b"\0")[4 * i : 4 * i + 4], "little") for i in range(16)]
    return (list(IV), words, 0, len(data), CHUNK_START | CHUNK_END | ROOT)


class TestWitnessConsistency:
    def test_instrumented_matches_host_blake3(self):
        """The witness builder asserts per-compression agreement with the
        standalone host implementation; the root output must equal the real
        blake3 digest."""
        data = b"multistark blake3 circuit family"
        comp = one_block_compression(data)
        traces, claims = blake3_witness([comp], limb_bits=4)
        digest_words = claims[0][-16:-8]
        expect = blake3_hash(data)
        got = b"".join(int(w).to_bytes(4, "little") for w in digest_words)
        assert got == expect

    def test_trace_shapes(self):
        comp = one_block_compression(b"abc")
        traces, claims = blake3_witness([comp], limb_bits=4)
        inputs = blake3_system_inputs(limb_bits=4)
        assert len(traces) == len(inputs) == 10
        for t, ci in zip(traces, inputs):
            assert t.shape[1] == ci.main_width
        assert traces[0].shape[0] == 1  # one compression row -> height 1? padded
        assert len(claims) == 1 and len(claims[0]) == 1 + 8 + 16 + 4 + 16


@pytest.mark.skipif(
    os.environ.get("MULTISTARK_SLOW") != "1",
    reason="full 10-circuit prove is slow on CPU; set MULTISTARK_SLOW=1",
)
class TestBlake3E2E:
    def test_prove_verify(self):
        config = make_config()
        system, key = System.new(config, blake3_system_inputs(limb_bits=4))
        comp = one_block_compression(b"flagship workload")
        traces, claims = blake3_witness([comp], limb_bits=4)
        witness = SystemWitness.from_stage_1(traces, system, key)
        proof = prove_multiple_claims(system, key, witness, claims)
        verify_multiple_claims(system, claims, proof)

        bad = [list(claims[0])]
        bad[0][-1] ^= 1  # tamper one output word
        with pytest.raises(VerificationError):
            verify_multiple_claims(system, bad, proof)
