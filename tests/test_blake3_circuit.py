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
    blake3_hasher_compressions,
    blake3_hasher_witness,
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


class TestHasherDriven:
    """Hasher-level claim generation (reference blake3.rs:32-351): the full
    chunk/parent tree hashed over real messages, every compression recorded
    as a provable claim."""

    @pytest.mark.parametrize(
        "size,min_comps",
        [(0, 1), (65, 2), (1024, 16), (2048 + 100, 18), (4096, 33)],
    )
    def test_compression_count_and_digest(self, size, min_comps):
        data = bytes(i % 251 for i in range(size))
        digest, comps = blake3_hasher_compressions(data)
        assert digest == blake3_hash(data)  # also asserted internally
        assert len(comps) >= min_comps
        # multi-chunk messages must include parent compressions
        if size > 1024:
            from multistark_tpu.hash.blake3 import PARENT

            assert any(c[4] & PARENT for c in comps)

    def test_hasher_witness_consistency(self):
        """Multi-chunk message -> 10-circuit witness: chunk chaining (block
        b's input cv = block b-1's output) and parent nodes all satisfy the
        compression relation checked inside blake3_witness."""
        data = bytes((7 * i) % 256 for i in range(3 * 1024 + 77))
        digest, traces, claims = blake3_hasher_witness(data, limb_bits=4)
        assert digest == blake3_hash(data)
        assert len(traces) == 10
        # one claim per compression; 4 chunks-ish -> dozens of claims
        assert len(claims) >= 10
        # the root compression (recorded last) carries the digest in its
        # output words
        root_claim = claims[-1]
        got = b"".join(int(w).to_bytes(4, "little") for w in root_claim[-16:-8])
        assert got == digest


class TestBlake3E2E:
    """Default-suite since the eager NumPy mirrors: the full 10-circuit
    prove runs in ~35s on CPU (was ~10min)."""

    def test_prove_verify_hasher_driven(self):
        """Hasher-driven multi-compression prove (reference
        blake3.rs:2216-2340): a 2-block message's chained compressions are
        proven by the full 10-circuit system and the digest-carrying claims
        verify; tampering any claim's output word is rejected."""
        config = make_config()
        system, key = System.new(config, blake3_system_inputs(limb_bits=4))
        data = b"multi-compression flagship workload: two blocks of input!" * 2
        digest, traces, claims = blake3_hasher_witness(data, limb_bits=4)
        assert digest == blake3_hash(data) and len(claims) >= 2
        witness = SystemWitness.from_stage_1(traces, system, key)
        proof = prove_multiple_claims(system, key, witness, claims)
        verify_multiple_claims(system, claims, proof)

        bad = [list(c) for c in claims]
        bad[-1][-1] ^= 1  # tamper the root compression's output
        with pytest.raises(VerificationError):
            verify_multiple_claims(system, bad, proof)
