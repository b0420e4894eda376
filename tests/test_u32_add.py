"""U32Add + ByteTable e2e (reference src/test_circuits/u32_add.rs:193-221)."""

import numpy as np
import pytest

from multistark_tpu.config import CommitmentParameters, FriParameters
from multistark_tpu.configs import GoldilocksBlake3Config
from multistark_tpu.errors import VerificationError
from multistark_tpu.prover import prove_multiple_claims
from multistark_tpu.system import System, SystemWitness
from multistark_tpu.test_circuits import u32_add_system_inputs, u32_add_witness
from multistark_tpu.verifier import verify_multiple_claims


def make_config():
    return GoldilocksBlake3Config(
        CommitmentParameters(log_blowup=2, cap_height=0),
        FriParameters(
            log_final_poly_len=0,
            max_log_arity=1,
            num_queries=6,
            commit_proof_of_work_bits=1,
            query_proof_of_work_bits=1,
        ),
    )


class TestU32Add:
    def test_roundtrip(self):
        config = make_config()
        system, key = System.new(config, u32_add_system_inputs())
        pairs = [(0xFFFFFFFF, 1), (123456789, 987654321), (0, 0), (1 << 31, 1 << 31)]
        traces, claims = u32_add_witness(pairs, 8)
        witness = SystemWitness.from_stage_1(traces, system, key)
        proof = prove_multiple_claims(system, key, witness, claims)
        verify_multiple_claims(system, claims, proof)

        # serialization round-trip (reference verifier.rs:802-826)
        data = proof.to_bytes()
        from multistark_tpu.prover import Proof

        proof2 = Proof.from_bytes(data, system)
        verify_multiple_claims(system, claims, proof2)
        assert proof2.to_bytes() == data

    def test_wrong_claim_rejected(self):
        config = make_config()
        system, key = System.new(config, u32_add_system_inputs())
        pairs = [(5, 7)]
        traces, claims = u32_add_witness(pairs, 4)
        witness = SystemWitness.from_stage_1(traces, system, key)
        proof = prove_multiple_claims(system, key, witness, claims)
        bad = [[claims[0][0], 5, 7, 13]]  # 5+7 != 13
        with pytest.raises(VerificationError):
            verify_multiple_claims(system, bad, proof)

    def test_forged_carry_rejected(self):
        config = make_config()
        system, key = System.new(config, u32_add_system_inputs())
        traces, claims = u32_add_witness([(10, 20)], 4)
        traces[0][0, 12] = 1  # wrong carry
        witness = SystemWitness.from_stage_1(traces, system, key)
        proof = prove_multiple_claims(system, key, witness, claims)
        with pytest.raises(VerificationError):
            verify_multiple_claims(system, claims, proof)
