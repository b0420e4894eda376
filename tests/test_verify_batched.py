"""The batched verifier (vectorized Merkle walks + all-queries-at-once
field arithmetic, pcs._verify_queries_batched) must agree exactly with the
per-query reference walk (pcs._verify_query): same accepts, same rejects,
for both the Goldilocks/Blake3 (D=2) and BabyBear/Poseidon2 (D=4) configs.
MULTISTARK_VERIFY_MODE=perquery forces the reference path."""

import os

import numpy as np
import pytest

from multistark_tpu import expr as ex
from multistark_tpu.config import CommitmentParameters, FriParameters
from multistark_tpu.configs import BabyBearPoseidon2Config, GoldilocksBlake3Config
from multistark_tpu.errors import VerificationError
from multistark_tpu.system import CircuitInputs, System, SystemWitness

RNG = np.random.default_rng(11)


def _mul_system(config, p):
    inputs = CircuitInputs(
        main_width=3,
        constraints=[ex.main(0) * ex.main(1) - ex.main(2)],
        ext_constraints=[],
        lookups=[],
    )
    system, key = System.new(config, [inputs])
    n = 32
    a = RNG.integers(0, 1 << 30, n, dtype=np.uint64)
    b = RNG.integers(0, 1 << 30, n, dtype=np.uint64)
    c = (a.astype(object) * b.astype(object)) % p
    trace = np.stack([a, b, np.asarray(c, np.uint64)], axis=1)
    witness = SystemWitness.from_stage_1([trace], system, key)
    return system, key, witness


def _fri():
    return FriParameters(
        log_final_poly_len=0,
        max_log_arity=2,  # exercises arity-4 fold blocks in the vector path
        num_queries=13,
        commit_proof_of_work_bits=1,
        query_proof_of_work_bits=1,
    )


@pytest.fixture(params=["goldilocks", "babybear"])
def proved(request):
    if request.param == "goldilocks":
        from multistark_tpu.fields.host import GOLDILOCKS as F

        config = GoldilocksBlake3Config(CommitmentParameters(2, 0), _fri())
    else:
        from multistark_tpu.fields.host import BABYBEAR as F

        config = BabyBearPoseidon2Config(CommitmentParameters(2, 0), _fri())
    system, key, witness = _mul_system(config, F.p)
    proof = system.prove(key, witness)
    return config, system, proof


def _set_mode(monkeypatch, mode):
    if mode is None:
        monkeypatch.delenv("MULTISTARK_VERIFY_MODE", raising=False)
    else:
        monkeypatch.setenv("MULTISTARK_VERIFY_MODE", mode)


class TestBatchedMatchesPerQuery:
    @pytest.mark.parametrize("mode", [None, "perquery"])
    def test_valid_proof_accepted(self, proved, monkeypatch, mode):
        config, system, proof = proved
        _set_mode(monkeypatch, mode)
        system.verify(proof)

    @pytest.mark.parametrize("mode", [None, "perquery"])
    def test_tampered_opened_value_rejected(self, proved, monkeypatch, mode):
        config, system, proof = proved
        _set_mode(monkeypatch, mode)
        blob = bytearray(proof.to_bytes(config))
        # flip a byte deep in the opened-values region (past the caps)
        blob[len(blob) // 2] ^= 1
        bad = type(proof).from_bytes(bytes(blob), system)
        with pytest.raises(VerificationError):
            system.verify(bad)

    @pytest.mark.parametrize("mode", [None, "perquery"])
    def test_truncated_rejected(self, proved, monkeypatch, mode):
        config, system, proof = proved
        _set_mode(monkeypatch, mode)
        blob = proof.to_bytes(config)
        with pytest.raises(VerificationError):
            type(proof).from_bytes(blob[: len(blob) - 8], system)
