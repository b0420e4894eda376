"""End-to-end with cross-circuit lookups, claims, preprocessed tables, and
sparse activation (mirrors reference lookup.rs:1043-1130 + u32_add e2e)."""

import numpy as np
import pytest

from multistark_tpu import expr as ex
from multistark_tpu.config import CommitmentParameters, FriParameters
from multistark_tpu.configs import GoldilocksBlake3Config
from multistark_tpu.errors import VerificationError
from multistark_tpu.prover import prove_multiple_claims
from multistark_tpu.system import CircuitInputs, System, SystemWitness
from multistark_tpu.verifier import verify_multiple_claims

SQUARE_CHAN = 1
CLAIM_CHAN = 2


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


def square_table_inputs(n=8):
    """Preprocessed table of (x, x^2); main = one multiplicity column that
    PULLs (SQUARE_CHAN, x, x^2)."""
    table = np.asarray([[x, x * x] for x in range(n)], np.uint64)
    return CircuitInputs(
        main_width=1,
        constraints=[],
        ext_constraints=[],
        lookups=[
            ex.Lookup.pull(ex.main(0), [ex.Const(SQUARE_CHAN), ex.preprocessed(0), ex.preprocessed(1)])
        ],
        preprocessed=table,
    )


def square_user_inputs():
    """Main (x, y): PUSH (SQUARE_CHAN, x, y) proving y = x^2 via the table,
    and PULL (CLAIM_CHAN, x, y) consuming one externally pushed claim per row."""
    return CircuitInputs(
        main_width=2,
        constraints=[],
        ext_constraints=[],
        lookups=[
            ex.Lookup.push(ex.Const(1), [ex.Const(SQUARE_CHAN), ex.main(0), ex.main(1)]),
            ex.Lookup.pull(ex.Const(1), [ex.Const(CLAIM_CHAN), ex.main(0), ex.main(1)]),
        ],
    )


def unused_circuit_inputs():
    return CircuitInputs(
        main_width=1, constraints=[ex.main(0) * ex.main(0) - ex.main(0)],
        ext_constraints=[], lookups=[],
    )


def build(xs=(3, 5, 2, 3)):
    config = make_config()
    system, key = System.new(
        config, [square_table_inputs(), square_user_inputs(), unused_circuit_inputs()]
    )
    user = np.asarray([[x, x * x] for x in xs], np.uint64)
    mult = np.zeros(8, np.uint64)
    for x in xs:
        mult[x] += 1
    table_main = mult.reshape(8, 1)
    empty = np.zeros((0, 1), np.uint64)
    witness = SystemWitness.from_stage_1([table_main, user, empty], system, key)
    claims = [[CLAIM_CHAN, x, x * x] for x in xs]
    return config, system, key, witness, claims


class TestLookupE2E:
    def test_roundtrip_with_claims_and_sparse_activation(self):
        config, system, key, witness, claims = build()
        proof = prove_multiple_claims(system, key, witness, claims)
        assert proof.active == [True, True, False]
        verify_multiple_claims(system, claims, proof)

    def test_wrong_claim_rejected(self):
        config, system, key, witness, claims = build()
        proof = prove_multiple_claims(system, key, witness, claims)
        bad = [list(c) for c in claims]
        bad[0][2] = 10  # 3^2 != 10
        with pytest.raises(VerificationError):
            verify_multiple_claims(system, bad, proof)

    def test_claim_regrouping_rejected(self):
        """Length prefixing binds claim boundaries (reference
        lookup.rs:1117-1130)."""
        config, system, key, witness, claims = build()
        proof = prove_multiple_claims(system, key, witness, claims)
        regrouped = [claims[0] + claims[1]] + [list(c) for c in claims[2:]]
        with pytest.raises(VerificationError):
            verify_multiple_claims(system, regrouped, proof)

    def test_tampered_multiplicity_unbalances(self):
        config, system, key, witness, claims = build()
        # prove with a forged table multiplicity: accumulator cannot close
        bad_mult = np.zeros(8, np.uint64)
        bad_mult[3] = 1  # wrong counts
        empty = np.zeros((0, 1), np.uint64)
        user = np.asarray([[x, x * x] for x in (3, 5, 2, 3)], np.uint64)
        bad_witness = SystemWitness.from_stage_1(
            [bad_mult.reshape(8, 1), user, empty], system, key
        )
        proof = prove_multiple_claims(system, key, bad_witness, claims)
        with pytest.raises(VerificationError):
            verify_multiple_claims(system, claims, proof)

    def test_deactivating_needed_circuit_rejected(self):
        """Dropping the table circuit leaves the channel unbalanced
        (reference lookup.rs:1056-1115)."""
        config, system, key, witness, claims = build()
        empty1 = np.zeros((0, 1), np.uint64)
        user = np.asarray([[x, x * x] for x in (3, 5, 2, 3)], np.uint64)
        w2 = SystemWitness.from_stage_1([empty1, user, empty1], system, key)
        proof = prove_multiple_claims(system, key, w2, claims)
        with pytest.raises(VerificationError):
            verify_multiple_claims(system, claims, proof)

    def test_bitmap_tampering_rejected(self):
        config, system, key, witness, claims = build()
        proof = prove_multiple_claims(system, key, witness, claims)
        proof.active = [True, True, True]
        with pytest.raises(VerificationError):
            verify_multiple_claims(system, claims, proof)
