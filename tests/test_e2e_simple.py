"""End-to-end prove/verify: multi-circuit, no lookups (mirror of reference
verifier.rs:783-826) + negative tests."""

import numpy as np
import pytest

from multistark_tpu import expr as ex
from multistark_tpu.config import CommitmentParameters, FriParameters
from multistark_tpu.configs import GoldilocksBlake3Config
from multistark_tpu.errors import VerificationError
from multistark_tpu.fields.host import GOLDILOCKS as F
from multistark_tpu.prover import prove_multiple_claims
from multistark_tpu.system import CircuitInputs, System, SystemWitness
from multistark_tpu.verifier import verify_multiple_claims

RNG = np.random.default_rng(33)


def make_config(log_blowup=2):
    return GoldilocksBlake3Config(
        CommitmentParameters(log_blowup=log_blowup, cap_height=0),
        FriParameters(
            log_final_poly_len=0,
            max_log_arity=1,
            num_queries=6,
            commit_proof_of_work_bits=1,
            query_proof_of_work_bits=1,
        ),
    )


def pythagorean_inputs():
    """a^2 + b^2 = c^2, width 3 (reference examples/simple_proof.rs:46-97)."""
    a, b, c = ex.main(0), ex.main(1), ex.main(2)
    return CircuitInputs(
        main_width=3,
        constraints=[a * a + b * b - c * c],
        ext_constraints=[],
        lookups=[],
    )


def pythagorean_trace(n):
    rows = []
    triples = [(3, 4, 5), (6, 8, 10), (5, 12, 13), (8, 15, 17)]
    for i in range(n):
        rows.append(triples[i % len(triples)])
    return np.asarray(rows, np.uint64)


def transition_inputs():
    """x_next = 2*x on transitions, width 1."""
    x, xn = ex.main(0), ex.main_next(0)
    return CircuitInputs(
        main_width=1,
        constraints=[ex.IsTransition() * (xn - 2 * x)],
        ext_constraints=[],
        lookups=[],
    )


def doubling_trace(n):
    return np.asarray([[pow(2, i, F.p)] for i in range(n)], np.uint64)


class TestSimpleE2E:
    def test_single_circuit_roundtrip(self):
        config = make_config()
        system, key = System.new(config, [pythagorean_inputs()])
        witness = SystemWitness.from_stage_1([pythagorean_trace(4)], system, key)
        proof = prove_multiple_claims(system, key, witness, [])
        verify_multiple_claims(system, [], proof)

    def test_two_circuits_different_heights(self):
        config = make_config()
        system, key = System.new(config, [pythagorean_inputs(), transition_inputs()])
        witness = SystemWitness.from_stage_1(
            [pythagorean_trace(4), doubling_trace(8)], system, key
        )
        proof = prove_multiple_claims(system, key, witness, [])
        verify_multiple_claims(system, [], proof)

    def test_invalid_witness_fails_ood(self):
        config = make_config()
        system, key = System.new(config, [pythagorean_inputs()])
        bad = pythagorean_trace(4)
        bad[2, 2] = 999  # not a pythagorean triple
        witness = SystemWitness.from_stage_1([bad], system, key)
        proof = prove_multiple_claims(system, key, witness, [])
        with pytest.raises(VerificationError):
            verify_multiple_claims(system, [], proof)

    def test_tampered_opened_value_rejected(self):
        config = make_config()
        system, key = System.new(config, [pythagorean_inputs()])
        witness = SystemWitness.from_stage_1([pythagorean_trace(4)], system, key)
        proof = prove_multiple_claims(system, key, witness, [])
        v = proof.stage1_opened[0][0][1]
        proof.stage1_opened[0][0][1] = ((v[0] + 1) % F.p, v[1])
        with pytest.raises(VerificationError):
            verify_multiple_claims(system, [], proof)

    def test_tampered_accumulator_rejected(self):
        config = make_config()
        system, key = System.new(config, [pythagorean_inputs()])
        witness = SystemWitness.from_stage_1([pythagorean_trace(4)], system, key)
        proof = prove_multiple_claims(system, key, witness, [])
        proof.intermediate_accumulators[-1] = (1, 0)
        with pytest.raises(VerificationError):
            verify_multiple_claims(system, [], proof)

    def test_truncated_log_degrees_rejected(self):
        config = make_config()
        system, key = System.new(config, [pythagorean_inputs()])
        witness = SystemWitness.from_stage_1([pythagorean_trace(4)], system, key)
        proof = prove_multiple_claims(system, key, witness, [])
        proof.log_degrees = []
        with pytest.raises(VerificationError):
            verify_multiple_claims(system, [], proof)

    def test_oversized_log_degree_rejected(self):
        config = make_config()
        system, key = System.new(config, [pythagorean_inputs()])
        witness = SystemWitness.from_stage_1([pythagorean_trace(4)], system, key)
        proof = prove_multiple_claims(system, key, witness, [])
        proof.log_degrees = [31]
        with pytest.raises(VerificationError):
            verify_multiple_claims(system, [], proof)


@pytest.mark.parametrize(
    "cap_height,max_log_arity,log_final_poly_len",
    [(2, 2, 2), (1, 3, 0), (2, 1, 1)],
)
def test_nondefault_fri_shapes_e2e(cap_height, max_log_arity, log_final_poly_len):
    """Full prove/verify + serialization round-trip + tamper rejection at
    cap_height > 0 and non-default arity / final-poly length — the
    reference parameter space (src/types.rs:171-197) beyond the bench
    defaults; previously covered only at the MMCS unit level (VERDICT r4
    weak #5 / task 7).  Uses the preprocessed+lookup u32_add system so
    every commitment round (preprocessed, stage 1, stage 2, quotient) goes
    through multi-row cap observation."""
    from multistark_tpu.prover import Proof
    from multistark_tpu.test_circuits import u32_add_system_inputs, u32_add_witness

    config = GoldilocksBlake3Config(
        CommitmentParameters(log_blowup=2, cap_height=cap_height),
        FriParameters(
            log_final_poly_len=log_final_poly_len,
            max_log_arity=max_log_arity,
            num_queries=6,
            commit_proof_of_work_bits=1,
            query_proof_of_work_bits=1,
        ),
    )
    system, key = System.new(config, u32_add_system_inputs())
    n = 64
    rng = np.random.default_rng(1234 + cap_height)
    xs = rng.integers(0, 1 << 32, n, dtype=np.uint64)
    ys = rng.integers(0, 1 << 32, n, dtype=np.uint64)
    traces, claims = u32_add_witness(list(zip(xs.tolist(), ys.tolist())), n)
    witness = SystemWitness.from_stage_1(traces, system, key)
    proof = prove_multiple_claims(system, key, witness, claims)
    # caps really are multi-row at cap_height > 0
    assert proof.commitments.stage_1_trace.shape[0] == 1 << cap_height
    verify_multiple_claims(system, claims, proof)
    data = proof.to_bytes(config)
    back = Proof.from_bytes(data, system)
    assert back.to_bytes(config) == data
    verify_multiple_claims(system, claims, back)
    # tamper one cap digest word: the transcript replay must reject
    back.commitments.stage_1_trace = back.commitments.stage_1_trace.copy()
    back.commitments.stage_1_trace[-1, 0] ^= 1
    with pytest.raises(VerificationError):
        verify_multiple_claims(system, claims, back)
