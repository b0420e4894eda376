"""End-to-end prove/verify of a circuit with USER ext_constraints, covering
the ExtExpr -> coordinate-roots compile path (Karatsuba D=2 expansion,
reference src/graph.rs:442-506) through a full proof — the reference routes
all logUp machinery through the same expansion; here the direct logUp
evaluation bypasses it in production, so this test is the protocol-level
coverage of compiled ext constraints."""

import numpy as np
import pytest

from multistark_tpu import expr as ex
from multistark_tpu.config import CommitmentParameters, FriParameters
from multistark_tpu.configs import GoldilocksBlake3Config
from multistark_tpu.errors import VerificationError
from multistark_tpu.fields.host import GOLDILOCKS as F, GOLDILOCKS_EXT2 as E2
from multistark_tpu.prover import prove_multiple_claims
from multistark_tpu.system import CircuitInputs, System, SystemWitness
from multistark_tpu.verifier import verify_multiple_claims

RNG = np.random.default_rng(41)


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


def ext_mul_inputs():
    """A·B = C over the degree-2 extension, on 6 base columns
    (a0,a1,b0,b1,c0,c1): one genuine ExtExpr constraint whose compiled
    coordinate expansion exercises the Karatsuba D=2 path."""
    A = ex.ExtCoords((ex.main(0), ex.main(1)))
    B = ex.ExtCoords((ex.main(2), ex.main(3)))
    C = ex.ExtCoords((ex.main(4), ex.main(5)))
    return CircuitInputs(
        main_width=6,
        constraints=[],
        ext_constraints=[A * B - C],
        lookups=[],
    )


def ext_mul_trace(n):
    rows = []
    for _ in range(n):
        a = tuple(int(v) for v in RNG.integers(0, F.p, size=2, dtype=np.uint64))
        b = tuple(int(v) for v in RNG.integers(0, F.p, size=2, dtype=np.uint64))
        c = E2.mul(a, b)
        rows.append([a[0], a[1], b[0], b[1], c[0], c[1]])
    return np.asarray(rows, np.uint64)


def ext_transition_inputs():
    """X_next = X·X + 1 (ext square map) across transitions: exercises
    ext constraints with next-row windows."""
    X = ex.ExtCoords((ex.main(0), ex.main(1)))
    Xn = ex.ExtCoords((ex.main_next(0), ex.main_next(1)))
    t = ex.ExtBase(ex.IsTransition())
    return CircuitInputs(
        main_width=2,
        constraints=[],
        ext_constraints=[t * (Xn - (X * X + ex.ExtBase(ex.Const(1))))],
        lookups=[],
    )


def ext_transition_trace(n):
    x = (3, 5)
    rows = []
    for _ in range(n):
        rows.append([x[0], x[1]])
        x = E2.add(E2.mul(x, x), E2.one)
    return np.asarray(rows, np.uint64)


class TestExtConstraintsE2E:
    def test_ext_mul_proves_and_verifies(self):
        config = make_config()
        system, key = System.new(config, [ext_mul_inputs()])
        traces = [ext_mul_trace(16)]
        witness = SystemWitness.from_stage_1(traces, system, key)
        proof = prove_multiple_claims(system, key, witness, [])
        verify_multiple_claims(system, [], proof)

    def test_ext_transition_proves_and_verifies(self):
        config = make_config()
        system, key = System.new(config, [ext_transition_inputs()])
        traces = [ext_transition_trace(16)]
        witness = SystemWitness.from_stage_1(traces, system, key)
        proof = prove_multiple_claims(system, key, witness, [])
        verify_multiple_claims(system, [], proof)

    def test_ext_mul_bad_witness_rejected(self):
        config = make_config()
        system, key = System.new(config, [ext_mul_inputs()])
        trace = ext_mul_trace(16)
        trace[3, 4] = (trace[3, 4] + 1) % F.p  # break one product coordinate
        witness = SystemWitness.from_stage_1([trace], system, key)
        proof = prove_multiple_claims(system, key, witness, [])
        with pytest.raises(VerificationError):
            verify_multiple_claims(system, [], proof)
