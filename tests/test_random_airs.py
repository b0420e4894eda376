"""Property test: randomly generated AIRs prove and verify, and a tampered
trace cell is rejected.  Goes beyond the reference's fixed-circuit tests:
each case builds a random constraint system that holds by construction —
derived columns are random low-degree expressions of earlier columns (same
row or, gated by when_transition, the previous row) — so any prover/
compiler/evaluator disagreement about expression semantics surfaces as a
failed proof."""

import numpy as np
import pytest

from multistark_tpu import expr as ex
from multistark_tpu.config import CommitmentParameters, FriParameters
from multistark_tpu.configs import GoldilocksBlake3Config
from multistark_tpu.errors import VerificationError
from multistark_tpu.fields.host import GOLDILOCKS as F
from multistark_tpu.system import CircuitInputs, System, SystemWitness

LOG_N = 4
N = 1 << LOG_N


def random_air(seed: int):
    """(CircuitInputs, trace) with constraints that hold by construction."""
    rng = np.random.default_rng(seed)
    n_inputs = int(rng.integers(2, 5))
    n_derived = int(rng.integers(2, 6))
    width = n_inputs + n_derived
    cols = [rng.integers(0, F.p, N, dtype=np.uint64) for _ in range(n_inputs)]
    constraints = []

    def randv(j):  # value column j at row i (vectorized host math)
        return cols[j].astype(object)

    for d in range(n_derived):
        j = n_inputs + d
        kind = rng.integers(0, 3)
        a, b = rng.integers(0, j, 2)
        ca, cb = (int(v) for v in rng.integers(1, F.p, 2, dtype=np.uint64))
        if kind == 0:
            # same-row quadratic: col_j = ca·col_a·col_b + cb·col_a
            vals = (ca * randv(a) * randv(b) + cb * randv(a)) % F.p
            expr = ex.Const(ca) * ex.main(a) * ex.main(b) + ex.Const(cb) * ex.main(a)
            constraints.append(expr - ex.main(j))
        elif kind == 1:
            # same-row affine: col_j = ca·col_a + cb·col_b
            vals = (ca * randv(a) + cb * randv(b)) % F.p
            expr = ex.Const(ca) * ex.main(a) + ex.Const(cb) * ex.main(b)
            constraints.append(expr - ex.main(j))
        else:
            # transition: col_j[i+1] = ca·col_a[i] + cb·col_j[i], col_j[0] = 1
            vals_obj = np.empty(N, dtype=object)
            vals_obj[0] = 1
            prev_a = randv(a)
            for i in range(1, N):
                vals_obj[i] = (ca * prev_a[i - 1] + cb * vals_obj[i - 1]) % F.p
            vals = vals_obj
            step = ex.Const(ca) * ex.main(a) + ex.Const(cb) * ex.main(j)
            constraints.append(ex.IsTransition() * (ex.main_next(j) - step))
            constraints.append(ex.IsFirstRow() * (ex.main(j) - ex.Const(1)))
        cols.append(np.asarray(vals, dtype=np.uint64))

    trace = np.stack(cols, axis=1)
    return CircuitInputs(width, constraints, [], []), trace


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_random_air_roundtrip_and_tamper(seed):
    config = GoldilocksBlake3Config(
        CommitmentParameters(log_blowup=2, cap_height=0),
        FriParameters(0, 1, 4, 1, 1),
    )
    inputs, trace = random_air(seed)
    system, key = System.new(config, [inputs])
    witness = SystemWitness.from_stage_1([trace], system, key)
    proof = system.prove(key, witness)
    system.verify(proof)

    rng = np.random.default_rng(seed + 1000)
    bad = trace.copy()
    i, j = int(rng.integers(0, N)), int(rng.integers(0, trace.shape[1]))
    bad[i, j] = (int(bad[i, j]) + 1) % F.p
    bad_witness = SystemWitness.from_stage_1([bad], system, key)
    with pytest.raises(VerificationError):
        bad_proof = system.prove(key, bad_witness)
        system.verify(bad_proof)
