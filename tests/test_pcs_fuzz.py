"""Adversarial fuzz at the verify level (VERDICT r4 task 8): mutate
structurally-valid Proof OBJECTS — opened rows, fold rows, Merkle paths,
caps, widths, counts, dtypes — and assert every mutant either still
verifies (mutation was a no-op) or fails with VerificationError from the
BATCHED verify paths: never an uncaught numpy/python exception.

This complements tests/test_serialization.py's byte-level fuzz (which
covers the decoder); here the mutants skip serialization entirely, hitting
the verifier's internal math paths directly — the reference's negative
tests operate at this level too (src/verifier.rs:852-912)."""

import copy

import numpy as np
import pytest

from multistark_tpu.config import CommitmentParameters, FriParameters
from multistark_tpu.configs import GoldilocksBlake3Config
from multistark_tpu.errors import VerificationError
from multistark_tpu.prover import prove_multiple_claims
from multistark_tpu.system import System, SystemWitness
from multistark_tpu.test_circuits import u32_add_system_inputs, u32_add_witness
from multistark_tpu.verifier import verify_multiple_claims

N_MUTANTS = 600
RNG = np.random.default_rng(0xF422)


@pytest.fixture(scope="module")
def proven():
    config = GoldilocksBlake3Config(
        CommitmentParameters(log_blowup=2, cap_height=1),
        FriParameters(
            log_final_poly_len=0, max_log_arity=2, num_queries=4,
            commit_proof_of_work_bits=1, query_proof_of_work_bits=1,
        ),
    )
    system, key = System.new(config, u32_add_system_inputs())
    n = 32
    xs = RNG.integers(0, 1 << 32, n, dtype=np.uint64)
    ys = RNG.integers(0, 1 << 32, n, dtype=np.uint64)
    traces, claims = u32_add_witness(list(zip(xs.tolist(), ys.tolist())), n)
    witness = SystemWitness.from_stage_1(traces, system, key)
    proof = prove_multiple_claims(system, key, witness, claims)
    verify_multiple_claims(system, claims, proof)
    return system, claims, proof


def _rand_field():
    return int(RNG.integers(0, np.iinfo(np.int64).max))


def _mutate_ext(v):
    v = list(v)
    k = int(RNG.integers(len(v)))
    v[k] = _rand_field()
    return tuple(v)


def _mutate(proof) -> str:
    """Apply ONE random structural mutation in place; returns a label."""
    fp = proof.fri_proof
    choice = int(RNG.integers(18))
    if choice == 0 and proof.intermediate_accumulators:
        i = int(RNG.integers(len(proof.intermediate_accumulators)))
        proof.intermediate_accumulators[i] = _mutate_ext(
            proof.intermediate_accumulators[i]
        )
        return "accumulator"
    if choice == 1:
        cap = proof.commitments.stage_1_trace.copy()
        cap[int(RNG.integers(cap.shape[0])), int(RNG.integers(cap.shape[1]))] ^= np.uint32(
            1 << int(RNG.integers(32))
        )
        proof.commitments.stage_1_trace = cap
        return "stage1 cap bitflip"
    if choice == 2 and fp.commit_caps:
        l = int(RNG.integers(len(fp.commit_caps)))
        cap = fp.commit_caps[l].copy()
        cap[int(RNG.integers(cap.shape[0]))] += np.uint32(1)
        fp.commit_caps[l] = cap
        return "fri cap stomp"
    if choice == 3 and fp.commit_pow_witnesses:
        l = int(RNG.integers(len(fp.commit_pow_witnesses)))
        fp.commit_pow_witnesses[l] ^= 1 << int(RNG.integers(20))
        return "commit pow"
    if choice == 4:
        fp.query_pow_witness ^= 1 << int(RNG.integers(20))
        return "query pow"
    if choice == 5 and fp.final_poly:
        i = int(RNG.integers(len(fp.final_poly)))
        fp.final_poly[i] = _mutate_ext(fp.final_poly[i])
        return "final poly"
    if choice == 6:
        fp.query_proofs.pop(int(RNG.integers(len(fp.query_proofs))))
        return "drop query"
    qp = fp.query_proofs[int(RNG.integers(len(fp.query_proofs)))]
    if choice == 7:
        op = qp.input_openings[int(RNG.integers(len(qp.input_openings)))]
        m = int(RNG.integers(len(op.opened_rows)))
        row = np.asarray(op.opened_rows[m], np.uint64).copy()
        if row.size:
            row[int(RNG.integers(row.size))] += np.uint64(1)
            op.opened_rows[m] = row
            return "opened row stomp"
        return "noop"
    if choice == 8:
        op = qp.input_openings[int(RNG.integers(len(qp.input_openings)))]
        m = int(RNG.integers(len(op.opened_rows)))
        row = np.asarray(op.opened_rows[m], np.uint64)
        k = int(RNG.integers(3))
        if k == 0 and row.size > 0:
            op.opened_rows[m] = row[:-1]  # truncate width
        elif k == 1:
            op.opened_rows[m] = np.concatenate([row, row[:1] if row.size else np.zeros(1, np.uint64)])
        else:
            # exact dtype change only: the verifier canonicalizes via
            # np.asarray(..., uint64), so this is a legitimate no-op
            op.opened_rows[m] = row.astype(np.float64)
            return "noop"
        return "opened row reshape"
    if choice == 9:
        op = qp.input_openings[int(RNG.integers(len(qp.input_openings)))]
        if op.path.shape[0]:
            path = op.path.copy()
            path[int(RNG.integers(path.shape[0])), int(RNG.integers(path.shape[1]))] ^= np.uint32(1)
            op.path = path
            return "path stomp"
        return "noop"
    if choice == 10:
        op = qp.input_openings[int(RNG.integers(len(qp.input_openings)))]
        op.path = op.path[:-1] if op.path.shape[0] else np.zeros((3, 8), np.uint32)
        return "path truncate"
    if choice == 11 and qp.commit_openings:
        l = int(RNG.integers(len(qp.commit_openings)))
        row, path = qp.commit_openings[l]
        row = np.asarray(row, np.uint64).copy()
        row[int(RNG.integers(row.size))] += np.uint64(1)
        qp.commit_openings[l] = (row, path)
        return "fold row stomp"
    if choice == 12 and qp.commit_openings:
        l = int(RNG.integers(len(qp.commit_openings)))
        row, path = qp.commit_openings[l]
        row = np.asarray(row, np.uint64)
        qp.commit_openings[l] = (row[: max(0, row.size - 2)], path)
        return "fold row truncate"
    if choice == 13 and qp.commit_openings:
        qp.commit_openings.pop(int(RNG.integers(len(qp.commit_openings))))
        return "drop fold level"
    if choice == 14:
        qp.input_openings.pop(int(RNG.integers(len(qp.input_openings))))
        return "drop round opening"
    if choice == 15:
        i = int(RNG.integers(len(proof.log_degrees)))
        new = int(RNG.integers(1, 30))
        while new == proof.log_degrees[i]:
            new = int(RNG.integers(1, 30))
        proof.log_degrees[i] = new
        return "log degree"
    if choice == 16 and proof.stage1_opened:
        m = int(RNG.integers(len(proof.stage1_opened)))
        if proof.stage1_opened[m]:
            p = int(RNG.integers(len(proof.stage1_opened[m])))
            if proof.stage1_opened[m][p]:
                c = int(RNG.integers(len(proof.stage1_opened[m][p])))
                proof.stage1_opened[m][p][c] = _mutate_ext(proof.stage1_opened[m][p][c])
                return "stage1 opened value"
        return "noop"
    if choice == 17 and proof.quotient_opened:
        m = int(RNG.integers(len(proof.quotient_opened)))
        if proof.quotient_opened[m] and proof.quotient_opened[m][0]:
            row = proof.quotient_opened[m][0]
            row.pop(int(RNG.integers(len(row))))
            return "quotient width"
        return "noop"
    return "noop"


def test_mutant_sweep(proven):
    """Every mutant must verify (no-op) or raise VerificationError —
    anything else (numpy ValueError, IndexError, ...) is a verifier bug."""
    system, claims, proof = proven
    outcomes = {"rejected": 0, "accepted": 0}
    for i in range(N_MUTANTS):
        mutant = copy.deepcopy(proof)
        label = _mutate(mutant)
        try:
            verify_multiple_claims(system, claims, mutant)
            # accepting is only legitimate for no-op mutations (e.g. a
            # stomp that landed on an unused zero or the label says noop)
            outcomes["accepted"] += 1
            assert label == "noop", f"mutant #{i} ({label}) verified"
        except VerificationError:
            outcomes["rejected"] += 1
        except Exception as e:  # noqa: BLE001 — the assertion under test
            raise AssertionError(
                f"mutant #{i} ({label}) leaked {type(e).__name__}: {e}"
            ) from e
    assert outcomes["rejected"] >= N_MUTANTS * 0.8
