"""FRI PCS round-trip: commit/open/verify + adversarial tampering
(the pcs_example journey, reference examples/pcs_example.rs)."""

import numpy as np
import pytest

from multistark_tpu.challenger import SerializingChallenger64
from multistark_tpu.config import CommitmentParameters, FriParameters
from multistark_tpu.errors import VerificationError
from multistark_tpu.fields.device import GL2_OPS, GL_OPS
from multistark_tpu.fields.host import GOLDILOCKS, GOLDILOCKS_EXT2
from multistark_tpu.merkle import Blake3FieldHasher
from multistark_tpu.ntt import get_engine
from multistark_tpu.pcs import TwoAdicFriPcs

F, E = GOLDILOCKS, GOLDILOCKS_EXT2
RNG = np.random.default_rng(77)


def make_pcs(log_blowup=2, queries=8, pow_bits=2):
    return TwoAdicFriPcs(
        GL_OPS,
        GL2_OPS,
        F,
        E,
        Blake3FieldHasher(GL_OPS),
        CommitmentParameters(log_blowup=log_blowup, cap_height=0),
        FriParameters(
            log_final_poly_len=0,
            max_log_arity=1,
            num_queries=queries,
            commit_proof_of_work_bits=pow_bits,
            query_proof_of_work_bits=pow_bits,
        ),
    )


def new_ch(tag=b"pcs-test"):
    ch = SerializingChallenger64(F, E)
    ch.observe_bytes(tag)
    return ch


def host_eval(coeffs_row, z):
    acc = E.zero
    for c in reversed(coeffs_row):
        acc = E.add(E.mul(acc, z), E.from_base(int(c)))
    return acc


def rand_ext():
    return tuple(int(x) for x in RNG.integers(0, F.p, 2, dtype=np.uint64))


class TestPcsRoundTrip:
    def _setup(self):
        pcs = make_pcs()
        eng = get_engine(GL_OPS)
        coeffs0 = RNG.integers(0, F.p, size=(3, 16), dtype=np.uint64)
        coeffs1 = RNG.integers(0, F.p, size=(2, 8), dtype=np.uint64)
        d0 = pcs.natural_domain_for_degree(16)
        d1 = pcs.natural_domain_for_degree(8)
        evals0 = eng.dft_natural(GL_OPS.from_np(coeffs0), 4)
        evals1 = eng.dft_natural(GL_OPS.from_np(coeffs1), 3)
        cap, data = pcs.commit([(d0, evals0), (d1, evals1)])
        return pcs, cap, data, coeffs0, coeffs1, d1

    def test_open_verify_and_values(self):
        pcs, cap, data, coeffs0, coeffs1, d1 = self._setup()
        zeta = rand_ext()
        zeta_next = E.scale(zeta, d1.gen)
        points = [[zeta], [zeta, zeta_next]]

        ch = new_ch()
        ch.observe_commitment(cap)
        opened, proof = pcs.open([(data, points)], ch)

        # claimed values match host Horner evaluation of the committed polys
        for j in range(3):
            assert opened[0][0][0][j] == host_eval(coeffs0[j], zeta)
        for j in range(2):
            assert opened[0][1][0][j] == host_eval(coeffs1[j], zeta)
            assert opened[0][1][1][j] == host_eval(coeffs1[j], zeta_next)

        vch = new_ch()
        vch.observe_commitment(cap)
        rounds = [
            (
                cap,
                [
                    (4, 3, [(zeta, opened[0][0][0])]),
                    (3, 2, [(zeta, opened[0][1][0]), (zeta_next, opened[0][1][1])]),
                ],
            )
        ]
        pcs.verify(rounds, proof, vch)  # must not raise

    def test_tampered_value_rejected(self):
        pcs, cap, data, coeffs0, coeffs1, d1 = self._setup()
        zeta = rand_ext()
        ch = new_ch()
        ch.observe_commitment(cap)
        opened, proof = pcs.open([(data, [[zeta], [zeta]])], ch)
        bad = list(opened[0][0][0])
        bad[1] = E.add(bad[1], E.one)
        vch = new_ch()
        vch.observe_commitment(cap)
        rounds = [(cap, [(4, 3, [(zeta, bad)]), (3, 2, [(zeta, opened[0][1][0])])])]
        with pytest.raises(VerificationError):
            pcs.verify(rounds, proof, vch)

    def test_tampered_final_poly_rejected(self):
        pcs, cap, data, coeffs0, coeffs1, d1 = self._setup()
        zeta = rand_ext()
        ch = new_ch()
        ch.observe_commitment(cap)
        opened, proof = pcs.open([(data, [[zeta], [zeta]])], ch)
        proof.final_poly = [E.add(proof.final_poly[0], E.one)]
        vch = new_ch()
        vch.observe_commitment(cap)
        rounds = [(cap, [(4, 3, [(zeta, opened[0][0][0])]), (3, 2, [(zeta, opened[0][1][0])])])]
        with pytest.raises(VerificationError):
            pcs.verify(rounds, proof, vch)

    def test_wrong_transcript_rejected(self):
        pcs, cap, data, coeffs0, coeffs1, d1 = self._setup()
        zeta = rand_ext()
        ch = new_ch()
        ch.observe_commitment(cap)
        opened, proof = pcs.open([(data, [[zeta], [zeta]])], ch)
        vch = new_ch(b"other-seed")
        vch.observe_commitment(cap)
        rounds = [(cap, [(4, 3, [(zeta, opened[0][0][0])]), (3, 2, [(zeta, opened[0][1][0])])])]
        with pytest.raises(VerificationError):
            pcs.verify(rounds, proof, vch)

    def test_empty_points_matrix(self):
        """A matrix opened at no points (inactive preprocessed case)."""
        pcs, cap, data, coeffs0, coeffs1, d1 = self._setup()
        zeta = rand_ext()
        ch = new_ch()
        ch.observe_commitment(cap)
        opened, proof = pcs.open([(data, [[], [zeta]])], ch)
        assert opened[0][0] == []
        vch = new_ch()
        vch.observe_commitment(cap)
        rounds = [(cap, [(4, 3, []), (3, 2, [(zeta, opened[0][1][0])])])]
        pcs.verify(rounds, proof, vch)


class TestHigherArity:
    def test_arity_8_roundtrip_and_tamper(self):
        pcs = TwoAdicFriPcs(
            GL_OPS, GL2_OPS, F, E, Blake3FieldHasher(GL_OPS),
            CommitmentParameters(log_blowup=2, cap_height=0),
            FriParameters(log_final_poly_len=0, max_log_arity=3, num_queries=8,
                          commit_proof_of_work_bits=2, query_proof_of_work_bits=2),
        )
        eng = get_engine(GL_OPS)
        coeffs0 = RNG.integers(0, F.p, size=(3, 64), dtype=np.uint64)
        coeffs1 = RNG.integers(0, F.p, size=(2, 8), dtype=np.uint64)
        d0 = pcs.natural_domain_for_degree(64)
        d1 = pcs.natural_domain_for_degree(8)
        evals0 = eng.dft_natural(GL_OPS.from_np(coeffs0), 6)
        evals1 = eng.dft_natural(GL_OPS.from_np(coeffs1), 3)
        cap, data = pcs.commit([(d0, evals0), (d1, evals1)])
        zeta = rand_ext()
        ch = new_ch()
        ch.observe_commitment(cap)
        opened, proof = pcs.open([(data, [[zeta], [zeta]])], ch)
        for j in range(3):
            assert opened[0][0][0][j] == host_eval(coeffs0[j], zeta)
        # mixed arities: 8->5 capped by the height-5 input (8-row matrix)
        vch = new_ch()
        vch.observe_commitment(cap)
        rounds = [(cap, [(6, 3, [(zeta, opened[0][0][0])]), (3, 2, [(zeta, opened[0][1][0])])])]
        pcs.verify(rounds, proof, vch)

        proof.final_poly = [E.add(proof.final_poly[0], E.one)]
        vch2 = new_ch()
        vch2.observe_commitment(cap)
        with pytest.raises(VerificationError):
            pcs.verify(rounds, proof, vch2)


class TestZeroFoldDegenerate:
    """Every opened matrix already at final-poly size: the arity schedule is
    EMPTY — no commit-phase trees, no betas; the final poly is the reduced
    opening itself.  Round-1 advisor finding: open() must not index
    schedule[0] here."""

    def _pcs(self):
        return TwoAdicFriPcs(
            GL_OPS, GL2_OPS, F, E, Blake3FieldHasher(GL_OPS),
            CommitmentParameters(log_blowup=2, cap_height=0),
            FriParameters(
                log_final_poly_len=3, max_log_arity=1, num_queries=4,
                commit_proof_of_work_bits=1, query_proof_of_work_bits=1,
            ),
        )

    def test_roundtrip_and_tamper(self):
        pcs = self._pcs()
        eng = get_engine(GL_OPS)
        coeffs = RNG.integers(0, F.p, size=(2, 8), dtype=np.uint64)
        d = pcs.natural_domain_for_degree(8)  # log_max_ro = 3+2 = final size
        evals = eng.dft_natural(GL_OPS.from_np(coeffs), 3)
        cap, data = pcs.commit([(d, evals)])
        zeta = rand_ext()
        ch = new_ch()
        ch.observe_commitment(cap)
        opened, proof = pcs.open([(data, [[zeta]])], ch)
        assert proof.commit_caps == [] and proof.commit_pow_witnesses == []
        assert len(proof.final_poly) == 8
        for j in range(2):
            assert opened[0][0][0][j] == host_eval(coeffs[j], zeta)

        rounds = [(cap, [(3, 2, [(zeta, opened[0][0][0])])])]
        vch = new_ch()
        vch.observe_commitment(cap)
        pcs.verify(rounds, proof, vch)  # must not raise

        bad = proof
        orig = bad.final_poly[2]
        bad.final_poly[2] = E.add(orig, E.one)
        vch = new_ch()
        vch.observe_commitment(cap)
        with pytest.raises(VerificationError):
            pcs.verify(rounds, bad, vch)
        bad.final_poly[2] = orig


class TestPowTampering:
    """Grinding witnesses are transcript-bound: corrupting either the
    commit-phase or the query-phase PoW witness must be rejected
    (reference src/types.rs:43-81 DeterministicPow + verifier checks)."""

    def _proved(self):
        pcs = make_pcs(queries=4, pow_bits=4)
        eng = get_engine(GL_OPS)
        coeffs = RNG.integers(0, F.p, size=(2, 16), dtype=np.uint64)
        d = pcs.natural_domain_for_degree(16)
        cap, data = pcs.commit([(d, eng.dft_natural(GL_OPS.from_np(coeffs), 4))])
        zeta = rand_ext()
        ch = new_ch()
        ch.observe_commitment(cap)
        opened, proof = pcs.open([(data, [[zeta]])], ch)
        rounds = [(cap, [(4, 2, [(zeta, opened[0][0][0])])])]
        return pcs, rounds, proof

    def _verify(self, pcs, rounds, proof):
        vch = new_ch()
        vch.observe_commitment(rounds[0][0])
        pcs.verify(rounds, proof, vch)

    def test_valid_accepts(self):
        pcs, rounds, proof = self._proved()
        self._verify(pcs, rounds, proof)

    def test_commit_pow_tamper_rejected(self):
        pcs, rounds, proof = self._proved()
        orig = proof.commit_pow_witnesses[0]
        proof.commit_pow_witnesses[0] = orig + 1
        with pytest.raises(VerificationError):
            self._verify(pcs, rounds, proof)
        proof.commit_pow_witnesses[0] = orig

    def test_query_pow_tamper_rejected(self):
        pcs, rounds, proof = self._proved()
        proof.query_pow_witness += 1
        with pytest.raises(VerificationError):
            self._verify(pcs, rounds, proof)
