"""BabyBear/Poseidon2/degree-4 genericity smoke test (mirror of reference
src/test_circuits/baby_bear_config.rs:129-203): a MulAir circuit plus a
self-canceling push/pull pair proves and verifies, and tampering is
rejected — on a config differing from production on BOTH axes."""

import numpy as np
import pytest

from multistark_tpu import expr as ex
from multistark_tpu.config import CommitmentParameters, FriParameters
from multistark_tpu.configs.babybear_poseidon2 import BabyBearPoseidon2Config
from multistark_tpu.errors import VerificationError
from multistark_tpu.fields.device import BB_OPS
from multistark_tpu.fields.host import BABYBEAR
from multistark_tpu.hash import poseidon2
from multistark_tpu.prover import prove_multiple_claims
from multistark_tpu.system import CircuitInputs, System, SystemWitness
from multistark_tpu.verifier import verify_multiple_claims

RNG = np.random.default_rng(88)


class TestPoseidon2:
    def test_host_device_permutation_match(self):
        state_np = RNG.integers(0, BABYBEAR.p, (16, 5), dtype=np.uint64)
        dev_state = [BB_OPS.from_np(state_np[i]) for i in range(16)]
        perm = poseidon2.Poseidon2Device(BB_OPS)
        out = perm.permute(dev_state)
        out_np = np.stack([BB_OPS.to_np(o) for o in out])  # (16, 5)
        for lane in range(5):
            want = poseidon2.permute([int(state_np[i, lane]) for i in range(16)])
            np.testing.assert_array_equal(out_np[:, lane], np.asarray(want, np.uint64))

    def test_hasher_device_matches_host(self):
        h = poseidon2.Poseidon2FieldHasher(BB_OPS)
        m = RNG.integers(0, BABYBEAR.p, (3, 4), dtype=np.uint64)
        dmat = BB_OPS.from_np(m)
        from multistark_tpu.merkle import digest_planes_to_np

        got = digest_planes_to_np(h.hash_matrices([dmat]))  # (4, 8)
        for i in range(4):
            want = h.host_hash_rows([m[:, i]])
            np.testing.assert_array_equal(got[i], want)
        planes = h.hash_matrices([dmat])  # (8, 4) words-major digests
        comp = digest_planes_to_np(h.compress(planes[:, :2], planes[:, 2:4]))
        for i in range(2):
            want = h.host_compress(got[i], got[2 + i])
            np.testing.assert_array_equal(comp[i], want)


def make_config():
    return BabyBearPoseidon2Config(
        CommitmentParameters(log_blowup=2, cap_height=0),
        FriParameters(
            log_final_poly_len=0,
            max_log_arity=1,
            num_queries=6,
            commit_proof_of_work_bits=1,
            query_proof_of_work_bits=1,
        ),
    )


def mul_air_inputs():
    """MulAir (a·b = c) with a self-canceling push/pull pair on one channel."""
    a, b, c = ex.main(0), ex.main(1), ex.main(2)
    return CircuitInputs(
        main_width=3,
        constraints=[a * b - c],
        ext_constraints=[],
        lookups=[
            ex.Lookup.push(ex.Const(1), [ex.Const(9), a, c]),
            ex.Lookup.pull(ex.Const(1), [ex.Const(9), a, c]),
        ],
    )


class TestBabyBearE2E:
    def test_roundtrip_and_tamper(self):
        config = make_config()
        system, key = System.new(config, [mul_air_inputs()])
        rows = []
        for _ in range(4):
            a = int(RNG.integers(1, BABYBEAR.p))
            b = int(RNG.integers(1, BABYBEAR.p))
            rows.append((a, b, a * b % BABYBEAR.p))
        trace = np.asarray(rows, np.uint64)
        witness = SystemWitness.from_stage_1([trace], system, key)
        proof = prove_multiple_claims(system, key, witness, [])
        verify_multiple_claims(system, [], proof)

        v = proof.stage1_opened[0][0][1]
        proof.stage1_opened[0][0][1] = tuple((c + 1) % BABYBEAR.p for c in v)
        with pytest.raises(VerificationError):
            verify_multiple_claims(system, [], proof)

    def test_bad_witness_rejected(self):
        config = make_config()
        system, key = System.new(config, [mul_air_inputs()])
        trace = np.asarray([(2, 3, 7), (2, 2, 4)], np.uint64)  # 2·3 != 7
        witness = SystemWitness.from_stage_1([trace], system, key)
        proof = prove_multiple_claims(system, key, witness, [])
        with pytest.raises(VerificationError):
            verify_multiple_claims(system, [], proof)
