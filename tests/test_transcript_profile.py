"""TranscriptProfile seam (config.TranscriptProfile): every knob that
parameterizes a cross-implementation convention must (a) round-trip
prove/verify/serialize under its NON-default setting, and (b) actually
change the artifact it claims to control — so that matching p3 when Rust
fixtures arrive is a parameter change, not surgery (VERDICT r4 missing #1;
reference conventions at src/prover.rs:241-255, src/types.rs:225-320,
src/test_circuits/baby_bear_config.rs:15-31)."""

import numpy as np
import pytest

from multistark_tpu import expr as ex
from multistark_tpu.config import (
    CommitmentParameters, FriParameters, TranscriptProfile,
)
from multistark_tpu.configs import GoldilocksBlake3Config
from multistark_tpu.prover import Proof, prove_multiple_claims
from multistark_tpu.system import CircuitInputs, System, SystemWitness
from multistark_tpu.verifier import verify_multiple_claims

FRI = FriParameters(
    log_final_poly_len=0, max_log_arity=1, num_queries=6,
    commit_proof_of_work_bits=1, query_proof_of_work_bits=1,
)


def _prove(profile):
    config = GoldilocksBlake3Config(
        CommitmentParameters(log_blowup=2, cap_height=0), FRI,
        transcript_profile=profile,
    )
    a, b, c = ex.main(0), ex.main(1), ex.main(2)
    inputs = CircuitInputs(
        main_width=3, constraints=[a * a + b * b - c * c],
        ext_constraints=[], lookups=[],
    )
    system, key = System.new(config, [inputs])
    trace = np.asarray([(3, 4, 5), (6, 8, 10)] * 8, np.uint64)
    witness = SystemWitness.from_stage_1([trace], system, key)
    proof = prove_multiple_claims(system, key, witness, [])
    verify_multiple_claims(system, [], proof)
    return config, system, proof


def test_default_profile_is_attached():
    config, _, _ = _prove(None)
    p = config.transcript_profile
    assert p.fri_observe_claims_before_alpha is True
    assert p.commit_pow_witness_placement == "after_commits"


def test_fri_alpha_ordering_knob_changes_transcript():
    _, _, base = _prove(None)
    _, _, p3_order = _prove(TranscriptProfile(fri_observe_claims_before_alpha=False))
    # α now differs => different query indices / folds => different FRI proof
    assert (
        base.fri_proof.commit_caps[0].tobytes()
        != p3_order.fri_proof.commit_caps[0].tobytes()
    )


@pytest.mark.parametrize(
    "placement", ["after_commits", "before_pow_witness", "after_pow_witness"]
)
def test_pow_placement_roundtrip(placement):
    profile = TranscriptProfile(commit_pow_witness_placement=placement)
    config, system, proof = _prove(profile)
    data = proof.to_bytes(config)
    back = Proof.from_bytes(data, system)
    assert back.fri_proof.commit_pow_witnesses == proof.fri_proof.commit_pow_witnesses
    assert back.to_bytes(config) == data
    verify_multiple_claims(system, [], back)


def test_pow_placement_changes_layout():
    base_profile = TranscriptProfile()
    moved_profile = TranscriptProfile(commit_pow_witness_placement="after_pow_witness")
    config, system, proof = _prove(base_profile)
    base_bytes = proof.to_bytes(config)
    config2 = GoldilocksBlake3Config(
        CommitmentParameters(log_blowup=2, cap_height=0), FRI,
        transcript_profile=moved_profile,
    )
    moved_bytes = proof.to_bytes(config2)
    assert len(base_bytes) == len(moved_bytes)  # same fields, different order
    assert base_bytes != moved_bytes


def test_duplex_bytes_convention_changes_seed():
    from multistark_tpu.challenger import DuplexChallenger
    from multistark_tpu.fields.host import BABYBEAR, BABYBEAR_EXT4
    from multistark_tpu.hash.poseidon2 import permute

    a = DuplexChallenger(BABYBEAR, BABYBEAR_EXT4, permute, "field_per_byte")
    b = DuplexChallenger(BABYBEAR, BABYBEAR_EXT4, permute, "packed_u32_le")
    a.observe_bytes(b"multi-stark/v0")
    b.observe_bytes(b"multi-stark/v0")
    assert a.sample_field() != b.sample_field()
    # clone preserves the convention
    c = b.clone()
    assert c.bytes_convention == "packed_u32_le"


_P2_SCRIPT = r"""
import sys
sys.path.insert(0, {root!r})
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from multistark_tpu import expr as ex
from multistark_tpu.config import CommitmentParameters, FriParameters, TranscriptProfile
from multistark_tpu.configs import BabyBearPoseidon2Config
from multistark_tpu.hash import poseidon2 as p2
from multistark_tpu.prover import prove_multiple_claims
from multistark_tpu.system import CircuitInputs, System, SystemWitness
from multistark_tpu.verifier import verify_multiple_claims

orig = (
    [list(r) for r in p2.CONSTANTS["external"]],
    list(p2.CONSTANTS["internal"]),
    list(p2.CONSTANTS["diag"]),
)
injected = ([row[1:] + row[:1] for row in orig[0]], orig[1][::-1], orig[2])
profile = TranscriptProfile(poseidon2_constants=injected)
config = BabyBearPoseidon2Config(
    CommitmentParameters(log_blowup=2, cap_height=0),
    FriParameters(log_final_poly_len=0, max_log_arity=1, num_queries=6,
                  commit_proof_of_work_bits=1, query_proof_of_work_bits=1),
    transcript_profile=profile,
)
assert p2.CONSTANTS["internal"] == injected[1]
a, b = ex.main(0), ex.main(1)
inputs = CircuitInputs(main_width=2, constraints=[a * a - b], ext_constraints=[], lookups=[])
system, key = System.new(config, [inputs])
x = np.arange(1, 17, dtype=np.uint64)
trace = np.stack([x, x * x], axis=1)
witness = SystemWitness.from_stage_1([trace], system, key)
proof = prove_multiple_claims(system, key, witness, [])
verify_multiple_claims(system, [], proof)
print("P2_INJECT_OK")
"""


def test_poseidon2_constants_injection_roundtrip():
    """Injected constants flow through host permute + device hasher and the
    BabyBear config still proves/verifies.  Runs in a SUBPROCESS: the seam
    is a module-global applied before any hasher/kernel construction
    (install_constants docstring), so a process that already proved with
    the self-derived constants holds stale kernel-cache closures."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", _P2_SCRIPT.format(root=root)],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "P2_INJECT_OK" in out.stdout
