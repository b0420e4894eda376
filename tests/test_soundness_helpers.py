"""Parameter-accounting helpers mirror the reference's soundness analysis
(verifier.rs:36-133): FRI query bits (conjectured vs Johnson), the
Schwartz-Zippel union bound, and the min() composition."""

from multistark_tpu.config import CommitmentParameters, FriParameters
from multistark_tpu.configs import GoldilocksBlake3Config


def test_fri_bits():
    fri = FriParameters.standard_fast()  # 100 queries, PoW 10
    assert fri.conjectured_fri_bits(2) == 2 * 100 + 10
    assert fri.proven_fri_bits(2) == 100 + 10
    assert fri.proven_fri_bits(2) < fri.conjectured_fri_bits(2)


def test_system_bound_production_config():
    c = GoldilocksBlake3Config(CommitmentParameters(2, 0), FriParameters.standard_fast())
    bits = c.soundness_bits(100, 16, 1 << 20)
    # |F_ext| ~ 2^128; SZ term ~ 128 - log2(2^20) ~ 108 dominates the
    # 210-bit FRI term
    assert 100 < bits < 128
    # proven regime is FRI-limited
    proven = c.soundness_bits(100, 16, 1 << 20, conjectured=False)
    assert proven <= bits
