"""Test config on the second genericity axis: BabyBear + degree-4 extension,
Poseidon2-16 hashing, field-native duplex challenger — "to prove the
protocol is actually generic" (reference src/test_circuits/baby_bear_config.rs:1-7).

TEST-ONLY: the Poseidon2 round constants are self-derived (security-checked
but not externally vetted; see hash/poseidon2.py) — do not use this config
in production."""

from __future__ import annotations

from ..challenger import DuplexChallenger
from ..config import CommitmentParameters, FriParameters, StarkConfig
from ..fields.device import BB4_OPS, BB_OPS
from ..fields.host import BABYBEAR, BABYBEAR_EXT4, ExtensionParams
from ..hash.poseidon2 import Poseidon2FieldHasher, permute
from ..pcs import TwoAdicFriPcs

DOMAIN_TAG = b"multi-stark/v0"


class BabyBearPoseidon2Config(StarkConfig):
    def __init__(
        self,
        commitment_parameters: CommitmentParameters,
        fri_parameters: FriParameters,
        transcript_profile=None,
    ):
        self.field = BB_OPS
        self.ext = BB4_OPS
        self.host_field = BABYBEAR
        self.host_ext = BABYBEAR_EXT4
        self.extension_params = ExtensionParams(degree=4, w=11, karatsuba=False)
        self.commitment_parameters = commitment_parameters
        self.fri_parameters = fri_parameters
        if transcript_profile is not None:
            self.transcript_profile = transcript_profile
        if self.transcript_profile.poseidon2_constants is not None:
            # must precede hasher construction (device constants snapshot)
            from ..hash.poseidon2 import install_constants

            install_constants(self.transcript_profile.poseidon2_constants)
        self.hasher = Poseidon2FieldHasher(BB_OPS)
        self.pcs = TwoAdicFriPcs(
            BB_OPS,
            BB4_OPS,
            BABYBEAR,
            BABYBEAR_EXT4,
            self.hasher,
            commitment_parameters,
            fri_parameters,
            transcript_profile=self.transcript_profile,
        )

    def initialise_challenger(self) -> DuplexChallenger:
        """Field-element seeding (reference baby_bear_config.rs:70-85)."""
        ch = DuplexChallenger(
            self.host_field, self.host_ext, permute,
            self.transcript_profile.duplex_observe_bytes,
        )
        ch.observe_bytes(DOMAIN_TAG)
        p = self.commitment_parameters
        f = self.fri_parameters
        for v in (
            p.log_blowup,
            p.cap_height,
            f.log_final_poly_len,
            f.max_log_arity,
            f.num_queries,
            f.commit_proof_of_work_bits,
            f.query_proof_of_work_bits,
        ):
            ch.observe_u64(v)
        return ch
