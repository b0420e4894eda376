"""Production config: Goldilocks + degree-2 extension, Blake3 hashing,
byte-oriented serializing challenger (reference src/types.rs)."""

from __future__ import annotations

from ..challenger import SerializingChallenger64
from ..config import CommitmentParameters, FriParameters, StarkConfig
from ..fields.device import GL2_OPS, GL_OPS
from ..fields.host import ExtensionParams, GOLDILOCKS, GOLDILOCKS_EXT2
from ..merkle import Blake3FieldHasher
from ..pcs import TwoAdicFriPcs

DOMAIN_TAG = b"multi-stark/v0"  # reference src/types.rs:118-130


class GoldilocksBlake3Config(StarkConfig):
    def __init__(
        self,
        commitment_parameters: CommitmentParameters,
        fri_parameters: FriParameters,
        transcript_profile=None,
    ):
        self.field = GL_OPS
        self.ext = GL2_OPS
        self.host_field = GOLDILOCKS
        self.host_ext = GOLDILOCKS_EXT2
        self.extension_params = ExtensionParams(degree=2, w=7, karatsuba=True)
        self.commitment_parameters = commitment_parameters
        self.fri_parameters = fri_parameters
        if transcript_profile is not None:
            self.transcript_profile = transcript_profile
        self.hasher = Blake3FieldHasher(GL_OPS)
        self.pcs = TwoAdicFriPcs(
            GL_OPS,
            GL2_OPS,
            GOLDILOCKS,
            GOLDILOCKS_EXT2,
            self.hasher,
            commitment_parameters,
            fri_parameters,
            transcript_profile=self.transcript_profile,
        )

    def initialise_challenger(self) -> SerializingChallenger64:
        """Seed = domain-separation tag ‖ all 7 parameters as u64 LE, so any
        parameter change changes every transcript (reference
        src/types.rs:118-130)."""
        ch = SerializingChallenger64(self.host_field, self.host_ext)
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
