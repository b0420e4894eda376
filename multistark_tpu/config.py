"""Generic STARK configuration (reference src/config.rs, src/types.rs:171-197).

A concrete config bundles: field ops (host + device), extension params, hash
kernels, challenger factory, and the PCS.  See configs/goldilocks_blake3.py
for the production instantiation and configs/babybear_poseidon2.py for the
genericity-proof instantiation (reference src/test_circuits/baby_bear_config.rs:1-7).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class CommitmentParameters:
    """Merkle commitment parameters (reference src/types.rs:171-177)."""

    log_blowup: int
    cap_height: int = 0


@dataclass(frozen=True)
class FriParameters:
    """FRI protocol parameters (reference src/types.rs:186-197)."""

    log_final_poly_len: int
    max_log_arity: int
    num_queries: int
    commit_proof_of_work_bits: int
    query_proof_of_work_bits: int

    @staticmethod
    def standard_fast() -> "FriParameters":
        return FriParameters(
            log_final_poly_len=0,
            max_log_arity=1,
            num_queries=100,
            commit_proof_of_work_bits=10,
            query_proof_of_work_bits=10,
        )


class StarkConfig:
    """Protocol surface every concrete config provides (reference
    src/config.rs:64-123).  Concrete configs are plain objects exposing:

      field        : device FieldOps for the base field (Val)
      ext          : device ExtOps for the challenge field
      host_field   : HostField
      host_ext     : HostExtField
      pcs          : the PCS instance (commit/commit_ldes/open/verify/...)
      commitment_parameters, fri_parameters
      initialise_challenger() -> Challenger seeded with the domain-separation
                     tag and a digest of all parameters (src/types.rs:118-130)
      max_log_degree() = TWO_ADICITY - log_blowup  (src/config.rs:102-112)
      max_quotient_degree() = 2^log_blowup         (src/config.rs:114-118)
      log_blowup()
      extension_params : fields.host.ExtensionParams for the compiler
    """

    def max_log_degree(self) -> int:
        return self.host_field.two_adicity - self.log_blowup()

    def max_quotient_degree(self) -> int:
        return 1 << self.log_blowup()

    def log_blowup(self) -> int:
        return self.commitment_parameters.log_blowup
