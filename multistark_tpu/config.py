"""Generic STARK configuration (reference src/config.rs, src/types.rs:171-197).

A concrete config bundles: field ops (host + device), extension params, hash
kernels, challenger factory, and the PCS.  See configs/goldilocks_blake3.py
for the production instantiation and configs/babybear_poseidon2.py for the
genericity-proof instantiation (reference src/test_circuits/baby_bear_config.rs:1-7).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class TranscriptProfile:
    """One seam for every cross-implementation transcript / serialization
    convention that cannot be pinned against the Rust reference offline
    (no Rust toolchain, Plonky3 not vendored).  Each field names a known
    deviation; matching p3 when fixtures arrive is a parameter change here,
    not surgery across modules.  The defaults are this library's
    self-consistent choices, covered by fixtures/reference_vectors.json.

    Knobs and their consumers:

    fri_observe_claims_before_alpha (pcs.open / pcs.verify):
        True  — observe ALL claimed opened values, then sample α (ours:
                an adversary cannot adapt claims to the batching challenge)
        False — p3-fri order: α is sampled at the start of open() with no
                claimed-value observation (they are bound by the FRI check)
    commit_pow_witness_placement (serialization.py FriProof layout):
        "after_commits"     — Vec<u64> directly after commit_phase_commits
                              (ours; the argumentcomputer fork's field is not
                              placeable from the reference source offline)
        "before_pow_witness" — between final_poly and pow_witness
        "after_pow_witness"  — last field of FriProof
    duplex_observe_bytes (challenger.DuplexChallenger):
        "field_per_byte" — one field element per byte (ours)
        "packed_u32_le"  — pack each 4-byte LE word into one field element
                           (zero-padded tail), p3's observe_slice-of-u32 shape
    poseidon2_constants (hash/poseidon2.py via the BabyBear config):
        None — self-derived BLAKE3-seeded constants (security-checked,
               documented deviation)
        (external, internal, diag) — explicit injection: tuple of
               (ROUNDS_F×WIDTH ints, ROUNDS_P ints, WIDTH ints) canonical
               BabyBear values, e.g. p3's pinned constants
               (reference src/test_circuits/baby_bear_config.rs:15-31)
    """

    fri_observe_claims_before_alpha: bool = True
    commit_pow_witness_placement: str = "after_commits"
    duplex_observe_bytes: str = "field_per_byte"
    poseidon2_constants: tuple | None = None


DEFAULT_TRANSCRIPT_PROFILE = TranscriptProfile()


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

    def conjectured_fri_bits(self, log_blowup: int) -> float:
        """Conjectured FRI query-phase soundness in bits: each query catches
        a cheating prover w.p. ≈ 1 - ρ (ρ = 2^-log_blowup), so the error is
        ρ^num_queries ≈ 2^-(log_blowup·num_queries), plus the query-PoW
        grinding bits (reference src/verifier.rs:57-78)."""
        return log_blowup * self.num_queries + self.query_proof_of_work_bits

    def proven_fri_bits(self, log_blowup: int) -> float:
        """Johnson-bound (proven) query-phase soundness in bits: each query
        only provably catches w.p. ≈ 1 - √ρ, halving the per-query bits
        (reference src/verifier.rs:64-71)."""
        return 0.5 * log_blowup * self.num_queries + self.query_proof_of_work_bits


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

    # cross-implementation convention seam; concrete configs may override
    # (see TranscriptProfile)
    transcript_profile = DEFAULT_TRANSCRIPT_PROFILE

    def max_log_degree(self) -> int:
        return self.host_field.two_adicity - self.log_blowup()

    def max_quotient_degree(self) -> int:
        return 1 << self.log_blowup()

    def log_blowup(self) -> int:
        return self.commitment_parameters.log_blowup

    def soundness_bits(
        self, constraint_count: int, log_quotient_degree_bound: int, lookup_rows: int,
        conjectured: bool = True,
    ) -> float:
        """Union-bound soundness estimate in bits (reference
        src/verifier.rs:119-133):  ε ≤ ε_FRI + (k - 1 + D + N) / |F_ext|
        with k constraints, D the quotient degree bound, N total lookup
        rows.  Returns -log2(ε); use it to sanity-check parameter choices
        (the production Goldilocks² config at B=4/100 queries/PoW 10+10
        gives ≈2^-100 conjectured)."""
        import math

        fri = self.fri_parameters
        lb = self.log_blowup()
        fri_bits = (
            fri.conjectured_fri_bits(lb) if conjectured else fri.proven_fri_bits(lb)
        )
        ext_bits = self.host_ext.D * self.host_field.p.bit_length()
        sz = max(constraint_count - 1 + (1 << log_quotient_degree_bound) + lookup_rows, 1)
        sz_bits = ext_bits - math.log2(sz)
        return min(fri_bits, sz_bits)
