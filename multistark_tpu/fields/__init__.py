"""Field arithmetic layers.

Three tiers, mirroring the role split of the reference's p3-field /
p3-goldilocks / p3-baby-bear crates (see SURVEY.md §2.2):

  - ``host``   : scalar arithmetic on Python ints — Fiat-Shamir transcript,
                 verifier out-of-domain checks, parameter derivation.
  - ``npref``  : vectorized NumPy (uint64 / uint32) — twiddle precompute and
                 the slow trusted reference that every device kernel is
                 pinned against in tests.
  - ``device`` : JAX uint32 limb-plane arrays — all prover hot paths.

Device representation: a base-field array is a tuple of uint32 "planes"
(structure-of-arrays; 2 planes for 64-bit Goldilocks, 1 for BabyBear), an
extension-field array is a tuple of D base-field arrays.  The trailing array
dimension is the data dimension (rows of the trace), so the TPU VPU lane
dimension is the trace length — the reference packs CPU SIMD lanes instead
(reference src/eval.rs:67-106).
"""

from .host import GOLDILOCKS, GOLDILOCKS_EXT2, BABYBEAR, BABYBEAR_EXT4, HostField, HostExtField  # noqa: F401
