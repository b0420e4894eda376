"""multistark_tpu — a TPU-native multi-circuit STARK proving library.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of the
reference Rust crate `multi-stark` (see /root/reference): prove and verify
multiple AIR circuits in a single proof, with independent trace heights,
cross-circuit logUp lookup arguments, preprocessed (fixed) tables committed
at setup, genericity over field/hash/PCS, proof serialization, and sparse
activation. Not zero-knowledge (reference README.md:45-48).

Architecture (TPU-first, not a port):
  - field arithmetic on device as uint32 limb planes (structure-of-arrays),
    whole-trace vectorized; the row dimension is the vector lane
    (reference uses CPU SIMD packing, src/eval.rs:67-106 — we instead
    compile the constraint graph to one XLA program over entire columns)
  - NTT/LDE as batched radix-2 stages over column-major matrices
  - Blake3 / Poseidon2 Merkle hashing batched over all leaves at once
  - Fiat-Shamir transcript on host (tiny, serial), device work in 5 big
    jitted stages mirroring reference src/prover.rs:289-603
  - multi-chip scaling via jax.sharding.Mesh + shard_map (row-axis sharding)
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("MULTISTARK_PLATFORM"):
    # select backend before first jax use (JAX_PLATFORMS alone is overridden
    # by the axon plugin in this environment; the config update is honored)
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["MULTISTARK_PLATFORM"])

def _default_cache_dir() -> str:
    # CPU executables AOT-cached with mismatched machine features can
    # SIGILL on load (observed this round: '+prefer-no-gather is not
    # supported on the host machine'), so CPU runs get their own dir and
    # the TPU dir holds only remote-compiled TPU executables.
    plat = _os.environ.get("MULTISTARK_PLATFORM", "")
    if not plat:
        try:
            import jax as _j

            plat = _j.config.jax_platforms or ""
        except Exception:
            plat = ""
    # the axon plugin registers "axon,cpu": the FIRST entry is the backend
    # jax will actually select
    first = plat.split(",")[0].strip() if plat else ""
    if first != "cpu":
        return "/tmp/multistark_jax_cache"
    # NO persistent cache on the CPU backend by default: XLA:CPU AOT
    # executable serialization intermittently SEGFAULTS in this jaxlib
    # (observed twice in the round-5 suite, writing an 8-device sharded
    # eager op's entry), and entries AOT-compiled on a different physical
    # CPU can SIGILL on load (this VM migrates).  CPU runs are eager np
    # mirrors anyway; opt back in with MULTISTARK_JAX_CACHE=<dir>.
    return ""


_cache_dir = _os.environ.get("MULTISTARK_JAX_CACHE", _default_cache_dir())
if _cache_dir and _cache_dir != "0":
    # persistent compiled-program cache for EVERY process importing the
    # package (the ProverKey analog for executables, SURVEY.md §5): a cold
    # full-prove compile through the axon remote-compile tunnel is tens of
    # minutes, and cross-process cache hits on the axon backend are
    # verified to work (round-5 probe: second process compile 0.53 s ->
    # 0.06 s with an explicit 'Persistent compilation cache hit').
    # MULTISTARK_JAX_CACHE=0 disables; a non-default path relocates.
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    if _cache_dir.startswith("/tmp/multistark_jax_cache_cpu"):
        # conservative on CPU: writing tiny eager-op entries pushes every
        # op through XLA:CPU AOT serialization, which intermittently
        # SEGFAULTS in this jaxlib (observed in the round-5 test suite);
        # only the prove-pipeline compiles (>0.5 s) are worth caching
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    else:
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from .config import CommitmentParameters, FriParameters  # noqa: F401
