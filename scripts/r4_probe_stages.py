"""Warm per-kernel timing of the real prover stages at bench shapes:
which device work actually costs what (the spans only give stage totals)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/multistark_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from multistark_tpu.fields.device import GL_OPS
from multistark_tpu.merkle import Blake3FieldHasher, MerkleMmcs
from multistark_tpu.ntt import get_engine

_ = jax.device_get(jax.numpy.zeros((8,), jax.numpy.uint32))
print(f"backend={jax.default_backend()}", flush=True)

log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 14
n = 1 << log_n
engine = get_engine(GL_OPS)
mmcs = MerkleMmcs(Blake3FieldHasher(GL_OPS), cap_height=0)
shift = 0x7  # generator-ish; value irrelevant for timing
rng = np.random.default_rng(3)
mat = GL_OPS.from_np(rng.integers(0, (1 << 63), (14, n), dtype=np.uint64))


def warmtime(label, fn, iters=10):
    r = jax.block_until_ready(jax.tree.leaves(fn())[0])
    t0 = time.time()
    for _ in range(iters):
        r = fn()
    jax.block_until_ready(jax.tree.leaves(r)[0])
    print(f"{label}: {(time.time()-t0)/iters*1000:.1f} ms", flush=True)


# 1) the LDE (iDFT at n + forward DFT at 4n, bit-reversed output)
warmtime(f"coset_lde_bitrev 14x2^{log_n} (B=4)",
         lambda: engine.coset_lde_bitrev(mat, log_n, 2, shift))

lde = engine.coset_lde_bitrev(mat, log_n, 2, shift)
jax.block_until_ready(jax.tree.leaves(lde)[0])

# 2) the Merkle tree over the LDE
warmtime(f"mmcs.commit 14x2^{log_n+2}", lambda: mmcs.commit([lde])[1].layers[-1])

# 3) iDFT alone
warmtime(f"idft 14x2^{log_n}", lambda: engine.icoset_from_natural(mat, log_n, shift))

# 4) leaf hash alone
hasher = mmcs.hasher
import multistark_tpu.utils as U
kern = U.cached_jit(("probe_leaf", log_n), lambda: lambda ms: hasher.hash_matrices(ms))
warmtime(f"leaf hash 14x2^{log_n+2}", lambda: kern([lde]))
print("OK", flush=True)
