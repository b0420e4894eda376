"""Per-program execution overhead through the axon tunnel: the same Merkle
work as one fused program vs many per-level programs, plus raw compress
throughput.  Decides whether warm-prove optimization should chase program
COUNT (per-execute overhead) or program CONTENT (device compute)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/multistark_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from multistark_tpu.hash.blake3 import Blake3Device
from multistark_tpu.fields.device import GL_OPS
from multistark_tpu.merkle import Blake3FieldHasher, MerkleMmcs

print(f"backend={jax.default_backend()}", flush=True)

# warm the one-time transfer path (first device_get pays ~350s once)
_ = jax.device_get(jnp.zeros((8,), jnp.uint32))
print("transfer path warm", flush=True)

# -- raw compress throughput: one jitted compress over 2^21 pairs ----------
H = 1 << 21
left = tuple(jnp.ones((H,), jnp.uint32) for _ in range(8))
right = tuple(jnp.ones((H,), jnp.uint32) for _ in range(8))
comp = jax.jit(Blake3Device.compress_planes)
r = jax.block_until_ready(comp(left, right))
t0 = time.time()
N = 20
for _ in range(N):
    r = comp(left, right)
jax.block_until_ready(r)
dt = (time.time() - t0) / N
print(f"compress 2^21 pairs: {dt*1000:.1f} ms/exec "
      f"({H/dt/1e9:.2f} Ghash/s)", flush=True)

# -- one fused whole-tree commit at 2^18 vs per-level programs -------------
mmcs = MerkleMmcs(Blake3FieldHasher(GL_OPS), cap_height=0)
mat = GL_OPS.from_np(np.ones((14, 1 << 18), np.uint64))

for split, label in (("25", "fused"), ("4", "split")):
    os.environ["MULTISTARK_MMCS_SPLIT_LOG"] = split
    cap, data = mmcs.commit([mat])  # compile
    jax.block_until_ready(data.layers[-1])
    t0 = time.time()
    for _ in range(5):
        cap, data = mmcs.commit([mat])
        jax.block_until_ready(data.layers[-1])
    print(f"tree 2^18 {label}: {(time.time()-t0)/5*1000:.1f} ms/commit", flush=True)

print("EXEC_PROBE_OK", flush=True)
