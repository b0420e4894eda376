"""What drives per-execute cost through axon: op count, output count, or
input count?  Plus rolled-vs-unrolled compress throughput."""
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

_ = jax.device_get(jnp.zeros((8,), jnp.uint32))
print(f"backend={jax.default_backend()} (transfer warm)", flush=True)

x = jnp.ones((1 << 16,), jnp.uint32)


def bench(fn, *args, n=50, label=""):
    r = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    print(f"{label}: {(time.time()-t0)/n*1000:.2f} ms/exec", flush=True)


for k in (1, 32, 256, 2048):
    def mk(k=k):
        def f(x):
            for i in range(k):
                x = x * jnp.uint32(3) + jnp.uint32(1)
            return x
        return f
    bench(jax.jit(mk()), x, label=f"chain k={k} ops (2^16)")

def many_out(x):
    return tuple(x + jnp.uint32(i) for i in range(24))
bench(jax.jit(many_out), x, label="24 outputs (2^16)")

def many_in(*xs):
    acc = xs[0]
    for v in xs[1:]:
        acc = acc + v
    return acc
xs = tuple(jnp.ones((1 << 16,), jnp.uint32) for _ in range(24))
bench(jax.jit(many_in), *xs, label="24 inputs (2^16)")

# hash throughput unrolled (2^19 < threshold) vs rolled (2^21)
for lg in (19, 21):
    H = 1 << lg
    left = tuple(jnp.ones((H,), jnp.uint32) for _ in range(8))
    right = tuple(jnp.ones((H,), jnp.uint32) for _ in range(8))
    comp = jax.jit(Blake3Device.compress_planes)
    r = jax.block_until_ready(comp(left, right))
    t0 = time.time()
    for _ in range(20):
        r = comp(left, right)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / 20
    print(f"compress 2^{lg} ({'unrolled' if lg < 20 else 'rolled'}): "
          f"{dt*1000:.1f} ms/exec ({H/dt/1e9:.2f} Ghash/s)", flush=True)
print("OK", flush=True)
