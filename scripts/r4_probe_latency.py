"""Measure axon-tunnel dispatch characteristics: per-execute round trip,
pipelined dispatch throughput, and device_get sync latency.  These set the
floor for warm-prove time (docs/STATUS.md: warm prove is dispatch-bound)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

print(f"backend={jax.default_backend()}", flush=True)


@jax.jit
def tiny(x):
    return x + jnp.uint32(1)


x = jnp.zeros((1024,), jnp.uint32)
jax.block_until_ready(tiny(x))

# 1) fully-serialized dispatch: block after every execute
t0 = time.time()
for _ in range(50):
    x = tiny(x)
    jax.block_until_ready(x)
ser = (time.time() - t0) / 50
print(f"serialized execute+sync: {ser*1000:.1f} ms/op", flush=True)

# 2) pipelined dispatch: block once at the end
x = jnp.zeros((1024,), jnp.uint32)
t0 = time.time()
for _ in range(50):
    x = tiny(x)
jax.block_until_ready(x)
pipe = (time.time() - t0) / 50
print(f"pipelined execute (sync once): {pipe*1000:.1f} ms/op", flush=True)

# 3) device_get of a small array (the cap fetch pattern)
caps = [jax.block_until_ready(tiny(jnp.zeros((8,), jnp.uint32))) for _ in range(3)]
t0 = time.time()
for c in caps * 17:
    np.asarray(jax.device_get(c))
get = (time.time() - t0) / 51
print(f"small device_get: {get*1000:.1f} ms", flush=True)

# 4) medium kernel to see if execute latency scales with size
@jax.jit
def med(x):
    return x * jnp.uint32(3) + jnp.uint32(1)


y = jnp.zeros((1 << 22,), jnp.uint32)
jax.block_until_ready(med(y))
t0 = time.time()
for _ in range(20):
    y = med(y)
jax.block_until_ready(y)
print(f"pipelined 4M-element execute: {(time.time()-t0)/20*1000:.1f} ms/op", flush=True)
print("LATENCY_PROBE_OK", flush=True)
