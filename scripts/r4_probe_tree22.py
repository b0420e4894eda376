"""Round-4 probe: does the SoA digest-plane layout unlock the 2^22-leaf
Merkle tree on the TPU chip?

Round 3 isolated the 2^20 prove blocker to the digest layers' (h, 8) minor
dim being padded to the 128-lane tile (16x memory, RESOURCE_EXHAUSTED at
2^22 leaves; docs/STATUS.md).  This commits the same shape as the 2^20
prove's stage-1 tree — a 14-column Goldilocks matrix at 2^22 rows — and
times commit + a 100-query open.

Usage:  timeout 7000 python scripts/r4_probe_tree22.py [log_h]
"""
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

log_h = int(sys.argv[1]) if len(sys.argv) > 1 else 22
w, h = 14, 1 << log_h
print(f"probe: {w}-col matrix, 2^{log_h} rows, backend={jax.default_backend()}",
      flush=True)
rng = np.random.default_rng(7)
m = rng.integers(0, (1 << 64) - (1 << 32) + 1, (w, h), dtype=np.uint64)
t0 = time.time()
mat = GL_OPS.from_np(m)
jax.block_until_ready(mat[0])
print(f"upload: {time.time() - t0:.1f}s", flush=True)

mmcs = MerkleMmcs(Blake3FieldHasher(GL_OPS), cap_height=0)
t0 = time.time()
cap, data = mmcs.commit([mat])
print(f"commit (incl. compile): {time.time() - t0:.1f}s  cap={cap[0][:2]}",
      flush=True)
t0 = time.time()
cap2, data2 = mmcs.commit([mat])
print(f"commit (warm): {time.time() - t0:.2f}s", flush=True)
assert np.array_equal(cap, cap2)

idx = rng.integers(0, h, 100)
t0 = time.time()
openings = mmcs.open_batch(data, idx)
print(f"open 100 queries: {time.time() - t0:.2f}s", flush=True)
ok = mmcs.verify_batch(cap, data.dims, int(idx[0]), openings[0])
print(f"verify one path: {ok}", flush=True)
assert ok
print("PROBE_OK", flush=True)
