"""Cross-implementation test-vector generators (reference src/types.rs:225-320).

The reference prints Blake3 leaf/compress/Merkle-open and challenger
reference values for an external Lean 4 suite; these generators serve the
same role for anyone pinning a second implementation against this one —
and for pinning THIS implementation against the Rust reference once its
fixtures are available (BASELINE.md bit-exactness goal).

Run:  python -m multistark_tpu.fixtures > fixtures/reference_vectors.json
"""

from __future__ import annotations

import json
from typing import List

import numpy as np


def challenger_vectors() -> dict:
    """Deterministic draws after a fixed observation schedule."""
    from .challenger import SerializingChallenger64
    from .fields.host import GOLDILOCKS, GOLDILOCKS_EXT2

    ch = SerializingChallenger64(GOLDILOCKS, GOLDILOCKS_EXT2)
    ch.observe_bytes(b"multi-stark/v0")
    for v in (1, 0, 0, 1, 100, 10, 10):
        ch.observe_u64(v)
    out = {
        "after_params_sample": ch.sample_field(),
        "sample_ext": list(ch.sample_ext()),
        "sample_bits_20": ch.sample_bits(20),
    }
    ch.observe_field(123456789)
    out["after_observe_field"] = ch.sample_field()
    out["grind_8_witness"] = ch.grind(8)
    return out


def blake3_vectors() -> dict:
    from .hash.blake3 import blake3_compress_pair, blake3_hash

    rows = {
        "empty": blake3_hash(b"").hex(),
        "leaf_8_u64": blake3_hash(
            b"".join(i.to_bytes(8, "little") for i in range(8))
        ).hex(),
        "leaf_2048_bytes": blake3_hash(bytes(i % 251 for i in range(2048))).hex(),
        "compress_pair": blake3_compress_pair(bytes(range(32)), bytes(range(32, 64))).hex(),
    }
    return rows


def merkle_vectors() -> dict:
    from .fields.device import GL_OPS
    from .merkle import Blake3FieldHasher, MerkleMmcs

    mmcs = MerkleMmcs(Blake3FieldHasher(GL_OPS))
    m1 = np.arange(16, dtype=np.uint64).reshape(2, 8)  # (w=2, n=8)
    m2 = (np.arange(8, dtype=np.uint64) * 1000 + 7).reshape(2, 4)
    cap, data = mmcs.commit([GL_OPS.from_np(m1), GL_OPS.from_np(m2)])
    (op,) = mmcs.open_batch(data, np.array([5]))
    return {
        "root": np.asarray(cap[0]).tolist(),
        "open_5_rows": [r.tolist() for r in op.opened_rows],
        "open_5_path": op.path.tolist(),
    }


def poseidon2_vectors() -> dict:
    from .hash.poseidon2 import host_compress, host_hash_values, permute

    return {
        "permute_0_15": permute(list(range(16))),
        "hash_10": host_hash_values(list(range(10))),
        "compress": host_compress(list(range(8)), list(range(8, 16))),
    }


def ntt_vectors() -> dict:
    from .fields.host import GOLDILOCKS
    from .ntt.ntt import np_powers

    g16 = GOLDILOCKS.two_adic_generator(4)
    return {
        "two_adic_generator_16": g16,
        "two_adic_generator_2^32": GOLDILOCKS.two_adic_generator(32),
        "powers_g16": [int(x) for x in np_powers(GOLDILOCKS, g16, 16)],
    }


def generate() -> dict:
    return {
        "challenger": challenger_vectors(),
        "blake3": blake3_vectors(),
        "merkle": merkle_vectors(),
        "poseidon2": poseidon2_vectors(),
        "ntt": ntt_vectors(),
    }


if __name__ == "__main__":
    print(json.dumps(generate(), indent=2, default=int))
