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


def duplex_challenger_vectors() -> dict:
    """DuplexChallenger (BabyBear/Poseidon2) pins, incl. the two conventions
    chosen WITHOUT a pinnable p3 reference (documented deviations,
    docs/STATUS.md §2): observe_bytes feeds ONE byte per field element
    (challenger.py:309-311), and sample_bits takes the low `bits` of a
    sampled field element (challenger.py:322-324, same rule as the
    serializing challenger / p3 CanSampleBits)."""
    from .challenger import DuplexChallenger
    from .fields.host import BABYBEAR, BABYBEAR_EXT4
    from .hash.poseidon2 import permute

    ch = DuplexChallenger(BABYBEAR, BABYBEAR_EXT4, permute)
    ch.observe_bytes(b"multi-stark/v0")
    for v in (2, 1, 4, 4):
        ch.observe_field(v)
    out = {
        "sample_field": ch.sample_field(),
        "sample_ext": list(ch.sample_ext()),
        "sample_bits_20": ch.sample_bits(20),
        "sample_bits_1": ch.sample_bits(1),
        "grind_4_witness": ch.grind(4),
    }
    return out


def serializing_sample_bits_vectors() -> dict:
    """sample_bits pins for the production challenger: low-bits of a
    sampled field element, rejection-free (challenger.py:169-173 ≙ p3
    SerializingChallenger64 CanSampleBits)."""
    from .challenger import SerializingChallenger64
    from .fields.host import GOLDILOCKS, GOLDILOCKS_EXT2

    out = {}
    for bits in (1, 8, 20, 31):
        ch = SerializingChallenger64(GOLDILOCKS, GOLDILOCKS_EXT2)
        ch.observe_bytes(b"sample-bits-pin")
        out[f"bits_{bits}"] = ch.sample_bits(bits)
    return out


_TINY_PROOF_CACHE: list = []


def _tiny_proof():
    """One fixed tiny prove on the production config (computed once; shared
    by the FRI transcript + serialization fixtures — the transcript recorder
    must wrap the FIRST call)."""
    if _TINY_PROOF_CACHE:
        return _TINY_PROOF_CACHE[0]
    from . import expr as ex
    from .config import CommitmentParameters, FriParameters
    from .configs import GoldilocksBlake3Config
    from .system import CircuitInputs, System, SystemWitness

    config = GoldilocksBlake3Config(
        CommitmentParameters(log_blowup=2, cap_height=0),
        FriParameters(
            log_final_poly_len=0, max_log_arity=1, num_queries=4,
            commit_proof_of_work_bits=1, query_proof_of_work_bits=1,
        ),
    )
    inputs = CircuitInputs(
        main_width=3,
        constraints=[ex.main(0) * ex.main(1) - ex.main(2)],
        ext_constraints=[],
        lookups=[],
    )
    system, key = System.new(config, [inputs])
    p = config.host_field.p
    rng = np.random.default_rng(42)
    a = rng.integers(0, 1 << 31, 32, dtype=np.uint64)
    b = rng.integers(0, 1 << 31, 32, dtype=np.uint64)
    c = (a.astype(object) * b.astype(object)) % p
    trace = np.stack([a, b, np.asarray(c, np.uint64)], axis=1)
    witness = SystemWitness.from_stage_1([trace], system, key)
    proof = system.prove(key, witness)
    _TINY_PROOF_CACHE.append((config, system, key, witness, proof))
    return _TINY_PROOF_CACHE[0]


def fri_transcript_vectors() -> dict:
    """Every Fiat-Shamir draw of one fixed tiny prove, in schedule order —
    pins the FULL transcript schedule (incl. the commit-phase deviation
    documented at pcs.py:21-26) so diffing against a Rust-side trace is one
    comparison.  Regenerate after ANY transcript change."""
    from .challenger import SerializingChallenger64

    samples: List = []
    orig_field = SerializingChallenger64.sample_field
    orig_bits = SerializingChallenger64.sample_bits

    def rec_field(self):
        v = orig_field(self)
        samples.append(("field", v))
        return v

    def rec_bits(self, bits):
        v = orig_bits(self, bits)
        samples.append((f"bits{bits}", v))
        return v

    SerializingChallenger64.sample_field = rec_field
    SerializingChallenger64.sample_bits = rec_bits
    try:
        config, system, key, witness, proof = _tiny_proof()
    finally:
        SerializingChallenger64.sample_field = orig_field
        SerializingChallenger64.sample_bits = orig_bits
    return {
        "schedule": [[kind, int(v)] for kind, v in samples],
        "intermediate_accumulators": [list(map(int, a)) for a in proof.intermediate_accumulators],
        "final_poly": [list(map(int, c)) for c in proof.fri_proof.final_poly],
    }


def serialization_vectors() -> dict:
    """Byte-layout pins of the bincode-shaped proof serialization
    (serialization.py; field order per reference src/prover.rs:202-243):
    total length, sha256, and the first 128 header bytes of one fixed tiny
    proof — enough for a future Rust-side byte diff to localize any
    divergence without rerunning the prover."""
    import hashlib

    config, system, key, witness, proof = _tiny_proof()
    data = proof.to_bytes(config)
    rt = type(proof).from_bytes(data, system)
    assert rt.to_bytes(config) == data
    return {
        "len": len(data),
        "sha256": hashlib.sha256(data).hexdigest(),
        "header_128_hex": data[:128].hex(),
    }


def generate() -> dict:
    return {
        "challenger": challenger_vectors(),
        "serializing_sample_bits": serializing_sample_bits_vectors(),
        "duplex_challenger": duplex_challenger_vectors(),
        "blake3": blake3_vectors(),
        "merkle": merkle_vectors(),
        "poseidon2": poseidon2_vectors(),
        "ntt": ntt_vectors(),
        "fri_transcript": fri_transcript_vectors(),
        "serialization": serialization_vectors(),
    }


if __name__ == "__main__":
    print(json.dumps(generate(), indent=2, default=int))
