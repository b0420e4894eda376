"""Device-resident Fiat-Shamir primitives for the FRI commit phase.

The FRI commit phase is transcript-serial: β_r is squeezed from a duplex
that has absorbed cap_r, and fold r needs β_r — so a host-side challenger
forces one *blocking* device_get per fold round (~14 rounds at 2^14; the
dominant cost of warm prove through the remote TPU tunnel, BENCH_r01).

This module replicates the byte-duplex semantics of
``SerializingChallenger64`` over BLAKE3 (challenger.py:31-110; p3
HashChallenger / SerializingChallenger64, reference src/types.rs:10-13)
with jax ops so each fold round's kernel computes the grind witness and β
itself from the previous round's digest: every round dispatches
asynchronously and the host syncs ONCE at the end.

Correctness contract: the host *replays* the byte transcript from the
returned caps/witnesses after the single sync — the host challenger is
authoritative.  The device path does not model the ~2^-32-probability
rejection-sampling branch (a squeezed u64 ≥ p); any divergence (or a grind
miss) makes the prover fall back to the host commit phase, so proofs are
bit-identical to the host path whenever both succeed and always valid.

Duplex byte layout being replicated (challenger.py):
  - flush: digest = blake3(input_buffer); input := digest (chaining);
    output := digest bytes, popped from the END.
  - a u64 draw pops bytes [31..24] and assembles them little-endian, so
    draw k of one digest is (bswap32(word[7-2k]), bswap32(word[6-2k])) as
    a (lo, hi) u32 pair.
  - grind(bits): smallest witness w whose flush over (input ‖ w_le8) gives
    draw0 canonical with low `bits` zero (deterministic PoW, reference
    src/types.rs:43-81); the passing draw0 is popped by the witness check,
    so β's D coordinates are draws 1..D of the same digest.

Goldilocks + Blake3 only (the production config); the BabyBear/Poseidon2
config keeps the host loop.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .hash.blake3 import Blake3Device

GOLDILOCKS_P = 0xFFFFFFFF_00000001


def bswap32(x: jnp.ndarray) -> jnp.ndarray:
    """Byte-swap u32 lanes (digest words are LE; popped draws read the
    bytes high-to-low)."""
    m8 = np.uint32(0xFF)
    m16 = np.uint32(0xFF00)
    return (
        ((x & m8) << 24) | ((x & m16) << 8) | ((x >> 8) & m16) | (x >> 24)
    )


def digest_draws(digest: jnp.ndarray):
    """digest: (..., 8) u32 words -> four (lo, hi) u32 draws in pop order."""
    return [
        (bswap32(digest[..., 7 - 2 * k]), bswap32(digest[..., 6 - 2 * k]))
        for k in range(4)
    ]


def draw_lt_p(lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """u64 (lo, hi) < p for Goldilocks p = 2^64 - 2^32 + 1:
    val < p  ⟺  hi != 0xFFFFFFFF or lo == 0."""
    return (hi != np.uint32(0xFFFFFFFF)) | (lo == np.uint32(0))


def grind_round(input_words: jnp.ndarray, bits: int):
    """Deterministic batched grind: smallest w ∈ [0, 64·2^bits) whose flush
    digest over (input ‖ w_le8) has a canonical draw0 with low `bits` zero.

    input_words: (L,) u32 — the duplex input buffer (byte length L·4).
    Returns (w (lo, hi) u32 scalars, digest (8,) u32, found bool).  A miss
    (astronomically unlikely: (1-2^-bits)^(64·2^bits) ≈ e^-64) reports
    found=False and the caller falls back to the host grinder.
    """
    L = int(input_words.shape[0])
    n = 64 << bits
    cands = jnp.arange(n, dtype=jnp.uint32)
    msgs = jnp.zeros((n, L + 2), jnp.uint32)
    msgs = msgs.at[:, :L].set(input_words[None, :])
    msgs = msgs.at[:, L].set(cands)  # w_le8 = lo word then hi word (hi = 0)
    digests = Blake3Device._hash_words_impl(msgs)  # (n, 8)
    lo = bswap32(digests[:, 7])
    hi = bswap32(digests[:, 6])
    mask = np.uint32((1 << bits) - 1)
    ok = draw_lt_p(lo, hi) & ((lo & mask) == np.uint32(0))
    wi = jnp.argmax(ok)  # first passing candidate (argmax picks first max)
    found = jnp.any(ok)
    w = (cands[wi], jnp.uint32(0))
    return w, digests[wi], found


def sample_ext_from_digest(digest: jnp.ndarray, degree: int):
    """β after a grind: coordinates are draws 1..D of the grind digest
    (draw0 was popped by the witness check).  Returns (coords, valid);
    valid=False marks a rejection-sampling draw (≥ p) the device path does
    not model — the caller falls back.

    Each coordinate is a (lo, hi) u32 scalar pair — exactly the Goldilocks
    device plane format, usable directly as a fold-kernel β argument.
    """
    assert 1 <= degree <= 3, "only D ≤ 3 fits in one digest after the grind draw"
    draws = digest_draws(digest)
    coords = []
    valid = None
    for k in range(1, degree + 1):
        lo, hi = draws[k]
        ok = draw_lt_p(lo, hi)
        valid = ok if valid is None else (valid & ok)
        coords.append((lo, hi))
    return tuple(coords), valid


def entry_buffer_words(input_buffer: bytes) -> np.ndarray | None:
    """The challenger's current input buffer as u32 words, or None if it is
    not word-aligned (then the device path is skipped)."""
    if len(input_buffer) % 4 != 0:
        return None
    return np.frombuffer(bytes(input_buffer), dtype="<u4").copy()


def u64_of_pair(lo: int, hi: int) -> int:
    return (int(lo) & 0xFFFFFFFF) | ((int(hi) & 0xFFFFFFFF) << 32)
