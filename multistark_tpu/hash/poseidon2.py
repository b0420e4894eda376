"""Poseidon2 permutation over BabyBear, width 16 (reference
src/test_circuits/baby_bear_config.rs:15-31 uses p3's Poseidon2BabyBear<16>).

Structure (the public Poseidon2 design): initial external linear layer, then
RF/2 external (full) rounds, RP internal (partial) rounds, RF/2 external
rounds.  S-box x^7; external matrix = circ(2·M4, M4, ..., M4) with the
standard M4; internal matrix = diag(d) + all-ones (y_i = d_i·x_i + Σx).

Round constants are derived deterministically from BLAKE3 of a domain tag
(documented, self-consistent across host and device; the reference's exact
p3 constants are not reproduced — cross-implementation fixtures would be
needed to pin them, which this environment cannot generate).

Host (python int) and device (Montgomery u32 arrays) implementations are
pinned against each other in tests.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.host import BABYBEAR
from .blake3 import blake3_hash

WIDTH = 16
RATE = 8
OUT = 8
ROUNDS_F = 8  # external rounds (split 4 + 4)
ROUNDS_P = 13  # internal rounds
SBOX = 7

P = BABYBEAR.p


def _derive_constants() -> dict:
    """Deterministic constants from a BLAKE3 stream (rejection sampled)."""

    def stream(tag: bytes, count: int) -> List[int]:
        out = []
        counter = 0
        while len(out) < count:
            block = blake3_hash(tag + counter.to_bytes(8, "little"))
            for i in range(0, 32, 4):
                v = int.from_bytes(block[i : i + 4], "little")
                if v < P and len(out) < count:
                    out.append(v)
            counter += 1
        return out

    ext = stream(b"multistark/poseidon2-babybear16/external", ROUNDS_F * WIDTH)
    internal = stream(b"multistark/poseidon2-babybear16/internal", ROUNDS_P)
    # internal diagonal: nonzero, first entry conventionally p-2 scale-free;
    # derived like the rest but rejecting 0
    diag = [d if d != 0 else 1 for d in stream(b"multistark/poseidon2-babybear16/diag", WIDTH)]
    return {
        "external": [ext[r * WIDTH : (r + 1) * WIDTH] for r in range(ROUNDS_F)],
        "internal": internal,
        "diag": diag,
    }


CONSTANTS = _derive_constants()

_M4 = ((2, 3, 1, 1), (1, 2, 3, 1), (1, 1, 2, 3), (3, 1, 1, 2))


# --- host implementation -----------------------------------------------------

def _host_sbox(x: int) -> int:
    x2 = x * x % P
    x4 = x2 * x2 % P
    return x4 * x2 % P * x % P


def _host_external_linear(s: List[int]) -> List[int]:
    # blockwise M4
    t = [0] * WIDTH
    for b in range(0, WIDTH, 4):
        for i in range(4):
            t[b + i] = sum(_M4[i][j] * s[b + j] for j in range(4)) % P
    # add column sums across blocks
    sums = [sum(t[b + i] for b in range(0, WIDTH, 4)) % P for i in range(4)]
    return [(t[k] + sums[k % 4]) % P for k in range(WIDTH)]


def _host_internal_linear(s: List[int]) -> List[int]:
    tot = sum(s) % P
    return [(CONSTANTS["diag"][i] * s[i] + tot) % P for i in range(WIDTH)]


def permute(state: Sequence[int]) -> List[int]:
    """Host Poseidon2 permutation on canonical ints."""
    s = [int(x) % P for x in state]
    assert len(s) == WIDTH
    s = _host_external_linear(s)
    half = ROUNDS_F // 2
    for r in range(half):
        rc = CONSTANTS["external"][r]
        s = [_host_sbox((x + c) % P) for x, c in zip(s, rc)]
        s = _host_external_linear(s)
    for r in range(ROUNDS_P):
        s[0] = _host_sbox((s[0] + CONSTANTS["internal"][r]) % P)
        s = _host_internal_linear(s)
    for r in range(half, ROUNDS_F):
        rc = CONSTANTS["external"][r]
        s = [_host_sbox((x + c) % P) for x, c in zip(s, rc)]
        s = _host_external_linear(s)
    return s


def host_hash_values(values: Sequence[int]) -> List[int]:
    """PaddingFreeSponge(width 16, rate 8, out 8) over canonical ints."""
    state = [0] * WIDTH
    vals = [int(v) % P for v in values]
    for i in range(0, len(vals), RATE):
        chunk = vals[i : i + RATE]
        for j, v in enumerate(chunk):
            state[j] = v
        state = permute(state)
    return state[:OUT]


def host_compress(left: Sequence[int], right: Sequence[int]) -> List[int]:
    """TruncatedPermutation 2-to-1."""
    return permute(list(left) + list(right))[:OUT]


# --- device implementation (Montgomery planes) -------------------------------

class Poseidon2Device:
    """Batched permutation: state = list of 16 BabyBear device elements."""

    def __init__(self, F):  # F = BB_OPS
        self.F = F
        self._ext_rc = [
            [F.const(c) for c in row] for row in CONSTANTS["external"]
        ]
        self._int_rc = [F.const(c) for c in CONSTANTS["internal"]]
        self._diag = [F.const(d) for d in CONSTANTS["diag"]]

    def _sbox(self, x):
        F = self.F
        x2 = F.square(x)
        x4 = F.square(x2)
        return F.mul(F.mul(x4, x2), x)

    def _external_linear(self, s):
        F = self.F
        t = [None] * WIDTH
        for b in range(0, WIDTH, 4):
            for i in range(4):
                acc = None
                for j in range(4):
                    term = s[b + j]
                    m = _M4[i][j]
                    if m == 2:
                        term = F.add(term, term)
                    elif m == 3:
                        term = F.add(F.add(term, term), term)
                    acc = term if acc is None else F.add(acc, term)
                t[b + i] = acc
        sums = []
        for i in range(4):
            acc = t[i]
            for b in range(4, WIDTH, 4):
                acc = self.F.add(acc, t[b + i])
            sums.append(acc)
        return [self.F.add(t[k], sums[k % 4]) for k in range(WIDTH)]

    def _internal_linear(self, s):
        F = self.F
        tot = s[0]
        for x in s[1:]:
            tot = F.add(tot, x)
        return [F.add(F.mul(s[i], self._diag[i]), tot) for i in range(WIDTH)]

    def permute(self, state):
        F = self.F
        s = list(state)
        s = self._external_linear(s)
        half = ROUNDS_F // 2
        for r in range(half):
            s = [self._sbox(F.add(x, c)) for x, c in zip(s, self._ext_rc[r])]
            s = self._external_linear(s)
        for r in range(ROUNDS_P):
            s0 = self._sbox(F.add(s[0], self._int_rc[r]))
            s = [s0] + s[1:]
            s = self._internal_linear(s)
        for r in range(half, ROUNDS_F):
            s = [self._sbox(F.add(x, c)) for x, c in zip(s, self._ext_rc[r])]
            s = self._external_linear(s)
        return s


class Poseidon2FieldHasher:
    """MMCS hasher pair for BabyBear matrices: leaf = padding-free sponge
    over the concatenated row values; compress = truncated permutation.
    Digests are CANONICAL uint32 (n, 8) arrays, so Merkle layers, caps, and
    challenger observation are Montgomery-free at the interface."""

    digest_words = 8

    def __init__(self, F):  # BB_OPS
        self.F = F
        self.perm = Poseidon2Device(F)

    # -- device ----------------------------------------------------------
    def hash_matrices(self, mats) -> jnp.ndarray:
        n = jax.tree.leaves(mats[0])[0].shape[-1]
        cols = []
        for m in mats:
            w = jax.tree.leaves(m)[0].shape[0]
            for c in range(w):
                cols.append(jax.tree.map(lambda p: p[c], m))
        state = [self.F.zeros((n,)) for _ in range(WIDTH)]
        for i in range(0, len(cols), RATE):
            chunk = cols[i : i + RATE]
            state = [chunk[j] if j < len(chunk) else state[j] for j in range(WIDTH)]
            state = self.perm.permute(state)
        return self._digests_to_canonical(state[:OUT])

    def compress(self, left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
        state = [self._from_canonical(left[:, i]) for i in range(8)] + [
            self._from_canonical(right[:, i]) for i in range(8)
        ]
        out = self.perm.permute(state)
        return self._digests_to_canonical(out[:OUT])

    def _digests_to_canonical(self, elems) -> jnp.ndarray:
        # Montgomery -> canonical on device: REDC(x̄) = x̄·R^{-1} = x
        outs = [self.F._redc(e[0], jnp.zeros_like(e[0])) for e in elems]
        return jnp.stack(outs, axis=1)

    def _from_canonical(self, col: jnp.ndarray):
        # canonical -> Montgomery: multiply by R^2
        from ..fields.device import _BB_R2

        lo, hi = jnp.uint32(0), jnp.uint32(0)
        from ..fields.device import _mul32

        lo, hi = _mul32(col.astype(jnp.uint32), _BB_R2)
        return (self.F._redc(lo, hi),)

    # -- host ------------------------------------------------------------
    def host_hash_rows(self, rows: Sequence[Sequence[int]]) -> np.ndarray:
        vals = [int(v) for row in rows for v in row]
        return np.asarray(host_hash_values(vals), np.uint32)

    def host_compress(self, left: np.ndarray, right: np.ndarray) -> np.ndarray:
        return np.asarray(
            host_compress([int(x) for x in left], [int(x) for x in right]), np.uint32
        )
