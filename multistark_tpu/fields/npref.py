"""Vectorized NumPy reference field arithmetic (trusted slow path).

Goldilocks lives in ``uint64`` arrays (full 64x64→128 products via 32-bit
limb splits — exact in uint64), BabyBear in ``uint64`` for simplicity.
Every JAX device kernel is pinned against this module in tests
(SURVEY.md §4: per-kernel pins against a slow NumPy reference), and twiddle
tables are precomputed here before being shipped to the device.
"""

from __future__ import annotations

import numpy as np

from .host import BABYBEAR, GOLDILOCKS

_GL_P = np.uint64(GOLDILOCKS.p)
_MASK32 = np.uint64(0xFFFFFFFF)
_BB_P = np.uint64(BABYBEAR.p)


# --- Goldilocks --------------------------------------------------------------

def gl_add(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = np.asarray(a, np.uint64)
    b = np.asarray(b, np.uint64)
    with np.errstate(over="ignore"):
        s = a + b
        over = s < a
        # on wrap the true sum is s + 2^64 ≡ s + (2^64 - p) = s + 2^32 - 1
        s = np.where(over, s + _MASK32, s)
        s = np.where(s >= _GL_P, s - _GL_P, s)
    return s


def gl_sub(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = np.asarray(a, np.uint64)
    b = np.asarray(b, np.uint64)
    with np.errstate(over="ignore"):
        d = a - b
        under = a < b
        d = np.where(under, d - _MASK32, d)  # d + p ≡ d - (2^64 - p) mod 2^64
    return d


def gl_neg(a: np.ndarray) -> np.ndarray:
    a = np.asarray(a, np.uint64)
    return np.where(a == 0, np.uint64(0), _GL_P - a)


def _mul_64_128(a: np.ndarray, b: np.ndarray):
    """Full 128-bit product as four 32-bit chunks (x0..x3, little-endian)."""
    a0 = a & _MASK32
    a1 = a >> np.uint64(32)
    b0 = b & _MASK32
    b1 = b >> np.uint64(32)
    with np.errstate(over="ignore"):
        p00 = a0 * b0  # exact, < 2^64
        p01 = a0 * b1
        p10 = a1 * b0
        p11 = a1 * b1
        x0 = p00 & _MASK32
        t1 = (p00 >> np.uint64(32)) + (p01 & _MASK32) + (p10 & _MASK32)
        x1 = t1 & _MASK32
        t2 = (t1 >> np.uint64(32)) + (p01 >> np.uint64(32)) + (p10 >> np.uint64(32)) + (p11 & _MASK32)
        x2 = t2 & _MASK32
        x3 = (t2 >> np.uint64(32)) + (p11 >> np.uint64(32))
    return x0, x1, x2, x3


def gl_reduce128(x0, x1, x2, x3) -> np.ndarray:
    """Reduce x3·2^96 + x2·2^64 + x1·2^32 + x0 mod p using
    2^64 ≡ 2^32 - 1 and 2^96 ≡ -1 (mod p)."""
    with np.errstate(over="ignore"):
        lo = x0 | (x1 << np.uint64(32))
        # x2 · (2^32 - 1) fits in 64 bits exactly
        m = x2 * _MASK32
        r = gl_add(np.where(lo >= _GL_P, lo - _GL_P, lo), np.where(m >= _GL_P, m - _GL_P, m))
        r = gl_sub(r, np.where(x3 >= _GL_P, x3 - _GL_P, x3))
    return r


def gl_mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = np.asarray(a, np.uint64)
    b = np.asarray(b, np.uint64)
    return gl_reduce128(*_mul_64_128(a, b))


def gl_pow(a: np.ndarray, e: int) -> np.ndarray:
    a = np.asarray(a, np.uint64)
    r = np.ones_like(a)
    while e:
        if e & 1:
            r = gl_mul(r, a)
        a = gl_mul(a, a)
        e >>= 1
    return r


def gl_inv(a: np.ndarray) -> np.ndarray:
    return gl_pow(a, GOLDILOCKS.p - 2)


# --- BabyBear ----------------------------------------------------------------

def bb_add(a, b):
    s = np.asarray(a, np.uint64) + np.asarray(b, np.uint64)
    return np.where(s >= _BB_P, s - _BB_P, s)


def bb_sub(a, b):
    a = np.asarray(a, np.uint64)
    b = np.asarray(b, np.uint64)
    return np.where(a >= b, a - b, a + _BB_P - b)


def bb_neg(a):
    a = np.asarray(a, np.uint64)
    return np.where(a == 0, np.uint64(0), _BB_P - a)


def bb_mul(a, b):
    # products of two < 2^31 values are exact in uint64
    return (np.asarray(a, np.uint64) * np.asarray(b, np.uint64)) % _BB_P


def bb_pow(a, e: int):
    a = np.asarray(a, np.uint64)
    r = np.ones_like(a)
    while e:
        if e & 1:
            r = bb_mul(r, a)
        a = bb_mul(a, a)
        e >>= 1
    return r


def bb_inv(a):
    return bb_pow(a, BABYBEAR.p - 2)
