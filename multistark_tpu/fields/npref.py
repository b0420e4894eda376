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

# --- vectorized base/extension algebra (batched host verifier) ---------------
#
# The verifier's per-query arithmetic (reduced openings, fold walk, final
# poly) is pure host field math; done one query at a time in Python it costs
# hundreds of ms.  These wrappers run the SAME algebra over (Q, ...) uint64
# arrays so the whole query set is a handful of NumPy passes
# (pcs.TwoAdicFriPcs._verify_queries_batched).


class NpField:
    """Vectorized mod-p ops over uint64 ndarrays for one host field."""

    def __init__(self, host):
        self.host = host
        self.p = np.uint64(host.p)
        if host.name == "Goldilocks":
            self.add, self.sub, self.mul = gl_add, gl_sub, gl_mul
            self.neg, self.inv, self.pow = gl_neg, gl_inv, gl_pow
        elif host.name == "BabyBear":
            self.add, self.sub, self.mul = bb_add, bb_sub, bb_mul
            self.neg, self.inv, self.pow = bb_neg, bb_inv, bb_pow
        else:
            raise KeyError(host.name)

    def reduce(self, a: np.ndarray) -> np.ndarray:
        """Exact mod p of arbitrary uint64 values."""
        return np.asarray(a, np.uint64) % self.p

    def pow_vec(self, base: int, exps: np.ndarray, max_bits: int) -> np.ndarray:
        """base^exps with PER-ELEMENT exponents < 2^max_bits."""
        exps = np.asarray(exps, np.uint64)
        r = np.ones_like(exps)
        sq = np.uint64(base % self.host.p)
        for bit in range(max_bits):
            take = ((exps >> np.uint64(bit)) & np.uint64(1)).astype(bool)
            r = np.where(take, self.mul(r, sq), r)
            sq = self.mul(sq, sq)
        return r

    def sum_axis(self, a: np.ndarray, axis: int) -> np.ndarray:
        """Sum mod p along `axis` by pairwise halving (stays in uint64)."""
        a = np.moveaxis(np.asarray(a, np.uint64), axis, 0)
        while a.shape[0] > 1:
            if a.shape[0] & 1:
                a = np.concatenate([a, np.zeros((1,) + a.shape[1:], np.uint64)])
            a = self.add(a[0::2], a[1::2])
        return a[0]


def reverse_bits_vec(x: np.ndarray, bits: int) -> np.ndarray:
    """Bit-reverse each element within `bits` bits."""
    x = np.asarray(x, np.uint64)
    r = np.zeros_like(x)
    for i in range(bits):
        r |= ((x >> np.uint64(i)) & np.uint64(1)) << np.uint64(bits - 1 - i)
    return r


def gl2_batch_inv_native(a: np.ndarray, raise_on_zero: bool):
    """C batch inverse over (Q, 2) Goldilocks^2 rows (zeros map to zero);
    None if the native lib is absent."""
    import ctypes

    from ..hash.blake3 import _native_lib

    lib = _native_lib()
    if lib is None or not hasattr(lib, "msgl_batch_inv2"):
        return None
    a = np.ascontiguousarray(a, np.uint64)
    if raise_on_zero and not a.any(axis=1).all():
        raise ZeroDivisionError("zero element in batch inverse")
    n = a.shape[0]
    scratch = np.empty(2 * n, np.uint64)
    out = np.empty_like(a)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.msgl_batch_inv2(
        a.ctypes.data_as(u64p), n, scratch.ctypes.data_as(u64p),
        out.ctypes.data_as(u64p),
    )
    return out


def gl2_prefix_sum_native(a: np.ndarray):
    """In-place-free C inclusive prefix sum over (Q, 2) Goldilocks^2 rows;
    None if the native lib is absent."""
    import ctypes

    from ..hash.blake3 import _native_lib

    lib = _native_lib()
    if lib is None or not hasattr(lib, "msgl_prefix_sum2"):
        return None
    out = np.ascontiguousarray(a, np.uint64).copy()
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.msgl_prefix_sum2(out.ctypes.data_as(u64p), out.shape[0])
    return out


def np_batch_inv_base(nf: "NpField", host, a: np.ndarray) -> np.ndarray:
    """(Q,) nonzero base elements -> elementwise inverses via a pairwise
    product tree + ONE host inversion at the root."""
    levels = [a]
    cur = a
    while cur.shape[0] > 1:
        if cur.shape[0] & 1:
            cur = np.concatenate([cur, np.ones(1, np.uint64)])
        cur = nf.mul(cur[0::2], cur[1::2])
        levels.append(cur)
    inv = np.asarray([host.inv(int(levels[-1][0]))], np.uint64)
    for lvl in levels[-2::-1]:
        n = lvl.shape[0]
        even = lvl[0::2]
        odd = lvl[1::2] if n % 2 == 0 else np.concatenate([lvl[1::2], np.ones(1, np.uint64)])
        down = np.empty(even.shape[0] * 2, np.uint64)
        down[0::2] = nf.mul(odd, inv)
        down[1::2] = nf.mul(even, inv)
        inv = down[:n]
    return inv


class NpExt:
    """Vectorized binomial extension F_p[X]/(X^D - W): elements are
    (..., D) uint64 arrays (coordinate i = coefficient of X^i, matching
    HostExtField)."""

    def __init__(self, nf: "NpField", he):
        self.nf = nf
        self.he = he
        self.D = he.D
        self.W = np.uint64(he.w % he.base.p)

    def of_scalar(self, a, shape=()) -> np.ndarray:
        """Host ext tuple -> broadcast (..., D) array."""
        v = np.asarray([int(c) % self.nf.host.p for c in a], np.uint64)
        return np.broadcast_to(v, tuple(shape) + (self.D,)).copy()

    def from_base_vec(self, b: np.ndarray) -> np.ndarray:
        out = np.zeros(b.shape + (self.D,), np.uint64)
        out[..., 0] = b
        return out

    def add(self, a, b):
        return self.nf.add(a, b)

    def sub(self, a, b):
        return self.nf.sub(a, b)

    def mul(self, a, b):
        """Schoolbook (..., D)x(..., D) with X^D = W wraparound; D <= 4 so
        the D^2 coordinate products are fine."""
        nf, D = self.nf, self.D
        a = np.asarray(a, np.uint64)
        b = np.asarray(b, np.uint64)
        out = np.zeros(np.broadcast_shapes(a.shape, b.shape), np.uint64)
        for i in range(D):
            for j in range(D):
                t = nf.mul(a[..., i], b[..., j])
                k = i + j
                if k >= D:
                    k -= D
                    t = nf.mul(t, self.W)
                out[..., k] = nf.add(out[..., k], t)
        return out

    def scale(self, a, b_base):
        """(..., D) ext times (...,) base."""
        return self.nf.mul(a, np.asarray(b_base, np.uint64)[..., None])

    def batch_inv(self, a: np.ndarray) -> np.ndarray:
        """(Q, D) -> elementwise inverses via a pairwise product TREE
        (≈3·Q ext muls total vs 2·Q·log Q for a scan) + ONE scalar host
        inversion at the root (Montgomery trick).  Goldilocks^2 takes the
        native C path (csrc msgl_batch_inv2).  Raises ZeroDivisionError on
        any zero element (callers wanting zero→zero mask first)."""
        he = self.he
        if he.name == "Goldilocks^2":
            out = gl2_batch_inv_native(a, raise_on_zero=True)
            if out is not None:
                return out
        one = self.of_scalar(he.one)
        levels = [a]
        cur = a
        while cur.shape[0] > 1:  # reduce up: pairwise products
            if cur.shape[0] & 1:
                cur = np.concatenate([cur, one[None]])
            cur = self.mul(cur[0::2], cur[1::2])
            levels.append(cur)
        inv = self.of_scalar(he.inv(tuple(int(c) for c in levels[-1][0])))[None]
        for lvl in levels[-2::-1]:  # walk down: split each inverse
            n = lvl.shape[0]
            even = lvl[0::2]
            odd = lvl[1::2] if n % 2 == 0 else np.concatenate([lvl[1::2], one[None]])
            down = np.empty((even.shape[0] * 2, self.D), np.uint64)
            down[0::2] = self.mul(odd, inv)
            down[1::2] = self.mul(even, inv)
            inv = down[:n]
        return inv
