"""JAX device field arithmetic as uint32 limb planes.

A base-field array is a tuple of uint32 ``jnp`` arrays ("planes", little-
endian limbs); an extension element is a tuple of D base elements.  All ops
are whole-array (the trace-row dimension is the TPU vector lane), replacing
the reference's CPU SIMD packing (reference src/eval.rs:67-106, PackedVal at
src/config.rs:57).

Goldilocks (p = 2^64 - 2^32 + 1): two planes, canonical values, reduction via
2^64 ≡ 2^32 - 1 and 2^96 ≡ -1 (mod p) — the TPU-native equivalent of
p3-goldilocks (SURVEY.md §2.2).

BabyBear (p = 2^31 - 2^27 + 1): one plane, values kept in Montgomery form
(R = 2^32) on device; canonical form only at the from_np/to_np boundary —
same internal-form choice as p3-baby-bear.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .host import BABYBEAR, GOLDILOCKS, HostField

u32 = jnp.uint32
_M16 = np.uint32(0xFFFF)
_GL_P_LO = np.uint32(0x00000001)
_GL_P_HI = np.uint32(0xFFFFFFFF)

Fp = Tuple[jnp.ndarray, ...]  # base field array: tuple of u32 planes


def _mul32(a, b):
    """Full 32x32 -> 64 product as (lo, hi) u32, via 16-bit half splits."""
    al = a & _M16
    ah = a >> 16
    bl = b & _M16
    bh = b >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    t = ll + (lh << 16)
    c0 = (t < ll).astype(u32)
    lo = t + (hl << 16)
    c1 = (lo < t).astype(u32)
    hi = hh + (lh >> 16) + (hl >> 16) + c0 + c1  # cannot overflow u32
    return lo, hi


def _add64(a_lo, a_hi, b_lo, b_hi):
    """64-bit add with carry-out: returns (lo, hi, carry)."""
    lo = a_lo + b_lo
    c = (lo < a_lo).astype(u32)
    h = a_hi + b_hi
    c1 = (h < a_hi).astype(u32)
    hi = h + c
    c2 = (hi < h).astype(u32)
    return lo, hi, c1 + c2


def _sub64(a_lo, a_hi, b_lo, b_hi):
    """64-bit subtract with borrow-out: returns (lo, hi, borrow)."""
    lo = a_lo - b_lo
    b0 = (a_lo < b_lo).astype(u32)
    h = a_hi - b_hi
    b1 = (a_hi < b_hi).astype(u32)
    hi = h - b0
    b2 = (h < b0).astype(u32)
    return lo, hi, b1 + b2


def _gl_canon(lo, hi):
    """Map an arbitrary u64 value (< 2^64) to canonical [0, p)."""
    ge = (hi == _GL_P_HI) & (lo >= _GL_P_LO)
    lo2, hi2, _ = _sub64(lo, hi, _GL_P_LO, _GL_P_HI)
    return jnp.where(ge, lo2, lo), jnp.where(ge, hi2, hi)


def _gl_from_u64_with_carry(lo, hi, carry):
    """Reduce carry·2^64 + (hi,lo) (carry ∈ {0,1}) to canonical [0, p).

    carry·2^64 ≡ carry·(2^32 - 1); adding that can wrap at most once more.
    """
    add = jnp.where(carry != 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
    lo1, hi1, c1 = _add64(lo, hi, add, jnp.zeros_like(hi))
    add2 = jnp.where(c1 != 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
    lo2, hi2, _ = _add64(lo1, hi1, add2, jnp.zeros_like(hi1))
    return _gl_canon(lo2, hi2)


class GoldilocksOps:
    """Device ops for Goldilocks.  Element = (lo_plane, hi_plane)."""

    name = "Goldilocks"
    num_planes = 2
    host: HostField = GOLDILOCKS

    def zeros(self, shape) -> Fp:
        z = jnp.zeros(shape, u32)
        return (z, z)

    def const(self, value: int, shape=()) -> Fp:
        value %= GOLDILOCKS.p
        lo = jnp.full(shape, np.uint32(value & 0xFFFFFFFF), u32)
        hi = jnp.full(shape, np.uint32(value >> 32), u32)
        return (lo, hi)

    def add(self, a: Fp, b: Fp) -> Fp:
        lo, hi, c = _add64(a[0], a[1], b[0], b[1])
        return _gl_from_u64_with_carry(lo, hi, c)

    def sub(self, a: Fp, b: Fp) -> Fp:
        lo, hi, brw = _sub64(a[0], a[1], b[0], b[1])
        # on borrow the true value is (hi,lo) + 2^64 - p... i.e. add p back:
        # wrapped result w satisfies w = a - b + 2^64; want a - b + p = w - (2^64 - p)
        # = w - (2^32 - 1).
        sub = jnp.where(brw != 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
        lo2, hi2, _ = _sub64(lo, hi, sub, jnp.zeros_like(hi))
        return (lo2, hi2)

    def neg(self, a: Fp) -> Fp:
        return self.sub(self.zeros(a[0].shape), a)

    def mul(self, a: Fp, b: Fp) -> Fp:
        a0, a1 = a
        b0, b1 = b
        p00_lo, p00_hi = _mul32(a0, b0)
        p01_lo, p01_hi = _mul32(a0, b1)
        p10_lo, p10_hi = _mul32(a1, b0)
        p11_lo, p11_hi = _mul32(a1, b1)
        x0 = p00_lo
        # x1 = p00_hi + p01_lo + p10_lo  (collect carries into x2)
        t = p00_hi + p01_lo
        c0 = (t < p00_hi).astype(u32)
        x1 = t + p10_lo
        c1 = (x1 < t).astype(u32)
        # x2 = p01_hi + p10_hi + p11_lo + c0 + c1 (carries into x3)
        t2 = p01_hi + p10_hi
        d0 = (t2 < p01_hi).astype(u32)
        t3 = t2 + p11_lo
        d1 = (t3 < t2).astype(u32)
        x2 = t3 + (c0 + c1)
        d2 = (x2 < t3).astype(u32)
        x3 = p11_hi + d0 + d1 + d2  # cannot overflow
        return self._reduce128(x0, x1, x2, x3)

    def _reduce128(self, x0, x1, x2, x3) -> Fp:
        """n = x3·2^96 + x2·2^64 + x1·2^32 + x0  ≡  (x1,x0) + x2·(2^32-1) - x3."""
        lo, hi = _gl_canon(x0, x1)
        # x2·(2^32-1) = (x2 << 32) - x2 as a 64-bit value (branchless limbs)
        m_lo = jnp.uint32(0) - x2
        m_hi = x2 - (x2 != 0).astype(u32)
        m_lo, m_hi = _gl_canon(m_lo, m_hi)
        r = self.add((lo, hi), (m_lo, m_hi))
        return self.sub(r, (x3, jnp.zeros_like(x3)))

    def square(self, a: Fp) -> Fp:
        return self.mul(a, a)

    def mul_const(self, a: Fp, value: int) -> Fp:
        return self.mul(a, self.const(value, a[0].shape))

    def pow_const(self, a: Fp, e: int) -> Fp:
        return _pow_const(self, a, e)

    def inv(self, a: Fp) -> Fp:
        """Fermat inverse (zero maps to zero). Fully parallel; for long vectors
        prefer utils.batch_inv (Montgomery trick scan)."""
        return self.pow_const(a, GOLDILOCKS.p - 2)

    def is_zero(self, a: Fp):
        return (a[0] == 0) & (a[1] == 0)

    def eq(self, a: Fp, b: Fp):
        return (a[0] == b[0]) & (a[1] == b[1])

    def select(self, mask, a: Fp, b: Fp) -> Fp:
        return tuple(jnp.where(mask, x, y) for x, y in zip(a, b))

    # -- host boundary ----------------------------------------------------
    def from_np(self, arr) -> Fp:
        arr = np.asarray(arr, np.uint64)
        return (
            jnp.asarray(arr & np.uint64(0xFFFFFFFF), u32),
            jnp.asarray(arr >> np.uint64(32), u32),
        )

    def to_np(self, a: Fp) -> np.ndarray:
        lo = np.asarray(jax.device_get(a[0]), np.uint64)
        hi = np.asarray(jax.device_get(a[1]), np.uint64)
        return lo | (hi << np.uint64(32))


# --- BabyBear (Montgomery form, R = 2^32) -----------------------------------

_BB_P = np.uint32(BABYBEAR.p)
# p' = -p^{-1} mod 2^32
_BB_PPRIME = np.uint32((-pow(BABYBEAR.p, -1, 1 << 32)) % (1 << 32))
_BB_R2 = np.uint32(pow(2, 64, BABYBEAR.p))  # R^2 mod p, for conversions
_BB_RINV = pow(pow(2, 32, BABYBEAR.p), BABYBEAR.p - 2, BABYBEAR.p)


class BabyBearOps:
    """Device ops for BabyBear.  Element = (mont_plane,), Montgomery form."""

    name = "BabyBear"
    num_planes = 1
    host: HostField = BABYBEAR

    def zeros(self, shape) -> Fp:
        return (jnp.zeros(shape, u32),)

    def const(self, value: int, shape=()) -> Fp:
        value = value % BABYBEAR.p * (1 << 32) % BABYBEAR.p  # to Montgomery
        return (jnp.full(shape, np.uint32(value), u32),)

    def _redc(self, t_lo, t_hi) -> jnp.ndarray:
        """Montgomery REDC of a 64-bit value t < p·2^32: returns t·R^-1 mod p."""
        m = t_lo * _BB_PPRIME
        mp_lo, mp_hi = _mul32(m, _BB_P)
        carry = (t_lo != 0).astype(u32)  # (t_lo + mp_lo) ≡ 0 mod 2^32
        del mp_lo
        r = t_hi + mp_hi + carry
        return jnp.where(r >= _BB_P, r - _BB_P, r)

    def add(self, a: Fp, b: Fp) -> Fp:
        s = a[0] + b[0]  # < 2p < 2^32
        return (jnp.where(s >= _BB_P, s - _BB_P, s),)

    def sub(self, a: Fp, b: Fp) -> Fp:
        d = a[0] - b[0]
        return (jnp.where(a[0] < b[0], d + _BB_P, d),)

    def neg(self, a: Fp) -> Fp:
        return (jnp.where(a[0] == 0, a[0], _BB_P - a[0]),)

    def mul(self, a: Fp, b: Fp) -> Fp:
        lo, hi = _mul32(a[0], b[0])
        return (self._redc(lo, hi),)

    def square(self, a: Fp) -> Fp:
        return self.mul(a, a)

    def mul_const(self, a: Fp, value: int) -> Fp:
        return self.mul(a, self.const(value, a[0].shape))

    def pow_const(self, a: Fp, e: int) -> Fp:
        return _pow_const(self, a, e)

    def inv(self, a: Fp) -> Fp:
        return self.pow_const(a, BABYBEAR.p - 2)

    def is_zero(self, a: Fp):
        return a[0] == 0

    def eq(self, a: Fp, b: Fp):
        return a[0] == b[0]

    def select(self, mask, a: Fp, b: Fp) -> Fp:
        return (jnp.where(mask, a[0], b[0]),)

    def from_np(self, arr) -> Fp:
        arr = np.asarray(arr, np.uint64)
        mont = arr * np.uint64(1 << 32) % np.uint64(BABYBEAR.p)
        return (jnp.asarray(mont, u32),)

    def to_np(self, a: Fp) -> np.ndarray:
        mont = np.asarray(jax.device_get(a[0]), np.uint64)
        return mont * np.uint64(_BB_RINV) % np.uint64(BABYBEAR.p)


def _pow_const(F, a: Fp, e: int) -> Fp:
    """Power by a compile-time-constant exponent.  Small exponents unroll;
    large ones (Fermat inverses) run square-and-multiply under lax.scan —
    a deep unrolled mul chain makes backend codegen time explode (XLA:CPU
    LLVM emission is superlinear in chain depth), while a scan compiles the
    one-mul body once."""
    if e == 0:
        return F.const(1, a[0].shape)
    if e.bit_length() <= 8:
        r = None
        b = a
        while e:
            if e & 1:
                r = b if r is None else F.mul(r, b)
            b = F.mul(b, b)
            e >>= 1
        return r
    shape = a[0].shape
    bits = jnp.asarray([(e >> i) & 1 for i in range(e.bit_length())], u32)

    def body(carry, bit):
        acc, base = carry
        acc2 = F.select(bit == 1, F.mul(acc, base), acc)
        base2 = F.mul(base, base)
        return (acc2, base2), None

    one = F.const(1, shape)
    (acc, _), _ = jax.lax.scan(body, (one, a), bits)
    return acc


GL_OPS = GoldilocksOps()
BB_OPS = BabyBearOps()


class ExtOps:
    """Binomial extension ops over a base FieldOps: element = tuple of D base
    elements (coordinate order = basis coefficients, matching the reference's
    BinomialExtensionField).  D=2 products use the 3-mul Karatsuba expansion
    the reference compiles (src/graph.rs:458-473)."""

    def __init__(self, base, degree: int, w: int):
        self.base = base
        self.D = degree
        self.w = w
        self.name = f"{base.name}^{degree}"

    def zeros(self, shape):
        return tuple(self.base.zeros(shape) for _ in range(self.D))

    def const(self, coords: Sequence[int], shape=()):
        return tuple(self.base.const(int(c), shape) for c in coords)

    def from_base(self, a: Fp):
        shape = a[0].shape
        return (a,) + tuple(self.base.zeros(shape) for _ in range(self.D - 1))

    def add(self, a, b):
        return tuple(self.base.add(x, y) for x, y in zip(a, b))

    def sub(self, a, b):
        return tuple(self.base.sub(x, y) for x, y in zip(a, b))

    def neg(self, a):
        return tuple(self.base.neg(x) for x in a)

    def scale(self, a, s: Fp):
        """Multiply by a base-field element."""
        return tuple(self.base.mul(x, s) for x in a)

    def mul(self, a, b):
        f = self.base
        if self.D == 2:
            # Karatsuba: t0 = a0 b0, t1 = a1 b1, t2 = (a0+a1)(b0+b1)
            t0 = f.mul(a[0], b[0])
            t1 = f.mul(a[1], b[1])
            t2 = f.mul(f.add(a[0], a[1]), f.add(b[0], b[1]))
            c0 = f.add(t0, f.mul_const(t1, self.w))
            c1 = f.sub(t2, f.add(t0, t1))
            return (c0, c1)
        # schoolbook with X^D = W wraparound
        D = self.D
        out = [None] * D
        for i in range(D):
            for j in range(D):
                t = f.mul(a[i], b[j])
                k = i + j
                if k >= D:
                    k -= D
                    t = f.mul_const(t, self.w)
                out[k] = t if out[k] is None else f.add(out[k], t)
        return tuple(out)

    def square(self, a):
        return self.mul(a, a)

    def pow_const(self, a, e: int):
        shape = a[0][0].shape
        r = self.from_base(self.base.const(1, shape))
        b = a
        while e:
            if e & 1:
                r = self.mul(r, b)
            b = self.mul(b, b)
            e >>= 1
        return r

    def inv(self, a):
        """Norm-map inverse: D=2 direct; D=4 via the X -> -X conjugate tower.
        Zero maps to zero (base inv is Fermat)."""
        f = self.base
        if self.D == 2:
            a0, a1 = a
            norm = f.sub(f.square(a0), f.mul_const(f.square(a1), self.w))
            ninv = f.inv(norm)
            return (f.mul(a0, ninv), f.neg(f.mul(a1, ninv)))
        if self.D == 4:
            # b = a · conj(a) where conj negates odd coords; b has only even
            # coords (c0 + c2·u with u = X^2, u^2 = W)
            conj = (a[0], f.neg(a[1]), a[2], f.neg(a[3]))
            b = self.mul(a, conj)
            c0, c2 = b[0], b[2]
            norm = f.sub(f.square(c0), f.mul_const(f.square(c2), self.w))
            ninv = f.inv(norm)
            # (c0 + c2 u)^{-1} = (c0 - c2 u)/norm ; lift back to degree 4
            d = (f.mul(c0, ninv), f.zeros(c0[0].shape), f.neg(f.mul(c2, ninv)), f.zeros(c0[0].shape))
            return self.mul(conj, d)
        raise NotImplementedError(f"inv for degree {self.D}")

    def is_zero(self, a):
        m = self.base.is_zero(a[0])
        for c in a[1:]:
            m = m & self.base.is_zero(c)
        return m

    def select(self, mask, a, b):
        return tuple(self.base.select(mask, x, y) for x, y in zip(a, b))

    # -- host boundary ----------------------------------------------------
    def from_host(self, coords: Sequence[int], shape=()):
        return self.const(coords, shape)

    def from_np(self, arr):
        """arr: uint64 ndarray with trailing dim D."""
        arr = np.asarray(arr, np.uint64)
        return tuple(self.base.from_np(arr[..., i]) for i in range(self.D))

    def to_np(self, a):
        return np.stack([self.base.to_np(c) for c in a], axis=-1)


GL2_OPS = ExtOps(GL_OPS, 2, 7)
BB4_OPS = ExtOps(BB_OPS, 4, 11)
