"""Two-adic multiplicative coset domains + (unnormalized) Lagrange selectors.

Equivalent of p3-commit's TwoAdicMultiplicativeCoset / PolynomialSpace
surface the reference consumes (SURVEY.md §2.2).  The selector formulas are
the *unnormalized* p3 ones — with v = x/shift:

    Z_H(x)        = v^n - 1
    is_first_row  = Z_H / (v - 1)          (value n   at the first point)
    is_last_row   = Z_H / (v - g^{-1})     (value n·g at the last point)
    is_transition = v - g^{-1}
    inv_vanishing = 1 / Z_H

The protocol depends on these exact constants: the logUp boundary injection
absorbs 1/(n·g) (reference src/lookup.rs:298-304, pinned by the
selector_normalization_constants test at src/lookup.rs:689-756 — mirrored in
tests/test_domains.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import Tuple

import numpy as np

from .fields import npref
from .fields.host import HostExtField, HostField
from .ntt.ntt import np_powers


@dataclass(frozen=True)
class TwoAdicCoset:
    field: HostField
    log_n: int
    shift: int  # canonical int

    @property
    def size(self) -> int:
        return 1 << self.log_n

    @property
    def gen(self) -> int:
        return self.field.two_adic_generator(self.log_n)

    @property
    def first_point(self) -> int:
        return self.shift

    def next_point_ext(self, ext: HostExtField, x: Tuple[int, ...]) -> Tuple[int, ...]:
        return ext.scale(x, self.gen)

    def create_disjoint_domain(self, min_size: int) -> "TwoAdicCoset":
        """Coset disjoint from self (and from any other domain built this
        way from a same-shift domain): multiply the shift by the field
        generator (p3 convention, used for the quotient domain at reference
        src/prover.rs:452-453)."""
        log = (min_size - 1).bit_length()  # log2_ceil
        return TwoAdicCoset(self.field, log, self.field.mul(self.shift, self.field.generator))

    # -- selectors ---------------------------------------------------------
    def selectors_at_point(self, ext: HostExtField, zeta: Tuple[int, ...]):
        """Selectors at an out-of-domain extension point (verifier OOD check,
        reference src/verifier.rs:427)."""
        F = self.field
        v = ext.scale(zeta, F.inv(self.shift))
        vn = v
        for _ in range(self.log_n):
            vn = ext.square(vn)
        z_h = ext.sub(vn, ext.one)
        g_inv = F.inv(self.gen)
        first = ext.div(z_h, ext.sub(v, ext.one))
        last_den = ext.sub(v, ext.from_base(g_inv))
        last = ext.div(z_h, last_den)
        return LagrangeSelectorsAtPoint(
            is_first_row=first,
            is_last_row=last,
            is_transition=last_den,
            inv_vanishing=ext.inv(z_h),
        )

    def selectors_on_coset(self, coset: "TwoAdicCoset") -> "LagrangeSelectorsOnCoset":
        """Selectors of THIS domain evaluated at every point of `coset`
        (natural order) — the quotient-domain selectors (reference
        src/prover.rs:775-794).  Host-precomputed numpy, cached."""
        assert coset.log_n >= self.log_n
        return _selectors_on_coset_cached(
            self.field, self.log_n, self.shift, coset.log_n, coset.shift
        )


@dataclass(frozen=True)
class LagrangeSelectorsAtPoint:
    is_first_row: Tuple[int, ...]
    is_last_row: Tuple[int, ...]
    is_transition: Tuple[int, ...]
    inv_vanishing: Tuple[int, ...]


@dataclass(frozen=True)
class LagrangeSelectorsOnCoset:
    """uint64 numpy arrays over the evaluation coset, natural order."""

    is_first_row: np.ndarray
    is_last_row: np.ndarray
    is_transition: np.ndarray
    inv_vanishing: np.ndarray


@lru_cache(maxsize=64)
def _selectors_on_coset_cached(
    field: HostField, log_n: int, shift: int, log_big: int, big_shift: int
) -> LagrangeSelectorsOnCoset:
    assert field.name == "Goldilocks" or field.name == "BabyBear"
    mul, powf, inv_vec = (
        (npref.gl_mul, npref.gl_pow, npref.gl_inv)
        if field.name == "Goldilocks"
        else (npref.bb_mul, npref.bb_pow, npref.bb_inv)
    )
    sub = npref.gl_sub if field.name == "Goldilocks" else npref.bb_sub
    n = 1 << log_n
    N = 1 << log_big
    # v_i = (big_shift / shift) · G^i  over the big coset, natural order
    s = field.mul(big_shift, field.inv(shift))
    G = field.two_adic_generator(log_big)
    v = mul(np_powers(field, G, N), np.uint64(s))
    # v^n has period q = N/n: compute q values and tile
    q = N >> log_n
    vn_head = powf(v[:q], n)
    z_h = sub(np.tile(vn_head, n), np.uint64(1))
    g_inv = field.inv(field.two_adic_generator(log_n))
    first_den = sub(v, np.uint64(1))
    last_den = sub(v, np.uint64(g_inv))
    inv_all = inv_vec(np.concatenate([first_den, last_den, z_h]))
    first = mul(z_h, inv_all[:N])
    last = mul(z_h, inv_all[N : 2 * N])
    return LagrangeSelectorsOnCoset(
        is_first_row=first,
        is_last_row=last,
        is_transition=last_den,
        inv_vanishing=inv_all[2 * N :],
    )
