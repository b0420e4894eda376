"""Pins for the vectorized claims transcript + accumulator paths against
the scalar references (reference prover.rs:353-387): the byte stream and the
accumulator value must be IDENTICAL for list input, ndarray input, and the
per-element loop, for both host fields."""

import numpy as np
import pytest

from multistark_tpu.challenger import (
    SerializingChallenger64,
    _canonical_claims_array,
    observe_claims,
)
from multistark_tpu.fields.host import (
    BABYBEAR,
    BABYBEAR_EXT4,
    GOLDILOCKS,
    GOLDILOCKS_EXT2,
)
from multistark_tpu.lookup import claims_accumulator, fingerprint

RNG = np.random.default_rng(23)


def scalar_accumulator(he, beta, gamma, claims):
    acc = he.zero
    for c in claims:
        acc = he.add(acc, he.inv(he.add(beta, fingerprint(he, gamma, [int(v) for v in c]))))
    return acc


@pytest.mark.parametrize("he", [GOLDILOCKS_EXT2, BABYBEAR_EXT4], ids=["gl2", "bb4"])
@pytest.mark.parametrize("n,L", [(1, 4), (5, 4), (33, 4), (100, 7), (257, 2)])
def test_accumulator_matches_scalar(he, n, L):
    p = he.base.p
    beta = tuple(int(v) for v in RNG.integers(0, p, he.D, dtype=np.uint64))
    gamma = tuple(int(v) for v in RNG.integers(0, p, he.D, dtype=np.uint64))
    lst = [[int(v) for v in RNG.integers(0, p, L, dtype=np.uint64)] for _ in range(n)]
    want = scalar_accumulator(he, beta, gamma, lst)
    assert claims_accumulator(he, beta, gamma, lst) == want
    assert claims_accumulator(he, beta, gamma, np.asarray(lst, np.uint64)) == want


def test_observe_claims_byte_identical():
    G, he = GOLDILOCKS, GOLDILOCKS_EXT2
    lst = [[int(v) for v in RNG.integers(0, G.p, 4, dtype=np.uint64)] for _ in range(64)]
    chs = [SerializingChallenger64(G, he) for _ in range(3)]
    chs[0].observe_claims(lst)
    chs[1].observe_claims(np.asarray(lst, np.uint64))
    chs[2].observe_u64(len(lst))
    for c in lst:
        chs[2].observe_u64(len(c))
        for v in c:
            chs[2].observe_field(int(v))
    bufs = [bytes(ch.inner.input_buffer) for ch in chs]
    assert bufs[0] == bufs[1] == bufs[2]
    assert chs[0].sample_ext() == chs[2].sample_ext()


def test_observe_claims_heterogeneous_fallback():
    G, he = GOLDILOCKS, GOLDILOCKS_EXT2
    hc = [[1, 2, 3], [4, 5]]
    ch1, ch2 = SerializingChallenger64(G, he), SerializingChallenger64(G, he)
    observe_claims(ch1, hc)
    ch2.observe_u64(2)
    for c in hc:
        ch2.observe_u64(len(c))
        for v in c:
            ch2.observe_field(v)
    assert bytes(ch1.inner.input_buffer) == bytes(ch2.inner.input_buffer)


def test_canonical_claims_array_reduces_mod_p():
    p = GOLDILOCKS.p
    arr = np.asarray([[p, p + 1, 5, 1 << 63]], np.uint64)
    got = _canonical_claims_array(arr, p)
    assert got.tolist() == [[0, 1, 5, 1 << 63]]
    assert _canonical_claims_array(np.empty((0, 4), np.uint64), p) is None


def test_zero_denominator_raises():
    """beta chosen so one claim's denominator is exactly zero: every path
    (scalar, NumPy, native C) must raise like the scalar reference."""
    he = GOLDILOCKS_EXT2
    gamma = (3, 4)
    claims = [[int(v) for v in RNG.integers(0, he.base.p, 4, dtype=np.uint64)]
              for _ in range(40)]
    fp = fingerprint(he, gamma, claims[7])
    beta = he.neg(fp)
    with pytest.raises(ZeroDivisionError):
        scalar_accumulator(he, beta, gamma, claims)
    with pytest.raises(ZeroDivisionError):
        claims_accumulator(he, beta, gamma, claims)
    with pytest.raises(ZeroDivisionError):
        claims_accumulator(he, beta, gamma, np.asarray(claims, np.uint64))
