"""NTT/LDE kernels pinned against naive O(n^2) NumPy evaluation."""

import numpy as np

from multistark_tpu.fields import npref
from multistark_tpu.fields.device import BB_OPS, GL_OPS
from multistark_tpu.fields.host import BABYBEAR, GOLDILOCKS
from multistark_tpu.ntt import get_engine
from multistark_tpu.ntt.ntt import np_powers
from multistark_tpu.utils import bit_reverse_indices

RNG = np.random.default_rng(42)


def naive_gl_eval(coeffs: np.ndarray, points: np.ndarray) -> np.ndarray:
    """Horner evaluation of each row-polynomial at each point (uint64)."""
    w, n = coeffs.shape
    out = np.zeros((w, len(points)), np.uint64)
    for j, x in enumerate(points):
        acc = np.zeros(w, np.uint64)
        for i in range(n - 1, -1, -1):
            acc = npref.gl_add(npref.gl_mul(acc, np.uint64(x)), coeffs[:, i])
        out[:, j] = acc
    return out


def rand_mat(w, n):
    return RNG.integers(0, GOLDILOCKS.p, size=(w, n), dtype=np.uint64)


class TestGoldilocksNtt:
    def test_dft_natural_matches_naive(self):
        eng = get_engine(GL_OPS)
        log_n, w = 4, 3
        n = 1 << log_n
        coeffs = rand_mat(w, n)
        g = GOLDILOCKS.two_adic_generator(log_n)
        points = np_powers(GOLDILOCKS, g, n)
        want = naive_gl_eval(coeffs, points)
        got = GL_OPS.to_np(eng.dft_natural(GL_OPS.from_np(coeffs), log_n))
        np.testing.assert_array_equal(got, want)

    def test_idft_roundtrip(self):
        eng = get_engine(GL_OPS)
        log_n, w = 5, 2
        coeffs = rand_mat(w, 1 << log_n)
        evals = eng.dft_natural(GL_OPS.from_np(coeffs), log_n)
        back = GL_OPS.to_np(eng.idft_natural(evals, log_n))
        np.testing.assert_array_equal(back, coeffs)

    def test_coset_eval_bitrev(self):
        eng = get_engine(GL_OPS)
        log_n, w = 4, 2
        n = 1 << log_n
        shift = GOLDILOCKS.generator
        coeffs = rand_mat(w, n)
        g = GOLDILOCKS.two_adic_generator(log_n)
        pts = npref.gl_mul(np_powers(GOLDILOCKS, g, n), np.uint64(shift))
        want_natural = naive_gl_eval(coeffs, pts)
        got = GL_OPS.to_np(eng.coset_eval_bitrev(GL_OPS.from_np(coeffs), log_n, shift))
        rev = bit_reverse_indices(log_n)
        np.testing.assert_array_equal(got, want_natural[:, rev])

    def test_coset_lde_bitrev_matches_naive(self):
        """The commit transform: natural evals on H_n -> bitrev evals on
        shift·H_N (pin for the reference identity at src/prover.rs:971-999)."""
        eng = get_engine(GL_OPS)
        log_n, log_blowup, w = 3, 2, 2
        n, N = 1 << log_n, 1 << (log_n + log_blowup)
        shift = GOLDILOCKS.generator
        coeffs = rand_mat(w, n)
        dc = GL_OPS.from_np(coeffs)
        evals = eng.dft_natural(dc, log_n)
        lde = GL_OPS.to_np(eng.coset_lde_bitrev(evals, log_n, log_blowup, shift))
        G = GOLDILOCKS.two_adic_generator(log_n + log_blowup)
        pts = npref.gl_mul(np_powers(GOLDILOCKS, G, N), np.uint64(shift))
        want_natural = naive_gl_eval(coeffs, pts)
        rev = bit_reverse_indices(log_n + log_blowup)
        np.testing.assert_array_equal(lde, want_natural[:, rev])

    def test_prefix_to_natural(self):
        """Stored-prefix == same-shift sub-coset (src/prover.rs:606-679 trick)."""
        eng = get_engine(GL_OPS)
        log_n, log_blowup = 3, 2
        log_sub = log_n + 1  # quotient-degree-2 style subdomain
        n = 1 << log_n
        shift = GOLDILOCKS.generator
        coeffs = rand_mat(2, n)
        evals = eng.dft_natural(GL_OPS.from_np(coeffs), log_n)
        lde = eng.coset_lde_bitrev(evals, log_n, log_blowup, shift)
        got = GL_OPS.to_np(eng.prefix_to_natural(lde, log_sub))
        g_sub = GOLDILOCKS.two_adic_generator(log_sub)
        pts = npref.gl_mul(np_powers(GOLDILOCKS, g_sub, 1 << log_sub), np.uint64(shift))
        want = naive_gl_eval(coeffs, pts)
        np.testing.assert_array_equal(got, want)

    def test_lde_bitrev_from_coeffs(self):
        eng = get_engine(GL_OPS)
        log_n, log_big = 3, 5
        coeffs = rand_mat(2, 1 << log_n)
        got = GL_OPS.to_np(eng.lde_bitrev_from_coeffs(GL_OPS.from_np(coeffs), log_big))
        G = GOLDILOCKS.two_adic_generator(log_big)
        pts = np_powers(GOLDILOCKS, G, 1 << log_big)
        want = naive_gl_eval(coeffs, pts)
        rev = bit_reverse_indices(log_big)
        np.testing.assert_array_equal(got, want[:, rev])


class TestBabyBearNtt:
    def test_roundtrip_and_coset(self):
        eng = get_engine(BB_OPS)
        log_n, w = 4, 2
        coeffs = RNG.integers(0, BABYBEAR.p, size=(w, 1 << log_n), dtype=np.uint64)
        dc = BB_OPS.from_np(coeffs)
        evals = eng.dft_natural(dc, log_n)
        back = BB_OPS.to_np(eng.idft_natural(evals, log_n))
        np.testing.assert_array_equal(back, coeffs)
        lde = BB_OPS.to_np(eng.coset_lde_bitrev(evals, log_n, 1, BABYBEAR.generator))
        assert lde.shape == (w, 1 << (log_n + 1))
        # spot-check point 0 of the bitrev LDE = p(shift·1)
        acc = np.zeros(w, np.uint64)
        for i in range(coeffs.shape[1] - 1, -1, -1):
            acc = npref.bb_add(npref.bb_mul(acc, np.uint64(BABYBEAR.generator)), coeffs[:, i])
        np.testing.assert_array_equal(lde[:, 0], acc)


class TestRadix8Fusion:
    """The fused radix-8 stage triples (ntt._dif_stage3/_dit_stage3) must be
    value-identical to the radix-2 chain and the np mirrors at every size
    and parity of log_n (remainder stages), forward and inverse."""

    def test_dif_dit_radix8_match_mirrors(self, monkeypatch):
        import os

        monkeypatch.setenv("MULTISTARK_RADIX8", "1")
        from multistark_tpu.fields.device import GL_OPS
        from multistark_tpu.ntt.ntt import get_engine

        eng = get_engine(GL_OPS)
        rng = np.random.default_rng(88)
        for log_n in range(1, 11):
            n = 1 << log_n
            x = rng.integers(0, GOLDILOCKS.p, (3, n), dtype=np.uint64)
            for inverse in (False, True):
                tw = tuple(eng._twiddles(log_n, inverse))
                got_dif = GL_OPS.to_np(eng._dif_impl(GL_OPS.from_np(x), tw))
                want_dif = eng._dif_np(x.copy(), log_n, inverse)
                assert np.array_equal(got_dif, want_dif), (log_n, inverse, "dif")
                got_dit = GL_OPS.to_np(eng._dit_impl(GL_OPS.from_np(x), tw))
                want_dit = eng._dit_np(x.copy(), log_n, inverse)
                assert np.array_equal(got_dit, want_dit), (log_n, inverse, "dit")

    def test_radix8_roundtrip(self, monkeypatch):
        monkeypatch.setenv("MULTISTARK_RADIX8", "1")
        from multistark_tpu.fields.device import GL_OPS
        from multistark_tpu.ntt.ntt import get_engine

        eng = get_engine(GL_OPS)
        rng = np.random.default_rng(89)
        for log_n in (6, 9):
            n = 1 << log_n
            x = rng.integers(0, GOLDILOCKS.p, (2, n), dtype=np.uint64)
            evals = eng.dft_natural(GL_OPS.from_np(x), log_n)
            back = GL_OPS.to_np(eng.idft_natural(evals, log_n))
            assert np.array_equal(back, x)
