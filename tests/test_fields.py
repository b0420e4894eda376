"""Device field kernels pinned against host/NumPy references (SURVEY.md §4:
per-kernel pins against a slow NumPy reference)."""

import numpy as np
import pytest

from multistark_tpu.fields import device as dev
from multistark_tpu.fields import npref
from multistark_tpu.fields.host import BABYBEAR, BABYBEAR_EXT4, GOLDILOCKS, GOLDILOCKS_EXT2
from multistark_tpu.utils import batch_inv, cumsum

P = GOLDILOCKS.p
RNG = np.random.default_rng(0xC0FFEE)


def rand_gl(n):
    return RNG.integers(0, P, size=n, dtype=np.uint64)


EDGE = np.array(
    [0, 1, 2, P - 1, P - 2, 0xFFFFFFFF, 0x100000000, P >> 1, (P + 1) >> 1],
    dtype=np.uint64,
)


def _pairs(n=512):
    a = np.concatenate([EDGE, rand_gl(n)])
    b = np.concatenate([EDGE[::-1], rand_gl(n)])
    return a, b


class TestGoldilocksNumpyRef:
    """The NumPy reference itself vs python ints."""

    def test_ops(self):
        a, b = _pairs(128)
        for i in range(len(a)):
            ai, bi = int(a[i]), int(b[i])
            assert int(npref.gl_add(a, b)[i]) == (ai + bi) % P
            assert int(npref.gl_sub(a, b)[i]) == (ai - bi) % P
            assert int(npref.gl_mul(a, b)[i]) == (ai * bi) % P
        nz = a[a != 0]
        inv = npref.gl_inv(nz)
        assert np.all(npref.gl_mul(nz, inv) == 1)


class TestGoldilocksDevice:
    def test_add_sub_mul(self):
        a, b = _pairs()
        da, db = dev.GL_OPS.from_np(a), dev.GL_OPS.from_np(b)
        np.testing.assert_array_equal(dev.GL_OPS.to_np(dev.GL_OPS.add(da, db)), npref.gl_add(a, b))
        np.testing.assert_array_equal(dev.GL_OPS.to_np(dev.GL_OPS.sub(da, db)), npref.gl_sub(a, b))
        np.testing.assert_array_equal(dev.GL_OPS.to_np(dev.GL_OPS.mul(da, db)), npref.gl_mul(a, b))
        np.testing.assert_array_equal(dev.GL_OPS.to_np(dev.GL_OPS.neg(da)), npref.gl_neg(a))

    def test_inv_and_pow(self):
        a = np.concatenate([EDGE, rand_gl(64)])
        da = dev.GL_OPS.from_np(a)
        inv = dev.GL_OPS.to_np(dev.GL_OPS.inv(da))
        for i, x in enumerate(a):
            assert int(inv[i]) == (0 if x == 0 else GOLDILOCKS.inv(int(x)))
        p7 = dev.GL_OPS.to_np(dev.GL_OPS.pow_const(da, 7))
        np.testing.assert_array_equal(p7, npref.gl_pow(a, 7))

    def test_batch_inv(self):
        a = np.concatenate([EDGE, rand_gl(100)])
        out = dev.GL_OPS.to_np(batch_inv(dev.GL_OPS, dev.GL_OPS.from_np(a)))
        for i, x in enumerate(a):
            assert int(out[i]) == (0 if x == 0 else GOLDILOCKS.inv(int(x)))

    def test_cumsum(self):
        a = rand_gl(257)
        out = dev.GL_OPS.to_np(cumsum(dev.GL_OPS, dev.GL_OPS.from_np(a)))
        acc = 0
        for i, x in enumerate(a):
            acc = (acc + int(x)) % P
            assert int(out[i]) == acc


class TestGoldilocksExt2Device:
    def test_mul_matches_host_schoolbook(self):
        E = GOLDILOCKS_EXT2
        a = rand_gl(2 * 64).reshape(64, 2)
        b = rand_gl(2 * 64).reshape(64, 2)
        da, db = dev.GL2_OPS.from_np(a), dev.GL2_OPS.from_np(b)
        got = dev.GL2_OPS.to_np(dev.GL2_OPS.mul(da, db))
        for i in range(64):
            want = E.mul(tuple(int(x) for x in a[i]), tuple(int(x) for x in b[i]))
            assert tuple(int(x) for x in got[i]) == want

    def test_inv(self):
        E = GOLDILOCKS_EXT2
        a = rand_gl(2 * 32).reshape(32, 2)
        got = dev.GL2_OPS.to_np(dev.GL2_OPS.inv(dev.GL2_OPS.from_np(a)))
        for i in range(32):
            want = E.inv(tuple(int(x) for x in a[i]))
            assert tuple(int(x) for x in got[i]) == want

    def test_batch_inv_ext(self):
        E = GOLDILOCKS_EXT2
        a = rand_gl(2 * 33).reshape(33, 2)
        a[5] = 0  # a zero element
        got = dev.GL2_OPS.to_np(batch_inv(dev.GL2_OPS, dev.GL2_OPS.from_np(a), axis=0))
        for i in range(33):
            x = tuple(int(v) for v in a[i])
            want = E.zero if E.is_zero(x) else E.inv(x)
            assert tuple(int(v) for v in got[i]) == want


class TestBabyBear:
    def test_device_matches_host(self):
        p = BABYBEAR.p
        a = RNG.integers(0, p, size=256, dtype=np.uint64)
        b = RNG.integers(0, p, size=256, dtype=np.uint64)
        da, db = dev.BB_OPS.from_np(a), dev.BB_OPS.from_np(b)
        np.testing.assert_array_equal(dev.BB_OPS.to_np(dev.BB_OPS.add(da, db)), npref.bb_add(a, b))
        np.testing.assert_array_equal(dev.BB_OPS.to_np(dev.BB_OPS.sub(da, db)), npref.bb_sub(a, b))
        np.testing.assert_array_equal(dev.BB_OPS.to_np(dev.BB_OPS.mul(da, db)), npref.bb_mul(a, b))
        nz = a[a != 0]
        inv = dev.BB_OPS.to_np(dev.BB_OPS.inv(dev.BB_OPS.from_np(nz)))
        np.testing.assert_array_equal(npref.bb_mul(nz, inv), np.ones_like(nz))

    def test_ext4(self):
        E = BABYBEAR_EXT4
        p = BABYBEAR.p
        a = RNG.integers(0, p, size=(16, 4), dtype=np.uint64)
        b = RNG.integers(0, p, size=(16, 4), dtype=np.uint64)
        got = dev.BB4_OPS.to_np(dev.BB4_OPS.mul(dev.BB4_OPS.from_np(a), dev.BB4_OPS.from_np(b)))
        for i in range(16):
            want = E.mul(tuple(int(x) for x in a[i]), tuple(int(x) for x in b[i]))
            assert tuple(int(x) for x in got[i]) == want
        inv = dev.BB4_OPS.to_np(dev.BB4_OPS.inv(dev.BB4_OPS.from_np(a)))
        for i in range(16):
            want = E.inv(tuple(int(x) for x in a[i]))
            assert tuple(int(x) for x in inv[i]) == want


class TestHostExt:
    def test_ext_field_axioms(self):
        for E in (GOLDILOCKS_EXT2, BABYBEAR_EXT4):
            rng = np.random.default_rng(7)
            p = E.base.p
            for _ in range(20):
                a = tuple(int(x) for x in rng.integers(0, p, E.D, dtype=np.uint64))
                b = tuple(int(x) for x in rng.integers(0, p, E.D, dtype=np.uint64))
                c = tuple(int(x) for x in rng.integers(0, p, E.D, dtype=np.uint64))
                assert E.mul(a, E.add(b, c)) == E.add(E.mul(a, b), E.mul(a, c))
                assert E.mul(a, b) == E.mul(b, a)
                if not E.is_zero(a):
                    assert E.mul(a, E.inv(a)) == E.one


class TestExtPack:
    def test_ext_pack_unpack_matches_ext_scalar(self):
        """ext_pack rows unpack to the exact ext_scalar device structure
        (the packed transcript-scalar upload path, utils.ext_pack)."""
        import numpy as np

        from multistark_tpu.configs import GoldilocksBlake3Config
        from multistark_tpu.config import CommitmentParameters, FriParameters
        from multistark_tpu.utils import ext_pack, ext_scalar, ext_unpack

        cfg = GoldilocksBlake3Config(
            CommitmentParameters(2, 0), FriParameters(0, 1, 4, 0, 0)
        )
        E = cfg.ext
        vals = [(123456789012345678, 3), (0, cfg.host_field.p - 1), (7, 8)]
        pk = ext_pack(E, vals)
        for i, v in enumerate(vals):
            want = ext_scalar(E, v)
            got = ext_unpack(E, pk, i)
            for wc, gc in zip(want, got):
                for wp, gp in zip(wc, gc):
                    assert np.asarray(wp) == np.asarray(gp)
