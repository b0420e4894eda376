"""Merkle MMCS: device commit vs naive host tree; open/verify round-trips;
tamper rejection (SURVEY.md §7.1 step 3)."""

import numpy as np
import pytest

from multistark_tpu.fields.device import GL_OPS
from multistark_tpu.fields.host import GOLDILOCKS
from multistark_tpu.hash.blake3 import blake3_hash, bytes_to_digest
from multistark_tpu.merkle import Blake3FieldHasher, MerkleMmcs

RNG = np.random.default_rng(11)


def rand_mat(w, n):
    return RNG.integers(0, GOLDILOCKS.p, size=(w, n), dtype=np.uint64)


def naive_root(mats_np, cap_height=0):
    """Independent host reconstruction of the tree (bytes-level)."""
    heights = sorted({m.shape[1] for m in mats_np}, reverse=True)
    by_h = {h: [m for m in mats_np if m.shape[1] == h] for h in heights}

    def hash_rows(h, i):
        data = b"".join(
            int(m[c, i]).to_bytes(8, "little") for m in by_h[h] for c in range(m.shape[0])
        )
        return blake3_hash(data)

    size = heights[0]
    layer = [hash_rows(size, i) for i in range(size)]
    while size > (1 << cap_height):
        size >>= 1
        layer = [blake3_hash(layer[2 * i] + layer[2 * i + 1]) for i in range(size)]
        if size in by_h:
            layer = [blake3_hash(layer[i] + hash_rows(size, i)) for i in range(size)]
    return [bytes_to_digest(d) for d in layer]


class TestMmcs:
    def setup_method(self):
        self.mmcs = MerkleMmcs(Blake3FieldHasher(GL_OPS))

    def test_single_matrix_root_matches_naive(self):
        m = rand_mat(3, 8)
        cap, _ = self.mmcs.commit([GL_OPS.from_np(m)])
        np.testing.assert_array_equal(cap[0], naive_root([m])[0])

    def test_mixed_heights_root_matches_naive(self):
        mats = [rand_mat(2, 16), rand_mat(4, 4), rand_mat(1, 16), rand_mat(3, 8)]
        cap, _ = self.mmcs.commit([GL_OPS.from_np(m) for m in mats])
        np.testing.assert_array_equal(cap[0], naive_root(mats)[0])

    def test_open_verify_all_indices(self):
        mats = [rand_mat(2, 16), rand_mat(3, 4)]
        dmats = [GL_OPS.from_np(m) for m in mats]
        cap, data = self.mmcs.commit(dmats)
        dims = [(2, 16), (3, 4)]
        openings = self.mmcs.open_batch(data, np.arange(16))
        for i, op in enumerate(openings):
            assert self.mmcs.verify_batch(cap, dims, i, op)
            np.testing.assert_array_equal(op.opened_rows[0], mats[0][:, i])
            np.testing.assert_array_equal(op.opened_rows[1], mats[1][:, i >> 2])

    def test_tampered_row_and_path_fail(self):
        mats = [rand_mat(2, 8)]
        cap, data = self.mmcs.commit([GL_OPS.from_np(m) for m in mats])
        dims = [(2, 8)]
        (op,) = self.mmcs.open_batch(data, np.array([5]))
        assert self.mmcs.verify_batch(cap, dims, 5, op)
        op.opened_rows[0] = op.opened_rows[0].copy()
        op.opened_rows[0][1] ^= 1
        assert not self.mmcs.verify_batch(cap, dims, 5, op)
        op.opened_rows[0][1] ^= 1
        op.path = op.path.copy()
        op.path[1, 3] ^= 1
        assert not self.mmcs.verify_batch(cap, dims, 5, op)
        op.path[1, 3] ^= 1
        assert not self.mmcs.verify_batch(cap, dims, 4, op)  # wrong index

    def test_cap_height(self):
        mmcs = MerkleMmcs(Blake3FieldHasher(GL_OPS), cap_height=2)
        mats = [rand_mat(2, 16)]
        cap, data = mmcs.commit([GL_OPS.from_np(m) for m in mats])
        assert cap.shape == (4, 8)
        naive = naive_root(mats, cap_height=2)
        for i in range(4):
            np.testing.assert_array_equal(cap[i], naive[i])
        (op,) = mmcs.open_batch(data, np.array([9]))
        assert op.path.shape == (2, 8)
        assert mmcs.verify_batch(cap, [(2, 16)], 9, op)


class TestSubCapGuard:
    def test_sub_cap_matrix_rejected(self):
        """A matrix shorter than the cap would never be injected into any
        digest (silently unbound) — commit must refuse the combination
        (round-1 advisor finding)."""
        from multistark_tpu.merkle import Blake3FieldHasher, MerkleMmcs

        mmcs = MerkleMmcs(Blake3FieldHasher(GL_OPS), cap_height=2)
        tall = GL_OPS.from_np(np.arange(16, dtype=np.uint64).reshape(2, 8))
        short = GL_OPS.from_np(np.arange(2, dtype=np.uint64).reshape(1, 2))
        with pytest.raises(AssertionError, match="below cap"):
            mmcs.commit([tall, short])
