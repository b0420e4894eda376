"""BLAKE3 host vs spec vector, device vs host (SURVEY.md §7.1 step 3)."""

import numpy as np
import pytest

from multistark_tpu.hash.blake3 import Blake3Device, blake3_compress_pair, blake3_hash

RNG = np.random.default_rng(3)

# Official BLAKE3 empty-input digest (public spec test vector).
EMPTY_DIGEST = bytes.fromhex(
    "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262"
)


class TestHost:
    def test_empty_vector(self):
        assert blake3_hash(b"") == EMPTY_DIGEST

    def test_incremental_lengths_differ(self):
        seen = set()
        data = bytes(i % 251 for i in range(4096))
        for ln in [0, 1, 63, 64, 65, 1023, 1024, 1025, 2048, 3072, 4096]:
            d = blake3_hash(data[:ln])
            assert len(d) == 32 and d not in seen
            seen.add(d)

    def test_compress_pair_is_hash_of_concat(self):
        a, b = bytes(range(32)), bytes(range(32, 64))
        assert blake3_compress_pair(a, b) == blake3_hash(a + b)


class TestDevice:
    @pytest.mark.parametrize("n_words", [8, 16, 30, 256, 272, 1000, 5250])
    def test_hash_words_matches_host(self, n_words):
        B = 5
        words = RNG.integers(0, 1 << 32, size=(B, n_words), dtype=np.uint32)
        got = np.asarray(Blake3Device.hash_words(words))
        for i in range(B):
            msg = b"".join(int(w).to_bytes(4, "little") for w in words[i])
            want = np.frombuffer(blake3_hash(msg), dtype="<u4")
            np.testing.assert_array_equal(got[i], want)

    def test_compress_pairs_matches_host(self):
        B = 7
        l = RNG.integers(0, 1 << 32, size=(B, 8), dtype=np.uint32)
        r = RNG.integers(0, 1 << 32, size=(B, 8), dtype=np.uint32)
        got = np.asarray(Blake3Device.compress_pairs(l, r))
        for i in range(B):
            lb = b"".join(int(w).to_bytes(4, "little") for w in l[i])
            rb = b"".join(int(w).to_bytes(4, "little") for w in r[i])
            want = np.frombuffer(blake3_compress_pair(lb, rb), dtype="<u4")
            np.testing.assert_array_equal(got[i], want)
