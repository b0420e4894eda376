"""Device-resident FRI commit-phase transcript (device_transcript.py):
the device grind/β duplex semantics must be byte-identical to the host
SerializingChallenger64, and proofs produced via the device path must be
bit-identical to host-path proofs (the replay-or-fallback contract)."""

import numpy as np
import jax.numpy as jnp
import pytest

from multistark_tpu import device_transcript as dt
from multistark_tpu import expr as ex
from multistark_tpu.challenger import SerializingChallenger64
from multistark_tpu.config import CommitmentParameters, FriParameters
from multistark_tpu.configs import GoldilocksBlake3Config
from multistark_tpu.fields.host import GOLDILOCKS as F, GOLDILOCKS_EXT2 as E2
from multistark_tpu.system import CircuitInputs, System, SystemWitness


def _flushed_challenger():
    ch = SerializingChallenger64(F, E2)
    ch.observe_bytes(b"seed-bytes-0123456789abcdef-pad!")
    ch.sample_ext()  # force a flush: input buffer = 32 chaining bytes
    return ch


class TestGrindBetaSemantics:
    @pytest.mark.parametrize("bits", [0, 1, 4, 8])
    def test_grind_and_beta_match_host(self, bits):
        ch = _flushed_challenger()
        cap = (np.arange(8, dtype=np.uint32)[None, :] * np.uint32(0x01010101))

        host = ch.clone()
        host.observe_commitment(cap)
        w_host = host.grind(bits)
        beta_host = host.sample_ext()

        entry = dt.entry_buffer_words(bytes(ch.inner.input_buffer))
        inp = jnp.concatenate([jnp.asarray(entry), jnp.asarray(cap.reshape(-1))])
        w_dev, digest, found = dt.grind_round(inp, bits)
        beta_dev, valid = dt.sample_ext_from_digest(digest, 2)

        assert bool(found) and bool(valid)
        assert dt.u64_of_pair(int(w_dev[0]), int(w_dev[1])) == w_host
        assert tuple(dt.u64_of_pair(int(lo), int(hi)) for lo, hi in beta_dev) == beta_host

    def test_draws_are_canonical_pop_order(self):
        # pin the byte layout: draw k = (bswap(word[7-2k]), bswap(word[6-2k]))
        digest = jnp.arange(8, dtype=jnp.uint32) * np.uint32(0x11223344)
        draws = dt.digest_draws(digest)
        d = np.asarray(digest)

        def bswap(x):
            return int.from_bytes(int(x).to_bytes(4, "little"), "big")

        for k, (lo, hi) in enumerate(draws):
            assert int(lo) == bswap(d[7 - 2 * k])
            assert int(hi) == bswap(d[6 - 2 * k])

    def test_draw_lt_p_boundary(self):
        m = np.uint32(0xFFFFFFFF)
        assert not bool(dt.draw_lt_p(jnp.uint32(1), jnp.asarray(m)))  # p ≤ val
        assert bool(dt.draw_lt_p(jnp.uint32(0), jnp.asarray(m)))  # val == p-... < p? 2^64-2^32 < p
        assert bool(dt.draw_lt_p(jnp.uint32(5), jnp.uint32(7)))


def _mul_system():
    config = GoldilocksBlake3Config(
        CommitmentParameters(log_blowup=2, cap_height=0),
        FriParameters(
            log_final_poly_len=0,
            max_log_arity=1,
            num_queries=8,
            commit_proof_of_work_bits=2,
            query_proof_of_work_bits=2,
        ),
    )
    inputs = CircuitInputs(
        main_width=3,
        constraints=[ex.main(0) * ex.main(1) - ex.main(2)],
        ext_constraints=[],
        lookups=[],
    )
    system, key = System.new(config, [inputs])
    rng = np.random.default_rng(7)
    n = 64
    a = rng.integers(0, 1 << 31, n, dtype=np.uint64)
    b = rng.integers(0, 1 << 31, n, dtype=np.uint64)
    c = (a.astype(object) * b.astype(object)) % F.p
    trace = np.stack([a, b, np.asarray(c, np.uint64)], axis=1)
    return config, system, key, trace


class TestDevicePathE2E:
    def test_device_and_host_paths_bit_identical(self, monkeypatch):
        config, system, key, trace = _mul_system()
        witness = SystemWitness.from_stage_1([trace], system, key)

        monkeypatch.setenv("MULTISTARK_DEVICE_TRANSCRIPT", "0")
        proof_host = system.prove(key, witness)
        monkeypatch.setenv("MULTISTARK_DEVICE_TRANSCRIPT", "1")
        proof_dev = system.prove(key, witness)

        system.verify(proof_dev)
        assert proof_host.to_bytes(config) == proof_dev.to_bytes(config)


class TestDeviceDuplex:
    """Whole-prove DeviceDuplex vs the host byte duplex: identical draws
    over randomized observe schedules, including multi-chunk buffers with
    device words spliced at arbitrary (unaligned) offsets."""

    def _run_both(self, schedule, rng):
        """schedule: list of ('h', nbytes) | ('d', n_u64) | ('cap', k) |
        ('sample',).  Returns (host_draws, device_draws)."""
        host = SerializingChallenger64(F, E2)
        dev = dt.DeviceDuplex()
        host_draws, dev_draws = [], []
        for step in schedule:
            if step[0] == "h":
                data = bytes(rng.integers(0, 256, step[1], dtype=np.uint8))
                host.observe_bytes(data)
                dev.observe_bytes(data)
            elif step[0] == "d":
                vals = rng.integers(0, F.p, step[1], dtype=np.uint64)
                for v in vals:
                    host.observe_field(int(v))
                words = np.empty(2 * len(vals), np.uint32)
                words[0::2] = vals & np.uint64(0xFFFFFFFF)
                words[1::2] = vals >> np.uint64(32)
                dev.observe_words_device(jnp.asarray(words))
            elif step[0] == "cap":
                cap = rng.integers(0, 1 << 32, (step[1], 8), dtype=np.uint64).astype(np.uint32)
                host.observe_bytes(
                    b"".join(
                        int(w).to_bytes(4, "little") for row in cap for w in row
                    )
                )
                planes = tuple(jnp.asarray(cap[:, i]) for i in range(8))
                dev.observe_cap_device(planes)
            else:
                host_draws.append(host.sample_ext())
                coords = dev.sample_ext(E2.D)
                dev_draws.append(
                    tuple(dt.u64_of_pair(int(lo), int(hi)) for lo, hi in coords)
                )
        assert dev.valid is None or bool(dev.valid)
        return host_draws, dev_draws

    def test_small_single_chunk(self):
        rng = np.random.default_rng(1)
        h, d = self._run_both(
            [("h", 14), ("d", 7), ("sample",), ("cap", 1), ("sample",)], rng
        )
        assert h == d

    def test_unaligned_cap_offsets(self):
        rng = np.random.default_rng(2)
        for pad in (0, 1, 2, 3, 5, 13):
            h, d = self._run_both(
                [("h", pad), ("cap", 2), ("h", 3), ("sample",),
                 ("d", 3), ("sample",)], rng
            )
            assert h == d, f"pad={pad}"

    def test_multi_chunk_claims_buffer(self):
        """The β/γ flush shape: host prefix ‖ device cap ‖ megabyte-scale
        host suffix (claims) — multi-chunk with host-precomputed CVs."""
        rng = np.random.default_rng(3)
        for suffix, pad in ((3000, 6), (1024, 0), (5000, 1023), (1100, 1000)):
            h, d = self._run_both(
                [("h", pad), ("cap", 1), ("h", suffix), ("sample",),
                 ("cap", 1), ("d", 2), ("sample",), ("sample",)], rng
            )
            assert h == d, f"suffix={suffix} pad={pad}"

    def test_cap_straddling_chunk_boundary(self):
        rng = np.random.default_rng(4)
        # place a 64-byte cap across the 1024-byte chunk boundary
        h, d = self._run_both(
            [("h", 1000), ("cap", 2), ("h", 500), ("sample",)], rng
        )
        assert h == d

    def test_consecutive_samples_one_digest(self):
        """β then γ = draws 0,1 then 2,3 of ONE digest (no flush between)."""
        rng = np.random.default_rng(5)
        h, d = self._run_both(
            [("h", 40), ("sample",), ("sample",), ("h", 8), ("sample",)], rng
        )
        assert h == d

    def test_entry_words_matches_host_buffer(self):
        rng = np.random.default_rng(6)
        host = SerializingChallenger64(F, E2)
        dev = dt.DeviceDuplex()
        data = bytes(rng.integers(0, 256, 36, dtype=np.uint8))
        host.observe_bytes(data)
        dev.observe_bytes(data)
        host.sample_ext()
        dev.sample_ext(E2.D)
        cap = rng.integers(0, 1 << 32, (1, 8), dtype=np.uint64).astype(np.uint32)
        host.observe_bytes(
            b"".join(int(w).to_bytes(4, "little") for w in cap.reshape(-1))
        )
        dev.observe_cap_device(tuple(jnp.asarray(cap[:, i]) for i in range(8)))
        want = dt.entry_buffer_words(bytes(host.inner.input_buffer))
        got = np.asarray(dev.entry_words())
        assert np.array_equal(want, got)
