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
