"""Device-resident Fiat-Shamir primitives for the FRI commit phase.

The FRI commit phase is transcript-serial: β_r is squeezed from a duplex
that has absorbed cap_r, and fold r needs β_r — so a host-side challenger
forces one *blocking* device_get per fold round (~14 rounds at 2^14; the
dominant cost of warm prove through the remote TPU tunnel, BENCH_r01).

This module replicates the byte-duplex semantics of
``SerializingChallenger64`` over BLAKE3 (challenger.py:31-110; p3
HashChallenger / SerializingChallenger64, reference src/types.rs:10-13)
with jax ops so each fold round's kernel computes the grind witness and β
itself from the previous round's digest: every round dispatches
asynchronously and the host syncs ONCE at the end.

Correctness contract: the host *replays* the byte transcript from the
returned caps/witnesses after the single sync — the host challenger is
authoritative.  The device path does not model the ~2^-32-probability
rejection-sampling branch (a squeezed u64 ≥ p); any divergence (or a grind
miss) makes the prover fall back to the host commit phase, so proofs are
bit-identical to the host path whenever both succeed and always valid.

Duplex byte layout being replicated (challenger.py):
  - flush: digest = blake3(input_buffer); input := digest (chaining);
    output := digest bytes, popped from the END.
  - a u64 draw pops bytes [31..24] and assembles them little-endian, so
    draw k of one digest is (bswap32(word[7-2k]), bswap32(word[6-2k])) as
    a (lo, hi) u32 pair.
  - grind(bits): smallest witness w whose flush over (input ‖ w_le8) gives
    draw0 canonical with low `bits` zero (deterministic PoW, reference
    src/types.rs:43-81); the passing draw0 is popped by the witness check,
    so β's D coordinates are draws 1..D of the same digest.

Goldilocks + Blake3 only (the production config); the BabyBear/Poseidon2
config keeps the host loop.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .hash.blake3 import Blake3Device

GOLDILOCKS_P = 0xFFFFFFFF_00000001


def bswap32(x: jnp.ndarray) -> jnp.ndarray:
    """Byte-swap u32 lanes (digest words are LE; popped draws read the
    bytes high-to-low)."""
    m8 = np.uint32(0xFF)
    m16 = np.uint32(0xFF00)
    return (
        ((x & m8) << 24) | ((x & m16) << 8) | ((x >> 8) & m16) | (x >> 24)
    )


def digest_draws(digest: jnp.ndarray):
    """digest: (..., 8) u32 words -> four (lo, hi) u32 draws in pop order."""
    return [
        (bswap32(digest[..., 7 - 2 * k]), bswap32(digest[..., 6 - 2 * k]))
        for k in range(4)
    ]


def draw_lt_p(lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """u64 (lo, hi) < p for Goldilocks p = 2^64 - 2^32 + 1:
    val < p  ⟺  hi != 0xFFFFFFFF or lo == 0."""
    return (hi != np.uint32(0xFFFFFFFF)) | (lo == np.uint32(0))


def grind_round(input_words: jnp.ndarray, bits: int):
    """Deterministic batched grind: smallest w ∈ [0, 64·2^bits) whose flush
    digest over (input ‖ w_le8) has a canonical draw0 with low `bits` zero.

    input_words: (L,) u32 — the duplex input buffer (byte length L·4).
    Returns (w (lo, hi) u32 scalars, digest (8,) u32, found bool).  A miss
    (astronomically unlikely: (1-2^-bits)^(64·2^bits) ≈ e^-64) reports
    found=False and the caller falls back to the host grinder.
    """
    L = int(input_words.shape[0])
    n = 64 << bits
    cands = jnp.arange(n, dtype=jnp.uint32)
    msgs = jnp.zeros((n, L + 2), jnp.uint32)
    msgs = msgs.at[:, :L].set(input_words[None, :])
    msgs = msgs.at[:, L].set(cands)  # w_le8 = lo word then hi word (hi = 0)
    digests = Blake3Device._hash_words_impl(msgs)  # (n, 8)
    lo = bswap32(digests[:, 7])
    hi = bswap32(digests[:, 6])
    mask = np.uint32((1 << bits) - 1)
    ok = draw_lt_p(lo, hi) & ((lo & mask) == np.uint32(0))
    wi = jnp.argmax(ok)  # first passing candidate (argmax picks first max)
    found = jnp.any(ok)
    w = (cands[wi], jnp.uint32(0))
    return w, digests[wi], found


def sample_ext_from_digest(digest: jnp.ndarray, degree: int):
    """β after a grind: coordinates are draws 1..D of the grind digest
    (draw0 was popped by the witness check).  Returns (coords, valid);
    valid=False marks a rejection-sampling draw (≥ p) the device path does
    not model — the caller falls back.

    Each coordinate is a (lo, hi) u32 scalar pair — exactly the Goldilocks
    device plane format, usable directly as a fold-kernel β argument.
    """
    assert 1 <= degree <= 3, "only D ≤ 3 fits in one digest after the grind draw"
    draws = digest_draws(digest)
    coords = []
    valid = None
    for k in range(1, degree + 1):
        lo, hi = draws[k]
        ok = draw_lt_p(lo, hi)
        valid = ok if valid is None else (valid & ok)
        coords.append((lo, hi))
    return tuple(coords), valid


def entry_buffer_words(input_buffer: bytes) -> np.ndarray | None:
    """The challenger's current input buffer as u32 words, or None if it is
    not word-aligned (then the device path is skipped)."""
    if len(input_buffer) % 4 != 0:
        return None
    return np.frombuffer(bytes(input_buffer), dtype="<u4").copy()


def u64_of_pair(lo: int, hi: int) -> int:
    return (int(lo) & 0xFFFFFFFF) | ((int(hi) & 0xFFFFFFFF) << 32)


# ---------------------------------------------------------------------------
# Whole-prove device duplex (VERDICT r4 task 2).
#
# The FRI commit phase above eliminates its per-round host syncs; the REST of
# the prove still pays ~5 blocking ~90 ms fetches through the axon tunnel:
# stage-1/2/quotient caps, stage-2 totals, and the claimed evaluations, each
# observed by the host challenger before sampling the next challenge
# (β γ / α / ζ / FRI-α).  DeviceDuplex replicates the byte duplex for the
# WHOLE prove schedule: every observe appends either host-known bytes or
# device words, and each sample flushes ON DEVICE, so all stages dispatch
# without a single blocking fetch until the query phase.  The host challenger
# replays the byte transcript afterwards from the fetched values and remains
# the authority — any divergence (≥p rejection draw, ~2^-32/draw) reruns the
# prove through the host path, so proof bytes are identical whenever both
# succeed, and always valid.
#
# Flush engineering: the duplex buffer at the β/γ flush contains the
# length-prefixed claims (megabytes at 2^18+), but every byte of it except
# the 32·k-byte stage-1 cap is host-known BEFORE the prove starts.  BLAKE3
# hashes in independent 1024-byte chunks combined by a binary parent tree, so
# the host precomputes the chaining values of every fully-host-known chunk
# (native C) and the device computes only the 1-3 chunks containing cap
# words plus the O(log n_chunks) parent path — the device flush cost is O(1)
# compressions regardless of claim count.


from .hash.blake3 import (
    BLOCK_LEN, CHUNK_LEN, IV, PARENT, ROOT, Blake3Device, _chunk_cv,
    _left_len, compress_batch,
)


def _dev_chunk_cv(cols, n_bytes: int, counter: int, root: bool):
    """Chunk CV over 256 shape-(1,) u32 word planes (device)."""
    return Blake3Device._chunk_cv_cols(cols, n_bytes, root=root, counter=counter)


def _parent_cv(left, right, is_root: bool):
    """BLAKE3 parent node over device (1,)-plane CVs."""
    block = list(left) + list(right)
    cv = [jnp.full_like(block[0], np.uint32(IV[i])) for i in range(8)]
    flags = PARENT | (ROOT if is_root else 0)
    return compress_batch(
        cv, block, np.uint32(0), np.uint32(0), np.uint32(BLOCK_LEN), np.uint32(flags)
    )


def _host_cv_to_planes(cv) -> tuple:
    return tuple(jnp.asarray(np.uint32(w)).reshape(1) for w in cv)


class DeviceDuplex:
    """Device mirror of ByteHashChallenger (challenger.py:74-108) for the
    whole prove schedule.

    Segments observed since the last flush are either host bytes or device
    parts; a device part is a flat u32 array whose words are the
    little-endian bytes of the observed value (digest caps, canonical-u64
    field values).  ``flush`` computes blake3(chain ‖ segments) on device
    with the chunk-precompute trick above; ``sample_ext`` pops u64 draws
    from the digest end exactly like SerializingChallenger64 and returns
    device (lo, hi) scalar pairs plus a validity flag (False on a ≥p
    rejection draw, which the device does not model — caller falls back).

    The byte schedule is validated end-to-end by the host replay in
    prover._replay_device_transcript; unit-pinned against the host duplex
    in tests/test_device_transcript.py."""

    def __init__(self):
        self.chain = None  # device (8,) u32 digest words, or None pre-first-flush
        self.segments: list = []  # ('h', bytearray) | ('d', flat (k,) u32 device)
        self.valid = None  # device bool scalar; None == vacuously true
        self._draws_left = 0
        self._digest = None

    # -- observation -------------------------------------------------------
    def observe_bytes(self, data: bytes) -> None:
        self._draws_left = 0
        if self.segments and self.segments[-1][0] == "h":
            self.segments[-1][1].extend(data)
        else:
            self.segments.append(("h", bytearray(data)))

    def observe_u64(self, v: int) -> None:
        self.observe_bytes(int(v).to_bytes(8, "little"))

    def observe_words_device(self, words) -> None:
        """words: flat (k,) u32 device array = 4k observed bytes."""
        self._draws_left = 0
        self.segments.append(("d", words.reshape(-1)))

    def observe_cap_device(self, cap_layer) -> None:
        """cap: the tree's top digest layer — an (8, k) words-major device
        array (merkle layer format) OR a tuple of 8 (k,) planes → the byte
        stream digest₀‖digest₁‖…, each digest 8 LE words.  Matches
        SerializingChallenger64.observe_commitment (challenger.py:135-138)."""
        if isinstance(cap_layer, (tuple, list)):
            cap_layer = jnp.stack([p.reshape(-1) for p in cap_layer])
        from .merkle import digest_planes_words

        self.observe_words_device(digest_planes_words(cap_layer))

    def observe_ext_device(self, coords) -> None:
        """One extension value: D coords of (lo, hi) u32 device scalars,
        observed as canonical u64 LE each (observe_field semantics — values
        are already canonical by construction on device)."""
        words = []
        for lo, hi in coords:
            words.append(jnp.asarray(lo, jnp.uint32).reshape(1))
            words.append(jnp.asarray(hi, jnp.uint32).reshape(1))
        self.observe_words_device(jnp.concatenate(words))

    # -- flush -------------------------------------------------------------
    def _flush(self):
        """digest = blake3(chain_bytes ‖ segment bytes); chain := digest."""
        # assemble the byte layout: host template + device splice list
        layout: list = []  # (byte_off, 'h', bytes) | (byte_off, 'd', dev_words)
        off = 0
        if self.chain is not None:
            layout.append((off, "d", self.chain))
            off += 32
        for kind, seg in self.segments:
            if kind == "h":
                layout.append((off, "h", bytes(seg)))
                off += len(seg)
            else:
                layout.append((off, "d", seg))
                off += 4 * int(seg.shape[0])
        total = off
        digest = _spliced_blake3(layout, total)
        self.segments = []
        self.chain = jnp.stack([d.reshape(()) for d in digest])
        self._digest = digest
        self._draws_left = 4

    def sample_ext(self, D: int):
        """D canonical u64 draws as device (lo, hi) pairs + validity.
        Draw k of a digest is (bswap32(w[7-2k]), bswap32(w[6-2k]))
        (pop-from-end; device_transcript.digest_draws).  The prove schedule
        always observes between samples, so draws never span two digests
        for D ≤ 4 (asserted)."""
        assert 1 <= D <= 4
        if self._draws_left < D:
            self._flush()
        start = 4 - self._draws_left
        assert start + D <= 4, "draws would span digests (schedule bug)"
        coords = []
        for k in range(start, start + D):
            lo = bswap32(self._digest[7 - 2 * k].reshape(()))
            hi = bswap32(self._digest[6 - 2 * k].reshape(()))
            ok = draw_lt_p(lo, hi)
            self.valid = ok if self.valid is None else (self.valid & ok)
            coords.append((lo, hi))
        self._draws_left -= D
        return tuple(coords)

    def entry_words(self):
        """The duplex state for the FRI commit phase
        (pcs._commit_phase_device consumes a flat word buffer = input bytes
        so far).  Only valid when every pending segment is device/aligned —
        the prove schedule guarantees the buffer here is exactly
        [chain ‖ q-cap words...] (all word-aligned)."""
        parts = []
        if self.chain is not None:
            parts.append(self.chain.reshape(-1))
        for kind, seg in self.segments:
            if kind == "h":
                b = bytes(seg)
                if len(b) % 4 != 0:
                    return None
                parts.append(jnp.asarray(np.frombuffer(b, dtype="<u4").copy()))
            else:
                parts.append(seg.reshape(-1))
        return jnp.concatenate(parts) if parts else None


def _spliced_blake3(layout, total: int):
    """blake3 over a byte stream given as (byte_off, 'h'|'d', data) runs;
    host-only chunks hash natively on host, device-containing chunks hash on
    device via byte-atom splicing, the parent tree compresses host CVs as
    constants.  Returns a list of 8 shape-(1,) u32 device planes."""
    n_chunks = max(1, (total + CHUNK_LEN - 1) // CHUNK_LEN)

    # per chunk: host template bytes + device splices
    host_tpl = [bytearray(min(CHUNK_LEN, total - c * CHUNK_LEN)) for c in range(n_chunks)]
    splices: list = [[] for _ in range(n_chunks)]  # (chunk_byte_off, dev, part_byte_off, nbytes)
    has_dev = [False] * n_chunks
    for off, kind, data in layout:
        if kind == "h":
            for i, b in enumerate(data):
                p = off + i
                host_tpl[p // CHUNK_LEN][p % CHUNK_LEN] = b
        else:
            nbytes = 4 * int(data.shape[0])
            pos = off
            part_off = 0
            while part_off < nbytes:
                c = pos // CHUNK_LEN
                take = min(nbytes - part_off, CHUNK_LEN - pos % CHUNK_LEN)
                splices[c].append((pos % CHUNK_LEN, data, part_off, take))
                has_dev[c] = True
                pos += take
                part_off += take

    if n_chunks == 1:
        cv = _chunk_cv_mixed(host_tpl[0], splices[0], 0, total, root=True)
        if isinstance(cv, np.ndarray):  # no device bytes at all (tests only)
            return list(_host_cv_to_planes(cv))
        return cv

    cvs = []
    for c in range(n_chunks):
        if has_dev[c]:
            cvs.append(
                _chunk_cv_mixed(
                    host_tpl[c], splices[c], c, len(host_tpl[c]), root=False
                )
            )
        else:
            cvs.append(np.asarray(_chunk_cv(bytes(host_tpl[c]), c, root=False), np.uint32))
    root = _tree_mixed(cvs, is_root=True)
    if isinstance(root, np.ndarray):
        return list(_host_cv_to_planes(root))
    return root


def _chunk_cv_mixed(template: bytearray, chunk_splices, counter: int, n_bytes: int, root: bool):
    """Chunk CV with device byte runs spliced into a host template.
    Purely-host chunks return a host np (8,) CV."""
    if not chunk_splices:
        return np.asarray(_chunk_cv(bytes(template), counter, root=root), np.uint32)
    tpl = bytes(template) + b"\x00" * (CHUNK_LEN - len(template))
    tpl_words = np.frombuffer(tpl, dtype="<u4")
    cols = [jnp.asarray(tpl_words[i]).reshape(1) for i in range(256)]
    m8 = np.uint32(0xFF)
    for chunk_off, dev, part_off, nbytes in chunk_splices:
        dev = dev.reshape(-1)
        for b in range(nbytes):
            src = part_off + b
            dst = chunk_off + b
            byte = (dev[src // 4] >> np.uint32(8 * (src % 4))) & m8
            cols[dst // 4] = cols[dst // 4] | (byte << np.uint32(8 * (dst % 4))).reshape(1)
    return _dev_chunk_cv(cols, n_bytes, counter, root)


def _tree_mixed(cvs, is_root: bool):
    """Parent tree over mixed host(np)/device CVs: host-only subtrees stay
    host; a device CV anywhere on the path promotes the combine to device."""
    n = len(cvs)
    if n == 1:
        return cvs[0]
    split = _left_len(n)
    left = _tree_mixed(cvs[:split], is_root=False)
    right = _tree_mixed(cvs[split:], is_root=False)
    if isinstance(left, np.ndarray) and isinstance(right, np.ndarray):
        from .hash.blake3 import compress as _host_compress

        block = [int(w) for w in left] + [int(w) for w in right]
        flags = PARENT | (ROOT if is_root else 0)
        return np.asarray(
            _host_compress(IV, block, 0, BLOCK_LEN, flags)[:8], np.uint32
        )
    lp = _host_cv_to_planes(left) if isinstance(left, np.ndarray) else left
    rp = _host_cv_to_planes(right) if isinstance(right, np.ndarray) else right
    return _parent_cv(lp, rp, is_root)
