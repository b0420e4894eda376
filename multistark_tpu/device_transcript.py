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

import jax
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

def _np_compress_ctr(cv, block, ctr_lo, ctr_hi, block_len, flags):
    """np_compress_batch with PER-LANE counters (host chunk-CV precompute)."""
    from .hash.blake3 import MSG_PERM, _np_g

    u = np.uint32
    B = cv[0].shape[0]
    st = list(cv) + [
        np.full(B, IV[0], u), np.full(B, IV[1], u),
        np.full(B, IV[2], u), np.full(B, IV[3], u),
        np.asarray(ctr_lo, u).copy(), np.asarray(ctr_hi, u).copy(),
        np.full(B, block_len, u), np.full(B, flags, u),
    ]
    m = list(block)
    for _ in range(7):
        _np_g(st, 0, 4, 8, 12, m[0], m[1])
        _np_g(st, 1, 5, 9, 13, m[2], m[3])
        _np_g(st, 2, 6, 10, 14, m[4], m[5])
        _np_g(st, 3, 7, 11, 15, m[6], m[7])
        _np_g(st, 0, 5, 10, 15, m[8], m[9])
        _np_g(st, 1, 6, 11, 12, m[10], m[11])
        _np_g(st, 2, 7, 8, 13, m[12], m[13])
        _np_g(st, 3, 4, 9, 14, m[14], m[15])
        m = [m[p] for p in MSG_PERM]
    return [st[i] ^ st[i + 8] for i in range(8)]


def _np_chunk_cvs_all(buf: bytes, n_chunks: int) -> np.ndarray:
    """Non-root chunk CVs (counters 0..n_chunks-1) of a padded byte buffer,
    vectorized over chunks.  The LAST chunk may be short; it runs in its own
    1-lane pass (different block count/len/flags)."""
    total = len(buf)
    padded = buf + b"\x00" * (n_chunks * CHUNK_LEN - total)
    words = np.frombuffer(padded, dtype="<u4").reshape(n_chunks, 256)

    def cvs_for(rows, counters, nbytes):
        B = rows.shape[0]
        n_blocks = max(1, (nbytes + BLOCK_LEN - 1) // BLOCK_LEN)
        cv = [np.full(B, IV[i], np.uint32) for i in range(8)]
        for b in range(n_blocks):
            flags = (CHUNK_START if b == 0 else 0) | (
                CHUNK_END if b == n_blocks - 1 else 0
            )
            blen = min(BLOCK_LEN, nbytes - b * BLOCK_LEN)
            cv = _np_compress_ctr(
                cv, [rows[:, 16 * b + i] for i in range(16)],
                counters, np.zeros(B, np.uint32), blen, flags,
            )
        return np.stack(cv, axis=1)

    last_bytes = total - (n_chunks - 1) * CHUNK_LEN
    if n_chunks == 1:
        return cvs_for(words, np.zeros(1, np.uint32), last_bytes)
    out = np.empty((n_chunks, 8), np.uint32)
    out[:-1] = cvs_for(
        words[:-1], np.arange(n_chunks - 1, dtype=np.uint32), CHUNK_LEN
    )
    out[-1:] = cvs_for(
        words[-1:], np.full(1, n_chunks - 1, np.uint32), last_bytes
    )
    return out


def _np_parent_level(cvs: np.ndarray) -> np.ndarray:
    """One parent level: combine adjacent CV pairs (PARENT flag, non-root),
    odd last node carries up unchanged.  Level-wise adjacent pairing with
    odd-carry is exactly BLAKE3's left-largest-power-of-two tree (pinned by
    the DeviceDuplex parity tests against blake3_hash)."""
    n = cvs.shape[0]
    pairs = n // 2
    left, right = cvs[0 : 2 * pairs : 2], cvs[1 : 2 * pairs : 2]
    cv = [np.full(pairs, IV[i], np.uint32) for i in range(8)]
    block = [left[:, i] for i in range(8)] + [right[:, i] for i in range(8)]
    out = _np_compress_ctr(
        cv, block, np.zeros(pairs, np.uint32), np.zeros(pairs, np.uint32),
        BLOCK_LEN, PARENT,
    )
    out = np.stack(out, axis=1)
    if n % 2:
        out = np.concatenate([out, cvs[-1:]], axis=0)
    return out


from .hash.blake3 import CHUNK_END, CHUNK_START  # noqa: E402  (flag consts)


class DeviceDuplex:
    """Device mirror of ByteHashChallenger (challenger.py:74-108) for the
    whole prove schedule.

    Observation records segments WITHOUT touching the device: host bytes
    verbatim, device values as raw references (flat word arrays, (8, k)
    Merkle cap layers, ext-scalar coordinate tuples).  ``flush`` runs ONE
    cached jitted program per buffer layout: the host precomputes the chunk
    CVs and full parent-tree levels of the (host-known) buffer natively,
    and the device program splices the device bytes into their 1-3 chunks,
    hashes those, and recombines the root path — O(log n_chunks) device
    compressions regardless of buffer size (the β/γ flush carries the
    megabyte claims prefix at 2^18+).  Draw extraction happens inside the
    same program, so a flush costs one pipelined dispatch + two small
    uploads.

    ``sample_ext`` pops u64 draws from the digest end exactly like
    SerializingChallenger64 and returns device (lo, hi) scalar pairs; a ≥p
    rejection draw (which the device does not model) flips the
    corresponding entry of ``valids`` — the caller ANDs them in its single
    sync and falls back.  Pinned against the host duplex on randomized
    schedules in tests/test_device_transcript.py."""

    def __init__(self):
        self.chain = None  # device (8,) u32 digest words, or None pre-first-flush
        self.segments: list = []  # ('h', bytearray) | ('d', kind, ref, nbytes)
        self.valids: list = []  # device bool scalars, one per consumed draw
        self._draws_left = 0
        self._draws = None  # tuple of 4 ((lo, hi, ok)) scalar refs

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
        self.segments.append(("d", "words", words, 4 * int(words.shape[-1])))

    def observe_cap_device(self, cap_layer) -> None:
        """cap: a tree's top digest layer — (8, k) words-major device array
        (merkle layer format) or a tuple of 8 (k,) planes — observed as the
        byte stream digest₀‖digest₁‖…, 8 LE words each, matching
        SerializingChallenger64.observe_commitment."""
        self._draws_left = 0
        if isinstance(cap_layer, (tuple, list)):
            k = int(jax.tree.leaves(cap_layer[0])[0].shape[-1]) if hasattr(
                cap_layer[0], "shape"
            ) else int(np.shape(cap_layer[0])[-1])
            self.segments.append(("d", "capplanes", tuple(cap_layer), 32 * k))
        else:
            k = int(cap_layer.shape[-1])
            self.segments.append(("d", "cap", cap_layer, 32 * k))

    def observe_ext_device(self, coords) -> None:
        """One extension value: D coords of (lo, hi) u32 device scalars,
        observed as canonical u64 LE each."""
        self._draws_left = 0
        self.segments.append(("d", "ext", tuple(coords), 8 * len(coords)))

    # -- flush -------------------------------------------------------------
    def _layout(self):
        """(sig, layout) — layout = [(off, 'h', bytes) | (off, 'd', kind, ref)]."""
        layout = []
        sig = []
        off = 0
        if self.chain is not None:
            layout.append((off, "d", "words", self.chain))
            sig.append(("d", "words", 32))
            off += 32
        for seg in self.segments:
            if seg[0] == "h":
                b = bytes(seg[1])
                layout.append((off, "h", None, b))
                sig.append(("h", len(b)))
                off += len(b)
            else:
                _, kind, ref, nbytes = seg
                layout.append((off, "d", kind, ref))
                sig.append(("d", kind, nbytes))
                off += nbytes
        return tuple(sig), layout, off

    def _flush(self):
        from .utils import cached_jit

        sig, layout, total = self._layout()
        n_chunks = max(1, (total + CHUNK_LEN - 1) // CHUNK_LEN)

        # host byte image (zeros at device positions) + device runs
        buf = bytearray(total)
        dev_runs = []  # (byte_off, arg_index, kind, nbytes)
        dev_refs = []
        dev_nbytes = [s[2] for s in sig if s[0] == "d"]
        for off, kind_tag, kind, data in layout:
            if kind_tag == "h":
                buf[off : off + len(data)] = data
            else:
                dev_runs.append(
                    (off, len(dev_refs), kind, dev_nbytes[len(dev_refs)])
                )
                dev_refs.append(data)

        if not dev_runs:
            # pure-host flush (unit tests only): hash on host, keep the API
            from .hash.blake3 import blake3_hash

            digest = np.frombuffer(blake3_hash(bytes(buf)), dtype="<u4").copy()
            self.chain = jnp.asarray(digest)
            draws = []
            for k in range(4):
                lo = int(digest[7 - 2 * k])
                hi = int(digest[6 - 2 * k])
                lo, hi = _bswap_int(lo), _bswap_int(hi)
                ok = (hi != 0xFFFFFFFF) or (lo == 0)
                draws.append((np.uint32(lo), np.uint32(hi), bool(ok)))
            self._draws = tuple(draws)
            self.segments = []
            self._draws_left = 4
            return

        # device chunks + byte-splice plan (all static from sig)
        dev_chunks = sorted({
            c
            for off, _, _, nbytes in dev_runs
            for c in range(off // CHUNK_LEN, (off + nbytes - 1) // CHUNK_LEN + 1)
        })
        chunk_pos = {c: t for t, c in enumerate(dev_chunks)}
        splices = {t: [] for t in range(len(dev_chunks))}
        for off, idx, kind, nbytes in dev_runs:
            pos = off
            part_off = 0
            while part_off < nbytes:
                c = pos // CHUNK_LEN
                take = min(nbytes - part_off, CHUNK_LEN - pos % CHUNK_LEN)
                splices[chunk_pos[c]].append(
                    (pos % CHUNK_LEN, idx, part_off, take)
                )
                pos += take
                part_off += take

        # host precompute: all chunk CVs + parent levels (device slots
        # garbage); only the root-path SIBLING CVs upload (≤ 2 per level)
        host_cvs = _np_chunk_cvs_all(bytes(buf), n_chunks)
        levels = [host_cvs]
        while levels[-1].shape[0] > 1:
            levels.append(_np_parent_level(levels[-1]))
        need: list = []  # (level, index) of host siblings on the root path
        cur_idx = set(dev_chunks)
        count, level = n_chunks, 0
        while count > 1:
            pairs, odd = count // 2, count % 2
            nxt = set()
            for p in range(pairs):
                li, ri = 2 * p, 2 * p + 1
                if li in cur_idx or ri in cur_idx:
                    if li not in cur_idx:
                        need.append((level, li))
                    if ri not in cur_idx:
                        need.append((level, ri))
                    nxt.add(p)
            if odd and (count - 1) in cur_idx:
                nxt.add(pairs)
            cur_idx, count, level = nxt, pairs + odd, level + 1
        sib_slot = {pos: s for s, pos in enumerate(need)}
        host_sibs = (
            np.stack([levels[lvl][i] for (lvl, i) in need])
            if need else np.zeros((0, 8), np.uint32)
        )

        chunk_meta = tuple(
            (c, min(CHUNK_LEN, total - c * CHUNK_LEN)) for c in dev_chunks
        )
        kinds = tuple((kind, nb) for _, _, kind, nb in dev_runs)
        key = ("dt_flush", sig, total)

        def mk(_meta=chunk_meta, _spl=splices, _n=n_chunks, _kinds=kinds,
               _slots=tuple(sorted(sib_slot.items()))):
            _slot = dict(_slots)

            def f(templates, host_levels, devs):
                # 1. flatten device refs to word vectors
                flats = []
                for (kind, nb), ref in zip(_kinds, devs):
                    if kind == "words":
                        flats.append(ref.reshape(-1))
                    elif kind == "cap":
                        flats.append(jnp.transpose(ref).reshape(-1))
                    elif kind == "capplanes":
                        flats.append(
                            jnp.stack([p.reshape(-1) for p in ref], axis=1).reshape(-1)
                        )
                    else:  # ext: coords of (lo, hi) scalars
                        ws = []
                        for lo, hi in ref:
                            ws.append(jnp.asarray(lo, jnp.uint32).reshape(1))
                            ws.append(jnp.asarray(hi, jnp.uint32).reshape(1))
                        flats.append(jnp.concatenate(ws))
                # 2. device chunk CVs (byte-atom splicing into the template)
                m8 = np.uint32(0xFF)
                cur = {}
                for t, (ci, nbytes_c) in enumerate(_meta):
                    cols = [templates[t, i].reshape(1) for i in range(256)]
                    for chunk_off, idx, part_off, take in _spl[t]:
                        dev = flats[idx]
                        for b in range(take):
                            src = part_off + b
                            dst = chunk_off + b
                            byte = (dev[src // 4] >> np.uint32(8 * (src % 4))) & m8
                            cols[dst // 4] = cols[dst // 4] | (
                                (byte << np.uint32(8 * (dst % 4))).reshape(1)
                            )
                    cur[ci] = _dev_chunk_cv(cols, nbytes_c, ci, root=(_n == 1))
                # 3. parent-tree root path (host siblings from the level args)
                count = _n
                level = 0
                while count > 1:
                    pairs = count // 2
                    odd = count % 2
                    nxt = {}
                    for pidx in range(pairs):
                        li, ri = 2 * pidx, 2 * pidx + 1
                        if li in cur or ri in cur:
                            lcv = cur.get(li) or [
                                host_levels[_slot[(level, li)], w].reshape(1)
                                for w in range(8)
                            ]
                            rcv = cur.get(ri) or [
                                host_levels[_slot[(level, ri)], w].reshape(1)
                                for w in range(8)
                            ]
                            nxt[pidx] = _parent_cv(
                                lcv, rcv, is_root=(pairs + odd == 1)
                            )
                    if odd and (count - 1) in cur:
                        nxt[pairs] = cur[count - 1]
                    cur = nxt
                    count = pairs + odd
                    level += 1
                root = cur[0]
                digest = jnp.stack([w.reshape(()) for w in root])
                draws = []
                for k in range(4):
                    lo = bswap32(digest[7 - 2 * k])
                    hi = bswap32(digest[6 - 2 * k])
                    draws.append((lo, hi, draw_lt_p(lo, hi)))
                return digest, tuple(draws)

            return f

        kern = cached_jit(key, mk)
        templates = np.stack([
            np.frombuffer(
                bytes(buf[c * CHUNK_LEN : (c + 1) * CHUNK_LEN]).ljust(CHUNK_LEN, b"\x00"),
                dtype="<u4",
            )
            for c in dev_chunks
        ])
        digest, draws = kern(templates, host_sibs, tuple(dev_refs))
        self.chain = digest
        self._draws = draws
        self.segments = []
        self._draws_left = 4

    def sample_ext(self, D: int):
        """D canonical u64 draws as device (lo, hi) pairs.  Draw k of a
        digest is (bswap32(w[7-2k]), bswap32(w[6-2k])) (pop-from-end).  The
        prove schedule always observes between samples, so draws never span
        two digests for D ≤ 4 (asserted)."""
        assert 1 <= D <= 4
        if self._draws_left < D:
            self._flush()
        start = 4 - self._draws_left
        assert start + D <= 4, "draws would span digests (schedule bug)"
        coords = []
        for k in range(start, start + D):
            lo, hi, ok = self._draws[k]
            if not (ok is True):
                self.valids.append(ok)
            coords.append((lo, hi))
        self._draws_left -= D
        return tuple(coords)

    @property
    def valid(self):
        """Conjunction of every rejection-sampling check so far: a device
        bool scalar (or True when no device draw happened).  Evaluate it in
        the caller's single sync."""
        if not self.valids:
            return jnp.asarray(True)
        v = self.valids[0]
        for o in self.valids[1:]:
            v = v & o
        return v

    def entry_words(self):
        """The duplex state for the FRI commit phase (a flat word buffer =
        input bytes so far).  In the prove schedule this is called right
        after a flush, when the buffer is exactly the 32-byte chain."""
        if self.segments:
            parts = []
            if self.chain is not None:
                parts.append(self.chain.reshape(-1))
            for seg in self.segments:
                if seg[0] == "h":
                    b = bytes(seg[1])
                    if len(b) % 4 != 0:
                        return None
                    parts.append(jnp.asarray(np.frombuffer(b, dtype="<u4").copy()))
                elif seg[1] == "words":
                    parts.append(seg[2].reshape(-1))
                elif seg[1] == "cap":
                    parts.append(jnp.transpose(seg[2]).reshape(-1))
                elif seg[1] == "capplanes":
                    parts.append(
                        jnp.stack([p.reshape(-1) for p in seg[2]], axis=1).reshape(-1)
                    )
                else:  # ext
                    ws = []
                    for lo, hi in seg[2]:
                        ws.append(jnp.asarray(lo, jnp.uint32).reshape(1))
                        ws.append(jnp.asarray(hi, jnp.uint32).reshape(1))
                    parts.append(jnp.concatenate(ws))
            return jnp.concatenate(parts) if parts else None
        return None if self.chain is None else self.chain.reshape(-1)


def _bswap_int(x: int) -> int:
    return int.from_bytes(int(x).to_bytes(4, "big"), "little")
