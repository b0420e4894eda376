"""Mixed-height Merkle-tree batch commitment (MMCS).

TPU-native equivalent of p3-merkle-tree's MerkleTreeMmcs (reference
src/types.rs:82-83, 202-207; SURVEY.md §2.2): commit to a batch of matrices
of (power-of-two) heights in one tree; the leaf layer hashes the rows of all
tallest matrices, and shorter matrices are *injected* when the digest layer
reaches their height:  layer' = compress(compress(left, right), hash(rows)).
The commitment is a cap of 2^cap_height digests; openings return per-matrix
rows (at index >> (log_max - log_h)) plus the sibling path up to the cap.

All hashing is batched on device over every node of a layer at once; opening
gathers are batched over all query indices; path verification is host-side
(verifier is O(queries·log n), reference-style).

Generic over a hasher pair (device batched + host scalar) so the same MMCS
serves Blake3/Goldilocks and Poseidon2/BabyBear configs.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .hash.blake3 import Blake3Device, blake3_hash, bytes_to_digest


class Blake3FieldHasher:
    """Hash field-matrix rows with BLAKE3 over u64-LE serialization
    (p3 SerializingHasher convention, reference src/types.rs:199-207,
    pinned by the types.rs:225-283 fixture generators)."""

    digest_words = 8

    def __init__(self, F):
        self.F = F  # device FieldOps (2-plane 64-bit field)
        assert F.num_planes == 2, "Blake3FieldHasher serializes u64 fields"

    # -- device ----------------------------------------------------------
    def hash_matrices(self, mats):
        """mats: list of field matrices, planes shaped (w, n), all same n.
        Returns the row digests of the concatenated u64-LE words as an
        (8, n) u32 array — digest words on the MAJOR axis.  The transposed
        (n, 8) layout would be tile-padded 16x on TPU (the round-3 2^20
        blocker); (8, n) pads nothing (8 is exactly the sublane tile)."""
        cols = []
        for lo, hi in mats:
            for c in range(lo.shape[0]):
                cols.append(lo[c])
                cols.append(hi[c])
        return jnp.stack(Blake3Device.hash_word_cols(cols), axis=0)

    def compress(self, left, right):
        """left/right: (8, n) u32 digest arrays -> (8, n)."""
        out = Blake3Device.compress_planes(
            tuple(left[i] for i in range(8)), tuple(right[i] for i in range(8))
        )
        return jnp.stack(out, axis=0)

    # -- host ------------------------------------------------------------
    def host_hash_rows(self, rows: Sequence[Sequence[int]]) -> np.ndarray:
        data = b"".join(int(v).to_bytes(8, "little") for row in rows for v in row)
        return bytes_to_digest(blake3_hash(data))

    def host_compress(self, left: np.ndarray, right: np.ndarray) -> np.ndarray:
        data = b"".join(int(w).to_bytes(4, "little") for w in left) + b"".join(
            int(w).to_bytes(4, "little") for w in right
        )
        return bytes_to_digest(blake3_hash(data))

    # -- host, batched over queries (the fast verifier path) --------------
    def np_hash_rows_batch(self, rows_u64: np.ndarray) -> np.ndarray:
        """rows_u64: (B, total_w) uint64 -> (B, 8) digests (u64-LE words)."""
        from .hash.blake3 import native_hash_words, np_hash_words

        lo = (rows_u64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hi = (rows_u64 >> np.uint64(32)).astype(np.uint32)
        words = np.stack([lo, hi], axis=-1).reshape(rows_u64.shape[0], -1)
        out = native_hash_words(words)
        return out if out is not None else np_hash_words(words)

    def np_compress_batch(self, left: np.ndarray, right: np.ndarray) -> np.ndarray:
        from .hash.blake3 import native_compress_pairs, np_compress_pairs

        out = native_compress_pairs(left, right)
        return out if out is not None else np_compress_pairs(left, right)


def digest_planes_to_np(layer) -> np.ndarray:
    """A digest layer ((8, h) device array or host equivalent) -> (h, 8)
    uint32 numpy in digest-word order."""
    return np.ascontiguousarray(np.asarray(jax.device_get(layer)).T)


def digest_planes_words(layer) -> jnp.ndarray:
    """A device digest layer (8, h) -> flat u32 word vector in the
    serialization order of the (h, 8) row-major layout (tiny: caps only)."""
    return jnp.transpose(jnp.asarray(layer)).reshape(-1)


@dataclass
class MerkleProverData:
    """Device-resident tree: committed matrices + all digest layers."""

    mats: list  # field matrices (planes (w, n)) in submission order
    dims: List[Tuple[int, int]]  # (width, height) per matrix
    # digest layers, layers[0] = leaves; each layer is an (8, h) u32 array
    # (digest words on the MAJOR axis: the transposed (h, 8) layout is
    # tile-padded 16x on TPU — the round-3 2^20 blocker)
    layers: List[jnp.ndarray]
    log_max: int

    @property
    def max_height(self) -> int:
        return 1 << self.log_max


@dataclass
class BatchOpening:
    """One opened index: per-matrix rows (u64 numpy) + sibling path."""

    opened_rows: List[np.ndarray]
    path: np.ndarray  # (log_max - cap_height, 8) uint32


class MerkleMmcs:
    def __init__(self, hasher, cap_height: int = 0):
        self.hasher = hasher
        self.cap_height = cap_height

    # -- commit (device) --------------------------------------------------
    def commit(self, mats) -> Tuple[np.ndarray, MerkleProverData]:
        """mats: field matrices with planes (w, n), power-of-two heights.
        Returns (cap (2^cap_height, 8) numpy, prover data).

        The whole tree (leaf hashing + every compress level) is ONE jitted
        kernel per dims-signature — per-level kernels would pay one backend
        compile each (SURVEY.md §5 perf note; ~2x fewer compiles per proof)."""
        from .utils import cached_jit

        dims = [(jax.tree.leaves(m)[0].shape[0], jax.tree.leaves(m)[0].shape[1]) for m in mats]
        heights = sorted({h for _, h in dims}, reverse=True)
        for h in heights:
            assert h & (h - 1) == 0, f"height {h} not a power of two"
        max_h = heights[0]
        log_max = max_h.bit_length() - 1
        assert max_h >= (1 << self.cap_height), "cap larger than tree"
        # matrices shorter than the cap would never be injected into a digest
        # (the compress loop stops at the cap), silently unbinding their data
        # — reject the combination loudly
        assert heights[-1] >= (1 << self.cap_height), (
            f"matrix height {heights[-1]} below cap size {1 << self.cap_height}: "
            "sub-cap matrices are not bound by the commitment"
        )

        from .utils import jit_enabled, np_mirrors_enabled

        def _plain(l):
            if isinstance(l, jax.core.Tracer):
                return False
            sh = getattr(l, "sharding", None)
            return sh is None or len(sh.device_set) <= 1

        if (
            not jit_enabled()
            and np_mirrors_enabled()
            and hasattr(self.hasher, "np_hash_rows_batch")
            and all(_plain(l) for l in jax.tree.leaves(mats))
        ):
            # eager (CPU test) path: native/NumPy batch hashing instead of
            # thousands of eager jnp round ops; bit-identical (the hasher's
            # np mirrors are pinned against the device kernels)
            layers = self._commit_np(mats, dims)
        elif max_h >= (1 << int(os.environ.get("MULTISTARK_MMCS_SPLIT_LOG", "20"))):
            # very tall trees: one program per level instead of one for the
            # whole tree — the axon remote-compile helper is OOM-killed on
            # fused whole-tree hash programs over 2^20+ leaves (same
            # failure class as the NTT split; see ntt.NttEngine._split_log)
            layers = self._commit_split(mats, dims)
        else:
            key = (
                "mmcs_commit",
                type(self.hasher).__name__,
                getattr(self.hasher, "F", None).__class__.__name__,
                tuple(dims),
                self.cap_height,
            )
            kern = cached_jit(key, lambda: lambda ms: self._commit_impl(ms, dims))
            layers = kern(mats)
        cap = digest_planes_to_np(layers[-1])
        return cap, MerkleProverData(mats=list(mats), dims=dims, layers=layers, log_max=log_max)

    def _commit_split(self, mats, dims) -> List[jnp.ndarray]:
        """_commit_impl with one cached program per tree level (leaf hash /
        compress / compress+inject).  Identical values; programs are keyed
        by (hasher, level shapes) so FRI rounds and matrices of equal
        heights share them."""
        from .utils import cached_jit

        hname = (
            type(self.hasher).__name__,
            getattr(self.hasher, "F", None).__class__.__name__,
        )
        heights = sorted({h for _, h in dims}, reverse=True)
        max_h = heights[0]
        by_height = {h: [m for m, (w, mh) in zip(mats, dims) if mh == h] for h in heights}

        def jit_hash(ms, sig):
            k = cached_jit(
                ("mmcs_hash", *hname, sig),
                lambda: lambda ms_: self.hasher.hash_matrices(ms_),
            )
            return k(ms)

        def sig_of(h):
            return tuple((w, mh) for w, mh in dims if mh == h)

        layer = jit_hash(by_height[max_h], sig_of(max_h))
        layers = [layer]
        size = max_h
        while size > (1 << self.cap_height):
            size >>= 1
            if size in by_height:
                k = cached_jit(
                    ("mmcs_level_inj", *hname, size, sig_of(size)),
                    lambda: lambda l, ms_: self.hasher.compress(
                        self.hasher.compress(_planes_stride(l, 0), _planes_stride(l, 1)),
                        self.hasher.hash_matrices(ms_),
                    ),
                )
                layer = k(layer, by_height[size])
            else:
                k = cached_jit(
                    ("mmcs_level", *hname, size),
                    lambda: lambda l: self.hasher.compress(
                        _planes_stride(l, 0), _planes_stride(l, 1)
                    ),
                )
                layer = k(layer)
            layers.append(layer)
        return layers

    def _commit_np(self, mats, dims) -> List[np.ndarray]:
        """NumPy mirror of _commit_impl (same layer layout/values)."""
        F = self.hasher.F
        heights = sorted({h for _, h in dims}, reverse=True)
        max_h = heights[0]
        u64s = [
            _host_planes_to_u64(F, jax.device_get(m)) for m in mats
        ]  # (w, n) each
        by_height: Dict[int, List[np.ndarray]] = {}
        for u, (w, mh) in zip(u64s, dims):
            by_height.setdefault(mh, []).append(u)

        def rows_at(h):
            return np.concatenate([u.T for u in by_height[h]], axis=1)

        layer = self.hasher.np_hash_rows_batch(rows_at(max_h))
        layers = [layer.T]  # (8, h) views of the host (h, 8) layers
        size = max_h
        while size > (1 << self.cap_height):
            size >>= 1
            layer = self.hasher.np_compress_batch(layer[0::2], layer[1::2])
            if size in by_height:
                layer = self.hasher.np_compress_batch(
                    layer, self.hasher.np_hash_rows_batch(rows_at(size))
                )
            layers.append(layer.T)
        return layers

    def _commit_impl(self, mats, dims) -> List[tuple]:
        heights = sorted({h for _, h in dims}, reverse=True)
        max_h = heights[0]
        by_height = {h: [m for m, (w, mh) in zip(mats, dims) if mh == h] for h in heights}
        layer = self.hasher.hash_matrices(by_height[max_h])
        layers = [layer]
        size = max_h
        while size > (1 << self.cap_height):
            size >>= 1
            layer = self.hasher.compress(
                _planes_stride(layer, 0), _planes_stride(layer, 1)
            )
            if size in by_height:
                injected = self.hasher.hash_matrices(by_height[size])
                layer = self.hasher.compress(layer, injected)
            layers.append(layer)
        return layers

    # -- open (device gathers, host assembly) -----------------------------
    def gather_device(self, data: MerkleProverData, indices: np.ndarray):
        """Dispatch the sibling/row gathers for `indices` as ONE jitted
        kernel per tree signature (a per-level eager gather would cost ~20
        dispatches per tree); pair with `assemble` after a batched
        device_get."""
        from .utils import cached_jit

        indices = np.asarray(indices, np.int64)
        key = (
            "mmcs_gather",
            type(self.hasher).__name__,
            tuple(data.dims),
            data.log_max,
            self.cap_height,
            len(indices),
        )
        kern = cached_jit(
            key,
            lambda _dims=tuple(data.dims), _lm=data.log_max: (
                lambda layers, mats, idx: self._gather_impl(layers, mats, idx, _dims, _lm)
            ),
        )
        return kern(tuple(data.layers), tuple(data.mats), jnp.asarray(indices))

    def gather_device_many(self, datas: Sequence[MerkleProverData], indices_list):
        """Dispatch the query gathers of MANY trees as ONE jitted kernel
        (the per-tree gather_device costs one tunnel dispatch per tree —
        ~20 per proof in the FRI query phase).  Returns a list of per-tree
        fetched structures, same layout as gather_device's."""
        from .utils import cached_jit

        idxs = [np.asarray(ix, np.int64) for ix in indices_list]
        sig = tuple(
            (tuple(d.dims), d.log_max, len(ix)) for d, ix in zip(datas, idxs)
        )
        key = ("mmcs_gather_many", type(self.hasher).__name__, sig, self.cap_height)

        def make(_sig=sig):
            def fn(layers_list, mats_list, idx_list):
                return [
                    self._gather_impl(layers, mats, ix, dims, log_max)
                    for (layers, mats, ix), (dims, log_max, _) in zip(
                        zip(layers_list, mats_list, idx_list), _sig
                    )
                ]

            return fn

        kern = cached_jit(key, make)
        return kern(
            tuple(tuple(d.layers) for d in datas),
            tuple(tuple(d.mats) for d in datas),
            tuple(jnp.asarray(ix) for ix in idxs),
        )

    def _gather_impl(self, layers, mats, idx, dims, log_max):
        path_len = log_max - self.cap_height
        # per-level sibling gathers along the minor axis of the (8, h)
        # layers (one gather per level; no (…, 8) minor dim materializes)
        sib = [layers[l][:, (idx >> l) ^ 1] for l in range(path_len)]  # (8, Q) each
        rows = []
        for m, (w, h) in zip(mats, dims):
            shift = log_max - (h.bit_length() - 1)
            rows.append(jax.tree.map(lambda pl: pl[:, idx >> shift], m))  # planes (w, Q)
        return (sib, rows)

    def assemble(self, data: MerkleProverData, n_queries: int, fetched) -> List[BatchOpening]:
        """Build per-query openings from already-fetched host values."""
        sib_host, rows_host = fetched
        if sib_host:
            sib_layers = np.stack(
                [np.asarray(lvl) for lvl in sib_host], axis=0
            ).transpose(0, 2, 1)  # (path_len, Q, 8)
        else:
            sib_layers = np.zeros((0, n_queries, 8), np.uint32)
        rows_per_mat = [
            _host_planes_to_u64(self._field_of(m), planes)
            for m, planes in zip(data.mats, rows_host)
        ]
        path_len = data.log_max - self.cap_height
        out = []
        for qi in range(n_queries):
            path = (
                sib_layers[:, qi]
                if path_len
                else np.zeros((0, 8), np.uint32)
            )
            out.append(
                BatchOpening(
                    opened_rows=[rows_per_mat[mi][:, qi] for mi in range(len(data.mats))],
                    path=path,
                )
            )
        return out

    def open_batch(self, data: MerkleProverData, indices: np.ndarray) -> List[BatchOpening]:
        """Open all `indices` (leaf-level, < max_height) in one pass.
        All gathers dispatch asynchronously; ONE device_get syncs the lot."""
        indices = np.asarray(indices, np.int64)
        dev = self.gather_device(data, indices)
        return self.assemble(data, len(indices), jax.device_get(dev))

    def _field_of(self, m):
        return self.hasher.F if hasattr(self.hasher, "F") else None

    # -- verify (host) ----------------------------------------------------
    def verify_batch(
        self,
        cap: np.ndarray,
        dims: Sequence[Tuple[int, int]],
        index: int,
        opening: BatchOpening,
        log_max: int | None = None,
    ) -> bool:
        """Recompute the path for one opened index and compare to the cap."""
        if log_max is None:
            log_max = max(h for _, h in dims).bit_length() - 1
        heights = sorted({h for _, h in dims}, reverse=True)
        if heights[-1] < (1 << self.cap_height):
            return False  # sub-cap matrices are never bound (see commit())
        by_height = {
            h: [opening.opened_rows[i] for i, (w, mh) in enumerate(dims) if mh == h]
            for h in heights
        }
        for i, (w, h) in enumerate(dims):
            if len(opening.opened_rows[i]) != w:
                return False
        max_h = heights[0]
        if max_h != 1 << log_max:
            return False
        node = self.hasher.host_hash_rows(by_height[max_h])
        size = max_h
        idx = index
        for l in range(log_max - self.cap_height):
            sib = opening.path[l]
            if idx & 1:
                node = self.hasher.host_compress(sib, node)
            else:
                node = self.hasher.host_compress(node, sib)
            size >>= 1
            idx >>= 1
            if size in by_height:
                injected = self.hasher.host_hash_rows(by_height[size])
                node = self.hasher.host_compress(node, injected)
        return bool(np.array_equal(cap[idx], node))


def _mmcs_verify_batch_queries(
    mmcs: MerkleMmcs,
    cap: np.ndarray,
    dims: Sequence[Tuple[int, int]],
    indices: np.ndarray,
    openings: Sequence[BatchOpening],
    log_max: int | None = None,
) -> bool:
    """Verify ALL query openings of one tree in a few vectorized NumPy hash
    calls (the per-query scalar walk costs ~20k Python hash calls per proof).
    Requires a hasher with np_hash_rows_batch/np_compress_batch; callers fall
    back to mmcs.verify_batch per query otherwise."""
    try:
        return _verify_batch_queries_impl(mmcs, cap, dims, indices, openings, log_max)
    except (ValueError, TypeError):  # ragged/malformed adversarial data
        return False


def _verify_batch_queries_impl(mmcs, cap, dims, indices, openings, log_max):
    if log_max is None:
        log_max = max(h for _, h in dims).bit_length() - 1
    heights = sorted({h for _, h in dims}, reverse=True)
    if heights[-1] < (1 << mmcs.cap_height):
        return False  # sub-cap matrices are never bound (see commit())
    if heights[0] != 1 << log_max:
        return False
    for op in openings:
        for i, (w, h) in enumerate(dims):
            if len(op.opened_rows[i]) != w:
                return False
    B = len(indices)
    idx = np.asarray(indices, np.int64)
    by_height = {
        h: np.concatenate(
            [
                np.stack([np.asarray(op.opened_rows[i], np.uint64) for op in openings])
                for i, (w, mh) in enumerate(dims)
                if mh == h
            ],
            axis=1,
        )
        for h in heights
    }
    paths = np.stack([op.path for op in openings])  # (B, path_len, 8)
    if paths.shape[1] != log_max - mmcs.cap_height:
        return False
    node = mmcs.hasher.np_hash_rows_batch(by_height[heights[0]])
    size = heights[0]
    for l in range(log_max - mmcs.cap_height):
        sib = paths[:, l].astype(np.uint32)
        bit = ((idx >> l) & 1).astype(bool)[:, None]
        left = np.where(bit, sib, node)
        right = np.where(bit, node, sib)
        node = mmcs.hasher.np_compress_batch(left, right)
        size >>= 1
        if size in by_height:
            injected = mmcs.hasher.np_hash_rows_batch(by_height[size])
            node = mmcs.hasher.np_compress_batch(node, injected)
    final_idx = idx >> (log_max - mmcs.cap_height)
    return bool(np.array_equal(np.atleast_2d(cap)[final_idx], node))


def _planes_stride(layer, off: int):
    """Even/odd digest rows of an (8, h) layer: (8, h/2)."""
    return layer[:, off::2]


def _host_planes_to_u64(F, planes) -> np.ndarray:
    """Already-fetched host planes (w, Q) -> uint64 numpy (w, Q)."""
    if F.num_planes == 2:
        lo = np.asarray(planes[0], np.uint64)
        hi = np.asarray(planes[1], np.uint64)
        return lo | (hi << np.uint64(32))
    # single-plane fields may store a non-canonical internal form (BabyBear
    # Montgomery) — route through the field's converter
    return F.to_np(tuple(jnp.asarray(p) for p in planes))
