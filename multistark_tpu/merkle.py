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

from dataclasses import dataclass
from typing import List, Sequence, Tuple

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
    def hash_matrices(self, mats) -> jnp.ndarray:
        """mats: list of field matrices, planes shaped (w, n), all same n.
        Returns (n, 8) digests of each row's concatenated u64-LE words."""
        parts = []
        for lo, hi in mats:
            interleaved = jnp.stack([lo, hi], axis=-1)  # (w, n, 2)
            parts.append(jnp.transpose(interleaved, (1, 0, 2)).reshape(interleaved.shape[1], -1))
        words = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        return Blake3Device.hash_words(words)

    def compress(self, left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
        return Blake3Device.compress_pairs(left, right)

    # -- host ------------------------------------------------------------
    def host_hash_rows(self, rows: Sequence[Sequence[int]]) -> np.ndarray:
        data = b"".join(int(v).to_bytes(8, "little") for row in rows for v in row)
        return bytes_to_digest(blake3_hash(data))

    def host_compress(self, left: np.ndarray, right: np.ndarray) -> np.ndarray:
        data = b"".join(int(w).to_bytes(4, "little") for w in left) + b"".join(
            int(w).to_bytes(4, "little") for w in right
        )
        return bytes_to_digest(blake3_hash(data))


@dataclass
class MerkleProverData:
    """Device-resident tree: committed matrices + all digest layers."""

    mats: list  # field matrices (planes (w, n)) in submission order
    dims: List[Tuple[int, int]]  # (width, height) per matrix
    layers: List[jnp.ndarray]  # digest layers, layers[0] = leaves (max_h, 8)
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

        key = (
            "mmcs_commit",
            type(self.hasher).__name__,
            getattr(self.hasher, "F", None).__class__.__name__,
            tuple(dims),
            self.cap_height,
        )
        kern = cached_jit(key, lambda: lambda ms: self._commit_impl(ms, dims))
        layers = kern(mats)
        cap = np.asarray(jax.device_get(layers[-1]))
        return cap, MerkleProverData(mats=list(mats), dims=dims, layers=layers, log_max=log_max)

    def _commit_impl(self, mats, dims) -> List[jnp.ndarray]:
        heights = sorted({h for _, h in dims}, reverse=True)
        max_h = heights[0]
        by_height = {h: [m for m, (w, mh) in zip(mats, dims) if mh == h] for h in heights}
        layer = self.hasher.hash_matrices(by_height[max_h])
        layers = [layer]
        size = max_h
        while size > (1 << self.cap_height):
            size >>= 1
            layer = self.hasher.compress(layer[0::2], layer[1::2])
            if size in by_height:
                injected = self.hasher.hash_matrices(by_height[size])
                layer = self.hasher.compress(layer, injected)
            layers.append(layer)
        return layers

    # -- open (device gathers, host assembly) -----------------------------
    def gather_device(self, data: MerkleProverData, indices: np.ndarray):
        """Dispatch (async) the sibling/row gathers for `indices`; pair with
        `assemble` after a (batched) device_get."""
        indices = np.asarray(indices, np.int64)
        path_len = data.log_max - self.cap_height
        sib_dev = []
        for l in range(path_len):
            idx_l = jnp.asarray(indices >> l)
            sib_dev.append(data.layers[l][idx_l ^ 1])
        rows_dev = []
        for m, (w, h) in zip(data.mats, data.dims):
            shift = data.log_max - (h.bit_length() - 1)
            ridx = jnp.asarray(indices >> shift)
            rows_dev.append(jax.tree.map(lambda pl: pl[:, ridx], m))  # planes (w, Q)
        return (sib_dev, rows_dev)

    def assemble(self, data: MerkleProverData, n_queries: int, fetched) -> List[BatchOpening]:
        """Build per-query openings from already-fetched host values."""
        sib_host, rows_host = fetched
        sib_layers = [np.asarray(s) for s in sib_host]
        rows_per_mat = [
            _host_planes_to_u64(self._field_of(m), planes)
            for m, planes in zip(data.mats, rows_host)
        ]
        path_len = data.log_max - self.cap_height
        out = []
        for qi in range(n_queries):
            path = (
                np.stack([sib_layers[l][qi] for l in range(path_len)])
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


def _host_planes_to_u64(F, planes) -> np.ndarray:
    """Already-fetched host planes (w, Q) -> uint64 numpy (w, Q)."""
    if F.num_planes == 2:
        lo = np.asarray(planes[0], np.uint64)
        hi = np.asarray(planes[1], np.uint64)
        return lo | (hi << np.uint64(32))
    # single-plane fields may store a non-canonical internal form (BabyBear
    # Montgomery) — route through the field's converter
    return F.to_np(tuple(jnp.asarray(p) for p in planes))
