"""Batched radix-2 NTT / low-degree extension on device.

TPU-native replacement for p3-dft's Radix2DitParallel (reference
src/types.rs:200, used throughout src/prover.rs) — but instead of a per-core
parallel DIT, every butterfly stage is one whole-array XLA op over a
column-major matrix of polynomials; the polynomial-evaluation dimension is
the TPU vector lane.

Layout conventions (these ARE the protocol's storage conventions —
reference src/prover.rs:681-717 depends on them):

  - matrices are field arrays of shape (width, n): row w = polynomial w
  - committed LDEs are stored in *bit-reversed* row order so that FRI fold
    partners (x, -x) are adjacent and share a Merkle path
  - forward DIF maps natural coefficients -> bit-reversed evaluations with
    no explicit permutation; inverse DIF maps natural evaluations ->
    bit-reversed coefficients; DIT does the reverse-ordered counterparts

The restriction of a stored LDE to a sub-coset of the same shift is the
*prefix* of the bit-reversed storage (see `prefix_to_natural`) — the fused
"slice a prefix instead of re-evaluating" trick the reference builds its
quotient commit path on (src/prover.rs:606-717).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import npref
from ..fields.host import HostField
from ..utils import bit_reverse_indices


def _has_tracer(v) -> bool:
    return any(isinstance(l, jax.core.Tracer) for l in jax.tree.leaves(v))


def _np_field_fns(host: HostField):
    if host.name == "Goldilocks":
        return npref.gl_mul, npref.gl_pow
    if host.name == "BabyBear":
        return npref.bb_mul, npref.bb_pow
    raise KeyError(host.name)


def np_powers(host: HostField, base: int, n: int) -> np.ndarray:
    """[1, base, base^2, ..., base^(n-1)] as uint64 (host precompute,
    O(log n) vectorized doubling passes)."""
    mul, _ = _np_field_fns(host)
    out = np.ones(1, np.uint64)
    cur = np.uint64(base % host.p)
    while len(out) < n:
        out = np.concatenate([out, mul(out, cur)])
        cur = mul(cur, cur)
    return out[:n]


class NttEngine:
    """Twiddle caches + NTT kernels for one base field (device ops `F`)."""

    def __init__(self, F):
        self.F = F
        self.host: HostField = F.host
        self._tw: Dict[Tuple[int, bool], list] = {}
        self._np_tw: Dict[Tuple[int, bool], list] = {}
        self._brev: Dict[int, np.ndarray] = {}
        self._powcache: Dict[Tuple[int, int], object] = {}
        # jitted butterfly passes: twiddles are ARGUMENTS, so one compiled
        # program per (shape, log_n) serves forward/inverse and every proof
        self._dit_j = jax.jit(lambda x, tw: self._dit_impl(x, tw))
        self._dif_j = jax.jit(lambda x, tw: self._dif_impl(x, tw))
        # per-stage programs for large transforms (see _split_log)
        self._dit_stage_j = jax.jit(lambda x, t: self._dit_stage(x, t))
        self._dif_stage_j = jax.jit(lambda x, t: self._dif_stages(x, (t,)))

    # -- caches -----------------------------------------------------------
    def _twiddles(self, log_n: int, inverse: bool) -> list:
        """Per-stage twiddle tables: stage s (1-indexed, block size m=2^s)
        holds [w_m^0 .. w_m^(m/2-1)] where w_m = g^(n/m)."""
        key = (log_n, inverse)
        if key not in self._tw:
            # caches may be populated lazily during a jit trace: force
            # concrete (compile-time) values so no tracer leaks into the cache
            with jax.ensure_compile_time_eval():
                g = self.host.two_adic_generator(log_n)
                if inverse:
                    g = self.host.inv(g)
                stages = []
                for s in range(1, log_n + 1):
                    half = 1 << (s - 1)
                    w_m = self.host.pow(g, 1 << (log_n - s))
                    stages.append(self.F.from_np(np_powers(self.host, w_m, half)))
            if _has_tracer(stages):
                # ensure_compile_time_eval does NOT escape a shard_map trace
                # (observed: ShardMapTracer leaks); serve the traced value
                # but never cache it
                return stages
            self._tw[key] = stages
        return self._tw[key]

    def brev(self, log_n: int) -> np.ndarray:
        # cached as a NumPy array: always concrete, valid as a gather index
        # inside any trace (jit, shard_map), so it can never leak a tracer
        if log_n not in self._brev:
            self._brev[log_n] = bit_reverse_indices(log_n)
        return self._brev[log_n]

    def pow_table(self, base: int, n: int):
        key = (base % self.host.p, n)
        if key not in self._powcache:
            with jax.ensure_compile_time_eval():
                val = self.F.from_np(np_powers(self.host, base, n))
            if _has_tracer(val):
                return val  # inside a shard_map trace: don't cache
            self._powcache[key] = val
        return self._powcache[key]

    def _np_twiddles(self, log_n: int, inverse: bool) -> list:
        """Host uint64 twiddle stages (the pre-from_np values of _twiddles)."""
        key = (log_n, inverse)
        if key not in self._np_tw:
            g = self.host.two_adic_generator(log_n)
            if inverse:
                g = self.host.inv(g)
            self._np_tw[key] = [
                np_powers(self.host, self.host.pow(g, 1 << (log_n - s)), 1 << (s - 1))
                for s in range(1, log_n + 1)
            ]
        return self._np_tw[key]

    def _np_eager_ok(self, x) -> bool:
        from ..utils import jit_enabled, np_mirrors_enabled

        if (
            jit_enabled()
            or not np_mirrors_enabled()
            or self.host.name not in ("Goldilocks", "BabyBear")
        ):
            return False
        for l in jax.tree.leaves(x):
            if isinstance(l, jax.core.Tracer):
                return False
            sh = getattr(l, "sharding", None)
            if sh is not None and len(sh.device_set) > 1:
                return False  # keep sharded transforms on the mesh
        return True

    def _native_transform(self, x: np.ndarray, log_n: int, inverse: bool, dif: bool):
        """C-accelerated (OpenMP) Goldilocks butterflies; None if unavailable."""
        if self.host.name != "Goldilocks" or log_n == 0:
            return None
        import ctypes

        from ..hash.blake3 import _native_lib

        lib = _native_lib()
        if lib is None or not hasattr(lib, "msgl_dif"):
            return None
        tw = np.concatenate(self._np_twiddles(log_n, inverse))  # stage order
        n = 1 << log_n
        out = np.ascontiguousarray(x.reshape(-1, n), np.uint64).copy()
        u64p = ctypes.POINTER(ctypes.c_uint64)
        fn = lib.msgl_dif if dif else lib.msgl_dit
        fn(out.ctypes.data_as(u64p), out.shape[0], log_n,
           np.ascontiguousarray(tw, np.uint64).ctypes.data_as(u64p))
        return out.reshape(x.shape)

    def _dit_np(self, x: np.ndarray, log_n: int, inverse: bool) -> np.ndarray:
        """NumPy mirror of _dit_impl over uint64 (…, n) arrays."""
        native = self._native_transform(x, log_n, inverse, dif=False)
        if native is not None:
            return native
        mul, _ = _np_field_fns(self.host)
        add, sub = (npref.gl_add, npref.gl_sub) if self.host.name == "Goldilocks" else (
            npref.bb_add, npref.bb_sub)
        tw = self._np_twiddles(log_n, inverse)
        lead = x.shape[:-1]
        n = 1 << log_n
        for s in range(1, log_n + 1):
            half = 1 << (s - 1)
            k = x.size // (2 * half)
            xr = x.reshape(k, 2, half)
            a, b = xr[:, 0, :], xr[:, 1, :]
            t = mul(b, tw[s - 1][None, :])
            x = np.stack([add(a, t), sub(a, t)], axis=1).reshape(lead + (n,))
        return x

    def _dif_np(self, x: np.ndarray, log_n: int, inverse: bool) -> np.ndarray:
        """NumPy mirror of _dif_impl over uint64 (…, n) arrays."""
        native = self._native_transform(x, log_n, inverse, dif=True)
        if native is not None:
            return native
        mul, _ = _np_field_fns(self.host)
        add, sub = (npref.gl_add, npref.gl_sub) if self.host.name == "Goldilocks" else (
            npref.bb_add, npref.bb_sub)
        lead = x.shape[:-1]
        n = 1 << log_n
        for t in reversed(self._np_twiddles(log_n, inverse)):
            half = t.shape[-1]
            k = x.size // (2 * half)
            xr = x.reshape(k, 2, half)
            a, b = xr[:, 0, :], xr[:, 1, :]
            lo = add(a, b)
            hi = mul(sub(a, b), t[None, :])
            x = np.stack([lo, hi], axis=1).reshape(lead + (n,))
        return x

    # -- core butterfly passes -------------------------------------------
    @staticmethod
    def _split_log() -> int:
        """Transforms of size >= 2^this run as per-stage jits instead of one
        fused program.  The round-4 compile-helper OOM (SIGKILL on ~14 MB
        MLIR) was the twiddle/index tables inlined as dense MLIR constants;
        with utils.hoisted_jit they are runtime arguments and the fused
        program is a few hundred KB at ANY size, so the default threshold
        moves to 2^24 (the whole 2^20-row bench regime stays fused).  With
        hoisting disabled the old 2^20 guard returns.  Identical math
        either way."""
        import os

        from ..utils import _hoist_enabled

        default = "24" if _hoist_enabled() else "20"
        return int(os.environ.get("MULTISTARK_NTT_SPLIT_LOG", default))

    def _dit(self, x, log_n: int, inverse: bool):
        from ..utils import jit_enabled

        if self._np_eager_ok(x):
            return self.F.from_np(self._dit_np(self.F.to_np(x), log_n, inverse))
        if not jit_enabled():
            return self._dit_impl(x, tuple(self._twiddles(log_n, inverse)))
        tw = tuple(self._twiddles(log_n, inverse))
        if log_n >= self._split_log():
            for t in tw:  # ascending stage order
                x = self._dit_stage_j(x, t)
            return x
        return self._dit_j(x, tw)

    def _dif(self, x, log_n: int, inverse: bool):
        from ..utils import jit_enabled

        if self._np_eager_ok(x):
            return self.F.from_np(self._dif_np(self.F.to_np(x), log_n, inverse))
        if not jit_enabled():
            return self._dif_impl(x, tuple(self._twiddles(log_n, inverse)))
        tw = tuple(self._twiddles(log_n, inverse))
        if log_n >= self._split_log():
            for t in reversed(tw):  # descending stage order (DIF)
                x = self._dif_stage_j(x, t)
            return x
        return self._dif_j(x, tw)

    # NOTE: all butterfly arithmetic happens on FLAT 1-D plane arrays; shapes
    # are only touched by reshape/stack (layout ops).  Elementwise ops on
    # arrays with a tiny minor dimension (the early stages' pair axis) make
    # XLA:CPU codegen time explode, and waste TPU lanes — flat is fast on
    # both.
    def _dit_stage(self, x, t):
        """One DIT butterfly stage; geometry derives from the twiddle table
        length (half = len(t)), mirroring _dif_stages."""
        F = self.F
        half = jax.tree.leaves(t)[0].shape[-1]
        m = 2 * half
        lead = jax.tree.leaves(x)[0].shape[:-1]
        n = jax.tree.leaves(x)[0].shape[-1]
        groups = int(np.prod(lead, dtype=np.int64)) if lead else 1
        k = groups * (n // m)
        xr = jax.tree.map(lambda a: a.reshape(k, 2, half), x)
        a = jax.tree.map(lambda v: v[:, 0, :].reshape(-1), xr)
        b = jax.tree.map(lambda v: v[:, 1, :].reshape(-1), xr)
        twf = jax.tree.map(lambda tt: jnp.broadcast_to(tt, (k, half)).reshape(-1), t)
        tv = F.mul(b, twf)
        lo = F.add(a, tv)
        hi = F.sub(a, tv)
        return jax.tree.map(
            lambda p, q: jnp.stack(
                [p.reshape(k, half), q.reshape(k, half)], axis=1
            ).reshape(lead + (n,)),
            lo,
            hi,
        )

    def _dit_impl(self, x, tw):
        """DIT stages: bit-reversed input -> natural output.  Stage triples
        fuse into radix-8 kernels like _dif_stages (same policy, same
        bit-identical-composition argument)."""
        stages = list(tw)  # ascending
        i = 0
        r8 = self._radix8_enabled()
        while i < len(stages):
            if r8 and i + 3 <= len(stages):
                x = self._dit_stage3(x, stages[i], stages[i + 1], stages[i + 2])
                i += 3
            else:
                x = self._dit_stage(x, stages[i])
                i += 1
        return x

    def _dit_stage3(self, x, tA, tB, tC):
        """Three consecutive DIT stages (halves q, 2q, 4q) fused as one
        radix-8 kernel over blocks of m = 8q:
          stage A pairs (u, u+1), twiddle tA[t]
          stage B pairs (u, u+2) within half-blocks, twiddle tB[(u%2)·q + t]
          stage C pairs (u, u+4), twiddle tC[u·q + t]  (u < 4)"""
        F = self.F
        lead = jax.tree.leaves(x)[0].shape[:-1]
        n = jax.tree.leaves(x)[0].shape[-1]
        groups = int(np.prod(lead, dtype=np.int64)) if lead else 1
        q = jax.tree.leaves(tA)[0].shape[-1]
        m = 8 * q
        k = groups * (n // m)

        xr = jax.tree.map(lambda a: a.reshape(k, 8, q), x)
        s = [
            jax.tree.map(lambda v, _u=u: v[:, _u, :].reshape(-1), xr)
            for u in range(8)
        ]

        def tw(tab, lo_idx):
            return jax.tree.map(
                lambda v, _i=lo_idx: jnp.broadcast_to(
                    v.reshape(-1)[_i : _i + q], (k, q)
                ).reshape(-1),
                tab,
            )

        # stage A: adjacent pairs
        y = [None] * 8
        tAf = tw(tA, 0)
        for u in range(0, 8, 2):
            t = F.mul(s[u + 1], tAf)
            y[u] = F.add(s[u], t)
            y[u + 1] = F.sub(s[u], t)
        # stage B: pairs (u, u+2) within half-blocks
        z = [None] * 8
        for base in (0, 4):
            for u in range(2):
                t = F.mul(y[base + u + 2], tw(tB, u * q))
                z[base + u] = F.add(y[base + u], t)
                z[base + u + 2] = F.sub(y[base + u], t)
        # stage C: pairs (u, u+4)
        o = [None] * 8
        for u in range(4):
            t = F.mul(z[u + 4], tw(tC, u * q))
            o[u] = F.add(z[u], t)
            o[u + 4] = F.sub(z[u], t)
        return jax.tree.map(
            lambda *slots: jnp.stack(
                [p.reshape(k, q) for p in slots], axis=1
            ).reshape(lead + (n,)),
            *o,
        )

    def _dif_impl(self, x, tw):
        """DIF stages: natural input -> bit-reversed output."""
        return self._dif_stages(x, tuple(reversed(tw)))

    def _dif_stages(self, x, tw_desc, fuse=None):
        """Apply DIF butterfly stages in the given order; each stage's
        geometry derives from its twiddle length (half = len(t), block
        m = 2·half).  Passing a SUFFIX of the stage list applies only the
        fine stages — the device-local part of a row-sharded transform
        (parallel.py), where the coarse stages run with cyclically sharded
        twiddle tables.

        Consecutive stage TRIPLES run as one fused radix-8 kernel when the
        jitted radix-8 policy is on: a lone radix-2 stage is HBM-bound (one
        full read+write of the array per stage), and XLA does not fuse
        across the stack/reshape between stages — grouping three stages
        keeps the intermediate butterflies in registers, cutting the memory
        passes of a 22-stage LDE from 22 to 8.  The radix-8 kernel composes
        EXACTLY the same field ops per element (same twiddle values from
        the same per-stage tables, same add/sub/mul order), so outputs are
        bit-identical to the stage-at-a-time path and the np mirrors."""
        i = 0
        stages = list(tw_desc)
        r8 = self._radix8_enabled() if fuse is None else fuse
        while i < len(stages):
            if r8 and i + 3 <= len(stages) and (
                jax.tree.leaves(stages[i + 2])[0].shape[-1] >= 1
            ):
                x = self._dif_stage3(x, stages[i], stages[i + 1], stages[i + 2])
                i += 3
            else:
                x = self._dif_stage1(x, stages[i])
                i += 1
        return x

    @staticmethod
    def _radix8_enabled() -> bool:
        import os

        from ..utils import jit_enabled

        v = os.environ.get("MULTISTARK_RADIX8")
        if v is not None:
            return v not in ("0", "false", "off")
        return jit_enabled()

    def _dif_stage1(self, x, t):
        """One DIF butterfly stage (the radix-2 building block)."""
        F = self.F
        lead = jax.tree.leaves(x)[0].shape[:-1]
        n = jax.tree.leaves(x)[0].shape[-1]
        groups = int(np.prod(lead, dtype=np.int64)) if lead else 1
        half = jax.tree.leaves(t)[0].shape[-1]
        m = 2 * half
        k = groups * (n // m)
        xr = jax.tree.map(lambda a: a.reshape(k, 2, half), x)
        a = jax.tree.map(lambda v: v[:, 0, :].reshape(-1), xr)
        b = jax.tree.map(lambda v: v[:, 1, :].reshape(-1), xr)
        twf = jax.tree.map(
            lambda v: jnp.broadcast_to(v.reshape(-1), (k, half)).reshape(-1), t
        )
        lo = F.add(a, b)
        hi = F.mul(F.sub(a, b), twf)
        return jax.tree.map(
            lambda p, q: jnp.stack(
                [p.reshape(k, half), q.reshape(k, half)], axis=1
            ).reshape(lead + (n,)),
            lo,
            hi,
        )

    def _dif_stage3(self, x, t1, t2, t3):
        """Three consecutive DIF stages (halves 4q, 2q, q) fused as one
        radix-8 kernel over blocks of m = 8q.  Slot u holds positions
        [u·q, (u+1)·q) of each block; twiddle slices come from the SAME
        per-stage tables as the radix-2 path:
          stage 1 pairs (u, u+4), twiddle t1[u·q + t]   (u < 4)
          stage 2 pairs (u, u+2) within half-blocks, twiddle t2[(u%2)·q + t]
          stage 3 pairs (u, u+1), twiddle t3[t]"""
        F = self.F
        lead = jax.tree.leaves(x)[0].shape[:-1]
        n = jax.tree.leaves(x)[0].shape[-1]
        groups = int(np.prod(lead, dtype=np.int64)) if lead else 1
        q = jax.tree.leaves(t3)[0].shape[-1]
        m = 8 * q
        k = groups * (n // m)

        def flat(v):
            return v.reshape(-1)

        xr = jax.tree.map(lambda a: a.reshape(k, 8, q), x)
        s = [jax.tree.map(lambda v, _u=u: flat(v[:, _u, :]), xr) for u in range(8)]

        def tw(tab, lo_idx):
            return jax.tree.map(
                lambda v, _i=lo_idx: jnp.broadcast_to(
                    v.reshape(-1)[_i : _i + q], (k, q)
                ).reshape(-1),
                tab,
            )

        # stage 1: halves 4q — pairs (u, u+4), twiddle slice t1[u·q : (u+1)·q]
        y = [None] * 8
        for u in range(4):
            a, b = s[u], s[u + 4]
            y[u] = F.add(a, b)
            y[u + 4] = F.mul(F.sub(a, b), tw(t1, u * q))
        # stage 2: halves 2q — within each 4-slot half-block
        z = [None] * 8
        for base in (0, 4):
            for u in range(2):
                a, b = y[base + u], y[base + u + 2]
                z[base + u] = F.add(a, b)
                z[base + u + 2] = F.mul(F.sub(a, b), tw(t2, u * q))
        # stage 3: halves q — adjacent pairs
        o = [None] * 8
        t3f = tw(t3, 0)
        for u in range(0, 8, 2):
            a, b = z[u], z[u + 1]
            o[u] = F.add(a, b)
            o[u + 1] = F.mul(F.sub(a, b), t3f)
        return jax.tree.map(
            lambda *slots: jnp.stack(
                [p.reshape(k, q) for p in slots], axis=1
            ).reshape(lead + (n,)),
            *o,
        )

    def _scale(self, x, c: int):
        shape = jax.tree.leaves(x)[0].shape
        return self.F.mul(x, self.F.const(c, ()))

    def _unbrev(self, x, log_n: int):
        idx = self.brev(log_n)
        return jax.tree.map(lambda a: a[..., idx], x)

    # -- public transforms (all pure; callers jit around them) -----------
    def dft_natural(self, coeffs, log_n: int):
        """natural coeffs -> natural evals on the subgroup H."""
        return self._dit(self._unbrev(coeffs, log_n), log_n, inverse=False)

    def idft_natural(self, evals, log_n: int):
        """natural evals on H -> natural coeffs."""
        out = self._dit(self._unbrev(evals, log_n), log_n, inverse=True)
        return self._scale(out, self.host.inv(1 << log_n))

    def coset_eval_bitrev(self, coeffs_natural, log_n: int, shift: int):
        """natural coeffs -> evals on shift·H in bit-reversed order."""
        c = self.F.mul(coeffs_natural, self.pow_table(shift, 1 << log_n))
        return self._dif(c, log_n, inverse=False)

    def icoset_from_natural(self, evals_natural, log_n: int, shift: int):
        """natural evals on shift·H -> natural coeffs."""
        pre = self._glue_jit(
            ("ic_pre", log_n), evals_natural,
            lambda _ln=log_n: lambda x: self._unbrev(x, _ln),
        )
        out = self._dit(pre, log_n, inverse=True)

        def post(_ln=log_n, _s=shift % self.host.p):
            def f(x):
                x = self._scale(x, self.host.inv(1 << _ln))
                return self.F.mul(x, self.pow_table(self.host.inv(_s), 1 << _ln))

            return f

        return self._glue_jit(("ic_post", log_n, shift % self.host.p), out, post)

    def _glue_jit(self, tag, x, make):
        """Jit eager glue between the per-stage transform programs when on
        the jitted platform OUTSIDE any trace (each eager op costs ~5 ms
        through the axon tunnel); inside a trace or eager-CPU, run plain."""
        from ..utils import cached_jit, jit_enabled

        if not jit_enabled() or _has_tracer(x):
            return make()(x)
        shapes = tuple(l.shape for l in jax.tree.leaves(x))
        return cached_jit((self.F.name, "nttglue", tag, shapes), make)(x)

    def coset_lde_bitrev(self, evals_natural, log_n: int, log_blowup: int, shift: int):
        """Evals on the natural subgroup H_n -> evals on shift·H_N
        (N = n·2^log_blowup), bit-reversed rows: the commit transform
        (p3 coset_lde_batch + bit_reverse_rows, reference src/prover.rs:650)."""
        F = self.F
        n = 1 << log_n
        big = log_n + log_blowup
        # iDFT (natural->bitrev coeffs via DIF), un-bitrev the SMALL array
        cb = self._dif(evals_natural, log_n, inverse=True)

        def mid(_ln=log_n, _s=shift % self.host.p, _big=big):
            def f(c):
                co = self._scale(self._unbrev(c, _ln), self.host.inv(1 << _ln))
                co = F.mul(co, self.pow_table(_s, 1 << _ln))
                return jax.tree.map(
                    lambda a: jnp.concatenate(
                        [a, jnp.zeros(a.shape[:-1] + ((1 << _big) - (1 << _ln),), a.dtype)],
                        axis=-1,
                    ),
                    co,
                )

            return f

        pad = self._glue_jit(("ldemid", log_n, shift % self.host.p, big), cb, mid)
        return self._dif(pad, big, inverse=False)

    def lde_bitrev_from_coeffs(self, coeffs_natural, log_big: int):
        """Zero-extend natural coefficients to 2^log_big and evaluate on the
        *unshifted* big subgroup, bit-reversed (callers bake any coset shift
        into the coefficients — the fused quotient commit path, reference
        src/prover.rs:681-717)."""
        n = jax.tree.leaves(coeffs_natural)[0].shape[-1]
        pad = self._glue_jit(
            ("pad", n, log_big), coeffs_natural,
            lambda _n=n, _big=log_big: lambda c: jax.tree.map(
                lambda a: jnp.concatenate(
                    [a, jnp.zeros(a.shape[:-1] + ((1 << _big) - _n,), a.dtype)], axis=-1
                ),
                c,
            ),
        )
        return self._dif(pad, log_big, inverse=False)

    def prefix_to_natural(self, lde_bitrev, log_sub: int):
        """First 2^log_sub entries of a bit-reversed LDE = the same-shift
        sub-coset in bit-reversed order; un-reverse to natural order.
        (The 'evaluations on domain are a stored prefix' identity the
        reference exploits at src/prover.rs:606-679.)"""
        pre = jax.tree.map(lambda a: a[..., : 1 << log_sub], lde_bitrev)
        return self._unbrev(pre, log_sub)


_ENGINES: Dict[str, NttEngine] = {}


def get_engine(F) -> NttEngine:
    if F.name not in _ENGINES:
        _ENGINES[F.name] = NttEngine(F)
    return _ENGINES[F.name]
