"""Small device-side numeric utilities shared across layers."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def fetch_global(a):
    """device_get that also works for arrays spanning multiple PROCESSES
    (jax.distributed): a plain device_get raises on non-addressable shards,
    so those go through a collective process_allgather — every process must
    reach this call (true for the prover: all processes run the same host
    code deterministically)."""
    if isinstance(a, jax.Array) and not a.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(a, tiled=True))
    return np.asarray(jax.device_get(a))


def to_np_global(ops, x):
    """ops.to_np through fetch_global: multiprocess-safe host fetch of a
    (possibly cross-process-sharded) field value."""
    return ops.to_np(jax.tree.map(fetch_global, x))


def bit_reverse_indices(log_n: int) -> np.ndarray:
    """Permutation i -> reverse_bits(i, log_n) as a uint32 numpy array
    (host-precomputed; equivalent of p3-util reverse_bits_len)."""
    n = 1 << log_n
    idx = np.arange(n, dtype=np.uint64)
    rev = np.zeros_like(idx)
    for b in range(log_n):
        rev |= ((idx >> np.uint64(b)) & np.uint64(1)) << np.uint64(log_n - 1 - b)
    return rev.astype(np.int32)


def reverse_bits(i: int, bits: int) -> int:
    return int(f"{i:0{bits}b}"[::-1], 2) if bits else 0


_JIT_CACHE = {}
_JIT_ENABLED = None


def jit_enabled() -> bool:
    """Stage-level jitting policy.  On TPU the big prover stages are jitted
    (compile once per shape, reuse across proofs — transcript values enter
    as arguments).  On CPU we run eagerly: XLA:CPU's LLVM codegen and
    algebraic simplifier are superlinear in the depth of our u32 limb-mul
    chains (observed: >20 chained Goldilocks muls in one fusion => minutes
    of compile), while eager per-op execution is fine for test sizes.
    Override with MULTISTARK_JIT=0/1."""
    global _JIT_ENABLED
    if _JIT_ENABLED is None:
        import os

        v = os.environ.get("MULTISTARK_JIT")
        if v is not None:
            _JIT_ENABLED = v not in ("0", "false", "off")
        else:
            _JIT_ENABLED = jax.default_backend() != "cpu"
    return _JIT_ENABLED


def cached_jit(key, make_fn):
    """Build-and-cache a (possibly jitted) kernel once per key (ops objects
    are singletons, so closures over them are safe); jax's own cache then
    specializes per argument shapes, and the persistent compilation cache
    works because no proof-varying values are baked into the trace."""
    fn = _JIT_CACHE.get(key)
    if fn is None:
        fn = make_fn()
        if jit_enabled():
            fn = hoisted_jit(fn)
        _JIT_CACHE[key] = fn
    return fn


def _hoist_enabled() -> bool:
    import os

    return os.environ.get("MULTISTARK_HOIST", "1") not in ("0", "false", "off")


def hoisted_jit(fn):
    """jax.jit with closure-constant hoisting.

    Kernel bodies capture large precomputed tables (NTT twiddle stages,
    bit-reverse index arrays, coset x tables, selector vectors) as trace-time
    constants; jax lowers those into the StableHLO module as dense literals.
    At 2^18 traces the fused stage-commit program reached ~14 MB of MLIR
    (mostly twiddles), which OOM-killed the axon remote compile helper and
    made every compile pay serialization + constant-folding over megabytes.

    This wrapper traces the body once per input signature (jax.make_jaxpr),
    pulls the captured array constants out of the jaxpr, uploads them to
    device ONCE, and re-invokes the jaxpr under jit with the constants as
    runtime ARGUMENTS — the lowered module is then a few hundred KB of pure
    code, identical math, and the same compiled program is reused across
    proofs.  MULTISTARK_HOIST=0 falls back to plain jax.jit."""
    if not _hoist_enabled():
        return jax.jit(fn)
    import jax.core as jcore

    cache: dict = {}

    def wrapper(*args):
        flat, in_tree = jax.tree_util.tree_flatten(args)
        if any(isinstance(l, jcore.Tracer) for l in flat):
            # nested call inside another traced kernel (e.g. batch_inv
            # inside a fused stage body): inline — the outer program traces
            # it; a make_jaxpr here would capture outer tracers as consts
            return fn(*args)
        sig = (
            in_tree,
            tuple(
                (np.shape(l), np.result_type(l).str, bool(getattr(l, "weak_type", False)))
                for l in flat
            ),
        )
        entry = cache.get(sig)
        if entry is None:
            closed, out_shape = jax.make_jaxpr(
                lambda *fl: fn(*jax.tree_util.tree_unflatten(in_tree, fl)),
                return_shape=True,
            )(*flat)
            if any(isinstance(c, jcore.Tracer) for c in closed.consts):
                # some ambient trace leaked into the constants: do not cache
                return fn(*args)
            out_tree = jax.tree_util.tree_structure(out_shape)
            # one device_put per constant, reused by every later call
            consts = [
                c if isinstance(c, jax.Array) else jax.device_put(np.asarray(c))
                for c in closed.consts
            ]
            jaxpr = closed.jaxpr

            def run(cs, *fl):
                out_flat = jcore.eval_jaxpr(jaxpr, cs, *fl)
                return jax.tree_util.tree_unflatten(out_tree, out_flat)

            entry = (jax.jit(run), consts)
            cache[sig] = entry
        jitted, consts = entry
        return jitted(consts, *flat)

    return wrapper


def np_mirrors_enabled() -> bool:
    """Kill-switch for every eager NumPy mirror (MULTISTARK_NP_MIRRORS=0
    forces the jnp kernels; tests/test_np_mirror_parity.py pins byte
    equality between the two)."""
    import os

    return os.environ.get("MULTISTARK_NP_MIRRORS", "1") not in ("0", "false", "off")


def batch_inv(ops, x, axis: int = -1):
    # ops.name is required: an id()-keyed fallback would alias recycled ids
    # (CLAUDE.md cache rule) and return a kernel bound to a different ops
    def _plain(l):  # not a tracer, not sharded across devices
        if isinstance(l, jax.core.Tracer):
            return False
        sh = getattr(l, "sharding", None)
        return sh is None or len(sh.device_set) <= 1

    if not jit_enabled() and np_mirrors_enabled() and all(
        _plain(l) for l in jax.tree.leaves(x)
    ):  # never under a jitted body (tracers) nor on mesh-sharded arrays
        out = _np_batch_inv(ops, x)
        if out is not None:
            return out
    key = (ops.name, "batch_inv", axis)
    return cached_jit(key, lambda: lambda y: _batch_inv_impl(ops, y, axis))(x)


def _np_batch_inv(ops, x):
    """Eager (CPU test) batch inverse: one NumPy product tree over ALL
    elements + a single host inversion.  Elementwise inversion is
    order-independent, so the axis is irrelevant — everything flattens into
    one chain.  Zero entries map to zero (p3 batch-inverse semantics).
    Returns None for ops without a NumPy mirror."""
    from .fields import npref

    base = getattr(ops, "base", ops)
    host = base.host
    if host.name not in ("Goldilocks", "BabyBear"):
        return None
    nf = npref.NpField(host)
    a = ops.to_np(x)
    D = getattr(ops, "D", 1)
    shape = a.shape
    rows = a.reshape(-1, D) if D > 1 else a.reshape(-1, 1)
    if D == 2 and getattr(ops, "name", "") == "Goldilocks^2":
        fast = npref.gl2_batch_inv_native(rows, raise_on_zero=False)
        if fast is not None:  # zeros map to zero natively
            return ops.from_np(fast.reshape(shape))
    zero = ~rows.any(axis=1)
    safe = rows.copy()
    safe[zero, 0] = 1
    if D > 1:
        he = _HOST_EXT_CACHE.get(ops.name)
        if he is None:
            from .fields.host import HostExtField

            he = HostExtField(base.host, ops.D, ops.w, ops.name)
            _HOST_EXT_CACHE[ops.name] = he
        inv = npref.NpExt(nf, he).batch_inv(safe)
    else:
        inv = npref.np_batch_inv_base(nf, host, safe[:, 0])[:, None]
    inv[zero] = 0
    return ops.from_np(inv.reshape(shape) if D > 1 else inv.reshape(shape))


def _batch_inv_impl(ops, x, axis: int = -1):
    """Montgomery-trick batch inverse along ``axis`` via two associative scans
    (log-depth on device) + one Fermat inverse.  Zero entries map to zero,
    matching p3_field::batch_multiplicative_inverse semantics (used at
    reference src/lookup.rs:501)."""
    is_zero = ops.is_zero(x)
    one = _ones_like(ops, x)
    safe = ops.select(is_zero, one, x)

    # inside any trace (jit, shard_map body) the eager host shortcuts below
    # would leak tracers into NumPy: take the on-device path unconditionally
    traced = jit_enabled() or any(
        isinstance(l, jax.core.Tracer) for l in jax.tree.leaves(x)
    )
    moved = jax.tree.map(lambda a: jnp.moveaxis(a, axis, 0), safe)
    if traced:
        prefix = jax.lax.associative_scan(ops.mul, moved, axis=0)          # P_i = x0..xi
        suffix = jax.lax.associative_scan(ops.mul, moved, axis=0, reverse=True)  # S_i = xi..x_{n-1}
    else:
        # eager (CPU test) path: lax.associative_scan rebuilds its whole
        # combine network per call with enormous per-op dispatch overhead
        # (~3.5 s/call at 2^12); a hand-rolled Hillis-Steele is the same
        # log-depth math in ~log2(n) eager ops.
        prefix = _eager_scan_mul(ops, moved, reverse=False)
        suffix = _eager_scan_mul(ops, moved, reverse=True)
    total = jax.tree.map(lambda a: a[-1:], prefix)
    if traced:
        total_inv = ops.inv(total)
    else:
        # eager: ops.inv is a Fermat ladder (~64 sequential eager muls on a
        # 1-element array); one host inversion is exact and instant
        total_inv = _host_inv_scalar(ops, total)

    # out_i = P_{i-1} * S_{i+1} * total_inv
    def shift_down(a):  # P_{i-1}: drop last, prepend identity
        return a[:-1]

    def shift_up(a):  # S_{i+1}: drop first, append identity
        return a[1:]

    p_prev = _concat(ops, _ones_like_slice(ops, moved), jax.tree.map(shift_down, prefix))
    s_next = _concat(ops, jax.tree.map(shift_up, suffix), _ones_like_slice(ops, moved))
    out = ops.mul(ops.mul(p_prev, s_next), _broadcast_leading(total_inv, p_prev))
    out = jax.tree.map(lambda a: jnp.moveaxis(a, 0, axis), out)
    return ops.select(is_zero, _zeros_like(ops, x), out)


def _ones_like(ops, x):
    shape = jax.tree.leaves(x)[0].shape
    if hasattr(ops, "D"):
        return ops.from_base(ops.base.const(1, shape))
    return ops.const(1, shape)


def _zeros_like(ops, x):
    shape = jax.tree.leaves(x)[0].shape
    return ops.zeros(shape)


_HOST_EXT_CACHE: dict = {}


def _host_inv_scalar(ops, total):
    """Invert the single-element `total` on host (eager path only; `total`
    is guaranteed nonzero by the zero-masking above)."""
    t = ops.to_np(total)
    if hasattr(ops, "D"):
        he = _HOST_EXT_CACHE.get(ops.name)
        if he is None:
            from .fields.host import HostExtField

            he = HostExtField(ops.base.host, ops.D, ops.w, ops.name)
            _HOST_EXT_CACHE[ops.name] = he
        inv = he.inv(tuple(int(c) for c in t[0]))
        return ops.const(inv, (1,))
    return ops.const(ops.host.inv(int(t[0])), (1,))


def _eager_scan_mul(ops, a, reverse: bool):
    """Inclusive product scan along axis 0 (Hillis-Steele): prefix when
    ``reverse`` is False, suffix when True.  Semantics identical to
    jax.lax.associative_scan(ops.mul, a, axis=0[, reverse=True])."""
    n = jax.tree.leaves(a)[0].shape[0]
    s = 1
    while s < n:
        if reverse:
            keep = jax.tree.map(lambda t, _s=s: t[-_s:], a)
            prod = ops.mul(
                jax.tree.map(lambda t, _s=s: t[:-_s], a),
                jax.tree.map(lambda t, _s=s: t[_s:], a),
            )
            a = _concat(ops, prod, keep)
        else:
            keep = jax.tree.map(lambda t, _s=s: t[:_s], a)
            prod = ops.mul(
                jax.tree.map(lambda t, _s=s: t[_s:], a),
                jax.tree.map(lambda t, _s=s: t[:-_s], a),
            )
            a = _concat(ops, keep, prod)
        s <<= 1
    return a


def _ones_like_slice(ops, moved):
    shape = (1,) + jax.tree.leaves(moved)[0].shape[1:]
    if hasattr(ops, "D"):
        return ops.from_base(ops.base.const(1, shape))
    return ops.const(1, shape)


def _concat(ops, a, b):
    return jax.tree.map(lambda x, y: jnp.concatenate([x, y], axis=0), a, b)


def _broadcast_leading(total_inv, like):
    n = jax.tree.leaves(like)[0].shape[0]
    return jax.tree.map(lambda a: jnp.broadcast_to(a, (n,) + a.shape[1:]), total_inv)


def field_sum(ops, x, axis: int = -1):
    """Modular tree-reduction sum along ``axis`` (log-depth halving)."""
    moved = jax.tree.map(lambda a: jnp.moveaxis(a, axis, 0), x)
    n = jax.tree.leaves(moved)[0].shape[0]
    while n > 1:
        half = n // 2
        lo = jax.tree.map(lambda a: a[:half], moved)
        hi = jax.tree.map(lambda a: a[half : 2 * half], moved)
        s = ops.add(lo, hi)
        if n % 2:
            tail = jax.tree.map(lambda a: a[-1:], moved)
            first = ops.add(jax.tree.map(lambda a: a[:1], s), tail)
            s = jax.tree.map(lambda f, a: jnp.concatenate([f, a[1:]], axis=0), first, s)
        moved = s
        n = jax.tree.leaves(moved)[0].shape[0]
    return jax.tree.map(lambda a: jnp.squeeze(a, 0), moved)


def cumsum(ops, x, axis: int = -1):
    """Inclusive modular cumulative sum along ``axis`` (log-depth scan).
    Used for the logUp accumulator chain (reference src/lookup.rs:472-555
    threads it serially; we restructure as a parallel prefix sum)."""
    moved = jax.tree.map(lambda a: jnp.moveaxis(a, axis, 0), x)
    if jit_enabled() or any(
        isinstance(l, jax.core.Tracer) for l in jax.tree.leaves(x)
    ):
        acc = jax.lax.associative_scan(ops.add, moved, axis=0)
    else:
        # eager: same Hillis-Steele rationale as batch_inv (associative_scan
        # rebuilds its combine network per eager call)
        acc = _eager_scan(ops.add, moved)
    return jax.tree.map(lambda a: jnp.moveaxis(a, 0, axis), acc)


def _eager_scan(combine, a):
    """Inclusive scan along axis 0 with `combine` (Hillis-Steele), identical
    semantics to jax.lax.associative_scan(combine, a, axis=0)."""
    n = jax.tree.leaves(a)[0].shape[0]
    s = 1
    while s < n:
        keep = jax.tree.map(lambda t, _s=s: t[:_s], a)
        comb = combine(
            jax.tree.map(lambda t, _s=s: t[_s:], a),
            jax.tree.map(lambda t, _s=s: t[:-_s], a),
        )
        a = jax.tree.map(lambda k, c: jnp.concatenate([k, c], axis=0), keep, comb)
        s <<= 1
    return a


def ext_scalar(E, v):
    """Host extension value -> device ext scalar (shape-() planes), suitable
    as a jit argument (NOT baked into the trace)."""
    return tuple(E.base.from_np(np.uint64(c)) for c in v)


def ext_pack(E, vals):
    """k host extension values -> ONE device upload (planes shaped (k, D)).
    Each `ext_scalar` costs ~6 ms of per-transfer overhead through the axon
    tunnel (round-4 probe); a prove uploads ~25 transcript scalars, so hot
    kernels take one packed argument and unpack IN-TRACE via ext_unpack."""
    p = E.base.host.p
    vals = list(vals)
    assert vals, "ext_pack needs at least one value (a (0,)-shaped pack would break ext_unpack)"
    arr = np.asarray([[int(c) % p for c in v] for v in vals], np.uint64)
    return E.base.from_np(arr)


def ext_unpack(E, packed, i: int):
    """Row i of an ext_pack as the standard device ext scalar structure
    (coord-major tuple of plane tuples).  Trace-time only: the slices fuse
    into the consuming program."""
    return tuple(tuple(pl[i, d] for pl in packed) for d in range(E.D))


def base_scalar(F, v: int):
    return F.from_np(np.uint64(v))


def ext_pack_device(E, vals):
    """Device counterpart of ext_pack: k DEVICE ext scalars (each a
    coord-major tuple of plane tuples, the `ext_scalar` format) -> the
    (k, D)-plane packed structure ext_unpack expects.  Runs as ONE cached
    program per k (each eager jnp op costs ~5 ms of dispatch through the
    axon tunnel), so packed transcript scalars come from DeviceDuplex
    draws with a single dispatch and no host sync."""
    vals = tuple(vals)
    return cached_jit(
        (E.name, "ext_pack_dev", len(vals)),
        lambda _E=E: lambda vs: _ext_pack_device_impl(_E, vs),
    )(vals)


def _ext_pack_device_impl(E, vals):
    import jax.numpy as jnp

    D = E.D
    nplanes = E.base.num_planes
    planes = []
    for p in range(nplanes):
        rows = [
            jnp.stack([jnp.asarray(v[d][p]).reshape(()) for d in range(D)])
            for v in vals
        ]
        planes.append(jnp.stack(rows))
    return tuple(planes)


def ext_scale_base_device(E, v, c: int):
    """Device ext scalar v (coord-major plane tuples) times a HOST base
    constant c — used for the ζ·g opening points in the device-transcript
    prove."""
    return tuple(E.base.mul(coord, E.base.const(c, ())) for coord in v)
