"""logUp multiset-channel lookup argument (reference src/lookup.rs).

Layout contracts (reference src/lookup.rs:13-26):
  - publics per circuit = 4 extension values flattened:
    (beta, gamma, acc_initial, acc_final)  =>  num_publics = 4·D
  - stage-2 width = max(L, 1)·D base columns: one partial accumulator per
    lookup slot (or a single pass-through slot when the circuit has none)

Chained-accumulator scheme (reference src/lookup.rs:285-325): no message
inverses are committed.  With m_{r,j} = beta + fingerprint(gamma, args_{r,j}):

  step j < L-1 :  m_{r,j}·(acc_{r,j+1} - acc_{r,j}) - mult_{r,j} = 0
  wrap (j=L-1) :  m_{r,L-1}·(acc_{r+1,0} - acc_{r,L-1} - is_last_row·Δ)
                      - mult_{r,L-1} = 0

with Δ = (acc_initial - acc_final) / (n·g) — the unnormalized is_last_row
selector contributes exactly n·g at the last row (pinned in
tests/test_domains.py), so telescoping around the cyclic row chain forces

  Σ_{r,j} mult/m  =  acc_final - acc_initial.

The direct evaluation here is generic over the working algebra (device base
arrays on the quotient domain / host extension scalars at zeta) and is NEVER
compiled; `synthesize_lookups` is the executable spec used to pin it
(reference src/lookup.rs:326-371, 758-867).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import expr as ex
from .fields.host import ExtensionParams, HostExtField, HostField
from .graph import ConstraintGraph
from .utils import batch_inv, cached_jit, cumsum, ext_scalar

ExtVal = Tuple[int, ...]


# --- layout (reference src/lookup.rs:78-99) ----------------------------------

def num_publics(degree: int) -> int:
    return 4 * degree


def stage2_width(num_lookups: int, degree: int) -> int:
    return max(num_lookups, 1) * degree


def logup_constraint_count(num_lookups: int, degree: int) -> int:
    return max(num_lookups, 1) * degree


def logup_max_degree(graph: ConstraintGraph) -> int:
    """Analytic degree of the logUp constraints (reference
    src/lookup.rs:262-278): per lookup max(max arg degree + 1, mult degree);
    1 for the pass-through circuit."""
    if not graph.lookups:
        return 1
    out = 1
    for mult, args in graph.lookups:
        arg_deg = max((graph.degrees[a] for a in args), default=0)
        out = max(out, arg_deg + 1, graph.degrees[mult])
    return out


# --- host fingerprints (reference src/lookup.rs:375-384) ---------------------

def fingerprint(he: HostExtField, gamma: ExtVal, vals: Sequence[int]) -> ExtVal:
    """Horner: v_0 + γ·(v_1 + γ·(...))  =  Σ v_i γ^i."""
    acc = he.zero
    for v in reversed(vals):
        acc = he.add(he.mul(acc, gamma), he.from_base(v % he.base.p))
    return acc


def claims_accumulator(
    he: HostExtField, beta: ExtVal, gamma: ExtVal, claims: Sequence[Sequence[int]]
) -> ExtVal:
    """acc_0 = Σ_claims (β + fingerprint(γ, claim))^-1
    (reference src/prover.rs:381-387).

    Large homogeneous claim lists (the bench proves one claim per row) take
    the vectorized NumPy path: Horner fingerprints over (n, L) arrays and a
    Montgomery-trick batch inverse — no per-claim Fermat exponentiation.
    The scalar loop stays as the reference (pinned in tests/test_lookup.py)."""
    if he.base.name in ("Goldilocks", "BabyBear"):
        from .challenger import _canonical_claims_array

        vals = _canonical_claims_array(claims, he.base.p)
        if vals is not None:
            return _claims_accumulator_np(he, beta, gamma, vals)
    acc = he.zero
    for claim in claims:
        fp = fingerprint(he, gamma, [int(v) for v in claim])
        acc = he.add(acc, he.inv(he.add(beta, fp)))
    return acc


def _claims_accumulator_np(he, beta, gamma, vals: np.ndarray) -> ExtVal:
    """vals: (n, L) canonical uint64 claims."""
    from .fields.npref import NpExt, NpField

    nf = NpField(he.base)
    ne = NpExt(nf, he)
    n = vals.shape[0]
    if he.name == "Goldilocks^2":
        fast = _claims_accumulator_native(he, beta, gamma, vals)
        if fast is not None:
            return fast
    g = ne.of_scalar(gamma)
    acc = np.zeros((n, he.D), np.uint64)
    for j in range(vals.shape[1] - 1, -1, -1):  # Horner over claim positions
        acc = ne.mul(acc, g)
        acc[..., 0] = nf.add(acc[..., 0], vals[:, j])
    acc = ne.add(acc, ne.of_scalar(beta, (n,)))
    inv = ne.batch_inv(acc)
    total = nf.sum_axis(inv, 0)  # (D,)
    return tuple(int(c) for c in total)


def _claims_accumulator_native(he, beta, gamma, vals: np.ndarray):
    """C-accelerated Goldilocks^2 path (csrc/b3.c msgl_claims_acc2):
    fingerprint + Montgomery batch inverse in one native pass.  Returns
    None if the native lib is absent; raises ZeroDivisionError on a zero
    denominator like the scalar path."""
    import ctypes

    from .hash.blake3 import _native_lib

    lib = _native_lib()
    if lib is None or not hasattr(lib, "msgl_claims_acc2"):
        return None
    n, L = vals.shape
    vals = np.ascontiguousarray(vals, np.uint64)
    g = np.asarray([c % he.base.p for c in gamma], np.uint64)
    b = np.asarray([c % he.base.p for c in beta], np.uint64)
    scratch = np.empty(2 * n, np.uint64)
    out = np.empty(2, np.uint64)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    rc = lib.msgl_claims_acc2(
        vals.ctypes.data_as(u64p), n, L, g.ctypes.data_as(u64p),
        b.ctypes.data_as(u64p), scratch.ctypes.data_as(u64p),
        out.ctypes.data_as(u64p),
    )
    if rc != 0:
        raise ZeroDivisionError("zero denominator in claims accumulator")
    return (int(out[0]), int(out[1]))


# --- generic ext-coordinate arithmetic over a working algebra ----------------

class ExtCoordOps:
    """Binomial-extension arithmetic where each coordinate is a working-type
    value W of an underlying Algebra (base arrays on device, ext scalars in
    the verifier).  Karatsuba for D=2 (reference src/lookup.rs:152-256)."""

    def __init__(self, alg, ep: ExtensionParams):
        self.alg = alg
        self.D = ep.degree
        self.w = ep.w
        self.karatsuba = ep.karatsuba

    def embed_host(self, v: ExtVal):
        return tuple(self.alg.const(c) for c in v)

    def from_w(self, w):
        zero = self.alg.const(0)
        return (w,) + (zero,) * (self.D - 1)

    def add(self, a, b):
        return tuple(self.alg.add(x, y) for x, y in zip(a, b))

    def sub(self, a, b):
        return tuple(self.alg.sub(x, y) for x, y in zip(a, b))

    def scale_w(self, a, w):
        return tuple(self.alg.mul(x, w) for x in a)

    def mul(self, a, b):
        alg = self.alg
        if self.D == 2 and self.karatsuba:
            t0 = alg.mul(a[0], b[0])
            t1 = alg.mul(a[1], b[1])
            t2 = alg.mul(alg.add(a[0], a[1]), alg.add(b[0], b[1]))
            c0 = alg.add(t0, alg.mul(alg.const(self.w), t1))
            c1 = alg.sub(t2, alg.add(t0, t1))
            return (c0, c1)
        D = self.D
        out = [None] * D
        for i in range(D):
            for j in range(D):
                t = alg.mul(a[i], b[j])
                k = i + j
                if k >= D:
                    k -= D
                    t = alg.mul(alg.const(self.w), t)
                out[k] = t if out[k] is None else alg.add(out[k], t)
        return tuple(out)


# --- direct logUp constraint evaluation (reference src/lookup.rs:152-256) ----

def logup_constraint_values(
    alg,
    ep: ExtensionParams,
    hf: HostField,
    num_lookups: int,
    stage2_fn,  # (base_column, offset:0|1) -> W
    lookup_vals: Sequence[Tuple[object, Tuple[object, ...]]],  # (mult W, args)
    is_last_row_w,  # W value of the unnormalized is_last_row selector
    publics_emb,  # (β, γ, acc_i, acc_f) — each a D-tuple of W values
    log_n: int,
) -> List[Tuple]:
    """Returns max(L,1) extension constraint values as D-tuples of W, in slot
    order.  Evaluated directly — never compiled (SURVEY.md lookup row).
    Publics arrive pre-embedded in the working type so jitted callers pass
    them as arguments rather than baking transcript values into the trace."""
    X = ExtCoordOps(alg, ep)
    D = ep.degree
    beta_emb, gamma_emb, acc_i, acc_f = publics_emb
    n = 1 << log_n
    g = hf.two_adic_generator(log_n)
    inv_ng = alg.const(hf.inv(hf.mul(n % hf.p, g)))
    delta = X.scale_w(X.sub(acc_i, acc_f), inv_ng)

    def s2(slot: int, offset: int):
        return tuple(stage2_fn(slot * D + d, offset) for d in range(D))

    if num_lookups == 0:
        diff = X.sub(s2(0, 1), s2(0, 0))
        return [X.sub(diff, X.scale_w(delta, is_last_row_w))]

    out = []
    for j in range(num_lookups):
        mult, args = lookup_vals[j]
        zero = alg.const(0)
        m = (zero,) * D
        for a in reversed(args):
            m = X.add(X.mul(m, gamma_emb), X.from_w(a))
        m = X.add(m, beta_emb)
        if j < num_lookups - 1:
            diff = X.sub(s2(j + 1, 0), s2(j, 0))
        else:
            diff = X.sub(s2(0, 1), s2(j, 0))
            diff = X.sub(diff, X.scale_w(delta, is_last_row_w))
        c = X.mul(m, diff)
        c = (alg.sub(c[0], mult),) + c[1:]
        out.append(c)
    return out


# --- executable synthesized spec (reference src/lookup.rs:326-371) -----------

def synthesize_lookups(
    lookups: Sequence[ex.Lookup], ep: ExtensionParams, hf: HostField, log_n: int
) -> List[ex.ExtExpr]:
    """The same constraints as compilable ExtExprs (test reference only —
    production uses the direct evaluation above)."""
    D = ep.degree
    beta = ex.public_ext(0, D)
    gamma = ex.public_ext(1, D)
    acc_i = ex.public_ext(2, D)
    acc_f = ex.public_ext(3, D)
    n = 1 << log_n
    inv_ng = hf.inv(hf.mul(n % hf.p, hf.two_adic_generator(log_n)))
    delta = ex.ExtBase(ex.Const(inv_ng)) * (acc_i - acc_f)
    L = len(lookups)
    if L == 0:
        diff = ex.stage2_ext_next(0, D) - ex.stage2_ext(0, D)
        return [diff - ex.ExtBase(ex.IsLastRow()) * delta]
    out = []
    for j, lk in enumerate(lookups):
        m = ex.ExtBase(ex.Const(0))
        for a in reversed(lk.args):
            m = m * gamma + ex.ExtBase(a)
        m = m + beta
        if j < L - 1:
            diff = ex.stage2_ext(j + 1, D) - ex.stage2_ext(j, D)
        else:
            diff = ex.stage2_ext_next(0, D) - ex.stage2_ext(j, D)
            diff = diff - ex.ExtBase(ex.IsLastRow()) * delta
        out.append(m * diff - ex.ExtBase(lk.multiplicity))
    return out


# --- witness-side lookup values (reference src/lookup.rs:392-675) ------------

@dataclass
class LookupValues:
    """Per-circuit lookup witness: for each slot, the multiplicity column and
    argument columns as device base-field arrays of shape (n,)."""

    height: int
    mults: List[object]  # L base arrays (n,)
    args: List[List[object]]  # L lists of base arrays (n,)


def stage_2_traces(
    F,  # device base FieldOps
    E,  # device ExtOps
    hf: HostField,
    he: HostExtField,
    lookup_values: Sequence[LookupValues],
    beta: ExtVal,
    gamma: ExtVal,
    acc0: ExtVal,
):
    """Build all active circuits' stage-2 traces + per-circuit intermediate
    accumulators, threading one global accumulator (reference
    src/lookup.rs:472-555; the serial row chain becomes a parallel prefix
    scan, SURVEY.md §7.1 step 7).

    Returns (stage2_mats: [(max(L,1)·D, n) base matrices], accs: [ExtVal]).
    """
    D = E.D
    from . import parallel
    from .utils import ext_pack, ext_unpack, jit_enabled

    if (
        jit_enabled()
        and parallel.current_mesh() is None
        # message budget counts only circuits with lookups: an L==0 circuit
        # compiles to a trivial pass-through broadcast, so tall no-lookup
        # circuits must not push a mixed system off the fused path
        and sum(lv.height * len(lv.mults) for lv in lookup_values)
        < (1 << _s2_fuse_log())
    ):
        return _stage_2_traces_fused(F, E, hf, he, lookup_values, beta, gamma, acc0)
    mats = []
    accs = []
    acc = acc0
    for lv in lookup_values:
        n, L = lv.height, len(lv.mults)
        if L == 0:
            # pass-through: a (D, n) matrix of the constant accumulator
            acc_d = ext_scalar(E, acc)
            planes = tuple(
                jnp.broadcast_to(
                    jnp.stack([acc_d[d][p] for d in range(D)])[:, None], (D, n)
                )
                for p in range(F.num_planes)
            )
            mats.append(planes)
            accs.append(acc)
            continue
        from . import parallel
        from .utils import jit_enabled, np_mirrors_enabled

        pm = parallel.current_mesh()
        if pm is not None and n >= pm.n and n % pm.n == 0:
            planes, total = parallel.sharded_stage2(
                F, E, pm, lv.mults, lv.args,
                ext_scalar(E, beta), ext_scalar(E, gamma), ext_scalar(E, acc),
            )
            acc = he.add(acc, tuple(int(x) for x in E.to_np(total)))
            mats.append(planes)
            accs.append(acc)
            continue
        if not jit_enabled() and np_mirrors_enabled() and hf.name in ("Goldilocks", "BabyBear"):
            planes, total_host = _stage2_np(F, E, hf, he, lv, beta, gamma, acc)
            acc = he.add(acc, total_host)
            mats.append(planes)
            accs.append(acc)
            continue
        # three cached kernels instead of one fused program: the messages,
        # the batch inverse, and the scan+extract.  Identical math/values;
        # the axon remote-compile tunnel drops very long single compiles
        # (observed: the fused kernel at n=2^18, n·L ≈ 3.4M, died with
        # Unexpected EOF), and smaller units also retry/cache incrementally.
        from .utils import ext_pack, ext_unpack

        shape_key = (L, tuple(len(a) for a in lv.args), n)
        kern_m = cached_jit(
            (E.name, "s2_msgs", *shape_key),
            lambda: lambda args, mults, pk: _stage2_msgs(
                F, E, args, mults, ext_unpack(E, pk, 0), ext_unpack(E, pk, 1)
            ),
        )
        kern_i = cached_jit(
            (E.name, "s2_inv", *shape_key),
            lambda: lambda msgs: batch_inv(E, msgs, axis=0),
        )
        kern_s = cached_jit(
            (E.name, "s2_scan", *shape_key),
            lambda: lambda inv, mults, pk: _stage2_scan(
                F, E, L, inv, mults, ext_unpack(E, pk, 2)
            ),
        )
        # β, γ, acc in ONE upload per circuit (~6 ms per transfer otherwise)
        packed = ext_pack(E, (beta, gamma, acc))
        flat_msgs, flat_mults = kern_m(lv.args, lv.mults, packed)
        inv_msgs = kern_i(flat_msgs)
        planes, total = kern_s(inv_msgs, flat_mults, packed)
        total_np = E.to_np(total)
        acc = he.add(acc, tuple(int(x) for x in total_np))
        mats.append(planes)
        accs.append(acc)
    return mats, accs


def _s2_fuse_log() -> int:
    """Fuse EVERY circuit's stage-2 construction into one program when the
    total message count is below 2^this (the accumulator threads on device;
    per-circuit kernels + per-circuit total syncs cost ~5-20 ms of tunnel
    overhead each).  The round-4 2^21 guard protected the remote compile
    helper from multi-MB MLIR constants; utils.hoisted_jit turned those
    into runtime arguments, so the default rises to 2^25 (2^20 rows × 13
    lookups stays fused); without hoisting the old guard returns."""
    import os

    from .utils import _hoist_enabled

    default = "25" if _hoist_enabled() else "21"
    return int(os.environ.get("MULTISTARK_S2_FUSE_LOG", default))


def _stage_2_traces_fused(F, E, hf, he, lookup_values, beta, gamma, acc0):
    """stage_2_traces as ONE cached program over all circuits.  Identical
    math to the per-circuit path (same slot-minor chain order); the host
    reads every circuit's chain total in one fetch and rebuilds the
    intermediate accumulators."""
    from .utils import cached_jit, ext_pack, ext_unpack

    D = E.D
    sig = tuple(
        (lv.height, len(lv.mults), tuple(len(a) for a in lv.args))
        for lv in lookup_values
    )

    kern = cached_jit((E.name, "s2_all", sig), lambda: _mk_s2_fused(F, E, sig))
    mats, totals_dev, _ = kern(
        [lv.args for lv in lookup_values],
        [lv.mults for lv in lookup_values],
        ext_pack(E, (beta, gamma, acc0)),
    )
    accs = []
    acc = acc0
    for t in totals_dev:
        acc = he.add(acc, tuple(int(x) for x in np.asarray(E.to_np(t)).reshape(-1)))
        accs.append(acc)
    return mats, accs


def _mk_s2_fused(F, E, sig):
    """Shared fused stage-2 body: returns (mats, per-circuit chain totals,
    per-circuit running accumulators incl. acc0) — the host path fetches the
    totals, the device-transcript path keeps the accumulators on device."""
    from .utils import ext_unpack

    D = E.D

    def f(args_all, mults_all, pk):
        b = ext_unpack(E, pk, 0)
        g = ext_unpack(E, pk, 1)
        acc_d = ext_unpack(E, pk, 2)
        mats, totals, accs = [], [], []
        for (n, L, _), args, mults in zip(sig, args_all, mults_all):
            if L == 0:
                planes = tuple(
                    jnp.broadcast_to(
                        jnp.stack([acc_d[d][p] for d in range(D)])[:, None], (D, n)
                    )
                    for p in range(F.num_planes)
                )
                mats.append(planes)
                totals.append(E.zeros(()))
                accs.append(acc_d)
                continue
            flat_msgs, flat_mults = _stage2_msgs(F, E, args, mults, b, g)
            inv_msgs = batch_inv(E, flat_msgs, axis=0)
            planes, total = _stage2_scan(F, E, L, inv_msgs, flat_mults, acc_d)
            acc_d = E.add(acc_d, total)
            mats.append(planes)
            totals.append(total)
            accs.append(acc_d)
        return mats, totals, accs

    return f


def stage_2_traces_device(F, E, lookup_values, beta_d, gamma_d, acc0_d):
    """Device-transcript stage-2: β/γ/acc₀ arrive as DEVICE scalars (duplex
    draws / the device claims accumulator), no host value touches the chain.
    Returns (stage-2 matrices, per-circuit running accumulators — device ext
    scalars for duplex observation and the quotient kernels)."""
    from .utils import cached_jit, ext_pack_device

    sig = tuple(
        (lv.height, len(lv.mults), tuple(len(a) for a in lv.args))
        for lv in lookup_values
    )
    kern = cached_jit((E.name, "s2_all", sig), lambda: _mk_s2_fused(F, E, sig))
    mats, _, accs = kern(
        [lv.args for lv in lookup_values],
        [lv.mults for lv in lookup_values],
        ext_pack_device(E, (beta_d, gamma_d, acc0_d)),
    )
    return mats, accs


def claims_accumulator_device(F, E, claims_arr: np.ndarray, beta_d, gamma_d):
    """Device counterpart of claims_accumulator: acc₀ = Σ (β+fp(γ,claim))⁻¹
    over an (n, L) canonical-u64 claims array with β, γ as device scalars
    (reference src/prover.rs:381-387).  One upload, one program; pinned
    against the host/native path in tests/test_lookup.py."""
    from .utils import batch_inv as _binv, cached_jit, ext_pack_device, field_sum

    n, L = claims_arr.shape
    cols_dev = F.from_np(np.ascontiguousarray(claims_arr.T))  # (L, n) planes

    def mk(_n=n, _L=L):
        from .utils import ext_unpack

        def f(cols, pk):
            b = ext_unpack(E, pk, 0)
            g = ext_unpack(E, pk, 1)
            m = E.zeros((_n,))
            for j in range(_L - 1, -1, -1):
                col = jax.tree.map(lambda p: p[j], cols)
                m = E.add(E.mul(m, g), E.from_base(col))
            m = E.add(m, b)
            inv = _binv(E, m, axis=0)
            return field_sum(E, inv, axis=0)

        return f

    kern = cached_jit((E.name, "claims_acc_dev", n, L), mk)
    return kern(cols_dev, ext_pack_device(E, (beta_d, gamma_d)))


def _stage2_np(F, E, hf, he, lv, beta, gamma, acc):
    """Eager (CPU) NumPy mirror of _stage2_kernel: same slot-minor chain
    order, same values — returns (device planes, host total) so the caller
    and every downstream commit are unchanged."""
    from .fields.npref import NpExt, NpField

    nf = NpField(hf)
    ne = NpExt(nf, he)
    D = E.D
    n, L = lv.height, len(lv.mults)
    g = ne.of_scalar(gamma)
    b = ne.of_scalar(beta)
    msgs = np.empty((n, L, D), np.uint64)
    mults = np.empty((n, L), np.uint64)
    for j in range(L):
        m = np.zeros((n, D), np.uint64)
        for a in reversed(lv.args[j]):
            m = ne.mul(m, g)
            a_np = np.broadcast_to(np.asarray(F.to_np(a), np.uint64), (n,))
            m[:, 0] = nf.add(m[:, 0], a_np)
        msgs[:, j] = ne.add(m, b[None, :])
        mults[:, j] = np.broadcast_to(np.asarray(F.to_np(lv.mults[j]), np.uint64), (n,))
    flat = msgs.reshape(n * L, D)  # row-major, slot-minor (the chain order)
    inv = ne.batch_inv(flat)
    terms = ne.scale(inv, mults.reshape(-1))
    # inclusive prefix sum mod p (native C single pass; Hillis-Steele fallback)
    incl = None
    if he.name == "Goldilocks^2":
        from .fields.npref import gl2_prefix_sum_native

        incl = gl2_prefix_sum_native(terms)
    if incl is None:
        incl = terms.copy()
        s = 1
        while s < incl.shape[0]:
            incl[s:] = nf.add(incl[s:], incl[:-s])
            s <<= 1
    total_host = tuple(int(c) for c in incl[-1])
    excl = np.roll(incl, 1, axis=0)
    excl[0] = 0
    acc_flat = ne.add(excl, ne.of_scalar(acc, (n * L,)))
    rows = acc_flat.reshape(n, L, D)
    # stage-2 matrix layout: row (j·D + d) = coordinate d of slot j
    mat = rows.transpose(1, 2, 0).reshape(L * D, n)
    return E.base.from_np(mat), total_host


def _stage2_msgs(F, E, args_list, mults_list, beta_d, gamma_d):
    """Slot messages + row-major slot-minor interleave (the first third of
    _stage2_kernel, split out for compile-size reasons — see caller)."""
    L = len(args_list)
    n = jax.tree.leaves(mults_list[0])[0].shape[0]
    slot_msgs = []
    for j in range(L):
        m = E.zeros((n,))
        for a in reversed(args_list[j]):
            m = E.add(E.mul(m, gamma_d), E.from_base(a))
        m = E.add(m, beta_d)
        slot_msgs.append(m)
    flat_msgs = jax.tree.map(lambda *xs: jnp.stack(xs, axis=1).reshape(-1), *slot_msgs)
    flat_mults = jax.tree.map(lambda *xs: jnp.stack(xs, axis=1).reshape(-1), *mults_list)
    return flat_msgs, flat_mults


def _stage2_scan(F, E, L, inv_msgs, flat_mults, acc_d):
    """Terms, prefix scan, accumulator injection, column extraction (the
    last third of _stage2_kernel)."""
    D = E.D
    n = jax.tree.leaves(flat_mults)[0].shape[0] // L
    terms = E.scale(inv_msgs, flat_mults)
    incl = cumsum(E, terms, axis=0)
    excl = jax.tree.map(
        lambda a: jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]], axis=0), incl
    )
    acc_flat = E.add(excl, acc_d)
    total = jax.tree.map(lambda a: a[-1], incl)
    rows = []
    for j in range(L):
        for d in range(D):
            rows.append(jax.tree.map(lambda a: a.reshape(n, L)[:, j], acc_flat[d]))
    planes = tuple(
        jnp.stack([r[p] for r in rows], axis=0) for p in range(F.num_planes)
    )
    return planes, total


def _stage2_kernel(F, E, mults_list, args_list, beta_d, gamma_d, acc_d):
    """Whole per-circuit stage-2 computation (one traceable body — the
    eager CPU-mesh path and the sharded shard_map body use this; the TPU
    path compiles the three pieces separately, see stage_2_traces).
    beta/gamma/acc are device ext scalars (arguments, not baked
    constants); chain order is row-major, slot-minor."""
    flat_msgs, flat_mults = _stage2_msgs(F, E, args_list, mults_list, beta_d, gamma_d)
    inv_msgs = batch_inv(E, flat_msgs, axis=0)
    return _stage2_scan(F, E, len(args_list), inv_msgs, flat_mults, acc_d)
