"""Row-sharded proving over a jax device mesh (SURVEY.md §7.1 step 10;
BASELINE.md scale-out target — the reference itself is single-host rayon,
src/prover.rs:848-855, so this axis is TPU-native new design).

Layout contract (the whole module hangs on this):

  - NATURAL-order arrays are sharded CYCLICALLY: view the (…, n) axis as
    (…, J, D) with element (j, r) = natural index j·D + r and shard the
    residue axis r.  Under cyclic sharding every COARSE DIF butterfly
    (span ≥ D) pairs elements of equal residue — device-local, with the
    stage twiddle tables cyclically sharded the same way.
  - BIT-REVERSED storage arrays are sharded in CONTIGUOUS BLOCKS.  The
    remaining fine DIF stages (span < D) form an independent size-D
    transform along the residue axis; ONE all-to-all moves the residue
    axis local (the four-step transpose), and the result lands exactly
    block-sharded in bit-reversed storage order — which is what the
    Merkle tree wants: each device owns a complete subtree and reduces
    it locally; only the D subtree roots cross devices.

So a sharded commit = local coarse butterflies → all-to-all → local fine
butterflies → local leaf hashing → local subtree reduction → tiny
replicated top.  Collectives per LDE: one all-to-all (plus the implicit
gather of D roots).  On TPU meshes these ride ICI.
"""

from __future__ import annotations

from contextlib import contextmanager
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .merkle import MerkleProverData


@dataclass(frozen=True)
class ProverMesh:
    mesh: Mesh
    axis: str = "rows"

    @property
    def n(self) -> int:
        return self.mesh.shape[self.axis]

    @property
    def log_n(self) -> int:
        return self.n.bit_length() - 1


_CURRENT: Optional[ProverMesh] = None


def current_mesh() -> Optional[ProverMesh]:
    return _CURRENT


@contextmanager
def use_mesh(mesh: Mesh, axis: str = "rows"):
    """Activate row-sharded proving: pcs.commit/commit_from_coeffs shard
    the LDE + Merkle tree of every matrix tall enough over the mesh."""
    global _CURRENT
    pm = ProverMesh(mesh, axis)
    assert pm.n & (pm.n - 1) == 0, "mesh axis size must be a power of two"
    prev = _CURRENT
    _CURRENT = pm
    try:
        yield pm
    finally:
        _CURRENT = prev


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> ProverMesh:
    """Multi-HOST entry point (BASELINE.md scale-out target): initialize the
    jax distributed runtime so every host's local TPU chips join one global
    device set, then build the row mesh over ALL devices.  Collectives in
    the sharded prove (the four-step all-to-all, subtree-root gathers) ride
    ICI within a host and DCN across hosts — no NCCL/MPI analogue needed;
    XLA lowers them from the same shard_map bodies used single-host.

    On TPU pods the three arguments are inferred from the environment
    (``jax.distributed.initialize()`` with no args); pass them explicitly
    for CPU/GPU clusters.  Single-process callers may skip this entirely
    and use :func:`use_mesh` / :func:`global_mesh` directly."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return global_mesh()


def global_mesh(axis: str = "rows") -> ProverMesh:
    """Row mesh over every addressable device (all hosts after
    :func:`init_distributed`; local devices otherwise), truncated to the
    largest power of two."""
    devs = jax.devices()
    n = 1 << (len(devs).bit_length() - 1)
    return ProverMesh(Mesh(np.array(devs[:n]), (axis,)), axis)


# -- sharded DIF ----------------------------------------------------------

# shard_map traces + compiles its whole body even outside jit, so the body
# granularity follows the repo's platform policy (utils.jit_enabled): on TPU
# ONE fused body per transform; on CPU one body per butterfly stage —
# XLA:CPU's codegen is superlinear in the mul-chain depth of a fused body
# (CLAUDE.md; a fused log_n=8 body measured 217s to compile).
_SHARD_KERNELS: dict = {}


def _cached_shard(key, make):
    fn = _SHARD_KERNELS.get(key)
    if fn is None:
        fn = make()
        _SHARD_KERNELS[key] = fn
    return fn


def sharded_dif(engine, pm: ProverMesh, x, log_n: int, inverse: bool):
    """Forward/inverse DIF of natural-order rows (…, n), row axis sharded.

    Input may be unsharded (jax reshards on entry).  Output: bit-reversed
    storage order, block-sharded along the row axis.  Structure: coarse
    stages local under cyclic sharding → one all-to-all → size-D residue
    transform local (four-step; see module docstring)."""
    from .utils import jit_enabled

    D, log_D, axis = pm.n, pm.log_n, pm.axis
    n = 1 << log_n
    J = n // D
    assert J >= D, f"need 2^{log_n} >= D^2 (D={D}) for the all-to-all transpose"
    w = jax.tree.leaves(x)[0].shape[0]
    tw = engine._twiddles(log_n, inverse)
    # descending stage order; coarse = span >= D (cyclically sharded tables)
    tw_coarse = [tw[s - 1] for s in range(log_n, log_D, -1)]
    tw_fine = [tw[s - 1] for s in range(log_D, 0, -1)]
    twc_view = [jax.tree.map(lambda t: t.reshape(-1, D), t_) for t_ in tw_coarse]
    x_view = jax.tree.map(lambda a: a.reshape(a.shape[:-1] + (J, D)), x)

    # key on mesh content, not identity (id() is recycled after GC)
    mesh_key = (tuple(d.id for d in pm.mesh.devices.flat), axis)
    base_key = ("dif", engine.F.name, mesh_key, w, log_n, inverse)

    def coarse_body(xl, twc):
        # xl planes (w, J, 1): one residue class; coarse stages are the
        # standard butterfly recursion on the j axis with the cyclic
        # twiddle slices (geometry derives from table length)
        y = jax.tree.map(lambda a: a.reshape(a.shape[0], J), xl)
        y = engine._dif_stages(
            y, [jax.tree.map(lambda t: t.reshape(-1), t_) for t_ in twc],
            fuse=False,  # cyclic-table geometry: keep the audited radix-2 path
        )
        return jax.tree.map(lambda a: a.reshape(a.shape[0], J, 1), y)

    def transpose_body(xl):
        # four-step transpose: residue axis local, j axis sharded
        return jax.tree.map(
            lambda a: jax.lax.all_to_all(a, axis, split_axis=1, concat_axis=2, tiled=True),
            xl,
        )

    def fine_body(xl, twf):
        # (w, J/D, D): fine stages = size-D DIF along the residue axis
        # (the big transform's low-stage tables ARE the size-D tables:
        # g_D^{D/m} = g_n^{n/m}); local flat (j', r) -> storage positions
        # j'·D + r: block-contiguous
        y = engine._dif_stages(xl, twf, fuse=False)
        return jax.tree.map(lambda a: a.reshape(a.shape[0], J), y)

    spec_cyc = jax.tree.map(lambda _: P(None, None, axis), x_view)
    spec_twc = [jax.tree.map(lambda _: P(None, axis), t_) for t_ in twc_view]
    spec_twf = [jax.tree.map(lambda _: P(None), t_) for t_ in tw_fine]
    spec_jshard = jax.tree.map(lambda _: P(None, axis, None), x_view)
    spec_out = jax.tree.map(lambda _: P(None, axis), x)

    if jit_enabled():
        # one fused body: coarse stages -> all-to-all -> fine stages
        def fused(xl, twc, twf):
            return fine_body(transpose_body(coarse_body(xl, twc)), twf)

        fn = _cached_shard(
            base_key + ("fused",),
            lambda: jax.jit(jax.shard_map(
                fused, mesh=pm.mesh,
                in_specs=(spec_cyc, spec_twc, spec_twf), out_specs=spec_out,
            )),
        )
        return fn(x_view, twc_view, tw_fine)

    # CPU: one shard_map per stage (tiny bodies, fast XLA:CPU compiles).
    # Each stage is jax.jit-wrapped even on CPU: eager shard_map does NOT
    # cache executables (measured: warm call as slow as cold), while jit
    # does; these per-stage bodies are small enough to dodge the XLA:CPU
    # chain-depth pathology that the eager-on-CPU policy guards against.
    cur = x_view
    for i in range(len(twc_view)):
        stage = _cached_shard(
            base_key + ("coarse", i),
            lambda i=i: jax.jit(jax.shard_map(
                lambda xl, t: coarse_body(xl, [t]),
                mesh=pm.mesh,
                in_specs=(spec_cyc, spec_twc[i]),
                out_specs=spec_cyc,
            )),
        )
        cur = stage(cur, twc_view[i])
    tr = _cached_shard(
        base_key + ("transpose",),
        lambda: jax.jit(jax.shard_map(
            transpose_body, mesh=pm.mesh, in_specs=(spec_cyc,), out_specs=spec_jshard
        )),
    )
    cur = tr(cur)
    fine = _cached_shard(
        base_key + ("fine",),
        lambda: jax.jit(jax.shard_map(
            fine_body, mesh=pm.mesh,
            in_specs=(spec_jshard, spec_twf), out_specs=spec_out,
        )),
    )
    return fine(cur, tw_fine)


def sharded_coset_lde_bitrev(engine, pm: ProverMesh, evals_natural, log_n: int,
                             log_blowup: int, shift: int):
    """Sharded commit transform: the small side (iDFT + shift-scale + pad,
    2^-log_blowup of the FLOPs) runs replicated; the dominant big forward
    DIF runs sharded.  Output block-sharded bitrev storage (w, n·B)."""
    F = engine.F
    n = 1 << log_n
    big = log_n + log_blowup
    cb = engine._dif(evals_natural, log_n, inverse=True)
    coeffs = engine._scale(engine._unbrev(cb, log_n), engine.host.inv(n))
    coeffs = F.mul(coeffs, engine.pow_table(shift, n))
    pad = jax.tree.map(
        lambda a: jnp.concatenate(
            [a, jnp.zeros(a.shape[:-1] + ((1 << big) - n,), a.dtype)], axis=-1
        ),
        coeffs,
    )
    return sharded_dif(engine, pm, pad, big, inverse=False)


def sharded_lde_bitrev_from_coeffs(engine, pm: ProverMesh, coeffs_natural, log_big: int):
    """Sharded analog of engine.lde_bitrev_from_coeffs (the fused quotient
    commit path)."""
    n = jax.tree.leaves(coeffs_natural)[0].shape[-1]
    pad = jax.tree.map(
        lambda a: jnp.concatenate(
            [a, jnp.zeros(a.shape[:-1] + ((1 << log_big) - n,), a.dtype)], axis=-1
        ),
        coeffs_natural,
    )
    return sharded_dif(engine, pm, pad, log_big, inverse=False)


# -- sharded stage-2 logUp scan ---------------------------------------------


def sharded_stage2(F, E, pm: ProverMesh, mults_list, args_list, beta_d, gamma_d, acc_d):
    """Row-sharded stage-2 trace construction (lookup._stage2_kernel over a
    block-sharded row axis; reference src/lookup.rs:472-555 threads the chain
    serially — here every device scans its own contiguous row block and ONE
    all_gather of per-device chain totals (mesh-size ext values) stitches the
    global prefix together.

    The chain order is row-major slot-minor, so a contiguous block of rows is
    a contiguous run of the global chain: block-local batch inverse (inverses
    are elementwise-unique, so blocking cannot change a value) + block-local
    inclusive scan + the gathered exclusive block offset reproduce the exact
    accumulator values — the proof bytes are identical to the unsharded
    kernel by modular-arithmetic exactness, not by luck.

    Returns (planes (L·D, n) block-sharded along rows, total ext scalar
    replicated)."""
    from .utils import batch_inv, cumsum, field_sum, jit_enabled

    D = E.D
    L = len(args_list)
    n = jax.tree.leaves(mults_list[0])[0].shape[0]
    axis, nd = pm.axis, pm.n

    if not jit_enabled():
        # eager CPU-mesh policy: the single-device kernel dispatched per-op
        # on block-sharded columns — GSPMD stitches the cross-block scans
        # with collectives (a fused XLA:CPU shard_map body of the same math
        # compiles pathologically; CLAUDE.md).  Values identical either way.
        from jax.sharding import NamedSharding

        from .lookup import _stage2_kernel

        col_s = NamedSharding(pm.mesh, P(axis))
        row_s = NamedSharding(pm.mesh, P(None, axis))
        put = lambda v: jax.tree.map(lambda p: jax.device_put(p, col_s), v)
        planes, total = _stage2_kernel(
            F, E, put(mults_list), put(args_list), beta_d, gamma_d, acc_d
        )
        planes = jax.tree.map(lambda p: jax.device_put(p, row_s), planes)
        return planes, total

    def body(mults, args, b, g, a0):
        n_loc = jax.tree.leaves(mults[0])[0].shape[0]
        slot_msgs = []
        for j in range(L):
            m = E.zeros((n_loc,))
            for a in reversed(args[j]):
                m = E.add(E.mul(m, g), E.from_base(a))
            m = E.add(m, b)
            slot_msgs.append(m)
        # chain order: row-major, slot-minor (lookup._stage2_kernel)
        flat_msgs = jax.tree.map(lambda *xs: jnp.stack(xs, axis=1).reshape(-1), *slot_msgs)
        flat_mults = jax.tree.map(lambda *xs: jnp.stack(xs, axis=1).reshape(-1), *mults)
        inv_msgs = batch_inv(E, flat_msgs, axis=0)
        terms = E.scale(inv_msgs, flat_mults)
        incl = cumsum(E, terms, axis=0)
        local_total = jax.tree.map(lambda a: a[-1], incl)
        # cross-block prefix: every device sees every block total (tiny)
        gathered = jax.tree.map(
            lambda s: jax.lax.all_gather(s, axis, tiled=False), local_total
        )  # ext value of (nd,) planes
        my = jax.lax.axis_index(axis)
        pre_mask = jnp.arange(nd) < my
        offset = field_sum(
            E, jax.tree.map(lambda a: jnp.where(pre_mask, a, 0), gathered), axis=0
        )
        total = field_sum(E, gathered, axis=0)
        excl = jax.tree.map(
            lambda a: jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]], axis=0), incl
        )
        acc_flat = E.add(E.add(excl, offset), a0)
        rows = []
        for j in range(L):
            for d in range(D):
                rows.append(jax.tree.map(lambda a: a.reshape(n_loc, L)[:, j], acc_flat[d]))
        planes = tuple(
            jnp.stack([r[p] for r in rows], axis=0) for p in range(F.num_planes)
        )
        return planes, total

    mesh_key = (tuple(d.id for d in pm.mesh.devices.flat), axis)
    spec_col = jax.tree.map(lambda _: P(axis), mults_list)
    spec_args = jax.tree.map(lambda _: P(axis), args_list)
    spec_scalar = jax.tree.map(lambda _: P(), beta_d)
    fn = _cached_shard(
        ("stage2", E.name, mesh_key, L, tuple(len(a) for a in args_list), n),
        lambda: jax.jit(jax.shard_map(
            body,
            mesh=pm.mesh,
            in_specs=(spec_col, spec_args, spec_scalar, spec_scalar, spec_scalar),
            out_specs=(
                jax.tree.map(lambda _: P(None, axis), tuple(range(F.num_planes))),
                jax.tree.map(lambda _: P(), beta_d),
            ),
            check_vma=False,  # `total` is replicated by construction (same
            # gathered block totals summed on every device)
        )),
    )
    return fn(mults_list, args_list, beta_d, gamma_d, acc_d)


# -- sharded Merkle commit --------------------------------------------------
#
# No bespoke tree code: MerkleMmcs.commit's kernel is sharding-agnostic, and
# with block-sharded inputs every step stays local by construction — leaf
# hashing is elementwise along the row axis, and the stride-2 tree slices
# map block d of layer k to block d of layer k+1, so GSPMD keeps each
# subtree on its device until layers are smaller than the mesh (measured
# bit-identical caps/layers with sharded leaf layers).  All we do is place
# the inputs.


def shard_rows(pm: ProverMesh, mat):
    """Block-shard a field matrix (planes (w, h)) along its row axis."""
    from jax.sharding import NamedSharding

    s = NamedSharding(pm.mesh, P(None, pm.axis))
    return jax.tree.map(lambda p: jax.device_put(p, s), mat)


def sharded_mmcs_commit(mmcs, pm: ProverMesh, mats):
    """MMCS commit with every matrix tall enough block-sharded (matrices
    shorter than the mesh stay replicated; their injection happens in the
    sub-mesh-sized top of the tree).  Bit-identical to an unsharded commit —
    same kernel, different placement."""
    D = pm.n
    placed = []
    for m in mats:
        h = jax.tree.leaves(m)[0].shape[-1]
        already = getattr(jax.tree.leaves(m)[0], "sharding", None)
        if h >= D and not _is_row_sharded(already, pm):
            m = shard_rows(pm, m)
        placed.append(m)
    return mmcs.commit(placed)


def _is_row_sharded(sharding, pm: ProverMesh) -> bool:
    try:
        return sharding is not None and sharding.spec[-1] == pm.axis
    except (AttributeError, IndexError, TypeError):
        return False
