"""Two-adic FRI polynomial commitment scheme.

TPU-native equivalent of p3-fri's TwoAdicFriPcs (reference src/types.rs:85,
209-223; surface inventoried in SURVEY.md §2.2):

  commit     : coset-LDE every matrix onto GENERATOR·H (blowup B), stored in
               bit-reversed row order, Merkle-committed in one mixed-height
               tree.  All NTT + hashing batched on device.
  open       : batched multi-point opening.  Claimed evaluations are computed
               by barycentric interpolation on the *small* (size-n) same-
               shift sub-coset (a stored prefix); the FRI input ("reduced
               opening") per LDE height H is
                   ro_H(x) = sum α^{k} (p_j(x) - p_j(z)) / (x - z)
               accumulated over (round, matrix, point, column) with a per-
               height α-power counter.  Commit phase folds pairs (adjacent in
               bit-reversed order = (x, -x)) with per-round β, committing the
               pair matrix each round; query phase opens input trees and all
               pair rows at challenger-sampled indices.
  verify     : host-side transcript replay + per-query Merkle/fold checks.

Transcript schedule (self-consistent; deviations from p3 are deliberate and
documented): observe ALL claimed opened values -> sample α -> per fold round
(observe cap, grind commit PoW, sample β) -> observe final poly -> grind
query PoW -> sample query indices.  Claimed values are observed *before* α
so an adversary cannot adapt claims to the batching challenge.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import CommitmentParameters, FriParameters
from .domains import TwoAdicCoset
from .errors import VerificationError, ensure
from .fields import npref
from .fields.host import HostExtField, HostField
from .merkle import BatchOpening, MerkleMmcs, MerkleProverData
from .ntt import get_engine
from .ntt.ntt import _has_tracer, np_powers
from .utils import (
    batch_inv, bit_reverse_indices, cached_jit, ext_pack, ext_scalar,
    ext_unpack, field_sum, reverse_bits,
)

ExtVal = Tuple[int, ...]  # host extension element


def _compile_split_log() -> int:
    """Sizes >= 2^this switch fused prover programs (fold+tree rounds,
    quotient sweep+iDFT) to split per-step programs: the axon remote-compile
    helper is OOM-killed (SIGKILL) on fused programs over 2^20+-element
    tensors.  Shares the NTT's knob so one env var moves every threshold."""
    from .ntt import NttEngine

    return NttEngine._split_log()


@dataclass
class PcsProverData:
    mmcs_data: MerkleProverData
    log_trace_heights: List[int]  # degree-bound exponent per matrix
    log_blowup: int

    @property
    def log_max_lde(self) -> int:
        return max(self.log_trace_heights) + self.log_blowup


@dataclass
class QueryProof:
    input_openings: List[BatchOpening]  # one per round
    commit_openings: List[Tuple[np.ndarray, np.ndarray]]  # (pair row u64 (2D,·), path)


@dataclass
class FriProof:
    commit_caps: List[np.ndarray]
    commit_pow_witnesses: List[int]
    final_poly: List[ExtVal]
    query_pow_witness: int
    query_proofs: List[QueryProof]


# round description for verify():
#   (cap, [(log_trace_n, width, [(z, [values per column])])])
VerifyRound = Tuple[np.ndarray, List[Tuple[int, int, List[Tuple[ExtVal, List[ExtVal]]]]]]


class TwoAdicFriPcs:
    def __init__(
        self,
        F,  # device FieldOps
        E,  # device ExtOps over F
        host_field: HostField,
        host_ext: HostExtField,
        hasher,
        commitment_parameters: CommitmentParameters,
        fri_parameters: FriParameters,
        transcript_profile=None,
    ):
        from .config import DEFAULT_TRANSCRIPT_PROFILE

        assert 1 <= fri_parameters.max_log_arity <= 4
        self.F = F
        self.E = E
        self.hf = host_field
        self.he = host_ext
        self.mmcs = MerkleMmcs(hasher, commitment_parameters.cap_height)
        self.params = commitment_parameters
        self.fri = fri_parameters
        self.profile = transcript_profile or DEFAULT_TRANSCRIPT_PROFILE
        self.engine = get_engine(F)
        self._x_storage: Dict[Tuple[int, int, bool], object] = {}

    # -- domains ----------------------------------------------------------
    @property
    def log_blowup(self) -> int:
        return self.params.log_blowup

    def natural_domain_for_degree(self, degree: int) -> TwoAdicCoset:
        assert degree & (degree - 1) == 0
        return TwoAdicCoset(self.hf, degree.bit_length() - 1, 1)

    # -- x tables ---------------------------------------------------------
    def x_table_storage(self, log_n: int, shift: int, inverse: bool = False):
        """Device base array of coset points shift·G^rev(i) in storage
        (bit-reversed) order; optionally their inverses."""
        key = (log_n, shift % self.hf.p, inverse)
        if key not in self._x_storage:
            if inverse:
                g = self.hf.inv(self.hf.two_adic_generator(log_n))
                s = self.hf.inv(shift)
            else:
                g = self.hf.two_adic_generator(log_n)
                s = shift
            mul = npref.gl_mul if self.hf.name == "Goldilocks" else npref.bb_mul
            tab = mul(np_powers(self.hf, g, 1 << log_n), np.uint64(s))
            tab = tab[bit_reverse_indices(log_n)]
            with jax.ensure_compile_time_eval():
                val = self.F.from_np(tab)
            if _has_tracer(val):
                return val  # inside a shard_map trace: never cache a tracer
            self._x_storage[key] = val
        return self._x_storage[key]

    def x_table_natural(self, log_n: int, shift: int):
        """Coset points shift·g^i in natural order (device constant)."""
        key = (log_n, shift % self.hf.p, "nat")
        if key not in self._x_storage:
            mul = npref.gl_mul if self.hf.name == "Goldilocks" else npref.bb_mul
            g = self.hf.two_adic_generator(log_n)
            tab = mul(np_powers(self.hf, g, 1 << log_n), np.uint64(shift))
            with jax.ensure_compile_time_eval():
                val = self.F.from_np(tab)
            if _has_tracer(val):
                return val  # inside a shard_map trace: never cache a tracer
            self._x_storage[key] = val
        return self._x_storage[key]

    def host_x_at(self, log_n: int, shift: int, storage_index: int) -> int:
        g = self.hf.two_adic_generator(log_n)
        return self.hf.mul(shift, self.hf.pow(g, reverse_bits(storage_index, log_n)))

    # -- commit -----------------------------------------------------------
    @staticmethod
    def _stage_fuse_log() -> int:
        """Stage commits whose tallest LDE is below 2^this run as ONE fused
        program (all LDEs + the whole Merkle tree).  Eager glue between the
        jitted pieces costs ~5 ms per op through the axon tunnel (round-4
        probes: fully-jitted LDE 12 ms vs 243 ms with eager glue at 2^14);
        above the threshold the pieces stay separate (see
        ntt.NttEngine._split_log) but the glue is still jitted.  The round-4
        2^20 default guarded the remote compile helper against OOM on
        multi-MB MLIR constants; with utils.hoisted_jit those are runtime
        arguments, so the default rises to 2^23 (2^20-row traces at B=4
        commit fused); without hoisting the old guard returns."""
        import os

        from .utils import _hoist_enabled

        default = "23" if _hoist_enabled() else "20"
        return int(os.environ.get("MULTISTARK_STAGE_FUSE_LOG", default))

    def _fused_stage_commit(self, mats, specs, from_coeffs: bool):
        """One cached program: every matrix's LDE + the mixed-height tree.
        specs: [(log_n, shift)] per matrix (shift pre-inverted for commit)."""
        from .merkle import MerkleProverData, digest_planes_to_np
        from .utils import cached_jit

        b = self.log_blowup
        dims = [
            (jax.tree.leaves(m)[0].shape[0], 1 << (ln + b))
            for m, (ln, _) in zip(mats, specs)
        ]
        log_max = max(ln for ln, _ in specs) + b
        key = (
            "pcs_commit_fused", self.F.name,
            type(self.mmcs.hasher).__name__, tuple(specs), tuple(dims),
            b, self.mmcs.cap_height, from_coeffs,
        )

        def make(_specs=tuple(specs), _dims=tuple(dims)):
            def body(ms):
                ldes = []
                for m, (ln, shift) in zip(ms, _specs):
                    if from_coeffs:
                        shifted = self.F.mul(m, self.engine.pow_table(shift, 1 << ln))
                        ldes.append(self.engine.lde_bitrev_from_coeffs(shifted, ln + b))
                    else:
                        ldes.append(self.engine.coset_lde_bitrev(m, ln, b, shift))
                layers = self.mmcs._commit_impl(ldes, list(_dims))
                return ldes, layers

            return body

        ldes, layers = cached_jit(key, make)(list(mats))
        mdata = MerkleProverData(mats=list(ldes), dims=dims, layers=layers, log_max=log_max)
        return layers[-1], mdata  # device cap layer; callers fetch if needed

    def _commit_common(self, mats, specs, from_coeffs: bool):
        """Shared commit tail: sharded / fused / piecewise dispatch."""
        from . import parallel
        from .utils import jit_enabled

        pm = parallel.current_mesh()
        b = self.log_blowup
        logs = [ln for ln, _ in specs]
        heights = [1 << (ln + b) for ln, _ in specs]
        if (
            pm is None
            and jit_enabled()
            and max(heights) < (1 << self._stage_fuse_log())
            and min(heights) >= (1 << self.mmcs.cap_height)
        ):
            cap_layer, mdata = self._fused_stage_commit(mats, specs, from_coeffs)
            from .merkle import digest_planes_to_np

            return digest_planes_to_np(cap_layer), PcsProverData(mdata, logs, b)
        ldes = []
        for m, (ln, shift) in zip(mats, specs):
            big = ln + b
            if pm is not None and (1 << big) >= pm.n * pm.n:
                if from_coeffs:
                    shifted = self.F.mul(m, self.engine.pow_table(shift, 1 << ln))
                    ldes.append(
                        parallel.sharded_lde_bitrev_from_coeffs(self.engine, pm, shifted, big)
                    )
                else:
                    ldes.append(
                        parallel.sharded_coset_lde_bitrev(self.engine, pm, m, ln, b, shift)
                    )
            elif from_coeffs:
                shifted = self.F.mul(m, self.engine.pow_table(shift, 1 << ln))
                ldes.append(self.engine.lde_bitrev_from_coeffs(shifted, big))
            else:
                ldes.append(self.engine.coset_lde_bitrev(m, ln, b, shift))
        cap, mdata = self._mmcs_commit(pm, ldes)
        return cap, PcsProverData(mdata, logs, b)

    def commit(self, domains_and_mats) -> Tuple[np.ndarray, PcsProverData]:
        """domains_and_mats: [(TwoAdicCoset, natural-order evals (w, n))].
        LDEs land on GENERATOR·H_{n·B}, bit-reversed (reference
        src/prover.rs:336-350 commit path).

        Under an active prover mesh (parallel.use_mesh) every matrix tall
        enough runs the four-step sharded LDE and its Merkle subtree stays
        device-local; results are bit-identical to the unsharded path."""
        mats, specs = [], []
        for dom, mat in domains_and_mats:
            shift = self.hf.mul(self.hf.generator, self.hf.inv(dom.shift))
            mats.append(mat)
            specs.append((dom.log_n, shift))
        return self._commit_common(mats, specs, from_coeffs=False)

    def commit_from_coeffs(self, coeff_mats) -> Tuple[np.ndarray, PcsProverData]:
        """coeff_mats: [(w, n) natural coefficient matrices].  Commits their
        evals on GENERATOR·H_{n·B} directly from coefficients — the fused
        quotient commit path (reference src/prover.rs:681-717 commit_ldes)."""
        mats, specs = [], []
        for coeffs in coeff_mats:
            n = jax.tree.leaves(coeffs)[0].shape[-1]
            mats.append(coeffs)
            specs.append((n.bit_length() - 1, self.hf.generator))
        return self._commit_common(mats, specs, from_coeffs=True)

    # -- device-cap commits (whole-prove device transcript) ----------------
    def _commit_device(self, mats, specs, from_coeffs: bool):
        """Fused commit returning the DEVICE cap layer (8, k) — no host
        sync; None when the fused single-device path does not apply (the
        DT prover then falls back to the host transcript)."""
        from . import parallel
        from .utils import jit_enabled

        b = self.log_blowup
        logs = [ln for ln, _ in specs]
        heights = [1 << (ln + b) for ln, _ in specs]
        if not (
            parallel.current_mesh() is None
            and jit_enabled()
            and max(heights) < (1 << self._stage_fuse_log())
            and min(heights) >= (1 << self.mmcs.cap_height)
        ):
            return None
        cap_layer, mdata = self._fused_stage_commit(mats, specs, from_coeffs)
        return cap_layer, PcsProverData(mdata, logs, b)

    def commit_device(self, domains_and_mats):
        mats, specs = [], []
        for dom, mat in domains_and_mats:
            shift = self.hf.mul(self.hf.generator, self.hf.inv(dom.shift))
            mats.append(mat)
            specs.append((dom.log_n, shift))
        return self._commit_device(mats, specs, from_coeffs=False)

    def commit_from_coeffs_device(self, coeff_mats):
        mats, specs = [], []
        for coeffs in coeff_mats:
            n = jax.tree.leaves(coeffs)[0].shape[-1]
            mats.append(coeffs)
            specs.append((n.bit_length() - 1, self.hf.generator))
        return self._commit_device(mats, specs, from_coeffs=True)

    def _mmcs_commit(self, pm, ldes):
        if pm is not None:
            from . import parallel

            return parallel.sharded_mmcs_commit(self.mmcs, pm, ldes)
        return self.mmcs.commit(ldes)

    def get_evaluations_on_domain(self, data: PcsProverData, idx: int, domain: TwoAdicCoset):
        """Natural-order evals of matrix `idx` on `domain` (must be the
        GENERATOR-shifted sub-coset of the LDE): a stored prefix un-reversed
        (reference src/prover.rs:606-679)."""
        assert domain.shift == self.hf.generator
        assert domain.log_n <= data.log_trace_heights[idx] + self.log_blowup
        return self.engine.prefix_to_natural(data.mmcs_data.mats[idx], domain.log_n)

    # -- open -------------------------------------------------------------
    def open(self, rounds, challenger):
        """rounds: [(PcsProverData, points_per_matrix: [[ExtVal]])].
        Returns (opened_values[r][m][p] = [ExtVal per column], FriProof)."""
        from .profiling import span

        E, F, he, hf = self.E, self.F, self.he, self.hf

        # -- Step A: claimed evaluations via small-domain barycentric
        # One jitted kernel per (matrix shape, #points); z enters as a device
        # scalar.  Values come to host for transcript observation.
        dev_vals: List[List[object]] = []  # device (w, ?) coord arrays per matrix
        with span("stark/fri_open/eval"):
            opened = self._claimed_evaluations(rounds, dev_vals)
            if self.profile.fri_observe_claims_before_alpha:
                for round_vals in opened:
                    for mat_vals in round_vals:
                        for pt_vals in mat_vals:
                            for v in pt_vals:
                                challenger.observe_ext(v)
        alpha = challenger.sample_ext()

        # -- Step C: reduced openings per LDE height (device, bitrev order)
        with span("stark/fri_open/ro"):
            ro = self._reduced_openings(rounds, dev_vals, alpha)

        with span("stark/fri_open/fold"):
            (
                caps, commit_datas, commit_pows, final_poly, query_pow,
                indices, schedule, log_max, log_max_ro,
            ) = self._commit_phase(rounds, ro, challenger)
        arities = schedule

        # -- Step E: query proofs — all trees' gathers dispatch async, then
        # ONE device_get fetches everything
        with span("stark/fri_open/queries"):
            query_proofs = self._query_phase(
                rounds, commit_datas, indices, arities, log_max, log_max_ro
            )

        proof = FriProof(
            commit_caps=caps,
            commit_pow_witnesses=commit_pows,
            final_poly=final_poly,
            query_pow_witness=query_pow,
            query_proofs=query_proofs,
        )
        return opened, proof

    # -- eager (CPU) NumPy mirrors of the open-path kernels -----------------
    # Same math, same values (exact mod-p arithmetic), ~100x less per-op
    # dispatch than eager jnp; the jitted kernels remain the TPU path and
    # the Fiat-Shamir e2e tests pin both to identical proof bytes.
    def _np_field_pair(self):
        nf = npref.NpField(self.hf)
        return nf, npref.NpExt(nf, self.he)

    def _np_eager(self) -> bool:
        from . import parallel
        from .utils import jit_enabled, np_mirrors_enabled

        if parallel.current_mesh() is not None:
            return False  # sharded prove: gathering to host would defeat it
        return (
            not jit_enabled()
            and np_mirrors_enabled()
            and self.hf.name in ("Goldilocks", "BabyBear")
        )

    def _claimed_evaluations_np(self, rounds, dev_vals):
        """NumPy mirror of _eval_kernel over every (matrix, point):
        p(z) = (z^n - s^n)/(n·s^n) · Σ_i e_i·x_i/(z - x_i) on the stored
        same-shift sub-coset prefix.  Fills dev_vals with (w, D) uint64
        value arrays (consumed by _reduced_openings_np)."""
        opened: List[List[List[List[ExtVal]]]] = []
        for data, points_list in rounds:
            round_dev: List[object] = []
            round_vals: List[List[List[ExtVal]]] = []
            for m_idx, points in enumerate(points_list):
                if not points:
                    round_dev.append(None)
                    round_vals.append([])
                    continue
                log_n = data.log_trace_heights[m_idx]
                m_np = self.F.to_np(data.mmcs_data.mats[m_idx])  # (w, N) bitrev LDE
                mat_dev, mat_vals = [], []
                for vals in self._np_eval_mat(m_np, log_n, points):
                    mat_dev.append(vals)
                    mat_vals.append([tuple(int(c_) for c_ in row) for row in vals])
                round_dev.append(mat_dev)
                round_vals.append(mat_vals)
            dev_vals.append(round_dev)
            opened.append(round_vals)
        return opened

    def _np_eval_mat(self, m_np, log_n: int, points):
        """Exact NumPy barycentric evaluation of one stored bitrev LDE at
        `points`: yields a (w, D) uint64 value array per point (the math of
        _eval_kernel; shared by the eager mirror and the mesh small-domain
        path)."""
        hf, he = self.hf, self.he
        nf, ne = self._np_field_pair()
        mulfn = npref.gl_mul if hf.name == "Goldilocks" else npref.bb_mul
        n = 1 << log_n
        small = m_np[:, :n][:, bit_reverse_indices(log_n)]  # natural, GEN·H_n
        s = hf.generator
        g = hf.two_adic_generator(log_n)
        x = mulfn(np_powers(hf, g, n), np.uint64(s))  # (n,)
        s_n = hf.pow(s, n)
        inv_ns = hf.inv(hf.mul(n % hf.p, s_n))
        for z in points:
            diff = ne.sub(ne.of_scalar(z, (n,)), ne.from_base_vec(x))
            w_i = ne.scale(ne.batch_inv(diff), x)  # x_i/(z - x_i), (n, D)
            zn = z
            for _ in range(log_n):
                zn = he.mul(zn, zn)
            c = he.mul(he.sub(zn, he.from_base(s_n)), he.from_base(inv_ns))
            # Σ_i e_i·w_i as w·D vectorized (n,) passes (no (w,n,D)
            # broadcast temp)
            D = w_i.shape[1]
            acc = np.empty((small.shape[0], D), np.uint64)
            for d in range(D):
                acc[:, d] = nf.sum_axis(nf.mul(small, w_i[None, :, d]), 1)
            yield ne.mul(acc, ne.of_scalar(c))  # (w, D)

    def _reduced_openings_np(self, rounds, dev_vals, alpha):
        """NumPy mirror of _ro_kernel: per-height accumulation of
        Σ_p (-α^{off_p})·(u - S_p)/(z_p - x) over the stored LDEs; converts
        each height's total to the device ext rep at the end (the commit
        phase consumes device values)."""
        hf, he, E = self.hf, self.he, self.E
        nf, ne = self._np_field_pair()
        mulfn = npref.gl_mul if hf.name == "Goldilocks" else npref.bb_mul
        ro_np: Dict[int, np.ndarray] = {}
        offsets: Dict[int, int] = {}
        for r_idx, (data, points_list) in enumerate(rounds):
            for m_idx, points in enumerate(points_list):
                if not points:
                    continue
                w = data.mmcs_data.dims[m_idx][0]
                log_lde = data.log_trace_heights[m_idx] + self.log_blowup
                N = 1 << log_lde
                m_np = self.F.to_np(data.mmcs_data.mats[m_idx])  # (w, N)
                ap = np.asarray(
                    [list(a) for a in self._host_ext_powers(alpha, w)], np.uint64
                )  # (w, D)
                # u = Σ_j α^j·col_j as w·D vectorized (N,) passes — a
                # (w, N, D) broadcast would cost seconds at 2^14+ widths
                u = np.zeros((N, ap.shape[1]), np.uint64)
                for j in range(w):
                    for d in range(ap.shape[1]):
                        u[:, d] = nf.add(u[:, d], nf.mul(m_np[j], ap[j, d]))
                g = hf.two_adic_generator(log_lde)
                x_full = mulfn(np_powers(hf, g, N), np.uint64(hf.generator))[
                    bit_reverse_indices(log_lde)
                ]
                off = offsets.get(log_lde, 0)
                for p_idx, z in enumerate(points):
                    s_p = nf.sum_axis(ne.mul(ap, dev_vals[r_idx][m_idx][p_idx]), 0)
                    diff = ne.sub(ne.of_scalar(z, (N,)), ne.from_base_vec(x_full))
                    inv_diff = ne.batch_inv(diff)
                    aoff = he.neg(self._ext_pow(alpha, off + p_idx * w))
                    num = ne.sub(u, s_p[None, :])
                    contrib = ne.mul(ne.mul(num, inv_diff), ne.of_scalar(aoff))
                    ro_np[log_lde] = (
                        contrib if log_lde not in ro_np else ne.add(ro_np[log_lde], contrib)
                    )
                off += w * len(points)
                offsets[log_lde] = off
        return {k: E.from_np(v) for k, v in ro_np.items()}

    def _claimed_evaluations(self, rounds, dev_vals):
        """Step A: claimed evaluations via small-domain barycentric.  One
        jitted kernel per (matrix shape, #points); z enters as a device
        scalar.  Fills `dev_vals` (device arrays, reused by the ro step) and
        returns the host-side opened values."""
        if self._np_eager():
            return self._claimed_evaluations_np(rounds, dev_vals)
        from . import parallel
        from .utils import jit_enabled

        pm = parallel.current_mesh()
        E = self.E
        merged: List[tuple] = []
        for data, points_list in rounds:
            round_dev: List[object] = []
            for m_idx, points in enumerate(points_list):
                if not points:
                    round_dev.append(None)
                    continue
                mat = data.mmcs_data.mats[m_idx]
                log_n = data.log_trace_heights[m_idx]
                w = data.mmcs_data.dims[m_idx][0]
                from .utils import np_mirrors_enabled

                if pm is not None and not jit_enabled() and np_mirrors_enabled():
                    # eager CPU-mesh: the claimed evaluations are SMALL-
                    # domain work (n-sized, 2^-blowup of the LDE) — gather
                    # the stored prefix and run the exact np math instead of
                    # dispatching hundreds of eager sharded ops (values are
                    # identical; the LDE-sized ro/fold stages stay sharded)
                    from .utils import to_np_global

                    pre = jax.tree.map(lambda a: a[:, : 1 << log_n], mat)
                    m_np = to_np_global(self.F, pre)
                    round_dev.append(tuple(
                        tuple(
                            self.F.from_np(np.ascontiguousarray(vals[:, d]))
                            for d in range(E.D)
                        )
                        for vals in self._np_eval_mat(m_np, log_n, points)
                    ))
                    continue
                merged.append((len(dev_vals), len(round_dev), mat, points, w, log_n))
                round_dev.append(None)  # filled by the merged kernel below
            dev_vals.append(round_dev)
        if merged:
            # ONE program for every matrix's claimed evaluations (per-matrix
            # kernels cost ~5-20 ms of dispatch each through the tunnel)
            sig = tuple((w, ln, len(pts)) for _, _, _, pts, w, ln in merged)
            kern = self._eval_all_kern(sig)
            outs = kern(
                tuple(m for _, _, m, _, _, _ in merged),
                tuple(ext_pack(E, pts) for _, _, _, pts, _, _ in merged),
            )
            for (ri, mi, *_), out in zip(merged, outs):
                dev_vals[ri][mi] = out  # P-tuple of ext (w,) values
        # one sync for every matrix's claimed values
        host_vals = jax.device_get(dev_vals)
        opened: List[List[List[List[ExtVal]]]] = []
        for (data, points_list), round_host in zip(rounds, host_vals):
            round_vals: List[List[List[ExtVal]]] = []
            for m_idx, points in enumerate(points_list):
                if not points:
                    round_vals.append([])
                    continue
                mat_vals = []
                for p_idx in range(len(points)):
                    coords = round_host[m_idx][p_idx]  # D base elems of (w,)
                    arr = np.stack(
                        [self._host_coord_to_u64(c) for c in coords], axis=-1
                    )  # (w, D)
                    mat_vals.append([tuple(int(c) for c in row) for row in arr])
                round_vals.append(mat_vals)
            opened.append(round_vals)
        return opened

    def _eval_all_kern(self, sig):
        """Cached merged claimed-evaluations program for a static signature
        [(w, log_n, n_points)]; shared by the host-transcript open and the
        whole-prove device transcript (same key → same compiled program)."""
        E = self.E
        return cached_jit(
            ("pcs_eval_all", self.F.name, sig),
            lambda _sig=sig: lambda ms, zps: [
                self._eval_kernel(
                    m_, tuple(ext_unpack(E, zp, i) for i in range(k)), ln
                )
                for (m_, zp), (w_, ln, k) in zip(zip(ms, zps), _sig)
            ],
        )

    def _ro_all_kern(self, sig, out_heights):
        """Cached merged reduced-openings program for a static signature
        [(w, n_points, log_lde)] and descending output heights; shared with
        the device-transcript open."""
        E = self.E

        def mk(_sig=sig, _hs=tuple(out_heights)):
            def f(ms, vds, apds, zps):
                acc = {}
                for (m_, vd, apd, zp), (w_, k, ll) in zip(
                    zip(ms, vds, apds, zps), _sig
                ):
                    contrib = self._ro_kernel(
                        m_, vd,
                        tuple(ext_unpack(E, zp, i) for i in range(k)),
                        tuple(tuple(pl[:, d] for pl in apd) for d in range(E.D)),
                        tuple(ext_unpack(E, zp, k + i) for i in range(k)),
                        ll,
                    )
                    acc[ll] = contrib if ll not in acc else E.add(acc[ll], contrib)
                return tuple(acc[h] for h in _hs)

            return f

        return cached_jit(("pcs_ro_all", self.F.name, sig), mk)

    def _reduced_openings(self, rounds, dev_vals, alpha):
        """Step C: reduced openings per LDE height (device, bitrev order).
        One jitted kernel per matrix: ro contribution for all its points.
        Under an active prover mesh every tall matrix's contribution runs as
        a shard_map over the block-sharded LDE rows — block-local batch
        inverses and elementwise folds, zero collectives (see _ro_sharded)."""
        from . import parallel

        if self._np_eager():
            return self._reduced_openings_np(rounds, dev_vals, alpha)
        pm = parallel.current_mesh()
        E, he = self.E, self.he
        ro: Dict[int, object] = {}
        offsets: Dict[int, int] = {}
        merged: List[tuple] = []  # (mat, vals, ap(w,D) np, neg_offs, points, log_lde)
        for r_idx, (data, points_list) in enumerate(rounds):
            for m_idx, points in enumerate(points_list):
                if not points:
                    continue
                mat = data.mmcs_data.mats[m_idx]
                w = data.mmcs_data.dims[m_idx][0]
                log_lde = data.log_trace_heights[m_idx] + self.log_blowup
                alpha_pows = self._host_ext_powers(alpha, w)
                off = offsets.get(log_lde, 0)
                ap = np.asarray([list(a) for a in alpha_pows], dtype=np.uint64)  # (w, D)
                neg_offs = [
                    he.neg(self._ext_pow(alpha, off + k * w)) for k in range(len(points))
                ]
                if pm is not None and (1 << log_lde) >= pm.n:
                    alpha_vec = tuple(self.F.from_np(ap[:, d]) for d in range(E.D))
                    zs = tuple(ext_scalar(E, z) for z in points)
                    aoffs = tuple(ext_scalar(E, v) for v in neg_offs)
                    contrib = self._ro_sharded(
                        pm, mat, dev_vals[r_idx][m_idx], zs, alpha_vec, aoffs, log_lde
                    )
                    ro[log_lde] = (
                        contrib if log_lde not in ro else E.add(ro[log_lde], contrib)
                    )
                else:
                    merged.append(
                        (mat, dev_vals[r_idx][m_idx], ap, neg_offs, points, log_lde)
                    )
                off += w * len(points)
                offsets[log_lde] = off
        if merged:
            # ONE program for every matrix's reduced-opening contribution,
            # per-height sums included (per-matrix kernels + eager per-height
            # E.add cost ~5-20 ms of dispatch each through the tunnel).
            # Per matrix it takes TWO device inputs (α-power matrix + packed
            # z/offset scalars) instead of ~8 scalar uploads.
            sig = tuple(
                (e[2].shape[0], len(e[4]), e[5]) for e in merged
            )  # (w, k, log_lde)
            out_heights = sorted({e[5] for e in merged}, reverse=True)
            kern = self._ro_all_kern(sig, out_heights)
            outs = kern(
                tuple(e[0] for e in merged),
                tuple(e[1] for e in merged),
                tuple(self.F.from_np(e[2]) for e in merged),
                tuple(ext_pack(E, list(e[4]) + e[3]) for e in merged),
            )
            for h, contrib in zip(out_heights, outs):
                ro[h] = contrib if h not in ro else E.add(ro[h], contrib)
        return ro

    def _ro_sharded(self, pm, mat, vals_dev, zs, alpha_vec, aoffs, log_lde: int):
        """Row-sharded _ro_kernel: the LDE rows are block-sharded (bitrev
        storage, as the sharded commit leaves them) and every step — the
        α-weighted column fold, the (z - x) batch inverse (inverses are
        elementwise-unique, so block-locality cannot change a value), and
        the point accumulation — is device-local.  No collectives at all;
        the output reduced opening stays block-sharded for the fold chain,
        whose pair partners are ADJACENT in bitrev storage and hence also
        local (SURVEY.md §7.3: no cross-device exchange until the tail)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from . import parallel
        from .utils import jit_enabled

        E, F, hf = self.E, self.F, self.hf
        x_full = self.x_table_storage(log_lde, hf.generator)
        axis = pm.axis
        npoints = len(zs)

        if not jit_enabled():
            # eager CPU-mesh policy: per-op dispatch on the block-sharded LDE
            # (one fused XLA:CPU body compiles pathologically; CLAUDE.md).
            # x stays replicated so the batch inverse doesn't scan across
            # shards; every mul against the sharded u keeps the row sharding.
            row_s = NamedSharding(pm.mesh, P(None, axis))
            mat = jax.tree.map(lambda p: jax.device_put(p, row_s), mat)
            return self._ro_kernel(mat, vals_dev, zs, alpha_vec, aoffs, log_lde)

        def body(mat_, x_, vals_, zs_, av_, ao_):
            coords = []
            for d in range(E.D):
                prod = F.mul(mat_, jax.tree.map(lambda a: a[:, None], av_[d]))
                coords.append(field_sum(F, prod, axis=0))
            u = tuple(coords)
            total = None
            for p in range(npoints):
                s_p = field_sum(E, E.mul(av_, vals_[p]), axis=0)
                diff = self._ext_scalar_sub_base(zs_[p], x_)
                inv_diff = batch_inv(E, diff, axis=0)
                num = E.sub(u, s_p)
                contrib = E.mul(E.mul(num, inv_diff), ao_[p])
                total = contrib if total is None else E.add(total, contrib)
            return total

        w = jax.tree.leaves(mat)[0].shape[0]
        mesh_key = (tuple(d.id for d in pm.mesh.devices.flat), axis)
        kern = parallel._cached_shard(
            ("pcs_ro_sharded", self.F.name, mesh_key, w, log_lde, npoints),
            lambda: jax.jit(jax.shard_map(
                body, mesh=pm.mesh,
                in_specs=(
                    jax.tree.map(lambda _: P(None, axis), mat),
                    jax.tree.map(lambda _: P(axis), x_full),
                    jax.tree.map(lambda _: P(), vals_dev),
                    jax.tree.map(lambda _: P(), zs),
                    jax.tree.map(lambda _: P(), alpha_vec),
                    jax.tree.map(lambda _: P(), aoffs),
                ),
                out_specs=jax.tree.map(
                    lambda _: P(axis), tuple(tuple(range(F.num_planes)) for _ in range(E.D))
                ),
                check_vma=False,
            )),
        )
        return kern(mat, x_full, vals_dev, zs, alpha_vec, aoffs)

    def _commit_phase(self, rounds, ro, challenger):
        """Step D: FRI commit phase — fold with per-round β, committing each
        level; transcript-serial by construction (β_r depends on cap_r).

        Two execution paths producing bit-identical transcripts:
          - device: β and the PoW witness are computed ON DEVICE from the
            blake3 duplex (device_transcript.py), so all rounds dispatch
            asynchronously and the host syncs once, then REPLAYS the byte
            transcript (authoritative) — any divergence falls back;
          - host: the original per-round loop (one blocking device_get per
            round), used for non-Goldilocks/Blake3 configs and as fallback.
        """
        log_max = max(data.log_max_lde for data, _ in rounds)  # query index range
        log_max_ro = max(ro.keys())  # fold start (tallest matrix WITH openings)
        log_final = self.log_blowup + self.fri.log_final_poly_len
        # deterministic arity schedule (mirrored by the verifier): arity per
        # round capped so we never fold below the final size and never skip
        # an input height that must be absorbed
        schedule: List[int] = []
        ls = log_max_ro
        while ls > log_final:
            a_bits = min(self.fri.max_log_arity, ls - log_final)
            for h in ro:
                if ls - a_bits < h < ls:
                    a_bits = ls - h
            schedule.append(a_bits)
            ls -= a_bits
        # degenerate: every opened matrix already at final-poly size — no
        # folds, no commit-phase trees; the final poly IS the reduced opening
        if not schedule:
            final_poly, query_pow, indices = self._commit_tail(
                ro[log_max_ro], log_max_ro, log_max_ro, log_max, challenger
            )
            return [], [], [], final_poly, query_pow, indices, [], log_max, log_max_ro

        result = None
        if log_max_ro >= _compile_split_log():
            # huge folds: the device-transcript round kernels fuse the whole
            # next-level tree — too big for the remote compile helper at
            # 2^20+ (it gets OOM-killed); take the host path, whose rounds
            # split into fold + per-level tree programs at this size
            pass
        elif self._device_transcript_eligible(challenger):
            result = self._commit_phase_device(
                ro, schedule, log_max_ro, challenger
            )
        if result is None:
            result = self._commit_phase_host(ro, schedule, log_max_ro, challenger)
        caps, commit_datas, commit_pows, current, log_size = result
        final_poly, query_pow, indices = self._commit_tail(
            current, log_size, log_max_ro, log_max, challenger
        )
        return (
            caps, commit_datas, commit_pows, final_poly, query_pow,
            indices, schedule, log_max, log_max_ro,
        )

    def _commit_tail(self, current, log_size, log_max_ro, log_max, challenger):
        """Shared transcript tail: observe the final poly, grind the query
        PoW, sample the query indices."""
        final_poly = self._final_poly_host(current, log_size, log_max_ro)
        for c in final_poly:
            challenger.observe_ext(c)
        query_pow = challenger.grind(self.fri.query_proof_of_work_bits)
        indices = [challenger.sample_bits(log_max) for _ in range(self.fri.num_queries)]
        return final_poly, query_pow, indices

    def _commit_phase_host(self, ro, schedule, log_max_ro, challenger):
        """Per-round host-transcript loop (one blocking device_get per
        round): the generic path for any challenger/hasher pair."""
        from . import parallel
        from .utils import jit_enabled, np_mirrors_enabled

        E = self.E
        current = ro[log_max_ro]
        caps: List[np.ndarray] = []
        commit_datas: List[MerkleProverData] = []
        commit_pows: List[int] = []
        log_size = log_max_ro

        def commit_level(vec, a_bits, log_sz):
            """Commit the arity-slice matrix of `vec` (one kernel)."""
            if not jit_enabled() and np_mirrors_enabled() and parallel.current_mesh() is not None:
                # eager CPU-mesh: the per-round tree is sub-LDE-sized —
                # gather the fold vector and hash through mmcs.commit's
                # native np path instead of thousands of eager sharded
                # hash ops (bit-identical; the FOLDS themselves stay
                # sharded — partners are adjacent in bitrev storage).
                # to_np_global keeps this working across PROCESSES.
                from .utils import to_np_global

                vec = E.from_np(to_np_global(E, vec))
            A = 1 << a_bits
            slices = [jax.tree.map(lambda t, j=j: t[j::A], vec) for j in range(A)]
            mat = self._ext_slices_matrix(slices)
            return self.mmcs.commit([mat])

        # round 0: commit only (nothing to fold yet)
        cap, mdata = commit_level(current, schedule[0], log_size)
        caps.append(cap)
        commit_datas.append(mdata)

        for r, a_bits in enumerate(schedule):
            challenger.observe_commitment(caps[r])
            commit_pows.append(challenger.grind(self.fri.commit_proof_of_work_bits))
            beta = challenger.sample_ext()
            shift_cur = self._shift_at(log_max_ro, log_size)
            next_log = log_size - a_bits
            absorb = ro.get(next_log) if next_log in ro else None
            if r + 1 < len(schedule) and not jit_enabled() and np_mirrors_enabled():
                # eager (CPU): fold via the np mirror, commit via mmcs.commit
                # (its np fast path) — the fused kernel only pays off jitted
                current = self._fold_absorb(
                    current, ext_scalar(E, beta), absorb, log_size, a_bits, shift_cur
                )
                cap, mdata = commit_level(current, schedule[r + 1], next_log)
                caps.append(cap)
                commit_datas.append(mdata)
            elif r + 1 < len(schedule) and log_size >= _compile_split_log():
                # huge rounds: separate fold kernel + split-tree commit (the
                # remote compile helper is OOM-killed on the fused
                # fold+whole-tree program at 2^20+; see ntt._split_log)
                kern = cached_jit(
                    ("fri_fold", self.E.name, log_size, a_bits, shift_cur % self.hf.p,
                     absorb is not None),
                    lambda _ls=log_size, _ab=a_bits, _sc=shift_cur: (
                        lambda cur, bd, ab_: self._fold_absorb(cur, bd, ab_, _ls, _ab, _sc)
                    ),
                )
                current = kern(current, ext_scalar(E, beta), absorb)
                cap, mdata = commit_level(current, schedule[r + 1], next_log)
                caps.append(cap)
                commit_datas.append(mdata)
            elif r + 1 < len(schedule):
                # fused: fold with β, absorb any input height, slice + build
                # the next round's whole Merkle tree — ONE kernel per round
                next_a = schedule[r + 1]
                A2 = 1 << next_a
                width2 = A2 * E.D
                h2 = 1 << (next_log - next_a)
                kern = cached_jit(
                    (
                        "fri_fold_commit", self.E.name, log_size, a_bits, next_a,
                        shift_cur % self.hf.p, absorb is not None,
                        type(self.mmcs.hasher).__name__,
                    ),
                    lambda _ls=log_size, _ab=a_bits, _na=next_a, _sc=shift_cur: (
                        lambda cur, bd, ab_: self._fold_commit_kernel(
                            cur, bd, ab_, _ls, _ab, _na, _sc
                        )
                    ),
                )
                current, commit_mat, layers = kern(
                    current, ext_scalar(E, beta), absorb
                )
                from .merkle import digest_planes_to_np

                caps.append(digest_planes_to_np(layers[-1]))
                commit_datas.append(
                    MerkleProverData(
                        mats=[commit_mat],
                        dims=[(width2, h2)],
                        layers=layers,
                        log_max=next_log - next_a,
                    )
                )
            else:
                kern = cached_jit(
                    ("fri_fold", self.E.name, log_size, a_bits, shift_cur % self.hf.p,
                     absorb is not None),
                    lambda _ls=log_size, _ab=a_bits, _sc=shift_cur: (
                        lambda cur, bd, ab_: self._fold_absorb(cur, bd, ab_, _ls, _ab, _sc)
                    ),
                )
                current = kern(current, ext_scalar(E, beta), absorb)
            log_size = next_log
        return caps, commit_datas, commit_pows, current, log_size

    # -- device-transcript commit phase ------------------------------------
    def _device_transcript_eligible(self, challenger) -> bool:
        """Device transcript is implemented for the production config only:
        SerializingChallenger64 over Blake3FieldHasher on Goldilocks, ext
        degree ≤ 3 (β's coords must fit one digest after the grind draw)."""
        import os

        from .challenger import SerializingChallenger64
        from .device_transcript import GOLDILOCKS_P
        from .merkle import Blake3FieldHasher

        from .utils import jit_enabled

        if os.environ.get("MULTISTARK_DEVICE_TRANSCRIPT", "1") in ("0", "false", "off"):
            return False
        if not jit_enabled():
            return False  # eager (CPU): the host path with np mirrors is faster
        return (
            isinstance(challenger, SerializingChallenger64)
            and isinstance(self.mmcs.hasher, Blake3FieldHasher)
            and self.hf.p == GOLDILOCKS_P
            and 1 <= self.E.D <= 3
            and len(challenger.inner.input_buffer) % 4 == 0
        )

    def _commit_phase_device(self, ro, schedule, log_max_ro, challenger):
        """All fold rounds dispatched without host sync: each round's kernel
        derives (witness, β) from the duplex digest on device
        (device_transcript.py), folds, and commits the next level.  One
        device_get at the end, then the host challenger replays the byte
        transcript from the returned caps/witnesses — replay is the
        authority; returns None on any divergence (caller falls back)."""
        from . import device_transcript as dt

        entry = dt.entry_buffer_words(bytes(challenger.inner.input_buffer))
        if entry is None:
            return None
        (
            caps_dev, ws_dev, betas_dev, oks_dev, commit_datas, current, log_size,
        ) = self._commit_phase_device_core(ro, schedule, log_max_ro, jnp.asarray(entry))

        # the single sync: caps, witnesses, βs, validity flags together
        caps_np, ws_np, betas_np, oks_np = jax.device_get(
            (caps_dev, ws_dev, betas_dev, oks_dev)
        )
        replay = self.replay_commit_phase_host(
            challenger, schedule, caps_np, ws_np, betas_np, oks_np
        )
        if replay is None:
            return None
        caps, commit_pows = replay
        return caps, commit_datas, commit_pows, current, log_size

    def replay_commit_phase_host(
        self, challenger, schedule, caps_np, ws_np, betas_np, oks_np
    ):
        """Authoritative host replay of the device commit-phase transcript:
        observe each cap, check the grind witness, compare each β against
        the device draw.  Adopts the replayed challenger state on success;
        returns None on any divergence (caller falls back to the host
        path)."""
        from . import device_transcript as dt

        bits = self.fri.commit_proof_of_work_bits
        if not all(bool(o) for o in oks_np):
            return None  # grind miss or rejection-sampling draw
        probe = challenger.clone()
        caps: List[np.ndarray] = [
            np.ascontiguousarray(np.asarray(c).T) for c in caps_np
        ]
        commit_pows: List[int] = []
        for r in range(len(schedule)):
            probe.observe_commitment(caps[r])
            w = dt.u64_of_pair(*ws_np[r])
            if not probe.check_witness(bits, w):
                return None
            beta_host = probe.sample_ext()
            beta_dev = tuple(dt.u64_of_pair(lo, hi) for lo, hi in betas_np[r])
            if beta_host != beta_dev:
                return None
            commit_pows.append(w)
        challenger.inner.input_buffer = probe.inner.input_buffer
        challenger.inner.output_buffer = probe.inner.output_buffer
        return caps, commit_pows

    def _commit_phase_device_core(self, ro, schedule, log_max_ro, chain):
        """Pure-device FRI commit phase: NO host sync, NO replay — the
        caller owns both (the standalone path above; the whole-prove device
        transcript does one global sync instead, prover._prove_dt).
        Returns (caps_dev, ws_dev, betas_dev, oks_dev, commit_datas,
        folded_final, log_size)."""
        E = self.E
        bits = self.fri.commit_proof_of_work_bits

        current = ro[log_max_ro]
        log_size = log_max_ro
        A0 = 1 << schedule[0]
        dims0 = [(A0 * E.D, 1 << (log_size - schedule[0]))]

        # static per-round metadata (shapes/shifts/absorb slots)
        heights = sorted(ro.keys(), reverse=True)
        metas = []
        ls = log_max_ro
        for r, a_bits in enumerate(schedule):
            shift_cur = self._shift_at(log_max_ro, ls)
            next_log = ls - a_bits
            metas.append((
                ls, a_bits,
                schedule[r + 1] if r + 1 < len(schedule) else None,
                shift_cur,
                heights.index(next_log) if next_log in ro else None,
            ))
            ls = next_log

        if log_max_ro < self._stage_fuse_log():
            # ALL rounds (round-0 commit + every grind/fold/commit) in ONE
            # program: the per-round kernels cost ~5-20 ms of dispatch each
            # through the tunnel while their device compute is tiny; the
            # whole commit phase is transcript-serial ON DEVICE anyway
            key = (
                "fri_rounds_fused", E.name,
                tuple((m[0], m[1], m[2], m[3] % self.hf.p, m[4]) for m in metas),
                tuple(heights), bits, int(chain.shape[0]),
                self.mmcs.cap_height, type(self.mmcs.hasher).__name__,
            )

            def mk(_metas=tuple(metas), _A0=A0, _d0=tuple(dims0), _b=bits):
                def f(ch, ro_vals):
                    cur = ro_vals[0]
                    mat0 = self._ext_slices_matrix(
                        [jax.tree.map(lambda t, j=j: t[j::_A0], cur) for j in range(_A0)]
                    )
                    layers0 = self.mmcs._commit_impl([mat0], list(_d0))
                    trees = [(mat0, layers0)]
                    caps_d = [layers0[-1]]
                    ws, betas, oks = [], [], []
                    for r, (ls_, ab_, na_, sc_, ai_) in enumerate(_metas):
                        absorb = ro_vals[ai_] if ai_ is not None else None
                        ch, w, beta, ok, cur, tree = self._device_round_kernel(
                            ch, caps_d[r], cur, absorb, ls_, ab_, na_, sc_, _b
                        )
                        ws.append(w)
                        betas.append(beta)
                        oks.append(ok)
                        if tree is not None:
                            trees.append(tree)
                            caps_d.append(tree[1][-1])
                    return (
                        tuple(caps_d), tuple(ws), tuple(betas), tuple(oks),
                        tuple(trees), cur,
                    )

                return f

            kern = cached_jit(key, mk)
            caps_dev, ws_dev, betas_dev, oks_dev, trees, current = kern(
                chain, tuple(ro[h] for h in heights)
            )
            commit_datas = [
                MerkleProverData(mats=[trees[0][0]], dims=dims0,
                                 layers=list(trees[0][1]),
                                 log_max=log_size - schedule[0])
            ]
            t = 1
            ls = log_max_ro
            for r, a_bits in enumerate(schedule):
                next_log = ls - a_bits
                if r + 1 < len(schedule):
                    next_a = schedule[r + 1]
                    commit_datas.append(
                        MerkleProverData(
                            mats=[trees[t][0]],
                            dims=[((1 << next_a) * E.D, 1 << (next_log - next_a))],
                            layers=list(trees[t][1]),
                            log_max=next_log - next_a,
                        )
                    )
                    t += 1
                ls = next_log
            log_size = ls
        else:
            # per-round programs (large sizes: the remote compile helper is
            # OOM-killed on the fully-fused commit phase)
            kern0 = cached_jit(
                ("fri_round0_commit", type(self.mmcs.hasher).__name__,
                 self.F.__class__.__name__, E.name, log_size, schedule[0],
                 self.mmcs.cap_height),
                lambda _d=tuple(dims0), _A0=A0: lambda cur: (
                    lambda mat: (mat, self.mmcs._commit_impl([mat], list(_d)))
                )(
                    self._ext_slices_matrix(
                        [jax.tree.map(lambda t, j=j: t[j::_A0], cur) for j in range(_A0)]
                    )
                ),
            )
            mat0, layers0 = kern0(current)
            commit_datas = [
                MerkleProverData(mats=[mat0], dims=dims0, layers=layers0,
                                 log_max=log_size - schedule[0])
            ]
            caps_dev = [layers0[-1]]

            ws_dev, betas_dev, oks_dev = [], [], []
            for r, a_bits in enumerate(schedule):
                shift_cur = self._shift_at(log_max_ro, log_size)
                next_log = log_size - a_bits
                absorb = ro.get(next_log)
                next_a = schedule[r + 1] if r + 1 < len(schedule) else None
                key = (
                    "fri_round_dev", E.name, log_size, a_bits, next_a,
                    shift_cur % self.hf.p, absorb is not None, bits,
                    int(chain.shape[0]), self.mmcs.cap_height,
                    type(self.mmcs.hasher).__name__,
                )
                kern = cached_jit(
                    key,
                    lambda _ls=log_size, _ab=a_bits, _na=next_a, _sc=shift_cur, _b=bits: (
                        lambda ch, cap, cur, ab_: self._device_round_kernel(
                            ch, cap, cur, ab_, _ls, _ab, _na, _sc, _b
                        )
                    ),
                )
                chain, w, beta, ok, current, tree = kern(
                    chain, caps_dev[r], current, absorb
                )
                ws_dev.append(w)
                betas_dev.append(beta)
                oks_dev.append(ok)
                if tree is not None:
                    mat, layers = tree
                    commit_datas.append(
                        MerkleProverData(
                            mats=[mat],
                            dims=[((1 << next_a) * E.D, 1 << (next_log - next_a))],
                            layers=layers,
                            log_max=next_log - next_a,
                        )
                    )
                    caps_dev.append(layers[-1])
                log_size = next_log

        return caps_dev, ws_dev, betas_dev, oks_dev, commit_datas, current, log_size

    def _device_round_kernel(
        self, chain, cap, current, absorb, log_size, a_bits, next_a, shift, bits
    ):
        """One FRI round entirely on device: absorb cap into the duplex,
        grind the PoW witness, squeeze β, fold (+absorb), commit the next
        level's tree.  Returns (new_chain, witness, β, valid, folded, tree)."""
        from . import device_transcript as dt
        from .merkle import digest_planes_words

        inp = jnp.concatenate([chain, digest_planes_words(cap)])
        w, digest, found = dt.grind_round(inp, bits)
        beta, valid = dt.sample_ext_from_digest(digest, self.E.D)
        folded = self._fold_absorb(current, beta, absorb, log_size, a_bits, shift)
        tree = None
        if next_a is not None:
            A2 = 1 << next_a
            slices = [jax.tree.map(lambda t, j=j: t[j::A2], folded) for j in range(A2)]
            mat = self._ext_slices_matrix(slices)
            layers = self.mmcs._commit_impl(
                [mat], [(A2 * self.E.D, 1 << (log_size - a_bits - next_a))]
            )
            tree = (mat, layers)
        return digest, jnp.stack(list(w)), beta, found & valid, folded, tree

    def _query_phase(self, rounds, commit_datas, indices, arities, log_max, log_max_ro):
        """Step E: open input trees + commit-phase trees at the sampled
        indices; all gathers dispatch async, ONE device_get syncs."""
        nq = len(indices)
        round_datas = [data.mmcs_data for data, _ in rounds]
        round_idxs = [
            np.asarray([i >> (log_max - data.log_max_lde) for i in indices])
            for data, _ in rounds
        ]
        level_idxs = []
        drop = log_max - log_max_ro
        bits_before = 0
        for l in range(len(commit_datas)):
            level_idxs.append(
                np.asarray([(i >> (drop + bits_before)) >> arities[l] for i in indices])
            )
            bits_before += arities[l]
        # ONE jitted gather program for every tree (rounds + fold levels):
        # per-tree dispatches cost one tunnel round trip each (~20/proof)
        fetched_all = self.mmcs.gather_device_many(
            round_datas + list(commit_datas), round_idxs + level_idxs
        )
        round_host, level_host = jax.device_get(
            (fetched_all[: len(round_datas)], fetched_all[len(round_datas):])
        )
        per_round_openings = [
            self.mmcs.assemble(data.mmcs_data, nq, fetched)
            for (data, _), fetched in zip(rounds, round_host)
        ]
        per_level_openings = [
            self.mmcs.assemble(mdata, nq, fetched)
            for mdata, fetched in zip(commit_datas, level_host)
        ]

        query_proofs = []
        for qi in range(len(indices)):
            commit_ops = [
                (per_level_openings[l][qi].opened_rows[0], per_level_openings[l][qi].path)
                for l in range(len(commit_datas))
            ]
            query_proofs.append(
                QueryProof(
                    input_openings=[pr[qi] for pr in per_round_openings],
                    commit_openings=commit_ops,
                )
            )
        return query_proofs

    # -- open helpers (jitted kernels; proof-varying values are arguments) --
    def _eval_kernel(self, mat, zs, log_n: int):
        """Claimed evaluations by small-domain barycentric:
        p(z) = (z^n - s^n)/(n·s^n) · Σ_i e_i·x_i/(z - x_i).
        mat: stored bitrev LDE; zs: tuple of device ext scalars.
        Returns a tuple of ext (w,) value arrays, one per point."""
        E, F, hf = self.E, self.F, self.hf
        small = self.engine.prefix_to_natural(mat, log_n)  # (w, n) on GEN·H_n
        n = 1 << log_n
        s = hf.generator
        x = self.x_table_natural(log_n, s)
        s_n = hf.pow(s, n)
        inv_ns = hf.inv(hf.mul(n % hf.p, s_n))
        out = []
        for z in zs:
            diff = self._ext_scalar_sub_base(z, x)  # z - x_i, ext (n,)
            inv_diff = batch_inv(E, diff, axis=0)
            w_i = E.scale(inv_diff, x)  # x_i / (z - x_i)
            zn = z
            for _ in range(log_n):
                zn = E.square(zn)
            c = E.scale(E.sub(zn, self._emb_base_const(s_n)), F.const(inv_ns, ()))
            coords = []
            for d in range(E.D):
                prod = F.mul(small, jax.tree.map(lambda a: a[None, :], w_i[d]))
                coords.append(field_sum(F, prod, axis=-1))  # (w,)
            out.append(E.mul(tuple(coords), c))
        return tuple(out)

    def _ro_kernel(self, mat, vals_dev, zs, alpha_vec, aoffs, log_lde: int):
        """Reduced-opening contribution of one matrix for all its points:
        Σ_p (-α^{off_p})·(u - S_p) / (z_p - x) over the stored LDE, where
        u = Σ_j α^j·col_j and S_p = Σ_j α^j·v_{p,j}."""
        E, F, hf = self.E, self.F, self.hf
        coords = []
        for d in range(E.D):
            prod = F.mul(mat, jax.tree.map(lambda a: a[:, None], alpha_vec[d]))
            coords.append(field_sum(F, prod, axis=0))  # (N,)
        u = tuple(coords)
        x_full = self.x_table_storage(log_lde, hf.generator)
        total = None
        for p, z in enumerate(zs):
            s_p = field_sum(E, E.mul(alpha_vec, vals_dev[p]), axis=0)  # ext scalar
            diff = self._ext_scalar_sub_base(z, x_full)
            inv_diff = batch_inv(E, diff, axis=0)
            num = E.sub(u, s_p)
            contrib = E.mul(E.mul(num, inv_diff), aoffs[p])
            total = contrib if total is None else E.add(total, contrib)
        return total

    def _ext_scalar_sub_base(self, z, x):
        """Device ext scalar minus base array -> ext array (broadcast)."""
        E, F = self.E, self.F
        shape = jax.tree.leaves(x)[0].shape
        coords = []
        for d in range(E.D):
            zd = jax.tree.map(lambda p: jnp.broadcast_to(p, shape), z[d])
            coords.append(F.sub(zd, x) if d == 0 else zd)
        return tuple(coords)

    def _host_coord_to_u64(self, planes) -> np.ndarray:
        """Already-fetched base-element planes -> uint64 (canonical)."""
        if self.F.num_planes == 2:
            lo = np.asarray(planes[0], np.uint64)
            hi = np.asarray(planes[1], np.uint64)
            return lo | (hi << np.uint64(32))
        return self.F.to_np(tuple(jnp.asarray(p) for p in planes))

    def _emb_base_const(self, v: int):
        F, E = self.F, self.E
        return (F.const(v, ()),) + tuple(F.const(0, ()) for _ in range(E.D - 1))

    def _host_ext_powers(self, alpha: ExtVal, count: int) -> List[ExtVal]:
        out = [self.he.one]
        for _ in range(1, count):
            out.append(self.he.mul(out[-1], alpha))
        return out

    def _ext_pow(self, alpha: ExtVal, e: int) -> ExtVal:
        return self.he.pow(alpha, e)

    def _ext_slices_matrix(self, slices):
        """Flatten A ext vectors into one base matrix (A·D, N/A): columns
        [s0_0..s0_{D-1}, s1_0.., ...] (flatten_to_base convention)."""
        planes = []
        for p in range(self.F.num_planes):
            rows = [s[d][p] for s in slices for d in range(self.E.D)]
            planes.append(jnp.stack(rows, axis=0))
        return tuple(planes)

    def _fold_absorb(self, current, beta_d, absorb, log_size: int, a_bits: int, shift: int):
        if self._np_eager() and not _has_tracer((current, beta_d, absorb)):
            return self._fold_absorb_np(current, beta_d, absorb, log_size, a_bits, shift)
        folded = self._fold_multi(current, beta_d, log_size, a_bits, shift)
        if absorb is not None:
            folded = self.E.add(folded, absorb)
        return folded

    def _fold_absorb_np(self, current, beta_d, absorb, log_size, a_bits, shift):
        """NumPy mirror of _fold_multi + absorb (eager CPU path; exact)."""
        E, hf = self.E, self.hf
        nf, ne = self._np_field_pair()
        mulfn = npref.gl_mul if hf.name == "Goldilocks" else npref.bb_mul
        cur = E.to_np(current)  # (N, D)
        beta_s = ne.of_scalar(tuple(int(c) for c in E.to_np(beta_d)))
        half_inv = np.uint64(hf.inv(2))
        for s in range(a_bits):
            log_m = log_size - s
            g_inv = hf.inv(hf.two_adic_generator(log_m))
            s_inv = hf.inv(hf.exp_power_of_2(shift, s))
            tab = mulfn(np_powers(hf, g_inv, 1 << log_m), np.uint64(s_inv))[
                bit_reverse_indices(log_m)
            ]
            inv_x_even = tab[0::2]
            a, b = cur[0::2], cur[1::2]
            sm = ne.scale(ne.add(a, b), half_inv)
            df = ne.scale(ne.sub(a, b), nf.mul(inv_x_even, half_inv))
            cur = ne.add(sm, ne.mul(df, beta_s))
            if s + 1 < a_bits:
                beta_s = ne.mul(beta_s, beta_s)
        if absorb is not None:
            cur = ne.add(cur, E.to_np(absorb))
        return E.from_np(cur)

    def _fold_commit_kernel(
        self, current, beta_d, absorb, log_size: int, a_bits: int, next_a: int, shift: int
    ):
        """Fold with β (+ absorb), then slice and build the next level's
        entire Merkle tree — the fused per-round FRI kernel."""
        folded = self._fold_absorb(current, beta_d, absorb, log_size, a_bits, shift)
        A2 = 1 << next_a
        slices = [jax.tree.map(lambda t, j=j: t[j::A2], folded) for j in range(A2)]
        mat = self._ext_slices_matrix(slices)
        width = A2 * self.E.D
        height = 1 << (log_size - a_bits - next_a)
        layers = self.mmcs._commit_impl([mat], [(width, height)])
        return folded, mat, layers

    def _fold_multi(self, current, beta_d, log_size: int, a_bits: int, shift: int):
        """Arity-2^a fold as a chain of pair folds with β, β², β⁴, ...
        Each pair step: (v_even+v_odd)/2 + β_s·(v_even-v_odd)/(2x)."""
        E, F, hf = self.E, self.F, self.hf
        half_inv = hf.inv(2)
        beta_s = beta_d
        for s in range(a_bits):
            inv_x = self.x_table_storage(log_size - s, self.hf.exp_power_of_2(shift, s), inverse=True)
            inv_x_even = jax.tree.map(lambda t: t[0::2], inv_x)
            shape = jax.tree.leaves(inv_x_even)[0].shape
            a = jax.tree.map(lambda t: t[0::2], current)
            b = jax.tree.map(lambda t: t[1::2], current)
            sm = E.scale(E.add(a, b), F.const(half_inv, shape))
            df = E.scale(E.sub(a, b), F.mul(inv_x_even, F.const(half_inv, shape)))
            current = E.add(sm, E.mul(df, beta_s))
            if s + 1 < a_bits:
                beta_s = E.square(beta_s)
        return current

    def _final_poly_host(self, current, log_size: int, log_max_ro: int) -> List[ExtVal]:
        """Host iDFT of the remaining (tiny) fold vector -> coefficients.
        Degree < 2^log_final_poly_len for honest provers."""
        from .utils import to_np_global

        he, hf = self.he, self.hf
        n = 1 << log_size
        vals_np = to_np_global(self.E, current)  # (n, D) u64, storage order
        evals = [tuple(int(x) for x in vals_np[i]) for i in range(n)]
        # un-bitrev to natural
        nat = [he.zero] * n
        for i in range(n):
            nat[reverse_bits(i, log_size)] = evals[i]
        shift = self._shift_at(log_max_ro, log_size)
        g = hf.two_adic_generator(log_size)
        n_inv = hf.inv(n % hf.p)
        coeffs = []
        for j in range(n):
            acc = he.zero
            g_mj = hf.pow(hf.inv(g), j)
            xp = 1
            for i in range(n):
                acc = he.add(acc, he.scale(nat[i], xp))
                xp = hf.mul(xp, g_mj)
            acc = he.scale(acc, hf.mul(n_inv, hf.pow(hf.inv(shift), j)))
            coeffs.append(acc)
        keep = 1 << self.fri.log_final_poly_len
        for c in coeffs[keep:]:
            assert self.he.is_zero(c), "final poly degree too high (prover bug)"
        return coeffs[:keep]

    # -- verify -----------------------------------------------------------
    def verify(self, rounds: Sequence[VerifyRound], proof: FriProof, challenger) -> None:
        he, hf = self.he, self.hf
        fri = self.fri

        if self.profile.fri_observe_claims_before_alpha:
            for cap, mats in rounds:
                for _, _, pts in mats:
                    for _, vals in pts:
                        for v in vals:
                            challenger.observe_ext(v)
        alpha = challenger.sample_ext()

        log_max = max(
            log_n + self.log_blowup for _, mats in rounds for log_n, _, _ in mats
        )
        heights = {
            log_n + self.log_blowup
            for _, mats in rounds
            for log_n, _, pts in mats
            if pts
        }
        log_max_ro = max(heights)
        log_final = self.log_blowup + fri.log_final_poly_len
        # replay the prover's arity schedule (deterministic from shapes)
        schedule: List[int] = []
        ls = log_max_ro
        while ls > log_final:
            a_bits = min(fri.max_log_arity, ls - log_final)
            for h in heights:
                if ls - a_bits < h < ls:
                    a_bits = ls - h
            schedule.append(a_bits)
            ls -= a_bits
        n_folds = len(schedule)
        ensure(len(proof.commit_caps) == n_folds, "InvalidProofShape", "fold count")
        ensure(len(proof.commit_pow_witnesses) == n_folds, "InvalidProofShape", "pow count")
        betas = []
        for cap, pow_w in zip(proof.commit_caps, proof.commit_pow_witnesses):
            challenger.observe_commitment(cap)
            ensure(
                challenger.check_witness(fri.commit_proof_of_work_bits, pow_w),
                "InvalidOpeningArgument",
                "commit PoW",
            )
            betas.append(challenger.sample_ext())
        ensure(
            len(proof.final_poly) == 1 << fri.log_final_poly_len,
            "InvalidProofShape",
            "final poly len",
        )
        for c in proof.final_poly:
            challenger.observe_ext(c)
        ensure(
            challenger.check_witness(fri.query_proof_of_work_bits, proof.query_pow_witness),
            "InvalidOpeningArgument",
            "query PoW",
        )
        indices = [challenger.sample_bits(log_max) for _ in range(fri.num_queries)]
        ensure(len(proof.query_proofs) == len(indices), "InvalidProofShape", "query count")

        # Batched verification over all queries at once: vectorized Merkle
        # hash walks (native C / NumPy) + vectorized field arithmetic for the
        # reduced openings, fold walk, and final-poly check.  Falls back to
        # the per-query reference walk for hashers/fields without batch
        # support (and the per-query path stays as the pinned cross-check in
        # tests/test_verify_batched.py).
        import os

        mode = os.environ.get("MULTISTARK_VERIFY_MODE", "auto")
        batched = hasattr(self.mmcs.hasher, "np_hash_rows_batch") and mode != "perquery"
        # Adversarial-input hardening: the batched walks check shapes
        # explicitly, but a malformed-yet-shape-passing proof (ragged rows,
        # wrong dtypes, negative path lengths...) must surface as
        # VerificationError, never an uncaught numpy exception (VERDICT r4
        # weak #7; reference negative tests src/verifier.rs:852-912).
        try:
            if batched:
                self._verify_merkle_batched(
                    rounds, proof, indices, log_max, log_max_ro, schedule
                )
            if batched and self.hf.name in ("Goldilocks", "BabyBear"):
                self._verify_queries_batched(
                    rounds, alpha, betas, proof, indices, log_max, log_max_ro, schedule
                )
            else:
                for index, qp in zip(indices, proof.query_proofs):
                    self._verify_query(
                        rounds, alpha, betas, proof, index, qp, log_max, log_max_ro,
                        schedule, skip_merkle=batched,
                    )
        except VerificationError:
            raise
        except (ValueError, TypeError, IndexError, KeyError, OverflowError) as e:
            raise VerificationError(
                "InvalidProofShape", f"malformed proof ({type(e).__name__})"
            ) from e

    def _verify_merkle_batched(self, rounds, proof, indices, log_max, log_max_ro, schedule):
        from .merkle import _mmcs_verify_batch_queries

        hf = self.hf
        idx = np.asarray(indices, np.int64)
        for qp in proof.query_proofs:
            ensure(
                len(qp.input_openings) == len(rounds), "InvalidProofShape", "round count"
            )
            ensure(
                len(qp.commit_openings) == len(schedule),
                "InvalidProofShape",
                "level count",
            )
        for r, (cap, mats) in enumerate(rounds):
            round_log_max = max(log_n for log_n, _, _ in mats) + self.log_blowup
            dims = [(w, 1 << (log_n + self.log_blowup)) for log_n, w, _ in mats]
            openings = [qp.input_openings[r] for qp in proof.query_proofs]
            ensure(
                _mmcs_verify_batch_queries(
                    self.mmcs, cap, dims, idx >> (log_max - round_log_max), openings
                ),
                "InvalidOpeningArgument",
                "input Merkle path",
            )
        D = self.he.D
        log_size = log_max_ro
        pos = idx >> (log_max - log_max_ro)
        for l, a_bits in enumerate(schedule):
            A = 1 << a_bits
            for qp in proof.query_proofs:
                ensure(
                    len(qp.commit_openings[l][0]) == A * D,
                    "InvalidProofShape",
                    "fold row width",
                )
            openings = [
                BatchOpening(
                    opened_rows=[np.asarray(qp.commit_openings[l][0], np.uint64)],
                    path=qp.commit_openings[l][1],
                )
                for qp in proof.query_proofs
            ]
            ensure(
                _mmcs_verify_batch_queries(
                    self.mmcs,
                    proof.commit_caps[l],
                    [(A * D, 1 << (log_size - a_bits))],
                    pos >> a_bits,
                    openings,
                ),
                "InvalidOpeningArgument",
                "commit-phase Merkle path",
            )
            log_size -= a_bits
            pos = pos >> a_bits

    def _verify_queries_batched(
        self, rounds, alpha, betas, proof, indices, log_max, log_max_ro, schedule
    ):
        """All-queries-at-once mirror of _verify_query's arithmetic (reduced
        openings, fold walk, final poly) over (Q, ...) uint64 arrays — same
        checks, same error kinds, two orders of magnitude fewer Python field
        ops.  Merkle paths are checked separately by _verify_merkle_batched."""
        from .fields.npref import NpExt, NpField, reverse_bits_vec

        he, hf = self.he, self.hf
        nf = NpField(hf)
        ne = NpExt(nf, he)
        Q = len(indices)
        D = he.D
        idx = np.asarray(indices, np.uint64)

        def stack_rows(get, width, what):
            try:
                rows = np.stack([
                    np.asarray(get(qp), np.uint64) for qp in proof.query_proofs
                ])
            except ValueError:
                ensure(False, "InvalidProofShape", what)
            ensure(rows.ndim == 2 and rows.shape[1] == width, "InvalidProofShape", what)
            return nf.reduce(rows)

        def x_vec(log_size, shift, positions):
            """host_x_at vectorized: shift · g^{brev(pos)} (and its inverse
            pattern is handled by callers via inverted inputs)."""
            g = hf.two_adic_generator(log_size)
            return nf.mul(
                np.uint64(shift % hf.p),
                nf.pow_vec(g, reverse_bits_vec(positions, log_size), log_size),
            )

        for qp in proof.query_proofs:
            ensure(len(qp.input_openings) == len(rounds), "InvalidProofShape", "round count")
            ensure(len(qp.commit_openings) == len(betas), "InvalidProofShape", "level count")

        # -- reduced openings (alpha-combined opened values / (x - z))
        apow_cache = [he.one]

        def apows(lo, hi):
            while len(apow_cache) < hi:
                apow_cache.append(he.mul(apow_cache[-1], alpha))
            return apow_cache[lo:hi]

        ro: Dict[int, np.ndarray] = {}
        offsets: Dict[int, int] = {}
        pending = []  # (log_lde, numerator (Q, D), denominator (Q, D))
        for r, (cap, mats) in enumerate(rounds):
            for m_idx, (log_n, w, pts) in enumerate(mats):
                if not pts:
                    continue
                log_lde = log_n + self.log_blowup
                rows = stack_rows(
                    lambda qp: qp.input_openings[r].opened_rows[m_idx], w, "row width"
                )
                xb = x_vec(log_lde, hf.generator, idx >> np.uint64(log_max - log_lde))
                off = offsets.get(log_lde, 0)
                for z, vals in pts:
                    ensure(len(vals) == w, "InvalidProofShape", "opened values width")
                    ap = apows(off, off + w)
                    amat = np.asarray(
                        [[int(c) % hf.p for c in a] for a in ap], np.uint64
                    )  # (w, D)
                    # sum_j alpha^{off+j} · row_qj  (base rows scale each coord)
                    num = nf.sum_axis(nf.mul(rows[:, :, None], amat[None, :, :]), 1)
                    cs = he.zero  # sum_j alpha^{off+j} · vals_j (scalar)
                    for a_, v in zip(ap, vals):
                        cs = he.add(cs, he.mul(a_, v))
                    num = ne.sub(num, ne.of_scalar(cs, (Q,)))
                    denom = ne.sub(ne.from_base_vec(xb), ne.of_scalar(z, (Q,)))
                    pending.append((log_lde, num, denom))
                    off += w
                offsets[log_lde] = off
                ro.setdefault(log_lde, None)
        if pending:
            denoms = np.concatenate([d for _, _, d in pending])
            ensure(
                not np.all(denoms == 0, axis=1).any(),
                "InvalidOpeningArgument",
                "OOD point on evaluation domain",
            )
            invs = ne.batch_inv(denoms)
            o = 0
            for log_lde, num, _ in pending:
                term = ne.mul(num, invs[o : o + Q])
                o += Q
                ro[log_lde] = term if ro[log_lde] is None else ne.add(ro[log_lde], term)

        # -- fold walk
        log_size = log_max_ro
        pos = idx >> np.uint64(log_max - log_max_ro)
        value = ro.get(log_max_ro)
        if value is None:
            value = ne.of_scalar(he.zero, (Q,))
        for l, (beta, a_bits) in enumerate(zip(betas, schedule)):
            A = 1 << a_bits
            vals = stack_rows(
                lambda qp: qp.commit_openings[l][0], A * D, "fold row width"
            ).reshape(Q, A, D)
            sel = vals[np.arange(Q), (pos & np.uint64(A - 1)).astype(np.int64)]
            ensure(np.array_equal(sel, value), "InvalidOpeningArgument", "fold consistency")
            shift = self._shift_at(log_max_ro, log_size)
            value = self._np_fold_block(
                ne, vals, log_size, shift, pos - (pos & np.uint64(A - 1)), beta
            )
            log_size -= a_bits
            pos = pos >> np.uint64(a_bits)
            if log_size in ro and ro[log_size] is not None:
                value = ne.add(value, ro[log_size])

        shift = self._shift_at(log_max_ro, log_size)
        xf = x_vec(log_size, shift, pos)
        acc = ne.of_scalar(he.zero, (Q,))
        for c in reversed(proof.final_poly):
            acc = ne.add(ne.scale(acc, xf), ne.of_scalar(c, (Q,)))
        ensure(np.array_equal(acc, value), "InvalidOpeningArgument", "final poly mismatch")

    def _np_fold_block(self, ne, vals, log_m: int, shift: int, base, beta):
        """Vectorized mirror of _host_fold_block: (Q, A, D) opened blocks ->
        (Q, D) folded values, all queries at once."""
        from .fields.npref import reverse_bits_vec

        nf, hf = ne.nf, self.hf
        half_inv = np.uint64(hf.inv(2))
        beta_v = ne.of_scalar(beta)
        b = np.asarray(base, np.uint64)
        A = vals.shape[1]
        while A > 1:
            g_inv = hf.inv(hf.two_adic_generator(log_m))
            shift_inv = np.uint64(hf.inv(shift))
            outs = []
            for i in range(A // 2):
                e = reverse_bits_vec(b + np.uint64(2 * i), log_m)
                inv_x_even = nf.mul(shift_inv, nf.pow_vec(g_inv, e, log_m))
                s = ne.scale(ne.add(vals[:, 2 * i], vals[:, 2 * i + 1]), half_inv)
                d = ne.scale(
                    ne.sub(vals[:, 2 * i], vals[:, 2 * i + 1]),
                    nf.mul(half_inv, inv_x_even),
                )
                outs.append(ne.add(s, ne.mul(beta_v, d)))
            vals = np.stack(outs, axis=1)
            A //= 2
            log_m -= 1
            shift = hf.mul(shift, shift)
            b = b >> np.uint64(1)
            if A > 1:
                beta_v = ne.mul(beta_v, beta_v)
        return vals[:, 0]

    def _verify_query(
        self, rounds, alpha, betas, proof, index, qp, log_max, log_max_ro, schedule,
        skip_merkle: bool = False,
    ):
        he, hf = self.he, self.hf
        ensure(len(qp.input_openings) == len(rounds), "InvalidProofShape", "round count")
        ro: Dict[int, ExtVal] = {}
        offsets: Dict[int, int] = {}
        for (cap, mats), opening in zip(rounds, qp.input_openings):
            round_log_max = max(log_n for log_n, _, _ in mats) + self.log_blowup
            r_index = index >> (log_max - round_log_max)
            dims = [(w, 1 << (log_n + self.log_blowup)) for log_n, w, _ in mats]
            ensure(
                skip_merkle or self.mmcs.verify_batch(cap, dims, r_index, opening),
                "InvalidOpeningArgument",
                "input Merkle path",
            )
            for m_idx, (log_n, w, pts) in enumerate(mats):
                if not pts:
                    continue
                log_lde = log_n + self.log_blowup
                row = [int(v) % hf.p for v in opening.opened_rows[m_idx]]
                ensure(len(row) == w, "InvalidProofShape", "row width")
                x = he.from_base(
                    self.host_x_at(log_lde, hf.generator, index >> (log_max - log_lde))
                )
                off = offsets.get(log_lde, 0)
                acc = ro.get(log_lde, he.zero)
                for z, vals in pts:
                    ensure(len(vals) == w, "InvalidProofShape", "opened values width")
                    num = he.zero
                    apow = self._ext_pow(alpha, off)
                    for j in range(w):
                        term = he.sub(he.from_base(row[j]), vals[j])
                        num = he.add(num, he.mul(apow, term))
                        apow = he.mul(apow, alpha)
                    acc = he.add(acc, he.div(num, he.sub(x, z)))
                    off += w
                offsets[log_lde] = off
                ro[log_lde] = acc

        # fold walk (starts at the tallest height with openings)
        ensure(len(qp.commit_openings) == len(betas), "InvalidProofShape", "level count")
        log_size = log_max_ro
        pos = index >> (log_max - log_max_ro)
        value = ro.get(log_max_ro, he.zero)
        D = self.he.D
        for l, ((row, path), beta, a_bits) in enumerate(
            zip(qp.commit_openings, betas, schedule)
        ):
            A = 1 << a_bits
            ensure(len(row) == A * D, "InvalidProofShape", "fold row width")
            opening = BatchOpening(opened_rows=[np.asarray(row, np.uint64)], path=path)
            ensure(
                skip_merkle
                or self.mmcs.verify_batch(
                    proof.commit_caps[l],
                    [(A * D, 1 << (log_size - a_bits))],
                    pos >> a_bits,
                    opening,
                ),
                "InvalidOpeningArgument",
                "commit-phase Merkle path",
            )
            vals = [
                tuple(int(row[j * D + d]) % hf.p for d in range(D)) for j in range(A)
            ]
            ensure(vals[pos & (A - 1)] == value, "InvalidOpeningArgument", "fold consistency")
            shift = self._shift_at(log_max_ro, log_size)
            value = self._host_fold_block(vals, log_size, shift, pos & ~(A - 1), beta)
            log_size -= a_bits
            pos >>= a_bits
            if log_size in ro:
                value = he.add(value, ro[log_size])

        shift = self._shift_at(log_max_ro, log_size)
        x_final = self.host_x_at(log_size, shift, pos)
        acc = he.zero
        for c in reversed(proof.final_poly):
            acc = he.add(he.scale(acc, x_final), c)
        ensure(acc == value, "InvalidOpeningArgument", "final poly mismatch")

    def _shift_at(self, log_max: int, log_size: int) -> int:
        """LDE shift after folding from log_max to log_size: GENERATOR^(2^k)."""
        return self.hf.exp_power_of_2(self.hf.generator, log_max - log_size)

    def _host_fold_block(self, vals, log_m: int, shift: int, base: int, beta):
        """Host mirror of _fold_multi for one query block: pair-fold the
        2^k opened values with β, β², ... down to one value."""
        he, hf = self.he, self.hf
        half_inv = hf.inv(2)
        b = base
        while len(vals) > 1:
            out = []
            for i in range(len(vals) // 2):
                x_even = self.host_x_at(log_m, shift, b + 2 * i)
                s = he.scale(he.add(vals[2 * i], vals[2 * i + 1]), half_inv)
                d = he.scale(
                    he.sub(vals[2 * i], vals[2 * i + 1]), hf.mul(half_inv, hf.inv(x_even))
                )
                out.append(he.add(s, he.mul(beta, d)))
            vals = out
            log_m -= 1
            shift = hf.mul(shift, shift)
            b >>= 1
            if len(vals) > 1:
                beta = he.square(beta)
        return vals[0]
