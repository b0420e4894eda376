"""The 6-stage prover (reference src/prover.rs:289-603; stage taxonomy in
SURVEY.md §3.3).

Device work happens in the big stages (stage-1 commit, stage-2 lookup
traces + commit, quotient evaluation + commit, FRI open); the Fiat-Shamir
challenger runs on host between them — 5 host↔device round-trips per proof,
one per commit/sample boundary (SURVEY.md §7.0).

Analytic cost model (the reference's, src/prover.rs:51-178, adapted):
with per-circuit height n, width W, blowup B = 2^b, quotient degree q,
constraint count k, FRI queries Q, rounds R ≈ log2(n·B):

  C_prove ≈ Σ_c (B+1)·n·log2(n)·W        (LDE NTTs: iDFT + padded DFT)
          + Σ_c 2·n·B·W                   (Merkle leaf hash + compress)
          + Σ_c n·L·(fp + inv)            (stage-2 messages + batch inverse)
          + Σ_c n·q·eval_cost(k)          (quotient sweep on the coset)
          + Σ_c n·B·W·D                   (reduced-opening folds)
          + Σ_r n_r·B                     (FRI fold layers, geometric)
          + Q·R·log2(n·B)                 (query phase Merkle paths)
          + 2^commit_pow·R + 2^query_pow  (grinding)

All terms are embarrassingly parallel over rows on device except the
geometric FRI tail and the O(Q·R) query gathers."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import lookup as lk
from .challenger import observe_claims as _observe_claims
from .domains import TwoAdicCoset
from .evaluator import DeviceAlgebra, constraint_values, lookup_values as graph_lookup_values, sweep
from .expr import Source
from .ntt import get_engine
from .pcs import FriProof
from .profiling import span
from .system import ProverKey, System, SystemWitness
from .utils import cached_jit, ext_scalar

ExtVal = Tuple[int, ...]


@dataclass
class Commitments:
    stage_1_trace: np.ndarray
    stage_2_trace: np.ndarray
    quotient_chunks: np.ndarray


@dataclass
class Proof:
    """reference src/prover.rs:202-238."""

    active: List[bool]
    commitments: Commitments
    intermediate_accumulators: List[ExtVal]
    log_degrees: List[int]  # per ACTIVE circuit
    # opened values: per matrix, per point, per column (ext coords)
    preprocessed_opened: List[List[List[ExtVal]]]
    stage1_opened: List[List[List[ExtVal]]]
    stage2_opened: List[List[List[ExtVal]]]
    quotient_opened: List[List[List[ExtVal]]]
    fri_proof: FriProof

    def to_bytes(self, config=None) -> bytes:
        from .serialization import proof_to_bytes

        if config is None:
            return proof_to_bytes(self)
        field_bytes = 8 if config.host_field.p.bit_length() > 32 else 4
        profile = getattr(config, "transcript_profile", None)
        return proof_to_bytes(
            self, field_bytes, config.extension_params.degree,
            profile.commit_pow_witness_placement if profile else "after_commits",
        )

    @staticmethod
    def from_bytes(data: bytes, system: "System") -> "Proof":
        from .serialization import proof_from_bytes

        return proof_from_bytes(data, system)


def prove(system: System, key: ProverKey, witness: SystemWitness, claims=None) -> Proof:
    return prove_multiple_claims(
        system, key, witness, [] if claims is None else [claims]
    )


def prove_multiple_claims(
    system: System, key: ProverKey, witness: SystemWitness, claims: Sequence[Sequence[int]]
) -> Proof:
    config = system.config
    # whole-prove device transcript (dt_prover): every Fiat-Shamir
    # interaction on device, 2 blocking syncs per prove; host replay is
    # authoritative and any divergence falls through to the path below,
    # so proof bytes are identical either way
    from . import dt_prover

    if dt_prover.eligible(config):
        proof = dt_prover.prove_device_transcript(system, key, witness, claims)
        if proof is not None:
            return proof
    F, E = config.field, config.ext
    hf, he = config.host_field, config.host_ext
    pcs = config.pcs
    engine = get_engine(F)

    with span("stark/prove"):
        ch = config.initialise_challenger()
        system.observe_shape(ch)

        # activation bitmap, observed before any commitment (prover.rs:303-331)
        active = [h > 0 for h in witness.heights]
        assert any(active), "at least one circuit must be active"
        for b in active:
            ch.observe_bytes(bytes([1 if b else 0]))
        active_idx = [i for i, b in enumerate(active) if b]
        log_degrees = [witness.heights[i].bit_length() - 1 for i in active_idx]

        # STAGE-1 COMMIT (prover.rs:336-350)
        with span("stark/stage1_commit"):
            s1_pairs = [
                (pcs.natural_domain_for_degree(witness.heights[i]), witness.traces[i])
                for i in active_idx
            ]
            s1_cap, s1_data = pcs.commit(s1_pairs)

        if system.preprocessed_commit is not None:
            ch.observe_commitment(system.preprocessed_commit)
        ch.observe_commitment(s1_cap)
        for ld in log_degrees:
            ch.observe_bytes(bytes([ld]))
        # length-prefixed claims (prover.rs:353-373)
        _observe_claims(ch, claims)

        beta = ch.sample_ext()
        gamma = ch.sample_ext()
        acc0 = lk.claims_accumulator(he, beta, gamma, claims)

        # STAGE-2: lookup traces (prover.rs:391-421)
        with span("stark/lookup_construction"):
            lvs = [witness.lookup_values[i] for i in active_idx]
            s2_mats, accs = lk.stage_2_traces(F, E, hf, he, lvs, beta, gamma, acc0)
        with span("stark/stage2_commit"):
            s2_pairs = [
                (pcs.natural_domain_for_degree(witness.heights[i]), m)
                for i, m in zip(active_idx, s2_mats)
            ]
            s2_cap, s2_data = pcs.commit(s2_pairs)
        ch.observe_commitment(s2_cap)
        for a in accs:
            ch.observe_ext(a)

        alpha = ch.sample_ext()

        # QUOTIENT per active circuit (prover.rs:437-527)
        with span("stark/quotient"):
            chunk_mats = []
            for k, i in enumerate(active_idx):
                acc_prev = acc0 if k == 0 else accs[k - 1]
                chunk_mats.append(
                    _quotient_chunk_coeffs(
                        system, key, witness, s1_data, s2_data, i, k,
                        beta, gamma, alpha, acc_prev, accs[k],
                    )
                )
            q_cap, q_data = pcs.commit_from_coeffs(chunk_mats)
        ch.observe_commitment(q_cap)

        zeta = ch.sample_ext()

        # opening rounds (prover.rs:539-580): preprocessed?, stage1, stage2, quotient
        rounds = []
        if key.preprocessed_data is not None:
            pre_points = []
            for c_idx, p_idx in enumerate(system.preprocessed_index):
                if p_idx is None:
                    continue
                if active[c_idx]:
                    log_n = witness.heights[c_idx].bit_length() - 1
                    g = hf.two_adic_generator(log_n)
                    pre_points.append([zeta, he.scale(zeta, g)])
                else:
                    pre_points.append([])
            rounds.append((key.preprocessed_data, pre_points))
        two_pt = []
        for i in active_idx:
            log_n = witness.heights[i].bit_length() - 1
            g = hf.two_adic_generator(log_n)
            two_pt.append([zeta, he.scale(zeta, g)])
        rounds.append((s1_data, two_pt))
        rounds.append((s2_data, [list(p) for p in two_pt]))
        rounds.append((q_data, [[zeta] for _ in active_idx]))

        with span("stark/fri_open"):
            opened, fri_proof = pcs.open(rounds, ch)

        r = 0
        if key.preprocessed_data is not None:
            pre_opened = opened[r]
            r += 1
        else:
            pre_opened = []
        s1_opened, s2_opened, q_opened = opened[r], opened[r + 1], opened[r + 2]

        return Proof(
            active=active,
            commitments=Commitments(s1_cap, s2_cap, q_cap),
            intermediate_accumulators=list(accs),
            log_degrees=log_degrees,
            preprocessed_opened=pre_opened,
            stage1_opened=s1_opened,
            stage2_opened=s2_opened,
            quotient_opened=q_opened,
            fri_proof=fri_proof,
        )


def _quotient_chunk_coeffs(
    system, key, witness, s1_data, s2_data, c_idx, active_ord,
    beta, gamma, alpha, acc_prev, acc_final,
):
    """Evaluate the α-folded constraint composition on the disjoint quotient
    domain, divide by Z_H, and return the chunked coefficient matrix
    (q·D, n) for the fused commit path (reference src/prover.rs:756-962).

    The device computation is one jitted kernel per (circuit, height);
    transcript values (β, γ, α, accumulators) enter as device scalars so the
    compiled program is reused across proofs."""
    config = system.config
    F = config.field
    E = config.ext
    hf = config.host_field
    pcs = config.pcs
    circuit = system.circuits[c_idx]

    n = witness.heights[c_idx]
    log_n = n.bit_length() - 1
    q = circuit.quotient_degree
    trace_dom = TwoAdicCoset(hf, log_n, 1)
    qdom = trace_dom.create_disjoint_domain(n * q)

    from . import parallel
    from .utils import jit_enabled, np_mirrors_enabled

    pm = parallel.current_mesh()
    m = n * q
    log_m = log_n + (q.bit_length() - 1)

    # raw stored LDEs; the jitted kernels slice their qdom prefix IN-TRACE
    # (eager prefix_to_natural costs ~5 ms/op through the tunnel)
    raw = {
        Source.MAIN.value: s1_data.mmcs_data.mats[active_ord],
        Source.STAGE2.value: s2_data.mmcs_data.mats[active_ord],
    }
    p_idx = system.preprocessed_index[c_idx]
    if p_idx is not None:
        raw[Source.PREPROCESSED.value] = key.preprocessed_data.mmcs_data.mats[p_idx]

    if pm is not None and m >= pm.n * pm.n and q <= m // pm.n:
        mats = {src: pcs.engine.prefix_to_natural(mat, log_m) for src, mat in raw.items()}
        sel_np = trace_dom.selectors_on_coset(qdom)
        selectors = {
            "first": F.from_np(sel_np.is_first_row),
            "last": F.from_np(sel_np.is_last_row),
            "transition": F.from_np(sel_np.is_transition),
            "inv_vanishing": F.from_np(sel_np.inv_vanishing),
        }
        return _quotient_chunk_sharded(
            config, circuit, log_n, q, mats, selectors, beta, gamma, alpha,
            acc_prev, acc_final, pm,
        )
    if not jit_enabled() and np_mirrors_enabled() and hf.name in ("Goldilocks", "BabyBear"):
        mats = {src: pcs.engine.prefix_to_natural(mat, log_m) for src, mat in raw.items()}
        sel_np = trace_dom.selectors_on_coset(qdom)
        return _quotient_chunk_np(
            config, circuit, log_n, q, mats, sel_np, beta, gamma, alpha,
            acc_prev, acc_final,
        )

    selectors = _selectors_device(config, trace_dom, qdom, log_n, q)
    # β, γ, acc_prev, acc_final, α in ONE upload; kernels unpack in-trace
    from .utils import ext_pack

    packed = ext_pack(E, (beta, gamma, acc_prev, acc_final, alpha))
    return _quotient_packed_path(config, circuit, log_n, q, raw, selectors, packed)


def _quotient_packed_path(config, circuit, log_n, q, raw, selectors, packed):
    """Device quotient path given the 5 transcript scalars pre-packed as a
    (5, D)-plane device value (host ext_pack OR device ext_pack_device —
    the whole-prove device transcript reuses the same cached kernels)."""
    from .utils import cached_jit, ext_unpack

    F, E = config.field, config.ext
    hf = config.host_field
    engine = get_engine(F)
    n = 1 << log_n
    m = n * q
    log_m = log_n + (q.bit_length() - 1)
    D = config.extension_params.degree

    def _unpack(pk):
        return tuple(ext_unpack(E, pk, i) for i in range(4)), ext_unpack(E, pk, 4)

    from .ntt import NttEngine

    if m >= (1 << NttEngine._split_log()):
        # large quotient domains: one program for the prefix+sweep, the coset
        # iDFT dispatched per stage OUTSIDE it — the remote compile helper is
        # OOM-killed on the fully-fused program at m >= ~2^21
        engine = get_engine(F)
        D = config.extension_params.degree

        def mk_sweep():
            def f(m_, s_, pk):
                p_, a_ = _unpack(pk)
                return _quotient_sweep_only(
                    config, circuit, log_n, q,
                    {src: engine.prefix_to_natural(mm, log_m) for src, mm in m_.items()},
                    s_, p_, a_,
                )

            return f

        kern = cached_jit(("quotient_sweep", circuit.uid, log_n), mk_sweep)
        qmat = kern(raw, selectors, packed)
        shift = config.host_field.mul(config.host_field.generator, 1)
        coeffs = engine.icoset_from_natural(qmat, log_m, shift)
        kslice = cached_jit(
            ("quotient_slice", circuit.uid, log_n),
            lambda: lambda cs: tuple(
                jnp.stack(
                    [cs[p][d, i * n : (i + 1) * n] for i in range(q) for d in range(D)],
                    axis=0,
                )
                for p in range(F.num_planes)
            ),
        )
        return kslice(coeffs)

    def mk_quot():
        def f(m_, s_, pk):
            p_, a_ = _unpack(pk)
            return _quotient_kernel(
                config, circuit, log_n, q,
                {src: get_engine(F).prefix_to_natural(mm, log_m) for src, mm in m_.items()},
                s_, p_, a_,
            )

        return f

    kern = cached_jit(("quotient", circuit.uid, log_n), mk_quot)
    return kern(raw, selectors, packed)


_SELECTOR_CACHE: dict = {}
_SELECTOR_CACHE_MAX = 8  # LRU-bounded: 4 qdom-sized device arrays per key
# would otherwise accumulate across distinct circuit sizes in one process
# on an already memory-constrained chip


def _selectors_device(config, trace_dom, qdom, log_n: int, q: int) -> dict:
    """Device-resident coset selectors, cached across proves (they depend
    only on the domain geometry; re-uploading them cost 4 host->device
    transfers per circuit per prove).  Bounded to the last
    _SELECTOR_CACHE_MAX (size, q) keys."""
    key = (config.host_field.p, log_n, q)
    if key in _SELECTOR_CACHE:
        _SELECTOR_CACHE[key] = _SELECTOR_CACHE.pop(key)  # refresh LRU order
    if key not in _SELECTOR_CACHE:
        while len(_SELECTOR_CACHE) >= _SELECTOR_CACHE_MAX:
            _SELECTOR_CACHE.pop(next(iter(_SELECTOR_CACHE)))
        F = config.field
        sel_np = trace_dom.selectors_on_coset(qdom)
        _SELECTOR_CACHE[key] = {
            "first": F.from_np(sel_np.is_first_row),
            "last": F.from_np(sel_np.is_last_row),
            "transition": F.from_np(sel_np.is_transition),
            "inv_vanishing": F.from_np(sel_np.inv_vanishing),
        }
    return _SELECTOR_CACHE[key]


_last_sharded_qmat_spec = None  # test breadcrumb, see _quotient_chunk_sharded


def _quotient_chunk_sharded(
    config, circuit, log_n, q, mats, selectors, beta, gamma, alpha,
    acc_prev, acc_final, pm,
):
    """Row-sharded quotient evaluation (SURVEY.md §7.1 step 10, §7.3): the
    constraint sweep runs in a shard_map over block-sharded quotient-domain
    columns; the next-row window (reference src/prover.rs:787-800's
    vertically_strided pair) becomes a q-element halo exchange — each device
    ppermutes the first q columns of its block to its predecessor instead of
    the unsharded jnp.roll.  The in-kernel coset iDFT then runs through the
    four-step sharded DIF (parallel.sharded_dif).  All arithmetic is exact
    mod p, so the chunked coefficients — and the proof bytes — are identical
    to the single-device kernel."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from . import parallel
    from .utils import ext_scalar as _exts, jit_enabled

    F, E = config.field, config.ext
    hf = config.host_field
    ep = config.extension_params
    D = ep.degree
    engine = get_engine(F)
    n = 1 << log_n
    m = n * q
    axis, nd = pm.axis, pm.n

    pubs = tuple(_exts(E, v) for v in (beta, gamma, acc_prev, acc_final))
    alpha_d = _exts(E, alpha)

    def sweep_fold(mats_, sels_, pubs_, alpha_, next_of):
        """The constraint sweep + α-fold + Z_H division over (blocks of) the
        quotient domain; `next_of` supplies the next-row-window view of a
        matrix (jnp.roll single-device / GSPMD-eager; ppermute halo in the
        fused shard_map body)."""
        m_here = jax.tree.leaves(sels_["first"])[0].shape[-1]
        mats_next = {src: next_of(mm) for src, mm in mats_.items()}

        def var_provider(source, col, offset):
            src = mats_next[source] if offset == 1 else mats_[source]
            return jax.tree.map(lambda p: p[col], src)

        def publics(idx):
            return pubs_[idx // D][idx % D]

        alg = DeviceAlgebra(F, var_provider, publics, sels_)
        buf = sweep(circuit.graph, alg)
        user_vals = constraint_values(circuit.graph, buf)
        lvals = graph_lookup_values(circuit.graph, buf)
        logup_vals = lk.logup_constraint_values(
            alg, ep, hf, circuit.num_lookups,
            lambda col, off: var_provider(Source.STAGE2.value, col, off),
            lvals, sels_["last"], pubs_, log_n,
        )
        values = list(user_vals)
        for lv in logup_vals:
            values.extend(lv)
        assert len(values) == circuit.constraint_count

        K = len(values)
        one = tuple(F.const(1 if d == 0 else 0, ()) for d in range(D))

        def pow_body(acc, _):
            return E.mul(acc, alpha_), acc

        _, apow_stack = jax.lax.scan(pow_body, one, None, length=K)
        apows = [
            tuple(tuple(pl[i] for pl in coord) for coord in apow_stack)
            for i in range(K)
        ]
        coords = [F.const(0, ()) for _ in range(D)]
        for i, v in enumerate(values):
            ap = apows[K - 1 - i]
            v = jax.tree.map(lambda p: jnp.broadcast_to(p, (m_here,)), v)
            for d in range(D):
                coords[d] = F.add(coords[d], F.mul(v, ap[d]))
        coords = [F.mul(c, sels_["inv_vanishing"]) for c in coords]
        return tuple(
            jnp.stack([coords[d][p] for d in range(D)], axis=0)
            for p in range(F.num_planes)
        )

    if jit_enabled():
        # ONE fused shard_map body (TPU policy): explicit q-element ppermute
        # halo for the next-row window, everything else device-local
        perm = [(i, (i - 1) % nd) for i in range(nd)]

        def halo_next(mat):
            head = jax.tree.map(lambda p: p[..., :q], mat)
            halo = jax.tree.map(lambda p: jax.lax.ppermute(p, axis, perm), head)
            return jax.tree.map(
                lambda p, h: jnp.concatenate([p[..., q:], h], axis=-1), mat, halo
            )

        def body(mats_, sels_, pubs_, alpha_):
            return sweep_fold(mats_, sels_, pubs_, alpha_, halo_next)

        spec_mat = {src: jax.tree.map(lambda _: P(None, axis), mm) for src, mm in mats.items()}
        spec_sel = {k: jax.tree.map(lambda _: P(axis), v) for k, v in selectors.items()}
        spec_scalar = jax.tree.map(lambda _: P(), pubs)
        spec_alpha = jax.tree.map(lambda _: P(), alpha_d)
        mesh_key = (tuple(d.id for d in pm.mesh.devices.flat), axis)
        kern = parallel._cached_shard(
            ("quotient_sweep", circuit.uid, log_n, mesh_key, tuple(sorted(mats))),
            lambda: jax.jit(jax.shard_map(
                body, mesh=pm.mesh,
                in_specs=(spec_mat, spec_sel, spec_scalar, spec_alpha),
                out_specs=jax.tree.map(lambda _: P(None, axis), tuple(range(F.num_planes))),
                check_vma=False,
            )),
        )
        qmat = kern(mats, selectors, pubs, alpha_d)  # (D, m) planes, sharded
    else:
        # eager CPU-mesh policy: the same math dispatched per-op on
        # block-sharded operands — GSPMD turns the jnp.roll into the halo
        # collective-permute and keeps every elementwise op local (one fused
        # XLA:CPU body would compile pathologically; CLAUDE.md)
        row_s = NamedSharding(pm.mesh, P(None, axis))
        col_s = NamedSharding(pm.mesh, P(axis))
        mats_p = {
            src: jax.tree.map(lambda p: jax.device_put(p, row_s), mm)
            for src, mm in mats.items()
        }
        sels_p = {
            k: jax.tree.map(lambda p: jax.device_put(p, col_s), v)
            for k, v in selectors.items()
        }

        def roll_next(mat):
            return jax.tree.map(lambda p: jnp.roll(p, -q, axis=-1), mat)

        qmat = sweep_fold(mats_p, sels_p, pubs, alpha_d, roll_next)

    # test breadcrumb (tests/test_parallel.py asserts the SWEEP itself ran
    # sharded; the chunk slicing below legitimately reshards)
    global _last_sharded_qmat_spec
    _last_sharded_qmat_spec = getattr(
        jax.tree.leaves(qmat)[0], "sharding", None
    )

    # coset iDFT at log m through the sharded four-step DIF, then the natural
    # re-order + 1/m + shift-unscale (engine.icoset_from_natural's tail)
    log_m = log_n + (q.bit_length() - 1)
    shift = hf.mul(hf.generator, 1)
    cb = parallel.sharded_dif(engine, pm, qmat, log_m, inverse=True)
    coeffs = engine._scale(engine._unbrev(cb, log_m), hf.inv(m % hf.p))
    coeffs = F.mul(coeffs, engine.pow_table(hf.inv(shift), m))
    rows = []
    for i in range(q):
        for d in range(D):
            rows.append(jax.tree.map(lambda p: p[d, i * n : (i + 1) * n], coeffs))
    return tuple(jnp.stack([r[p] for r in rows], axis=0) for p in range(F.num_planes))


def _quotient_chunk_np(
    config, circuit, log_n, q, mats, sel_np, beta, gamma, alpha, acc_prev, acc_final
):
    """Eager (CPU) NumPy mirror of _quotient_kernel's sweep + α-fold +
    Z_H division; only the final iDFT runs through the engine.  Values are
    exact mod-p, so the committed coefficients (and hence the transcript)
    are identical to the jitted path."""
    from .evaluator import NpBaseAlgebra
    from .fields import npref

    F, E = config.field, config.ext
    hf, he = config.host_field, config.host_ext
    ep = config.extension_params
    D = ep.degree
    engine = get_engine(F)
    n = 1 << log_n
    m = n * q

    nf = npref.NpField(hf)
    mats_np = {src: F.to_np(mat) for src, mat in mats.items()}

    def var_provider(source, col, offset):
        colv = mats_np[source][col]
        return np.roll(colv, -q) if offset == 1 else colv

    pubs_np = tuple(
        tuple(np.uint64(int(c) % hf.p) for c in v)
        for v in (beta, gamma, acc_prev, acc_final)
    )

    def publics(idx):
        return pubs_np[idx // D][idx % D]

    selectors = {
        "first": np.asarray(sel_np.is_first_row, np.uint64),
        "last": np.asarray(sel_np.is_last_row, np.uint64),
        "transition": np.asarray(sel_np.is_transition, np.uint64),
    }
    alg = NpBaseAlgebra(hf, var_provider, publics, selectors)
    buf = sweep(circuit.graph, alg)
    user_vals = constraint_values(circuit.graph, buf)
    lvals = graph_lookup_values(circuit.graph, buf)
    logup_vals = lk.logup_constraint_values(
        alg, ep, hf, circuit.num_lookups,
        lambda col, off: var_provider(Source.STAGE2.value, col, off),
        lvals, selectors["last"], pubs_np, log_n,
    )
    values = list(user_vals)
    for lv in logup_vals:
        values.extend(lv)
    assert len(values) == circuit.constraint_count

    K = len(values)
    apows = [he.one]
    for _ in range(K - 1):
        apows.append(he.mul(apows[-1], alpha))
    coords = [np.zeros(m, np.uint64) for _ in range(D)]
    for i, v in enumerate(values):
        ap = apows[K - 1 - i]
        vv = np.broadcast_to(np.asarray(v, np.uint64), (m,))
        for d in range(D):
            coords[d] = nf.add(coords[d], nf.mul(vv, np.uint64(ap[d] % hf.p)))
    inv_van = np.asarray(sel_np.inv_vanishing, np.uint64)
    coords = [nf.mul(c, inv_van) for c in coords]

    qmat = E.base.from_np(np.stack(coords, axis=0))  # (D, m) planes
    shift = hf.mul(hf.generator, 1)
    coeffs = engine.icoset_from_natural(qmat, log_n + (q.bit_length() - 1), shift)
    rows = []
    for i in range(q):
        for d in range(D):
            rows.append(jax.tree.map(lambda p: p[d, i * n : (i + 1) * n], coeffs))
    return tuple(jnp.stack([r[p] for r in rows], axis=0) for p in range(F.num_planes))


def _quotient_kernel(config, circuit, log_n, q, mats, selectors, pubs, alpha_d):
    """Fused: sweep + α-fold + Z_H division + coset iDFT + chunk slicing."""
    F = config.field
    hf = config.host_field
    D = config.extension_params.degree
    engine = get_engine(F)
    n = 1 << log_n
    qmat = _quotient_sweep_only(config, circuit, log_n, q, mats, selectors, pubs, alpha_d)
    shift = hf.mul(hf.generator, 1)
    coeffs = engine.icoset_from_natural(qmat, log_n + (q.bit_length() - 1), shift)
    rows = []
    for i in range(q):
        for d in range(D):
            rows.append(jax.tree.map(lambda p: p[d, i * n : (i + 1) * n], coeffs))
    return tuple(jnp.stack([r[p] for r in rows], axis=0) for p in range(F.num_planes))


def _quotient_sweep_only(config, circuit, log_n, q, mats, selectors, pubs, alpha_d):
    """The constraint sweep + α-fold + Z_H division on the quotient domain,
    returning the (D, m) composition planes (natural order)."""
    F, E = config.field, config.ext
    hf = config.host_field
    ep = config.extension_params
    D = ep.degree
    n = 1 << log_n
    m = n * q
    roll = q  # next-row step on the quotient domain (g_n = G_m^q)

    def var_provider(source, col, offset):
        mat = mats[source]
        colv = jax.tree.map(lambda p: p[col], mat)
        if offset == 1:
            colv = jax.tree.map(lambda p: jnp.roll(p, -roll), colv)
        return colv

    def publics(idx):
        return pubs[idx // D][idx % D]

    alg = DeviceAlgebra(F, var_provider, publics, selectors)
    buf = sweep(circuit.graph, alg)
    user_vals = constraint_values(circuit.graph, buf)
    lvals = graph_lookup_values(circuit.graph, buf)
    logup_vals = lk.logup_constraint_values(
        alg,
        ep,
        hf,
        circuit.num_lookups,
        lambda col, off: var_provider(Source.STAGE2.value, col, off),
        lvals,
        selectors["last"],
        pubs,
        log_n,
    )
    values = list(user_vals)
    for lv in logup_vals:
        values.extend(lv)
    assert len(values) == circuit.constraint_count

    # α-fold: value i gets α^(K-1-i) — Horner order on the verifier side.
    # Powers via lax.scan: an unrolled mul chain would blow up backend
    # codegen time (see fields.device._pow_const).
    K = len(values)
    one = tuple(F.const(1 if d == 0 else 0, ()) for d in range(D))

    def pow_body(acc, _):
        return E.mul(acc, alpha_d), acc

    _, apow_stack = jax.lax.scan(pow_body, one, None, length=K)
    apows = [
        tuple(tuple(pl[i] for pl in coord) for coord in apow_stack) for i in range(K)
    ]
    coords = [F.const(0, ()) for _ in range(D)]
    for i, v in enumerate(values):
        ap = apows[K - 1 - i]
        v = jax.tree.map(lambda p: jnp.broadcast_to(p, (m,)), v)
        for d in range(D):
            coords[d] = F.add(coords[d], F.mul(v, ap[d]))
    coords = [F.mul(c, selectors["inv_vanishing"]) for c in coords]
    return tuple(
        jnp.stack([coords[d][p] for d in range(D)], axis=0) for p in range(F.num_planes)
    )
