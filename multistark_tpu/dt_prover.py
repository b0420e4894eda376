"""Whole-prove device transcript (VERDICT r4 task 2).

The standard prover (prover.prove_multiple_claims) interleaves device
stages with a HOST Fiat-Shamir challenger: every commit/sample boundary
forces a blocking device→host fetch (~90-110 ms each through the axon
tunnel — the dominant cost of the warm prove at small/medium sizes,
BASELINE.md round-4 characterization: ~7 sync points ≈ 0.6 s floor).

This module runs the ENTIRE transcript on device via
device_transcript.DeviceDuplex: stage caps, stage-2 accumulators, and
claimed evaluations are absorbed into a device blake3 duplex; β γ α ζ and
the FRI batching challenge are squeezed on device and flow into the stage
kernels as device scalars.  The prove then blocks exactly TWICE: one
global sync before the query phase (caps + accumulators + claimed values +
duplex draws + FRI commit-phase artifacts together) and the query-phase
gather fetch.

Correctness contract (same as the FRI-phase device transcript,
pcs._commit_phase_device): after the sync, the HOST challenger replays the
full byte transcript from the fetched values and every device draw is
compared against the authoritative host draw.  Any divergence — a ≥p
rejection-sampling draw (~2^-32/draw), a grind miss — returns None and the
caller reruns the standard host-transcript prove, so proof bytes are
bit-identical to the host path whenever both succeed, and always valid.

Scope: the production Goldilocks/Blake3 config with the default transcript
profile, single-device jitted execution, fused-commit-eligible shapes,
homogeneous (rectangular) claims.  Everything else falls back.

Transcript schedule mirrored from prover.prove_multiple_claims /
reference src/prover.rs:289-603.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import lookup as lk
from .challenger import SerializingChallenger64, _canonical_claims_array
from .challenger import observe_claims as _observe_claims_host
from .device_transcript import DeviceDuplex, u64_of_pair
from .profiling import span
from .utils import cached_jit, ext_pack_device


def _env_on(name: str, default: str = "1") -> bool:
    import os

    return os.environ.get(name, default) not in ("0", "false", "off")


def eligible(config, challenger_probe=None) -> bool:
    from . import parallel
    from .config import DEFAULT_TRANSCRIPT_PROFILE
    from .device_transcript import GOLDILOCKS_P
    from .merkle import Blake3FieldHasher
    from .utils import jit_enabled

    if not _env_on("MULTISTARK_WHOLE_DT"):
        return False
    if not jit_enabled() or parallel.current_mesh() is not None:
        return False
    if config.transcript_profile != DEFAULT_TRANSCRIPT_PROFILE:
        return False
    ch = challenger_probe or config.initialise_challenger()
    return (
        isinstance(ch, SerializingChallenger64)
        and isinstance(config.pcs.mmcs.hasher, Blake3FieldHasher)
        and config.host_field.p == GOLDILOCKS_P
        and config.ext.D == 2
    )


def _cap_np_bytes(cap: np.ndarray) -> bytes:
    """Host cap (k, 8) uint32 -> observe_commitment byte stream."""
    return np.ascontiguousarray(np.atleast_2d(cap).astype("<u4")).tobytes()


def _observe_claims_dd(dd: DeviceDuplex, claims, p: int):
    """DeviceDuplex mirror of SerializingChallenger64.observe_claims;
    returns the canonical (n, L) array (None for empty claims; raises
    _Fallback for ragged claims — the host path handles those)."""
    dd.observe_u64(len(claims))
    if len(claims) == 0:
        return None
    arr = _canonical_claims_array(claims, p)
    if arr is None:
        # small/ragged: observe generically; rectangularize if possible
        lens = {len(c) for c in claims}
        for claim in claims:
            dd.observe_u64(len(claim))
            for v in claim:
                dd.observe_u64(int(v) % p)
        if len(lens) != 1:
            raise _Fallback("ragged claims")
        return np.asarray(
            [[int(v) % p for v in c] for c in claims], np.uint64
        )
    buf = np.empty((arr.shape[0], arr.shape[1] + 1), dtype="<u8")
    buf[:, 0] = arr.shape[1]
    buf[:, 1:] = arr
    dd.observe_bytes(buf.tobytes())
    return arr


class _Fallback(Exception):
    pass


def _zps_kern(E, F, spec):
    """ONE program turning the device ζ into every matrix's packed opening
    points: spec = per-matrix tuples of ('z',) | ('zg', g) (g = the trace
    domain's generator for the ζ·g point).  Returns (k, D)-plane packs in
    matrix order, consumed by both the eval and the ro kernels."""
    from multistark_tpu.utils import _ext_pack_device_impl

    def mk(_spec=spec):
        def f(zeta):
            packs = []
            for mat_spec in _spec:
                pts = []
                for p in mat_spec:
                    if p[0] == "z":
                        pts.append(zeta)
                    else:
                        pts.append(E.scale(zeta, F.const(p[1], ())))
                packs.append(_ext_pack_device_impl(E, pts))
            return tuple(packs)

        return f

    return cached_jit((E.name, "dt_zps", spec), mk)


def _obs_words_kern(E, sig):
    """ONE program flattening every matrix/point's claimed values into the
    duplex observation byte order (per matrix, per point, per column, per
    coordinate, u64 LE) — a single flat u32 word vector."""

    def mk(_sig=sig):
        def f(outs):
            D = E.D
            parts = []
            for mat_out, (w, ln, k) in zip(outs, _sig):
                for p_idx in range(k):
                    vals = mat_out[p_idx]  # coords tuple of base (w,) values
                    los = jnp.stack([jnp.asarray(vals[d][0]) for d in range(D)], axis=1)
                    his = jnp.stack([jnp.asarray(vals[d][1]) for d in range(D)], axis=1)
                    parts.append(jnp.stack([los, his], axis=2).reshape(-1))
            return jnp.concatenate(parts)

        return f

    return cached_jit((E.name, "dt_obs_words", sig), mk)


def _reduced_openings_dt(pcs, rounds, dev_vals, alpha_d, zpack_by_rm):
    """pcs._reduced_openings with a DEVICE α: the per-matrix α-power
    matrices and packed (points ‖ −α^off) scalars come from ONE device
    program (reusing the zps packs built for the eval kernel); the merged
    ro kernel itself is byte-identical to the host path's (same cache
    key)."""
    E, F = pcs.E, pcs.F
    D = E.D
    merged = []
    offsets = {}
    for r_idx, (data, points_list) in enumerate(rounds):
        for m_idx, points in enumerate(points_list):
            if not points:
                continue
            w = data.mmcs_data.dims[m_idx][0]
            log_lde = data.log_trace_heights[m_idx] + pcs.log_blowup
            off = offsets.get(log_lde, 0)
            aoff_exps = tuple(off + k * w for k in range(len(points)))
            merged.append(
                (data.mmcs_data.mats[m_idx], dev_vals[r_idx][m_idx], points,
                 w, log_lde, aoff_exps, zpack_by_rm[(r_idx, m_idx)])
            )
            offsets[log_lde] = off + w * len(points)
    if not merged:
        return {}
    sig_sc = tuple((e[3], len(e[2]), e[4], e[5]) for e in merged)
    K_max = max(
        max(e[3] for e in merged), max(max(e[5]) for e in merged) + 1
    )

    def mk_scalars(_sig=sig_sc, _K=K_max):
        def f(alpha_pk, pts_pks):
            from .utils import ext_unpack

            alpha = ext_unpack(E, alpha_pk, 0)
            one = tuple(F.const(1 if d == 0 else 0, ()) for d in range(D))

            def pow_body(acc, _):
                return E.mul(acc, alpha), acc

            _, st = jax.lax.scan(pow_body, one, None, length=_K)
            # st: coords tuple of plane tuples, leaves shape (K,)
            apds, zps = [], []
            for (w, k, ll, aexps), pts_pk in zip(_sig, pts_pks):
                apd = tuple(
                    jnp.stack([st[d][p][:w] for d in range(D)], axis=1)
                    for p in range(F.num_planes)
                )  # (w, D) per plane
                aoff_scalars = [
                    E.neg(tuple(tuple(st[d][p][e] for p in range(F.num_planes))
                                for d in range(D)))
                    for e in aexps
                ]
                aoff_rows = tuple(
                    jnp.stack([
                        jnp.stack([v[d][p] for d in range(D)])
                        for v in aoff_scalars
                    ])
                    for p in range(F.num_planes)
                )  # (k, D) per plane
                zp = tuple(
                    jnp.concatenate([pts_pk[p], aoff_rows[p]], axis=0)
                    for p in range(F.num_planes)
                )
                apds.append(apd)
                zps.append(zp)
            return tuple(apds), tuple(zps)

        return f

    kern_sc = cached_jit((E.name, "dt_ro_scalars", sig_sc), mk_scalars)
    apds, zps = kern_sc(
        ext_pack_device(E, (alpha_d,)), tuple(e[6] for e in merged)
    )

    sig_ro = tuple((e[3], len(e[2]), e[4]) for e in merged)
    out_heights = sorted({e[4] for e in merged}, reverse=True)
    kern_ro = pcs._ro_all_kern(sig_ro, out_heights)
    outs = kern_ro(
        tuple(e[0] for e in merged), tuple(e[1] for e in merged), apds, zps
    )
    return dict(zip(out_heights, outs))


def _fri_schedule(pcs, ro_heights, log_max_ro):
    log_final = pcs.log_blowup + pcs.fri.log_final_poly_len
    schedule: List[int] = []
    ls = log_max_ro
    while ls > log_final:
        a_bits = min(pcs.fri.max_log_arity, ls - log_final)
        for h in ro_heights:
            if ls - a_bits < h < ls:
                a_bits = ls - h
        schedule.append(a_bits)
        ls -= a_bits
    return schedule


def _fetch_ext(v) -> tuple:
    """Fetched device ext scalar (coords of (lo, hi) planes) -> host tuple."""
    return tuple(u64_of_pair(int(np.asarray(c[0])), int(np.asarray(c[1]))) for c in v)


def prove_device_transcript(system, key, witness, claims) -> Optional[object]:
    """The whole-prove device-transcript path; returns a Proof bit-identical
    to prover.prove_multiple_claims' or None (caller falls back).

    ANY failure — an expected _Fallback (ineligible shape, rejection draw,
    replay divergence) or an unexpected exception — falls back to the host
    path: the DT path is a pure acceleration, never a correctness
    dependency.  Unexpected exceptions are reported to stderr (and re-raised
    under MULTISTARK_DT_STRICT=1, which tests set)."""
    import os
    import sys
    import traceback

    try:
        return _prove_dt(system, key, witness, claims)
    except _Fallback:
        return None
    except Exception:  # noqa: BLE001 — acceleration path, host path is authoritative
        if os.environ.get("MULTISTARK_DT_STRICT"):
            raise
        print(
            "multistark: device-transcript prove failed, falling back to the "
            "host transcript:\n" + traceback.format_exc(limit=5),
            file=sys.stderr,
        )
        # The handled exception's traceback <-> frame cycle keeps every
        # device array local to _prove_dt alive until a cyclic GC pass; on
        # a RESOURCE_EXHAUSTED failure that stranded memory would starve
        # the host-transcript fallback (observed at 2^20).  Collect now so
        # the fallback starts from a clean device heap.
        import gc

        gc.collect()
        return None


def _prove_dt(system, key, witness, claims):
    from .prover import Commitments, Proof, _quotient_packed_path, _selectors_device
    from .domains import TwoAdicCoset
    from .expr import Source

    config = system.config
    F, E = config.field, config.ext
    hf, he = config.host_field, config.host_ext
    pcs = config.pcs
    D = E.D

    with span("stark/prove"):
        dd = DeviceDuplex()
        ch_seed = config.initialise_challenger()
        dd.observe_bytes(bytes(ch_seed.inner.input_buffer))
        system.observe_shape(dd)

        active = [h > 0 for h in witness.heights]
        assert any(active), "at least one circuit must be active"
        for b in active:
            dd.observe_bytes(bytes([1 if b else 0]))
        active_idx = [i for i, b in enumerate(active) if b]
        log_degrees = [witness.heights[i].bit_length() - 1 for i in active_idx]

        # STAGE-1 COMMIT (device cap)
        with span("stark/stage1_commit"):
            s1_pairs = [
                (pcs.natural_domain_for_degree(witness.heights[i]), witness.traces[i])
                for i in active_idx
            ]
            out = pcs.commit_device(s1_pairs)
            if out is None:
                raise _Fallback("stage-1 commit not fused-eligible")
            s1_cap_dev, s1_data = out

        if system.preprocessed_commit is not None:
            dd.observe_bytes(_cap_np_bytes(system.preprocessed_commit))
        dd.observe_cap_device(s1_cap_dev)
        for ld in log_degrees:
            dd.observe_bytes(bytes([ld]))
        claims_arr = _observe_claims_dd(dd, claims, hf.p)

        beta_d = dd.sample_ext(D)
        gamma_d = dd.sample_ext(D)
        if claims_arr is None:
            acc0_d = E.zeros(())
        else:
            acc0_d = lk.claims_accumulator_device(F, E, claims_arr, beta_d, gamma_d)

        # STAGE-2 (device β γ acc₀)
        with span("stark/lookup_construction"):
            lvs = [witness.lookup_values[i] for i in active_idx]
            s2_mats, accs_dev = lk.stage_2_traces_device(
                F, E, lvs, beta_d, gamma_d, acc0_d
            )
        with span("stark/stage2_commit"):
            s2_pairs = [
                (pcs.natural_domain_for_degree(witness.heights[i]), m)
                for i, m in zip(active_idx, s2_mats)
            ]
            out = pcs.commit_device(s2_pairs)
            if out is None:
                raise _Fallback("stage-2 commit not fused-eligible")
            s2_cap_dev, s2_data = out
        dd.observe_cap_device(s2_cap_dev)
        for a in accs_dev:
            dd.observe_ext_device(a)

        alpha_d = dd.sample_ext(D)

        # QUOTIENT (device scalars through the same cached kernels)
        with span("stark/quotient"):
            chunk_mats = []
            for k_ord, i in enumerate(active_idx):
                circuit = system.circuits[i]
                n = witness.heights[i]
                log_n = n.bit_length() - 1
                q = circuit.quotient_degree
                trace_dom = TwoAdicCoset(hf, log_n, 1)
                qdom = trace_dom.create_disjoint_domain(n * q)
                raw = {
                    Source.MAIN.value: s1_data.mmcs_data.mats[k_ord],
                    Source.STAGE2.value: s2_data.mmcs_data.mats[k_ord],
                }
                p_idx = system.preprocessed_index[i]
                if p_idx is not None:
                    raw[Source.PREPROCESSED.value] = (
                        key.preprocessed_data.mmcs_data.mats[p_idx]
                    )
                selectors = _selectors_device(config, trace_dom, qdom, log_n, q)
                acc_prev_d = acc0_d if k_ord == 0 else accs_dev[k_ord - 1]
                packed = ext_pack_device(
                    E, (beta_d, gamma_d, acc_prev_d, accs_dev[k_ord], alpha_d)
                )
                chunk_mats.append(
                    _quotient_packed_path(
                        config, circuit, log_n, q, raw, selectors, packed
                    )
                )
            out = pcs.commit_from_coeffs_device(chunk_mats)
            if out is None:
                raise _Fallback("quotient commit not fused-eligible")
            q_cap_dev, q_data = out
        dd.observe_cap_device(q_cap_dev)

        zeta_d = dd.sample_ext(D)

        # opening rounds with POINT SPECS (prover.rs:539-580 structure);
        # the device ζ / ζ·g values only materialize inside the zps kernel
        def _two_pt_spec(c_idx):
            log_n = witness.heights[c_idx].bit_length() - 1
            return (("z",), ("zg", hf.two_adic_generator(log_n)))

        rounds = []
        if key.preprocessed_data is not None:
            pre_points = []
            for c_idx, p_idx in enumerate(system.preprocessed_index):
                if p_idx is None:
                    continue
                pre_points.append(_two_pt_spec(c_idx) if active[c_idx] else ())
            rounds.append((key.preprocessed_data, pre_points))
        two_pt = [_two_pt_spec(i) for i in active_idx]
        rounds.append((s1_data, two_pt))
        rounds.append((s2_data, list(two_pt)))
        rounds.append((q_data, [(("z",),) for _ in active_idx]))

        # -- open: claimed evaluations (device z packs, observed into dd)
        with span("stark/fri_open"):
            with span("stark/fri_open/eval"):
                merged_ev, dev_vals = [], []
                for data, points_list in rounds:
                    round_dev: List[object] = []
                    for m_idx, points in enumerate(points_list):
                        if not points:
                            round_dev.append(None)
                            continue
                        merged_ev.append((
                            len(dev_vals), len(round_dev),
                            data.mmcs_data.mats[m_idx], points,
                            data.mmcs_data.dims[m_idx][0],
                            data.log_trace_heights[m_idx],
                        ))
                        round_dev.append(None)
                    dev_vals.append(round_dev)
                sig_ev = tuple((w, ln, len(pts)) for _, _, _, pts, w, ln in merged_ev)
                zspec = tuple(pts for _, _, _, pts, _, _ in merged_ev)
                zpacks = _zps_kern(E, F, zspec)(zeta_d)
                outs = pcs._eval_all_kern(sig_ev)(
                    tuple(m for _, _, m, _, _, _ in merged_ev), zpacks
                )
                for (ri, mi, *_), out_v in zip(merged_ev, outs):
                    dev_vals[ri][mi] = out_v
                # observe all claimed values in host replay order (one
                # flattening program + one duplex segment)
                dd.observe_words_device(_obs_words_kern(E, sig_ev)(outs))

            alpha_fri_d = dd.sample_ext(D)

            with span("stark/fri_open/ro"):
                zpack_by_rm = {
                    (ri, mi): zp for (ri, mi, *_), zp in zip(merged_ev, zpacks)
                }
                ro = _reduced_openings_dt(
                    pcs, rounds, dev_vals, alpha_fri_d, zpack_by_rm
                )
            if not ro:
                raise _Fallback("no reduced openings")
            log_max = max(data.log_max_lde for data, _ in rounds)
            log_max_ro = max(ro.keys())
            schedule = _fri_schedule(pcs, ro.keys(), log_max_ro)
            if not schedule:
                raise _Fallback("degenerate FRI (no folds)")

            with span("stark/fri_open/fold"):
                entry = dd.entry_words()
                if entry is None:
                    raise _Fallback("unaligned duplex buffer at FRI entry")
                (
                    caps_dev, ws_dev, betas_dev, oks_dev, commit_datas,
                    current, log_size,
                ) = pcs._commit_phase_device_core(ro, schedule, log_max_ro, entry)

            # ---- THE single global sync ------------------------------------
            fetched = jax.device_get({
                "s1cap": s1_cap_dev, "s2cap": s2_cap_dev, "qcap": q_cap_dev,
                "accs": accs_dev, "vals": dev_vals,
                "beta": beta_d, "gamma": gamma_d, "alpha": alpha_d,
                "zeta": zeta_d, "alpha_fri": alpha_fri_d,
                "valid": tuple(dd.valids),  # ANDed on host (no eager chain)
                "fri": (caps_dev, ws_dev, betas_dev, oks_dev),
            })
            if not all(bool(v) for v in fetched["valid"]):
                raise _Fallback("rejection-sampling draw on device")

            # ---- authoritative host replay ---------------------------------
            opened, accs_host, caps_np = _replay_host(
                system, key, witness, claims, active, log_degrees, fetched,
                rounds, schedule, pcs,
            )
            if opened is None:
                raise _Fallback("host replay divergence")
            (opened_vals, ch) = opened

            caps_fri_np, ws_np, betas_np, oks_np = fetched["fri"]
            replay = pcs.replay_commit_phase_host(
                ch, schedule, caps_fri_np, ws_np, betas_np, oks_np
            )
            if replay is None:
                raise _Fallback("FRI replay divergence")
            fri_caps, commit_pows = replay

            final_poly, query_pow, indices = pcs._commit_tail(
                current, log_size, log_max_ro, log_max, ch
            )
            with span("stark/fri_open/queries"):
                query_proofs = pcs._query_phase(
                    rounds, commit_datas, indices, schedule, log_max, log_max_ro
                )

        from .pcs import FriProof

        fri_proof = FriProof(
            commit_caps=fri_caps,
            commit_pow_witnesses=commit_pows,
            final_poly=final_poly,
            query_pow_witness=query_pow,
            query_proofs=query_proofs,
        )
        r = 0
        if key.preprocessed_data is not None:
            pre_opened = opened_vals[r]
            r += 1
        else:
            pre_opened = []
        s1_opened, s2_opened, q_opened = (
            opened_vals[r], opened_vals[r + 1], opened_vals[r + 2]
        )
        return Proof(
            active=active,
            commitments=Commitments(caps_np["s1"], caps_np["s2"], caps_np["q"]),
            intermediate_accumulators=accs_host,
            log_degrees=log_degrees,
            preprocessed_opened=pre_opened,
            stage1_opened=s1_opened,
            stage2_opened=s2_opened,
            quotient_opened=q_opened,
            fri_proof=fri_proof,
        )


def _replay_host(
    system, key, witness, claims, active, log_degrees, fetched, rounds,
    schedule, pcs,
):
    """Replay the byte transcript on the host challenger from the fetched
    values; compare every device draw.  Returns ((opened_vals, challenger),
    accs_host, caps_np) or (None, None, None)."""
    config = system.config
    he = config.host_ext

    def cap_np(v):
        return np.ascontiguousarray(np.asarray(v).T)

    caps = {
        "s1": cap_np(fetched["s1cap"]),
        "s2": cap_np(fetched["s2cap"]),
        "q": cap_np(fetched["qcap"]),
    }
    accs_host = [_fetch_ext(a) for a in fetched["accs"]]

    ch = config.initialise_challenger()
    system.observe_shape(ch)
    for b in active:
        ch.observe_bytes(bytes([1 if b else 0]))
    if system.preprocessed_commit is not None:
        ch.observe_commitment(system.preprocessed_commit)
    ch.observe_commitment(caps["s1"])
    for ld in log_degrees:
        ch.observe_bytes(bytes([ld]))
    _observe_claims_host(ch, claims)
    if ch.sample_ext() != _fetch_ext(fetched["beta"]):
        return None, None, None
    if ch.sample_ext() != _fetch_ext(fetched["gamma"]):
        return None, None, None
    ch.observe_commitment(caps["s2"])
    for a in accs_host:
        ch.observe_ext(a)
    if ch.sample_ext() != _fetch_ext(fetched["alpha"]):
        return None, None, None
    ch.observe_commitment(caps["q"])
    if ch.sample_ext() != _fetch_ext(fetched["zeta"]):
        return None, None, None

    # claimed evaluations -> host tuples, observed in the same order
    opened_vals = []
    for round_host, (data, points_list) in zip(fetched["vals"], rounds):
        round_vals = []
        for m_idx, points in enumerate(points_list):
            if not points:
                round_vals.append([])
                continue
            mat_vals = []
            for p_idx in range(len(points)):
                coords = round_host[m_idx][p_idx]  # D base values of (w,)
                arr = np.stack(
                    [pcs._host_coord_to_u64(c) for c in coords], axis=-1
                )  # (w, D)
                vals = [tuple(int(c) for c in row) for row in arr]
                for v in vals:
                    ch.observe_ext(v)
                mat_vals.append(vals)
            round_vals.append(mat_vals)
        opened_vals.append(round_vals)
    if ch.sample_ext() != _fetch_ext(fetched["alpha_fri"]):
        return None, None, None
    return (opened_vals, ch), accs_host, caps
