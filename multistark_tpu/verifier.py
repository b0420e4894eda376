"""Verifier (reference src/verifier.rs:196-695).

Five steps: shape validation, channel-balance check (last intermediate
accumulator must be ZERO), Fiat-Shamir replay identical to the prover, PCS
verification, and the per-circuit out-of-domain consistency check

    composition(ζ) · Z_H(ζ)^{-1}  ==  Q(ζ) = Σ ζ^{i·n} · c_i(ζ)

All host-side Python — verification is O(queries · log n) and transcript-
bound, so there is nothing to batch on device.

Soundness sketch (the reference's union bound, src/verifier.rs:36-160):
for k constraints per circuit, extension degree D, N circuits and challenge
field F_ext,   ε ≤ ε_FRI + (k - 1 + D + N) / |F_ext| :
  - α-batching the k constraint quotients loses (k-1)/|F_ext|;
  - the logUp argument loses D/|F_ext| per (β, γ) pair via the usual
    multiset-fingerprint argument, plus one accumulator-telescoping term
    per circuit (N/|F_ext| in total);
  - ε_FRI is the standard two-adic FRI soundness at rate 2^-log_blowup with
    `num_queries` queries and the configured grinding bits (conjectured
    ~2^-100 at B=4, Q=100, PoW 10+10 for Goldilocks's ~2^128 extension).
Sparse activation is sound because the bitmap is observed before any
commitment and deactivated circuits contribute no lookup terms — a needed
circuit's absence unbalances the channel sum, which the final-accumulator
zero check catches (reference verifier.rs:135-153)."""

from __future__ import annotations

from typing import List, Sequence, Tuple

from . import lookup as lk
from .challenger import observe_claims as _observe_claims
from .domains import TwoAdicCoset
from .errors import VerificationError, ensure
from .evaluator import HostExtAlgebra, constraint_values, lookup_values as graph_lookup_values, sweep
from .expr import Source
from .prover import Proof
from .system import System

ExtVal = Tuple[int, ...]


def verify(system: System, proof: Proof, claims=None) -> None:
    verify_multiple_claims(system, [] if claims is None else [claims], proof)


def verify_multiple_claims(system: System, claims: Sequence[Sequence[int]], proof: Proof) -> None:
    config = system.config
    hf, he = config.host_field, config.host_ext
    pcs = config.pcs
    D = config.extension_params.degree

    verify_shape(system, proof)

    # the global accumulator chain must close (reference verifier.rs:242-246)
    ensure(
        he.is_zero(proof.intermediate_accumulators[-1]),
        "UnbalancedChannel",
        "final accumulator nonzero",
    )

    # --- Fiat-Shamir replay (reference verifier.rs:254-326) ---------------
    ch = config.initialise_challenger()
    system.observe_shape(ch)
    for b in proof.active:
        ch.observe_bytes(bytes([1 if b else 0]))
    active_idx = [i for i, b in enumerate(proof.active) if b]
    if system.preprocessed_commit is not None:
        ch.observe_commitment(system.preprocessed_commit)
    ch.observe_commitment(proof.commitments.stage_1_trace)
    for ld in proof.log_degrees:
        ch.observe_bytes(bytes([ld]))
    _observe_claims(ch, claims)
    beta = ch.sample_ext()
    gamma = ch.sample_ext()
    acc0 = lk.claims_accumulator(he, beta, gamma, claims)
    ch.observe_commitment(proof.commitments.stage_2_trace)
    for a in proof.intermediate_accumulators:
        ch.observe_ext(a)
    alpha = ch.sample_ext()
    ch.observe_commitment(proof.commitments.quotient_chunks)
    zeta = ch.sample_ext()

    # --- rebuild opening rounds (reference verifier.rs:329-408) -----------
    rounds = []
    if system.preprocessed_commit is not None:
        pre_mats = []
        p_ord = 0
        for c_idx, p_idx in enumerate(system.preprocessed_index):
            if p_idx is None:
                continue
            ph, pw = system.circuits[c_idx].preprocessed_dims
            log_h = ph.bit_length() - 1
            if proof.active[c_idx]:
                k = active_idx.index(c_idx)
                g = hf.two_adic_generator(proof.log_degrees[k])
                zg = he.scale(zeta, g)
                pts = [
                    (zeta, proof.preprocessed_opened[p_ord][0]),
                    (zg, proof.preprocessed_opened[p_ord][1]),
                ]
            else:
                pts = []
            pre_mats.append((log_h, pw, pts))
            p_ord += 1
        rounds.append((system.preprocessed_commit, pre_mats))

    s1_mats, s2_mats, q_mats = [], [], []
    for k, i in enumerate(active_idx):
        circuit = system.circuits[i]
        log_n = proof.log_degrees[k]
        g = hf.two_adic_generator(log_n)
        zg = he.scale(zeta, g)
        s1_mats.append(
            (log_n, circuit.main_width,
             [(zeta, proof.stage1_opened[k][0]), (zg, proof.stage1_opened[k][1])])
        )
        s2_mats.append(
            (log_n, circuit.stage2_width,
             [(zeta, proof.stage2_opened[k][0]), (zg, proof.stage2_opened[k][1])])
        )
        q_mats.append(
            (log_n, circuit.quotient_degree * D, [(zeta, proof.quotient_opened[k][0])])
        )
    rounds.append((proof.commitments.stage_1_trace, s1_mats))
    rounds.append((proof.commitments.stage_2_trace, s2_mats))
    rounds.append((proof.commitments.quotient_chunks, q_mats))

    pcs.verify(rounds, proof.fri_proof, ch)

    # --- per-circuit OOD check (reference verifier.rs:421-530) ------------
    acc_prev = acc0
    for k, i in enumerate(active_idx):
        circuit = system.circuits[i]
        log_n = proof.log_degrees[k]
        n = 1 << log_n
        dom = TwoAdicCoset(hf, log_n, 1)
        sel = dom.selectors_at_point(he, zeta)
        acc_final = proof.intermediate_accumulators[k]
        publics_flat = [
            he.from_base(c) for v in (beta, gamma, acc_prev, acc_final) for c in v
        ]
        p_ord = _preprocessed_ordinal(system, i)

        def var_provider(source, col, offset):
            if source == Source.MAIN.value:
                return proof.stage1_opened[k][offset][col]
            if source == Source.STAGE2.value:
                return proof.stage2_opened[k][offset][col]
            ensure(p_ord is not None, "InvalidProofShape", "preprocessed var without trace")
            return proof.preprocessed_opened[p_ord][offset][col]

        alg = HostExtAlgebra(he, var_provider, publics_flat, sel)
        buf = sweep(circuit.graph, alg)
        user_vals = constraint_values(circuit.graph, buf)
        lvals = graph_lookup_values(circuit.graph, buf)
        pubs_emb = tuple(
            tuple(he.from_base(c) for c in v)
            for v in (beta, gamma, acc_prev, acc_final)
        )
        logup_vals = lk.logup_constraint_values(
            alg,
            config.extension_params,
            hf,
            circuit.num_lookups,
            lambda col, off: var_provider(Source.STAGE2.value, col, off),
            lvals,
            sel.is_last_row,
            pubs_emb,
            log_n,
        )
        values = list(user_vals)
        for lv in logup_vals:
            values.extend(lv)

        # α-fold by Horner (reference verifier.rs:498-502)
        folded = he.zero
        for v in values:
            folded = he.add(he.mul(folded, alpha), v)

        # Q(ζ) = Σ ζ^{i·n}·c_i(ζ) (reference verifier.rs:507-514)
        q_row = proof.quotient_opened[k][0]
        zn = he.pow(zeta, n)
        quotient = he.zero
        for ci in range(circuit.quotient_degree - 1, -1, -1):
            c_val = he.zero
            for d in range(D):
                basis = tuple(1 if e == d else 0 for e in range(D))
                c_val = he.add(c_val, he.mul(basis, q_row[ci * D + d]))
            quotient = he.add(he.mul(quotient, zn), c_val)

        ensure(
            he.mul(folded, sel.inv_vanishing) == quotient,
            "OodEvaluationMismatch",
            f"circuit {i}",
        )
        acc_prev = acc_final


def _preprocessed_ordinal(system: System, c_idx: int):
    """Position of circuit c_idx's preprocessed matrix within the
    preprocessed commitment (= its pcs index)."""
    return system.preprocessed_index[c_idx]


def verify_shape(system: System, proof: Proof) -> None:
    """Structural validation before any crypto (reference
    src/verifier.rs:536-695)."""
    config = system.config
    hf = config.host_field
    D = config.extension_params.degree
    p = hf.p

    ensure(len(proof.active) == len(system.circuits), "InvalidProofShape", "bitmap length")
    ensure(any(proof.active), "InvalidProofShape", "no active circuits")
    active_idx = [i for i, b in enumerate(proof.active) if b]
    n_active = len(active_idx)
    ensure(len(proof.log_degrees) == n_active, "InvalidProofShape", "log_degrees length")
    ensure(
        len(proof.intermediate_accumulators) == n_active,
        "InvalidProofShape",
        "accumulator count",
    )
    for a in proof.intermediate_accumulators:
        _check_ext(a, D, p)

    for k, i in enumerate(active_idx):
        circuit = system.circuits[i]
        log_n = proof.log_degrees[k]
        ensure(0 <= log_n, "InvalidProofShape", "negative log degree")
        # shift-overflow guard on adversarial proofs (verifier.rs:656-667)
        q_bits = circuit.quotient_degree.bit_length() - 1
        ensure(
            log_n + q_bits <= config.max_log_degree(),
            "InvalidProofShape",
            f"log_degree {log_n} + log_quotient {q_bits} exceeds max "
            f"{config.max_log_degree()}",
        )
        if circuit.preprocessed_dims is not None:
            ph, _ = circuit.preprocessed_dims
            ensure(
                1 << log_n == ph,
                "InvalidProofShape",
                "main height != preprocessed height",
            )

    ensure(len(proof.stage1_opened) == n_active, "InvalidProofShape", "stage1 count")
    ensure(len(proof.stage2_opened) == n_active, "InvalidProofShape", "stage2 count")
    ensure(len(proof.quotient_opened) == n_active, "InvalidProofShape", "quotient count")
    for k, i in enumerate(active_idx):
        circuit = system.circuits[i]
        _check_opened(proof.stage1_opened[k], 2, circuit.main_width, D, p)
        _check_opened(proof.stage2_opened[k], 2, circuit.stage2_width, D, p)
        _check_opened(proof.quotient_opened[k], 1, circuit.quotient_degree * D, D, p)

    n_pre = sum(1 for x in system.preprocessed_index if x is not None)
    ensure(
        len(proof.preprocessed_opened) == n_pre, "InvalidProofShape", "preprocessed count"
    )
    p_ord = 0
    for c_idx, p_idx in enumerate(system.preprocessed_index):
        if p_idx is None:
            continue
        _, pw = system.circuits[c_idx].preprocessed_dims
        expected_pts = 2 if proof.active[c_idx] else 0
        _check_opened(proof.preprocessed_opened[p_ord], expected_pts, pw, D, p)
        p_ord += 1


def _check_opened(mat_vals, n_points: int, width: int, D: int, p: int) -> None:
    ensure(len(mat_vals) == n_points, "InvalidProofShape", "point count")
    for pt in mat_vals:
        ensure(len(pt) == width, "InvalidProofShape", "opened width")
        for v in pt:
            _check_ext(v, D, p)


def _check_ext(v, D: int, p: int) -> None:
    ensure(
        isinstance(v, tuple) and len(v) == D and all(isinstance(c, int) and 0 <= c < p for c in v),
        "InvalidProofShape",
        "malformed extension value",
    )
