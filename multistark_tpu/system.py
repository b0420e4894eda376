"""System setup + witness (reference src/system.rs).

`System.new` compiles every circuit's constraint graph, derives the shared
publics/stage-2 layout from its lookups, enforces the quotient-degree-vs-
blowup guard, and commits ALL preprocessed traces in one PCS commitment that
is reused across proofs (ProverKey)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import lookup as lk
from .domains import TwoAdicCoset
from .evaluator import DeviceAlgebra, sweep_lookup_prefix
from .expr import Expr, ExtExpr, Lookup, Source
from .graph import ConstraintGraph, compile_graph


@dataclass
class CircuitInputs:
    """What a circuit author provides (reference src/system.rs:29-47)."""

    main_width: int
    constraints: List[Expr]
    ext_constraints: List[ExtExpr]
    lookups: List[Lookup]
    preprocessed: Optional[np.ndarray] = None  # (height, width) u64 row-major


_CIRCUIT_UID = [0]


def _next_circuit_uid() -> int:
    _CIRCUIT_UID[0] += 1
    return _CIRCUIT_UID[0]


@dataclass
class Circuit:
    """Compiled circuit (reference src/system.rs:52-88)."""

    graph: ConstraintGraph
    main_width: int
    stage2_width: int
    num_lookups: int
    preprocessed_dims: Optional[Tuple[int, int]]  # (height, width)
    constraint_count: int
    max_constraint_degree: int
    # stable identity for kernel caches (id() can be recycled after GC)
    uid: int = 0

    def __post_init__(self):
        if self.uid == 0:
            self.uid = _next_circuit_uid()

    @property
    def quotient_degree(self) -> int:
        """next power of two of max(degree, 2) - 1 (reference system.rs:85-88)."""
        d = max(self.max_constraint_degree, 2) - 1
        return 1 << (d - 1).bit_length() if d > 1 else 1


@dataclass
class ProverKey:
    """Setup-time preprocessed commitment, reused across proofs
    (reference src/system.rs:104-107)."""

    preprocessed_data: Optional[object]  # PcsProverData or None
    preprocessed_mats_device: List[object]  # original (w, h) device mats


class System:
    def __init__(self, config, circuits, preprocessed_commit, preprocessed_index):
        self.config = config
        self.circuits: List[Circuit] = circuits
        self.preprocessed_commit = preprocessed_commit  # cap or None
        # circuit idx -> position inside the preprocessed commitment (or None)
        self.preprocessed_index: List[Optional[int]] = preprocessed_index

    # -- setup (reference src/system.rs:115-203) --------------------------
    @staticmethod
    def new(config, inputs: Sequence[CircuitInputs]) -> Tuple["System", ProverKey]:
        hf = config.host_field
        ep = config.extension_params
        circuits = []
        for ci in inputs:
            g = compile_graph(hf.p, ci.constraints, ci.ext_constraints, ci.lookups, ep)
            L = len(ci.lookups)
            user_deg = g.max_constraint_degree
            logup_deg = lk.logup_max_degree(g)
            max_deg = max(user_deg, logup_deg)
            circuit = Circuit(
                graph=g,
                main_width=ci.main_width,
                stage2_width=lk.stage2_width(L, ep.degree),
                num_lookups=L,
                preprocessed_dims=(
                    tuple(ci.preprocessed.shape) if ci.preprocessed is not None else None
                ),
                constraint_count=len(g.zeros) + lk.logup_constraint_count(L, ep.degree),
                max_constraint_degree=max_deg,
            )
            # quotient degree must not exceed the PCS blowup (system.rs:171-178)
            if circuit.quotient_degree > config.max_quotient_degree():
                raise ValueError(
                    f"constraint degree {max_deg} needs quotient degree "
                    f"{circuit.quotient_degree} > max {config.max_quotient_degree()}; "
                    f"raise log_blowup"
                )
            circuits.append(circuit)

        # one commitment over all preprocessed traces (system.rs:180-195)
        F = config.field
        pre_pairs = []
        pre_mats = []
        pre_index: List[Optional[int]] = []
        for ci in inputs:
            if ci.preprocessed is None:
                pre_index.append(None)
                continue
            h, w = ci.preprocessed.shape
            assert h & (h - 1) == 0 and h > 0, "preprocessed height must be a power of two"
            mat = F.from_np(np.asarray(ci.preprocessed, np.uint64).T.copy())  # (w, h)
            dom = config.pcs.natural_domain_for_degree(h)
            pre_index.append(len(pre_pairs))
            pre_pairs.append((dom, mat))
            pre_mats.append(mat)
        if pre_pairs:
            cap, data = config.pcs.commit(pre_pairs)
        else:
            cap, data = None, None
        system = System(config, circuits, cap, pre_index)
        return system, ProverKey(preprocessed_data=data, preprocessed_mats_device=pre_mats)

    # -- ergonomic entry points (reference lib surface, SURVEY.md §1 L7) --
    def prove(self, key, witness, claims=None):
        from .prover import prove_multiple_claims

        return prove_multiple_claims(
            self, key, witness, [] if claims is None else [claims]
        )

    def prove_multiple_claims(self, key, witness, claims):
        from .prover import prove_multiple_claims

        return prove_multiple_claims(self, key, witness, claims)

    def verify(self, proof, claims=None) -> None:
        from .verifier import verify_multiple_claims

        verify_multiple_claims(self, [] if claims is None else [claims], proof)

    def verify_multiple_claims(self, claims, proof) -> None:
        from .verifier import verify_multiple_claims

        verify_multiple_claims(self, claims, proof)

    # -- transcript shape binding (reference src/system.rs:211-222) -------
    def observe_shape(self, challenger) -> None:
        challenger.observe_u64(len(self.circuits))
        for c in self.circuits:
            challenger.observe_u64(c.constraint_count)
            challenger.observe_u64(c.max_constraint_degree)
            ph, pw = c.preprocessed_dims if c.preprocessed_dims else (0, 0)
            challenger.observe_u64(ph)
            challenger.observe_u64(pw)
            challenger.observe_u64(c.main_width)
            challenger.observe_u64(c.stage2_width)


def domain_selector_arrays(hf, log_n: int) -> dict:
    """Unnormalized selector VALUES on the trace domain itself (for witness
    generation): is_first = [n, 0...], is_last = [0..., n·g],
    is_transition = g^r - g^{-1}."""
    n = 1 << log_n
    g = hf.two_adic_generator(log_n)
    first = np.zeros(n, np.uint64)
    first[0] = n % hf.p
    last = np.zeros(n, np.uint64)
    last[-1] = hf.mul(n % hf.p, g)
    g_inv = hf.inv(g)
    trans = np.zeros(n, np.uint64)
    acc = 1
    for r in range(n):
        trans[r] = hf.sub(acc, g_inv)
        acc = hf.mul(acc, g)
    return {"first": first, "last": last, "transition": trans}


@dataclass
class SystemWitness:
    """Stage-1 traces + per-circuit lookup witness (reference
    src/system.rs:244-270)."""

    traces: List[object]  # device mats (w, h), or None for inactive circuits
    heights: List[int]
    lookup_values: List[Optional[lk.LookupValues]]

    @staticmethod
    def from_stage_1(
        traces: Sequence[np.ndarray], system: System, key: ProverKey
    ) -> "SystemWitness":
        config = system.config
        F = config.field
        hf = config.host_field
        dev_traces: List[Optional[object]] = []
        heights: List[int] = []
        lvs: List[Optional[lk.LookupValues]] = []
        for c_idx, (circuit, trace) in enumerate(zip(system.circuits, traces)):
            trace = np.asarray(trace, np.uint64)
            h = trace.shape[0]
            heights.append(h)
            if h == 0:
                dev_traces.append(None)
                lvs.append(None)
                continue
            assert h & (h - 1) == 0, f"trace height {h} not a power of two"
            assert trace.shape[1] == circuit.main_width
            if circuit.preprocessed_dims is not None:
                ph = circuit.preprocessed_dims[0]
                assert ph == h, (
                    f"preprocessed height {ph} != main height {h} "
                    "(reference system.rs:259-265)"
                )
            mat = F.from_np(trace.T.copy())  # (w, h)
            dev_traces.append(mat)
            lvs.append(_compute_lookup_values(system, key, c_idx, mat, h))
        return SystemWitness(traces=dev_traces, heights=heights, lookup_values=lvs)


def _compute_lookup_values(
    system: System, key: ProverKey, c_idx: int, main_mat, height: int
) -> lk.LookupValues:
    """Sweep the lookup prefix over the whole trace at once (the reference's
    per-row loop at system.rs:275-328, vectorized)."""
    from .utils import cached_jit

    config = system.config
    circuit = system.circuits[c_idx]
    F = config.field
    hf = config.host_field
    log_n = height.bit_length() - 1
    pre_idx = system.preprocessed_index[c_idx]
    pre_mat = key.preprocessed_mats_device[pre_idx] if pre_idx is not None else None
    sel_np = domain_selector_arrays(hf, log_n)
    selectors = {k: F.from_np(v) for k, v in sel_np.items()}

    kern = cached_jit(
        ("witness_lookup", circuit.uid, height),
        lambda: lambda main_, pre_, sel_: _lookup_values_kernel(
            F, circuit, height, main_, pre_, sel_
        ),
    )
    mults, args = kern(main_mat, pre_mat, selectors)
    return lk.LookupValues(height=height, mults=list(mults), args=[list(a) for a in args])


def _lookup_values_kernel(F, circuit, height, main_mat, pre_mat, selectors):
    def var_provider(source, col, offset):
        if source == Source.MAIN.value:
            mat = main_mat
        elif source == Source.PREPROCESSED.value:
            assert pre_mat is not None, "circuit has no preprocessed trace"
            mat = pre_mat
        else:
            raise AssertionError("stage2 cannot appear in lookup expressions")
        colv = jax.tree.map(lambda p: p[col], mat)
        if offset == 1:
            colv = jax.tree.map(lambda p: jnp.roll(p, -1), colv)
        return colv

    def publics(_):
        raise AssertionError("publics are not available during witness generation")

    alg = DeviceAlgebra(F, var_provider, publics, selectors)
    buf = sweep_lookup_prefix(circuit.graph, alg)
    mults = []
    args = []
    for m, a in circuit.graph.lookups:
        mults.append(_broadcast(F, buf[m], height))
        args.append(tuple(_broadcast(F, buf[x], height) for x in a))
    return tuple(mults), tuple(args)


def _broadcast(F, v, n: int):
    """Sweep results can be scalar consts; broadcast to (n,)."""
    return jax.tree.map(lambda p: jnp.broadcast_to(p, (n,)), v)
