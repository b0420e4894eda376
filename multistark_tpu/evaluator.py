"""Graph evaluation: one dense forward sweep, generic over the working
algebra (reference src/eval.rs).

The reference's hot loop is an unsafe SIMD-packet interpreter
(eval.rs:75-106); here each node becomes one whole-array XLA op over all
rows at once — JAX traces the Python loop once per circuit and XLA CSE/fuses
the emitted graph (SURVEY.md §7.0).  Three algebras replace the reference's
three working types:

  - device arrays over the base field (witness generation / quotient domain,
    replacing PackedVal)
  - host extension scalars at zeta (verifier OOD check)
  - host base scalars (tests / reference recursive evaluator)
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from .expr import (
    Add,
    Const,
    Expr,
    IsFirstRow,
    IsLastRow,
    IsTransition,
    Mul,
    Neg,
    Public,
    RowOffset,
    Source,
    Sub,
    Var,
)
from .graph import ConstraintGraph


class Algebra:
    """Leaf + op providers for a sweep.  `var(source, column, offset)` must
    return the working-type value of that trace cell (two-row window:
    offset 1 = next row)."""

    def const(self, v: int):
        raise NotImplementedError

    def var(self, source: int, column: int, offset: int):
        raise NotImplementedError

    def public(self, index: int):
        raise NotImplementedError

    def first(self):
        raise NotImplementedError

    def last(self):
        raise NotImplementedError

    def transition(self):
        raise NotImplementedError

    def add(self, a, b):
        raise NotImplementedError

    def sub(self, a, b):
        raise NotImplementedError

    def mul(self, a, b):
        raise NotImplementedError

    def neg(self, a):
        raise NotImplementedError


def sweep(graph: ConstraintGraph, alg: Algebra, limit: Optional[int] = None) -> list:
    """Dense forward sweep over nodes[:limit] (reference eval.rs:53-106)."""
    buf = []
    for op in graph.nodes[:limit]:
        kind = op[0]
        if kind == "c":
            buf.append(alg.const(op[1]))
        elif kind == "v":
            buf.append(alg.var(op[1], op[2], op[3]))
        elif kind == "p":
            buf.append(alg.public(op[1]))
        elif kind == "first":
            buf.append(alg.first())
        elif kind == "last":
            buf.append(alg.last())
        elif kind == "trans":
            buf.append(alg.transition())
        elif kind == "add":
            buf.append(alg.add(buf[op[1]], buf[op[2]]))
        elif kind == "sub":
            buf.append(alg.sub(buf[op[1]], buf[op[2]]))
        elif kind == "mul":
            buf.append(alg.mul(buf[op[1]], buf[op[2]]))
        elif kind == "neg":
            buf.append(alg.neg(buf[op[1]]))
        else:
            raise ValueError(kind)
    return buf


def sweep_lookup_prefix(graph: ConstraintGraph, alg: Algebra) -> list:
    """Partial evaluation of the lookup prefix (reference eval.rs:59-65)."""
    return sweep(graph, alg, limit=graph.lookup_end)


def constraint_values(graph: ConstraintGraph, buf: list) -> list:
    return [buf[i] for i in graph.zeros]


def lookup_values(graph: ConstraintGraph, buf: list) -> List[Tuple[object, tuple]]:
    return [(buf[m], tuple(buf[a] for a in args)) for m, args in graph.lookups]


# --- concrete algebras -------------------------------------------------------

class DeviceAlgebra(Algebra):
    """Whole-array evaluation over the base field on device.

    `var_provider(source, column, offset)` returns a field array; selectors
    and publics likewise (publics embedded as broadcast constants)."""

    def __init__(self, F, var_provider, publics, selectors):
        self.F = F
        self._var = var_provider
        self._publics = publics
        self._sel = selectors

    def const(self, v: int):
        return self.F.const(v, ())

    def var(self, source, column, offset):
        return self._var(source, column, offset)

    def public(self, index):
        return self._publics(index)

    def first(self):
        return self._sel["first"]

    def last(self):
        return self._sel["last"]

    def transition(self):
        return self._sel["transition"]

    def add(self, a, b):
        return self.F.add(a, b)

    def sub(self, a, b):
        return self.F.sub(a, b)

    def mul(self, a, b):
        return self.F.mul(a, b)

    def neg(self, a):
        return self.F.neg(a)


class NpBaseAlgebra(Algebra):
    """Whole-array evaluation over the base field in NumPy (the eager CPU
    mirror of DeviceAlgebra — same values, ~100x less per-op dispatch).
    Values are uint64 ndarrays (or uint64 scalars, broadcasting freely)."""

    def __init__(self, hf, var_provider, publics, selectors):
        from .fields import npref

        self.nf = npref.NpField(hf)
        self._var = var_provider
        self._publics = publics
        self._sel = selectors

    def const(self, v: int):
        return np.uint64(int(v) % int(self.nf.p))

    def var(self, source, column, offset):
        return self._var(source, column, offset)

    def public(self, index):
        return self._publics(index)

    def first(self):
        return self._sel["first"]

    def last(self):
        return self._sel["last"]

    def transition(self):
        return self._sel["transition"]

    def add(self, a, b):
        return self.nf.add(a, b)

    def sub(self, a, b):
        return self.nf.sub(a, b)

    def mul(self, a, b):
        return self.nf.mul(a, b)

    def neg(self, a):
        return self.nf.neg(a)


class HostExtAlgebra(Algebra):
    """Scalar evaluation in the challenge field at an OOD point (verifier;
    publics are ext values, trace cells are opened ext values — reference
    src/verifier.rs:421-530)."""

    def __init__(self, he, var_provider, publics, selectors):
        self.he = he
        self._var = var_provider
        self._publics = publics
        self._sel = selectors

    def const(self, v: int):
        return self.he.from_base(v % self.he.base.p)

    def var(self, source, column, offset):
        return self._var(source, column, offset)

    def public(self, index):
        return self._publics[index]

    def first(self):
        return self._sel.is_first_row

    def last(self):
        return self._sel.is_last_row

    def transition(self):
        return self._sel.is_transition

    def add(self, a, b):
        return self.he.add(a, b)

    def sub(self, a, b):
        return self.he.sub(a, b)

    def mul(self, a, b):
        return self.he.mul(a, b)

    def neg(self, a):
        return self.he.neg(a)


class HostBaseAlgebra(Algebra):
    """Scalar host evaluation over the base field (tests / witness debug)."""

    def __init__(self, hf, var_provider, publics, selectors):
        self.hf = hf
        self._var = var_provider
        self._publics = publics
        self._sel = selectors

    def const(self, v):
        return v % self.hf.p

    def var(self, source, column, offset):
        return self._var(source, column, offset)

    def public(self, index):
        return self._publics[index]

    def first(self):
        return self._sel["first"]

    def last(self):
        return self._sel["last"]

    def transition(self):
        return self._sel["transition"]

    def add(self, a, b):
        return self.hf.add(a, b)

    def sub(self, a, b):
        return self.hf.sub(a, b)

    def mul(self, a, b):
        return self.hf.mul(a, b)

    def neg(self, a):
        return self.hf.neg(a)


# --- recursive reference evaluator (tests only; reference eval.rs:133-199) ---

def eval_expr(e: Expr, hf, var_fn, publics, selectors) -> int:
    """Direct recursive evaluation of an Expr tree on host ints —
    deliberately independent of the compiled sweep."""
    if isinstance(e, Const):
        return e.value % hf.p
    if isinstance(e, Var):
        return var_fn(e.source.value, e.column, e.offset.value)
    if isinstance(e, Public):
        return publics[e.index]
    if isinstance(e, IsFirstRow):
        return selectors["first"]
    if isinstance(e, IsLastRow):
        return selectors["last"]
    if isinstance(e, IsTransition):
        return selectors["transition"]
    if isinstance(e, Add):
        return hf.add(eval_expr(e.lhs, hf, var_fn, publics, selectors), eval_expr(e.rhs, hf, var_fn, publics, selectors))
    if isinstance(e, Sub):
        return hf.sub(eval_expr(e.lhs, hf, var_fn, publics, selectors), eval_expr(e.rhs, hf, var_fn, publics, selectors))
    if isinstance(e, Mul):
        return hf.mul(eval_expr(e.lhs, hf, var_fn, publics, selectors), eval_expr(e.rhs, hf, var_fn, publics, selectors))
    if isinstance(e, Neg):
        return hf.neg(eval_expr(e.arg, hf, var_fn, publics, selectors))
    raise TypeError(type(e))
