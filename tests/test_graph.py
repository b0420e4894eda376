"""Constraint compiler + evaluator: hash-consing, folding, degrees,
Karatsuba expansion pinned against host schoolbook ext mul, sweep vs
recursive reference evaluator (reference src/graph.rs tests / src/eval.rs:4-7)."""

import numpy as np
import pytest

from multistark_tpu import expr as ex
from multistark_tpu.evaluator import HostBaseAlgebra, eval_expr, sweep
from multistark_tpu.fields.host import ExtensionParams, GOLDILOCKS, GOLDILOCKS_EXT2
from multistark_tpu.graph import CompileError, compile_graph

F, E = GOLDILOCKS, GOLDILOCKS_EXT2
EP = ExtensionParams(degree=2, w=7, karatsuba=True)
RNG = np.random.default_rng(9)


def compile1(constraints=(), ext_constraints=(), lookups=()):
    return compile_graph(F.p, list(constraints), list(ext_constraints), list(lookups), EP)


class TestInterning:
    def test_hash_consing_commutative(self):
        a, b = ex.main(0), ex.main(1)
        g = compile1(constraints=[a + b, b + a, a * b, b * a])
        # both orderings intern to the same node => a single constraint root
        assert len(g.zeros) == 2

    def test_constant_folding(self):
        g = compile1(constraints=[ex.Const(5) * ex.Const(0) + ex.main(0) * 1])
        # 5*0 folds away; x*1 folds to x: root is the bare var
        assert g.nodes[g.zeros[0]][0] == "v"

    def test_zero_constraint_dropped_nonzero_rejected(self):
        g = compile1(constraints=[ex.Const(7) - ex.Const(7)])
        assert g.zeros == []
        with pytest.raises(CompileError, match="UnsatisfiableConstant"):
            compile1(constraints=[ex.Const(3)])

    def test_degrees(self):
        x, y = ex.main(0), ex.main_next(1)
        g = compile1(constraints=[x * y * x + y])
        assert g.max_constraint_degree == 3
        g2 = compile1(constraints=[ex.IsFirstRow() * x])
        assert g2.max_constraint_degree == 2
        g3 = compile1(constraints=[ex.IsTransition() * x])
        assert g3.max_constraint_degree == 1

    def test_stage2_in_base_context_rejected(self):
        with pytest.raises(CompileError, match="Stage2InBaseContext"):
            compile1(constraints=[ex.stage2(0) * ex.main(0)])

    def test_purely_base_ext_rejected(self):
        with pytest.raises(CompileError, match="PurelyBaseExtConstraint"):
            compile1(ext_constraints=[ex.ExtBase(ex.main(0)) * ex.ExtBase(ex.main(1))])

    def test_lookup_prefix(self):
        lk = ex.Lookup.pull(ex.main(2), [ex.Const(1), ex.main(0), ex.main(1)])
        g = compile1(constraints=[ex.main(0) * ex.main(3)], lookups=[lk])
        assert len(g.lookups) == 1
        m, args = g.lookups[0]
        assert m < g.lookup_end and all(a < g.lookup_end for a in args)
        # the pull negates the multiplicity
        assert g.nodes[m][0] == "neg"


def _env(width=4):
    vals = {}

    def var_fn(src, col, off):
        key = (src, col, off)
        if key not in vals:
            vals[key] = int(RNG.integers(0, F.p, dtype=np.uint64))
        return vals[key]

    publics = [int(x) for x in RNG.integers(0, F.p, 8, dtype=np.uint64)]
    sel = {
        "first": int(RNG.integers(0, F.p, dtype=np.uint64)),
        "last": int(RNG.integers(0, F.p, dtype=np.uint64)),
        "transition": int(RNG.integers(0, F.p, dtype=np.uint64)),
    }
    return var_fn, publics, sel


class TestSweepVsRecursive:
    def test_random_expressions(self):
        x, y, z = ex.main(0), ex.main_next(1), ex.preprocessed(2)
        exprs = [
            x * y + z * 3 - ex.public(1),
            (x + y) * (x - y) * ex.IsFirstRow() + ex.IsLastRow() * z,
            -x * x + ex.IsTransition() * (y - 1),
        ]
        g = compile1(constraints=exprs)
        var_fn, publics, sel = _env()
        alg = HostBaseAlgebra(F, var_fn, publics, sel)
        buf = sweep(g, alg)
        got = sorted(buf[i] for i in g.zeros)
        want = sorted(set(eval_expr(e, F, var_fn, publics, sel) for e in exprs))
        assert got == want

    def test_karatsuba_matches_host_ext_mul(self):
        """Compiled D=2 Karatsuba expansion == schoolbook host ext mul
        (reference pin: eval.rs:151-154 deliberately schoolbook)."""
        a = ex.ExtCoords((ex.main(0), ex.main(1)))
        b = ex.ExtCoords((ex.main(2), ex.main(3)))
        c = ex.ExtCoords((ex.main_next(0), ex.preprocessed(1)))
        prod = a * b * c + a - c
        g = compile1(ext_constraints=[prod])
        assert len(g.zeros) == 2
        var_fn, publics, sel = _env()
        alg = HostBaseAlgebra(F, var_fn, publics, sel)
        buf = sweep(g, alg)
        got = tuple(buf[i] for i in g.zeros)

        def ev(t):
            return eval_expr(t, F, var_fn, publics, sel)

        av = (ev(ex.main(0)), ev(ex.main(1)))
        bv = (ev(ex.main(2)), ev(ex.main(3)))
        cv = (ev(ex.main_next(0)), ev(ex.preprocessed(1)))
        want = E.sub(E.add(E.mul(E.mul(av, bv), cv), av), cv)
        # roots are sorted+deduped; compare as sets
        assert set(got) == set(want)
