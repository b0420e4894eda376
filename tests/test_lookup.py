"""logUp: direct evaluation pinned against the compiled synthesized spec
(mirror of reference src/lookup.rs:758-867), and stage-2 trace accounting."""

import numpy as np

from multistark_tpu import expr as ex
from multistark_tpu.evaluator import HostBaseAlgebra, eval_expr, sweep
from multistark_tpu.fields.device import GL2_OPS, GL_OPS
from multistark_tpu.fields.host import ExtensionParams, GOLDILOCKS, GOLDILOCKS_EXT2
from multistark_tpu.graph import Interner
from multistark_tpu.lookup import (
    LookupValues,
    claims_accumulator,
    fingerprint,
    logup_constraint_values,
    stage_2_traces,
    synthesize_lookups,
)

F, E = GOLDILOCKS, GOLDILOCKS_EXT2
EP = ExtensionParams(degree=2, w=7, karatsuba=True)
RNG = np.random.default_rng(21)


def rand_f():
    return int(RNG.integers(0, F.p, dtype=np.uint64))


def make_env():
    vals = {}

    def var_fn(src, col, off):
        key = (src, col, off)
        if key not in vals:
            vals[key] = rand_f()
        return vals[key]

    publics = [rand_f() for _ in range(8)]
    sel = {"first": rand_f(), "last": rand_f(), "transition": rand_f()}
    return var_fn, publics, sel


def lookups_fixture():
    return [
        ex.Lookup.pull(ex.main(0), [ex.Const(7), ex.main(1), ex.main(2) * ex.main(3)]),
        ex.Lookup.push(ex.preprocessed(0) + 1, [ex.Const(3), ex.main_next(1)]),
    ]


class TestDirectVsSynthesized:
    def _run(self, lookups, log_n=3):
        var_fn, publics, sel = make_env()
        alg = HostBaseAlgebra(F, var_fn, publics, sel)

        # compiled synthesized spec, order-preserving
        it = Interner(F.p)
        roots = [it.intern_ext(c, EP) for c in synthesize_lookups(lookups, EP, F, log_n)]
        from multistark_tpu.graph import ConstraintGraph

        g = ConstraintGraph(F.p, it.nodes, it.degrees, [], [], 0)
        buf = sweep(g, alg)
        synthesized = [tuple(buf[i] for i in coords) for coords in roots]

        # direct evaluation on the same environment
        lookup_vals = [
            (
                eval_expr(lk.multiplicity, F, var_fn, publics, sel),
                tuple(eval_expr(a, F, var_fn, publics, sel) for a in lk.args),
            )
            for lk in lookups
        ]
        pubs = (
            (publics[0], publics[1]),
            (publics[2], publics[3]),
            (publics[4], publics[5]),
            (publics[6], publics[7]),
        )
        direct = logup_constraint_values(
            alg,
            EP,
            F,
            len(lookups),
            lambda col, off: var_fn(ex.Source.STAGE2.value, col, off),
            lookup_vals,
            sel["last"],
            pubs,
            log_n,
        )
        assert len(direct) == len(synthesized)
        for d, s in zip(direct, synthesized):
            assert tuple(d) == s

    def test_two_lookups(self):
        self._run(lookups_fixture())

    def test_single_lookup(self):
        self._run(lookups_fixture()[:1])

    def test_no_lookups_pass_through(self):
        self._run([])


class TestStage2Traces:
    def test_accumulator_accounting(self):
        """acc_final - acc_initial == Σ mult/m, threading across circuits."""
        beta, gamma = (rand_f(), rand_f()), (rand_f(), rand_f())
        claims = [[1, 5, 6], [2, 7]]
        acc0 = claims_accumulator(E, beta, gamma, claims)

        n = 8
        mults = np.asarray(RNG.integers(0, 100, n), np.uint64)
        args0 = np.asarray(RNG.integers(0, F.p, n, dtype=np.uint64))
        args1 = np.asarray(RNG.integers(0, F.p, n, dtype=np.uint64))
        lv = LookupValues(
            height=n,
            mults=[GL_OPS.from_np(mults)],
            args=[[GL_OPS.from_np(args0), GL_OPS.from_np(args1)]],
        )
        lv2 = LookupValues(height=4, mults=[], args=[])  # pass-through circuit
        mats, accs = stage_2_traces(GL_OPS, GL2_OPS, F, E, [lv, lv2], beta, gamma, acc0)

        # host recomputation
        acc = acc0
        for r in range(n):
            m = E.add(beta, fingerprint(E, gamma, [int(args0[r]), int(args1[r])]))
            acc = E.add(acc, E.scale(E.inv(m), int(mults[r])))
        assert accs[0] == acc
        assert accs[1] == acc  # pass-through preserves

        # stage-2 shapes: (L·D, n) and (D, n)
        assert mats[0][0].shape == (2, n)
        assert mats[1][0].shape == (2, 4)
        # pass-through cells are the constant accumulator
        cells = GL_OPS.to_np((mats[1][0][0], mats[1][1][0]))
        assert np.all(cells == np.uint64(acc[0]))

    def test_stage2_cells_satisfy_chain(self):
        """Stored cells satisfy the step/wrap identities with Δ injection."""
        beta, gamma = (rand_f(), rand_f()), (rand_f(), rand_f())
        acc0 = (rand_f(), rand_f())
        n, log_n = 4, 2
        mults = np.asarray([1, 2, 3, 4], np.uint64)
        args = np.asarray(RNG.integers(0, F.p, n, dtype=np.uint64))
        lv = LookupValues(height=n, mults=[GL_OPS.from_np(mults)], args=[[GL_OPS.from_np(args)]])
        mats, accs = stage_2_traces(GL_OPS, GL2_OPS, F, E, [lv], beta, gamma, acc0)
        acc_f = accs[0]
        cells = GL_OPS.to_np(mats[0])  # (2, n) u64: coords of the single slot
        g = F.two_adic_generator(log_n)
        delta = E.scale(E.sub(acc0, acc_f), F.inv(F.mul(n, g)))
        for r in range(n):
            a_cur = (int(cells[0, r]), int(cells[1, r]))
            a_next = (int(cells[0, (r + 1) % n]), int(cells[1, (r + 1) % n]))
            m = E.add(beta, fingerprint(E, gamma, [int(args[r])]))
            is_last = F.mul(n, g) if r == n - 1 else 0
            lhs = E.sub(E.sub(a_next, a_cur), E.scale(delta, is_last))
            want = E.scale(E.inv(m), int(mults[r]))
            assert lhs == want
