"""Selector pin tests: the unnormalized p3 selector convention the protocol
depends on (mirror of reference src/lookup.rs:689-756)."""

import numpy as np

from multistark_tpu.domains import TwoAdicCoset
from multistark_tpu.fields.host import GOLDILOCKS, GOLDILOCKS_EXT2

F, E = GOLDILOCKS, GOLDILOCKS_EXT2
RNG = np.random.default_rng(5)


def textbook_lagrange(domain_points, i, zeta):
    """L_i(zeta) = prod_{j != i} (zeta - x_j) / (x_i - x_j) over the ext field."""
    num = E.one
    den = 1
    xi = domain_points[i]
    for j, xj in enumerate(domain_points):
        if j == i:
            continue
        num = E.mul(num, E.sub(zeta, E.from_base(xj)))
        den = F.mul(den, F.sub(xi, xj))
    return E.scale(num, F.inv(den))


class TestSelectorNormalization:
    def test_constants_pinned(self):
        """is_first/n == L_0 and is_last/(n·g) == L_last at random zeta —
        pins the 1/n and 1/(n·g) constants absorbed by the logUp boundary
        term (reference src/lookup.rs:298-304)."""
        for log_n in [2, 3, 4]:
            n = 1 << log_n
            dom = TwoAdicCoset(F, log_n, 1)
            g = dom.gen
            pts = [F.pow(g, i) for i in range(n)]
            zeta = tuple(int(x) for x in RNG.integers(0, F.p, 2, dtype=np.uint64))
            sel = dom.selectors_at_point(E, zeta)
            l0 = textbook_lagrange(pts, 0, zeta)
            llast = textbook_lagrange(pts, n - 1, zeta)
            assert E.scale(sel.is_first_row, F.inv(n)) == l0
            assert E.scale(sel.is_last_row, F.inv(F.mul(n, g))) == llast

    def test_selector_values_at_domain_points(self):
        log_n = 3
        n = 1 << log_n
        dom = TwoAdicCoset(F, log_n, 1)
        big = dom.create_disjoint_domain(2 * n)
        on = dom.selectors_on_coset(big)
        G = F.two_adic_generator(big.log_n)
        for i in [0, 1, 5]:
            x = F.mul(big.shift, F.pow(G, i))
            at = dom.selectors_at_point(E, E.from_base(x))
            assert at.is_first_row[0] == int(on.is_first_row[i]) and at.is_first_row[1] == 0
            assert at.is_last_row[0] == int(on.is_last_row[i])
            assert at.is_transition[0] == int(on.is_transition[i])
            assert at.inv_vanishing[0] == int(on.inv_vanishing[i])

    def test_vanishing_on_domain(self):
        """Z_H(x) = 0 exactly on the trace domain; inv_vanishing well-defined
        on the disjoint coset."""
        dom = TwoAdicCoset(F, 3, 1)
        big = dom.create_disjoint_domain(16)
        on = dom.selectors_on_coset(big)
        assert np.all(on.inv_vanishing != 0)

    def test_disjoint_domain_shift(self):
        dom = TwoAdicCoset(F, 4, 1)
        q = dom.create_disjoint_domain(32)
        assert q.shift == F.generator and q.log_n == 5
