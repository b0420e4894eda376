"""Bitwise-operations table circuit (reference
src/test_circuits/byte_operations.rs).

A single circuit with a preprocessed table of every (A, B) pair and their
XOR/AND/OR, plus four multiplicity main columns; all semantics are enforced
via four PULL lookups on distinct indexed channels.  External claims look
like [op_channel, a, b, result].

``bits`` parameterizes the operand width: 8 reproduces the reference's
65536-row byte table; tests use 4 (256 rows) to keep CPU runtime sane.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from .. import expr as ex
from ..system import CircuitInputs

XOR_CHAN = 10
AND_CHAN = 11
OR_CHAN = 12
RANGE_CHAN = 13


def byte_operations_inputs(bits: int = 8) -> CircuitInputs:
    n = 1 << bits
    a = np.repeat(np.arange(n, dtype=np.uint64), n)
    b = np.tile(np.arange(n, dtype=np.uint64), n)
    table = np.stack([a, b, a ^ b, a & b, a | b], axis=1)  # (n^2, 5)
    pre = (ex.preprocessed(0), ex.preprocessed(1), ex.preprocessed(2),
           ex.preprocessed(3), ex.preprocessed(4))
    lookups = [
        ex.Lookup.pull(ex.main(0), [ex.Const(XOR_CHAN), pre[0], pre[1], pre[2]]),
        ex.Lookup.pull(ex.main(1), [ex.Const(AND_CHAN), pre[0], pre[1], pre[3]]),
        ex.Lookup.pull(ex.main(2), [ex.Const(OR_CHAN), pre[0], pre[1], pre[4]]),
        ex.Lookup.pull(ex.main(3), [ex.Const(RANGE_CHAN), pre[0], pre[1]]),
    ]
    return CircuitInputs(
        main_width=4,
        constraints=[],
        ext_constraints=[],
        lookups=lookups,
        preprocessed=table,
    )


def byte_operations_witness(
    claims: Sequence[Sequence[int]], bits: int = 8
) -> np.ndarray:
    """Multiplicity trace counting how often each table row is consumed."""
    n = 1 << bits
    mult = np.zeros((n * n, 4), np.uint64)
    for claim in claims:
        chan = claim[0]
        a, b = claim[1], claim[2]
        row = a * n + b
        if chan == XOR_CHAN:
            assert claim[3] == a ^ b
            mult[row, 0] += 1
        elif chan == AND_CHAN:
            assert claim[3] == a & b
            mult[row, 1] += 1
        elif chan == OR_CHAN:
            assert claim[3] == a | b
            mult[row, 2] += 1
        elif chan == RANGE_CHAN:
            mult[row, 3] += 1
        else:
            raise ValueError(f"unknown channel {chan}")
    return mult
