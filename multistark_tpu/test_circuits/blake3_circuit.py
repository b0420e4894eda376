"""The Blake3 compression-function circuit family — the flagship multi-circuit
workload (reference src/test_circuits/blake3.rs, 2747 lines).

Ten circuits decompose one BLAKE3 compression into channel-connected pieces:

  limb range table   pulls (RANGE_CHAN, v)                    [2^B rows]
  limb xor table     pulls (LXOR_CHAN, a, b, a^b)             [2^(2B) rows]
  U32Add             pulls (ADD_CHAN, x, y, z), pushes limb ranges
  U32Xor             pulls (XOR_CHAN, x, y, z), pushes limb xors
  U32RotateRight{16,12,8,7}
                     pull (ROTk_CHAN, x, z), push limb ranges
  GFunction          pulls (G_CHAN, a,b,c,d,mx,my, a',b',c',d'),
                     pushes 6 adds + 4 xors + 4 rotates
  Compression        pulls (COMPRESS_CHAN, cv[8], block[16], t0, t1, blen,
                     flags, out[16]), pushes 56 G calls + 16 final xors;
                     the 7-round message-permutation schedule is symbolic
                     in-circuit (reference blake3.rs:722-754)

``limb_bits`` parameterizes the xor/range tables: 8 reproduces the
reference's 65536-row U8Xor table; 4 (256 rows) keeps CPU tests sane.
Word-level circuits (G, Compression) are limb-width independent.

All pushes are gated by the row's multiplicity column so power-of-two
padding rows are inert.  Witness builders derive every circuit's trace
transitively from compression claims, cross-checked against the standalone
host implementation in hash/blake3.py (reference blake3.rs:1516-2214).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Sequence, Tuple

import numpy as np

from .. import expr as ex
from ..hash.blake3 import (
    BLOCK_LEN,
    CHUNK_END,
    CHUNK_LEN,
    CHUNK_START,
    IV,
    MSG_PERM,
    PARENT,
    ROOT,
    _left_len,
    _words_of,
    blake3_hash,
    compress as host_compress,
)
from ..system import CircuitInputs

RANGE_CHAN = 20
LXOR_CHAN = 21
ADD_CHAN = 22
XOR_CHAN = 23
ROT_CHANS = {16: 24, 12: 25, 8: 26, 7: 27}
G_CHAN = 28
COMPRESS_CHAN = 29

M32 = 0xFFFFFFFF


# --- circuit definitions -----------------------------------------------------

def limb_range_table(limb_bits: int) -> CircuitInputs:
    n = 1 << limb_bits
    table = np.arange(n, dtype=np.uint64).reshape(n, 1)
    return CircuitInputs(
        main_width=1,
        constraints=[],
        ext_constraints=[],
        lookups=[ex.Lookup.pull(ex.main(0), [ex.Const(RANGE_CHAN), ex.preprocessed(0)])],
        preprocessed=table,
    )


def limb_xor_table(limb_bits: int) -> CircuitInputs:
    n = 1 << limb_bits
    a = np.repeat(np.arange(n, dtype=np.uint64), n)
    b = np.tile(np.arange(n, dtype=np.uint64), n)
    table = np.stack([a, b, a ^ b], axis=1)
    return CircuitInputs(
        main_width=1,
        constraints=[],
        ext_constraints=[],
        lookups=[
            ex.Lookup.pull(
                ex.main(0),
                [ex.Const(LXOR_CHAN), ex.preprocessed(0), ex.preprocessed(1), ex.preprocessed(2)],
            )
        ],
        preprocessed=table,
    )


def _compose(cols: Sequence[ex.Expr], limb_bits: int) -> ex.Expr:
    acc = ex.Const(0)
    for i, c in enumerate(cols):
        acc = acc + (1 << (limb_bits * i)) * c
    return acc


def u32_add_circuit(limb_bits: int) -> CircuitInputs:
    """x + y = z + carry·2^32 in limbs; limbs range-checked."""
    k = 32 // limb_bits
    x = [ex.main(i) for i in range(k)]
    y = [ex.main(k + i) for i in range(k)]
    z = [ex.main(2 * k + i) for i in range(k)]
    carry, mult = ex.main(3 * k), ex.main(3 * k + 1)
    lhs = _compose(x, limb_bits) + _compose(y, limb_bits) - _compose(z, limb_bits)
    constraints = [carry * (carry - 1), mult * (mult - 1), lhs - carry * (1 << 32)]
    lookups = [
        ex.Lookup.pull(
            mult,
            [ex.Const(ADD_CHAN), _compose(x, limb_bits), _compose(y, limb_bits), _compose(z, limb_bits)],
        )
    ]
    for c in x + y + z:
        lookups.append(ex.Lookup.push(mult, [ex.Const(RANGE_CHAN), c]))
    return CircuitInputs(3 * k + 2, constraints, [], lookups)


def u32_xor_circuit(limb_bits: int) -> CircuitInputs:
    """x ^ y = z via per-limb xor-table pushes."""
    k = 32 // limb_bits
    x = [ex.main(i) for i in range(k)]
    y = [ex.main(k + i) for i in range(k)]
    z = [ex.main(2 * k + i) for i in range(k)]
    mult = ex.main(3 * k)
    lookups = [
        ex.Lookup.pull(
            mult,
            [ex.Const(XOR_CHAN), _compose(x, limb_bits), _compose(y, limb_bits), _compose(z, limb_bits)],
        )
    ]
    for i in range(k):
        lookups.append(ex.Lookup.push(mult, [ex.Const(LXOR_CHAN), x[i], y[i], z[i]]))
    return CircuitInputs(3 * k + 1, [mult * (mult - 1)], [], lookups)


def rotate_circuit(r: int, limb_bits: int) -> CircuitInputs:
    """z = rotr(x, r): x = hi·2^r + lo (lo r bits), z = lo·2^(32-r) + hi.
    lo and hi are decomposed into B-bit limbs (partial top limbs are
    range-checked by the scaling trick v·2^(B-bits) < 2^B)."""

    def limb_split(bits: int, base_col: int):
        cols = []
        sizes = []
        rem = bits
        i = 0
        while rem > 0:
            take = min(limb_bits, rem)
            cols.append(ex.main(base_col + i))
            sizes.append(take)
            rem -= take
            i += 1
        return cols, sizes

    lo_cols, lo_sizes = limb_split(r, 0)
    hi_cols, hi_sizes = limb_split(32 - r, len(lo_cols))
    width = len(lo_cols) + len(hi_cols) + 1
    mult = ex.main(width - 1)

    def compose_sized(cols, sizes):
        acc = ex.Const(0)
        shift = 0
        for c, s in zip(cols, sizes):
            acc = acc + (1 << shift) * c
            shift += s
        return acc

    lo = compose_sized(lo_cols, lo_sizes)
    hi = compose_sized(hi_cols, hi_sizes)
    x = hi * (1 << r) + lo
    z = lo * (1 << (32 - r)) + hi
    lookups = [ex.Lookup.pull(mult, [ex.Const(ROT_CHANS[r]), x, z])]
    for c, s in zip(lo_cols + hi_cols, lo_sizes + hi_sizes):
        scaled = c * (1 << (limb_bits - s)) if s < limb_bits else c
        lookups.append(ex.Lookup.push(mult, [ex.Const(RANGE_CHAN), scaled]))
    return CircuitInputs(width, [mult * (mult - 1)], [], lookups)


def g_function_circuit() -> CircuitInputs:
    """One BLAKE3 G evaluation in u32 words; every arithmetic step is
    delegated to a primitive circuit through its channel
    (reference blake3.rs GFunction)."""
    names = [
        "a", "b", "c", "d", "mx", "my",
        "t1", "a1", "xd1", "d1", "c1", "xb1", "b1",
        "t2", "a2", "xd2", "d2", "c2", "xb2", "b2",
    ]
    col = {n: ex.main(i) for i, n in enumerate(names)}
    mult = ex.main(len(names))
    L = ex.Lookup
    v = col
    lookups = [
        L.pull(
            mult,
            [ex.Const(G_CHAN), v["a"], v["b"], v["c"], v["d"], v["mx"], v["my"],
             v["a2"], v["b2"], v["c2"], v["d2"]],
        ),
        L.push(mult, [ex.Const(ADD_CHAN), v["a"], v["b"], v["t1"]]),
        L.push(mult, [ex.Const(ADD_CHAN), v["t1"], v["mx"], v["a1"]]),
        L.push(mult, [ex.Const(XOR_CHAN), v["d"], v["a1"], v["xd1"]]),
        L.push(mult, [ex.Const(ROT_CHANS[16]), v["xd1"], v["d1"]]),
        L.push(mult, [ex.Const(ADD_CHAN), v["c"], v["d1"], v["c1"]]),
        L.push(mult, [ex.Const(XOR_CHAN), v["b"], v["c1"], v["xb1"]]),
        L.push(mult, [ex.Const(ROT_CHANS[12]), v["xb1"], v["b1"]]),
        L.push(mult, [ex.Const(ADD_CHAN), v["a1"], v["b1"], v["t2"]]),
        L.push(mult, [ex.Const(ADD_CHAN), v["t2"], v["my"], v["a2"]]),
        L.push(mult, [ex.Const(XOR_CHAN), v["d1"], v["a2"], v["xd2"]]),
        L.push(mult, [ex.Const(ROT_CHANS[8]), v["xd2"], v["d2"]]),
        L.push(mult, [ex.Const(ADD_CHAN), v["c1"], v["d2"], v["c2"]]),
        L.push(mult, [ex.Const(XOR_CHAN), v["b1"], v["c2"], v["xb2"]]),
        L.push(mult, [ex.Const(ROT_CHANS[7]), v["xb2"], v["b2"]]),
    ]
    return CircuitInputs(len(names) + 1, [mult * (mult - 1)], [], lookups)


# G-call wiring per round (column/diagonal order), matching hash/blake3.py
_G_IDX = [
    (0, 4, 8, 12), (1, 5, 9, 13), (2, 6, 10, 14), (3, 7, 11, 15),
    (0, 5, 10, 15), (1, 6, 11, 12), (2, 7, 8, 13), (3, 4, 9, 14),
]


def compression_circuit() -> CircuitInputs:
    """One BLAKE3 compression per row: 28 input words, 56 G-call output
    windows (4 words each), 16 output words, multiplicity.  The message
    permutation schedule is applied symbolically (reference blake3.rs:722-754)."""
    cv = [ex.main(i) for i in range(8)]
    block = [ex.main(8 + i) for i in range(16)]
    t0, t1, blen, flags = (ex.main(24 + i) for i in range(4))
    n_fixed = 28
    g_out_base = n_fixed
    out_base = g_out_base + 56 * 4
    out = [ex.main(out_base + i) for i in range(16)]
    mult = ex.main(out_base + 16)
    width = out_base + 17

    state: List[ex.Expr] = list(cv) + [ex.Const(IV[i]) for i in range(4)] + [t0, t1, blen, flags]
    msg: List[ex.Expr] = list(block)
    lookups: List[ex.Lookup] = []
    g_call = 0
    for rnd in range(7):
        for gi, (ia, ib, ic, id_) in enumerate(_G_IDX):
            mx, my = msg[2 * gi], msg[2 * gi + 1]
            outs = [ex.main(g_out_base + 4 * g_call + j) for j in range(4)]
            lookups.append(
                ex.Lookup.push(
                    mult,
                    [ex.Const(G_CHAN), state[ia], state[ib], state[ic], state[id_],
                     mx, my, outs[0], outs[1], outs[2], outs[3]],
                )
            )
            state[ia], state[ib], state[ic], state[id_] = outs[0], outs[1], outs[2], outs[3]
            g_call += 1
        msg = [msg[p] for p in MSG_PERM]
    for i in range(8):
        lookups.append(ex.Lookup.push(mult, [ex.Const(XOR_CHAN), state[i], state[i + 8], out[i]]))
        lookups.append(ex.Lookup.push(mult, [ex.Const(XOR_CHAN), state[i + 8], cv[i], out[i + 8]]))
    lookups.append(
        ex.Lookup.pull(
            mult,
            [ex.Const(COMPRESS_CHAN)] + cv + block + [t0, t1, blen, flags] + out,
        )
    )
    return CircuitInputs(width, [mult * (mult - 1)], [], lookups)


def blake3_system_inputs(limb_bits: int = 8) -> List[CircuitInputs]:
    return [
        compression_circuit(),
        g_function_circuit(),
        u32_add_circuit(limb_bits),
        u32_xor_circuit(limb_bits),
        rotate_circuit(16, limb_bits),
        rotate_circuit(12, limb_bits),
        rotate_circuit(8, limb_bits),
        rotate_circuit(7, limb_bits),
        limb_xor_table(limb_bits),
        limb_range_table(limb_bits),
    ]


# --- witness generation ------------------------------------------------------

def _rotr(x: int, r: int) -> int:
    return ((x >> r) | (x << (32 - r))) & M32


@dataclass
class _Ops:
    adds: List[Tuple[int, int, int]] = field(default_factory=list)
    xors: List[Tuple[int, int, int]] = field(default_factory=list)
    rots: Dict[int, List[Tuple[int, int]]] = field(default_factory=lambda: {16: [], 12: [], 8: [], 7: []})
    g_calls: List[Tuple[int, ...]] = field(default_factory=list)


def _g_instrumented(a, b, c, d, mx, my, ops: _Ops) -> Tuple[Tuple[int, int, int, int], List[int]]:
    """Run G recording every primitive op; returns outputs + the GFunction row."""
    t1 = (a + b) & M32
    a1 = (t1 + mx) & M32
    xd1 = d ^ a1
    d1 = _rotr(xd1, 16)
    c1 = (c + d1) & M32
    xb1 = b ^ c1
    b1 = _rotr(xb1, 12)
    t2 = (a1 + b1) & M32
    a2 = (t2 + my) & M32
    xd2 = d1 ^ a2
    d2 = _rotr(xd2, 8)
    c2 = (c1 + d2) & M32
    xb2 = b1 ^ c2
    b2 = _rotr(xb2, 7)
    ops.adds += [(a, b, t1), (t1, mx, a1), (c, d1, c1), (a1, b1, t2), (t2, my, a2), (c1, d2, c2)]
    ops.xors += [(d, a1, xd1), (b, c1, xb1), (d1, a2, xd2), (b1, c2, xb2)]
    ops.rots[16].append((xd1, d1))
    ops.rots[12].append((xb1, b1))
    ops.rots[8].append((xd2, d2))
    ops.rots[7].append((xb2, b2))
    ops.g_calls.append((a, b, c, d, mx, my, a2, b2, c2, d2))
    row = [a, b, c, d, mx, my, t1, a1, xd1, d1, c1, xb1, b1, t2, a2, xd2, d2, c2, xb2, b2, 1]
    return (a2, b2, c2, d2), row


def _pad_rows(rows: List[List[int]], width: int) -> np.ndarray:
    n = max(1, len(rows))
    h = 1 << (n - 1).bit_length()
    out = np.zeros((h, width), np.uint64)
    for i, r in enumerate(rows):
        out[i] = r
    return out


def blake3_witness(
    compressions: Sequence[Tuple[Sequence[int], Sequence[int], int, int, int]],
    limb_bits: int = 8,
):
    """compressions: list of (cv[8], block[16], counter, blen, flags).
    Returns (traces ordered as blake3_system_inputs, claims)."""
    k = 32 // limb_bits
    lmask = (1 << limb_bits) - 1
    ops = _Ops()
    comp_rows = []
    g_rows = []
    claims = []
    for cv, block, counter, blen, flags in compressions:
        # cross-check against the standalone host implementation
        expect = host_compress(list(cv), list(block), counter, blen, flags)
        t0, t1 = counter & M32, (counter >> 32) & M32
        state = list(cv) + list(IV[:4]) + [t0, t1, blen, flags]
        msg = list(block)
        row = list(cv) + list(block) + [t0, t1, blen, flags]
        for rnd in range(7):
            for gi, (ia, ib, ic, id_) in enumerate(_G_IDX):
                outs, g_row = _g_instrumented(
                    state[ia], state[ib], state[ic], state[id_],
                    msg[2 * gi], msg[2 * gi + 1], ops,
                )
                g_rows.append(g_row)
                state[ia], state[ib], state[ic], state[id_] = outs
                row.extend(outs)
            msg = [msg[p] for p in MSG_PERM]
        out = [state[i] ^ state[i + 8] for i in range(8)] + [
            state[i + 8] ^ cv[i] for i in range(8)
        ]
        assert out == expect, "instrumented compression disagrees with host blake3"
        for i in range(8):
            ops.xors.append((state[i], state[i + 8], out[i]))
            ops.xors.append((state[i + 8], cv[i], out[i + 8]))
        row.extend(out)
        row.append(1)
        comp_rows.append(row)
        claims.append([COMPRESS_CHAN] + list(cv) + list(block) + [t0, t1, blen, flags] + out)

    range_mult = np.zeros(1 << limb_bits, np.uint64)
    lxor_mult = np.zeros(1 << (2 * limb_bits), np.uint64)

    def limbs(v: int) -> List[int]:
        return [(v >> (limb_bits * i)) & lmask for i in range(k)]

    add_rows = []
    for x, y, z in ops.adds:
        lx, ly, lz = limbs(x), limbs(y), limbs(z)
        carry = 1 if x + y > M32 else 0
        add_rows.append(lx + ly + lz + [carry, 1])
        for v in lx + ly + lz:
            range_mult[v] += 1
    xor_rows = []
    for x, y, z in ops.xors:
        lx, ly, lz = limbs(x), limbs(y), limbs(z)
        xor_rows.append(lx + ly + lz + [1])
        for a_, b_ in zip(lx, ly):
            lxor_mult[(a_ << limb_bits) | b_] += 1
    rot_traces = {}
    for r, pairs in ops.rots.items():
        rows = []
        for x, z in pairs:
            lo, hi = x & ((1 << r) - 1), x >> r
            cols = []
            sizes = []
            for bits, v in ((r, lo), (32 - r, hi)):
                rem, val = bits, v
                while rem > 0:
                    take = min(limb_bits, rem)
                    limb = val & ((1 << take) - 1)
                    cols.append(limb)
                    sizes.append(take)
                    val >>= take
                    rem -= take
            rows.append(cols + [1])
            for limb, s in zip(cols, sizes):
                range_mult[limb << (limb_bits - s)] += 1
        rot_traces[r] = rows

    # inert padding rows still fire table pulls?  no: pushes are mult-gated,
    # and table circuits pull with computed multiplicities only.
    g_trace = _pad_rows(g_rows, 21)
    comp_trace = _pad_rows(comp_rows, 28 + 56 * 4 + 16 + 1)
    add_trace = _pad_rows(add_rows, 3 * k + 2)
    xor_trace = _pad_rows(xor_rows, 3 * k + 1)
    rot_ts = {}
    for r in (16, 12, 8, 7):
        n_cols = len(rot_traces[r][0]) if rot_traces[r] else (
            (r + limb_bits - 1) // limb_bits + (32 - r + limb_bits - 1) // limb_bits + 1
        )
        rot_ts[r] = _pad_rows(rot_traces[r], n_cols)

    traces = [
        comp_trace,
        g_trace,
        add_trace,
        xor_trace,
        rot_ts[16],
        rot_ts[12],
        rot_ts[8],
        rot_ts[7],
        lxor_mult.reshape(-1, 1),
        range_mult.reshape(-1, 1),
    ]
    return traces, claims


# --- hasher-driven claim generation -------------------------------------------
#
# The reference ships a from-scratch hasher whose chunk/parent tree generates
# compression claims from hashing real messages (blake3.rs:32-351, the bench
# workload at blake3.rs:2216-2340).  Mirror: run the full BLAKE3 tree on a
# message, record EVERY compression invocation, and turn the recording into
# the 10-circuit witness.  Multi-chunk messages exercise chunk chaining
# (block b's input cv = block b-1's output), subtree parents, and the root.

def blake3_hasher_compressions(
    data: bytes,
) -> Tuple[bytes, List[Tuple[List[int], List[int], int, int, int]]]:
    """Hash ``data`` with the full BLAKE3 chunk/parent tree, recording every
    compression as a claim tuple (cv, block, counter, blen, flags) in
    invocation order.  Returns (digest, compressions); the digest is
    asserted against the standalone ``blake3_hash``."""
    recorded: List[Tuple[List[int], List[int], int, int, int]] = []

    def rec(cv, block, counter, blen, flags):
        recorded.append((list(cv), list(block), counter, blen, flags))
        return host_compress(list(cv), list(block), counter, blen, flags)

    def chunk_cv(chunk: bytes, counter: int, root: bool) -> List[int]:
        cv = list(IV)
        n_blocks = max(1, (len(chunk) + BLOCK_LEN - 1) // BLOCK_LEN)
        for b in range(n_blocks):
            seg = chunk[b * BLOCK_LEN : (b + 1) * BLOCK_LEN]
            flags = (CHUNK_START if b == 0 else 0) | (
                (CHUNK_END | (ROOT if root else 0)) if b == n_blocks - 1 else 0
            )
            cv = rec(cv, _words_of(seg), counter, len(seg), flags)[:8]
        return cv

    def subtree(seg: bytes, counter0: int) -> List[int]:
        n_chunks = (len(seg) + CHUNK_LEN - 1) // CHUNK_LEN
        if n_chunks == 1:
            return chunk_cv(seg, counter0, root=False)
        split = _left_len(n_chunks) * CHUNK_LEN
        left = subtree(seg[:split], counter0)
        right = subtree(seg[split:], counter0 + split // CHUNK_LEN)
        return rec(list(IV), left + right, 0, BLOCK_LEN, PARENT)[:8]

    n_chunks = max(1, (len(data) + CHUNK_LEN - 1) // CHUNK_LEN)
    if n_chunks == 1:
        cv = chunk_cv(data, 0, root=True)
    else:
        split = _left_len(n_chunks) * CHUNK_LEN
        left = subtree(data[:split], 0)
        right = subtree(data[split:], split // CHUNK_LEN)
        cv = rec(list(IV), left + right, 0, BLOCK_LEN, PARENT | ROOT)[:8]
    digest = b"".join(w.to_bytes(4, "little") for w in cv)
    assert digest == blake3_hash(data), "instrumented hasher disagrees with blake3_hash"
    return digest, recorded


def blake3_hasher_witness(data: bytes, limb_bits: int = 8):
    """Hasher-driven witness: the 10-circuit traces + claims for every
    compression performed while hashing ``data``.
    Returns (digest, traces, claims)."""
    digest, comps = blake3_hasher_compressions(data)
    traces, claims = blake3_witness(comps, limb_bits)
    return digest, traces, claims
