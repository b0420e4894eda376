"""Proof serialization (reference src/prover.rs:215-255).

Binary layout follows the reference's bincode configuration: little-endian,
fixed-width integers (u64 lengths, u64 field elements, u8 for bitmap/log
degrees, raw 32-byte digests).  Deserialization is defensive: all lengths
are derived from the System where possible and bounds-checked; field values
are range-checked by verify_shape afterwards.
"""

from __future__ import annotations

import struct
from typing import List, Tuple

import numpy as np

from .errors import VerificationError
from .merkle import BatchOpening
from .pcs import FriProof, QueryProof


class _Writer:
    def __init__(self):
        self.parts: List[bytes] = []

    def u8(self, v: int):
        self.parts.append(struct.pack("<B", v))

    def u64(self, v: int):
        self.parts.append(struct.pack("<Q", v))

    def field(self, v: int):
        self.parts.append(struct.pack("<Q", v))

    def ext(self, v):
        for c in v:
            self.field(c)

    def digest(self, row: np.ndarray):
        self.parts.append(np.asarray(row, "<u4").tobytes())

    def cap(self, cap: np.ndarray):
        cap = np.atleast_2d(cap)
        self.u64(cap.shape[0])
        for row in cap:
            self.digest(row)

    def bytes(self) -> bytes:
        return b"".join(self.parts)


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def _take(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise VerificationError("InvalidProofShape", "truncated proof bytes")
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def u8(self) -> int:
        return self._take(1)[0]

    def u64(self) -> int:
        return struct.unpack("<Q", self._take(8))[0]

    def field(self) -> int:
        return self.u64()

    def ext(self, D: int) -> Tuple[int, ...]:
        return tuple(self.field() for _ in range(D))

    def digest(self) -> np.ndarray:
        return np.frombuffer(self._take(32), "<u4").astype(np.uint32)

    def cap(self) -> np.ndarray:
        n = self.u64()
        if n > 1 << 20:
            raise VerificationError("InvalidProofShape", "cap too large")
        return np.stack([self.digest() for _ in range(n)]) if n else np.zeros((0, 8), np.uint32)

    def done(self) -> bool:
        return self.pos == len(self.data)


def _write_opened(w: _Writer, opened, D: int):
    w.u64(len(opened))
    for mat in opened:
        w.u64(len(mat))
        for pt in mat:
            w.u64(len(pt))
            for v in pt:
                w.ext(v)


def _read_opened(r: _Reader, D: int):
    n_mats = r.u64()
    _guard(n_mats)
    out = []
    for _ in range(n_mats):
        n_pts = r.u64()
        _guard(n_pts)
        mat = []
        for _ in range(n_pts):
            width = r.u64()
            _guard(width)
            mat.append([r.ext(D) for _ in range(width)])
        out.append(mat)
    return out


def _guard(n: int, limit: int = 1 << 24):
    if n > limit:
        raise VerificationError("InvalidProofShape", "length field too large")


def _write_batch_opening(w: _Writer, op: BatchOpening):
    w.u64(len(op.opened_rows))
    for row in op.opened_rows:
        w.u64(len(row))
        for v in np.asarray(row, np.uint64):
            w.field(int(v))
    w.u64(op.path.shape[0])
    for d in op.path:
        w.digest(d)


def _read_batch_opening(r: _Reader) -> BatchOpening:
    n_rows = r.u64()
    _guard(n_rows)
    rows = []
    for _ in range(n_rows):
        width = r.u64()
        _guard(width)
        rows.append(np.asarray([r.field() for _ in range(width)], np.uint64))
    n_path = r.u64()
    _guard(n_path, 64)
    path = (
        np.stack([r.digest() for _ in range(n_path)])
        if n_path
        else np.zeros((0, 8), np.uint32)
    )
    return BatchOpening(opened_rows=rows, path=path)


def proof_to_bytes(proof) -> bytes:
    from .prover import Proof  # circular-safe

    w = _Writer()
    D = len(proof.intermediate_accumulators[0]) if proof.intermediate_accumulators else 2
    w.u64(len(proof.active))
    for b in proof.active:
        w.u8(1 if b else 0)
    w.cap(proof.commitments.stage_1_trace)
    w.cap(proof.commitments.stage_2_trace)
    w.cap(proof.commitments.quotient_chunks)
    w.u64(D)
    w.u64(len(proof.intermediate_accumulators))
    for a in proof.intermediate_accumulators:
        w.ext(a)
    w.u64(len(proof.log_degrees))
    for ld in proof.log_degrees:
        w.u8(ld)
    _write_opened(w, proof.preprocessed_opened, D)
    _write_opened(w, proof.stage1_opened, D)
    _write_opened(w, proof.stage2_opened, D)
    _write_opened(w, proof.quotient_opened, D)
    # FRI proof
    fp = proof.fri_proof
    w.u64(len(fp.commit_caps))
    for cap in fp.commit_caps:
        w.cap(cap)
    w.u64(len(fp.commit_pow_witnesses))
    for pw in fp.commit_pow_witnesses:
        w.u64(pw)
    w.u64(len(fp.final_poly))
    for c in fp.final_poly:
        w.ext(c)
    w.u64(fp.query_pow_witness)
    w.u64(len(fp.query_proofs))
    for qp in fp.query_proofs:
        w.u64(len(qp.input_openings))
        for op in qp.input_openings:
            _write_batch_opening(w, op)
        w.u64(len(qp.commit_openings))
        for row, path in qp.commit_openings:
            w.u64(len(row))
            for v in np.asarray(row, np.uint64):
                w.field(int(v))
            w.u64(path.shape[0])
            for d in path:
                w.digest(d)
    return w.bytes()


def proof_from_bytes(data: bytes, system) -> "Proof":
    from .pcs import FriProof, QueryProof
    from .prover import Commitments, Proof

    r = _Reader(data)
    n_circuits = r.u64()
    _guard(n_circuits)
    active = [bool(r.u8()) for _ in range(n_circuits)]
    s1 = r.cap()
    s2 = r.cap()
    qc = r.cap()
    D = r.u64()
    _guard(D, 16)
    n_accs = r.u64()
    _guard(n_accs)
    accs = [r.ext(D) for _ in range(n_accs)]
    n_ld = r.u64()
    _guard(n_ld)
    log_degrees = [r.u8() for _ in range(n_ld)]
    pre_opened = _read_opened(r, D)
    s1_opened = _read_opened(r, D)
    s2_opened = _read_opened(r, D)
    q_opened = _read_opened(r, D)
    n_caps = r.u64()
    _guard(n_caps, 64)
    commit_caps = [r.cap() for _ in range(n_caps)]
    n_pows = r.u64()
    _guard(n_pows, 64)
    commit_pows = [r.u64() for _ in range(n_pows)]
    n_final = r.u64()
    _guard(n_final)
    final_poly = [r.ext(D) for _ in range(n_final)]
    query_pow = r.u64()
    n_queries = r.u64()
    _guard(n_queries, 1 << 16)
    query_proofs = []
    for _ in range(n_queries):
        n_in = r.u64()
        _guard(n_in, 64)
        input_openings = [_read_batch_opening(r) for _ in range(n_in)]
        n_lv = r.u64()
        _guard(n_lv, 64)
        commit_openings = []
        for _ in range(n_lv):
            width = r.u64()
            _guard(width, 1 << 16)
            row = np.asarray([r.field() for _ in range(width)], np.uint64)
            n_path = r.u64()
            _guard(n_path, 64)
            path = (
                np.stack([r.digest() for _ in range(n_path)])
                if n_path
                else np.zeros((0, 8), np.uint32)
            )
            commit_openings.append((row, path))
        query_proofs.append(QueryProof(input_openings, commit_openings))
    if not r.done():
        raise VerificationError("InvalidProofShape", "trailing bytes")
    return Proof(
        active=active,
        commitments=Commitments(s1, s2, qc),
        intermediate_accumulators=accs,
        log_degrees=log_degrees,
        preprocessed_opened=pre_opened,
        stage1_opened=s1_opened,
        stage2_opened=s2_opened,
        quotient_opened=q_opened,
        fri_proof=FriProof(
            commit_caps=commit_caps,
            commit_pow_witnesses=commit_pows,
            final_poly=final_poly,
            query_pow_witness=query_pow,
            query_proofs=query_proofs,
        ),
    )
