"""Proof serialization — bincode-compatible layout (reference
src/prover.rs:202-243: `standard().with_little_endian().with_fixed_int_encoding()`).

Field-by-field layout, mirroring the Rust `Proof` struct's declaration order
(bincode fixint encodes struct fields in order, `Vec<T>` as u64-LE length +
elements, `Option<T>` as one tag byte (0|1) + value, `bool`/`u8` as one
byte, fixed-size arrays with no length prefix):

  Proof (prover.rs:215-238):
    active                     Vec<bool>            u64 len + 1 byte each
    commitments                Commitments<Com>     3 caps in declaration
                               (prover.rs:203-210)  order: stage_1_trace,
                                                    stage_2_trace,
                                                    quotient_chunks
    intermediate_accumulators  Vec<Challenge>       u64 len + D field elems
                                                    each (BinomialExtension-
                                                    Field serializes as the
                                                    fixed [F; D] array)
    log_degrees                Vec<u8>              u64 len + raw bytes
    opening_proof              PcsProof<SC>         FRI proof (below)
    quotient_opened_values     OpenedValuesForRound Vec<Vec<Vec<Challenge>>>
    preprocessed_opened_values Option<...>          1 tag byte + value
    stage_1_opened_values      OpenedValuesForRound
    stage_2_opened_values      OpenedValuesForRound

  Com (Merkle cap): u64 count + 32-byte digests (Vec<Hash>; the digest
  itself is a fixed [u8; 32] / [F; 8] with no inner prefix).

  FRI proof (p3-fri FriProof declaration order):
    commit_phase_commits   Vec<Com>
    commit_pow_witnesses   Vec<u64>   (argumentcomputer commit-phase PoW
                                      extension; placement next to the
                                      commits is this library's choice —
                                      the one field not pinnable from the
                                      reference source offline)
    query_proofs           Vec<QueryProof>
    final_poly             Vec<Challenge>
    pow_witness            u64

  QueryProof:
    input_proof            Vec<BatchOpening>
      BatchOpening:
        opened_values      Vec<Vec<F>>     (per matrix: u64 len + values)
        opening_proof      Vec<[u8; 32]>   (path: u64 len + raw digests)
    commit_phase_openings  Vec<CommitPhaseProofStep>
      CommitPhaseProofStep:
        opened_row         Vec<F>          (flattened ext values)
        opening_proof      Vec<[u8; 32]>

Base field elements are u64 LE for 64-bit fields (Goldilocks) and u32 LE
for 31-bit fields (BabyBear), matching p3's serde of the canonical value.

Deserialization is defensive: every length is bounds-checked and field
counts are cross-checked by verify_shape afterwards.  Byte equality against
Rust-serialized fixtures is testable as soon as such fixtures exist (none
can be generated in this offline environment — no Rust toolchain).
"""

from __future__ import annotations

import struct
from typing import List, Tuple

import numpy as np

from .errors import VerificationError
from .merkle import BatchOpening
from .pcs import FriProof, QueryProof


class _Writer:
    def __init__(self, field_bytes: int = 8):
        self.parts: List[bytes] = []
        self.field_bytes = field_bytes

    def u8(self, v: int):
        self.parts.append(struct.pack("<B", v))

    def u64(self, v: int):
        self.parts.append(struct.pack("<Q", v))

    def field(self, v: int):
        self.parts.append(int(v).to_bytes(self.field_bytes, "little"))

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
    def __init__(self, data: bytes, field_bytes: int = 8):
        self.data = data
        self.pos = 0
        self.field_bytes = field_bytes

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
        return int.from_bytes(self._take(self.field_bytes), "little")

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


def _write_pows(w: _Writer, fp):
    w.u64(len(fp.commit_pow_witnesses))
    for pw in fp.commit_pow_witnesses:
        w.u64(pw)


def _write_fri_proof(w: _Writer, fp, pow_placement: str = "after_commits"):
    """FRI proof in p3-fri's FriProof field order (see module doc).

    `pow_placement` is the TranscriptProfile.commit_pow_witness_placement
    seam: where the fork-added Vec<u64> of commit-phase PoW witnesses sits
    (not placeable from the reference source offline)."""
    assert pow_placement in ("after_commits", "before_pow_witness", "after_pow_witness")
    w.u64(len(fp.commit_caps))
    for cap in fp.commit_caps:
        w.cap(cap)
    if pow_placement == "after_commits":
        _write_pows(w, fp)
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
    w.u64(len(fp.final_poly))
    for c in fp.final_poly:
        w.ext(c)
    if pow_placement == "before_pow_witness":
        _write_pows(w, fp)
    w.u64(fp.query_pow_witness)
    if pow_placement == "after_pow_witness":
        _write_pows(w, fp)


def _read_pows(r: _Reader):
    n_pows = r.u64()
    _guard(n_pows, 64)
    return [r.u64() for _ in range(n_pows)]


def _read_fri_proof(r: _Reader, D: int, pow_placement: str = "after_commits"):
    from .pcs import FriProof, QueryProof

    n_caps = r.u64()
    _guard(n_caps, 64)
    commit_caps = [r.cap() for _ in range(n_caps)]
    commit_pows = _read_pows(r) if pow_placement == "after_commits" else None
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
    n_final = r.u64()
    _guard(n_final)
    final_poly = [r.ext(D) for _ in range(n_final)]
    if pow_placement == "before_pow_witness":
        commit_pows = _read_pows(r)
    query_pow = r.u64()
    if pow_placement == "after_pow_witness":
        commit_pows = _read_pows(r)
    return FriProof(
        commit_caps=commit_caps,
        commit_pow_witnesses=commit_pows,
        final_poly=final_poly,
        query_pow_witness=query_pow,
        query_proofs=query_proofs,
    )


def proof_to_bytes(
    proof, field_bytes: int = 8, ext_degree: int | None = None,
    pow_placement: str = "after_commits",
) -> bytes:
    """Serialize in the Rust Proof struct's bincode field order
    (prover.rs:215-238; see module doc).  `field_bytes` is the base-field
    serialized width (8 for Goldilocks, 4 for BabyBear); `pow_placement`
    is the TranscriptProfile seam for commit_pow_witnesses."""
    w = _Writer(field_bytes)
    D = ext_degree or (
        len(proof.intermediate_accumulators[0]) if proof.intermediate_accumulators else 2
    )
    w.u64(len(proof.active))
    for b in proof.active:
        w.u8(1 if b else 0)
    w.cap(proof.commitments.stage_1_trace)
    w.cap(proof.commitments.stage_2_trace)
    w.cap(proof.commitments.quotient_chunks)
    w.u64(len(proof.intermediate_accumulators))
    for a in proof.intermediate_accumulators:
        w.ext(a)
    w.u64(len(proof.log_degrees))
    for ld in proof.log_degrees:
        w.u8(ld)
    _write_fri_proof(w, proof.fri_proof, pow_placement)
    _write_opened(w, proof.quotient_opened, D)
    # preprocessed is Option<OpenedValuesForRound> in the Rust struct
    if proof.preprocessed_opened:
        w.u8(1)
        _write_opened(w, proof.preprocessed_opened, D)
    else:
        w.u8(0)
    _write_opened(w, proof.stage1_opened, D)
    _write_opened(w, proof.stage2_opened, D)
    return w.bytes()


def proof_from_bytes(data: bytes, system) -> "Proof":
    from .prover import Commitments, Proof

    cfg = getattr(system, "config", None)
    field_bytes = 8
    D = 2
    pow_placement = "after_commits"
    if cfg is not None:
        field_bytes = (cfg.host_field.p.bit_length() + 7) // 8
        field_bytes = 8 if field_bytes > 4 else 4
        D = cfg.extension_params.degree
        profile = getattr(cfg, "transcript_profile", None)
        if profile is not None:
            pow_placement = profile.commit_pow_witness_placement
    r = _Reader(data, field_bytes)
    n_circuits = r.u64()
    _guard(n_circuits)
    active = [bool(r.u8()) for _ in range(n_circuits)]
    s1 = r.cap()
    s2 = r.cap()
    qc = r.cap()
    n_accs = r.u64()
    _guard(n_accs)
    accs = [r.ext(D) for _ in range(n_accs)]
    n_ld = r.u64()
    _guard(n_ld)
    log_degrees = [r.u8() for _ in range(n_ld)]
    fri_proof = _read_fri_proof(r, D, pow_placement)
    q_opened = _read_opened(r, D)
    pre_tag = r.u8()
    if pre_tag not in (0, 1):
        raise VerificationError("InvalidProofShape", "bad Option tag")
    pre_opened = _read_opened(r, D) if pre_tag else []
    s1_opened = _read_opened(r, D)
    s2_opened = _read_opened(r, D)
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
        fri_proof=fri_proof,
    )
