"""Fiat-Shamir challengers (host-side — tiny serial state, kept off-TPU by
design: device work happens in the 5 big stages between transcript
interactions, SURVEY.md §7.0).

Equivalent of p3-challenger (reference src/types.rs:10-13, 28-81):

  - ``ByteHashChallenger``: duplex-over-hash on bytes (HashChallenger<u8,
    Blake3, 32> semantics: observe clears the output buffer and appends to
    the input buffer; flush hashes the drained input, the output is also fed
    back as chaining input; sample pops from the end of the output buffer).
  - ``SerializingChallenger64``: field adapter over the byte challenger —
    u64 little-endian observation, rejection-sampled canonical field draws.
  - ``DuplexChallenger``: field-native sponge challenger for Poseidon2
    configs (reference src/test_circuits/baby_bear_config.rs:29-31).
  - deterministic grinding: sequential witness search from 0, so a 0-bit
    grind returns witness 0 — run-to-run proof determinism (the reference's
    DeterministicPow wrapper, src/types.rs:31-81).
"""

from __future__ import annotations

import copy
from typing import List, Sequence, Tuple

import numpy as np

from .fields.host import HostExtField, HostField
from .hash.blake3 import blake3_hash


class ByteHashChallenger:
    OUT_LEN = 32

    def __init__(self):
        self.input_buffer = bytearray()
        self.output_buffer: List[int] = []

    def clone(self) -> "ByteHashChallenger":
        c = ByteHashChallenger()
        c.input_buffer = bytearray(self.input_buffer)
        c.output_buffer = list(self.output_buffer)
        return c

    def observe(self, byte: int) -> None:
        self.output_buffer.clear()
        self.input_buffer.append(byte & 0xFF)

    def observe_slice(self, data: bytes) -> None:
        self.output_buffer.clear()
        self.input_buffer.extend(data)

    def _flush(self) -> None:
        out = blake3_hash(bytes(self.input_buffer))
        self.input_buffer.clear()
        self.output_buffer = list(out)
        self.input_buffer.extend(out)  # chaining values

    def sample(self) -> int:
        if not self.output_buffer:
            self._flush()
        return self.output_buffer.pop()

    def sample_array(self, n: int) -> bytes:
        return bytes(self.sample() for _ in range(n))


class SerializingChallenger64:
    """Field challenger over a byte challenger for 64-bit fields."""

    def __init__(self, field: HostField, ext: HostExtField, inner: ByteHashChallenger | None = None):
        self.F = field
        self.E = ext
        self.inner = inner or ByteHashChallenger()

    def clone(self) -> "SerializingChallenger64":
        return SerializingChallenger64(self.F, self.E, self.inner.clone())

    # -- observation ------------------------------------------------------
    def observe_bytes(self, data: bytes) -> None:
        self.inner.observe_slice(data)

    def observe_u64(self, v: int) -> None:
        self.inner.observe_slice(int(v).to_bytes(8, "little"))

    def observe_field(self, v: int) -> None:
        self.observe_u64(v % self.F.p)

    def observe_ext(self, v: Sequence[int]) -> None:
        for c in v:
            self.observe_field(c)

    def observe_commitment(self, cap: np.ndarray) -> None:
        """cap: (k, 8) uint32 digest words -> observed as raw bytes."""
        for row in np.atleast_2d(cap):
            self.observe_bytes(b"".join(int(w).to_bytes(4, "little") for w in row))

    # -- sampling ---------------------------------------------------------
    def sample_field(self) -> int:
        while True:
            v = int.from_bytes(self.inner.sample_array(8), "little")
            if v < self.F.p:
                return v

    def sample_ext(self) -> Tuple[int, ...]:
        return tuple(self.sample_field() for _ in range(self.E.D))

    def sample_bits(self, bits: int) -> int:
        assert 0 <= bits < 64
        return self.sample_field() & ((1 << bits) - 1)

    # -- grinding (deterministic; reference src/types.rs:43-81) ----------
    def grind(self, bits: int) -> int:
        w = 0
        while True:
            probe = self.clone()
            probe.observe_field(w)
            if probe.sample_bits(bits) == 0:
                ok = self.check_witness(bits, w)
                assert ok
                return w
            w += 1

    def check_witness(self, bits: int, witness: int) -> bool:
        self.observe_field(witness)
        return self.sample_bits(bits) == 0


class DuplexChallenger:
    """Field-native sponge challenger (p3 DuplexChallenger<F, Perm, 16, 8>).

    `permutation` maps a list of WIDTH canonical field ints to the same.
    """

    WIDTH = 16
    RATE = 8

    def __init__(self, field: HostField, ext: HostExtField, permutation):
        self.F = field
        self.E = ext
        self.perm = permutation
        self.state = [0] * self.WIDTH
        self.input_buffer: List[int] = []
        self.output_buffer: List[int] = []

    def clone(self) -> "DuplexChallenger":
        c = DuplexChallenger(self.F, self.E, self.perm)
        c.state = list(self.state)
        c.input_buffer = list(self.input_buffer)
        c.output_buffer = list(self.output_buffer)
        return c

    def _duplex(self) -> None:
        for i, v in enumerate(self.input_buffer):
            self.state[i] = v
        self.input_buffer.clear()
        self.state = self.perm(self.state)
        self.output_buffer = list(self.state[: self.RATE])

    # -- observation ------------------------------------------------------
    def observe_field(self, v: int) -> None:
        self.output_buffer.clear()
        self.input_buffer.append(v % self.F.p)
        if len(self.input_buffer) == self.RATE:
            self._duplex()

    def observe_u64(self, v: int) -> None:
        # split u64 into two 32-bit limbs (lo, hi) to stay injective for
        # any 31-bit field
        self.observe_field(int(v) & 0xFFFFFFFF)
        self.observe_field(int(v) >> 32)

    def observe_ext(self, v: Sequence[int]) -> None:
        for c in v:
            self.observe_field(c)

    def observe_commitment(self, cap: np.ndarray) -> None:
        """Poseidon2 commitments are field-element digests: (k, 8) canonical."""
        for row in np.atleast_2d(cap):
            for w in row:
                self.observe_field(int(w))

    def observe_bytes(self, data: bytes) -> None:
        for b in data:
            self.observe_field(b)

    # -- sampling ---------------------------------------------------------
    def sample_field(self) -> int:
        if self.input_buffer or not self.output_buffer:
            self._duplex()
        return self.output_buffer.pop()

    def sample_ext(self) -> Tuple[int, ...]:
        return tuple(self.sample_field() for _ in range(self.E.D))

    def sample_bits(self, bits: int) -> int:
        return self.sample_field() & ((1 << bits) - 1)

    def grind(self, bits: int) -> int:
        w = 0
        while True:
            probe = self.clone()
            probe.observe_field(w)
            if probe.sample_bits(bits) == 0:
                ok = self.check_witness(bits, w)
                assert ok
                return w
            w += 1

    def check_witness(self, bits: int, witness: int) -> bool:
        self.observe_field(witness)
        return self.sample_bits(bits) == 0
