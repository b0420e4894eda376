"""Proof byte-format robustness: round-trip stability and adversarial
truncation/garbage never crash (reference verifier.rs:852-912 family)."""

import numpy as np
import pytest

from multistark_tpu import expr as ex
from multistark_tpu.config import CommitmentParameters, FriParameters
from multistark_tpu.configs import GoldilocksBlake3Config
from multistark_tpu.errors import VerificationError
from multistark_tpu.prover import Proof, prove_multiple_claims
from multistark_tpu.system import CircuitInputs, System, SystemWitness
from multistark_tpu.verifier import verify_multiple_claims


@pytest.fixture(scope="module")
def proved():
    config = GoldilocksBlake3Config(
        CommitmentParameters(2, 0), FriParameters(0, 1, 4, 1, 1)
    )
    a, b = ex.main(0), ex.main(1)
    system, key = System.new(config, [CircuitInputs(2, [a * a - b], [], [])])
    tr = np.asarray([[3, 9], [5, 25], [2, 4], [7, 49]], np.uint64)
    witness = SystemWitness.from_stage_1([tr], system, key)
    proof = prove_multiple_claims(system, key, witness, [])
    return system, proof


class TestSerialization:
    def test_roundtrip_stable(self, proved):
        system, proof = proved
        data = proof.to_bytes()
        p2 = Proof.from_bytes(data, system)
        verify_multiple_claims(system, [], p2)
        assert p2.to_bytes() == data

    def test_truncations_rejected(self, proved):
        system, proof = proved
        data = proof.to_bytes()
        for cut in [0, 1, 7, len(data) // 3, len(data) - 1]:
            with pytest.raises(VerificationError):
                Proof.from_bytes(data[:cut], system)

    def test_trailing_bytes_rejected(self, proved):
        system, proof = proved
        with pytest.raises(VerificationError):
            Proof.from_bytes(proof.to_bytes() + b"\x00", system)

    def test_bitflips_never_crash(self, proved):
        """Any single-byte corruption either fails to parse or fails to
        verify — never crashes with a non-VerificationError."""
        system, proof = proved
        data = bytearray(proof.to_bytes())
        rng = np.random.default_rng(4)
        for _ in range(40):
            i = int(rng.integers(0, len(data)))
            orig = data[i]
            data[i] ^= 0xFF
            try:
                p = Proof.from_bytes(bytes(data), system)
                verify_multiple_claims(system, [], p)
                # an accepted proof must round-trip to different-but-valid
                # bytes only if the flip hit redundant encoding — with this
                # layout that never happens:
                raise AssertionError(f"corrupted byte {i} accepted")
            except VerificationError:
                pass
            finally:
                data[i] = orig

    def test_garbage_rejected(self, proved):
        system, _ = proved
        rng = np.random.default_rng(9)
        for n in [0, 10, 1000]:
            blob = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            with pytest.raises(VerificationError):
                Proof.from_bytes(blob, system)

    def test_mutation_sweep(self, proved):
        """~1k-mutant fuzz of the deserialize→verify pipeline (reference
        verifier.rs:852-912 adversarial family): random single-BIT flips,
        multi-byte stomps, truncations, extensions, and splices of a valid
        proof must every one be rejected with VerificationError — never
        accepted, never an unexpected exception type."""
        system, proof = proved
        base = proof.to_bytes()
        L = len(base)
        rng = np.random.default_rng(0xF00D)

        def mutants():
            for _ in range(700):  # single bit flips
                i = int(rng.integers(0, L))
                b = bytearray(base)
                b[i] ^= 1 << int(rng.integers(0, 8))
                yield bytes(b)
            for _ in range(100):  # multi-byte stomps
                i = int(rng.integers(0, L))
                k = int(rng.integers(1, 9))
                b = bytearray(base)
                b[i : i + k] = rng.integers(0, 256, min(k, L - i), dtype=np.uint8).tobytes()
                yield bytes(b)
            for _ in range(100):  # truncations
                yield base[: int(rng.integers(0, L))]
            for _ in range(50):  # extensions
                k = int(rng.integers(1, 64))
                yield base + rng.integers(0, 256, k, dtype=np.uint8).tobytes()
            for _ in range(50):  # splices (duplicate an internal window)
                i, j = sorted(int(x) for x in rng.integers(0, L, 2))
                yield base[:i] + base[j:] if i != j else base[:-1]

        for m_idx, blob in enumerate(mutants()):
            if blob == base:
                continue  # a stomp can regenerate the original bytes
            try:
                p = Proof.from_bytes(blob, system)
                verify_multiple_claims(system, [], p)
            except VerificationError:
                continue
            except Exception as e:  # pragma: no cover - the failure we hunt
                raise AssertionError(
                    f"mutant {m_idx}: unexpected {type(e).__name__}: {e}"
                ) from e
            raise AssertionError(f"mutant {m_idx} accepted")
