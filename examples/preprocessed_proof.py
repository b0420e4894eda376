"""Preprocessed byte range table + a Squares circuit whose result bytes are
range-checked via lookups (reference examples/preprocessed_proof.rs)."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from multistark_tpu import expr as ex
from multistark_tpu.air import Air, AirBuilder, LookupAir
from multistark_tpu.config import CommitmentParameters, FriParameters
from multistark_tpu.configs import GoldilocksBlake3Config
from multistark_tpu.prover import prove_multiple_claims
from multistark_tpu.system import System, SystemWitness
from multistark_tpu.verifier import verify_multiple_claims

BYTE_CHAN = 0


class ByteTableAir(Air):
    width = 1

    def preprocessed_trace(self):
        return np.arange(256, dtype=np.uint64).reshape(256, 1)

    def eval(self, builder: AirBuilder) -> None:
        pass


class SquaresAir(Air):
    """Columns (x, x^2, lo, hi, mult): x < 256, x^2 = lo + 256·hi with both
    result bytes pushed to the range table."""

    width = 5

    def eval(self, builder: AirBuilder) -> None:
        x, sq, lo, hi, mult = builder.main().row(0)
        builder.assert_eq(sq, x * x)
        builder.assert_eq(sq, lo + 256 * hi)
        builder.assert_bool(mult)


def main():
    config = GoldilocksBlake3Config(
        CommitmentParameters(log_blowup=2, cap_height=0),
        FriParameters.standard_fast(),
    )
    squares_lookups = [
        ex.Lookup.push(ex.main(4), [ex.Const(BYTE_CHAN), ex.main(2)]),
        ex.Lookup.push(ex.main(4), [ex.Const(BYTE_CHAN), ex.main(3)]),
        ex.Lookup.push(ex.main(4), [ex.Const(BYTE_CHAN), ex.main(0)]),
    ]
    table_lookups = [
        ex.Lookup.pull(ex.main(0), [ex.Const(BYTE_CHAN), ex.preprocessed(0)])
    ]
    system, key = System.new(
        config,
        [
            LookupAir(SquaresAir(), squares_lookups).to_circuit_inputs(),
            LookupAir(ByteTableAir(), table_lookups).to_circuit_inputs(),
        ],
    )

    xs = [3, 7, 200, 255, 16, 99, 250, 1]
    rows = np.zeros((8, 5), np.uint64)
    mult = np.zeros(256, np.uint64)
    for r, x in enumerate(xs):
        sq = x * x
        rows[r] = (x, sq, sq & 0xFF, sq >> 8, 1)
        for v in (sq & 0xFF, sq >> 8, x):
            mult[v] += 1
    witness = SystemWitness.from_stage_1([rows, mult.reshape(256, 1)], system, key)

    t0 = time.time()
    proof = prove_multiple_claims(system, key, witness, [])
    print(f"Proved in {time.time() - t0:.2f}s")
    verify_multiple_claims(system, [], proof)
    print("Verified")
    print(f"Proof size: {len(proof.to_bytes())} bytes")


if __name__ == "__main__":
    main()
