"""Setup-time guard tests (reference src/system.rs:404-467): excessive
constraint degree rejected, same circuit accepted at larger blowup,
mismatched preprocessed/main heights rejected."""

import numpy as np
import pytest

from multistark_tpu import expr as ex
from multistark_tpu.config import CommitmentParameters, FriParameters
from multistark_tpu.configs import GoldilocksBlake3Config
from multistark_tpu.prover import prove_multiple_claims
from multistark_tpu.system import CircuitInputs, System, SystemWitness
from multistark_tpu.verifier import verify_multiple_claims


def config_with_blowup(b):
    return GoldilocksBlake3Config(
        CommitmentParameters(log_blowup=b, cap_height=0),
        FriParameters(0, 1, 4, 1, 1),
    )


def degree5_inputs():
    x = ex.main(0)
    return CircuitInputs(2, [x * x * x * x * x - ex.main(1)], [], [])


class TestSetupGuards:
    def test_excessive_degree_rejected(self):
        """degree 5 -> quotient degree 4 > 2^1 at log_blowup=1."""
        with pytest.raises(ValueError, match="raise log_blowup"):
            System.new(config_with_blowup(1), [degree5_inputs()])

    def test_same_circuit_accepted_at_larger_blowup(self):
        config = config_with_blowup(2)
        system, key = System.new(config, [degree5_inputs()])
        trace = np.asarray([[x, pow(x, 5, config.host_field.p)] for x in (2, 3, 4, 5)], np.uint64)
        witness = SystemWitness.from_stage_1([trace], system, key)
        proof = system.prove_multiple_claims(key, witness, [])
        system.verify_multiple_claims([], proof)

    def test_mismatched_preprocessed_height_rejected(self):
        config = config_with_blowup(2)
        ci = CircuitInputs(
            1, [], [], [],
            preprocessed=np.arange(8, dtype=np.uint64).reshape(8, 1),
        )
        system, key = System.new(config, [ci])
        with pytest.raises(AssertionError, match="preprocessed height"):
            SystemWitness.from_stage_1([np.zeros((4, 1), np.uint64)], system, key)

    def test_non_power_of_two_height_rejected(self):
        config = config_with_blowup(2)
        system, key = System.new(config, [degree5_inputs()])
        with pytest.raises(AssertionError, match="power of two"):
            SystemWitness.from_stage_1([np.zeros((3, 2), np.uint64)], system, key)
