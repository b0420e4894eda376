"""The committed cross-implementation vectors (fixtures/reference_vectors.
json, reference src/types.rs:225-320 role) must match what the current code
generates — a transcript/serialization/hash change without a fixture
regeneration is exactly the silent rot this pins against (round-2 lesson:
the poseidon2 section went stale unnoticed)."""

import json
import os

import multistark_tpu.fixtures as fx

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_committed_vectors_match_generators():
    with open(os.path.join(HERE, "fixtures", "reference_vectors.json")) as f:
        committed = json.load(f)
    # normalize via a json round-trip (tuples -> lists, ints stay ints)
    generated = json.loads(json.dumps(fx.generate(), default=int))
    assert set(committed) == set(generated), (
        set(committed) ^ set(generated)
    )
    for section in generated:
        assert committed[section] == generated[section], (
            f"fixtures/{section} is stale — regenerate with "
            "`python -m multistark_tpu.fixtures > fixtures/reference_vectors.json`"
        )
