"""The eager NumPy mirrors must stay BYTE-IDENTICAL to the jnp kernels.

Every hot prover stage has two implementations (CLAUDE.md): the jitted jnp
kernels (the TPU path, which also runs eagerly as the fallback) and exact
NumPy mirrors taken when not jitted.  MULTISTARK_NP_MIRRORS=0 is the
kill-switch; this pins full-proof byte equality between the two for both
the production (Goldilocks/Blake3) and genericity (BabyBear/Poseidon2)
configs, over a 2-circuit system with lookups and a preprocessed table."""

import numpy as np
import pytest

from multistark_tpu import expr as ex
from multistark_tpu.config import CommitmentParameters, FriParameters
from multistark_tpu.configs import BabyBearPoseidon2Config, GoldilocksBlake3Config
from multistark_tpu.system import CircuitInputs, System, SystemWitness

RNG = np.random.default_rng(31)
CHAN = 9
N = 32


def _build(config, p):
    user = CircuitInputs(
        main_width=3,
        constraints=[ex.main(0) * ex.main(1) - ex.main(2)],
        ext_constraints=[],
        lookups=[ex.Lookup.push(ex.Const(1), [ex.Const(CHAN), ex.main(0)])],
    )
    table = CircuitInputs(
        main_width=1,
        constraints=[],
        ext_constraints=[],
        lookups=[ex.Lookup.pull(ex.main(0), [ex.Const(CHAN), ex.preprocessed(0)])],
        preprocessed=np.arange(N, dtype=np.uint64).reshape(N, 1),
    )
    system, key = System.new(config, [user, table])
    a = RNG.integers(0, N, N, dtype=np.uint64)
    b = RNG.integers(0, 1 << 20, N, dtype=np.uint64)
    c = (a.astype(object) * b.astype(object)) % p
    trace = np.stack([a, b, np.asarray(c, np.uint64)], axis=1)
    mult = np.zeros(N, np.uint64)
    np.add.at(mult, a.astype(np.int64), 1)
    witness = SystemWitness.from_stage_1(
        [trace, mult.reshape(N, 1)], system, key
    )
    return system, key, witness


@pytest.mark.parametrize("which", ["goldilocks", "babybear"])
def test_np_mirrors_byte_identical(which, monkeypatch):
    if which == "goldilocks":
        config = GoldilocksBlake3Config(
            CommitmentParameters(2, 0), FriParameters(0, 2, 5, 2, 2)
        )
    else:
        config = BabyBearPoseidon2Config(
            CommitmentParameters(2, 0), FriParameters(0, 1, 5, 1, 1)
        )
    p = config.host_field.p
    system, key, witness = _build(config, p)

    monkeypatch.delenv("MULTISTARK_NP_MIRRORS", raising=False)
    proof_np = system.prove(key, witness)
    system.verify(proof_np)

    monkeypatch.setenv("MULTISTARK_NP_MIRRORS", "0")
    proof_jnp = system.prove(key, witness)
    system.verify(proof_jnp)

    assert proof_np.to_bytes(config) == proof_jnp.to_bytes(config)


@pytest.mark.skipif(
    not __import__("os").environ.get("MULTISTARK_SLOW"),
    reason="MULTISTARK_SLOW=1 to enable (the mirrors-off mesh cell compiles "
    "~5 min of eager SPMD programs on XLA:CPU)",
)
def test_mirror_mesh_matrix_byte_identical(monkeypatch):
    """The full 2x2 invariant (VERDICT r2 #9): {np mirrors on, off} x
    {mesh, no mesh} all produce the same proof bytes.  Under a mesh the
    mirrors are bypassed by design for the LDE-sized stages, so the
    mirrors-off cell additionally forces the eager sharded kernels through
    the small-domain eval path's fallback.  (The on-mirror mesh cells run
    in the default suite via tests/test_parallel.py.)"""
    import jax
    from jax.sharding import Mesh

    from multistark_tpu import parallel as par

    config = GoldilocksBlake3Config(
        CommitmentParameters(2, 0), FriParameters(0, 2, 5, 2, 2)
    )
    system, key, witness = _build(config, config.host_field.p)
    mesh = Mesh(np.array(jax.devices()[:8]), ("rows",))

    proofs = {}
    for mirrors in ("1", "0"):
        monkeypatch.setenv("MULTISTARK_NP_MIRRORS", mirrors)
        proofs[(mirrors, "plain")] = system.prove(key, witness).to_bytes(config)
        with par.use_mesh(mesh):
            proofs[(mirrors, "mesh")] = system.prove(key, witness).to_bytes(config)
    vals = set(proofs.values())
    assert len(vals) == 1, f"matrix cells diverge: { {k: hash(v) for k, v in proofs.items()} }"
