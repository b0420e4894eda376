"""Distributed four-step NTT vs single-device reference (SURVEY.md §7.1
step 10).  Gated: multi-device executions can hit this environment's
transient XLA:CPU executor deadlock (see CLAUDE.md), so the default suite
stays single-device; run with MULTISTARK_SLOW=1."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("MULTISTARK_SLOW") != "1",
    reason="multi-device execution; set MULTISTARK_SLOW=1",
)


def test_four_step_matches_reference():
    import jax
    from jax.sharding import Mesh

    from multistark_tpu.fields.device import GL_OPS
    from multistark_tpu.fields.host import GOLDILOCKS
    from multistark_tpu.ntt import get_engine
    from multistark_tpu.ntt.distributed import distributed_dft

    eng = get_engine(GL_OPS)
    log_n1, log_n2 = 3, 4
    n = 1 << (log_n1 + log_n2)
    rng = np.random.default_rng(2)
    coeffs = rng.integers(0, GOLDILOCKS.p, (3, n), dtype=np.uint64)
    x = GL_OPS.from_np(coeffs)
    n_dev = min(8, jax.device_count())
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("rows",))
    out = distributed_dft(eng, mesh, "rows", x, log_n1, log_n2)
    got = GL_OPS.to_np(out)
    ref = GL_OPS.to_np(eng.dft_natural(x, log_n1 + log_n2))
    want = ref.reshape(3, 1 << log_n1, 1 << log_n2)
    np.testing.assert_array_equal(got, want)
