"""Non-SLOW smoke of jitted fused programs at tiny size (round-4 advisor:
the default suite ran only the eager np mirrors, so a fused-path regression
could ship past the normal CI run; the full byte-identity matrix stays in
test_jitted_path.py under MULTISTARK_SLOW=1).

Forces the TPU-side jit policy in-process for the merged multi-tree query
gather (`mmcs_gather_many`, the FRI query-phase kernel: every tree's
sibling paths + opened rows in ONE dispatch) and pins it byte-identical
against the eager np-mirror path.

The fused whole-tree commit / whole-stage LDE / jitted-hash programs are
deliberately NOT compiled here: XLA:CPU takes minutes (or deadlocks) on
those integer fusions (CLAUDE.md), which is exactly why they live behind
MULTISTARK_SLOW=1.  The gather program is pure dynamic-slice + transpose
(compiles in seconds) yet still exercises the cached_jit plumbing (hoisted
constants, tuple-of-trees arguments) end to end.

Matches the reference's determinism contract (src/types.rs:31-81) at the
MMCS layer (p3-merkle-tree role).
"""

import jax
import numpy as np

from multistark_tpu import utils
from multistark_tpu.fields.device import GL_OPS
from multistark_tpu.fields.host import GOLDILOCKS
from multistark_tpu.merkle import Blake3FieldHasher, MerkleMmcs

RNG = np.random.default_rng(23)


def rand_mat(w, n):
    return RNG.integers(0, GOLDILOCKS.p, size=(w, n), dtype=np.uint64)


def test_merged_gather_fused_program_matches_eager(monkeypatch):
    mats_np = [rand_mat(2, 64), rand_mat(3, 16)]
    dmats = [GL_OPS.from_np(m) for m in mats_np]
    mmcs = MerkleMmcs(Blake3FieldHasher(GL_OPS))

    # commit on the eager path (the fused tree program is SLOW-gated) ...
    cap, data = mmcs.commit(dmats)
    cap2, data2 = mmcs.commit([GL_OPS.from_np(rand_mat(1, 32))])
    ref = mmcs.open_batch(data, np.asarray([0, 5, 63, 17]))
    ref2 = mmcs.open_batch(data2, np.asarray([31, 2]))

    # ... then force the jitted merged gather across BOTH trees
    utils.jit_enabled()
    monkeypatch.setattr(utils, "_JIT_ENABLED", True)
    idx = np.asarray([0, 5, 63, 17], np.int64)
    idx2 = np.asarray([31, 2], np.int64)
    fetched = jax.device_get(mmcs.gather_device_many([data, data2], [idx, idx2]))
    openings = mmcs.assemble(data, len(idx), fetched[0])
    openings2 = mmcs.assemble(data2, len(idx2), fetched[1])

    for got, want in zip(openings + openings2, ref + ref2):
        np.testing.assert_array_equal(got.path, want.path)
        for g, w in zip(got.opened_rows, want.opened_rows):
            np.testing.assert_array_equal(g, w)

    # and every fused-gather opening verifies against its cap
    for i, q in enumerate(idx):
        assert mmcs.verify_batch(cap, data.dims, int(q), openings[i])
    for i, q in enumerate(idx2):
        assert mmcs.verify_batch(cap2, data2.dims, int(q), openings2[i])
