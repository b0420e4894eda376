"""Distributed four-step NTT over a device mesh (SURVEY.md §7.1 step 10).

Decompose a length-n DFT as an (n1, n2) matrix transform with the row-block
axis sharded across devices:

    x[a + n1·b]  (a ∈ [n1), b ∈ [n2))   — stored as the (n1, n2) matrix,
                                           device d owns rows a ∈ d-th block
    1. local DFT_n2 along b (each device transforms its own rows)
    2. multiply by twiddles  w_n^{a·k2}
    3. all-to-all transpose over ICI  (shard axis a -> shard axis k2)
    4. local DFT_n1 along a

    output:  X[k2 + n2·k1] = out[k1, k2], sharded along k2.

This is the FFT analog of sequence parallelism: butterfly phases are local,
one all-to-all exchanges shards between phases (SURVEY.md §5 long-context
row).  Round 1 validates the scheme on the virtual CPU mesh; wiring it into
the prover's LDE path is round-2 work.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields import npref
from ..fields.host import HostField
from .ntt import NttEngine, np_powers


def _np_mul(host: HostField):
    return npref.gl_mul if host.name == "Goldilocks" else npref.bb_mul


def four_step_twiddles(host: HostField, log_n1: int, log_n2: int) -> np.ndarray:
    """(n1, n2) table of w_n^{a·k2} (uint64)."""
    n1, n2 = 1 << log_n1, 1 << log_n2
    w = host.two_adic_generator(log_n1 + log_n2)
    mul = _np_mul(host)
    row = np_powers(host, w, n2)  # w^k2
    out = np.ones((n1, n2), np.uint64)
    cur = row
    for a in range(1, n1):
        out[a] = cur
        cur = mul(cur, row)
    return out


def distributed_dft(
    engine: NttEngine,
    mesh: Mesh,
    axis: str,
    x,  # field planes, shape (w, n) natural coefficient order
    log_n1: int,
    log_n2: int,
):
    """DFT of each row-polynomial with the n1 axis sharded over `axis`.

    Input: natural coefficients (w, n).  Output: the (w, n1, n2) matrix
    out[:, k1, k2] = X[k2 + n2·k1], sharded along k2 (the LAST axis after
    the all-to-all).  Callers needing natural order reshape/transpose."""
    F = engine.F
    host = engine.host
    n1, n2 = 1 << log_n1, 1 << log_n2
    tw = F.from_np(four_step_twiddles(host, log_n1, log_n2))
    n_dev = mesh.shape[axis]
    assert n1 % n_dev == 0 and n2 % n_dev == 0

    in_specs = (
        jax.tree.map(lambda _: P(None, axis, None), x),
        jax.tree.map(lambda _: P(axis, None), tw),
    )
    out_specs = jax.tree.map(lambda _: P(None, None, axis), x)

    @partial(jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    def kernel(x_local, tw_local):
        # x_local planes: (w, n1/D, n2); tw_local: (n1/D, n2)
        # 1. local DFT_n2 along the last axis of each (a) row
        y = engine._dit(engine._unbrev(x_local, log_n2), log_n2, inverse=False)
        # 2. twiddle w_n^{a·k2}
        y = F.mul(y, jax.tree.map(lambda t: t[None, :, :], tw_local))
        # 3. all-to-all: shard axis a -> shard axis k2
        y = jax.tree.map(
            lambda a: jax.lax.all_to_all(a, axis, split_axis=2, concat_axis=1, tiled=True),
            y,
        )
        # y planes now (w, n1, n2/D): 4. local DFT_n1 along axis 1
        y = jax.tree.map(lambda a: jnp.swapaxes(a, 1, 2), y)  # (w, n2/D, n1)
        y = engine._dit(engine._unbrev(y, log_n1), log_n1, inverse=False)
        y = jax.tree.map(lambda a: jnp.swapaxes(a, 1, 2), y)  # (w, n1, n2/D)
        return y

    # reshape input to the (w, n1, n2) matrix view: index a + n1·b -> [a, b]
    x3 = jax.tree.map(lambda p: p.reshape(p.shape[0], -1, n1).swapaxes(1, 2), x)
    return kernel(x3, tw)


def reference_dft_natural(engine: NttEngine, x, log_n: int):
    """Single-device natural-order DFT for cross-checking."""
    return engine.dft_natural(x, log_n)
