"""Pallas index gather/scatter -- the sparse tier beyond one-hot matmuls.

STATUS: interpret-tested and kept as the designed next tier, but NOT
auto-selected -- on the current axon remote-compile toolchain, per-element
scalar loops compile pathologically (a single 1024-iteration loop exceeded
8 minutes), so the production large-graph tier is instead device-built
bfloat16 one-hots (``ops/indexing.py::build_incidence_device``).  On a
standard libtpu toolchain these kernels are the better asymptotic answer.

The one-hot incidence tier (``ops/indexing.py``) is ideal up to mid-size
graphs, but its ``(E, N)`` operators grow quadratically: at M10000 scale
they are ~0.5 GB each and dominate bandwidth.  These kernels replace them
with *direct indexed access*:

* the node array (``(N, K)`` -- at most a few MB even at 100k nodes) lives
  entirely in VMEM;
* edge indices stream through SMEM one tile per grid step (SMEM is far too
  small for the whole index list), so each row access is a scalar-indexed
  dynamic slice -- no XLA gather (a 60-80 s compile apiece on this
  toolchain) and no Mosaic vector-gather (unsupported);
* gather walks its tile's rows with a ``fori_loop`` of dynamic-slice reads;
  scatter accumulates into ONE output block revisited across the
  (sequential) grid, zero-initialised on the first step.  Padded tail
  entries carry zero values at index 0, so no masking is needed.

Latency-bound scalar loops, but tiny ones: ~E iterations of a few cycles --
sub-millisecond at M10000 scale vs multi-ms one-hot matmuls, with zero HBM
operator traffic.  Exact (no matmul rounding).  ``interpret=True`` runs the
same kernels on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# int32 SMEM blocks must align to the XLA layout tile of 1024 elements.
TILE = 1024


def _gather_kernel(idx_ref, x_ref, out_ref):
    def body(i, _):
        row = idx_ref[i]
        out_ref[pl.ds(i, 1), :] = x_ref[pl.ds(row, 1), :]
        return 0

    jax.lax.fori_loop(0, out_ref.shape[0], body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows(x, idx, interpret: bool = False):
    """``x[idx]`` for ``x (N, K)``, ``idx (E,)`` int32 -> ``(E, K)``."""
    E = idx.shape[0]
    K = x.shape[1]
    Ep = -(-E // TILE) * TILE
    idx_p = jnp.pad(idx.astype(jnp.int32), (0, Ep - E))

    out = pl.pallas_call(
        _gather_kernel,
        grid=(Ep // TILE,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole x
        ],
        out_specs=pl.BlockSpec((TILE, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Ep, K), x.dtype),
        interpret=interpret,
    )(idx_p, x)
    return out[:E]


def _scatter_kernel(idx_ref, v_ref, out_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(i, _):
        row = idx_ref[i]
        out_ref[pl.ds(row, 1), :] = (
            out_ref[pl.ds(row, 1), :] + v_ref[pl.ds(i, 1), :]
        )
        return 0

    jax.lax.fori_loop(0, v_ref.shape[0], body, 0)


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def scatter_add_rows(v, idx, n: int, interpret: bool = False):
    """``segment_sum(v, idx, n)`` for ``v (E, K)`` -> ``(n, K)``.

    One output block revisited across the sequential grid: read-modify-write
    is race-free, and zero-padded tail entries add nothing.
    """
    E, K = v.shape
    Ep = -(-E // TILE) * TILE
    idx_p = jnp.pad(idx.astype(jnp.int32), (0, Ep - E))
    v_p = jnp.pad(v, ((0, Ep - E), (0, 0)))

    return pl.pallas_call(
        _scatter_kernel,
        grid=(Ep // TILE,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, K), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, K), v.dtype),
        interpret=interpret,
    )(idx_p, v_p)
