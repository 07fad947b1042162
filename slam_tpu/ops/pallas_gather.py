"""Pallas index gather/scatter -- the sparse tier beyond one-hot matmuls.

The one-hot incidence tier (``ops/indexing.py``) is ideal up to mid-size
graphs, but its ``(E, N)`` operators grow quadratically: at M10000 scale
they are ~0.5 GB each and dominate transfer and bandwidth.  These kernels
replace them with *direct indexed access*:

* the node array (``(N, K)`` -- at most a few MB even at 100k nodes) lives
  entirely in VMEM;
* edge indices arrive via ``PrefetchScalarGridSpec`` scalar prefetch (SMEM),
  so each row access is a scalar-indexed dynamic slice -- no XLA gather (a
  60-80 s compile apiece on this toolchain) and no Mosaic vector-gather
  (unsupported);
* gather walks its tile's rows with a ``fori_loop`` of dynamic-slice reads;
  scatter is a single-grid-step accumulation loop (read-modify-write is
  safe because one program instance owns the whole output).

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

GATHER_TILE = 512


def _gather_kernel(idx_ref, x_ref, out_ref):
    tile = out_ref.shape[0]
    base = pl.program_id(0) * tile

    def body(i, _):
        row = idx_ref[base + i]
        out_ref[pl.ds(i, 1), :] = x_ref[pl.ds(row, 1), :]
        return 0

    jax.lax.fori_loop(0, tile, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows(x, idx, interpret: bool = False):
    """``x[idx]`` for ``x (N, K)``, ``idx (E,)`` int32 -> ``(E, K)``."""
    E = idx.shape[0]
    K = x.shape[1]
    Ep = -(-E // GATHER_TILE) * GATHER_TILE
    idx_p = jnp.pad(idx.astype(jnp.int32), (0, Ep - E))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Ep // GATHER_TILE,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],  # whole x
        out_specs=pl.BlockSpec(
            (GATHER_TILE, K), lambda i, *_: (i, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Ep, K), x.dtype),
        interpret=interpret,
    )(idx_p, x)
    return out[:E]


def _scatter_kernel(idx_ref, n_real_ref, v_ref, out_ref):
    out_ref[:] = jnp.zeros_like(out_ref)
    e_total = v_ref.shape[0]
    n_real = n_real_ref[0]

    def body(i, _):
        @pl.when(i < n_real)
        def _():
            row = idx_ref[i]
            out_ref[pl.ds(row, 1), :] = (
                out_ref[pl.ds(row, 1), :] + v_ref[pl.ds(i, 1), :]
            )
        return 0

    jax.lax.fori_loop(0, e_total, body, 0)


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def scatter_add_rows(v, idx, n: int, interpret: bool = False):
    """``segment_sum(v, idx, n)`` for ``v (E, K)`` -> ``(n, K)``.

    Single grid step: the accumulation loop owns the whole output, so
    read-modify-write needs no atomics.
    """
    E, K = v.shape
    idx = idx.astype(jnp.int32)
    n_real = jnp.asarray([E], jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _scatter_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, K), v.dtype),
        interpret=interpret,
    )(idx, n_real, v)
