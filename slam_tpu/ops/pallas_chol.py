"""Pallas batched micro-panel Cholesky + triangular inverse (VERDICT r4
task 4: one measured shot at the small-op wall).

Context (measured, ``results/ROUND4.md`` section 1): the partitioned-Schur
bench iteration spends ~6.5 ms of its 12 ms in interior Cholesky /
triangular work running at 0.18-0.39 TF/s, and batch-scaling shows wall
time LINEAR in batch for the native panel ops -- XLA executes
``cho_factor``/``TriangularSolve`` SERIALLY across the (batch * blocks)
axis.  The panel-blocked path (``solver/blocked_chol.py``) already turns
everything EXCEPT the diagonal micro-panel into batched MXU matmuls; the
micro-panel factor + inverse are the remaining batch-serialized natives.

This kernel replaces exactly those two ops.  Key layout idea: a
column-by-column Cholesky is inherently a length-p sequential chain, so
the kernel puts the BATCH on the LANE axis -- operands live as
``(p, p, M)`` with ``M`` (batch*blocks, 128 on the bench workload) on
lanes -- and every sequential trip processes ALL matrices at full
(sublane x lane) tile utilization, instead of one matrix at a time
serialized 128x.  No per-element scalar loops (CLAUDE.md): each
``fori_loop`` trip is whole-tile ``(p, M)`` / ``(p, p, M)`` arithmetic
via ``dynamic_slice`` + masked updates.

Exactness is pinned vs the native ops in ``tests/test_pallas_chol.py``
(interpret mode on CPU, device mode in the TPU lane).  The in-context
measurement record lives in ``results/ROUND5.md``.

Reference role: the SPARSE_NORMAL_CHOLESKY factorization inside every
solve (``/root/reference/DCS-ceres/main.cpp:156``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(a_ref, l_ref, inv_ref):
    """Factor (p, p, M) SPD micro-panels; emit lower factors + inverses.

    Batch on lanes: every trip's tiles are (p, M) -- p sublanes x M lanes.
    """
    p = a_ref.shape[0]
    A0 = a_ref[:]                                   # (p, p, M)
    rows3 = jax.lax.broadcasted_iota(jnp.int32, A0.shape, 0)
    cols3 = jax.lax.broadcasted_iota(jnp.int32, A0.shape, 1)
    rows2 = jax.lax.broadcasted_iota(jnp.int32, A0.shape[::2], 0)  # (p, M)

    def chol_body(j, carry):
        # Mask-reduce formulation throughout: Mosaic TC has no
        # dynamic_slice lowering, and masked whole-tile reductions keep
        # every trip in plain VPU ops.
        A, L = carry
        # Column j across the whole batch: (p, M).
        colj = jnp.sum(jnp.where(cols3 == j, A, 0.0), axis=1)
        # Pivot entry of that column: (1, M) -> rsqrt.
        djj = jnp.sum(jnp.where(rows2 == j, colj, 0.0), axis=0,
                      keepdims=True)
        inv_sqrt = jax.lax.rsqrt(djj)               # (1, M)
        lcol = jnp.where(rows2 >= j, colj * inv_sqrt, 0.0)   # (p, M)
        L = jnp.where(cols3 == j, lcol[:, None, :], L)
        # Trailing update: A -= lcol lcol^T on rows>j, cols>j.
        upd = lcol[:, None, :] * lcol[None, :, :]   # (p, p, M)
        A = A - jnp.where((rows3 > j) & (cols3 > j), upd, 0.0)
        return A, L

    _, L = jax.lax.fori_loop(
        0, p, chol_body, (A0, jnp.zeros_like(A0)))
    l_ref[:] = L

    def inv_body(i, X):
        # Row i of L over columns, as a (p, M) tile (mask-reduce).
        Lrow = jnp.sum(jnp.where(rows3 == i, L, 0.0), axis=0)     # (p, M)
        Lrow_strict = jnp.where(rows2 < i, Lrow, 0.0)
        # acc[c, m] = sum_k Lrow_strict[k, m] * X[k, c, m]
        acc = jnp.sum(Lrow_strict[:, None, :] * X, axis=0)        # (p, M)
        Lii = jnp.sum(jnp.where(rows2 == i, Lrow, 0.0), axis=0,
                      keepdims=True)                              # (1, M)
        e_i = jnp.where(rows2 == i, 1.0, 0.0)                     # (p, M)
        xrow = (e_i - acc) / Lii
        X = jnp.where(rows3 == i, xrow[None, :, :], X)
        return X

    inv_ref[:] = jax.lax.fori_loop(
        0, p, inv_body, jnp.zeros_like(A0))


@functools.partial(jax.jit, static_argnames=("interpret",))
def micro_chol_inv(A: jax.Array, interpret: bool = False):
    """Cholesky + lower-triangular inverse of batched (M, p, p) SPD
    micro-panels in ONE kernel pass, batch-on-lanes.

    Returns ``(L, inv)`` with the same ``(M, p, p)`` layout as the native
    ops it replaces (``blocked_chol._panel_factor``).  The host-side
    transposes to/from the lane-major ``(p, p, M)`` kernel layout are
    bandwidth-trivial (p*p*M*4 bytes) and fuse into neighbours.
    """
    M, p, _ = A.shape
    At = jnp.transpose(A, (1, 2, 0))                # (p, p, M)
    L, inv = pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct(At.shape, At.dtype),
            jax.ShapeDtypeStruct(At.shape, At.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(At)
    return (jnp.transpose(L, (2, 0, 1)), jnp.transpose(inv, (2, 0, 1)))


def _make_folded(interpret: bool):
    """Build a ``custom_vmap``-wrapped ``micro_chol_inv`` whose batching
    rule FOLDS the mapped axis into the kernel's lane axis.

    This is the r5 §2 fix for the measured vmap lane starvation: JAX's
    default pallas_call batching rule lowers a mapped axis to a GRID
    dimension, so under the production vmap-over-seeds each kernel
    invocation saw only the within-problem panel batch (P of B*P
    matrices; 16/128 lane occupancy on the bench workload).  The custom
    rule reshapes (B, M, p, p) -> (B*M, p, p) instead, so one kernel
    pass runs every matrix at full lane occupancy -- no new kernel, the
    (p, p, M) layout already takes arbitrary M."""
    from jax import custom_batching

    @custom_batching.custom_vmap
    def folded(A):
        return micro_chol_inv(A, interpret=interpret)

    @folded.def_vmap
    def _rule(axis_size, in_batched, A):  # noqa: ANN001 (jax protocol)
        if not in_batched[0]:
            out = folded(A)
            return out, (False, False)
        B, M, p, _ = A.shape
        L, inv = folded(A.reshape(B * M, p, p))
        return ((L.reshape(B, M, p, p), inv.reshape(B, M, p, p)),
                (True, True))

    return folded


micro_chol_inv_folded = _make_folded(False)
micro_chol_inv_folded_interpret = _make_folded(True)
