"""Exactness gates for the batch-on-lanes Pallas micro-panel Cholesky
(``ops/pallas_chol.py``) and its blocked-path integration (interpret mode
on the CPU lane; the device run + in-context measurement live in the TPU
lane / results/ROUND5.md)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slam_tpu.ops.pallas_chol import micro_chol_inv
from slam_tpu.solver import blocked_chol as bc


def _spd_batch(m, p, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(m, p, p))
    A = A @ np.swapaxes(A, -1, -2) + p * np.eye(p)
    return A.astype(dtype)


@pytest.mark.parametrize("p", [8, 32])
def test_micro_chol_inv_matches_numpy(p):
    A = _spd_batch(12, p)
    L, inv = micro_chol_inv(jnp.asarray(A), interpret=True)
    L_ref = np.linalg.cholesky(A.astype(np.float64))
    np.testing.assert_allclose(np.asarray(L), L_ref, rtol=0, atol=2e-4)
    eye = np.einsum("mij,mjk->mik", np.asarray(inv, np.float64), L_ref)
    np.testing.assert_allclose(
        eye, np.broadcast_to(np.eye(p), eye.shape), rtol=0, atol=2e-4)
    # Strict upper triangles are exactly zero.
    iu = np.triu_indices(p, 1)
    assert np.all(np.asarray(L)[:, iu[0], iu[1]] == 0.0)
    assert np.all(np.asarray(inv)[:, iu[0], iu[1]] == 0.0)


def test_blocked_cholesky_pallas_micro_matches_native():
    """blocked_cholesky(pallas_micro=True) == the native-panel path on an
    interior-sized batch (the schur_solve contract)."""
    A = _spd_batch(16, 52, seed=3)   # n not a multiple of panel: pads
    ref = bc.blocked_cholesky(jnp.asarray(A), panel=16)
    pal = bc.blocked_cholesky(jnp.asarray(A), panel=16, pallas_micro=True)
    np.testing.assert_allclose(np.asarray(pal.L), np.asarray(ref.L),
                               rtol=0, atol=2e-4)
    rhs = jnp.asarray(_spd_batch(16, 52, seed=4)[..., :3])
    np.testing.assert_allclose(
        np.asarray(bc.cho_solve_blocked(pal, rhs)),
        np.asarray(bc.cho_solve_blocked(ref, rhs)),
        rtol=0, atol=5e-3)


def test_small_batch_falls_back_to_native():
    """lead < 8 (e.g. the separator factorization) must keep the native
    path -- the kernel would waste 15/16 of its lanes."""
    A = _spd_batch(2, 16, seed=5)
    pal = bc.blocked_cholesky(jnp.asarray(A), panel=16, pallas_micro=True)
    ref = bc.blocked_cholesky(jnp.asarray(A), panel=16)
    np.testing.assert_allclose(np.asarray(pal.L), np.asarray(ref.L),
                               rtol=0, atol=1e-6)
