"""Robust kernel tests: exact reference formulas and autodiff consistency."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.geometry import se2
from slam_tpu.robust import kernels


def test_huber_matches_ceres_definition():
    delta = 0.01
    s = jnp.asarray([0.0, 0.25e-4, 1e-4, 4e-4, 1.0, 100.0])
    rho = np.asarray(kernels.huber_rho(s, delta))
    s_np = np.asarray(s)
    expect = np.where(
        s_np <= delta**2, s_np, 2 * delta * np.sqrt(s_np) - delta**2
    )
    np.testing.assert_allclose(rho, expect, rtol=1e-12)
    # Weight is the derivative of rho.
    w = np.asarray(kernels.huber_weight(s, delta))
    grad = np.asarray(jax.vmap(jax.grad(lambda x: kernels.huber_rho(x, delta)))(s))
    np.testing.assert_allclose(w[1:], grad[1:], rtol=1e-10)


def test_huber_continuity_at_knee():
    delta = 0.01
    eps = 1e-12
    below = float(kernels.huber_rho(jnp.asarray(delta**2 - eps), delta))
    above = float(kernels.huber_rho(jnp.asarray(delta**2 + eps), delta))
    assert abs(below - above) < 1e-10


def test_dcs_psi_formula():
    """psi = min(1, sqrt(2 phi / (phi + ex^2 + ey^2))), phi = 0.5
    (``ceres_error.cpp:185-188``)."""
    phi = 0.5
    e = jnp.asarray([[0.0, 0.0, 5.0], [1.0, 1.0, 0.0], [0.3, 0.4, 0.1]])
    psi = np.asarray(kernels.dcs_psi(e, phi))
    # Angle-only error: res = 0 -> psi = min(1, sqrt(2)) = 1.
    assert psi[0] == 1.0
    np.testing.assert_allclose(psi[1], np.sqrt(2 * phi / (phi + 2.0)), rtol=1e-12)
    np.testing.assert_allclose(psi[2], min(1.0, np.sqrt(2 * phi / (phi + 0.25))), rtol=1e-12)


def test_dcs_scale_matches_autodiff_of_scaled_residual(rng):
    """The reference autodiffs *through* psi (``ceres_error.cpp:187-193``);
    our chain rule must match jacfwd of the scaled residual exactly."""
    phi = 0.5
    pa = jnp.asarray(rng.normal(size=(16, 3)))
    pb = jnp.asarray(rng.normal(size=(16, 3)))
    meas = jnp.asarray(rng.normal(size=(16, 3)) * 0.5)

    def scaled(pa1, pb1, m1):
        e = se2.residual(pa1, pb1, m1)
        return kernels.dcs_psi(e, phi) * e

    e, Ja, Jb = se2.residual_and_jacobians(pa, pb, meas)
    es, Jas, Jbs = kernels.dcs_scale(e, Ja, Jb, phi)
    Ja_ref = jax.vmap(jax.jacfwd(scaled, argnums=0))(pa, pb, meas)
    Jb_ref = jax.vmap(jax.jacfwd(scaled, argnums=1))(pa, pb, meas)
    np.testing.assert_allclose(np.asarray(es), np.asarray(jax.vmap(scaled)(pa, pb, meas)), atol=1e-12)
    np.testing.assert_allclose(np.asarray(Jas), np.asarray(Ja_ref), atol=1e-9)
    np.testing.assert_allclose(np.asarray(Jbs), np.asarray(Jb_ref), atol=1e-9)


def test_switch_scale_and_prior():
    e = jnp.asarray([[1.0, 2.0, 3.0]])
    Ja = jnp.eye(3)[None]
    Jb = 2 * jnp.eye(3)[None]
    s = jnp.asarray([0.5])
    se_, Jas, Jbs, Js = kernels.switch_scale(e, Ja, Jb, s)
    np.testing.assert_allclose(np.asarray(se_), [[0.5, 1.0, 1.5]])
    np.testing.assert_allclose(np.asarray(Jas), 0.5 * np.eye(3)[None])
    np.testing.assert_allclose(np.asarray(Js), np.asarray(e))
    # Prior: sqrt(lambda)(1 - s), ceres_error.cpp:315
    pr = kernels.switch_prior_residual(jnp.asarray([0.25]), 4.0)
    np.testing.assert_allclose(np.asarray(pr), [2.0 * 0.75])
