"""SE(2) geometry unit tests: closed-form identities and autodiff cross-checks.

The reference has no tests (SURVEY §4); these implement the numeric unit
layer the build plan calls for (SURVEY §7 step 2).
"""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.geometry import se2


def _rand(rng, shape):
    return jnp.asarray(rng.normal(size=shape))


def test_compose_inverse_identity(rng):
    p = _rand(rng, (16, 3))
    ident = se2.compose(p, se2.inverse(p))
    np.testing.assert_allclose(np.asarray(ident), 0.0, atol=1e-12)


def test_compose_associative(rng):
    p, q, r = (_rand(rng, (8, 3)) for _ in range(3))
    lhs = se2.compose(se2.compose(p, q), r)
    rhs = se2.compose(p, se2.compose(q, r))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-12)


def test_relative_matches_compose(rng):
    pa = _rand(rng, (8, 3))
    pb = _rand(rng, (8, 3))
    rel = se2.relative(pa, pb)
    np.testing.assert_allclose(
        np.asarray(se2.compose(pa, rel)), np.asarray(pb), atol=1e-12
    )


def test_residual_zero_at_exact_measurement(rng):
    pa = _rand(rng, (8, 3))
    pb = _rand(rng, (8, 3))
    meas = se2.relative(pa, pb)
    e = se2.residual(pa, pb, meas)
    np.testing.assert_allclose(np.asarray(e), 0.0, atol=1e-12)


def test_residual_matches_homogeneous_matrix_form(rng):
    """Cross-check against the reference's 3x3-matrix formulation
    (``ceres_error.cpp:87-91``): diff = Tcap^-1 (Ta^-1 Tb)."""

    def mat(p):
        c, s = np.cos(p[2]), np.sin(p[2])
        return np.array([[c, -s, p[0]], [s, c, p[1]], [0, 0, 1.0]])

    rs = np.random.default_rng(3)
    for _ in range(20):
        pa, pb, m = rs.normal(size=(3, 3))
        diff = (
            np.linalg.inv(mat(m))
            @ (np.linalg.inv(mat(pa)) @ mat(pb))
        )
        expect = np.array(
            [diff[0, 2], diff[1, 2], np.arcsin(np.clip(diff[1, 0], -1, 1))]
        )
        got = np.asarray(
            se2.residual(jnp.asarray(pa), jnp.asarray(pb), jnp.asarray(m))
        )
        # asin near +-1 amplifies the matrix-inverse rounding of the
        # reference-style computation; 1e-6 is the honest shared precision.
        np.testing.assert_allclose(got, expect, atol=1e-6)


def test_angle_fold_is_asin_sin():
    t = jnp.linspace(-7, 7, 101)
    np.testing.assert_allclose(
        np.asarray(se2.fold_angle(t)), np.arcsin(np.sin(np.asarray(t))),
        atol=1e-12,
    )


def test_analytic_jacobians_match_jacfwd(rng):
    pa = _rand(rng, (32, 3))
    pb = _rand(rng, (32, 3))
    meas = _rand(rng, (32, 3)) * 0.3
    e, Ja, Jb = se2.residual_and_jacobians(pa, pb, meas)
    Ja_ref = jax.vmap(jax.jacfwd(se2.residual, argnums=0))(pa, pb, meas)
    Jb_ref = jax.vmap(jax.jacfwd(se2.residual, argnums=1))(pa, pb, meas)
    np.testing.assert_allclose(
        np.asarray(e), np.asarray(se2.residual(pa, pb, meas)), atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(Ja), np.asarray(Ja_ref), atol=1e-10)
    np.testing.assert_allclose(np.asarray(Jb), np.asarray(Jb_ref), atol=1e-10)


def test_ate_invariant_to_rigid_transform(rng):
    p = _rand(rng, (50, 3))
    th, tx, ty = 0.7, 3.0, -2.0
    c, s = np.cos(th), np.sin(th)
    q = np.asarray(p).copy()
    q[:, 0], q[:, 1] = (
        c * np.asarray(p)[:, 0] - s * np.asarray(p)[:, 1] + tx,
        s * np.asarray(p)[:, 0] + c * np.asarray(p)[:, 1] + ty,
    )
    assert float(se2.ate(jnp.asarray(q), p)) < 1e-8
    assert float(se2.ate(jnp.asarray(q), p, align=False)) > 1.0
