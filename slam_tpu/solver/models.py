"""Edge-measurement models: the manifold-specific surface the solver needs.

The Gauss-Newton/LM machinery (linearize, linear solvers, trust-region loop)
is dimension-agnostic; everything manifold-specific funnels through one of
these model classes, passed as a *static* argument so jit specialises on it.

* :class:`SE2Model` -- D=3 additive parameters, exactly the reference's
  parameterisation (raw ``double[3]`` blocks, ``graph.h:10``), closed-form
  analytic Jacobians.
* :class:`SE3Model` -- D_param=7 (quaternion), D_tangent=6, right-retraction;
  Jacobians by forward-mode autodiff through the lifted residual
  (lift-solve-retract), batched with vmap and fused by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from slam_tpu.geometry import se2, se3

Array = jax.Array


class SE2Model:
    """SE(2): tangent == parameters, additive retraction."""

    tangent_dim = 3      # per-node unknowns
    residual_dim = 3
    pose_dim = 3         # storage width
    dcs_dims = 2         # DCS uses ex^2 + ey^2 (ceres_error.cpp:186)

    @staticmethod
    def residual(pa, pb, meas):
        return se2.residual(pa, pb, meas)

    @staticmethod
    def residual_and_jacobians(pa, pb, meas):
        return se2.residual_and_jacobians(pa, pb, meas)

    @staticmethod
    def retract(poses, delta):
        return poses + delta


class SE3Model:
    """SE(3): quaternion storage, 6-dim right tangent."""

    tangent_dim = 6
    residual_dim = 6
    pose_dim = 7
    dcs_dims = 3  # translation part of the residual

    @staticmethod
    def residual(pa, pb, meas):
        return se3.residual(pa, pb, meas)

    @staticmethod
    def residual_and_jacobians(pa, pb, meas):
        def lifted(xi_a, xi_b, pa1, pb1, m1):
            return se3.residual(
                se3.retract(pa1, xi_a), se3.retract(pb1, xi_b), m1
            )

        zero = jnp.zeros(pa.shape[:-1] + (6,), pa.dtype)
        e = se3.residual(pa, pb, meas)
        jac = jax.vmap(jax.jacfwd(lifted, argnums=(0, 1)))
        # vmap over the edge axis; inputs already batched.
        Ja, Jb = jac(zero, zero, pa, pb, meas)
        return e, Ja, Jb

    @staticmethod
    def retract(poses, delta):
        return se3.retract(poses, delta)
