"""SE(3) manifold operations, residuals, and tangent-space retraction.

The reference is 2D-only; BASELINE.json's north star adds the sphere2500-class
SE(3) capability ("manifold retraction, quaternion params").  Poses are stored
as ``[x, y, z, qw, qx, qy, qz]`` with unit quaternions; updates live in the
6-dim right tangent space ``[dt, dtheta]`` via ``T <- T * Exp(xi)``.

Residual structure mirrors the SE(2) path (``Tcap^-1 (Ta^-1 Tb)``,
``ceres_error.cpp:87``): ``e = [trans(diff), Log(rot(diff))]`` with the exact
rotation log map.  Jacobians for the solver are produced by ``jax.jacfwd``
through the lifted residual (lift-solve-retract) -- batched and fused by XLA;
see ``solver/models.py``.

A small set of ``*_np`` NumPy helpers at the bottom serves the host-side
synthetic dataset generators.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------------------
# Quaternion primitives ([w, x, y, z], unit norm).
# ---------------------------------------------------------------------------

def quat_mul(p: Array, q: Array) -> Array:
    pw, px, py, pz = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            pw * qw - px * qx - py * qy - pz * qz,
            pw * qx + px * qw + py * qz - pz * qy,
            pw * qy - px * qz + py * qw + pz * qx,
            pw * qz + px * qy - py * qx + pz * qw,
        ],
        axis=-1,
    )


def quat_conj(q: Array) -> Array:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_rotate(q: Array, v: Array) -> Array:
    """Rotate vectors ``v [...,3]`` by unit quaternions ``q [...,4]``."""
    qv = q[..., 1:]
    w = q[..., 0:1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_exp(theta: Array) -> Array:
    """Exponential map: rotation vector ``theta [...,3]`` -> unit quaternion.

    Written with the double-where trick on the *squared* norm so forward- and
    reverse-mode derivatives are finite at theta = 0 (the point where the
    solver's lift-solve-retract Jacobians are evaluated); a naive
    ``norm(theta)`` has a NaN derivative there.
    """
    sq = jnp.sum(theta * theta, axis=-1, keepdims=True)
    small = sq < 1e-12
    sq_safe = jnp.where(small, 1.0, sq)
    angle = jnp.sqrt(sq_safe)
    half = 0.5 * angle
    # sin(t/2)/t and cos(t/2) with Taylor fallbacks smooth in sq.
    k = jnp.where(small, 0.5 - sq / 48.0, jnp.sin(half) / angle)
    w = jnp.where(small, 1.0 - sq / 8.0, jnp.cos(half))
    return jnp.concatenate([w, k * theta], axis=-1)


def quat_log(q: Array) -> Array:
    """Log map: unit quaternion -> rotation vector (angle * axis).

    Sign-canonicalised so the result is the minimal rotation; derivative-safe
    at the identity (same double-where construction as :func:`quat_exp`).
    """
    q = jnp.where(q[..., 0:1] < 0, -q, q)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    vec = q[..., 1:]
    sq = jnp.sum(vec * vec, axis=-1)
    small = sq < 1e-12
    n = jnp.sqrt(jnp.where(small, 1.0, sq))
    angle = 2.0 * jnp.arctan2(n, w)
    # Near identity: log ~= 2 * vec / w (smooth in sq).
    scale = jnp.where(
        small, 2.0 / jnp.maximum(w, 1e-6), angle / n
    )
    return scale[..., None] * vec


def quat_normalize(q: Array) -> Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# SE(3) poses [x y z qw qx qy qz].
# ---------------------------------------------------------------------------

def compose(p: Array, q: Array) -> Array:
    t = p[..., :3] + quat_rotate(p[..., 3:], q[..., :3])
    r = quat_mul(p[..., 3:], q[..., 3:])
    return jnp.concatenate([t, quat_normalize(r)], axis=-1)


def inverse(p: Array) -> Array:
    qc = quat_conj(p[..., 3:])
    return jnp.concatenate([-quat_rotate(qc, p[..., :3]), qc], axis=-1)


def relative(pa: Array, pb: Array) -> Array:
    return compose(inverse(pa), pb)


def retract(p: Array, xi: Array) -> Array:
    """Right-multiplicative retraction ``T * Exp([dt, dtheta])``."""
    dt = xi[..., :3]
    dth = xi[..., 3:]
    t = p[..., :3] + quat_rotate(p[..., 3:], dt)
    r = quat_normalize(quat_mul(p[..., 3:], quat_exp(dth)))
    return jnp.concatenate([t, r], axis=-1)


def residual(pa: Array, pb: Array, meas: Array) -> Array:
    """6-dim edge residual ``[trans(diff), Log(rot(diff))]`` with
    ``diff = meas^-1 (Ta^-1 Tb)`` -- the SE(3) analog of the reference's SE(2)
    residual structure."""
    diff = compose(inverse(meas), relative(pa, pb))
    return jnp.concatenate([diff[..., :3], quat_log(diff[..., 3:])], axis=-1)


# ---------------------------------------------------------------------------
# NumPy helpers for host-side dataset generation.
# ---------------------------------------------------------------------------

def quat_from_euler_np(roll, pitch, yaw):
    cr, sr = np.cos(roll / 2), np.sin(roll / 2)
    cp, sp = np.cos(pitch / 2), np.sin(pitch / 2)
    cy, sy = np.cos(yaw / 2), np.sin(yaw / 2)
    return np.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def _quat_mul_np(p, q):
    pw, px, py, pz = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return np.stack(
        [
            pw * qw - px * qx - py * qy - pz * qz,
            pw * qx + px * qw + py * qz - pz * qy,
            pw * qy - px * qz + py * qw + pz * qx,
            pw * qz + px * qy - py * qx + pz * qw,
        ],
        axis=-1,
    )


def _quat_rot_np(q, v):
    qv = q[..., 1:]
    w = q[..., 0:1]
    t = 2.0 * np.cross(qv, v)
    return v + w * t + np.cross(qv, t)


def compose_np(p, q):
    t = p[..., :3] + _quat_rot_np(p[..., 3:], q[..., :3])
    r = _quat_mul_np(p[..., 3:], q[..., 3:])
    r = r / np.linalg.norm(r, axis=-1, keepdims=True)
    return np.concatenate([t, r], axis=-1)


def inverse_np(p):
    qc = p[..., 3:] * np.array([1.0, -1.0, -1.0, -1.0])
    return np.concatenate([-_quat_rot_np(qc, p[..., :3]), qc], axis=-1)


def relative_np(pa, pb):
    return compose_np(inverse_np(pa), pb)


def quat_perturb_np(q, sigma, rng):
    """Right-perturb unit quaternions by a random small rotation."""
    dth = rng.normal(0, sigma, q[..., :3].shape)
    angle = np.linalg.norm(dth, axis=-1, keepdims=True)
    angle = np.maximum(angle, 1e-12)
    dq = np.concatenate(
        [np.cos(angle / 2), np.sin(angle / 2) * dth / angle], axis=-1
    )
    out = _quat_mul_np(q, dq)
    return out / np.linalg.norm(out, axis=-1, keepdims=True)
