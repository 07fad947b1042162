"""Trajectory evaluation: ATE / RPE and convergence classification.

The reference's only evaluation is visual ("collapse" vs "converged"
topology, README.md:43).  BASELINE.json gates on quantitative ATE vs the
reference trajectories, so this module supplies:

* :func:`ate` -- absolute trajectory error (RMSE of xy / xyz) after rigid
  alignment (gauge-invariant).
* :func:`rpe` -- relative pose error over consecutive pairs.
* :func:`collapse_score` -- a quantitative stand-in for the reference's
  eyeball test: ratio of optimized trajectory "spread" to the clean
  reference's; a collapsed map concentrates mass near the origin.
"""

from __future__ import annotations

import numpy as np


def _align_2d(p: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Best-fit rigid transform of p onto q (2D Umeyama, no scale)."""
    pm, qm = p.mean(0), q.mean(0)
    pc, qc = p - pm, q - qm
    sxx = float(np.sum(pc[:, 0] * qc[:, 0] + pc[:, 1] * qc[:, 1]))
    sxy = float(np.sum(pc[:, 0] * qc[:, 1] - pc[:, 1] * qc[:, 0]))
    th = np.arctan2(sxy, sxx)
    c, s = np.cos(th), np.sin(th)
    R = np.array([[c, -s], [s, c]])
    return pc @ R.T + qm


def _align_3d(p: np.ndarray, q: np.ndarray) -> np.ndarray:
    """3D Umeyama alignment (SVD, no scale, reflection-safe)."""
    pm, qm = p.mean(0), q.mean(0)
    pc, qc = p - pm, q - qm
    U, _, Vt = np.linalg.svd(pc.T @ qc)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    S = np.diag([1.0, 1.0, d])
    R = Vt.T @ S @ U.T
    return pc @ R.T + qm


def ate(poses: np.ndarray, ref: np.ndarray, align: bool = True) -> float:
    """RMSE of translational error after optional rigid alignment."""
    k = 2 if poses.shape[1] <= 3 else 3
    p = np.asarray(poses, float)[:, :k]
    q = np.asarray(ref, float)[:, :k]
    if align:
        p = _align_2d(p, q) if k == 2 else _align_3d(p, q)
    return float(np.sqrt(np.mean(np.sum((p - q) ** 2, axis=1))))


def _se2_rel(p: np.ndarray, delta: int):
    """Frame-local relative transforms of an (N,3) SE(2) trajectory:
    returns (t_rel (M,2) expressed in frame i, dtheta (M,))."""
    a, b = p[:-delta], p[delta:]
    dt_w = b[:, :2] - a[:, :2]
    c, s = np.cos(a[:, 2]), np.sin(a[:, 2])
    # R(theta_i)^T @ dt_w
    t_rel = np.stack([c * dt_w[:, 0] + s * dt_w[:, 1],
                      -s * dt_w[:, 0] + c * dt_w[:, 1]], axis=1)
    dth = b[:, 2] - a[:, 2]
    return t_rel, np.arctan2(np.sin(dth), np.cos(dth))


def _quat_mul(q1, q2):
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return np.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def _quat_rotate(q, v):
    """Rotate vectors v by quaternions q (w,x,y,z)."""
    w, xyz = q[..., :1], q[..., 1:]
    t = 2.0 * np.cross(xyz, v)
    return v + w * t + np.cross(xyz, t)


def _quat_conj(q):
    return q * np.array([1.0, -1.0, -1.0, -1.0])


def _se3_rel(p: np.ndarray, delta: int):
    """Frame-local relative transforms of an (N,7) [xyz, wxyz] trajectory:
    returns (t_rel (M,3) in frame i, q_rel (M,4))."""
    a, b = p[:-delta], p[delta:]
    qa_inv = _quat_conj(a[:, 3:7])
    t_rel = _quat_rotate(qa_inv, b[:, :3] - a[:, :3])
    q_rel = _quat_mul(qa_inv, b[:, 3:7])
    return t_rel, q_rel


def _quat_angle(q):
    """Rotation angle (rad) of quaternions q (w,x,y,z)."""
    return 2.0 * np.arctan2(np.linalg.norm(q[..., 1:], axis=-1),
                            np.abs(q[..., 0]))


def rpe(poses: np.ndarray, ref: np.ndarray, delta: int = 1) -> float:
    """Translational relative pose error: RMSE over index-delta pairs of
    the FRAME-LOCAL relative translation error (the standard Kummerle
    et al. RPE definition, invariant to any global rigid transform):

        E_i = (Q_i^-1 Q_{i+d})^-1 (P_i^-1 P_{i+d}),   err_i = ||trans(E_i)||

    SE(2) for (N,3) inputs, SE(3) for (N,7) [xyz + wxyz quaternion]."""
    p = np.asarray(poses, float)
    q = np.asarray(ref, float)
    if p.shape[1] <= 3:
        tp, _ = _se2_rel(p, delta)
        tq, _ = _se2_rel(q, delta)
        # trans(E_i) = R(dth_q)^T (tp - tq); rotation preserves the norm,
        # so the RMSE only needs the frame-local translation difference.
        err = tp - tq
    else:
        tp, _ = _se3_rel(p, delta)
        tq, _ = _se3_rel(q, delta)
        err = tp - tq
    return float(np.sqrt(np.mean(np.sum(err ** 2, axis=1))))


def rpe_rot(poses: np.ndarray, ref: np.ndarray, delta: int = 1) -> float:
    """Rotational relative pose error: RMSE (rad) of the relative-rotation
    mismatch over index-delta pairs (frame-local, global-rigid-invariant)."""
    p = np.asarray(poses, float)
    q = np.asarray(ref, float)
    if p.shape[1] <= 3:
        _, ap = _se2_rel(p, delta)
        _, aq = _se2_rel(q, delta)
        d = ap - aq
        err = np.arctan2(np.sin(d), np.cos(d))
    else:
        _, qp = _se3_rel(p, delta)
        _, qq = _se3_rel(q, delta)
        err = _quat_angle(_quat_mul(_quat_conj(qq), qp))
    return float(np.sqrt(np.mean(err ** 2)))


def ate_rot(poses: np.ndarray, ref: np.ndarray) -> float:
    """Rotational ATE: RMSE (rad) of per-node heading/orientation error
    after removing the single best global rotation offset (gauge).

    Translation-only ATE can look fine while the rotation field is bent
    (sphere2500-class failure); this catches it."""
    p = np.asarray(poses, float)
    q = np.asarray(ref, float)
    if p.shape[1] <= 3:
        d = p[:, 2] - q[:, 2]
        d = np.arctan2(np.sin(d), np.cos(d))
        # remove the optimal global heading offset (circular mean of d)
        off = np.arctan2(np.mean(np.sin(d)), np.mean(np.cos(d)))
        e = np.arctan2(np.sin(d - off), np.cos(d - off))
        return float(np.sqrt(np.mean(e ** 2)))
    qrel = _quat_mul(_quat_conj(q[:, 3:7]), p[:, 3:7])
    # Optimal global offset: the chordal-mean rotation of the per-node
    # relative rotations (largest eigenvector of the quaternion outer-
    # product sum, sign-aligned).
    qs = qrel * np.sign(qrel[:, :1] + 1e-30)
    M = qs.T @ qs
    _, vecs = np.linalg.eigh(M)
    q_off = vecs[:, -1]
    err = _quat_angle(_quat_mul(qs, _quat_conj(q_off[None, :])))
    return float(np.sqrt(np.mean(err ** 2)))


def collapse_score(poses: np.ndarray, ref: np.ndarray) -> float:
    """Spread ratio (optimized / reference trajectory std).  Values near 1
    mean intact topology; << 1 means the map imploded (the reference's
    'collapse' failure mode)."""
    k = 2 if poses.shape[1] <= 3 else 3
    p = np.asarray(poses, float)[:, :k]
    q = np.asarray(ref, float)[:, :k]
    return float(np.std(p) / (np.std(q) + 1e-30))
