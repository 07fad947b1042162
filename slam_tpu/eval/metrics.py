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


def rpe(poses: np.ndarray, ref: np.ndarray, delta: int = 1) -> float:
    """RMSE of relative displacement error over index-delta pairs.

    Invariant to global translation (not rotation: displacements are
    compared in the world frame -- a simple drift measure, intentionally
    cheaper than the full frame-local RPE)."""
    k = 2 if poses.shape[1] <= 3 else 3
    p = np.asarray(poses, float)[:, :k]
    q = np.asarray(ref, float)[:, :k]
    dp = p[delta:] - p[:-delta]
    dq = q[delta:] - q[:-delta]
    return float(np.sqrt(np.mean(np.sum((dp - dq) ** 2, axis=1))))


def collapse_score(poses: np.ndarray, ref: np.ndarray) -> float:
    """Spread ratio (optimized / reference trajectory std).  Values near 1
    mean intact topology; << 1 means the map imploded (the reference's
    'collapse' failure mode)."""
    k = 2 if poses.shape[1] <= 3 else 3
    p = np.asarray(poses, float)[:, :k]
    q = np.asarray(ref, float)[:, :k]
    return float(np.std(p) / (np.std(q) + 1e-30))
