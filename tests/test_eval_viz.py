"""Evaluation metrics and plotter smoke tests."""

import os

import numpy as np

from slam_tpu.eval import metrics
from slam_tpu.io import g2o
from slam_tpu.viz import plot


def test_rpe_translation_invariant():
    rng = np.random.default_rng(0)
    p = rng.normal(size=(40, 3))
    q = p.copy()
    q[:, :2] += np.array([5.0, -2.0])  # global translation: RPE unchanged
    assert metrics.rpe(q, p) < 1e-12
    q2 = p + rng.normal(scale=0.1, size=p.shape)
    assert metrics.rpe(q2, p) > 0.01


def test_collapse_score_detects_implosion():
    rng = np.random.default_rng(1)
    ref = rng.normal(scale=10.0, size=(100, 3))
    collapsed = rng.normal(scale=0.5, size=(100, 3))
    assert metrics.collapse_score(collapsed, ref) < 0.2
    assert 0.8 < metrics.collapse_score(ref, ref) <= 1.0


def test_ate_3d_alignment():
    rng = np.random.default_rng(2)
    p = rng.normal(size=(30, 7))
    # Rotate xyz rigidly; ATE after alignment ~ 0.
    from scipy.spatial.transform import Rotation
    R = Rotation.from_euler("xyz", [0.3, -0.5, 1.0]).as_matrix()
    q = p.copy()
    q[:, :3] = p[:, :3] @ R.T + np.array([1.0, 2.0, 3.0])
    assert metrics.ate(q, p) < 1e-8


def test_plotters_write_pngs(tmp_path):
    poses = np.random.default_rng(0).normal(size=(50, 3))
    init = tmp_path / "init_nodes.txt"
    opt = tmp_path / "opt_nodes.txt"
    g2o.write_nodes(str(init), poses)
    g2o.write_nodes(str(opt), poses + 0.1)
    out = plot.plot_trajectories(str(init), str(opt), str(tmp_path / "t.png"))
    assert os.path.getsize(out) > 1000

    # Dashboard with minimal stats file.
    with open(tmp_path / "method4_stats.txt", "w") as f:
        f.write("# layer_id visits total_reward avg_reward normalized_reward "
                "total_edges inherited_edges added_edges\n")
        f.write("L1 5 1.5 0.3 0.9 4 0 4\n")
        f.write("L2 2 -0.5 -0.25 -0.3 2 1 1\n")
    out = plot.plot_method4_dashboard(str(tmp_path))
    assert os.path.getsize(out) > 1000


def test_rpe_rigid_invariance_and_sensitivity():
    """Frame-local RPE (Kummerle-style) is invariant to any global rigid
    transform -- including rotation, which the old world-frame displacement
    version was not -- and rpe_rot/ate_rot catch rotation-field damage that
    translation-only ATE can miss."""
    rng = np.random.default_rng(3)
    p = np.cumsum(rng.normal(size=(60, 3)), axis=0)
    p[:, 2] = np.cumsum(rng.normal(scale=0.1, size=60))
    th = 0.7
    c, s = np.cos(th), np.sin(th)
    q = p.copy()
    q[:, :2] = p[:, :2] @ np.array([[c, -s], [s, c]]).T + np.array([3.0, 4.0])
    q[:, 2] = p[:, 2] + th
    assert metrics.rpe(q, p) < 1e-12
    assert metrics.rpe_rot(q, p) < 1e-12
    assert metrics.ate_rot(q, p) < 1e-12
    # Bend the heading field mid-trajectory: rotational metrics fire.
    q2 = q.copy()
    q2[30:, 2] += 0.4
    assert metrics.rpe_rot(q2, p) > 0.01
    assert metrics.ate_rot(q2, p) > 0.1


def test_rpe_se3_identity_and_perturbation():
    rng = np.random.default_rng(4)
    p = np.zeros((25, 7))
    p[:, :3] = np.cumsum(rng.normal(size=(25, 3)), axis=0)
    # random unit quaternions
    quat = rng.normal(size=(25, 4))
    p[:, 3:7] = quat / np.linalg.norm(quat, axis=1, keepdims=True)
    assert metrics.rpe(p, p) == 0.0
    assert metrics.rpe_rot(p, p) < 1e-12
    assert metrics.ate_rot(p, p) < 1e-9
    q = p.copy()
    q[:, :3] += rng.normal(scale=0.05, size=(25, 3))
    assert metrics.rpe(q, p) > 0.01
