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
