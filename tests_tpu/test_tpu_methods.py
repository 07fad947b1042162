"""TPU-lane gates for the fused method-3/4 scan engines (VERDICT r3 #9).

The CPU suite pins fused == host at f64 (tests/test_methods.py INTEL-slice
gates); the fused engines are the DEFAULT on TPU yet their last recorded
device run was r1.  These tests re-check the decision-sequence equality ON
CHIP at f32 -- the production configuration.

Run with ``SLAM_TPU_TPU_TESTS=1 python -m pytest tests_tpu/ -q``.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def intel_slice():
    """Same real-INTEL prefix as the CPU gate (~300 nodes, 40 closures)."""
    from slam_tpu.graph import PoseGraph
    from slam_tpu.io import g2o

    g = g2o.load_g2o(g2o.find_dataset("INTEL"))
    ij, et = np.asarray(g.edges_ij), np.asarray(g.edge_type)
    closures = np.where(et != 0)[0]
    maxn = int(ij[closures[:40]].max()) + 1
    keep = (ij[:, 0] < maxn) & (ij[:, 1] < maxn)
    sub = PoseGraph(
        poses=np.asarray(g.poses)[:maxn],
        edges_ij=ij[keep],
        edges_meas=np.asarray(g.edges_meas)[keep],
        edges_info=np.asarray(g.edges_info)[keep],
        edge_type=et[keep],
    )
    return sub.add_random_outliers(4, seed=7)


def _solver():
    from slam_tpu.config import SolverConfig

    # f32 on the device backend -- the production method-3/4 config.
    return SolverConfig(linear_solver="dense", dtype="float32")


def test_fused_layering_on_device_matches_host(intel_slice):
    """Method 3: fused scan engine (TPU default) == host manager, run on
    the SAME device/precision -- decisions, layer count, best layer."""
    from slam_tpu.config import LayeringConfig
    from slam_tpu.methods.layering import LayeringManager
    from slam_tpu.methods.layering_fused import FusedLayeringManager
    from slam_tpu.utils.logging import RunLogger

    cfg = LayeringConfig(local_iters=2, max_layers=10)
    host = LayeringManager(
        intel_slice, cfg, _solver(), RunLogger(echo=False)).run()
    fused = FusedLayeringManager(
        intel_slice, cfg, _solver(), RunLogger(echo=False)).run()
    assert fused.assignments == host.assignments
    assert fused.best_layer == host.best_layer
    assert len(fused.layers) == len(host.layers)
    np.testing.assert_allclose(fused.poses, host.poses, atol=5e-4)


def test_fused_mcts_on_device_matches_host(intel_slice):
    """Method 4: fused MCTS engine == host manager on chip."""
    from slam_tpu.config import MctsConfig
    from slam_tpu.methods.mcts import MctsManager
    from slam_tpu.methods.mcts_fused import FusedMctsManager
    from slam_tpu.utils.logging import RunLogger

    cfg = MctsConfig(local_iters=2, max_layers=10)
    host = MctsManager(
        intel_slice, cfg, _solver(), RunLogger(echo=False)).run()
    fused = FusedMctsManager(
        intel_slice, cfg, _solver(), RunLogger(echo=False)).run()
    assert fused.assignments == host.assignments
    assert fused.best_layer == host.best_layer
    assert fused.most_visited_layer == host.most_visited_layer
    assert fused.most_edges_layer == host.most_edges_layer
    for fl, hl in zip(fused.layers.values(), host.layers.values()):
        assert fl.visits == hl.visits


def test_fused_layering_exact_schur_eval_on_device(intel_slice):
    """Method 3 with the candidate evaluations forced to the PRODUCTION
    exact-Schur config ON CHIP (VERDICT r4 task 7: the path behind the
    M3500 method-3 wall was CLI-covered only; the r4 lane gates ran
    ``linear_solver='dense'``).  Schur and dense are both EXACT solvers,
    so the decision stream must match the dense on-chip run."""
    from slam_tpu.config import LayeringConfig
    from slam_tpu.methods.layering_fused import FusedLayeringManager
    from slam_tpu.utils.logging import RunLogger

    dense = FusedLayeringManager(
        intel_slice, LayeringConfig(local_iters=2, max_layers=10),
        _solver(), RunLogger(echo=False)).run()
    schur = FusedLayeringManager(
        intel_slice,
        LayeringConfig(local_iters=2, max_layers=10,
                       eval_linear="schur", eval_schur_blocks=8),
        _solver().replace(linear_solver="schur"),
        RunLogger(echo=False)).run()
    assert schur.assignments == dense.assignments
    assert schur.best_layer == dense.best_layer
    assert len(schur.layers) == len(dense.layers)
    np.testing.assert_allclose(schur.poses, dense.poses, atol=5e-3)
