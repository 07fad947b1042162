"""End-to-end tests for the method drivers (0/1/2 pipeline, 3 layering,
4 MCTS), including the reference-format ``save/`` artifacts."""

import os

import numpy as np
import pytest

from slam_tpu.config import (
    LayeringConfig,
    MctsConfig,
    RunConfig,
    SolverConfig,
)
from slam_tpu.eval import metrics
from slam_tpu.io import g2o, synthetic
from slam_tpu.methods.global_solve import run_global_solve
from slam_tpu.methods.layering import LayeringManager
from slam_tpu.methods.mcts import MctsManager
from slam_tpu.utils.logging import RunLogger


@pytest.fixture(scope="module")
def dirty_circle():
    graph, gt = synthetic.circle_se2(n=64, seed=1)
    return graph.add_random_outliers(6, seed=9), gt


_SOLVER = SolverConfig(linear_solver="dense", dtype="float64")


def test_global_solve_pipeline(tmp_path, dirty_circle):
    graph, gt = dirty_circle
    cfg = RunConfig(method=1, solver=_SOLVER, save_path=str(tmp_path))
    out = run_global_solve(graph, cfg)
    assert float(out.result.cost) < float(out.result.initial_cost)
    assert out.poses.shape == graph.poses.shape
    assert metrics.ate(out.poses, gt) < metrics.ate(graph.poses, gt)


def test_global_solve_schur_on_cpu(tmp_path, dirty_circle):
    """--linear-solver schur must work on the CPU backend too (full
    incidence is forced regardless of the backend's incidence auto-pick)."""
    graph, gt = dirty_circle
    cfg = RunConfig(method=1, solver=_SOLVER.replace(linear_solver="schur"),
                    save_path=str(tmp_path))
    out = run_global_solve(graph, cfg)
    assert float(out.result.cost) < float(out.result.initial_cost)


def test_layering_manager_runs(dirty_circle):
    graph, gt = dirty_circle
    mgr = LayeringManager(
        graph,
        LayeringConfig(local_iters=2, max_layers=8),
        _SOLVER,
        RunLogger(echo=False),
    )
    out = mgr.run()
    n_loops = graph.num_closure + graph.num_bogus
    assert len(out.assignments) == n_loops
    # Every loop edge assigned to a layer >= 1, and present in that
    # layer's mask.  (Layer masks can overlap: split children inherit the
    # parent's edges, ``layer_manager.cpp:89-90``.)
    g = graph.canonical_order()
    loop_pos = list(np.where(g.edge_type != 0)[0])
    for i, k in out.assignments:
        assert k >= 1
        assert out.layers[k].mask[loop_pos[i]]
    assert out.poses.shape == graph.poses.shape
    # Best layer should carry an optimised (improved or equal) trajectory.
    assert metrics.ate(out.poses, gt) <= metrics.ate(graph.poses, gt) * 1.5


def test_mcts_manager_runs(dirty_circle):
    graph, gt = dirty_circle
    mgr = MctsManager(
        graph,
        MctsConfig(local_iters=2, max_layers=8),
        _SOLVER,
        RunLogger(echo=False),
    )
    out = mgr.run()
    # Gated edges may be skipped (simple_layer_manager.cpp:92-95); the rest
    # are assigned.
    n_loops = graph.num_closure + graph.num_bogus
    assert 0 < len(out.assignments) <= n_loops
    assert out.best_layer in out.layers
    assert out.most_visited_layer in out.layers
    assert out.most_edges_layer in out.layers
    root = out.layers[mgr.root_id]
    assert root.visits >= len(out.assignments), "backprop reaches the root"


def test_method3_artifacts(tmp_path, monkeypatch, dirty_circle):
    graph, _ = dirty_circle
    from slam_tpu.methods import layering as L

    path = tmp_path / "circle.g2o"
    g2o.write_g2o(str(path), graph)
    cfg = RunConfig(
        dataset=str(path), num_outliers=0, method=3,
        save_path=str(tmp_path / "save"),
        solver=_SOLVER,
        layering=LayeringConfig(max_layers=6),
    )
    out = L.run_from_config(cfg)
    for f in ("init_nodes.txt", "init_edges.txt", "layers.txt",
              "opt_nodes.txt", "opt_nodes_method3.txt",
              "opt_nodes_most_selected.txt", "method3.log",
              "plot_best.png", "plot_most_selected.png"):
        assert os.path.exists(os.path.join(cfg.save_path, f)), f
    layers_txt = np.loadtxt(os.path.join(cfg.save_path, "layers.txt"), dtype=int)
    assert layers_txt.shape[1] == 2


def test_method4_artifacts(tmp_path, dirty_circle):
    graph, _ = dirty_circle
    from slam_tpu.methods import mcts as M

    path = tmp_path / "circle.g2o"
    g2o.write_g2o(str(path), graph)
    cfg = RunConfig(
        dataset=str(path), num_outliers=0, method=4,
        save_path=str(tmp_path / "save"),
        solver=_SOLVER,
        mcts=MctsConfig(max_layers=6),
    )
    out = M.run_from_config(cfg)
    for f in ("opt_nodes.txt", "opt_nodes_most_visited.txt",
              "opt_nodes_most_edges.txt", "method4_stats.txt",
              "method4.log", "method4_comparison.png"):
        assert os.path.exists(os.path.join(cfg.save_path, f)), f
    with open(os.path.join(cfg.save_path, "method4_stats.txt")) as f:
        header = f.readline()
    # Exact reference header (simple_layer_manager.cpp:766).
    assert header == (
        "# layer_id visits total_reward avg_reward normalized_reward "
        "total_edges inherited_edges added_edges\n"
    )


def test_method3_log_tags_match_reference(tmp_path, dirty_circle):
    """Method-3 logs carry the reference's bracketed tags
    (``layer_manager.cpp`` [uct] [conflict] [assign] [residual] [uct_update]
    and the split family)."""
    graph, _ = dirty_circle
    from slam_tpu.utils.logging import RunLogger

    log_path = tmp_path / "m3.log"
    mgr = LayeringManager(
        graph, LayeringConfig(max_layers=6), _SOLVER,
        RunLogger(str(log_path), echo=False),
    )
    mgr.run()
    text = log_path.read_text()
    for tag in ("[init]", "[uct]", "[conflict]", "[assign]", "[residual]",
                "[uct_update]", "[finish]", "[summary]"):
        assert tag in text, tag


def test_method4_log_tags_match_reference(tmp_path, dirty_circle):
    graph, _ = dirty_circle
    from slam_tpu.utils.logging import RunLogger

    log_path = tmp_path / "m4.log"
    mgr = MctsManager(
        graph, MctsConfig(max_layers=6), _SOLVER,
        RunLogger(str(log_path), echo=False),
    )
    mgr.run()
    text = log_path.read_text()
    for tag in ("[init]", "[residual]", "[split_check]", "[reward]",
                "[backprop]", "[summary]"):
        assert tag in text, tag


def test_fused_layering_matches_host(dirty_circle):
    """The single-program (lax.scan) method 3 reproduces the host-driven
    manager's decision sequence and final state exactly (f64/CPU)."""
    graph, _ = dirty_circle
    from slam_tpu.methods.layering_fused import FusedLayeringManager

    cfg = LayeringConfig(local_iters=2, max_layers=8)
    host = LayeringManager(graph, cfg, _SOLVER, RunLogger(echo=False)).run()
    fused = FusedLayeringManager(
        graph, cfg, _SOLVER, RunLogger(echo=False)
    ).run()

    assert fused.assignments == host.assignments
    assert fused.best_layer == host.best_layer
    assert fused.most_selected_layer == host.most_selected_layer
    assert len(fused.layers) == len(host.layers)
    for fl, hl in zip(fused.layers, host.layers):
        np.testing.assert_array_equal(fl.mask, hl.mask)
        np.testing.assert_allclose(fl.poses, hl.poses, atol=1e-9)
        assert fl.visits == hl.visits
        np.testing.assert_allclose(
            fl.ema_residual, hl.ema_residual, atol=1e-9
        )
        np.testing.assert_allclose(
            fl.total_reward, hl.total_reward, atol=1e-9
        )
    np.testing.assert_allclose(fused.poses, host.poses, atol=1e-9)


def test_fused_layering_chunking_invariant(dirty_circle):
    """Chunked device calls (scan sliced at scan_chunk + live-mask padding)
    must not change any decision."""
    graph, _ = dirty_circle
    from slam_tpu.methods.layering_fused import FusedLayeringManager

    big = FusedLayeringManager(
        graph, LayeringConfig(local_iters=2, max_layers=8, scan_chunk=64),
        _SOLVER, RunLogger(echo=False),
    ).run()
    small = FusedLayeringManager(
        graph, LayeringConfig(local_iters=2, max_layers=8, scan_chunk=3),
        _SOLVER, RunLogger(echo=False),
    ).run()
    assert small.assignments == big.assignments
    assert small.best_layer == big.best_layer
    np.testing.assert_allclose(small.poses, big.poses, atol=0)


def test_fused_layering_adaptive_chunking_invariant(dirty_circle):
    """Adaptive chunking (scan_chunk=None: timed probe chunk, measured
    resize, MIN_CHUNK tail) must reproduce the static-chunk decisions
    exactly -- only the slicing differs, never the scan semantics."""
    graph, _ = dirty_circle
    from slam_tpu.methods.layering_fused import FusedLayeringManager

    cfg = LayeringConfig(local_iters=2, max_layers=8)
    static = FusedLayeringManager(
        graph, cfg, _SOLVER, RunLogger(echo=False)
    ).run()

    mgr = FusedLayeringManager(graph, cfg, _SOLVER, RunLogger(echo=False))
    mgr.scan_chunk = None  # setup resolves CPU default 64; force adaptive
    adaptive = mgr.run()

    # A tiny deadline pins the chunk at MIN_CHUNK for the whole run.
    import os
    mgr2 = FusedLayeringManager(graph, cfg, _SOLVER, RunLogger(echo=False))
    mgr2.scan_chunk = None
    os.environ["SLAM_TPU_CHUNK_DEADLINE_S"] = "1e-9"
    try:
        tiny = mgr2.run()
    finally:
        del os.environ["SLAM_TPU_CHUNK_DEADLINE_S"]

    for out in (adaptive, tiny):
        assert out.assignments == static.assignments
        assert out.best_layer == static.best_layer
        np.testing.assert_allclose(out.poses, static.poses, atol=0)


def test_fused_mcts_matches_host(dirty_circle):
    """The single-program (lax.scan) method 4 reproduces the host-driven
    MCTS manager's decision sequence and final tree exactly (f64/CPU)."""
    graph, _ = dirty_circle
    from slam_tpu.methods.mcts_fused import FusedMctsManager

    cfg = MctsConfig(local_iters=2, max_layers=8)
    host = MctsManager(graph, cfg, _SOLVER, RunLogger(echo=False)).run()
    fused = FusedMctsManager(
        graph, cfg, _SOLVER, RunLogger(echo=False)
    ).run()

    assert fused.assignments == host.assignments
    assert fused.best_layer == host.best_layer
    assert fused.most_visited_layer == host.most_visited_layer
    assert fused.most_edges_layer == host.most_edges_layer
    assert set(fused.layers) == set(host.layers)
    for lid, hl in host.layers.items():
        fl = fused.layers[lid]
        assert fl.parent == hl.parent
        assert fl.visits == hl.visits
        assert sorted(fl.children) == sorted(hl.children)
        np.testing.assert_array_equal(fl.inherited, hl.inherited)
        np.testing.assert_array_equal(fl.added, hl.added)
        np.testing.assert_allclose(fl.total_reward, hl.total_reward,
                                   atol=1e-9)
        np.testing.assert_allclose(fl.poses, hl.poses, atol=1e-9)


def test_fused_layering_checkpoint_resume(tmp_path, dirty_circle):
    """A fused method-3 run interrupted mid-scan resumes from the chunk
    checkpoint and reproduces the uninterrupted result exactly."""
    graph, _ = dirty_circle
    from slam_tpu.methods import _fused_common, layering_fused
    from slam_tpu.methods.layering_fused import FusedLayeringManager

    cfg = LayeringConfig(local_iters=2, max_layers=8, scan_chunk=3)
    full = FusedLayeringManager(
        graph, cfg, _SOLVER, RunLogger(echo=False)
    ).run()

    ckpt = str(tmp_path / "m3.npz")
    calls = {"n": 0}
    orig = layering_fused._fused_chunk

    def dying(*a, **k):
        calls["n"] += 1
        if calls["n"] > 2:
            raise RuntimeError("simulated preemption")
        return orig(*a, **k)

    layering_fused._fused_chunk = dying
    try:
        with pytest.raises(RuntimeError):
            FusedLayeringManager(
                graph, cfg, _SOLVER, RunLogger(echo=False),
                checkpoint_path=ckpt,
            ).run()
    finally:
        layering_fused._fused_chunk = orig
    assert os.path.exists(ckpt)

    calls2 = {"n": 0}

    def counting(*a, **k):
        calls2["n"] += 1
        return orig(*a, **k)

    layering_fused._fused_chunk = counting
    try:
        resumed = FusedLayeringManager(
            graph, cfg, _SOLVER, RunLogger(echo=False),
            checkpoint_path=ckpt,
        ).run()
    finally:
        layering_fused._fused_chunk = orig

    n_chunks = -(-len(FusedLayeringManager(
        graph, cfg, _SOLVER, RunLogger(echo=False)
    ).loop_indices) // 3)
    assert calls2["n"] == n_chunks - 2, "resume skipped completed chunks"
    assert resumed.assignments == full.assignments
    assert resumed.best_layer == full.best_layer
    np.testing.assert_allclose(resumed.poses, full.poses, atol=0)


def test_fused_layering_schur_eval_matches_dense(dirty_circle):
    """eval_linear='schur' (exact partitioned eval solves sharing ONE
    partition across all masked candidate problems) reproduces the dense
    engine's decisions on CPU f64."""
    graph, _ = dirty_circle
    from slam_tpu.methods.layering_fused import FusedLayeringManager

    dense = FusedLayeringManager(
        graph, LayeringConfig(local_iters=2, max_layers=8),
        _SOLVER, RunLogger(echo=False),
    ).run()
    schur = FusedLayeringManager(
        graph,
        LayeringConfig(local_iters=2, max_layers=8, eval_linear="schur",
                       eval_schur_blocks=4),
        _SOLVER, RunLogger(echo=False),
    ).run()
    assert schur.assignments == dense.assignments
    assert schur.best_layer == dense.best_layer
    np.testing.assert_allclose(schur.poses, dense.poses, atol=1e-6)


@pytest.fixture(scope="module")
def intel_slice():
    """A real INTEL prefix (~300 nodes, 44 closures) + seeded outliers --
    the fused-vs-host equality gate on actual dataset structure, not just
    the synthetic circle (VERDICT r1 weak #6)."""
    from slam_tpu.graph import PoseGraph

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


@pytest.mark.slow
def test_fused_layering_matches_host_intel_slice(intel_slice):
    """Method 3 fused == host on real INTEL structure (decisions, layer
    state, poses)."""
    from slam_tpu.methods.layering_fused import FusedLayeringManager

    cfg = LayeringConfig(local_iters=2, max_layers=10)
    host = LayeringManager(
        intel_slice, cfg, _SOLVER, RunLogger(echo=False)).run()
    fused = FusedLayeringManager(
        intel_slice, cfg, _SOLVER, RunLogger(echo=False)).run()
    assert fused.assignments == host.assignments
    assert fused.best_layer == host.best_layer
    assert len(fused.layers) == len(host.layers)
    np.testing.assert_allclose(fused.poses, host.poses, atol=1e-9)


@pytest.mark.slow
def test_fused_mcts_matches_host_intel_slice(intel_slice):
    """Method 4 fused == host on real INTEL structure."""
    from slam_tpu.methods.mcts_fused import FusedMctsManager

    cfg = MctsConfig(local_iters=2, max_layers=10)
    host = MctsManager(
        intel_slice, cfg, _SOLVER, RunLogger(echo=False)).run()
    fused = FusedMctsManager(
        intel_slice, cfg, _SOLVER, RunLogger(echo=False)).run()
    assert fused.assignments == host.assignments
    assert fused.best_layer == host.best_layer
    assert fused.most_visited_layer == host.most_visited_layer
    assert fused.most_edges_layer == host.most_edges_layer
    for fl, hl in zip(fused.layers.values(), host.layers.values()):
        assert fl.visits == hl.visits
        np.testing.assert_allclose(fl.total_reward, hl.total_reward,
                                   atol=1e-9)
