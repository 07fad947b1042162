"""Partitioned Schur solver: exactness vs dense, partition invariants."""

import jax.numpy as jnp
import numpy as np
import pytest

from slam_tpu.config import SolverConfig
from slam_tpu.io import synthetic
from slam_tpu.solver.lm import lm_solve
from slam_tpu.solver.schur import build_partition
from slam_tpu.solver.problem import anchor_first_node, edge_set_from_graph


@pytest.fixture(scope="module")
def problem():
    graph, gt = synthetic.circle_se2(n=96, seed=1)
    graph = graph.add_random_outliers(8, seed=2).canonical_order()
    edges = edge_set_from_graph(graph, dtype=jnp.float64, incidence=True)
    free = anchor_first_node(graph.num_nodes, dtype=jnp.float64)
    poses0 = jnp.asarray(graph.poses)
    sw0 = jnp.ones((edges.num_edges,), jnp.float64)
    return graph, edges, free, poses0, sw0


def test_partition_invariants(problem):
    graph, *_ = problem
    part = build_partition(graph.edges_ij, graph.num_nodes, 4,
                           dtype=jnp.float64)
    int_sel = np.asarray(part.int_sel)
    sep_sel = np.asarray(part.sep_sel)
    # Every node is exactly one of: interior of one block, or separator.
    node_cover = int_sel.sum(axis=(0, 1)) + sep_sel.sum(axis=0)
    np.testing.assert_allclose(node_cover, 1.0)
    # Anchor node 0 is in the separator.
    assert sep_sel[:, 0].sum() == 1.0
    # Every edge is owned by at most one block; unowned edges touch only
    # separator nodes.
    esel = np.asarray(part.edge_sel)
    owners = esel.sum(axis=(0, 1))
    assert np.all(owners <= 1.0)
    sep_nodes = set(np.where(sep_sel.sum(axis=0) > 0)[0])
    for e in np.where(owners == 0)[0]:
        a, b = graph.edges_ij[e]
        assert a in sep_nodes and b in sep_nodes


@pytest.mark.parametrize("nblocks", [2, 4, 8])
def test_schur_matches_dense(problem, nblocks):
    graph, edges, free, poses0, sw0 = problem
    part = build_partition(graph.edges_ij, graph.num_nodes, nblocks,
                           dtype=jnp.float64)
    cfg_d = SolverConfig(robust="dcs", linear_solver="dense", dtype="float64")
    cfg_s = cfg_d.replace(linear_solver="schur")
    res_d = lm_solve(poses0, sw0, edges, free, cfg_d)
    res_s = lm_solve(poses0, sw0, edges, free, cfg_s, partition=part)
    assert int(res_d.iterations) == int(res_s.iterations)
    np.testing.assert_allclose(
        np.asarray(res_s.poses), np.asarray(res_d.poses), atol=1e-9
    )


def test_partition_stats_match_build(problem):
    from slam_tpu.solver.schur import partition_stats

    graph, edges, free, poses0, sw0 = problem
    for P in (2, 4):
        part = build_partition(graph.edges_ij, graph.num_nodes, P,
                               dtype=jnp.float64)
        assert partition_stats(graph.edges_ij, graph.num_nodes, P) == (
            part.ni_max, part.ns, part.ek_max, part.es_max, part.nsk_max
        )


def test_choose_num_blocks_measured_winners():
    """The tile-padded cost model reproduces the measured per-dataset
    block-count winners: INTEL+50 -> 16 (622 it/s, results/ROUND2.md),
    M10000+50 -> 24 (14.9 it/s, results/ROUND2.md), sphere2500 -> 4 (the
    SE(3) f32 quality winner, guarded by the separator cap)."""
    from slam_tpu.io import g2o
    from slam_tpu.solver.schur import choose_num_blocks

    g = g2o.load_g2o(g2o.find_dataset("INTEL"))
    g = g.add_random_outliers(50, seed=0).canonical_order()
    assert choose_num_blocks(g.edges_ij, g.num_nodes) == 16

    import os
    if os.path.exists("data/sphere2500.g2o"):
        s = g2o.load_g2o("data/sphere2500.g2o").canonical_order()
        assert choose_num_blocks(s.edges_ij, s.num_nodes,
                                 tangent_dim=6) == 4
    if os.path.exists("data/M10000.g2o"):
        m = g2o.load_g2o("data/M10000.g2o")
        m = m.add_random_outliers(50, seed=0).canonical_order()
        assert choose_num_blocks(m.edges_ij, m.num_nodes) == 24


def test_choose_partition_measured_scheme_winners():
    """Scheme selection reproduces the r5 measured winners: INTEL stays on
    contiguous index cuts (graph cuts fragment the path-ordered layout:
    ns 166 -> 247 at P=16), M10000 flips to the spectral graph scheme
    (index P=24 14.77 it/s vs graph P=32 31.99 measured on chip)."""
    import os

    from slam_tpu.io import g2o
    from slam_tpu.solver.schur import choose_partition

    g = g2o.load_g2o(g2o.find_dataset("INTEL"))
    g = g.add_random_outliers(50, seed=0).canonical_order()
    P, nb = choose_partition(g.edges_ij, g.num_nodes)
    assert P == 16 and nb is None

    if os.path.exists("data/M10000.g2o"):
        m = g2o.load_g2o("data/M10000.g2o")
        m = m.add_random_outliers(50, seed=0).canonical_order()
        P, nb = choose_partition(m.edges_ij, m.num_nodes)
        assert P == 32 and nb is not None


def test_blocked_cholesky_matches_scipy():
    """Panel-blocked Cholesky/solves (the TPU path inside schur_solve)
    reproduce LAPACK to machine precision, including padded sizes and both
    vector and matrix right-hand sides."""
    from slam_tpu.solver import blocked_chol as bc

    rng = np.random.default_rng(0)
    for n, p, batch in [(7, 4, (3,)), (50, 16, (6,)), (33, 8, ())]:
        A = rng.normal(size=batch + (n, n))
        A = A @ np.swapaxes(A, -1, -2) + n * np.eye(n)
        fac = bc.blocked_cholesky(jnp.asarray(A), panel=p)
        np.testing.assert_allclose(
            np.asarray(fac.L)[..., :n, :n], np.linalg.cholesky(A), atol=1e-12
        )
        B = rng.normal(size=batch + (n, 5))
        np.testing.assert_allclose(
            np.asarray(bc.cho_solve_blocked(fac, jnp.asarray(B))),
            np.linalg.solve(A, B), atol=1e-12,
        )
        b = rng.normal(size=batch + (n,))
        np.testing.assert_allclose(
            np.asarray(bc.cho_solve_blocked(fac, jnp.asarray(b))),
            np.linalg.solve(A, b[..., None])[..., 0], atol=1e-12,
        )


def test_blocked_cholesky_inner_panel_matches_scipy():
    """Two-level blocking (r4 `inner`): recursive panel factorization and
    the matmul-built panel inverses reproduce LAPACK, including when the
    panel divides unevenly (inner fallback) and batched."""
    from slam_tpu.solver import blocked_chol as bc

    rng = np.random.default_rng(1)
    for n, p, inner, batch in [(64, 32, 8, (4,)), (231, 128, 32, (2,)),
                               (50, 16, 12, ())]:  # 16 % 12 -> fallback
        A = rng.normal(size=batch + (n, n))
        A = A @ np.swapaxes(A, -1, -2) + n * np.eye(n)
        fac = bc.blocked_cholesky(jnp.asarray(A), panel=p, inner=inner)
        np.testing.assert_allclose(
            np.asarray(fac.L)[..., :n, :n], np.linalg.cholesky(A),
            atol=1e-10,
        )
        B = rng.normal(size=batch + (n, 3))
        np.testing.assert_allclose(
            np.asarray(bc.cho_solve_blocked(fac, jnp.asarray(B))),
            np.linalg.solve(A, B), atol=1e-9,
        )


def test_schur_blocked_inner_matches_native(problem):
    """schur_solve(blocked, panel_inner=8) == schur_solve(native)."""
    from slam_tpu.solver.linearize import linearize
    from slam_tpu.solver.models import SE2Model
    from slam_tpu.solver.schur import schur_solve

    graph, edges, free, poses0, sw0 = problem
    part = build_partition(graph.edges_ij, graph.num_nodes, 4,
                           dtype=jnp.float64)
    system = linearize(poses0, sw0, edges, free, model=SE2Model,
                       robust="dcs", dcs_phi=0.5, huber_delta=0.01,
                       sc_prior_lambda=1.0)
    lam = jnp.asarray(1e-4, jnp.float64)
    up_n = schur_solve(system, edges, part, lam, blocked=False)
    up_i = schur_solve(system, edges, part, lam, blocked=True,
                       panel=16, panel_inner=8)
    np.testing.assert_allclose(
        np.asarray(up_i.poses), np.asarray(up_n.poses), atol=1e-11
    )


def test_schur_blocked_matches_native(problem):
    """schur_solve(blocked=True) == schur_solve(blocked=False) == dense."""
    from slam_tpu.solver.schur import schur_solve
    from slam_tpu.solver.linearize import linearize
    from slam_tpu.solver.models import SE2Model

    graph, edges, free, poses0, sw0 = problem
    part = build_partition(graph.edges_ij, graph.num_nodes, 4,
                           dtype=jnp.float64)
    system = linearize(poses0, sw0, edges, free, model=SE2Model,
                       robust="dcs", dcs_phi=0.5, huber_delta=0.01,
                       sc_prior_lambda=1.0)
    lam = jnp.asarray(1e-4, jnp.float64)
    up_n = schur_solve(system, edges, part, lam, blocked=False)
    up_b = schur_solve(system, edges, part, lam, blocked=True)
    np.testing.assert_allclose(
        np.asarray(up_b.poses), np.asarray(up_n.poses), atol=1e-11
    )


def test_optimized_cuts_partition_valid(problem):
    """optimize_cuts keeps all partition invariants and never increases the
    number of cut-spanning edges vs uniform slicing."""
    from slam_tpu.solver.schur import optimize_cut_positions

    graph, edges, free, poses0, sw0 = problem
    n, ij = graph.num_nodes, graph.edges_ij
    nb = optimize_cut_positions(ij, n, 4)
    assert nb.shape == (n,)
    assert nb.min() == 0 and nb.max() == 3
    assert np.all(np.diff(nb) >= 0), "blocks are contiguous"

    def cross(nbk):
        return int(np.sum(nbk[ij[:, 0]] != nbk[ij[:, 1]]))

    uniform = np.minimum(np.arange(n) // (-(-n // 4)), 3)
    assert cross(nb) <= cross(uniform)

    part = build_partition(ij, n, 4, dtype=jnp.float64, optimize_cuts=True)
    node_cover = (np.asarray(part.int_sel).sum(axis=(0, 1))
                  + np.asarray(part.sep_sel).sum(axis=0))
    np.testing.assert_allclose(node_cover, 1.0)

    cfg = SolverConfig(robust="dcs", linear_solver="schur", dtype="float64")
    res = lm_solve(poses0, sw0, edges, free, cfg, partition=part)
    cfg_d = cfg.replace(linear_solver="dense")
    res_d = lm_solve(poses0, sw0, edges, free, cfg_d)
    np.testing.assert_allclose(
        np.asarray(res.poses), np.asarray(res_d.poses), atol=1e-9
    )


def test_schur_half_substitution_branch_matches_dense(problem, monkeypatch):
    """Force the large-interior (half-substitution) elimination branch --
    normally only taken when D*ni > 1024 (M10000-class) -- and pin it
    against the dense solver like the default branch."""
    from slam_tpu.solver import schur as schur_mod
    from slam_tpu.solver.lm import lm_solve
    from slam_tpu.config import SolverConfig

    monkeypatch.setattr(schur_mod, "_INV_MAX_DIM", 0)
    graph, edges, free, poses0, sw0 = problem
    part = build_partition(graph.edges_ij, graph.num_nodes, 4,
                           dtype=jnp.float64)
    cfg_d = SolverConfig(robust="dcs", linear_solver="dense",
                         dtype="float64", use_pallas="off",
                         max_iterations=6, function_tolerance=0.0)
    cfg_s = cfg_d.replace(linear_solver="schur")
    res_d = lm_solve(poses0, sw0, edges, free, cfg_d)
    res_s = lm_solve(poses0, sw0, edges, free, cfg_s, partition=part)
    np.testing.assert_allclose(
        np.asarray(res_s.poses), np.asarray(res_d.poses), atol=1e-9
    )


def test_graph_partition_invariants_and_exactness(problem):
    """Arbitrary node->block assignments (partition.graph_partition) keep
    every partition invariant and the Schur solve stays exact vs dense."""
    from slam_tpu.solver.partition import (
        graph_partition, partition_edge_cut,
    )

    graph, edges, free, poses0, sw0 = problem
    nb = graph_partition(graph.edges_ij, graph.num_nodes, 4)
    assert nb.shape == (graph.num_nodes,)
    sizes = np.bincount(nb, minlength=4)
    assert sizes.min() > 0
    # Balanced within the partitioner's slack.
    assert sizes.max() <= int(np.ceil(graph.num_nodes / 4 * 1.5))
    part = build_partition(graph.edges_ij, graph.num_nodes, 4,
                           dtype=jnp.float64, node_block=nb)
    int_sel = np.asarray(part.int_sel)
    sep_sel = np.asarray(part.sep_sel)
    node_cover = int_sel.sum(axis=(0, 1)) + sep_sel.sum(axis=0)
    np.testing.assert_allclose(node_cover, 1.0)
    assert sep_sel[:, 0].sum() == 1.0

    cfg_d = SolverConfig(robust="dcs", linear_solver="dense", dtype="float64")
    cfg_s = cfg_d.replace(linear_solver="schur")
    res_d = lm_solve(poses0, sw0, edges, free, cfg_d)
    res_s = lm_solve(poses0, sw0, edges, free, cfg_s, partition=part)
    assert int(res_d.iterations) == int(res_s.iterations)
    np.testing.assert_allclose(
        np.asarray(res_s.poses), np.asarray(res_d.poses), atol=1e-9
    )
    # On the ring topology the spectral cut should not be worse than the
    # contiguous one by more than the slack allows; sanity: cut is small.
    cut = partition_edge_cut(graph.edges_ij, nb)
    assert cut < graph.num_nodes // 4


def test_graph_partition_disconnected_graph():
    """The spectral partitioner must not crash (or unbalance) when a
    bisection subgraph is disconnected -- PCM-style edge dropping can
    disconnect components mid-recursion."""
    from slam_tpu.solver.partition import graph_partition

    # Two 32-node chains with no connecting edge.
    ij = np.concatenate([
        np.stack([np.arange(31), np.arange(1, 32)], 1),
        32 + np.stack([np.arange(31), np.arange(1, 32)], 1),
    ])
    nb = graph_partition(ij, 64, 4)
    sizes = np.bincount(nb, minlength=4)
    assert sizes.min() > 0
    assert sizes.max() <= int(np.ceil(64 / 4 * 1.5))
