"""Chain+low-rank Woodbury solver: exactness vs dense, LM-trajectory parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from slam_tpu.config import SolverConfig
from slam_tpu.io import synthetic
from slam_tpu.solver.lm import lm_solve
from slam_tpu.solver import linear, tridiag
from slam_tpu.solver.linearize import linearize
from slam_tpu.solver.problem import anchor_first_node, edge_set_from_graph
from slam_tpu.solver.woodbury import build_woodbury_ops, woodbury_solve


@pytest.fixture(scope="module")
def problem():
    graph, gt = synthetic.circle_se2(n=96, seed=1)
    graph = graph.add_random_outliers(8, seed=2).canonical_order()
    edges = edge_set_from_graph(graph, dtype=jnp.float64, incidence=True)
    free = anchor_first_node(graph.num_nodes, dtype=jnp.float64)
    poses0 = jnp.asarray(graph.poses)
    sw0 = jnp.ones((edges.num_edges,), jnp.float64)
    return graph, edges, free, poses0, sw0


def test_ops_partition_edges(problem):
    graph, *_ = problem
    ops = build_woodbury_ops(graph.edges_ij, graph.num_nodes,
                             dtype=jnp.float64)
    sel = np.asarray(ops.sel)
    span = np.abs(graph.edges_ij[:, 0] - graph.edges_ij[:, 1])
    # Exactly the non-consecutive edges are selected, each exactly once.
    np.testing.assert_array_equal(sel.sum(axis=0), (span != 1).astype(float))
    np.testing.assert_array_equal(sel.sum(axis=1), 1.0)
    # Endpoint one-hots agree with the edge list.
    np.testing.assert_array_equal(
        np.asarray(ops.inc_a).argmax(axis=1),
        graph.edges_ij[span != 1, 0],
    )
    np.testing.assert_array_equal(
        np.asarray(ops.inc_b).argmax(axis=1),
        graph.edges_ij[span != 1, 1],
    )


def test_cr_solve_mrhs_matches_single(problem):
    graph, edges, free, poses0, sw0 = problem
    system = linearize(
        poses0, sw0, edges, free, model=_se2(), robust="dcs",
        dcs_phi=0.5, huber_delta=0.01, sc_prior_lambda=1.0,
    )
    Hd, _ = linear._damped_diag(system, jnp.float64(1e-3))
    D, U = tridiag.extract_tridiag(system, edges, Hd)
    factors = tridiag.build_cr_factors(D, U)
    rng = np.random.default_rng(0)
    R = jnp.asarray(rng.normal(size=(graph.num_nodes, 3, 5)))
    out = np.asarray(tridiag.cr_solve_mrhs(factors, R))
    for k in range(5):
        single = np.asarray(tridiag.cr_solve(factors, R[:, :, k]))
        np.testing.assert_allclose(out[:, :, k], single, atol=1e-12)


def _se2():
    from slam_tpu.solver.models import SE2Model
    return SE2Model


@pytest.mark.parametrize("robust", ["none", "dcs", "sc_varpro"])
@pytest.mark.parametrize("lam", [1e-4, 1.0])
def test_woodbury_matches_dense(problem, robust, lam):
    graph, edges, free, poses0, sw0 = problem
    ops = build_woodbury_ops(graph.edges_ij, graph.num_nodes,
                             dtype=jnp.float64)
    system = linearize(
        poses0, sw0, edges, free, model=_se2(), robust=robust,
        dcs_phi=0.5, huber_delta=0.01, sc_prior_lambda=1.0,
    )
    lam = jnp.float64(lam)
    dx_w = woodbury_solve(system, edges, ops, lam)
    dx_d = linear.dense_solve(system, edges, lam)
    np.testing.assert_allclose(
        np.asarray(dx_w.poses), np.asarray(dx_d.poses), atol=1e-9
    )


def test_lm_woodbury_matches_dense_trajectory(problem):
    graph, edges, free, poses0, sw0 = problem
    ops = build_woodbury_ops(graph.edges_ij, graph.num_nodes,
                             dtype=jnp.float64)
    cfg_d = SolverConfig(robust="dcs", linear_solver="dense", dtype="float64")
    cfg_w = cfg_d.replace(linear_solver="woodbury")
    res_d = lm_solve(poses0, sw0, edges, free, cfg_d)
    res_w = lm_solve(poses0, sw0, edges, free, cfg_w, partition=ops)
    assert int(res_d.iterations) == int(res_w.iterations)
    np.testing.assert_allclose(
        np.asarray(res_w.poses), np.asarray(res_d.poses), atol=1e-9
    )


def test_woodbury_joint_sc_matches_dense(problem):
    """Round 2: joint SC rides woodbury too (switch pre-elimination,
    linear.eliminate_switches) -- same fixed point as the dense joint
    path, same on/off switch classification."""
    graph, edges, free, poses0, sw0 = problem
    ops = build_woodbury_ops(graph.edges_ij, graph.num_nodes,
                             dtype=jnp.float64)
    cfg = SolverConfig(robust="sc", linear_solver="woodbury",
                       dtype="float64")
    wres = lm_solve(poses0, sw0, edges, free, cfg, partition=ops)
    dres = lm_solve(poses0, sw0, edges, free,
                    cfg.replace(linear_solver="dense"))
    # Trajectories differ slightly (the reduced system's pose damping
    # diagonal is the post-elimination one); the fixed point class is the
    # gate, not the iterate path.
    assert abs(float(wres.cost) - float(dres.cost)) < 2e-2 * max(
        1.0, float(dres.cost))
    loop = np.asarray(graph.canonical_order().edge_type) != 0
    sw_w = np.asarray(wres.switches)[: loop.shape[0]][loop]
    sw_d = np.asarray(dres.switches)[: loop.shape[0]][loop]
    np.testing.assert_array_equal(sw_w > 0.5, sw_d > 0.5)


def test_woodbury_no_lowrank_edges():
    # Pure chain graph: C == 0 exercises the CR-only fast path.
    import dataclasses

    graph, _ = synthetic.circle_se2(n=32, seed=3)
    g = graph.canonical_order()
    span = np.abs(g.edges_ij[:, 0] - g.edges_ij[:, 1])
    keep = span == 1
    g = dataclasses.replace(
        g,
        edges_ij=g.edges_ij[keep],
        edges_meas=g.edges_meas[keep],
        edges_info=g.edges_info[keep],
        edge_type=g.edge_type[keep],
    )
    edges = edge_set_from_graph(g, dtype=jnp.float64, incidence=True)
    free = anchor_first_node(g.num_nodes, dtype=jnp.float64)
    poses0 = jnp.asarray(g.poses)
    sw0 = jnp.ones((edges.num_edges,), jnp.float64)
    ops = build_woodbury_ops(g.edges_ij, g.num_nodes, dtype=jnp.float64)
    assert ops.num_lowrank == 0
    system = linearize(
        poses0, sw0, edges, free, model=_se2(), robust="none",
        dcs_phi=0.5, huber_delta=0.01, sc_prior_lambda=1.0,
    )
    lam = jnp.float64(1e-3)
    dx_w = woodbury_solve(system, edges, ops, lam)
    dx_d = linear.dense_solve(system, edges, lam)
    np.testing.assert_allclose(
        np.asarray(dx_w.poses), np.asarray(dx_d.poses), atol=1e-9
    )
