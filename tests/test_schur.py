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
