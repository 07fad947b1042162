"""Pallas fused-linearize kernel: parity with the XLA path (interpret mode
on CPU; the compiled kernel runs in bench/CLI on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_tpu.io import synthetic
from slam_tpu.ops.pallas_linearize import _asin
from slam_tpu.solver.linearize import linearize
from slam_tpu.solver.models import SE2Model
from slam_tpu.solver.problem import anchor_first_node, edge_set_from_graph


def test_asin_polynomial_accuracy():
    x = jnp.linspace(-1.0, 1.0, 40001)
    err = np.abs(np.asarray(_asin(x)) - np.arcsin(np.asarray(x))).max()
    assert err < 2e-8, err


@pytest.mark.parametrize("robust", ["none", "dcs"])
@pytest.mark.parametrize("incidence", [False, True])
def test_pallas_linearize_parity(robust, incidence):
    graph, _ = synthetic.circle_se2(n=64, seed=1)
    graph = graph.add_random_outliers(6, seed=2)
    edges = edge_set_from_graph(graph, dtype=jnp.float64, incidence=incidence)
    free = anchor_first_node(graph.num_nodes, dtype=jnp.float64)
    poses0 = jnp.asarray(graph.poses)
    sw0 = jnp.ones((edges.num_edges,), jnp.float64)
    kw = dict(model=SE2Model, robust=robust, dcs_phi=0.5, huber_delta=0.01,
              sc_prior_lambda=1.0)
    a = linearize(poses0, sw0, edges, free, **kw)
    b = linearize(poses0, sw0, edges, free, use_pallas=True,
                  pallas_interpret=True, **kw)
    for name in ("Hdiag", "Hoff", "g", "cost", "Ja", "Jb", "r", "w"):
        np.testing.assert_allclose(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            atol=1e-7, err_msg=name,
        )


def test_pallas_lm_solve_matches(circle):
    """Full LM solve with the kernel (interpret) vs XLA path."""
    from slam_tpu.config import SolverConfig
    from slam_tpu.solver.lm import lm_solve

    graph, _ = circle
    edges = edge_set_from_graph(graph, dtype=jnp.float64, incidence=False)
    free = anchor_first_node(graph.num_nodes, dtype=jnp.float64)
    poses0 = jnp.asarray(graph.poses)
    sw0 = jnp.ones((edges.num_edges,), jnp.float64)
    cfg_x = SolverConfig(robust="dcs", linear_solver="dense",
                         dtype="float64", use_pallas="off")
    cfg_p = cfg_x.replace(use_pallas="interpret")
    ra = lm_solve(poses0, sw0, edges, free, cfg_x)
    rb = lm_solve(poses0, sw0, edges, free, cfg_p)
    np.testing.assert_allclose(float(ra.cost), float(rb.cost), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(ra.poses), np.asarray(rb.poses), atol=1e-6
    )
