"""Ceres-semantics oracle gates (VERDICT r3 "missing #2").

The oracle (`solver/ceres_oracle.py`) reimplements the exact algorithm the
reference's stock-Ceres solve runs, in pure NumPy f64 sharing no code with
the production JAX solver.  These tests pin:

1. the oracle's corrected Jacobians against finite differences of its own
   corrected residuals (methods 0/1/2);
2. the oracle's cost convention against the production solver's
   (`linearize.cost_only`) -- both are Ceres' ``0.5 sum rho(|r|^2)``;
3. trust-region bookkeeping sanity (accepted costs strictly decrease,
   termination taxonomy);
4. cross-solver agreement: the oracle and the production LM land in the
   same basin on clean + outlier graphs (the evidence that replaces the
   uninstallable external Ceres; full-dataset rows in
   ``results/ceres_oracle.json``).
"""

import numpy as np
import pytest

from slam_tpu.solver import ceres_oracle as co


def _graph_arrays(graph):
    return (np.asarray(graph.poses), np.asarray(graph.edges_ij),
            np.asarray(graph.edges_meas), np.asarray(graph.edge_type))


@pytest.mark.parametrize("method", [0, 1, 2])
def test_oracle_jacobian_matches_finite_difference(circle_outliers, method):
    graph, _ = circle_outliers
    poses, ij, meas, et = _graph_arrays(graph)
    rng = np.random.default_rng(3)
    poses = poses + rng.normal(0, 0.05, poses.shape)  # generic point
    closure_mask = et != 0
    n_sw = int(closure_mask.sum())
    sw = np.clip(rng.uniform(0.4, 1.0, n_sw), 0, 1) if method == 2 else None

    # huber_delta large enough that no block is in the outlier region:
    # there the Triggs corrector (rho''<=0 branch) DELIBERATELY drops the
    # d sqrt(rho')/dr term, so the corrected Jacobian is not the FD of the
    # corrected residual -- FD-test the underlying system instead.
    def resid(p, s):
        rows, cols, vals, r, _, ncols = co._evaluate(
            p, s, ij, meas, closure_mask, method, 1e9, 0.5, 1.0)
        import scipy.sparse as sp
        J = sp.csr_matrix((vals, (rows, cols)), shape=(r.size, ncols))
        return r, J

    r0, J0 = resid(poses, sw)
    J0 = J0.toarray()
    eps = 1e-7
    # probe a spread of pose coordinates + all switch columns
    cols = list(range(0, poses.size, 7))
    for c in cols:
        dp = poses.copy()
        dp.flat[c] += eps
        rp, _ = resid(dp, sw)
        dm = poses.copy()
        dm.flat[c] -= eps
        rm, _ = resid(dm, sw)
        fd = (rp - rm) / (2 * eps)
        np.testing.assert_allclose(J0[:, c], fd, atol=5e-6,
                                   err_msg=f"method {method} pose col {c}")
    if method == 2:
        for k in range(n_sw):
            c = poses.size + k
            sp_, sm_ = sw.copy(), sw.copy()
            sp_[k] += eps
            sm_[k] -= eps
            fd = (resid(poses, sp_)[0] - resid(poses, sm_)[0]) / (2 * eps)
            np.testing.assert_allclose(J0[:, c], fd, atol=5e-6)


@pytest.mark.parametrize("method,robust", [(0, "huber"), (1, "dcs")])
def test_oracle_cost_matches_production_convention(
        circle_outliers, method, robust):
    """Independent implementations of the same objective must price the
    same map identically (f64)."""
    import jax.numpy as jnp

    from slam_tpu.solver.linearize import cost_only
    from slam_tpu.solver.models import SE2Model
    from slam_tpu.solver.problem import edge_set_from_graph

    graph, _ = circle_outliers
    poses, ij, meas, et = _graph_arrays(graph)
    rng = np.random.default_rng(5)
    poses = poses + rng.normal(0, 0.1, poses.shape)

    edges = edge_set_from_graph(graph, dtype=jnp.float64)
    sw = jnp.ones((edges.num_edges,), jnp.float64)
    ours = float(cost_only(
        jnp.asarray(poses), sw, edges, model=SE2Model, robust=robust,
        dcs_phi=0.5, huber_delta=0.01, sc_prior_lambda=1.0))
    oracle = co.ceres_cost(poses, ij, meas, et, method=method)
    assert abs(ours - oracle) < 1e-9 * max(1.0, abs(ours))


def test_oracle_trust_region_descends_and_terminates(circle):
    graph, gt = circle
    poses, ij, meas, et = _graph_arrays(graph)
    rep = co.ceres_solve(poses, ij, meas, et, method=1)
    assert rep.termination in ("convergence", "no_convergence")
    trace = np.array(rep.cost_trace)
    assert np.all(np.diff(trace) < 0)          # accepted steps only
    assert rep.final_cost < 0.2 * rep.initial_cost
    assert rep.successful_steps + rep.unsuccessful_steps == rep.iterations


def test_oracle_sc_matches_production_switches(circle_outliers):
    """Huber ON TOP of the switchable residual (the reference wires the
    loss into SC closures too, ``main.cpp:122``) caps the switch gradient
    at ``2 delta |e|`` -- suppression is soft, not binary.  The oracle
    must (a) keep inliers on, (b) order bogus below real, and (c) land on
    the production solver's switch values (same objective, independent
    minimizers)."""
    import jax.numpy as jnp

    from slam_tpu.config import SolverConfig
    from slam_tpu.solver.lm import lm_solve
    from slam_tpu.solver.problem import (anchor_first_node,
                                         edge_set_from_graph)

    graph, _ = circle_outliers
    poses, ij, meas, et = _graph_arrays(graph)
    rep = co.ceres_solve(poses, ij, meas, et, method=2)
    sw = rep.switches
    bogus = (et[et != 0] == 2)
    assert sw is not None and sw.shape[0] == int((et != 0).sum())
    assert float(np.median(sw[~bogus])) > 0.8
    assert float(np.mean(sw[bogus])) < float(np.mean(sw[~bogus]))

    g = graph.canonical_order()
    edges = edge_set_from_graph(g, dtype=jnp.float64)
    free = anchor_first_node(g.num_nodes, dtype=jnp.float64)
    sw0 = jnp.ones((edges.num_edges,), jnp.float64)
    cfg = SolverConfig(robust="sc", linear_solver="dense", dtype="float64")
    ours = lm_solve(jnp.asarray(np.asarray(g.poses)), sw0, edges, free, cfg)
    closure_idx = np.where(np.asarray(g.edge_type) != 0)[0]
    ours_sw = np.asarray(ours.switches)[closure_idx]
    et_c = np.asarray(g.edge_type)[closure_idx]
    # canonical_order sorts edges by type, so oracle switches (built from
    # the original order's closures) need the same alignment
    orig_closures = np.where(et != 0)[0]
    order = np.argsort(np.asarray(et)[orig_closures], kind="stable")
    np.testing.assert_allclose(sw[order], ours_sw, atol=0.05)


@pytest.mark.parametrize("method", [1])
def test_oracle_agrees_with_production_solver(circle_outliers, method):
    """Same objective, two independent minimizers, same basin: the final
    Ceres-convention costs agree to ~1e-5 relative and the maps overlap
    to centimeters on a 10 m-radius graph."""
    import jax.numpy as jnp

    from slam_tpu.config import SolverConfig
    from slam_tpu.eval import metrics
    from slam_tpu.solver.lm import lm_solve
    from slam_tpu.solver.problem import (anchor_first_node,
                                         edge_set_from_graph)

    graph, _ = circle_outliers
    poses, ij, meas, et = _graph_arrays(graph)
    rep = co.ceres_solve(poses, ij, meas, et, method=method)

    edges = edge_set_from_graph(graph, dtype=jnp.float64)
    free = anchor_first_node(graph.num_nodes, dtype=jnp.float64)
    sw0 = jnp.ones((edges.num_edges,), jnp.float64)
    cfg = SolverConfig(robust="dcs", linear_solver="dense", dtype="float64")
    ours = lm_solve(jnp.asarray(poses), sw0, edges, free, cfg)

    c_oracle = rep.final_cost
    c_ours_under_oracle = co.ceres_cost(
        np.asarray(ours.poses), ij, meas, et, method=method)
    assert abs(c_oracle - c_ours_under_oracle) < 2e-5 * c_oracle
    assert float(metrics.ate(np.asarray(ours.poses), rep.poses)) < 0.02
