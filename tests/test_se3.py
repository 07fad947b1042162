"""SE(3) geometry and solver tests (sphere-class capability)."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.config import SolverConfig
from slam_tpu.eval import metrics
from slam_tpu.geometry import se3
from slam_tpu.io import synthetic
from slam_tpu.solver.lm import lm_solve
from slam_tpu.solver.models import SE3Model
from slam_tpu.solver.problem import anchor_first_node, edge_set_from_graph


def _rand_pose(rng, shape=()):
    t = rng.normal(size=shape + (3,))
    q = rng.normal(size=shape + (4,))
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.asarray(np.concatenate([t, q], axis=-1))


def test_compose_inverse_identity(rng):
    p = _rand_pose(rng, (12,))
    ident = se3.compose(p, se3.inverse(p))
    np.testing.assert_allclose(np.asarray(ident[..., :3]), 0.0, atol=1e-12)
    # identity quaternion up to sign
    np.testing.assert_allclose(
        np.abs(np.asarray(ident[..., 3])), 1.0, atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(ident[..., 4:]), 0.0, atol=1e-12)


def test_exp_log_roundtrip(rng):
    theta = jnp.asarray(rng.normal(size=(20, 3)) * 0.5)
    back = se3.quat_log(se3.quat_exp(theta))
    np.testing.assert_allclose(np.asarray(back), np.asarray(theta), atol=1e-10)


def test_retract_identity_and_consistency(rng):
    p = _rand_pose(rng, (8,))
    zero = jnp.zeros((8, 6))
    np.testing.assert_allclose(
        np.asarray(se3.retract(p, zero)), np.asarray(p), atol=1e-12
    )
    # retract then measure: residual of (p, retract(p, xi)) with identity
    # measurement must equal xi to first order.
    xi = jnp.asarray(np.random.default_rng(1).normal(size=(8, 6)) * 1e-4)
    ident = jnp.concatenate(
        [jnp.zeros((8, 3)), jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (8, 1))],
        axis=-1,
    )
    r = se3.residual(p, se3.retract(p, xi), ident)
    np.testing.assert_allclose(np.asarray(r), np.asarray(xi), atol=1e-7)


def test_residual_zero_at_exact_measurement(rng):
    pa = _rand_pose(rng, (8,))
    pb = _rand_pose(rng, (8,))
    meas = se3.relative(pa, pb)
    e = se3.residual(pa, pb, meas)
    np.testing.assert_allclose(np.asarray(e), 0.0, atol=1e-10)


def test_sphere_solve_converges():
    graph, gt = synthetic.sphere_se3(n=200, rings=10, seed=0)
    dtype = jnp.float64
    edges = edge_set_from_graph(graph, dtype=dtype, incidence=False)
    free = anchor_first_node(graph.num_nodes, dtype=dtype)
    poses0 = jnp.asarray(graph.poses, dtype)
    sw0 = jnp.ones((edges.num_edges,), dtype)
    cfg = SolverConfig(
        robust="dcs", linear_solver="pcg", dtype="float64",
        max_iterations=25, pcg_max_iters=400,
    )
    res = lm_solve(poses0, sw0, edges, free, cfg, model=SE3Model)
    assert float(res.cost) < 0.5 * float(res.initial_cost)
    ate0 = metrics.ate(np.asarray(poses0), gt)
    ate1 = metrics.ate(np.asarray(jax.device_get(res.poses)), gt)
    assert ate1 < 0.5 * ate0, (ate0, ate1)
    # Quaternions stay normalised through the retraction chain.
    qn = np.linalg.norm(np.asarray(res.poses)[:, 3:], axis=1)
    np.testing.assert_allclose(qn, 1.0, atol=1e-9)


def test_sphere_schur_matches_dense():
    """Partitioned-Schur solve is exact on SE(3) too (D=6 tangent blocks):
    same LM trajectory as the dense solver on a sphere graph."""
    from slam_tpu.solver.schur import build_partition

    graph, _ = synthetic.sphere_se3(n=120, rings=8, seed=0)
    g = graph.canonical_order()
    dtype = jnp.float64
    edges = edge_set_from_graph(g, dtype=dtype, incidence=True)
    free = anchor_first_node(g.num_nodes, dtype=dtype)
    poses0 = jnp.asarray(g.poses, dtype)
    sw0 = jnp.ones((edges.num_edges,), dtype)
    part = build_partition(g.edges_ij, g.num_nodes, 4, dtype=jnp.float64)
    cfg_d = SolverConfig(robust="dcs", linear_solver="dense",
                         dtype="float64", max_iterations=10)
    res_d = lm_solve(poses0, sw0, edges, free, cfg_d, model=SE3Model)
    res_s = lm_solve(poses0, sw0, edges, free,
                     cfg_d.replace(linear_solver="schur"),
                     model=SE3Model, partition=part)
    assert int(res_d.iterations) == int(res_s.iterations)
    np.testing.assert_allclose(
        float(res_s.cost), float(res_d.cost), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(res_s.poses), np.asarray(res_d.poses), atol=1e-7
    )


def test_sphere_with_outliers_dcs():
    graph, gt = synthetic.sphere_se3(n=200, rings=10, seed=0)
    # Inject SE(3) outliers by corrupting a few closure measurements.
    import dataclasses
    g = graph.canonical_order()
    meas = g.edges_meas.copy()
    rng = np.random.default_rng(5)
    loop_idx = np.where(g.edge_type != 0)[0]
    bad = rng.choice(loop_idx, size=8, replace=False)
    meas[bad, :3] += rng.normal(0, 20.0, (8, 3))
    etype = g.edge_type.copy()
    etype[bad] = 2
    dirty = dataclasses.replace(g, edges_meas=meas, edge_type=etype)

    dtype = jnp.float64
    edges = edge_set_from_graph(dirty, dtype=dtype, incidence=False)
    free = anchor_first_node(dirty.num_nodes, dtype=dtype)
    poses0 = jnp.asarray(dirty.poses, dtype)
    sw0 = jnp.ones((edges.num_edges,), dtype)
    base = SolverConfig(linear_solver="pcg", dtype="float64",
                        max_iterations=25, pcg_max_iters=400)
    res_plain = lm_solve(poses0, sw0, edges, free,
                         base.replace(robust="none"), model=SE3Model)
    res_dcs = lm_solve(poses0, sw0, edges, free,
                       base.replace(robust="dcs"), model=SE3Model)
    ate_plain = metrics.ate(np.asarray(jax.device_get(res_plain.poses)), gt)
    ate_dcs = metrics.ate(np.asarray(jax.device_get(res_dcs.poses)), gt)
    assert ate_dcs < ate_plain, (ate_dcs, ate_plain)
