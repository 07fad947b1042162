"""TPU regression tests for the production compute paths.

Run with ``SLAM_TPU_TPU_TESTS=1 python -m pytest tests_tpu/ -q`` on a
machine with a live accelerator backend.  Covers (VERDICT r1 item 9):

  * partitioned-Schur LM step equals the dense step ON DEVICE (f32) — the
    main suite pins this only on the CPU backend;
  * the bench workload (INTEL + 50 outliers, DCS, Schur P=16, f32)
    converges into the committed golden's basin on the chip;
  * the non-interpret Pallas gather/scatter kernels compile and match
    exact indexing at a deliberately tiny size (per-element loops compile
    pathologically on the axon toolchain at production sizes — see
    ``ops/pallas_gather.py`` STATUS).
"""

import json
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "results", "golden")


@pytest.fixture(scope="session")
def jnp():
    import jax.numpy as jnp

    return jnp


def test_schur_step_matches_dense_on_device(jnp):
    from slam_tpu.config import SolverConfig
    from slam_tpu.io import synthetic
    from slam_tpu.solver.lm import lm_fixed_iters
    from slam_tpu.solver.problem import anchor_first_node, edge_set_from_graph
    from slam_tpu.solver.schur import build_partition

    graph, _ = synthetic.circle_se2(n=96, seed=3)
    edges = edge_set_from_graph(graph, dtype=jnp.float32, incidence=True)
    free = anchor_first_node(graph.num_nodes, dtype=jnp.float32)
    poses0 = jnp.asarray(graph.poses, jnp.float32)
    sw0 = jnp.ones((edges.num_edges,), jnp.float32)
    part = build_partition(graph.edges_ij, graph.num_nodes, 4,
                           dtype=jnp.float32)

    res_d = lm_fixed_iters(
        poses0, sw0, edges, free,
        SolverConfig(robust="dcs", linear_solver="dense", dtype="float32"), 5)
    res_s = lm_fixed_iters(
        poses0, sw0, edges, free,
        SolverConfig(robust="dcs", linear_solver="schur", dtype="float32"), 5,
        partition=part)
    # f32 on-device: same trajectory to single-precision accumulation noise.
    np.testing.assert_allclose(np.asarray(res_s.poses),
                               np.asarray(res_d.poses), atol=5e-4)
    assert abs(float(res_s.cost) - float(res_d.cost)) < 1e-3


# PLAIN-solve anchor for INTEL+50 seed 42 (dcs_consensus/auto_retry OFF):
# CPU f64 dense reaches 2.969723 -> 1.515895 @50 iters (verify skill).
# The committed INTEL_50out golden is the RESCUED trajectory (r3), so the
# plain bench workload gates against this constant, not the golden.
_PLAIN_INTEL50_COST_AT_50 = 1.515895


def test_bench_workload_matches_plain_anchor(jnp):
    """INTEL+50 seed 42, DCS, Schur P=16, f32, 50 iters — the bench.py
    workload single-problem.  Gate: the on-device f32 cost matches the
    f64 plain-solve anchor to ~3 decimals (TPU numerics parity)."""
    from slam_tpu.config import SolverConfig
    from slam_tpu.io import g2o
    from slam_tpu.solver.lm import lm_fixed_iters
    from slam_tpu.solver.problem import anchor_first_node, edge_set_from_graph
    from slam_tpu.solver.schur import build_partition

    graph = g2o.load_g2o(g2o.find_dataset("INTEL"))
    g = graph.add_random_outliers(50, seed=42).canonical_order()
    edges = edge_set_from_graph(g, dtype=jnp.float32, incidence=True)
    free = anchor_first_node(g.num_nodes, dtype=jnp.float32)
    part = build_partition(g.edges_ij, g.num_nodes, 16, dtype=jnp.float32)
    cfg = SolverConfig(robust="dcs", linear_solver="schur", dtype="float32")
    res = lm_fixed_iters(jnp.asarray(g.poses, jnp.float32),
                         jnp.ones((edges.num_edges,), jnp.float32),
                         edges, free, cfg, 50, partition=part)
    cost = float(res.cost)
    assert abs(cost - _PLAIN_INTEL50_COST_AT_50) < 5e-3, cost


def test_product_pipeline_rescue_reaches_golden_on_device(jnp):
    """The full product pipeline (auto init + DCS psi-consensus rescue,
    f32) on the chip must land in the committed rescued golden's basin
    (r3: TPU measured ATE ~0.01 vs the f64 golden)."""
    from slam_tpu.config import RunConfig, SolverConfig
    from slam_tpu.eval import metrics
    from slam_tpu.io import g2o
    from slam_tpu.methods.global_solve import run_global_solve
    from slam_tpu.utils.logging import RunLogger

    meta_path = os.path.join(GOLDEN, "meta.json")
    if not os.path.isfile(meta_path):
        pytest.skip("golden trajectories not generated")
    golden = np.load(os.path.join(GOLDEN, "INTEL_50out_seed42.npy"))

    graph = g2o.load_g2o(g2o.find_dataset("INTEL"))
    dirty = graph.add_random_outliers(50, seed=42)
    out = run_global_solve(
        dirty,
        RunConfig(dataset="INTEL", method=1, num_outliers=50, seed=42,
                  solver=SolverConfig(dtype="float32")),
        RunLogger(echo=False))
    ate = metrics.ate(np.asarray(out.poses, np.float64), golden)
    assert ate < 0.25, ate


def test_pallas_gather_scatter_non_interpret(jnp):
    from slam_tpu.ops.pallas_gather import gather_rows, scatter_add_rows

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(32, 8)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 32, size=64), jnp.int32)
    got = np.asarray(gather_rows(x, idx, interpret=False))
    np.testing.assert_allclose(got, np.asarray(x)[np.asarray(idx)],
                               atol=0.0)

    v = jnp.asarray(rng.normal(size=(64, 8)), jnp.float32)
    got = np.asarray(scatter_add_rows(v, idx, 32, interpret=False))
    want = np.zeros((32, 8), np.float32)
    np.add.at(want, np.asarray(idx), np.asarray(v))
    np.testing.assert_allclose(got, want, atol=1e-5)
