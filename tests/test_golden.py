"""Golden-trajectory regression gate.

``results/golden/`` holds committed f64 CPU trajectories (dense, 100 LM
iterations) with their cost records (``meta.json``).  These tests re-solve a
subset with a reduced iteration budget and check convergence toward the
golden fixed point -- the repo-internal stand-in for the BASELINE ATE gate
against Ceres trajectories (Ceres is not installable in this image; the
dirty graphs can be replayed through it externally via
``eval.harness.replay_outliers_to_g2o``).
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from slam_tpu.config import SolverConfig
from slam_tpu.eval import metrics
from slam_tpu.io import g2o
from slam_tpu.solver.lm import lm_solve
from slam_tpu.solver.problem import anchor_first_node, edge_set_from_graph

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "results", "golden")
needs_golden = pytest.mark.skipif(
    not os.path.isfile(os.path.join(GOLDEN, "meta.json")),
    reason="golden trajectories not generated",
)


def _solve(name, outliers, seed, max_iterations, robust):
    graph = g2o.load_g2o(g2o.find_dataset(name))
    g = graph.add_random_outliers(outliers, seed=seed)
    edges = edge_set_from_graph(g, dtype=jnp.float64, incidence=False)
    free = anchor_first_node(g.num_nodes, dtype=jnp.float64)
    poses0 = jnp.asarray(g.poses)
    sw0 = jnp.ones((edges.num_edges,), jnp.float64)
    cfg = SolverConfig(robust=robust, linear_solver="dense",
                       dtype="float64", max_iterations=max_iterations,
                       use_pallas="off")
    return lm_solve(poses0, sw0, edges, free, cfg)


@needs_golden
def test_csail_clean_matches_golden():
    meta = json.load(open(os.path.join(GOLDEN, "meta.json")))
    key = "CSAIL_0out_seed0"
    golden = np.load(os.path.join(GOLDEN, f"{key}.npy"))
    res = _solve("CSAIL", 0, 0, 40, "none")
    ate = metrics.ate(np.asarray(res.poses), golden)
    assert ate < 0.05, ate
    # Cost must be well on its way to the recorded fixed point.
    assert float(res.cost) < 2.0 * meta[key]["final_cost"] + 0.05


@needs_golden
def test_csail_dcs_outliers_matches_golden():
    meta = json.load(open(os.path.join(GOLDEN, "meta.json")))
    key = "CSAIL_50out_seed42"
    golden = np.load(os.path.join(GOLDEN, f"{key}.npy"))
    res = _solve("CSAIL", 50, 42, 40, "dcs")
    ate = metrics.ate(np.asarray(res.poses), golden)
    assert ate < 0.10, ate
    assert float(res.cost) < 1.5 * meta[key]["final_cost"]
