"""Methods 0/1/2: the single global robust solve.

Reproduces the reference driver flow (``/root/reference/DCS-ceres/main.cpp:32-173``):

    read g2o -> inject bogus loops -> write init_nodes/init_edges
    -> build robust problem (baseline / DCS / switchable)
    -> LM solve with gauge fixed at pose 0
    -> report -> write opt_nodes/opt_edges (+ switches.txt for SC)

but as a pure-function pipeline: ingestion and file IO on the host, one
jitted LM solve on device.
"""

from __future__ import annotations

import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.config import (
    METHOD_BASELINE,
    METHOD_DCS,
    METHOD_SC,
    RunConfig,
    solver_config_for_method,
)
from slam_tpu.graph import PoseGraph
from slam_tpu.io import g2o
from slam_tpu.solver.lm import LMResult, lm_solve
from slam_tpu.solver.problem import anchor_first_node, edge_set_from_graph
from slam_tpu.utils.logging import RunLogger


@dataclasses.dataclass
class GlobalSolveOutput:
    graph: PoseGraph          # graph with outliers injected
    poses: np.ndarray         # optimized poses
    switches: np.ndarray      # optimized switch values (SC), aligned with
                              # canonical edge order
    result: LMResult
    wall_time_s: float


def run_global_solve(
    graph: PoseGraph,
    cfg: RunConfig,
    logger: RunLogger | None = None,
) -> GlobalSolveOutput:
    """Solve a (possibly outlier-injected) graph with method 0, 1 or 2."""
    logger = logger or RunLogger()
    scfg = solver_config_for_method(cfg.method, cfg.solver)
    dtype = jnp.dtype(scfg.dtype)

    edges = edge_set_from_graph(graph, dtype=dtype)
    free = anchor_first_node(graph.num_nodes, dtype=dtype)
    poses0 = jnp.asarray(graph.poses, dtype)
    # Switch variables initialised to 1.0 (``main.cpp:117``).
    switches0 = jnp.ones((edges.num_edges,), dtype)

    t0 = time.perf_counter()
    res = lm_solve(poses0, switches0, edges, free, scfg)
    jax.block_until_ready(res.poses)
    wall = time.perf_counter() - t0

    logger.log(
        "solve",
        method=cfg.method,
        robust=scfg.robust,
        initial_cost=float(res.initial_cost),
        final_cost=float(res.cost),
        iterations=int(res.iterations),
        accepted=int(res.accepted),
        converged=bool(res.converged),
        linear_iters=int(res.lin_iters),
        wall_s=wall,
    )
    return GlobalSolveOutput(
        graph=graph,
        poses=np.asarray(jax.device_get(res.poses)),
        switches=np.asarray(jax.device_get(res.switches)),
        result=res,
        wall_time_s=wall,
    )


def run_from_config(cfg: RunConfig) -> GlobalSolveOutput:
    """Full reference-equivalent pipeline with ``save/`` artifacts."""
    os.makedirs(cfg.save_path, exist_ok=True)
    logger = RunLogger(os.path.join(cfg.save_path, f"method{cfg.method}.log"))

    graph = g2o.load_g2o(g2o.find_dataset(cfg.dataset))
    logger.log("init", dataset=cfg.dataset, **_counts(graph))
    graph = graph.add_random_outliers(cfg.num_outliers, seed=cfg.seed)
    logger.log("inject", num_bogus=cfg.num_outliers, seed=cfg.seed)

    # init_nodes/init_edges (``main.cpp:58-59``).
    g2o.write_nodes(os.path.join(cfg.save_path, "init_nodes.txt"), graph.poses)
    g2o.write_edges(os.path.join(cfg.save_path, "init_edges.txt"), graph)

    out = run_global_solve(graph, cfg, logger)

    g2o.write_nodes(os.path.join(cfg.save_path, "opt_nodes.txt"), out.poses)
    g2o.write_edges(os.path.join(cfg.save_path, "opt_edges.txt"), graph)
    if cfg.method == METHOD_SC:
        loop_mask = graph.canonical_order().edge_type != 0
        sw = out.switches[loop_mask]
        g2o.write_switches(
            os.path.join(cfg.save_path, "switches.txt"),
            graph,
            priors=np.ones_like(sw),
            optimized=sw,
        )
    logger.close()
    return out


def _counts(g: PoseGraph) -> dict:
    return dict(
        nodes=g.num_nodes,
        odometry=g.num_odometry,
        closure=g.num_closure,
        bogus=g.num_bogus,
    )
