"""GNC annealing A/B on the corrupted sphere2500 (SE3) problem.

The bench_sphere workload (20 closures corrupted by +-20 m, DCS phi=0.5)
has a treacherous landscape: the whitened closure residuals start so large
that DCS turns effectively every closure off and plain LM converges to an
odometry-only local minimum (cost ~22.3; diagnosed r1 third pass -- the f32
Schur step there matches the f64 step exactly and BOTH increase the cost,
so it is a genuine stationary point, not numerics).  Graduated
non-convexity (anneal phi from gnc_init_scale*phi down to phi over
gnc_anneal_iters) is the principled escape.

    python scripts/gnc_sphere_ab.py K:SCALE:ITERS ...
    e.g. python scripts/gnc_sphere_ab.py 0:1:60 20:1e4:60 20:1e6:60

Prints final DCS cost (phi=0.5) and ATE vs the synthetic ground truth.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(spec: str) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from slam_tpu.config import SolverConfig
    from slam_tpu.eval import metrics
    from slam_tpu.solver.lm import lm_solve
    from slam_tpu.solver.models import SE3Model
    from slam_tpu.solver.problem import anchor_first_node, edge_set_from_graph
    from slam_tpu.solver.schur import build_partition
    from bench_sphere import _dirty_sphere

    parts = spec.split(":")
    k, scale, iters = int(parts[0]), float(parts[1]), int(parts[2])
    chordal = len(parts) > 3 and parts[3] == "chordal"

    dirty = _dirty_sphere(20)
    if chordal:
        from slam_tpu.solver.init import chordal_init
        dirty = chordal_init(dirty)
    gt = np.load("data/sphere2500_gt.npy")
    d = jnp.float32
    edges = edge_set_from_graph(dirty, dtype=d, incidence="chain")
    free = anchor_first_node(dirty.num_nodes, dtype=d)
    part = build_partition(dirty.edges_ij, dirty.num_nodes, 4, dtype=d)
    cfg = SolverConfig(
        robust="dcs", linear_solver="schur", dtype="float32",
        max_iterations=iters, function_tolerance=0.0,
        gnc_anneal_iters=k, gnc_init_scale=scale,
    )
    t0 = time.perf_counter()
    r = lm_solve(
        jnp.asarray(dirty.poses, d), jnp.ones((edges.num_edges,), d),
        edges, free, cfg, partition=part, model=SE3Model,
    )
    poses = np.asarray(jax.device_get(r.poses), np.float64)
    wall = time.perf_counter() - t0
    ate = float(metrics.ate(poses[:, :3], gt[:, :3]))
    return dict(spec=spec, cost0=round(float(r.initial_cost), 4),
                cost=round(float(r.cost), 4), accepted=int(r.accepted),
                ate_m=round(ate, 3), wall_s=round(wall, 1))


def main():
    from slam_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    for spec in sys.argv[1:]:
        print(run(spec), flush=True)


if __name__ == "__main__":
    main()
