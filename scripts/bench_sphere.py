"""sphere2500 SE(3) solver throughput on the real chip.

    python scripts/bench_sphere.py schur:4 pcg:0

Schur is DOF-generic (D=6 tangent blocks; exactness pinned in
``tests/test_se3.py::test_sphere_schur_matches_dense``); PCG is the
tridiag-CR-preconditioned path used by the sphere sweep.  20 corrupted
closures, DCS, 30 LM iterations, f32.  Timing discipline matches bench.py.

LANDSCAPE CAVEAT on the reached cost: this script's corruption (+-20 m
perturbation of REAL closures) is structured-adversarial and its DCS
landscape has a strong odometry-only local minimum (cost ~22.3) that
exact-solver runs can land in or escape depending on f32 rounding luck
(observed final costs 3.2 / 12.1 / 22.3 across bit-different but
mathematically identical solver builds; an f64 step at the stuck point
also increases cost, so it is a true stationary point -- see
results/README.md).  Read `iters_s` as the throughput result; for quality
claims use the standard random-pair corruption (`add_random_outliers`,
the sweep in results/sweeps/sphere2500.md, CLI `sphere2500 20 1`:
23.0 -> 1.96 on this build) or `scripts/gnc_sphere_ab.py`.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LM_ITERS = 30


def _dirty_sphere(n_bad: int):
    import numpy as np
    from slam_tpu.io import g2o

    g = g2o.load_g2o("data/sphere2500.g2o").canonical_order()
    meas = g.edges_meas.copy()
    rng = np.random.default_rng(5)
    loop_idx = np.where(g.edge_type != 0)[0]
    bad = rng.choice(loop_idx, size=n_bad, replace=False)
    meas[bad, :3] += rng.normal(0, 20.0, (n_bad, 3))
    etype = g.edge_type.copy()
    etype[bad] = 2
    return dataclasses.replace(g, edges_meas=meas, edge_type=etype)


def run(spec: str) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from slam_tpu.config import SolverConfig
    from slam_tpu.solver.lm import lm_fixed_iters
    from slam_tpu.solver.models import SE3Model
    from slam_tpu.solver.problem import anchor_first_node, edge_set_from_graph
    from slam_tpu.solver.schur import build_partition

    kind, blocks = spec.split(":")
    blocks = int(blocks)

    dirty = _dirty_sphere(20)
    edges = edge_set_from_graph(
        dirty, dtype=jnp.float32,
        incidence="chain")
    free = anchor_first_node(dirty.num_nodes, dtype=jnp.float32)
    poses0 = jnp.asarray(dirty.poses, jnp.float32)
    sw0 = jnp.ones((edges.num_edges,), jnp.float32)

    partition = None
    if kind in ("schur", "schurgraph"):
        cfg = SolverConfig(robust="dcs", linear_solver="schur",
                           dtype="float32")
        node_block = None
        if kind == "schurgraph":
            from slam_tpu.solver.partition import graph_partition
            node_block = graph_partition(dirty.edges_ij, dirty.num_nodes,
                                         blocks)
        partition = build_partition(dirty.edges_ij, dirty.num_nodes, blocks,
                                    dtype=jnp.float32,
                                    node_block=node_block)
    else:
        cfg = SolverConfig(robust="dcs", linear_solver="pcg", dtype="float32",
                           pcg_rtol=1e-3, pcg_max_iters=100,
                           pcg_preconditioner="tridiag")

    @jax.jit
    def solve(p, e, part):
        r = lm_fixed_iters(p, sw0, e, free, cfg, LM_ITERS,
                           partition=part, model=SE3Model)
        return r.cost, r.initial_cost

    t0 = time.perf_counter()
    cost, cost0 = (float(x) for x in
                   jax.device_get(solve(poses0, edges, partition)))
    compile_s = time.perf_counter() - t0

    rng = np.random.default_rng(1)
    best = float("inf")
    for _ in range(3):
        p = poses0.at[:, :3].add(jnp.asarray(
            rng.normal(0, 1e-6, (poses0.shape[0], 3)), jnp.float32))
        t0 = time.perf_counter()
        out = solve(p, edges, partition)
        _ = jax.device_get(out)
        best = min(best, time.perf_counter() - t0)
    return dict(spec=spec, cost0=round(cost0, 4), cost=round(cost, 4),
                compile_or_first_s=round(compile_s, 1),
                iters_s=round(LM_ITERS / best, 2))


def main():
    from slam_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    for spec in sys.argv[1:]:
        print(run(spec), flush=True)


if __name__ == "__main__":
    main()
