"""Generic honest-timing LM throughput runner for any registered dataset.

    python scripts/bench_dataset.py DATASET N_OUTLIERS SPEC [--init-chordal]

SPEC = solver:blocks, e.g. ``schur:8`` (blocks=0 -> choose_num_blocks),
``dense:0``, ``pcg:N`` (N = CG cap, 0 -> 100).  Timing discipline matches
bench.py (perturbed inputs per rep, device_get barrier, best of 3); the
LM runs as chunked 10-iteration device calls with (lambda, nu, iteration)
threaded so the trajectory equals one unbroken solve.  Reports final cost
and, when a ground-truth .npy exists next to the dataset, ATE.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LM_ITERS = 50
CHUNK = 10


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from slam_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    from slam_tpu.config import SolverConfig
    from slam_tpu.io import g2o
    from slam_tpu.solver.lm import lm_fixed_iters
    from slam_tpu.solver.models import SE2Model, SE3Model
    from slam_tpu.solver.problem import anchor_first_node, edge_set_from_graph
    from slam_tpu.solver.schur import build_partition, choose_num_blocks

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    dataset, n_out, spec = args[0], int(args[1]), args[2]
    kind, blocks = spec.split(":")
    blocks = int(blocks)

    path = g2o.find_dataset(dataset)
    graph = g2o.load_g2o(path)
    dirty = graph.add_random_outliers(n_out, seed=0).canonical_order()
    if "--init-chordal" in sys.argv:
        from slam_tpu.solver.init import chordal_init
        dirty = chordal_init(dirty)
    model = SE3Model if dirty.dim == 7 else SE2Model

    d = jnp.float32
    edges = edge_set_from_graph(dirty, dtype=d, incidence="chain")
    free = anchor_first_node(dirty.num_nodes, dtype=d)
    poses0 = jnp.asarray(dirty.poses, d)
    sw0 = jnp.ones((edges.num_edges,), d)

    partition = None
    if kind in ("schur", "schurgraph"):
        if blocks == 0:
            blocks = choose_num_blocks(dirty.edges_ij, dirty.num_nodes,
                                       tangent_dim=model.tangent_dim)
        node_block = None
        if kind == "schurgraph":
            from slam_tpu.solver.partition import graph_partition
            node_block = graph_partition(dirty.edges_ij, dirty.num_nodes,
                                         blocks)
        cfg = SolverConfig(robust="dcs", linear_solver="schur",
                           dtype="float32")
        partition = build_partition(dirty.edges_ij, dirty.num_nodes, blocks,
                                    dtype=d, node_block=node_block)
    elif kind == "dense":
        cfg = SolverConfig(robust="dcs", linear_solver="dense",
                           dtype="float32")
        edges = edge_set_from_graph(dirty, dtype=d, incidence=True)
    else:
        cfg = SolverConfig(robust="dcs", linear_solver="pcg",
                           dtype="float32", pcg_rtol=1e-3,
                           pcg_max_iters=blocks or 100,
                           pcg_preconditioner="tridiag")

    @jax.jit
    def solve(p, s, e, part, lam0, nu0, it0):
        r = lm_fixed_iters(p, s, e, free, cfg, CHUNK, partition=part,
                           model=model, lam0=lam0, nu0=nu0, it0=it0)
        return (r.poses, r.switches, r.cost, r.initial_cost,
                r.final_lambda, r.final_nu, r.iterations)

    def full(p, want_poses=False):
        s = sw0
        cost0 = None
        lam = jnp.asarray(cfg.init_lambda, d)
        nu = jnp.asarray(2.0, d)
        it = jnp.int32(0)
        for _ in range(LM_ITERS // CHUNK):
            p, s, cost, c0, lam, nu, it = solve(
                p, s, edges, partition, lam, nu, it)
            cost0 = float(c0) if cost0 is None else cost0
        if want_poses:
            return (float(jax.device_get(cost)), cost0,
                    np.asarray(jax.device_get(p), np.float64))
        return float(jax.device_get(cost)), cost0

    t0 = time.perf_counter()
    cost, cost0, opt = full(poses0, want_poses=True)
    compile_s = time.perf_counter() - t0

    rng = np.random.default_rng(1)
    best = float("inf")
    for _ in range(3):
        p = poses0 + jnp.asarray(rng.normal(0, 1e-6, poses0.shape), d)
        t0 = time.perf_counter()
        full(p)
        best = min(best, time.perf_counter() - t0)

    out = dict(dataset=dataset, outliers=n_out, spec=spec, blocks=blocks,
               init=("chordal" if "--init-chordal" in sys.argv
                     else "dataset"),
               cost0=round(cost0, 4), cost=round(cost, 4),
               compile_or_first_s=round(compile_s, 1),
               iters_s=round(LM_ITERS / best, 2))
    gt_path = os.path.splitext(path)[0] + "_gt.npy"
    if os.path.exists(gt_path):
        from slam_tpu.eval import metrics
        gt = np.load(gt_path)
        k = 3 if dirty.dim == 7 else 2
        out["ate_m"] = round(float(metrics.ate(opt[:, :k], gt[:, :k])), 3)
    print(out, flush=True)


if __name__ == "__main__":
    main()
