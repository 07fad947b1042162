"""Sweep bench.py's batch size / Schur block count on the real chip.

Usage: python scripts/bench_sweep.py B1:P1 B2:P2 ...
Prints aggregate and per-problem LM iters/s for each (BATCH, NUM_BLOCKS)
configuration, with the same quality gate and timing discipline as bench.py
(input perturbation per rep + device_get barrier; see results/README.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(batch: int, blocks: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from slam_tpu.config import SolverConfig
    from slam_tpu.io import g2o
    from slam_tpu.solver.lm import lm_fixed_iters
    from slam_tpu.solver.problem import anchor_first_node, edge_set_from_graph
    from slam_tpu.solver.schur import build_partition, partition_stats

    LM_ITERS = 50
    graph = g2o.load_g2o(g2o.find_dataset("INTEL"))
    dirties = [
        graph.add_random_outliers(50, seed=s).canonical_order()
        for s in range(batch)
    ]
    sets = [
        edge_set_from_graph(g, dtype=jnp.float32, incidence=True)
        for g in dirties
    ]
    stats = [
        partition_stats(g.edges_ij, g.num_nodes, blocks)
        for g in dirties
    ]
    pad = tuple(max(s[i] for s in stats) for i in range(len(stats[0])))
    parts = [
        build_partition(g.edges_ij, g.num_nodes, blocks,
                        dtype=jnp.float32, pad_shapes=pad)
        for g in dirties
    ]
    edges_b = jax.tree.map(lambda *xs: jnp.stack(xs), *sets)
    parts_b = jax.tree.map(lambda *xs: jnp.stack(xs), *parts)
    free = anchor_first_node(graph.num_nodes, dtype=jnp.float32)
    poses0 = jnp.asarray(graph.poses, jnp.float32)
    sw0 = jnp.ones((sets[0].num_edges,), jnp.float32)
    cfg = SolverConfig(robust="dcs", linear_solver="schur", dtype="float32")

    @jax.jit
    def solve(p, eb, pb):
        def one(e, part):
            r = lm_fixed_iters(p, sw0, e, free, cfg, LM_ITERS,
                               partition=part)
            return r.cost, r.initial_cost
        return jax.vmap(one)(eb, pb)

    t0 = time.perf_counter()
    costs, costs0 = (np.asarray(x) for x in
                     jax.device_get(solve(poses0, edges_b, parts_b)))
    compile_s = time.perf_counter() - t0
    ok = bool(np.all(costs0 > 2.0) and np.all(costs < 0.6 * costs0))

    rng = np.random.default_rng(1)
    best = float("inf")
    for _ in range(3):
        p = poses0 + jnp.asarray(
            rng.normal(0, 1e-6, poses0.shape), jnp.float32
        )
        t0 = time.perf_counter()
        out = solve(p, edges_b, parts_b)
        _ = jax.device_get(out)
        best = min(best, time.perf_counter() - t0)
    return dict(batch=batch, blocks=blocks, gate_ok=ok,
                compile_or_first_s=round(compile_s, 1),
                agg_iters_s=round(batch * 50 / best, 1),
                per_problem_iters_s=round(50 / best, 1))


def main():
    from slam_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    for spec in sys.argv[1:]:
        b, p = (int(x) for x in spec.split(":"))
        print(run(b, p), flush=True)


if __name__ == "__main__":
    main()
