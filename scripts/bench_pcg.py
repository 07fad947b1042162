"""A/B: tridiag-CR-preconditioned PCG vs partitioned Schur on the headline
bench workload (INTEL+50, DCS, 50 LM iters, batch of seeds).

Run on TPU:  python scripts/bench_pcg.py [BATCH] [RTOL] [MAXIT]
"""

from __future__ import annotations

import sys
import time


def main() -> int:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rtol = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-6
    maxit = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    import jax

    from slam_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    import numpy as np

    from slam_tpu.config import SolverConfig
    from slam_tpu.io import g2o
    from slam_tpu.solver.lm import lm_fixed_iters
    from slam_tpu.solver.problem import anchor_first_node, edge_set_from_graph

    LM_ITERS = 50
    graph = g2o.load_g2o(g2o.find_dataset("INTEL"))
    dirties = [
        graph.add_random_outliers(50, seed=s).canonical_order()
        for s in range(batch)
    ]
    sets = [
        edge_set_from_graph(g, dtype=jnp.float32, incidence="chain")
        for g in dirties
    ]
    edges_b = jax.tree.map(lambda *xs: jnp.stack(xs), *sets)
    free = anchor_first_node(graph.num_nodes, dtype=jnp.float32)
    poses0 = jnp.asarray(graph.poses, jnp.float32)
    sw0 = jnp.ones((sets[0].num_edges,), jnp.float32)
    cfg = SolverConfig(robust="dcs", linear_solver="pcg", dtype="float32",
                       pcg_rtol=rtol, pcg_max_iters=maxit,
                       pcg_preconditioner="tridiag")

    @jax.jit
    def solve(p, eb):
        def one(e):
            r = lm_fixed_iters(p, sw0, e, free, cfg, LM_ITERS)
            return r.cost, r.initial_cost, r.lin_iters
        return jax.vmap(one)(eb)

    t0 = time.perf_counter()
    costs, costs0, lin = (np.asarray(x) for x in
                          jax.device_get(solve(poses0, edges_b)))
    print(f"compile+first run: {time.perf_counter() - t0:.1f}s")
    print("costs0:", costs0.round(3).tolist())
    print("costs :", costs.round(3).tolist())
    print("CG iters total per seed:", lin.tolist())
    ok = bool(np.all(costs0 > 2.0) and np.all(costs < 0.6 * costs0))
    print("quality gate:", "PASS" if ok else "FAIL")

    rng = np.random.default_rng(1)
    best = float("inf")
    for _ in range(3):
        p = poses0 + jnp.asarray(
            rng.normal(0, 1e-6, poses0.shape), jnp.float32
        )
        t0 = time.perf_counter()
        out = solve(p, edges_b)
        _ = jax.device_get(out)
        best = min(best, time.perf_counter() - t0)
    rate = batch * LM_ITERS / best
    print(f"pcg(rtol={rtol}, max={maxit}): {best*1e3:.1f} ms for "
          f"{batch}x{LM_ITERS} iters -> {rate:.1f} iters/s "
          f"(vs schur-bench ~488)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
