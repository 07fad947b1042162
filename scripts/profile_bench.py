"""Decompose the bench.py iteration cost on the real chip.

Runs the exact bench workload (INTEL+50 x batch 8, DCS, Schur P=16, 50
iterations) in ablated variants so the per-stage cost falls out of wall
differences (the axon remote profiler over-attributes; see results notes):

  full    -- the real LM step (linearize -> schur_solve -> retract -> cost)
  nosolve -- identical but dx forced to 0 (linearize + retract + cost only)

solve time/iter = (full - nosolve).  Timing discipline matches bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LM_ITERS = 50
BATCH = 8
NUM_BLOCKS = 16


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from slam_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    from slam_tpu.config import SolverConfig
    from slam_tpu.io import g2o
    from slam_tpu.solver import schur as schur_mod
    from slam_tpu.solver.linearize import cost_only, linearize
    from slam_tpu.solver.models import SE2Model
    from slam_tpu.solver.problem import anchor_first_node, edge_set_from_graph
    from slam_tpu.solver.schur import build_partition, partition_stats

    graph = g2o.load_g2o(g2o.find_dataset("INTEL"))
    dirties = [
        graph.add_random_outliers(50, seed=s).canonical_order()
        for s in range(BATCH)
    ]
    sets = [edge_set_from_graph(g, dtype=jnp.float32, incidence=True)
            for g in dirties]
    stats = [partition_stats(g.edges_ij, g.num_nodes, NUM_BLOCKS)
             for g in dirties]
    pad = tuple(max(s[i] for s in stats) for i in range(len(stats[0])))
    parts = [build_partition(g.edges_ij, g.num_nodes, NUM_BLOCKS,
                             dtype=jnp.float32, pad_shapes=pad)
             for g in dirties]
    edges_b = jax.tree.map(lambda *xs: jnp.stack(xs), *sets)
    parts_b = jax.tree.map(lambda *xs: jnp.stack(xs), *parts)
    free = anchor_first_node(graph.num_nodes, dtype=jnp.float32)
    poses0 = jnp.asarray(graph.poses, jnp.float32)
    cfg = SolverConfig(robust="dcs", linear_solver="schur", dtype="float32")
    kw = dict(model=SE2Model, robust="dcs", dcs_phi=cfg.dcs_phi,
              huber_delta=cfg.huber_delta, sc_prior_lambda=1.0)

    def make(variant):
        def one(p0, e, part):
            sw = jnp.ones((e.num_edges,), jnp.float32)

            def step(carry, _):
                p, lam = carry
                system = linearize(p, sw, e, free, use_pallas=True, **kw)
                if variant == "full":
                    dx = schur_mod.schur_solve(system, e, part, lam)
                    dp = dx.poses
                else:
                    dp = jnp.zeros_like(p) * system.cost
                newp = SE2Model.retract(p, dp)
                c = cost_only(newp, sw, e, **kw)
                accept = c < system.cost
                p = jnp.where(accept, newp, p)
                lam = jnp.where(accept, lam / 3.0, lam * 2.0)
                return (p, lam), c

            (p, _), cs = jax.lax.scan(
                step, (p0, jnp.float32(1e-4)), None, length=LM_ITERS)
            return cs[-1]

        @jax.jit
        def run(p, eb, pb):
            return jax.vmap(lambda e, part: one(p, e, part))(eb, pb)

        return run

    rng = np.random.default_rng(1)
    out = {}
    for variant in ("full", "nosolve"):
        run = make(variant)
        _ = jax.device_get(run(poses0, edges_b, parts_b))  # compile
        best = float("inf")
        for _ in range(3):
            p = poses0 + jnp.asarray(
                rng.normal(0, 1e-6, poses0.shape), jnp.float32)
            t0 = time.perf_counter()
            _ = jax.device_get(run(p, edges_b, parts_b))
            best = min(best, time.perf_counter() - t0)
        per_iter_ms = best / LM_ITERS * 1e3
        out[variant] = per_iter_ms
        print({variant: round(per_iter_ms, 3)}, flush=True)
    print({"solve_ms_per_batched_iter":
           round(out["full"] - out["nosolve"], 3),
           "solve_fraction":
           round(1 - out["nosolve"] / out["full"], 3)}, flush=True)


if __name__ == "__main__":
    main()
