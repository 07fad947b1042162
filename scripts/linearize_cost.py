"""Measure the UNFUSED linearization cost for the two model classes the
Pallas fused kernel does not cover (VERDICT r4 task 8 / weak #4):
sphere2500 SE(3) and method-2 switchable constraints.

``ops/pallas_linearize.py`` fuses SE(2) x {none, dcs} only
(``solver/linearize.py:95``).  This script bounds what the unfused path
costs end-to-end for the uncovered classes: it times (a) one jitted
standalone linearization and (b) a full LM iteration of the production
solver, and reports the ratio.  A standalone linearize OVER-attributes
its cost (in context XLA fuses it with the surrounding solve; see the r4
blocked-chol finding), so the reported fraction is an UPPER bound --
if the bound is small, an SE(3)/SC Pallas kernel cannot pay for itself.

Writes the record into stdout (captured into results/ROUND5.md).

Usage: python scripts/linearize_cost.py
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, *args, reps=5):
    import jax
    fn(*args)  # warm-up/compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = jax.device_get(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def measure(name, graph, robust, model, iters, blocks):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from slam_tpu.config import SolverConfig
    from slam_tpu.solver.lm import lm_fixed_iters
    from slam_tpu.solver.linearize import linearize
    from slam_tpu.solver.problem import anchor_first_node, edge_set_from_graph
    from slam_tpu.solver.schur import build_partition

    g = graph.canonical_order()
    dtype = jnp.float32
    edges = edge_set_from_graph(g, dtype=dtype, incidence="chain")
    free = anchor_first_node(g.num_nodes, dtype=dtype)
    poses0 = jnp.asarray(g.poses, dtype)
    sw0 = jnp.ones((edges.num_edges,), dtype)
    cfg = SolverConfig(robust=robust, linear_solver="schur",
                       dtype="float32")
    part = build_partition(g.edges_ij, g.num_nodes, blocks, dtype=dtype)

    REPS = 100

    @jax.jit
    def lin(p, s):
        # One device call per standalone dispatch costs ~25-30 ms on the
        # axon backend (measured: a single linearize "took" 14x a full LM
        # iteration CONTAINING it) -- amortise over an in-program scan of
        # REPS linearizations at per-step-perturbed inputs (no CSE).
        def body(acc, i):
            pp = p + i * jnp.asarray(1e-12, p.dtype)
            sys_ = linearize(pp, s, edges, free, model=model,
                             robust=robust, dcs_phi=cfg.dcs_phi,
                             huber_delta=cfg.huber_delta,
                             sc_prior_lambda=cfg.sc_prior_lambda,
                             use_pallas=False)
            # Materialise every output so XLA cannot drop work.
            return acc + (jnp.sum(sys_.g) + jnp.sum(sys_.Ja)
                          + jnp.sum(sys_.Jb) + jnp.sum(sys_.r)
                          + jnp.sum(sys_.Hss)), None
        out, _ = jax.lax.scan(
            body, jnp.asarray(0.0, p.dtype),
            jnp.arange(REPS, dtype=p.dtype))
        return out

    @jax.jit
    def full(p, s):
        r = lm_fixed_iters(p, s, edges, free, cfg, iters, partition=part,
                           model=model)
        return r.cost, r.initial_cost

    rng = np.random.default_rng(0)

    def perturbed():
        if model.pose_dim == 7:
            return poses0.at[:, :3].add(jnp.asarray(
                rng.normal(0, 1e-6, (poses0.shape[0], 3)), dtype))
        return poses0 + jnp.asarray(
            rng.normal(0, 1e-6, poses0.shape), dtype)

    lin_s = min(_time(lin, perturbed(), sw0) for _ in range(2)) / REPS
    full_s = min(_time(full, perturbed(), sw0) for _ in range(2))
    per_iter = full_s / iters
    row = dict(workload=name, robust=robust,
               linearize_ms=round(lin_s * 1e3, 3),
               lm_iteration_ms=round(per_iter * 1e3, 3),
               unfused_frac_upper_bound=round(lin_s / per_iter, 4))
    print(row, flush=True)
    return row


def main() -> int:
    from slam_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import numpy as np

    from slam_tpu.io import g2o
    from slam_tpu.solver.models import SE2Model, SE3Model

    # sphere2500 SE(3), DCS (the bench_sphere workload).
    g = g2o.load_g2o("data/sphere2500.g2o").canonical_order()
    meas = g.edges_meas.copy()
    rng = np.random.default_rng(5)
    loop_idx = np.where(g.edge_type != 0)[0]
    bad = rng.choice(loop_idx, size=20, replace=False)
    meas[bad, :3] += rng.normal(0, 20.0, (20, 3))
    etype = g.edge_type.copy()
    etype[bad] = 2
    sphere = dataclasses.replace(g, edges_meas=meas, edge_type=etype)
    measure("sphere2500 SE(3) +20corrupt", sphere, "dcs", SE3Model,
            iters=30, blocks=4)

    # INTEL+50 method 2 (switchable constraints, joint switches).
    intel = g2o.load_g2o(g2o.find_dataset("INTEL")).add_random_outliers(
        50, seed=42)
    measure("INTEL+50 SC (method 2)", intel, "sc", SE2Model,
            iters=50, blocks=16)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
