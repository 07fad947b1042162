"""In-context A/B experiments on the headline bench workload.

Same harness as bench.py (INTEL+50, per-seed partitioned Schur, batched
seeds, steady-state best-of-3 with per-rep input perturbation and a
device_get barrier) with the tuning knobs exposed, so candidate
optimizations are measured in context -- the r1 lesson is that standalone
microbenches over-attribute stage costs (XLA overlaps native ops with
surrounding work; results/README.md "blocked" note).

Usage:
    python scripts/bench_variants.py batch=8 blocks=16 blocked=0 panel=16
(any subset; defaults shown).  Prints one JSON line per invocation.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LM_ITERS = 50


def main() -> int:
    opts = dict(batch=8, blocks=16, blocked=0, panel=16, inner=0, cuts=0,
                pallas=0)
    for a in sys.argv[1:]:
        k, v = a.split("=")
        opts[k] = int(v)
    # Guard against _panel_factor's silent single-level fallback (ADVICE
    # r4): a row labeled inner=K must actually run two-level.
    if opts["inner"] and (opts["inner"] >= opts["panel"]
                          or opts["panel"] % opts["inner"]):
        raise ValueError("inner must divide panel and be smaller")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from slam_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    from slam_tpu.config import SolverConfig
    from slam_tpu.io import g2o
    from slam_tpu.solver.lm import lm_fixed_iters
    from slam_tpu.solver.problem import anchor_first_node, edge_set_from_graph
    from slam_tpu.solver.schur import build_partition, partition_stats

    BATCH, NUM_BLOCKS = opts["batch"], opts["blocks"]
    graph = g2o.load_g2o(g2o.find_dataset("INTEL"))
    dirties = [
        graph.add_random_outliers(50, seed=s).canonical_order()
        for s in range(BATCH)
    ]
    sets = [
        edge_set_from_graph(g, dtype=jnp.float32, incidence=True)
        for g in dirties
    ]
    cuts = bool(opts["cuts"])
    parts = [
        build_partition(g.edges_ij, g.num_nodes, NUM_BLOCKS,
                        dtype=jnp.float32, optimize_cuts=cuts)
        for g in dirties
    ]
    # Shared pad maxima across seeds so the batch stacks into one program.
    dims = [(p.ni_max, p.ns, p.ek_max, p.es_max, p.nsk_max) for p in parts]
    pad = tuple(max(d[i] for d in dims) for i in range(5))
    parts = [
        build_partition(g.edges_ij, g.num_nodes, NUM_BLOCKS,
                        dtype=jnp.float32, pad_shapes=pad,
                        optimize_cuts=cuts)
        for g in dirties
    ]
    edges_b = jax.tree.map(lambda *xs: jnp.stack(xs), *sets)
    parts_b = jax.tree.map(lambda *xs: jnp.stack(xs), *parts)
    free = anchor_first_node(graph.num_nodes, dtype=jnp.float32)
    poses0 = jnp.asarray(graph.poses, jnp.float32)
    sw0 = jnp.ones((sets[0].num_edges,), jnp.float32)
    cfg = SolverConfig(robust="dcs", linear_solver="schur", dtype="float32",
                       schur_blocked=bool(opts["blocked"]),
                       schur_panel=opts["panel"],
                       schur_panel_inner=opts["inner"],
                       schur_pallas_micro=bool(opts["pallas"]))

    @jax.jit
    def solve(p, eb, pb):
        def one(e, part):
            r = lm_fixed_iters(p, sw0, e, free, cfg, LM_ITERS,
                               partition=part)
            return r.cost, r.initial_cost
        return jax.vmap(one)(eb, pb)

    costs, costs0 = (np.asarray(x) for x in
                     jax.device_get(solve(poses0, edges_b, parts_b)))
    ok = bool(np.all(costs0 > 2.0) and np.all(costs < 0.6 * costs0))

    rng = np.random.default_rng(1)
    best = float("inf")
    for _ in range(3):
        p = poses0 + jnp.asarray(
            rng.normal(0, 1e-6, poses0.shape), jnp.float32)
        t0 = time.perf_counter()
        _ = jax.device_get(solve(p, edges_b, parts_b))
        best = min(best, time.perf_counter() - t0)
    print(json.dumps(dict(
        opts, quality_ok=ok, wall_s=round(best, 4),
        iters_s=round(BATCH * LM_ITERS / best, 1),
        cost_mean=round(float(costs.mean()), 4),
    )))
    return 0


if __name__ == "__main__":
    sys.exit(main())
