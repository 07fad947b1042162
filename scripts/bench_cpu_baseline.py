"""Measure the single-core CPU LM baseline that anchors bench.py's ratio.

The reference's solve is Ceres (SPARSE_NORMAL_CHOLESKY, trust-region LM)
on a single CPU host (``main.cpp:154-163``); Ceres is not installable in
this image (verified r1), so the measured stand-in is THIS repo's own
solver -- f64, dense Cholesky (the configuration whose fixed point is
bit-validated against the golden trajectories) -- on the identical
INTEL+50 workload, pinned to one core.

Writes ``results/cpu_baseline.json`` (consumed by bench.py for the
``vs_measured_cpu`` field) and prints the record.

Run pinned:  taskset -c 0 python scripts/bench_cpu_baseline.py
(The script also forces single-threaded XLA CPU so an unpinned run is
close; the committed number should come from a taskset run.)
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault(
    "XLA_FLAGS",
    "--xla_cpu_multi_thread_eigen=false intra_op_parallelism_threads=1",
)
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "..", "results",
                   "cpu_baseline.json")
LM_ITERS = 50


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from slam_tpu.config import SolverConfig
    from slam_tpu.io import g2o
    from slam_tpu.solver.lm import lm_fixed_iters
    from slam_tpu.solver.problem import anchor_first_node, edge_set_from_graph

    from slam_tpu.solver.schur import build_partition

    graph = g2o.load_g2o(g2o.find_dataset("INTEL"))
    dirty = graph.add_random_outliers(50, seed=42).canonical_order()
    edges = edge_set_from_graph(dirty, dtype=jnp.float64, incidence=False)
    free = anchor_first_node(dirty.num_nodes, dtype=jnp.float64)
    poses0 = jnp.asarray(dirty.poses, jnp.float64)
    sw0 = jnp.ones((edges.num_edges,), jnp.float64)
    part = build_partition(np.asarray(edges.ij), dirty.num_nodes, 16,
                           dtype=jnp.float64)
    rng = np.random.default_rng(1)

    def measure(solver, partition):
        cfg = SolverConfig(robust="dcs", linear_solver=solver,
                           dtype="float64", use_pallas="off")

        def run(p):
            return lm_fixed_iters(p, sw0, edges, free, cfg, LM_ITERS,
                                  partition=partition)

        # Warm-up / compile + the quality anchor for this exact config
        # (verify skill: 2.969723 -> ~1.51 at 50 iters).
        r = run(poses0)
        jax.block_until_ready(r.poses)
        assert float(r.initial_cost) > 2.5 and float(r.cost) < 1.8, (
            solver, float(r.initial_cost), float(r.cost))
        best = float("inf")
        for _ in range(3):
            p = poses0 + jnp.asarray(rng.normal(0, 1e-6, poses0.shape))
            t0 = time.perf_counter()
            out = run(p)
            _ = jax.device_get(out.poses)
            best = min(best, time.perf_counter() - t0)
        return round(LM_ITERS / best, 2), float(r.cost)

    dense_ips, dense_cost = measure("dense", None)
    schur_ips, schur_cost = measure("schur", part)

    rec = {
        "workload": "INTEL+50outliers seed42, DCS LM, f64, 1 CPU core",
        "pinning": "XLA single-thread flags; run under taskset -c 0 for "
                   "the committed number",
        "lm_iters": LM_ITERS,
        "dense_iters_per_s": dense_ips,
        "schur_p16_iters_per_s": schur_ips,
        "iters_per_s": max(dense_ips, schur_ips),
        "final_cost": {"dense": dense_cost, "schur": schur_cost},
    }
    with open(OUT, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
