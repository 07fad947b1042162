"""Headline benchmark: robust LM optimizer throughput on real TPU hardware.

Workload: the reference's headline experiment (INTEL 2D pose graph + 50
injected outlier loops, DCS phi=0.5, Huber 0.01 -- ``README.md:41-43`` of
/root/reference) solved with the partitioned-Schur LM loop (exact linear
solver; see ``slam_tpu/solver/schur.py``), 50 LM iterations.

Metric: LM iterations/second on one chip, steady state (best of 3, inputs
perturbed per rep, host-transfer barrier -- see timing note below).

Baseline: Ceres (SPARSE_NORMAL_CHOLESKY, trust-region LM, the reference's
exact configuration) on a single CPU host solves INTEL-scale graphs at
roughly 10-20 ms per iteration (~3.7k parameters, ~15k Jacobian nnz,
AMD-ordered sparse Cholesky); Ceres is not installed in this image, so we
use 100 iterations/s -- the OPTIMISTIC end of that range -- as the fixed
documented baseline so ``vs_baseline`` is understated rather than inflated.

Quality gate before timing: the 50-iteration solve must reach the known
good cost band for this seed (dense f64 reference: 2.9697 -> ~1.51).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "iters/s", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

CERES_CPU_BASELINE_ITERS_PER_S = 100.0
LM_ITERS = 50
DATASET = "INTEL"
NUM_OUTLIERS = 50
SEED = 42
NUM_BLOCKS = 4


def main() -> int:
    import jax

    from slam_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    import numpy as np

    from slam_tpu.config import SolverConfig
    from slam_tpu.io import g2o
    from slam_tpu.solver.lm import lm_fixed_iters
    from slam_tpu.solver.problem import anchor_first_node, edge_set_from_graph
    from slam_tpu.solver.schur import build_partition

    graph = g2o.load_g2o(g2o.find_dataset(DATASET))
    dirty = graph.add_random_outliers(NUM_OUTLIERS, seed=SEED).canonical_order()
    edges = edge_set_from_graph(dirty, dtype=jnp.float32, incidence=True)
    free = anchor_first_node(dirty.num_nodes, dtype=jnp.float32)
    poses0 = jnp.asarray(dirty.poses, jnp.float32)
    sw0 = jnp.ones((edges.num_edges,), jnp.float32)
    part = build_partition(
        dirty.edges_ij, dirty.num_nodes, NUM_BLOCKS, dtype=jnp.float32
    )
    cfg = SolverConfig(robust="dcs", linear_solver="schur", dtype="float32")

    def solve(p):
        return lm_fixed_iters(p, sw0, edges, free, cfg, LM_ITERS,
                              partition=part)

    # Warm-up / compile.
    res = solve(poses0)
    cost = float(jax.device_get(res.cost))
    cost0 = float(jax.device_get(res.initial_cost))

    # Quality gate: must land in the known-good band (dense f64 gives
    # 2.9697 -> 1.508 for this exact seed; allow slack for f32/solver).
    if not (2.9 < cost0 < 3.05 and cost < 1.7):
        print(json.dumps({
            "metric": (
                f"{DATASET}+{NUM_OUTLIERS}outliers DCS robust LM iters/s "
                "(1 chip, schur) -- QUALITY GATE FAILED "
                f"(cost {cost0:.3f}->{cost:.3f})"
            ),
            "value": 0.0,
            "unit": "iters/s",
            "vs_baseline": 0.0,
        }))
        return 1

    # Timing: on the axon remote backend block_until_ready can return early
    # for repeated identical programs; perturb inputs per rep and force a
    # host transfer as the barrier.
    rng = np.random.default_rng(1)
    best = float("inf")
    for _ in range(3):
        p = poses0 + jnp.asarray(
            rng.normal(0, 1e-6, poses0.shape), jnp.float32
        )
        t0 = time.perf_counter()
        out = solve(p)
        _ = jax.device_get(out.cost)
        best = min(best, time.perf_counter() - t0)

    iters_per_s = LM_ITERS / best
    print(json.dumps({
        "metric": (
            f"{DATASET}+{NUM_OUTLIERS}outliers DCS robust LM iterations/s "
            f"(1 chip, partitioned-Schur exact solve, f32)"
        ),
        "value": round(iters_per_s, 1),
        "unit": "iters/s",
        "vs_baseline": round(iters_per_s / CERES_CPU_BASELINE_ITERS_PER_S, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
