"""Scale check for the block-per-device distributed Schur path.

Runs M3500 + 50 outliers (3500 nodes, ~5.5k edges) through
``parallel/schur_dist.py`` on an 8-device virtual CPU mesh and pins the
cost trajectory against the single-device partitioned-Schur solver.  The
unit tests cover a 96-node graph; this exercises the real-dataset scale
the distributed path exists for (one map block per device, separator
psum'd).

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python scripts/dist_scale_check.py [LM_ITERS]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from slam_tpu.config import SolverConfig
    from slam_tpu.io import g2o
    from slam_tpu.parallel.mesh import make_block_mesh
    from slam_tpu.parallel.schur_dist import (
        build_dist_problem,
        distributed_schur_lm,
    )
    from slam_tpu.solver.lm import lm_fixed_iters
    from slam_tpu.solver.problem import anchor_first_node, edge_set_from_graph
    from slam_tpu.solver.schur import build_partition

    ndev = len(jax.devices())
    assert ndev >= 8, f"need 8 virtual devices, got {ndev} (set XLA_FLAGS)"

    graph = g2o.load_g2o(g2o.find_dataset("M3500"))
    g = graph.add_random_outliers(50, seed=0).canonical_order()
    dtype = jnp.float32
    cfg = SolverConfig(robust="dcs", linear_solver="schur", dtype="float32",
                       use_pallas="off")

    # Single-device reference: same block structure (P=8).
    edges = edge_set_from_graph(g, dtype=dtype, incidence=True)
    free = anchor_first_node(g.num_nodes, dtype=dtype)
    poses0 = jnp.asarray(g.poses, dtype)
    sw0 = jnp.ones((edges.num_edges,), dtype)
    part = build_partition(g.edges_ij, g.num_nodes, 8, dtype=dtype)
    t0 = time.perf_counter()
    ref = lm_fixed_iters(poses0, sw0, edges, free, cfg, iters, partition=part)
    ref_cost0 = float(ref.initial_cost)
    ref_cost = float(ref.cost)
    print(f"single-device schur P=8: {ref_cost0:.4f} -> {ref_cost:.4f} "
          f"({time.perf_counter() - t0:.1f}s incl compile)", flush=True)

    prob = build_dist_problem(g, 8, dtype=dtype)
    print(f"dist problem: ni={prob.ni} ns={prob.ns} ek={prob.ek}", flush=True)
    mesh = make_block_mesh(8)
    t0 = time.perf_counter()
    poses, cost, cost0, _sw = distributed_schur_lm(
        poses0, free, prob, cfg, mesh, iters
    )
    cost0, cost = float(cost0), float(cost)
    print(f"distributed schur 8-dev:  {cost0:.4f} -> {cost:.4f} "
          f"({time.perf_counter() - t0:.1f}s incl compile)", flush=True)

    # r5: same path with the spectral graph partition.  The psum'd
    # separator system (S, rhs_s) is (D*ns)^2 -- the dominant collective
    # -- so the smaller spectral separator cuts the per-iteration ICI
    # volume quadratically.
    from slam_tpu.solver.partition import graph_partition

    nb = graph_partition(g.edges_ij, g.num_nodes, 8)
    gprob = build_dist_problem(g, 8, dtype=dtype, node_block=nb)
    d = 3
    vol = (d * prob.ns) ** 2 * 4 / 1e6
    gvol = (d * gprob.ns) ** 2 * 4 / 1e6
    print(f"dist problem (spectral): ni={gprob.ni} ns={gprob.ns} "
          f"ek={gprob.ek}; separator psum {vol:.1f} -> {gvol:.1f} MB/iter "
          f"({vol / gvol:.1f}x less collective volume)", flush=True)
    t0 = time.perf_counter()
    gposes, gcost, gcost0, _gsw = distributed_schur_lm(
        poses0, free, gprob, cfg, mesh, iters
    )
    gcost0, gcost = float(gcost0), float(gcost)
    print(f"distributed schur 8-dev (spectral): {gcost0:.4f} -> "
          f"{gcost:.4f} ({time.perf_counter() - t0:.1f}s incl compile)",
          flush=True)

    ok0 = abs(cost0 - ref_cost0) < 1e-3 * max(1.0, ref_cost0)
    okg0 = abs(gcost0 - ref_cost0) < 1e-3 * max(1.0, ref_cost0)
    # Different partitions (uniform-by-index vs build_partition's balanced
    # cuts) give different f32 rounding, hence different accept chains; the
    # gate is agreement on substantial convergence, plus exact cost0.
    ok = (cost < 0.7 * cost0 and ref_cost < 0.7 * ref_cost0
          and gcost < 0.7 * gcost0)
    print("initial-cost match:", "PASS" if (ok0 and okg0) else "FAIL")
    print("convergence gate:  ", "PASS" if ok else "FAIL")
    return 0 if (ok0 and okg0 and ok) else 1


if __name__ == "__main__":
    sys.exit(main())
