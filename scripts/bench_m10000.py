"""M10000-scale solver comparison on the real chip.

Runs the synthetic M10000 graph (10k nodes, 13.1k edges, ~3.1k closures)
with 50 injected outliers through DCS LM with the requested linear solver:

    python scripts/bench_m10000.py schur:8 schur:16 pcg:0

``schur:P`` = partitioned-Schur exact solve with P map blocks;
``pcg:0``   = tridiag-CR-preconditioned PCG (the previous scale champion,
results/README.md "Scale notes": 6.47 LM it/s chain-compressed).

Timing discipline matches bench.py (perturbed inputs per rep +
device_get barrier).  Single problem (no batch): at this scale one
problem saturates the chip.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LM_ITERS = 30
if "--iters" in sys.argv:
    LM_ITERS = int(sys.argv[sys.argv.index("--iters") + 1])
# Device-call chunking (default 10 -- the r2 conservative choice).  At
# 30+ it/s a full 30-iteration call is ~1 s of device time, far under
# the axon ~1-minute execution kill, so larger chunks amortize the
# host round-trip per chunk; --chunk N measures that.
CHUNK_ARG = 10
if "--chunk" in sys.argv:
    CHUNK_ARG = int(sys.argv[sys.argv.index("--chunk") + 1])


def run(spec: str) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from slam_tpu.config import SolverConfig
    from slam_tpu.io import g2o
    from slam_tpu.solver.lm import lm_fixed_iters
    from slam_tpu.solver.problem import anchor_first_node, edge_set_from_graph
    from slam_tpu.solver.schur import build_partition

    kind, blocks, *pn = spec.split(":")
    if pn and kind != "schurblk":
        raise ValueError(
            f"spec {spec!r}: panel/inner fields are only valid for "
            "schurblk:P[:panel[:inner]]")
    blocks = int(blocks)

    graph = g2o.load_g2o("data/M10000.g2o")
    dirty = graph.add_random_outliers(50, seed=0).canonical_order()
    if "--init-auto" in sys.argv:
        # The PRODUCT default (init auto: PCM-gated chordal) -- VERDICT r2
        # #8's cure for the cost-vs-P landscape spread: the init lands
        # every block count in the same basin.
        from slam_tpu.config import RunConfig
        from slam_tpu.solver.init import apply_init
        dirty = apply_init(dirty, RunConfig(init="auto"))
    elif "--init-chordal" in sys.argv:
        from slam_tpu.solver.init import chordal_init
        dirty = chordal_init(dirty)
    # Schur topology now lives in precomputed SchurPartition endpoint maps;
    # the matvec-only PCG path can use the chain-compressed form.
    edges = edge_set_from_graph(
        dirty, dtype=jnp.float32,
        incidence="chain")
    free = anchor_first_node(dirty.num_nodes, dtype=jnp.float32)
    poses0 = jnp.asarray(dirty.poses, jnp.float32)
    sw0 = jnp.ones((edges.num_edges,), jnp.float32)

    partition = None
    if kind in ("schur", "schuropt", "schurgnc", "schurblk", "schurgraph"):
        # ``schuropt:P`` places the block cuts with the span-minimising DP
        # (optimize_cut_positions) instead of equal-size slicing.
        # ``schurgraph:P`` partitions by GRAPH structure (recursive spectral
        # bisection, partition.graph_partition) -- on this Manhattan-world
        # graph the long-index-span closures make every contiguous scheme
        # cut thousands of edges (ns=1793 at P=24) where the spectral cut
        # keeps them inside blocks (ns=428).
        # ``schurgnc:P`` = equal cuts + graduated non-convexity (phi
        # annealed over the first 2/3 of the iterations).
        gnc = dict(gnc_anneal_iters=LM_ITERS * 2 // 3) \
            if kind == "schurgnc" else {}
        # ``schurblk:P`` = panel-blocked MXU Cholesky/solves instead of
        # XLA natives (blocked_chol.py; the candidate at this interior
        # size, where XLA's sequential factor/solve dominates).
        if kind == "schurblk":
            # ``schurblk:P[:panel[:inner]]`` -- r4: panel width and the
            # two-level inner width (blocked_chol.py::_panel_factor).
            gnc["schur_blocked"] = True
            if pn:
                gnc["schur_panel"] = int(pn[0])
            if len(pn) > 1:
                gnc["schur_panel_inner"] = int(pn[1])
                # _panel_factor silently falls back to single-level when
                # inner doesn't tile the panel (ADVICE r4): reject here so
                # a recorded row can't carry a mislabeled inner width.
                if (gnc["schur_panel_inner"] >= gnc["schur_panel"]
                        or gnc["schur_panel"] % gnc["schur_panel_inner"]):
                    raise ValueError(
                        f"spec {spec!r}: inner must divide panel and be "
                        "smaller (blocked_chol._panel_factor would "
                        "silently run single-level)")
        cfg = SolverConfig(robust="dcs", linear_solver="schur",
                           dtype="float32", **gnc)
        node_block = None
        if kind == "schurgraph":
            from slam_tpu.solver.partition import graph_partition
            node_block = graph_partition(dirty.edges_ij, dirty.num_nodes,
                                         blocks)
        partition = build_partition(dirty.edges_ij, dirty.num_nodes, blocks,
                                    dtype=jnp.float32,
                                    optimize_cuts=(kind == "schuropt"),
                                    node_block=node_block)
    else:
        # ``pcg:N`` caps the inner CG at N iterations (0 -> 100).  On this
        # outlier-heavy graph the chain preconditioner models closures only
        # diagonally, so CG hits whatever cap it is given; throughput is a
        # direct function of the cap and "LM it/s" must be read together
        # with the reached cost.
        cfg = SolverConfig(robust="dcs", linear_solver="pcg", dtype="float32",
                           pcg_rtol=1e-3, pcg_max_iters=blocks or 100,
                           pcg_preconditioner="tridiag")

    # Pass the large arrays (incidence operators, partition selectors) as
    # ARGUMENTS: closed-over device arrays are baked into the HLO as
    # constants, and at this scale the program blows the axon
    # remote-compile request limit (HTTP 413).  Chunked driving (3 x 10
    # iters, poses threaded through the host) keeps each device call under
    # the axon worker's ~1-minute single-execution kill.
    CHUNK = CHUNK_ARG

    @jax.jit
    def solve(p, s, e, part, lam0, nu0, it0):
        r = lm_fixed_iters(p, s, e, free, cfg, CHUNK, partition=part,
                           lam0=lam0, nu0=nu0, it0=it0)
        return (r.poses, r.switches, r.cost, r.initial_cost,
                r.final_lambda, r.final_nu, r.iterations)

    def full(p, want_poses=False):
        s = sw0
        cost0 = None
        # Thread (lambda, nu, iteration) through the chunks: continuous
        # trust region and a continuous GNC anneal position (a per-chunk
        # reset is a different algorithm).
        lam = jnp.asarray(cfg.init_lambda, jnp.float32)
        nu = jnp.asarray(2.0, jnp.float32)
        it = jnp.int32(0)
        for _ in range(LM_ITERS // CHUNK):
            p, s, cost, c0, lam, nu, it = solve(
                p, s, edges, partition, lam, nu, it)
            cost0 = float(c0) if cost0 is None else cost0
        if want_poses:
            return float(jax.device_get(cost)), cost0, np.asarray(
                jax.device_get(p), np.float64)
        return float(jax.device_get(cost)), cost0

    t0 = time.perf_counter()
    cost, cost0, opt_poses = full(poses0, want_poses=True)
    compile_s = time.perf_counter() - t0

    rng = np.random.default_rng(1)
    best = float("inf")
    for _ in range(3):
        p = poses0 + jnp.asarray(
            rng.normal(0, 1e-6, poses0.shape), jnp.float32
        )
        t0 = time.perf_counter()
        full(p)
        best = min(best, time.perf_counter() - t0)
    from slam_tpu.eval import metrics
    gt = np.load("data/M10000_gt.npy")
    ate = float(metrics.ate(opt_poses[:, :2], gt[:, :2]))
    return dict(spec=spec, init=("auto" if "--init-auto" in sys.argv
                                 else "chordal" if "--init-chordal" in sys.argv
                                 else "dataset"),
                cost0=round(cost0, 4), cost=round(cost, 4),
                compile_or_first_s=round(compile_s, 1),
                iters_s=round(LM_ITERS / best, 2),
                ate_m=round(ate, 3))


def main():
    from slam_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    argv = sys.argv[1:]
    for flag in ("--iters", "--chunk"):
        if flag in argv:
            i = argv.index(flag)
            del argv[i:i + 2]  # drop the flag and its value by position
    for spec in argv:
        if spec.startswith("--"):
            continue
        print(run(spec), flush=True)


if __name__ == "__main__":
    main()
