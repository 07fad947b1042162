"""Headline benchmark: robust LM optimizer throughput on real TPU hardware.

Workload: the reference's headline experiment (INTEL 2D pose graph + 50
injected outlier loops, DCS phi=0.5, Huber 0.01 -- ``README.md:41-43`` of
/root/reference) solved with the partitioned-Schur LM loop (exact linear
solver; see ``slam_tpu/solver/schur.py``), 50 LM iterations, batched over
``BATCH`` independently-seeded outlier sets -- each with its OWN partition,
padded to shared shapes and vmapped (the reference's "Try1/Try2"
Monte-Carlo usage pattern run as one device program).

Metric: aggregate LM iterations/second on one chip, steady state (best of
3, inputs perturbed per rep, host-transfer barrier -- see timing note
below).

Baselines (two, both reported):
* ``vs_baseline`` -- Ceres (SPARSE_NORMAL_CHOLESKY, trust-region LM, the
  reference's exact configuration) on a single CPU host solves
  INTEL-scale graphs at roughly 10-20 ms per iteration (~3.7k
  parameters, ~15k Jacobian nnz, AMD-ordered sparse Cholesky); Ceres is
  not installable in this image (verified r1), so 100 iterations/s --
  the OPTIMISTIC end of that range -- is the fixed documented estimate,
  understating rather than inflating the ratio.
* ``vs_measured_cpu`` -- this repo's own solver (f64, best of
  dense/schur) on the identical workload pinned to ONE core of THIS
  machine, measured by ``scripts/bench_cpu_baseline.py`` and committed
  in ``results/cpu_baseline.json``.  No unmeasured constant.

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
BATCH = 8
# Block-count sweep on INTEL (results/README.md): P=2/4/8/12/16 ->
# 278/350/383/383/416 single-problem it/s at identical cost; 16 wins.
NUM_BLOCKS = 16

# TPU v5e (v5 lite) public peaks -- the roofline anchors for the mfu /
# membw_frac fields (cloud.google.com/tpu/docs/v5e: 197 TFLOP/s bf16,
# 819 GB/s HBM).  The program is f32 with HIGHEST-precision pins on the
# gathers/normal equations (bf16-pass decomposition), so FLOPs counted by
# XLA against the bf16 peak UNDERSTATE utilization -- mfu here is a
# conservative lower bound.
PEAK_FLOPS_BF16 = 197e12
PEAK_HBM_BYTES_S = 819e9


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
    from slam_tpu.solver.schur import build_partition, partition_stats

    graph = g2o.load_g2o(g2o.find_dataset(DATASET))
    dirties = [
        graph.add_random_outliers(NUM_OUTLIERS, seed=s).canonical_order()
        for s in range(BATCH)
    ]
    sets = [
        edge_set_from_graph(g, dtype=jnp.float32, incidence=True)
        for g in dirties
    ]
    # partition_stats gives the shared pad maxima without materialising
    # the (hundreds-of-MB at scale) selection operators twice per seed.
    stats = [
        partition_stats(g.edges_ij, g.num_nodes, NUM_BLOCKS)
        for g in dirties
    ]
    pad = tuple(max(s[i] for s in stats) for i in range(len(stats[0])))
    parts = [
        build_partition(g.edges_ij, g.num_nodes, NUM_BLOCKS,
                        dtype=jnp.float32, pad_shapes=pad)
        for g in dirties
    ]
    edges_b = jax.tree.map(lambda *xs: jnp.stack(xs), *sets)
    parts_b = jax.tree.map(lambda *xs: jnp.stack(xs), *parts)
    free = anchor_first_node(graph.num_nodes, dtype=jnp.float32)
    poses0 = jnp.asarray(graph.poses, jnp.float32)
    sw0 = jnp.ones((sets[0].num_edges,), jnp.float32)
    # schur_blocked + panel 128: the r4 measured winner in context
    # (scripts/bench_variants.py: 656.7 vs 625.8 it/s native; panel
    # 64/256 -> 651.9/573.2) -- the MXU-tile panel reverses the r1
    # panel-16/32 negative recorded in results/README.md.
    cfg = SolverConfig(robust="dcs", linear_solver="schur", dtype="float32",
                       schur_blocked=True, schur_panel=128)

    @jax.jit
    def solve(p, eb, pb):
        def one(e, part):
            r = lm_fixed_iters(p, sw0, e, free, cfg, LM_ITERS,
                               partition=part)
            return r.cost, r.initial_cost
        return jax.vmap(one)(eb, pb)

    # Warm-up / compile.
    costs, costs0 = (np.asarray(x) for x in
                     jax.device_get(solve(poses0, edges_b, parts_b)))

    # Quality gate: every seed must converge substantially (dense f64 on
    # seed 42 reaches ~0.5x initial in 50 iters; requiring < 0.6x here).
    if not (np.all(costs0 > 2.0) and np.all(costs < 0.6 * costs0)):
        print(json.dumps({
            "metric": (
                f"{DATASET}+{NUM_OUTLIERS}outliers DCS robust LM iters/s "
                "(1 chip, batched schur) -- QUALITY GATE FAILED "
                f"(costs {costs0.round(2).tolist()}->"
                f"{costs.round(2).tolist()})"
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
        out = solve(p, edges_b, parts_b)
        _ = jax.device_get(out)
        best = min(best, time.perf_counter() - t0)

    iters_per_s = BATCH * LM_ITERS / best

    # Roofline accounting (VERDICT r3 #1): XLA's own post-optimization
    # cost model for the exact compiled program, divided by the measured
    # steady-state wall.  "bytes accessed" is XLA's HBM-traffic estimate
    # for the optimized HLO (per-instruction operand+output bytes after
    # fusion) -- the standard roofline numerator.
    roofline = {}
    try:
        ca = solve.lower(poses0, edges_b, parts_b).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        bytes_acc = float(ca.get("bytes accessed", 0.0))
        if flops and bytes_acc:
            intensity = flops / bytes_acc           # FLOP / byte
            balance = PEAK_FLOPS_BF16 / PEAK_HBM_BYTES_S
            roofline = {
                "flops_per_call": flops,
                "bytes_per_call": bytes_acc,
                "achieved_tflops": round(flops / best / 1e12, 3),
                "achieved_gb_s": round(bytes_acc / best / 1e9, 1),
                "mfu": round(flops / best / PEAK_FLOPS_BF16, 4),
                "membw_frac": round(bytes_acc / best / PEAK_HBM_BYTES_S, 3),
                "arith_intensity": round(intensity, 1),
                "bound": ("memory" if intensity < balance else "compute"),
                # fraction of the BINDING roofline actually achieved
                "roofline_frac": round(
                    (bytes_acc / best / PEAK_HBM_BYTES_S)
                    if intensity < balance
                    else (flops / best / PEAK_FLOPS_BF16), 3),
            }
    except Exception:
        pass  # cost model unavailable on this backend; it/s still reported

    record = {
        "metric": (
            f"{DATASET}+{NUM_OUTLIERS}outliers DCS robust LM iterations/s "
            f"(1 chip, batch {BATCH}, per-seed partitioned-Schur exact "
            "solve, f32)"
        ),
        "value": round(iters_per_s, 1),
        "unit": "iters/s",
        "vs_baseline": round(iters_per_s / CERES_CPU_BASELINE_ITERS_PER_S, 2),
    }
    record.update(roofline)
    import os
    cpu_base = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results", "cpu_baseline.json")
    if os.path.exists(cpu_base):
        measured = json.load(open(cpu_base)).get("iters_per_s")
        if measured:
            record["vs_measured_cpu"] = round(iters_per_s / measured, 1)
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    sys.exit(main())
