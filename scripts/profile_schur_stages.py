"""Stage-level ablation of schur_solve cost on the bench workload.

Mirrors solver/schur.py's stages (same math, same precision pins) with an
early-out knob, in the same 50-iteration LM scan as bench.py, so the cost
of each stage falls out of wall-clock differences:

  sep      -- sep-edge gathers + C/b_sep assembly only
  assemble -- + per-block A/F/b assembly (edge gathers, Jint/Jsep outer
              products, normal-equation matmuls)
  factor   -- + interior Cholesky + Y/y triangular solves
  full     -- + S reduction, separator Cholesky, back-substitution,
              scatter (the production solver)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LM_ITERS = 50
BATCH = 8
NUM_BLOCKS = 16
DATASET = "INTEL"
SCHEME = "index"
# r5: ``--dataset M10000 --batch 1 --blocks 32 --scheme graph`` profiles
# the spectral-partition M10000 bench configuration (same stages; the
# use_inv-branch mirror still holds there: D*ni = 918 <= 1024).
if "--dataset" in sys.argv:
    DATASET = sys.argv[sys.argv.index("--dataset") + 1]
if "--batch" in sys.argv:
    BATCH = int(sys.argv[sys.argv.index("--batch") + 1])
if "--blocks" in sys.argv:
    NUM_BLOCKS = int(sys.argv[sys.argv.index("--blocks") + 1])
if "--scheme" in sys.argv:
    SCHEME = sys.argv[sys.argv.index("--scheme") + 1]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from slam_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    from slam_tpu.config import SolverConfig
    from slam_tpu.io import g2o
    from slam_tpu.solver.linear import Update, _DIAG_MAX, _DIAG_MIN
    from slam_tpu.solver.linearize import cost_only, linearize
    from slam_tpu.solver.models import SE2Model
    from slam_tpu.solver.problem import anchor_first_node, edge_set_from_graph
    from slam_tpu.solver.schur import (
        _PREC, _mm, build_partition, partition_stats,
    )

    graph = g2o.load_g2o(g2o.find_dataset(DATASET))
    dirties = [graph.add_random_outliers(50, seed=s).canonical_order()
               for s in range(BATCH)]
    # Large graphs must ride the chain-compressed incidence (a dense
    # (E, N) one-hot pair at M10000 scale is ~1 GB and blows the axon
    # remote-compile request); schur takes topology from the partition.
    inc = True if graph.num_nodes <= 2048 else "chain"
    sets = [edge_set_from_graph(g, dtype=jnp.float32, incidence=inc)
            for g in dirties]
    nbs = [None] * BATCH
    if SCHEME == "graph":
        from slam_tpu.solver.partition import graph_partition
        nbs = [graph_partition(g.edges_ij, g.num_nodes, NUM_BLOCKS)
               for g in dirties]
    stats = [partition_stats(g.edges_ij, g.num_nodes, NUM_BLOCKS,
                             node_block=nb)
             for g, nb in zip(dirties, nbs)]
    pad = tuple(max(s[i] for s in stats) for i in range(len(stats[0])))
    parts = [build_partition(g.edges_ij, g.num_nodes, NUM_BLOCKS,
                             dtype=jnp.float32, pad_shapes=pad,
                             node_block=nb)
             for g, nb in zip(dirties, nbs)]
    edges_b = jax.tree.map(lambda *xs: jnp.stack(xs), *sets)
    parts_b = jax.tree.map(lambda *xs: jnp.stack(xs), *parts)
    free = anchor_first_node(graph.num_nodes, dtype=jnp.float32)
    poses0 = jnp.asarray(graph.poses, jnp.float32)
    cfg = SolverConfig(robust="dcs", linear_solver="schur", dtype="float32")
    kw = dict(model=SE2Model, robust="dcs", dcs_phi=cfg.dcs_phi,
              huber_delta=cfg.huber_delta, sc_prior_lambda=1.0)

    def schur_stage(system, part, lam, stage):
        E, R, D = system.Ja.shape
        dtype = system.Ja.dtype
        P_blk = part.num_blocks
        ni, ns, ek = part.ni_max, part.ns, part.ek_max
        nsk = part.nsk_max
        wsqrt = jnp.sqrt(system.w)
        dnode = jnp.diagonal(system.Hdiag, axis1=-2, axis2=-1)
        clipd = jnp.clip(dnode, _DIAG_MIN, _DIAG_MAX)
        pin = (dnode == 0.0).astype(dtype)
        scale = jnp.where(dnode == 0.0, jnp.ones_like(dnode),
                          1.0 / jnp.sqrt(clipd))
        dampv = lam * clipd * scale * scale
        s_sep = _mm(part.sep_sel, scale).T.reshape(-1)

        es = part.es_max
        ssel = part.sepedge_sel
        Ja_s = _mm(ssel, system.Ja.reshape(E, R * D)).reshape(es, R, D)
        Jb_s = _mm(ssel, system.Jb.reshape(E, R * D)).reshape(es, R, D)
        w_s = _mm(ssel, wsqrt[:, None])[:, 0]
        r_s = _mm(ssel, system.r)
        Jsep = (Ja_s[:, :, :, None] * part.se_sep_a[:, None, None, :]
                + Jb_s[:, :, :, None] * part.se_sep_b[:, None, None, :]
                ).reshape(es * R, D * ns)
        Wr = jnp.repeat(w_s, R)[:, None]
        Asep = Jsep * Wr * s_sep[None, :]
        C = _mm(Asep.T, Asep)
        damp_sep = _mm(part.sep_sel, dampv).T.reshape(-1)
        sep_live = jnp.sum(part.sep_sel, axis=1)
        pin_sep = jnp.maximum(_mm(part.sep_sel, pin).T.reshape(-1),
                              jnp.tile(1.0 - sep_live, (D,)))
        C = C + jnp.eye(D * ns, dtype=dtype) * (damp_sep + pin_sep)[None, :]
        rflat = (r_s * w_s[:, None]).reshape(es * R)
        b_sep = -_mm(Asep.T, rflat)
        if stage == "sep":
            probe = jnp.sum(C) + jnp.sum(b_sep)
            return Update(poses=jnp.zeros_like(system.g) + probe * 0.0,
                          switches=jnp.zeros((E,), dtype))

        def block_sys(esel, isel, imask, ia_k, ib_k, sa_k, sb_k, lsel):
            Ja_k = _mm(esel, system.Ja.reshape(E, R * D)).reshape(ek, R, D)
            Jb_k = _mm(esel, system.Jb.reshape(E, R * D)).reshape(ek, R, D)
            w_k = _mm(esel, wsqrt[:, None])[:, 0]
            r_k = _mm(esel, system.r)
            Jint = (Ja_k[:, :, :, None] * ia_k[:, None, None, :]
                    + Jb_k[:, :, :, None] * ib_k[:, None, None, :]
                    ).reshape(ek * R, D * ni)
            Jsep_k = (Ja_k[:, :, :, None] * sa_k[:, None, None, :]
                      + Jb_k[:, :, :, None] * sb_k[:, None, None, :]
                      ).reshape(ek * R, D * nsk)
            wk = jnp.repeat(w_k, R)[:, None]
            s_int = _mm(isel, scale).T.reshape(-1)
            s_loc = _mm(s_sep.reshape(D, ns), lsel.T).reshape(-1)
            Aint = Jint * wk * s_int[None, :]
            A = _mm(Aint.T, Aint)
            F = _mm(Aint.T, Jsep_k * wk * s_loc[None, :])
            b = -_mm(Aint.T, (r_k * w_k[:, None]).reshape(ek * R))
            damp_int = _mm(isel, dampv).T.reshape(-1)
            pin_int = jnp.maximum(_mm(isel, pin).T.reshape(-1),
                                  jnp.tile(1.0 - imask, (D,)))
            A = A + jnp.eye(D * ni, dtype=dtype) * (damp_int + pin_int)[None, :]
            return A, F, b, s_int

        A_b, F_b, b_b, s_int_b = jax.vmap(block_sys)(
            part.edge_sel, part.int_sel, part.int_mask,
            part.int_a, part.int_b, part.sep_a, part.sep_b, part.loc_sel,
        )
        if stage == "assemble":
            probe = jnp.sum(A_b) + jnp.sum(F_b) + jnp.sum(b_b) + jnp.sum(C)
            return Update(poses=jnp.zeros_like(system.g) + probe * 0.0,
                          switches=jnp.zeros((E,), dtype))

        if stage == "luinv":
            # Measured negative: LU-based inv is 15.3 ms vs the production
            # chol+triangular-inverse pair's 5.5 ms on this shape.
            Ainv = jnp.linalg.inv(A_b)
            probe = jnp.sum(Ainv) + jnp.sum(C)
            return Update(poses=jnp.zeros_like(system.g) + probe * 0.0,
                          switches=jnp.zeros((E,), dtype))
        chol = jax.vmap(
            lambda A: jax.scipy.linalg.cho_factor(A, lower=True)[0])(A_b)
        if stage == "chol":
            probe = jnp.sum(chol) + jnp.sum(C)
            return Update(poses=jnp.zeros_like(system.g) + probe * 0.0,
                          switches=jnp.zeros((E,), dtype))
        # NOTE: this mirrors schur_solve's small-interior (use_inv) branch
        # only -- correct for the INTEL bench shape (D*ni = 621 <= 1024);
        # do NOT read these stage numbers for D*ni > 1024 workloads, where
        # production takes the half-substitution branch instead.
        assert A_b.shape[-1] <= 1024, "profiler mirrors the use_inv branch"
        eye = jnp.eye(A_b.shape[-1], dtype=dtype)
        Linv = jax.vmap(
            lambda L: jax.scipy.linalg.solve_triangular(L, eye, lower=True)
        )(chol)
        if stage == "linv":
            probe = jnp.sum(Linv) + jnp.sum(C)
            return Update(poses=jnp.zeros_like(system.g) + probe * 0.0,
                          switches=jnp.zeros((E,), dtype))
        Fb_ext = jnp.concatenate([F_b, b_b[..., None]], axis=-1)
        G_ext = jnp.einsum("pij,pjk->pik", Linv, Fb_ext, precision=_PREC)
        G_F, g_b = G_ext[..., :-1], G_ext[..., -1]
        if stage == "factor":
            probe = jnp.sum(G_F) + jnp.sum(g_b) + jnp.sum(C)
            return Update(poses=jnp.zeros_like(system.g) + probe * 0.0,
                          switches=jnp.zeros((E,), dtype))

        S_loc = jnp.einsum("pij,pik->pjk", G_F, G_F, precision=_PREC)
        S4 = S_loc.reshape(-1, D, nsk, D, nsk)
        T1 = jnp.einsum("pambn,pnv->pambv", S4, part.loc_sel,
                        precision=_PREC)
        S = C - jnp.einsum("pambv,pmu->aubv", T1, part.loc_sel,
                           precision=_PREC).reshape(D * ns, D * ns)
        gl = jnp.einsum("pij,pi->pj", G_F, g_b, precision=_PREC)
        rhs_s = b_sep - jnp.einsum(
            "pam,pmu->au", gl.reshape(-1, D, nsk), part.loc_sel,
            precision=_PREC).reshape(-1)
        Ls = jax.scipy.linalg.cho_factor(S, lower=True)
        x_sep = jax.scipy.linalg.cho_solve(Ls, rhs_s)
        x_sep_loc = jnp.einsum("pmu,au->pam", part.loc_sel,
                               x_sep.reshape(D, ns),
                               precision=_PREC).reshape(-1, D * nsk)
        half = g_b - jnp.einsum("pij,pj->pi", G_F, x_sep_loc,
                                precision=_PREC)
        x_int = jnp.einsum("pji,pj->pi", Linv, half, precision=_PREC)
        x_int = x_int * s_int_b
        x_sep = x_sep * s_sep
        x_sep_nd = _mm(part.sep_sel.T, x_sep.reshape(D, ns).T)
        x_int_nd = jnp.einsum(
            "pmn,pmd->nd", part.int_sel,
            x_int.reshape(P_blk, D, ni).transpose(0, 2, 1), precision=_PREC)
        return Update(poses=x_sep_nd + x_int_nd,
                      switches=jnp.zeros((E,), dtype))

    def make(stage):
        def one(p0, e, part):
            sw = jnp.ones((e.num_edges,), jnp.float32)

            def step(carry, _):
                p, lam = carry
                system = linearize(p, sw, e, free, use_pallas=True, **kw)
                dx = schur_stage(system, part, lam, stage)
                newp = SE2Model.retract(p, dx.poses)
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

    # Closed-form MAC counts of each stage's INCREMENT (batch x blocks of
    # dense ops; 2 flops per MAC), so each stage's delta_ms converts to an
    # achieved-FLOP/s figure against the v5e peaks (VERDICT r3 #1:
    # bench.py reports the whole-program roofline via XLA cost_analysis;
    # this gives the per-stage view).
    part0 = parts[0]
    P_, ni_, ns_, ek_, es_, nsk_ = (part0.num_blocks, part0.ni_max,
                                    part0.ns, part0.ek_max, part0.es_max,
                                    part0.nsk_max)
    D_, R_ = 3, 3
    dni, dns, dnsk = D_ * ni_, D_ * ns_, D_ * nsk_
    B_ = BATCH
    stage_macs = {
        # Asep (es*R, dns) outer + C = Asep^T Asep + b_sep
        "sep": B_ * (es_ * R_ * dns * (2 * D_)        # Jsep expansion
                     + dns * dns * es_ * R_           # C
                     + dns * es_ * R_),               # b_sep
        # per-block Jint/Jsep expansion + A/F/b normal equations
        "assemble": B_ * P_ * (
            ek_ * R_ * (dni + dnsk) * (2 * D_)
            + dni * dni * ek_ * R_                    # A
            + dni * dnsk * ek_ * R_                   # F
            + dni * ek_ * R_),                        # b
        "chol": B_ * P_ * dni ** 3 // 3,              # interior Cholesky
        "linv": B_ * P_ * dni ** 3 // 2,              # L^-1 (621-RHS tri)
        "factor": B_ * P_ * dni * dni * (dnsk + 1),   # G = L^-1 [F|b]
        # S reduction + separator Cholesky/solve + back-substitution
        "full": B_ * (P_ * dnsk * dnsk * dni          # G^T G
                      + P_ * dnsk * dnsk * dns        # S expansion (x2)
                      + dns ** 3 // 3                 # sep Cholesky
                      + dns * dns * 2                 # sep solve
                      + P_ * (dni * dnsk + dni * dni)),  # backsub
    }

    rng = np.random.default_rng(1)
    prev = 0.0
    for stage in ("sep", "assemble", "chol", "linv", "factor", "full"):
        run = make(stage)
        _ = jax.device_get(run(poses0, edges_b, parts_b))
        best = float("inf")
        for _ in range(3):
            p = poses0 + jnp.asarray(
                rng.normal(0, 1e-6, poses0.shape), jnp.float32)
            t0 = time.perf_counter()
            _ = jax.device_get(run(p, edges_b, parts_b))
            best = min(best, time.perf_counter() - t0)
        ms = best / LM_ITERS * 1e3
        delta = ms - prev
        gflops = 2 * stage_macs[stage] / 1e9
        rec = {stage + "_ms": round(ms, 3), "delta_ms": round(delta, 3),
               "stage_gflop": round(gflops, 2)}
        if delta > 1e-3:
            rec["achieved_tflops"] = round(gflops / delta, 2)
        print(rec, flush=True)
        prev = ms


if __name__ == "__main__":
    main()
