"""Chordal (rotation-first) initialization.

The reference initializes from the dataset's vertex estimates -- i.e. from
integrated odometry (``g2o_util.h:37-47``).  On rotation-noise-corrupted
graphs (M3500b/M3500c, named at ``main.cpp:23``) that guess is tens of
meters off and plain LM -- and even GNC-annealed DCS -- converges to a bad
basin (measured: ATE 26 m plain / 9-19 m GNC, results/README.md).  The
standard fix (Carlone et al., "Initialization techniques for 3D SLAM") is
to solve the ROTATION subproblem first, which is linear in the chordal
(matrix-element) parametrization, then initialize translations by a second
linear solve with rotations fixed.

Both stages are weighted graph-Laplacian least squares, solved exactly on
the host with a sparse f64 factorization (scipy splu; a one-time O(E)
preprocessing step like parsing).  An iterative solve is the wrong tool
here: chain-dominated pose-graph Laplacians have condition number ~N^2,
and a CG variant of this module needed >N iterations on M10000 and
silently returned garbage when capped.  Optional IRLS rounds downweight
edges with large rotation residuals so injected bogus loops do not poison
the init (Geman-McClure on the chordal residual).

SE(2): unknowns r_i = (cos t_i, sin t_i); edge residual r_b - M(t_ab) r_a
with M a rotation matrix, so the normal-equation blocks are w*I and
-w*M -- an O(E) matvec.  SE(3): unknowns X_i in R^{3x3}; residual
X_b - X_a R_ab; solutions projected to SO(3)/unit circle afterwards.
"""

from __future__ import annotations

import numpy as np

from slam_tpu.graph import ODOMETRY_EDGE, PoseGraph

_ANCHOR_W = 1e6


def _laplacian_factor(n, a_idx, b_idx, w, rot_ab, K):
    """Factor the chordal normal equations once (sparse f64 splu) and
    return ``solve(rhs, anchor_val, fallback) -> (n, K)``.

    Unknowns ``x (n, K)`` (rows of the rotation parametrization, or
    translations with ``rot_ab=None``).  Per edge: residual
    ``x_b - x_a @ rot_ab_e`` (identity rotation when None), plus a strong
    anchor prior on node 0.  In column-vector form (x~_i = x_i^T) the
    residual is ``x~_b - A^T x~_a``, so the normal blocks are
    H[a,a] += w I, H[b,b] += w I, H[a,b] += -w A, H[b,a] += -w A^T
    (A orthogonal).

    ``fallback (n, K)`` (per solve): nodes with NO live edge (possible
    with multi-segment odometry, closure-only nodes under the
    odometry-only bootstrap, or when the hard gate removes a node's last
    edge) get a unit prior toward this value instead of leaving H
    singular (splu would abort the whole init with 'Factor is exactly
    singular').
    """
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    E = a_idx.shape[0]
    off = np.arange(K)

    rows = []
    cols = []
    vals = []

    def add(ni_, nj_, blocks):
        # blocks: (E, K, K) at node pairs (ni_, nj_)
        r = (ni_[:, None, None] * K + off[None, :, None]) * np.ones(
            (1, 1, K), np.int64)
        c = (nj_[:, None, None] * K + off[None, None, :]) * np.ones(
            (1, K, 1), np.int64)
        rows.append(r.ravel())
        cols.append(c.ravel())
        vals.append(np.broadcast_to(blocks, (E, K, K)).ravel())

    eyeK = np.eye(K)
    wI = w[:, None, None] * eyeK[None]
    add(a_idx, a_idx, wI)
    add(b_idx, b_idx, wI)
    if rot_ab is None:
        offd = -wI
        add(a_idx, b_idx, offd)
        add(b_idx, a_idx, offd)
    else:
        add(a_idx, b_idx, -w[:, None, None] * rot_ab)
        add(b_idx, a_idx, -w[:, None, None]
            * np.transpose(rot_ab, (0, 2, 1)))

    # Anchor prior on node 0.
    rows.append(off)
    cols.append(off)
    vals.append(np.full((K,), _ANCHOR_W))

    # Floating-component priors (see docstring).  Degree-0 orphans are not
    # enough: a multi-node component disconnected from the anchor (second
    # odometry segment whose bridging closure was gated to w=0) has a
    # rank-deficient Laplacian block at every-positive degree and splu
    # aborts.  Union-find over the LIVE (w>0) edges finds every component;
    # one representative per non-anchor component gets a unit prior
    # toward the per-solve fallback, which removes exactly the rank
    # deficiency while leaving the anchored component untouched.
    parent = np.arange(n)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    live = w > 0.0
    for a, b in zip(a_idx[live], b_idx[live]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots = np.array([find(i) for i in range(n)])
    anchor_root = roots[0]
    pinned = np.unique(roots[roots != anchor_root])
    if pinned.size:
        oi = (pinned[:, None] * K + off[None, :]).ravel()
        rows.append(oi)
        cols.append(oi)
        vals.append(np.ones(oi.shape[0]))
    orphan = pinned  # per-solve fallback rhs applies to these nodes

    H = sp.coo_matrix(
        (np.concatenate(vals),
         (np.concatenate(rows), np.concatenate(cols))),
        shape=(n * K, n * K),
    ).tocsc()
    lu = spla.splu(H)

    def solve(rhs, anchor_val, fallback=None):
        b = rhs.copy()
        b[0] += _ANCHOR_W * anchor_val
        if orphan.size and fallback is not None:
            b[orphan] += fallback[orphan]
        return lu.solve(b.reshape(n * K)).reshape(n, K)

    return solve


def _laplacian_solve(n, a_idx, b_idx, w, rot_ab, rhs, anchor_val,
                     fallback=None):
    """One-shot wrapper over :func:`_laplacian_factor`."""
    return _laplacian_factor(
        n, a_idx, b_idx, w, rot_ab, rhs.shape[1]
    )(rhs, anchor_val, fallback)


def _rot2(t):
    c, s = np.cos(t), np.sin(t)
    return np.stack([np.stack([c, -s], -1), np.stack([s, c], -1)], -2)


def _quat_to_mat(q):
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return np.stack([
        np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                  2 * (x * z + w * y)], -1),
        np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                  2 * (y * z - w * x)], -1),
        np.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                  1 - 2 * (x * x + y * y)], -1),
    ], -2)


def _mat_to_quat(R):
    """Batch rotation-matrix -> quaternion (w, x, y, z), numerically safe."""
    m = R
    t = np.trace(m, axis1=-2, axis2=-1)
    q = np.zeros(m.shape[:-2] + (4,), np.float64)
    # Shepperd's method, vectorised over the four cases.
    c0 = t >= 0
    s = np.sqrt(np.maximum(t + 1.0, 1e-12)) * 2
    q0 = np.stack([
        s / 4,
        (m[..., 2, 1] - m[..., 1, 2]) / s,
        (m[..., 0, 2] - m[..., 2, 0]) / s,
        (m[..., 1, 0] - m[..., 0, 1]) / s,
    ], -1)
    for i in range(3):
        j, k = (i + 1) % 3, (i + 2) % 3
        ci = (~c0) & (m[..., i, i] >= m[..., j, j]) & (m[..., i, i] >= m[..., k, k])
        si = np.sqrt(np.maximum(1.0 + m[..., i, i] - m[..., j, j]
                                - m[..., k, k], 1e-12)) * 2
        qi = np.zeros_like(q0)
        qi[..., 0] = (m[..., k, j] - m[..., j, k]) / si
        qi[..., 1 + i] = si / 4
        qi[..., 1 + j] = (m[..., j, i] + m[..., i, j]) / si
        qi[..., 1 + k] = (m[..., k, i] + m[..., i, k]) / si
        q = np.where(ci[..., None], qi, q)
    q = np.where(c0[..., None], q0, q)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def _project_so3(X):
    u, _, vt = np.linalg.svd(X)
    R = u @ vt
    det = np.linalg.det(R)
    u2 = u.copy()
    u2[..., :, 2] *= np.sign(det)[..., None]
    return u2 @ vt


def chordal_init(
    graph: PoseGraph,
    huber_irls_rounds: int = 1,
    huber_delta: float = 0.15,
    pcm_result=None,
) -> PoseGraph:
    """Return the graph with poses replaced by the chordal initialization.

    ``huber_irls_rounds > 0`` enables the robust rotation stage: GNC-GM
    annealing (Yang et al., graduated non-convexity) over the LINEAR
    chordal problem -- each surrogate is a weighted least squares solved
    exactly (splu), which is the regime where graduated annealing is sound
    (unlike annealing inside a non-convex LM loop, measured to lock
    outliers in on M3500/CSAIL with injected bogus loops).  The control
    parameter mu starts high enough that every loop edge is near-quadratic
    and shrinks geometrically; Geman-McClure weights
    ``(mu d^2 / (r^2 + mu d^2))^2`` gradually shut high-residual edges
    off, and a final HARD gate (``r > 3 d`` -> weight 0) removes them
    outright -- downweighting alone is not enough on floppy chain graphs
    (a w=0.004 bogus loop still bends a 10k-node solve by ~1 rad,
    measured).  ``huber_delta`` is the inlier rotation-residual scale
    (chordal norm ~ |dtheta| for small angles); the single-round quantile
    heuristic this replaces could not separate drift-driven real-closure
    residuals from bogus ones on M3500 (10 injected loops bent the field
    by 0.95 rad).

    ``pcm_result`` (a :class:`slam_tpu.robust.pcm.PcmResult`) hard-excludes
    loops its pairwise-consistency core rejected from BOTH linear stages.
    This is load-bearing against the reference's injector: on grid worlds
    most bogus edges are rotation-INLIERS whose translation lie the floppy
    Laplacian absorbs smoothly, so no per-edge residual test (this
    function's own GNC included) can find them -- only the pairwise cycle
    test can (robust/pcm.py).

    0 = plain least squares over all edges.
    """
    g = graph
    ij = np.asarray(g.edges_ij)
    a_idx, b_idx = ij[:, 0], ij[:, 1]
    n = g.num_nodes
    meas = np.asarray(g.edges_meas, np.float64)
    w = np.ones((ij.shape[0],), np.float64)
    pcm_w = np.ones_like(w)
    if pcm_result is not None:
        pcm_w[pcm_result.loop_edges[~pcm_result.loop_mask]] = 0.0
        w = w * pcm_w

    if g.dim == 3:
        # Row convention (r as a row vector): r_b = r_a @ M(t_ab)^T, so the
        # edge operator A_e is the transposed rotation matrix.
        rot = np.transpose(_rot2(meas[:, 2]), (0, 2, 1))  # (E, 2, 2)
        anchor_r = np.array([np.cos(g.poses[0, 2]), np.sin(g.poses[0, 2])])
        K = 2
    else:
        rot = _quat_to_mat(meas[:, 3:7])                 # (E, 3, 3)
        anchor_R = _quat_to_mat(np.asarray(g.poses[0, 3:7], np.float64))
        K = 3

    if g.dim == 3:
        cur_rot = np.stack([np.cos(np.asarray(g.poses)[:, 2]),
                            np.sin(np.asarray(g.poses)[:, 2])], axis=1)
    else:
        cur_rot3 = _quat_to_mat(np.asarray(g.poses)[:, 3:7])  # (n, 3, 3)

    def solve_rot(w_):
        if g.dim == 3:
            return _laplacian_solve(
                n, a_idx, b_idx, w_, rot,
                np.zeros((n, K)), anchor_r, fallback=cur_rot)
        # SE(3): the three row problems share ONE operator -- factor once,
        # solve three right-hand sides (anchor rows of R_0; orphan
        # fallbacks = the matching current-rotation rows).
        solve = _laplacian_factor(n, a_idx, b_idx, w_, rot, 3)
        rows = [solve(np.zeros((n, 3)), anchor_R[i], cur_rot3[:, i, :])
                for i in range(3)]
        return np.stack(rows, axis=1)                    # (n, 3, 3)

    loop = np.asarray(g.edge_type) != ODOMETRY_EDGE

    def residual_norm(x):
        if g.dim == 3:
            res = x[b_idx] - np.einsum("ek,ekj->ej", x[a_idx], rot)
        else:
            res = x[b_idx] - np.einsum("eik,ekj->eij", x[a_idx], rot)
            res = res.reshape(res.shape[0], -1)
        return np.linalg.norm(res, axis=-1)

    if huber_irls_rounds > 0:
        # Bootstrap from odometry only (the trusted edge class,
        # g2o_util.h:68) -- not as the final judge of closures (its drift
        # makes real closures and bogus ones overlap on M3500-class
        # graphs), but as an honest residual-scale probe for the GNC
        # schedule.  Odometry edges are never reweighted.
        delta = huber_delta
        x = solve_rot(np.where(loop, 0.0, 1.0))
        rn = residual_norm(x)
        # Flagrant-at-bootstrap exclusion BEFORE the anneal.  The anneal's
        # high-mu phase re-admits every edge; at high outlier ratios on
        # small graphs that bends the field to fit the bogus edges and the
        # residual ranking INVERTS (measured on a 64-node circle with 6/12
        # bogus loops: final weights 0.95 on bogus, 0.0 on real).  The
        # odometry bootstrap is honest -- edges sitting far above BOTH the
        # absolute inlier scale and the loop population (so
        # rotation-corrupted graphs, where every loop disagrees with the
        # drifted bootstrap, exclude nothing and rely on the anneal) never
        # get that chance.
        rl = rn[loop]
        # q25, not the median: at a 50% outlier ratio the median sits
        # BETWEEN the inlier and outlier clusters and the threshold
        # balloons past every bogus edge (measured on the circle fixture).
        flag_thresh = max(3.0 * delta,
                          6.0 * float(np.quantile(rl, 0.25))) \
            if rl.size else np.inf
        boot_w = np.where(loop & (rn > flag_thresh), 0.0, 1.0) * pcm_w
        rl2 = rn[loop] ** 2 * (boot_w[loop] > 0)
        # mu0 keys off the WORST surviving loop edge (the chordal residual
        # norm is bounded by 2, so the schedule stays short): a quantile
        # start misses a sub-percent outlier tail entirely -- measured on
        # M3500+10, where q90 gave mu0 ~ 1 (no annealing at all) because
        # 10 bogus edges sit in the top 0.5% of 1854 loops.
        mu = max(1.0, 2.0 * float(rl2.max()) / delta**2) if rl2.size else 1.0
        for _ in range(24):  # geometric anneal; mu0 ~ 1e3 -> ~15 rounds
            w_gm = (mu * delta**2 / (rn**2 + mu * delta**2)) ** 2
            w = np.where(loop, w_gm * boot_w, 1.0)
            x = solve_rot(w)
            rn = residual_norm(x)
            if mu <= 1.0:
                break
            mu = max(1.0, mu / 1.6)
        # Final HARD gate (remove, don't downweight -- the Laplacian's
        # soft long-wavelength modes amplify long-range perturbations by
        # ~N^2; measured on M10000: rot error 0.99 rad with a bogus loop
        # at w=0.004 vs 0.016 at w=0) + Geman-McClure on the survivors.
        gm = delta**2 / (delta**2 + rn**2)
        w = np.where(loop,
                     np.where(rn > 3.0 * delta, 0.0, gm) * boot_w, 1.0)
        x = solve_rot(w)
    else:
        x = solve_rot(w)

    poses = np.asarray(g.poses, np.float64).copy()
    if g.dim == 3:
        theta = np.arctan2(x[:, 1], x[:, 0])
        R_nodes = _rot2(theta)                           # (n, 2, 2)
        t_local = meas[:, :2]
        poses[:, 2] = theta
    else:
        R_nodes = _project_so3(x)                        # (n, 3, 3)
        t_local = meas[:, :3]
        poses[:, 3:7] = _mat_to_quat(R_nodes)

    # Translation stage: p_b - p_a = R_a t_ab with rotations fixed.  The
    # Laplacian is shift-invariant, so solve with the anchor at 0 (keeps
    # the huge anchor prior conditioning-neutral) and add the true anchor
    # position back.
    d = np.einsum("eij,ej->ei", R_nodes[a_idx], t_local)

    Kt = t_local.shape[1]
    # Orphan fallback in the shifted (anchor-at-zero) frame.
    cur_trans = np.asarray(g.poses, np.float64)[:, :Kt] \
        - np.asarray(g.poses, np.float64)[0, :Kt][None, :]

    def solve_trans(w_):
        rhs = np.zeros((n, Kt), np.float64)
        np.add.at(rhs, a_idx, -w_[:, None] * d)
        np.add.at(rhs, b_idx, w_[:, None] * d)
        return _laplacian_solve(n, a_idx, b_idx, w_, None, rhs,
                                np.zeros((Kt,)), fallback=cur_trans)

    p = solve_trans(w)
    if huber_irls_rounds > 0:
        # The rotation gate cannot catch translation-only outliers, and on
        # grid-world graphs they are the MAJORITY of bogus loops: the
        # reference's injector zeroes the measurement (integer-division
        # quirk, g2o_util.h:158-169) and grid headings make dtheta ~ 0
        # likely, so a bogus edge is often a perfect rotation-inlier whose
        # lie is "these two far-apart nodes coincide".  A one-shot
        # quantile gate measured the residuals at the ALREADY-POISONED
        # translation solve and missed them (M3500+10: field bent ~1 rad
        # before the gate fired).  Anneal the translation stage with the
        # same GNC-GM schedule instead; the inlier scale is tied to the
        # odometry step length.
        odo_step = float(np.median(
            np.linalg.norm(t_local[~loop], axis=-1))) if (~loop).any() \
            else 1.0
        delta_t = max(0.1 * odo_step, 1e-9)
        w_rot = w  # rotation-stage verdicts (hard zeros) are kept

        def trans_rn(p_):
            return np.linalg.norm(p_[b_idx] - p_[a_idx] - d, axis=-1)

        # Odometry-only translation bootstrap: honest residuals for the
        # flagrant exclusion (residuals at a loop-included solve are
        # already smeared by the outliers themselves -- the inversion
        # failure, see the rotation stage).
        rt_boot = trans_rn(solve_trans(np.where(loop, 0.0, 1.0)))
        rl = rt_boot[loop & (w_rot > 0)]
        flag_t = max(3.0 * delta_t,
                     6.0 * float(np.quantile(rl, 0.25))) \
            if rl.size else np.inf
        boot_w_t = np.where(loop & (rt_boot > flag_t), 0.0, 1.0) * w_rot

        rt = trans_rn(p)
        live = loop & (boot_w_t > 0)
        if live.any():
            mu = max(1.0, min(2.0 * float((rt[live] ** 2).max())
                              / delta_t**2, 1e9))
            for _ in range(40):
                w_gm = (mu * delta_t**2 / (rt**2 + mu * delta_t**2)) ** 2
                w = np.where(loop, boot_w_t * w_gm, 1.0)
                p = solve_trans(w)
                rt = trans_rn(p)
                if mu <= 1.0:
                    break
                mu = max(1.0, mu / 2.0)
            w = np.where(loop & (rt > 3.0 * delta_t), 0.0, w)
            p = solve_trans(w)
    poses[:, : t_local.shape[1]] = p + poses[0, : t_local.shape[1]][None, :]

    import dataclasses
    return dataclasses.replace(g, poses=poses)


# PCM trust rule (see robust/pcm.py): the pairwise cycle test only has
# discriminating power when the odometry drift rates are modest and a
# solid consistent core survives.  On raw-odometry INTEL (s_trans ~ 0.43
# m/sqrt(step)) and MIT (~3-7!) the self-tuned gates balloon and the mask
# keeps everything; on rotation-corrupted M3500b/c (s_rot >= 0.013) the
# cycle tests are noisy and the mask rejects GOOD closures (measured:
# gating there worsened the init rotRMS 0.10 -> 0.25).  Fall back to the
# un-gated paths in both regimes.
PCM_TRUST_S_ROT = 0.012
PCM_TRUST_S_TRANS = 0.25
PCM_TRUST_KEEP_FRAC = 0.4


def pcm_trusted(result) -> bool:
    import numpy as _np
    if result.loop_mask.size == 0:
        return False
    keep_frac = float(result.loop_mask.mean())
    return (_np.sqrt(result.s_rot2_per_step) <= PCM_TRUST_S_ROT
            and _np.sqrt(result.s_trans2_per_step) <= PCM_TRUST_S_TRANS
            and keep_frac >= PCM_TRUST_KEEP_FRAC)


def apply_init(graph: PoseGraph, cfg, logger=None) -> PoseGraph:
    """Apply the configured initial-guess strategy (RunConfig.init) --
    the single entry point every pipeline (global solve, methods 3/4,
    checkpointed CLI driver) routes through.

    ``auto`` (the default): run the PCM pairwise-consistency test; when it
    is trustworthy (see :func:`pcm_trusted`), initialize with the
    PCM-gated chordal solve -- the combination that fixes the
    M3500-with-outliers family -- otherwise keep the dataset vertex
    estimates (the reference's behaviour, ``g2o_util.h:37-47``), which is
    also what preserves reference-identical INTEL/CSAIL trajectories on
    their raw-odometry inits.
    """
    mode = getattr(cfg, "init", "dataset")
    if mode == "dataset":
        return graph
    import time
    t0 = time.perf_counter()
    pcm = None
    if graph.dim in (3, 7):
        from slam_tpu.robust.pcm import pcm_loop_mask
        pcm = pcm_loop_mask(graph)
        s_tr = float(np.sqrt(pcm.s_trans2_per_step))
        if not pcm_trusted(pcm):
            # Tier 2: translation drift is sane but the rotation field is
            # too corrupted for cycle tests (M3500b/c regime) -- the
            # un-gated chordal GNC is the proven cure there.  Tier 3:
            # translation drift itself is huge (raw-odometry INTEL, MIT)
            # -- neither PCM nor chordal GNC can separate inliers; under
            # "auto" keep the reference's dataset init.  SE(3) graphs
            # never take tier 3: the 3D datasets are sphere-class, whose
            # dataset init is itself the corrupted artifact chordal
            # exists to fix (results/README.md r1).
            if mode == "auto" and graph.dim == 3 \
                    and s_tr > PCM_TRUST_S_TRANS:
                if logger is not None:
                    logger.log(
                        "init", kind="dataset", pcm_trusted=False,
                        s_trans_per_step=round(s_tr, 3),
                    )
                return graph
            pcm = None  # rotation-corrupted tier / explicit chordal
    out = chordal_init(graph, pcm_result=pcm)
    if logger is not None:
        logger.log(
            "init", kind="chordal",
            pcm_gated=pcm is not None,
            pcm_rejected=int((~pcm.loop_mask).sum()) if pcm is not None
            else 0,
            wall_s=round(time.perf_counter() - t0, 3),
        )
    return out
