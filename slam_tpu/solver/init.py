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
    huber_delta: float = 0.1,
) -> PoseGraph:
    """Return the graph with poses replaced by the chordal initialization.

    ``huber_irls_rounds`` re-solves the rotation stage with Huber weights
    on the chordal residual norms (protects against bogus loop closures;
    0 = plain least squares).
    """
    g = graph
    ij = np.asarray(g.edges_ij)
    a_idx, b_idx = ij[:, 0], ij[:, 1]
    n = g.num_nodes
    meas = np.asarray(g.edges_meas, np.float64)
    w = np.ones((ij.shape[0],), np.float64)

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
        # g2o_util.h:68): a plain LS over ALL edges is already poisoned
        # when bogus loops outnumber real closures, and IRLS started from
        # it downweights good and bad closures alike.  The odometry chain
        # gives an honest (if drifty) rotation field to judge closures
        # against; odometry edges are never reweighted.
        x = solve_rot(np.where(loop, 0.0, 1.0))
        for _ in range(huber_irls_rounds):
            rn = residual_norm(x)
            # Scale the suppression threshold by the loop-residual
            # distribution (median + 3 robust sigmas): on a noisy-odometry
            # graph with CLEAN closures every closure disagrees with the
            # drifted odometry-only bootstrap, and a fixed small delta
            # would suppress them all (leaving the init odometry-only --
            # the failure it exists to fix).  True outliers sit far above
            # the bulk and still get killed.
            rl = rn[loop]
            if rl.size:
                # Anchor on the best-quartile residual: robust to a
                # MAJORITY of bogus loops (median-based scales are not --
                # with >50% outliers the median IS an outlier residual),
                # while still keeping clean-but-drift-disagreeing closures
                # alive on noisy-odometry graphs where every loop residual
                # is large.
                delta = max(huber_delta, 3.0 * float(np.quantile(rl, 0.25)))
            else:
                delta = huber_delta
            # Geman-McClure reweighting PLUS a hard gate.  The gate is
            # load-bearing: on a floppy chain-dominated graph the
            # Laplacian's soft long-wavelength modes amplify a long-range
            # perturbation by ~N^2, so a bogus loop "downweighted" to
            # 0.004 still bends a 10k-node solve by a radian (measured on
            # M10000: rot error 0.99 rad at w=0.004 vs 0.016 at w=0).
            # Outliers must be REMOVED, not merely downweighted.
            gm = delta**2 / (delta**2 + rn**2)
            w = np.where(loop, np.where(rn > 3.0 * delta, 0.0, gm), 1.0)
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
        # The rotation gate cannot catch translation-only outliers: a
        # bogus loop's 1-DOF rotation coincidentally matches a few percent
        # of the time (measured on M10000+50: 3 of 50 survived, one at
        # weight 0.66, bending the floppy translation solve by ~145 m).
        # Gate again on the translation residual and re-solve.
        rt = np.linalg.norm(p[b_idx] - p[a_idx] - d, axis=-1)
        rl = rt[loop & (w > 0)]
        if rl.size:
            # Floor the threshold at the median odometry translation
            # norm: a tight cluster of near-exact closures (duplicate
            # edges, identity-revisit loops) would otherwise collapse
            # q25 to ~0 and the gate would strip every normally-noisy
            # closure from the translation solve.
            odo_step = float(np.median(
                np.linalg.norm(t_local[~loop], axis=-1))) if (~loop).any() \
                else 1.0
            delta_t = max(3.0 * float(np.quantile(rl, 0.25)),
                          0.1 * odo_step, 1e-9)
            w = np.where(loop & (rt > 3.0 * delta_t), 0.0, w)
            p = solve_trans(w)
    poses[:, : t_local.shape[1]] = p + poses[0, : t_local.shape[1]][None, :]

    import dataclasses
    return dataclasses.replace(g, poses=poses)


def apply_init(graph: PoseGraph, cfg, logger=None) -> PoseGraph:
    """Apply the configured initial-guess strategy (RunConfig.init) --
    the single entry point every pipeline (global solve, methods 3/4,
    checkpointed CLI driver) routes through."""
    if getattr(cfg, "init", "dataset") != "chordal":
        return graph
    import time
    t0 = time.perf_counter()
    out = chordal_init(graph)
    if logger is not None:
        logger.log("init", kind="chordal",
                   wall_s=round(time.perf_counter() - t0, 3))
    return out
