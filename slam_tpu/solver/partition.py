"""Graph-aware node->block partitioning for the Schur solver.

The contiguous index-range partition (`schur.optimize_cut_positions`) is
near-optimal on odometry-dominated graphs whose loop closures have short
index span (INTEL: ns=316 at P=16).  On Manhattan-world datasets the
revisit loop closures span thousands of indices (M10000: median loop span
260, p90 2756), so every one of them crosses an index cut and the
separator explodes: ns=1793 at P=24, putting ~3.5e11 MACs of C assembly
and a 5379^3/3 separator Cholesky in every LM iteration.  A partition
that follows the *graph* (equivalently, the map's spatial layout -- the
reference's spatial-locality analog, `main.cpp:23` M10000) keeps loop
closures inside blocks and cuts the separator ~4x, which is cubic-level
leverage on the separator stage.

Algorithm: multilevel-free recursive spectral bisection.

* Fiedler vector of the subgraph Laplacian via LOBPCG (Jacobi
  preconditioned, deterministic seeded init), dense ``eigh`` below 512
  nodes, BFS-layering fallback if LOBPCG fails to converge.
* Balance-constrained split at the weighted quantile (block sizes stay
  within the slack needed for the padded batched interior factorisation).
* One Fiduccia–Mattheyses-style boundary refinement pass per bisection:
  move boundary nodes across the cut while the edge-cut gain is positive
  and balance allows.

Everything here is host-side numpy/scipy precompute -- the output is the
``node_block`` array consumed by ``schur._assign_blocks``; the device
program is identical (and exact) for any assignment.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

__all__ = ["graph_partition", "partition_edge_cut"]

_DENSE_N = 512
_SEED = 0


def _adjacency(ij: np.ndarray, n: int) -> sp.csr_matrix:
    ij = np.asarray(ij)
    keep = ij[:, 0] != ij[:, 1]
    a, b = ij[keep, 0], ij[keep, 1]
    data = np.ones(len(a), np.float64)
    A = sp.coo_matrix((data, (a, b)), shape=(n, n))
    A = A + A.T
    A.sum_duplicates()
    # Parallel edges count once for the cut metric's purposes is fine
    # either way; keep multiplicity (it weights the cut toward keeping
    # strongly-connected pairs together).
    return A.tocsr()


def _fiedler(A: sp.csr_matrix, rng: np.random.Generator) -> np.ndarray:
    """Fiedler vector of the (sub)graph with adjacency ``A``."""
    n = A.shape[0]
    deg = np.asarray(A.sum(axis=1)).reshape(-1)
    if n <= _DENSE_N:
        L = np.diag(deg) - A.toarray()
        w, v = np.linalg.eigh(L)
        return v[:, 1]
    L = sp.diags(deg) - A
    # LOBPCG for the 2 smallest eigenpairs, deflating the constant vector.
    X = rng.standard_normal((n, 2))
    X[:, 0] = 1.0
    M = sp.diags(1.0 / np.maximum(deg, 1e-12))
    try:
        import warnings

        from scipy.sparse.linalg import lobpcg

        with warnings.catch_warnings():
            # Partial convergence is fine: the split only needs the sign
            # structure of the Fiedler vector, not eigenpair accuracy.
            warnings.simplefilter("ignore")
            w, v = lobpcg(L, X, M=M, largest=False, tol=1e-5, maxiter=200)
        order = np.argsort(w)
        vec = v[:, order[1]]
        if np.all(np.isfinite(vec)) and np.std(vec) > 0:
            return vec
    except Exception:
        pass
    # Fallback: BFS layering from a pseudo-peripheral node.
    from scipy.sparse.csgraph import breadth_first_order, shortest_path

    start = 0
    for _ in range(2):  # double-sweep pseudo-peripheral heuristic
        order, _pred = breadth_first_order(A, start, directed=False)
        start = int(order[-1])
    d = shortest_path(A, unweighted=True, indices=start)
    d[~np.isfinite(d)] = d[np.isfinite(d)].max() + 1.0
    return d + 1e-9 * rng.standard_normal(n)


def _refine(
    A: sp.csr_matrix,
    side: np.ndarray,
    lo0: int,
    hi0: int,
    passes: int = 2,
) -> np.ndarray:
    """FM-lite: greedily move boundary nodes across the bisection while the
    edge-cut gain is positive and side-0's size stays within [lo0, hi0]."""
    indptr, indices = A.indptr, A.indices
    data = A.data
    n = len(side)
    deg = np.asarray(A.sum(axis=1)).reshape(-1)
    n0 = int(np.sum(side == 0))
    for _ in range(passes):
        # gain(v) = (cut edges removed) - (cut edges added) if v flips.
        # Vectorised: weight-to-side-1 = A @ side, so
        #   ext = side==0 ? w1 : deg - w1,   inte = deg - ext.
        w1 = A @ side.astype(np.float64)
        ext = np.where(side == 0, w1, deg - w1)
        inte = deg - ext
        gain = ext - inte
        boundary = np.where(ext > 0)[0]
        cand = boundary[np.argsort(-gain[boundary])]
        moved = 0
        for v in cand:
            if gain[v] <= 0:
                break
            if side[v] == 0:
                if n0 - 1 < lo0:
                    continue
                n0 -= 1
            else:
                if n0 + 1 > hi0:
                    continue
                n0 += 1
            # Re-check the gain against the *current* sides (neighbours may
            # have flipped since the batch gains were computed).
            nb = indices[indptr[v] : indptr[v + 1]]
            wts = data[indptr[v] : indptr[v + 1]]
            same = side[nb] == side[v]
            if wts[~same].sum() - wts[same].sum() <= 0:
                # undo bookkeeping
                n0 += 1 if side[v] == 0 else -1
                continue
            side[v] = 1 - side[v]
            moved += 1
        if moved == 0:
            break
    return side


def _bisect(
    A: sp.csr_matrix,
    nodes: np.ndarray,
    parts: int,
    out: np.ndarray,
    next_id: int,
    rng: np.random.Generator,
    slack: float,
) -> int:
    """Recursively assign ``parts`` block ids to ``nodes``; returns the next
    free block id."""
    if parts <= 1 or len(nodes) <= 1:
        out[nodes] = next_id
        return next_id + 1
    p0 = (parts + 1) // 2
    frac = p0 / parts
    sub = A[nodes][:, nodes].tocsr()
    vec = _fiedler(sub, rng)
    order = np.argsort(vec, kind="stable")
    k = int(round(frac * len(nodes)))
    k = min(max(k, 1), len(nodes) - 1)
    side = np.ones(len(nodes), np.int8)
    side[order[:k]] = 0
    # Balance window: each of the `parts` leaves should get ~len/parts
    # nodes +- slack, so side 0 may hold p0 leaves' worth +- slack.
    leaf = len(nodes) / parts
    lo0 = max(1, int(np.floor(p0 * leaf * (1 - slack))))
    hi0 = min(len(nodes) - 1, int(np.ceil(p0 * leaf * (1 + slack))))
    side = _refine(sub, side, lo0, hi0)
    n0 = nodes[side == 0]
    n1 = nodes[side == 1]
    nid = _bisect(A, n0, p0, out, next_id, rng, slack)
    return _bisect(A, n1, parts - p0, out, nid, rng, slack)


def graph_partition(
    ij: np.ndarray,
    n: int,
    num_blocks: int,
    slack: float = 0.3,
    seed: int = _SEED,
) -> np.ndarray:
    """Partition nodes 0..n-1 into ``num_blocks`` balanced blocks with a
    small edge cut; returns the ``(n,)`` block-id array for
    ``schur.build_partition(..., node_block=...)``."""
    ij = np.asarray(ij)
    A = _adjacency(ij, n)
    out = np.zeros(n, np.int64)
    rng = np.random.default_rng(seed)
    _bisect(A, np.arange(n), num_blocks, out, 0, rng, slack)
    return out


def partition_tree(
    ij: np.ndarray,
    n: int,
    max_parts: int = 32,
    slack: float = 0.3,
    seed: int = _SEED,
) -> dict[int, np.ndarray]:
    """Level-by-level recursive bisection: ONE tree build yields the
    ``node_block`` assignment for every power-of-two block count up to
    ``max_parts`` (shared work -- the P=2k partition refines the P=k one).
    Used by ``schur.choose_partition`` so scheme selection doesn't pay a
    fresh spectral build per candidate P."""
    ij = np.asarray(ij)
    A = _adjacency(ij, n)
    rng = np.random.default_rng(seed)
    levels: dict[int, np.ndarray] = {}
    assign = np.zeros(n, np.int64)
    parts = 1
    while parts * 2 <= max_parts:
        new = np.zeros(n, np.int64)
        for k in range(parts):
            nodes = np.where(assign == k)[0]
            if len(nodes) <= 1:
                new[nodes] = 2 * k
                continue
            sub = A[nodes][:, nodes].tocsr()
            vec = _fiedler(sub, rng)
            order = np.argsort(vec, kind="stable")
            half = len(nodes) // 2
            side = np.ones(len(nodes), np.int8)
            side[order[:half]] = 0
            lo0 = max(1, int(np.floor(half * (1 - slack))))
            hi0 = min(len(nodes) - 1, int(np.ceil(half * (1 + slack))))
            side = _refine(sub, side, lo0, hi0)
            new[nodes] = 2 * k + side
        assign = new
        parts *= 2
        levels[parts] = assign.copy()
    return levels


def partition_edge_cut(ij: np.ndarray, node_block: np.ndarray) -> int:
    """Number of edges whose endpoints land in different blocks."""
    ij = np.asarray(ij)
    return int(np.sum(node_block[ij[:, 0]] != node_block[ij[:, 1]]))
