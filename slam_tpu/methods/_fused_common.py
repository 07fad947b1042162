"""Shared chunk-loop driver for the fused method-3/4 scan engines.

Runs the per-edge decision scan in fixed-size device calls (the remote TPU
backend kills single executions past ~1 min), carrying the layer state on
device between chunks, and optionally checkpointing at every chunk boundary
-- the state is a small pytree, so resume-after-preemption costs one npz
read (the reference has no mid-solve persistence at all, SURVEY §5).
"""

from __future__ import annotations

import hashlib
import os

import jax
import numpy as np


def fingerprint(*arrays, extra: str = "") -> str:
    """Cheap content hash tying a checkpoint to (graph, candidates, config)."""
    h = hashlib.sha256()
    for a in arrays:
        a = np.ascontiguousarray(a)
        h.update(str(a.shape).encode())
        h.update(a.tobytes())
    h.update(extra.encode())
    return h.hexdigest()[:16]


def run_chunked(
    state,                 # initial scan-state NamedTuple (device arrays)
    chunk_fn,              # _fused_chunk(state, *consts, *xs_chunk, cfg, solver)
    consts: tuple,
    xs_np: list[np.ndarray],   # per-candidate arrays, ALREADY padded
    xs_dtypes: list,
    chunk: int,
    n_live: int,           # true candidate count (pre-padding)
    cfg,
    solver,
    checkpoint_path: str | None = None,
    fp: str = "",
):
    """Returns ``(final_state, outs)`` with ``outs`` host-side, concatenated
    across chunks and truncated to ``n_live``."""
    import jax.numpy as jnp

    from slam_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    total = xs_np[0].shape[0]
    assert total % chunk == 0
    start = 0
    outs: list = []

    if checkpoint_path and os.path.exists(checkpoint_path):
        saved, meta = load_checkpoint(checkpoint_path)
        if meta.get("fingerprint") == fp and meta.get("chunk") == chunk:
            start = int(meta["chunks_done"]) * chunk
            state = type(state)(
                **{k: jnp.asarray(saved[f"s_{k}"])
                   for k in state._fields}
            )
            if start > 0:
                prev = {
                    k[2:]: saved[k] for k in saved if k.startswith("o_")
                }
                outs = [prev] if prev else []

    for s0 in range(start, total, chunk):
        sl = slice(s0, s0 + chunk)
        state, o = chunk_fn(
            state, *consts,
            *[jnp.asarray(x[sl], dt) for x, dt in zip(xs_np, xs_dtypes)],
            cfg, solver,
        )
        outs.append(jax.device_get(o._asdict()))
        if checkpoint_path:
            merged = _concat(outs)
            save_checkpoint(
                checkpoint_path,
                {**{f"s_{k}": np.asarray(v)
                    for k, v in jax.device_get(state)._asdict().items()},
                 **{f"o_{k}": v for k, v in merged.items()}},
                meta={
                    "fingerprint": fp,
                    "chunk": chunk,
                    "chunks_done": (s0 + chunk) // chunk,
                },
            )
            outs = [merged]

    state = jax.device_get(state)
    merged = _concat(outs)
    merged = {k: v[:n_live] for k, v in merged.items()}
    return state, merged


def _concat(outs: list[dict]) -> dict:
    if len(outs) == 1:
        return outs[0]
    return {
        k: np.concatenate([o[k] for o in outs]) for k in outs[0]
    }


def setup_eval_solver(graph, cfg, solver):
    """Shared fused-engine eval-solver setup (methods 3 and 4).

    Resolves the candidate-eval linear solver, builds the EdgeSet with the
    right incidence tier, the shared Schur partition when applicable, and
    the effective scan chunk.  Returns
    ``(eval_cfg, edges, partition, scan_chunk)``.

    Selection rules (all measured, results/README.md):
    * TPU "auto": exact partitioned Schur up to ~2k nodes (method 3 runs
      3.2x faster end-to-end than the PCG eval at identical decisions);
      loose PCG above -- a schur-eval scan chunk would exceed the axon
      worker's ~1-minute single-execution kill (an M3500 run died with
      'TPU worker process crashed').
    * CPU "auto": dense up to ~2k nodes, PCG above.
    * Under the schur eval the DEFAULT scan chunk halves to 32 (INTEL
      method-4 64-candidate chunks measured ~50 s -- at the kill
      boundary); an explicitly-passed chunk is honored as given.
    """
    import jax
    import jax.numpy as jnp

    from slam_tpu.solver.problem import edge_set_from_graph

    linear = solver.linear_solver
    if linear in ("auto", "schur"):
        if jax.default_backend() != "cpu":
            linear = "schur" if graph.num_nodes <= 2048 else "pcg"
        else:
            linear = "dense" if graph.num_nodes <= 2048 else "pcg"
    if cfg.eval_linear in ("schur", "pcg", "dense"):
        linear = cfg.eval_linear
    extra = {}
    if linear == "pcg":
        extra = dict(pcg_rtol=cfg.eval_pcg_rtol,
                     pcg_max_iters=cfg.eval_pcg_max_iters)
    scan_chunk = cfg.scan_chunk
    if linear == "schur" and cfg.scan_chunk == 64:  # dataclass default
        scan_chunk = 32
    eval_cfg = solver.replace(
        robust="none", huber_delta=cfg.huber_delta,
        linear_solver=linear, **extra,
    )
    dtype = jnp.dtype(eval_cfg.dtype)
    # PCG eval solves are incidence-bandwidth-bound: use the
    # chain-compressed representation on accelerators (see EdgeSet);
    # schur needs full incidence.
    if linear == "schur":
        inc = True
    elif jax.default_backend() != "cpu":
        inc = "chain"
    else:
        inc = None
    edges = edge_set_from_graph(graph, dtype=dtype, incidence=inc)
    partition = None
    if linear == "schur":
        from slam_tpu.solver.schur import build_partition
        partition = build_partition(
            graph.edges_ij, graph.num_nodes, cfg.eval_schur_blocks,
            dtype=dtype,
        )
    return eval_cfg, edges, partition, scan_chunk
