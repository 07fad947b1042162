"""Solver-state checkpoint / resume.

The reference has no mid-solve persistence -- only terminal text dumps
(SURVEY §5).  Here the whole optimizer state is a small pytree
(poses, switches, lambda, iteration counters), so checkpointing is a single
compressed-npz write; `save_every` snapshots during long solves let a
pre-empted run resume exactly where it stopped.

Orbax is available in the image, but its async machinery is overkill for a
<1 MB state; the npz format keeps checkpoints inspectable and dependency-free.
"""

from __future__ import annotations

import json
import os

import numpy as np


_META_KEY = "__meta__"


def save_checkpoint(path: str, state: dict, meta: dict | None = None) -> str:
    """Write a state dict of arrays (+ JSON-serialisable meta) atomically."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {k: np.asarray(v) for k, v in state.items()}
    arrays[_META_KEY] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **arrays)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str) -> tuple[dict, dict]:
    """Read back ``(state, meta)``."""
    with np.load(path) as z:
        state = {k: z[k] for k in z.files if k != _META_KEY}
        meta = json.loads(bytes(z[_META_KEY]).decode()) if _META_KEY in z.files else {}
    return state, meta


def lm_state_dict(poses, switches, lam, iteration, cost, nu=2.0) -> dict:
    """Canonical LM solver state (poses, switches, lambda, nu, iter, cost)
    -- everything needed to resume ``lm_solve`` mid-run."""
    return {
        "poses": np.asarray(poses),
        "switches": np.asarray(switches),
        "lam": np.asarray(lam),
        "nu": np.asarray(nu),
        "iteration": np.asarray(iteration),
        "cost": np.asarray(cost),
    }


class CheckpointingSolver:
    """Drives ``lm_fixed_iters`` in chunks with periodic checkpoints.

    Chunked driving keeps the per-chunk device program identical (one
    compilation) while letting the host persist state between chunks --
    the checkpoint/resume pattern for long robust solves.
    """

    def __init__(self, path: str, chunk_iters: int = 10):
        self.path = path
        self.chunk_iters = chunk_iters

    def run(self, poses0, switches0, edges, free, cfg, total_iters,
            model=None, resume: bool = True):
        import jax.numpy as jnp

        from slam_tpu.solver.lm import lm_fixed_iters

        poses, switches = poses0, switches0
        start = 0
        lam = float(cfg.init_lambda)
        nu = 2.0
        if resume and os.path.exists(self.path):
            state, meta = load_checkpoint(self.path)
            if meta.get("total_iters") == total_iters:
                poses = jnp.asarray(state["poses"])
                switches = jnp.asarray(state["switches"])
                start = int(state["iteration"])
                # Older checkpoints stored lam=0.0 (chunked runs then
                # restarted the trust region); treat 0 as "use init".
                lam = float(state.get("lam", 0.0)) or float(cfg.init_lambda)
                nu = float(state.get("nu", 2.0))

        it = start
        res = None  # None when resuming at completion (no chunks to run)
        while it < total_iters:
            n = min(self.chunk_iters, total_iters - it)
            # lam0/nu0/it0 continue ONE LM trajectory across chunks and
            # restarts (trust region, rejection growth factor and GNC
            # anneal position all persist).
            res = lm_fixed_iters(poses, switches, edges, free, cfg, n,
                                 model=model,
                                 lam0=jnp.asarray(lam, poses.dtype),
                                 it0=jnp.int32(it),
                                 nu0=jnp.asarray(nu, poses.dtype))
            poses, switches = res.poses, res.switches
            lam = float(res.final_lambda)
            nu = float(res.final_nu)
            it += n
            save_checkpoint(
                self.path,
                lm_state_dict(poses, switches, lam, it, float(res.cost),
                              nu=nu),
                meta={"total_iters": total_iters},
            )
        return poses, switches, res
